"""Decoding: greedy (device ops, see models/) and beam search (host-orchestrated
with device-computed scores), with n-gram and neural LM fusion."""
