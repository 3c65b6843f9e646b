"""Training runtime: optimizer/schedules, jit train step over a device mesh,
checkpointing, SWA, evaluation loop."""
