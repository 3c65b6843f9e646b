"""Device-side ops: masks, positional encodings, attention math, losses, audio
frontend. All pure-jnp / Pallas, static shapes, jit-compatible."""
