"""Device-mesh parallelism: mesh construction and sharding rules."""
