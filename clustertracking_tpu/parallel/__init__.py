"""Multi-chip sharding: frame-parallel pipeline over a jax Mesh."""
