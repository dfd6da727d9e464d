"""Scale-out: scenario batching and mesh sharding over jax.sharding.Mesh."""
