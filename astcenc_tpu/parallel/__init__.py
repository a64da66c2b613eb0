"""Multi-chip sharding: mesh construction and shard_map'd codec entry points."""
