"""Multi-chip / multi-host sharding (mesh helpers, distributed BA,
sharded retrieval)."""
