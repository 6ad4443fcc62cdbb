"""Multi-chip scaling: mesh construction and sharded rendering."""
