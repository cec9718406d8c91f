"""Multi-chip scale-out: device meshes, sharded candidate search."""
