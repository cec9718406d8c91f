"""Command-line drivers mirroring the reference CLI surfaces."""
