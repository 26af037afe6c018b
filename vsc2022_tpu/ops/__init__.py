"""Device-level array ops: similarity search, top-k, temporal alignment."""
