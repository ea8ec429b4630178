"""Device kernels: block BM25 scoring, top-k, vector similarity."""
