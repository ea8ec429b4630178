"""Multi-chip execution: postings sharded over a device mesh, top-k
merged over ICI collectives."""
