"""HBM-resident index structures."""
