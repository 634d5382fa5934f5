"""Device kernels (Pallas/TPU): postings decode, window scatter, phrase verify."""
