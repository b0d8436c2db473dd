"""Device compute kernels (pure JAX/Pallas; no host state)."""
