"""TPU compute path: JAX/Pallas decode/encode kernels."""
