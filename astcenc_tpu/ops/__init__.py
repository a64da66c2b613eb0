"""Batched numeric kernels (jnp + pallas) for the ASTC codec."""
