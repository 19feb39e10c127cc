"""Compute kernels: host (numpy) reference implementations and their
JAX/Pallas device counterparts."""
