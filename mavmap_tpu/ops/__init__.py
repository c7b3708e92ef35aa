"""Batched geometry / estimation ops (the numeric heart of mavmap_tpu).

Every op in this package is a pure jnp function, vectorized over a leading
batch dimension where meaningful, and safe to `jax.jit` / `jax.vmap`.
"""
