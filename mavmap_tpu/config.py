"""Global numeric configuration for mavmap_tpu.

TPU-first dtype policy: all device compute defaults to float32 (the MXU/VPU
native wide type); minimal solvers are written dtype-polymorphic so CPU
verification runs can use float64 by setting JAX_ENABLE_X64.
"""

import os

import jax.numpy as jnp

# Default real dtype for geometry compute.
DTYPE = jnp.float32

# Complex dtype matching DTYPE (used by the Durand-Kerner root solver).
CDTYPE = jnp.complex64

# Epsilon used to guard divisions / norms in DTYPE precision.
EPS = 1e-12


def default_dtype():
    return DTYPE


def is_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no devices at all
        return False


# Allow tests to force deterministic, smaller capacities.
MAX_TRACK_LEN = int(os.environ.get("MAVMAP_TPU_MAX_TRACK_LEN", "64"))
