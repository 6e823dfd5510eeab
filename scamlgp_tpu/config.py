"""Global numeric configuration for the TPU-native ScaML-GP engine.

The reference implementation runs in ``torch.float64`` end-to-end
(``/root/reference/scamlgp/optimizer.py:46,116-118``).  On TPU, float64 is
software emulated and slow, so this engine makes the working dtype explicit:

- CPU parity tests run in float64 (``jax_enable_x64`` switched on in the test
  conftest).
- TPU throughput paths (bench.py) run in float32 with jitter policies tuned so
  Cholesky stays PSD-stable on standardized data.

Everything in the library takes the dtype from its inputs; these helpers only
centralize defaults and jitter policy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Extra diagonal jitter added to every Gram matrix before Cholesky, scaled by
#: the mean of the diagonal.  The reference relies on gpytorch's equivalent
#: ``cholesky_jitter`` machinery; the noise floor there is 1e-8
#: (``/root/reference/scamlgp/model.py:31``).
JITTER_F64 = 1e-10
JITTER_F32 = 1e-6


def default_dtype() -> jnp.dtype:
    """float64 when x64 is enabled (CPU parity mode), else float32 (TPU mode)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def jitter_for(dtype) -> float:
    return JITTER_F64 if jnp.dtype(dtype).itemsize == 8 else JITTER_F32


def enable_x64() -> None:
    """Switch JAX to 64-bit mode (matches the reference's float64 semantics)."""
    jax.config.update("jax_enable_x64", True)
