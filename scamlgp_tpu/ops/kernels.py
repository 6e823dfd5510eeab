"""Batched ARD kernel (Gram) assembly — the MXU-facing hot op.

The reference delegates Gram assembly to gpytorch ``ScaleKernel(RBFKernel)`` /
``MaternKernel`` with ARD lengthscales (``/root/reference/scamlgp/model.py:36-105``).
Here every Gram is computed as one batched expression so XLA maps the inner
products onto the MXU:

    ||x/l - z/l||^2 = |x/l|^2 + |z/l|^2 - 2 (x/l) @ (z/l)^T

i.e. the O(n^2 d) work is a single matmul.  Batching over tasks / restarts /
chains is plain leading-dim broadcasting — callers ``vmap``.

A Pallas fused gram kernel lives in ``pallas_gram.py`` and is used for large n
where HBM traffic on the intermediate distance matrix matters.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
from jax import lax

SQRT3 = math.sqrt(3.0)
SQRT5 = math.sqrt(5.0)

#: TPU matmuls default to bf16 accumulation; kernel distances exponentiate,
#: so bf16 error makes Gram matrices non-PSD and Cholesky NaNs out.  All
#: distance cross-products therefore run at HIGHEST precision (full f32 on
#: the MXU via multi-pass).
_PRECISION = lax.Precision.HIGHEST


def _scaled(x, lengthscale):
    """x: (..., n, d); lengthscale: (..., d) or scalar — broadcast divide."""
    if jnp.ndim(lengthscale) >= 1:
        return x / jnp.expand_dims(lengthscale, -2)
    return x / lengthscale


def sq_dist(x, z, lengthscale):
    """Pairwise squared distance of ARD-scaled inputs. (..., n, m)."""
    xs = _scaled(x, lengthscale)
    zs = _scaled(z, lengthscale)
    x2 = jnp.sum(xs * xs, axis=-1, keepdims=True)          # (..., n, 1)
    z2 = jnp.sum(zs * zs, axis=-1, keepdims=True)          # (..., m, 1)
    cross = jnp.matmul(xs, jnp.swapaxes(zs, -1, -2),
                       precision=_PRECISION)               # (..., n, m)  MXU
    d2 = x2 - 2.0 * cross + jnp.swapaxes(z2, -1, -2)
    return jnp.maximum(d2, 0.0)


def rbf(x, z, lengthscale, outputscale=1.0):
    """ScaleKernel(RBFKernel(ard)) — reference model.py:44-70."""
    return outputscale * jnp.exp(-0.5 * sq_dist(x, z, lengthscale))


def matern12(x, z, lengthscale, outputscale=1.0):
    r = jnp.sqrt(sq_dist(x, z, lengthscale) + 1e-30)
    return outputscale * jnp.exp(-r)


def matern32(x, z, lengthscale, outputscale=1.0):
    r = jnp.sqrt(sq_dist(x, z, lengthscale) + 1e-30)
    return outputscale * (1.0 + SQRT3 * r) * jnp.exp(-SQRT3 * r)


def matern52(x, z, lengthscale, outputscale=1.0):
    r = jnp.sqrt(sq_dist(x, z, lengthscale) + 1e-30)
    return outputscale * (1.0 + SQRT5 * r + 5.0 / 3.0 * r * r) * jnp.exp(-SQRT5 * r)


KERNELS: dict[str, Callable] = {
    "rbf": rbf,
    "matern12": matern12,
    "matern32": matern32,
    "matern52": matern52,
}


def get_kernel(name: str) -> Callable:
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(f"Unknown kernel '{name}'. Available: {sorted(KERNELS)}")


def gram(name: str, x, z, lengthscale, outputscale=1.0):
    return get_kernel(name)(x, z, lengthscale, outputscale)
