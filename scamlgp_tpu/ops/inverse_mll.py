"""Gaussian MLL with an analytic matrix-level VJP over an explicit inverse.

The TPU fast path for the fit objective (reference hot loop 2,
``/root/reference/scamlgp/utils.py:175-192``).  For

    mll(A, y) = -1/2 (y^T A^{-1} y + log|A| + n log 2pi)

the exact matrix gradients are

    d mll / dA = 1/2 (alpha alpha^T - A^{-1}),     alpha = A^{-1} y
    d mll / dy = -alpha

so once the forward pass materializes A^{-1} (which the sweep and blocked
Cholesky kernels produce anyway), the ENTIRE backward pass is one outer
product — no triangular solves, no backward matmuls.  This replaces the
generic ``sweep_inverse`` VJP (two (N, N, N) matmuls per cotangent) used in
round 2: at B=4096/N=128 those two matmuls were ~40% of the value+grad cost.

Forward inverse routing (all decisions static at trace time):

- N <= 128 and the VMEM sweep fits: elementary sweep kernel
  (``pallas_sweep.py``);
- otherwise: not profitable — callers fall back to ``linalg.mll`` (direct
  XLA Cholesky MLL with AD), the measured winner for every N > 128 now
  that the backward pass no longer needs an explicit inverse
  (r4 crossover tables: docs/SWEEP_N_r4.json, docs/SWEEP_N_r4_pinned.json;
  the blocked Cholesky kernel stays available via
  ``pallas_blocked_chol.blocked_chol_inverse``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from scamlgp_tpu.ops import pallas_blocked_chol as blocked
from scamlgp_tpu.ops import pallas_sweep as sweep

_LOG_2PI = math.log(2.0 * math.pi)


def inverse_mll_profitable(N: int, itemsize: int = 4) -> bool:
    """Whether one of the Pallas inverse kernels beats the direct XLA
    Cholesky MLL at this system size (else callers should use
    ``linalg.mll``, whose solve-based forward is cheaper than an explicit
    inverse when the kernels don't apply)."""
    return (sweep.sweep_profitable(N, itemsize)
            or blocked.blocked_profitable(N, itemsize))


def _inverse_auto(A):
    """(A^{-1}, log|A|) through the fastest applicable kernel."""
    N = A.shape[-1]
    itemsize = jnp.dtype(A.dtype).itemsize
    if sweep.sweep_profitable(N, itemsize):
        return sweep._sweep_inverse_impl(A)
    if blocked.blocked_profitable(N, itemsize):
        return blocked.blocked_chol_inverse(A)
    return sweep._chol_inverse_impl(A)


@jax.custom_vjp
def mll_via_inverse(A, y, n_active):
    """Batched Gaussian log-density with analytic VJP.

    Args:
        A: (..., n, n) masked SPD system (see ``linalg.mask_system``).
        y: (..., n) centered targets, zero on padded rows.
        n_active: (...,) active row count (mask sum), non-differentiable in
            practice (its cotangent is returned for completeness).
    """
    value, _ = _fwd_impl(A, y, n_active)
    return value


def _fwd_impl(A, y, n_active):
    batch = A.shape[:-2]
    N = A.shape[-1]
    Ainv, logdet = _inverse_auto(A.reshape((-1, N, N)))
    Ainv = Ainv.reshape(batch + (N, N))
    logdet = logdet.reshape(batch)
    # alpha as a VPU multiply-reduce, NOT an MXU einsum: a matvec has no
    # MXU reuse, and f32 Precision.HIGHEST decomposes into 6 bf16 passes on
    # TPU — measured ~40% of the whole value+grad pipeline at the headline
    # shape (docs/PROFILE_HEADLINE_r4.json stage mll_via_inv_preA).  The
    # elementwise product with an f32 reduce accumulator is exact f32 in a
    # single bandwidth-bound pass.
    alpha = jnp.sum(Ainv * y[..., None, :], axis=-1)
    quad = jnp.sum(y * alpha, axis=-1)
    value = -0.5 * (quad + logdet + n_active * _LOG_2PI)
    return value, (Ainv, alpha)


def _mll_fwd(A, y, n_active):
    value, res = _fwd_impl(A, y, n_active)
    return value, res


def _mll_bwd(res, g):
    Ainv, alpha = res
    gb = (0.5 * g)[..., None, None]
    outer = alpha[..., :, None] * alpha[..., None, :]
    dA = gb * (outer - Ainv)
    dy = -g[..., None] * alpha
    dn = -0.5 * g * _LOG_2PI
    return dA, dy, dn


mll_via_inverse.defvjp(_mll_fwd, _mll_bwd)
