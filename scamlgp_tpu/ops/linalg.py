"""Masked Cholesky / MLL / GP-conditioning primitives.

The reference's numeric core is torch/ATen dense Cholesky + triangular solves
inside gpytorch's ``ExactMarginalLogLikelihood`` and exact predictive
(``/root/reference/scamlgp/utils.py:175-192``, ``model.py:128,281``).  Here the
same math is expressed mask-aware and batched so that heterogeneous task sizes
pad to one static shape and ``vmap``/``shard_map`` handle tasks x restarts x
chains — no Python loops, no dynamic shapes under ``jit``.

Masking trick: for pad index i (mask 0) the system matrix row/col is replaced by
the identity row and y_i = 0, so padded entries contribute exactly 0 to the
quadratic form and log-determinant, and the Cholesky stays well-defined.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import lax

from scamlgp_tpu.config import jitter_for

_LOG_2PI = math.log(2.0 * math.pi)


def mask_system(K: jnp.ndarray, noise, mask: Optional[jnp.ndarray]):
    """Build the masked system matrix: A = K + (noise + jitter)*I on active
    rows/cols, identity on padded ones.

    Args:
        K: (..., n, n) prior covariance at the training inputs.
        noise: scalar or (...,) observation noise variance.
        mask: (..., n) 1/0 validity mask, or None for fully dense.

    Returns:
        A: (..., n, n) PSD system matrix safe to Cholesky.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    diag_k = jnp.diagonal(K, axis1=-2, axis2=-1)                      # (..., n)
    jitter = jitter_for(K.dtype) * (1.0 + jnp.mean(jnp.abs(diag_k), axis=-1))
    add = jnp.expand_dims(jnp.asarray(noise, K.dtype) + jitter, -1)   # (..., 1)
    if mask is None:
        return K + add[..., None] * eye
    m = mask.astype(K.dtype)
    mm = m[..., :, None] * m[..., None, :]
    off = K * mm * (1.0 - eye)
    new_diag = diag_k * m + add * m + (1.0 - m)
    return off + new_diag[..., None] * eye


class CholState(NamedTuple):
    """Cached factorization for posterior predictions."""

    chol: jnp.ndarray       # (..., n, n) lower Cholesky of masked system
    alpha: jnp.ndarray      # (..., n) A^{-1} y (zero on padded rows)
    y: jnp.ndarray          # (..., n) training targets (standardized space)
    mask: jnp.ndarray       # (..., n)


def cholesky_factor(K, noise, y, mask=None):
    A = mask_system(K, noise, mask)
    L = lax.linalg.cholesky(A)
    if mask is None:
        mask = jnp.ones(K.shape[:-1], dtype=K.dtype)
    ym = y * mask
    alpha = lax.linalg.triangular_solve(
        L, ym[..., None], left_side=True, lower=True)
    alpha = lax.linalg.triangular_solve(
        L, alpha, left_side=True, lower=True, transpose_a=True)[..., 0]
    return CholState(chol=L, alpha=alpha * mask, y=ym, mask=mask)


def mll(K, noise, y, mask=None, mean: Optional[jnp.ndarray] = None):
    """Masked Gaussian-process marginal log-likelihood.

    log N(y | mean, K + noise*I) over active entries only.  Matches gpytorch's
    ``MultivariateNormal.log_prob`` (up to the 1/n scaling gpytorch applies in
    ``ExactMarginalLogLikelihood``, which is monotone and thus irrelevant for
    restart selection — ``/root/reference/scamlgp/utils.py:177,192``).
    """
    if mean is not None:
        y = y - mean
    state = cholesky_factor(K, noise, y, mask)
    m = state.mask
    quad = jnp.sum(state.y * state.alpha, axis=-1)
    # padded diag entries of L are 1 -> contribute log(1)=0
    diag = jnp.diagonal(state.chol, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(diag), axis=-1)
    n_active = jnp.sum(m, axis=-1)
    return -0.5 * (quad + logdet + n_active * _LOG_2PI)


def posterior(state: CholState, Kxq, Kqq_diag=None, Kqq=None):
    """Exact GP predictive given a cached factorization.

    Args:
        state: cached Cholesky of the masked training system.
        Kxq: (..., n, q) prior cross-covariance train x query (un-masked; padded
            rows are zeroed internally).
        Kqq_diag: (..., q) prior variance at queries (for diagonal-only path).
        Kqq: (..., q, q) full prior covariance at queries.

    Returns:
        mean (..., q) and, depending on what was passed, variance (..., q)
        and/or covariance (..., q, q).
    """
    Kxq = Kxq * state.mask[..., :, None]
    mean = jnp.einsum("...nq,...n->...q", Kxq, state.alpha,
                      precision=lax.Precision.HIGHEST)
    v = lax.linalg.triangular_solve(state.chol, Kxq, left_side=True, lower=True)
    if Kqq is not None:
        cov = Kqq - jnp.matmul(jnp.swapaxes(v, -1, -2), v,
                               precision=lax.Precision.HIGHEST)
        return mean, cov
    if Kqq_diag is not None:
        var = Kqq_diag - jnp.sum(v * v, axis=-2)
        return mean, jnp.maximum(var, 0.0)
    return mean
