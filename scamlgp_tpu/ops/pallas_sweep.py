"""Batched SPD inverse + log-determinant via the sweep operator — Pallas.

Why: XLA's batched ``cholesky`` / ``triangular_solve`` on TPU are
latency-bound column loops that round-trip HBM on every step (measured at
B=4096, N=128, f32: cholesky ~64 ms, N-rhs solve ~45 ms, full MLL
value+grad ~162 ms — ~0.1% of peak).  The classical statistics *sweep
operator* computes A^-1 and log|A| for SPD A in N rank-1 updates; here each
grid cell keeps a block of G matrices resident in VMEM for all N steps, so
the only HBM traffic is one read + one write of the batch.

Per sweep step k (vectorized over the G-matrix block, no lane-dim dynamic
indexing — column/row k are extracted with one-hot reductions):

    d     = A[k, k]              (pivot; positive while A's unswept part SPD)
    A    <- A - outer(col/d, row) + outer(e_k, row/d) + outer(col/d, e_k)
               + (-1/d - 2) * outer(e_k, e_k)
    logdet += log d

After all N sweeps, A has become -A^-1.

The custom VJP makes gradients pure batched MXU matmuls:
    dA = -Ainv^T @ dAinv @ Ainv^T + g_logdet * Ainv^T
which is what turns the GP MLL's backward pass from AD-through-Cholesky
(chains of triangular solves) into two matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: matrices processed per grid cell; G * N * N * 4B must fit VMEM comfortably
DEFAULT_G = 8


def _sweep_kernel(a_ref, inv_ref, logdet_ref):
    """Sweep a (G, N, N) block fully in VMEM.

    All intermediates are kept >= 2-D (Mosaic layout requirement); column /
    row k are extracted with one-hot masked reductions so no dynamic lane
    indexing occurs.
    """
    G, N, _ = a_ref.shape
    A0 = a_ref[:]

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)  # lanes
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)  # sublanes

    def step(k, carry):
        A, logdet = carry                                # logdet: (G, 1)
        e_lane = (col_idx == k).astype(A.dtype)          # (1, 1, N)
        e_sub = (row_idx == k).astype(A.dtype)           # (1, N, 1)
        col = jnp.sum(A * e_lane, axis=2, keepdims=True)  # (G, N, 1)
        row = jnp.sum(A * e_sub, axis=1, keepdims=True)   # (G, 1, N)
        d = jnp.sum(row * e_lane, axis=2, keepdims=True)  # (G, 1, 1)
        inv_d = 1.0 / d
        cd = col * inv_d                                  # (G, N, 1)
        A = (A
             - cd * row
             + e_sub * (row * inv_d)
             + cd * e_lane
             + (-inv_d - 2.0) * (e_sub * e_lane))
        logdet = logdet + jnp.log(d[:, :, 0])
        return A, logdet

    A, logdet = jax.lax.fori_loop(0, N, step,
                                  (A0, jnp.zeros((G, 1), A0.dtype)))
    inv_ref[:] = -A
    logdet_ref[:] = logdet


def _pad_batch(a, g):
    b = a.shape[0]
    pad = (-b) % g
    if pad:
        eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype),
                               (pad,) + a.shape[1:])
        a = jnp.concatenate([a, eye])
    return a


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def sweep_inverse(A):
    """(A^-1, log|A|) for a batch of SPD matrices A: (B, N, N).

    f32, TPU-tuned; off-TPU falls back to XLA cholesky-based computation.
    """
    return _sweep_inverse_impl(A)


def _sweep_inverse_impl(A):
    if jax.default_backend() != "tpu":
        L = jax.lax.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
        Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True,
                                               lower=True)
        Ainv = jnp.einsum("bki,bkj->bij", Linv, Linv,
                          precision=jax.lax.Precision.HIGHEST)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return Ainv, logdet

    B, N, _ = A.shape
    g = min(DEFAULT_G, B)
    Ap = _pad_batch(A, g)
    Bp = Ap.shape[0]
    inv, logdet = pl.pallas_call(
        _sweep_kernel,
        out_shape=(jax.ShapeDtypeStruct((Bp, N, N), A.dtype),
                   jax.ShapeDtypeStruct((Bp, 1), A.dtype)),
        grid_spec=pl.GridSpec(
            grid=(Bp // g,),
            in_specs=[pl.BlockSpec((g, N, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((g, N, N), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((g, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
        ),
    )(Ap)
    return inv[:B], logdet[:B, 0]


def _sweep_fwd(A):
    Ainv, logdet = _sweep_inverse_impl(A)
    return (Ainv, logdet), (Ainv,)


def _sweep_bwd(res, cotangents):
    (Ainv,) = res
    dAinv, dlogdet = cotangents
    hi = jax.lax.Precision.HIGHEST
    # d/dA of A^-1: -A^-T dAinv A^-T ; Ainv symmetric here
    term1 = -jnp.matmul(jnp.matmul(Ainv, dAinv, precision=hi), Ainv,
                        precision=hi)
    term2 = dlogdet[:, None, None] * Ainv
    return (term1 + term2,)


sweep_inverse.defvjp(_sweep_fwd, _sweep_bwd)


def mll_via_sweep(A, y, n_active=None):
    """Gaussian log-density using the sweep inverse: A must already be the
    masked system matrix (see ``linalg.mask_system``); padded y entries zero.

    The backward pass is analytic through ``sweep_inverse``'s custom VJP —
    no triangular solves anywhere.
    """
    import math

    Ainv, logdet = sweep_inverse(A)
    alpha = jnp.einsum("bij,bj->bi", Ainv, y,
                       precision=jax.lax.Precision.HIGHEST)
    quad = jnp.sum(y * alpha, axis=-1)
    if n_active is None:
        n_active = jnp.asarray(A.shape[-1], A.dtype)
    return -0.5 * (quad + logdet + n_active * math.log(2.0 * math.pi))
