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

#: max matrices per grid cell; the actual G adapts to N (see ``_choose_g``)
DEFAULT_G = 8

#: VMEM bytes budgeted for the per-cell A blocks.  A grid cell holds ~5
#: matrix-sized buffers live at once (double-buffered input + output blocks
#: for the pipeline, plus the fori-loop carry), and ~16 MB/core must also fit
#: Mosaic scratch — 12 MB of A blocks keeps headroom.
_VMEM_BUDGET = 12 * 1024 * 1024

#: rank-2 serial step (_sweep_kernel_pair): two pivots per fori_loop trip —
#: one bulk FMA traversal and two nested-select traversals per PAIR instead
#: of per pivot.  Flipped on/off by the measured A/B at the headline shape
#: (scripts/bench_sweep_n.py variant 'pair').
_PAIR_STEP = False

#: serial step variant: "select" (classical: FMA + two border selects, 5
#: logical passes/step) or "fused" (border writes folded into the bulk
#: pass as a second rank-1 term, 3 passes/step — see _sweep_kernel_fused).
#: Chosen by the measured A/B at the headline shape
#: (scripts/bench_sweep_n.py variants 'elementary' vs 'fused').
import os as _os

_STEP_VARIANT = _os.environ.get("SCAMLGP_SWEEP_STEP", "select")

#: above this N, the direct XLA Cholesky MLL wins and callers should not use
#: the sweep at all.  Measured on v5e (value+grad MLL evals/s,
#: scripts/bench_sweep_n.py):
#:   N= 128, B=4096: elementary 50.7k | blocked 25.4k | XLA 37.5k -> sweep 1.35x
#:   N= 256, B=1024: elementary 12.2k | blocked  8.6k | XLA 14.5k -> XLA wins
#:   N= 512, B= 256: elementary  1.7k | blocked  2.3k | XLA  6.0k -> XLA wins
#:   N=1024, B=  64: (VMEM ceiling: G=0)              | XLA  2.2k
#: The VMEM-resident rank-1 sweep is a small-N optimization: once N*N blocks
#: stop amortizing the O(N) sequential pivot loop, XLA's pipeline takes over.
#: NOTE the in-kernel fallback below computes the full inverse (needed by the
#: sweep contract); for a plain MLL that is ~2.5x more work than a Cholesky
#: solve, which is why ``sweep_profitable`` exists for method selection.
_SWEEP_MAX_N = 128


def sweep_profitable(N: int, itemsize: int = 4) -> bool:
    """Whether the Pallas sweep path beats XLA's direct Cholesky MLL at this
    system size (measurement table above).  Callers choosing between
    ``mll_via_sweep`` and a Cholesky MLL should route on this."""
    return N <= _SWEEP_MAX_N and _choose_g(1, N, itemsize) >= 1

#: N at which the blocked (MXU rank-BLOCK) variant would replace the
#: elementary (VPU rank-1) kernel.  Measured slower than BOTH the elementary
#: sweep and XLA Cholesky at every shape tried on v5e (table above), so it
#: is effectively disabled; kept selectable for bench_sweep_n.py and future
#: hardware where the MXU bulk update wins.
_BLOCKED_MIN_N = 10**9


def _choose_g(B: int, N: int, itemsize: int) -> int:
    """Matrices per grid cell such that ~5 blocks fit the VMEM budget;
    0 means even G=1 does not fit -> fall back to XLA Cholesky."""
    per = N * N * itemsize
    return min(DEFAULT_G, B, _VMEM_BUDGET // (5 * per))


def _sweep_kernel(a_ref, inv_ref, logdet_ref):
    """Sweep a (G, N, N) block fully in VMEM.

    All intermediates are kept >= 2-D (Mosaic layout requirement); column /
    row k are extracted with one-hot masked reductions so no dynamic lane
    indexing occurs.

    Pivot row/column fix-ups are two masked selects instead of three full
    (G, N, N) multiply-add passes (measured ~3% faster at B=4096, N=128).
    A symmetry variant (row k = transpose of column k, one extraction) was
    measured 1.37x SLOWER — the (G,N,1)->(G,1,N) relayout costs more than
    the masked reduction it saves.
    """
    G, N, _ = a_ref.shape
    A0 = a_ref[:]

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)  # lanes
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)  # sublanes

    def step(k, carry):
        A, logdet = carry                                # logdet: (G, 1)
        e_lane = (col_idx == k).astype(A.dtype)          # (1, 1, N)
        e_sub = (row_idx == k).astype(A.dtype)           # (1, N, 1)
        is_lane = col_idx == k                           # (1, 1, N) bool
        is_sub = row_idx == k                            # (1, N, 1) bool
        col = jnp.sum(A * e_lane, axis=2, keepdims=True)  # (G, N, 1)
        row = jnp.sum(A * e_sub, axis=1, keepdims=True)   # (G, 1, N)
        d = jnp.sum(row * e_lane, axis=2, keepdims=True)  # (G, 1, 1)
        inv_d = 1.0 / d
        cd = col * inv_d                                  # (G, N, 1)
        # pivot row values after the sweep: row/d, with -1/d at the pivot
        row_fix = row * inv_d - e_lane * (inv_d + 1.0)    # (G, 1, N)
        A = A - cd * row                                  # rank-1 (FMA pass)
        A = jnp.where(is_lane, jnp.broadcast_to(cd, A.shape), A)
        A = jnp.where(is_sub, jnp.broadcast_to(row_fix, A.shape), A)
        logdet = logdet + jnp.log(d[:, :, 0])
        return A, logdet

    A, logdet = jax.lax.fori_loop(0, N, step,
                                  (A0, jnp.zeros((G, 1), A0.dtype)))
    inv_ref[:] = -A
    logdet_ref[:] = logdet


def _sweep_kernel_fused(a_ref, inv_ref, logdet_ref):
    """Elementary sweep with the border writes folded into the bulk pass.

    The classical step is 'rank-1 FMA + overwrite column k + overwrite
    row k' — one FMA traversal plus two select traversals.  Algebraically
    the whole update is the sum of exactly TWO rank-1 terms:

        A' = A + cd (x) (e_k - row) + e_k^T (x) (row/d - e_k (1/d + 2))

    (cd = col/d; verified per element class: off-border reproduces
    A - cd*row, row k becomes row/d with -1/d at the pivot, column k
    becomes cd — the same values the select version writes.)  So each
    step is 2 masked-reduce extractions + ONE 2-FMA traversal: 3 logical
    passes instead of 5.  Selected via ``_STEP_VARIANT = 'fused'``;
    equivalence with the select kernel is pinned by tests/test_sweep.py.
    """
    G, N, _ = a_ref.shape
    A0 = a_ref[:]

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)  # lanes
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)  # sublanes

    def step(k, carry):
        A, logdet = carry                                 # logdet: (G, 1)
        e_lane = (col_idx == k).astype(A.dtype)           # (1, 1, N)
        e_sub = (row_idx == k).astype(A.dtype)            # (1, N, 1)
        col = jnp.sum(A * e_lane, axis=2, keepdims=True)  # (G, N, 1)
        row = jnp.sum(A * e_sub, axis=1, keepdims=True)   # (G, 1, N)
        d = jnp.sum(row * e_lane, axis=2, keepdims=True)  # (G, 1, 1)
        inv_d = 1.0 / d
        cd = col * inv_d                                  # (G, N, 1)
        u = e_lane - row                                  # (G, 1, N)
        w = row * inv_d - e_lane * (inv_d + 2.0)          # (G, 1, N)
        A = A + cd * u + e_sub * w                        # one traversal
        logdet = logdet + jnp.log(d[:, :, 0])
        return A, logdet

    A, logdet = jax.lax.fori_loop(0, N, step,
                                  (A0, jnp.zeros((G, 1), A0.dtype)))
    inv_ref[:] = -A
    logdet_ref[:] = logdet


def _sweep_kernel_pair(a_ref, inv_ref, logdet_ref):
    """Two pivots per serial step (rank-2 sweep).

    Halves the fori_loop trip count of the elementary kernel: the second
    pivot's column/row are reconstructed from the first pivot's borders
    with O(N) arithmetic (no intermediate full-matrix state), then both
    rank-1 updates land in ONE bulk FMA traversal and the four border
    fix-ups in two nested-select traversals.  Exactly equivalent to two
    elementary sweep steps (pinned by tests/test_sweep.py); requires even
    N (caller guarantees).

    Derivation of the second-pivot borders (p = 2k, q = 2k+1, values taken
    from A BEFORE the pair): with cd_p = col_p/d_p and rpq = row_p[q],

        col_q' = col_q - cd_p*rpq + e_p*(rpq/d_p)        (post-p column q)
        row_q' = row_q - cd_p[q]*row_p + e_p^T*cd_p[q]   (post-p row q)
        d_q'   = d_q - cd_p[q]*rpq

    and the final borders after both sweeps:

        col_p'' = cd_p - cd_q*cd_p[q]       (rows outside {p, q})
        row_p'' = row_p^fix - cd_q[p]*row_q' + e_q^T*cd_q[p]
        col_q'' = cd_q,  row_q'' = row_q'^fix
    """
    G, N, _ = a_ref.shape
    A0 = a_ref[:]

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, N, 1), 1)

    def step(kk, carry):
        A, logdet = carry
        p = 2 * kk
        q = p + 1
        el_p = (col_idx == p).astype(A.dtype)            # (1, 1, N)
        es_p = (row_idx == p).astype(A.dtype)            # (1, N, 1)
        el_q = (col_idx == q).astype(A.dtype)
        es_q = (row_idx == q).astype(A.dtype)
        is_lp, is_sp = col_idx == p, row_idx == p
        is_lq, is_sq = col_idx == q, row_idx == q

        col_p = jnp.sum(A * el_p, axis=2, keepdims=True)   # (G, N, 1)
        col_q = jnp.sum(A * el_q, axis=2, keepdims=True)
        row_p = jnp.sum(A * es_p, axis=1, keepdims=True)   # (G, 1, N)
        row_q = jnp.sum(A * es_q, axis=1, keepdims=True)

        d_p = jnp.sum(row_p * el_p, axis=2, keepdims=True)  # (G, 1, 1)
        rpq = jnp.sum(row_p * el_q, axis=2, keepdims=True)
        inv_dp = 1.0 / d_p
        cd_p = col_p * inv_dp                               # (G, N, 1)
        cdpq = jnp.sum(cd_p * es_q, axis=1, keepdims=True)  # (G, 1, 1)

        # post-p borders of pivot q (O(N) work)
        col_q1 = col_q - cd_p * rpq + es_p * (rpq * inv_dp)
        row_q1 = row_q - cdpq * row_p + el_p * cdpq
        d_q1 = jnp.sum(row_q1 * el_q, axis=2, keepdims=True)
        inv_dq = 1.0 / d_q1
        cd_q = col_q1 * inv_dq                              # (G, N, 1)
        cdqp = jnp.sum(cd_q * es_p, axis=1, keepdims=True)  # (G, 1, 1)

        # final border values
        row_p_fix = row_p * inv_dp - el_p * (inv_dp + 1.0)
        row_q_fix = row_q1 * inv_dq - el_q * (inv_dq + 1.0)
        row_p_fin = row_p_fix - cdqp * row_q1 + el_q * cdqp
        col_p_fin = cd_p - cd_q * cdpq

        # one bulk rank-2 FMA traversal + two nested-select traversals
        A = A - cd_p * row_p - cd_q * row_q1
        A = jnp.where(is_lp, jnp.broadcast_to(col_p_fin, A.shape),
                      jnp.where(is_lq, jnp.broadcast_to(cd_q, A.shape), A))
        A = jnp.where(is_sp, jnp.broadcast_to(row_p_fin, A.shape),
                      jnp.where(is_sq, jnp.broadcast_to(row_q_fix, A.shape),
                                A))
        logdet = logdet + jnp.log(d_p[:, :, 0]) + jnp.log(d_q1[:, :, 0])
        return A, logdet

    A, logdet = jax.lax.fori_loop(0, N // 2, step,
                                  (A0, jnp.zeros((G, 1), A0.dtype)))
    inv_ref[:] = -A
    logdet_ref[:] = logdet


BLOCK = 32


def _sweep_kernel_blocked(a_ref, inv_ref, logdet_ref):
    """Blocked sweep: the O(N^3) bulk update runs as rank-BLOCK batched
    matmuls on the MXU; only the (G, BLOCK, N) pivot panel is swept
    elementwise.  Identity used (B = pivot block, R = rest):

        [[P, Q], [R, S]]  ->  [[-P^-1, P^-1 Q], [R P^-1, S - R P^-1 Q]]

    with the panel after elementary sweeping equal to W = [-P^-1 | P^-1 Q].
    """
    G, N, _ = a_ref.shape
    BS = BLOCK
    A0 = a_ref[:]
    hi = jax.lax.Precision.HIGHEST

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
    sub_panel = jax.lax.broadcasted_iota(jnp.int32, (1, BS, 1), 1)
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    cols_bs = jax.lax.broadcasted_iota(jnp.int32, (1, BS), 1)
    eye_bs = (jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 0)
              == jax.lax.broadcasted_iota(jnp.int32, (BS, BS), 1)
              ).astype(A0.dtype)

    def block_step(b, carry):
        A, logdet = carry
        base = b * BS

        # E_B: (N, BS) one-hot selector of the pivot rows/columns.  Pallas
        # TPU has no dynamic_slice on values, so panel gather/scatter are
        # one-hot matmuls (MXU) instead.
        E = ((rows_n - base) == cols_bs).astype(A.dtype)   # (N, BS)

        # --- panel extract + sweep (rows B, all columns) ------------------
        panel0 = jax.lax.dot_general(                      # E^T @ A
            E, A, (((0,), (1,)), ((), ())), preferred_element_type=A.dtype,
            precision=hi)                                  # (BS, G, N) !
        panel0 = jnp.swapaxes(panel0, 0, 1)                # (G, BS, N)

        def pivot_step(jj, pc):
            P, ld = pc
            k = base + jj
            e_lane = (lane == k).astype(P.dtype)          # (1, 1, N)
            e_sub = (sub_panel == jj).astype(P.dtype)     # (1, BS, 1)
            col = jnp.sum(P * e_lane, axis=2, keepdims=True)   # (G, BS, 1)
            row = jnp.sum(P * e_sub, axis=1, keepdims=True)    # (G, 1, N)
            d = jnp.sum(row * e_lane, axis=2, keepdims=True)   # (G, 1, 1)
            inv_d = 1.0 / d
            cd = col * inv_d
            P = (P - cd * row + e_sub * (row * inv_d) + cd * e_lane
                 + (-inv_d - 2.0) * (e_sub * e_lane))
            return P, ld + jnp.log(d[:, :, 0])

        W, logdet = jax.lax.fori_loop(
            0, BS, pivot_step, (panel0, logdet))           # (G, BS, N)

        # --- bulk rank-BS update on the MXU -------------------------------
        RB = jax.lax.dot_general(                          # A[:, :, B]
            A, E, (((2,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=hi)                                  # (G, N, BS)
        Pinv = -jax.lax.dot_general(                       # -W[:, :, B]
            W, E, (((2,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=hi)                                  # (G, BS, BS)
        # M = P^-1 A[B, :]  (B cols = I, rest = P^-1 Q)
        corr = Pinv + eye_bs
        M = W + jax.lax.dot_general(                       # (G, BS, N)
            corr, E.T, (((2,), (0,)), ((), ())), preferred_element_type=A.dtype,
            precision=hi)
        RBPinv = jax.lax.dot_general(
            RB, Pinv, (((2,), (1,)), ((0,), (0,))), preferred_element_type=A.dtype,
            precision=hi)                                  # (G, N, BS)
        A = (A
             - jax.lax.dot_general(RB, M, (((2,), (1,)), ((0,), (0,))),
                                   preferred_element_type=A.dtype,
                                   precision=hi)
             + jax.lax.dot_general(RBPinv, E.T, (((2,), (0,)), ((), ())),
                                   preferred_element_type=A.dtype,
                                   precision=hi))
        # overwrite the pivot rows with W: rowmask = E @ 1 (N, 1)
        rowmask = jnp.sum(E, axis=1, keepdims=True)        # (N, 1)
        scatterW = jax.lax.dot_general(                    # (G, N, N)
            E, W, (((1,), (1,)), ((), ())), preferred_element_type=A.dtype,
            precision=hi)                                  # (N, G, N) !
        scatterW = jnp.swapaxes(scatterW, 0, 1)
        A = A * (1.0 - rowmask[None]) + scatterW
        return A, logdet

    A, logdet = jax.lax.fori_loop(
        0, N // BS, block_step, (A0, jnp.zeros((G, 1), A0.dtype)))
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


def _chol_inverse_impl(A):
    """XLA Cholesky-based (A^-1, log|A|): the off-TPU path and the large-N
    fallback once a (G=1, N, N) block no longer fits the VMEM budget."""
    L = jax.lax.linalg.cholesky(A)
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True,
                                           lower=True)
    Ainv = jnp.einsum("bki,bkj->bij", Linv, Linv,
                      precision=jax.lax.Precision.HIGHEST)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    return Ainv, logdet


@jax.custom_batching.custom_vmap
def _sweep_inverse_impl(A):
    return _sweep_inverse_impl_inner(A)


@_sweep_inverse_impl.def_vmap
def _sweep_inverse_impl_vmap(axis_size, in_batched, A):
    """Collapse vmapped axes into the kernel's batch dimension.

    Without this rule, callers that vmap a PER-INSTANCE mll (restart/task/
    study axes — every fit in the engine) trace the kernel at batch size 1:
    ``_choose_g(B=1) == 1``, i.e. 4096 grid cells of G=1 instead of 512
    cells of G=8 — measured 19.1 us/eval vs 11.4 us/eval at the headline
    shape (docs/PROFILE_HEADLINE_r4.json, full pipeline vs pre-batched
    stages).  Flattening the mapped axis lets ``_choose_g`` see the true
    batch; nested vmaps collapse recursively.
    """
    del axis_size, in_batched
    N = A.shape[-1]
    inv, logdet = _sweep_inverse_impl(A.reshape((-1, N, N)))
    return ((inv.reshape(A.shape), logdet.reshape(A.shape[:-2])),
            (True, True))


def _sweep_inverse_impl_inner(A):
    B, N, _ = A.shape
    g = _choose_g(B, N, jnp.dtype(A.dtype).itemsize)
    if jax.default_backend() != "tpu" or g < 1 or N > _SWEEP_MAX_N:
        return _chol_inverse_impl(A)

    Ap = _pad_batch(A, g)
    Bp = Ap.shape[0]
    # The elementary (VPU rank-1) sweep is the production kernel; the
    # blocked (MXU rank-BLOCK) variant measured slower at every shape tried
    # on v5e (see the threshold table above) and stays opt-in.  The pair
    # (rank-2) variant halves the serial trip count (see _PAIR_STEP).
    use_blocked = N >= _BLOCKED_MIN_N and N % BLOCK == 0
    if use_blocked:
        kernel = _sweep_kernel_blocked
    elif _PAIR_STEP and N % 2 == 0:
        kernel = _sweep_kernel_pair
    elif _STEP_VARIANT == "fused":
        kernel = _sweep_kernel_fused
    else:
        kernel = _sweep_kernel
    inv, logdet = pl.pallas_call(
        kernel,
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
