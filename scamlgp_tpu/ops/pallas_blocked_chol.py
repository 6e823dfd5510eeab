"""Batched SPD inverse + log-determinant via MXU-tiled blocked Cholesky.

A mid-N factorization kernel (N in roughly [192, 1024]) producing an
explicit inverse, complementing the VMEM-resident elementary sweep
(``pallas_sweep.py``, N <= 128).  Historically the routing choice for the
N=256/512 grid scales (``/root/reference/scamlgp/utils.py:175-192``;
``hartmann6_ablation_num_points_per_task.py:17-18`` needs N=512); since the
analytic MLL-level VJP landed (``ops/inverse_mll.py``), direct XLA Cholesky
MLL measures faster across this whole range and default routing no longer
selects it (see ``_ROUTE_BLOCKED``) — the kernel remains the fast path for
callers that need the materialized inverse itself.

Design (per (G, N, N) grid cell, everything VMEM-resident):

- right-looking blocked Cholesky with block size ``BS``: the BS x BS
  diagonal panel is factored with a rank-1 fori loop (VPU, one-hot masked
  extraction — no dynamic lane indexing), the panel inverse L_bb^{-1} by a
  forward-substitution fori loop, and ALL O(N^3) bulk work — TRSM
  (``A21 @ L_bb^{-T}``), SYRK trailing updates, the blocked L^{-1} forward
  substitution, and the final ``A^{-1} = W^T W`` — runs as batched MXU
  ``dot_general`` at f32-HIGHEST;
- blocks live as SSA *values* over a python-unrolled block loop (static
  slices of the VMEM refs), so there are no one-hot gather/scatter matmuls
  and no (G, N)-axis relayouts — the two structural costs that made the
  in-kernel blocked *sweep* variant lose (``pallas_sweep.py`` threshold
  table);
- the only HBM traffic is one read of A and one write of (A^{-1}, logdet).

Serial VPU work is 2N steps on (G, BS, BS) tiles (vs the sweep's N steps on
(G, N, N)) — asymptotically N*BS^2 instead of N^2*BS, which is what makes
the mid-N regime winnable at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: panel width: serial VPU work scales with N*BS^2, MXU efficiency with
#: K=BS — 64 balances the two on v5e (tunable via bench_blocked_chol.py)
BS = 64

#: matrices per grid cell cap
DEFAULT_G = 8

#: VMEM budget for live blocks + pipeline buffers.  The chip has 16 MB of
#: scoped VMEM/core; the per-G cost model below undercounts pipeline /
#: alignment overhead by ~25% (measured: g=7 at N=256 allocates 16.14 MB
#: against the model's 11.7 MB estimate), so the budget is set with that
#: headroom — a model-estimated 9.5 MB keeps the real allocation < 16 MB.
_VMEM_BUDGET = 9_500_000

#: The HBM-staged variant has NO pipeline buffers (one manual-DMA scratch +
#: the live block values), so the measured-overhead headroom above does not
#: apply to it; its own budget restores coverage to N ~ 1024
#: (model-estimated 11.4 MB at N=1024) — ADVICE r3 medium finding.
_VMEM_BUDGET_STAGED = 12_000_000

#: N range where the kernel can run efficiently; see ``blocked_profitable``
#: for whether routing actually selects it
_MIN_N = 192
_MAX_N = 1024

#: Routing default.  With the analytic MLL-level VJP (ops/inverse_mll.py)
#: the backward pass no longer needs an explicit inverse, and re-measured
#: crossovers (docs/SWEEP_N_r4.json, docs/SWEEP_N_r4_pinned.json, v5e)
#: show direct XLA Cholesky MLL beating this kernel across its whole range:
#: N=256 XLA 14.5k vs blocked 12.8k evals/s; N=512 6.0k vs 5.3k; N=1024
#: 2.22k vs 2.25k (tie).  Default routing therefore never selects it; the
#: kernel remains available explicitly (``blocked_chol_inverse``) for
#: callers that want the materialized inverse itself.
_ROUTE_BLOCKED = False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_values_bytes(N: int, itemsize: int) -> int:
    """Peak VMEM for the live block values (A-lower + L + W each
    nb(nb+1)/2, Linv nb, ~1 temp)."""
    nb = -(-N // BS)
    blocks = 3 * nb * (nb + 1) // 2 + 2 * nb
    return blocks * BS * BS * itemsize


def _choose_g(B: int, N: int, itemsize: int) -> int:
    npad = -(-N // BS) * BS
    # in + out double-buffered pipeline blocks, plus the live block values
    per_g = 4 * npad * npad * itemsize + _block_values_bytes(N, itemsize)
    return min(DEFAULT_G, B, _VMEM_BUDGET // per_g)


def _hbm_staged_fits(N: int, itemsize: int) -> bool:
    """Whether the single-scratch HBM-resident variant fits VMEM: one
    (N, N) scratch + the live block values (no pipeline buffers, hence the
    larger budget)."""
    npad = -(-N // BS) * BS
    need = npad * npad * itemsize + _block_values_bytes(N, itemsize)
    return need <= _VMEM_BUDGET_STAGED


def blocked_runnable(N: int, itemsize: int = 4) -> bool:
    """Whether some blocked-kernel variant can execute at this N within
    VMEM (capability, not preference)."""
    if not (_MIN_N <= N <= _MAX_N):
        return False
    return _choose_g(1, N, itemsize) >= 1 or _hbm_staged_fits(N, itemsize)


def blocked_profitable(N: int, itemsize: int = 4) -> bool:
    """Whether default routing should pick a blocked-kernel variant over
    direct XLA Cholesky MLL at this N.  Measured answer on v5e with the
    analytic VJP: never (see ``_ROUTE_BLOCKED``)."""
    return _ROUTE_BLOCKED and blocked_runnable(N, itemsize)


def _chol_block(P, row, lane, dtype):
    """In-place lower Cholesky of a (G, BS, BS) SPD block; returns
    (L, sum(log(diag^2)) as (G, 1)).  One-hot masked column/row extraction,
    rank-1 trailing downdate per step."""
    G = P.shape[0]

    def step(j, carry):
        P, ld = carry
        e_lane = (lane == j).astype(dtype)                  # (1, 1, BS)
        e_sub = (row == j).astype(dtype)                    # (1, BS, 1)
        col = jnp.sum(P * e_lane, axis=2, keepdims=True)    # (G, BS, 1)
        rowv = jnp.sum(P * e_sub, axis=1, keepdims=True)    # (G, 1, BS)
        d = jnp.sum(rowv * e_lane, axis=2, keepdims=True)   # (G, 1, 1)
        inv_sd = jax.lax.rsqrt(d)
        below = (row > j).astype(dtype)
        right = (lane > j).astype(dtype)
        lcol = col * inv_sd * below                         # (G, BS, 1)
        lrow = rowv * inv_sd * right                        # (G, 1, BS)
        # trailing submatrix is symmetric: row j right of the pivot equals
        # column j below it, so the rank-1 downdate needs no transpose
        P = P - lcol * lrow
        newcol = lcol + jnp.sqrt(d) * e_sub
        P = jnp.where(lane == j, jnp.broadcast_to(newcol, P.shape), P)
        return P, ld + jnp.log(d[:, 0, :])

    P, ld = jax.lax.fori_loop(
        0, P.shape[-1], step, (P, jnp.zeros((G, 1), dtype)))
    tril = (row >= lane).astype(dtype)                      # (1, BS, BS)
    return P * tril, ld


def _triinv_block(L, row, lane, dtype, hi):
    """X = L^{-1} for lower-triangular (G, BS, BS) L by row-wise forward
    substitution: X[j, :] = (e_j - L[j, :j] @ X[:j, :]) / L[j, j]."""

    def step(j, X):
        e_sub = (row == j).astype(dtype)
        e_lane = (lane == j).astype(dtype)
        lrow = jnp.sum(L * e_sub, axis=1, keepdims=True)    # (G, 1, BS)
        d = jnp.sum(lrow * e_lane, axis=2, keepdims=True)   # (G, 1, 1)
        s = jax.lax.dot_general(
            lrow, X, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=dtype, precision=hi)     # (G, 1, BS)
        xrow = (e_lane - s) / d
        return jnp.where(row == j, jnp.broadcast_to(xrow, X.shape), X)

    return jax.lax.fori_loop(0, L.shape[-1], step, jnp.zeros_like(L))


def _inverse_body(read, write, G: int, N: int, dtype):
    """Shared kernel body: blocked Cholesky -> L^{-1} -> W^T W over
    (G, BS, BS) blocks accessed through ``read(i, j)`` / ``write(i, j, V)``
    (VMEM-pipelined refs or a manually-DMA'd scratch).  Returns the (G, 1)
    log-determinants."""
    hi = jax.lax.Precision.HIGHEST
    row = jax.lax.broadcasted_iota(jnp.int32, (1, BS, 1), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, BS), 2)
    nb = N // BS

    def gemm(a, b, ta=False, tb=False):
        ca = 1 if ta else 2
        cb = 2 if tb else 1
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((0,), (0,))),
            preferred_element_type=dtype, precision=hi)

    # ---- right-looking blocked Cholesky (blocks as SSA values) ----
    A = {(i, j): read(i, j) for i in range(nb) for j in range(i + 1)}
    L, Linv = {}, {}
    logdet = jnp.zeros((G, 1), dtype)
    for b in range(nb):
        Lbb, ld = _chol_block(A[(b, b)], row, lane, dtype)
        logdet = logdet + ld
        Li = _triinv_block(Lbb, row, lane, dtype, hi)
        L[(b, b)], Linv[(b, b)] = Lbb, Li
        for i in range(b + 1, nb):
            L[(i, b)] = gemm(A[(i, b)], Li, tb=True)        # TRSM (MXU)
        for i in range(b + 1, nb):
            for j in range(b + 1, i + 1):                   # SYRK/GEMM (MXU)
                A[(i, j)] = A[(i, j)] - gemm(L[(i, b)], L[(j, b)],
                                             tb=True)
        del A[(b, b)]

    # ---- W = L^{-1} by blocked forward substitution (MXU) ----
    W = {}
    for i in range(nb):
        W[(i, i)] = Linv[(i, i)]
        for j in range(i):
            S = gemm(L[(i, j)], W[(j, j)])
            for k in range(j + 1, i):
                S = S + gemm(L[(i, k)], W[(k, j)])
            W[(i, j)] = -gemm(Linv[(i, i)], S)

    # ---- A^{-1} = W^T W, written block-wise (MXU) ----
    for i in range(nb):
        for j in range(i + 1):
            V = gemm(W[(i, i)], W[(i, j)], ta=True)
            for k in range(i + 1, nb):
                V = V + gemm(W[(k, i)], W[(k, j)], ta=True)
            write(i, j, V)
            if i != j:
                write(j, i, jnp.swapaxes(V, 1, 2))
    return logdet


def _make_kernel(N: int):
    def kernel(a_ref, inv_ref, logdet_ref):
        def read(i, j):
            return a_ref[:, i * BS:(i + 1) * BS, j * BS:(j + 1) * BS]

        def write(i, j, V):
            inv_ref[:, i * BS:(i + 1) * BS, j * BS:(j + 1) * BS] = V

        ld = _inverse_body(read, write, a_ref.shape[0], N, a_ref.dtype)
        # logdet block layout is (1, 1, G) — the last two dims always equal
        # the array dims, which keeps the BlockSpec legal for EVERY G
        # (Mosaic requires last-two block dims divisible by (8, 128) or
        # equal to the array; a (G, 1) block is illegal unless G % 8 == 0
        # or G == B, which broke e.g. B=384 -> G=7 on real TPUs)
        logdet_ref[:] = jnp.swapaxes(ld, 0, 1)[None]

    return kernel


def _make_hbm_kernel(N: int):
    """HBM-resident variant (one matrix per grid step, G=1): A stays in
    HBM, is DMA'd once into a single (N, N) VMEM scratch, the inverse is
    computed in place of the scratch, and one DMA writes it back.  Covers
    N where the double-buffered (G, N, N) in/out pipeline of the VMEM
    kernel would blow the 16 MB budget (N ~ 1024)."""

    def kernel(a_hbm, inv_hbm, logdet_ref, scratch, sem_in, sem_out):
        b = pl.program_id(0)
        dma_in = pltpu.make_async_copy(a_hbm.at[b], scratch, sem_in)
        dma_in.start()
        dma_in.wait()

        def read(i, j):
            return scratch[i * BS:(i + 1) * BS, j * BS:(j + 1) * BS][None]

        def write(i, j, V):
            scratch[i * BS:(i + 1) * BS, j * BS:(j + 1) * BS] = V[0]

        # (1, 1, 1) block — always BlockSpec-legal (see _make_kernel note)
        logdet_ref[:] = _inverse_body(read, write, 1, N, scratch.dtype)[None]

        dma_out = pltpu.make_async_copy(scratch, inv_hbm.at[b], sem_out)
        dma_out.start()
        dma_out.wait()

    return kernel


def _pad_to_identity(A, Np):
    """Embed (B, N, N) into (B, Np, Np) as blockdiag(A, I): the inverse of
    the padding block is I and its logdet contribution is 0."""
    B, N, _ = A.shape
    if Np == N:
        return A
    out = jnp.zeros((B, Np, Np), A.dtype)
    out = out.at[:, :N, :N].set(A)
    idx = jnp.arange(N, Np)
    return out.at[:, idx, idx].set(1.0)


def blocked_chol_inverse(A):
    """(A^{-1}, log|A|) for a batch of SPD matrices A: (B, N, N), f32.

    VMEM-resident blocked Cholesky + triangular inverse + W^T W; N is
    padded to a multiple of ``BS`` with an identity block, the batch to a
    multiple of the per-cell G with identity matrices.
    """
    B, N, _ = A.shape
    itemsize = jnp.dtype(A.dtype).itemsize
    Np = ((N + BS - 1) // BS) * BS
    g = _choose_g(B, Np, itemsize)
    if g < 1 and not _hbm_staged_fits(Np, itemsize):
        raise ValueError(f"N={N} exceeds the VMEM budget of the blocked "
                         "Cholesky kernel; route to XLA instead")
    Ap = _pad_to_identity(A, Np)

    if g < 1:
        # HBM-staged path: manual DMA per matrix, no pipeline buffers
        inv, logdet = pl.pallas_call(
            _make_hbm_kernel(Np),
            out_shape=(jax.ShapeDtypeStruct((B, Np, Np), A.dtype),
                       jax.ShapeDtypeStruct((B, 1, 1), A.dtype)),
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((Np, Np), A.dtype),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
            interpret=_interpret(),
        )(Ap)
        return inv[:, :N, :N], logdet[:, 0, 0]

    padB = (-B) % g
    if padB:
        eye = jnp.broadcast_to(jnp.eye(Np, dtype=A.dtype),
                               (padB, Np, Np))
        Ap = jnp.concatenate([Ap, eye])
    Bp = Ap.shape[0]

    inv, logdet = pl.pallas_call(
        _make_kernel(Np),
        out_shape=(jax.ShapeDtypeStruct((Bp, Np, Np), A.dtype),
                   jax.ShapeDtypeStruct((Bp // g, 1, g), A.dtype)),
        grid_spec=pl.GridSpec(
            grid=(Bp // g,),
            in_specs=[pl.BlockSpec((g, Np, Np), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((g, Np, Np), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 1, g), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
        ),
        interpret=_interpret(),
    )(Ap)
    return inv[:B, :N, :N], logdet.reshape(Bp)[:B]
