"""Fused Cholesky->inverse prototype probe (VERDICT r4 weak #2, part 2).

The sweep inverse executes 2N^3 nominal FLOPs where inverse-via-Cholesky
needs ~N^3 (L, then L^-1, then L^-T L^-1 at ~N^3/3 each, the last one on
the MXU).  The FLOP argument ignores how TPUs execute triangular updates:
a VMEM-resident rank-1 Cholesky step still touches FULL (G, N, N) tiles
(masked), so its serial loop costs the same *traversals* per step as the
sweep's — and a fused chol->inverse needs TWO such N-step loops (factorize
+ invert L) where the sweep needs ONE.

This probe times the first loop alone: a Pallas right-looking rank-1
Cholesky with the sweep's exact tile shapes (2 masked extractions + 1
masked FMA + 1 select per step, vs the sweep's 2 extractions + 1 FMA + 2
selects).  If chol-alone costs >= ~half the full sweep, the fused scheme's
two loops cannot beat the sweep's one, and the 2x nominal-FLOP advantage
is dead on this hardware.  Correctness is asserted against
``jnp.linalg.cholesky`` before timing.

    python -u scripts/bench_chol_fused_probe.py --out docs/CHOL_FUSED_PROBE.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4096)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from scamlgp_tpu.ops import pallas_sweep as ps

    B, N, reps = args.B, args.N, args.reps
    g = ps._choose_g(B, N, 4)

    def _chol_kernel(a_ref, l_ref):
        G, n, _ = a_ref.shape
        A = a_ref[:]
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

        def step(k, A):
            e_lane = (col_idx == k).astype(A.dtype)       # (1, 1, N)
            e_sub = (row_idx == k).astype(A.dtype)        # (1, N, 1)
            col = jnp.sum(A * e_lane, axis=2, keepdims=True)   # (G, N, 1)
            row = jnp.sum(A * e_sub, axis=1, keepdims=True)    # (G, 1, N)
            d = jnp.sum(row * e_lane, axis=2, keepdims=True)   # (G, 1, 1)
            inv_sqrt = jax.lax.rsqrt(d)
            c = col * inv_sqrt                                  # L col k
            r = row * inv_sqrt
            trail = ((row_idx > k) & (col_idx > k)).astype(A.dtype)
            A = A - c * r * trail                # masked rank-1 (FMA pass)
            # write L's column k (diag + below) in place
            keep = (col_idx == k) & (row_idx >= k)
            A = jnp.where(keep, jnp.broadcast_to(c, A.shape), A)
            return A

        A = jax.lax.fori_loop(0, n, step, A)
        # zero the strict upper triangle -> L
        l_ref[:] = A * (row_idx >= col_idx).astype(A.dtype)

    def chol(A):
        return pl.pallas_call(
            _chol_kernel,
            out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(B // g,),
                in_specs=[pl.BlockSpec((g, N, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((g, N, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(A)

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (B, N, 8), jnp.float32)
    A = jnp.einsum("bnk,bmk->bnm", X, X) + 10.0 * jnp.eye(N)

    chol_j = jax.jit(chol)
    L = chol_j(A)
    ref = jnp.linalg.cholesky(A[:8])
    err = float(jnp.max(jnp.abs(L[:8] - ref)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print(f"pallas chol vs jnp.linalg.cholesky: max abs err {err:.2e} "
          f"(rel {rel:.2e})", flush=True)
    assert rel < 1e-4, "prototype Cholesky incorrect"

    def timed(fn, x, label, respd=False):
        y = fn(x)
        _ = float(jnp.sum(y[0, 0]))
        t0 = time.time()
        carry = x
        for r in range(reps):
            out = fn(carry)
            # chain through a scalar so axon can't elide, while keeping
            # the input SPD across reps
            carry = x * (1.0 + 1e-9 * out[0, 0, 0])
        _ = float(jnp.sum(fn(carry)[0, 0]))
        dt = (time.time() - t0) / (reps + 1)
        print(f"{label}: {dt*1e3:.2f} ms/batch ({B/dt:.0f}/s)", flush=True)
        return dt

    t_chol = timed(chol_j, A, "pallas rank-1 Cholesky (one N-step loop)")
    sweep_inv = jax.jit(lambda a: ps.sweep_inverse(a)[0])
    t_sweep = timed(sweep_inv, A, "sweep inverse (one N-step loop)")

    fused_lower_bound = 2.0 * t_chol   # factorize + invert-L, same loop cost
    out = {
        "backend": jax.default_backend(),
        "B": B, "N": N, "G": g, "reps": reps,
        "chol_ms_per_batch": round(t_chol * 1e3, 2),
        "sweep_ms_per_batch": round(t_sweep * 1e3, 2),
        "chol_over_sweep": round(t_chol / t_sweep, 3),
        "fused_chol_inverse_lower_bound_ms": round(
            fused_lower_bound * 1e3, 2),
        "fused_over_sweep_lower_bound": round(
            fused_lower_bound / t_sweep, 3),
        "verdict": ("fused chol->inverse LOSES: two serial N-step loops "
                    "cost >= 2x the chol loop, which alone is "
                    f"{t_chol / t_sweep:.2f}x the whole sweep"
                    if fused_lower_bound > t_sweep else
                    "fused chol->inverse could win - implement it"),
        "max_abs_err_vs_xla_cholesky": err,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
