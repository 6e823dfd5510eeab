"""Measured VPU ceiling for the sweep-inverse roofline (VERDICT r4 weak #2).

The headline MLL kernel's bound is the VPU: the sweep inverse is N serial
rank-1 updates over a VMEM-resident (G, N, N) block — elementwise work the
MXU can't help with.  Round 4 asserted "within a small factor of the VPU
traversal floor" without measuring the floor.  This benchmark measures it:
a Pallas kernel with the sweep's exact tile shapes and grid that performs N
fori_loop steps of ONE pure multiply-add traversal of the block (the
minimum any rank-1-update scheme must touch), nothing else.

Outputs (docs/VPU_CEILING.json):
- ``floor_traversals_per_s`` / ``ceiling_evals_per_s``: the pure-FMA loop,
  in per-matrix terms (1 matrix = N traversals = one nominal 2N^3-FLOP
  inverse).  This is the speed-of-light for ANY N-step x N^2-touch kernel
  at these shapes, including a hypothetical fused Cholesky->inverse.
- ``sweep_evals_per_s``: the real sweep kernel at the same shapes.
- ``sweep_traversal_equiv``: how many pure traversals one sweep step costs
  (extractions + selects + FMA; the kernel does ~5 logical passes).

    python -u scripts/bench_vpu_ceiling.py --out docs/VPU_CEILING.json
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

    def _floor_kernel(a_ref, o_ref):
        A = a_ref[:]

        def step(k, A):
            # one full multiply-add traversal of the (G, N, N) block —
            # float(k)-dependent so no two iterations can be folded
            return A * 0.9999999 + jnp.float32(k) * 1e-12

        o_ref[:] = jax.lax.fori_loop(0, N, step, A)

    def floor(A):
        return pl.pallas_call(
            _floor_kernel,
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

    floor_j = jax.jit(floor)

    def timed(fn, x, label):
        y = fn(x)                     # compile + warm
        _ = float(jnp.sum(y[0, 0]) if y.ndim > 2 else jnp.sum(y))
        t0 = time.time()
        carry = x
        for r in range(reps):
            carry = fn(carry * 1.0000001)  # chain: no elision on axon
        _ = float(jnp.sum(carry[0, 0]))
        dt = (time.time() - t0) / reps
        print(f"{label}: {dt*1e3:.2f} ms/batch "
              f"({B/dt:.0f} matrices/s)", flush=True)
        return dt

    t_floor = timed(floor_j, A, "pure-FMA floor (N traversals)")

    sweep_inv = jax.jit(lambda a: ps.sweep_inverse(a)[0])
    t_sweep = timed(sweep_inv, A, "sweep inverse")

    out = {
        "backend": jax.default_backend(),
        "B": B, "N": N, "G": g, "reps": reps,
        "floor_ms_per_batch": round(t_floor * 1e3, 2),
        "ceiling_evals_per_s": round(B / t_floor, 1),
        "floor_elem_fma_per_s": round(B * N * N * N / t_floor / 1e12, 4),
        "floor_unit": "TFMA/s over (G,N,N) VMEM blocks",
        "sweep_ms_per_batch": round(t_sweep * 1e3, 2),
        "sweep_evals_per_s": round(B / t_sweep, 1),
        "sweep_traversal_equiv": round(t_sweep / t_floor, 2),
        "sweep_pct_of_ceiling": round(100.0 * t_floor / t_sweep, 1),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
