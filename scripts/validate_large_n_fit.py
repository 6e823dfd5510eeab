"""Large-N FIT accuracy: f32 fit + f64-CPU final refit vs the f64 oracle.

BASELINE config 5's accuracy leg was validated for the *predictive* path
(``docs/LARGE_N_VALIDATION.json``); this closes the *fit* path (VERDICT r4
weak #4): at N >= 512 the f32 MLL surface is distorted enough that the
fitted noise saturates at its Interval(1e-8, 1e-2) ceiling, and the
in-graph chol64 island crashes the axon TPU compiler
(``docs/PROBE_CHOL64_r4.json``).  The fix measured here:
``models/fit.py::refine_map_f64_cpu`` — fit in f32 on the accelerator,
then polish ONCE against the exact f64 objective on the coexisting host
CPU backend.

Per N: draw y from a known GP (f64), fit three ways from identical
restart stacks — f64 oracle (CPU), f32 (default backend), f32 + f64-CPU
polish — and compare constrained hyperparameters and f64 objectives.

    python -u scripts/validate_large_n_fit.py --out docs/LARGE_N_FIT.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[512, 1024])
    ap.add_argument("--d", type=int, default=6)
    ap.add_argument("--restarts", type=int, default=3)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--polish-steps", type=int, default=40)
    ap.add_argument("--noise", type=float, default=1e-3)
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU backend (CI mode; the f32 leg then runs "
                         "on CPU too)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.models import fit as fit_lib
    from scamlgp_tpu.models import gp

    cpu = jax.devices("cpu")[0]
    cfg = gp.source_gp_config()
    rows = []

    for N in args.sizes:
        key = jax.random.PRNGKey(N)
        k_x, k_f, k_n, k_r = jax.random.split(key, 4)
        with jax.default_device(cpu):
            X = jax.random.uniform(k_x, (N, args.d), jnp.float64)
            true = gp.Constrained(
                lengthscale=jnp.full((args.d,), 0.5, jnp.float64),
                outputscale=jnp.asarray(1.0, jnp.float64),
                noise=jnp.asarray(args.noise, jnp.float64))
            K = gp.gram(cfg, true, X)
            L = jnp.linalg.cholesky(
                K + true.noise * jnp.eye(N, dtype=jnp.float64))
            y = L @ jax.random.normal(k_f, (N,), jnp.float64)

        # identical restart stacks (f64 master, f32 copy)
        inits = [gp.init_params(cfg, args.d, jnp.float64)]
        for r in range(args.restarts):
            inits.append(gp.sample_params(
                cfg, jax.random.fold_in(k_r, r), args.d, jnp.float64))
        stack64 = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *inits)
        stack32 = jax.tree_util.tree_map(
            lambda l: l.astype(jnp.float32), stack64)

        def run_fit(stack, Xd, yd, device):
            def objective(p):
                return gp.map_objective(cfg, p, Xd, yd)

            with jax.default_device(device):
                return fit_lib.fit_map_restarts(
                    objective, stack, num_steps=args.steps)

        t0 = time.time()
        with jax.default_device(cpu):
            oracle = run_fit(stack64, X, y, cpu)
        t_oracle = time.time() - t0

        dev = jax.devices()[0]
        X32 = jax.device_put(X.astype(jnp.float32), dev)
        y32 = jax.device_put(y.astype(jnp.float32), dev)
        t0 = time.time()
        f32 = run_fit(stack32, X32, y32, dev)
        jax.block_until_ready(f32.params.raw_noise)
        t_f32 = time.time() - t0

        t0 = time.time()
        polished = fit_lib.refine_map_f64_cpu(
            cfg, f32.params, X, y, num_steps=args.polish_steps)
        t_polish = time.time() - t0

        def report(params):
            c = gp.constrain(cfg, jax.tree_util.tree_map(
                lambda l: jnp.asarray(l, jnp.float64), params))
            with jax.default_device(cpu):
                obj = float(gp.map_objective(
                    cfg, jax.tree_util.tree_map(
                        lambda l: jnp.asarray(l, jnp.float64), params),
                    X, y))
            return {
                "lengthscale_mean": float(jnp.mean(c.lengthscale)),
                "outputscale": float(c.outputscale),
                "noise": float(c.noise),
                "noise_at_ceiling": bool(c.noise > 0.99e-2),
                "objective_f64": obj,
            }

        r_oracle, r_f32, r_pol = (report(oracle.params),
                                  report(f32.params),
                                  report(polished.params))
        row = {
            "N": N, "d": args.d, "true_noise": args.noise,
            "oracle_f64_cpu": {**r_oracle, "wall_s": round(t_oracle, 1)},
            "f32_fit": {**r_f32, "wall_s": round(t_f32, 1)},
            "f32_plus_f64_polish": {**r_pol, "wall_s": round(t_polish, 1)},
            "polish_vs_oracle": {
                "noise_rel_err": abs(r_pol["noise"] - r_oracle["noise"])
                / r_oracle["noise"],
                "ls_rel_err": abs(r_pol["lengthscale_mean"]
                                  - r_oracle["lengthscale_mean"])
                / r_oracle["lengthscale_mean"],
                "objective_gap": r_pol["objective_f64"]
                - r_oracle["objective_f64"],
            },
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
