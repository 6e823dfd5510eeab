"""Time a device-resident tabular campaign at reference experiment shape.

The reference's tabular experiments (HPOBench lr/svm: 28 tasks x 64 pts,
60 evals x 256 studies — ``lr_tabular.py:44``; PD1: 22 x 128, 60 x 256) run
as a 64-process CPU pool; the repo's sequential TPU driver does ~2 it/s
(``docs/SEQ_DRIVER_TPU.json``) ~= 120 studies/hour.  This benchmark runs the
same shape through ``run_campaign`` with a device-resident grid LUT
(``benchmarking/tabular_adapters.py``) and reports studies/hour.

Real table blobs are absent on this box (as in the reference repo), so
tables are synthetic (smooth random trigonometric surfaces per task) at the
exact reference shape — the timing exercises the full campaign machinery
(meta-fit, refits, acquisition, LUT gather); regret numbers are not
meaningful and not reported.

    python -u scripts/bench_tabular_campaign.py --out docs/TABULAR_CAMPAIGN_TPU.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="32,32",
                    help="grid levels per dim (comma-separated)")
    ap.add_argument("--tasks", type=int, default=28)
    ap.add_argument("--points", type=int, default=64)
    ap.add_argument("--evals", type=int, default=60)
    ap.add_argument("--studies", type=int, default=256)
    ap.add_argument("--meta-fit-chunks", type=int, default=32)
    ap.add_argument("--study-chunk", type=int, default=None)
    ap.add_argument("--mll-method", default="chol", choices=["chol", "sweep"],
                    help="fit-objective factorization: 'sweep' routes every "
                         "refit MLL through the Pallas inverse kernels "
                         "(analytic VJP) -- the latency-bound serial "
                         "L-BFGS/linesearch steps are XLA-Cholesky-bound "
                         "at 'chol'")
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    os.makedirs(".jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.benchmarking.tabular_adapters import make_grid_lut_fn
    from scamlgp_tpu.models import scamlgp as m
    from scamlgp_tpu.parallel.campaign import (
        CampaignConfig,
        run_campaign,
        simple_regret,
    )

    t0 = time.time()
    levels = [int(x) for x in args.levels.split(",")]
    d = len(levels)
    S, M, N, E = args.studies, args.tasks, args.points, args.evals

    # synthetic per-(study, task) tables: shared smooth base + per-task
    # perturbation, evaluated on the grid (row-major, first dim slowest)
    rng = np.random.default_rng(0)
    axes = [np.linspace(0.5 / n, 1 - 0.5 / n, n) for n in levels]
    mesh = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
    grid = mesh.reshape(-1, d)                      # (R, d)

    def surface(key_row):
        w = key_row[:d * 3].reshape(3, d) * 4.0
        ph = key_row[d * 3:d * 3 + 3] * 2 * np.pi
        amp = 0.5 + key_row[d * 3 + 3:d * 3 + 6]
        return sum(a * np.cos(grid @ wi + p)
                   for a, wi, p in zip(amp, w, ph))

    base_keys = rng.standard_normal((S, d * 3 + 6))
    task_keys = rng.standard_normal((S, M, d * 3 + 6)) * 0.3

    tables = np.empty((S, grid.shape[0]), np.float32)
    meta_xs = rng.uniform(size=(S, M, N, d)).astype(np.float32)
    meta_ys = np.empty((S, M, N), np.float32)
    snap = [np.minimum((meta_xs[..., i] * n).astype(int), n - 1)
            for i, n in enumerate(levels)]
    flat = snap[0]
    for i in range(1, d):
        flat = flat * levels[i] + snap[i]
    for s in range(S):
        tables[s] = surface(base_keys[s])
        for t in range(M):
            task_tab = surface(base_keys[s] + task_keys[s, t])
            meta_ys[s, t] = task_tab[flat[s, t]]

    # per-task standardization (pack_task_data semantics), vectorized
    mu = meta_ys.mean(axis=-1, keepdims=True)
    sd = meta_ys.std(axis=-1, ddof=1, keepdims=True)
    meta = m.TaskData(
        X=jnp.asarray(meta_xs), y=jnp.asarray((meta_ys - mu) / sd),
        mask=jnp.ones((S, M, N), jnp.float32),
        mean=jnp.asarray(mu[..., 0]), std=jnp.asarray(sd[..., 0]))
    task_params = {"table": jnp.asarray(tables)}
    fn = make_grid_lut_fn(levels)
    optima = tables.min(axis=1)
    setup_s = time.time() - t0

    print(json.dumps({"setup_s": round(setup_s, 1)}), flush=True)
    os.environ.setdefault("SCAMLGP_ITER_DEBUG", "1")
    cfg = CampaignConfig(n_evaluations=E, noise_std=0.0,
                         mll_method=args.mll_method)
    t1 = time.time()
    ckpt = (f".tpuq/ckpt/tabular_campaign_{args.mll_method}"
            if os.path.isdir(".tpuq") else None)
    res = run_campaign(fn, task_params, meta, jax.random.PRNGKey(0),
                       cfg=cfg, meta_fit_chunks=args.meta_fit_chunks,
                       study_chunk=args.study_chunk,
                       checkpoint_path=ckpt)
    reg = np.asarray(simple_regret(res.y_clean, optima))
    run_s = time.time() - t1
    if ckpt and os.path.exists(ckpt + ".npz"):
        os.remove(ckpt + ".npz")

    seq_driver_it_s = 0.503  # docs/SEQ_DRIVER_TPU.json median iteration
    out = {
        "backend": jax.default_backend(),
        "mll_method": args.mll_method,
        "levels": levels, "tasks": M, "points": N,
        "evals": E, "studies": S,
        "setup_s": round(setup_s, 1),
        "campaign_s": round(run_s, 1),
        "s_per_iter": round(run_s / E, 3),
        "s_per_study_iter": round(run_s / E / S, 5),
        "studies_per_hour": round(S / (run_s / 3600.0), 1),
        "seq_driver_studies_per_hour": round(
            3600.0 / (seq_driver_it_s * E), 1),
        "speedup_vs_seq_driver": round(
            (S / run_s) * seq_driver_it_s * E, 1),
        "median_final_regret_synthetic": float(np.median(reg[:, -1])),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
