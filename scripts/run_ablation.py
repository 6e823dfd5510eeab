"""Ablation campaigns: average cumulative regret vs meta-data scale.

Reproduces the reference's ablation experiments (average cumulative simple
regret +/- SEM as a function of the number of meta-tasks M or points per
task N_m — ``configurations/branin_ablation_num_meta_tasks.py:17-18``,
``.../branin_ablation_num_points_per_task.py:17-18``, plotted by
``plotting.py:339-426``) through the on-device vectorized campaign.

Example:
    python scripts/run_ablation.py --benchmark Branin --axis tasks \
        --values 2 4 8 16 32 --points 32 --sigma 1.0 --evals 40 --studies 16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", required=True)
    ap.add_argument("--axis", choices=["tasks", "points"], required=True)
    ap.add_argument("--values", type=int, nargs="+", required=True)
    ap.add_argument("--tasks", type=int, default=8,
                    help="fixed M when axis=points")
    ap.add_argument("--points", type=int, default=32,
                    help="fixed N_m when axis=tasks")
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--evals", type=int, default=40)
    ap.add_argument("--studies", type=int, default=16)
    ap.add_argument("--seed-offset", type=int, default=0,
                    help="first study seed (split big configs into batches)")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--optimum-method", default="shgo",
                    choices=["shgo", "device"])
    ap.add_argument("--meta-fit-chunks", type=int, default=1,
                    help="sequential meta-fit dispatches (bounds device "
                         "memory at large studies*tasks; must divide "
                         "--studies)")
    ap.add_argument("--mll-method", default="chol",
                    choices=["chol", "sweep", "chol64"],
                    help="fit-objective factorization (chol64 = f64-island "
                         "for ill-conditioned large-N f32 systems; enables "
                         "x64 while keeping campaign buffers at --f64's "
                         "dtype)")
    ap.add_argument("--study-chunk", type=int, default=0,
                    help="run the study batch in sequential campaigns of "
                         "at most this many studies (0 = auto: 8 when "
                         "N >= 256 on TPU — the axon backend faults on "
                         "single campaign programs past ~8 studies at "
                         "N=256; studies are independent, so chunked "
                         "campaigns are statistically equivalent)")
    ap.add_argument("--checkpoint", action="store_true",
                    help="checkpoint each (value, chunk) campaign next to "
                         "--out's chunk cache so a fault/stall mid-campaign "
                         "resumes at checkpoint granularity instead of "
                         "recomputing the whole value")
    ap.add_argument("--out", default=None, help="JSON output path")
    args = ap.parse_args()

    import jax

    # persistent compile cache: tpuq retries and repeated grid points skip
    # the 20-40 s XLA compiles
    os.makedirs(".jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    if args.f64 or args.mll_method == "chol64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.benchmarking import benchmarks as B
    from scamlgp_tpu.benchmarking.jax_adapters import (
        campaign_inputs_from_benchmark,
    )
    from scamlgp_tpu.parallel.campaign import (
        CampaignConfig,
        run_campaign,
        simple_regret,
    )

    dtype = jnp.float64 if args.f64 else jnp.float32
    cls = getattr(B, args.benchmark)
    cfg = CampaignConfig(n_evaluations=args.evals, noise_std=args.sigma,
                         mll_method=args.mll_method)

    # resume support: sporadic TPU device faults kill long multi-value
    # runs, so each completed value is persisted immediately and skipped on
    # re-invocation with the same --out
    rows = []
    done = set()
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f).get("rows", [])
        done = {r["value"] for r in rows}
        if done:
            print(f"resuming; values already computed: {sorted(done)}",
                  flush=True)

    def persist():
        summary = {"benchmark": args.benchmark, "axis": args.axis,
                   "sigma": args.sigma, "evals": args.evals,
                   "studies": args.studies,
                   "backend": jax.default_backend(),
                   "dtype": str(dtype.__name__),
                   # study chunk c0 > 0 runs under fold_in(PRNGKey(0), c0);
                   # the first chunk (and unchunked runs) under PRNGKey(0)
                   "prng": "PRNGKey(0); fold_in(c0) for later study chunks",
                   "rows": rows}
        if args.out:
            with open(args.out, "w") as f:
                json.dump(summary, f, indent=1)
        return summary

    for v in args.values:
        if v in done:
            continue
        M = v if args.axis == "tasks" else args.tasks
        N = args.points if args.axis == "tasks" else v
        t0 = time.time()
        chunk = args.study_chunk
        if chunk == 0:
            chunk = (8 if N >= 256 and jax.default_backend() == "tpu"
                     else args.studies)
        chunk = min(chunk, args.studies)
        # chunk-level fault resume: device faults mid-value lose only the
        # running chunk, not the whole value (completed chunks persist in a
        # sidecar next to --out)
        cache_dir = f"{args.out}.chunks" if args.out else None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        reg_parts = []
        for c0 in range(0, args.studies, chunk):
            cache = (os.path.join(cache_dir, f"v{v}_c{c0}.npy")
                     if cache_dir else None)
            if cache and os.path.exists(cache):
                reg_parts.append(np.load(cache))
                continue
            seeds = range(args.seed_offset + c0,
                          args.seed_offset + min(c0 + chunk, args.studies))
            fn, tps, md, optima = campaign_inputs_from_benchmark(
                cls, [N] * M, study_seeds=seeds,
                noise_std=args.sigma, dtype=dtype,
                optimum_method=args.optimum_method)
            # honor --meta-fit-chunks inside study chunks when it divides the
            # chunk's study count (it exists to bound device memory; silently
            # dropping it under chunking could reintroduce the blowup)
            mfc = (args.meta_fit_chunks
                   if len(seeds) % args.meta_fit_chunks == 0 else 1)
            key = (jax.random.PRNGKey(0) if c0 == 0
                   else jax.random.fold_in(jax.random.PRNGKey(0), c0))
            ckpt_path = (os.path.join(cache_dir, f"v{v}_c{c0}.ckpt")
                         if args.checkpoint and cache_dir else None)
            res = run_campaign(fn, tps, md, key,
                               cfg=cfg, meta_fit_chunks=mfc,
                               checkpoint_path=ckpt_path)
            part = np.asarray(simple_regret(res.y_clean, optima))
            if cache:
                np.save(cache, part)
            if ckpt_path and os.path.exists(ckpt_path):
                os.remove(ckpt_path)  # value complete; cache .npy persists
            reg_parts.append(part)
        reg = np.concatenate(reg_parts, axis=0)
        # average cumulative regret per study, then mean +/- SEM over studies
        cum = np.mean(reg, axis=1)
        sem = float(np.std(cum, ddof=1) / np.sqrt(len(cum)))
        row = {"value": v, "M": M, "N": N,
               "mll_method": args.mll_method,
               "avg_cum_regret_mean": float(np.mean(cum)),
               "avg_cum_regret_sem": sem,
               "median_final_regret": float(np.median(reg[:, -1])),
               "wall_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        persist()

    rows.sort(key=lambda r: r["value"])
    print(json.dumps(persist()))


if __name__ == "__main__":
    main()
