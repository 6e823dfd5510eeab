"""Run a reference workload through the on-device campaign and record regret.

Reproduces the BASELINE.md experiment grid rows (e.g. Branin T8_P32 sigma=1.0,
Hartmann3D T8_P32 sigma=0.1, Hartmann6D T8_P128 sigma=0.1 — reference
``configurations/{branin,hartmann3,hartmann6}.py``) on whatever backend jax
selects (the real TPU chip under axon; CPU with ``JAX_PLATFORMS=cpu``).

Example:
    python scripts/run_campaign_validation.py --benchmark Hartmann3D \
        --tasks 8 --points 32 --sigma 0.1 --evals 40 --studies 16 \
        --out docs/hm3_t8_p32_n01_regrets_tpu.npy
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", required=True,
                    choices=["Branin", "Hartmann3D", "Hartmann6D",
                             "Quadratic"])
    ap.add_argument("--tasks", type=int, default=8)
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--evals", type=int, default=40)
    ap.add_argument("--studies", type=int, default=16)
    ap.add_argument("--f64", action="store_true",
                    help="float64 (CPU parity mode); default f32")
    ap.add_argument("--loop", default="host", choices=["host", "device"])
    ap.add_argument("--fit-method", default="map",
                    choices=["map", "hmc", "nuts", "vi"])
    ap.add_argument("--mll-method", default="chol",
                    choices=["chol", "sweep", "chol64"],
                    help="'sweep' routes every fit MLL through the Pallas "
                         "inverse kernels (analytic VJP)")
    ap.add_argument("--acq-budget", default="standard",
                    choices=["standard", "driver"],
                    help="acquisition budget: campaign defaults (256/4/30) "
                         "or the sequential driver's (1024/8/50)")
    ap.add_argument("--optimum-method", default="shgo",
                    choices=["shgo", "device"],
                    help="'device': on-device multi-start minima instead of "
                         "host-side SHGO (much faster setup for 6-D)")
    ap.add_argument("--study-chunk", type=int, default=None,
                    help="sequential BO-loop chunks of at most this many "
                         "studies (None = run_campaign's auto fault "
                         "guard; large HM6 campaigns fault on axon even "
                         "at N=128 when S*M is big)")
    ap.add_argument("--meta-fit-chunks", type=int, default=1,
                    help="split the meta-fit into this many sequential "
                         "dispatches (bounds device memory at large "
                         "studies*tasks; must divide --studies)")
    ap.add_argument("--shard-studies", action="store_true",
                    help="shard the study axis over all devices")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force CPU backend with N virtual devices (the axon "
                         "TPU plugin ignores JAX_PLATFORMS=cpu)")
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="checkpoint/resume the campaign state at this path "
                         "(resumes automatically if it exists)")
    ap.add_argument("--stop-after", type=int, default=None,
                    help="checkpoint and exit after N iterations "
                         "(pre-emption drill)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--plot", default=None, metavar="PDF",
                    help="render a regret figure through the plotting layer "
                         "(campaign -> study schema -> grouped_results)")
    args = ap.parse_args()

    import jax

    # persistent compile cache: tpuq retries skip the 20-40 s XLA compiles
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
    t0 = time.time()
    fn, tps, md, optima = campaign_inputs_from_benchmark(
        cls, [args.points] * args.tasks, study_seeds=range(args.studies),
        noise_std=args.sigma, dtype=dtype,
        optimum_method=args.optimum_method)
    # target tasks are unseeded (fresh draw per process): on resume the
    # campaign restores task_params/meta_data from its checkpoint, and the
    # matching optima are persisted next to it
    if args.checkpoint:
        optima_path = str(args.checkpoint) + "_optima.npy"
        # load persisted optima ONLY when the campaign checkpoint exists —
        # they must correspond to the task draws the checkpoint restores.
        # A stale _optima.npy from a run pre-empted before its first
        # checkpoint is overwritten with the fresh draws' optima.
        if (os.path.exists(str(args.checkpoint) + ".npz")
                and os.path.exists(optima_path)):
            optima = jnp.asarray(np.load(optima_path), dtype)
        else:
            os.makedirs(os.path.dirname(optima_path) or ".", exist_ok=True)
            np.save(optima_path, np.asarray(optima))
    t_setup = time.time() - t0

    mesh = None
    if args.shard_studies:
        from scamlgp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(study=len(jax.devices()), task=1)

    budget = {}
    if args.acq_budget == "driver":
        # the sequential driver's heavier acquisition settings
        # (bo/optimize.py defaults: sobol-1024 raw, 8 restarts, 50 steps) —
        # isolates the campaign's lighter default budget (VERDICT r3 weak 5)
        budget = dict(acq_raw_samples=1024, acq_topk=8, acq_steps=50)
    cfg = CampaignConfig(n_evaluations=args.evals, noise_std=args.sigma,
                         fit_method=args.fit_method,
                         mll_method=args.mll_method, **budget)
    t0 = time.time()
    res = run_campaign(fn, tps, md, jax.random.PRNGKey(0), cfg=cfg,
                       loop=args.loop, mesh=mesh,
                       meta_fit_chunks=args.meta_fit_chunks,
                       checkpoint_path=args.checkpoint,
                       stop_after=args.stop_after,
                       study_chunk=args.study_chunk)
    reg = np.asarray(simple_regret(res.y_clean, optima))
    t_run = time.time() - t0

    # summarize only the filled prefix (truncated runs leave zeroed slots)
    X_np = np.asarray(res.X)
    filled = int(np.any(X_np != 0.0, axis=(0, 2)).sum())
    if filled < args.evals:
        print(f"# truncated run: {filled}/{args.evals} iterations filled "
              f"(resume with --checkpoint to complete)")
        reg = reg[:, :max(filled, 1)]
    med = np.median(reg, axis=0)
    iters = sorted({i for i in (1, 5, 10, 20, 30, 40, 60, 80, reg.shape[1])
                    if i <= reg.shape[1]})
    print(json.dumps({
        "benchmark": args.benchmark, "tasks": args.tasks,
        "points": args.points, "sigma": args.sigma, "evals": args.evals,
        "studies": args.studies, "dtype": str(dtype.__name__),
        "backend": jax.default_backend(),
        "setup_s": round(t_setup, 1), "run_s": round(t_run, 1),
        "median_regret": {str(i): float(med[i - 1]) for i in iters},
        "mean_final_regret": float(np.mean(reg[:, -1])),
        "median_final_regret": float(np.median(reg[:, -1])),
    }))
    if args.out:
        np.save(args.out, reg)
        print(f"saved {reg.shape} -> {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        from scamlgp_tpu.benchmarking.configurations.styles import (
            OPTIMIZER_STYLES,
        )
        from scamlgp_tpu.benchmarking.experiment_config_utils import (
            Experiment,
        )
        from scamlgp_tpu.benchmarking.jax_adapters import (
            campaign_to_study_results,
        )
        from scamlgp_tpu.benchmarking.plotting import grouped_results
        from scamlgp_tpu.bo.core import Objective
        from scamlgp_tpu.bo.optimizer import ScaMLGPBO

        studies = campaign_to_study_results(
            cls, [args.points] * args.tasks, list(range(args.studies)),
            res, optima)
        config = Experiment(
            optimizer=ScaMLGPBO,
            benchmark={"cls": args.benchmark,
                       "kwargs": {"n_data_per_task":
                                  [args.points] * args.tasks}},
            n_evaluations=args.evals, n_studies=args.studies, compute="TPU")
        runs = [{"experiment_config": config.__dict__, "studies": studies}]
        title = (f"{args.benchmark} M={args.tasks} N={args.points} "
                 f"sigma={args.sigma} ({jax.default_backend()})")
        fig = grouped_results(runs, optimizer_styles=OPTIMIZER_STYLES,
                              groups={title: [config]},
                              robust_statistics=True,
                              objective=Objective("loss", False),
                              use_regrets=True)
        fig.savefig(args.plot, bbox_inches="tight")
        print(f"figure -> {args.plot}")


if __name__ == "__main__":
    main()
