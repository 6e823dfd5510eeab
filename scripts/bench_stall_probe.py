"""Characterize the axon-tunnel campaign stall (round-4 regression).

Round 3 ran 128 Branin studies unchunked at ~3 s/iteration; round 4's
mitigation (chunk S>16 into 16-study chunks + pin every 40 iterations,
commits 2149377/f3c4042/dd1b04f) produced grid points costing 3,827 s —
~11 s per S=16 iteration with a single pin fetch blocking 437 s.  The
VERDICT asks for a measured latency curve instead of folklore: this probe
times REAL Branin campaigns (same code path as the grid runs,
``run_campaign``) across study batch S x pin cadence x chunking x
host/device loop, using the per-iteration clock ``campaign.ITER_TIMES``.

Each variant persists its row to --out immediately (fault resume by label).

Run on the chip:
    python -u scripts/bench_stall_probe.py --out docs/STALL_PROBE_r5.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--evals", type=int, default=12)
    ap.add_argument("--tasks", type=int, default=2)
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant labels to run")
    args = ap.parse_args()

    import jax

    os.makedirs(".jaxcache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", ".jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.benchmarking import benchmarks as B
    from scamlgp_tpu.benchmarking.jax_adapters import (
        campaign_inputs_from_benchmark,
    )
    from scamlgp_tpu.parallel import campaign
    from scamlgp_tpu.parallel.campaign import CampaignConfig, run_campaign

    E = args.evals
    cfg = CampaignConfig(n_evaluations=E, noise_std=1.0)

    rows = []
    done = set()
    if args.out and os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)["rows"]
        done = {r["label"] for r in rows}

    def persist():
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "evals": E, "M": args.tasks, "N": args.points,
                           "rows": rows}, f, indent=1)

    inputs = {}

    def get_inputs(S):
        if S not in inputs:
            fn, tps, md, opt = campaign_inputs_from_benchmark(
                B.Branin, [args.points] * args.tasks, study_seeds=range(S),
                noise_std=1.0, dtype=jnp.float32, optimum_method="device")
            inputs[S] = (fn, tps, md)
        return inputs[S]

    # ---- variant table -------------------------------------------------
    # (label, S, pin_every, study_chunk, loop)
    variants = [
        # launch-overhead control: trivial chained dispatches
        ("launch_overhead", None, None, None, None),
        # host loop, unchunked, pin only at end: is the S=128 program
        # itself slow, or was round 4 measuring sync overhead?
        ("host_S16_pin_end", 16, 10 ** 6, 0, "host"),
        ("host_S128_pin_end", 128, 10 ** 6, 0, "host"),
        # per-iteration pinning: the r4 mitigation's cost model
        ("host_S16_pin1", 16, 1, 0, "host"),
        ("host_S128_pin1", 128, 1, 0, "host"),
        # r4 default behavior: chunk 16, pin 40
        ("host_S128_chunk16_pin40", 128, 40, 16, "host"),
        # whole-campaign fori_loop program: one launch per campaign
        ("device_S16", 16, None, 0, "device"),
        ("device_S128", 128, None, 0, "device"),
        # second run of the same shape: persistent-cache compile skip
        ("device_S128_rerun", 128, None, 0, "device"),
    ]

    for label, S, pin, chunk, loop in variants:
        if label in done or (args.only and label not in args.only):
            continue
        t0 = time.time()
        if label == "launch_overhead":
            x = jnp.ones((8, 128), jnp.float32)

            @jax.jit
            def step(x):
                return x * 1.000001 + 0.000001

            x = step(x)
            _ = float(x[0, 0])  # compile + first launch
            t1 = time.time()
            K = 30
            for _i in range(K):
                x = step(x)
            _ = float(x[0, 0])
            dt = time.time() - t1
            row = {"label": label, "K": K, "wall_s": round(dt, 3),
                   "per_launch_s": round(dt / K, 4),
                   "setup_s": round(t1 - t0, 1)}
        else:
            fn, tps, md = get_inputs(S)
            if pin is not None:
                campaign._PIN_EVERY = pin
            res = run_campaign(fn, tps, md, jax.random.PRNGKey(0), cfg=cfg,
                               loop=loop, study_chunk=chunk)
            _ = float(np.asarray(res.y_clean).sum())  # force full fetch
            wall = time.time() - t0
            its = list(campaign.ITER_TIMES)
            row = {"label": label, "S": S, "pin_every": pin,
                   "study_chunk": chunk, "loop": loop,
                   "wall_s": round(wall, 1),
                   "n_iters": len(its),
                   "iter_times": [round(t, 2) for t in its]}
            if its:
                arr = np.asarray(its)
                row["iter_median_s"] = round(float(np.median(arr)), 3)
                row["iter_sum_s"] = round(float(arr.sum()), 1)
                # steady state: drop the compile-bearing first iteration
                if len(arr) > 1:
                    row["per_iter_steady_s"] = round(
                        float(arr[1:].sum() / (len(arr) - 1)), 3)
        print(json.dumps(row), flush=True)
        rows.append(row)
        persist()

    persist()


if __name__ == "__main__":
    main()
