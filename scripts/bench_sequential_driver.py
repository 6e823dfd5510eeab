"""On-chip cost of the SEQUENTIAL driver at tabular-benchmark scale.

Campaign artifacts cover the synthetic grid; tabular benchmarks
(HPOBench/FCNet/PD1) cannot route through the vectorized campaign — their
lookups are host-side — so their TPU story is ``ScaMLGPBO`` itself:
per-iteration refit + acquisition wall time and the recompile cadence of
the bucketed padded buffers (VERDICT r3 missing item 5).

Shapes mirror the reference experiments:
- FCNet:    3 meta-tasks x 256 pts, 80 evals, 6-d space
  (``/root/reference/scamlgp/benchmarking/configurations/fcnet_tabular.py:60-136``)
- HPOBench: 28 meta-tasks x 64 pts, 60 evals, 4-d space
  (``/root/reference/scamlgp/benchmarking/benchmarks/hpo_bench_tabular.py:139-343``)

The meta-data is synthetic (driver cost is shape-determined, not
value-determined); the objective is a cheap quadratic evaluated host-side
like a table lookup would be.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENARIOS = {
    "fcnet": {"M": 3, "Nm": 256, "evals": 80, "d": 6},
    "hpobench": {"M": 28, "Nm": 64, "evals": 60, "d": 4},
}


def run_scenario(name, spec, seed=0, capacity_hint=False):
    import jax

    from scamlgp_tpu.bo.core import Evaluation, Objective
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO
    from scamlgp_tpu.bo.space import ContinuousParameter, ParameterSpace

    M, Nm, E, d = spec["M"], spec["Nm"], spec["evals"], spec["d"]
    rng = np.random.default_rng(seed)

    space = ParameterSpace()
    for j in range(d):
        space.add(ContinuousParameter(f"x{j}", (0.0, 1.0)))

    center = rng.uniform(0.2, 0.8, size=d)

    def objective_fn(cfg):
        x = np.asarray([cfg[f"x{j}"] for j in range(d)])
        return float(np.sum((x - center) ** 2))

    meta = {}
    for t in range(M):
        shift = center + 0.05 * rng.normal(size=d)
        evals = []
        for _ in range(Nm):
            u = rng.uniform(size=d)
            evals.append(Evaluation(
                configuration={f"x{j}": float(u[j]) for j in range(d)},
                objectives={"loss": float(np.sum((u - shift) ** 2)
                                          + 0.01 * rng.normal())}))
        meta[f"task{t}"] = evals

    t0 = time.perf_counter()
    opt = ScaMLGPBO(space, Objective("loss", False), meta, seed=seed,
                    capacity_hint=E if capacity_hint else None)
    init_s = time.perf_counter() - t0

    gen_times, rep_times = [], []
    for i in range(E):
        t0 = time.perf_counter()
        s = opt.generate_evaluation_specification()
        t1 = time.perf_counter()
        y = objective_fn(s.configuration)
        opt.report(Evaluation(configuration=s.configuration,
                              objectives={"loss": y}))
        t2 = time.perf_counter()
        gen_times.append(t1 - t0)
        rep_times.append(t2 - t1)

    gen = np.asarray(gen_times)
    rep = np.asarray(rep_times)
    tot = gen + rep
    # bucket boundaries: capacity doubles at 8, 16, 32, 64 target points ->
    # iterations right after a boundary pay the recompile; detect them as
    # extreme outliers vs the running median
    med = float(np.median(tot))
    spikes = [int(i) for i in np.nonzero(tot > 5 * med)[0]]
    return {
        "scenario": name, **spec,
        "meta_fit_plus_build_s": round(init_s, 2),
        "total_loop_s": round(float(tot.sum()), 2),
        "per_iter_median_s": round(med, 4),
        "per_iter_p90_s": round(float(np.percentile(tot, 90)), 4),
        "generate_median_s": round(float(np.median(gen)), 4),
        "report_median_s": round(float(np.median(rep)), 4),
        "recompile_spike_iters": spikes,
        "steady_state_iters_per_s": round(1.0 / med, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", nargs="*", default=list(SCENARIOS))
    ap.add_argument("--capacity-hint", action="store_true",
                    help="pre-size target buffers to the eval budget "
                         "(skips all intermediate bucket recompiles)")
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    out = {"backend": jax.default_backend(),
           "capacity_hint": bool(args.capacity_hint), "rows": []}
    for name in args.scenarios:
        row = run_scenario(name, SCENARIOS[name],
                           capacity_hint=args.capacity_hint)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
