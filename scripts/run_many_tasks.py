"""BASELINE config 4: the many-task regime — M=128 synthetic quadratic
meta-tasks, task-sharded batched Cholesky meta-fit.

Two legs:

1. Single-chip vmapped meta-fit (``models.scamlgp.meta_fit_task_stack``,
   tasks x restarts as batch axes) timed at M in {32, 64, 128} — replaces
   the reference's sequential per-task Python loop
   (``/root/reference/scamlgp/model.py:176-188``, hot loop 1).
2. Task-sharded meta-fit over a device mesh
   (``parallel.scamlgp_sharded.meta_fit_sharded``) — run with ``--cpu 8``
   for the 8-virtual-device mesh; parity vs the single-chip fit is
   asserted at every M.

Optionally (``--campaign``) an end-to-end M=128 BO campaign.

    python scripts/run_many_tasks.py --out docs/MANY_TASKS.json
    python scripts/run_many_tasks.py --cpu 8 --sharded --out ...
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_meta(M, N, seed=0):
    """M quadratic meta-tasks x N points (reference Quadratic semantics:
    random a, b, c descriptors — ``benchmarks/quadratic.py``)."""
    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.models import scamlgp as m

    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(M):
        a = rng.uniform(0.5, 1.5)
        b = rng.uniform(-0.9, 0.9)
        c = rng.uniform(-1.0, 1.0)
        x = rng.uniform(size=(N, 1))
        y = a ** 2 * (x[:, 0] + b) ** 2 + c
        xs.append(x)
        ys.append(y)
    return m.pack_task_data(xs, ys, dtype=jnp.float32)


def time_fit(fit_fn, *args, repeats=3, inner=10):
    """Median wall time of one fit dispatch.

    Each repeat issues ``inner`` back-to-back dispatches and blocks on the
    last — at small M x N the fit program is sub-millisecond on a chip, so
    a single dispatch measures only host->device latency; amortizing over a
    burst gives the sustained per-fit time (first MANY_TASKS artifact
    rounded to 0.0 s for exactly this reason).
    """
    import jax
    import jax.numpy as jnp

    def carry_of(o):
        return jnp.sum(jax.tree_util.tree_leaves(o.params)[0]) * 1e-20

    # Axon measurement rules (bench.py notes): chain iterations through a
    # data dependency (an unchained burst of identical dispatches can be
    # elided except the fetched one) and force execution with a host VALUE
    # fetch (block_until_ready does not).
    out = fit_fn(jnp.asarray(0.0))          # compile
    c = carry_of(out)
    _ = float(c)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fit_fn(c)
            c = carry_of(out)
        _ = float(c)
        times.append((time.perf_counter() - t0) / inner)
    return out, sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="*", type=int, default=[32, 64, 128])
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--restarts", type=int, default=5)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU backend with this many virtual devices")
    ap.add_argument("--sharded", action="store_true",
                    help="also run the task-sharded mesh leg")
    ap.add_argument("--campaign", action="store_true",
                    help="also run a short M=128 end-to-end campaign")
    ap.add_argument("--inner", type=int, default=10,
                    help="dispatches per timing repeat (1 for slow CPU "
                         "parity runs where timing is secondary)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import numpy as np

    from scamlgp_tpu.models import gp
    from scamlgp_tpu.models import scamlgp as m

    cfg = gp.source_gp_config()
    key = jax.random.PRNGKey(0)
    result = {"backend": jax.default_backend(),
              "devices": jax.device_count(),
              "points": args.points, "restarts": args.restarts,
              "steps": args.steps, "rows": []}

    for M in args.tasks:
        data = build_meta(M, args.points)
        row = {"M": M}

        def fit_single(carry, data=data):
            d2 = data._replace(X=data.X + carry * 0.0)
            return m.meta_fit_task_stack(d2, cfg, key,
                                         num_restarts=args.restarts,
                                         num_steps=args.steps)

        single, t_single = time_fit(fit_single, inner=args.inner)
        row["single_chip_s"] = round(t_single, 6)
        row["tasks_per_s"] = round(M / t_single, 1)

        if args.sharded:
            from jax.sharding import Mesh

            from scamlgp_tpu.parallel import scamlgp_sharded as sh

            n_dev = jax.device_count()
            mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev), ("task",))

            def fit_shard(carry, data=data, mesh=mesh):
                d2 = data._replace(X=data.X + carry * 0.0)
                return sh.meta_fit_sharded(d2, cfg, key, mesh,
                                           num_restarts=args.restarts,
                                           num_steps=args.steps)

            sharded, t_shard = time_fit(fit_shard, inner=args.inner)
            row["sharded_s"] = round(t_shard, 3)
            # parity at the level that matters: the achieved per-task MAP
            # objective (f32 L-BFGS trajectories diverge in raw-parameter
            # space across reduction orders; exact f64 parameter parity is
            # pinned by tests/test_parallel.py::
            # test_sharded_meta_fit_matches_single_chip)
            import jax.numpy as jnp

            def objs(params):
                return jax.vmap(
                    lambda x, y1, m1, pp: gp.map_objective(
                        cfg, pp, x, y1, mask=m1))(
                    data.X, data.y, data.mask, params)

            trunc = jax.tree_util.tree_map(lambda l: l[:M], sharded.params)
            o_s = np.asarray(objs(trunc))
            o_1 = np.asarray(objs(single.params))
            gaps = np.abs(o_s - o_1) / np.maximum(1.0, np.abs(o_1))
            row["max_objective_gap"] = float(round(gaps.max(), 6))
            row["median_objective_gap"] = float(round(
                np.median(gaps), 8))
            # f32 L-BFGS trajectories legitimately diverge across reduction
            # orders; occasionally a different (equally good) restart wins,
            # which moves the achieved objective by ~1e-2 relative.  The
            # parity claim is "same quality optima", pinned exactly in f64
            # by tests/test_parallel.py::
            # test_sharded_meta_fit_matches_single_chip.
            assert gaps.max() < 2e-2, (o_s, o_1)
            assert np.median(gaps) < 2e-3, gaps
            row["sharded_matches_single"] = True

        result["rows"].append(row)
        print(json.dumps(row), flush=True)

    if args.campaign:
        from scamlgp_tpu.benchmarking.benchmarks import Quadratic
        from scamlgp_tpu.benchmarking.jax_adapters import (
            campaign_inputs_from_benchmark,
        )
        from scamlgp_tpu.parallel.campaign import (
            CampaignConfig,
            run_campaign,
            simple_regret,
        )
        import jax.numpy as jnp

        M = max(args.tasks)
        fn, tps, md, optima = campaign_inputs_from_benchmark(
            Quadratic, [args.points] * M, study_seeds=[0, 1, 2, 3],
            noise_std=0.05, dtype=jnp.float32, optimum_method="device")
        ccfg = CampaignConfig(n_evaluations=16, noise_std=0.05)
        t0 = time.perf_counter()
        res = run_campaign(fn, tps, md, jax.random.PRNGKey(0), cfg=ccfg,
                           meta_fit_restarts=args.restarts,
                           meta_fit_steps=args.steps,
                           meta_fit_chunks=max(1, M // 32))
        reg = np.asarray(simple_regret(res.y_clean, optima))
        result["campaign_m%d" % M] = {
            "studies": 4, "evals": 16,
            "wall_s_incl_compile": round(time.perf_counter() - t0, 1),
            "median_final_regret": float(np.median(reg[:, -1])),
        }
        print(json.dumps(result["campaign_m%d" % M]), flush=True)

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
