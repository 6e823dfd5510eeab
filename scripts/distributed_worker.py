"""One process of a multi-host ScaML-GP campaign (CPU-simulated hosts).

Launched N times (one per simulated host) by ``tests/test_distributed.py``
and ``scripts/bench_multihost.py``:

    python scripts/distributed_worker.py --process-id 0 --num-processes 2 \
        --coordinator localhost:12345 --devices-per-process 1 \
        --studies 8 --evals 4 --out /tmp/p0.npz

Every process builds campaign inputs, broadcasts process 0's draw (target
tasks are unseeded — reference ``base.py:119-133``), runs the SAME SPMD
``run_campaign`` over the global (study, task) mesh, and writes its
addressable study rows + phase timings.  This is the DCN replacement for the
reference's single-host process pool (``local_runner.py:174-181``).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def save_campaign_inputs(path, tps, md, optima):
    """Persist (task_params dict, meta TaskData, optima) as one npz."""
    import numpy as np

    arrays = {f"tp__{k}": np.asarray(v) for k, v in tps.items()}
    for field in md._fields:
        arrays[f"md__{field}"] = np.asarray(getattr(md, field))
    arrays["optima"] = np.asarray(optima)
    np.savez(path, **arrays)


def load_campaign_inputs(path):
    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.models.scamlgp import TaskData

    z = np.load(path)
    tps = {k[len("tp__"):]: jnp.asarray(z[k]) for k in z.files
           if k.startswith("tp__")}
    md = TaskData(**{f: jnp.asarray(z[f"md__{f}"]) for f in TaskData._fields})
    return tps, md, jnp.asarray(z["optima"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", default="localhost:12345")
    ap.add_argument("--devices-per-process", type=int, default=1)
    ap.add_argument("--task-axis", type=int, default=1,
                    help="devices per task-shard group inside a process")
    ap.add_argument("--benchmark", default="Branin")
    ap.add_argument("--studies", type=int, default=8)
    ap.add_argument("--tasks", type=int, default=4)
    ap.add_argument("--points", type=int, default=8)
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--evals", type=int, default=4)
    ap.add_argument("--fit-steps", type=int, default=20)
    ap.add_argument("--loop", default="host", choices=["host", "device"],
                    help="'device' fuses the whole campaign into one "
                         "program: a single dispatch per run, no "
                         "per-iteration cross-process rendezvous — the "
                         "multi-host-friendly configuration")
    ap.add_argument("--inputs", default=None,
                    help="npz of pre-built campaign inputs (see "
                         "save_campaign_inputs below); pins IDENTICAL "
                         "unseeded target-task draws across separate "
                         "launches for parity tests")
    ap.add_argument("--compile-cache", default=None,
                    help="persistent compilation-cache dir (steady-state "
                         "timing: a warmed cache removes compile skew)")
    ap.add_argument("--repeats", type=int, default=1,
                    help="run the campaign this many times; per-run wall "
                         "times are all recorded (first includes compile)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from scamlgp_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id,
                    simulate_cpu_devices=args.devices_per_process)

    import jax

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from scamlgp_tpu.benchmarking import benchmarks as B
    from scamlgp_tpu.benchmarking.jax_adapters import (
        JAX_FUNCTIONS,
        campaign_inputs_from_benchmark,
    )
    from scamlgp_tpu.parallel.campaign import CampaignConfig, run_campaign

    mesh = dist.global_mesh(task=args.task_axis)
    fn = JAX_FUNCTIONS[args.benchmark]

    t0 = time.time()
    if args.inputs:
        tps, md, optima = load_campaign_inputs(args.inputs)
    else:
        _, tps, md, optima = campaign_inputs_from_benchmark(
            getattr(B, args.benchmark), [args.points] * args.tasks,
            study_seeds=range(args.studies), noise_std=args.sigma,
            dtype=jnp.float32, optimum_method="device")
        # pin every process to host 0's (unseeded) target-task draw
        tps, md, optima = dist.broadcast_from_host0((tps, md, optima))
    t_setup = time.time() - t0

    cfg = CampaignConfig(n_evaluations=args.evals, noise_std=args.sigma,
                         fit_steps=args.fit_steps)
    from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

    run_times = []
    repeat_phases = []
    res = None
    for _ in range(max(args.repeats, 1)):
        before = dict(GLOBAL_TIMER.totals)
        t0 = time.time()
        res = run_campaign(fn, tps, md, jax.random.PRNGKey(0), cfg=cfg,
                           mesh=mesh, meta_fit_steps=20, loop=args.loop)
        jax.block_until_ready(res.y_clean)
        run_times.append(time.time() - t0)
        repeat_phases.append({
            k: round(GLOBAL_TIMER.totals[k] - before.get(k, 0.0), 2)
            for k in GLOBAL_TIMER.totals})

    idx, X_rows = dist.local_study_rows(res.X)
    _, y_rows = dist.local_study_rows(res.y)
    _, yc_rows = dist.local_study_rows(res.y_clean)

    np.savez(args.out, idx=idx, X=X_rows, y=y_rows, y_clean=yc_rows,
             optima=np.asarray(optima),
             run_times=np.asarray(run_times), setup_s=t_setup,
             n_local_devices=jax.local_device_count(),
             n_global_devices=jax.device_count())
    print(json.dumps({
        "process": args.process_id, "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "local_studies": int(idx.size),
        "run_times_s": [round(t, 2) for t in run_times],
        "phases_per_repeat": repeat_phases,
    }), flush=True)


if __name__ == "__main__":
    main()
