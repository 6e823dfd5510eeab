"""Multi-host weak-scaling benchmark: 1 simulated host vs 2.

Measures the BASELINE.md target "scaling efficiency, 1 chip -> 2 hosts:
>=70% samples/s" on this box by simulating each host as one OS process
pinned to its own physical core with one virtual CPU device (gloo/TCP
collectives — the DCN stand-in).  Weak scaling over the study axis, the
same axis the reference fans out over its process pool
(``local_runner.py:174-181``):

- baseline: 1 process x 1 device, S studies;
- scaled:   2 processes x 1 device, 2S studies (S per host).

Efficiency = t_baseline / t_scaled (each host does the baseline's work, so
perfect scaling is equal wall time).  Timing = the MEDIAN of the warm
in-process repeats (all but the first; warmed persistent compilation cache),
so compile time is excluded from both sides and one noisy repeat cannot
swing the headline.  The artifact reports the raw efficiency AND a
contention-corrected one (vs a 2-independent-campaigns hardware control),
with separate ``meets_target_raw`` / ``meets_target_vs_control`` booleans so
neither reading can masquerade as the other.

    python scripts/bench_multihost.py --studies 16 --evals 10 \
        --loop device --repeats 4 --out docs/MULTIHOST_BENCH.json
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from statistics import median

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def run_config(num_processes, studies, args, cache_dir, outdir, port,
               pin_cores=True, independent=False):
    """Launch the workers and return (max warm wall time, all run times).

    ``independent=True`` launches ``num_processes`` UNRELATED single-process
    campaigns concurrently (each its own 1-process "cluster") — the hardware
    control: it exposes how much two CPU-bound workers slow each other down
    on this box (shared physical core / memory bandwidth) with the
    distributed runtime taken out of the picture entirely.

    Returns (steady-state time, all run times, all phase breakdowns): the
    steady state is the slowest process's MEDIAN warm repeat (repeats after
    the first; the first includes compile/cache warm-up).
    """
    procs = []
    for pid in range(num_processes):
        cluster = (["--process-id", "0", "--num-processes", "1"]
                   if independent else
                   ["--process-id", str(pid),
                    "--num-processes", str(num_processes)])
        cmd = [sys.executable, WORKER] + cluster + [
               "--coordinator", f"localhost:{port + (pid if independent else 0)}",
               "--devices-per-process", "1",
               "--studies", str(studies),
               "--tasks", str(args.tasks), "--points", str(args.points),
               "--evals", str(args.evals),
               "--benchmark", args.benchmark,
               "--loop", args.loop,
               "--compile-cache", cache_dir,
               "--repeats", str(args.repeats),
               "--out", os.path.join(outdir, f"p{pid}.npz")]
        if pin_cores:
            cmd = ["taskset", "-c", str(pid)] + cmd
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    times, phases = [], []
    for p in procs:
        out, _ = p.communicate(timeout=7200)
        log = out.decode()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-3000:]}")
        rec = json.loads([l for l in log.splitlines()
                          if l.startswith("{")][-1])
        times.append(rec["run_times_s"])
        phases.append(rec.get("phases_per_repeat", []))
    # steady-state = median warm repeat (skip the compile-laden first run);
    # the slowest process bounds the campaign
    return max(median(t[1:] if len(t) > 1 else t) for t in times), \
        times, phases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--benchmark", default="Branin")
    ap.add_argument("--studies", type=int, default=16,
                    help="studies per host (weak scaling)")
    ap.add_argument("--tasks", type=int, default=8)
    ap.add_argument("--points", type=int, default=32)
    ap.add_argument("--evals", type=int, default=10)
    ap.add_argument("--loop", default="host", choices=["host", "device"])
    ap.add_argument("--repeats", type=int, default=4,
                    help="in-process campaign repeats per worker; the first "
                         "warms the compile cache, the median of the rest "
                         "is the steady-state time")
    ap.add_argument("--no-pin", action="store_true",
                    help="skip taskset core pinning")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    pin = not args.no_pin and shutil.which("taskset") is not None
    workdir = tempfile.mkdtemp(prefix="mhbench_")
    cache = os.path.join(workdir, "cache")

    t1, times1, phases1 = run_config(1, args.studies, args, cache, workdir,
                                     port=12420, pin_cores=pin)
    t2, times2, phases2 = run_config(2, 2 * args.studies, args, cache,
                                     workdir, port=12421, pin_cores=pin)
    # hardware control: two INDEPENDENT campaigns, same concurrency, no
    # distributed runtime — isolates shared-core/bandwidth contention (on
    # cloud VMs the 2 vCPUs are typically hyperthreads of ONE physical
    # core) from actual multi-host overhead.
    tc, timesc, phasesc = run_config(2, args.studies, args, cache, workdir,
                                     port=12430, pin_cores=pin,
                                     independent=True)

    sps1 = args.studies * args.evals / t1
    sps2 = 2 * args.studies * args.evals / t2
    eff = t1 / t2
    eff_vs_control = tc / t2
    result = {
        "benchmark": args.benchmark,
        "loop": args.loop,
        "weak_scaling": f"{args.studies} studies/host x {args.evals} evals",
        "tasks": args.tasks, "points": args.points,
        "core_pinned": pin,
        "repeats": args.repeats,
        "t_1host_s": round(t1, 2), "t_2host_s": round(t2, 2),
        "t_control_2independent_s": round(tc, 2),
        "samples_per_s_1host": round(sps1, 2),
        "samples_per_s_2host": round(sps2, 2),
        "scaling_efficiency_raw": round(eff, 3),
        "hardware_contention_factor": round(t1 / tc, 3),
        "scaling_efficiency_vs_control": round(eff_vs_control, 3),
        "note": ("raw = t_1host/t_2host on 2 vCPUs sharing one physical "
                 "core; vs_control divides out measured hardware "
                 "contention (2 independent single-process campaigns at "
                 "the same concurrency) and is the framework's actual "
                 "multi-host overhead; times are medians of the warm "
                 "repeats, slowest process"),
        "target": 0.70,
        "meets_target_raw": eff >= 0.70,
        "meets_target_vs_control": eff_vs_control >= 0.70,
        "all_run_times": {"1host": times1, "2host": times2,
                          "control": timesc},
        "phases_per_repeat": {"1host": phases1, "2host": phases2,
                              "control": phasesc},
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
