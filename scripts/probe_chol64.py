"""Bisect the XLA TPU compiler crash (memory-space assignment check
failure, algorithm.cc:5283) seen when compiling the chol64 (f64-island)
campaign at N=512.  Compiles successively larger pieces of the fit pipeline
and reports which one dies — each stage runs in a SUBPROCESS so a compiler
SIGABRT doesn't kill the probe.

    python scripts/probe_chol64.py            # all stages, N=512
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["mll_fwd", "mll_vg", "map_vg", "fit_one", "fit_batch"]

WORKER = r"""
import sys
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from scamlgp_tpu.models import gp
from scamlgp_tpu.models import fit as fit_lib

stage, N, B = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
D = 6
dtype = jnp.float32
cfg = gp.source_gp_config()
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(N, D)), dtype)
y = jnp.asarray(rng.normal(size=(N,)), dtype)
p = gp.init_params(cfg, D, dtype)

if stage == "mll_fwd":
    v = jax.jit(lambda p: gp.mll(cfg, p, X, y, method="chol64"))(p)
elif stage == "mll_vg":
    v, g = jax.jit(jax.value_and_grad(
        lambda p: gp.mll(cfg, p, X, y, method="chol64")))(p)
elif stage == "map_vg":
    v, g = jax.jit(jax.value_and_grad(
        lambda p: gp.map_objective(cfg, p, X, y, method="chol64")))(p)
elif stage == "fit_one":
    def obj(pp):
        return gp.map_objective(cfg, pp, X, y, method="chol64")
    stack = jax.tree_util.tree_map(lambda l: l[None], p)
    res = fit_lib.fit_map_restarts(obj, stack, num_steps=60)
    v = jax.tree_util.tree_leaves(res.params)[0]
elif stage == "fit_batch":
    def obj(pp):
        return gp.map_objective(cfg, pp, X, y, method="chol64")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    stack = jax.vmap(lambda k: gp.sample_params(cfg, k, D, dtype))(keys)
    res = fit_lib.fit_map_restarts(obj, stack, num_steps=60)
    v = jax.tree_util.tree_leaves(res.params)[0]
jax.block_until_ready(v)
print("STAGE_OK", stage)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=512)
    ap.add_argument("--B", type=int, default=48)
    ap.add_argument("--stages", nargs="*", default=STAGES)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {}
    for stage in args.stages:
        proc = subprocess.run(
            [sys.executable, "-c", WORKER, stage, str(args.N), str(args.B)],
            capture_output=True, text=True, timeout=1800,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        ok = "STAGE_OK" in proc.stdout
        tail = (proc.stderr.strip().splitlines() or [""])[-1][:200]
        results[stage] = {"ok": ok, "rc": proc.returncode,
                          "err_tail": None if ok else tail}
        print(json.dumps({stage: results[stage]}), flush=True)
        if not ok:
            break
    print(json.dumps({"N": args.N, "B": args.B, "stages": results}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"N": args.N, "B": args.B, "stages": results}, fh,
                      indent=2)


if __name__ == "__main__":
    main()
