"""Decompose the headline-bench step (B=4096, N=128, D=6, MLL value+grad)
into its pipeline stages to find where the time actually goes before
optimizing (VERDICT r3: headline flat at ~52k evals/s for three rounds with
no roofline argument).

Stages timed separately (each chained through a data dependency and fetched,
like bench.py):

- gram_vg:      value+grad of sum(gram(X)) — the XLA-side assembly + its VJP
- inverse_fwd:  the Pallas sweep inverse alone on a fixed SPD batch
- mll_vg_sweep: full map_objective value+grad, method='sweep'
- mll_vg_chol:  full map_objective value+grad, method='chol'
- mll_fwd_sweep: forward-only MLL via the inverse path

Prints one JSON line with per-stage evals/s and the derived stage shares.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_time(step_fn, args, init_carry, rounds):
    """Data is passed as explicit jit ARGUMENTS — closure-captured device
    arrays get embedded as HLO constants, and at B=4096, N=128 the 268 MB
    batch overflows the axon remote-compile request (HTTP 413)."""
    c = step_fn(*args, init_carry)
    _ = float(c)   # HOST VALUE FETCH — on axon, block_until_ready does not
    #                force execution of the queued chain; only fetching the
    #                dependent scalar does (see bench.py measurement notes;
    #                the first artifact of this script measured dispatch
    #                latency only: 200M "evals/s")
    t0 = time.perf_counter()
    for _ in range(rounds):
        c = step_fn(*args, c)
    _ = float(c)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4096)
    ap.add_argument("--N", type=int, default=128)
    ap.add_argument("--D", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=30)
    ap.add_argument("--cpu", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    from scamlgp_tpu.models import gp
    from scamlgp_tpu.ops import kernels as K_ops
    from scamlgp_tpu.ops import pallas_sweep as ps

    B, N, D = args.B, args.N, args.D
    dtype = jnp.float32
    cfg = gp.source_gp_config()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(B, N, D)), dtype)
    y = jnp.asarray(rng.normal(size=(B, N)), dtype)
    params = jax.vmap(lambda k: gp.sample_params(cfg, k, D, dtype))(
        jax.random.split(jax.random.PRNGKey(0), B))

    results = {"B": B, "N": N, "D": D,
               "backend": jax.default_backend()}

    # fixed well-conditioned SPD batch for the inverse-only stage
    A0 = np.asarray(rng.normal(size=(B, N, N)), np.float32)
    A0 = (A0 @ A0.transpose(0, 2, 1)) / N + 2.0 * np.eye(N, dtype=np.float32)
    A0 = jnp.asarray(A0)

    def timed(name, step_fn, data, carry0):
        dt = chain_time(step_fn, data, carry0, args.rounds)
        results[name] = round(B * args.rounds / dt, 1)

    # 1. gram assembly value+grad
    @jax.jit
    def gram_vg(params, X, carry):
        def one(p, x):
            c = gp.constrain(cfg, p)
            return jnp.sum(K_ops.gram(cfg.kernel, x, x, c.lengthscale,
                                      c.outputscale))

        v, g = jax.vmap(jax.value_and_grad(one))(params, X + carry * 0.0)
        return jnp.mean(v) * 1e-20

    timed("gram_vg", gram_vg, (params, X), jnp.asarray(0.0, dtype))

    # 2. inverse forward only
    @jax.jit
    def inv_fwd(A0, carry):
        inv, logdet = ps._sweep_inverse_impl(A0 + carry * 0.0)
        return jnp.mean(logdet) * 1e-20

    timed("inverse_fwd", inv_fwd, (A0,), jnp.asarray(0.0, dtype))

    # 3/4. full objective value+grad per method
    for name, method in (("mll_vg_sweep", "sweep"), ("mll_vg_chol", "chol")):
        @jax.jit
        def mll_vg(params, X, y, carry, method=method):
            def one(p, x, yy):
                return gp.map_objective(cfg, p, x, yy, method=method)

            v, g = jax.vmap(jax.value_and_grad(one))(params, X + carry * 0.0,
                                                     y)
            return jnp.mean(v) * 1e-20

        timed(name, mll_vg, (params, X, y), jnp.asarray(0.0, dtype))

    # 5. forward-only sweep MLL
    @jax.jit
    def mll_fwd(params, X, y, carry):
        def one(p, x, yy):
            return gp.mll(cfg, p, x, yy, method="sweep")

        v = jax.vmap(one)(params, X + carry * 0.0, y)
        return jnp.mean(v) * 1e-20

    timed("mll_fwd_sweep", mll_fwd, (params, X, y),
          jnp.asarray(0.0, dtype))

    # 6. system assembly only: gram + mask_system (pre-kernel glue)
    from scamlgp_tpu.ops import linalg

    @jax.jit
    def assemble(params, X, carry):
        def one(p, x):
            c = gp.constrain(cfg, p)
            K = K_ops.gram(cfg.kernel, x, x, c.lengthscale, c.outputscale)
            return jnp.sum(linalg.mask_system(K, c.noise, None))

        v = jax.vmap(one)(params, X + carry * 0.0)
        return jnp.mean(v) * 1e-20

    timed("assemble_fwd", assemble, (params, X), jnp.asarray(0.0, dtype))

    # 7. inverse-MLL on a prebuilt system (kernel + alpha/quad/logdet)
    from scamlgp_tpu.ops import inverse_mll

    @jax.jit
    def mll_pre(A0, y, carry):
        v = inverse_mll.mll_via_inverse(
            A0 + carry * 0.0, y, jnp.asarray(float(N), dtype))
        return jnp.mean(v) * 1e-20

    timed("mll_via_inv_preA", mll_pre, (A0, y), jnp.asarray(0.0, dtype))

    # derived: seconds per eval per stage (1e9/evals_per_s = ns)
    ns = {k: round(1e9 / v, 1) for k, v in results.items()
          if isinstance(v, float)}
    results["ns_per_eval"] = ns
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
