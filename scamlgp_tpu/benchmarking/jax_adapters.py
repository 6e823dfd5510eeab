"""Jax-evaluable adapters of the synthetic benchmarks for on-device
campaigns (``parallel/campaign.py``).

Bridges the host-side ``Benchmark`` objects (tasks, meta-data, optimum) to
pure jittable functions over the unit cube, so whole BO studies can run
inside one compiled program.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from scamlgp_tpu.benchmarking.functions.branin import branin
from scamlgp_tpu.benchmarking.functions.hartmann import (
    A3,
    A6,
    P3,
    P6,
    hartmann_function,
)
from scamlgp_tpu.benchmarking.functions.quadratic import quadratic
from scamlgp_tpu.models import scamlgp as m


def branin_unit(x_unit, p):
    """x_unit in [0,1]^2 -> Branin over x1 in [-5,10], x2 in [0,15]."""
    x1 = -5.0 + 15.0 * x_unit[0]
    x2 = 15.0 * x_unit[1]
    return branin(x1, x2, p["a"], p["b"], p["c"], p["r"], p["s"], p["t"])


def hartmann3_unit(x_unit, p):
    alpha = jnp.stack([p["alpha1"], p["alpha2"], p["alpha3"], p["alpha4"]])
    return hartmann_function(x_unit[None, :], alpha, jnp.asarray(A3),
                             jnp.asarray(P3))[0]


def hartmann6_unit(x_unit, p):
    alpha = jnp.stack([p["alpha1"], p["alpha2"], p["alpha3"], p["alpha4"]])
    return hartmann_function(x_unit[None, :], alpha, jnp.asarray(A6),
                             jnp.asarray(P6))[0]


def quadratic_unit(x_unit, p):
    x = -1.0 + 2.0 * x_unit[0]
    return quadratic(x, p["a"], p["b"], p["c"])


JAX_FUNCTIONS = {
    "Branin": branin_unit,
    "Hartmann3D": hartmann3_unit,
    "Hartmann6D": hartmann6_unit,
    "Quadratic": quadratic_unit,
}


def _task_param_dict(task) -> Dict[str, float]:
    return {**task.descriptors, **task.settings, **task.context}


def device_optima(fn, task_params, d, key=None, n_samples: int = 8192,
                  topk: int = 32, steps: int = 200, lr: float = 0.02):
    """Per-study ground-truth minima of a jax benchmark function, on device.

    The reference computes optima host-side with scipy SHGO
    (``benchmarks/base.py:258-268``, sobol n=1024) — minutes per study batch
    for 6-D functions.  Here: dense uniform screening + top-k multi-start
    Adam polish (sigmoid-reparametrized to stay in the unit cube), vmapped
    over studies — milliseconds on a chip, validated against SHGO in
    ``tests/benchmarking/test_benchmarks.py``.
    """
    import jax
    import optax

    key = jax.random.PRNGKey(0) if key is None else key
    leaves = jax.tree_util.tree_leaves(task_params)
    S = leaves[0].shape[0]
    dtype = leaves[0].dtype

    # dtype guard: with x64 enabled (chol64 island) benchmark constants
    # default to f64 and would flip the polish scan's carry dtype
    raw_fn = fn
    fn = lambda x, tp: jnp.asarray(raw_fn(x, tp), dtype)  # noqa: E731

    def logit(u):
        u = jnp.clip(u, 1e-6, 1 - 1e-6)
        return jnp.log(u) - jnp.log1p(-u)

    # screening runs in fixed-size chunks via lax.map; pad n_samples up to a
    # whole number of chunks (duplicated tail points are harmless for a min)
    chunk = min(256, n_samples)
    n_chunks = -(-n_samples // chunk)
    n_padded = n_chunks * chunk

    @jax.jit
    def one_study(tp, k):
        pts = jax.random.uniform(k, (n_padded, d), dtype)
        vals = jax.lax.map(jax.vmap(lambda x: fn(x, tp)),
                           pts.reshape(n_chunks, chunk, d)).reshape(-1)
        starts = pts[jax.lax.top_k(-vals, topk)[1]]

        opt = optax.adam(lr)

        def polish(x0):
            z0 = logit(x0)

            def step(carry, _):
                z, s, bv = carry
                v, g = jax.value_and_grad(
                    lambda zz: fn(jax.nn.sigmoid(zz), tp))(z)
                updates, s = opt.update(g, s, z)
                return (optax.apply_updates(z, updates), s,
                        jnp.minimum(bv, v)), None

            (zf, _, bv), _ = jax.lax.scan(
                step, (z0, opt.init(z0), jnp.asarray(jnp.inf, dtype)), None,
                length=steps)
            return jnp.minimum(bv, fn(jax.nn.sigmoid(zf), tp))

        return jnp.min(jax.vmap(polish)(starts))

    keys = jax.random.split(key, S)
    return jax.vmap(one_study)(task_params, keys)


def campaign_inputs_from_benchmark(benchmark_cls, n_data_per_task,
                                   study_seeds, noise_std: float,
                                   meta_distribution: str = "random",
                                   dtype=jnp.float64,
                                   optimum_method: str = "shgo"):
    """Build (benchmark_fn, task_params, meta TaskData, optima) for a batch
    of seeded studies of a synthetic benchmark.

    Per study seed this mirrors ``local_runner.run_study``: instantiate the
    benchmark with the seed (fresh random tasks), generate noisy meta-data,
    and record the noise-free optimum for regret computation.

    Args:
        optimum_method: "shgo" — the reference's host-side scipy SHGO per
            study (slow for 6-D); "device" — on-device multi-start polish
            (``device_optima``), orders of magnitude faster at matching
            accuracy.
    """
    fn = JAX_FUNCTIONS[benchmark_cls.__name__]

    task_param_list = []
    task_data_list = []
    optima = []
    for seed in study_seeds:
        b = benchmark_cls(n_data_per_task=list(n_data_per_task), seed=seed)
        rng = np.random.default_rng(seed)

        xs, ys = [], []
        md = b.get_meta_data(meta_distribution, seed=seed)
        for uid in sorted(md.keys(), key=str):
            evals = md[uid]
            X = np.stack([b.search_space.to_numerical(e.configuration)
                          for e in evals])
            y = np.asarray([e.objectives["loss"] for e in evals])
            y = y + noise_std * rng.standard_normal(y.shape)
            xs.append(X)
            ys.append(y)
        task_data_list.append(m.pack_task_data(xs, ys, dtype=dtype))
        task_param_list.append({k: jnp.asarray(v, dtype) for k, v in
                                _task_param_dict(b.target_task).items()})
        if optimum_method == "shgo":
            optima.append(float(b.optimum))

    import jax

    task_params = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *task_param_list)
    meta_data = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *task_data_list)
    if optimum_method == "device":
        d = task_data_list[0].X.shape[-1]
        optima_arr = device_optima(fn, task_params, d)
    elif optimum_method == "shgo":
        optima_arr = jnp.asarray(optima, dtype)
    else:
        raise ValueError(f"unknown optimum_method: {optimum_method!r}")
    return fn, task_params, meta_data, optima_arr


def campaign_to_study_results(benchmark_cls, n_data_per_task, study_seeds,
                              result, optima,
                              objective_name: str = "loss",
                              noisy: bool = True, space=None):
    """Convert a ``CampaignResult`` to the study-runner's per-study result
    dicts (``local_runner.run_study`` schema), so campaign output flows into
    the same regret analytics / ``grouped_results`` plotting as host-runner
    output (reference ``local_runner.py:183-201``, ``plotting.py:21-53``).

    ``optima`` must be the per-study optima returned by
    ``campaign_inputs_from_benchmark`` — the target task is intentionally
    unseeded (a fresh draw per benchmark instance, matching the reference's
    ``base.py:128`` semantics), so it cannot be reconstructed here.  The
    search space, by contrast, is task-independent, so one throwaway
    instance decodes unit-cube proposals back into configurations.
    """
    X = np.asarray(result.X)
    y = np.asarray(result.y)
    y_clean = np.asarray(result.y_clean)
    optima = np.asarray(optima)

    if space is None:
        space = benchmark_cls(n_data_per_task=list(n_data_per_task),
                              seed=0).search_space
    studies = []
    for si, seed in enumerate(study_seeds):
        evaluations = []
        for e in range(X.shape[1]):
            config = space.from_numerical(X[si, e])
            if noisy:
                objectives = {
                    f"{objective_name} (noisy)": float(y[si, e]),
                    f"{objective_name} (noise free)": float(y_clean[si, e]),
                }
            else:
                objectives = {objective_name: float(y_clean[si, e])}
            evaluations.append({"configuration": config,
                                "objectives": objectives})
        studies.append({
            "optimum": float(optima[si]),
            "objectives": [{"name": objective_name,
                            "greater_is_better": False}],
            "evaluations": evaluations,
            "seed": int(seed),
        })
    return studies
