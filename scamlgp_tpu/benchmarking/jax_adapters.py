"""Jax-evaluable adapters of the synthetic benchmarks for on-device
campaigns (``parallel/campaign.py``).

Bridges the host-side ``Benchmark`` objects (tasks, meta-data, optimum) to
pure jittable functions over the unit cube, so whole BO studies can run
inside one compiled program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from scamlgp_tpu.benchmarking.benchmarks.base import Base
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


def campaign_inputs_from_benchmark(benchmark_cls, n_data_per_task,
                                   study_seeds, noise_std: float,
                                   meta_distribution: str = "random",
                                   dtype=jnp.float64):
    """Build (benchmark_fn, task_params, meta TaskData, optima) for a batch
    of seeded studies of a synthetic benchmark.

    Per study seed this mirrors ``local_runner.run_study``: instantiate the
    benchmark with the seed (fresh random tasks), generate noisy meta-data,
    and record the noise-free SHGO/analytic optimum for regret computation.
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
        optima.append(float(b.optimum))

    import jax

    task_params = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *task_param_list)
    meta_data = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *task_data_list)
    return fn, task_params, meta_data, jnp.asarray(optima, dtype)
