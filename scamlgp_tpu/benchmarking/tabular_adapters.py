"""Device-resident adapters for the tabular benchmarks (FCNet / HPOBench /
PD1): whole tabular BO campaigns as ONE vectorized on-device program.

The reference's largest experiments are tabular (60-80 evals x 256 studies,
``configurations/pd1.py:38-46``, ``lr_tabular.py:44``) and run as a 64-process
CPU pool; the repo's sequential host driver costs ~0.5 s/iteration
(``docs/SEQ_DRIVER_TPU.json``) because every acquisition proposal round-trips
to a host-side table lookup.  But the lookups themselves are trivially
device-able:

- **FCNet** (``fcnet_fixed_fidelity_tabular.py:102-123``) and **HPOBench**
  (``hpo_bench_tabular.py:139-343``) evaluate a config against a lookup table
  over a finite grid — on device this is integer bin arithmetic plus one
  gather from a per-study value vector.
- **PD1** (``pd1.py:103-111``) is an L1 nearest-neighbor lookup over the
  task's table rows — on device an ``argmin`` over a per-study coords array
  plus one gather.

Per-study tables ride in ``task_params`` (leading study axis, passed as jit
*arguments* — never closure constants, which the axon remote-compile tunnel
rejects for large arrays).  Meta-data, target tables, and optima are prepared
host-side from the ordinary benchmark objects, so the device campaign sees
exactly the data the sequential driver would.

Binning semantics match ``bo/space.py`` ``from_unit`` exactly for
ordinal/categorical/integer dims (``clip(floor(u*n), 0, n-1)``), so grid-mode
campaigns are in exact parity with the host driver's propose -> from_numerical
-> table lookup path.  Continuous dims in grid mode are quantized to
``continuous_levels`` bin centers (a documented approximation — the published
HPOBench/FCNet spaces are fully discrete, so this only matters for synthetic
stand-ins).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from scamlgp_tpu.bo.space import (
    CategoricalParameter,
    ContinuousParameter,
    IntegerParameter,
    ParameterSpace,
)
from scamlgp_tpu.models import scamlgp as m


# --------------------------------------------------------------------------
# grid enumeration (host side)


def _free_params(space: ParameterSpace):
    return [p for p in space._params if p.name not in space.fixed]


def grid_levels(space: ParameterSpace, continuous_levels: int = 16
                ) -> List[List]:
    """Per free dimension, the list of representative parameter values —
    ordinal/categorical/integer levels verbatim; continuous dims quantized
    to ``continuous_levels`` bin centers via ``from_unit``."""
    levels = []
    for p in _free_params(space):
        if isinstance(p, CategoricalParameter):  # includes Ordinal
            levels.append(list(p.values))
        elif isinstance(p, IntegerParameter):
            levels.append(list(range(p.lower, p.upper + 1)))
        elif isinstance(p, ContinuousParameter):
            levels.append([p.from_unit((j + 0.5) / continuous_levels)
                           for j in range(continuous_levels)])
        else:
            raise NotImplementedError(
                f"Unsupported parameter type {type(p)} for device tables")
    return levels


def enumerate_grid_table(space: ParameterSpace, evaluate,
                         continuous_levels: int = 16) -> np.ndarray:
    """Evaluate ``evaluate(config) -> float`` on the full cartesian grid,
    flattened row-major in parameter order (first dim slowest) — the order
    ``make_grid_lut_fn`` indexes."""
    import itertools

    params = _free_params(space)
    levels = grid_levels(space, continuous_levels)
    fixed = dict(space.fixed)
    values = np.empty(int(np.prod([len(lv) for lv in levels])), np.float64)
    for row, combo in enumerate(itertools.product(*levels)):
        config = dict(zip((p.name for p in params), combo))
        config.update(fixed)
        values[row] = evaluate(config)
    return values


# --------------------------------------------------------------------------
# device lookup kernels


def make_grid_lut_fn(n_levels: Sequence[int]):
    """Jittable ``(x_unit (d,), task_params) -> scalar`` for a row-major
    grid table in ``task_params["table"]``.

    Per dim: ``bin = clip(floor(u * n), 0, n-1)`` — identical to the host
    codec (``bo/space.py`` ``from_unit``), so the device campaign proposes,
    snaps, and observes exactly like the sequential driver."""
    n_levels = tuple(int(n) for n in n_levels)

    def fn(x_unit, task_params):
        idx = jnp.zeros((), jnp.int32)
        for d, n in enumerate(n_levels):
            j = jnp.clip(jnp.floor(x_unit[d] * n).astype(jnp.int32),
                         0, n - 1)
            idx = idx * n + j
        return task_params["table"][idx]

    return fn


def make_nn_lut_fn(lower: Sequence[float], upper: Sequence[float]):
    """Jittable L1 nearest-neighbor lookup (the PD1 semantics,
    ``pd1.py:103-111``): map the unit point to parameter space with the
    per-dim affine ``lo + (hi-lo)*u``, take the closest row of
    ``task_params["coords"]`` by L1 distance (padded rows masked via
    ``task_params["valid"]``), return its ``task_params["values"]`` entry."""
    lo = jnp.asarray(np.asarray(lower, np.float64))
    hi = jnp.asarray(np.asarray(upper, np.float64))

    def fn(x_unit, task_params):
        xv = lo.astype(x_unit.dtype) + (hi - lo).astype(x_unit.dtype) \
            * jnp.clip(x_unit, 0.0, 1.0)
        dist = jnp.sum(jnp.abs(task_params["coords"] - xv), axis=-1)
        dist = jnp.where(task_params["valid"], dist, jnp.inf)
        return task_params["values"][jnp.argmin(dist)]

    return fn


# --------------------------------------------------------------------------
# campaign input builders (host side)


def _meta_task_data(benchmark, seed, dtype):
    """Encode one study's meta-data exactly like the sequential driver
    (``utils.py:72-109`` semantics: sorted task order, unit-cube encoding)."""
    md = benchmark.get_meta_data(distribution="random", seed=seed)
    xs, ys = [], []
    name = benchmark.objectives[0].name
    for uid in sorted(md.keys(), key=str):
        evals = md[uid]
        X = np.stack([benchmark.search_space.to_numerical(e.configuration)
                      for e in evals])
        y = np.asarray([e.objectives[name] for e in evals])
        xs.append(X)
        ys.append(y)
    return m.pack_task_data(xs, ys, dtype=dtype)


def campaign_inputs_from_grid_tabular(benchmark_factory, study_seeds,
                                      continuous_levels: int = 16,
                                      dtype=jnp.float32):
    """(benchmark_fn, task_params, meta TaskData, optima) for a batch of
    seeded studies of a grid-table benchmark (FCNet / HPOBench).

    ``benchmark_factory(seed)`` must return a fresh benchmark instance (the
    per-seed target-task draw happens inside, as in ``local_runner.run_study``).
    Target tables are enumerated host-side once per distinct target task and
    shipped as per-study value vectors.
    """
    tables: Dict[str, np.ndarray] = {}
    rows, task_data, optima = [], [], []
    n_levels = None
    for seed in study_seeds:
        b = benchmark_factory(seed)
        lv = grid_levels(b.search_space, continuous_levels)
        if n_levels is None:
            n_levels = [len(x) for x in lv]
        tt = getattr(getattr(b, "target_task", None), "uid", "target")
        cache_key = str(tt)
        if cache_key not in tables:
            tables[cache_key] = enumerate_grid_table(
                b.search_space, lambda cfg: _evaluate_host(b, cfg),
                continuous_levels)
        rows.append(tables[cache_key])
        task_data.append(_meta_task_data(b, seed, dtype))
        optima.append(float(b.optimum))

    fn = make_grid_lut_fn(n_levels)
    task_params = {"table": jnp.asarray(np.stack(rows), dtype)}
    meta = m.TaskData(*(jnp.stack([getattr(td, f) for td in task_data])
                        for f in m.TaskData._fields))
    return fn, task_params, meta, np.asarray(optima)


def _evaluate_host(benchmark, config) -> float:
    from scamlgp_tpu.bo.core import EvaluationSpecification

    ev = benchmark(EvaluationSpecification(configuration=config))
    return float(ev.objectives[benchmark.objectives[0].name])


def campaign_inputs_from_pd1(benchmark_factory, study_seeds,
                             dtype=jnp.float32):
    """(benchmark_fn, task_params, meta TaskData, optima) for PD1 studies:
    per-study target-task rows (config coords + objective values, padded to
    the widest task) for the device nearest-neighbor kernel."""
    coords_list, values_list, task_data, optima = [], [], [], []
    space = None
    for seed in study_seeds:
        b = benchmark_factory(seed)
        space = b.search_space
        df = b._df[b._df["study_group"] == b.target_task.uid]
        names = [p.name for p in _free_params(space)]
        coords_list.append(df[names].values.astype(np.float64))
        values_list.append(
            df[b.objectives[0].name].values.astype(np.float64))
        task_data.append(_meta_task_data(b, seed, dtype))
        optima.append(float(b.optimum))

    params = _free_params(space)
    for p in params:
        if not isinstance(p, ContinuousParameter) or p.transformation:
            raise NotImplementedError(
                "PD1 device adapter expects plain continuous dims")
    n_max = max(len(v) for v in values_list)
    S = len(values_list)
    d = len(params)
    coords = np.zeros((S, n_max, d))
    values = np.zeros((S, n_max))
    valid = np.zeros((S, n_max), bool)
    for i, (c, v) in enumerate(zip(coords_list, values_list)):
        coords[i, :len(v)] = c
        values[i, :len(v)] = v
        valid[i, :len(v)] = True

    fn = make_nn_lut_fn([p.lower for p in params], [p.upper for p in params])
    task_params = {"coords": jnp.asarray(coords, dtype),
                   "values": jnp.asarray(values, dtype),
                   "valid": jnp.asarray(valid)}
    meta = m.TaskData(*(jnp.stack([getattr(td, f) for td in task_data])
                        for f in m.TaskData._fields))
    return fn, task_params, meta, np.asarray(optima)
