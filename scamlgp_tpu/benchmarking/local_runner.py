"""Study runner (reference
``/root/reference/scamlgp/benchmarking/local_runner.py:31-205``).

``run_study`` runs one seeded BO study (noise-wrapped when a noise spec is
given, storing both noisy and noise-free objectives); ``main`` fans study
seeds out and writes one JSON per seed plus an ``info.json`` with the parsed
config and environment.

TPU note: the reference fans out over a ``ProcessPoolExecutor``.  On a TPU
chip, separate processes contend for the single device, so when JAX's backend
is not CPU the runner defaults to in-process sequential execution (the
device-level parallelism lives *inside* each study: tasks x restarts are
vmapped).  On the CPU backend the process pool is used exactly like the
reference.
"""

from __future__ import annotations

import concurrent.futures
import importlib.metadata
import json
import logging
import time
import traceback
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Type

import numpy as np

from scamlgp_tpu.benchmarking.bbo_helper import run_with_bbo
from scamlgp_tpu.benchmarking.benchmarks.base import Base as BenchmarkBase
from scamlgp_tpu.benchmarking.experiment_config_utils import (
    Experiment,
    hash_experiment_config,
    parse_experiment_config,
)
from scamlgp_tpu.benchmarking.noise.base import NoiseBase
from scamlgp_tpu.benchmarking.noise.benchmark import NoisyBenchmark

REPO_ROOT = Path(__file__).parent.parent.parent.resolve()


def run_study(optimizer_cls: Type, optimizer_kwargs: Dict[str, Any],
              benchmark_cls: Type[BenchmarkBase],
              benchmark_kwargs: Dict[str, Any], max_evaluations: int,
              study_seed: int,
              noise_spec: Optional[NoiseBase] = None) -> dict:
    """One seeded study: benchmark (+noise) -> BO loop -> result dict
    (reference ``local_runner.py:31-84``)."""
    if noise_spec is not None:
        noise_spec.rng = np.random.default_rng(study_seed)
        benchmark = NoisyBenchmark(
            benchmark_cls(**benchmark_kwargs, seed=study_seed), noise_spec)
    else:
        benchmark = benchmark_cls(**benchmark_kwargs, seed=study_seed)

    evaluations = run_with_bbo(
        benchmark=benchmark, optimizer_cls=optimizer_cls,
        optimizer_kwargs_from_config=optimizer_kwargs,
        max_evaluations=max_evaluations, meta_data_seed=study_seed)

    if isinstance(benchmark, NoisyBenchmark):
        # re-evaluate each config noise-free, store both objective variants
        # (reference :67-77)
        from scamlgp_tpu.bo.core import EvaluationSpecification

        for ev in evaluations:
            spec = EvaluationSpecification(
                configuration=ev.configuration, settings=ev.settings,
                context=ev.context, optional_info=ev.optional_info)
            noise_free_eval = benchmark.noise_free_benchmark(spec)
            ev.objectives = {
                **{f"{n} (noisy)": v for n, v in ev.objectives.items()},
                **{f"{n} (noise free)": v
                   for n, v in noise_free_eval.objectives.items()},
            }

    return {
        "optimum": getattr(benchmark, "optimum", None),
        "objectives": [o.__dict__ for o in benchmark.objectives],
        "evaluations": [e.__dict__ for e in evaluations],
        "seed": study_seed,
    }


def _environment_info() -> Dict[str, str]:
    env = {}
    for dist in importlib.metadata.distributions():
        try:
            env[dist.metadata["Name"]] = dist.version
        except Exception:
            continue
    return env


def main(config: Experiment, experiment_module: str, experiment_key: str,
         max_workers: int, hpobench_path: Optional[str] = None,
         fcnet_path: Optional[str] = None,
         output_root: Optional[Path] = None) -> Path:
    """Run all study seeds of one experiment and persist results
    (reference ``local_runner.py:87-205``)."""
    logging.getLogger("scamlgp_tpu").setLevel(logging.WARNING)

    benchmark_kwargs = (dict(config.benchmark["kwargs"])
                        if isinstance(config.benchmark, dict) else {})
    if hpobench_path:
        benchmark_kwargs["data_dir"] = hpobench_path
    if fcnet_path:
        benchmark_kwargs["target_task_file"] = str(
            Path(fcnet_path) / "fcnet_tabular_benchmarks"
            / benchmark_kwargs["target_task_file"])
        benchmark_kwargs["meta_task_files"] = [
            str(Path(fcnet_path) / "fcnet_tabular_benchmarks" / mtf)
            for mtf in benchmark_kwargs["meta_task_files"]]

    config_hash = hash_experiment_config(config)
    root = Path(output_root) if output_root is not None else REPO_ROOT
    output_dir = (root / Path(*experiment_module.split(".")[:-1]) / "results"
                  / f"{experiment_key}_{config_hash}")
    output_dir.mkdir(parents=True, exist_ok=True)

    info = dict(
        experiment_config=parse_experiment_config(config.__dict__),
        experiment_module=experiment_module,
        experiment_key=experiment_key,
        environment=_environment_info(),
        timestamp=time.time(),
    )
    with open(output_dir / "info.json", "w", encoding="UTF-8") as fh:
        json.dump(info, fh)

    _run_study = partial(
        run_study,
        optimizer_cls=(config.optimizer if not isinstance(config.optimizer, dict)
                       else config.optimizer["cls"]),
        optimizer_kwargs=({} if not isinstance(config.optimizer, dict)
                          else config.optimizer["kwargs"]),
        benchmark_cls=(config.benchmark["cls"]
                       if isinstance(config.benchmark, dict)
                       else config.benchmark),
        benchmark_kwargs=benchmark_kwargs,
        max_evaluations=config.n_evaluations,
        noise_spec=(config.benchmark.get("noise_spec", None)
                    if isinstance(config.benchmark, dict) else None),
    )

    def _persist(benchmark_results: dict) -> None:
        study_seed = benchmark_results["seed"]
        results = dict(
            experiment_config=parse_experiment_config(config.__dict__),
            experiment_module=experiment_module,
            experiment_key=experiment_key,
            timestamp=time.time(),
            studies=[benchmark_results],
        )
        path = output_dir / f"{experiment_key}_{study_seed}_{config_hash}.json"
        with open(path, "w", encoding="UTF-8") as fh:
            json.dump(results, fh)

    import jax

    use_pool = max_workers > 1 and jax.default_backend() == "cpu"
    if use_pool:
        with concurrent.futures.ProcessPoolExecutor(
                max_workers=max_workers) as executor:
            futures = [executor.submit(_run_study, study_seed=seed)
                       for seed in range(config.n_studies)]
            for future in concurrent.futures.as_completed(futures):
                try:
                    _persist(future.result())
                except Exception:
                    print("Error loading result")
                    traceback.print_exc()
    else:
        for seed in range(config.n_studies):
            try:
                _persist(_run_study(study_seed=seed))
            except Exception:
                print("Error loading result")
                traceback.print_exc()
    return output_dir
