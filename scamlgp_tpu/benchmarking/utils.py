"""Benchmark discovery, meta-data noising, and the submit/visualize/hash CLI
(reference ``/root/reference/scamlgp/benchmarking/utils.py:29-309``)."""

from __future__ import annotations

import argparse
import copy
import glob
import inspect
import json
import logging
import os
from pathlib import Path
from typing import Callable, Dict, List, Optional, Union

import numpy as np

import scamlgp_tpu.benchmarking.benchmarks
from scamlgp_tpu.benchmarking.benchmarks.api import Benchmark, SeedType
from scamlgp_tpu.benchmarking.experiment_config_utils import (
    Experiment,
    get_experiments_config_from_module,
    hash_experiment_config,
)
from scamlgp_tpu.benchmarking.local_runner import REPO_ROOT
from scamlgp_tpu.benchmarking.local_runner import main as submit_local_job_main
from scamlgp_tpu.bo.core import Evaluation


def get_benchmarks() -> List[Benchmark]:
    """All benchmark classes importable from the benchmarks package
    (reference ``utils.py:29-43``)."""
    importables = [getattr(scamlgp_tpu.benchmarking.benchmarks, name)
                   for name in dir(scamlgp_tpu.benchmarking.benchmarks)]

    def is_benchmark(ref):
        return inspect.isclass(ref) and issubclass(ref, Benchmark)

    return list(filter(is_benchmark, importables))


def get_benchmarks_with_search_space_dimensions(dimensions: int
                                                ) -> List[Benchmark]:
    """Benchmarks whose search space has the given dimensionality
    (reference ``utils.py:46-69``)."""

    def dimensions_filter(benchmark):
        try:
            return len(benchmark().search_space) == dimensions
        except (TypeError, ImportError, FileNotFoundError, ValueError):
            logging.warning(f"Could not instantiate benchmark '{benchmark}'.")
            return False

    return list(filter(dimensions_filter, get_benchmarks()))


def get_benchmarks_with_output_dimensions(dimensions: int) -> List[Benchmark]:
    """Benchmarks with the given number of output dimensions
    (reference ``utils.py:72-95``)."""

    def dimensions_filter(benchmark):
        try:
            return benchmark().output_dimensions == dimensions
        except (TypeError, ImportError, FileNotFoundError, ValueError):
            logging.warning(f"Could not instantiate benchmark '{benchmark}'.")
            return False

    return list(filter(dimensions_filter, get_benchmarks()))


def add_noise_to_meta_data_objectives(
        meta_data: Dict[Union[str, int], List[Evaluation]],
        noise_scale: Union[float, Dict[str, float]],
        noise_is_relative: bool = False,
        seed: Optional[SeedType] = None
) -> Dict[Union[str, int], List[Evaluation]]:
    """Add (optionally relative) Gaussian noise to all recorded meta-data
    objectives (reference ``utils.py:98-127``)."""
    rng = np.random.default_rng(seed)
    noisy = copy.deepcopy(meta_data)

    noise_scale_dict: Dict[str, float] = {}
    if isinstance(noise_scale, float):
        noise_scale_dict["loss"] = noise_scale
    else:
        noise_scale_dict.update(noise_scale)

    for task_id in noisy.keys():
        for ev in noisy[task_id]:
            for k in ev.objectives.keys():
                if ev.objectives[k] is None:
                    continue
                noise = noise_scale_dict[k] * rng.standard_normal()
                if noise_is_relative:
                    noise *= ev.objectives[k]
                ev.objectives[k] += noise
    return noisy


def get_module_string(func: Callable) -> str:
    """Module string of the file containing ``func``
    (reference ``utils.py:128-137``)."""
    relative = (f"scamlgp_tpu{os.sep}benchmarking"
                + inspect.getmodule(func).__file__.split(
                    f"scamlgp_tpu{os.sep}benchmarking")[-1])
    return relative.replace(os.sep, ".")[:-3]


def _raise_on_missing_or_invalid_experiments_in_module(module: str):
    experiments = get_experiments_config_from_module(module)
    if not isinstance(experiments, dict):
        raise ValueError(
            f"Module {module}.EXPERIMENTS needs to be a dictionary but is "
            f"{type(experiments)}.")
    bad = {name: type(config) for name, config in experiments.items()
           if not isinstance(config, Experiment)}
    if bad:
        raise ValueError(
            f"Module {module}.EXPERIMENTS needs to contain exclusively "
            f"Experiment instances but contains: {bad}")


def _results_path(func_module: str, name: str, config_hash: str,
                  output_root: Optional[Path] = None) -> Path:
    root = Path(output_root) if output_root is not None else REPO_ROOT
    return (root / Path(*func_module.split(".")[:-1]) / "results"
            / f"{name}_{config_hash}")


def load_results_from_disk(configurations: Dict[str, Experiment],
                           func_module_string: str,
                           output_root: Optional[Path] = None) -> dict:
    """Merge all per-seed result JSONs on disk per experiment
    (reference ``utils.py:175-201``).  ``output_root`` mirrors
    ``local_runner.main``'s parameter (tests write there)."""
    all_results = {}
    for name, config in configurations.items():
        config_hash = hash_experiment_config(config)
        local_results_path = _results_path(func_module_string, name,
                                           config_hash, output_root)
        info_file_path = local_results_path / "info.json"
        if not info_file_path.exists():
            print(f"Unable to load results from {local_results_path}")
            continue
        with open(info_file_path, "r", encoding="UTF-8") as fh:
            all_results[name] = json.load(fh)
            all_results[name]["studies"] = []
        for results_file in glob.glob(str(local_results_path / "*.json")):
            if "info.json" in results_file:
                continue
            with open(results_file, "r", encoding="UTF-8") as fh:
                results = json.load(fh)
            all_results[name]["studies"].extend(results["studies"])
    return all_results


def submit_local_job(config: Experiment, experiment_key: str,
                     experiment_module: str, max_workers: int,
                     hpobench_path: Optional[str] = None,
                     fcnet_path: Optional[str] = None,
                     force_host_runner: bool = False):
    return submit_local_job_main(
        config=config, experiment_module=experiment_module,
        experiment_key=experiment_key, max_workers=max_workers,
        hpobench_path=hpobench_path, fcnet_path=fcnet_path,
        force_host_runner=force_host_runner)


def with_experiment_cli_and_data_loading(func):
    """Decorator providing the ``submit | visualize | hash`` CLI
    (reference ``utils.py:204-309``)."""

    def wrapper(available_configs: Dict[str, Experiment], argv=None):
        func_module_string = get_module_string(func)
        _raise_on_missing_or_invalid_experiments_in_module(func_module_string)

        parser = argparse.ArgumentParser(
            f"Benchmark experiment CLI ({func_module_string})")
        subparsers = parser.add_subparsers(
            title="modes", dest="mode", required=True,
            help="Submitting jobs or visualizing results")

        submit_parser = subparsers.add_parser(
            "submit", help="Submit configurations for evaluation")
        submit_parser.add_argument(
            "configurations", nargs="+",
            choices=["all"] + list(available_configs.keys()))
        submit_parser.add_argument("--hpobench", type=str, default=None,
                                   help="Directory of HPOBench tabular data.")
        submit_parser.add_argument("--fcnet", type=str, default=None,
                                   help="Directory of FCNet tabular data.")
        submit_parser.add_argument(
            "--parallel-studies", type=int, default=None,
            help="Override per-config parallel study count (default: 1, or "
            "min(64, cpus) when compute == PARALLEL on the CPU backend).")
        submit_parser.add_argument(
            "--host-runner", action="store_true",
            help="Force the sequential per-study host runner even when the "
            "experiment could run as one vectorized on-device campaign "
            "(the default fast path on a TPU backend).")

        visualize_parser = subparsers.add_parser("visualize",
                                                 help="Visualize results")
        visualize_parser.add_argument(
            "configurations", nargs="+",
            choices=["all"] + list(available_configs.keys()))

        hash_parser = subparsers.add_parser("hash",
                                            help="Print config fingerprints")
        hash_parser.add_argument(
            "configurations", nargs="+",
            choices=["all"] + list(available_configs.keys()))

        args = parser.parse_args(argv)

        if "all" in args.configurations:
            selected = available_configs
        else:
            selected = {n: available_configs[n] for n in args.configurations}
        print("Selected configurations:", ", ".join(selected.keys()))

        if args.mode == "submit":
            for name, config in selected.items():
                max_workers = (
                    (min(64, os.cpu_count())
                     if config.compute == "PARALLEL" else 1)
                    if args.parallel_studies is None else args.parallel_studies)
                print(f"Starting {name} locally, "
                      f"using max {max_workers} processes")
                submit_local_job(
                    config=config, experiment_key=name,
                    experiment_module=func_module_string,
                    hpobench_path=args.hpobench, fcnet_path=args.fcnet,
                    max_workers=max_workers,
                    force_host_runner=args.host_runner)
        elif args.mode == "hash":
            for name, config in selected.items():
                print(hash_experiment_config(config), name)
        else:
            results = load_results_from_disk(selected, func_module_string)
            return func(results)

    return wrapper
