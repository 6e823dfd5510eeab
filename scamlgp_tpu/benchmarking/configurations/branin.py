"""Branin experiment grid (reference
``benchmarking/configurations/branin.py:47-75``): sigma_noise = 1.0,
40 evals x 128 studies, M = 8 / 32 tasks x 32 points.

CLI: ``python -m scamlgp_tpu.benchmarking.configurations.branin
submit|visualize|hash all``.
"""

from pathlib import Path
from typing import Any, Dict

from scamlgp_tpu.benchmarking.benchmarks.branin import Branin
from scamlgp_tpu.benchmarking.configurations.styles import OPTIMIZER_STYLES
from scamlgp_tpu.benchmarking.noise.homoscedastic import (
    HomoscedasticGaussianNoise,
)
from scamlgp_tpu.benchmarking.plotting import grouped_results
from scamlgp_tpu.benchmarking.utils import with_experiment_cli_and_data_loading
from scamlgp_tpu.benchmarking.experiment_config_utils import Experiment
from scamlgp_tpu.bo.core import Objective
from scamlgp_tpu.bo.optimizer import ScaMLGPBO


@with_experiment_cli_and_data_loading
def main(results: dict):
    for robust_statistics in [True, False]:
        fig = grouped_results(
            list(results.values()),
            optimizer_styles=OPTIMIZER_STYLES,
            groups={
                "Branin\n8 Tasks à 32 Points (σ_noise=1.0)": [
                    v for k, v in EXPERIMENTS.items()
                    if k.startswith("BRANIN_T8_P32_N1")],
                "Branin\n32 Tasks à 32 Points (σ_noise=1.0)": [
                    v for k, v in EXPERIMENTS.items()
                    if k.startswith("BRANIN_T32_P32_N1")],
            },
            use_regrets=True,
            robust_statistics=robust_statistics,
            use_benchmark_optimum=True,
            objective=Objective("loss", greater_is_better=False),
        )
        stats_label = "median_25quant75" if robust_statistics else "mean_sem"
        fig.savefig(
            Path(__file__).parent
            / f"{Path(__file__).name[:-3]}_benchmark_wise_regrets_"
              f"{stats_label}.pdf")


DEFAULTS_BRANIN: Dict[str, Any] = dict(
    n_evaluations=40, n_studies=128, compute="PARALLEL")

BRANIN_CONFIG = {
    "cls": Branin,
    "kwargs": {"n_data_per_task": []},
    "noise_spec": HomoscedasticGaussianNoise(noise_std={"loss": 1.0}),
}
BRANIN_T8_P32_CONFIG = {
    "cls": Branin,
    "kwargs": {"n_data_per_task": [32] * 8},
    "noise_spec": HomoscedasticGaussianNoise(noise_std={"loss": 1.0}),
}
BRANIN_T32_P32_CONFIG = {
    "cls": Branin,
    "kwargs": {"n_data_per_task": [32] * 32},
    "noise_spec": HomoscedasticGaussianNoise(noise_std={"loss": 1.0}),
}

EXPERIMENTS = {
    "BRANIN_T8_P32_N1_SCAMLGP": Experiment(
        benchmark=BRANIN_T8_P32_CONFIG, optimizer=ScaMLGPBO,
        **DEFAULTS_BRANIN),
    "BRANIN_T32_P32_N1_SCAMLGP": Experiment(
        benchmark=BRANIN_T32_P32_CONFIG, optimizer=ScaMLGPBO,
        **DEFAULTS_BRANIN),
}

if __name__ == "__main__":
    main(EXPERIMENTS)
