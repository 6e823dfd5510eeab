"""RF tabular HPO experiment grid (reference
``benchmarking/configurations/rf_tabular.py``):
HPOBench rf, 27 tasks x 128 pts; 60 evals x 256 studies."""

from pathlib import Path
from typing import Any, Dict

from scamlgp_tpu.benchmarking.benchmarks.hpo_bench_tabular import HPOBenchTabular
from scamlgp_tpu.benchmarking.configurations.styles import OPTIMIZER_STYLES
from scamlgp_tpu.benchmarking.experiment_config_utils import Experiment
from scamlgp_tpu.benchmarking.plotting import grouped_results
from scamlgp_tpu.benchmarking.utils import with_experiment_cli_and_data_loading
from scamlgp_tpu.bo.core import Objective
from scamlgp_tpu.bo.optimizer import ScaMLGPBO


@with_experiment_cli_and_data_loading
def main(results: dict):
    fig = grouped_results(
        list(results.values()),
        optimizer_styles=OPTIMIZER_STYLES,
        groups={
            "RF Tabular\n27 Tasks à 128 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("RF_T27_P128")],
        },
        robust_statistics=False,
        use_regrets=True,
        objective=Objective("1 - Accuracy", False),
    )
    fig.savefig(
        Path(__file__).parent
        / f"{Path(__file__).name[:-3]}_benchmark_wise_regrets.pdf")


_RF_T27_P128_CONFIG = {
    "cls": HPOBenchTabular,
    "kwargs": {"scenario": "rf", "n_data_per_task": [128] * 27},
}

_DEFAULTS: Dict[str, Any] = dict(
    n_evaluations=60, n_studies=256, compute="PARALLEL")

EXPERIMENTS = {
    "RF_T27_P128_SCAMLGP": Experiment(
        benchmark=_RF_T27_P128_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
}

if __name__ == "__main__":
    main(EXPERIMENTS)
