"""SVM tabular HPO experiment grid (reference
``benchmarking/configurations/svm_tabular.py``):
HPOBench svm, 28 tasks x 64 pts; 60 evals x 256 studies."""

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
            "SVM Tabular\n28 Tasks à 64 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("SVM_T28_P64")],
        },
        robust_statistics=False,
        use_regrets=True,
        objective=Objective("1 - Accuracy", False),
    )
    fig.savefig(
        Path(__file__).parent
        / f"{Path(__file__).name[:-3]}_benchmark_wise_regrets.pdf")


_SVM_T28_P64_CONFIG = {
    "cls": HPOBenchTabular,
    "kwargs": {"scenario": "svm", "n_data_per_task": [64] * 28},
}

_DEFAULTS: Dict[str, Any] = dict(
    n_evaluations=60, n_studies=256, compute="PARALLEL")

EXPERIMENTS = {
    "SVM_T28_P64_SCAMLGP": Experiment(
        benchmark=_SVM_T28_P64_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
}

if __name__ == "__main__":
    main(EXPERIMENTS)
