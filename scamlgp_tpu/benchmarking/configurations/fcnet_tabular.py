"""FCNet tabular experiment grid (reference
``benchmarking/configurations/fcnet_tabular.py:60-136``): each of 4 datasets
as target vs the other 3 as meta (3 x 256 pts), categoricals fixed to
near-optimal values; 80 evals x 128 studies."""

from pathlib import Path
from typing import Any, Dict

from scamlgp_tpu.benchmarking.benchmarks.fcnet_fixed_fidelity_tabular import (
    FCNetFixedFidelityTabularBenchmark,
)
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
            "FCNet Slice\n3 Tasks à 256 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("SLICE_T3_P256")],
            "FCNet Protein\n3 Tasks à 256 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("PROTEIN_T3_P256")],
            "FCNet Parkinsons\n3 Tasks à 256 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("PARKIN_T3_P256")],
            "FCNet Naval\n3 Tasks à 256 Points": [
                v for k, v in EXPERIMENTS.items()
                if k.startswith("NAVAL_T3_P256")],
        },
        robust_statistics=False,
        use_regrets=True,
        objective=Objective("valid_loss", False),
    )
    fig.savefig(
        Path(__file__).parent
        / f"{Path(__file__).name[:-3]}_benchmark_wise_regrets.pdf")


_T3_P256_KWARGS = {
    "n_data_per_task": [256] * 3,
    # don't expose the categoricals for optimization; pin them to the
    # (close-to) optimal values (reference fcnet_tabular.py:60-69)
    "fix_search_space": {
        "activation_fn_1": "relu",
        "activation_fn_2": "relu",
        "lr_schedule": "cosine",
    },
}

_ALL_FILES = [
    "fcnet_naval_propulsion_data.hdf5",
    "fcnet_parkinsons_telemonitoring_data.hdf5",
    "fcnet_protein_structure_data.hdf5",
    "fcnet_slice_localization_data.hdf5",
]


def _config(target_file: str) -> Dict[str, Any]:
    return {
        "cls": FCNetFixedFidelityTabularBenchmark,
        "kwargs": {
            "target_task_file": target_file,
            "meta_task_files": [f for f in _ALL_FILES if f != target_file],
            **_T3_P256_KWARGS,
        },
    }


_SLICE_T3_P256_CONFIG = _config("fcnet_slice_localization_data.hdf5")
_NAVAL_T3_P256_CONFIG = _config("fcnet_naval_propulsion_data.hdf5")
_PARKIN_T3_P256_CONFIG = _config("fcnet_parkinsons_telemonitoring_data.hdf5")
_PROTEIN_T3_P256_CONFIG = _config("fcnet_protein_structure_data.hdf5")

_DEFAULTS: Dict[str, Any] = dict(
    n_evaluations=80, n_studies=128, compute="PARALLEL")

EXPERIMENTS = {
    "SLICE_T3_P256_SCAMLGP": Experiment(
        benchmark=_SLICE_T3_P256_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
    "PROTEIN_T3_P256_SCAMLGP": Experiment(
        benchmark=_PROTEIN_T3_P256_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
    "PARKIN_T3_P256_SCAMLGP": Experiment(
        benchmark=_PARKIN_T3_P256_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
    "NAVAL_T3_P256_SCAMLGP": Experiment(
        benchmark=_NAVAL_T3_P256_CONFIG, optimizer=ScaMLGPBO, **_DEFAULTS),
}

if __name__ == "__main__":
    main(EXPERIMENTS)
