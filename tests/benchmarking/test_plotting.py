"""Plot/analysis layer on synthetic study payloads."""

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from scamlgp_tpu.benchmarking.configurations.styles import OPTIMIZER_STYLES
from scamlgp_tpu.benchmarking.experiment_config_utils import (
    Experiment,
    parse_experiment_config,
)
from scamlgp_tpu.benchmarking.plotting import (
    _regret_curves,
    grouped_results,
    plot_meta_data_summary_comparison,
)
from scamlgp_tpu.bo.core import Objective
from scamlgp_tpu.bo.optimizer import ScaMLGPBO


def _fake_studies(rng, n_studies, n_evals, noisy=False):
    studies = []
    for s in range(n_studies):
        losses = np.abs(rng.normal(2.0, 1.0, size=n_evals)) + 0.01
        evaluations = []
        for i in range(n_evals):
            objectives = {"loss": float(losses[i])}
            if noisy:
                objectives = {"loss (noisy)": float(losses[i] + 0.1),
                              "loss (noise free)": float(losses[i])}
            evaluations.append({"configuration": {"x": 0.1 * i},
                                "objectives": objectives})
        studies.append({
            "optimum": 0.0,
            "objectives": [{"name": "loss", "greater_is_better": False}],
            "evaluations": evaluations,
            "seed": s,
        })
    return studies


def _fake_run(config, studies):
    return {
        "experiment_config": parse_experiment_config(config.__dict__) | {
            "optimizer": config.optimizer,
            "benchmark": config.benchmark},
        "studies": studies,
    }


def test_noise_free_objective_preferred(rng):
    studies = _fake_studies(rng, 3, 5, noisy=True)
    regrets = _regret_curves(studies)
    assert len(regrets) == 3 and len(regrets[0]) == 5
    for r in regrets:
        assert all(np.diff(r) <= 1e-12)


def test_grouped_results_builds_figure(rng):
    config = Experiment(optimizer=ScaMLGPBO,
                        benchmark={"cls": "B",
                                   "kwargs": {"n_data_per_task": [4] * 2}},
                        n_evaluations=6, n_studies=4, compute="X")
    runs = [{"experiment_config": config.__dict__,
             "studies": _fake_studies(rng, 4, 6)}]
    fig = grouped_results(
        runs, optimizer_styles=OPTIMIZER_STYLES,
        groups={"G1": [config]}, robust_statistics=True,
        objective=Objective("loss", False), use_regrets=True)
    assert isinstance(fig, plt.Figure)
    plt.close(fig)

    fig2 = grouped_results(
        runs, optimizer_styles=OPTIMIZER_STYLES,
        groups={"G1": [config]}, robust_statistics=False,
        objective=Objective("loss", False), use_regrets=False)
    assert isinstance(fig2, plt.Figure)
    plt.close(fig2)


def test_meta_data_summary_comparison(rng):
    results = {}
    for m_tasks in (2, 4):
        config = Experiment(
            optimizer=ScaMLGPBO,
            benchmark={"cls": "B",
                       "kwargs": {"n_data_per_task": [8] * m_tasks}},
            n_evaluations=6, n_studies=3, compute="X")
        results[f"EXP_T{m_tasks}"] = {
            "experiment_config": parse_experiment_config(config.__dict__),
            "studies": _fake_studies(rng, 3, 6),
        }
    fig, ax = plt.subplots()
    plot_meta_data_summary_comparison(
        results, styles=OPTIMIZER_STYLES, ax=ax, num_points_per_task=8)
    assert len(ax.lines) >= 1 or len(ax.containers) >= 1
    plt.close(fig)
