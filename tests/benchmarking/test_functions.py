"""Ground-truth function tests (reference
``tests/benchmarking/functions_test.py:7-111``): literature minima of
Branin/Hartmann3D/6D match direct evaluation and the SHGO-computed optimum."""

import numpy as np
import pytest

from scamlgp_tpu.benchmarking.benchmarks import Branin, Hartmann3D, Hartmann6D
from scamlgp_tpu.benchmarking.benchmarks.api import Task

HARTMANN3D = {
    "fun": Hartmann3D,
    "meta": {
        "x_min": {"x1": 0.114614, "x2": 0.555649, "x3": 0.852547},
        "f_min": -3.86278,
        "descriptors": {"alpha1": 1.0, "alpha2": 1.2, "alpha3": 3.0,
                        "alpha4": 3.2},
    },
}

HARTMANN6D = {
    "fun": Hartmann6D,
    "meta": {
        "x_min": {"x1": 0.20169, "x2": 0.150011, "x3": 0.476874,
                  "x4": 0.275332, "x5": 0.311652, "x6": 0.6573},
        "f_min": -3.32237,
        "descriptors": {"alpha1": 1.0, "alpha2": 1.2, "alpha3": 3.0,
                        "alpha4": 3.2},
    },
}

BRANIN2D = {
    "fun": Branin,
    "meta": {
        "x_min": {"x1": -np.pi, "x2": 12.275},
        "f_min": 0.397887,
        "descriptors": {"a": 1.0, "b": 5.1 / (4 * np.pi**2),
                        "c": 5 / np.pi},
        "settings": {"r": 6, "s": 10},
        "context": {"t": 1 / (8 * np.pi)},
    },
}

BENCHMARKS = (HARTMANN3D, HARTMANN6D, BRANIN2D)


@pytest.mark.parametrize("benchmark", BENCHMARKS,
                         ids=lambda b: b["fun"].__name__)
def test_known_and_actual_minima(benchmark):
    """Known minimum == direct function evaluation at the known argmin."""
    params_fun = {
        **benchmark["meta"]["x_min"],
        **benchmark["meta"]["descriptors"],
        **benchmark["meta"].get("settings", {}),
        **benchmark["meta"].get("context", {}),
    }
    b = benchmark["fun"](n_data_per_task=[], seed=3)
    actual = b.function(**params_fun)
    np.testing.assert_almost_equal(benchmark["meta"]["f_min"], actual,
                                   decimal=4)


@pytest.mark.parametrize("benchmark", BENCHMARKS,
                         ids=lambda b: b["fun"].__name__)
def test_known_and_calculated_minima(benchmark):
    """Known minimum == SHGO-computed benchmark optimum."""
    b = benchmark["fun"](n_data_per_task=[], seed=3)
    b._target_task = Task(
        uid="test_instance",
        descriptors=benchmark["meta"]["descriptors"],
        settings=benchmark["meta"].get("settings", {}),
        context=benchmark["meta"].get("context", {}),
    )
    np.testing.assert_almost_equal(benchmark["meta"]["f_min"], b.optimum,
                                   decimal=4)


def test_hartmann_vectorized_matches_scalar(rng):
    from scamlgp_tpu.benchmarking.functions.hartmann import (
        A3, P3, Hartmann3D as H3Fn, hartmann_function)

    X = rng.uniform(size=(10, 3))
    alpha = np.array([1.0, 1.2, 3.0, 3.2])
    vec = hartmann_function(X, alpha, A3, P3)
    fn = H3Fn()
    for i in range(10):
        scalar = fn(*X[i], *alpha)
        assert abs(scalar - vec[i]) < 1e-12
