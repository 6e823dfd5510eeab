"""Meta-data fixtures over assorted space types (reference
``tests/meta_data_examples.py:8-175``): mixed int/float/bool/categorical
spaces, conditional spaces, fixed parameters, and a Forrester-family
generator."""

from typing import Dict, List

import numpy as np

from scamlgp_tpu.bo.core import Evaluation
from scamlgp_tpu.bo.space import (
    CategoricalParameter,
    ContinuousParameter,
    IntegerParameter,
    ParameterSpace,
)


def space_1d(seed=None) -> ParameterSpace:
    s = ParameterSpace()
    s.add(ContinuousParameter("x0", (0.5, 3.0)))
    if seed is not None:
        s.seed(seed)
    return s


def space_mixed(seed=None) -> ParameterSpace:
    s = ParameterSpace()
    s.add(ContinuousParameter("lr", (1e-5, 1e-1), transformation="log"))
    s.add(IntegerParameter("layers", (1, 4)))
    s.add(CategoricalParameter("optimizer", ["adam", "sgd"]))
    s.add(CategoricalParameter("use_bias", [True, False]))
    if seed is not None:
        s.seed(seed)
    return s


def space_conditional(seed=None) -> ParameterSpace:
    s = ParameterSpace()
    s.add(CategoricalParameter("model", ["linear", "mlp"]))
    s.add(ContinuousParameter("alpha", (1e-4, 1.0), transformation="log"),
          condition=lambda model: model == "linear")
    s.add(IntegerParameter("width", (8, 64)),
          condition=lambda model: model == "mlp")
    if seed is not None:
        s.seed(seed)
    return s


def space_with_fixed(seed=None) -> ParameterSpace:
    s = ParameterSpace()
    s.add(ContinuousParameter("x0", (0.5, 3.0)))
    s.add(ContinuousParameter("x1", (-1.0, 1.0)))
    s.fix(x1=0.5)
    if seed is not None:
        s.seed(seed)
    return s


def _mixed_objective(config: dict) -> float:
    val = float(np.log10(config["lr"]) + config["layers"])
    val += 0.5 if config["optimizer"] == "sgd" else 0.0
    val += 0.25 if config["use_bias"] else 0.0
    return val


def _conditional_objective(config: dict) -> float:
    if config["model"] == "linear":
        return float(np.log10(config["alpha"]))
    return float(config["width"]) / 64.0


def meta_data_for_space(space: ParameterSpace, objective_fn, n_tasks: int,
                        n_per_task: int, seed: int
                        ) -> Dict[str, List[Evaluation]]:
    rng = np.random.default_rng(seed)
    out: Dict[str, List[Evaluation]] = {}
    for t in range(n_tasks):
        shift = rng.normal() * 0.3
        evals = []
        for _ in range(n_per_task):
            c = space.sample(rng)
            evals.append(Evaluation(
                configuration=c,
                objectives={"loss": objective_fn(c) + shift}))
        out[f"task_{t}"] = evals
    return out


def forrester(x, a=1.0, b=0.0, c=0.0):
    """Forrester function family (reference ``meta_data_examples.py:141-175``):
    f(x) = a (6x-2)^2 sin(12x-4) + b (x-0.5) + c."""
    return a * (6 * x - 2) ** 2 * np.sin(12 * x - 4) + b * (x - 0.5) + c


def forrester_meta_data(n_tasks: int, n_per_task: int, seed: int
                        ) -> Dict[str, List[Evaluation]]:
    rng = np.random.default_rng(seed)
    out: Dict[str, List[Evaluation]] = {}
    for t in range(n_tasks):
        a = 1.0 + 0.2 * rng.normal()
        b = 2.0 * rng.normal()
        c = rng.normal()
        evals = []
        for _ in range(n_per_task):
            x = float(rng.uniform())
            evals.append(Evaluation(configuration={"x": x},
                                    objectives={"loss":
                                                float(forrester(x, a, b, c))}))
        out[f"forrester_{t}"] = evals
    return out
