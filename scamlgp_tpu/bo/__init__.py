from scamlgp_tpu.bo.core import (
    Evaluation,
    EvaluationSpecification,
    Objective,
    run_optimization_loop,
    sort_evaluations,
)
from scamlgp_tpu.bo.optimizer import ScaMLGPBO, SingleObjectiveOptimizer
from scamlgp_tpu.bo.space import (
    CategoricalParameter,
    ContinuousParameter,
    IntegerParameter,
    OrdinalParameter,
    ParameterSpace,
)

__all__ = [
    "Evaluation", "EvaluationSpecification", "Objective",
    "run_optimization_loop", "sort_evaluations", "ScaMLGPBO",
    "SingleObjectiveOptimizer", "CategoricalParameter",
    "ContinuousParameter", "IntegerParameter", "OrdinalParameter",
    "ParameterSpace",
]
