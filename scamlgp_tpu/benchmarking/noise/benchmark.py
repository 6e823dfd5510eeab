"""Benchmark + noise composition (reference
``benchmarking/noise/benchmark.py:15-76``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from scamlgp_tpu.benchmarking.benchmarks.api import SeedType, Task
from scamlgp_tpu.benchmarking.benchmarks.base import Base
from scamlgp_tpu.benchmarking.noise.base import NoiseBase
from scamlgp_tpu.bo.core import Evaluation, EvaluationSpecification, Objective
from scamlgp_tpu.bo.space import ParameterSpace


class NoisyBenchmark(Base):
    def __init__(self, benchmark: Base, noise_model: NoiseBase):
        """Delegates all properties to the wrapped noise-free benchmark;
        the ``optimum`` stays noise-free."""
        self.noise_free_benchmark = benchmark
        self.noise_model = noise_model
        if hasattr(self.noise_free_benchmark, "optimum"):
            self.optimum = self.noise_free_benchmark.optimum
        if hasattr(self.noise_free_benchmark, "pareto_front"):
            self.pareto_front = self.noise_free_benchmark.pareto_front

    @property
    def target_task(self) -> Task:
        return self.noise_free_benchmark._target_task

    @property
    def meta_tasks(self) -> Dict[Union[str, int], Task]:
        return self.noise_free_benchmark._meta_tasks

    @property
    def search_space(self) -> ParameterSpace:
        return self.noise_free_benchmark._search_space

    @property
    def output_dimensions(self) -> int:
        return len(self.noise_free_benchmark.objectives)

    @property
    def objectives(self) -> List[Objective]:
        return self.noise_free_benchmark._objectives

    def __call__(self, eval_spec: EvaluationSpecification,
                 task_uid: Optional[Union[str, int]] = None) -> Evaluation:
        evaluation = self.noise_free_benchmark(eval_spec=eval_spec,
                                               task_uid=task_uid)
        return self.noise_model(evaluation)

    def get_meta_data(self, distribution: str,
                      seed: Optional[SeedType] = None
                      ) -> Dict[Union[str, int], List[Evaluation]]:
        """Noise-free meta-data with noise applied per evaluation using one
        shared rng (reference ``noise/benchmark.py:55-76``)."""
        rng = np.random.default_rng(seed)
        noise_free = self.noise_free_benchmark.get_meta_data(
            seed=rng, distribution=distribution)
        return {task_id: [self.noise_model(e, rng) for e in eval_list]
                for task_id, eval_list in noise_free.items()}
