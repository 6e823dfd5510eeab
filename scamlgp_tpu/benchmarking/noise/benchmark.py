"""Noisy view of a benchmark: evaluations pass through a noise model, the
ground-truth ``optimum`` stays noise-free (behavior of reference
``benchmarking/noise/benchmark.py:15-76``)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from scamlgp_tpu.benchmarking.benchmarks.api import SeedType
from scamlgp_tpu.benchmarking.benchmarks.base import Base
from scamlgp_tpu.benchmarking.noise.base import NoiseBase
from scamlgp_tpu.bo.core import Evaluation, EvaluationSpecification


def _forward(attr: str, doc: str):
    """Read-only property delegating to the wrapped noise-free benchmark."""
    return property(lambda self: getattr(self.noise_free_benchmark, attr),
                    doc=doc)


class NoisyBenchmark(Base):
    """Wrap ``benchmark`` so every evaluation (and every meta-data
    objective) gets ``noise_model`` applied.

    The task structure, search space, and objectives are those of the
    wrapped benchmark; regret computations keep working because the
    noise-free ``optimum`` (and ``pareto_front``, when present) is exposed
    unchanged.
    """

    def __init__(self, benchmark: Base, noise_model: NoiseBase):
        self.noise_free_benchmark = benchmark
        self.noise_model = noise_model
        for clean_attr in ("optimum", "pareto_front"):
            if hasattr(benchmark, clean_attr):
                setattr(self, clean_attr, getattr(benchmark, clean_attr))

    target_task = _forward("target_task", "Target task (noise-free).")
    meta_tasks = _forward("meta_tasks", "Meta tasks (noise-free).")
    search_space = _forward("search_space", "Wrapped search space.")
    objectives = _forward("objectives", "Wrapped objective list.")
    output_dimensions = _forward("output_dimensions",
                                 "Wrapped output dimensionality.")

    def __call__(self, eval_spec: EvaluationSpecification,
                 task_uid: Optional[Union[str, int]] = None) -> Evaluation:
        clean = self.noise_free_benchmark(eval_spec=eval_spec,
                                          task_uid=task_uid)
        return self.noise_model(clean)

    def get_meta_data(self, distribution: str,
                      seed: Optional[SeedType] = None
                      ) -> Dict[Union[str, int], List[Evaluation]]:
        """Meta-data with noise drawn from ONE rng shared across all tasks
        and evaluations (so task order does not reshuffle the noise stream
        — reference ``noise/benchmark.py:55-76``)."""
        rng = np.random.default_rng(seed)
        clean = self.noise_free_benchmark.get_meta_data(
            distribution=distribution, seed=rng)
        return {uid: [self.noise_model(ev, rng) for ev in evs]
                for uid, evs in clean.items()}
