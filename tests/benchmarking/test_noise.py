"""Noise model tests (reference ``tests/benchmarking/noise_test.py:10-145``)."""

import numpy as np
import pytest

from scamlgp_tpu.benchmarking.benchmarks import Quadratic
from scamlgp_tpu.benchmarking.noise import (
    HomoscedasticGaussianNoise,
    NoisyBenchmark,
)
from scamlgp_tpu.benchmarking.utils import add_noise_to_meta_data_objectives
from scamlgp_tpu.bo.core import Evaluation, EvaluationSpecification


def _eval():
    return Evaluation(configuration={"x": 0.3}, objectives={"loss": 1.5})


def test_same_seed_reproducible():
    n1 = HomoscedasticGaussianNoise({"loss": 0.5}, seed=7)
    n2 = HomoscedasticGaussianNoise({"loss": 0.5}, seed=7)
    assert n1(_eval()).objectives == n2(_eval()).objectives


def test_zero_noise_identity():
    n = HomoscedasticGaussianNoise({"loss": 0.0}, seed=1)
    assert n(_eval()).objectives["loss"] == 1.5


def test_original_evaluation_untouched():
    n = HomoscedasticGaussianNoise({"loss": 1.0}, seed=1)
    e = _eval()
    _ = n(e)
    assert e.objectives["loss"] == 1.5


def test_missing_noise_key_raises():
    n = HomoscedasticGaussianNoise({"other": 1.0}, seed=1)
    with pytest.raises(KeyError, match="no noise for objective"):
        n(_eval())


def test_unused_noise_keys_tolerated():
    n = HomoscedasticGaussianNoise({"loss": 0.1, "extra": 5.0}, seed=1)
    out = n(_eval())
    assert "extra" not in out.objectives


def test_repr_stable():
    n = HomoscedasticGaussianNoise({"loss": 0.5}, seed=3)
    assert repr(n) == repr(HomoscedasticGaussianNoise({"loss": 0.5}, seed=3))


def test_noisy_benchmark_composition(seed):
    bench = Quadratic(n_data_per_task=[3] * 2, seed=seed)
    noisy = NoisyBenchmark(bench, HomoscedasticGaussianNoise({"loss": 0.5},
                                                             seed=seed))
    # optimum unaffected by noise
    assert noisy.optimum == bench.optimum
    assert len(noisy.search_space) == len(bench.search_space)
    assert noisy.meta_tasks == bench.meta_tasks

    config = bench.search_space.sample(np.random.default_rng(seed))
    clean = bench(EvaluationSpecification(configuration=config))
    noised = noisy(EvaluationSpecification(configuration=config))
    assert clean.objectives["loss"] != noised.objectives["loss"]


def test_noisy_vs_clean_meta_data_share_configs(seed):
    """Same seed: noisy meta-data shares configurations with clean meta-data
    but differs in objectives (reference noise tests)."""
    bench = Quadratic(n_data_per_task=[4] * 2, seed=seed)
    noisy = NoisyBenchmark(bench, HomoscedasticGaussianNoise({"loss": 0.5},
                                                             seed=seed))
    md_clean = bench.get_meta_data("random", seed=123)
    md_noisy = noisy.get_meta_data("random", seed=123)
    for uid in md_clean:
        for ec, en in zip(md_clean[uid], md_noisy[uid]):
            assert ec.configuration == en.configuration
            assert ec.objectives["loss"] != en.objectives["loss"]


def test_zero_noise_meta_data_equivalence(seed):
    bench = Quadratic(n_data_per_task=[3] * 2, seed=seed)
    noisy = NoisyBenchmark(bench, HomoscedasticGaussianNoise({"loss": 0.0},
                                                             seed=seed))
    md_clean = bench.get_meta_data("random", seed=99)
    md_noisy = noisy.get_meta_data("random", seed=99)
    for uid in md_clean:
        for ec, en in zip(md_clean[uid], md_noisy[uid]):
            assert ec.objectives == en.objectives


def test_add_noise_to_meta_data_objectives(seed):
    md = {"t": [Evaluation(configuration={"x": 0.1},
                           objectives={"loss": 2.0}),
                Evaluation(configuration={"x": 0.2},
                           objectives={"loss": None})]}
    noisy = add_noise_to_meta_data_objectives(md, 0.5, seed=seed)
    assert noisy["t"][0].objectives["loss"] != 2.0
    assert noisy["t"][1].objectives["loss"] is None
    # original untouched
    assert md["t"][0].objectives["loss"] == 2.0
