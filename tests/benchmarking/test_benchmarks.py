"""Auto-discovered benchmark tests (reference
``tests/benchmarking/benchmarks_test.py:23-134``)."""

import numpy as np
import pytest

from scamlgp_tpu.benchmarking.benchmarks.base import Base
from scamlgp_tpu.benchmarking.utils import get_benchmarks
from scamlgp_tpu.bo.core import EvaluationSpecification

ALL_BENCHMARKS = [b for b in get_benchmarks()
                  if issubclass(b, Base) and b is not Base]


@pytest.mark.parametrize("benchmark_cls", ALL_BENCHMARKS,
                         ids=lambda b: b.__name__)
def test_seeded_tasks_reproducible_with_different_target(benchmark_cls, seed):
    """Same seed -> same meta tasks; target task is created seedless
    (reference ``benchmarks_test.py:24-40``)."""
    b1 = benchmark_cls(n_data_per_task=[3] * 4, seed=seed)
    b2 = benchmark_cls(n_data_per_task=[3] * 4, seed=seed)
    for uid in b1.meta_tasks:
        assert b1.meta_tasks[uid].descriptors == b2.meta_tasks[uid].descriptors
        assert b1.meta_tasks[uid].settings == b2.meta_tasks[uid].settings
        assert b1.meta_tasks[uid].context == b2.meta_tasks[uid].context


@pytest.mark.parametrize("benchmark_cls", ALL_BENCHMARKS,
                         ids=lambda b: b.__name__)
@pytest.mark.parametrize("distribution", ["random", "sobol"])
def test_meta_data_deterministic(benchmark_cls, distribution, seed):
    """Same seed -> identical meta-data for both distributions
    (reference ``benchmarks_test.py:61-101``)."""
    b = benchmark_cls(n_data_per_task=[4, 6], seed=seed)
    md1 = b.get_meta_data(distribution, seed=seed + 1)
    md2 = b.get_meta_data(distribution, seed=seed + 1)
    assert set(md1) == set(md2)
    for uid in md1:
        assert len(md1[uid]) == len(md2[uid])
        for e1, e2 in zip(md1[uid], md2[uid]):
            assert e1.configuration == e2.configuration
            assert e1.objectives == e2.objectives

    md3 = b.get_meta_data(distribution, seed=seed + 2)
    assert any(e1.configuration != e3.configuration
               for e1, e3 in zip(md1[list(md1)[0]], md3[list(md3)[0]]))


@pytest.mark.parametrize("benchmark_cls", ALL_BENCHMARKS,
                         ids=lambda b: b.__name__)
def test_output_dimensions(benchmark_cls, seed):
    b = benchmark_cls(n_data_per_task=[2], seed=seed)
    assert b.output_dimensions == 1
    config = b.search_space.sample(np.random.default_rng(seed))
    ev = b(EvaluationSpecification(configuration=config))
    assert set(ev.objectives) == {o.name for o in b.objectives}


@pytest.mark.parametrize("benchmark_cls", ALL_BENCHMARKS,
                         ids=lambda b: b.__name__)
def test_numpy_wrapper_equivalence(benchmark_cls, seed):
    """The scipy-facing wrapper matches the Evaluation path
    (reference ``benchmarks_test.py:115-134``)."""
    b = benchmark_cls(n_data_per_task=[2], seed=seed)
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=len(b.search_space))
    task = b.target_task
    via_wrapper = b._numpy_wrapper_call(x, context=task.context,
                                        settings=task.settings)
    config = b.search_space.from_numerical(x)
    via_eval = b(EvaluationSpecification(configuration=config))
    assert abs(via_wrapper - via_eval.objectives["loss"]) < 1e-12


def test_unknown_distribution_raises(seed):
    from scamlgp_tpu.benchmarking.benchmarks import Quadratic

    b = Quadratic(n_data_per_task=[2], seed=seed)
    with pytest.raises(ValueError, match="Unknown distribution"):
        b.get_meta_data("uniform", seed=seed)


def test_meta_data_heterogeneous_sizes(seed):
    from scamlgp_tpu.benchmarking.benchmarks import Branin

    b = Branin(n_data_per_task=[2, 5, 3], seed=seed)
    md = b.get_meta_data("random", seed=seed)
    assert [len(md[uid]) for uid in sorted(md)] == [2, 5, 3]


def test_eval_spec_settings_override(seed):
    """Explicit settings/context in the eval spec take precedence over task
    defaults (reference ``base.py:170-179``)."""
    from scamlgp_tpu.benchmarking.benchmarks import Branin

    b = Branin(n_data_per_task=[2], seed=seed)
    config = b.search_space.sample(np.random.default_rng(seed))
    default = b(EvaluationSpecification(configuration=config))
    overridden = b(EvaluationSpecification(
        configuration=config, settings={"r": 5.5, "s": 9.0},
        context={"t": 0.04}))
    assert default.objectives["loss"] != overridden.objectives["loss"]


def test_device_optima_matches_shgo(seed):
    """On-device multi-start minima == the reference's host-side SHGO
    (``benchmarks/base.py:258-268``) on the same task draws."""
    import jax

    from scamlgp_tpu.benchmarking.benchmarks import Branin, Hartmann3D
    from scamlgp_tpu.benchmarking.jax_adapters import (
        campaign_inputs_from_benchmark,
        device_optima,
    )

    for cls in (Branin, Hartmann3D):
        fn, tps, md, opt_shgo = campaign_inputs_from_benchmark(
            cls, [6] * 2, study_seeds=[seed % 1000, seed % 1000 + 1],
            noise_std=0.1, optimum_method="shgo")
        # same task draws: reuse tps rather than re-instantiating (the
        # target task is intentionally unseeded, base.py:128)
        opt_dev = device_optima(fn, tps, md.X.shape[-1],
                                key=jax.random.PRNGKey(seed))
        np.testing.assert_allclose(np.asarray(opt_dev),
                                   np.asarray(opt_shgo), rtol=1e-4,
                                   atol=1e-4)
