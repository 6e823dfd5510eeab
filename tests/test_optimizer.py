"""ScaMLGPBO integration tests (reference ``tests/optimizer_test.py:25-97``).

Runs the imported conformance suites exactly like the reference parametrizes
over blackboxopt's ``ALL_REFERENCE_TESTS`` + ``META_OPTIMIZER_REFERENCE_TESTS``.
"""

import numpy as np
import pytest

from scamlgp_tpu import testing as conformance
from scamlgp_tpu.bo.core import Evaluation, Objective, OptimizerError
from scamlgp_tpu.bo.optimizer import ScaMLGPBO
from scamlgp_tpu.bo.space import ContinuousParameter, ParameterSpace

FAST_KWARGS = dict(
    num_restarts_log_likelihood=2,
    num_fit_steps=30,
    af_optimizer_kwargs={"raw_samples": 256, "num_restarts": 4,
                         "num_steps": 25},
)


@pytest.mark.parametrize(
    "reference_test",
    conformance.ALL_REFERENCE_TESTS + conformance.META_OPTIMIZER_REFERENCE_TESTS,
    ids=lambda t: t.__name__)
def test_reference_suite(reference_test, seed):
    kwargs = dict(FAST_KWARGS)
    kwargs["meta_data"] = conformance.META_DATA_1D
    reference_test(ScaMLGPBO, kwargs, seed)


def test_max_pending_evaluations(seed):
    space = ParameterSpace()
    space.add(ContinuousParameter("x0", (0.5, 3)))
    opt = ScaMLGPBO(space, Objective("loss", False),
                    conformance.META_DATA_1D, seed=seed, **FAST_KWARGS)
    opt.generate_evaluation_specification()
    with pytest.raises(OptimizerError, match="pending"):
        opt.generate_evaluation_specification()


def test_none_objective_keeps_all_evals_trains_on_subset(seed):
    """5-step loop with one None objective: optimizer retains all n
    evaluations, model trains on n-1 (reference optimizer_test.py:56-97)."""
    space = ParameterSpace()
    space.add(ContinuousParameter("x0", (0.5, 3)))
    opt = ScaMLGPBO(space, Objective("loss", False),
                    conformance.META_DATA_1D, seed=seed, **FAST_KWARGS)
    for i in range(5):
        es = opt.generate_evaluation_specification()
        loss = None if i == 2 else conformance._run_experiment_1d_deterministic(
            **es.configuration)
        opt.report(es.create_evaluation(objectives={"loss": loss}))
    assert len(opt.X) == 5
    assert int(np.sum(opt.model.train_mask)) == 4


def test_expected_improvement_with_initial_random(seed):
    """EI requires data — run with an initial random design (reference
    optimizer.py:101-105 note)."""
    from scamlgp_tpu.bo.acquisition import ExpectedImprovement

    space = ParameterSpace()
    space.add(ContinuousParameter("x0", (0.5, 3)))
    kwargs = dict(FAST_KWARGS)
    kwargs["acquisition_function_factory"] = ExpectedImprovement
    kwargs["num_initial_random_samples"] = 2
    opt = ScaMLGPBO(space, Objective("loss", False),
                    conformance.META_DATA_1D, seed=seed, **kwargs)
    losses = []
    for i in range(4):
        es = opt.generate_evaluation_specification()
        if i < 2:
            assert es.optional_info["model_based_pick"] is False
        loss = conformance._run_experiment_1d_deterministic(**es.configuration)
        losses.append(loss)
        opt.report(es.create_evaluation(objectives={"loss": loss}))
    assert all(np.isfinite(losses))


def test_hmc_fit_method(seed):
    """fit_method='hmc': hyperparameter-posterior mixture acquisition runs
    end-to-end and proposes finite configurations."""
    space = ParameterSpace()
    space.add(ContinuousParameter("x0", (0.5, 3)))
    kwargs = dict(FAST_KWARGS)
    kwargs["fit_method"] = "hmc"
    kwargs["hmc_kwargs"] = {"num_chains": 2, "num_warmup": 40,
                            "num_samples": 20, "num_leapfrog": 6,
                            "mixture_samples": 8}
    opt = ScaMLGPBO(space, Objective("loss", False),
                    conformance.META_DATA_1D, seed=seed, **kwargs)
    for _ in range(3):
        es = opt.generate_evaluation_specification()
        x0 = es.configuration["x0"]
        assert 0.5 <= x0 <= 3.0
        opt.report(es.create_evaluation(
            objectives={"loss":
                        conformance._run_experiment_1d_deterministic(x0)}))
    assert opt._hyper_samples is not None
    w = np.asarray(opt.model.weights)
    assert np.all(np.isfinite(w))


def test_greater_is_better_objective(seed):
    """Maximization objectives are negated into losses internally."""
    space = ParameterSpace()
    space.add(ContinuousParameter("x0", (0.5, 3)))
    meta = {
        "t": [Evaluation(configuration={"x0": x},
                         objectives={"score": -conformance.
                                     _run_experiment_1d_deterministic(x)})
              for x in (0.8, 1.5, 2.2, 2.9)]
    }
    opt = ScaMLGPBO(space, Objective("score", True), meta, seed=seed,
                    **FAST_KWARGS)
    for _ in range(3):
        es = opt.generate_evaluation_specification()
        score = -conformance._run_experiment_1d_deterministic(
            **es.configuration)
        opt.report(es.create_evaluation(objectives={"score": score}))
    mean, std = opt.predict([{"x0": 1.56}])
    assert np.isfinite(mean[0]) and std[0] > 0


def test_capacity_hint_precompiles_buckets():
    """capacity_hint compiles every capacity bucket's fit + acquisition
    program at init while the loop keeps running at its CURRENT bucket's
    size — round 4's pre-size-to-max made every iteration pay for the
    final shape, a measured 70% steady-state slowdown
    (docs/SEQ_DRIVER_TPU_HINT.json vs SEQ_DRIVER_TPU.json)."""
    import numpy as np

    from scamlgp_tpu.bo import optimize as acqopt
    from scamlgp_tpu.bo.core import Evaluation, Objective
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO
    from scamlgp_tpu.bo.space import ContinuousParameter, ParameterSpace
    from scamlgp_tpu.models import scamlgp as model_lib

    space = ParameterSpace()
    space.add(ContinuousParameter("x", (0.0, 1.0)))
    meta = {"t": [Evaluation(configuration={"x": float(u)},
                             objectives={"loss": float((u - 0.4) ** 2)})
                  for u in np.linspace(0.1, 0.9, 6)]}
    opt = ScaMLGPBO(space, Objective("loss", False), meta, seed=0,
                    capacity_hint=12, num_restarts_log_likelihood=1,
                    num_fit_steps=5,
                    af_optimizer_kwargs={"raw_samples": 16,
                                         "num_restarts": 2,
                                         "num_steps": 3})
    # the empty model sits in the MINIMUM bucket, not the hint's
    assert opt.model.train_X.shape[0] == 8
    fit_cache = model_lib.fit_scamlgp._cache_size()
    acq_cache = acqopt._optimize._cache_size()
    # drive the loop across the 8 -> 16 bucket boundary
    caps = set()
    for _ in range(10):
        spec = opt.generate_evaluation_specification()
        opt.report(Evaluation(configuration=spec.configuration,
                              objectives={"loss": 0.5}))
        caps.add(opt.model.train_X.shape[0])
    assert caps == {8, 16}  # buffers track the data, not the hint
    # crossing the boundary hit programs precompiled at init — no new
    # traces/compiles of the fit or acquisition entry points
    assert model_lib.fit_scamlgp._cache_size() == fit_cache
    assert acqopt._optimize._cache_size() == acq_cache
