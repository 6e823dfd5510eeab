"""Auxiliary subsystems: checkpoint/resume, profiling, mixed-space BO."""

import numpy as np
import pytest

from scamlgp_tpu.bo.core import Objective
from scamlgp_tpu.bo.optimizer import ScaMLGPBO
from scamlgp_tpu.bo.space import ContinuousParameter, ParameterSpace
from scamlgp_tpu.utils import checkpoint, profiling

from tests import meta_data_examples as mde

FAST = dict(num_restarts_log_likelihood=1, num_fit_steps=20,
            af_optimizer_kwargs={"raw_samples": 64, "num_restarts": 2,
                                 "num_steps": 10})


def test_timer_report():
    t = profiling.Timer()
    with t("phase_a"):
        pass
    with t("phase_a"):
        pass
    with t("phase_b"):
        pass
    rep = t.report()
    assert rep["phase_a"]["count"] == 2
    assert rep["phase_b"]["count"] == 1
    assert rep["phase_a"]["total_s"] >= 0


def test_pytree_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 3)),
                                        jnp.asarray(2))}
    checkpoint.save_pytree(tmp_path / "ck", tree)
    restored = checkpoint.load_pytree_like(tmp_path / "ck", tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(restored["b"][0]),
                                  np.ones((2, 3)))


def test_pytree_checkpoint_atomic(tmp_path):
    """Saves are temp-file + rename: no *.tmp* litter, and an overwrite of
    an existing checkpoint either fully lands or leaves the old one."""
    import os

    import jax.numpy as jnp

    tree = {"a": jnp.arange(4.0)}
    checkpoint.save_pytree(tmp_path / "ck", tree)
    tree2 = {"a": jnp.arange(4.0) * 2}
    checkpoint.save_pytree(tmp_path / "ck", tree2)  # overwrite in place
    assert sorted(os.listdir(tmp_path)) == ["ck.npz", "ck.tree.json"]
    restored = checkpoint.load_pytree_like(tmp_path / "ck", tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]),
                                  np.arange(4.0) * 2)


def _forrester_space(seed):
    space = ParameterSpace()
    space.add(ContinuousParameter("x", (0.0, 1.0)))
    space.seed(seed)
    return space


def test_optimizer_checkpoint_resume(tmp_path, seed):
    meta = mde.forrester_meta_data(2, 8, seed)
    space = _forrester_space(seed)
    space2 = _forrester_space(seed)

    def objective(x):
        return float(mde.forrester(x))

    opt = ScaMLGPBO(space, Objective("loss", False), meta, seed=seed, **FAST)
    for _ in range(3):
        es = opt.generate_evaluation_specification()
        opt.report(es.create_evaluation(
            objectives={"loss": objective(es.configuration["x"])}))
    checkpoint.save_optimizer_state(tmp_path / "opt", opt)

    opt2 = ScaMLGPBO(space2, Objective("loss", False), meta, seed=seed,
                     **FAST)
    checkpoint.load_optimizer_state(tmp_path / "opt", opt2)
    assert len(opt2.X) == 3
    np.testing.assert_allclose(np.stack(opt2.X), np.stack(opt.X))
    np.testing.assert_allclose(opt2.losses, opt.losses)
    # resumed optimizer proposes the same next point as the original
    es_a = opt.generate_evaluation_specification()
    es_b = opt2.generate_evaluation_specification()
    assert es_a.configuration == es_b.configuration


@pytest.mark.parametrize("space_fn,objective_fn", [
    (mde.space_mixed, mde._mixed_objective),
    (mde.space_conditional, mde._conditional_objective),
    (mde.space_with_fixed,
     lambda c: float((c["x0"] - 1.5) ** 2 + c["x1"])),
], ids=["mixed", "conditional", "fixed"])
def test_bo_on_assorted_spaces(space_fn, objective_fn, seed):
    """The reference's fixture matrix (mixed/conditional/fixed spaces,
    tests/meta_data_examples.py) run through the full BO loop."""
    space = space_fn(seed)
    meta = mde.meta_data_for_space(space_fn(seed + 1), objective_fn, 2, 8,
                                  seed)
    opt = ScaMLGPBO(space, Objective("loss", False), meta, seed=seed, **FAST)
    for _ in range(3):
        es = opt.generate_evaluation_specification()
        assert space.check_validity(es.configuration)
        opt.report(es.create_evaluation(
            objectives={"loss": objective_fn(es.configuration)}))
    assert len(opt.X) == 3
