"""ScaML-GP meta-model tests: oracle parity of the hierarchical posterior,
training-mode/eval-mode consistency, weight pruning, meta-fit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scamlgp_tpu.models import gp
from scamlgp_tpu.models import scamlgp as m


def _forrester_family(rng, n_tasks, n_points, shift_scale=0.1):
    """Cheap 1-D family of related tasks (reference test fixture style,
    tests/meta_data_examples.py:141-175)."""
    xs, ys = [], []
    for _ in range(n_tasks):
        a = 1.0 + shift_scale * rng.normal()
        b = shift_scale * rng.normal()
        X = rng.uniform(size=(n_points, 1))
        y = a * ((6 * X[:, 0] - 2) ** 2) * np.sin(12 * X[:, 0] - 4) + b
        xs.append(X)
        ys.append(y)
    return xs, ys


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(7)
    xs, ys = _forrester_family(rng, 3, 24)
    key = jax.random.PRNGKey(0)
    stack, cfg = m.meta_fit_scamlgp(xs, ys, key=key, num_steps=40)
    return rng, xs, ys, stack, cfg


def test_pack_task_data_standardizes_per_task(fitted):
    _, xs, ys, stack, _ = fitted
    d = stack.data
    for i, y in enumerate(ys):
        assert abs(float(d.mean[i]) - y.mean()) < 1e-9
        assert abs(float(d.std[i]) - y.std(ddof=1)) < 1e-9
        n = len(y)
        got = np.asarray(d.y[i, :n]) * float(d.std[i]) + float(d.mean[i])
        np.testing.assert_allclose(got, y, atol=1e-9)


def test_heterogeneous_task_sizes_pack():
    rng = np.random.default_rng(3)
    xs = [rng.uniform(size=(5, 2)), rng.uniform(size=(9, 2))]
    ys = [rng.normal(size=5), rng.normal(size=9)]
    data = m.pack_task_data(xs, ys)
    assert data.X.shape == (2, 9, 2)
    np.testing.assert_allclose(np.asarray(data.mask.sum(axis=1)), [5, 9])


def test_validate_meta_data_errors():
    with pytest.raises(ValueError, match="Empty meta data"):
        m.validate_meta_data([], [])
    with pytest.raises(ValueError, match="Feature dim"):
        m.validate_meta_data([np.zeros((3, 2)), np.zeros((3, 1))],
                             [np.zeros(3), np.zeros(3)])
    with pytest.raises(ValueError, match="output dimension"):
        m.validate_meta_data([np.zeros((3, 2))], [np.zeros((3, 2))])


def test_source_fit_interpolates(fitted):
    """Each fitted source GP must interpolate its own (noisy-free) data."""
    _, xs, ys, stack, cfg = fitted
    means, _ = m.source_predict(stack, cfg, jnp.asarray(xs[0]))
    np.testing.assert_allclose(np.asarray(means[0]), ys[0],
                               atol=0.05 * np.std(ys[0]))


def test_source_predict_matches_manual_gp(fitted):
    """Task-0 posterior equals a hand-rolled exact GP with the same params.

    Uses hand-set, well-conditioned hyperparameters (noise 1e-3) rather than
    the fitted ones — the fitted noise sits at the 1e-8 constraint floor where
    the system is so ill-conditioned that any two correct solvers disagree at
    the posterior-covariance scale.
    """
    _, xs, ys, stack, cfg = fitted
    rng = np.random.default_rng(0)
    Xq = jnp.asarray(rng.uniform(size=(6, 1)))

    n_tasks = stack.num_tasks
    manual = gp.GPParams(
        raw_lengthscale=jnp.broadcast_to(
            cfg.lengthscale_constraint.inverse(jnp.asarray([0.4])),
            (n_tasks, 1)),
        raw_outputscale=jnp.broadcast_to(
            cfg.outputscale_constraint.inverse(jnp.asarray(1.5)), (n_tasks,)),
        raw_noise=jnp.broadcast_to(
            cfg.noise_constraint.inverse(jnp.asarray(1e-3)), (n_tasks,)),
    )
    stack = m.finalize_source_stack(stack.data, cfg, manual)
    means, covs = m.source_predict(stack, cfg, Xq)

    i = 0
    n = len(ys[i])
    p = jax.tree_util.tree_map(lambda leaf: leaf[i], stack.params)
    c = gp.constrain(cfg, p)
    X = np.asarray(stack.data.X[i, :n])
    y_std = np.asarray(stack.data.y[i, :n])
    from scamlgp_tpu.ops import kernels
    K = np.asarray(kernels.rbf(jnp.asarray(X), jnp.asarray(X),
                               c.lengthscale, c.outputscale))
    jitter = 1e-10 * (1 + np.abs(K.diagonal()).mean())
    A = K + (float(c.noise) + jitter) * np.eye(n)
    Kxq = np.asarray(kernels.rbf(jnp.asarray(X), Xq, c.lengthscale, c.outputscale))
    Kqq = np.asarray(kernels.rbf(Xq, Xq, c.lengthscale, c.outputscale))
    Ainv = np.linalg.inv(A)
    mean_ref = float(stack.data.mean[i]) + float(stack.data.std[i]) * (
        Kxq.T @ Ainv @ y_std)
    cov_ref = float(stack.data.std[i]) ** 2 * (Kqq - Kxq.T @ Ainv @ Kxq)
    np.testing.assert_allclose(np.asarray(means[i]), mean_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs[i]), cov_ref, atol=1e-5)


def test_significant_weights_mask_reference_semantics():
    """Criterion w_i sigma_i n_w / sum(w sigma) >= tau (model.py:192-215)."""
    w = jnp.asarray([1.0, 1.0, 1e-9])
    sig = jnp.asarray([1.0, 1.0, 1.0])
    mask = m.significant_weights_mask(w, sig, 1e-3)
    np.testing.assert_array_equal(np.asarray(mask), [True, True, False])
    # sigma rescaling can rescue a small weight
    mask2 = m.significant_weights_mask(
        jnp.asarray([1.0, 1e-4]), jnp.asarray([1e-3, 10.0]), 1e-3)
    np.testing.assert_array_equal(np.asarray(mask2), [True, True])


def test_empty_target_model_prior_is_raw_space(fitted):
    """With no target data the reference applies no outcome transform
    (model.py:307-308,376): the posterior is the raw-space weighted source
    mixture + target kernel."""
    _, xs, ys, stack, cfg = fitted
    model = m.build_scamlgp(stack, cfg, np.zeros((1, 1)), np.zeros(1),
                            train_mask=np.zeros(1))
    assert float(model.out_mean) == 0.0 and float(model.out_std) == 1.0

    Xq = jnp.asarray([[0.3], [0.7]])
    mean, cov = m.scamlgp_posterior(model, cfg, gp.target_gp_config(), Xq)

    w = np.asarray(model.weights)  # = 1/M each
    np.testing.assert_allclose(w, 1.0 / 3, rtol=1e-6)
    means_s, covs_s = m.source_predict(stack, cfg, Xq)
    prune = np.asarray(m.significant_weights_mask(
        model.weights, stack.data.std, 1e-3)).astype(float)
    mean_ref = (np.asarray(means_s) * (w * prune)[:, None]).sum(0)
    tc = gp.constrain(gp.target_gp_config(), model.params.gp)
    from scamlgp_tpu.ops import kernels
    cov_ref = (np.asarray(covs_s) * ((w * prune) ** 2)[:, None, None]).sum(0) \
        + np.asarray(kernels.rbf(Xq, Xq, tc.lengthscale, tc.outputscale))
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), cov_ref, atol=1e-5)


def test_posterior_interpolates_target_data(fitted):
    rng, xs, ys, stack, cfg = fitted
    n_t = 6
    Xt = rng.uniform(size=(n_t, 1))
    yt = 1.05 * ((6 * Xt[:, 0] - 2) ** 2) * np.sin(12 * Xt[:, 0] - 4) + 0.3
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    key = jax.random.PRNGKey(1)
    model = m.fit_scamlgp(model, tcfg, key, num_restarts=3, num_steps=40)
    mean, cov = m.scamlgp_posterior(model, cfg, tcfg, jnp.asarray(Xt))
    np.testing.assert_allclose(np.asarray(mean), yt,
                               atol=0.1 * np.std(yt) + 1e-3)
    assert np.all(np.diag(np.asarray(cov)) >= -1e-9)


def test_fit_scamlgp_puts_weight_on_related_task():
    """A source task identical to the target should receive the dominant
    weight; an unrelated task should be suppressed."""
    rng = np.random.default_rng(11)
    X1 = rng.uniform(size=(30, 1))
    f = lambda x: np.sin(8 * x[:, 0])
    xs = [X1, rng.uniform(size=(30, 1))]
    ys = [f(X1), rng.normal(size=30) * 2.0]  # task 0 related, task 1 noise
    stack, cfg = m.meta_fit_scamlgp(xs, ys, key=jax.random.PRNGKey(2),
                                    num_steps=40)
    Xt = rng.uniform(size=(10, 1))
    yt = f(Xt)
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    model = m.fit_scamlgp(model, tcfg, jax.random.PRNGKey(3),
                          num_restarts=4, num_steps=60)
    w = np.asarray(model.weights)
    assert w[0] > 2.0 * w[1], f"related-task weight not dominant: {w}"


def test_posterior_diag_matches_full(fitted):
    rng, xs, ys, stack, cfg = fitted
    Xt = rng.uniform(size=(5, 1))
    yt = np.sin(5 * Xt[:, 0])
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    Xq = jnp.asarray(rng.uniform(size=(7, 1)))
    mean_d, var_d = m.scamlgp_posterior_diag(model, cfg, tcfg, Xq)
    for j in range(7):
        mean_f, cov_f = m.scamlgp_posterior(model, cfg, tcfg, Xq[j:j + 1])
        assert abs(float(mean_d[j]) - float(mean_f[0])) < 1e-8
        assert abs(float(var_d[j]) - float(cov_f[0, 0])) < 1e-8


def test_cached_posterior_matches_joint(fitted):
    """scamlgp_acq_state + scamlgp_posterior_diag_cached == the joint
    conditioning path, in both original and standardized scales."""
    rng, xs, ys, stack, cfg = fitted
    Xt = rng.uniform(size=(6, 1))
    yt = np.sin(5 * Xt[:, 0])
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    model = m.fit_scamlgp(model, tcfg, jax.random.PRNGKey(11),
                          num_restarts=2, num_steps=30)
    Xq = jnp.asarray(rng.uniform(size=(9, 1)))
    state = m.scamlgp_acq_state(model, cfg, tcfg)
    for orig in (True, False):
        mean_c, var_c = m.scamlgp_posterior_diag_cached(
            model, cfg, tcfg, state, Xq, original_scale=orig)
        mean_j, var_j = m.scamlgp_posterior_diag(
            model, cfg, tcfg, Xq, original_scale=orig)
        np.testing.assert_allclose(np.asarray(mean_c), np.asarray(mean_j),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_j),
                                   rtol=1e-7, atol=1e-10)


def test_training_objective_finite_and_differentiable(fitted):
    rng, xs, ys, stack, cfg = fitted
    Xt = rng.uniform(size=(4, 1))
    yt = np.sin(5 * Xt[:, 0])
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    obj = lambda p: m.scamlgp_map_objective(model, tcfg, p)
    val, grads = jax.value_and_grad(obj)(model.params)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
