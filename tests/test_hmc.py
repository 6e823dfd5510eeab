"""HMC sampler: calibration on a known Gaussian + GP hyperparameter runs."""

import jax
import jax.numpy as jnp
import numpy as np

from scamlgp_tpu.models import gp, hmc
from scamlgp_tpu.models import scamlgp as m


def test_hmc_standard_normal_moments():
    """Samples from N(mu, diag(sigma^2)) reproduce mean/std."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mu) / sigma) ** 2)

    def chain(k):
        k1, k2 = jax.random.split(k)
        init = jax.random.normal(k1, (3,), jnp.float64)
        return hmc.hmc(log_prob, init, k2, num_warmup=300, num_samples=500,
                       num_leapfrog=8)

    samples, info = jax.vmap(chain)(jax.random.split(jax.random.PRNGKey(0), 4))
    xs = np.asarray(samples).reshape(-1, 3)
    acc = float(np.mean(np.asarray(info["accept_prob"])))
    assert 0.5 < acc <= 1.0, f"acceptance {acc}"
    np.testing.assert_allclose(xs.mean(0), np.asarray(mu), atol=0.25)
    np.testing.assert_allclose(xs.std(0), np.asarray(sigma), rtol=0.3)


def test_nuts_standard_normal_moments():
    """Adaptive-trajectory NUTS reproduces the moments of a known Gaussian."""
    mu = jnp.asarray([1.0, -2.0, 0.5])
    sigma = jnp.asarray([0.5, 2.0, 1.0])

    def log_prob(x):
        return -0.5 * jnp.sum(((x - mu) / sigma) ** 2)

    def chain(k):
        k1, k2 = jax.random.split(k)
        init = jax.random.normal(k1, (3,), jnp.float64)
        return hmc.nuts(log_prob, init, k2, num_warmup=300, num_samples=500,
                        max_depth=6)

    samples, info = jax.vmap(chain)(jax.random.split(jax.random.PRNGKey(3), 4))
    xs = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(xs.mean(0), np.asarray(mu), atol=0.3)
    np.testing.assert_allclose(xs.std(0), np.asarray(sigma), rtol=0.35)
    assert float(np.mean(np.asarray(info["accept_prob"]))) > 0.5


def test_gp_hyperparameter_sampling_finite(rng):
    X = jnp.asarray(rng.uniform(size=(24, 2)))
    y = jnp.sin(5 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=24))
    y = (y - y.mean()) / y.std()
    mask = jnp.ones(24)
    cfg = gp.source_gp_config()
    samples, info = hmc.sample_gp_hyperparameters(
        cfg, X, y, mask, jax.random.PRNGKey(0), num_chains=2,
        num_warmup=100, num_samples=50, num_leapfrog=8)
    ls = np.asarray(jax.vmap(jax.vmap(
        lambda p: gp.constrain(cfg, p).lengthscale))(samples))
    assert ls.shape == (2, 50, 2)
    assert np.all(np.isfinite(ls))
    assert np.all((ls >= 1e-4) & (ls <= 1e2))
    acc = float(np.mean(np.asarray(info["accept_prob"])))
    assert acc > 0.3, f"acceptance {acc}"


def test_scamlgp_hyperparameter_sampling_and_mixture(rng):
    xs = [rng.uniform(size=(16, 1)) for _ in range(2)]
    ys = [np.sin(6 * x[:, 0]) for x in xs]
    stack, cfg = m.meta_fit_scamlgp(xs, ys, key=jax.random.PRNGKey(1),
                                    num_restarts_log_likelihood=1,
                                    num_steps=20)
    Xt = rng.uniform(size=(5, 1))
    yt = np.sin(6 * Xt[:, 0])
    model = m.build_scamlgp(stack, cfg, Xt, yt)
    tcfg = gp.target_gp_config()
    samples, info = hmc.sample_scamlgp_hyperparameters(
        model, tcfg, jax.random.PRNGKey(2), num_chains=2, num_warmup=80,
        num_samples=40, num_leapfrog=8)
    w = np.asarray(jax.vmap(jax.vmap(
        lambda p: m.weights_forward(p.raw_weights)))(samples))
    assert w.shape == (2, 40, 2)
    assert np.all(np.isfinite(w)) and np.all(w > 0)

    Xq = jnp.asarray(rng.uniform(size=(4, 1)))
    mean, var = hmc.posterior_mixture_diag(model, cfg, tcfg, samples, Xq,
                                           max_samples=16)
    assert mean.shape == (4,) and var.shape == (4,)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= 0)
