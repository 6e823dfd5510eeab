"""Numerical parity tests of the ops layer against trusted oracles.

The reference has no such tests (it trusts torch/gpytorch); SURVEY.md section 4
calls for adding posterior-moment/MLL parity tests vs an oracle in the TPU
build.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.distance import cdist
from scipy.stats import multivariate_normal

from scamlgp_tpu.ops import kernels, linalg


@pytest.fixture
def data(rng):
    X = jnp.asarray(rng.uniform(size=(9, 3)))
    Z = jnp.asarray(rng.uniform(size=(5, 3)))
    ls = jnp.asarray(rng.uniform(0.2, 2.0, size=3))
    return X, Z, ls


def test_rbf_matches_naive(data):
    X, Z, ls = data
    K = np.asarray(kernels.rbf(X, Z, ls, 1.7))
    D2 = cdist(np.asarray(X) / np.asarray(ls), np.asarray(Z) / np.asarray(ls),
               "sqeuclidean")
    np.testing.assert_allclose(K, 1.7 * np.exp(-0.5 * D2), atol=1e-12)


@pytest.mark.parametrize("name,fn", [
    ("matern12", lambda r: np.exp(-r)),
    ("matern32", lambda r: (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)),
    ("matern52", lambda r: (1 + np.sqrt(5) * r + 5 / 3 * r**2)
        * np.exp(-np.sqrt(5) * r)),
])
def test_matern_matches_naive(data, name, fn):
    X, Z, ls = data
    K = np.asarray(kernels.gram(name, X, Z, ls, 2.0))
    R = cdist(np.asarray(X) / np.asarray(ls), np.asarray(Z) / np.asarray(ls))
    np.testing.assert_allclose(K, 2.0 * fn(R), atol=1e-9)


def test_gram_batched_broadcasting(rng):
    X = jnp.asarray(rng.uniform(size=(4, 6, 2)))
    ls = jnp.asarray(rng.uniform(0.3, 1.0, size=(4, 2)))
    os_ = jnp.asarray(rng.uniform(0.5, 2.0, size=(4,)))
    K = kernels.rbf(X, X, ls, os_[:, None, None])
    assert K.shape == (4, 6, 6)
    for b in range(4):
        Kb = kernels.rbf(X[b], X[b], ls[b], os_[b])
        np.testing.assert_allclose(np.asarray(K[b]), np.asarray(Kb), atol=1e-12)


def test_mll_matches_scipy(rng):
    X = jnp.asarray(rng.uniform(size=(8, 2)))
    y = jnp.asarray(rng.normal(size=(8,)))
    ls = jnp.asarray([0.5, 0.8])
    K = kernels.rbf(X, X, ls, 1.3)
    noise = 0.05
    ref = multivariate_normal(
        mean=np.zeros(8), cov=np.asarray(K) + noise * np.eye(8)
    ).logpdf(np.asarray(y))
    ours = float(linalg.mll(K, noise, y))
    assert abs(ours - ref) < 1e-6


def test_masked_mll_equals_dense_subproblem(rng):
    n_real, n_pad = 7, 5
    X = jnp.asarray(rng.uniform(size=(n_real, 2)))
    y = jnp.asarray(rng.normal(size=(n_real,)))
    ls = jnp.asarray([0.4, 0.9])
    dense = float(linalg.mll(kernels.rbf(X, X, ls, 1.1), 0.02, y))

    Xp = jnp.concatenate([X, jnp.asarray(rng.uniform(size=(n_pad, 2)))])
    yp = jnp.concatenate([y, jnp.asarray(rng.normal(size=(n_pad,)))])
    mask = jnp.concatenate([jnp.ones(n_real), jnp.zeros(n_pad)])
    masked = float(linalg.mll(kernels.rbf(Xp, Xp, ls, 1.1), 0.02, yp, mask=mask))
    assert abs(masked - dense) < 1e-8


def test_masked_mll_invariant_to_pad_content(rng):
    X = jnp.asarray(rng.uniform(size=(10, 2)))
    y = jnp.asarray(rng.normal(size=(10,)))
    mask = jnp.concatenate([jnp.ones(6), jnp.zeros(4)])
    ls = jnp.asarray([0.7, 0.7])
    a = float(linalg.mll(kernels.rbf(X, X, ls, 1.0), 0.01, y, mask=mask))
    X2 = X.at[6:].set(99.0)
    y2 = y.at[6:].set(-3.0)
    b = float(linalg.mll(kernels.rbf(X2, X2, ls, 1.0), 0.01, y2, mask=mask))
    assert abs(a - b) < 1e-9


def test_posterior_matches_direct_solve(rng):
    X = jnp.asarray(rng.uniform(size=(12, 2)))
    y = jnp.asarray(rng.normal(size=(12,)))
    Xq = jnp.asarray(rng.uniform(size=(4, 2)))
    ls = jnp.asarray([0.6, 0.5])
    noise = 0.03
    K = kernels.rbf(X, X, ls, 1.0)
    state = linalg.cholesky_factor(K, noise, y)
    Kxq = kernels.rbf(X, Xq, ls, 1.0)
    Kqq = kernels.rbf(Xq, Xq, ls, 1.0)
    mean, cov = linalg.posterior(state, Kxq, Kqq=Kqq)

    A = np.asarray(K) + noise * np.eye(12)
    Ainv = np.linalg.inv(A)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(Kxq).T @ Ainv @ np.asarray(y), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cov),
        np.asarray(Kqq) - np.asarray(Kxq).T @ Ainv @ np.asarray(Kxq),
        atol=1e-6)


def test_posterior_diag_matches_full(rng):
    X = jnp.asarray(rng.uniform(size=(12, 2)))
    y = jnp.asarray(rng.normal(size=(12,)))
    Xq = jnp.asarray(rng.uniform(size=(6, 2)))
    ls = jnp.asarray([0.6, 0.5])
    K = kernels.rbf(X, X, ls, 2.0)
    state = linalg.cholesky_factor(K, 0.01, y)
    Kxq = kernels.rbf(X, Xq, ls, 2.0)
    _, cov = linalg.posterior(state, Kxq, Kqq=kernels.rbf(Xq, Xq, ls, 2.0))
    _, var = linalg.posterior(state, Kxq, Kqq_diag=jnp.full((6,), 2.0))
    np.testing.assert_allclose(np.asarray(var), np.diag(np.asarray(cov)),
                               atol=1e-8)
