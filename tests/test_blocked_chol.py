"""Blocked-Cholesky inverse kernel + analytic-VJP MLL (interpret mode).

The mid-N factorization path (VERDICT r2 missing item 3 / BASELINE config
5): correctness of the MXU-tiled blocked Cholesky against numpy, padding
semantics, the MLL-level custom VJP against AD-through-Cholesky, routing,
and the float64-island accuracy method.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scamlgp_tpu.models import gp
from scamlgp_tpu.ops import inverse_mll
from scamlgp_tpu.ops import pallas_blocked_chol as pbc


def _spd_batch(rng, b, n, jitter=0.5):
    X = rng.normal(size=(b, n, n)).astype(np.float32)
    return np.einsum("bij,bkj->bik", X, X) / n + jitter * np.eye(
        n, dtype=np.float32)


@pytest.mark.parametrize("n", [pbc.BS, 2 * pbc.BS])
def test_blocked_inverse_matches_numpy(rng, n):
    A = _spd_batch(rng, 3, n)
    inv, logdet = pbc.blocked_chol_inverse(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(inv),
                               np.linalg.inv(A.astype(np.float64)),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logdet),
        np.linalg.slogdet(A.astype(np.float64))[1], rtol=2e-5)


def test_blocked_inverse_pads_non_multiple_n(rng):
    """N not a multiple of BS: identity padding must not change the
    result."""
    n = pbc.BS + 24
    A = _spd_batch(rng, 2, n)
    inv, logdet = pbc.blocked_chol_inverse(jnp.asarray(A))
    assert inv.shape == (2, n, n)
    np.testing.assert_allclose(np.asarray(inv),
                               np.linalg.inv(A.astype(np.float64)),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logdet),
        np.linalg.slogdet(A.astype(np.float64))[1], rtol=2e-5)


def test_blocked_inverse_pads_batch(rng):
    """Batch not a multiple of the per-cell G: identity matrices pad it."""
    A = _spd_batch(rng, 1, pbc.BS)
    inv, logdet = pbc.blocked_chol_inverse(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(inv),
                               np.linalg.inv(A.astype(np.float64)),
                               rtol=2e-3, atol=2e-4)
    assert logdet.shape == (1,)


def test_mll_via_inverse_matches_chol_value_and_grad(rng):
    """The analytic matrix-level VJP == AD through the Cholesky MLL (f64 so
    both paths are exact; the XLA inverse impl is used at this small N)."""
    b, n = 4, 24
    A = jnp.asarray(_spd_batch(rng, b, n).astype(np.float64))
    y = jnp.asarray(rng.normal(size=(b, n)))
    n_active = jnp.full((b,), float(n))

    def via_inverse(A, y):
        return jnp.sum(inverse_mll.mll_via_inverse(A, y, n_active))

    def via_chol(A, y):
        L = jax.lax.linalg.cholesky(A)
        al = jax.lax.linalg.triangular_solve(L, y[..., None],
                                             left_side=True, lower=True)
        al = jax.lax.linalg.triangular_solve(
            L, al, left_side=True, lower=True, transpose_a=True)[..., 0]
        quad = jnp.sum(y * al, axis=-1)
        logdet = 2 * jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        return jnp.sum(-0.5 * (quad + logdet + n * np.log(2 * np.pi)))

    v1, (dA1, dy1) = jax.value_and_grad(via_inverse, argnums=(0, 1))(A, y)
    v2, (dA2, dy2) = jax.value_and_grad(via_chol, argnums=(0, 1))(A, y)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dA1), np.asarray(dA2),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2),
                               rtol=1e-8, atol=1e-10)


def test_gp_mll_sweep_method_routes_blocked(monkeypatch):
    """gp.mll(method='sweep') with blocked routing forced at N=256 must
    equal the chol path (interpret mode, f32 data).  Routing no longer
    selects the blocked kernel by default (r4 crossovers — XLA wins with
    the analytic VJP), so the route is forced here to keep the blocked
    value/grad path pinned.  Seed pinned: the f32 grad comparison
    tolerance assumes a typically-conditioned instance."""
    rng = np.random.default_rng(7)
    n, d = 256, 3
    monkeypatch.setattr(pbc, "_ROUTE_BLOCKED", True)
    assert pbc.blocked_profitable(n)
    cfg = gp.source_gp_config()
    X = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    p = gp.init_params(cfg, d, jnp.float32)

    v_sweep = gp.mll(cfg, p, X, y, method="sweep")
    v_chol = gp.mll(cfg, p, X, y, method="chol")
    np.testing.assert_allclose(float(v_sweep), float(v_chol),
                               rtol=5e-4, atol=5e-3)

    # f32 grads: explicit-inverse vs AD-through-solves are different f32
    # algorithms (~1% apart at cond ~1e4); exact algebraic agreement is
    # pinned in f64 by test_mll_via_inverse_matches_chol_value_and_grad
    g_sweep = jax.grad(
        lambda p: gp.map_objective(cfg, p, X, y, method="sweep"))(p)
    g_chol = jax.grad(
        lambda p: gp.map_objective(cfg, p, X, y, method="chol"))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_sweep),
                    jax.tree_util.tree_leaves(g_chol)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=5e-3)


def test_gp_mll_chol64_island_beats_f32_accuracy(rng):
    """The f64-island factorization recovers the f64 MLL for an
    ill-conditioned f32 system where plain f32 deviates (the engine-level
    fix for the large-N conditioning regime — no noise pinning)."""
    n, d = 96, 3
    cfg = gp.source_gp_config()
    X32 = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))
    y32 = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    # long lengthscale + tiny noise -> numerically near-singular system
    p32 = gp.GPParams(
        raw_lengthscale=cfg.lengthscale_constraint.inverse(
            jnp.full((d,), 3.0, jnp.float32)),
        raw_outputscale=cfg.outputscale_constraint.inverse(
            jnp.asarray(1.0, jnp.float32)),
        raw_noise=cfg.noise_constraint.inverse(
            jnp.asarray(2e-8, jnp.float32)),
    )
    v_island = gp.mll(cfg, p32, X32, y32, method="chol64")
    assert v_island.dtype == jnp.float32

    # f64 ground truth through the plain path
    X64, y64 = X32.astype(jnp.float64), y32.astype(jnp.float64)
    p64 = jax.tree_util.tree_map(lambda l: l.astype(jnp.float64), p32)
    v_ref = gp.mll(cfg, p64, X64, y64, method="chol")
    rel_island = abs(float(v_island) - float(v_ref)) / abs(float(v_ref))
    # the island must be substantially more faithful than the f32 jitter
    # policy alone (which adds 1e-6-relative jitter vs f64's 1e-10)
    v_f32 = gp.mll(cfg, p32, X32, y32, method="chol")
    rel_f32 = abs(float(v_f32) - float(v_ref)) / abs(float(v_ref))
    assert rel_island < 1e-5
    assert rel_island <= rel_f32


def test_inverse_mll_profitability_routing():
    # sweep range: Pallas inverse + analytic VJP wins
    assert inverse_mll.inverse_mll_profitable(64)
    assert inverse_mll.inverse_mll_profitable(128)
    # above it, direct XLA Cholesky MLL is the measured winner (r4
    # crossover tables) -> not profitable, callers use linalg.mll
    assert not inverse_mll.inverse_mll_profitable(256)
    assert not inverse_mll.inverse_mll_profitable(512)
    assert not inverse_mll.inverse_mll_profitable(4096)
    # the blocked kernel itself can still RUN through N ~ 1024 (explicit
    # capability incl. the HBM-staged variant with its pipeline-free
    # budget — ADVICE r3)
    assert pbc.blocked_runnable(256)
    assert pbc.blocked_runnable(1024)
    assert not pbc.blocked_runnable(2048)


def test_hbm_staged_variant_matches_numpy(rng, monkeypatch):
    """The HBM-resident (manual-DMA, single-scratch) variant — used when
    the double-buffered VMEM pipeline would not fit (N ~ 1024) — must give
    the same results.  Forced here at small N by shrinking the budget so
    g < 1 but the single scratch still fits."""
    n = 2 * pbc.BS
    need_hbm = (n * n + (3 * 2 * 3 // 2 + 4) * pbc.BS * pbc.BS) * 4
    monkeypatch.setattr(pbc, "_VMEM_BUDGET", need_hbm + 1024)
    assert pbc._choose_g(3, n, 4) < 1
    assert pbc._hbm_staged_fits(n, 4)
    A = _spd_batch(rng, 3, n)
    inv, logdet = pbc.blocked_chol_inverse(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(inv),
                               np.linalg.inv(A.astype(np.float64)),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(logdet),
        np.linalg.slogdet(A.astype(np.float64))[1], rtol=2e-5)
