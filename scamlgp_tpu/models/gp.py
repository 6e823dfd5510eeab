"""Functional single-task exact GP (zero mean, scaled ARD kernel, Gaussian noise).

This is the TPU-native replacement for the reference's
``SingleTaskGP(ZeroMean, ScaleKernel(RBFKernel), GaussianLikelihood,
Standardize)`` source-task models (``/root/reference/scamlgp/model.py:176-188``).

Design: a GP is *data + raw parameters + a static config*.  All computations
are pure functions of ``(config, raw_params, X, y, mask)`` so that fitting
restarts, meta-tasks and HMC chains become ``vmap`` axes and task sharding is a
``shard_map`` over a mesh axis — there is no module object to replicate.

Hyperparameter priors/constraints replicate the reference exactly:

- source kernel  (``model.py:36-70``):  lengthscale ~ Gamma(3, 6),
  constraint Interval(1e-4, 1e2, init 0.5); outputscale ~ Gamma(2, 0.15),
  Interval(1e-4, 1e2, init 1.0).
- target kernel  (``model.py:73-105``): lengthscale ~ LogNormal(0.5, 1.5)
  (init 1.0); outputscale ~ LogNormal(-2, 3) (init 0.1); same Interval bounds.
- noise          (``model.py:25-33``):  LogNormal(-8, 2),
  Interval(1e-8, 1e-2, init 1e-3).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from scamlgp_tpu.ops import kernels as K_ops
from scamlgp_tpu.ops import linalg
from scamlgp_tpu.utils.constraints import Interval
from scamlgp_tpu.utils.priors import Gamma, LogNormal, Prior


@dataclasses.dataclass(frozen=True)
class GPConfig:
    """Static GP hyperparameter specification (hashable -> jit-static)."""

    kernel: str = "rbf"
    lengthscale_constraint: Interval = Interval(1e-4, 1e2, 0.5)
    lengthscale_prior: Prior = Gamma(3.0, 6.0)
    outputscale_constraint: Interval = Interval(1e-4, 1e2, 1.0)
    outputscale_prior: Prior = Gamma(2.0, 0.15)
    noise_constraint: Interval = Interval(1e-8, 1e-2, 1e-3)
    noise_prior: Prior = LogNormal(-8.0, 2.0)


def source_gp_config(kernel: str = "rbf") -> GPConfig:
    """Priors/constraints of the reference's source GPs (model.py:36-70)."""
    return GPConfig(kernel=kernel)


def target_gp_config(kernel: str = "rbf") -> GPConfig:
    """Looser residual-signal priors of the target GP (model.py:73-105)."""
    return GPConfig(
        kernel=kernel,
        lengthscale_constraint=Interval(1e-4, 1e2, 1.0),
        lengthscale_prior=LogNormal(0.5, 1.5),
        outputscale_constraint=Interval(1e-4, 1e2, 0.1),
        outputscale_prior=LogNormal(-2.0, 3.0),
    )


class GPParams(NamedTuple):
    """Raw (unconstrained) hyperparameters; leaves may carry batch dims."""

    raw_lengthscale: jnp.ndarray  # (..., d)
    raw_outputscale: jnp.ndarray  # (...,)
    raw_noise: jnp.ndarray        # (...,)


def init_params(cfg: GPConfig, ard_dims: int, dtype=jnp.float32) -> GPParams:
    """Initial values from the constraints' ``initial_value`` (gpytorch
    semantics — model.py:52-56,64-68,31)."""
    ls0 = jnp.full((ard_dims,), cfg.lengthscale_constraint.initial_value, dtype)
    os0 = jnp.asarray(cfg.outputscale_constraint.initial_value, dtype)
    nz0 = jnp.asarray(cfg.noise_constraint.initial_value, dtype)
    return GPParams(
        raw_lengthscale=cfg.lengthscale_constraint.inverse(ls0),
        raw_outputscale=cfg.outputscale_constraint.inverse(os0),
        raw_noise=cfg.noise_constraint.inverse(nz0),
    )


def sample_params(cfg: GPConfig, key, ard_dims: int, dtype=jnp.float32) -> GPParams:
    """Prior-sample a restart initialization (utils.py:31-69 semantics).

    Samples are clipped into the constraint's open interval so the inverse
    transform is finite — the reference retries on out-of-support samples;
    clipping is the branch-free equivalent.
    """
    k_ls, k_os, k_nz = jax.random.split(key, 3)
    ls = cfg.lengthscale_prior.sample(k_ls, (ard_dims,)).astype(dtype)
    os_ = cfg.outputscale_prior.sample(k_os, ()).astype(dtype)
    nz = cfg.noise_prior.sample(k_nz, ()).astype(dtype)

    def clip(c: Interval, v):
        lo, hi = c.lower, c.upper
        span = hi - lo
        return jnp.clip(v, lo + 1e-10 * span, hi - 1e-6 * span)

    return GPParams(
        raw_lengthscale=cfg.lengthscale_constraint.inverse(
            clip(cfg.lengthscale_constraint, ls)),
        raw_outputscale=cfg.outputscale_constraint.inverse(
            clip(cfg.outputscale_constraint, os_)),
        raw_noise=cfg.noise_constraint.inverse(clip(cfg.noise_constraint, nz)),
    )


class Constrained(NamedTuple):
    lengthscale: jnp.ndarray
    outputscale: jnp.ndarray
    noise: jnp.ndarray


def constrain(cfg: GPConfig, p: GPParams) -> Constrained:
    return Constrained(
        lengthscale=cfg.lengthscale_constraint.forward(p.raw_lengthscale),
        outputscale=cfg.outputscale_constraint.forward(p.raw_outputscale),
        noise=cfg.noise_constraint.forward(p.raw_noise),
    )


def log_prior(cfg: GPConfig, c: Constrained) -> jnp.ndarray:
    """Sum of prior log-densities on constrained values (gpytorch MAP terms)."""
    return (jnp.sum(cfg.lengthscale_prior.log_prob(c.lengthscale), axis=-1)
            + cfg.outputscale_prior.log_prob(c.outputscale)
            + cfg.noise_prior.log_prob(c.noise))


def gram(cfg: GPConfig, c: Constrained, x, z=None):
    z = x if z is None else z
    return K_ops.gram(cfg.kernel, x, z, c.lengthscale, c.outputscale)


def mll(cfg: GPConfig, p: GPParams, X, y, mask=None,
        prior_mean=None, prior_cov=None, method: str = "chol") -> jnp.ndarray:
    """Marginal log-likelihood log N(y | prior_mean, K + prior_cov + noise*I).

    ``prior_mean`` / ``prior_cov`` support the ScaML-GP target model whose prior
    is the weighted source posterior (``model.py:359-363``).

    Methods:

    - ``"chol"``: direct XLA Cholesky MLL with AD (the parity path).
    - ``"sweep"``: Pallas fast path with an analytic matrix-level VJP (no
      solves in the backward pass); the forward inverse auto-routes between
      the elementary sweep (N <= 128), the MXU-tiled blocked Cholesky
      (mid N), and XLA — see ``ops/inverse_mll.py``.  Falls back to
      ``"chol"`` when no kernel is profitable at this N.
    - ``"chol64"``: float64-island — inputs are promoted to f64, the Gram
      is assembled AND factorized in f64, and the result cast back to the
      input dtype.  Accuracy path for ill-conditioned large-N f32 systems
      (SURVEY section 7.3): an f32-assembled Gram carries ~eps_f32-scale
      asymmetry that can defeat even an exact factorization, so the island
      boundary sits at the inputs, not at the factorization.  Requires
      ``jax_enable_x64``.
    """
    if method == "chol64":
        if not jax.config.jax_enable_x64:
            raise ValueError("method='chol64' needs jax_enable_x64 "
                             "(x64-island mode)")
        f64 = lambda t: None if t is None else t.astype(jnp.float64)
        c64 = constrain(cfg, jax.tree_util.tree_map(f64, p))
        K64 = gram(cfg, c64, f64(X))
        if prior_cov is not None:
            K64 = K64 + f64(prior_cov)
        out = linalg.mll(K64, c64.noise, f64(y), mask=f64(mask),
                         mean=f64(prior_mean))
        return out.astype(X.dtype)
    c = constrain(cfg, p)
    K = gram(cfg, c, X)
    if prior_cov is not None:
        K = K + prior_cov
    if method == "sweep":
        from scamlgp_tpu.ops import inverse_mll

        if inverse_mll.inverse_mll_profitable(K.shape[-1],
                                              jnp.dtype(K.dtype).itemsize):
            yy = y if prior_mean is None else y - prior_mean
            if mask is not None:
                yy = yy * mask
                n_active = jnp.sum(mask, axis=-1)
            else:
                n_active = jnp.asarray(K.shape[-1], K.dtype)
            A = linalg.mask_system(K, c.noise, mask)
            return inverse_mll.mll_via_inverse(A[None], yy[None],
                                               n_active)[0]
    return linalg.mll(K, c.noise, y, mask=mask, mean=prior_mean)


def map_objective(cfg: GPConfig, p: GPParams, X, y, mask=None,
                  prior_mean=None, prior_cov=None,
                  extra_log_prior=0.0, method: str = "chol") -> jnp.ndarray:
    """Negative (MLL + log prior) — the quantity minimized during fitting.

    Matches botorch ``fit_gpytorch_mll``'s objective: exact MLL plus prior
    log-probs (``/root/reference/scamlgp/utils.py:139-212``).
    """
    c = constrain(cfg, p)
    return -(mll(cfg, p, X, y, mask, prior_mean, prior_cov, method=method)
             + log_prior(cfg, c) + extra_log_prior)


class PosteriorState(NamedTuple):
    """Cached training factorization for fast repeated predictions."""

    chol_state: linalg.CholState
    constrained: Constrained
    X: jnp.ndarray


def condition(cfg: GPConfig, p: GPParams, X, y, mask=None,
              prior_cov=None, prior_mean=None) -> PosteriorState:
    c = constrain(cfg, p)
    K = gram(cfg, c, X)
    if prior_cov is not None:
        K = K + prior_cov
    resid = y if prior_mean is None else y - prior_mean
    state = linalg.cholesky_factor(K, c.noise, resid, mask)
    return PosteriorState(chol_state=state, constrained=c, X=X)


def predict(cfg: GPConfig, ps: PosteriorState, Xq,
            cross_extra=None, query_cov_extra=None, query_mean=None,
            full_cov: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean/cov at ``Xq`` (noise-free latent f, botorch ``posterior``
    default semantics — model.py:128)."""
    c = ps.constrained
    Kxq = gram(cfg, c, ps.X, Xq)
    if cross_extra is not None:
        Kxq = Kxq + cross_extra
    if full_cov:
        Kqq = gram(cfg, c, Xq)
        if query_cov_extra is not None:
            Kqq = Kqq + query_cov_extra
        mean, cov = linalg.posterior(ps.chol_state, Kxq, Kqq=Kqq)
    else:
        q_diag = jnp.broadcast_to(c.outputscale[..., None],
                                  Xq.shape[:-1]).astype(Xq.dtype)
        if query_cov_extra is not None:
            q_diag = q_diag + query_cov_extra
        mean, cov = linalg.posterior(ps.chol_state, Kxq, Kqq_diag=q_diag)
    if query_mean is not None:
        mean = mean + query_mean
    return mean, cov
