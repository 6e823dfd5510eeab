"""Mean-field ADVI over GP hyperparameters — the variational counterpart of
``models/hmc.py`` (BASELINE.json north star: "Hyperparameter posteriors come
from NUTS/HMC and VI, with chains and meta-tasks vmapped per chip").

The variational family is a diagonal Gaussian in the UNCONSTRAINED (raw)
parameter space — the same space, and the same target density
``exp(-map_objective)`` (MLL + priors on constrained values), that HMC
samples and that the reference's L-BFGS restarts explore
(``/root/reference/scamlgp/utils.py:139-212``).  Fitting maximizes the
reparametrized ELBO

    ELBO(mu, sigma) = E_{eps~N(0,I)}[ log p(mu + sigma*eps) ] + sum log sigma
                      (+ constant entropy term),

with Adam on (mu, log_sigma) and a fixed number of Monte-Carlo draws per
step — a single ``lax.scan`` program with no data-dependent control flow, so
whole-study batches of ADVI fits vmap/shard exactly like the MAP and HMC
paths.  Posterior "samples" for the acquisition mixture are then i.i.d.
draws from q, which makes VI the cheapest posterior-marginalizing fit mode
(no warmup, no rejected trajectories).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from scamlgp_tpu.models.hmc import _flatten


class MeanFieldQ(NamedTuple):
    """Diagonal-Gaussian variational posterior over flat raw parameters."""

    mu: jnp.ndarray         # (D,)
    log_sigma: jnp.ndarray  # (D,)


def advi(log_prob_fn: Callable, init_params, key, num_steps: int = 300,
         num_mc: int = 8, lr: float = 0.05, init_log_sigma: float = -2.0,
         max_log_sigma: float = 1.0
         ) -> Tuple[MeanFieldQ, Callable, dict]:
    """Fit a mean-field Gaussian to ``exp(log_prob_fn)`` in raw space.

    Args:
        log_prob_fn: pytree -> scalar unnormalized log density (use the
            negative MAP objective, as with ``hmc``/``nuts``).
        init_params: pytree initialization for the variational mean
            (warm-starting at a MAP point speeds convergence markedly).
        key: PRNG key for the reparametrization draws.
        num_steps: Adam steps.
        num_mc: Monte-Carlo draws per ELBO gradient.
        lr: Adam learning rate.
        init_log_sigma: initial log standard deviation (shared).
        max_log_sigma: per-dimension cap on log sigma.  The raw-space
            target follows the gpytorch MAP convention (priors on
            CONSTRAINED values, no bijector log-Jacobian), so it is
            asymptotically FLAT along saturated sigmoid directions — there
            the entropy term would push sigma to infinity.  Capping bounds
            q's spread in those non-identified tails; the cap (sigma <= e
            raw units) comfortably covers the posterior widths HMC measures
            on the same targets (~2.5).

    Returns:
        (q, unflatten, info) — ``q`` is the fitted ``MeanFieldQ``;
        ``unflatten`` maps a flat (D,) vector back to the parameter pytree;
        ``info`` carries the ELBO trace.
    """
    import optax

    mu0, unflatten = _flatten(init_params)
    dtype = mu0.dtype
    q0 = MeanFieldQ(mu=mu0,
                    log_sigma=jnp.full_like(mu0, init_log_sigma))

    logp_and_grad = jax.value_and_grad(
        lambda theta: log_prob_fn(unflatten(theta)))

    def neg_elbo_value_and_grad(q, k):
        """Manual reparametrization estimator with per-sample masking.

        dELBO/dmu      = E[ d logp/dtheta ]
        dELBO/dlogsig  = E[ d logp/dtheta * eps * sigma ] + 1

        The target density is non-finite in parts of raw space (constraint
        boundaries, failed factorizations); with autodiff through an MC
        *mean*, one bad draw poisons the whole step.  Computing per-sample
        value+grad explicitly lets those draws be masked out exactly —
        the estimator then averages over the finite draws only.
        """
        eps = jax.random.normal(k, (num_mc,) + q.mu.shape, dtype)
        sigma = jnp.exp(q.log_sigma)
        theta = q.mu + sigma * eps[:, :]
        vals, grads = jax.vmap(logp_and_grad)(theta)
        ok = jnp.isfinite(vals) & jnp.all(jnp.isfinite(grads), axis=-1)
        wt = ok.astype(dtype) / jnp.maximum(jnp.sum(ok), 1)
        grads = jnp.where(ok[:, None], grads, 0.0)
        g_mu = -jnp.einsum("s,sd->d", wt, grads)
        g_ls = -(jnp.einsum("s,sd,sd->d", wt, grads, eps) * sigma + 1.0)
        value = -(jnp.sum(wt * jnp.where(ok, vals, 0.0))
                  + jnp.sum(q.log_sigma))
        # all draws bad: wt is all-zero, so the masked value stays finite
        # (entropy term only) and the gradient is entropy-only (g_ls = -1),
        # which would just inflate sigma.  Poison the value instead so the
        # step's skip-guard reverts the update like any non-finite step.
        value = jnp.where(jnp.sum(ok) > 0, value, jnp.inf)
        return value, MeanFieldQ(mu=g_mu, log_sigma=g_ls)

    opt = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(lr))

    def step(carry, k):
        q, s = carry
        v, g = neg_elbo_value_and_grad(q, k)
        updates, s2 = opt.update(g, s, q)
        q2 = optax.apply_updates(q, updates)
        # a step with no finite draw (or a non-finite update) is skipped
        ok = jnp.isfinite(v) & jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(
                (q2, g))]))
        q = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), q2, q)
        s = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), s2, s)
        q = q._replace(log_sigma=jnp.clip(q.log_sigma, -8.0, max_log_sigma))
        return (q, s), v

    keys = jax.random.split(key, num_steps)
    (q, _), trace = jax.lax.scan(step, (q0, opt.init(q0)), keys)
    return q, unflatten, {"neg_elbo_trace": trace}


def sample_q(q: MeanFieldQ, unflatten: Callable, key, num_samples: int):
    """i.i.d. draws from the fitted posterior, as a pytree with a leading
    ``num_samples`` axis (the VI analogue of an HMC sample stack)."""
    eps = jax.random.normal(key, (num_samples,) + q.mu.shape, q.mu.dtype)
    draws = q.mu + jnp.exp(q.log_sigma) * eps
    return jax.vmap(unflatten)(draws)


def fit_scamlgp_vi(model, target_cfg, key, num_steps: int = 300,
                   num_mc: int = 8, lr: float = 0.05,
                   num_draws: int = 16, init_params=None):
    """Variational posterior over the ScaML-GP target parameters (weights +
    residual kernel + noise), conditioned on the frozen source stack — the
    VI sibling of ``hmc.sample_scamlgp_hyperparameters``.

    Returns (samples pytree with leading ``num_draws`` axis, info with the
    fitted ``MeanFieldQ`` and ELBO trace).
    """
    from scamlgp_tpu.models import scamlgp as m

    def log_prob(p):
        return -m.scamlgp_map_objective(model, target_cfg, p)

    M = model.num_tasks
    d = model.train_X.shape[-1]
    dtype = model.train_X.dtype
    k_fit, k_draw = jax.random.split(key)
    init = (init_params if init_params is not None
            else m.init_target_params(target_cfg, M, d, dtype))
    q, unflatten, info = advi(log_prob, init, k_fit, num_steps=num_steps,
                              num_mc=num_mc, lr=lr)
    samples = sample_q(q, unflatten, k_draw, num_draws)
    info = {**info, "q": q}
    return samples, info
