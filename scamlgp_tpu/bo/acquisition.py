"""Acquisition functions, evaluated from (mean, variance) posteriors.

The reference defaults to UCB with ``beta=9.0`` hardwired to minimization
(``/root/reference/scamlgp/utils.py:215-224``); botorch supplies the generic
UCB/EI/PI machinery.  Here acquisitions are pure functions of posterior
moments so they fuse into the jitted acquisition-optimization loop.

Convention: all acquisitions are *maximized* by the optimizer in
``bo/optimize.py``; ``maximize=False`` means the underlying objective is a
loss to minimize (the reference's setting).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
from jax.scipy.stats import norm


@dataclasses.dataclass(frozen=True)
class AcquisitionFunction:
    maximize: bool = False

    def __call__(self, mean, var, best_f=None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class UpperConfidenceBound(AcquisitionFunction):
    """UCB with the reference's default beta = 9.0 and maximize=False
    (``utils.py:215-224``).  For minimization: maximize ``-mean + sqrt(beta)
    * sigma`` (botorch UCB semantics with maximize=False)."""

    beta: float = 9.0

    def __call__(self, mean, var, best_f=None):
        delta = math.sqrt(self.beta) * jnp.sqrt(jnp.maximum(var, 1e-30))
        return mean + delta if self.maximize else -mean + delta


@dataclasses.dataclass(frozen=True)
class ExpectedImprovement(AcquisitionFunction):
    """EI over the incumbent ``best_f`` (needs data; reference notes EI/PI
    require ``num_initial_random_samples > 0`` — ``optimizer.py:101-105``)."""

    def __call__(self, mean, var, best_f=None):
        sigma = jnp.sqrt(jnp.maximum(var, 1e-30))
        if self.maximize:
            u = (mean - best_f) / sigma
        else:
            u = (best_f - mean) / sigma
        return sigma * (u * norm.cdf(u) + norm.pdf(u))


@dataclasses.dataclass(frozen=True)
class ProbabilityOfImprovement(AcquisitionFunction):
    def __call__(self, mean, var, best_f=None):
        sigma = jnp.sqrt(jnp.maximum(var, 1e-30))
        u = ((mean - best_f) if self.maximize else (best_f - mean)) / sigma
        return norm.cdf(u)


@dataclasses.dataclass(frozen=True)
class LogExpectedImprovement(AcquisitionFunction):
    """Numerically robust log-EI (LogEI; Ament et al. 2023) — avoids the
    vanishing-gradient pathology of plain EI far from the incumbent."""

    def __call__(self, mean, var, best_f=None):
        sigma = jnp.sqrt(jnp.maximum(var, 1e-30))
        u = ((mean - best_f) if self.maximize else (best_f - mean)) / sigma
        # log( u*Phi(u) + phi(u) ) computed stably
        log_phi = norm.logpdf(u)
        log_ei_h = jnp.where(
            u > -1.0,
            jnp.log(jnp.maximum(u * norm.cdf(u) + jnp.exp(log_phi), 1e-300)),
            log_phi - jnp.log1p(jnp.minimum(u**2, 1e30)) * 0.0
            - jnp.log(jnp.maximum(-u, 1.0))
            + jnp.log1p(-1.0 / jnp.maximum(u**2, 2.0)),
        )
        return log_ei_h + jnp.log(sigma)
