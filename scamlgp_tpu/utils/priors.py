"""Hyperparameter priors: log-density + sampling, JAX-native.

The reference attaches gpytorch prior objects to every hyperparameter
(``/root/reference/scamlgp/model.py:28,41-42,82-86,326-331``):

- noise:              LogNormal(-8, 2)
- source lengthscale: Gamma(3, 6)          (BoTorch SingleTaskGP default)
- source outputscale: Gamma(2, 0.15)
- target lengthscale: LogNormal(0.5, 1.5)
- target outputscale: LogNormal(-2, 3)
- task weights:       Gamma(1, 1)

These priors serve two roles, both replicated here:
1. additive MAP terms in the fit objective (gpytorch adds ``log_prob`` of each
   named prior to the MLL),
2. restart initialization by prior sampling
   (``/root/reference/scamlgp/utils.py:31-69``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


@dataclasses.dataclass(frozen=True)
class Prior:
    def log_prob(self, value):
        raise NotImplementedError

    def sample(self, key, shape=()):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Gamma(Prior):
    """Gamma(concentration alpha, rate beta) — torch parametrization."""

    concentration: float
    rate: float

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        safe = jnp.maximum(value, 1e-300)
        return a * jnp.log(b) - gammaln(a) + (a - 1.0) * jnp.log(safe) - b * value

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.concentration, shape) / self.rate


@dataclasses.dataclass(frozen=True)
class LogNormal(Prior):
    loc: float
    scale: float

    def log_prob(self, value):
        safe = jnp.maximum(value, 1e-300)
        log_v = jnp.log(safe)
        z = (log_v - self.loc) / self.scale
        return -0.5 * z * z - log_v - jnp.log(self.scale) - 0.5 * jnp.log(2.0 * jnp.pi)

    def sample(self, key, shape=()):
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape))


@dataclasses.dataclass(frozen=True)
class Normal(Prior):
    loc: float
    scale: float

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * jnp.log(2.0 * jnp.pi)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.normal(key, shape)


@dataclasses.dataclass(frozen=True)
class Uniform(Prior):
    low: float
    high: float

    def log_prob(self, value):
        inside = (value >= self.low) & (value <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.low, maxval=self.high)
