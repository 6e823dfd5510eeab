"""Bijective parameter constraints (raw <-> constrained reparametrizations).

The reference keeps hyperparameters positive / bounded through gpytorch
constraint objects (``Interval`` / ``GreaterThan`` with initial values, e.g.
``/root/reference/scamlgp/model.py:31,52-56,64-68,334``).  In this engine every
hyperparameter lives as an *unconstrained raw* leaf in a parameter pytree; a
static ``Constraint`` maps raw -> constrained inside the (jitted, vmapped)
objective.  This removes bound constraints from the optimizer entirely, which is
what makes multi-restart fitting a pure ``vmap`` on TPU.

MAP semantics match gpytorch: priors are evaluated on the *constrained* value,
with no Jacobian correction term.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from jax import nn


def _softplus(x):
    return nn.softplus(x)


def _inv_softplus(y):
    # stable inverse of softplus: log(exp(y) - 1) = y + log1p(-exp(-y))
    return y + jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class Constraint:
    """Base: identity transform (gpytorch constraint with ``transform=None``)."""

    def forward(self, raw):
        return raw

    def inverse(self, value):
        return value


@dataclasses.dataclass(frozen=True)
class Interval(Constraint):
    """``lower + (upper - lower) * sigmoid(raw)``; mirrors gpytorch ``Interval``.

    Used by the reference for noise in [1e-8, 1e-2], lengthscale / outputscale
    in [1e-4, 1e2] (``/root/reference/scamlgp/model.py:31,52-56,64-68``).
    """

    lower: float
    upper: float
    initial_value: Optional[float] = None

    def forward(self, raw):
        return self.lower + (self.upper - self.lower) * nn.sigmoid(raw)

    def inverse(self, value):
        frac = (value - self.lower) / (self.upper - self.lower)
        frac = jnp.clip(frac, 1e-12, 1.0 - 1e-12)
        return jnp.log(frac) - jnp.log1p(-frac)


@dataclasses.dataclass(frozen=True)
class GreaterThan(Constraint):
    """``softplus(raw) + lower``; mirrors gpytorch ``GreaterThan``."""

    lower: float
    initial_value: Optional[float] = None

    def forward(self, raw):
        return _softplus(raw) + self.lower

    def inverse(self, value):
        return _inv_softplus(jnp.maximum(value - self.lower, 1e-30))


@dataclasses.dataclass(frozen=True)
class Positive(GreaterThan):
    lower: float = 0.0


def constrain_interval(raw, lower: float, upper: float):
    return lower + (upper - lower) * nn.sigmoid(raw)
