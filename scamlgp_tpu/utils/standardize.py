"""Masked Standardize outcome transform (fit-then-freeze semantics).

Replicates BoTorch's ``Standardize`` as used by the reference:

- per-source-task standardization of Y during meta-fit
  (``/root/reference/scamlgp/model.py:185``),
- a *global* normalizer fit on the concatenation of all meta-Y and target-Y and
  then frozen with ``.eval()`` (``/root/reference/scamlgp/model.py:261-276``) —
  target covariance is divided by ``stdvs**2`` in the model forward
  (``/root/reference/scamlgp/model.py:376-382``).

BoTorch details matched here: the std uses Bessel's correction (ddof=1); for
n <= 1 the std is set to 1.0; stds below 1e-8 are clamped to 1.0.

Everything is mask-aware so heterogeneous task sizes batch into one array.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

_MIN_STD = 1e-8


class Standardize(NamedTuple):
    """Frozen affine outcome transform: ``y_std = (y - mean) / std``."""

    mean: jnp.ndarray  # broadcastable scalar or (..., 1)
    std: jnp.ndarray

    def transform(self, y):
        return (y - self.mean) / self.std

    def untransform(self, y_std):
        return y_std * self.std + self.mean

    def untransform_cov(self, cov_std):
        return cov_std * self.std**2

    def transform_cov(self, cov):
        return cov / self.std**2


def fit_standardize(y: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                    axis: int = -1) -> Standardize:
    """Fit mean/std over ``axis`` with an optional validity mask.

    Args:
        y: observations, any batch shape.
        mask: same shape as ``y`` (or broadcastable); 1 for real rows, 0 for pad.
        axis: reduction axis (the "n" axis).
    """
    if mask is None:
        mask = jnp.ones_like(y)
    mask = jnp.broadcast_to(mask, y.shape).astype(y.dtype)
    n = jnp.sum(mask, axis=axis, keepdims=True)
    n_safe = jnp.maximum(n, 1.0)
    mean = jnp.sum(y * mask, axis=axis, keepdims=True) / n_safe
    centered = (y - mean) * mask
    var = jnp.sum(centered**2, axis=axis, keepdims=True) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    std = jnp.where((n <= 1.0) | (std < _MIN_STD), jnp.ones_like(std), std)
    mean = jnp.where(n < 1.0, jnp.zeros_like(mean), mean)
    return Standardize(mean=jnp.squeeze(mean, axis), std=jnp.squeeze(std, axis))


def identity_standardize(dtype=jnp.float32) -> Standardize:
    return Standardize(mean=jnp.zeros((), dtype), std=jnp.ones((), dtype))
