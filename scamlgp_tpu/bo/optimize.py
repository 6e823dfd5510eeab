"""On-device acquisition maximization: vmapped multi-start ascent in [0,1]^d.

The reference relies on botorch ``optimize_acqf`` (multi-start scipy L-BFGS-B
over the unit cube — reference call stack 3.2, ``optimizer.py:99-100``).
TPU-native redesign: a Sobol/uniform raw-sample sweep picks the top-k starts,
then all starts run projected Adam ascent in lock-step under one ``vmap`` —
one compiled program, no host round-trips, fully deterministic given the key.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import qmc


class AcqOptResult(NamedTuple):
    x: jnp.ndarray          # (d,) best point in [0,1]^d
    value: jnp.ndarray      # () acquisition value at x


def _sobol_unit(key, n: int, d: int, dtype) -> jnp.ndarray:
    """Scrambled Sobol raw samples; seeded from the JAX key for determinism."""
    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    eng = qmc.Sobol(d=d, scramble=True, seed=seed)
    return jnp.asarray(eng.random(n), dtype=dtype)


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _ascend(acq_value: Callable, starts, num_steps: int, lr: float,
            use_sigmoid: bool, unused=None):
    """Projected gradient ascent from a stack of starts.

    Reparametrize x = sigmoid(z) so the box constraint disappears and the
    whole multi-start optimization is a single vmapped scan.
    """

    def logit(x):
        x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
        return jnp.log(x) - jnp.log1p(-x)

    def one_start(x0):
        z0 = logit(x0)

        def neg_acq(z):
            return -acq_value(jax.nn.sigmoid(z))

        import optax
        opt = optax.adam(lr)

        def step(carry, _):
            z, s, best_z, best_v = carry
            v, g = jax.value_and_grad(neg_acq)(z)
            updates, s = opt.update(g, s, z)
            z_new = optax.apply_updates(z, updates)
            better = jnp.isfinite(v) & (v < best_v)
            best_z = jnp.where(better, z, best_z)
            best_v = jnp.where(better, v, best_v)
            return (z_new, s, best_z, best_v), v

        s0 = opt.init(z0)
        (zf, _, best_z, best_v), _ = jax.lax.scan(
            step, (z0, s0, z0, jnp.asarray(jnp.inf, x0.dtype)), None,
            length=num_steps)
        vf = neg_acq(zf)
        final_better = jnp.isfinite(vf) & (vf < best_v)
        best_z = jnp.where(final_better, zf, best_z)
        best_v = jnp.where(final_better, vf, best_v)
        return jax.nn.sigmoid(best_z), -best_v

    return jax.vmap(one_start)(starts)


def optimize_acqf(acq_value: Callable, d: int, key,
                  raw_samples: int = 1024, num_restarts: int = 8,
                  num_steps: int = 50, lr: float = 0.05,
                  dtype=jnp.float64) -> AcqOptResult:
    """Maximize ``acq_value: (d,) -> ()`` over the unit cube.

    Args:
        acq_value: jittable acquisition evaluated at a single point.
        d: dimensionality.
        key: PRNG key — the only source of randomness (determinism contract).
    """
    k_raw, k_jitter = jax.random.split(key)
    raw = _sobol_unit(k_raw, raw_samples, d, dtype)
    raw_vals = jax.lax.map(jax.vmap(acq_value), raw.reshape(8, -1, d)).reshape(-1)
    raw_vals = jnp.where(jnp.isfinite(raw_vals), raw_vals, -jnp.inf)
    top = jax.lax.top_k(raw_vals, num_restarts)[1]
    starts = raw[top]
    xs, vals = _ascend(acq_value, starts, num_steps, lr, True)
    vals = jnp.where(jnp.isfinite(vals), vals, -jnp.inf)
    best = jnp.argmax(vals)
    return AcqOptResult(x=xs[best], value=vals[best])
