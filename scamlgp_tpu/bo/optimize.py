"""On-device acquisition maximization: vmapped multi-start ascent in [0,1]^d.

The reference relies on botorch ``optimize_acqf`` (multi-start scipy L-BFGS-B
over the unit cube — reference call stack 3.2, ``optimizer.py:99-100``).
TPU-native redesign: a scrambled-Sobol raw-sample sweep picks the top-k
starts, then all starts run projected Adam ascent in lock-step under one
``vmap`` — one compiled program, no host round-trips, deterministic given the
key.

Compilation hygiene: the acquisition is passed as a *static top-level
function* ``value_fn(args, x)`` plus a *traced pytree* ``args`` (model state,
incumbent, ...).  The jit cache then keys on (value_fn, shapes) and the BO
loop only recompiles at data-capacity bucket boundaries, never per iteration.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy.stats import qmc


class AcqOptResult(NamedTuple):
    x: jnp.ndarray          # (d,) best point in [0,1]^d
    value: jnp.ndarray      # () acquisition value at x


def sobol_unit(seed: int, n: int, d: int, dtype) -> jnp.ndarray:
    """Host-side scrambled Sobol raw samples (scipy QMC, like the reference's
    meta-data sobol path — ``benchmarks/base.py:212``)."""
    eng = qmc.Sobol(d=d, scramble=True, seed=seed)
    return jnp.asarray(eng.random(n), dtype=dtype)


def _logit(x):
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return jnp.log(x) - jnp.log1p(-x)


@partial(jax.jit, static_argnames=("value_fn", "static_args", "num_restarts",
                                   "num_steps", "lr"))
def _optimize(value_fn: Callable, static_args: Any, args: Any,
              raw: jnp.ndarray,
              num_restarts: int, num_steps: int, lr: float) -> AcqOptResult:
    # 1) raw sweep — vmapped in chunks (parallel on device, bounded memory)
    n_raw, d = raw.shape
    chunk = max(1, min(128, n_raw))
    n_chunks = n_raw // chunk
    batched = jax.vmap(lambda x: value_fn(static_args, args, x))
    raw_vals = jax.lax.map(batched,
                           raw[:n_chunks * chunk].reshape(n_chunks, chunk, d)
                           ).reshape(-1)
    if n_chunks * chunk < n_raw:
        raw_vals = jnp.concatenate([raw_vals,
                                    batched(raw[n_chunks * chunk:])])
    raw_vals = jnp.where(jnp.isfinite(raw_vals), raw_vals, -jnp.inf)
    starts = raw[jax.lax.top_k(raw_vals, num_restarts)[1]]

    # 2) multi-start ascent, x = sigmoid(z) removes the box constraint
    opt = optax.adam(lr)

    def neg(z):
        return -value_fn(static_args, args, jax.nn.sigmoid(z))

    def one_start(x0):
        z0 = _logit(x0)

        def step(carry, _):
            z, s, best_z, best_v = carry
            v, g = jax.value_and_grad(neg)(z)
            updates, s = opt.update(g, s, z)
            z_new = optax.apply_updates(z, updates)
            better = jnp.isfinite(v) & (v < best_v)
            best_z = jnp.where(better, z, best_z)
            best_v = jnp.where(better, v, best_v)
            return (z_new, s, best_z, best_v), None

        (zf, _, best_z, best_v), _ = jax.lax.scan(
            step, (z0, opt.init(z0), z0, jnp.asarray(jnp.inf, x0.dtype)),
            None, length=num_steps)
        vf = neg(zf)
        better = jnp.isfinite(vf) & (vf < best_v)
        return (jnp.where(better, zf, best_z),
                jnp.where(better, vf, best_v))

    zs, negvals = jax.vmap(one_start)(starts)
    vals = jnp.where(jnp.isfinite(negvals), -negvals, -jnp.inf)
    best = jnp.argmax(vals)
    return AcqOptResult(x=jax.nn.sigmoid(zs[best]), value=vals[best])


def optimize_acqf(value_fn: Callable, static_args: Any, args: Any, d: int,
                  key, raw_samples: int = 1024, num_restarts: int = 8,
                  num_steps: int = 50, lr: float = 0.05,
                  dtype=jnp.float64) -> AcqOptResult:
    """Maximize ``value_fn(static_args, args, x)`` over the unit cube.

    Args:
        value_fn: static, hashable (top-level) function of
            (static_args, args, (d,)-point) -> scalar.
        static_args: hashable configuration (acquisition object, GP configs).
        args: traced pytree (model state, incumbent, ...).
        key: PRNG key — sole randomness source (determinism contract,
            reference ``testing.py:50-100``).
    """
    seed = int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    raw = sobol_unit(seed, raw_samples, d, dtype)
    return _optimize(value_fn, static_args, args, raw, num_restarts,
                     num_steps, lr)
