"""Multi-restart MAP fitting of GP hyperparameters — vmapped on-device L-BFGS.

The reference fits each model with ``num_restarts + 1`` attempts — first a warm
start from current parameters, then prior-sampled restarts — each driven by
scipy L-BFGS-B through ``botorch.fit.fit_gpytorch_mll``, keeping the state dict
with the best final MLL (``/root/reference/scamlgp/utils.py:139-212``).

TPU-native redesign: restarts are a *batch axis*.  All restarts run the same
fixed number of L-BFGS iterations in lock-step under one ``vmap``-of-``scan``
(bound constraints disappear because raw parameters are unconstrained — see
``utils/constraints.py``), then the best final objective wins.  A NaN/diverged
restart simply loses the argmin, mirroring the reference's try/except skip
(``utils.py:193-198``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class FitResult(NamedTuple):
    params: Any               # best raw-parameter pytree (no restart axis)
    objective: jnp.ndarray    # final objective of the winner (lower = better)
    all_objectives: jnp.ndarray  # (num_restarts+1,) final objectives


def _cast_like(tree, ref):
    return jax.tree_util.tree_map(lambda l, r: l.astype(r.dtype), tree, ref)


def _lbfgs_minimize(objective: Callable, params0, num_steps: int,
                    memory_size: int = 10):
    """Run ``num_steps`` L-BFGS iterations from ``params0``; returns final
    (params, value).  Safe under vmap.

    Dtype stability: under ``jax_enable_x64`` optax's zoom linesearch creates
    weak-f64 stepsizes that promote f32 params mid-linesearch, which then hit
    dtype-strict ops (``lax.triangular_solve``) against f32 data.  Every
    boundary (objective input, value, grad, updates) is therefore cast back to
    ``params0``'s dtypes so the whole fit runs in the caller's precision.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20),
    )
    val_dtype = jnp.result_type(*jax.tree_util.tree_leaves(params0))

    def objective_stable(p):
        return objective(_cast_like(p, params0)).astype(val_dtype)

    def step(carry, _):
        params, state, best_params, best_val = carry
        value, grad = optax.value_and_grad_from_state(objective_stable)(
            params, state=state)
        value = value.astype(val_dtype)
        grad = _cast_like(grad, params0)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad,
            value_fn=objective_stable)
        params = _cast_like(optax.apply_updates(params, updates), params0)
        is_better = jnp.isfinite(value) & (value < best_val)
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(is_better, p, b), best_params, params)
        best_val = jnp.where(is_better, value, best_val)
        return (params, state, best_params, best_val), value

    state0 = opt.init(params0)
    init_val = jnp.asarray(jnp.inf, dtype=val_dtype)
    (_, _, best_params, _), _ = jax.lax.scan(
        step, (params0, state0, params0, init_val), None, length=num_steps)
    final_val = objective_stable(best_params)
    return best_params, final_val


def fit_map_restarts(objective: Callable, init_stack, num_steps: int = 60,
                     memory_size: int = 10) -> FitResult:
    """Minimize ``objective`` from a stack of initial points (leading axis =
    restart), return the best final point.

    Args:
        objective: pure fn(raw_params_pytree) -> scalar loss.
        init_stack: pytree whose leaves carry a leading restart axis R; entry 0
            is conventionally the warm start (reference ``utils.py:173-179``).
    """
    run = jax.vmap(partial(_lbfgs_minimize, objective, num_steps=num_steps,
                           memory_size=memory_size))
    params_stack, values = run(init_stack)
    values = jnp.where(jnp.isfinite(values), values, jnp.inf)
    best = jnp.argmin(values)
    params = jax.tree_util.tree_map(lambda leaf: leaf[best], params_stack)
    return FitResult(params=params, objective=values[best], all_objectives=values)


def refine_map_f64_cpu(cfg, params, X, y, mask=None, num_steps: int = 40,
                       memory_size: int = 10, **objective_kwargs):
    """Polish a fitted GP solution against the exact f64 MAP objective on
    the host CPU backend (the 'f64 only at the final refit' island).

    At N >= 512 the f32 MLL surface is distorted enough that the fitted
    noise saturates at its 1e-2 Interval ceiling, and the in-graph
    ``chol64`` island crashes the axon TPU compiler at that size
    (``docs/PROBE_CHOL64_r4.json``).  The CPU backend coexists with the
    TPU in-process, so the *final* refit runs there: one f64 L-BFGS
    descent from the f32 MAP solution.  O(num_steps) host Choleskys —
    ~milliseconds at N=512 — against bit-accurate f64 numerics.

    Requires ``jax_enable_x64``.  Returns ``FitResult`` with f64 raw
    params (callers cast back to their working dtype as needed).
    """
    if not jax.config.jax_enable_x64:
        raise ValueError("refine_map_f64_cpu needs jax_enable_x64 "
                         "(f64-island mode)")
    from scamlgp_tpu.models import gp as gp_lib

    cpu = jax.devices("cpu")[0]

    def f64(t):
        return None if t is None else jax.device_put(
            jnp.asarray(t, jnp.float64), cpu)

    X64, y64 = f64(X), f64(y)
    mask64 = f64(mask)
    p64 = jax.tree_util.tree_map(f64, params)
    kw64 = {k: (f64(v) if isinstance(v, jnp.ndarray) else v)
            for k, v in objective_kwargs.items()}

    def objective(p):
        return gp_lib.map_objective(cfg, p, X64, y64, mask=mask64, **kw64)

    with jax.default_device(cpu):
        best, val = jax.jit(partial(
            _lbfgs_minimize, objective, num_steps=num_steps,
            memory_size=memory_size))(p64)
    return FitResult(params=best, objective=val,
                     all_objectives=val[None])


def stack_restarts(warm_params, sampled_params_stack):
    """Prepend a warm-start pytree to a prior-sampled restart stack."""
    return jax.tree_util.tree_map(
        lambda w, s: jnp.concatenate([w[None], s], axis=0),
        warm_params, sampled_params_stack)
