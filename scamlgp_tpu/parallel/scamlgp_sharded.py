"""Task-sharded ScaML-GP: meta-fit and target fit over a device mesh.

This is the TPU replacement for the reference's per-task Python loop and
study process pool (SURVEY.md section 2.5): the task axis is sharded over ICI
via ``shard_map``; per-shard work is the same batched vmapped fit as the
single-chip path; cross-task quantities (global outcome normalizer, the
weighted source mixture in the target MLL) are ``jax.lax.psum`` reductions
over the ``task`` mesh axis, through which gradients flow to the per-shard
weight parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from scamlgp_tpu.models import fit as fit_lib
from scamlgp_tpu.models import gp
from scamlgp_tpu.models import scamlgp as m
from scamlgp_tpu.utils.standardize import _MIN_STD


def pad_task_data(data: m.TaskData, multiple: int) -> m.TaskData:
    """Pad the task axis to a multiple of the mesh's task extent with fully
    masked dummy tasks (std=1, mean=0 so they are inert everywhere)."""
    M = data.X.shape[0]
    M_pad = ((M + multiple - 1) // multiple) * multiple
    if M_pad == M:
        return data
    extra = M_pad - M
    zeros = lambda shape: jnp.zeros(shape, data.X.dtype)
    return m.TaskData(
        X=jnp.concatenate([data.X, zeros((extra,) + data.X.shape[1:])]),
        y=jnp.concatenate([data.y, zeros((extra,) + data.y.shape[1:])]),
        mask=jnp.concatenate([data.mask,
                              zeros((extra,) + data.mask.shape[1:])]),
        mean=jnp.concatenate([data.mean, zeros((extra,))]),
        std=jnp.concatenate([data.std, jnp.ones((extra,), data.X.dtype)]),
    )


def meta_fit_sharded(data: m.TaskData, cfg: gp.GPConfig, key, mesh: Mesh,
                     num_restarts: int = 5,
                     num_steps: int = 60) -> m.SourceStack:
    """Source-GP stack fit with the task axis sharded over the mesh.

    Per-task fits are independent — no collectives; each shard runs the same
    vmapped multi-restart L-BFGS as ``meta_fit_task_stack``.
    """
    n_task_shards = mesh.shape["task"]
    data = pad_task_data(data, n_task_shards)
    M = data.X.shape[0]
    task_keys = jax.random.split(key, M)

    spec_task = P("task")
    dtype = data.X.dtype
    d = data.X.shape[-1]
    warm = gp.init_params(cfg, d, dtype)

    def shard_fn(X, y, mask, keys):
        def fit_one(x, y1, m1, k1):
            sampled = jax.vmap(
                lambda kk: gp.sample_params(cfg, kk, d, dtype))(
                    jax.random.split(k1, num_restarts))
            stack0 = fit_lib.stack_restarts(warm, sampled)
            obj = lambda p: gp.map_objective(cfg, p, x, y1, m1)
            return fit_lib.fit_map_restarts(obj, stack0,
                                            num_steps=num_steps).params

        return jax.vmap(fit_one)(X, y, mask, keys)

    params = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_task, spec_task, spec_task, spec_task),
        out_specs=spec_task, check_vma=False,
    )(data.X, data.y, data.mask, task_keys)
    return m.finalize_source_stack(data, cfg, params)


class ShardedTargetState(NamedTuple):
    """Target-model state with task-sharded source caches."""

    cached_means: jnp.ndarray   # (M, n) original-space source means at X
    cached_covs: jnp.ndarray    # (M, n, n)
    source_std: jnp.ndarray     # (M,) per-task Y stds (pruning + normalizer)
    source_mean: jnp.ndarray    # (M,)
    source_mask_counts: jnp.ndarray  # (M,) observation counts per task
    train_X: jnp.ndarray
    train_y: jnp.ndarray
    train_mask: jnp.ndarray
    out_mean: jnp.ndarray
    out_std: jnp.ndarray


def build_sharded_target(source: m.SourceStack, source_cfg: gp.GPConfig,
                         train_X, train_y, train_mask, mesh: Mesh
                         ) -> ShardedTargetState:
    """Cache source moments at train_X (task-sharded) and fit the global
    normalizer via psum over the task axis."""
    d = source.data
    means, covs, s1, s2, cnt = _cache_impl(source, source_cfg, train_X, mesh)

    train_y = jnp.asarray(train_y).reshape(-1)
    n_t = jnp.sum(train_mask)
    total = cnt + n_t
    s1t = s1 + jnp.sum(train_y * train_mask)
    s2t = s2 + jnp.sum((train_y * train_mask) ** 2)
    mean_all = s1t / jnp.maximum(total, 1.0)
    var_all = (s2t - total * mean_all**2) / jnp.maximum(total - 1.0, 1.0)
    std_all = jnp.sqrt(jnp.maximum(var_all, 0.0))
    std_all = jnp.where((total <= 1.0) | (std_all < _MIN_STD),
                        jnp.ones_like(std_all), std_all)
    out_mean = jnp.where(n_t > 0, mean_all, 0.0)
    out_std = jnp.where(n_t > 0, std_all, 1.0)

    return ShardedTargetState(
        cached_means=means, cached_covs=covs, source_std=d.std,
        source_mean=d.mean, source_mask_counts=jnp.sum(d.mask, axis=-1),
        train_X=train_X, train_y=train_y, train_mask=train_mask,
        out_mean=out_mean, out_std=out_std)


def _cache_impl(source: m.SourceStack, source_cfg: gp.GPConfig, train_X,
                mesh: Mesh):
    """Task-sharded source prediction + global-normalizer partial sums."""
    spec_task = P("task")
    rep = P()
    d = source.data

    def cache_fn(X, y, mask, chol, alpha, p_ls, p_os, p_nz, t_mean, t_std, tX):
        params = gp.GPParams(raw_lengthscale=p_ls, raw_outputscale=p_os,
                             raw_noise=p_nz)
        stack_local = m.SourceStack(
            data=m.TaskData(X=X, y=y, mask=mask, mean=t_mean, std=t_std),
            params=params, chol=chol, alpha=alpha)
        means, covs = m.source_predict(stack_local, source_cfg, tX,
                                       full_cov=True)
        y_orig = y * t_std[:, None] + t_mean[:, None]
        s1 = jax.lax.psum(jnp.sum(y_orig * mask), "task")
        s2 = jax.lax.psum(jnp.sum((y_orig * mask) ** 2), "task")
        cnt = jax.lax.psum(jnp.sum(mask), "task")
        return means, covs, s1, s2, cnt

    return shard_map(
        cache_fn, mesh=mesh,
        in_specs=(spec_task,) * 10 + (rep,),
        out_specs=(spec_task, spec_task, rep, rep, rep),
        check_vma=False,
    )(d.X, d.y, d.mask, source.chol, source.alpha,
      source.params.raw_lengthscale, source.params.raw_outputscale,
      source.params.raw_noise, d.mean, d.std, train_X)


def fit_target_sharded(state: ShardedTargetState, target_cfg: gp.GPConfig,
                       params: m.TargetParams, mesh: Mesh,
                       num_steps: int = 100,
                       learning_rate: float = 0.05) -> m.TargetParams:
    """MAP fit of (weights, residual kernel, noise) with weights task-sharded.

    The training-mode prior mean/cov are psum reductions of per-shard weighted
    source moments (reference hot loop 4 — ``model.py:359-363`` — distributed
    over ICI); gradients flow back through the psum to the local weight
    shards.  Adam in lock-step on every shard (identical replicated GP params,
    local weight shards).
    """
    spec_task = P("task")
    rep = P()

    y_std = ((state.train_y - state.out_mean) / state.out_std
             * state.train_mask)

    def shard_fit(cached_means, cached_covs, task_valid, raw_weights_local,
                  gp_ls, gp_os, gp_nz):
        gp_params = gp.GPParams(raw_lengthscale=gp_ls, raw_outputscale=gp_os,
                                raw_noise=gp_nz)

        def objective(p):
            raw_w_local, gpp = p
            # padded dummy tasks (zero observations) are masked out entirely
            w = m.weights_forward(raw_w_local) * task_valid
            mean = jax.lax.psum(
                jnp.einsum("mq,m->q", cached_means, w), "task")
            cov = jax.lax.psum(
                jnp.einsum("mqp,m->qp", cached_covs, w ** 2), "task")
            prior_mean = (mean - state.out_mean) / state.out_std
            prior_cov = cov / state.out_std ** 2
            extra = jax.lax.psum(
                jnp.sum(m.WEIGHTS_PRIOR.log_prob(
                    m.weights_forward(raw_w_local)) * task_valid), "task")
            return gp.map_objective(
                target_cfg, gpp, state.train_X, y_std,
                mask=state.train_mask, prior_mean=prior_mean,
                prior_cov=prior_cov, extra_log_prior=extra)

        opt = optax.adam(learning_rate)
        p0 = (raw_weights_local, gp_params)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(objective)(p)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (p_final, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), None,
                                            length=num_steps)
        raw_w_f, gpp_f = p_final
        return raw_w_f, gpp_f.raw_lengthscale, gpp_f.raw_outputscale, \
            gpp_f.raw_noise, losses[-1]

    task_valid = (state.source_mask_counts > 0).astype(
        state.cached_means.dtype)
    raw_w, ls, os_, nz, final_loss = shard_map(
        shard_fit, mesh=mesh,
        in_specs=(spec_task, spec_task, spec_task, spec_task, rep, rep, rep),
        out_specs=(spec_task, rep, rep, rep, rep), check_vma=False,
    )(state.cached_means, state.cached_covs, task_valid, params.raw_weights,
      params.gp.raw_lengthscale, params.gp.raw_outputscale,
      params.gp.raw_noise)
    return m.TargetParams(raw_weights=raw_w,
                          gp=gp.GPParams(raw_lengthscale=ls,
                                         raw_outputscale=os_, raw_noise=nz))
