"""ScaML-GP — hierarchical sum-of-GPs meta-model, TPU-native.

Model (reference ``/root/reference/scamlgp/optimizer.py:61-85``,
``model.py:218-384``): one independent source GP per meta-task; the target GP's
prior is the weighted source posterior

    mu_s(x)      = sum_i w_i mu_i(x)
    Sigma_s(x,x') = sum_i w_i^2 Sigma_i(x,x')

plus a residual target kernel ``k_t``; weights are learned jointly with the
target MLL.

TPU-first redesign vs the reference:

- Source GPs are one *batched stack* — data padded to a common N with masks,
  parameters carrying a leading task axis.  The reference's sequential
  per-task fit loop (``model.py:176-188``) becomes ``vmap`` over
  (task x restart) and can be sharded over a device mesh (see
  ``scamlgp_tpu/parallel``).
- Weight pruning (``model.py:192-215,365-372``) is a multiplicative 0/1 mask,
  not a gather — static shapes under ``jit``.
- The global outcome normalizer (fit on concat(meta-Y, target-Y), then frozen
  — ``model.py:261-276``) is two scalars threaded through the state.
- "Training mode" source moments at train_X are cached tensors
  (``model.py:278-289``), exactly like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from scamlgp_tpu.models import fit as fit_lib
from scamlgp_tpu.models import gp
from scamlgp_tpu.ops import linalg
from scamlgp_tpu.utils.priors import Gamma
from scamlgp_tpu.utils.standardize import fit_standardize

WEIGHTS_PRIOR = Gamma(1.0, 1.0)          # model.py:326-331
WEIGHTS_LOWER_BOUND = 1e-10              # model.py:334
DEFAULT_PRUNING_THRESHOLD = 1e-3         # model.py:226,257


# ---------------------------------------------------------------------------
# Source stack
# ---------------------------------------------------------------------------

class TaskData(NamedTuple):
    """Meta-task observations, padded and stacked over the task axis."""

    X: jnp.ndarray      # (M, N, d) unit-cube inputs
    y: jnp.ndarray      # (M, N) per-task standardized targets
    mask: jnp.ndarray   # (M, N) 1 = real observation, 0 = pad
    mean: jnp.ndarray   # (M,) per-task Standardize mean (original space)
    std: jnp.ndarray    # (M,) per-task Standardize std


class SourceStack(NamedTuple):
    """Fitted source GPs: data + MAP hyperparameters + cached factorizations."""

    data: TaskData
    params: gp.GPParams          # leaves with leading (M,) axis
    chol: jnp.ndarray            # (M, N, N)
    alpha: jnp.ndarray           # (M, N)  A^-1 y_std

    @property
    def num_tasks(self) -> int:
        return self.data.X.shape[0]


def pack_task_data(xs, ys, dtype=None) -> TaskData:
    """Pad a list of per-task (X_i, y_i) arrays to a common N and standardize
    each task's Y (the reference's per-task ``Standardize`` —
    ``model.py:185``)."""
    dtype = dtype or jnp.asarray(xs[0]).dtype
    m = len(xs)
    n_max = max(int(jnp.shape(x)[0]) for x in xs)
    d = int(jnp.shape(xs[0])[-1])
    X = jnp.zeros((m, n_max, d), dtype)
    Y = jnp.zeros((m, n_max), dtype)
    mask = jnp.zeros((m, n_max), dtype)
    for i, (x, y) in enumerate(zip(xs, ys)):
        n = int(jnp.shape(x)[0])
        X = X.at[i, :n].set(jnp.asarray(x, dtype))
        Y = Y.at[i, :n].set(jnp.asarray(y, dtype).reshape(-1))
        mask = mask.at[i, :n].set(1.0)
    tr = fit_standardize(Y, mask, axis=-1)
    y_std = (Y - tr.mean[:, None]) / tr.std[:, None] * mask
    return TaskData(X=X, y=y_std, mask=mask, mean=tr.mean, std=tr.std)


def validate_meta_data(xs, ys) -> None:
    """Shape validation mirroring ``/root/reference/scamlgp/utils.py:112-136``."""
    if len(xs) == 0:
        raise ValueError("Empty meta data. Needs at least one source task.")
    if len(xs) != len(ys):
        raise ValueError("meta X and Y task counts differ.")
    d = jnp.shape(xs[0])[-1]
    for i, (x, y) in enumerate(zip(xs, ys)):
        if jnp.shape(x)[-1] != d:
            raise ValueError(f"Feature dim of task {i} does not match task 0.")
        y_arr = jnp.asarray(y)
        if y_arr.ndim == 2 and y_arr.shape[-1] != 1:
            raise ValueError(
                f"The output dimension of task {i} is {y_arr.shape[-1]} "
                f"but must be one")
        if jnp.shape(x)[0] != y_arr.shape[0]:
            raise ValueError(f"X/Y length mismatch in task {i}.")


@partial(jax.jit, static_argnames=("cfg", "num_restarts", "num_steps",
                                   "mll_method"))
def meta_fit_task_stack(data: TaskData, cfg: gp.GPConfig, key,
                        num_restarts: int = 5,
                        num_steps: int = 60,
                        task_keys=None,
                        mll_method: str = "chol") -> SourceStack:
    """Fit all source GPs at once: ``vmap`` over tasks of a ``vmap`` over
    restarts (reference hot loops 1x2, ``model.py:176-188`` +
    ``utils.py:139-212``).

    ``task_keys`` (one PRNG key per task) may be passed instead of ``key``,
    e.g. by ``shard_map`` callers that pre-split globally so each shard's
    keys match the unsharded program's.

    ``mll_method="sweep"`` routes every MLL evaluation through the Pallas
    inverse kernels with the analytic matrix-level VJP
    (``ops/inverse_mll.py``) — the TPU throughput path."""
    m, n, d = data.X.shape
    dtype = data.X.dtype
    warm = gp.init_params(cfg, d, dtype)

    def fit_one(x, y, mask, task_key):
        keys = jax.random.split(task_key, num_restarts)
        sampled = jax.vmap(lambda k: gp.sample_params(cfg, k, d, dtype))(keys)
        stack0 = fit_lib.stack_restarts(warm, sampled)
        obj = lambda p: gp.map_objective(cfg, p, x, y, mask,
                                         method=mll_method)
        return fit_lib.fit_map_restarts(obj, stack0, num_steps=num_steps).params

    if task_keys is None:
        task_keys = jax.random.split(key, m)
    params = jax.vmap(fit_one)(data.X, data.y, data.mask, task_keys)
    return finalize_source_stack(data, cfg, params)


def finalize_source_stack(data: TaskData, cfg: gp.GPConfig,
                          params: gp.GPParams) -> SourceStack:
    """Cache per-task Cholesky factors / alpha vectors for fast prediction."""

    def factor(x, y, mask, p):
        c = gp.constrain(cfg, p)
        K = gp.gram(cfg, c, x)
        st = linalg.cholesky_factor(K, c.noise, y, mask)
        return st.chol, st.alpha

    chol, alpha = jax.vmap(factor)(data.X, data.y, data.mask, params)
    return SourceStack(data=data, params=params, chol=chol, alpha=alpha)


def source_predict(stack: SourceStack, cfg: gp.GPConfig, P,
                   full_cov: bool = True):
    """Per-task posterior at points ``P`` in the ORIGINAL y space.

    Mirrors ``task_gp.posterior(x)`` per source GP (``model.py:128``) — latent
    noise-free posterior, un-standardized with the per-task transform.

    Returns:
        means: (M, q); covs: (M, q, q) if full_cov else vars (M, q).
    """

    def one(x, mask, chol, alpha, p, t_mean, t_std):
        c = gp.constrain(cfg, p)
        Kxq = gp.gram(cfg, c, x, P) * mask[:, None]
        mean = jnp.matmul(Kxq.T, alpha, precision=jax.lax.Precision.HIGHEST)
        v = jax.lax.linalg.triangular_solve(chol, Kxq, left_side=True, lower=True)
        if full_cov:
            Kqq = gp.gram(cfg, c, P)
            cov = Kqq - jnp.matmul(v.T, v, precision=jax.lax.Precision.HIGHEST)
            return t_mean + t_std * mean, (t_std ** 2) * cov
        var = jnp.maximum(c.outputscale - jnp.sum(v * v, axis=0), 0.0)
        return t_mean + t_std * mean, (t_std ** 2) * var

    d = stack.data
    return jax.vmap(one)(d.X, d.mask, stack.chol, stack.alpha, stack.params,
                         d.mean, d.std)


# ---------------------------------------------------------------------------
# Weight pruning (model.py:192-215)
# ---------------------------------------------------------------------------

def significant_weights_mask(weights, std_Y_vals, threshold):
    r"""Mask of weights with ``w_i sigma_i * n_w / sum_j w_j sigma_j >= tau``."""
    num_weights = weights.shape[-1]
    w_sigma = weights * std_Y_vals
    norm = w_sigma * num_weights / jnp.sum(w_sigma, axis=-1, keepdims=True)
    return norm >= threshold


# ---------------------------------------------------------------------------
# Target model
# ---------------------------------------------------------------------------

class TargetParams(NamedTuple):
    raw_weights: jnp.ndarray  # (M,) softplus-reparametrized task weights
    gp: gp.GPParams           # residual kernel + noise


def weights_forward(raw):
    """w = softplus(raw) + 1e-10.

    The reference registers ``GreaterThan(1e-10, transform=None)`` — an
    *unenforced* bound whose positivity is maintained only by the Gamma prior
    barrier under scipy L-BFGS-B NaN backtracking (``model.py:318-338``).  A
    smooth reparametrization is the robust on-device equivalent: same feasible
    set, same prior, no NaN excursions.
    """
    return jax.nn.softplus(raw) + WEIGHTS_LOWER_BOUND


def weights_inverse(w):
    v = jnp.maximum(w - WEIGHTS_LOWER_BOUND, 1e-30)
    return v + jnp.log(-jnp.expm1(-v))


def init_target_params(cfg: gp.GPConfig, num_tasks: int, ard_dims: int,
                       dtype=jnp.float32) -> TargetParams:
    w0 = jnp.full((num_tasks,), 1.0 / num_tasks, dtype)  # model.py:321
    return TargetParams(raw_weights=weights_inverse(w0),
                        gp=gp.init_params(cfg, ard_dims, dtype))


def sample_target_params(cfg: gp.GPConfig, key, num_tasks: int, ard_dims: int,
                         dtype=jnp.float32) -> TargetParams:
    k_w, k_gp = jax.random.split(key)
    w = WEIGHTS_PRIOR.sample(k_w, (num_tasks,)).astype(dtype)
    w = jnp.maximum(w, 1e-8)
    return TargetParams(raw_weights=weights_inverse(w),
                        gp=gp.sample_params(cfg, k_gp, ard_dims, dtype))


class ScaMLGP(NamedTuple):
    """Immutable model state: source stack + target data + parameters.

    The reference's ``ScaMLGP(SingleTaskGP)`` module (``model.py:218-384``) as
    a functional pytree.  ``train_y`` is kept in the original space; the frozen
    global normalizer is ``(out_mean, out_std)``.
    """

    source: SourceStack
    train_X: jnp.ndarray             # (n, d)
    train_y: jnp.ndarray             # (n,) original space
    train_mask: jnp.ndarray          # (n,)
    out_mean: jnp.ndarray            # () frozen global Standardize
    out_std: jnp.ndarray             # ()
    params: TargetParams
    cached_source_means: jnp.ndarray  # (n, M) original space at train_X
    cached_source_covs: jnp.ndarray   # (M, n, n)

    @property
    def weights(self):
        return weights_forward(self.params.raw_weights)

    @property
    def num_tasks(self) -> int:
        return self.source.num_tasks


def build_scamlgp(source: SourceStack, source_cfg: gp.GPConfig,
                  train_X, train_y, train_mask=None,
                  target_cfg: Optional[gp.GPConfig] = None,
                  params: Optional[TargetParams] = None) -> ScaMLGP:
    """Assemble the target model (reference ``ScaMLGP.__init__``,
    ``model.py:218-339``): fit-and-freeze the global normalizer on
    concat(meta-Y, target-Y), cache source moments at train_X, initialize
    weights at 1/M (or reuse ``params`` as warm start —
    ``optimizer.py:176-183``)."""
    target_cfg = target_cfg or gp.target_gp_config()
    train_X = jnp.asarray(train_X)
    train_y = jnp.asarray(train_y).reshape(-1)
    n, d = train_X.shape
    if train_mask is None:
        train_mask = jnp.ones((n,), train_X.dtype)
    m = source.num_tasks

    # global normalizer over concat of original-space meta Y and target Y
    meta_y_orig = (source.data.y * source.data.std[:, None]
                   + source.data.mean[:, None])
    all_y = jnp.concatenate([meta_y_orig.reshape(-1), train_y])
    all_mask = jnp.concatenate([source.data.mask.reshape(-1), train_mask])
    tr = fit_standardize(all_y, all_mask, axis=-1)
    # reference: with empty target data no outcome transform is applied
    # (model.py:307-308 -> hasattr check in forward, model.py:376)
    n_target = jnp.sum(train_mask)
    out_mean = jnp.where(n_target > 0, tr.mean, 0.0).astype(train_X.dtype)
    out_std = jnp.where(n_target > 0, tr.std, 1.0).astype(train_X.dtype)

    # cache source posterior moments at train_X (model.py:278-289)
    means, covs = source_predict(source, source_cfg, train_X, full_cov=True)
    cached_means = means.T                       # (n, M)

    if params is None:
        params = init_target_params(target_cfg, m, d, train_X.dtype)
    return ScaMLGP(source=source, train_X=train_X, train_y=train_y,
                   train_mask=train_mask, out_mean=out_mean, out_std=out_std,
                   params=params, cached_source_means=cached_means,
                   cached_source_covs=covs)


def _training_prior(model: ScaMLGP, params: TargetParams):
    """Training-mode prior moments at train_X from cached source posteriors,
    mapped through the frozen normalizer (``model.py:359-363,376-382``)."""
    w = weights_forward(params.raw_weights)
    mean = model.cached_source_means @ w                     # (n,)
    cov = jnp.einsum("mij,m->ij", model.cached_source_covs, w ** 2)
    mean_std = (mean - model.out_mean) / model.out_std
    cov_std = cov / model.out_std ** 2
    return mean_std, cov_std


def scamlgp_map_objective(model: ScaMLGP, target_cfg: gp.GPConfig,
                          params: TargetParams) -> jnp.ndarray:
    """Negative (target MLL + priors) — reference hot loop 4
    (``model.py:359-363`` + ``utils.py:175-192``)."""
    prior_mean, prior_cov = _training_prior(model, params)
    y_std = (model.train_y - model.out_mean) / model.out_std * model.train_mask
    w = weights_forward(params.raw_weights)
    extra = jnp.sum(WEIGHTS_PRIOR.log_prob(w))
    return gp.map_objective(target_cfg, params.gp, model.train_X, y_std,
                            mask=model.train_mask, prior_mean=prior_mean,
                            prior_cov=prior_cov, extra_log_prior=extra)


@partial(jax.jit, static_argnames=("target_cfg", "num_restarts", "num_steps"))
def fit_scamlgp(model: ScaMLGP, target_cfg: gp.GPConfig, key,
                num_restarts: int = 5, num_steps: int = 60) -> ScaMLGP:
    """Refit weights + residual kernel + noise with warm start and
    prior-sampled restarts (``optimizer.py:185`` -> ``utils.py:139-212``)."""
    m = model.num_tasks
    d = model.train_X.shape[-1]
    dtype = model.train_X.dtype
    keys = jax.random.split(key, num_restarts)
    sampled = jax.vmap(
        lambda k: sample_target_params(target_cfg, k, m, d, dtype))(keys)
    stack0 = fit_lib.stack_restarts(model.params, sampled)
    obj = lambda p: scamlgp_map_objective(model, target_cfg, p)
    res = fit_lib.fit_map_restarts(obj, stack0, num_steps=num_steps)
    return model._replace(params=res.params)


def _eval_prior(model: ScaMLGP, source_cfg: gp.GPConfig, P,
                pruning_threshold: float = DEFAULT_PRUNING_THRESHOLD):
    """Eval-mode prior over arbitrary points ``P`` in standardized target
    space, with weight pruning (``model.py:364-382``)."""
    w = weights_forward(model.params.raw_weights)
    prune = significant_weights_mask(
        w, model.source.data.std, pruning_threshold).astype(P.dtype)
    means, covs = source_predict(model.source, source_cfg, P, full_cov=True)
    w_eff = w * prune
    mean = jnp.einsum("mq,m->q", means, w_eff)
    cov = jnp.einsum("mqp,m->qp", covs, w_eff ** 2)
    mean_std = (mean - model.out_mean) / model.out_std
    cov_std = cov / model.out_std ** 2
    return mean_std, cov_std


def scamlgp_posterior(model: ScaMLGP, source_cfg: gp.GPConfig,
                      target_cfg: gp.GPConfig, Xq,
                      pruning_threshold: float = DEFAULT_PRUNING_THRESHOLD,
                      observation_noise: bool = False,
                      original_scale: bool = True):
    """Posterior predictive at ``Xq`` — the gpytorch eval-mode joint
    conditioning path (reference call stack 3.2): prior over
    [train_X; Xq] from the pruned source mixture + residual kernel, then exact
    GP conditioning on the (standardized) target observations.

    Returns (mean, cov) at Xq; in the original y space when
    ``original_scale`` (botorch ``posterior`` untransforms —
    ``model.py:128``).
    """
    n = model.train_X.shape[0]
    P = jnp.concatenate([model.train_X, Xq], axis=0)
    prior_mean, prior_cov = _eval_prior(model, source_cfg, P, pruning_threshold)
    c = gp.constrain(target_cfg, model.params.gp)
    Kt = gp.gram(target_cfg, c, P)
    cov_full = prior_cov + Kt

    y_std = ((model.train_y - model.out_mean) / model.out_std
             * model.train_mask)
    resid = y_std - prior_mean[:n] * model.train_mask
    state = linalg.cholesky_factor(cov_full[:n, :n], c.noise, resid,
                                   model.train_mask)
    mean, cov = linalg.posterior(state, cov_full[:n, n:],
                                 Kqq=cov_full[n:, n:])
    mean = mean + prior_mean[n:]
    if observation_noise:
        cov = cov + c.noise * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    if original_scale:
        mean = mean * model.out_std + model.out_mean
        cov = cov * model.out_std ** 2
    return mean, cov


class AcqState(NamedTuple):
    """Candidate-independent cache for the acquisition hot path.

    The joint-conditioning posterior rebuilds the (n+1)-point system — gram
    assembly + Cholesky — for EVERY candidate (the gpytorch eval-mode path,
    reference ``model.py:359-384``).  This state is built ONCE per refit and
    turns each candidate into O(M*Ns + n) triangular solves against cached
    factors: the standard cached-predictive structure of exact GPs (reference
    gpytorch caches, ``model.py:128``).
    """

    st: linalg.CholState     # factorization of the standardized n x n system
    v1: jnp.ndarray          # (M, Ns, n) per-source L^{-1} K(Xs, train_X)
    w_eff: jnp.ndarray       # (M,) pruned mixture weights
    c: gp.Constrained        # constrained target kernel + noise
    out_mean: jnp.ndarray    # () frozen global normalizer
    out_std: jnp.ndarray     # ()


def acq_state_from_parts(stack: SourceStack, source_cfg: gp.GPConfig,
                         target_cfg: gp.GPConfig, params: TargetParams,
                         Xbuf, ybuf, mask, out_mean, out_std,
                         pruning_threshold: float) -> AcqState:
    """Build the cached acquisition state from explicit buffers (shared by
    the sequential driver and the vectorized campaigns)."""
    w = weights_forward(params.raw_weights)
    prune = significant_weights_mask(
        w, stack.data.std, pruning_threshold).astype(Xbuf.dtype)
    w_eff = w * prune
    c = gp.constrain(target_cfg, params.gp)

    means_n, covs_nn = source_predict(stack, source_cfg, Xbuf, full_cov=True)
    mean_p = jnp.einsum("mq,m->q", means_n, w_eff)
    cov_p = jnp.einsum("mqp,m->qp", covs_nn, w_eff ** 2)
    mean_std_n = (mean_p - out_mean) / out_std
    cov_std = cov_p / out_std ** 2
    Kt_nn = gp.gram(target_cfg, c, Xbuf)
    y_std = (ybuf - out_mean) / out_std * mask
    resid = y_std - mean_std_n * mask
    st = linalg.cholesky_factor(cov_std + Kt_nn, c.noise, resid, mask)

    def src_v1(xs, msk, chol, p):
        cs = gp.constrain(source_cfg, p)
        Kxn = gp.gram(source_cfg, cs, xs, Xbuf) * msk[:, None]
        return jax.lax.linalg.triangular_solve(chol, Kxn, left_side=True,
                                               lower=True)

    v1 = jax.vmap(src_v1)(stack.data.X, stack.data.mask, stack.chol,
                          stack.params)                    # (M, Ns, n)
    return AcqState(st=st, v1=v1, w_eff=w_eff, c=c, out_mean=out_mean,
                    out_std=out_std)


def posterior_diag_from_state(stack: SourceStack, source_cfg: gp.GPConfig,
                              target_cfg: gp.GPConfig, state: AcqState,
                              Xbuf, Xq, original_scale: bool = True):
    """Marginal posterior at candidates ``Xq`` via the cached state —
    numerically identical to the joint-conditioning path (pinned by
    ``tests/test_parallel.py::test_fast_acq_state_matches_joint`` and
    ``tests/test_scamlgp.py::test_cached_posterior_matches_joint``)."""
    hi = jax.lax.Precision.HIGHEST
    st, v1, w_eff, c, out_mean, out_std = state

    def one(x):
        xq = x[None]

        def src(xs, msk, chol, alpha, p, t_mean, t_std, v1_m):
            cs = gp.constrain(source_cfg, p)
            Ksq = gp.gram(source_cfg, cs, xs, xq) * msk[:, None]  # (Ns, 1)
            mean_q = jnp.matmul(Ksq.T, alpha, precision=hi)[0]
            v2 = jax.lax.linalg.triangular_solve(chol, Ksq, left_side=True,
                                                 lower=True)      # (Ns, 1)
            knq = gp.gram(source_cfg, cs, Xbuf, xq)[:, 0]         # (n,)
            cross = knq - jnp.matmul(v1_m.T, v2, precision=hi)[:, 0]
            qq = gp.gram(source_cfg, cs, xq)[0, 0] - jnp.sum(v2 * v2)
            return (t_mean + t_std * mean_q, (t_std ** 2) * cross,
                    (t_std ** 2) * qq)

        d = stack.data
        means_q, crosses, qqs = jax.vmap(src)(
            d.X, d.mask, stack.chol, stack.alpha, stack.params, d.mean,
            d.std, v1)

        mean_q_std = ((jnp.einsum("m,m->", w_eff, means_q) - out_mean)
                      / out_std)
        cross_std = jnp.einsum("m,mn->n", w_eff ** 2, crosses) / out_std ** 2
        qq_std = jnp.einsum("m,m->", w_eff ** 2, qqs) / out_std ** 2

        kt_nq = gp.gram(target_cfg, c, Xbuf, xq)[:, 0]
        kt_qq = gp.gram(target_cfg, c, xq)[0, 0]
        B = (cross_std + kt_nq)[:, None]
        mu, var = linalg.posterior(st, B, Kqq_diag=(qq_std + kt_qq)[None])
        mu = mu[0] + mean_q_std
        var = jnp.maximum(var[0], 1e-30)
        if original_scale:
            return mu * out_std + out_mean, var * out_std ** 2
        return mu, var

    return jax.vmap(one)(Xq)


def scamlgp_acq_state(model: ScaMLGP, source_cfg: gp.GPConfig,
                      target_cfg: gp.GPConfig,
                      pruning_threshold: float = DEFAULT_PRUNING_THRESHOLD,
                      params: Optional[TargetParams] = None) -> AcqState:
    """Cached acquisition state for a fitted model (build once per refit;
    pass ``params`` to override, e.g. per HMC posterior draw)."""
    p = model.params if params is None else params
    return acq_state_from_parts(
        model.source, source_cfg, target_cfg, p, model.train_X,
        model.train_y, model.train_mask, model.out_mean, model.out_std,
        pruning_threshold)


def scamlgp_posterior_diag_cached(model: ScaMLGP, source_cfg: gp.GPConfig,
                                  target_cfg: gp.GPConfig, state: AcqState,
                                  Xq, original_scale: bool = True):
    """Marginal (mean, var) at ``Xq`` via the cached state — same result as
    ``scamlgp_posterior_diag`` at O(n)-per-candidate cost."""
    return posterior_diag_from_state(model.source, source_cfg, target_cfg,
                                     state, model.train_X, Xq,
                                     original_scale=original_scale)


def scamlgp_posterior_diag(model: ScaMLGP, source_cfg: gp.GPConfig,
                           target_cfg: gp.GPConfig, Xq,
                           pruning_threshold: float = DEFAULT_PRUNING_THRESHOLD,
                           original_scale: bool = True):
    """Marginal mean/variance per query point (acquisition hot path).

    Evaluates the joint-conditioning posterior one candidate at a time under
    ``vmap`` — each candidate sees the exact (n+1)-point joint model.
    """

    def one(x):
        mean, cov = scamlgp_posterior(
            model, source_cfg, target_cfg, x[None, :],
            pruning_threshold=pruning_threshold,
            original_scale=original_scale)
        return mean[0], jnp.maximum(cov[0, 0], 1e-30)

    return jax.vmap(one)(Xq)


def meta_fit_scamlgp(meta_xs, meta_ys, key=None,
                     cfg: Optional[gp.GPConfig] = None,
                     num_restarts_log_likelihood: int = 5,
                     num_steps: int = 60,
                     dtype=None) -> Tuple[SourceStack, gp.GPConfig]:
    """Train the source GP stack on meta-data (reference
    ``meta_fit_scamlgp``, ``model.py:138-189``).

    Args:
        meta_xs / meta_ys: per-task lists of (N_i, d) inputs in the unit cube
            and (N_i,) or (N_i, 1) observations.
        key: PRNG key for restart sampling (reference ``seed`` —
            ``model.py:163-164``).
    Returns:
        (fitted SourceStack, the GPConfig used).
    """
    validate_meta_data(meta_xs, meta_ys)
    cfg = cfg or gp.source_gp_config()
    key = key if key is not None else jax.random.PRNGKey(0)
    data = pack_task_data(meta_xs, meta_ys, dtype=dtype)
    stack = meta_fit_task_stack(data, cfg, key,
                                num_restarts=num_restarts_log_likelihood,
                                num_steps=num_steps)
    return stack, cfg
