"""Fully on-device vectorized BO campaigns: studies as a batch axis.

The reference runs each study seed in its own OS process
(``/root/reference/scamlgp/benchmarking/local_runner.py:174-181``, up to 64
CPU workers).  Here an entire campaign — meta-fit, target refits, acquisition
maximization, benchmark evaluation, noise — is ONE jitted program with the
study axis vmapped (and shardable over the ``study`` mesh axis): 128 studies
advance in lock-step on a single chip.

Scope: synthetic jax-evaluable benchmarks (Branin / Hartmann / Quadratic).
Tabular benchmarks keep the host loop (their lookups are host-side data).

Fidelity vs the sequential driver (``bo/optimizer.py``): target refits use
the SAME vmapped L-BFGS MAP fit (warm start + prior-sampled restarts, best
final objective wins — ``models/fit.py::fit_map_restarts``, the native
equivalent of ``/root/reference/scamlgp/utils.py:139-212``), and the
acquisition ascent uses the same sigmoid-reparametrized Adam scheme.
Parity is pinned by ``tests/test_parallel.py::test_campaign_refit_matches_
sequential_driver``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from scamlgp_tpu.models import gp
from scamlgp_tpu.models import scamlgp as m
from scamlgp_tpu.ops import linalg


#: host-loop execution pinning cadence: fetch one scalar every this many
#: iterations.  On the axon tunnel, blocked-but-unfetched chains are
#: deferred (deep queues pile up at large S) and a degraded tunnel can
#: turn one deferred fetch into a minutes-long stall.  Measured on a
#: healthy tunnel (docs/STALL_PROBE_r5.json): pinning EVERY iteration at
#: S=128 costs nothing (2.82 s/iter vs 3.02 deferred), so the default of
#: 8 keeps the queue shallow purely to bound the damage when the tunnel
#: degrades (override via SCAMLGP_PIN_EVERY).
import os as _os_mod

_PIN_EVERY = int(_os_mod.environ.get("SCAMLGP_PIN_EVERY", "8"))

#: per-iteration wall clock (seconds) of the most recent host-loop campaign,
#: including any pin sync that iteration paid.  Appended by both the chunked
#: and unchunked loops; cleared at the start of each ``run_campaign`` call.
#: Costs one ``perf_counter`` pair per iteration — kept always-on so stall
#: diagnostics (``scripts/bench_stall_probe.py``) see real campaigns.
ITER_TIMES: list = []


@dataclasses.dataclass(frozen=True)
class CampaignConfig:
    n_evaluations: int = 40
    noise_std: float = 1.0
    ucb_beta: float = 9.0                  # utils.py:215-224
    fit_method: str = "map"                # "map" | "hmc" | "nuts" | "vi"
    fit_steps: int = 60                    # L-BFGS iterations per restart
    fit_restarts: int = 5                  # prior-sampled, on top of warm
    acq_raw_samples: int = 256
    acq_topk: int = 4
    acq_steps: int = 30
    acq_lr: float = 0.05
    mll_method: str = "chol"               # "chol" | "sweep" (Pallas
    #                                        inverse kernels + analytic VJP
    #                                        for every fit objective)
    pruning_threshold: float = 1e-3        # model.py:226
    # fit_method in {"hmc", "nuts"}: full hyperparameter posterior per
    # refit; the acquisition marginalizes over `mixture_samples` draws
    hmc_chains: int = 2
    hmc_warmup: int = 64
    hmc_samples: int = 16
    hmc_leapfrog: int = 12                 # hmc only
    hmc_max_depth: int = 6                 # nuts only
    mixture_samples: int = 8
    # fit_method == "vi": mean-field ADVI (models/vi.py) — draws for the
    # acquisition mixture come from the fitted q, `mixture_samples` of them
    vi_steps: int = 200
    vi_mc: int = 8
    vi_lr: float = 0.05


class CampaignResult(NamedTuple):
    X: jnp.ndarray       # (S, E, d) proposed unit-cube configs
    y: jnp.ndarray       # (S, E) noisy observed losses
    y_clean: jnp.ndarray  # (S, E) noise-free losses


def _study_posterior_diag(stack, source_cfg, target_cfg, params, Xbuf, ybuf,
                          mask, out_mean, out_std, Xq, pruning_threshold):
    """Marginal posterior at candidates Xq (B, d) for ONE study, via the
    joint-conditioning path (eval mode, pruned weights)."""
    w = m.weights_forward(params.raw_weights)
    prune = m.significant_weights_mask(
        w, stack.data.std, pruning_threshold).astype(Xq.dtype)
    w_eff = w * prune
    c = gp.constrain(target_cfg, params.gp)

    def one(x):
        P = jnp.concatenate([Xbuf, x[None]], axis=0)
        means, covs = m.source_predict(stack, source_cfg, P, full_cov=True)
        mean_p = jnp.einsum("mq,m->q", means, w_eff)
        cov_p = jnp.einsum("mqp,m->qp", covs, w_eff ** 2)
        mean_std = (mean_p - out_mean) / out_std
        cov_std = cov_p / out_std ** 2
        Kt = gp.gram(target_cfg, c, P)
        cov_full = cov_std + Kt
        n = Xbuf.shape[0]
        y_std = (ybuf - out_mean) / out_std * mask
        resid = y_std - mean_std[:n] * mask
        st = linalg.cholesky_factor(cov_full[:n, :n], c.noise, resid, mask)
        mu, covq = linalg.posterior(st, cov_full[:n, n:],
                                    Kqq=cov_full[n:, n:])
        mu = mu[0] + mean_std[n]
        var = jnp.maximum(covq[0, 0], 1e-30)
        return mu * out_std + out_mean, var * out_std ** 2

    return jax.vmap(one)(Xq)


def _study_acq_state(stack, source_cfg, target_cfg, params, Xbuf, ybuf, mask,
                     out_mean, out_std, pruning_threshold):
    """Candidate-independent acquisition cache for ONE study — see
    ``models.scamlgp.acq_state_from_parts``."""
    return m.acq_state_from_parts(stack, source_cfg, target_cfg, params,
                                  Xbuf, ybuf, mask, out_mean, out_std,
                                  pruning_threshold)


def _study_posterior_diag_fast(stack, source_cfg, target_cfg, acq_state,
                               Xbuf, Xq):
    """Marginal posterior at candidates via the cached acquisition state —
    numerically identical to ``_study_posterior_diag`` (pinned by
    ``tests/test_parallel.py::test_fast_acq_state_matches_joint``)."""
    return m.posterior_diag_from_state(stack, source_cfg, target_cfg,
                                       acq_state, Xbuf, Xq)


def _fit_target(stack, source_cfg, target_cfg, params_warm, Xbuf, ybuf, mask,
                out_mean, out_std, key, cfg: CampaignConfig):
    """Warm + prior-restart L-BFGS MAP fit for ONE study (training-mode
    cached moments, like reference hot loop 4).  The SAME vmapped fitter as
    the sequential driver's refit (``models/scamlgp.py::fit_scamlgp`` →
    ``models/fit.py::fit_map_restarts``), so the campaign matches the
    reference contract ``/root/reference/scamlgp/utils.py:139-212``."""
    from scamlgp_tpu.models import fit as fit_lib

    means, covs = m.source_predict(stack, source_cfg, Xbuf, full_cov=True)
    y_std = (ybuf - out_mean) / out_std * mask

    def objective(p):
        w = m.weights_forward(p.raw_weights)
        mean_p = (jnp.einsum("mq,m->q", means, w) - out_mean) / out_std
        cov_p = jnp.einsum("mqp,m->qp", covs, w ** 2) / out_std ** 2
        extra = jnp.sum(m.WEIGHTS_PRIOR.log_prob(w))
        return gp.map_objective(target_cfg, p.gp, Xbuf, y_std, mask=mask,
                                prior_mean=mean_p, prior_cov=cov_p,
                                extra_log_prior=extra,
                                method=cfg.mll_method)

    M = stack.num_tasks
    d = Xbuf.shape[-1]
    keys = jax.random.split(key, cfg.fit_restarts)
    sampled = jax.vmap(lambda k: m.sample_target_params(
        target_cfg, k, M, d, Xbuf.dtype))(keys)
    stack0 = fit_lib.stack_restarts(params_warm, sampled)
    return fit_lib.fit_map_restarts(objective, stack0,
                                    num_steps=cfg.fit_steps).params


def _sample_target_hmc(stack, source_cfg, target_cfg, Xbuf, ybuf, mask,
                       out_mean, out_std, key, cfg: CampaignConfig):
    """Posterior draws of the target parameters for ONE study via vmapped
    HMC or NUTS chains (``cfg.fit_method``) over the same training-mode
    objective as ``_fit_target`` (the campaign equivalent of
    ``ScaMLGPBO(fit_method='hmc'|'nuts')``).

    Returns a TargetParams pytree with leading ``mixture_samples`` axis
    (chains folded in, evenly thinned)."""
    from scamlgp_tpu.models.hmc import hmc, nuts

    means, covs = m.source_predict(stack, source_cfg, Xbuf, full_cov=True)
    y_std = (ybuf - out_mean) / out_std * mask

    def objective(p):
        w = m.weights_forward(p.raw_weights)
        mean_p = (jnp.einsum("mq,m->q", means, w) - out_mean) / out_std
        cov_p = jnp.einsum("mqp,m->qp", covs, w ** 2) / out_std ** 2
        extra = jnp.sum(m.WEIGHTS_PRIOR.log_prob(w))
        return gp.map_objective(target_cfg, p.gp, Xbuf, y_std, mask=mask,
                                prior_mean=mean_p, prior_cov=cov_p,
                                extra_log_prior=extra,
                                method=cfg.mll_method)

    M = stack.num_tasks
    d = Xbuf.shape[-1]
    dtype = Xbuf.dtype
    keys = jax.random.split(key, cfg.hmc_chains)

    def one_chain(k):
        k_init, k_run = jax.random.split(k)
        init = m.sample_target_params(target_cfg, k_init, M, d, dtype)
        if cfg.fit_method == "nuts":
            samples, _ = nuts(lambda p: -objective(p), init, k_run,
                              num_warmup=cfg.hmc_warmup,
                              num_samples=cfg.hmc_samples,
                              max_depth=cfg.hmc_max_depth)
        else:
            samples, _ = hmc(lambda p: -objective(p), init, k_run,
                             num_warmup=cfg.hmc_warmup,
                             num_samples=cfg.hmc_samples,
                             num_leapfrog=cfg.hmc_leapfrog)
        return samples

    samples = jax.vmap(one_chain)(keys)     # leading (chains, samples)
    K = cfg.hmc_chains * cfg.hmc_samples
    take = min(cfg.mixture_samples, K)
    # interleave chains (sample-major) and anchor the thinning at the tail,
    # so small mixture_samples favor well-mixed late draws across all chains
    # (mixture_samples=1 -> the final draw, not chain 0's first).
    idx = jnp.asarray(sorted(
        K - 1 - int(round(i * (K - 1) / max(take - 1, 1)))
        for i in range(take)))
    flat = jax.tree_util.tree_map(
        lambda l: jnp.reshape(jnp.swapaxes(l, 0, 1),
                              (K,) + l.shape[2:])[idx], samples)
    return flat


def _sample_target_vi(stack, source_cfg, target_cfg, params_warm, Xbuf, ybuf,
                      mask, out_mean, out_std, key, cfg: CampaignConfig):
    """Posterior draws of the target parameters for ONE study via mean-field
    ADVI (``models/vi.py``) over the same training-mode objective as
    ``_fit_target`` — the campaign equivalent of
    ``ScaMLGPBO(fit_method='vi')``.  Returns a TargetParams pytree with
    leading ``mixture_samples`` axis."""
    from scamlgp_tpu.models import vi as vi_lib

    means, covs = m.source_predict(stack, source_cfg, Xbuf, full_cov=True)
    y_std = (ybuf - out_mean) / out_std * mask

    def log_prob(p):
        w = m.weights_forward(p.raw_weights)
        mean_p = (jnp.einsum("mq,m->q", means, w) - out_mean) / out_std
        cov_p = jnp.einsum("mqp,m->qp", covs, w ** 2) / out_std ** 2
        extra = jnp.sum(m.WEIGHTS_PRIOR.log_prob(w))
        return -gp.map_objective(target_cfg, p.gp, Xbuf, y_std, mask=mask,
                                 prior_mean=mean_p, prior_cov=cov_p,
                                 extra_log_prior=extra,
                                 method=cfg.mll_method)

    k_fit, k_draw = jax.random.split(key)
    q, unflatten, _ = vi_lib.advi(log_prob, params_warm, k_fit,
                                  num_steps=cfg.vi_steps, num_mc=cfg.vi_mc,
                                  lr=cfg.vi_lr)
    return vi_lib.sample_q(q, unflatten, k_draw, cfg.mixture_samples)


def _out_transform(stack, ybuf, mask):
    """Global Standardize over concat(meta, target) with the empty-target
    identity rule (model.py:261-276,307-308)."""
    meta_y = stack.data.y * stack.data.std[:, None] + stack.data.mean[:, None]
    all_y = jnp.concatenate([meta_y.reshape(-1), ybuf])
    all_m = jnp.concatenate([stack.data.mask.reshape(-1), mask])
    from scamlgp_tpu.utils.standardize import fit_standardize

    tr = fit_standardize(all_y, all_m, axis=-1)
    n_t = jnp.sum(mask)
    out_mean = jnp.where(n_t > 0, tr.mean, 0.0)
    out_std = jnp.where(n_t > 0, tr.std, 1.0)
    return out_mean, out_std


def _auto_study_chunk(S: int, N: int, backend: str, has_mesh: bool,
                      loop: str) -> int:
    """Default study-chunk size (0 = no chunking).

    The axon TPU backend faults (infra-level UNAVAILABLE kernel fault) on
    single lock-step campaign programs past ~8 studies at N >= 256
    (bisected round 3, commit 5c8a7ba), so large-N campaigns on a single
    chip run as sequential chunks of 8.

    Round 4 additionally chunked any S > 16 to 16 after S=128 campaigns
    stalled at >20 s/iteration; the round-5 probe
    (``docs/STALL_PROBE_r5.json``) showed that stall to be an EPISODIC
    tunnel degradation, not a property of wide study batches — on a
    healthy tunnel S=128 unchunked runs at 2.8 s/iteration (0.022
    s/study/iter) while 8x16-study chunks cost 2x more per study
    (0.045 s/study/iter).  The rule was therefore dropped: wide batches
    run unchunked, damage from a degraded tunnel is bounded by the pin
    cadence + checkpoint/resume instead.
    """
    if backend != "tpu" or has_mesh or loop != "host":
        return 0
    if N >= 256:
        return 8
    return 0


def run_campaign(benchmark_fn: Callable, task_params, meta_data: m.TaskData,
                 key, source_cfg: Optional[gp.GPConfig] = None,
                 target_cfg: Optional[gp.GPConfig] = None,
                 cfg: CampaignConfig = CampaignConfig(),
                 meta_fit_restarts: int = 3, meta_fit_steps: int = 50,
                 meta_fit_chunks: int = 1,
                 loop: str = "host", mesh=None,
                 checkpoint_path=None,
                 checkpoint_every: int = 10,
                 stop_after: Optional[int] = None,
                 study_chunk: Optional[int] = None) -> CampaignResult:
    """Run S studies in lock-step on device.

    Args:
        benchmark_fn: static jax fn ``(x_unit (d,), task_params_pytree) ->
            scalar loss`` (noise-free).
        task_params: pytree with leading study axis S — per-study target-task
            parameters (descriptors/settings/context merged).
        meta_data: TaskData with leading axes (S, M, N) — per-study meta
            observations, already noisy if desired.
        key: master PRNG key.
        loop: "host" (default) jits one vmapped BO iteration and loops on the
            host — E small dispatches, one modest compile.  "device" fuses
            the whole campaign into a single ``fori_loop`` program — zero
            dispatch overhead but a much heavier (slow on some backends)
            compile.
        meta_fit_chunks: split the single (S*M)-task meta-fit dispatch into
            this many equal sequential dispatches (must divide S).  Bounds
            the fit program's device working set at large S*M — e.g. 128
            studies x 32 tasks is 4096 simultaneous GP fits x restarts in
            one program, which can exhaust a single chip; 4 chunks of 1024
            behave identically (same per-task PRNG keys) at ~1/4 the peak.
            Ignored on a mesh (each shard already fits only its slice).
        mesh: optional ``jax.sharding.Mesh`` with a ``"study"`` axis.  The
            study batch is sharded over it (this is the TPU replacement for
            the reference's multi-host process pool,
            ``local_runner.py:174-181``): inputs are placed with
            ``PartitionSpec("study")`` and GSPMD partitions the lock-step
            program with zero collectives — studies are independent, so
            scaling is communication-free by construction.  Use
            ``make_mesh(study=n_devices)``.
        checkpoint_path: host-loop only — persist the campaign state (data
            buffers, fitted params, PRNG keys, iteration counter) every
            ``checkpoint_every`` iterations via ``utils.checkpoint``; if the
            file already exists, the campaign RESUMES from it (pre-emption
            safety the reference's process pool lacks, SURVEY.md section 5).
        stop_after: host-loop only — checkpoint and return after this many
            iterations (pre-emption drill / incremental execution; resume by
            calling again with the same ``checkpoint_path``).
        study_chunk: host-loop, single-device only — run the BO loop over
            sequential study chunks of at most this size instead of one
            S-wide lock-step program.  ``None`` (default) auto-enables
            chunks of 8 on the TPU backend when N >= 256
            (``_auto_study_chunk`` — the axon fault guard, so
            ``configurations/*.py submit`` is safe at every grid point);
            0 disables.  Chunks slice the globally pre-split study keys,
            so results are bit-identical to the unchunked program.
    """
    if cfg.fit_method not in ("map", "hmc", "nuts", "vi"):
        raise ValueError(f"Unknown fit_method {cfg.fit_method!r}")
    ITER_TIMES.clear()
    source_cfg = source_cfg or gp.source_gp_config()
    target_cfg = target_cfg or gp.target_gp_config()

    S, M, N, d = (*meta_data.X.shape[:3], meta_data.X.shape[-1])
    dtype = meta_data.X.dtype
    E = cfg.n_evaluations

    study_sh = None
    S_real = S
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        study_sh = NamedSharding(mesh, P("study"))

        # device_put requires the sharded dim divisible by the mesh axis;
        # pad the study batch by repeating study 0, slice results back below.
        n_study = mesh.shape["study"]
        pad = (-S) % n_study
        if pad:
            def _pad(l):
                return jnp.concatenate(
                    [l, jnp.broadcast_to(l[:1], (pad,) + l.shape[1:])])

            meta_data = jax.tree_util.tree_map(_pad, meta_data)
            task_params = jax.tree_util.tree_map(_pad, task_params)
            S = S + pad

        def shard_studies(tree):
            return jax.tree_util.tree_map(
                lambda l: jax.device_put(l, study_sh), tree)
    else:
        def shard_studies(tree):
            return tree

    # ---- checkpoint restore (host loop) -----------------------------------
    # Restored BEFORE the meta-fit: the checkpoint carries task_params and
    # meta_data because target tasks are intentionally unseeded (reference
    # base.py:128) — a fresh process would otherwise resume the campaign
    # against DIFFERENT target functions.
    start = 0
    _resume = None
    if checkpoint_path is not None and loop == "host":
        import os

        from scamlgp_tpu.utils import checkpoint as ckpt

        if os.path.exists(str(checkpoint_path) + ".npz"):
            params_tpl = jax.vmap(
                lambda _: m.init_target_params(target_cfg, M, d, dtype))(
                    jnp.arange(S))
            tpl = (task_params, meta_data,
                   jnp.zeros((S, E, d), dtype), jnp.zeros((S, E), dtype),
                   jnp.zeros((S, E), dtype), jnp.zeros((S, E), dtype),
                   params_tpl, jax.random.split(key, S),
                   jnp.zeros((), jnp.int32))
            (task_params, meta_data, Xb0, yb0, yc0, mk0, p0, sk0,
             cnt) = ckpt.load_pytree_like(checkpoint_path, tpl)
            _resume = (Xb0, yb0, yc0, mk0, p0, sk0)
            start = int(cnt)
            _resume_done = jnp.sum(mk0, axis=1)

    # ---- meta-fit: fold (study, task) into one big task axis, fit once ----
    from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

    with GLOBAL_TIMER("campaign_stage_inputs"):
        flat = m.TaskData(*[jnp.reshape(l, (S * M,) + l.shape[2:])
                            for l in meta_data])
        flat = shard_studies(flat)  # flat task axis rides the study mesh axis
        jax.block_until_ready(flat)
    key, k_meta = jax.random.split(key)

    with GLOBAL_TIMER("campaign_meta_fit"):
        if study_sh is None:
            if meta_fit_chunks > 1:
                # identical per-task keys to the single-dispatch program:
                # pre-split once, slice per chunk
                T = S * M
                if S % meta_fit_chunks:
                    raise ValueError(f"meta_fit_chunks={meta_fit_chunks} "
                                     f"does not divide S={S}")
                csz = T // meta_fit_chunks
                all_keys = jax.random.split(k_meta, T)
                parts = []
                for c in range(meta_fit_chunks):
                    sl = slice(c * csz, (c + 1) * csz)
                    part = m.meta_fit_task_stack(
                        m.TaskData(*[l[sl] for l in flat]), source_cfg,
                        None, num_restarts=meta_fit_restarts,
                        num_steps=meta_fit_steps, task_keys=all_keys[sl],
                        mll_method=cfg.mll_method)
                    # serialize: keep only one chunk's fit program resident.
                    # NOTE a host VALUE fetch, not block_until_ready — on the
                    # axon tunnel only value fetches force execution, and a
                    # deep chain of deferred chunk fits is exactly the
                    # degraded-tunnel stall shape (docs/VALIDATION.md, axon
                    # stall section)
                    _ = float(part.alpha.ravel()[0])
                    parts.append(part)
                flat_stack = jax.tree_util.tree_map(
                    lambda *ls: jnp.concatenate(ls, axis=0), *parts)
            else:
                flat_stack = m.meta_fit_task_stack(
                    flat, source_cfg, k_meta, num_restarts=meta_fit_restarts,
                    num_steps=meta_fit_steps, mll_method=cfg.mll_method)
        else:
            # explicit SPMD: each mesh slot fits ITS flat-task slice locally
            # (shard_map takes partitioning discretion away from GSPMD —
            # studies/tasks are independent, so the right program has zero
            # collectives; measured numbers live in docs/MULTIHOST_BENCH.json)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            task_keys = jax.random.split(k_meta, S * M)

            def _fit_shard(X, y, mask, mean, std, keys):
                local = m.TaskData(X=X, y=y, mask=mask, mean=mean, std=std)
                st = m.meta_fit_task_stack(
                    local, source_cfg, None,
                    num_restarts=meta_fit_restarts,
                    num_steps=meta_fit_steps, task_keys=keys,
                    mll_method=cfg.mll_method)

                # return the stack already (S_local, M, ...)-shaped, so it
                # comes out study-sharded with no eager cross-process
                # reshapes / re-placements after the fit
                def r(l):
                    return jnp.reshape(l, (l.shape[0] // M, M) + l.shape[1:])

                return (jax.tree_util.tree_map(r, st.data),
                        jax.tree_util.tree_map(r, st.params),
                        r(st.chol), r(st.alpha))

            spec = P("study")
            fit_data, fit_params, fit_chol, fit_alpha = jax.jit(shard_map(
                _fit_shard, mesh=mesh,
                in_specs=(spec,) * 6, out_specs=(spec, spec, spec, spec),
                check_vma=False,
            ))(flat.X, flat.y, flat.mask, flat.mean, flat.std, task_keys)
        if study_sh is None:
            stacks = m.SourceStack(
                data=m.TaskData(*[jnp.reshape(l, (S, M) + l.shape[1:])
                                  for l in flat_stack.data]),
                params=jax.tree_util.tree_map(
                    lambda l: jnp.reshape(l, (S, M) + l.shape[1:]),
                    flat_stack.params),
                chol=jnp.reshape(flat_stack.chol, (S, M, N, N)),
                alpha=jnp.reshape(flat_stack.alpha, (S, M, N)),
            )
        else:
            stacks = m.SourceStack(data=fit_data, params=fit_params,
                                   chol=fit_chol, alpha=fit_alpha)
        jax.block_until_ready(stacks)
    task_params = shard_studies(task_params)

    # ---- BO loop ----------------------------------------------------------
    def study_iteration(stack, tparams, Xbuf, ybuf, yclean, mask, params, k,
                        i):
        out_mean, out_std = _out_transform(stack, ybuf, mask)
        k_fit, k_acq, k_noise = jax.random.split(k, 3)

        # refit (skipped content-wise at i=0: no data -> prior-only fit is
        # still harmless and keeps the graph static)
        warm = m.TargetParams(
            raw_weights=m.weights_inverse(jnp.full((M,), 1.0 / M, dtype)),
            gp=params.gp)

        def make_state(p):
            return _study_acq_state(
                stack, source_cfg, target_cfg, p, Xbuf, ybuf, mask,
                out_mean, out_std, cfg.pruning_threshold)

        def ucb_from_state(state, x):
            mu, var = _study_posterior_diag_fast(
                stack, source_cfg, target_cfg, state, Xbuf, x[None])
            return (-mu[0] + jnp.sqrt(cfg.ucb_beta)
                    * jnp.sqrt(jnp.maximum(var[0], 1e-30)))

        if cfg.fit_method in ("hmc", "nuts", "vi"):
            if cfg.fit_method == "vi":
                hyper_samples = _sample_target_vi(
                    stack, source_cfg, target_cfg, warm, Xbuf, ybuf, mask,
                    out_mean, out_std, k_fit, cfg)
            else:
                hyper_samples = _sample_target_hmc(
                    stack, source_cfg, target_cfg, Xbuf, ybuf, mask,
                    out_mean, out_std, k_fit, cfg)
            # carry the last draw as next iteration's (unused-by-hmc) state
            params = jax.tree_util.tree_map(lambda l: l[-1], hyper_samples)
            states = jax.vmap(make_state)(hyper_samples)

            def acq(x):
                # moment-match the posterior mixture first, then UCB once —
                # identical to the sequential driver's _acq_value_hmc
                # (bo/optimizer.py): mean = E[mu],
                # var = E[var + mu^2] - mean^2 keeps the between-sample
                # variance of the means that E[UCB] would drop.
                def one(st):
                    mu, var = _study_posterior_diag_fast(
                        stack, source_cfg, target_cfg, st, Xbuf, x[None])
                    return mu[0], var[0]

                mus, vars_ = jax.vmap(one)(states)
                mean = jnp.mean(mus)
                var = jnp.mean(vars_ + mus ** 2) - mean ** 2
                return (-mean + jnp.sqrt(cfg.ucb_beta)
                        * jnp.sqrt(jnp.maximum(var, 1e-30)))
        else:
            params = _fit_target(stack, source_cfg, target_cfg, warm, Xbuf,
                                 ybuf, mask, out_mean, out_std, k_fit, cfg)
            state = make_state(params)

            def acq(x):
                return ucb_from_state(state, x)

        # acquisition: UCB(beta, minimize) over the unit cube
        raw = jax.random.uniform(k_acq, (cfg.acq_raw_samples, d), dtype)

        chunk = min(64, cfg.acq_raw_samples)
        raw_vals = jax.lax.map(
            jax.vmap(acq),
            raw.reshape(cfg.acq_raw_samples // chunk, chunk, d)).reshape(-1)
        top = jax.lax.top_k(jnp.where(jnp.isfinite(raw_vals), raw_vals,
                                      -jnp.inf), cfg.acq_topk)[1]
        starts = raw[top]

        import optax

        opt = optax.adam(cfg.acq_lr)

        def logit(u):
            u = jnp.clip(u, 1e-6, 1 - 1e-6)
            return jnp.log(u) - jnp.log1p(-u)

        def ascend(x0):
            z0 = logit(x0)

            def neg(z):
                return -acq(jax.nn.sigmoid(z))

            def step(carry, _):
                z, s, bz, bv = carry
                v, g = jax.value_and_grad(neg)(z)
                updates, s = opt.update(g, s, z)
                z2 = optax.apply_updates(z, updates)
                better = jnp.isfinite(v) & (v < bv)
                return (z2, s, jnp.where(better, z, bz),
                        jnp.where(better, v, bv)), None

            (zf, _, bz, bv), _ = jax.lax.scan(
                step, (z0, opt.init(z0), z0, jnp.asarray(jnp.inf, dtype)),
                None, length=cfg.acq_steps)
            vf = neg(zf)
            better = jnp.isfinite(vf) & (vf < bv)
            return (jnp.where(better, zf, bz), jnp.where(better, vf, bv))

        zs, negv = jax.vmap(ascend)(starts)
        best = jnp.argmin(jnp.where(jnp.isfinite(negv), negv, jnp.inf))
        x_star = jax.nn.sigmoid(zs[best])

        # evaluate benchmark + homoscedastic noise (cast guards the campaign
        # dtype when x64 is enabled for a chol64 island: benchmark constants
        # default to f64 there and would otherwise poison the f32 buffers)
        y_clean = jnp.asarray(benchmark_fn(x_star, tparams), dtype)
        y_noisy = y_clean + cfg.noise_std * jax.random.normal(k_noise, (),
                                                              dtype)
        Xbuf = jax.lax.dynamic_update_slice(Xbuf, x_star[None], (i, 0))
        ybuf = jax.lax.dynamic_update_slice(ybuf, y_noisy[None], (i,))
        yclean = jax.lax.dynamic_update_slice(yclean, y_clean[None], (i,))
        mask = jax.lax.dynamic_update_slice(mask,
                                            jnp.ones((1,), dtype), (i,))
        return Xbuf, ybuf, yclean, mask, params

    study_keys = shard_studies(jax.random.split(key, S))

    if loop == "device":
        def one_study(stack, tparams, k0):
            Xbuf = jnp.zeros((E, d), dtype)
            ybuf = jnp.zeros((E,), dtype)
            yclean = jnp.zeros((E,), dtype)
            mask = jnp.zeros((E,), dtype)
            params = m.init_target_params(target_cfg, M, d, dtype)

            def body(i, carry):
                Xbuf, ybuf, yclean, mask, params, k = carry
                k, ki = jax.random.split(k)
                Xbuf, ybuf, yclean, mask, params = study_iteration(
                    stack, tparams, Xbuf, ybuf, yclean, mask, params, ki, i)
                return (Xbuf, ybuf, yclean, mask, params, k)

            Xbuf, ybuf, yclean, mask, params, _ = jax.lax.fori_loop(
                0, E, body, (Xbuf, ybuf, yclean, mask, params, k0))
            return Xbuf, ybuf, yclean

        campaign_fn = jax.vmap(one_study)
        if study_sh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            spec = P("study")
            campaign_fn = shard_map(campaign_fn, mesh=mesh,
                                    in_specs=(spec, spec, spec),
                                    out_specs=(spec, spec, spec),
                                    check_vma=False)
        with GLOBAL_TIMER("campaign_bo_loop"):
            X, y, y_clean = campaign_fn(stacks, task_params, study_keys)
            jax.block_until_ready(y_clean)
        return CampaignResult(X=X[:S_real], y=y[:S_real],
                              y_clean=y_clean[:S_real])

    # host loop: one jitted vmapped iteration, reused for all E steps
    # (i is traced, so a single compile serves every iteration).  The
    # per-study PRNG-key advance lives INSIDE the jitted step, and on a mesh
    # the whole step runs under shard_map over the study axis: studies are
    # independent, so the correct SPMD program has ZERO collectives —
    # inferred GSPMD partitioning was measured inserting cross-process work
    # (shard_map removes it; measured efficiency: docs/MULTIHOST_BENCH.json).
    def iteration_body(stacks, task_params, Xbuf, ybuf, yclean, mask,
                       params, keys, i):
        new_keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
        iter_keys = jax.vmap(lambda k: jax.random.split(k)[1])(new_keys)
        out = jax.vmap(
            lambda st, tp, xb, yb, yc, mk, pr, k: study_iteration(
                st, tp, xb, yb, yc, mk, pr, k, i)
        )(stacks, task_params, Xbuf, ybuf, yclean, mask, params, iter_keys)
        return out + (new_keys,)

    if study_sh is None:
        iteration = jax.jit(iteration_body)
    else:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        spec = P("study")
        iteration = jax.jit(shard_map(
            iteration_body, mesh=mesh,
            in_specs=(spec,) * 8 + (P(),),
            out_specs=(spec,) * 6, check_vma=False))

    if _resume is not None:
        Xbuf, ybuf, yclean, mask, params, study_keys = [
            shard_studies(l) for l in _resume]
    else:
        Xbuf = shard_studies(jnp.zeros((S, E, d), dtype))
        ybuf = shard_studies(jnp.zeros((S, E), dtype))
        yclean = shard_studies(jnp.zeros((S, E), dtype))
        mask = shard_studies(jnp.zeros((S, E), dtype))
        params = shard_studies(jax.vmap(
            lambda _: m.init_target_params(target_cfg, M, d, dtype))(
                jnp.arange(S)))

    if checkpoint_path is not None:
        from scamlgp_tpu.utils import checkpoint as ckpt

        if _resume is None:
            # initial checkpoint BEFORE the loop: the unseeded target tasks
            # and meta-data are pinned on disk immediately, so pre-emption
            # inside the first checkpoint_every window cannot leave stale
            # side artifacts (e.g. per-study optima) referring to task draws
            # a rerun would no longer see.
            ckpt.save_pytree(
                checkpoint_path,
                (task_params, meta_data, Xbuf, ybuf, yclean, mask, params,
                 study_keys, jnp.asarray(0, jnp.int32)))

    if study_chunk is None:
        study_chunk = _auto_study_chunk(S, N, jax.default_backend(),
                                        study_sh is not None, loop)
    chunked = bool(study_chunk) and study_chunk < S and study_sh is None

    import os as _os
    _iter_debug = _os.environ.get("SCAMLGP_ITER_DEBUG") == "1"

    if chunked:
        # Sequential fixed-size study chunks (axon fault guard, see
        # _auto_study_chunk).  The jitted iteration, the study keys and all
        # buffers are simply sliced per chunk — identical math, smaller
        # programs.  Checkpoints store the FULL buffers; per-chunk progress
        # is derived from the MASK (iterations completed = ones per study,
        # lock-step within a chunk), which is valid regardless of whether
        # the checkpoint was written chunked or unchunked.
        if stop_after is not None:
            raise ValueError("stop_after is not supported with "
                             "study chunking")
        n_chunks = -(-S // study_chunk)
        logging.getLogger("scamlgp_tpu").warning(
            "run_campaign: study-chunking %d studies into %d sequential "
            "chunks of <= %d (backend=%s, N=%d)",
            S, n_chunks, study_chunk, jax.default_backend(), N)
        import numpy as _np

        done_per_study = _np.asarray(jnp.sum(mask, axis=1), _np.int64)
        for c in range(n_chunks):
            c0, c1 = c * study_chunk, min((c + 1) * study_chunk, S)

            def sl(tree):
                return jax.tree_util.tree_map(lambda l: l[c0:c1], tree)

            d_c = done_per_study[c0:c1]
            if int(d_c.max()) != int(d_c.min()):
                # mixed progress inside one chunk means the checkpoint was
                # written with different chunk boundaries: completed studies
                # would silently re-run from i0=0 against their full mask
                # (fits seeing future observations).  Mirror the unchunked
                # path's guard.
                raise ValueError(
                    "checkpoint has per-study progress at different "
                    f"iterations within study chunk [{c0}, {c1}) "
                    f"(min {int(d_c.min())}, max {int(d_c.max())}); it was "
                    "written with a different study_chunk — resume with the "
                    "same study_chunk setting as the run that wrote it")
            i0 = int(d_c.min())
            if i0 >= E:
                continue
            st_c, tp_c, pr = sl(stacks), sl(task_params), sl(params)
            Xb, yb, yc, mk = (Xbuf[c0:c1], ybuf[c0:c1], yclean[c0:c1],
                              mask[c0:c1])
            ks = study_keys[c0:c1]
            for i in range(i0, E):
                with GLOBAL_TIMER("campaign_iteration"):
                    _it0 = __import__("time").perf_counter()
                    Xb, yb, yc, mk, pr, ks = iteration(
                        st_c, tp_c, Xb, yb, yc, mk, pr, ks, i)
                    # periodic host VALUE fetch, not block_until_ready:
                    # the axon runtime defers blocked-but-unfetched chains
                    # (letting all E iterations pile up stalled S=128
                    # campaigns), but each fetch costs a ~25 s tunnel sync
                    # regardless of queued work — so pin every few
                    # iterations, not every one (bisected r4)
                    if (i + 1) % _PIN_EVERY == 0 or i + 1 == E:
                        _ = float(yb[0, i])
                    ITER_TIMES.append(
                        __import__("time").perf_counter() - _it0)
                if (checkpoint_path is not None and i + 1 < E
                        and (i + 1) % checkpoint_every == 0):
                    # mid-chunk save: write the chunk's partial progress back
                    # into the full buffers and persist — the mask-derived
                    # resume (i0 = per-chunk min of completed iterations)
                    # already handles checkpoints taken here, so a
                    # pre-emption loses at most checkpoint_every iterations
                    # instead of a whole chunk.
                    Xbuf = Xbuf.at[c0:c1].set(Xb)
                    ybuf = ybuf.at[c0:c1].set(yb)
                    yclean = yclean.at[c0:c1].set(yc)
                    mask = mask.at[c0:c1].set(mk)
                    params = jax.tree_util.tree_map(
                        lambda full, part: full.at[c0:c1].set(part),
                        params, pr)
                    study_keys = study_keys.at[c0:c1].set(ks)
                    ckpt.save_pytree(
                        checkpoint_path,
                        (task_params, meta_data, Xbuf, ybuf, yclean, mask,
                         params, study_keys,
                         jnp.asarray(int(jnp.sum(mask, axis=1).min()),
                                     jnp.int32)))
            Xbuf = Xbuf.at[c0:c1].set(Xb)
            ybuf = ybuf.at[c0:c1].set(yb)
            yclean = yclean.at[c0:c1].set(yc)
            mask = mask.at[c0:c1].set(mk)
            params = jax.tree_util.tree_map(
                lambda full, part: full.at[c0:c1].set(part), params, pr)
            study_keys = study_keys.at[c0:c1].set(ks)
            if checkpoint_path is not None:
                # counter = min completed iterations across all studies
                # (informational; chunked resume trusts the mask)
                cnt = int(jnp.sum(mask, axis=1).min())
                ckpt.save_pytree(
                    checkpoint_path,
                    (task_params, meta_data, Xbuf, ybuf, yclean, mask,
                     params, study_keys, jnp.asarray(cnt, jnp.int32)))
        GLOBAL_TIMER.log(logging.DEBUG)
        return CampaignResult(X=Xbuf[:S_real], y=ybuf[:S_real],
                              y_clean=yclean[:S_real])

    if _resume is not None:
        # an unchunked continuation assumes every study is at the same
        # iteration; a checkpoint written mid-way by a CHUNKED run is not
        # (later chunks lag) and must resume chunked
        import numpy as _np

        uneven = _np.unique(_np.asarray(_resume_done)).size > 1
        if uneven:
            raise ValueError(
                "checkpoint has per-study progress at different iterations "
                "(written by a study-chunked campaign); resume with the "
                "same study_chunk setting instead of study_chunk=0")
    for i in range(start, E):
        with GLOBAL_TIMER("campaign_iteration"):
            _t0 = __import__("time").perf_counter()
            Xbuf, ybuf, yclean, mask, params, study_keys = iteration(
                stacks, task_params, Xbuf, ybuf, yclean, mask, params,
                study_keys, i)
            if _iter_debug:
                _t1 = __import__("time").perf_counter()
            # periodic host VALUE fetch (see chunked loop: axon defers
            # blocked-but-unfetched chains, but each fetch costs a ~25 s
            # tunnel sync — pin every few iterations)
            if (i + 1) % _PIN_EVERY == 0 or i + 1 == E:
                _ = float(ybuf[0, i])
            if _iter_debug:
                _t2 = __import__("time").perf_counter()
                print(f"iter {i}: dispatch {_t1 - _t0:.3f}s "
                      f"block {_t2 - _t1:.3f}s", flush=True)
            ITER_TIMES.append(__import__("time").perf_counter() - _t0)
        stopping = stop_after is not None and i + 1 >= start + stop_after
        if (checkpoint_path is not None
                and ((i + 1) % checkpoint_every == 0 or i + 1 == E
                     or stopping)):
            ckpt.save_pytree(
                checkpoint_path,
                (task_params, meta_data, Xbuf, ybuf, yclean, mask, params,
                 study_keys, jnp.asarray(i + 1, jnp.int32)))
        if stopping:
            break
    GLOBAL_TIMER.log(logging.DEBUG)
    return CampaignResult(X=Xbuf[:S_real], y=ybuf[:S_real],
                          y_clean=yclean[:S_real])


def simple_regret(y_clean: jnp.ndarray, optimum) -> jnp.ndarray:
    """Running-min simple regret per study (plotting.py:21-53 semantics)."""
    regret = y_clean - jnp.asarray(optimum)[..., None]
    return jax.lax.associative_scan(jnp.minimum, regret, axis=-1)
