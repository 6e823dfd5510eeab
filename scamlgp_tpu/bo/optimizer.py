"""Meta-learning Bayesian-optimization driver (the public API layer).

Native re-host of the reference's ``ScaMLGPBO``
(``/root/reference/scamlgp/optimizer.py:27-185``) plus the relevant surface of
blackboxopt's ``SingleObjectiveBOTorchOptimizer`` base class it inherits
(generate/report loop, pending-evaluation accounting, NaN-objective
filtering, initial random sampling).

Everything numeric happens on device through jitted, bucketed programs:
target-data buffers are padded to power-of-two capacities with masks, so the
BO loop triggers recompilation only at bucket boundaries rather than every
iteration (SURVEY.md section 7.3 "dynamic shapes in the BO loop").
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Hashable, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from scamlgp_tpu.bo import acquisition as acq_lib
from scamlgp_tpu.bo import optimize as acqopt
from scamlgp_tpu.bo.core import (
    Evaluation,
    EvaluationSpecification,
    Objective,
    OptimizerError,
    sort_evaluations,
)
from scamlgp_tpu.bo.space import ParameterSpace, impute_nans_with_constant
from scamlgp_tpu.config import default_dtype
from scamlgp_tpu.models import gp as gp_lib
from scamlgp_tpu.models import scamlgp as model_lib


def metadata_to_numerical(meta_data: Dict[Hashable, Iterable[Evaluation]],
                          search_space: ParameterSpace, objective: Objective):
    """Sorted, unit-cube-encoded, NaN-imputed per-task arrays
    (``/root/reference/scamlgp/utils.py:72-109``).  Y is loss-oriented:
    greater-is-better objectives are negated so everything minimizes."""
    xs, ys, task_ids = [], [], []
    for task_id in sorted(meta_data.keys(), key=str):
        evals = sort_evaluations(meta_data[task_id])
        X = np.stack([
            impute_nans_with_constant(search_space.to_numerical(e.configuration))
            for e in evals])
        y = np.asarray([e.objectives[objective.name] for e in evals],
                       dtype=np.float64)
        if objective.greater_is_better:
            y = -y
        xs.append(X)
        ys.append(y)
        task_ids.append(task_id)
    return task_ids, xs, ys


def _acq_value(static_args, args, x):
    """Acquisition value at a single point (top-level for stable jit cache).
    Uses the cached-predictive state (built once per refit in
    ``generate_evaluation_specification``) — O(n) per candidate instead of a
    fresh (n+1)-system Cholesky."""
    source_cfg, target_cfg, af = static_args
    model, state, best_f = args
    mean, var = model_lib.scamlgp_posterior_diag_cached(
        model, source_cfg, target_cfg, state, x[None, :],
        original_scale=True)
    return af(mean[0], var[0], best_f)


def _acq_value_hmc(static_args, args, x):
    """Acquisition under the hyperparameter-posterior mixture (HMC samples):
    mean = E[mu], var = E[var + mu^2] - mean^2 over sampled TargetParams,
    each sample with its own cached-predictive state."""
    source_cfg, target_cfg, af = static_args
    model, states, best_f = args

    def one(st):
        mean, var = model_lib.scamlgp_posterior_diag_cached(
            model, source_cfg, target_cfg, st, x[None, :],
            original_scale=True)
        return mean[0], var[0]

    means, variances = jax.lax.map(one, states)
    mean = jnp.mean(means)
    var = jnp.mean(variances + means**2) - mean**2
    return af(mean, jnp.maximum(var, 1e-30), best_f)


def _next_capacity(n: int, minimum: int = 8) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


class SingleObjectiveOptimizer:
    """Minimal blackboxopt-compatible base (generate/report surface)."""

    def __init__(self, search_space: ParameterSpace, objective: Objective,
                 seed: Optional[int] = None):
        self.search_space = search_space.copy()
        self.objective = objective
        self.seed = seed
        if seed is not None:
            self.search_space.seed(seed)

    def generate_evaluation_specification(self) -> EvaluationSpecification:
        raise NotImplementedError

    def report(self, evaluations) -> None:
        raise NotImplementedError


class ScaMLGPBO(SingleObjectiveOptimizer):
    def __init__(
        self,
        search_space: ParameterSpace,
        objective: Objective,
        meta_data: Dict[Hashable, Iterable[Evaluation]],
        gp_likelihood=None,
        gp_kernel: Optional[gp_lib.GPConfig] = None,
        base_gp_kernel: Optional[gp_lib.GPConfig] = None,
        acquisition_function_factory: Optional[Callable] = None,
        af_optimizer_kwargs: Optional[dict] = None,
        num_initial_random_samples: int = 0,
        max_pending_evaluations: Optional[int] = 1,
        num_restarts_log_likelihood: int = 5,
        model_kwargs: Optional[Dict[str, Any]] = None,
        logger: Optional[logging.Logger] = None,
        seed: Optional[int] = None,
        dtype=None,
        num_fit_steps: int = 60,
        fit_method: str = "map",
        hmc_kwargs: Optional[Dict[str, Any]] = None,
        vi_kwargs: Optional[Dict[str, Any]] = None,
        capacity_hint: Optional[int] = None,
    ):
        r"""Single-objective meta-learning BO with ScaML-GP as surrogate.

        Mirrors the reference constructor contract
        (``/root/reference/scamlgp/optimizer.py:28-154``): converts meta-data
        to numerical form, meta-fits one source GP per task (here: one batched
        vmapped fit), builds the target model on empty data, and defaults the
        acquisition to UCB(beta=9) for minimization with
        ``num_initial_random_samples=0`` and ``max_pending_evaluations=1``.

        Args:
            search_space: the space to optimize over.
            objective: objective name + direction.
            meta_data: ``{task_id: [Evaluation, ...]}`` source observations.
            gp_kernel: target GP config (reference ``gp_kernel``).
            base_gp_kernel: source GP config (reference ``base_gp_kernel``).
            acquisition_function_factory: callable returning an
                ``AcquisitionFunction`` (defaults to UCB(9), minimize).
            af_optimizer_kwargs: settings for the on-device multi-start
                acquisition ascent (raw_samples, num_restarts, num_steps, lr).
            num_initial_random_samples: size of the random initial design.
            max_pending_evaluations: max parallel proposals (1 = sequential).
            num_restarts_log_likelihood: prior-sampled restarts on top of the
                warm start for every (re)fit.
            seed: master seed; all on-device randomness derives from it.
            dtype: working dtype; defaults to f64 when x64 is enabled.
            fit_method: "map" (reference semantics: multi-restart MAP-II) or
                "hmc" — full hyperparameter posterior via the
                adaptive-trajectory sampler; the acquisition then uses the
                posterior *mixture* predictive (BASELINE.json north star).
            hmc_kwargs: overrides for chains/warmup/samples/leapfrog and the
                number of mixture samples used in the acquisition.
            vi_kwargs: fit_method="vi" overrides — ADVI steps / MC draws per
                ELBO gradient / learning rate / acquisition mixture size
                (``models/vi.py``).
            capacity_hint: expected total number of target observations.
                Buffers are padded to power-of-two capacity buckets and
                every bucket boundary recompiles the fit/acquisition
                programs (measured ~25 s each at tabular scale,
                docs/SEQ_DRIVER_TPU.json).  With a hint, all bucket
                programs up to the hint are compiled ONCE at init (cheap
                dummy executions; persistent-cache friendly) while every
                iteration still runs at its current bucket's size — round
                4's pre-size-to-max approach made each iteration pay for
                the final shape, a measured 70% steady-state slowdown
                (docs/SEQ_DRIVER_TPU_HINT.json).  The study runner passes
                its eval budget automatically.
        """
        super().__init__(search_space, objective, seed)
        self.logger = logger or logging.getLogger("scamlgp_tpu")
        self.dtype = dtype or default_dtype()
        self.num_initial_random = num_initial_random_samples
        self.max_pending_evaluations = max_pending_evaluations
        self.num_restarts_log_likelihood = num_restarts_log_likelihood
        self.num_fit_steps = num_fit_steps
        self.model_kwargs = model_kwargs or {}
        self.af_optimizer_kwargs = dict(af_optimizer_kwargs or {})
        if fit_method not in ("map", "hmc", "nuts", "vi"):
            raise ValueError(f"Unknown fit_method {fit_method!r}")
        self.fit_method = fit_method
        self.hmc_kwargs = {"num_chains": 2, "num_warmup": 100,
                           "num_samples": 64, "num_leapfrog": 8,
                           "max_depth": 6,
                           "mixture_samples": 16, **(hmc_kwargs or {})}
        self.vi_kwargs = {"num_steps": 200, "num_mc": 8, "lr": 0.05,
                          "mixture_samples": 16, **(vi_kwargs or {})}
        self.capacity_hint = capacity_hint
        self._hyper_samples = None
        self._af_factory = acquisition_function_factory
        self._n_features = len(self.search_space)

        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self._pending = 0
        self._num_generated = 0
        self.X: List[np.ndarray] = []       # numeric configs, arrival order
        self.losses: List[float] = []       # NaN = unknown objective

        # --- meta fit (call stack 3.1) ---------------------------------
        self.source_cfg = base_gp_kernel or gp_lib.source_gp_config()
        self.target_cfg = gp_kernel or gp_lib.target_gp_config()
        task_ids, xs, ys = metadata_to_numerical(
            meta_data, self.search_space, objective)
        self.task_ids = task_ids
        key_meta, self._key = jax.random.split(self._key)
        from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

        with GLOBAL_TIMER("meta_fit"):
            self.source_gps, _ = model_lib.meta_fit_scamlgp(
                xs, ys, key=key_meta, cfg=self.source_cfg,
                num_restarts_log_likelihood=num_restarts_log_likelihood,
                num_steps=num_fit_steps, dtype=self.dtype)

        # --- target model on empty data (optimizer.py:135-141) ---------
        self.model = self._build_model(
            np.zeros((0, self._n_features)), np.zeros((0,)), params=None)
        if self.capacity_hint:
            self._precompile_buckets()

    # ------------------------------------------------------------------
    def _build_model(self, X: np.ndarray, y: np.ndarray,
                     params) -> model_lib.ScaMLGP:
        n = X.shape[0]
        cap = _next_capacity(max(n, 1))
        Xp = np.zeros((cap, self._n_features))
        yp = np.zeros((cap,))
        mp = np.zeros((cap,))
        Xp[:n] = X
        yp[:n] = y
        mp[:n] = 1.0
        return model_lib.build_scamlgp(
            self.source_gps, self.source_cfg,
            jnp.asarray(Xp, self.dtype), jnp.asarray(yp, self.dtype),
            jnp.asarray(mp, self.dtype), target_cfg=self.target_cfg,
            params=params, **self.model_kwargs)

    def _precompile_buckets(self):
        """Compile the fit + acquisition programs for every capacity bucket
        up to ``capacity_hint``, so mid-loop bucket boundaries hit warm jit
        caches instead of paying 20-40 s compiles.

        Works by running one throwaway refit + proposal on dummy data at
        each bucket size: the jitted entry points are module-level
        (``models/scamlgp.py``, ``bo/optimize.py``), so these executions
        populate exactly the caches the real loop uses.  Dummy executions
        are a few hundred ms each on-chip; compiles also land in the
        persistent compile cache when one is configured."""
        saved = (self.model, self._hyper_samples, self.X, self.losses)
        caps, cap = [], 8
        top = _next_capacity(max(self.capacity_hint, 1))
        while cap <= top:
            caps.append(cap)
            cap *= 2
        self.logger.info("precompiling %d capacity buckets: %s",
                         len(caps), caps)
        try:
            k = jax.random.PRNGKey(0)
            for cap in caps:
                rng = np.random.default_rng(0)
                X = rng.uniform(size=(cap, self._n_features))
                y = rng.standard_normal(cap)
                self.X = [x for x in X]
                self.losses = [float(v) for v in y]
                self.model = self._build_model(X, y, params=None)
                self._refit(k)
                self._propose(k)
        finally:
            self.model, self._hyper_samples, self.X, self.losses = saved

    def _acquisition(self) -> acq_lib.AcquisitionFunction:
        if self._af_factory is None:
            return acq_lib.UpperConfidenceBound()
        af = self._af_factory
        return af() if isinstance(af, type) else af

    def _propose(self, k_af):
        """Model-based acquisition maximization over the current model
        (call stack 3.2); shared by the BO loop and bucket precompilation."""
        from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

        af = self._acquisition()
        finite = [l for l in self.losses if np.isfinite(l)]
        best_f = jnp.asarray(min(finite) if finite else np.inf, self.dtype)
        if (self.fit_method in ("hmc", "nuts", "vi")
                and self._hyper_samples is not None):
            states = jax.vmap(
                lambda p: model_lib.scamlgp_acq_state(
                    self.model, self.source_cfg, self.target_cfg,
                    params=p))(self._hyper_samples)
            with GLOBAL_TIMER("acquisition"):
                return acqopt.optimize_acqf(
                    _acq_value_hmc,
                    (self.source_cfg, self.target_cfg, af),
                    (self.model, states, best_f),
                    self._n_features, k_af,
                    dtype=self.dtype, **self.af_optimizer_kwargs)
        state = model_lib.scamlgp_acq_state(
            self.model, self.source_cfg, self.target_cfg)
        with GLOBAL_TIMER("acquisition"):
            return acqopt.optimize_acqf(
                _acq_value, (self.source_cfg, self.target_cfg, af),
                (self.model, state, best_f), self._n_features, k_af,
                dtype=self.dtype, **self.af_optimizer_kwargs)

    # ------------------------------------------------------------------
    def generate_evaluation_specification(self) -> EvaluationSpecification:
        """Propose the next configuration (reference call stack 3.2)."""
        if (self.max_pending_evaluations is not None
                and self._pending >= self.max_pending_evaluations):
            raise OptimizerError(
                f"Maximum number of pending evaluations "
                f"({self.max_pending_evaluations}) reached.")

        if len(self.X) < self.num_initial_random or self._n_features == 0:
            config = self.search_space.sample()
            optional_info = {"model_based_pick": False}
        else:
            self._key, k_af = jax.random.split(self._key)
            res = self._propose(k_af)
            vec = impute_nans_with_constant(np.asarray(res.x, np.float64))
            config = self.search_space.from_numerical(vec)
            optional_info = {"model_based_pick": True}

        self._pending += 1
        self._num_generated += 1
        return EvaluationSpecification(configuration=config,
                                       optional_info=optional_info)

    # ------------------------------------------------------------------
    def report(self, evaluations: Union[Evaluation, Iterable[Evaluation]]
               ) -> None:
        """Ingest observations and refit the target model (reference
        ``report`` — ``optimizer.py:156-185``)."""
        _evals = (list(evaluations)
                  if isinstance(evaluations, (list, tuple)) else [evaluations])
        for e in _evals:
            vec = impute_nans_with_constant(
                self.search_space.to_numerical(e.configuration))
            val = e.objectives.get(self.objective.name)
            loss = np.nan if val is None else float(val)
            if self.objective.greater_is_better and np.isfinite(loss):
                loss = -loss
            self.X.append(vec)
            self.losses.append(loss)
            self._pending = max(0, self._pending - 1)

        if len(self.X) < self.num_initial_random:
            return

        # deterministic fit data regardless of report order
        order = sorted(range(len(self.X)),
                       key=lambda i: (self.X[i].tobytes(), self.losses[i]))
        X = np.stack([self.X[i] for i in order]) if self.X else np.zeros(
            (0, self._n_features))
        y = np.asarray([self.losses[i] for i in order])

        # filter unknown objectives (filter_y_nans — optimizer.py:171-174)
        keep = np.isfinite(y)
        if keep.sum() == 0:
            return
        Xf, yf = X[keep], y[keep]

        # warm start: reuse fitted kernel/noise, reset weights to 1/M —
        # the reference rebuilds ScaMLGP reusing likelihood/covar modules,
        # which recreates raw_weights at 1/M (optimizer.py:176-183,
        # model.py:318-321).
        m = self.model.num_tasks
        warm = model_lib.TargetParams(
            raw_weights=model_lib.weights_inverse(
                jnp.full((m,), 1.0 / m, self.dtype)),
            gp=self.model.params.gp)
        self.model = self._build_model(Xf, yf, params=warm)

        self._key, k_fit = jax.random.split(self._key)
        self._refit(k_fit, warm)

    def _refit(self, k_fit, warm=None):
        """Refit the current model in the configured fit mode (call stack
        3.3); shared by ``report`` and bucket precompilation."""
        if self.fit_method == "vi":
            from scamlgp_tpu.models import vi as vi_lib
            from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

            vk = self.vi_kwargs
            with GLOBAL_TIMER("refit"):
                samples, _ = vi_lib.fit_scamlgp_vi(
                    self.model, self.target_cfg, k_fit,
                    num_steps=vk["num_steps"], num_mc=vk["num_mc"],
                    lr=vk["lr"], num_draws=vk["mixture_samples"],
                    init_params=warm)
            # draws are i.i.d. from q — no chain interleave/thinning needed
            self._hyper_samples = samples
            last_params = jax.tree_util.tree_map(
                lambda l: l[-1], self._hyper_samples)
            self.model = self.model._replace(params=last_params)
        elif self.fit_method in ("hmc", "nuts"):
            from scamlgp_tpu.models import hmc as hmc_lib
            from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

            hk = self.hmc_kwargs
            with GLOBAL_TIMER("refit"):
                samples, _ = hmc_lib.sample_scamlgp_hyperparameters(
                    self.model, self.target_cfg, k_fit,
                    num_chains=hk["num_chains"], num_warmup=hk["num_warmup"],
                    num_samples=hk["num_samples"],
                    num_leapfrog=hk["num_leapfrog"],
                    sampler=self.fit_method, max_depth=hk["max_depth"])
            # interleave chains (sample-major) and thin to a fixed mixture
            # size anchored at the tail, so small mixtures favor well-mixed
            # late draws; fixed size keeps the acquisition jit cache stable
            k_mix = hk["mixture_samples"]
            flat = jax.tree_util.tree_map(
                lambda l: jnp.swapaxes(l, 0, 1).reshape(
                    (-1,) + l.shape[2:]), samples)
            total = jax.tree_util.tree_leaves(flat)[0].shape[0]
            take = min(k_mix, total)
            idx = np.asarray(sorted(
                total - 1 - int(round(i * (total - 1) / max(take - 1, 1)))
                for i in range(take)))
            self._hyper_samples = jax.tree_util.tree_map(
                lambda l: l[idx], flat)
            # carry the final draw as warm-start state; predict() uses the
            # full posterior mixture (raw-space sample means are meaningless
            # under the softplus/sigmoid bijections)
            last_params = jax.tree_util.tree_map(
                lambda l: l[-1], self._hyper_samples)
            self.model = self.model._replace(params=last_params)
        else:
            from scamlgp_tpu.utils.profiling import GLOBAL_TIMER

            with GLOBAL_TIMER("refit"):
                self.model = model_lib.fit_scamlgp(
                    self.model, self.target_cfg, k_fit,
                    num_restarts=self.num_restarts_log_likelihood,
                    num_steps=self.num_fit_steps)

    # ------------------------------------------------------------------
    def predict(self, configurations: Iterable[Dict[str, Any]]):
        """Posterior (mean, std) of the loss at the given configurations —
        convenience for analysis; original objective scale.  In hmc/nuts
        mode this is the hyperparameter-posterior *mixture* predictive
        (mean = E[mu], var = E[var + mu^2] - mean^2 over draws)."""
        X = np.stack([
            impute_nans_with_constant(self.search_space.to_numerical(c))
            for c in configurations])
        Xq = jnp.asarray(X, self.dtype)
        if self.fit_method in ("hmc", "nuts", "vi") and self._hyper_samples is not None:
            def one(p):
                mm = self.model._replace(params=p)
                return model_lib.scamlgp_posterior_diag(
                    mm, self.source_cfg, self.target_cfg, Xq)

            means, variances = jax.lax.map(one, self._hyper_samples)
            mean = jnp.mean(means, axis=0)
            var = jnp.maximum(
                jnp.mean(variances + means**2, axis=0) - mean**2, 0.0)
        else:
            mean, var = model_lib.scamlgp_posterior_diag(
                self.model, self.source_cfg, self.target_cfg, Xq)
        mean = np.asarray(mean)
        if self.objective.greater_is_better:
            mean = -mean
        return mean, np.sqrt(np.asarray(var))
