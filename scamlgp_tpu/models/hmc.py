"""HMC / NUTS over GP hyperparameters — chains as a vmap axis.

The reference only does MAP-II (point estimates via L-BFGS restarts).  The
TPU engine adds full hyperparameter posteriors (BASELINE.json north star:
"NUTS/HMC over kernel lengthscales/variances/noise, with chains and
meta-tasks vmapped per chip"): a fixed-trajectory HMC sampler with
dual-averaging step-size adaptation and diagonal mass-matrix estimation, plus
a multinomial-sampling NUTS-style iterative doubling variant — both written
as single-chain pure functions so chains/tasks batch under ``vmap`` and shard
over the mesh.

Everything runs in unconstrained (raw) space; ``log_prob_fn`` is expected to
be the MAP objective's negative (MLL + priors on constrained values), i.e.
the same posterior geometry the reference's restarts explore.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = any  # pytree of raw parameters


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes = [l.shape for l in leaves]
    sizes = [int(jnp.size(l)) for l in leaves]
    flat = jnp.concatenate([jnp.reshape(l, (-1,)) for l in leaves])

    def unflatten(vec):
        out = []
        i = 0
        for shape, size in zip(shapes, sizes):
            out.append(jnp.reshape(vec[i:i + size], shape))
            i += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, unflatten


class HMCState(NamedTuple):
    position: jnp.ndarray      # flat raw params
    log_prob: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray      # diagonal inverse mass
    # dual averaging state
    log_step_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


def _leapfrog(logp_grad: Callable, q, p, grad, eps, inv_mass, num_steps):
    def body(carry, _):
        q, p, grad = carry
        p = p + 0.5 * eps * grad
        q = q + eps * inv_mass * p
        lp, grad = logp_grad(q)
        p = p + 0.5 * eps * grad
        return (q, p, grad), lp

    (q, p, grad), lps = jax.lax.scan(body, (q, p, grad), None,
                                     length=num_steps)
    return q, p, grad, lps[-1]


def hmc(log_prob_fn: Callable, init_params, key, num_warmup: int = 200,
        num_samples: int = 200, num_leapfrog: int = 16,
        target_accept: float = 0.8, init_step_size: float = 0.1
        ) -> Tuple[any, dict]:
    """Single-chain HMC; wrap in ``jax.vmap`` over keys/inits for chains.

    Returns (samples pytree with leading ``num_samples`` axis, info dict with
    acceptance probabilities and final step size).
    """
    q0, unflatten = _flatten(init_params)
    dim = q0.shape[0]
    dtype = q0.dtype

    def logp_flat(q):
        return log_prob_fn(unflatten(q))

    logp_grad = jax.value_and_grad(logp_flat)

    def logp_grad_safe(q):
        lp, g = logp_grad(q)
        lp = jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return lp, g

    lp0, g0 = logp_grad_safe(q0)

    gamma, t0, kappa = 0.05, 10.0, 0.75

    def one_step(state: HMCState, key, adapt: bool, welford):
        k_mom, k_acc = jax.random.split(key)
        p0 = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(
            state.inv_mass)
        q1, p1, g1, _ = _leapfrog(logp_grad_safe, state.position, p0,
                                  state.grad, state.step_size,
                                  state.inv_mass, num_leapfrog)
        lp1, g1 = logp_grad_safe(q1)
        ke0 = 0.5 * jnp.sum(p0 * p0 * state.inv_mass)
        ke1 = 0.5 * jnp.sum(p1 * p1 * state.inv_mass)
        log_accept = (lp1 - ke1) - (state.log_prob - ke0)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_accept, 0.0)))
        u = jax.random.uniform(k_acc, dtype=dtype)
        accepted = (u < accept_prob) & jnp.isfinite(lp1)
        q = jnp.where(accepted, q1, state.position)
        lp = jnp.where(accepted, lp1, state.log_prob)
        g = jnp.where(accepted, g1, state.grad)

        # dual averaging (Hoffman & Gelman 2014, alg. 5)
        t = state.t + 1.0
        h_avg = jnp.where(
            adapt,
            (1.0 - 1.0 / (t + t0)) * state.h_avg
            + (target_accept - accept_prob) / (t + t0),
            state.h_avg)
        log_step = state.mu - jnp.sqrt(t) / gamma * h_avg
        eta = t ** (-kappa)
        log_step_avg = jnp.where(adapt,
                                 eta * log_step + (1 - eta) * state.log_step_avg,
                                 state.log_step_avg)
        step_size = jnp.where(adapt, jnp.exp(log_step),
                              jnp.exp(state.log_step_avg))

        # Welford running variance for the diagonal mass matrix
        w_n, w_mean, w_m2 = welford
        w_n2 = w_n + 1.0
        delta = q - w_mean
        w_mean2 = w_mean + delta / w_n2
        w_m22 = w_m2 + delta * (q - w_mean2)

        new_state = HMCState(position=q, log_prob=lp, grad=g,
                             step_size=step_size,
                             inv_mass=state.inv_mass,
                             log_step_avg=log_step_avg, h_avg=h_avg,
                             mu=state.mu, t=t)
        return new_state, (w_n2, w_mean2, w_m22), accept_prob

    init = HMCState(position=q0, log_prob=lp0, grad=g0,
                    step_size=jnp.asarray(init_step_size, dtype),
                    inv_mass=jnp.ones(dim, dtype),
                    log_step_avg=jnp.asarray(jnp.log(init_step_size), dtype),
                    h_avg=jnp.asarray(0.0, dtype),
                    mu=jnp.asarray(jnp.log(10.0 * init_step_size), dtype),
                    t=jnp.asarray(0.0, dtype))
    welford0 = (jnp.asarray(0.0, dtype), jnp.zeros(dim, dtype),
                jnp.zeros(dim, dtype))

    # ---- warmup phase 1: step-size adaptation
    half = num_warmup // 2

    def warm1(carry, k):
        state, welford = carry
        state, welford, acc = one_step(state, k, True, welford)
        return (state, welford), acc

    keys = jax.random.split(key, num_warmup + num_samples + 1)
    (state, welford), _ = jax.lax.scan(
        warm1, (init, welford0), keys[:half])

    # ---- warmup phase 2: mass-matrix estimation (+ continued step size)
    (state, welford), _ = jax.lax.scan(
        warm1, (state, welford), keys[half:num_warmup])
    w_n, _, w_m2 = welford
    var = w_m2 / jnp.maximum(w_n - 1.0, 1.0)
    inv_mass = jnp.where(w_n > 10.0, jnp.maximum(var, 1e-6),
                         state.inv_mass)
    state = state._replace(inv_mass=inv_mass,
                           step_size=jnp.exp(state.log_step_avg))

    # ---- sampling
    def sample_step(carry, k):
        state, welford = carry
        state, welford, acc = one_step(state, k, False, welford)
        return (state, welford), (state.position, acc)

    (_, _), (positions, accs) = jax.lax.scan(
        sample_step, (state, welford), keys[num_warmup:-1])

    samples = jax.vmap(unflatten)(positions)
    info = {"accept_prob": accs, "step_size": state.step_size}
    return samples, info


def nuts(log_prob_fn: Callable, init_params, key, num_warmup: int = 200,
         num_samples: int = 200, max_depth: int = 8,
         target_accept: float = 0.8, init_step_size: float = 0.1):
    """NUTS-style adaptive-trajectory sampler (single chain; vmap for more).

    Progressive trajectory doubling with multinomial state selection and
    U-turn / divergence termination, dual-averaging step-size adaptation
    during warmup.  Simplification vs full NUTS (Hoffman & Gelman 2014
    alg. 6): the U-turn criterion is checked between the trajectory
    endpoints after each doubling rather than on every sub-subtree — the
    standard lightweight iterative variant; detailed-balance-critical
    multinomial weighting is exact.
    """
    q0, unflatten = _flatten(init_params)
    dim = q0.shape[0]
    dtype = q0.dtype

    def logp_flat(q):
        return log_prob_fn(unflatten(q))

    logp_grad = jax.value_and_grad(logp_flat)

    def logp_grad_safe(q):
        lp, g = logp_grad(q)
        lp = jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return lp, g

    lp0, g0 = logp_grad_safe(q0)
    gamma, t0_da, kappa = 0.05, 10.0, 0.75

    def trajectory(q, lp, grad, eps, key):
        """One adaptive-trajectory transition from (q, lp, grad).

        Single-leapfrog while_loop with subtree counters: the trajectory
        doubles (1, 2, 4, ... leapfrog steps per subtree, random direction
        per subtree) until a U-turn between the endpoints, a divergence, or
        ``max_depth`` doublings.  The returned state is a progressive
        multinomial draw propto exp(H - H0) over every visited state.
        """
        k_mom, k_dir0, k_run = jax.random.split(key, 3)
        p0 = jax.random.normal(k_mom, (dim,), dtype)
        h0 = lp - 0.5 * jnp.sum(p0 * p0)
        dir0 = jnp.where(jax.random.bernoulli(k_dir0), 1.0, -1.0).astype(dtype)

        state0 = dict(
            ql=q, pl=p0, gl=grad, qr=q, pr=p0, gr=grad,
            qp=q, lpp=lp, logW=jnp.asarray(0.0, dtype),
            direction=dir0,
            steps_left=jnp.asarray(1, jnp.int32),
            subtree=jnp.asarray(1, jnp.int32),
            depth=jnp.asarray(0, jnp.int32),
            stop=jnp.asarray(False),
            acc_sum=jnp.asarray(0.0, dtype),
            acc_cnt=jnp.asarray(0.0, dtype),
            key=k_run,
        )

        def cond(s):
            return (~s["stop"]) & (s["depth"] < max_depth)

        def body(s):
            sign = s["direction"]
            right = sign > 0
            qe = jnp.where(right, s["qr"], s["ql"])
            pe = jnp.where(right, s["pr"], s["pl"])
            ge = jnp.where(right, s["gr"], s["gl"])

            pe = pe + 0.5 * sign * eps * ge
            qe = qe + sign * eps * pe
            lpe, ge = logp_grad_safe(qe)
            pe = pe + 0.5 * sign * eps * ge
            h = lpe - 0.5 * jnp.sum(pe * pe)
            w = h - h0
            diverged = (h0 - h) > 1000.0

            key, k_pick = jax.random.split(s["key"])
            logW_new = jnp.logaddexp(s["logW"], w)
            take = ((jax.random.uniform(k_pick, dtype=dtype)
                     < jnp.exp(w - logW_new)) & ~diverged)
            qp = jnp.where(take, qe, s["qp"])
            lpp = jnp.where(take, lpe, s["lpp"])

            ql = jnp.where(right, s["ql"], qe)
            pl = jnp.where(right, s["pl"], pe)
            gl = jnp.where(right, s["gl"], ge)
            qr = jnp.where(right, qe, s["qr"])
            pr = jnp.where(right, pe, s["pr"])
            gr = jnp.where(right, ge, s["gr"])

            acc = jnp.minimum(1.0, jnp.exp(jnp.minimum(w, 0.0)))
            steps_left = s["steps_left"] - 1
            subtree_done = steps_left == 0

            # on subtree completion: U-turn check + next doubling
            dq = qr - ql
            uturn = (jnp.dot(dq, pl) < 0) | (jnp.dot(dq, pr) < 0)
            key, k_dir = jax.random.split(key)
            new_dir = jnp.where(jax.random.bernoulli(k_dir), 1.0,
                                -1.0).astype(dtype)
            subtree = jnp.where(subtree_done, s["subtree"] * 2, s["subtree"])
            return dict(
                ql=ql, pl=pl, gl=gl, qr=qr, pr=pr, gr=gr,
                qp=qp, lpp=lpp, logW=logW_new,
                direction=jnp.where(subtree_done, new_dir, sign),
                steps_left=jnp.where(subtree_done, subtree, steps_left),
                subtree=subtree,
                depth=jnp.where(subtree_done, s["depth"] + 1, s["depth"]),
                stop=s["stop"] | diverged | (subtree_done & uturn),
                acc_sum=s["acc_sum"] + acc,
                acc_cnt=s["acc_cnt"] + 1.0,
                key=key,
            )

        out = jax.lax.while_loop(cond, body, state0)
        qp, lpp = out["qp"], out["lpp"]
        _, gp_ = logp_grad_safe(qp)
        accept_stat = out["acc_sum"] / jnp.maximum(out["acc_cnt"], 1.0)
        return qp, lpp, gp_, accept_stat

    def run(key):
        keys = jax.random.split(key, num_warmup + num_samples)

        def warm_body(carry, k):
            q, lp, g, log_eps, log_eps_avg, h_avg, t = carry
            eps = jnp.exp(log_eps)
            q, lp, g, acc = trajectory(q, lp, g, eps, k)
            t = t + 1.0
            h_avg = ((1.0 - 1.0 / (t + t0_da)) * h_avg
                     + (target_accept - acc) / (t + t0_da))
            mu = jnp.log(10.0 * init_step_size)
            log_eps = mu - jnp.sqrt(t) / gamma * h_avg
            eta = t ** (-kappa)
            log_eps_avg = eta * log_eps + (1 - eta) * log_eps_avg
            return (q, lp, g, log_eps, log_eps_avg, h_avg, t), acc

        init_carry = (q0, lp0, g0,
                      jnp.asarray(jnp.log(init_step_size), dtype),
                      jnp.asarray(jnp.log(init_step_size), dtype),
                      jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
        carry, _ = jax.lax.scan(warm_body, init_carry, keys[:num_warmup])
        q, lp, g, _, log_eps_avg, _, _ = carry
        eps = jnp.exp(log_eps_avg)

        def sample_body(carry, k):
            q, lp, g = carry
            q, lp, g, acc = trajectory(q, lp, g, eps, k)
            return (q, lp, g), (q, acc)

        _, (qs, accs) = jax.lax.scan(sample_body, (q, lp, g),
                                     keys[num_warmup:])
        return jax.vmap(unflatten)(qs), {"accept_prob": accs,
                                         "step_size": eps}

    return run(key)


def sample_gp_hyperparameters(cfg, X, y, mask, key, num_chains: int = 4,
                              num_warmup: int = 200, num_samples: int = 200,
                              num_leapfrog: int = 16, dtype=None):
    """Posterior samples of a single-task GP's hyperparameters.

    Chains are a vmap axis; each chain initializes from a prior sample
    (matching the reference's restart-initialization philosophy,
    ``utils.py:31-69``).  Returns a GPParams pytree with leading
    (chains, samples) axes.
    """
    from scamlgp_tpu.models import gp

    dtype = dtype or X.dtype

    def log_prob(p):
        c = gp.constrain(cfg, p)
        return (gp.mll(cfg, p, X, y, mask) + gp.log_prior(cfg, c))

    d = X.shape[-1]
    chain_keys = jax.random.split(key, num_chains)

    def one_chain(k):
        k_init, k_run = jax.random.split(k)
        init = gp.sample_params(cfg, k_init, d, dtype)
        return hmc(log_prob, init, k_run, num_warmup=num_warmup,
                   num_samples=num_samples, num_leapfrog=num_leapfrog)

    samples, info = jax.vmap(one_chain)(chain_keys)
    return samples, info


def sample_scamlgp_hyperparameters(model, target_cfg, key,
                                   num_chains: int = 4,
                                   num_warmup: int = 200,
                                   num_samples: int = 200,
                                   num_leapfrog: int = 16,
                                   sampler: str = "hmc",
                                   max_depth: int = 8):
    """Posterior over the ScaML-GP target parameters (weights + residual
    kernel + noise), conditioned on the frozen source stack — the Bayesian
    alternative to ``fit_scamlgp``'s MAP point (BASELINE.json config 3).

    ``sampler``: "hmc" (fixed leapfrog count) or "nuts" (adaptive-trajectory
    doubling, ``num_leapfrog`` ignored, ``max_depth`` caps the doubling)."""
    from scamlgp_tpu.models import scamlgp as m

    def log_prob(p):
        return -m.scamlgp_map_objective(model, target_cfg, p)

    M = model.num_tasks
    d = model.train_X.shape[-1]
    dtype = model.train_X.dtype
    chain_keys = jax.random.split(key, num_chains)

    def one_chain(k):
        k_init, k_run = jax.random.split(k)
        init = m.sample_target_params(target_cfg, k_init, M, d, dtype)
        if sampler == "nuts":
            return nuts(log_prob, init, k_run, num_warmup=num_warmup,
                        num_samples=num_samples, max_depth=max_depth)
        return hmc(log_prob, init, k_run, num_warmup=num_warmup,
                   num_samples=num_samples, num_leapfrog=num_leapfrog)

    samples, info = jax.vmap(one_chain)(chain_keys)
    return samples, info


def posterior_mixture_diag(model, source_cfg, target_cfg, samples, Xq,
                           max_samples: int = 64):
    """Posterior predictive marginals averaged over hyperparameter samples
    (mixture of Gaussians: mean = E[mu_s], var = E[var_s + mu_s^2] - mean^2).
    """
    from scamlgp_tpu.models import scamlgp as m

    flat = jax.tree_util.tree_map(
        lambda l: l.reshape((-1,) + l.shape[2:])[:max_samples], samples)

    def one(p):
        mm = model._replace(params=p)
        return m.scamlgp_posterior_diag(mm, source_cfg, target_cfg, Xq)

    means, variances = jax.lax.map(one, flat)
    mean = jnp.mean(means, axis=0)
    var = jnp.mean(variances + means**2, axis=0) - mean**2
    return mean, jnp.maximum(var, 0.0)
