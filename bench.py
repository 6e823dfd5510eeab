"""Headline benchmark: batched MLL+Cholesky evaluations per second per chip.

This is the BASELINE.json primary throughput metric — the inner op of every
hyperparameter-fit step in ScaML-GP (Gram assembly -> factorization -> MLL ->
gradient; reference hot loop 2, ``/root/reference/scamlgp/utils.py:175-192``).
One "eval" = one value-and-gradient of the exact GP marginal log-likelihood
for one GP in the batch (batch = tasks x restarts, the axes the TPU engine
vmaps where the reference loops in Python).

Measurement notes:
- Iterations are chained through a data dependency and the final scalar is
  fetched to host — unfetched results can be elided by the async runtime, so
  naive dispatch loops overstate throughput by orders of magnitude.
- The factorization routes by N through the Pallas sweep kernel (N <= 128),
  the MXU-tiled blocked Cholesky (mid N — ``ops/pallas_blocked_chol.py``),
  or XLA, under one MLL-level analytic VJP (``ops/inverse_mll.py``) whose
  backward pass is a single outer product — no triangular solves, no
  backward matmuls.

``vs_baseline`` = TPU evals/s divided by torch-CPU evals/s measured in this
same process with identical per-eval work — torch being the reference's
actual numeric engine (SURVEY.md section 2.4).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np

B = 4096       # batched GPs (tasks x restarts) — fills the chip
N = 128        # observations per GP  (Hartmann6D scale: 128 pts/task)
D = 6          # input dim
TIMED_ROUNDS = 30
CPU_B = 256    # torch baseline batch (throughput is per-eval normalized)

#: v5e per-chip peak dense-matmul throughput (bf16).  Used as the MFU
#: denominator — deliberately the OPTIMISTIC bound: the sweep-inverse
#: value+grad is mostly VPU rank-1 updates, not MXU matmuls, so true
#: attainable is far below this (see docs/VALIDATION.md roofline section).
V5E_BF16_PEAK_FLOPS = 197e12


def flops_per_eval(N=N, D=D, method="sweep"):
    """Executed-FLOP model for one MLL value+grad (one batched GP).

    sweep path: ARD gram assembly ~2 N^2 D, Gauss-Jordan inverse 2 N^3
    (N rank-1 updates of the full matrix), alpha/quad ~2 N^2, analytic
    backward = outer product + scaling ~3 N^2, gram VJP ~3 N^2 D.
    chol path: Cholesky N^3/3 + solves ~2 N^2 + AD backward ~2x forward.
    """
    if method == "sweep":
        return 2 * N**3 + 5 * N**2 * D + 8 * N**2
    return 3 * (N**3 / 3 + 2 * N**2 + 2 * N**2 * D)


def tpu_throughput(B=B, N=N, rounds=TIMED_ROUNDS, pin_noise=False):
    import jax
    import jax.numpy as jnp

    from scamlgp_tpu.models import gp

    dtype = jnp.float32
    # "sweep" auto-routes: Pallas sweep kernel for N <= 128, direct XLA
    # Cholesky MLL above (measured crossover, ops/pallas_sweep.py table)
    method = "sweep" if jax.default_backend() == "tpu" else "chol"
    cfg = gp.source_gp_config()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(size=(B, N, D)), dtype)
    y = jnp.asarray(rng.normal(size=(B, N)), dtype)

    params = jax.vmap(lambda k: gp.sample_params(cfg, k, D, dtype))(
        jax.random.split(jax.random.PRNGKey(0), B))
    if pin_noise:
        # N=512 probe: a few prior-drawn noise floors make random f32
        # instances non-finite at this size (docs/SWEEP_N_r4.json) — pin at
        # the constraint ceiling so the large-N row reports throughput
        # instead of null; marked in the output
        raw = cfg.noise_constraint.inverse(jnp.asarray(9e-3, dtype))
        params = params._replace(
            raw_noise=jnp.broadcast_to(raw, params.raw_noise.shape))
    # honest prior-sampled noise at every N: the 1e-6-relative jitter policy
    # keeps all instances finite (measured; the round-2 noise-pinning dodge
    # is gone).  Accuracy for the ill-conditioned tail is provided by the
    # f64-island method (gp.mll(method='chol64')), measured separately in
    # docs/VALIDATION.md.

    def one(p, x, yy):
        return gp.map_objective(cfg, p, x, yy, method=method)

    @jax.jit
    def step(params, X, y, carry):
        v, g = jax.vmap(jax.value_and_grad(one))(params, X + carry * 0.0, y)
        return v, jnp.mean(v) * 1e-20

    v, carry = step(params, X, y, jnp.asarray(0.0, dtype))
    jax.block_until_ready(v)
    assert bool(jnp.all(jnp.isfinite(v))), "non-finite MLL in bench"

    t0 = time.perf_counter()
    c = carry
    for _ in range(rounds):
        v, c = step(params, X, y, c)
    _ = float(c)  # host fetch forces the whole dependency chain
    dt = time.perf_counter() - t0
    return B * rounds / dt


def torch_cpu_baseline():
    """Same computation through torch (the reference's engine), batched on
    CPU with default thread settings."""
    import torch

    B = CPU_B
    torch.manual_seed(0)
    X = torch.rand(B, N, D, dtype=torch.float32)
    y = torch.randn(B, N, dtype=torch.float32)
    raw_ls = torch.randn(B, D, dtype=torch.float32, requires_grad=True)
    raw_os = torch.randn(B, dtype=torch.float32, requires_grad=True)
    raw_nz = torch.randn(B, dtype=torch.float32, requires_grad=True)

    def mll_batch():
        ls = 1e-4 + (1e2 - 1e-4) * torch.sigmoid(raw_ls)
        os_ = 1e-4 + (1e2 - 1e-4) * torch.sigmoid(raw_os)
        nz = 1e-8 + (1e-2 - 1e-8) * torch.sigmoid(raw_nz)
        Xs = X / ls[:, None, :]
        d2 = torch.cdist(Xs, Xs) ** 2
        K = os_[:, None, None] * torch.exp(-0.5 * d2)
        A = K + (nz[:, None, None] + 1e-6) * torch.eye(N).expand(B, N, N)
        L = torch.linalg.cholesky(A)
        alpha = torch.cholesky_solve(y.unsqueeze(-1), L).squeeze(-1)
        quad = (y * alpha).sum(-1)
        logdet = 2.0 * torch.log(torch.diagonal(L, dim1=-2, dim2=-1)).sum(-1)
        return -0.5 * (quad + logdet + N * np.log(2 * np.pi))

    loss = mll_batch().sum()
    loss.backward()

    rounds = 5
    t0 = time.perf_counter()
    for _ in range(rounds):
        for p in (raw_ls, raw_os, raw_nz):
            p.grad = None
        mll_batch().sum().backward()
    dt = time.perf_counter() - t0
    return B * rounds / dt


def main():
    try:
        tpu = tpu_throughput()
    except Exception:
        # Sporadic infra-level device faults (UNAVAILABLE) wedge the whole
        # backend in-process; a fresh process re-establishes the tunnel.
        # Re-exec up to 3 times before giving up.
        import os
        import sys
        attempt = int(os.environ.get("SCAMLGP_BENCH_ATTEMPT", "0"))
        if attempt >= 3:
            raise
        os.environ["SCAMLGP_BENCH_ATTEMPT"] = str(attempt + 1)
        time.sleep(30 * (attempt + 1))
        os.execv(sys.executable, [sys.executable] + sys.argv)
    try:
        large_n = tpu_throughput(B=256, N=512, rounds=10, pin_noise=True)
    except Exception:
        large_n = None
    try:
        n2048 = tpu_throughput(B=16, N=2048, rounds=3)
    except Exception:
        n2048 = None
    try:
        cpu = torch_cpu_baseline()
    except Exception:
        cpu = None
    vs = (tpu / cpu) if cpu else None
    fpe = flops_per_eval()
    achieved = tpu * fpe
    # measured VPU ceiling (docs/VPU_CEILING.json, scripts/bench_vpu_ceiling
    # — a pure multiply-add loop at the sweep kernel's tile shapes: the
    # speed-of-light for any N-step rank-1 scheme at these shapes)
    pct_vpu = None
    try:
        with open("docs/VPU_CEILING.json") as fh:
            ceil = json.load(fh)
        if ceil.get("N") == N and ceil.get("backend") == "tpu":
            pct_vpu = round(100.0 * tpu / ceil["ceiling_evals_per_s"], 1)
    except (OSError, KeyError, ValueError):
        pass
    print(json.dumps({
        "metric": "batched_mll_cholesky_evals_per_s_per_chip",
        "value": round(tpu, 2),
        "unit": f"evals/s (B={B}, N={N}, D={D}, f32, value+grad, chained)",
        "vs_baseline": round(vs, 3) if vs else None,
        "flops_per_eval_model": int(fpe),
        "achieved_tflops": round(achieved / 1e12, 4),
        "mfu_bf16_peak_pct": round(100.0 * achieved / V5E_BF16_PEAK_FLOPS,
                                   3),
        "pct_of_vpu_ceiling": pct_vpu,
        "large_n": ({"B": 256, "N": 512, "noise": "pinned",
                     "evals_per_s": round(large_n, 2)}
                    if large_n else None),
        "n2048": ({"B": 16, "N": 2048, "evals_per_s": round(n2048, 2)}
                  if n2048 else None),
    }))


if __name__ == "__main__":
    main()
