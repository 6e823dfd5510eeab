"""Multi-host (multi-process) campaign execution tests.

Simulates 2 hosts as 2 OS processes with 1 virtual CPU device each (gloo/TCP
collectives), brings up the JAX distributed runtime, and runs the SAME SPMD
campaign over the global (study, task) mesh — the DCN replacement for the
reference's single-host process pool
(``/root/reference/scamlgp/benchmarking/local_runner.py:174-181``).

The reference has no distributed tests to re-host (SURVEY.md section 4);
these are new capability tests: 2-process results must match a
single-process run on identical inputs.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def _free_port() -> int:
    """Pick a free TCP port (hardcoded ports collide on shared CI boxes)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]

# tiny campaign: 4 studies x 3 evals, 2 meta-tasks x 6 points, Branin
ARGS = ["--studies", "4", "--evals", "3", "--tasks", "2", "--points", "6",
        "--fit-steps", "10"]


def _clean_env():
    env = dict(os.environ)
    # the workers bring up their own CPU backend; drop any pytest-side JAX
    # state that could leak through
    env.pop("JAX_PLATFORMS", None)
    return env


def _make_inputs(path):
    """Build one set of campaign inputs shared by every launch."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import jax.numpy as jnp
    from distributed_worker import save_campaign_inputs

    from scamlgp_tpu.benchmarking import benchmarks as B
    from scamlgp_tpu.benchmarking.jax_adapters import (
        campaign_inputs_from_benchmark,
    )

    _, tps, md, optima = campaign_inputs_from_benchmark(
        B.Branin, [6, 6], study_seeds=range(4), noise_std=1.0,
        dtype=jnp.float32, optimum_method="device")
    save_campaign_inputs(path, tps, md, optima)


def _launch(num_processes, devices_per_process, inputs, outs, port=None,
            task_axis=1):
    port = port or _free_port()
    procs = []
    for pid in range(num_processes):
        cmd = [sys.executable, WORKER,
               "--process-id", str(pid),
               "--num-processes", str(num_processes),
               "--coordinator", f"localhost:{port}",
               "--devices-per-process", str(devices_per_process),
               "--task-axis", str(task_axis),
               "--inputs", inputs, "--out", outs[pid]] + ARGS
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT,
                                      env=_clean_env()))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return logs


def _merged(paths):
    idx, X, y, yc = [], [], [], []
    for p in paths:
        z = np.load(p)
        idx.append(z["idx"])
        X.append(z["X"])
        y.append(z["y"])
        yc.append(z["y_clean"])
    idx = np.concatenate(idx)
    order = np.argsort(idx)
    assert sorted(idx.tolist()) == list(range(len(idx))), (
        "study coverage has gaps/duplicates: " + str(sorted(idx.tolist())))
    return (np.concatenate(X)[order], np.concatenate(y)[order],
            np.concatenate(yc)[order])


@pytest.mark.slow
def test_two_process_campaign_matches_single_process(tmp_path):
    """2 hosts x 1 device == 1 host x 2 devices, study by study."""
    inputs = str(tmp_path / "inputs.npz")
    _make_inputs(inputs)

    logs = _launch(2, 1, inputs,
                   [str(tmp_path / "p0.npz"), str(tmp_path / "p1.npz")])
    # each process owns exactly its mesh rows
    for log in logs:
        rec = json.loads([l for l in log.splitlines()
                          if l.startswith("{")][-1])
        assert rec["global_devices"] == 2
        assert rec["local_studies"] == 2

    _launch(1, 2, inputs, [str(tmp_path / "single.npz")])

    X2, y2, yc2 = _merged([tmp_path / "p0.npz", tmp_path / "p1.npz"])
    X1, y1, yc1 = _merged([tmp_path / "single.npz"])
    np.testing.assert_allclose(X2, X1, rtol=0, atol=5e-5)
    np.testing.assert_allclose(yc2, yc1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y2, y1, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_two_process_task_sharded_matches_single_process(tmp_path):
    """DCN x ICI combined layout (SURVEY section 2.5; VERDICT r2 missing
    item 5): 2 processes x 2 devices/process with ``--task-axis 2`` — the
    study axis spans processes (DCN) while the task axis is sharded over
    each process's local devices (ICI) — must reproduce a single-process
    4-device run with the same 2-D layout, study by study."""
    inputs = str(tmp_path / "inputs.npz")
    _make_inputs(inputs)

    logs = _launch(2, 2, inputs,
                   [str(tmp_path / "p0.npz"), str(tmp_path / "p1.npz")],
                   task_axis=2)
    for log in logs:
        rec = json.loads([l for l in log.splitlines()
                          if l.startswith("{")][-1])
        assert rec["global_devices"] == 4
        assert rec["local_studies"] == 2

    _launch(1, 4, inputs, [str(tmp_path / "single.npz")], task_axis=2)

    X2, y2, yc2 = _merged([tmp_path / "p0.npz", tmp_path / "p1.npz"])
    X1, y1, yc1 = _merged([tmp_path / "single.npz"])
    np.testing.assert_allclose(X2, X1, rtol=0, atol=5e-5)
    np.testing.assert_allclose(yc2, yc1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y2, y1, rtol=1e-4, atol=1e-4)


def test_global_mesh_layout_single_process():
    """global_mesh: study axis process-major, task axis intra-process."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    from scamlgp_tpu.parallel import distributed as dist

    mesh = dist.global_mesh(task=2)
    assert mesh.axis_names == ("study", "task")
    assert mesh.shape["task"] == 2
    assert mesh.shape["study"] == jax.device_count() // 2
    # rows are contiguous device groups (ICI-inner)
    dev = np.asarray(mesh.devices)
    for row in dev:
        assert len({d.process_index for d in row}) == 1

    with pytest.raises(ValueError):
        dist.global_mesh(task=3)


def test_local_study_rows_roundtrip():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scamlgp_tpu.parallel import distributed as dist
    from scamlgp_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    mesh = make_mesh(study=n, task=1)
    x = jnp.arange(2 * n * 3, dtype=jnp.float32).reshape(2 * n, 3)
    xs = jax.device_put(x, NamedSharding(mesh, P("study")))
    idx, rows = dist.local_study_rows(xs)
    # single process: everything addressable, order restored
    np.testing.assert_array_equal(idx, np.arange(2 * n))
    np.testing.assert_allclose(rows, np.asarray(x))
