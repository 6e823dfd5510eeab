"""Multi-host / multi-process execution: the DCN scale-out path.

The reference's only scale-out is a single-host process pool over study seeds
(``/root/reference/scamlgp/benchmarking/local_runner.py:174-181``, up to 64
CPU workers, no inter-worker communication).  The TPU-native replacement
brings up the JAX distributed runtime (``jax.distributed.initialize``) and
lays the **study axis across processes/hosts (DCN)** with the **task axis
inside a host (ICI)**:

- every process runs the same SPMD program (``run_campaign`` over a global
  mesh); GSPMD partitions the lock-step studies with zero cross-host
  collectives on the hot path, because studies are independent — DCN traffic
  is limited to dispatch coordination and explicit host-data broadcasts;
- inside a host, the task axis rides ICI via ``parallel/scamlgp_sharded.py``'s
  ``shard_map`` + ``psum`` path.

On a TPU-less box the same code path is exercised by simulating hosts as CPU
processes (``simulate_cpu_devices``: N virtual CPU devices per process, gloo
collectives over TCP) — see ``scripts/distributed_worker.py`` and
``tests/test_distributed.py``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               simulate_cpu_devices: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime for multi-host execution.

    Must be called before any JAX computation.  Arguments default from the
    environment (``SCAMLGP_COORDINATOR`` / ``SCAMLGP_NUM_PROCESSES`` /
    ``SCAMLGP_PROCESS_ID``); with everything ``None`` JAX's own cluster
    auto-detection (TPU metadata, SLURM, ...) is used.

    Args:
        coordinator_address: ``host:port`` of process 0's coordination
            service.
        num_processes: total process count.
        process_id: this process's rank in ``[0, num_processes)``.
        simulate_cpu_devices: if set, force the CPU backend with this many
            virtual devices per process and gloo (TCP) collectives — the
            multi-host simulation used when no multi-chip hardware is
            available.  ``jax.config`` is used rather than ``XLA_FLAGS``
            because the axon TPU plugin's sitecustomize owns the env vars.
    """
    import jax

    coordinator_address = (coordinator_address
                           or os.environ.get("SCAMLGP_COORDINATOR"))
    if num_processes is None and "SCAMLGP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["SCAMLGP_NUM_PROCESSES"])
    if process_id is None and "SCAMLGP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["SCAMLGP_PROCESS_ID"])

    if simulate_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(simulate_cpu_devices))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(task: Optional[int] = None):
    """(study, task) mesh over the GLOBAL device set.

    Device rows are process-major, so the ``study`` axis spans processes
    (DCN) and the ``task`` axis stays inside a process (ICI) — the layout
    SURVEY.md section 2.5 prescribes: studies never communicate, so only the
    cheap axis crosses hosts.

    Args:
        task: devices per task-shard group inside a process; must divide the
            per-process device count.  Default 1 (pure study-parallel — every
            device is one study lane, the direct replacement of the
            reference's process pool).
    """
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = len({d.process_index for d in devs})
    local = len(devs) // n_proc
    if n_proc * local != len(devs):
        raise ValueError(f"uneven devices per process: {len(devs)} devices "
                         f"over {n_proc} processes")
    task = 1 if task is None else int(task)
    if local % task != 0:
        raise ValueError(f"task={task} does not divide the per-process "
                         f"device count {local}")
    study = n_proc * (local // task)
    arr = np.asarray(devs).reshape(study, task)
    return Mesh(arr, axis_names=("study", "task"))


def broadcast_from_host0(tree):
    """Replicate host-0's pytree of host-local arrays on every process.

    Campaign inputs built from host RNGs (unseeded target tasks, reference
    ``base.py:119-133`` semantics) differ per process; the SPMD program needs
    every process to hold the SAME values.  One DCN broadcast pins them to
    process 0's draw.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def local_study_rows(arr) -> tuple:
    """(global_indices, rows): this process's addressable slice of an array
    sharded with ``PartitionSpec('study', ...)`` along axis 0.

    The multi-host analogue of the reference's per-worker result JSONs
    (``local_runner.py:188-201``): each host persists only the studies it
    owns; merging happens at analysis time.
    """
    seen = {}
    for shard in arr.addressable_shards:
        sl = shard.index[0]
        start = 0 if sl.start is None else sl.start
        data = np.asarray(shard.data)
        for i in range(data.shape[0]):
            seen[start + i] = data[i]
    idx = sorted(seen)
    return np.asarray(idx), np.stack([seen[i] for i in idx])


def allgather(tree):
    """Gather a globally-sharded pytree fully onto every process (host
    numpy): use for small results only — this rides DCN."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
