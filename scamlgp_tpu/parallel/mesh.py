"""Device-mesh helpers for multi-chip ScaML-GP.

The reference's only parallelism is a host process pool over study seeds
(``/root/reference/scamlgp/benchmarking/local_runner.py:174-181``).  The
TPU-native scaling axes (SURVEY.md section 2.5) are instead array axes sharded
over a ``jax.sharding.Mesh``:

- ``task``:  meta-tasks — the O(M) independent source-GP fits ride ICI,
- ``study``: seeds/BO campaigns — embarrassingly parallel, DCN-friendly.

One chip still vmaps restarts x chains inside each shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(study: int = 1, task: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (study, task) mesh over the available devices.

    Args:
        study: number of mesh slots along the study axis.
        task: slots along the task axis; defaults to n_devices // study.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if task is None:
        if n % study != 0:
            raise ValueError(f"{n} devices not divisible by study={study}")
        task = n // study
    if study * task != n:
        raise ValueError(f"mesh {study}x{task} != {n} devices")
    dev_array = np.asarray(devices).reshape(study, task)
    return Mesh(dev_array, axis_names=("study", "task"))


def task_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = task, everything else replicated."""
    return NamedSharding(mesh, P("task"))


def study_task_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axes = (study, task)."""
    return NamedSharding(mesh, P("study", "task"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
