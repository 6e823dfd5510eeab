"""scamlgp_tpu — TPU-native scalable meta-learning with Gaussian processes.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
boschresearch/Scalable-Meta-Learning-with-Gaussian-Processes: the ScaML-GP
hierarchical sum-of-GPs meta-model, a meta-learning Bayesian-optimization
driver, and the benchmarking framework around them — with tasks, restarts,
chains and study seeds as batched array axes sharded over TPU device meshes.
"""

from scamlgp_tpu.config import default_dtype, enable_x64

_LAZY = {
    "ScaMLGP": "scamlgp_tpu.models.scamlgp",
    "meta_fit_scamlgp": "scamlgp_tpu.models.scamlgp",
    "significant_weights_mask": "scamlgp_tpu.models.scamlgp",
    "ScaMLGPBO": "scamlgp_tpu.bo.optimizer",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "ScaMLGP",
    "ScaMLGPBO",
    "meta_fit_scamlgp",
    "significant_weights_mask",
    "default_dtype",
    "enable_x64",
]

__version__ = "0.1.0"
