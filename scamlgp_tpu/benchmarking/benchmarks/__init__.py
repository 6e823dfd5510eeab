"""Benchmark registry (discoverable by introspection, mirroring the
reference's ``benchmarking/utils.py:29-43`` discovery)."""

from scamlgp_tpu.benchmarking.benchmarks.branin import Branin
from scamlgp_tpu.benchmarking.benchmarks.hartmann_3d import Hartmann3D
from scamlgp_tpu.benchmarking.benchmarks.hartmann_6d import Hartmann6D
from scamlgp_tpu.benchmarking.benchmarks.quadratic import Quadratic

__all__ = ["Branin", "Hartmann3D", "Hartmann6D", "Quadratic"]
