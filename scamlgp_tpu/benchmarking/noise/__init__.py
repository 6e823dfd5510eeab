from scamlgp_tpu.benchmarking.noise.base import NoiseBase
from scamlgp_tpu.benchmarking.noise.benchmark import NoisyBenchmark
from scamlgp_tpu.benchmarking.noise.homoscedastic import HomoscedasticGaussianNoise

__all__ = ["NoiseBase", "NoisyBenchmark", "HomoscedasticGaussianNoise"]
