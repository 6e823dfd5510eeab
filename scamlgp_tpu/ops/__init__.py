from scamlgp_tpu.ops import kernels, linalg, pallas_gram

__all__ = ["kernels", "linalg", "pallas_gram"]
