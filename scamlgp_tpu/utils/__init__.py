from scamlgp_tpu.utils import checkpoint, constraints, priors, profiling, standardize

__all__ = ["checkpoint", "constraints", "priors", "profiling", "standardize"]
