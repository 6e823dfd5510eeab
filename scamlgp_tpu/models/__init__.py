from scamlgp_tpu.models import fit, gp, hmc, scamlgp

__all__ = ["fit", "gp", "hmc", "scamlgp"]
