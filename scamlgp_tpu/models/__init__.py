from scamlgp_tpu.models import fit, gp, hmc, scamlgp, vi

__all__ = ["fit", "gp", "hmc", "scamlgp", "vi"]
