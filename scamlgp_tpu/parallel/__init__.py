from scamlgp_tpu.parallel import campaign, mesh, scamlgp_sharded

__all__ = ["campaign", "mesh", "scamlgp_sharded"]
