"""Per-optimizer plot style registry (reference
``benchmarking/configurations/styles.py:8-10``)."""

import matplotlib

from scamlgp_tpu.bo.optimizer import ScaMLGPBO

CMAP = matplotlib.colormaps["tab10"]

OPTIMIZER_STYLES = {
    ScaMLGPBO: {"color": CMAP(0)[:3], "label": "ScaML-GP", "line": "-"},
}
