"""Render the reference's regret-grid figures from committed campaign
artifacts (VERDICT r4 item 10).

The 128-study TPU campaigns persist running-min simple-regret curves as
``docs/*_regrets_tpu_128studies.npy``.  Regret curves are sufficient to
rebuild the reference figures (``configurations/{branin,hartmann3,
hartmann6}.py`` per-benchmark grids and the ``figure_synthetic.py:29-95``
combined panel): feed them through the SAME plotting layer by treating each
regret curve as a noise-free loss trace with optimum 0 — ``compute_regrets``
is a running min, which is idempotent on a running-min series, so the
rendered statistics are exactly the campaigns' regret statistics.

    python scripts/plot_campaign_figures.py --out-dir docs
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import numpy as np

#: (artifact stem, benchmark label, group title)
CELLS = {
    "branin": [
        ("branin_t8_p32_n1_regrets_tpu_128studies",
         "Branin\n8 Tasks à 32 Points (σ_noise=1.0)"),
        ("branin_t32_p32_n1_regrets_tpu_128studies",
         "Branin\n32 Tasks à 32 Points (σ_noise=1.0)"),
    ],
    "hartmann3": [
        ("hm3_t8_p32_n01_regrets_tpu_128studies",
         "Hartmann3D\n8 Tasks à 32 Points (σ_noise=0.1)"),
        ("hm3_t32_p32_n01_regrets_tpu_128studies",
         "Hartmann3D\n32 Tasks à 32 Points (σ_noise=0.1)"),
    ],
    "hartmann6": [
        ("hm6_t8_p128_n01_regrets_tpu_128studies",
         "Hartmann6D\n8 Tasks à 128 Points (σ_noise=0.1)"),
        ("hm6_t32_p128_n01_regrets_tpu_128studies",
         "Hartmann6D\n32 Tasks à 128 Points (σ_noise=0.1)"),
    ],
}


def regrets_to_runs(regrets: np.ndarray, key: str):
    """Wrap a (S, E) regret array in the study-runner result schema
    (``jax_adapters.campaign_to_study_results`` shape) with optimum 0."""
    from scamlgp_tpu.benchmarking.experiment_config_utils import Experiment
    from scamlgp_tpu.bo.optimizer import ScaMLGPBO

    studies = [{
        "optimum": 0.0,
        "objectives": [{"name": "loss", "greater_is_better": False}],
        "evaluations": [
            {"configuration": {}, "objectives": {
                "loss (noisy)": float(v), "loss (noise free)": float(v)}}
            for v in row],
        "seed": int(s),
    } for s, row in enumerate(regrets)]
    config = Experiment(
        optimizer=ScaMLGPBO, benchmark={"cls": key, "kwargs": {}},
        n_evaluations=int(regrets.shape[1]),
        n_studies=int(regrets.shape[0]), compute="TPU")
    return {"experiment_config": config.__dict__, "studies": studies}, config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", default="docs")
    ap.add_argument("--out-dir", default="docs")
    args = ap.parse_args()

    from scamlgp_tpu.benchmarking.configurations.styles import OPTIMIZER_STYLES
    from scamlgp_tpu.benchmarking.plotting import grouped_results
    from scamlgp_tpu.bo.core import Objective

    for robust in (True, False):
        stats = "median_25quant75" if robust else "mean_sem"
        all_runs, all_groups = [], {}
        for bench, cells in CELLS.items():
            runs, groups = [], {}
            for stem, title in cells:
                path = os.path.join(args.docs, stem + ".npy")
                if not os.path.exists(path):
                    print(f"skip (missing): {path}")
                    continue
                reg = np.load(path)
                run, config = regrets_to_runs(reg, stem)
                runs.append(run)
                groups[title] = [config]
            if not runs:
                continue
            fig = grouped_results(
                runs, optimizer_styles=OPTIMIZER_STYLES, groups=groups,
                robust_statistics=robust, use_regrets=True,
                use_benchmark_optimum=True,
                objective=Objective("loss", False))
            out = os.path.join(args.out_dir,
                               f"{bench}_tpu_128studies_{stats}.pdf")
            fig.savefig(out, bbox_inches="tight")
            print("figure ->", out)
            all_runs.extend(runs)
            all_groups.update(groups)
        # combined figure_synthetic-style panel (reference
        # figure_synthetic.py:29-95 collects every synthetic group)
        if all_runs:
            fig = grouped_results(
                all_runs, optimizer_styles=OPTIMIZER_STYLES,
                groups=all_groups, robust_statistics=robust,
                use_regrets=True, use_benchmark_optimum=True,
                objective=Objective("loss", False), n_cols=2)
            out = os.path.join(args.out_dir,
                               f"figure_synthetic_tpu_{stats}.pdf")
            fig.savefig(out, bbox_inches="tight")
            print("figure ->", out)


if __name__ == "__main__":
    main()
