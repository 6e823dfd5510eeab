"""Combined 2x2 ablations figure from the TPU ablation-campaign artifacts.

Renders the reference's combined cumulative-regret ablation figure
(``/root/reference/scamlgp/benchmarking/configurations/ablations_summary.py:27-128``)
from the JSONs produced by ``scripts/run_ablation.py`` — avg cumulative
simple regret +- SEM vs M (num meta-tasks) and N_m (points per task), for
Branin and Hartmann6D, log-log errorbars matching
``benchmarking/plotting.py::plot_meta_data_summary_comparison`` style.

Tail artifacts (single extra grid values run separately, e.g. the Branin
M=64 / N=256 rows) are merged into the main axis by value.

    python scripts/plot_ablations_combined.py --out docs/ablations_summary_tpu.pdf
"""

import argparse
import json
import os

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs")

PANELS = [
    # (title, xlabel, main artifact, [tail artifacts — later files win on
    # value collision, so reference-scale 128-study re-runs take precedence
    # over the 16-study rows when present])
    ("Branin", "Num. meta-tasks ($M$)",
     "branin_ablation_tasks_tpu.json",
     ["branin_ablation_tasks_m64_tpu.json",
      "branin_ablation_tasks_tpu_s128.json"]),
    ("Branin", "Num. obs. per task ($N_m$)",
     "branin_ablation_points_tpu.json",
     ["branin_ablation_points_n256_tpu.json",
      "branin_ablation_points_tpu_s128.json"]),
    ("Hartmann 6D", "Num. meta-tasks ($M$)",
     "hm6_ablation_tasks_tpu.json",
     ["hm6_ablation_tasks_tpu_s128.json"]),
    ("Hartmann 6D", "Num. obs. per task ($N_m$)",
     "hm6_ablation_points_tpu.json",
     ["hm6_ablation_points_tpu_s128.json"]),
]


def load_rows(main, tails):
    rows = {}
    for name in [main] + tails:
        path = os.path.join(DOCS, name)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            art = json.load(fh)
        for r in art.get("rows", []):
            rows[r["value"]] = r  # later (tail) files win on collision
    return [rows[v] for v in sorted(rows)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        DOCS, "ablations_summary_tpu.pdf"))
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rc("font", family="serif")
    fig, axs = plt.subplots(2, 2, figsize=(6.75, 4), sharey="row",
                            sharex="col")

    drew = 0
    col_xs = {}
    for ax, (title, xlabel, main_f, tails) in zip(axs.flatten(), PANELS):
        rows = load_rows(main_f, tails)
        ax.set_title(title, fontsize=9)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.grid(True, which="both", alpha=0.25, linewidth=0.5)
        if not rows:
            ax.text(0.5, 0.5, "(pending)", transform=ax.transAxes,
                    ha="center", fontsize=8)
            continue
        xs = [r["value"] for r in rows]
        ys = [r["avg_cum_regret_mean"] for r in rows]
        es = [r["avg_cum_regret_sem"] for r in rows]
        ax.errorbar(xs, ys, yerr=es, marker="o", markersize=3,
                    linewidth=1.2, capsize=2, label="ScaML-GP (TPU)")
        ax.minorticks_off()
        col_xs.setdefault(list(axs.flatten()).index(ax) % 2, set()).update(xs)
        drew += 1

    # sharex='col': per-panel set_xticks calls would overwrite each other
    # (last panel wins, dropping tick labels for values only the other
    # panel has — ADVICE r3) -> set each column's ticks to the union
    for col, xs_union in col_xs.items():
        xs_sorted = sorted(xs_union)
        for ax in axs[:, col]:
            ax.set_xticks(xs_sorted)
            ax.set_xticklabels([str(x) for x in xs_sorted], fontsize=7)
            ax.minorticks_off()

    axs[0, 0].set_ylabel("Cum. regret")
    axs[1, 0].set_ylabel("Cum. regret")
    axs[1, 0].set_xlabel(PANELS[2][1])
    axs[1, 1].set_xlabel(PANELS[3][1])
    handles, labels = axs[0, 0].get_legend_handles_labels()
    if handles:
        fig.legend(handles[:1], labels[:1], loc="lower center", ncol=1,
                   frameon=False, fontsize=8)
    fig.tight_layout(rect=(0, 0.06, 1, 1))
    fig.savefig(args.out)
    print(f"wrote {args.out} ({drew}/4 panels populated)")


if __name__ == "__main__":
    main()
