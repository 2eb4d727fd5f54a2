#!/usr/bin/env python3
"""Result analysis plots: per-organ Dice box plots and ablation line graphs.

Capability parity with the reference's plotting tools
(scripts/plotting/plot_results.py:11-108 and
plot_results_mri_baseline.py of fransiskusbudi/multimodal_segmentation_project),
generalized: instead of hard-coded Excel sheets, this consumes the
per_sample_metrics.csv files that test_model.py writes, so the whole
train -> eval -> plot loop closes without manual spreadsheet work.

Usage:
  # box plot of per-organ dice across one or more eval runs
  python scripts/plotting/plot_results.py box \
      --runs exp/test_results_A/metrics/per_sample_metrics.csv:ModelA \
             exp/test_results_B/metrics/per_sample_metrics.csv:ModelB \
      --out dice_box.png

  # ablation line graph: mean dice vs n_samples
  python scripts/plotting/plot_results.py line \
      --runs r_n1/.../per_sample_metrics.csv:1 r_n5/...:5 r_n25/...:25 \
      --xlabel "n labeled CT volumes" --out ablation.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import pandas as pd

ORGANS = ["spleen", "liver", "kidneys"]


def load_runs(run_specs):
    runs = []
    for spec in run_specs:
        path, _, label = spec.partition(":")
        df = pd.read_csv(path)
        runs.append((label or os.path.basename(os.path.dirname(path)), df))
    return runs


def plot_box(runs, out, group_by="organ"):
    """Grouped per-organ Dice box plot.

    group_by="organ" puts organs on the x-axis with one box per run
    (plot_results.py style); group_by="run" puts runs/experiments on the
    x-axis with one box per organ and mean markers, the layout of the
    reference's plot_results_mri_baseline.py baseline-comparison figure.
    """
    import seaborn as sns

    rows = []
    for label, df in runs:
        for organ in ORGANS:
            for v in df[f"dice_{organ}"]:
                rows.append({"run": label, "organ": organ, "dice": v})
    data = pd.DataFrame(rows)
    plt.figure(figsize=(10, 6))
    x, hue = ("organ", "run") if group_by == "organ" else ("run", "organ")
    sns.boxplot(
        data=data, x=x, y="dice", hue=hue, showmeans=group_by == "run",
        meanprops={"marker": "o", "markerfacecolor": "white",
                   "markeredgecolor": "black"},
    )
    plt.title("Per-organ Dice")
    plt.ylim(0, 1)
    plt.grid(True, axis="y", alpha=0.3)
    plt.savefig(out, bbox_inches="tight", dpi=150)
    print(f"saved {out}")


def plot_line(runs, out, xlabel):
    xs, series = [], {o: [] for o in ORGANS + ["overall"]}
    for label, df in runs:
        try:
            xs.append(float(label))
        except ValueError:
            xs.append(len(xs))
        means = [df[f"dice_{o}"].mean() for o in ORGANS]
        for o, m in zip(ORGANS, means):
            series[o].append(m)
        series["overall"].append(sum(means) / len(means))
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    xs = [xs[i] for i in order]
    plt.figure(figsize=(10, 6))
    for name, ys in series.items():
        ys = [ys[i] for i in order]
        plt.plot(xs, ys, marker="o", label=name,
                 linewidth=2.5 if name == "overall" else 1.5)
    plt.xlabel(xlabel)
    plt.ylabel("Mean Dice")
    plt.ylim(0, 1)
    plt.grid(True, alpha=0.3)
    plt.legend()
    plt.savefig(out, bbox_inches="tight", dpi=150)
    print(f"saved {out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["box", "line"])
    p.add_argument("--runs", nargs="+", required=True,
                   help="per_sample_metrics.csv[:label] entries")
    p.add_argument("--out", default="results.png")
    p.add_argument("--xlabel", default="n samples")
    p.add_argument("--group-by", choices=["organ", "run"], default="organ",
                   help="box mode: x-axis grouping (run = reference "
                        "mri_baseline layout)")
    args = p.parse_args()
    runs = load_runs(args.runs)
    if args.kind == "box":
        plot_box(runs, args.out, args.group_by)
    else:
        plot_line(runs, args.out, args.xlabel)


if __name__ == "__main__":
    main()
