"""Plot benchmark results: runtime curves and throughput bars.

Parity with the reference's plots/ scripts (plot_benchmark_v4.py:6-40
parses "path ms" lines into mean/std-per-size curves;
throughput_boxplot*.py renders MB/s distributions).  Reference baselines
from BASELINE.md are overlaid on the runtime plot.

  python benchmarks/plot_results.py runtime benchmark_results.txt -o runtime.png
  python benchmarks/plot_results.py throughput results.jsonl -o throughput.png
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_runtime import REFERENCE_MS  # noqa: E402


def parse_runtime(path: str) -> dict[int, list[float]]:
    by_size: dict[int, list[float]] = defaultdict(list)
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            m = re.search(r"(\d+)x(\d+)", parts[0])
            if m:
                by_size[int(m.group(1))].append(float(parts[1]))
    return by_size


def cmd_runtime(args) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    by_size = parse_runtime(args.results)
    sizes = sorted(by_size)
    means = [np.mean(by_size[s]) for s in sizes]
    stds = [np.std(by_size[s]) for s in sizes]

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.errorbar(sizes, means, yerr=stds, marker="o", label="tpujpeg", zorder=3)
    for name, table in REFERENCE_MS.items():
        ref_sizes = sorted(set(table) & set(sizes)) or sorted(table)
        ax.plot(ref_sizes, [table[s] for s in ref_sizes], "--", marker="s",
                label=f"reference {name}")
    ax.set_xlabel("image size (px, square)")
    ax.set_ylabel("decode time (ms)")
    ax.set_yscale("log")
    ax.grid(alpha=0.3)
    ax.legend()
    ax.set_title("Per-image decode runtime vs size")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


def cmd_throughput(args) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    batches, mbps = [], []
    with open(args.results) as f:
        for line in f:
            rec = json.loads(line)
            batches.append(rec["batch"])
            mbps.append(rec["mb_per_s"])

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.bar([str(b) for b in batches], mbps, zorder=3)
    ax.axhline(550, color="tab:red", ls="--",
               label="reference cuda batch (550 MB/s, datacenter GPU)")
    ax.set_xlabel("batch size")
    ax.set_ylabel("compressed MB/s")
    ax.grid(axis="y", alpha=0.3)
    ax.legend()
    ax.set_title("Batched decode throughput")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


def cmd_boxplot(args) -> int:
    """MB/s distributions per config — reference throughput_boxplot*.py.

    Groups the JSONL records by the sweep key (batch, chunk, or workers)
    and draws one box per group from the per-iteration samples.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups: dict[str, list[float]] = defaultdict(list)
    with open(args.results) as f:
        for line in f:
            rec = json.loads(line)
            key = rec.get(args.by)
            samples = rec.get("mb_per_s_samples") or [rec["mb_per_s"]]
            groups[f"{args.by}={key}"].extend(samples)

    labels = sorted(groups, key=lambda k: (len(k), k))
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.boxplot([groups[k] for k in labels], tick_labels=labels, zorder=3)
    ax.set_ylabel("compressed MB/s")
    ax.grid(axis="y", alpha=0.3)
    ax.set_title(f"Throughput distribution by {args.by}")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("runtime")
    r.add_argument("results")
    r.add_argument("-o", "--output", default="runtime.png")
    r.set_defaults(fn=cmd_runtime)
    t = sub.add_parser("throughput")
    t.add_argument("results")
    t.add_argument("-o", "--output", default="throughput.png")
    t.set_defaults(fn=cmd_throughput)
    b = sub.add_parser("boxplot")
    b.add_argument("results")
    b.add_argument("--by", default="batch", choices=["batch", "chunk", "workers"])
    b.add_argument("-o", "--output", default="boxplot.png")
    b.set_defaults(fn=cmd_boxplot)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
