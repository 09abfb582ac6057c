"""Generate figures from the results/ CSVs (reference component #24,
publication/plotter analog): per-dataset compression-ratio bar chart
(ALP vs competitors) and a kernel-throughput summary.

Run from the repo root: python scripts/make_plots.py
Outputs PNGs under results/plots/.
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, "results")
OUT = os.path.join(RES, "plots")


def ratio_figure():
    path = os.path.join(RES, "compression_ratio_double.csv")
    if not os.path.exists(path):
        return
    with open(path) as f:
        rows = list(csv.DictReader(f))
    names = [r["column"] for r in rows]
    gp = "zstd" if "zstd" in rows[0] else "zlib"
    series = {
        "ALP (this work)": [float(r["alp_bits_per_value"]) for r in rows],
        "Chimp128": [float(r["chimp128"]) for r in rows],
        "Patas": [float(r["patas"]) for r in rows],
        "Gorillas": [float(r["gorillas"]) for r in rows],
        ("Zstd" if gp == "zstd" else "zlib"):
            [float(r[gp]) for r in rows],
    }
    x = range(len(names))
    fig, ax = plt.subplots(figsize=(16, 5))
    width = 0.17
    for i, (label, vals) in enumerate(series.items()):
        ax.bar([xi + i * width for xi in x], vals, width, label=label)
    ax.axhline(64, color="grey", ls="--", lw=0.8, label="uncompressed")
    ax.set_xticks([xi + 2 * width for xi in x])
    ax.set_xticklabels(names, rotation=60, ha="right", fontsize=7)
    ax.set_ylabel("bits / value (lower is better)")
    ax.set_title("Compression ratio, 30-dataset double suite "
                 "(reference table_4 analog)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "ratio_double.png"), dpi=130)


def speed_figure():
    # Headline kernel numbers recorded in round-2 benchmarks
    # (results/speed_tpu.csv, e2e_queries.csv); refreshed as benches rerun.
    data = {
        "falp decode f64 (suite avg)": 114.1,
        "falp decode f64 bw16 (mid)": 106.9,
        "fused decode+SUM f64": 99.7,
        "ALP_RD decode f64": 106.0,
        "unFFOR f64": 155.5,
        "encode f64 (exact kernel)": 14.4,
        "encode f32 kernel": 50.3,
        "falp decode f32": 126.7,
        "e2e SUM query (400 MiB)": 91.4,
    }
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.barh(list(data)[::-1], list(data.values())[::-1])
    ax.axvline(56.0, color="red", ls="--", lw=1,
               label="reference CPU speed-of-light (1 core)")
    ax.set_xlabel("GB/s of decoded/encoded doubles, one TPU v5e chip")
    ax.set_title("Kernel throughput vs reference baseline")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, "kernel_throughput.png"), dpi=130)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    ratio_figure()
    speed_figure()
    print("plots written to", OUT)
