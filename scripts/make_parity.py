"""Emit PARITY.md — the one-page honest parity report.

For every metric family: our measured number, the reference bar it is
judged against, and an explicit evidence status:

* **verified**   — measured on real hardware / asserted by tests in
  this image;
* **data-gated** — the code asserts it, but the corpus is not in this
  image (mount ``ALP_DATASET_DIR_PATH`` /
  ``HURRICANE_ISABEL_DATASET_DIR_PATH`` to execute);
* **tunnel-bound** — the measurement is dominated by this
  environment's remote-TPU tunnel (fixed ~35 ms RPC per dispatch,
  ~0.2 GB/s host->device), not by the TPU;
* **functional-only** — correctness demonstrated (byte-identical),
  perf extrapolated (single-chip hardware; multi-chip runs on virtual
  CPU devices).

Run: python scripts/make_parity.py    (reads results/*.csv + BENCH_r*.json)
"""

import csv
import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "results")

CPU_CORE_BAR = 56.0      # GB/s: 0.5 cyc/val @ 3.5 GHz (BASELINE.md §6)


def read_csv(name):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return list(csv.DictReader(f))


def latest_bench():
    # prefer the in-repo headline written by the newest bench.py run —
    # PARITY then never lags behind the latest measurement the way the
    # round-stamped BENCH_r*.json snapshots can
    fresh = os.path.join(ROOT, "results", "bench_headline.json")
    if os.path.exists(fresh):
        with open(fresh) as f:
            d = json.load(f)
        return {"tail": json.dumps(d), **d}
    files = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not files:
        return None
    with open(files[-1]) as f:
        return json.load(f)


def speed_row(rows, name):
    for r in rows:
        if r["name"] == name:
            return float(r["throughput"])
    return None


def q_row(rows, prefix):
    for r in rows:
        if r["query"].startswith(prefix):
            return r
    return None


def main():
    sp = read_csv("speed_tpu.csv")
    eq = read_csv("e2e_queries.csv")
    bench = latest_bench()
    lines = [
        "# PARITY — measured vs reference, with evidence status",
        "",
        "Single honest summary of where this framework stands against "
        "the reference's own numbers (BASELINE.md).  Statuses: "
        "**verified** (measured/asserted in this image), **data-gated** "
        "(code asserts it; corpus not mounted), **tunnel-bound** "
        "(dominated by the remote-TPU tunnel, not the TPU), "
        "**functional-only** (byte-identical correctness shown; perf "
        "extrapolated).",
        "",
        "## Decode (fused falp)",
        "",
        "| Metric | Ours | Reference bar | Status |",
        "|---|---|---|---|",
    ]
    if bench:
        v = bench.get("parsed", bench).get("value")
        vs = bench.get("parsed", bench).get("vs_baseline")
        lines.append(
            f"| f64 suite average (driver-captured) | {v} GB/s "
            f"({vs}x bar) | {CPU_CORE_BAR} GB/s = one AVX-512 core at "
            "0.5 cyc/val | verified (real chip, slope-timed) |")
    for bw in (16, 42, 52, 64):
        g = speed_row(sp, f"falp_f64_bw{bw}")
        if g:
            lines.append(
                f"| falp f64 bw{bw} | {g:.0f} GB/s | 56 GB/s/core "
                "(0.52-0.64 cyc/val AVX-512) | verified |")
    ex = speed_row(sp, "falp_sum_exact_fused_f64_bw16")
    if ex:
        lines.append(
            f"| EXACT SUM (== math.fsum), fused kernel | {ex:.0f} GB/s "
            "| reference has no exact-sum path | verified "
            "(bit-identical to fsum on chip) |")
    lines += [
        "",
        "Note: the arithmetic suite average includes Gov/26 (bw 0, pure "
        "broadcast); non-degenerate columns run 1.9-3.8x the bar "
        "individually (bench.py per-column lines).  bw>=52 and the "
        "generic rows are op-bound, not bandwidth-bound: the exact "
        "64x64 digit product is 16 32-bit multiplies at ~2.3 "
        "add-equivalents each (ablation in docs/DEVNOTES.md, "
        "'Round-4 op-bound analysis').",
        "",
        "## Encode / compression",
        "",
        "| Metric | Ours | Reference bar | Status |",
        "|---|---|---|---|",
    ]
    enc = speed_row(sp, "encode_f64_without_sampling")
    pipe = speed_row(sp, "encode_f64_pipeline_device")
    if enc:
        lines.append(f"| encode kernel (hot) | {enc:.1f} GB/s | "
                     "10.8-20 GB/s per CPU core (1.4-2.6 cyc/val) | "
                     "verified |")
    if pipe:
        lines.append(f"| device encode pipeline | {pipe:.1f} GB/s | "
                     "same band | verified |")
    lines.append("| device ALP_RD compress (POI-lat/lon) | "
                 "byte-identical to host on the real chip | reference "
                 "covers RD in its parallel encode | verified "
                 "(results/tpu_validation.txt device-compress rows) |")
    r = q_row(eq, "COMPRESSION,ALP device") or None
    for row in eq:
        if row["scheme"].startswith("ALP device e2e"):
            lines.append(f"| device e2e compression | {row['gbps']} GB/s"
                         " | same band | verified |")
        if row["scheme"] == "ALP host engine (OpenMP)" and \
                row["query"] == "COMPRESSION":
            lines.append(f"| host engine compression "
                         f"({row['parallelism']}) | {row['gbps']} GB/s | "
                         "reference single core 1.39-2.59 cyc/val | "
                         "verified (below reference per-core; fallback "
                         "path) |")
    lines += [
        "",
        "## End-to-end queries (table-6 analog)",
        "",
        "| Query | Ours | Reference shape | Status |",
        "|---|---|---|---|",
    ]
    for prefix, bar, note in (
            ("SUM-shaped scan", "scan decode at 0.5 cyc/val",
             "verified (slope-timed)"),
            ("SUM exact", "no exact path in reference",
             "verified (== math.fsum)"),
            ("FILTER COUNT (predicate pushdown)", "q1 fused predicate",
             "verified"),
            ("TOP-K (k=10; fused pipeline)", "no TOP-K in reference",
             "verified (slope-timed)"),
            ("HISTOGRAM (6 bins; fused pipeline)",
             "no histogram in reference", "verified (slope-timed)"),
            ("GROUP-BY SUM+MIN/MAX (16 groups; sorted path",
             "no GROUP-BY in reference",
             "verified (exact per-group fsum; sorted-permutation "
             "path: per-vector superaccumulator partials + prefix "
             "gathers, no [n,G] operand)"),
            ("TOP-K (k=10; warm wall-clock", "—",
             "tunnel-bound (~35 ms/dispatch RPC)"),
            ("HISTOGRAM (6 bins; warm wall-clock", "—", "tunnel-bound"),
            ("GROUP-BY (16 groups; warm wall-clock", "—",
             "verified (ONE dispatch over the group-sorted "
             "re-encoding)"),
            ("GROUP-BY (512 groups; warm wall-clock", "—",
             "verified (no group-count cliff: same sorted path)"),
            ("MEDIAN (exact rank-select", "no quantile in reference",
             "verified (ONE dispatch: on-device while_loop bisection; "
             "== np.quantile, verified on chip)"),
            ("DISTINCT COUNT", "no DISTINCT in reference",
             "verified (exact; one-dispatch 2-key sort)"),
            ("WINDOW tumbling 1M SUM", "no windows in reference",
             "verified (exact per-window fsum)"),
            ("WINDOW sliding 1M/256K SUM", "no windows in reference",
             "verified (hop cells + exact combine)"),
            ("COLD first SUM", "—",
             "tunnel-bound (restore runs AT the raw-transfer bound; "
             "the tunnel wire is ~36 MB/s — the bench prints the "
             "bound)"),
            ("SUM exact scan,Uncompressed", "uncompressed 2.24x slower",
             "verified")):
        row = q_row(eq, prefix.split(",")[0]) if "," not in prefix else \
            next((r2 for r2 in eq if r2["query"].startswith(
                prefix.split(",")[0])
                and r2["scheme"].startswith(prefix.split(",")[1])), None)
        if row:
            lines.append(f"| {row['query']} ({row['scheme']}) | "
                         f"{row['gbps']} GB/s | {bar} | {note} |")
    comp = [r2 for r2 in eq if r2["query"] == "SUM-scan decode"]
    if comp:
        lines.append(
            "| competitor decodes (gorillas/chimp/chimp128/patas/pde) | "
            "see table_6.md; ALP speedups "
            + ", ".join(f"{r2['scheme']}:{r2['alp_speedup']}x"
                        for r2 in comp if "1 thr" in r2["parallelism"])
            + " | reference: 16-59x over competitors | verified "
            "(thread sweep saturates the 4-core host) |")
    cenc = [r2 for r2 in eq
            if r2["query"] == "COMPRESSION" and r2["alp_speedup"]
            and "thr" in r2["parallelism"]]
    if cenc:
        lines.append(
            "| competitor ENCODES (table-6 COMP column) | "
            "ALP-relative ratios "
            + ", ".join(f"{r2['scheme'].split(' ')[0]}:"
                        f"{r2['alp_speedup']}x"
                        for r2 in cenc if "1 thr" in r2["parallelism"])
            + " | reference COMP1: Patas 3.54x, Zstd 9.60x, PDE 129x "
            "slower than ALP | verified (native chunked encoders, "
            "OpenMP 1/8/16 threads) |")
    lines += [
        "",
        "## Compression ratio",
        "",
        "| Suite | Status |",
        "|---|---|",
        "| 30-double suite vs published table_4 | sample-level rows "
        "verified in-image (tables/table_4.md, `*` = sample); full-data "
        "rows **data-gated** on ALP_DATASET_DIR_PATH |",
        "| 28 alp_result.hpp golden ratio strings | **data-gated** — "
        "tests/test_golden_ratio.py hard-asserts them when the corpus "
        "is mounted; in this image they SKIP (28 skips = unverified, "
        "not passing) |",
        "| issue-24 goldens (32.20 / 33.56) | verified in-image |",
        "| float SP / hurricane suites (table_7) | **data-gated**; "
        "published parity targets carried in tables/table_7.md |",
        "",
        "## Multi-chip",
        "",
        "| Claim | Status |",
        "|---|---|",
        "| sharded container compress/decompress byte-identical at "
        "1/2/4/8 devices, mixed ALP+RD, sharded pushdown COUNT and "
        "exact-SUM | verified on 8 virtual CPU devices "
        "(dryrun_multichip; MULTICHIP_r*.json) |",
        "| mesh decode at full per-shard rate on real hardware | "
        "functional-only beyond 1 chip — mesh=1 real-chip shard_map "
        "matches the bare kernel (e2e_mesh_real_chip.csv); scaling "
        "beyond one chip is extrapolated (single-chip environment) |",
    ]
    with open(os.path.join(ROOT, "PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote PARITY.md ({len(lines)} lines)")
    if not os.environ.get("ALP_DATASET_DIR_PATH"):
        print("NOTE: full-corpus golden-ratio asserts are UNVERIFIED in "
              "this image (28 skips); mount ALP_DATASET_DIR_PATH to "
              "execute them.")


if __name__ == "__main__":
    main()
