"""Generate paper-table analogs from the results/ CSVs.

* table_4: per-dataset compression ratio, measured ALP + XOR-family +
  zlib alongside the published Zstd/Elf/ALP full-data numbers
  (reference publication/tables/table_4.md, generate_tables.py).
* table_6: end-to-end query speeds + ALP speedup factors
  (reference publication/tables/table_6.md) from e2e_queries.csv.
* table_7: float (f32) suites when their corpora are mounted
  (reference publication/tables/table_7.md).

Run: python scripts/make_tables.py   (pure CSV -> markdown, no compute)
"""

import csv
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
RESULTS = os.path.join(ROOT, "results")
OUT = os.path.join(RESULTS, "tables")


def read_csv(name):
    path = os.path.join(RESULTS, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return list(csv.DictReader(f))


def write_md(name, lines):
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, name), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {name} ({len(lines)} lines)")


def table_4():
    rows = read_csv("compression_ratio_double.csv")
    if not rows:
        return
    # measured codec columns (dynamic: "zstd" when libzstd was bound,
    # "zlib" stand-in otherwise)
    gp = "zstd" if "zstd" in rows[0] else "zlib"
    cols = ["gorillas", "chimp", "chimp128", "patas", "elf", gp]
    heads = ["Gor", "Ch", "Ch128", "Patas", "Elf",
             "Zstd" if gp == "zstd" else "zlib"]
    if "elf" not in rows[0]:     # older CSVs without the measured column
        cols.remove("elf")
        heads.remove("Elf")
    lines = [
        "# Table 4 analog — compression ratio, 30-double suite "
        "(bits/value)",
        "",
        "Cells marked `*` were measured on the shipped 1024-value "
        "sample, not the full corpus (mount `ALP_DATASET_DIR_PATH` for "
        "full-data runs) — sample rows are NOT comparable to the "
        "published full-data columns.  `*_pub` columns are the "
        "reference paper's full-data results (table_4.md); Elf, Zstd "
        "and ALP have measured columns with Elf_pub/Zstd_pub/ALP_pub "
        "as their full-data parity targets (Elf measured by "
        "alp_tpu.competitors.elf_codec, a behavioral reimplementation "
        "of the reference's Java artifact).",
        "",
        "| Dataset | " + " | ".join(heads) + " | Zstd_pub | "
        "Elf_pub | ALP (ours) | ALP_pub |",
        "|---|" + "---|" * (len(cols) + 4),
    ]
    sums = {c: 0.0 for c in cols + ["alp", "zstd_p", "elf_p", "alp_p"]}
    n = 0
    n_sample = 0
    for r in rows:
        flag = "*" if r.get("source", "sample") == "sample" else ""
        n_sample += bool(flag)
        lines.append(
            f"| {r['column']} | " +
            " | ".join(r[c] + flag for c in cols) +
            f" | {r.get('zstd_published', '')} "
            f"| {r.get('elf_published', '')} "
            f"| {r['alp_bits_per_value']}{flag} "
            f"| {r.get('alp_published', '')} |")
        n += 1
        for c in cols:
            sums[c] += float(r[c])
        sums["alp"] += float(r["alp_bits_per_value"])
        for k, f_ in (("zstd_p", "zstd_published"),
                      ("elf_p", "elf_published"),
                      ("alp_p", "alp_published")):
            v = r.get(f_, "")
            sums[k] += float(v) if v else 0.0
    if n:
        aflag = "*" if n_sample else ""
        lines.append(
            "| **AVG** | " +
            " | ".join(f"{sums[c]/n:.2f}{aflag}" for c in cols) +
            f" | {sums['zstd_p']/n:.2f} | {sums['elf_p']/n:.2f} "
            f"| {sums['alp']/n:.2f}{aflag} | {sums['alp_p']/n:.2f} |")
        if n_sample:
            lines += ["",
                      f"`*` = sample-level measurement ({n_sample}/{n} "
                      "rows); the AVG over sample rows is a sample "
                      "artifact, not a full-data result."]
    write_md("table_4.md", lines)


def table_6():
    rows = read_csv("e2e_queries.csv")
    if not rows:
        return
    lines = [
        "# Table 6 analog — end-to-end query speed",
        "",
        "ALP queries run fused on one TPU chip; competitor decodes are "
        "the native single-core C++ codecs (native/competitors.cpp) — "
        "the same codec class the reference benchmarks "
        "(publication/tables/table_6.md: ALP 59.3x faster than Chimp "
        "at one thread).",
        "",
        "| Query | Scheme | Parallelism | GB/s | ALP speedup |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['query']} | {r['scheme']} | "
                     f"{r['parallelism']} | {r['gbps']} | "
                     f"{r['alp_speedup']} |")
    write_md("table_6.md", lines)


def table_7():
    from alp_tpu.utils import published as pub
    lines = [
        "# Table 7 analog — float (f32) suites (bits/value)",
        "",
    ]
    for name, label in (("compression_ratio_float_test.csv",
                         "float test set (samples)"),
                        ("compression_ratio_sp.csv", "ML weights (SP)"),
                        ("compression_ratio_hurricane_isabel.csv",
                         "Hurricane Isabel")):
        rows = read_csv(name)
        if not rows:
            continue
        gp = "zstd" if "zstd" in rows[0] else "zlib"
        lines += [f"## {label}", "",
                  f"| Dataset | ALP (ours) | Ch128 | Patas | {gp} |",
                  "|---|---|---|---|---|"]
        for r in rows:
            flag = "*" if r.get("source", "sample") == "sample" else ""
            lines.append(f"| {r['column']} | "
                         f"{r['alp_bits_per_value']}{flag} | "
                         f"{r['chimp128']}{flag} | {r['patas']}{flag} | "
                         f"{r[gp]}{flag} |")
        lines.append("")
    # published parity targets — carried unconditionally, like table_4's
    # *_pub columns, so the SP / hurricane suites have an explicit bar
    # even while their corpora are data-gated (binaries not in-image)
    sp_meas = {r["column"]: r
               for r in (read_csv("compression_ratio_sp.csv") or [])}
    lines += [
        "## ML weights (SP) — published parity targets",
        "",
        "Reference publication/tables/table_7.md (paper cost model) and "
        "benchmarks/result/.../sp_dataset.csv (runner cost model).  "
        "Measured rows appear when the SP corpus is mounted.",
        "",
        "| Dataset | alp_pub (paper) | alp_pub (runner) | alp (ours) | "
        "gor_pub | chimp_pub | ch128_pub | patas_pub | zstd_pub |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for ds, (g, ch, c128, pat, alp, zs) in pub.TABLE_7_SP.items():
        ours = sp_meas.get(ds, {}).get("alp_bits_per_value", "data-gated")
        lines.append(f"| {ds} | {alp} | {pub.SP_ALP_RUNNER[ds]} | {ours} "
                     f"| {g} | {ch} | {c128} | {pat} | {zs} |")
    hur_meas = {r["column"]: r for r in (read_csv(
        "compression_ratio_hurricane_isabel.csv") or [])}
    lines += [
        "",
        "## Hurricane Isabel — published parity targets (runner model)",
        "",
        "| Dataset | alp_pub | alp (ours) |",
        "|---|---|---|",
    ]
    for ds, alp in pub.HURRICANE_ALP_RUNNER.items():
        ours = hur_meas.get(ds, {}).get("alp_bits_per_value",
                                        "data-gated")
        lines.append(f"| {ds} | {alp} | {ours} |")
    write_md("table_7.md", lines)


if __name__ == "__main__":
    table_4()
    table_6()
    table_7()
