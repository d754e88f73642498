"""Regenerate README.md's benchmark table from a bench artifact.

One source of truth for the repo's performance claims: the driver (or a
manual run) produces JSON lines from ``bench.py``; this script rewrites the
table between the BENCH-TABLE markers in README.md from those rows, and
prints the refreshed table for the commit message.

Usage:
    python bench.py > /tmp/bench.jsonl            # on the TPU
    python scripts/update_readme_table.py /tmp/bench.jsonl [--date=YYYY-MM-DD]

Accepts either raw ``bench.py`` stdout (JSON lines, '#' comments ignored)
or a driver ``BENCH_r0N.json`` wrapper whose "tail" field embeds the lines.
"""

import json
import re
import sys
from pathlib import Path

README = Path(__file__).resolve().parent.parent / "README.md"
BEGIN = "<!-- BENCH-TABLE-BEGIN -->"
END = "<!-- BENCH-TABLE-END -->"

# reference baselines (BASELINE.md rows; topN qps is measured live by
# bench.py and carried inside the row itself)
ROWS = [
    ("pg_fit_wall_s", "pg fit (k=10, niter=10, maxupd=1)", 6.17, "s"),
    ("cg_fit_wall_s", "cg fit (k=50, niter=30, maxupd=5)", 236.0, "s"),
    ("tncg_fit_wall_s", "tncg fit (k=50, niter=10, maxupd=750)", 359.0,
     "s"),
    ("topn_qps", "topN queries/sec (full catalog, top-10)", None, "qps"),
]


def parse_rows(text):
    """metric -> row dict from JSON lines (ignores comments/noise)."""
    out = {}
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in row:
            out[row["metric"]] = row
    return out


def load(path):
    text = Path(path).read_text()
    try:  # driver wrapper: {"n": .., "tail": "..."} with embedded lines
        wrapper = json.loads(text)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            text = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    return parse_rows(text)


def fmt_row(label, baseline, row, unit):
    val = row["value"]
    vs = row.get("vs_baseline")
    gbs = row.get("achieved_gbs")
    if unit == "qps":
        ref = row.get("ref_qps", baseline)
        ref_s = f"{ref:,.0f} qps" if ref else "n/a"
        return (f"| {label} | {ref_s} | {val:,.0f} qps | "
                f"~{vs:,.0f}× |")
    extra = f" ({gbs:.0f} GB/s)" if gbs else ""
    base_s = f"{baseline:.2f} s" if baseline < 100 else f"{baseline:.0f} s"
    return (f"| {label} | {base_s} | {val:.1f} s | "
            f"{vs:.1f}×{extra} |")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    date = None
    for a in sys.argv[1:]:
        if a.startswith("--date="):
            date = a.split("=", 1)[1]
    if not args:
        sys.exit("usage: update_readme_table.py <bench.jsonl> "
                 "[--date=YYYY-MM-DD]")
    rows = load(args[0])
    missing = [m for m, *_ in ROWS if m not in rows]
    if missing:
        sys.exit(f"artifact lacks rows for: {missing} — refusing to write "
                 "a partial table")
    lines = ["| benchmark | reference | poismf-tpu (median) | speedup |",
             "|---|---|---|---|"]
    for metric, label, baseline, unit in ROWS:
        lines.append(fmt_row(label, baseline, rows[metric], unit))
    table = "\n".join(lines)

    text = README.read_text()
    if BEGIN not in text or END not in text:
        sys.exit("README.md lacks BENCH-TABLE markers")
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        BEGIN + "\n" + table + "\n" + END,
        text,
        flags=re.S,
    )
    if date:
        new = re.sub(r"runs on \d{4}-\d{2}-\d{2}\)", f"runs on {date})",
                     new)
    README.write_text(new)
    print(table)


if __name__ == "__main__":
    main()
