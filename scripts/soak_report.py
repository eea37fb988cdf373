"""Build the SCALING.md full-soak ratio table from two driver_sim logs.

``driver_sim.py`` streams one line per query to stderr::

    q_name: MATCH (123 rows) [4.2s]
    q_name: rows-only, 123 rows [4.2s]

Run the harness once at 1x (sf0.1) and once at 10x (the ``synth_scale``
fixture), capture stderr of each, then::

    python scripts/soak_report.py /tmp/sim_sf01.err /tmp/sim_sf1x.err

prints a markdown table of per-query wall times and 10x/1x ratios,
sorted worst-first, plus summary stats (median/p90 ratio, total walls,
and every query whose ratio exceeds the super-linear threshold).

Spark progress bars interleave ``\r``-separated fragments into the same
stream; the parser splits on both newline and carriage return so a
MATCH line glued to a progress fragment still parses.
"""

from __future__ import annotations

import re
import statistics
import sys

LINE = re.compile(
    r"(q_[a-z0-9_]+): (?:MATCH|MISMATCH|rows-only,?) ?"
    r"\(?(\d+) rows\)? \[(\d+\.\d)s\]"
    # optional spark/oracle wall split (newer driver_sim logs)
    r"(?: \(spark (\d+\.\d)s, oracle (\d+\.\d)s\))?"
)

# ratio above which a query is flagged for explanation in SCALING.md.
# 10x rows through an O(n log n) shuffle on 2x the partitions lands
# well under this; anything above suggests a super-linear term.
SUPERLINEAR = 4.0


def parse(path: str) -> dict[str, tuple[float, int, float | None, float | None]]:
    out: dict[str, tuple[float, int, float | None, float | None]] = {}
    with open(path, errors="replace") as fh:
        text = fh.read().replace("\r", "\n")
    for m in LINE.finditer(text):
        spark_s = float(m.group(4)) if m.group(4) else None
        oracle_s = float(m.group(5)) if m.group(5) else None
        out[m.group(1)] = (float(m.group(3)), int(m.group(2)), spark_s, oracle_s)
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    one, ten = parse(sys.argv[1]), parse(sys.argv[2])
    common = sorted(set(one) & set(ten))
    missing = sorted(set(one) ^ set(ten))
    rows = []
    for q in common:
        t1, r1 = one[q][:2]
        t10, r10, sp10, or10 = ten[q]
        rows.append((t10 / max(t1, 0.05), q, t1, t10, r1, r10, sp10, or10))
    rows.sort(reverse=True)

    print("| query | 1x (s) | 10x (s) | ratio | 10x split | rows 1x -> 10x |")
    print("|---|---|---|---|---|---|")
    for ratio, q, t1, t10, r1, r10, sp10, or10 in rows:
        flag = " **!**" if ratio > SUPERLINEAR else ""
        split = (
            f"spark {sp10:.1f} / duck {or10:.1f}"
            if sp10 is not None
            else "—"
        )
        print(f"| {q} | {t1:.1f} | {t10:.1f} | {ratio:.1f}{flag} "
              f"| {split} | {r1} -> {r10} |")

    ratios = [r[0] for r in rows]
    if ratios:
        med = statistics.median(ratios)
        p90 = sorted(ratios)[int(0.9 * (len(ratios) - 1))]
        print(f"\nqueries={len(rows)} median_ratio={med:.2f} "
              f"p90_ratio={p90:.2f} "
              f"total_1x={sum(r[2] for r in rows):.0f}s "
              f"total_10x={sum(r[3] for r in rows):.0f}s "
              f"superlinear(> {SUPERLINEAR}x)="
              f"{[r[1] for r in rows if r[0] > SUPERLINEAR] or 'none'}")
    if missing:
        print(f"only-in-one-log: {missing}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
