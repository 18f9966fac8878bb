"""Per-query scaling exponents from two full bench records.

VERDICT r9 item 1: the 100 TB claim needs full-surface sf10 evidence,
not per-family probes.  This reads two bench records (same harness,
different SF dirs), computes exp = log(t2/t1) / log(sf2/sf1) per query
— 1.0 = wall time linear in corpus size, < 1 sublinear — and prints a
markdown table plus the flag list (exponent > FLAG) that becomes the
next round's work queue.

WHICH COLUMN: warm by default.  Cold timings at the small scale are
dominated by per-family first-touch costs (codegen, parquet footers,
fitted-artifact caches) that amortize away at the large scale, which
manufactures phantom sublinearity; warm-vs-warm compares the steady
-state plans.  Pass --cold to see both framings.

Usage: python tools/scale_exponents.py BENCH_sf1.json BENCH_sf10.json \
           [sf1] [sf10] [--cold]
"""

from __future__ import annotations

import json
import math
import sys

FLAG = 1.1
# below this wall time the reading is scheduler noise, not a plan
# property — a 0.2 s -> 0.9 s "exponent 1.5" is not a scale risk
MIN_SEC = 1.0


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--cold"]
    use_cold = "--cold" in sys.argv
    f1, f2 = args[0], args[1]
    sf1 = float(args[2]) if len(args) > 2 else None
    sf2 = float(args[3]) if len(args) > 3 else None
    r1, r2 = json.load(open(f1)), json.load(open(f2))
    sf1 = sf1 if sf1 is not None else float(r1["sf"])
    sf2 = sf2 if sf2 is not None else float(r2["sf"])
    if sf1 == sf2:  # ADVICE r10: two same-scale records -> log(1) = 0
        sys.exit(
            f"error: both records are at sf={sf1:g} — exponents need two "
            "DIFFERENT scales (pass explicit sf overrides if the records "
            "mislabel theirs)"
        )
    key = "queries" if use_cold else "queries_warm"
    q1, q2 = r1[key], r2[key]
    ratio = math.log10(sf2 / sf1)
    common = sorted(set(q1) & set(q2))
    missing = sorted(set(q1) ^ set(q2))
    # warm rows the records self-flagged as cache-eviction churn, not
    # plan cost (bench.py stamps warm > 1.25x cold as warm_invalid) —
    # an exponent over an invalid warm reading is a phantom flag
    invalid = set()
    if not use_cold:
        invalid = set(r1.get("warm_invalid") or []) | set(
            r2.get("warm_invalid") or []
        )
        skipped_invalid = sorted(set(common) & invalid)
        common = [n for n in common if n not in invalid]
    rows = []
    for name in common:
        t1, t2 = q1[name], q2[name]
        exp = math.log10(max(t2, 1e-4) / max(t1, 1e-4)) / ratio
        rows.append((name, t1, t2, round(exp, 2)))
    rows.sort(key=lambda r: -r[3])
    flagged = [
        r for r in rows if r[3] > FLAG and (r[1] >= MIN_SEC or r[2] >= MIN_SEC)
    ]
    col = "cold" if use_cold else "warm"
    print(
        f"# sf{sf1:g} -> sf{sf2:g} scaling exponents ({col} timings, "
        f"{len(common)} queries)"
    )
    print(
        f"loads: {f1} load_1m={r1.get('load_1m')} / "
        f"{f2} load_1m={r2.get('load_1m')}"
    )
    if missing:
        print(f"NOT in both records (skipped): {missing}")
    if invalid:
        print(
            "warm_invalid in a record (cache-churn reading, skipped): "
            f"{skipped_invalid} — use --cold or an isolated probe for these"
        )
    print(f"\n## flagged: exponent > {FLAG} (and >= {MIN_SEC}s somewhere)")
    print(f"| query | sf{sf1:g} s | sf{sf2:g} s | exponent |")
    print("|---|---|---|---|")
    for name, t1, t2, exp in flagged:
        print(f"| {name} | {t1} | {t2} | {exp} |")
    if not flagged:
        print("| (none) | | | |")
    print("\n## full table (exponent DESC)")
    print(f"| query | sf{sf1:g} s | sf{sf2:g} s | exponent |")
    print("|---|---|---|---|")
    for name, t1, t2, exp in rows:
        print(f"| {name} | {t1} | {t2} | {exp} |")
    exps = [r[3] for r in rows]
    exps.sort()
    med = exps[len(exps) // 2]
    print(
        f"\nsummary: median exponent {med}, max "
        f"{rows[0][3]} ({rows[0][0]}), flagged {len(flagged)}"
    )


if __name__ == "__main__":
    main()
