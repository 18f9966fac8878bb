"""Driver-window re-audit hygiene: print the latest-green-round age
distribution over every registered query (VERDICT r8 item 6).

The driver's ~50-row correctness window re-audits the stalest slice
each round (see __spark_entry__._ordered).  At 230+ queries the
rotation cycles in ~5 rounds; this prints min/median green round and
the per-round histogram so surface growth that stretches re-audit
latency past the rot horizon is visible, one line per round in
ROUND_NOTES.

Usage: python tools/green_age.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as e

    latest = e._latest_green_rounds()
    names = list(e.queries())
    never = [n for n in names if n not in latest]
    rounds = sorted(latest[n] for n in names if n in latest)
    hist = Counter(rounds)
    cur = max(rounds) if rounds else 0
    print(f"queries registered: {len(names)}")
    print(f"never green (new this round, sort first in window): {never}")
    if rounds:
        med = rounds[len(rounds) // 2]
        print(
            f"latest-green rounds: min r{rounds[0]} median r{med} "
            f"max r{cur}"
        )
        print(
            "histogram: "
            + "  ".join(f"r{r}:{hist[r]}" for r in sorted(hist))
        )
        # rot horizon: with a ~50-row window the oldest green should
        # never lag the current round by more than ceil(n/50)+1 rounds
        lag = cur - rounds[0]
        budget = (len(names) + 49) // 50 + 1
        status = "OK" if lag <= budget else "STRETCHED"
        print(
            f"re-audit lag: {lag} rounds (budget {budget} at ~50/round) "
            f"-> {status}"
        )


if __name__ == "__main__":
    main()
