"""Gate-evidence freshness report: for every registry query, the newest
round whose CORRECTNESS_r*.json recorded a green driver row. Green means
hash_match when a hash was recorded; rows_match is only a FALLBACK when
hash_match is null (non-SQL-expressible ops) — a row with hash_match=False
never counts green, even if row counts agreed. This is the input to each
round's rotation decision (COVERAGE.md §gate) — run it at round start to
pick the next head.

Usage: python scripts/freshness.py [--stale-only]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orc_spark.plans import registry  # noqa: E402


def newest_green() -> dict[str, int]:
    out: dict[str, int] = {}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("r")[1].split(".")[0])
        for name, res in json.load(open(f)).items():
            ok = (
                res.get("hash_match")
                if res.get("hash_match") is not None
                else res.get("rows_match")
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    stale_only = "--stale-only" in sys.argv
    green = newest_green()
    names = list(registry())
    hist: dict[int, int] = {}
    for n in names:
        hist[green.get(n, 0)] = hist.get(green.get(n, 0), 0) + 1
    print("freshness histogram (0 = no green driver row ever):")
    for rnd in sorted(hist):
        print(f"  r{rnd:02d}: {hist[rnd]}")
    floor = min((r for r in hist if r > 0), default=0)
    if stale_only:
        print(f"\nqueries at the floor (r{floor:02d}) or with no row, registry order:")
    else:
        print("\nall queries, registry order:")
    for n in names:
        r = green.get(n, 0)
        if stale_only and r not in (0, floor):
            continue
        print(f"  {n}: {'NONE' if r == 0 else f'r{r:02d}'}")


if __name__ == "__main__":
    main()
