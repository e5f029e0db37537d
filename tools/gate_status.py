"""Cross-round driver-gate coverage report.

Prints, for the current registry: the driver-green union across all
CORRECTNESS_r*.json rounds, the rows inside the current 50-row window,
and the rows still waiting — the numbers VERDICT r03/r04 tracked by hand.

Usage: python tools/gate_status.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50
ROWS_ONLY = {"ann_lsh_topk", "ann_pq_topk"}


def main() -> None:
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    green: dict[str, str] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = p.stem.replace("CORRECTNESS_", "")
        for name, rec in json.loads(p.read_text()).items():
            if not isinstance(rec, dict) or rec.get("err"):
                continue
            if rec.get("rows_match") and rec.get("schema_match") is not False:
                green.setdefault(name, rnd)

    window = names[:WINDOW]
    oracled = [n for n in names if n not in ROWS_ONLY]
    never = [n for n in oracled if n not in green]
    wasted = [n for n in window if n in green and n not in ROWS_ONLY]

    print(f"registry rows:            {len(names)}")
    print(f"  oracled (gateable):     {len(oracled)}")
    print(f"  rows-only by design:    {len(ROWS_ONLY)}")
    print(f"driver-green union:       {len(green)} "
          f"({100 * len(green) // len(oracled)}% of gateable)")
    print(f"never driver-verified:    {len(never)}")
    print(f"window slots on un-green: {WINDOW - len(wasted)}/{WINDOW}"
          + (f"  (wasted on green: {wasted})" if wasted else ""))
    in_window_never = [n for n in window if n in never]
    print(f"un-green rows in window:  {len(in_window_never)}")
    waiting = [n for n in never if n not in window]
    print(f"waiting outside window:   {len(waiting)}")
    if "-v" in sys.argv:
        for n in names:
            mark = green.get(n, "WINDOW" if n in window else
                             ("rows-only" if n in ROWS_ONLY else "waiting"))
            print(f"  {n:28s} {mark}")


if __name__ == "__main__":
    main()
