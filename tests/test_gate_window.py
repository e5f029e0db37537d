"""Gate-window tripwire (VERDICT r03 "Next round" #7).

The driver's correctness gate records only the first 50 rows of
``queries()`` iteration order.  Round 3 silently rotated 21 rows out of
every window, leaving them without a driver-green record in any round.
This test makes that failure mode loud: every registry row must either
sit inside the current 50-row window or already have a green row in some
``CORRECTNESS_r*.json``.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50

# Rows-only by design (no DuckDB oracle => the driver records err=no_oracle
# and they can never enter the green union).  Their correctness is gated by
# the hash-checked companion rows ann_lsh_recall / ann_pq_recall plus pytest
# recall oracles, so they do not need to occupy gate-window slots forever.
ROWS_ONLY_EXEMPT = {"ann_lsh_topk", "ann_pq_topk"}


def _registry_names() -> list[str]:
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def _green_union() -> set[str]:
    out: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        data = json.loads(p.read_text())
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("err"):
                continue
            if rec.get("rows_match") and rec.get("schema_match") is not False:
                out.add(name)
    return out


def test_priority_names_exist():
    import __spark_entry__ as entry

    names = set(_registry_names())
    missing = [n for n in entry._GATE_PRIORITY if n not in names]
    assert not missing, f"_GATE_PRIORITY names absent from registry: {missing}"


def test_every_row_windowed_or_already_green():
    """No wasted slot, no silent rotation: while ANY un-green row sits
    outside the window, every window slot must be spent on an un-green
    row.  When there are <= WINDOW un-green rows, all of them must be
    inside the window.  (More than WINDOW un-green rows can only happen
    when a round adds more new rows than free slots — the overflow rows
    then wait for the next round's rotation, which this test enforces by
    keeping the window saturated with un-green rows.)"""
    names = _registry_names()
    window = [n for n in names[:WINDOW] if n not in ROWS_ONLY_EXEMPT]
    green = _green_union()
    ungreen = [
        n for n in names if n not in green and n not in ROWS_ONLY_EXEMPT
    ]
    if len(ungreen) <= WINDOW:
        uncovered = [n for n in ungreen if n not in set(window)]
        assert not uncovered, (
            f"{len(uncovered)} un-green registry rows are outside the "
            f"driver's {WINDOW}-row gate window even though the window has "
            f"room for all of them — reorder _GATE_PRIORITY in "
            f"__spark_entry__.py: {uncovered}"
        )
    else:
        wasted = [n for n in window if n in green]
        assert not wasted, (
            f"{len(wasted)} window slots are spent on already-green rows "
            f"while {len(ungreen) - WINDOW} un-green rows wait outside — "
            f"reorder _GATE_PRIORITY in __spark_entry__.py: {wasted}"
        )


def test_exempt_rows_are_genuinely_rows_only():
    """The exemption is only for rows that CANNOT go green (no oracle).
    If someone adds an oracle to an exempted row, it must rejoin the
    window rotation instead of staying exempt."""
    import __spark_entry__ as entry

    oracled = set(entry.oracle_sql().keys())
    bad = sorted(ROWS_ONLY_EXEMPT & oracled)
    assert not bad, f"exempted rows now HAVE oracles — un-exempt them: {bad}"


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as entry

    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert o <= q, f"oracle_sql keys without a queries() row: {sorted(o - q)}"
