"""VERIFIED.md ledger invariants (VERDICT r4 items 1-2).

The ledger records, per `queries()` entry, the first round whose driver
CORRECTNESS file was all-green for it.  These tests keep the rotation
honest: every query is in the ledger, every ledger row is a real query,
and while any query is still `pending` the first 50 slots of `queries()`
(the driver's correctness window) are reserved for pending ones.
"""

import json
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _ledger():
    rows = {}
    for line in (ROOT / "VERIFIED.md").read_text().splitlines():
        m = re.match(r"\| (q_\w+) \| (\w+) \|", line)
        if m:
            rows[m.group(1)] = m.group(2)
    return rows


def _query_names():
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def test_ledger_covers_every_query():
    ledger = _ledger()
    names = _query_names()
    assert set(ledger) == set(names), (
        f"ledger/queries mismatch: only-ledger={set(ledger) - set(names)}, "
        f"only-queries={set(names) - set(ledger)}"
    )


def test_ledger_rounds_are_real():
    correctness = {
        p.name[len("CORRECTNESS_") : -len(".json")]: json.loads(p.read_text())
        for p in ROOT.glob("CORRECTNESS_r*.json")
    }
    for q, rnd in _ledger().items():
        if rnd == "pending":
            continue
        assert rnd in correctness, f"{q}: ledger cites unknown round {rnd}"
        row = correctness[rnd].get(q)
        assert row is not None, f"{q}: no row in CORRECTNESS_{rnd}.json"
        assert (
            row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        ), f"{q}: CORRECTNESS_{rnd}.json row is not all-green"


def test_pending_queries_fill_the_driver_window():
    ledger = _ledger()
    names = _query_names()
    pending = [n for n in names if ledger.get(n) == "pending"]
    if not pending:
        return  # rotation complete
    window = names[: min(50, len(pending))]
    stale = [n for n in window if ledger.get(n) != "pending"]
    assert not stale, (
        "already-verified queries occupy driver window slots while "
        f"{len(pending)} are still pending: {stale}"
    )


def test_readme_query_count_matches_registry():
    """README's advertised query count must track len(queries()) —
    a stale scorecard erodes trust in every other claim (VERDICT r5
    item 7)."""
    n = len(_query_names())
    readme = (ROOT / "README.md").read_text()
    counts = {int(m) for m in re.findall(r"(\d+) queries", readme)}
    assert counts == {n}, f"README says {counts}, registry has {n}"
