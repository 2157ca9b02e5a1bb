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


def test_registry_order_matches_rotation_policy():
    """The queries() dict order IS the driver window; its first 50
    slots must match scripts/rotate_window.py's desired order — since
    VERDICT r11 item 1 that means the AGE BACKSTOP leads (overdue
    queries take the first slots; pending/new queries follow and can
    no longer displace them)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "rotate_window", str(ROOT / "scripts" / "rotate_window.py")
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)
    spec2 = importlib.util.spec_from_file_location(
        "update_verified", str(ROOT / "scripts" / "update_verified.py")
    )
    uv = importlib.util.module_from_spec(spec2)
    cwd = os.getcwd()
    os.chdir(ROOT)
    try:
        spec2.loader.exec_module(uv)
        _, last_green, _ = uv.green_history()
    finally:
        os.chdir(cwd)
    latest = max((int(r[1:]) for r in last_green.values()), default=0)
    names = _query_names()
    order = rw.desired_order(
        names, last_green, rw._priority(latest)
    )
    assert names[:50] == order[:50], (
        "registry order is stale — run scripts/rotate_window.py --apply "
        "(and scripts/update_verified.py) before closing the round"
    )


def test_readme_query_count_matches_registry():
    """README's advertised query count must track len(queries()) —
    a stale scorecard erodes trust in every other claim (VERDICT r5
    item 7)."""
    n = len(_query_names())
    readme = (ROOT / "README.md").read_text()
    counts = {int(m) for m in re.findall(r"(\d+) queries", readme)}
    assert counts == {n}, f"README says {counts}, registry has {n}"
