"""Window-rotation helper invariants (scripts/rotate_window.py)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "rotate_window.py",
    ),
)
rw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rw)


def test_rotation_mode_puts_pending_first_in_registry_order():
    names = ["q_a", "q_b", "q_c", "q_d"]
    order = rw.desired_order(
        names, last_green={"q_a": "r03", "q_c": "r05"}, priority=[]
    )
    assert order[:2] == ["q_b", "q_d"]  # pending, registry order
    assert set(order[2:]) == {"q_a", "q_c"}


def test_regression_mode_ranks_stalest_risky_first():
    names = ["q_filter", "q_stream_hourly", "q_pagerank", "q_select"]
    last = {
        "q_filter": "r03",  # calm, stalest overall
        "q_stream_hourly": "r04",
        "q_pagerank": "r06",
        "q_select": "r07",
    }
    order = rw.desired_order(names, last_green=last, priority=[])
    # risky families ordered stalest-last-driver-row first, then risk
    # rank; calm queries after, stalest first
    assert order == ["q_stream_hourly", "q_pagerank", "q_filter", "q_select"]


def test_priority_names_slot_after_pending():
    names = ["q_a", "q_b", "q_stream_x", "q_pagerank"]
    last = {n: "r05" for n in names if n != "q_b"}
    order = rw.desired_order(
        names, last_green=last, priority=["q_a", "q_stream_x"]
    )
    assert order == ["q_b", "q_a", "q_stream_x", "q_pagerank"]


def test_priority_file_expires_once_its_round_is_graded(tmp_path, monkeypatch):
    pf = tmp_path / "window_priority.txt"
    pf.write_text("@round r09\nq_lpa_communities\n")
    monkeypatch.setattr(rw, "PRIORITY_FILE", str(pf))
    assert rw._priority(latest_round=8) == ["q_lpa_communities"]
    assert rw._priority(latest_round=9) == []  # spent
    assert rw._priority(latest_round=12) == []
    pf.write_text("q_lpa_communities\n")  # no directive → hard error
    import pytest

    with pytest.raises(SystemExit, match="@round"):
        rw._priority(latest_round=8)


def test_apply_roundtrip_is_idempotent_on_current_registry():
    """Applying the current desired order to the current dict block must
    reproduce it byte-for-byte when the registry is already rotated —
    guards the regex surgery against dict-format drift."""
    import re

    with open(rw.ENTRY) as fh:
        src = fh.read()
    m = re.search(
        r"(def queries\(\)[^\n]*\n    return \{\n)"
        r"((?:        \"q_\w+\": q_\w+,\n)+)(    \})",
        src,
    )
    assert m, "queries() dict block not found — rotate_window regex is stale"
    existing = dict(re.findall(r"\"(q_\w+)\": (q_\w+),", m.group(2)))
    import __spark_entry__ as entry

    assert set(existing) == set(entry.queries().keys())


def test_age_backstop_jumps_risk_ranking():
    # q_select (calm) last green r03 would age to 7 rounds if skipped in
    # r10 — it must outrank a fresher risky query despite its calm class
    names = ["q_pagerank", "q_select", "q_stream_x"]
    last = {"q_pagerank": "r08", "q_select": "r03", "q_stream_x": "r07"}
    order = rw.desired_order(names, last_green=last, priority=[], next_round=10)
    assert order[0] == "q_select"  # overdue bucket ahead of risky
    assert order[1:] == ["q_stream_x", "q_pagerank"]


def test_age_backstop_orders_overdue_stalest_first():
    names = ["q_a", "q_b", "q_c"]
    last = {"q_a": "r02", "q_b": "r01", "q_c": "r09"}
    order = rw.desired_order(names, last_green=last, priority=[], next_round=10)
    assert order == ["q_b", "q_a", "q_c"]


def test_backstop_outranks_pending_and_priority():
    # VERDICT r11 item 1: new queries consumed backstop slots and 18
    # rows aged past the bound.  Overdue must now take the FIRST slots.
    names = ["q_new", "q_changed", "q_old", "q_fresh"]
    last = {"q_changed": "r09", "q_old": "r03", "q_fresh": "r09"}
    order = rw.desired_order(
        names, last_green=last, priority=["q_changed"], next_round=10
    )
    assert order == ["q_old", "q_new", "q_changed", "q_fresh"]


def test_staleness_bound_scales_with_registry_size():
    assert rw.staleness_bound(261) == 6
    assert rw.staleness_bound(300) == 6
    assert rw.staleness_bound(301) == 7
    assert rw.staleness_bound(10) == 6  # floor


def test_backstop_not_triggered_inside_bound():
    names = ["q_select", "q_pagerank"]
    last = {"q_select": "r05", "q_pagerank": "r08"}
    # ages if skipped: 5 and 2 — both inside the bound, risky first
    order = rw.desired_order(names, last_green=last, priority=[], next_round=10)
    assert order == ["q_pagerank", "q_select"]
