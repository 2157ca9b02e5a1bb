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
    order = rw.desired_order(names, green={"q_a", "q_c"})
    assert order == ["q_b", "q_d", "q_a", "q_c"]


def test_regression_mode_ranks_risk_prefixes_first():
    names = ["q_filter", "q_stream_hourly", "q_pagerank", "q_select"]
    order = rw.desired_order(names, green=set(names))
    # iterative graph before streaming before plain scans
    assert order[0] == "q_pagerank"
    assert order[1] == "q_stream_hourly"
    assert set(order[2:]) == {"q_filter", "q_select"}


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
