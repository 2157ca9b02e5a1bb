"""Rotate the driver's 50-query correctness window.

The driver grades the FIRST 50 entries of ``queries()`` each round, so
the registry dict's key order IS the window.  This script recomputes the
desired order and rewrites the dict block in ``__spark_entry__.py``:

1. While any query is still ``pending`` (no all-green driver row in any
   CORRECTNESS_r*.json): pending queries first, in current registry
   order, then everything else — VERDICT r4 item 1's rotation.
2. Once the rotation is complete (0 pending): the window becomes a
   REGRESSION window (VERDICT r5 item 5) — the highest-risk queries
   (iterative graph loops, streaming drains, ANN/LSH and dedup
   families, per ``RISK_PREFIXES``) fill the first slots so later
   rounds re-verify them instead of only first-verifying.

Usage:
    python scripts/rotate_window.py            # dry run: print the order
    python scripts/rotate_window.py --apply    # rewrite __spark_entry__.py

Run ``scripts/update_verified.py`` first so the ledger reflects the
latest CORRECTNESS file, and again after --apply so the totals line
matches the new window.  tests/test_verified_ledger.py enforces the
invariants either way.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ENTRY = os.path.join(ROOT, "__spark_entry__.py")

#: regression-window risk ranking (first match wins, earlier = riskier):
#: iterative loops and stateful streaming break in ways single-pass scans
#: do not; ANN/LSH and dedup depend on cross-engine hash parity.
RISK_PREFIXES = [
    "q_lpa", "q_pagerank", "q_hits", "q_kcore", "q_wl", "q_shortest",
    "q_harmonic", "q_triangles", "q_link_prediction", "q_components",
    "q_neardup", "q_stream_", "q_ann_", "q_minhash", "q_simhash",
    "q_semantic", "q_knn", "q_lsh", "q_dedup", "q_kcenter",
    "q_intrinsic", "q_hll", "q_kll", "q_theta", "q_cms", "q_bloom",
    "q_hybrid", "q_bm25", "q_record_linkage", "q_radius",
]


def _green() -> set[str]:
    out: set[str] = set()
    for f in os.listdir(ROOT):
        if not re.match(r"CORRECTNESS_r\d+\.json", f):
            continue
        with open(os.path.join(ROOT, f)) as fh:
            for q, v in json.load(fh).items():
                if (
                    v.get("rows_match")
                    and v.get("schema_match")
                    and v.get("hash_match")
                ):
                    out.add(q)
    return out


def _risk_rank(name: str) -> tuple[int, str]:
    for i, p in enumerate(RISK_PREFIXES):
        if name.startswith(p):
            return (i, name)
    return (len(RISK_PREFIXES), name)


def desired_order(names: list[str], green: set[str]) -> list[str]:
    pending = [n for n in names if n not in green]
    if pending:
        return pending + [n for n in names if n in green]
    return sorted(names, key=_risk_rank)


def main() -> None:
    import __spark_entry__ as entry

    names = list(entry.queries().keys())
    order = desired_order(names, _green())
    n_pending = sum(1 for n in names if n not in _green())
    mode = "rotation" if n_pending else "regression"
    print(f"{mode} window ({n_pending} pending); first 50:")
    for n in order[:50]:
        print(f"  {n}")
    if "--apply" not in sys.argv:
        print("\ndry run — pass --apply to rewrite __spark_entry__.py")
        return

    with open(ENTRY) as fh:
        src = fh.read()
    # the queries() body is a literal dict of "name": name lines
    m = re.search(
        r"(def queries\(\)[^\n]*\n    return \{\n)((?:        \"q_\w+\": q_\w+,\n)+)(    \})",
        src,
    )
    if not m:
        raise SystemExit("could not locate the queries() dict block")
    existing = dict(
        re.findall(r"\"(q_\w+)\": (q_\w+),", m.group(2))
    )
    if set(existing) != set(names):
        raise SystemExit("dict block does not match queries() — aborting")
    body = "".join(f'        "{n}": {existing[n]},\n' for n in order)
    src = src[: m.start(2)] + body + src[m.end(2) :]
    with open(ENTRY, "w") as fh:
        fh.write(src)
    print(f"\nrewrote {ENTRY} ({mode} order)")


if __name__ == "__main__":
    main()
