"""Rotate the driver's 50-query correctness window.

The driver grades the FIRST 50 entries of ``queries()`` each round, so
the registry dict's key order IS the window.  This script recomputes the
desired order and rewrites the dict block in ``__spark_entry__.py``:

1. While any query is still ``pending`` (no all-green driver row in any
   CORRECTNESS_r*.json): pending queries first, in current registry
   order, then everything else — VERDICT r4 item 1's rotation.
2. Once the rotation is complete (0 pending): the window becomes a
   REGRESSION window (VERDICT r5 item 5, ranking fixed per VERDICT r8
   item 1).  Order within the regression window:

   a. age backstop FIRST (VERDICT r9 item 1, hardened per VERDICT r11
      item 1): queries whose last driver-green row would age past the
      staleness bound if skipped this round, stalest first.  The
      backstop now outranks pending/new queries and the priority file —
      r11 proved that new queries can otherwise displace the backstop
      (18 TPC-H/window rows hit staleness 7).  A new query skipped for
      a round still has its local-gate green row; a backstop query
      skipped past the bound has NO fresh hard signal.  The bound is
      ``max(6, ceil(N/50))`` — the information-theoretic floor for the
      current registry size, not a frozen constant;
   b. queries named in ``scripts/window_priority.txt`` — the builder's
      per-round channel for "this operator's code changed this round /
      has only one driver row; re-verify it" (the VERIFIED.md policy's
      "any query whose operator changed that round" clause, which the
      ledger alone cannot detect), in file order;
   c. risky families (iterative graph loops, streaming drains, ANN/LSH
      and dedup families, per ``RISK_PREFIXES``) ordered by LAST
      driver-green round ascending (stalest first), then risk rank;
   d. everything else, stalest-last-green first, then name.

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


PRIORITY_FILE = os.path.join(ROOT, "scripts", "window_priority.txt")


def _priority(latest_round: int) -> list[str]:
    """Per-round 'operator changed, re-verify' names (comments/# allowed).

    The file MUST carry an ``@round rNN`` directive naming the round
    whose window it prioritizes: once a CORRECTNESS file for that round
    (or later) exists, the priorities are spent and the file is ignored
    with a warning — stale entries must not silently pin window slots
    in later rounds."""
    if not os.path.exists(PRIORITY_FILE):
        return []
    out: list[str] = []
    tag: int | None = None
    with open(PRIORITY_FILE) as fh:
        for line in fh:
            if line.startswith("@round"):
                tag = int(line.split()[1].lstrip("r"))
                continue
            name = line.split("#", 1)[0].strip()
            if name:
                out.append(name)
    if tag is None:
        raise SystemExit(
            "window_priority.txt needs an '@round rNN' directive "
            "(the round whose window it prioritizes)"
        )
    if latest_round >= tag:
        print(
            f"window_priority.txt targets r{tag:02d} but CORRECTNESS_r"
            f"{latest_round:02d} exists — priorities are spent, ignoring"
        )
        return []
    return out


def _risk_rank(name: str) -> int:
    for i, p in enumerate(RISK_PREFIXES):
        if name.startswith(p):
            return i
    return len(RISK_PREFIXES)


#: hard age bound floor (VERDICT r9 item 1): no query's last
#: driver-green row may age past this many rounds.  The true bound for
#: N queries / 50 slots is max(MIN_STALENESS_ROUNDS, ceil(N/50)) —
#: recomputed per registry size by :func:`staleness_bound` (VERDICT r11
#: item 1: 288/50 made the frozen 6 unattainable).  Queries at or past
#: the bound take the FIRST window slots, ahead of pending and priority.
MIN_STALENESS_ROUNDS = 6


def staleness_bound(n_queries: int) -> int:
    """Age bound for the current registry: max(6, ceil(N/50))."""
    return max(MIN_STALENESS_ROUNDS, -(-n_queries // 50))


def desired_order(
    names: list[str],
    last_green: dict[str, str],
    priority: list[str],
    next_round: int | None = None,
) -> list[str]:
    pending = [n for n in names if n not in last_green]
    prio = [n for n in priority if n in last_green and n in set(names)]
    seen = set(pending) | set(prio)

    def stale(n: str) -> int:
        return int(last_green[n][1:])

    if next_round is None:
        next_round = max(
            (stale(n) for n in names if n in last_green), default=0
        ) + 1
    rest = [n for n in names if n not in seen]
    # age backstop: anything that would exceed the staleness bound if
    # skipped this round takes the FIRST slots — ahead of pending and
    # priority, which cannot displace it (VERDICT r11 item 1)
    bound = staleness_bound(len(names))
    overdue = sorted(
        (n for n in rest if next_round - stale(n) >= bound),
        key=lambda n: (stale(n), _risk_rank(n), n),
    )
    if len(overdue) > 50:
        print(
            f"WARNING: backstop overflow — {len(overdue)} overdue > 50 "
            "slots; stalest overdue queries may exceed the age bound"
        )
    elif len(pending) + len(prio) + len(overdue) > 50:
        print(
            f"NOTE: {len(pending)} pending + {len(prio)} priority + "
            f"{len(overdue)} overdue > 50 slots; overdue is served "
            "first, trailing pending/priority wait a round"
        )
    seen |= set(overdue)
    rest = [n for n in rest if n not in seen]
    risky = sorted(
        (n for n in rest if _risk_rank(n) < len(RISK_PREFIXES)),
        key=lambda n: (stale(n), _risk_rank(n), n),
    )
    calm = sorted(
        (n for n in rest if _risk_rank(n) >= len(RISK_PREFIXES)),
        key=lambda n: (stale(n), n),
    )
    return overdue + pending + prio + risky + calm


def main() -> None:
    import __spark_entry__ as entry
    from update_verified import green_history

    _, last_green, _ = green_history()
    latest = max((int(r[1:]) for r in last_green.values()), default=0)
    names = list(entry.queries().keys())
    priority = _priority(latest)
    unknown = [n for n in priority if n not in set(names)]
    if unknown:
        raise SystemExit(f"window_priority.txt names unknown queries: {unknown}")
    order = desired_order(names, last_green, priority)
    n_pending = sum(1 for n in names if n not in last_green)
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
