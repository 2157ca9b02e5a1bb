"""Reference-parity text rendering.

Reproduces the reference's ``Show DataFrame`` (src/Data/DataFrame.hs:106-172):

- flat form: right-aligned fixed-width columns with a 2-space gutter, a
  leading row-index column, Discrete numbers printed with 0 decimals
  (DataFrame.hs:115-118), NULL printed as ``empty``, non-Latin1 characters
  counted as width 2 (DataFrame.hs:102-104), group listing appended
  (DataFrame.hs:123-126), ``(EMPTY DATAFRAME)`` for a column-empty frame
  (DataFrame.hs:107);
- pivot form: nested row/column title-tree headers over a value matrix
  (DataFrame.hs:128-172), headers being the *sorted distinct* values of
  each tree level (makeTitleTree, DataFrame.hs:257-271).

Rendering collects to the driver — it is a presentation action, like the
reference's ``show``; size is bounded by ``max_rows``.
"""

from __future__ import annotations

import math

from kevinlang_spark.errors import KevinValueError
from kevinlang_spark.traits import DataInterpretation, FieldTraits


def _width(s: str) -> int:
    """Latin-1 chars count 1, everything else 2 (DataFrame.hs:102-104)."""
    return sum(1 if ord(c) < 256 else 2 for c in s)


def _pad_left(s: str, w: int) -> str:
    return " " * (w - _width(s)) + s


def _fmt_value(v, traits: FieldTraits | None) -> str:
    if v is None:
        return "empty"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return str(v)  # int(nan/inf) would raise
        if traits is not None and traits.interp == DataInterpretation.DISCRETE:
            return f"{v:.0f}"
        if v == int(v) and abs(v) < 1e15:
            # Haskell Scientific prints integral values bare
            return f"{v:.1f}"
        return repr(v)
    if isinstance(v, int):
        if traits is not None and traits.interp == DataInterpretation.CONTINUOUS:
            return f"{float(v)!r}"
        return str(v)
    return str(v)


def _fmt_header(v) -> str:
    """Reference title-tree header formatting (DataFrame.hs:155-156):
    numeric header values ALWAYS print 0-decimal, regardless of traits."""
    if v is None:
        return "empty"
    if isinstance(v, float) and not (math.isnan(v) or math.isinf(v)):
        return f"{v:.0f}"
    return str(v)


def _fmt_cell(v) -> str:
    """Reference crosstab cell formatting: plain Scientific ``show``
    (DataFrame.hs:91) — integral floats keep a trailing .0."""
    if v is None:
        return "empty"
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return str(v)
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.1f}"
        return repr(v)
    return str(v)


def _show_lines(lines: list[list[str]]) -> str:
    if not lines:
        return ""
    ncols = max(len(l) for l in lines)
    widths = [
        max((_width(l[i]) for l in lines if i < len(l)), default=0)
        for i in range(ncols)
    ]
    out = []
    for l in lines:
        out.append(
            "".join("  " + _pad_left(x, widths[i]) for i, x in enumerate(l))
        )
    return "\n".join(out) + "\n"


def render_frame(kf, max_rows: int = 100) -> str:
    """Render a KevinFrame as the reference would ``show`` it."""
    if kf.pivot is not None:
        return _render_pivot(kf, max_rows)
    return _render_flat(kf, max_rows)


def _render_flat(kf, max_rows: int) -> str:
    cols = kf.columns
    if not cols:
        return "(EMPTY DATAFRAME)\n"
    rows = kf.to_df().limit(max_rows).collect()
    header = [""] + cols
    lines = [header]
    for i, r in enumerate(rows, start=1):
        lines.append(
            [str(i)] + [_fmt_value(r[c], kf.traits.get(c)) for c in cols]
        )
    out = _show_lines(lines)
    if kf.group_cols:
        out += str(list(kf.group_cols)) + "\n"
    return out


def _render_pivot(kf, max_rows: int) -> str:
    """Crosstab: sorted-distinct headers per tree level, value matrix cells.

    The header hierarchies are computed with ONE distinct() per tree (not
    per level) and the matrix with one groupBy().pivot() job.
    """
    rows_f = list(kf.pivot.row_fields)
    cols_f = list(kf.pivot.col_fields)
    val = kf.pivot.value_field
    # leaf paths, sorted — the title trees' leaf order (DataFrame.hs:266)
    from kevinlang_spark.frame import _q

    def paths(fields):
        if not fields:
            return []
        df = (
            kf.df.select(*[_q(f) for f in fields])
            .distinct()
            .orderBy(*[_q(f) for f in fields])
            .limit(max_rows)
        )
        return [tuple(r[f] for f in fields) for r in df.collect()]

    row_paths = paths(rows_f)
    col_paths = paths(cols_f)

    # collect ONLY rows belonging to the displayed grid (an arbitrary
    # limit() sample could miss displayed cells and falsely render 'empty')
    from pyspark.sql import functions as F

    data_df = kf.df.select(*[_q(c) for c in (*rows_f, *cols_f, val)])
    if rows_f and len(row_paths) >= max_rows:
        key_col = F.concat_ws("\x1f", *[_q(f).cast("string") for f in rows_f])
        wanted = [
            "\x1f".join("" if v is None else str(v) for v in p) for p in row_paths
        ]
        data_df = data_df.where(key_col.isin(wanted))
    cells: dict[tuple, dict[tuple, object]] = {}
    for r in data_df.collect():
        rk = tuple(r[f] for f in rows_f)
        ck = tuple(r[f] for f in cols_f)
        if rk in cells and ck in cells[rk]:
            # reference: "invalid data (many values for the same index)"
            # (DataFrame.hs:145) — never silently last-wins
            raise KevinValueError("invalid data (many values for the same index)")
        cells.setdefault(rk, {})[ck] = r[val]

    def hfmt(v, field):
        return _fmt_header(v)

    lines: list[list[str]] = []
    row_hdr_w = len(rows_f) if rows_f else 1
    # column-tree header lines: one line per col field; values span their
    # subtrees (blank for continuation — addTitlePadding, DataFrame.hs:147)
    for li, cf in enumerate(cols_f):
        line = [cf] + [""] * (row_hdr_w - 1)
        prev_prefix = None
        for cp in col_paths:
            prefix = cp[: li + 1]
            line.append(hfmt(cp[li], cf) if prefix != prev_prefix else "")
            prev_prefix = prefix
        lines.append(line)
    # row-tree field-name line
    if rows_f:
        name_line = list(rows_f) + ([""] * len(col_paths) if col_paths else [""])
        lines.append(name_line)
    # body
    if not row_paths:
        body_cols = col_paths or [()]
        lines.append(
            [""] * row_hdr_w
            + [_fmt_cell(cells.get((), {}).get(cp)) for cp in body_cols]
        )
    else:
        prev: tuple | None = None
        for rp in row_paths:
            hdr = []
            for i, f in enumerate(rows_f):
                same = prev is not None and prev[: i + 1] == rp[: i + 1]
                hdr.append("" if same else hfmt(rp[i], f))
            prev = rp
            if col_paths:
                vals = [_fmt_cell(cells.get(rp, {}).get(cp)) for cp in col_paths]
            else:
                vals = [_fmt_cell(cells.get(rp, {}).get(()))]
            lines.append(hdr + vals)
    return _show_lines(lines)
