"""KevinFrame — the engine's DataFrame wrapper.

The reference models a frame as ``(Indices, Groups, TitleTrees, [Field])``
(src/Data/DataFrame.hs:65-72): columnar storage plus an ordered row-id view,
grouping state carried *on* the frame, and pivot presentation state.  Spark
DataFrames are unordered multisets with transient grouping, so the wrapper
carries the state Spark does not:

- **order**: a hidden ``__idx`` LongType column gives rows stable identity
  (reference Indices, DataFrame.hs:66-67), and a LAZY ``order spec`` — a
  list of (column, ascending) pairs ending in ``__idx`` — defines the
  current row order.  ``sort`` only rewrites the spec (no job, no shuffle);
  ``take`` compiles to ``orderBy().limit()`` (Catalyst's parallel
  TakeOrderedAndProject); dense positions are materialized via a window
  ONLY for the inherently positional ops (zip join, order-sensitive concat)
  — which are presentation-scale by definition.  ``ordered=False`` skips
  all of it: the 100 TB mode, where order-sensitive combinators raise
  instead of sorting.
- **groups**: ``group_cols`` (reference Groups, DataFrame.hs:68) — recorded
  by ``groupby``, consumed by ``aggregate``; realized as ``df.groupBy`` only
  at aggregation time so Catalyst sees one logical plan.
- **pivot**: ``(row_fields, col_fields, value_field)`` (reference TitleTrees,
  DataFrame.hs:42) — pure presentation state consumed by the crosstab
  renderer.

Everything else is a lazy Catalyst plan: each combinator returns a new
wrapper over a transformed ``pyspark.sql.DataFrame``; nothing executes until
an action.

Descending-sort tie semantics (reference Combinator.hs:229-230): descending
is the REVERSE of the ascending result, so a descending sort prepends
``(field, desc)`` AND flips the direction of every older order component —
reproduced exactly by the spec-flip in ``sort``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kevinlang_spark.errors import (
    KevinFieldError,
    KevinPivotError,
    KevinTypeError,
    KevinValueError,
)
from kevinlang_spark.operators import aggregators as agglib
from kevinlang_spark.traits import (
    NUM_MEASURE,
    TEXT_DIM,
    FieldTraits,
    infer_traits_for_spark_type,
)

#: hidden order column (reference Indices, DataFrame.hs:66-67)
IDX = "__idx"

#: order spec entry: (column name, ascending?)
OrderSpec = tuple[tuple[str, bool], ...]


class SortOrder(enum.Enum):
    ASCENDING = "asc"
    DESCENDING = "desc"


@dataclass(frozen=True)
class PivotState:
    """Reference TitleTrees (DataFrame.hs:42): which fields head the row/col
    hierarchies and which single field supplies cell values."""

    row_fields: tuple[str, ...]
    col_fields: tuple[str, ...]
    value_field: str


def _as_name_list(names) -> list[str]:
    """Reference VaridicParam (Combinator.hs:38-44): one name or a list;
    anything non-string raises 'invalid field name' (Combinator.hs:74-76)."""
    if isinstance(names, str):
        return [names]
    if isinstance(names, Iterable):
        out = []
        for n in names:
            if not isinstance(n, str):
                raise KevinTypeError("invalid field name")
            out.append(n)
        return out
    raise KevinTypeError("invalid field name")


def _q(name: str) -> "Column":
    """Backtick-quoted column reference: user column names may contain
    dots (legal in CSV headers and parquet), which bare F.col would parse
    as nested-field access."""
    return F.col("`" + name.replace("`", "``") + "`")


class KevinFrame:
    """Immutable combinator-algebra frame over a Spark DataFrame."""

    def __init__(
        self,
        df: DataFrame,
        traits: dict[str, FieldTraits] | None = None,
        group_cols: Sequence[str] = (),
        pivot: PivotState | None = None,
        ordered: bool | None = None,
        order_spec: OrderSpec = (),
        idx_asc: bool = True,
    ):
        if ordered is None:
            ordered = IDX in df.columns
        if ordered and IDX not in df.columns:
            raise KevinValueError(f"ordered frame requires a {IDX} column")
        self._df = df
        self.ordered = ordered
        self.group_cols = tuple(group_cols)
        self.pivot = pivot
        #: pending lazy sort: [(col, asc), ...]; row order = spec + __idx
        self.order_spec: OrderSpec = tuple(order_spec)
        self.idx_asc = idx_asc
        if traits is None:
            traits = {
                f.name: infer_traits_for_spark_type(f.name, f.dataType)
                for f in df.schema.fields
                if not f.name.startswith("__")
            }
        self.traits = dict(traits)

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #

    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        ordered: bool = True,
        traits: dict[str, FieldTraits] | None = None,
    ) -> "KevinFrame":
        """Wrap a plain Spark DataFrame.

        ``ordered=True`` attaches ``__idx`` from the source's encounter order
        via ``monotonically_increasing_id`` — fully parallel (no shuffle,
        id = partition_id << 33 | row_in_partition), unique and
        order-preserving for any deterministic source.  Dense 1..n numbering
        is computed lazily only by the ops that need true positions.
        """
        if ordered and IDX not in df.columns:
            df = df.withColumn(IDX, F.monotonically_increasing_id())
        return cls(df, traits=traits, ordered=ordered)

    @property
    def df(self) -> DataFrame:
        """The underlying Spark DataFrame including hidden columns."""
        return self._df

    def to_df(self) -> DataFrame:
        """User-facing DataFrame: hidden columns dropped, rows in frame
        order (a parallel range-partitioned sort, not a window)."""
        cols = self.columns
        if self.ordered:
            return self._df.orderBy(*self._order_cols()).select(*[_q(c) for c in cols])
        return self._df.select(*[_q(c) for c in cols])

    @property
    def columns(self) -> list[str]:
        return [c for c in self._df.columns if not c.startswith("__")]

    # ------------------------------------------------------------------ #
    # ordering internals
    # ------------------------------------------------------------------ #

    def _order_cols(self) -> list[Column]:
        """Effective row order: pending sort spec, then __idx."""
        cols = []
        for name, asc in self.order_spec:
            c = _q(name)
            cols.append(c.asc_nulls_first() if asc else c.desc_nulls_last())
        idx = F.col(IDX)
        cols.append(idx.asc() if self.idx_asc else idx.desc())
        return cols

    def _derive(
        self,
        df: DataFrame,
        *,
        traits: dict[str, FieldTraits] | None = None,
        group_cols: Sequence[str] | None = None,
        pivot: PivotState | None | str = "keep",
        ordered: bool | None = None,
        order_spec: OrderSpec | None = None,
        idx_asc: bool | None = None,
    ) -> "KevinFrame":
        return KevinFrame(
            df,
            traits=self.traits if traits is None else traits,
            group_cols=self.group_cols if group_cols is None else group_cols,
            pivot=self.pivot if pivot == "keep" else pivot,
            ordered=self.ordered if ordered is None else ordered,
            order_spec=self.order_spec if order_spec is None else order_spec,
            idx_asc=self.idx_asc if idx_asc is None else idx_asc,
        )

    def _stable_agg_idx(self, df: DataFrame, keys: Sequence[str]) -> DataFrame:
        """Stamp ``__idx`` on an aggregation output DETERMINISTICALLY.

        ``monotonically_increasing_id`` on a shuffle output numbers rows
        by arrival order, which can permute between job re-executions —
        an id captured in one job (init/last) would then select a
        DIFFERENT row in the next.  Group keys are unique per output row,
        so a key hash is a stable identity; it is kept non-negative so
        ``append``'s offset arithmetic stays valid.  (The ~1e-19 chance
        of a 62-bit collision merely makes two rows tie in an order the
        key-based sort spec has already decided.)"""
        if keys:
            return df.withColumn(
                IDX, F.pmod(F.xxhash64(*[_q(k) for k in keys]), F.lit(1 << 62))
            )
        # global aggregate: exactly one row
        return df.withColumn(IDX, F.lit(0).cast("long"))

    def _require_ordered(self, op: str) -> None:
        if not self.ordered:
            raise KevinValueError(
                f"{op} requires an ordered frame; this frame was built with "
                "ordered=False (the large-scale mode). Re-ingest with "
                "ordered=True for order-sensitive combinators."
            )

    def _materialized(self, force: bool = False) -> "KevinFrame":
        """Renumber ``__idx`` to dense 1..n positions under the current
        order and clear the pending spec.  ``force=True`` renumbers even
        when no sort is pending (the zip join needs dense 1..n on both
        sides; raw ``monotonically_increasing_id`` values are sparse).

        Uses an un-partitioned window — a single-partition sort.  Only the
        inherently positional ops (zip join, concat) pay this; everything
        else stays on the lazy spec.
        """
        if not force and not self.order_spec and self.idx_asc:
            return self
        df = self._df.withColumn(
            IDX,
            F.row_number().over(Window.orderBy(*self._order_cols())).cast("long"),
        )
        # dropping now-unreferenced hidden helper cols (e.g. melt's __vpos)
        helpers = [c for c in df.columns if c.startswith("__") and c != IDX]
        spec_cols = {n for n, _ in self.order_spec}
        drop = [c for c in helpers if c in spec_cols]
        return self._derive(df.drop(*drop), order_spec=(), idx_asc=True)

    def _check_field(self, name: str) -> None:
        if name not in self.columns:
            raise KevinFieldError("no such field")

    def _check_agg_kind(self, field: str, kind: str) -> None:
        """Reference PolyParam type dispatch: numeric aggregators on a
        non-numeric column (or concat on a numeric one) → 'invalid type'
        (Combinator.hs:140/174/192, test/Spec.lhs:83-95)."""
        if kind == "any":
            return
        dtype = self._df.schema[field].dataType
        is_num = isinstance(dtype, T.NumericType)
        if kind == "numeric" and not is_num:
            raise KevinTypeError("invalid type")
        if kind == "string" and not isinstance(dtype, T.StringType):
            raise KevinTypeError("invalid type")

    # ------------------------------------------------------------------ #
    # projection / filter (reference Combinator.hs:46-55, 122-200)
    # ------------------------------------------------------------------ #

    def select(self, names) -> "KevinFrame":
        """Project + reorder columns to the requested order.

        Unknown names are silently dropped (can yield a column-empty frame) —
        reference Combinator.hs:46-55.  Keeps order and groups; clears pivot.
        """
        wanted = [n for n in _as_name_list(names) if n in self.columns]
        hidden = [c for c in self._df.columns if c.startswith("__")]
        traits = {n: self.traits[n] for n in wanted if n in self.traits}
        group_cols = tuple(g for g in self.group_cols if g in wanted)
        # the pending order spec may reference columns being projected away
        # (sort("cost").select(["city"])): retain them under hidden names so
        # the order survives without a materializing window
        spec = []
        extra = []
        for i, (n, asc) in enumerate(self.order_spec):
            if n in wanted or n.startswith("__"):
                spec.append((n, asc))
            else:
                h = f"__ord{i}_{n}"
                extra.append(_q(n).alias(h))
                spec.append((h, asc))
        return self._derive(
            self._df.select(*[_q(c) for c in wanted], *extra, *hidden),
            traits=traits,
            group_cols=group_cols,
            pivot=None,
            order_spec=tuple(spec),
        )

    def filter(self, field, pred=None) -> "KevinFrame":
        """Row filter.  Two surfaces:

        - ``filter(col_expr)`` — a Spark Column predicate (the fast path:
          stays in codegen, pushes down to the scan).
        - ``filter(name, fn)`` — reference surface (Combinator.hs:123):
          ``fn`` is applied to the named column.  If ``fn`` composes Column
          expressions (e.g. ``lambda c: c > 500``) it stays JVM-side; a
          genuinely opaque Python predicate should use ``filter_udf``.

        NULL semantics match the reference: Empty → row dropped
        (Combinator.hs:132/164/182 ≡ SQL NULL → not-true → dropped).
        Unknown field → 'no such field' (Combinator.hs:199).
        Clears groups (reference filter' rebuilds with emptyGroups).
        Filtering never disturbs the order spec — surviving rows keep
        their relative order, like the reference's index view.
        """
        if pred is None:
            if not isinstance(field, Column):
                raise KevinTypeError("filter(expr) requires a Column predicate")
            cond = field
        else:
            if not isinstance(field, str):
                raise KevinTypeError("invalid field name")
            self._check_field(field)
            cond = pred(_q(field))
            if not isinstance(cond, Column):
                raise KevinTypeError(
                    "predicate did not produce a Column expression; use "
                    "filter_udf for opaque Python predicates"
                )
        return self._derive(self._df.where(cond), group_cols=(), pivot=None)

    def filter_udf(self, field: str, fn: Callable, kind: str = "double") -> "KevinFrame":
        """Reference's arbitrary-host-predicate surface (PolyParam,
        Combinator.hs:122-156) for predicates not expressible as Column
        expressions.  Runs as an Arrow-batched pandas UDF (the ~10-100×
        faster slow path), with the reference's per-kind dispatch:

        - ``'double'``/``'float'`` (filterReals, Combinator.hs:158-164):
          numeric column required; predicate sees a float.
        - ``'int'``/``'word'`` (filterInts, Combinator.hs:176-182):
          numeric column required; values convert via the reference's
          ``toBoundedInteger`` — a FRACTIONAL value (or a negative one
          for the unsigned ``word``) has no bounded-integer form, so the
          reference's ``fromJust`` crashes; we raise 'inconsistent type'
          at evaluation, per value, like the reference does.
        - ``'str'`` (PolyParam String, Combinator.hs:126-132): string
          column required.

        NULL → row dropped (all kinds; reference's ``_ -> False``).
        """
        from pyspark.sql.functions import pandas_udf

        self._check_field(field)
        dtype = dict(self._df.dtypes)[field]
        numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
        is_num = any(dtype.startswith(n) for n in numeric)
        if kind in ("double", "float", "int", "word") and not is_num:
            raise KevinTypeError("inconsistent type")
        if kind in ("str", "string") and dtype != "string":
            raise KevinTypeError("inconsistent type")
        integral_dtype = dtype in ("tinyint", "smallint", "int", "bigint")

        def _apply(v):
            if v is None:
                return False
            if kind in ("int", "word"):
                if not integral_dtype:
                    # reference toBoundedInteger: Nothing for NaN/±Inf,
                    # fractional, or out-of-Int64-range → fromJust crash
                    if (
                        v != v  # NaN
                        or v in (float("inf"), float("-inf"))
                        or not (-(2**63) <= v < 2**63)
                        or v != int(v)
                    ):
                        raise KevinTypeError("inconsistent type")
                iv = int(v)
                if kind == "word" and iv < 0:
                    raise KevinTypeError("inconsistent type")
                return bool(fn(iv))
            if kind in ("double", "float"):
                return bool(fn(float(v)))
            return bool(fn(v))

        @pandas_udf("boolean")
        def _pred(s):
            return s.map(_apply)

        return self._derive(self._df.where(_pred(_q(field))), group_cols=(), pivot=None)

    def with_column(
        self, name: str, col: Column, traits: FieldTraits | None = None
    ) -> "KevinFrame":
        """Derived column (engine extension; the reference has no scalar
        expression language — SURVEY §2.8 — so this is pure Spark surface)."""
        out = self._df.withColumn(name, col)
        new_traits = dict(self.traits)
        new_traits[name] = traits or infer_traits_for_spark_type(
            name, out.schema[name].dataType
        )
        return self._derive(out, traits=new_traits)

    # ------------------------------------------------------------------ #
    # grouping / aggregation (reference Combinator.hs:56-72, 202-226)
    # ------------------------------------------------------------------ #

    def groupby(self, names) -> "KevinFrame":
        """Record grouping state on the frame (reference Combinator.hs:56-72).

        Unknown key names are silently ignored (reference goes through
        ``select``).  The frame's rows are unchanged; groups are realized at
        ``aggregate`` time, where output groups come out ascending by key —
        deferred exactly like Catalyst defers the physical aggregation.
        """
        keys = [n for n in _as_name_list(names) if n in self.columns]
        return self._derive(self._df, group_cols=tuple(keys), pivot=None)

    def aggregate(self, agg, field: str, alias: str | None = None) -> "KevinFrame":
        """Grouped scalar aggregation of ONE column (reference
        Combinator.hs:202-226): output = group-key columns + aggregated
        column, groups ascending by key tuple, groups cleared.  No groups
        recorded → one global row (Combinator.hs:210-212).

        ``agg`` is a registry name ('sum', 'mean', 'count', 'variance', 'sd',
        'concat', ...) or any ``(col, idx) -> Column`` callable.  All registry
        aggregators are JVM built-ins → partial (map-side) aggregation +
        whole-stage codegen.  The ascending-by-key output order is carried as
        a lazy order spec — NO window, NO extra shuffle beyond the groupBy
        itself, so this is safe at any group cardinality.
        """
        if field not in self.columns:
            raise KevinFieldError("no such field")
        fn, kind = agglib.resolve(agg)
        self._check_agg_kind(field, kind)
        out_name = alias or field

        base = self
        if isinstance(agg, str) and agg == "concat" and self.ordered:
            base = self._materialized()
        idx_col = F.col(IDX) if base.ordered else None
        expr = fn(_q(field), idx_col).alias(out_name)

        if base.group_cols:
            out = base._df.groupBy(*[_q(k) for k in base.group_cols]).agg(expr)
            spec = tuple((k, True) for k in base.group_cols)
        else:
            out = base._df.agg(expr)
            spec = ()
        traits = {k: base.traits[k] for k in base.group_cols if k in base.traits}
        # trait follows the OUTPUT dtype: min/max and custom callables can
        # yield strings (labeling them numeric would break append's
        # trait-equality check and the renderer)
        out_dtype = out.schema[out_name].dataType
        traits[out_name] = (
            TEXT_DIM if isinstance(out_dtype, T.StringType) else NUM_MEASURE
        )
        if base.ordered:
            out = self._stable_agg_idx(out, base.group_cols)
        return self._derive(
            out,
            traits=traits,
            group_cols=(),
            pivot=None,
            order_spec=spec,
            idx_asc=True,
        )

    def aggregate_many(self, specs) -> "KevinFrame":
        """Grouped aggregation of MANY columns in ONE ``groupBy`` — a
        single shuffle computes every statistic (engine extension: the
        reference's ``aggregate`` is one-column by design,
        Combinator.hs:202-226, which forces one scan per statistic; at
        scale that multiplies both the scan and the shuffle).

        ``specs`` is a sequence of ``(agg, field)`` or
        ``(agg, field, alias)`` tuples with the same per-spec semantics
        as ``aggregate`` (registry names or callables, kind checks,
        count→float).  Output: group keys + one column per spec, groups
        ascending by key, groups cleared.
        """
        specs = list(specs)
        if not specs:
            raise KevinValueError("aggregate_many requires at least one spec")
        base = self
        if self.ordered and any(
            isinstance(s[0], str) and s[0] == "concat" for s in specs
        ):
            base = self._materialized()
        idx_col = F.col(IDX) if base.ordered else None

        exprs = []
        names = []
        for spec in specs:
            agg, field = spec[0], spec[1]
            alias = spec[2] if len(spec) > 2 and spec[2] else field
            if field not in self.columns:
                raise KevinFieldError("no such field")
            if alias in names or alias in base.group_cols:
                raise KevinValueError(f"duplicate output column {alias!r}")
            fn, kind = agglib.resolve(agg)
            self._check_agg_kind(field, kind)
            exprs.append(fn(_q(field), idx_col).alias(alias))
            names.append(alias)

        if base.group_cols:
            out = base._df.groupBy(*[_q(k) for k in base.group_cols]).agg(*exprs)
            spec_order = tuple((k, True) for k in base.group_cols)
        else:
            out = base._df.agg(*exprs)
            spec_order = ()
        traits = {k: base.traits[k] for k in base.group_cols if k in base.traits}
        for name in names:
            dtype = out.schema[name].dataType
            traits[name] = (
                TEXT_DIM if isinstance(dtype, T.StringType) else NUM_MEASURE
            )
        if base.ordered:
            out = self._stable_agg_idx(out, base.group_cols)
        return self._derive(
            out,
            traits=traits,
            group_cols=(),
            pivot=None,
            order_spec=spec_order,
            idx_asc=True,
        )

    def aggregate_udf(
        self,
        fold: Callable,
        field: str,
        alias: str | None = None,
        return_type: str = "double",
    ) -> "KevinFrame":
        """Arbitrary host-language fold (reference PolyParam aggregate,
        Combinator.hs:124) as an Arrow-batched grouped-agg pandas UDF.
        ``fold`` receives the group's values as a pandas Series and returns
        a scalar.
        """
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        if field not in self.columns:
            raise KevinFieldError("no such field")
        out_name = alias or field

        @pandas_udf(return_type, PandasUDFType.GROUPED_AGG)
        def _fold(v):
            return fold(v)

        if self.group_cols:
            out = self._df.groupBy(*[_q(k) for k in self.group_cols]).agg(
                _fold(_q(field)).alias(out_name)
            )
            spec = tuple((k, True) for k in self.group_cols)
        else:
            out = self._df.agg(_fold(_q(field)).alias(out_name))
            spec = ()
        traits = {k: self.traits[k] for k in self.group_cols if k in self.traits}
        traits[out_name] = NUM_MEASURE
        if self.ordered:
            out = self._stable_agg_idx(out, self.group_cols)
        return self._derive(
            out, traits=traits, group_cols=(), pivot=None, order_spec=spec, idx_asc=True
        )

    def apply_grouped(self, fn, schema: str) -> "KevinFrame":
        """Grouped-map pandas UDF (``applyInPandas``): ``fn(pdf) -> pdf``
        receives each group as an Arrow-batched pandas DataFrame and returns
        any number of rows with ``schema``.  The general escape hatch for
        per-group logic no built-in expresses (reference analogue: its
        whole UDF story is arbitrary host functions, Combinator.hs:122-124).

        Output is unordered (group-map results have no defined row order).
        """
        if not self.group_cols:
            raise KevinValueError("apply_grouped requires groupby() first")
        base = self._df.select(*[_q(c) for c in self.columns])
        out = base.groupBy(*[_q(k) for k in self.group_cols]).applyInPandas(fn, schema=schema)
        return KevinFrame(out, group_cols=(), pivot=None, ordered=False)

    def transform_grouped(
        self, agg, field: str, alias: str | None = None
    ) -> "KevinFrame":
        """Grouped TRANSFORM (reference test/Spec.lhs:119 lists
        "aggregate v.s. transform" as an open design question — this is the
        transform half): every row keeps its identity and gains the
        group-level aggregate of ``field``, e.g. each row tagged with its
        group's mean.

        Realized as a window aggregate partitioned by the group keys — one
        shuffle on the keys, rows never leave executors, order preserved.
        """
        window_aggs = {
            "sum": F.sum,
            "mean": F.avg,
            "avg": F.avg,
            "count": F.count,
            "variance": F.var_pop,
            "var": F.var_pop,
            "sd": F.stddev_pop,
            "stddev": F.stddev_pop,
            "median": F.median,
            "min": F.min,
            "max": F.max,
        }
        if field not in self.columns:
            raise KevinFieldError("no such field")
        if not isinstance(agg, str) or agg not in window_aggs:
            raise KevinTypeError(
                f"transform supports {sorted(window_aggs)}; got {agg!r}"
            )
        _, kind = agglib.resolve(agg)
        self._check_agg_kind(field, kind)
        out_name = alias or f"{field}_{agg}"
        if self.group_cols:
            expr = window_aggs[agg](_q(field)).over(
                Window.partitionBy(*[_q(k) for k in self.group_cols])
            )
            if agg == "count":
                expr = expr.cast("double")  # reference count returns float
            out = self._df.withColumn(out_name, expr)
        else:
            # global transform: an unpartitioned window would funnel every
            # row through ONE task — compute the scalar with a normal
            # aggregation and attach it via a broadcast cross join instead
            scalar = self._df.agg(window_aggs[agg](_q(field)).alias(out_name))
            if agg == "count":
                scalar = scalar.select(F.col(out_name).cast("double").alias(out_name))
            out = self._df.crossJoin(F.broadcast(scalar))
        traits = dict(self.traits)
        traits[out_name] = NUM_MEASURE
        return self._derive(out, traits=traits)

    # ------------------------------------------------------------------ #
    # sort / slicing (reference Combinator.hs:228-237, 293-315)
    # ------------------------------------------------------------------ #

    def sort(self, field: str, order: SortOrder = SortOrder.ASCENDING) -> "KevinFrame":
        """Reorder rows by one column (reference Combinator.hs:228-237).

        Pure metadata: rewrites the lazy order spec; no job runs.
        Ascending is a stable sort — ties keep the current order, so the
        current spec becomes the tiebreak.  Descending is the REVERSE of
        the ascending result (Combinator.hs:229-230) — prepend (field desc)
        and flip every older component.  Unknown field → rows unchanged
        (reference fallback, Combinator.hs:237).  Keeps groups; clears
        pivot (the reference constructor stamps Nothing for the TitleTrees
        on every sort, Combinator.hs:228-230 — even the unknown-field case).
        """
        self._require_ordered("sort")
        if field not in self.columns:
            return self._derive(self._df, pivot=None)
        if order == SortOrder.ASCENDING:
            spec = ((field, True),) + self.order_spec
            return self._derive(self._df, order_spec=spec, pivot=None)
        spec = ((field, False),) + tuple((n, not a) for n, a in self.order_spec)
        return self._derive(
            self._df, order_spec=spec, idx_asc=not self.idx_asc, pivot=None
        )

    def take(self, n: int) -> "KevinFrame":
        """First n rows of the view (reference Combinator.hs:293-295);
        n<=0 → row-empty, n>height → all rows.

        Compiles to ``orderBy(spec).limit(n)`` — Catalyst's
        TakeOrderedAndProject: each partition computes its local top-n,
        the driver merges; fully parallel, no global sort.
        """
        self._require_ordered("take")
        if n <= 0:
            return self._derive(self._df.where(F.lit(False)), pivot=None)
        out = self._df.orderBy(*self._order_cols()).limit(n)
        return self._derive(out, pivot=None)

    def drop(self, n: int) -> "KevinFrame":
        """All but the first n rows (reference Combinator.hs:297-299);
        ``orderBy(spec).offset(n)``."""
        self._require_ordered("drop")
        if n <= 0:
            return self._derive(self._df, pivot=None)
        out = self._df.orderBy(*self._order_cols()).offset(n)
        return self._derive(out, pivot=None)

    def _row_count(self) -> int:
        """Underlying row count — slicing operates on ROWS even in pivot
        form (the reference's slicing works on Indices regardless of
        TitleTrees; only height()/width() switch to leaf counts)."""
        return self._df.count()

    def _check_nonempty(self, op: str) -> None:
        # isEmpty reads at most one partition — head() on a huge frame
        # must not pay a full count scan
        if self._df.isEmpty():
            raise KevinValueError(f"{op}: empty data frame")

    def head(self) -> "KevinFrame":
        """First row only; errors on a row-empty frame (reference uses
        Prelude.head — see test/Spec.lhs:33)."""
        self._require_ordered("head")
        self._check_nonempty("head")
        return self.take(1)

    def tail(self) -> "KevinFrame":
        """All but the first row; errors on empty (Combinator.hs:313-315)."""
        self._require_ordered("tail")
        self._check_nonempty("tail")
        return self.drop(1)

    def _last_idx(self):
        """``__idx`` of the view's last row, found with a reverse-order
        top-1 (TakeOrderedAndProject: per-partition top-1, tiny merge) —
        no full count, no single-partition shuffle."""
        rev = []
        for name, asc in self.order_spec:
            c = _q(name)
            rev.append(c.desc_nulls_last() if asc else c.asc_nulls_first())
        idx = F.col(IDX)
        rev.append(idx.desc() if self.idx_asc else idx.asc())
        return self._df.orderBy(*rev).select(IDX).first()[0]

    def init(self) -> "KevinFrame":
        """All but the last row; errors on empty (Combinator.hs:305-307).

        Planned as a distributed filter on the last row's unique ``__idx``
        (one cheap reverse top-1 job) — not count-then-limit, which paid a
        full count and funneled n-1 rows through a global limit."""
        self._require_ordered("init")
        self._check_nonempty("init")
        return self._derive(
            self._df.where(F.col(IDX) != F.lit(self._last_idx())), pivot=None
        )

    def last(self) -> "KevinFrame":
        """Last row only; errors on empty (Combinator.hs:309-311).
        Same single-job shape as ``init`` — an equality filter on the last
        row's ``__idx``."""
        self._require_ordered("last")
        self._check_nonempty("last")
        return self._derive(
            self._df.where(F.col(IDX) == F.lit(self._last_idx())), pivot=None
        )

    # ------------------------------------------------------------------ #
    # size (reference Combinator.hs:278-291)
    # ------------------------------------------------------------------ #

    def height(self) -> int:
        """Visible row count; on pivot frames, the row-tree leaf count
        (1 if the row tree is empty) — reference Combinator.hs:278-291."""
        if self.pivot is not None:
            if not self.pivot.row_fields:
                return 1
            return self._df.select(*[_q(c) for c in self.pivot.row_fields]).distinct().count()
        return self._df.count()

    def width(self) -> int:
        if self.pivot is not None:
            if not self.pivot.col_fields:
                return 1
            return self._df.select(*[_q(c) for c in self.pivot.col_fields]).distinct().count()
        return len(self.columns)

    def size(self) -> tuple[int, int]:
        return (self.height(), self.width())

    # ------------------------------------------------------------------ #
    # combination (reference Combinator.hs:317-360)
    # ------------------------------------------------------------------ #

    def append(self, other: "KevinFrame") -> "KevinFrame":
        """Vertical union (reference Combinator.hs:317-337): both frames must
        have the same (name, traits) column set, order-insensitive; output
        column order = left's; rows = left's then right's; groups cleared.

        Unordered frames union with zero overhead (pure unionByName);
        ordered frames keep exact combined order by OFFSETTING the right
        side's ``__idx`` past the left side's maximum — one tiny parallel
        ``max()`` job, no global window, no single-partition sort, so an
        ordered append of two huge frames stays fully distributed.
        """
        left_cols = {n: self.traits.get(n) for n in self.columns}
        right_cols = {n: other.traits.get(n) for n in other.columns}
        if left_cols != right_cols:
            raise KevinValueError("Can't append inconsistent data frames")
        if self.ordered and other.ordered:
            # resolve any pending sort into __idx order on each side (no-op
            # when no sort is pending: sparse monotonic ids already carry
            # the row order)
            l = self._materialized()
            r = other._materialized()
            lf = l._df.select(*[_q(c) for c in self.columns], IDX)
            rf = r._df.select(*[_q(c) for c in self.columns], IDX)
            # right rows must sort after every left row: shift right ids by
            # (left max + 1); monotonic ids are >= 0 and both sides fit in
            # int64 with room to spare
            left_max = lf.agg(F.max(IDX)).first()[0]
            offset = (left_max if left_max is not None else -1) + 1
            rf = rf.withColumn(IDX, (F.col(IDX) + F.lit(offset)).cast("long"))
            out = lf.unionByName(rf)
            return self._derive(
                out, group_cols=(), pivot=None, order_spec=(), idx_asc=True
            )
        out = self._df.select(*[_q(c) for c in self.columns]).unionByName(
            other._df.select(*[_q(c) for c in other.columns])
        )
        return self._derive(
            out, group_cols=(), pivot=None, ordered=False, order_spec=(), idx_asc=True
        )

    def join(self, other: "KevinFrame") -> "KevinFrame":
        """POSITIONAL (zip) join — the reference's only join
        (Combinator.hs:339-360): requires equal heights, glues the i-th row
        of each side, concatenates all columns, renumbers.

        Spark has no native zip join for DataFrames; we realize it as
        dense-position materialization on both sides → equi-join on
        position.  Duplicate column names are disambiguated with a ``_r``
        suffix (the reference allows duplicates outright; Spark would make
        them unaddressable).
        """
        self._require_ordered("join")
        other._require_ordered("join")
        h0, h1 = self._row_count(), other._row_count()
        if h0 != h1:
            raise KevinValueError("Can't join inconsistent data frames")
        l = self._materialized(force=True)._df
        r = other._materialized(force=True)._df.withColumnRenamed(IDX, "__rn")
        rename = {c: f"{c}_r" for c in other.columns if c in self.columns}
        for old, new in rename.items():
            r = r.withColumnRenamed(old, new)
        out = l.join(r, l[IDX] == r["__rn"]).drop("__rn")
        traits = dict(self.traits)
        for c in other.columns:
            traits[rename.get(c, c)] = other.traits.get(c)
        out = out.select(*[_q(c) for c in self.columns], *[_q(rename.get(c, c)) for c in other.columns], IDX)
        return self._derive(
            out, traits=traits, group_cols=(), pivot=None, order_spec=(), idx_asc=True
        )

    # ------------------------------------------------------------------ #
    # extension-operator surface: the pipeline ops as frame methods, so a
    # reference user gets ONE coherent API (frame in, frame out).  Each
    # delegates to the tested operator module; outputs are unordered
    # analytic results (scale mode).
    # ------------------------------------------------------------------ #

    def describe(self, cols: list[str] | None = None) -> "KevinFrame":
        """Numeric column profile (count/nulls/min/max/mean/std) in one
        aggregation over one scan — see ``operators.stats.profile_numeric``."""
        from kevinlang_spark.operators.stats import profile_numeric

        return KevinFrame.from_df(profile_numeric(self._df, cols), ordered=False)

    def dedup_exact(
        self, text_col: str = "text", id_col: str = "doc_id"
    ) -> "KevinFrame":
        """Exact-duplicate removal keeping the min-id representative per
        normalized-text fingerprint — ``operators.dedup`` shapes."""
        from pyspark.sql import functions as _F

        from kevinlang_spark.operators.text import fingerprint

        rep = _F.min_by(
            _F.struct(*self._df.columns), _F.col(id_col)
        ).alias("r")
        deduped = (
            self._df.withColumn("__fp", fingerprint(_F.col(text_col)))
            .groupBy("__fp")
            .agg(rep)
            .select("r.*")
        )
        return KevinFrame.from_df(deduped, ordered=False)

    def with_text_stats(self, text_col: str = "text") -> "KevinFrame":
        """Attach language/quality/token/fingerprint columns (narrow,
        scan-stage) — see ``operators.text.with_text_stats``."""
        from kevinlang_spark.operators.text import with_text_stats as _wts

        return KevinFrame.from_df(_wts(self._df, text_col), ordered=False)

    def validate(self, checks) -> "KevinFrame":
        """Run data-quality checks (one aggregation for all rules) — see
        ``operators.quality.validate``."""
        from kevinlang_spark.operators.quality import validate as _validate

        return KevinFrame.from_df(_validate(self._df, checks), ordered=False)

    def dedup_lines(
        self, text_col: str = "text", id_col: str = "doc_id", sep: str = "\n"
    ) -> "KevinFrame":
        """Corpus-wide line-level dedup (first occurrence wins, documents
        reassembled in order) — see ``operators.dedup.line_dedup``."""
        from kevinlang_spark.operators.dedup import line_dedup

        return KevinFrame.from_df(
            line_dedup(self._df, id_col, text_col, sep), ordered=False
        )

    def dedup_semantic(
        self,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        bits: int = 8,
        threshold: float = 0.9,
    ) -> "KevinFrame":
        """SemDeDup-style semantic dedup over an embedding column — see
        ``operators.similarity.semantic_dedup``."""
        from kevinlang_spark.operators.similarity import semantic_dedup

        return KevinFrame.from_df(
            semantic_dedup(self._df, vec_col, id_col, bits, threshold),
            ordered=False,
        )

    def association_rules(
        self,
        basket_col: str,
        item_col: str,
        min_support: int = 2,
        max_basket_size: int | None = None,
    ) -> "KevinFrame":
        """Market-basket A→B rules with support/confidence/lift — see
        ``operators.baskets.association_rules``."""
        from kevinlang_spark.operators.baskets import association_rules as _ar

        return KevinFrame.from_df(
            _ar(self._df, basket_col, item_col, min_support, max_basket_size),
            ordered=False,
        )

    def apply_cdc(
        self,
        log: "KevinFrame",
        key_cols: list[str],
        seq_col: str,
        op_col: str,
        delete_op: str = "D",
    ) -> "KevinFrame":
        """Apply an insert/update/delete change log to this snapshot —
        see ``operators.incremental.apply_cdc``."""
        from kevinlang_spark.operators.incremental import apply_cdc as _cdc

        other = log._df if isinstance(log, KevinFrame) else log
        return KevinFrame.from_df(
            _cdc(self._df, other, key_cols, seq_col, op_col, delete_op),
            ordered=False,
        )

    def target_encode(
        self, cat_col: str, target_col: str, alpha: float = 10.0
    ) -> "KevinFrame":
        """Smoothed mean target encoding per category — see
        ``operators.stats.target_encode``."""
        from kevinlang_spark.operators.stats import target_encode as _te

        return KevinFrame.from_df(
            _te(self._df, cat_col, target_col, alpha), ordered=False
        )

    def time_decayed_agg(
        self,
        ref_ts: str,
        half_life_hours: float = 168.0,
        key_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
    ) -> "KevinFrame":
        """Exponentially time-decayed per-key feature aggregates — see
        ``operators.events.time_decayed_agg``."""
        from kevinlang_spark.operators.events import time_decayed_agg as _tda

        return KevinFrame.from_df(
            _tda(self._df, ref_ts, half_life_hours, key_col, ts_col, value_col),
            ordered=False,
        )

    def poisson_bootstrap(
        self, value_col: str, id_col: str, n_boot: int = 32
    ) -> "KevinFrame":
        """Poisson-bootstrap CI of the mean — see
        ``operators.stats.poisson_bootstrap``."""
        from kevinlang_spark.operators.stats import poisson_bootstrap as _pb

        return KevinFrame.from_df(
            _pb(self._df, value_col, id_col, n_boot), ordered=False
        )

    def psi_drift(
        self,
        value_col: str,
        arm_col: str,
        expected: str,
        actual: str,
        lo: float,
        hi: float,
        nbins: int = 10,
    ) -> "KevinFrame":
        """PSI distribution drift between two arms — see
        ``operators.drift.psi_drift``."""
        from kevinlang_spark.operators.drift import psi_drift as _psi

        return KevinFrame.from_df(
            _psi(self._df, value_col, arm_col, expected, actual, lo, hi, nbins),
            ordered=False,
        )

    def group_ols(self, key_col: str, x_col: str, y_col: str) -> "KevinFrame":
        """Per-group closed-form OLS — see ``operators.stats.group_ols``."""
        from kevinlang_spark.operators.stats import group_ols as _ols

        return KevinFrame.from_df(
            _ols(self._df, key_col, x_col, y_col), ordered=False
        )

    def k_anonymity(self, quasi_cols: list[str], k: int = 5) -> "KevinFrame":
        """k-anonymity re-identification risk audit — see
        ``operators.quality.k_anonymity``."""
        from kevinlang_spark.operators.quality import k_anonymity as _ka

        return KevinFrame.from_df(
            _ka(self._df, quasi_cols, k), ordered=False
        )

    def cusum_changepoints(
        self,
        key_col: str = "user_id",
        ts_col: str = "ts",
        value_col: str = "value",
        drift: float = 0.0,
        threshold_sd: float = 5.0,
    ) -> "KevinFrame":
        """CUSUM change-point screen per series — see
        ``operators.anomaly.cusum_changepoints``."""
        from kevinlang_spark.operators.anomaly import cusum_changepoints as _cc

        return KevinFrame.from_df(
            _cc(self._df, key_col, ts_col, value_col, drift, threshold_sd),
            ordered=False,
        )

    def seasonal_anomalies(
        self,
        key_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        n_sd: float = 3.0,
        min_obs: int = 30,
    ) -> "KevinFrame":
        """Seasonal-baseline anomaly flags — see
        ``operators.anomaly.seasonal_anomalies``."""
        from kevinlang_spark.operators.anomaly import seasonal_anomalies as _sa

        return KevinFrame.from_df(
            _sa(self._df, key_col, ts_col, value_col, n_sd, min_obs),
            ordered=False,
        )

    def snapshot_diff(
        self,
        new: "KevinFrame",
        key_cols: list[str],
        compare_cols: list[str] | None = None,
    ) -> "KevinFrame":
        """Reconcile this snapshot against a newer one — see
        ``operators.incremental.snapshot_diff``."""
        from kevinlang_spark.operators.incremental import snapshot_diff as _sd

        other = new._df if isinstance(new, KevinFrame) else new
        return KevinFrame.from_df(
            _sd(self._df, other, key_cols, compare_cols), ordered=False
        )

    def char_entropy(
        self, id_col: str = "doc_id", text_col: str = "text"
    ) -> "KevinFrame":
        """Letter-distribution Shannon entropy per document — see
        ``operators.text.char_entropy``."""
        from kevinlang_spark.operators.text import char_entropy as _ce

        return KevinFrame.from_df(
            _ce(self._df, id_col, text_col), ordered=False
        )

    def bpe_merge_pairs(
        self, text_col: str = "text", top_k: int = 20
    ) -> "KevinFrame":
        """Top-k BPE merge candidates (adjacent char-pair counts) — see
        ``operators.text.bpe_merge_pairs``."""
        from kevinlang_spark.operators.text import bpe_merge_pairs as _bp

        return KevinFrame.from_df(_bp(self._df, text_col, top_k), ordered=False)

    def ngram_diversity(
        self, group_col: str = "source", text_col: str = "text"
    ) -> "KevinFrame":
        """Per-group bigram diversity ratio — see
        ``operators.text.ngram_diversity``."""
        from kevinlang_spark.operators.text import ngram_diversity as _nd

        return KevinFrame.from_df(
            _nd(self._df, group_col, text_col), ordered=False
        )

    def mixture_weights(
        self, group_col: str = "source", alpha: float = 0.5
    ) -> "KevinFrame":
        """Temperature-scaled corpus mixing weights — see
        ``operators.sampling.mixture_weights``."""
        from kevinlang_spark.operators.sampling import mixture_weights as _mw

        return KevinFrame.from_df(
            _mw(self._df, group_col, alpha), ordered=False
        )

    def window_dedup(
        self,
        keys: list[str],
        ts_col: str = "ts",
        id_col: str = "event_id",
        window_s: int = 600,
    ) -> "KevinFrame":
        """First-arrival dedup per tumbling window — see
        ``operators.events.window_dedup``."""
        from kevinlang_spark.operators.events import window_dedup as _wd

        return KevinFrame.from_df(
            _wd(self._df, keys, ts_col, id_col, window_s), ordered=False
        )

    def hll_rollup(
        self, key_cols: list[str], unit_col, value_col: str, lgk: int = 14
    ) -> "KevinFrame":
        """Unioned per-unit HLL distinct sketches — see
        ``operators.sketches.hll_rollup``."""
        from kevinlang_spark.operators.sketches import hll_rollup as _hr

        return KevinFrame.from_df(
            _hr(self._df, key_cols, unit_col, value_col, lgk), ordered=False
        )

    def kll_rollup(
        self,
        key_cols: list[str],
        unit_col,
        value_col: str,
        quantiles: tuple[float, ...] = (0.5,),
        k: int = 200,
    ) -> "KevinFrame":
        """Merged per-unit KLL quantile sketches — see
        ``operators.sketches.kll_rollup``."""
        from kevinlang_spark.operators.sketches import kll_rollup as _kr

        return KevinFrame.from_df(
            _kr(self._df, key_cols, unit_col, value_col, quantiles, k),
            ordered=False,
        )

    def theta_rollup(
        self, key_cols: list[str], unit_col, value_col: str, lgk: int = 12
    ) -> "KevinFrame":
        """Per-unit Theta sketches (set-algebra capable) — see
        ``operators.sketches.theta_rollup``."""
        from kevinlang_spark.operators.sketches import theta_rollup as _tr

        return KevinFrame.from_df(
            _tr(self._df, key_cols, unit_col, value_col, lgk), ordered=False
        )

    def join_key_profile(
        self, other: "KevinFrame", key_self: str, key_other: str, lgk: int = 14
    ) -> "KevinFrame":
        """Sketch-based join-size pre-flight — see
        ``operators.sketches.join_key_profile``."""
        from kevinlang_spark.operators.sketches import join_key_profile as _jk

        return KevinFrame.from_df(
            _jk(self._df, other._df, key_self, key_other, lgk), ordered=False
        )

    def dyadic_smooth(
        self,
        keys: list[str],
        value_col: str = "value",
        ts_col: str = "ts",
        id_col: str = "event_id",
        horizon: int = 20,
        scale: int = 100,
    ) -> "KevinFrame":
        """Exact-dyadic sequential smoothing — see
        ``operators.events.dyadic_smooth``."""
        from kevinlang_spark.operators.events import dyadic_smooth as _ds

        return KevinFrame.from_df(
            _ds(self._df, keys, value_col, ts_col, id_col, horizon, scale),
            ordered=False,
        )

    def funnel_latency(
        self,
        step_a: str,
        step_b: str,
        user_col: str = "user_id",
        ts_col: str = "ts",
        type_col: str = "event_type",
    ) -> "KevinFrame":
        """Funnel time-to-convert quartiles — see
        ``operators.events.funnel_latency``."""
        from kevinlang_spark.operators.events import funnel_latency as _fl

        return KevinFrame.from_df(
            _fl(self._df, step_a, step_b, user_col, ts_col, type_col),
            ordered=False,
        )

    def novelty_counts(
        self,
        group_col: str = "source",
        text_col: str = "text",
        order_col: str = "doc_id",
    ) -> "KevinFrame":
        """Per-group first-occurrence novelty — see
        ``operators.dedup.novelty_counts``."""
        from kevinlang_spark.operators.dedup import novelty_counts as _nc

        return KevinFrame.from_df(
            _nc(self._df, group_col, text_col, order_col), ordered=False
        )

    def dp_counts(
        self,
        keys: list[str],
        epsilon: float = 1.0,
        seed: str = "dp",
        clamp: bool = True,
        *,
        release_id: str,
    ) -> "KevinFrame":
        """ε-DP noisy count release — see ``operators.quality.dp_counts``
        (release_id is mandatory: same-seed reuse across releases enables
        a differencing attack)."""
        from kevinlang_spark.operators.quality import dp_counts as _dp

        return KevinFrame.from_df(
            _dp(self._df, keys, epsilon, seed, clamp, release_id=release_id),
            ordered=False,
        )

    def cms_frequencies(
        self,
        col: str,
        items,
        eps: float = 0.0001,
        confidence: float = 0.99,
        seed: int = 1,
    ) -> "KevinFrame":
        """Count–Min point-frequency probes — see
        ``operators.sketches.cms_frequencies``."""
        from kevinlang_spark.operators.sketches import cms_frequencies as _cf

        return KevinFrame.from_df(
            _cf(self._df, col, items, eps, confidence, seed), ordered=False
        )

    def grouped_heavy_hitters(
        self, group_col: str, col: str, k: int = 10, capacity: int = 256
    ) -> "KevinFrame":
        """Per-group bounded-memory top-k — see
        ``operators.sketches.grouped_heavy_hitters``."""
        from kevinlang_spark.operators.sketches import (
            grouped_heavy_hitters as _gh,
        )

        return KevinFrame.from_df(
            _gh(self._df, group_col, col, k, capacity), ordered=False
        )

    def kcenter_sample(
        self, vec_col: str = "embedding", id_col: str = "vec_id", k: int = 4
    ) -> "KevinFrame":
        """Greedy k-center diversity coreset — see
        ``operators.similarity.kcenter_sample``."""
        from kevinlang_spark.operators.similarity import kcenter_sample as _kc

        return KevinFrame.from_df(
            _kc(self._df, vec_col, id_col, k), ordered=False
        )

    def km_survival(
        self,
        user_col: str = "user_id",
        ts_col: str = "ts",
        censor_days: int = 3,
    ) -> "KevinFrame":
        """Kaplan–Meier survival curve — see
        ``operators.stats.km_survival``."""
        from kevinlang_spark.operators.stats import km_survival as _km

        return KevinFrame.from_df(
            _km(self._df, user_col, ts_col, censor_days), ordered=False
        )

    def acf_by_key(
        self,
        key_col: str = "event_type",
        ts_col: str = "ts",
        value_col: str = "value",
        bucket_s: int = 3600,
        max_lag: int = 6,
    ) -> "KevinFrame":
        """Per-key autocorrelation function — see
        ``operators.anomaly.acf_by_key``."""
        from kevinlang_spark.operators.anomaly import acf_by_key as _acf

        return KevinFrame.from_df(
            _acf(self._df, key_col, ts_col, value_col, bucket_s, max_lag),
            ordered=False,
        )

    def markov_attribution(
        self,
        user_col: str = "user_id",
        type_col: str = "event_type",
        ts_col: str = "ts",
        id_col: str = "event_id",
        conv_type: str = "purchase",
        iterations: int = 12,
    ) -> "KevinFrame":
        """Markov removal-effect attribution — see
        ``operators.events.markov_attribution``."""
        from kevinlang_spark.operators.events import markov_attribution as _ma

        return KevinFrame.from_df(
            _ma(self._df, user_col, type_col, ts_col, id_col, conv_type, iterations),
            ordered=False,
        )

    def seasonal_backtest(
        self,
        key_col: str = "event_type",
        ts_col: str = "ts",
        season_s: int = 86_400,
        bucket_s: int = 3_600,
        eval_buckets: int = 168,
    ) -> "KevinFrame":
        """Seasonal-naive forecast backtest — see
        ``operators.anomaly.seasonal_backtest``."""
        from kevinlang_spark.operators.anomaly import seasonal_backtest as _sb

        return KevinFrame.from_df(
            _sb(self._df, key_col, ts_col, season_s, bucket_s, eval_buckets),
            ordered=False,
        )

    def mahalanobis_outliers(
        self,
        key_col: str,
        x_col: str,
        y_col: str,
        id_col: str,
        threshold: float = 13.816,
    ) -> "KevinFrame":
        """Bivariate Mahalanobis outliers per group — see
        ``operators.stats.mahalanobis_outliers``."""
        from kevinlang_spark.operators.stats import mahalanobis_outliers as _mo

        return KevinFrame.from_df(
            _mo(self._df, key_col, x_col, y_col, id_col, threshold),
            ordered=False,
        )

    def winnow_fingerprints(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 5,
        window: int = 4,
    ) -> "KevinFrame":
        """Winnowing rolling-hash fingerprints — see
        ``operators.text.winnow_fingerprints``."""
        from kevinlang_spark.operators.text import winnow_fingerprints as _wf

        return KevinFrame.from_df(
            _wf(self._df, text_col, id_col, k, window), ordered=False
        )

    def token_pmi(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        vocab_size: int = 50,
        min_pair_docs: int = 5,
    ) -> "KevinFrame":
        """Token-pair PMI collocations — see
        ``operators.text.token_pmi``."""
        from kevinlang_spark.operators.text import token_pmi as _pmi

        return KevinFrame.from_df(
            _pmi(self._df, text_col, id_col, vocab_size, min_pair_docs),
            ordered=False,
        )

    def kcore(
        self, k: int = 3, rounds: int = 8, src: str = "a", dst: str = "b"
    ) -> "KevinFrame":
        """k-core peeling over this frame's edge list — see
        ``operators.graph.kcore``."""
        from kevinlang_spark.operators.graph import kcore as _kcore

        return KevinFrame.from_df(
            _kcore(self._df, k, rounds, src, dst), ordered=False
        )

    def label_propagation(
        self, rounds: int = 5, src: str = "a", dst: str = "b"
    ) -> "KevinFrame":
        """LPA community labels over this frame's edge list — see
        ``operators.graph.label_propagation``."""
        from kevinlang_spark.operators.graph import label_propagation as _lpa

        return KevinFrame.from_df(
            _lpa(self._df, rounds, src, dst), ordered=False
        )

    def hits(
        self, iterations: int = 8, src: str = "src", dst: str = "dst"
    ) -> "KevinFrame":
        """HITS hub/authority scores over this frame's directed edge
        list — see ``operators.graph.hits``."""
        from kevinlang_spark.operators.graph import hits as _hits

        return KevinFrame.from_df(
            _hits(self._df, iterations, src, dst), ordered=False
        )

    def pca_top_component(
        self,
        vec_col: str = "embedding",
        dim: int = 64,
        iterations: int = 12,
    ) -> "KevinFrame":
        """Top principal component of an embedding column — see
        ``operators.pca.pca_top_component``."""
        from kevinlang_spark.operators.pca import pca_top_component as _pca

        return KevinFrame.from_df(
            _pca(self._df, vec_col, dim, iterations), ordered=False
        )

    def sorted_neighborhood_pairs(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        key_len: int = 24,
        bucket_prefix: int = 2,
        window: int = 5,
        max_dist: int = 6,
    ) -> "KevinFrame":
        """Sorted-neighborhood near-dup candidates — see
        ``operators.dedup.sorted_neighborhood_pairs``."""
        from kevinlang_spark.operators.dedup import (
            sorted_neighborhood_pairs as _sn,
        )

        return KevinFrame.from_df(
            _sn(self._df, text_col, id_col, key_len, bucket_prefix, window, max_dist),
            ordered=False,
        )

    def bloom_build(
        self, col: str, m: int = 1 << 14, k: int = 5
    ) -> "KevinFrame":
        """Bloom filter (set-bit rows) over a column — see
        ``operators.sketches.bloom_build``."""
        from kevinlang_spark.operators.sketches import bloom_build as _bb

        return KevinFrame.from_df(_bb(self._df, col, m, k), ordered=False)

    def bloom_probe(
        self,
        bloom: "KevinFrame",
        col: str,
        m: int = 1 << 14,
        k: int = 5,
    ) -> "KevinFrame":
        """Probe this frame's ``col`` against a Bloom filter — see
        ``operators.sketches.bloom_probe``."""
        from kevinlang_spark.operators.sketches import bloom_probe as _bp

        return KevinFrame.from_df(
            _bp(bloom._df, self._df, col, m, k), ordered=False
        )

    def sparse_cosine_pairs(
        self,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_df: int = 100,
    ) -> "KevinFrame":
        """All-pairs TF-IDF cosine similarity — see
        ``operators.text.sparse_cosine_pairs``."""
        from kevinlang_spark.operators.text import sparse_cosine_pairs as _sc

        return KevinFrame.from_df(
            _sc(self._df, threshold, id_col, text_col, max_df), ordered=False
        )

    def wl_refinement(
        self, rounds: int = 3, src: str = "a", dst: str = "b"
    ) -> "KevinFrame":
        """Weisfeiler–Lehman structural fingerprints over this frame's
        edge list — see ``operators.graph.wl_refinement``."""
        from kevinlang_spark.operators.graph import wl_refinement as _wl

        return KevinFrame.from_df(
            _wl(self._df, rounds, src, dst), ordered=False
        )

    def shortest_paths(
        self,
        source: int,
        rounds: int = 6,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = None,
    ) -> "KevinFrame":
        """Bounded-round Bellman–Ford SSSP over this frame's edge list —
        see ``operators.graph.shortest_paths``."""
        from kevinlang_spark.operators.graph import shortest_paths as _sp

        return KevinFrame.from_df(
            _sp(self._df, source, rounds, src, dst, weight), ordered=False
        )

    def harmonic_centrality(
        self,
        sources: list[int],
        rounds: int = 6,
        src: str = "a",
        dst: str = "b",
    ) -> "KevinFrame":
        """Sampled harmonic centrality over this frame's edge list —
        see ``operators.graph.harmonic_centrality``."""
        from kevinlang_spark.operators.graph import harmonic_centrality as _hc

        return KevinFrame.from_df(
            _hc(self._df, sources, rounds, src, dst), ordered=False
        )

    def adamic_adar(
        self,
        k: int = 20,
        max_deg: int = 64,
        src: str = "a",
        dst: str = "b",
    ) -> "KevinFrame":
        """Adamic–Adar link prediction over this frame's edge list —
        see ``operators.graph.adamic_adar``."""
        from kevinlang_spark.operators.graph import adamic_adar as _aa

        return KevinFrame.from_df(
            _aa(self._df, k, max_deg, src, dst), ordered=False
        )

    def fs_link_pairs(
        self,
        id_col: str,
        block_expr,
        fields: dict,
        threshold: float = 0.0,
    ) -> "KevinFrame":
        """Fellegi–Sunter probabilistic record linkage — see
        ``operators.linkage.fs_link_pairs``."""
        from kevinlang_spark.operators.linkage import fs_link_pairs as _fs

        return KevinFrame.from_df(
            _fs(self._df, id_col, block_expr, fields, threshold), ordered=False
        )

    def radius_join_pairs(
        self,
        id_col: str,
        lat_col: str,
        lon_col: str,
        radius_km: float = 50.0,
        cell_cap: int = 10_000,
        lat_band_deg: float = 66.0,
    ) -> "KevinFrame":
        """Grid-blocked spatial radius join — see
        ``operators.spatial.radius_join_pairs``."""
        from kevinlang_spark.operators.spatial import radius_join_pairs as _rj

        return KevinFrame.from_df(
            _rj(self._df, id_col, lat_col, lon_col, radius_km, cell_cap, lat_band_deg),
            ordered=False,
        )

    def fingerprint_clusters(
        self, text_col: str = "text", id_col: str = "doc_id"
    ) -> "KevinFrame":
        """OpenRefine-style fingerprint key clustering — see
        ``operators.quality.fingerprint_clusters``."""
        from kevinlang_spark.operators.quality import (
            fingerprint_clusters as _fc,
        )

        return KevinFrame.from_df(
            _fc(self._df, text_col, id_col), ordered=False
        )

    def fd_violations(self, lhs: list, rhs: str) -> "KevinFrame":
        """Functional-dependency check — see
        ``operators.quality.fd_violations``."""
        from kevinlang_spark.operators.quality import fd_violations as _fd

        return KevinFrame.from_df(_fd(self._df, lhs, rhs), ordered=False)

    def dsir_weights(
        self,
        target_pred,
        id_col: str = "doc_id",
        text_col: str = "text",
        buckets: int = 1024,
    ) -> "KevinFrame":
        """DSIR importance-resampling weights — see
        ``operators.text.dsir_weights``."""
        from kevinlang_spark.operators.text import dsir_weights as _dw

        return KevinFrame.from_df(
            _dw(self._df, target_pred, id_col, text_col, buckets),
            ordered=False,
        )

    def trigram_search(
        self,
        pattern: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "KevinFrame":
        """Trigram-index substring search — see
        ``operators.text.trigram_search``."""
        from kevinlang_spark.operators.text import trigram_search as _ts

        return KevinFrame.from_df(
            _ts(self._df, pattern, id_col, text_col), ordered=False
        )

    def feature_hash(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        dim: int = 1024,
    ) -> "KevinFrame":
        """Hashing-trick sparse featurizer — see
        ``operators.text.feature_hash``."""
        from kevinlang_spark.operators.text import feature_hash as _fh

        return KevinFrame.from_df(
            _fh(self._df, id_col, text_col, dim), ordered=False
        )

    def pca_top_components(
        self,
        vec_col: str = "embedding",
        dim: int = 64,
        n_components: int = 2,
        iterations: int = 12,
    ) -> "KevinFrame":
        """Top-k principal components by deflation — see
        ``operators.pca.pca_top_components``."""
        from kevinlang_spark.operators.pca import pca_top_components as _pcs

        return KevinFrame.from_df(
            _pcs(self._df, vec_col, dim, n_components, iterations),
            ordered=False,
        )

    def rank_fusion(
        self,
        others: list["KevinFrame"],
        id_col: str,
        rank_col: str = "rank",
        c: int = 60,
    ) -> "KevinFrame":
        """Reciprocal Rank Fusion of this ranking with ``others`` — see
        ``operators.stats.reciprocal_rank_fusion``."""
        from kevinlang_spark.operators.stats import reciprocal_rank_fusion as _rrf

        frames = [self._df] + [o._df for o in others]
        return KevinFrame.from_df(
            _rrf(frames, id_col, rank_col, c), ordered=False
        )

    def merge(
        self,
        other: "KevinFrame",
        on,
        how: str = "inner",
        broadcast_other: bool = False,
    ) -> "KevinFrame":
        """Relational join — absent in the reference (TODO:2 lists it as
        future work) but required for real queries; pure Spark.

        ``broadcast_other=True`` hints a broadcast-hash join for dimension
        tables (no shuffle of the fact side).  Row order follows the left
        frame (its order spec survives); 1:N joins interleave matches of
        the same left row in right-side order nondeterministically — use an
        unordered frame when that matters at scale.
        """
        r = other._df.drop(IDX) if IDX in other._df.columns else other._df
        r = r.drop(*[c for c in r.columns if c.startswith("__")])
        key_names = set()
        if isinstance(on, str):
            key_names = {on}
        elif isinstance(on, (list, tuple)) and all(isinstance(x, str) for x in on):
            key_names = set(on)
        semi_anti = how in (
            "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"
        )
        # disambiguate overlapping non-key names (a '_r' suffix, like the
        # positional join) — duplicate names would make the frame
        # unaddressable (AMBIGUOUS_REFERENCE on the next select).
        # Semi/anti outputs carry no right columns at all, so they need
        # (and must not attempt) no disambiguation.
        rename: dict[str, str] = {}
        if not semi_anti and key_names:
            # string-key (USING) join: pre-rename the right side BEFORE the
            # join so the coalesced USING key survives full/right joins
            # (a post-join re-select of the left key attribute would NULL
            # the key on right-only rows)
            rename = {
                c: f"{c}_r"
                for c in other.columns
                if c in self.columns and c not in key_names and c in r.columns
            }
            for old, new in rename.items():
                r = r.withColumnRenamed(old, new)
        if broadcast_other:
            r = F.broadcast(r)
        out = self._df.join(r, on=on, how=how)
        if not semi_anti and not key_names:
            # Column-expression join: both sides' attributes are present in
            # the output (no USING coalescing), so a post-join re-select is
            # safe — and required, since pre-renaming would unbind the
            # user's join-condition attributes
            dup = [c for c in other.columns if c in self.columns and c in out.columns]
            if dup:
                rename = {c: f"{c}_r" for c in dup}
                sel = [self._df[c] for c in self._df.columns]
                sel += [
                    (r[c].alias(rename[c]) if c in dup else r[c]) for c in r.columns
                ]
                out = out.select(*sel)
        traits = dict(self.traits)
        if not semi_anti:
            for c in other.columns:
                name = rename.get(c, c)
                if name in out.columns and name not in traits:
                    traits[name] = other.traits.get(c)
        keeps_left_rows = how in (
            "inner",
            "left",
            "leftouter",
            "left_outer",
            "semi",
            "leftsemi",
            "left_semi",
            "anti",
            "leftanti",
            "left_anti",
            "cross",
        )
        ordered = self.ordered and keeps_left_rows
        if not ordered and IDX in out.columns:
            out = out.drop(IDX)
        return self._derive(
            out,
            traits=traits,
            group_cols=(),
            pivot=None,
            ordered=ordered,
            order_spec=self.order_spec if ordered else (),
            idx_asc=self.idx_asc if ordered else True,
        )

    # ------------------------------------------------------------------ #
    # set operations (absent in reference — SURVEY §2.6; free in Spark)
    # ------------------------------------------------------------------ #

    def union_distinct(self, other: "KevinFrame") -> "KevinFrame":
        """Set union (duplicates removed).  Produces an unordered frame:
        distinct() has no meaningful row order."""
        out = self._df.select(*[_q(c) for c in self.columns]).unionByName(
            other._df.select(*[_q(c) for c in other.columns])
        ).distinct()
        return self._derive(out, group_cols=(), pivot=None, ordered=False,
                            order_spec=(), idx_asc=True)

    def intersect(self, other: "KevinFrame") -> "KevinFrame":
        out = self._df.select(*[_q(c) for c in self.columns]).intersect(other._df.select(*[_q(c) for c in other.columns]))
        return self._derive(out, group_cols=(), pivot=None, ordered=False,
                            order_spec=(), idx_asc=True)

    def except_all(self, other: "KevinFrame") -> "KevinFrame":
        out = self._df.select(*[_q(c) for c in self.columns]).exceptAll(other._df.select(*[_q(c) for c in other.columns]))
        return self._derive(out, group_cols=(), pivot=None, ordered=False,
                            order_spec=(), idx_asc=True)

    # ------------------------------------------------------------------ #
    # pivot state (reference DataFrame.hs:273-283, Combinator.hs:239-267)
    # ------------------------------------------------------------------ #

    def to_pivot(self, value_field: str) -> "KevinFrame":
        """Enter pivot form (reference DataFrame.hs:276-283): every other
        field becomes the row title tree; the col tree starts empty."""
        self._check_field(value_field)
        rows = tuple(c for c in self.columns if c != value_field)
        return self._derive(self._df, pivot=PivotState(rows, (), value_field))

    def from_pivot(self) -> "KevinFrame":
        """Leave pivot form (reference DataFrame.hs:273-274)."""
        return self._derive(self._df, pivot=None)

    def stack(self, field: str) -> "KevinFrame":
        """Move a field from the col tree to the end of the row tree
        (reference Combinator.hs:239-252)."""
        if self.pivot is None:
            raise KevinPivotError("not in pivot form")
        if field not in self.pivot.col_fields:
            raise KevinPivotError("unable to stack")
        cols = tuple(c for c in self.pivot.col_fields if c != field)
        rows = self.pivot.row_fields + (field,)
        return self._derive(self._df, pivot=PivotState(rows, cols, self.pivot.value_field))

    def unstack(self, field: str) -> "KevinFrame":
        """Move a field from the row tree to the end of the col tree
        (reference Combinator.hs:254-267)."""
        if self.pivot is None:
            raise KevinPivotError("not in pivot form")
        if field not in self.pivot.row_fields:
            raise KevinPivotError("unable to unstack")
        rows = tuple(c for c in self.pivot.row_fields if c != field)
        cols = self.pivot.col_fields + (field,)
        return self._derive(self._df, pivot=PivotState(rows, cols, self.pivot.value_field))

    # ------------------------------------------------------------------ #
    # reshaping (melt / cast) — reference Combinator.hs:78-120, 269-276
    # ------------------------------------------------------------------ #

    def melt(self, id_fields, var_fields) -> "KevinFrame":
        """Wide→long unpivot (reference Combinator.hs:78-120).

        Output columns: ids + ``variable`` (Text/Dimension/Discrete) +
        ``value`` (Number/Measure/Continuous) — traits per
        Combinator.hs:116-117.  Row order is var-major (all rows of var1,
        then var2, ...; Combinator.hs:102-107), values in frame order within
        each variable.  Empty var list → error (test/Spec.lhs:99); empty id
        list OK; all-unknown names → row-empty frame (test/Spec.lhs:106).

        Spark-first: this is ``df.unpivot`` (Spark 3.4+), one narrow pass,
        no shuffle.  The var-major order is carried as a lazy order spec on
        a hidden variable-position column — no window, no renumber.
        """
        ids = _as_name_list(id_fields)
        vars_ = _as_name_list(var_fields)
        if not vars_:
            # reference: empty var list is a dispatch error (test/Spec.lhs:99)
            raise KevinTypeError("invalid field name")
        ids = [n for n in ids if n in self.columns]
        vars_ = [n for n in vars_ if n in self.columns]
        traits = {n: self.traits[n] for n in ids if n in self.traits}
        traits["variable"] = TEXT_DIM
        traits["value"] = NUM_MEASURE
        if not vars_:
            empty = self._df.where(F.lit(False)).select(
                *[_q(c) for c in ids], *([IDX] if self.ordered else [])
            )
            empty = empty.withColumn("variable", F.lit(None).cast("string"))
            empty = empty.withColumn("value", F.lit(None).cast("double"))
            cols = [*ids, "variable", "value"] + ([IDX] if self.ordered else [])
            return self._derive(
                empty.select(*cols),
                traits=traits,
                group_cols=(),
                pivot=None,
                order_spec=(),
                idx_asc=True,
            )
        # a pending sort may reference columns that don't survive the
        # unpivot (the var columns themselves, or unrelated ones):
        # materialize dense positions first so the order is baked into __idx
        base_kf = self._materialized() if (self.ordered and self.order_spec) else self
        base = base_kf._df.select(*[_q(c) for c in ids + vars_], *([IDX] if self.ordered else []))
        base = base.withColumns({v: _q(v).cast("double") for v in vars_})
        out = base.unpivot(
            ids=[_q(c) for c in ids] + ([F.col(IDX)] if self.ordered else []),
            values=[_q(v).alias(v) for v in vars_],
            variableColumnName="variable",
            valueColumnName="value",
        )
        if self.ordered:
            # var-major order: hidden variable-position column heads the
            # order spec (pure metadata; no job, no window)
            pos_expr = F.when(F.col("variable") == vars_[0], F.lit(0))
            for i, v in enumerate(vars_[1:], start=1):
                pos_expr = pos_expr.when(F.col("variable") == v, F.lit(i))
            out = out.withColumn("__vpos", pos_expr)
            out = out.select(
                *[_q(c) for c in ids], "variable", "value", IDX, "__vpos"
            )
            # base was materialized above, so its spec is empty and row
            # order lives in __idx; var-major = (__vpos, __idx)
            return self._derive(
                out,
                traits=traits,
                group_cols=(),
                pivot=None,
                order_spec=(("__vpos", True),),
                idx_asc=True,
            )
        out = out.select(*[_q(c) for c in ids], "variable", "value")
        return self._derive(out, traits=traits, group_cols=(), pivot=None)

    def cast(self, row_fields, col_fields, agg, value_field: str) -> "KevinFrame":
        """Long→wide pivot with aggregation (reference Combinator.hs:269-276,
        defined there as unstack^n ∘ toPivot ∘ aggregate ∘ groupby).

        Guards per Combinator.hs:271-272: row/col overlap → error; value
        field among row/col fields → error.  We realize the data as the
        grouped aggregation (long form) and carry pivot state; the crosstab
        widening happens in ``pivot_table`` / the renderer.
        """
        rows = _as_name_list(row_fields)
        cols = _as_name_list(col_fields)
        if set(rows) & set(cols):
            raise KevinValueError("unable to cast")
        if value_field in rows or value_field in cols:
            raise KevinValueError("unable to cast")
        # unknown names would leave PivotState referencing columns the
        # aggregated frame doesn't have (reference errors at unstack time
        # with "unable to unstack"; we fail fast here)
        for n in rows + cols + [value_field]:
            self._check_field(n)
        out = self.groupby(rows + cols).aggregate(agg, value_field)
        return out._derive(out._df, pivot=PivotState(tuple(rows), tuple(cols), value_field))

    def pivot_table(self, max_distinct: int = 10000) -> DataFrame:
        """Materialize the crosstab for a frame in pivot form:
        ``groupBy(row_fields).pivot(col-values).agg(first(value))`` —
        reference crosstab semantics (DataFrame.hs:128-172): each cell is
        the value of the single row at that (row-path, col-path); NULL if
        none.  ``max_distinct`` bounds the pivot width (at scale a pivot to
        millions of columns is a modeling error, not a query)."""
        if self.pivot is None:
            raise KevinPivotError("not in pivot form")
        rows, cols, val = (
            list(self.pivot.row_fields),
            list(self.pivot.col_fields),
            self.pivot.value_field,
        )
        df = self._df
        if not cols:
            out = df.select(*[_q(c) for c in rows], _q(val))
            if rows:
                out = out.orderBy(*[_q(c) for c in rows])
            return out
        # NULL-safe, collision-safe column key: coalesce NULLs to a marker
        # and join with a unit separator (plain concat_ws would collapse
        # ('a', NULL) and (NULL, 'a'), and 'a/b' with ('a','b'))
        key = F.concat_ws(
            "\x1f",
            *[F.coalesce(_q(c).cast("string"), F.lit("\x00null")) for c in cols],
        ).alias("__ckey")
        df = df.withColumn("__ckey", key)
        # ONE distinct job serves both the width guard and the pivot's
        # value list (pivot(values=None) would otherwise run its own
        # distinct scan — two jobs for the same answer)
        limit = (max_distinct + 1) if max_distinct is not None else None
        vals_q = df.select("__ckey").distinct()
        if limit is not None:
            vals_q = vals_q.limit(limit)
        values = sorted(r["__ckey"] for r in vals_q.collect())
        if max_distinct is not None and len(values) > max_distinct:
            raise KevinPivotError(
                f"pivot would create more than {max_distinct} columns; "
                "a pivot this wide is a modeling error at scale"
            )
        gb = (
            df.groupBy(*[_q(c) for c in rows])
            if rows
            else df.groupBy(F.lit(1).alias("__all"))
        )
        out = gb.pivot("__ckey", values=values).agg(F.first(_q(val)))
        if rows:
            out = out.orderBy(*[_q(c) for c in rows])
        else:
            out = out.drop("__all")
        return out

    # ------------------------------------------------------------------ #
    # actions / conversion
    # ------------------------------------------------------------------ #

    def collect(self):
        return self.to_df().collect()

    def to_pandas(self):
        return self.to_df().toPandas()

    def show(self, n: int = 20) -> None:
        self.to_df().show(n, truncate=False)

    def render(self, max_rows: int = 100) -> str:
        """Reference-parity text rendering (flat table or crosstab)."""
        from kevinlang_spark.render import render_frame

        return render_frame(self, max_rows=max_rows)

    def explain(self, mode: str = "formatted") -> None:
        self.to_df().explain(mode)

    def __repr__(self) -> str:
        state = []
        if self.order_spec:
            state.append(f"order={list(self.order_spec)}")
        if self.group_cols:
            state.append(f"groups={list(self.group_cols)}")
        if self.pivot:
            state.append(
                f"pivot(rows={list(self.pivot.row_fields)}, "
                f"cols={list(self.pivot.col_fields)}, value={self.pivot.value_field})"
            )
        return f"KevinFrame(cols={self.columns}{', ' + ', '.join(state) if state else ''})"
