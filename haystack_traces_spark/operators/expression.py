"""ExpressionTree → Column compiler (SURVEY.md §2.3, Q1-Q6).

The reference's predicate IR is a protobuf ExpressionTree — top-level AND
whose operands are Fields or span-level sub-trees — compiled to an ES bool
query (reader/.../es/query/SpansIndexQueryGenerator.scala:66-96). Here the
same IR compiles to Spark Column expressions over the ``trace_index`` spans
array using higher-order functions:

- trace-level Field    → EXISTS(spans, g -> pred(g))        (own nested query)
- span-level sub-tree  → EXISTS(spans, g -> p1 AND p2 ...)  (fields must
  co-occur on one (service, operation) group — one nested bool in the
  reference, SpansIndexQueryGenerator.scala:83-93)

NOT_EQUAL replicates the reference's mustNot-inside-nested semantics
(SpansIndexQueryGenerator.scala:149-150): ∃ a span group in which the value
does NOT occur.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig

EQUAL = "EQUAL"
NOT_EQUAL = "NOT_EQUAL"
GREATER_THAN = "GREATER_THAN"
LESS_THAN = "LESS_THAN"

# Fields that are scalar per (service, operation) group.
_SCALAR_FIELDS = {"servicename", "operationname"}
# Always-long array-valued intrinsic fields (SpansIndexQueryGenerator.scala:120-126).
_LONG_FIELDS = {"duration", "starttime"}


@dataclass(frozen=True)
class Field:
    name: str
    value: object
    operator: str = EQUAL

    def __post_init__(self):
        # lowercase normalization on query build (SpansIndexQueryGenerator.scala:108,130)
        object.__setattr__(self, "name", self.name.lower())


@dataclass(frozen=True)
class ExpressionTree:
    """operator is always AND in the reference; depth ≤ 2 assumed."""

    operands: tuple = ()
    is_span_level: bool = False
    operator: str = "AND"


def _coerce(value, ftype: str) -> Column:
    if ftype in ("long", "int"):
        return F.lit(int(value))
    if ftype == "double":
        return F.lit(float(value))
    if ftype == "bool":
        v = value if isinstance(value, bool) else str(value).lower() == "true"
        return F.lit(v)
    return F.lit(str(value).lower())  # keyword values lowercased (ES normalizer)


def _field_type(name: str, whitelist: WhitelistConfig) -> str:
    if name in _LONG_FIELDS:
        return "long"
    if name in _SCALAR_FIELDS:
        return "string"
    wl = whitelist.get(name)
    return wl.type if wl else "string"


def group_predicate(f: Field, whitelist: WhitelistConfig):
    """Return g -> Column: does span group g satisfy the field predicate."""
    ftype = _field_type(f.name, whitelist)
    lit = _coerce(f.value, ftype)
    # resolve whitelist ALIASES to the canonical (stored) field name
    # (WhitelistIndexFieldConfiguration.scala:33-45 alias matching)
    wl = whitelist.get(f.name)
    name = wl.name if wl is not None and f.name not in _SCALAR_FIELDS else f.name

    def pred(g) -> Column:
        if name in _SCALAR_FIELDS:
            col = g[name]
            if f.operator == EQUAL:
                return col == lit
            if f.operator == NOT_EQUAL:
                return col != lit
            if f.operator == GREATER_THAN:
                return col > lit
            return col < lit
        col = g[name]  # array-valued (set accumulated across the group)
        if f.operator == EQUAL:
            return F.exists(col, lambda x: x == lit)
        if f.operator == NOT_EQUAL:
            return ~F.exists(col, lambda x: x == lit)
        if f.operator == GREATER_THAN:
            return F.exists(col, lambda x: x > lit)
        return F.exists(col, lambda x: x < lit)

    return pred


def compile_expression(
    tree: ExpressionTree, whitelist: WhitelistConfig = DEFAULT_WHITELIST
) -> Column:
    """Compile the IR to a predicate over a trace_index row."""
    conds: list[Column] = []
    for op in tree.operands:
        if isinstance(op, Field):
            p = group_predicate(op, whitelist)
            conds.append(F.exists(F.col("spans"), p))
        elif isinstance(op, ExpressionTree):
            preds = [group_predicate(f, whitelist) for f in op.operands]
            conds.append(F.exists(F.col("spans"), _conjunction(preds)))
        else:
            raise TypeError(f"unsupported operand: {op!r}")
    return _and_all(conds) if conds else F.lit(True)


def compile_promoted(
    tree: ExpressionTree,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
    available: frozenset[str] | None = None,
) -> tuple[Column, bool]:
    """Compile against the PROMOTED ``wl_<name>`` trace-wide value unions
    (`index.py promote_whitelist=True`) → (predicate, exact).

    Per operand, on the union column:
    - trace-level EQUAL / GT / LT: EXACT — ∃group ∃value(p) ⇔ ∃value in
      the union, so the nested spans column is never touched;
    - trace-level NOT_EQUAL: NOT decidable from a union (the semantics is
      "∃ a group in which the value does not occur" — a union can neither
      prove nor refute per-group absence) → contributes True and drops
      exactness;
    - a field whose union column is not in ``available`` (selective
      promotion — e.g. the measured default skips starttime) behaves the
      same way: no contribution, exactness dropped, verifier decides;
    - span-level sub-tree: each member's EQUAL/GT/LT union condition is
      NECESSARY but co-occurrence-blind → contributes the conjunction as
      a pre-filter and drops exactness (the exists() verifier runs on the
      survivors only).

    When exact, the caller can answer the whole search from the slim
    promoted columns (scan never reads the nested array — the measured
    point of promotion, SCALE.md §2)."""
    conds: list[Column] = []
    exact = True

    def union_cond(f: Field) -> Column | None:
        ftype = _field_type(f.name, whitelist)
        lit = _coerce(f.value, ftype)
        wl = whitelist.get(f.name)
        name = wl.name if wl is not None and f.name not in _SCALAR_FIELDS else f.name
        if available is not None and f"wl_{name}" not in available:
            return None  # not promoted: the exists() verifier decides
        col = F.col(f"wl_{name}")
        if f.operator == EQUAL:
            return F.array_contains(col, lit)
        if f.operator == GREATER_THAN:
            return F.exists(col, lambda x: x > lit)
        if f.operator == LESS_THAN:
            return F.exists(col, lambda x: x < lit)
        return None  # NOT_EQUAL: union-undecidable

    for op in tree.operands:
        if isinstance(op, Field):
            c = union_cond(op)
            if c is None:
                exact = False
            else:
                conds.append(c)
        elif isinstance(op, ExpressionTree):
            exact = False  # co-occurrence needs the nested groups
            sub = [c for c in (union_cond(f) for f in op.operands) if c is not None]
            if sub:
                conds.append(_and_all(sub))
        else:
            raise TypeError(f"unsupported operand: {op!r}")
    return (_and_all(conds) if conds else F.lit(True)), exact


def compile_fields(
    fields: list[Field], whitelist: WhitelistConfig = DEFAULT_WHITELIST
) -> Column:
    """Deprecated flat-field query (Q2, SpansIndexQueryGenerator.scala:44-63):
    span-context fields form ONE co-occurrence group; each trace-context field
    gets its own nested query. Blank-valued fields are dropped (:107-109)."""
    fields = [f for f in fields if str(f.value) != ""]
    span_ctx, trace_ctx = [], []
    for f in fields:
        wl = whitelist.get(f.name)
        ctx = wl.search_context if wl else "span"
        (span_ctx if ctx == "span" else trace_ctx).append(f)
    operands: list = [ExpressionTree(tuple(span_ctx), is_span_level=True)] if span_ctx else []
    operands += trace_ctx
    return compile_expression(ExpressionTree(tuple(operands)), whitelist)


def _conjunction(preds):
    """Unary g -> Column closure (PySpark HOF lambdas must take exactly the
    arity of the higher-order function — no extra default args)."""

    def f(g):
        return _and_all(p(g) for p in preds)

    return f


def _and_all(cols) -> Column:
    out = None
    for c in cols:
        out = c if out is None else (out & c)
    return out if out is not None else F.lit(True)
