"""Modifiers — deterministic column normalizations applied before
validation, in declaration order (reference: Modifier enum
validify_derive/src/validify/modifier.rs:5-12; applied left-to-right
before validation, validify/impl.rs:40-56).

The engine never mutates its source: ``apply_modifiers`` produces a
normalized VIEW of the input (SURVEY.md §7 risk register — per-turn text
equality invariant holds on the normalized output deterministically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

from .compiler import resolve_type
from .rules import Modifier

# Rust `str::trim` trims the Unicode White_Space property, not just ASCII
# space — Spark's `trim` only strips ' ', so use the Java regex binary
# property for exact parity (modifier.rs:23-36; SURVEY.md §2.3).
_WS = r"\p{IsWhite_Space}"


def _cap(c: Column) -> Column:
    # uppercase FIRST CHAR only, rest untouched (modifier.rs:65-78) —
    # deliberately NOT initcap (which lowercases the rest, per word)
    return F.when(
        c.isNull(), c
    ).otherwise(
        F.concat(F.upper(F.substring(c, 1, 1)),
                 F.substring(c, 2, 2147483646)))


def _scalar_expr(kind: str, c: Column, fn=None) -> Column:
    if kind == "trim":
        return F.regexp_replace(c, rf"^{_WS}+|{_WS}+$", "")
    if kind == "lowercase":
        return F.lower(c)
    if kind == "uppercase":
        return F.upper(c)
    if kind == "capitalize":
        return _cap(c)
    if kind == "custom":
        return fn(c)
    raise ValueError(f"unknown modifier kind {kind}")


def modifier_expr(m: Modifier, c: Column,
                  dtype: T.DataType | None) -> Column:
    """String modifiers map over elements of array columns
    (fields.rs:456-481; golden validify.rs:15-32)."""
    if isinstance(dtype, T.ArrayType):
        return F.transform(c, lambda x: _scalar_expr(m.kind, x, m.fn))
    return _scalar_expr(m.kind, c, m.fn)


def _set_nested(df: DataFrame, dotted: str, expr: Column) -> DataFrame:
    """withColumn for a dotted struct path, via withField."""
    parts = dotted.split(".")
    if len(parts) == 1:
        return df.withColumn(dotted, expr)
    root = parts[0]
    cur = expr
    # build withField chain from the leaf upward
    for depth in range(len(parts) - 1, 0, -1):
        parent = F.col(".".join(parts[:depth]))
        cur = parent.withField(parts[depth], cur)
    return df.withColumn(root, cur)


def apply_modifiers(df: DataFrame, modifiers: list) -> DataFrame:
    """Apply all modifiers in order. Chained modifiers on the same column
    compose left-to-right within one projection (Catalyst collapses the
    withColumn chain), matching modify.rs:89-126 golden
    ('           hELLO world    ' → trim,lowercase,capitalize →
    'Hello world')."""
    for m in modifiers:
        dtype = resolve_type(df.schema, m.column)
        expr = modifier_expr(m, F.col(m.column), dtype)
        df = _set_nested(df, m.column, expr)
    return df
