"""Referential integrity: every child key must exist in the parent table
(north_star: "referential integrity of conv_id across turn partitions").

Plan shape: distinct child keys → LEFT ANTI join against parent keys.
The parent side is broadcast when small (dimension tables, conv_meta);
otherwise a shuffled anti-join with AQE skew handling. Child keys are
reduced to distinct FIRST so the join input is the key cardinality, not
the row count — at 10^12 turns that's the difference between joining
10^9 conv_ids and 10^12 rows."""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F


def referential_orphans(child: DataFrame,
                        child_keys: Union[str, Sequence[str]],
                        parent: DataFrame,
                        parent_keys: Union[str, Sequence[str], None] = None,
                        broadcast_parent: Optional[bool] = None,
                        count_rows: bool = True) -> DataFrame:
    """Child keys with no matching parent row.

    Output: <child_keys...>, n_rows (occurrences in child, if
    ``count_rows``).
    """
    ck = [child_keys] if isinstance(child_keys, str) else list(child_keys)
    pk = parent_keys or ck
    pk = [pk] if isinstance(pk, str) else list(pk)

    if count_rows:
        child_side = child.groupBy(*ck).agg(
            F.count(F.lit(1)).alias("n_rows"))
    else:
        child_side = child.select(*ck).distinct()

    parent_side = parent.select(*pk).distinct()
    if broadcast_parent:
        parent_side = F.broadcast(parent_side)

    cond = None
    for a, b in zip(ck, pk):
        c = child_side[a] == parent_side[b]
        cond = c if cond is None else (cond & c)
    return child_side.join(parent_side, cond, "left_anti")
