"""Skew mitigation operators: salt-and-replicate equi-join.

At 100 TB a single hot join key (one customer with 10% of all events, one
null-ish default id) lands its entire volume in ONE shuffle partition — one
straggler task runs for hours while 999 executors idle. AQE's skew-join split
(`spark.sql.adaptive.skewJoin`) handles moderate skew automatically; explicit
salting is the deterministic fallback when a key is hot enough that even a
split partition's per-key hash bucket is the bottleneck, or when the build
side is too big to broadcast.

Shape: fact rows get a uniform salt in [0, n_salts); the other side is
replicated once per salt value (a `crossJoin` with a broadcast n_salts-row
spine — replication factor is a constant, NOT data-proportional); the join key
becomes (key, salt), so the hot key's volume spreads over n_salts tasks.
Join OUTPUT is identical to the unsalted join — salt only routes rows.

Reference anchor: the reference joins only inside the RDBMS
(`GetDailyTrades.sql`); skew never bites a single-node engine the way it
bites a 1000-executor shuffle — this operator exists for the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` (skewed side) with `dim` (replicated side) on `on`.

    `dim` is replicated n_salts times, so it must be the smaller side —
    but unlike a broadcast it is still SHUFFLED, not collected: total moved
    bytes are n_salts * |dim|, fine for dims too big to broadcast but far
    smaller than the fact. Supports how in ('inner', 'left').
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    overlap = set(fact.columns) & set(dim.columns) - {on}
    if overlap:
        raise ValueError(f"ambiguous columns in both sides: {sorted(overlap)}")

    salts = dim.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    replicated_dim = dim.crossJoin(F.broadcast(salts))
    return (
        salted_fact.join(replicated_dim, [on, "__salt"], how)
        .drop("__salt")
    )
