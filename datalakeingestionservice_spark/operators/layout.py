"""Z-order (Morton-curve) multi-dimensional clustering.

A range-partitioned sort clusters files tightly on the LEADING sort column
only; predicates on the second column touch nearly every file. Z-ordering
interleaves the bits of per-column bucket ranks so that consecutive z-values
are close in EVERY clustered dimension — each written file then covers a
small hyper-rectangle of the key space, and file/dir min-max stats (parquet
footers, `sinks/versioned.py` manifests) prune scans on ANY clustered
column. Same layout idea as Delta OPTIMIZE ZORDER BY / Iceberg sort orders.

Everything here is built-in JVM expressions — bucketing is integer
arithmetic, bit interleave is shift/and/or folds; no Python UDFs, so the
z-value computation rides whole-stage codegen and the only data movement is
the final `repartitionByRange` (one shuffle, which IS the clustering).

Reference: no analog — its layout is "one parquet file per extraction"
(`src/Infrastructure/Upload/UploadHandler.cs:22-126`); this is what table
layout means on a lake at 100 TB.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import re
from decimal import Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = _dt.date(1970, 1, 1)


_STR_PREFIX_BYTES = 7  # 56 bits: fits a positive int64 exactly


def _int_expr(df: DataFrame, c: str) -> Column:
    """Normalize a clusterable column to int64 JVM-side: dates become epoch
    days, timestamps epoch SECONDS (second granularity keeps
    (hi-lo+1)*2^bits far inside the 2^53 exact-divide envelope of
    `int_bucket` — day/sub-second precision buys nothing for layout).

    Strings map to their first 7 UTF-8 BYTES, zero-padded, read as a
    big-endian integer — order-preserving for Spark's binary string
    comparison (UTF-8 byte order == code-point order), so z-order
    clustering on e.g. country codes or URL prefixes works with the same
    pure-JVM bit arithmetic; strings sharing a 7-byte prefix land in one
    bucket, which only coarsens clustering, never correctness."""
    t = {f.name: f.dataType.simpleString() for f in df.schema.fields}.get(c)
    col = F.col(c)
    if t == "date":
        return F.unix_date(col)
    if t in ("timestamp", "timestamp_ntz"):
        return F.unix_seconds(col.cast("timestamp"))
    if t == "string" or (t or "").startswith(("varchar", "char")):
        padded = F.substring(
            F.concat(
                F.encode(col, "UTF-8"), F.lit(bytes(_STR_PREFIX_BYTES))
            ),
            1,
            _STR_PREFIX_BYTES,
        )
        return F.conv(F.hex(padded), 16, 10).cast("long")
    if (t or "").startswith("decimal"):
        # Scale to the UNSCALED integer (order-preserving; exact for
        # p <= 18 — wider decimals overflow long to NULL, which only
        # coarsens clustering into the null range-partition).
        mm = re.match(r"decimal\(\d+,\s*(\d+)\)", t)
        s = int(mm.group(1)) if mm else 0
        return (
            (col * F.lit(10**s)).cast("decimal(38,0)").cast("long")
        )
    return col


def _int_value(v):
    """Normalize a user-passed range bound the same way as `_int_expr`
    (naive datetimes are UTC per the engine's session-TZ contract)."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            # floor, not int(): truncation-toward-zero disagrees with
            # unix_seconds for pre-epoch instants with sub-second parts
            import math

            return math.floor(v.timestamp())
        return calendar.timegm(v.timetuple())
    if isinstance(v, _dt.date):
        return (v - _EPOCH).days
    if isinstance(v, str):
        return int.from_bytes(
            v.encode("utf-8")[:_STR_PREFIX_BYTES].ljust(
                _STR_PREFIX_BYTES, b"\0"
            ),
            "big",
        )
    if isinstance(v, Decimal):
        # Unscale by the VALUE's own exponent — pass bounds at the
        # column's scale (values read from the column naturally are).
        exp = v.as_tuple().exponent
        return int(v.scaleb(-exp)) if isinstance(exp, int) else int(v)
    return v


def int_bucket(
    col: Column, lo: int, hi: int, bits: int
) -> Column:
    """Rank an integer column into 2**bits equal-width buckets over
    [lo, hi], exactly (pure int64 arithmetic — no FP boundary drift, so an
    external engine computes bit-identical buckets). Out-of-range values
    clamp to the edge buckets."""
    n = 1 << bits
    width = hi - lo + 1
    raw = ((col.cast("long") - F.lit(lo)) * n).cast("long")
    # Exact integer division without SQL-text round-trips: raw - raw%width
    # is a multiple of width, so the double divide is exact while
    # raw < 2^53 — i.e. (hi-lo+1)*2^bits < 9e15, comfortably true for any
    # key space this buckets. Clamp handles out-of-range inputs.
    b = ((raw - (raw % width)) / width).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), b))


def zvalue(
    buckets: list[Column], bits: int
) -> Column:
    """Interleave `bits` low bits of each bucket column into a Morton code.

    Bit b of column j lands at position b*len(buckets)+j; disjoint targets
    mean the OR-fold is a sum of shifts — all JVM bitwise expressions."""
    ncols = len(buckets)
    z = F.lit(0).cast("long")
    for j, bcol in enumerate(buckets):
        for b in range(bits):
            bit = F.shiftright(bcol.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ncols + j))
    return z


def zorder_column(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    ranges: dict[str, tuple[int, int]] | None = None,
) -> Column:
    """The z-value expression for `cols` over `df`.

    `ranges` maps column -> (min, max) — ints, or date/datetime bounds for
    temporal columns; when omitted they're computed with ONE aggregate job
    (a handful of scalars to the driver — metadata scale). At 100 TB pass
    known ranges or partition-level bounds instead of rescanning.

    Date/timestamp columns cluster natively (normalized to epoch
    days/seconds inside the JVM expression — no Python in the row path)."""
    exprs = {c: _int_expr(df, c) for c in cols}
    if ranges is None:
        aggs = []
        for c in cols:
            aggs += [
                F.min(exprs[c]).alias(f"lo_{c}"),
                F.max(exprs[c]).alias(f"hi_{c}"),
            ]
        row = df.agg(*aggs).collect()[0]
        ranges = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}
    else:
        ranges = {
            c: (_int_value(lo), _int_value(hi))
            for c, (lo, hi) in ranges.items()
        }
    buckets = [
        int_bucket(exprs[c], ranges[c][0], ranges[c][1], bits) for c in cols
    ]
    return zvalue(buckets, bits)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 8,
    ranges: dict[str, tuple[int, int]] | None = None,
    keep_zcol: bool = False,
) -> DataFrame:
    """Cluster `df` into `num_partitions` z-ordered partitions: one
    range-repartition shuffle on the z-value plus an in-partition sort.
    Written out, each file covers a compact hyper-rectangle in `cols`, so
    footer min-max stats prune on any of them."""
    z = zorder_column(df, cols, bits, ranges)
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(num_partitions, F.col("__z"))
        .sortWithinPartitions("__z")
    )
    return out if keep_zcol else out.drop("__z")
