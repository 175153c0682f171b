"""Z-order layout (operators/layout.py): Morton bit math, and the actual
pruning payoff — footer min/max overlap counts on written files, z-ordered
vs linearly sorted."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.operators.layout import (
    int_bucket,
    zorder_column,
    zorder_repartition,
    zvalue,
)


def test_int_bucket_identity_and_clamp(spark):
    df = spark.createDataFrame([(i,) for i in (-5, 0, 31, 63, 99)], "x long")
    out = df.select(
        int_bucket(F.col("x"), 0, 63, 6).alias("b")
    ).collect()
    assert [r.b for r in out] == [0, 0, 31, 63, 63]


def test_zvalue_hand_computed(spark):
    # b1=1 -> bit0 at position 0; b2=2 -> bit1 at position 1*2+1=3.
    df = spark.createDataFrame([(1, 2)], "b1 long, b2 long")
    z = df.select(
        zvalue([F.col("b1"), F.col("b2")], 2).alias("z")
    ).collect()[0].z
    assert z == 1 + 8
    # Full 2-bit table: z = interleave(b1, b2), b1 in low even bits.
    df = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4)], "b1 long, b2 long"
    )
    for r in df.select(
        "b1", "b2", zvalue([F.col("b1"), F.col("b2")], 2).alias("z")
    ).collect():
        expect = sum(
            ((r.b1 >> i) & 1) << (2 * i) | ((r.b2 >> i) & 1) << (2 * i + 1)
            for i in range(2)
        )
        assert r.z == expect


def _grid(spark, n=64):
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )


def _file_overlap(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files overlapping [lo,hi] on col, total files) via parquet footers."""
    import pyarrow.parquet as pq

    total = touched = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for i in range(md.num_row_groups):
            for j in range(md.row_group(i).num_columns):
                c = md.row_group(i).column(j)
                if c.path_in_schema == col and c.statistics.has_min_max:
                    st = c.statistics
                    fmin = st.min if fmin is None else min(fmin, st.min)
                    fmax = st.max if fmax is None else max(fmax, st.max)
        total += 1
        if fmin is not None and not (fmax < lo or fmin > hi):
            touched += 1
    return touched, total


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """16 z-ordered files over a 64x64 grid are ~4x4 tiles: a 1/8-range
    predicate on EITHER axis touches a minority of files. The linear
    layout (range-sorted on x) prunes on x but a y-predicate touches
    every file — the exact failure z-ordering exists to fix."""
    grid = _grid(spark)
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_repartition(
        grid, ["x", "y"], 16, bits=6, ranges={"x": (0, 63), "y": (0, 63)}
    ).write.parquet(zpath)
    grid.repartitionByRange(16, "x").sortWithinPartitions(
        "x", "y"
    ).write.parquet(lpath)

    zx, ztot = _file_overlap(zpath, "x", 0, 7)
    zy, _ = _file_overlap(zpath, "y", 0, 7)
    lx, ltot = _file_overlap(lpath, "x", 0, 7)
    ly, _ = _file_overlap(lpath, "y", 0, 7)
    assert ztot == 16 and ltot == 16
    # Z-order: both axes prune (a 16-wide tile column is 4 files + sampling
    # slack at repartitionByRange boundaries).
    assert zx <= 8 and zy <= 8, (zx, zy)
    # Linear: x prunes hard, y not at all.
    assert lx <= 4, lx
    assert ly >= 14, ly


def test_zorder_column_computes_ranges_when_omitted(spark):
    grid = _grid(spark, 16)
    with_given = grid.select(
        zorder_column(grid, ["x", "y"], 4, {"x": (0, 15), "y": (0, 15)})
        .alias("z")
    )
    with_derived = grid.select(
        zorder_column(grid, ["x", "y"], 4).alias("z")
    )
    assert sorted(r.z for r in with_given.collect()) == sorted(
        r.z for r in with_derived.collect()
    )


def test_zorder_repartition_preserves_rows(spark):
    grid = _grid(spark, 32)
    out = zorder_repartition(
        grid, ["x", "y"], 8, bits=5, ranges={"x": (0, 31), "y": (0, 31)}
    )
    assert out.columns == ["x", "y"]
    assert out.count() == 32 * 32
    assert out.rdd.getNumPartitions() == 8


def test_zorder_temporal_columns(spark, tmp_path):
    """Date/timestamp columns cluster natively (epoch-days/seconds
    normalization inside the JVM expression) — z-ordering a (date, int)
    pair partitions both dimensions and round-trips every row."""
    import datetime as dt

    from datalakeingestionservice_spark.operators.layout import (
        zorder_repartition,
    )

    rows = [
        (dt.date(2024, 1, 1 + i % 28), i, dt.datetime(2024, 1, 1, i % 24))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "d date, k int, ts timestamp")
    out = zorder_repartition(df, ["d", "k"], num_partitions=4)
    assert out.count() == 1000
    assert sorted(r.k for r in out.collect()) == list(range(1000))
    # Timestamp z-ordering too (explicit temporal ranges accepted).
    out2 = zorder_repartition(
        df,
        ["ts", "k"],
        num_partitions=4,
        ranges={
            "ts": (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)),
            "k": (0, 999),
        },
    )
    assert out2.count() == 1000


def test_zorder_string_column(spark, tmp_path):
    """String columns cluster via an order-preserving 7-byte prefix int:
    a 2-D z-order on (city, id) prunes string-equality/range reads to a
    minority of files, and the int mapping preserves lexicographic
    order (the property the bucketing relies on)."""
    import itertools

    from datalakeingestionservice_spark.operators.layout import (
        _int_value,
        zorder_repartition,
    )

    # Order preservation of the prefix mapping (driver-side reference).
    words = ["", "a", "ab", "abc", "abd", "b", "ba", "zz", "zza"]
    vals = [_int_value(w) for w in words]
    assert vals == sorted(vals)
    for w1, w2 in itertools.combinations(words, 2):
        assert (w1 < w2) == (_int_value(w1) < _int_value(w2))

    cities = [f"city_{chr(ord('a') + i)}" for i in range(16)]
    df = spark.createDataFrame(
        [(c, i) for c in cities for i in range(256)],
        "city string, id bigint",
    )
    path = str(tmp_path / "zs")
    zorder_repartition(df, ["city", "id"], 16, bits=4).write.parquet(path)

    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(path + "/*.parquet"))
    assert len(files) == 16

    def overlap(col, lo, hi):
        n = 0
        for p in files:
            md = pq.ParquetFile(p).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st.min <= hi and st.max >= lo:
                    n += 1
                    break
        return n

    # A 2-of-16-cities slice touches a minority of files; same for an
    # id slice — both axes cluster.
    assert overlap("city", "city_a", "city_b") <= 8
    assert overlap("id", 0, 31) <= 8
    # Executor/driver mapping agreement: the Spark expression and
    # _int_value produce identical ints.
    from datalakeingestionservice_spark.operators.layout import _int_expr

    got = (
        spark.createDataFrame([(w,) for w in words if w], "s string")
        .select(_int_expr(spark.createDataFrame([("x",)], "s string"), "s"))
        .collect()
    )
    exp = [_int_value(w) for w in words if w]
    assert [r[0] for r in got] == exp


def test_zorder_decimal_column(spark, tmp_path):
    """Decimal keys cluster via their unscaled int64 (order-preserving,
    exact for p <= 18): a 2-D z-order on (price, id) prunes a
    price-range read to a minority of files, and the driver-side bound
    mapping agrees with the column expression."""
    from decimal import Decimal

    from datalakeingestionservice_spark.operators.layout import (
        _int_expr,
        _int_value,
        zorder_repartition,
    )

    vals = [Decimal("0.00"), Decimal("0.01"), Decimal("12.50"),
            Decimal("-3.25"), Decimal("9999.99")]
    mapped = [_int_value(v) for v in vals]
    assert mapped == [0, 1, 1250, -325, 999999]
    df0 = spark.createDataFrame(
        [(v,) for v in vals], "price decimal(10,2)"
    )
    spark_mapped = [
        r.m for r in df0.select(_int_expr(df0, "price").alias("m")).collect()
    ]
    assert spark_mapped == mapped

    df = spark.createDataFrame(
        [
            (Decimal(f"{p}.{q:02d}"), p * 100 + q)
            for p in range(16)
            for q in range(0, 100, 7)
        ],
        "price decimal(10,2), id bigint",
    )
    path = str(tmp_path / "zd")
    zorder_repartition(df, ["price", "id"], 16, bits=4).write.parquet(
        path
    )
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(path + "/*.parquet"))
    # pyarrow can't surface decimal FOOTER stats (the engine's own
    # stats harvester documents the same limitation) — evaluate the
    # clustering from the actual per-file value envelopes instead.
    import pyarrow.compute as pc

    hit = 0
    for f in files:
        col = pq.read_table(f, columns=["price"]).column("price")
        mm = pc.min_max(col).as_py()
        if mm["min"] <= Decimal("3.99") and mm["max"] >= Decimal(
            "2.00"
        ):
            hit += 1
    assert hit <= len(files) // 2, (hit, len(files))
