"""Hidden partitioning (Iceberg transforms): year/month/day/bucket/
truncate partition specs — layout + dir-name pruning WITHOUT surfacing a
derived column to queries; source columns stay in the data files."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import (
    VersionedTable,
    _transform_py,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "vt")


def _dated(spark):
    rows = [
        (1, dt.date(2023, 3, 5), "a"),
        (2, dt.date(2023, 11, 30), "b"),
        (3, dt.date(2024, 1, 1), "c"),
        (4, dt.date(2024, 6, 15), "d"),
        (5, dt.date(2025, 2, 28), "e"),
        (6, None, "f"),
    ]
    return spark.createDataFrame(rows, "id bigint, d date, val string")


def _check_pred_parity(t, predicates):
    """read(predicates=) must equal unpruned read + filter — the
    definitive Spark-vs-Python transform agreement check (a probe
    mismatch would silently drop rows)."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _predicates_to_column,
    )

    pruned = {tuple(r) for r in t.read(predicates=predicates).collect()}
    full = {
        tuple(r)
        for r in t.read()
        .filter(_predicates_to_column(predicates))
        .collect()
    }
    assert pruned == full, predicates
    return pruned


def test_year_transform_layout_and_pruning(spark, root):
    t = VersionedTable.create(
        spark, root, _dated(spark), partition_by=["year(d)"]
    )
    m = t.manifest()
    assert m.partition_by == ("year(d)",)
    # One leaf per year + the null-sentinel leaf; dirs named d_year=N.
    leaves = {
        list(m.stats[rel]["part_values"].items())[0] for rel in m.files
    }
    assert ("d_year", "2023") in leaves and ("d_year", None) in leaves
    assert len(m.files) == 4
    # Source column SURVIVES in the files (hidden partitioning).
    some_leaf = sorted(m.files)[0]
    f = glob.glob(os.path.join(root, some_leaf, "*.parquet"))[0]
    import pyarrow.parquet as pq

    assert "d" in pq.read_schema(f).names
    # Read parity including the NULL row.
    got = {(r.id, r.d, r.val) for r in t.read().collect()}
    assert len(got) == 6 and (6, None, "f") in got
    # Range predicate on the SOURCE column prunes other-year leaves.
    info = t.prune_info([("d", ">=", dt.date(2024, 3, 1))])
    assert info["n_skipped"] >= 2  # 2023 + null leaves at least
    assert {
        r[0]
        for r in _check_pred_parity(t, [("d", ">=", dt.date(2024, 3, 1))])
    } == {4, 5}
    info = t.prune_info([("d", "=", dt.date(2023, 3, 5))])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 3


def test_month_and_day_transforms_cross_year_ranges(spark, root):
    t = VersionedTable.create(
        spark, root, _dated(spark), partition_by=["month(d)"]
    )
    pv = {
        list(t.manifest().stats[rel]["part_values"].values())[0]
        for rel in t.manifest().files
    }
    assert "2023-03" in pv and "2024-06" in pv
    # Lexicographic month strings order chronologically across years.
    info = t.prune_info([("d", ">", dt.date(2023, 12, 1))])
    assert info["n_skipped"] >= 3  # 2023-03, 2023-11, null
    assert {
        r[0]
        for r in _check_pred_parity(t, [("d", ">", dt.date(2023, 12, 1))])
    } == {3, 4, 5}

    root2 = root + "_day"
    t2 = VersionedTable.create(
        spark, root2, _dated(spark), partition_by=["day(d)"]
    )
    info = t2.prune_info([("d", "=", dt.date(2024, 1, 1))])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 5
    assert {
        r[0]
        for r in _check_pred_parity(t2, [("d", "=", dt.date(2024, 1, 1))])
    } == {3}


def test_bucket_transform_equality_pruning(spark, root):
    df = spark.range(0, 200).select(
        "id", (F.col("id") * 3).alias("v")
    )
    t = VersionedTable.create(
        spark, root, df, partition_by=["bucket(4, id)"]
    )
    m = t.manifest()
    assert len(m.files) == 4  # every bucket populated at n=200
    # Spark-side bucket expr and Python probe agree: the equality
    # predicate lands in exactly one leaf and returns the exact row.
    for probe in (0, 17, 100, 199):
        info = t.prune_info([("id", "=", probe)])
        assert info["n_scanned"] == 1 and info["n_skipped"] == 3, probe
        assert {
            r[0] for r in _check_pred_parity(t, [("id", "=", probe)])
        } == {probe}
    # Range predicates do NOT derive through a hash — but footer stats
    # on the (retained) source column still prune what they can; results
    # stay exact either way.
    assert {
        r[0] for r in _check_pred_parity(t, [("id", ">=", 198)])
    } == {198, 199}


def test_truncate_transforms_int_and_string(spark, root):
    rows = [(-17,), (-3,), (0,), (7,), (23,), (41,)]
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(rows, "n bigint"),
        partition_by=["truncate(10, n)"],
    )
    pv = {
        list(t.manifest().stats[rel]["part_values"].values())[0]
        for rel in t.manifest().files
    }
    # Floor-to-multiple, negatives included: -17 -> -20, -3 -> -10.
    assert {"-20", "-10", "0", "20", "40"} <= pv
    info = t.prune_info([("n", ">=", 20)])
    assert info["n_skipped"] >= 3
    assert {
        r[0] for r in _check_pred_parity(t, [("n", ">=", 20)])
    } == {23, 41}
    assert {
        r[0] for r in _check_pred_parity(t, [("n", "=", -17)])
    } == {-17}

    root2 = root + "_str"
    t2 = VersionedTable.create(
        spark,
        root2,
        spark.createDataFrame(
            [("apple",), ("apricot",), ("banana",), ("cherry",)],
            "s string",
        ),
        partition_by=["truncate(2, s)"],
    )
    info = t2.prune_info([("s", "=", "banana")])
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    assert {
        r[0] for r in _check_pred_parity(t2, [("s", ">=", "b")])
    } == {"banana", "cherry"}


def test_mixed_identity_and_transform_spec(spark, root):
    df = spark.createDataFrame(
        [
            (1, "x", dt.date(2023, 5, 1)),
            (2, "y", dt.date(2023, 5, 2)),
            (3, "x", dt.date(2024, 7, 3)),
        ],
        "id bigint, grp string, d date",
    )
    t = VersionedTable.create(
        spark, root, df, partition_by=["grp", "year(d)"]
    )
    m = t.manifest()
    assert len(m.files) == 3  # (x,2023) (y,2023) (x,2024)
    # Identity col recovered from dirs; source d kept in files.
    got = {(r.id, r.grp, r.d) for r in t.read().collect()}
    assert got == {
        (1, "x", dt.date(2023, 5, 1)),
        (2, "y", dt.date(2023, 5, 2)),
        (3, "x", dt.date(2024, 7, 3)),
    }
    # Both prune axes compose.
    info = t.prune_info(
        [("grp", "=", "x"), ("d", ">=", dt.date(2024, 1, 1))]
    )
    assert info["n_scanned"] == 1 and info["n_skipped"] == 2
    assert {
        r[0]
        for r in _check_pred_parity(
            t, [("grp", "=", "x"), ("d", ">=", dt.date(2024, 1, 1))]
        )
    } == {3}


def test_transform_spec_evolution_and_dml(spark, root):
    t = VersionedTable.create(spark, root, _dated(spark))
    t.set_partition_spec(["month(d)"])
    t.append(
        spark.createDataFrame(
            [(7, dt.date(2025, 9, 9), "g")], "id bigint, d date, val string"
        )
    )
    # Mixed layout reads as one snapshot.
    assert t.read().count() == 7
    # DML keeps the layout and stays correct.
    t.merge(
        spark.createDataFrame(
            [(7, dt.date(2025, 9, 9), "G")], "id bigint, d date, val string"
        ),
        ["id"],
    )
    t.delete_where(F.col("id") == 1)
    got = {(r.id, r.val) for r in t.read().collect()}
    assert (7, "G") in got and 1 not in {g[0] for g in got}
    # compact() migrates everything to the transform layout.
    t.compact()
    m = t.manifest()
    assert all(
        "d_month" in m.stats[rel].get("part_values", {})
        for rel in m.files
    )
    info = t.prune_info([("d", ">=", dt.date(2025, 1, 1))])
    assert info["n_skipped"] >= 3


def test_transform_through_datasource_writer_and_reader(spark, root):
    """create-on-first-write with a transform spec through the
    sessionless writer; pushed filters prune transform leaves through
    the batch DataSource."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableReader,
        register,
    )

    register(spark)
    df = _dated(spark)
    (
        df.write.format("versioned")
        .mode("append")
        .option("table_root", root)
        .option("partition_by", "year(d)")
        .save()
    )
    t = VersionedTable(spark, root)
    assert t.partition_by == ("year(d)",)
    assert len(t.manifest().files) == 4  # 3 years + null sentinel
    got = {(r.id, r.d) for r in t.read().collect()}
    assert len(got) == 6
    # Pushed filter on the source column prunes leaves in the reader.
    import datetime as _dt

    from pyspark.sql.datasource import GreaterThanOrEqual

    rd = VersionedTableReader({"table_root": root})
    list(
        rd.pushFilters(
            [GreaterThanOrEqual(("d",), _dt.date(2025, 1, 1))]
        )
    )
    assert len(rd.partitions()) == 1
    ds = {
        r.id
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .filter("d >= '2025-01-01'")
        .collect()
    }
    assert ds == {5}


def test_transform_validation_errors(spark, root):
    df = _dated(spark)
    with pytest.raises(ValueError, match="date/timestamp"):
        VersionedTable.create(
            spark, root + "a", df, partition_by=["year(id)"]
        )
    with pytest.raises(ValueError, match="positive parameter"):
        VersionedTable.create(
            spark, root + "b", df, partition_by=["bucket(0, id)"]
        )
    with pytest.raises(ValueError, match="not in schema"):
        VersionedTable.create(
            spark, root + "c", df, partition_by=["year(nope)"]
        )
    with pytest.raises(ValueError, match="collides"):
        VersionedTable.create(
            spark,
            root + "d",
            df.withColumn("d_year", F.lit(1)),
            partition_by=["year(d)"],
        )
    # bucket(date) became legal in the round-6 continuation; truncate
    # of a date stays out (no Iceberg width semantics for it here).
    with pytest.raises(ValueError, match="int/string"):
        VersionedTable.create(
            spark, root + "e", df, partition_by=["truncate(3, d)"]
        )


def test_transform_py_matches_spark_exprs(spark):
    """Direct build-vs-probe agreement on a value battery (the read
    parity tests cover it end-to-end; this pins the primitive)."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
    )

    vals = [
        dt.date(2023, 1, 31),
        dt.date(2024, 12, 1),
        dt.date(1999, 6, 9),
    ]
    df = spark.createDataFrame([(v,) for v in vals], "d date")
    for fn in ("year", "month", "day"):
        spark_vals = [
            r.t
            for r in df.select(
                _transform_expr(fn, None, "d", "date").alias("t")
            ).collect()
        ]
        py_vals = [_transform_py(fn, None, v, "date") for v in vals]
        assert spark_vals == py_vals, fn
    ints = [-17, -3, 0, 7, 12345]
    dfi = spark.createDataFrame([(v,) for v in ints], "n bigint")
    for fn, param in (("bucket", 7), ("truncate", 10)):
        spark_vals = [
            r.t
            for r in dfi.select(
                _transform_expr(fn, param, "n", "bigint").alias("t")
            ).collect()
        ]
        py_vals = [_transform_py(fn, param, v, "bigint") for v in ints]
        assert spark_vals == py_vals, fn
    strs = ["apple", "z", "né", ""]
    dfs = spark.createDataFrame([(v,) for v in strs], "s string")
    for fn, param in (("bucket", 5), ("truncate", 2)):
        spark_vals = [
            r.t
            for r in dfs.select(
                _transform_expr(fn, param, "s", "string").alias("t")
            ).collect()
        ]
        py_vals = [_transform_py(fn, param, v, "string") for v in strs]
        assert spark_vals == py_vals, fn


def test_transform_aware_scoped_merge(spark, root):
    """A merge keyed on a transform's SOURCE column scopes its rewrite
    to the matching transform leaves: other-month leaves carry forward
    physically untouched."""
    rows = [
        (1, dt.date(2024, 1, 5), "a"),
        (2, dt.date(2024, 2, 10), "b"),
        (3, dt.date(2024, 3, 15), "c"),
        (4, dt.date(2024, 3, 20), "d"),
    ]
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(rows, "id bigint, d date, val string"),
        partition_by=["month(d)"],
    )
    v = t.merge(
        spark.createDataFrame(
            [(3, dt.date(2024, 3, 15), "C")],
            "id bigint, d date, val string",
        ),
        ["d", "id"],
    )
    summary = t.manifest(v).summary
    # Jan + Feb leaves refuted purely by the derived month predicate.
    assert summary.get("n_dirs_untouched", 0) >= 2
    got = {(r.id, r.val) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b"), (3, "C"), (4, "d")}


def test_old_spec_transform_leaves_keep_pruning_after_evolution(
    spark, root
):
    """Partition evolution must not cost historical leaves their
    dir-name pruning: predicates derive transform-alias predicates for
    EVERY spec the table has lived under (manifest `past_specs`), so a
    month-partitioned generation still prunes after the spec moved to
    bucket(4, id) — and vice versa."""
    t = VersionedTable.create(
        spark, root, _dated(spark), partition_by=["month(d)"]
    )
    n_month_leaves = len(t.manifest().files)
    assert n_month_leaves >= 5  # one per distinct month + null
    t.set_partition_spec(["bucket(4, id)"])
    assert t.manifest().past_specs == (("month(d)",),)
    t.append(
        spark.createDataFrame(
            [
                (10, dt.date(2024, 6, 1), "x"),
                (11, dt.date(2025, 2, 2), "y"),
            ],
            "id bigint, d date, val string",
        )
    )
    # OLD-spec month leaves must still refute a date range by dir name.
    info = t.prune_info([("d", ">=", dt.date(2025, 1, 1))])
    assert info["n_skipped"] >= 3, info  # 2023-03/2023-11/2024-01/...
    got = _check_pred_parity(t, [("d", ">=", dt.date(2025, 1, 1))])
    assert {g[0] for g in got} == {5, 11}
    # NEW-spec bucket leaves prune on id equality while old leaves keep
    # month pruning — both generations, one predicate set each.
    info2 = t.prune_info([("id", "=", 10)])
    assert info2["n_skipped"] >= 3, info2  # 3 of 4 bucket leaves refute
    assert {g[0] for g in _check_pred_parity(t, [("id", "=", 10)])} == {
        10
    }
    # And the batch DataSource plans with the same historical aliases.
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    ds = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .filter("d >= DATE'2025-01-01'")
    )
    assert {r.id for r in ds.collect()} == {5, 11}


def test_param_ambiguous_alias_disables_derivation_not_correctness(
    spark, root
):
    """bucket(4, id) evolved to bucket(8, id): both generations write
    `id_bucket=` dir names with DIFFERENT hashes. Deriving equality for
    either param could wrongly refute the other generation's leaves, so
    derivation must skip the ambiguous alias — reads stay exact."""
    t = VersionedTable.create(
        spark, root, _dated(spark), partition_by=["bucket(4, id)"]
    )
    t.set_partition_spec(["bucket(8, id)"])
    t.append(
        spark.createDataFrame(
            [(20, dt.date(2024, 1, 1), "z")],
            "id bigint, d date, val string",
        )
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        _union_transform_entries,
    )

    assert (
        _union_transform_entries(
            t.manifest().partition_by, t.manifest().past_specs
        )
        == []
    )
    # Every id remains findable — nothing wrongly refuted.
    for probe in (1, 2, 3, 4, 5, 6, 20):
        got = _check_pred_parity(t, [("id", "=", probe)])
        assert {g[0] for g in got} == ({probe} if probe != 6 else {6})


def test_hour_transform_layout_pruning_and_parity(spark, root):
    """hour(ts): zero-padded `ts_hour=YYYY-MM-DD-HH` leaves, range
    derivation (lexicographic = chronological), Spark-expr vs Python
    probe agreement, and the timestamp-only validation."""
    rows = [
        (1, dt.datetime(2024, 1, 5, 3, 15), "a"),
        (2, dt.datetime(2024, 1, 5, 3, 59), "b"),
        (3, dt.datetime(2024, 1, 5, 14, 0), "c"),
        (4, dt.datetime(2024, 1, 6, 0, 30), "d"),
        (5, dt.datetime(2023, 12, 31, 23, 45), "e"),
        (6, None, "f"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, ts timestamp, val string"
    )
    t = VersionedTable.create(
        spark, root, df, partition_by=["hour(ts)"]
    )
    m = t.manifest()
    leaves = {
        m.stats[rel]["part_values"]["ts_hour"] for rel in m.files
    }
    assert leaves == {
        "2024-01-05-03",
        "2024-01-05-14",
        "2024-01-06-00",
        "2023-12-31-23",
        None,
    }
    # Source column survives in the files; no derived column in queries.
    assert t.read().columns == ["id", "ts", "val"]
    # Range pruning across a day boundary.
    info = t.prune_info(
        [("ts", ">=", dt.datetime(2024, 1, 5, 14, 0))]
    )
    assert info["n_skipped"] >= 3  # 03h x1 leaf? (two rows same leaf), 12-31, null
    got = _check_pred_parity(
        t, [("ts", ">=", dt.datetime(2024, 1, 5, 14, 0))]
    )
    assert {g[0] for g in got} == {3, 4}
    # Equality derivation prunes to a single hour leaf.
    info2 = t.prune_info([("ts", "=", dt.datetime(2024, 1, 5, 3, 15))])
    assert info2["n_skipped"] >= 4
    # Direct Spark-expr vs Python battery for hour.
    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
    )

    vals = [r[1] for r in rows if r[1] is not None]
    dft = spark.createDataFrame([(v,) for v in vals], "ts timestamp")
    spark_vals = [
        r.t
        for r in dft.select(
            _transform_expr("hour", None, "ts", "timestamp").alias("t")
        ).collect()
    ]
    assert spark_vals == [
        _transform_py("hour", None, v, "timestamp") for v in vals
    ]
    # hour() refuses date columns (a date has no hour).
    with pytest.raises(Exception, match="timestamp"):
        VersionedTable.create(
            spark,
            str(root) + "_bad",
            _dated(spark),
            partition_by=["hour(d)"],
        )
    # And a date-valued probe never derives a wrong hour predicate.
    assert _transform_py("hour", None, dt.date(2024, 1, 5), "date") is None


def test_spec_snapshots_make_param_evolved_pruning_exact(spark, root):
    """Per-entry spec snapshots: after bucket(4, id) evolves to
    bucket(8, id), the UNION derivation must still exclude the
    ambiguous alias (legacy behavior), but entries stamped with their
    governing spec derive against EXACTLY that spec — so an equality
    probe prunes old-generation leaves with modulus 4 and new-generation
    leaves with modulus 8, and parity holds throughout."""
    big = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + (i % 20)), f"v{i}") for i in range(64)],
        "id bigint, d date, val string",
    )
    t = VersionedTable.create(
        spark, root, big, partition_by=["bucket(4, id)"]
    )
    n_gen1 = len(t.manifest().files)
    t.set_partition_spec(["bucket(8, id)"])
    t.append(
        spark.createDataFrame(
            [(i, dt.date(2024, 2, 1), f"w{i}") for i in range(64, 128)],
            "id bigint, d date, val string",
        )
    )
    m = t.manifest()
    # Every entry recorded its governing spec.
    specs = {tuple(m.stats[rel].get("spec") or ()) for rel in m.files}
    assert specs == {("bucket(4, id)",), ("bucket(8, id)",)}
    # Equality probe: exactly ONE leaf per generation may match — the
    # 4-bucket leaf holding hash%4 and the 8-bucket leaf holding hash%8.
    info = t.prune_info([("id", "=", 10)])
    assert info["n_scanned"] <= 2
    assert info["n_skipped"] >= len(m.files) - 2
    assert n_gen1 >= 2  # the old generation really had multiple leaves
    # Parity for probes in both generations (incl. one absent value).
    for probe in (0, 10, 63, 64, 100, 127, 999):
        got = _check_pred_parity(t, [("id", "=", probe)])
        assert {g[0] for g in got} == ({probe} if probe < 128 else set())


def test_spec_snapshots_scope_merge_and_optimize_after_evolution(
    spark, root
):
    """compact(where=) classification is per-entry too: a predicate on
    the bucket source column rewrites only the matching leaves in EACH
    generation (old-modulus leaves classified with their own spec)."""
    t = VersionedTable.create(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(32)], "id bigint, val string"
        ),
        partition_by=["bucket(4, id)"],
    )
    t.set_partition_spec(["bucket(8, id)"])
    t.append(
        spark.createDataFrame(
            [(i, f"w{i}") for i in range(32, 64)],
            "id bigint, val string",
        )
    )
    before = t.manifest()
    v = t.compact(where=[("id", "=", 10)])
    after = t.manifest(v)
    # Only the (<=2) leaves that could hold id=10 were rewritten; the
    # rest carried forward byte-identically (same rels).
    carried = set(before.files) & set(after.files)
    assert len(set(before.files) - carried) <= 2
    # Rows intact.
    assert t.read().count() == 64
    assert {r.id for r in t.read(predicates=[("id", "=", 10)]).collect()} == {10}


def test_decimal_truncate_and_date_bucket_transforms(spark, root):
    """Round-6 continuation transform widening: truncate(W, decimal)
    floors the UNSCALED value to a multiple of W (Iceberg semantics,
    shared floor-mod so Spark and the Python twin agree on negatives),
    bucket(N, date) hashes the canonical ISO string (= Spark's
    date->string cast). Layout + pruning + DML parity end to end."""
    from decimal import Decimal

    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
        _transform_py,
    )

    # Twin parity batteries (incl. negatives and exact-multiple edges).
    vals = ["1.55", "-0.05", "-0.10", "0.00", "123.45", "-123.45"]
    dfd = spark.createDataFrame(
        [(Decimal(v),) for v in vals], "d decimal(10,2)"
    )
    for w in (10, 100, 7):
        sp = [
            r.t
            for r in dfd.select(
                _transform_expr(
                    "truncate", w, "d", "decimal(10,2)"
                ).alias("t")
            ).collect()
        ]
        assert sp == [
            _transform_py("truncate", w, Decimal(v), "decimal(10,2)")
            for v in vals
        ], w
    dates = [dt.date(2024, 1, 5), dt.date(1999, 12, 31), dt.date(2025, 2, 28)]
    dfb = spark.createDataFrame([(d,) for d in dates], "d date")
    sp = [
        r.t
        for r in dfb.select(
            _transform_expr("bucket", 8, "d", "date").alias("t")
        ).collect()
    ]
    assert sp == [_transform_py("bucket", 8, d, "date") for d in dates]

    # End to end: composite spec, hive round trip, pruning parity, DML.
    rows = [
        (
            i,
            Decimal(f"{i * 3}.{i % 100:02d}"),
            dt.date(2024, 1 + i % 12, 1 + i % 28),
        )
        for i in range(40)
    ] + [(99, None, None)]
    df = spark.createDataFrame(
        rows, "id bigint, amt decimal(10,2), d date"
    )
    t = VersionedTable.create(
        spark, root, df,
        partition_by=["truncate(1000, amt)", "bucket(4, d)"],
    )
    got = _check_pred_parity(t, [("amt", ">=", Decimal("60.00"))])
    assert all(g[1] >= Decimal("60.00") for g in got)
    info = t.prune_info([("amt", "<", Decimal("10.00"))])
    assert info["n_skipped"] > 0
    _check_pred_parity(t, [("d", "=", dt.date(2024, 2, 2))])
    info_d = t.prune_info([("d", "=", dt.date(2024, 2, 2))])
    assert info_d["n_skipped"] > 0  # bucket equality prunes sibling dates
    # DML keeps the layout: scoped update on the decimal dimension.
    t.update_where(
        [("amt", "<", Decimal("30.00"))], {"id": "id + 1000"}
    )
    assert t.read().count() == 41
    _check_pred_parity(t, [("amt", ">=", Decimal("60.00"))])


def test_decimal_truncate_negative_precision_boundary(spark, root):
    """Values near the type's most-negative bound floor to a multiple
    needing precision p+1 (decimal(4,2) -99.95 with truncate(10) ->
    -100.00): the Spark expression must NOT overflow the source type to
    NULL (which would land the row in the null partition dir and make
    predicated reads silently skip it) — it widens to decimal(38,s),
    byte-identical to the prec-60 Python twin."""
    from decimal import Decimal

    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
        _transform_py,
    )

    vals = ["-99.95", "-99.99", "99.99", "-0.01"]
    dfd = spark.createDataFrame(
        [(Decimal(v),) for v in vals], "d decimal(4,2)"
    )
    sp = [
        r.t
        for r in dfd.select(
            _transform_expr("truncate", 10, "d", "decimal(4,2)").alias(
                "t"
            )
        ).collect()
    ]
    py = [
        _transform_py("truncate", 10, Decimal(v), "decimal(4,2)")
        for v in vals
    ]
    assert sp == py
    assert None not in sp  # the overflow-to-NULL bug
    assert sp[0] == Decimal("-100.00")

    # End to end: the boundary row lands in its real partition dir and
    # predicated reads find it.
    rows = [(i, Decimal(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, d decimal(4,2)")
    t = VersionedTable.create(
        spark, root, df, partition_by=["truncate(10, d)"]
    )
    pv = {
        t.manifest().stats[rel]["part_values"]["d_truncate"]
        for rel in t.manifest().files
    }
    assert "-100.00" in pv
    got = t.read(predicates=[("d", "<", Decimal("-99.90"))])
    assert {r.id for r in got.collect()} == {0, 1}


def test_decimal_truncate_through_datasource_writer(spark, root):
    """The sessionless Arrow writer computes decimal-truncate and
    date-bucket leaf segments with the same Python twin; round trip
    through the batch DataSource stays exact."""
    from decimal import Decimal

    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    rows = [
        (i, Decimal(f"{i * 7}.{i % 100:02d}"), dt.date(2024, 1 + i % 3, 5))
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, amt decimal(10,2), d date"
    )
    (
        df.write.format("versioned")
        .mode("append")
        .option("table_root", root)
        .option("partition_by", "truncate(5000, amt), bucket(2, d)")
        .save()
    )
    t = VersionedTable(spark, root)
    assert t.partition_by == ("truncate(5000, amt)", "bucket(2, d)")
    # Dir names agree with the session writer's convention: committing
    # the same rows through the session path yields the same leaf keys.
    pv = {
        tuple(sorted(t.manifest().stats[rel]["part_values"].items()))
        for rel in t.manifest().files
    }
    root2 = root + "_session"
    t2 = VersionedTable.create(
        spark, root2, df,
        partition_by=["truncate(5000, amt)", "bucket(2, d)"],
    )
    pv2 = {
        tuple(sorted(t2.manifest().stats[rel]["part_values"].items()))
        for rel in t2.manifest().files
    }
    assert pv == pv2
    got = {
        tuple(r)
        for r in spark.read.format("versioned")
        .option("table_root", root)
        .load()
        .collect()
    }
    assert got == {tuple(r) for r in df.collect()}
    _check_pred_parity(t, [("amt", ">=", Decimal("70.00"))])


def test_widened_transform_validation(spark, root):
    """truncate(date/timestamp) refused; decimal bucket refused
    (bucket over date AND timestamp became legal — timestamps hash a
    fixed-width date_format rendering with an exact strftime twin)."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, Decimal("1.00"), dt.datetime(2024, 1, 1))],
        "id bigint, amt decimal(10,2), ts timestamp",
    )
    for i, spec in enumerate((
        ["truncate(2, ts)"],
        ["bucket(4, amt)"],
    )):
        with pytest.raises(Exception):
            VersionedTable.create(
                spark, root + str(i), df, partition_by=spec
            )


def test_timestamp_bucket_transform(spark, root):
    """bucket(N, ts): Spark's fixed-format date_format and the Python
    strftime twin agree byte-for-byte (incl. microseconds and zero
    fractions), equality probes prune, parity holds, and the Arrow
    writer computes identical leaf keys."""
    from datalakeingestionservice_spark.sinks.versioned import (
        _transform_expr,
        _transform_py,
    )

    vals = [
        dt.datetime(2024, 1, 5, 3, 15, 0),
        dt.datetime(2024, 1, 5, 3, 15, 0, 123456),
        dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2024, 6, 1, 0, 0, 0, 1),
    ]
    for ddl, styp in (
        ("ts timestamp", "timestamp"),
        ("ts timestamp_ntz", "timestamp_ntz"),
    ):
        dft = spark.createDataFrame([(v,) for v in vals], ddl)
        sp = [
            r.b
            for r in dft.select(
                _transform_expr("bucket", 8, "ts", styp).alias("b")
            ).collect()
        ]
        assert sp == [
            _transform_py("bucket", 8, v, styp) for v in vals
        ], styp
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 20, i % 24, i % 60, 0, i))
        for i in range(48)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp")
    t = VersionedTable.create(
        spark, root, df, partition_by=["bucket(4, ts)"]
    )
    probe = rows[7][1]
    info = t.prune_info([("ts", "=", probe)])
    assert info["n_skipped"] >= 1  # sibling buckets refuted by hash
    _check_pred_parity(t, [("ts", "=", probe)])
    _check_pred_parity(t, [("ts", ">=", dt.datetime(2024, 1, 10))])
    # Arrow-writer leaf keys match the session writer's.
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register,
    )

    register(spark)
    root2 = root + "_ds"
    (
        df.write.format("versioned")
        .mode("append")
        .option("table_root", root2)
        .option("partition_by", "bucket(4, ts)")
        .save()
    )
    t2 = VersionedTable(spark, root2)
    pv1 = {
        tuple(sorted(t.manifest().stats[r]["part_values"].items()))
        for r in t.manifest().files
    }
    pv2 = {
        tuple(sorted(t2.manifest().stats[r]["part_values"].items()))
        for r in t2.manifest().files
    }
    assert pv1 == pv2
    assert {tuple(r) for r in t2.read().collect()} == {
        tuple(r) for r in df.collect()
    }
