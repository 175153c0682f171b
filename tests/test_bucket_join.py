"""VersionedTable.bucket_join — the storage-partitioned-join shape:
two tables bucketed by the same `bucket(N, key)` join bucket-by-bucket
with NO table-wide shuffle (per-bucket broadcasts), output-identical to
a plain join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sinks.versioned import VersionedTable


@pytest.fixture()
def pair(spark, tmp_path):
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(200)], "k bigint, lv string"
    )
    # Right side: partial overlap + duplicate keys (join multiplicity).
    right = spark.createDataFrame(
        [(i, f"r{i}a") for i in range(100, 300)]
        + [(i, f"r{i}b") for i in range(150, 160)],
        "k bigint, rv string",
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, partition_by=["bucket(8, k)"]
    )
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, partition_by=["bucket(8, k)"]
    )
    return tl, tr, left, right


def test_bucket_join_matches_plain_join(spark, pair):
    tl, tr, left, right = pair
    got = tl.bucket_join(tr, "k")
    want = left.join(right, on=["k"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucket_join_plan_has_no_shuffle_or_smj(spark, pair):
    """The point of the operator: N broadcast hash joins + union, zero
    Exchange feeding a join, zero SortMergeJoin."""
    tl, tr, _, _ = pair
    plan = (
        tl.bucket_join(tr, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # No shuffle exchange anywhere in the join tree (broadcast exchanges
    # are fine — they ARE the mechanism).
    import re

    shuffles = re.findall(r"Exchange (?!SinglePartition)\w*hashpartitioning", plan)
    assert not shuffles, plan[:2000]


def test_bucket_join_left_semi(spark, pair):
    tl, tr, left, right = pair
    got = tl.bucket_join(tr, "k", how="left_semi")
    want = left.join(right, on=["k"], how="left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bucket_join_null_keys_and_empty_buckets(spark, tmp_path):
    left = spark.createDataFrame(
        [(1, "a"), (None, "n1"), (7, "b")], "k bigint, lv string"
    )
    right = spark.createDataFrame(
        [(1, "x"), (None, "n2"), (999, "z")], "k bigint, rv string"
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, partition_by=["bucket(4, k)"]
    )
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, partition_by=["bucket(4, k)"]
    )
    got = tl.bucket_join(tr, "k")
    want = left.join(right, on=["k"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )  # null keys match nothing; 7/999 find no partner


def test_bucket_join_validation(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    t4 = VersionedTable.create(
        spark, str(tmp_path / "a"), df, partition_by=["bucket(4, k)"]
    )
    t8 = VersionedTable.create(
        spark, str(tmp_path / "b"), df, partition_by=["bucket(8, k)"]
    )
    tid = VersionedTable.create(spark, str(tmp_path / "c"), df)
    with pytest.raises(ValueError, match="bucket counts differ"):
        t4.bucket_join(t8, "k")
    with pytest.raises(ValueError, match="not partitioned by bucket"):
        t4.bucket_join(tid, "k")
    with pytest.raises(ValueError, match="supports inner"):
        t4.bucket_join(t4, "k", how="cross")


def test_bucket_join_old_spec_entries_refuse_then_compact_lifts(
    spark, tmp_path
):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k bigint, v string"
    )
    tl = VersionedTable.create(spark, str(tmp_path / "l"), df)
    tl.set_partition_spec(["bucket(4, k)"])
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), df, partition_by=["bucket(4, k)"]
    )
    with pytest.raises(ValueError, match="compact"):
        tl.bucket_join(tr, "k")
    tl.compact()
    got = tl.bucket_join(tr, "k")
    want = df.join(df.withColumnRenamed("v", "v2"), on=["k"]).drop("v2")
    assert got.count() == 20 and want.count() == 20


def test_bucket_join_after_appends_both_sides(spark, tmp_path):
    """Appends land in fresh bucket leaves; the join stays correct and
    co-located across multiple commits per side."""
    mk = lambda lo, hi, p: spark.createDataFrame(  # noqa: E731
        [(i, f"{p}{i}") for i in range(lo, hi)], "k bigint, v string"
    )
    tl = VersionedTable.create(
        spark,
        str(tmp_path / "l"),
        mk(0, 50, "l"),
        partition_by=["bucket(8, k)"],
    )
    tr = VersionedTable.create(
        spark,
        str(tmp_path / "r"),
        mk(25, 75, "r"),
        partition_by=["bucket(8, k)"],
    )
    tl.append(mk(50, 100, "l"))
    tr.append(mk(75, 125, "r"))
    got = tl.bucket_join(tr, "k")
    lv = tl.read().withColumnRenamed("v", "lv")
    rv = tr.read().withColumnRenamed("v", "rv")
    want = lv.join(rv, on=["k"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("how", ["left", "right", "full", "left_anti"])
def test_bucket_join_outer_and_anti_parity(spark, tmp_path, how):
    """Outer joins stitch one-sided buckets and null-key leaves back in
    from metadata; output must equal the plain Spark join of the same
    frames, null keys included."""
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(150)] + [(None, "lnull")],
        "k bigint, lv string",
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100, 250)] + [(None, "rnull")],
        "k bigint, rv string",
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, partition_by=["bucket(8, k)"]
    )
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, partition_by=["bucket(8, k)"]
    )
    got = tl.bucket_join(tr, "k", how=how)
    want = left.join(right, on=["k"], how=how)
    assert got.columns == want.columns
    assert sorted(
        map(tuple, got.collect()), key=str
    ) == sorted(map(tuple, want.collect()), key=str)


def test_bucket_join_left_plan_has_no_shuffle(spark, tmp_path):
    """Left-outer keeps the shuffle-free shape (right side broadcasts;
    stitched pieces are plain scans)."""
    import re

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k bigint, v string"
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), df, partition_by=["bucket(4, k)"]
    )
    tr = VersionedTable.create(
        spark,
        str(tmp_path / "r"),
        df.withColumnRenamed("v", "w").limit(50),
        partition_by=["bucket(4, k)"],
    )
    plan = (
        tl.bucket_join(tr, "k", how="left")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert not re.findall(r"Exchange \w*hashpartitioning", plan)


@pytest.mark.parametrize("seed", [7, 23])
def test_bucket_join_parity_under_random_dml(spark, tmp_path, seed):
    """Seeded DML fuzz: random appends / merges / COW deletes / deferred
    deletes / compactions on BOTH bucketed sides, with inner/left/full
    join parity against plain Spark joins re-checked after every step —
    guards the newest composite read path against layout drift."""
    import random

    rng = random.Random(seed)

    def mk(rows, p):
        return spark.createDataFrame(
            [(k, f"{p}{k}v{v}") for k, v in rows], "k bigint, v string"
        )

    tl = VersionedTable.create(
        spark,
        str(tmp_path / "l"),
        mk([(i, 0) for i in range(30)], "l"),
        partition_by=["bucket(4, k)"],
    )
    tr = VersionedTable.create(
        spark,
        str(tmp_path / "r"),
        mk([(i, 0) for i in range(15, 45)], "r"),
        partition_by=["bucket(4, k)"],
    )

    def check():
        lv = tl.read().withColumnRenamed("v", "lv")
        rv = tr.read().withColumnRenamed("v", "rv")
        for how in ("inner", "left", "right", "full"):
            got = tl.bucket_join(tr, "k", how=how)
            want = lv.join(rv, on=["k"], how=how)
            assert sorted(
                map(tuple, got.collect()), key=str
            ) == sorted(map(tuple, want.collect()), key=str), (how, seed)

    check()
    for step in range(6):
        t = rng.choice([tl, tr])
        op = rng.choice(["append", "merge", "delete", "defer", "compact"])
        p = "l" if t is tl else "r"
        if op == "append":
            lo = rng.randrange(0, 60)
            t.append(mk([(i, step + 1) for i in range(lo, lo + 5)], p))
        elif op == "merge":
            ks = rng.sample(range(60), 3)
            t.merge(mk([(k, 90 + step) for k in ks], p), ["k"])
        elif op == "delete":
            t.delete_where(F.col("k") % 7 == rng.randrange(7))
        elif op == "defer":
            t.delete_where_deferred(f"k = {rng.randrange(60)}")
        else:
            t.compact()
        check()


def test_bucket_join_refuses_param_evolution_until_full_compact(
    spark, tmp_path
):
    """bucket(4, k) evolved to bucket(8, k): surviving old entries carry
    bucket indices computed mod 4 — pairing them by index under N=8
    would silently drop matches, so the join must REFUSE; a FULL
    compact() rewrites everything under the current spec, clears the
    spec history, and the join then returns exactly the plain-join
    result."""
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(40)], "k bigint, lv string"
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(40)], "k bigint, rv string"
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, partition_by=["bucket(4, k)"]
    )
    tl.set_partition_spec(["bucket(8, k)"])
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, partition_by=["bucket(8, k)"]
    )
    with pytest.raises(ValueError, match="evolved to bucket"):
        tl.bucket_join(tr, "k")
    # ...and the refusal is symmetric (ambiguity on the RIGHT side).
    with pytest.raises(ValueError, match="evolved to bucket"):
        tr.bucket_join(tl, "k")
    tl.compact()
    assert tl.manifest().past_specs == ()
    got = tl.bucket_join(tr, "k")
    want = left.join(
        right.withColumnRenamed("lv", "rv"), on=["k"]
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 40


def test_bucket_join_accepts_param_evolution_once_old_entries_rewritten(
    spark, tmp_path
):
    """Spec snapshots lift the param-evolution refusal WITHOUT a full
    compact: once every live entry was written under the current
    modulus (here: the old generation is rewritten by a COW delete),
    bucket_join must accept even though past_specs still records the
    old modulus — and return exactly the plain-join result."""
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(80)], "k bigint, lv string"
    )
    tl = VersionedTable.create(
        spark, str(tmp_path / "l"), left, partition_by=["bucket(4, k)"]
    )
    tl.set_partition_spec(["bucket(8, k)"])
    tl.append(
        spark.createDataFrame(
            [(i, f"l{i}") for i in range(80, 120)], "k bigint, lv string"
        )
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(120)], "k bigint, rv string"
    )
    tr = VersionedTable.create(
        spark, str(tmp_path / "r"), right, partition_by=["bucket(8, k)"]
    )
    # Old-modulus entries alive -> refuse, naming the offending entry.
    with pytest.raises(ValueError, match="evolved to bucket"):
        tl.bucket_join(tr, "k")
    # COW delete of the old generation's rows rewrites those entries
    # under the CURRENT spec; history still shows bucket(4).
    tl.delete_where(F.col("k") < 80)
    assert tl.manifest().past_specs != ()
    got = tl.bucket_join(tr, "k")
    want = (
        tl.read()
        .join(right, on=["k"])
        .select(*got.columns)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() == 40
