"""View-family state tables write OPTIMIZED (r14, VERDICT r13 #5):
every state table the incremental-view / matview family creates opts
into the unpartitioned optimized write — an AQE REBALANCE stage sizes
each commit's files to the data, so a small refresh delta lands ONE
file instead of one per shuffle task (q183's MV statement loop is
commit-dominated; 32 tiny files per commit per state table is pure
open-cost at read time). Pins: per-commit added-file counts stay
bounded through DML refreshes, and the property persists in the
manifest so every later merge inherits it."""

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.matview import MaterializedView
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

# a tiny refresh delta must never fan out to one file per shuffle
# task (32 here); the rebalance write keeps it to a couple of files
# (base + possible change-file dirs are counted separately)
MAX_FILES_PER_SMALL_COMMIT = 4


def _added_per_commit(spark, root) -> list[int]:
    t = VersionedTable(spark, root)
    counts = []
    for v in range(2, t.latest_version() + 1):
        prev = set(t.manifest(v - 1).files)
        cur = t.manifest(v).files
        counts.append(len([f for f in cur if f not in prev]))
    return counts


def test_agg_view_state_commits_stay_small(spark, tmp_path):
    src = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [(i, f"g{i % 5}", float(i)) for i in range(2000)],
            "id bigint, grp string, v double",
        ),
    )
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        "SELECT grp, COUNT(*) AS n, SUM(v) AS total FROM t GROUP BY grp",
        {"t": src},
    )
    state_root = mv._main_state_root()
    assert VersionedTable(spark, state_root).manifest().optimize_write
    for i in range(3):
        src.update_where(
            F.col("id") == i, {"v": F.col("v") + 100.0}
        )
        mv.refresh()
    added = _added_per_commit(spark, state_root)
    assert added, "expected refresh commits"
    assert all(n <= MAX_FILES_PER_SMALL_COMMIT for n in added), added
    # correctness unchanged by the write shape
    exp = sorted(
        (r.grp, r.n, r.total)
        for r in src.read()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    assert sorted((r.grp, r.n, r.total) for r in mv.read().collect()) == exp


def test_outer_join_view_state_and_rendered_commits_stay_small(
    spark, tmp_path
):
    left = VersionedTable.create(
        spark,
        str(tmp_path / "l"),
        spark.createDataFrame(
            [(i, f"d{i % 4}", float(i)) for i in range(1000)],
            "lid bigint, dk string, v double",
        ),
    )
    right = VersionedTable.create(
        spark,
        str(tmp_path / "r"),
        spark.createDataFrame(
            [(j, f"d{j}") for j in range(3)], "rid bigint, dk string"
        ),
    )
    outer = MaterializedView.create(
        spark,
        str(tmp_path / "outer"),
        "SELECT * FROM l LEFT JOIN r USING (dk)",
        {"l": left, "r": right},
        primary_key=("lid", "rid"),
    )
    outer.ensure_rendered()
    for i in range(2):
        left.update_where(
            F.col("lid") == i, {"v": F.col("v") + 1.0}
        )
        outer.refresh()
    import os

    for sub in ("state/inner", "state/padded", "rendered"):
        root = os.path.join(outer.root, sub)
        assert VersionedTable(spark, root).manifest().optimize_write, sub
        added = _added_per_commit(spark, root)
        assert all(
            n <= MAX_FILES_PER_SMALL_COMMIT for n in added
        ), (sub, added)


def test_optimized_write_salts_around_nested_maps(spark, tmp_path):
    """ADVICE r13: F.hash() refuses MapType at ANY depth (struct
    field, array element) — the partitioned optimized write's salt
    must skip columns that merely CONTAIN a map, not only top-level
    maps, or create(optimize_write=True) explodes at write time."""
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", {"k": i}, [{"m": i}], ({"x": i}, i))
         for i in range(50)],
        "id bigint, grp string, m map<string,bigint>, "
        "am array<map<string,bigint>>, "
        "sm struct<f: map<string,bigint>, g: bigint>",
    )
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        df,
        partition_by=["grp"],
        optimize_write=True,
    )
    assert t.read().count() == 50
    # merge path (inherits the property) also survives
    t.merge(
        spark.createDataFrame(
            [(99, "g0", {"k": 9}, [{"m": 9}], ({"x": 9}, 9))],
            df.schema,
        ),
        ["id"],
    )
    assert t.read().count() == 51


def test_in_predicate_rejects_scalar_value(spark, tmp_path):
    """ADVICE r13: a scalar 'in' value would list()-explode a string
    into characters in the row filter while the pruning layers skip
    it — the two must agree, so the row filter now refuses."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a")], "id bigint, k string"),
    )
    with pytest.raises(ValueError, match="list/tuple/set"):
        t.read(predicates=[("k", "in", "abc")]).collect()
    # the legitimate forms still work
    assert t.read(predicates=[("k", "in", ["a", "b"])]).count() == 1
    assert t.read(predicates=[("k", "in", ("a",))]).count() == 1
