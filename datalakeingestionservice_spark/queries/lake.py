"""Lake table-format queries (q113, q115): versioned MERGE + time-travel
diff; stats-based data skipping.

Exercises `sinks/versioned.py` end-to-end on driver-checked data: create a
versioned table from `orders`, apply a deterministic MERGE (updates, deletes,
inserts), then diff snapshot v2 against snapshot v1 with semi/anti joins —
the audit a lake team runs after every DML commit. The oracle recomputes the
expected diff directly from `orders`, so the whole commit protocol (manifest
claim, copy-on-write merge, time travel) sits behind a value-checked query.

The reference delegates DML to its RDBMS (`SqlServerDataSource.cs:83-90`);
this is the lake-native replacement.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


@register(
    "q113_versioned_merge_diff",
    tags=("lake", "dml", "merge", "time-travel"),
    oracle="""
WITH upd AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0),
del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 1),
ins AS (
  SELECT o_orderkey + 1000000000 AS k, o_totalprice AS p
  FROM orders WHERE o_orderkey % 10 = 2
),
v2_prices AS (
  SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 10 <> 1
  UNION ALL SELECT p FROM ins
)
SELECT (SELECT count(*) FROM orders) AS v1_rows,
       (SELECT count(*) FROM v2_prices) AS v2_rows,
       (SELECT count(*) FROM upd) AS n_updated,
       (SELECT count(*) FROM del) AS n_deleted,
       (SELECT count(*) FROM ins) AS n_inserted,
       (SELECT CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE)
        FROM v2_prices) AS v2_total_price
""",
)
def q113_versioned_merge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table MERGE with time-travel audit: v1 = orders snapshot;
    MERGE bumps price +10.00 on keys %10==0, deletes keys %10==1, inserts
    same-price clones (key+1e9) of keys %10==2 -> v2. (+10.00 and clones keep
    prices at 2 decimals: multiplying a 2dp price lands on .005 rounding
    boundaries where Spark's HALF_UP and DuckDB's llround diverge — FUZZ.md
    rule 2.) The returned diff is
    computed FROM THE SNAPSHOTS (anti-join for deletes/inserts, equi-join +
    price inequality for updates), not from the merge inputs — it proves
    create/commit/merge/time-travel round-trip through the manifest layer."""
    env = Env(spark, sf_dir)
    orders = env.t("orders")

    root = os.path.join(
        tempfile.gettempdir(), f"dlis_versioned_{uuid.uuid4().hex}"
    )
    t = VersionedTable.create(spark, root, orders)

    k = F.col("o_orderkey")
    updates = (
        orders.filter(k % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
        .withColumn("is_delete", F.lit(False))
        .unionByName(
            orders.filter(k % 10 == 1).withColumn("is_delete", F.lit(True))
        )
        .unionByName(
            orders.filter(k % 10 == 2)
            .withColumn("o_orderkey", k + 1_000_000_000)
            .withColumn("is_delete", F.lit(False))
        )
    )
    t.merge(updates, ["o_orderkey"], delete_col="is_delete")

    v1 = t.read(version=1).select("o_orderkey", "o_totalprice")
    v2 = t.read(version=2).select("o_orderkey", "o_totalprice")

    deleted = v1.join(v2, "o_orderkey", "left_anti")
    inserted = v2.join(v1, "o_orderkey", "left_anti")
    updated = (
        v1.alias("a")
        .join(v2.alias("b"), "o_orderkey")
        .filter(F.col("a.o_totalprice") != F.col("b.o_totalprice"))
    )

    return (
        v1.agg(F.count(F.lit(1)).alias("v1_rows"))
        .crossJoin(v2.agg(F.count(F.lit(1)).alias("v2_rows")))
        .crossJoin(updated.agg(F.count(F.lit(1)).alias("n_updated")))
        .crossJoin(deleted.agg(F.count(F.lit(1)).alias("n_deleted")))
        .crossJoin(inserted.agg(F.count(F.lit(1)).alias("n_inserted")))
        .crossJoin(
            # Exact decimal summation, then one cast: a plain double sum is
            # accumulation-order-dependent and diverges cross-engine.
            v2.agg(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("v2_total_price")
            )
        )
    )


@register(
    "q115_versioned_data_skipping",
    tags=("lake", "data-skipping", "stats", "pruning"),
    oracle="""
WITH yr AS (
  SELECT DISTINCT CAST(date_part('year', l_shipdate) AS BIGINT) AS y
  FROM lineitem
),
mx AS (SELECT max(y) - 2 AS cy FROM yr),
hit AS (
  SELECT l_extendedprice FROM lineitem, mx
  WHERE CAST(date_part('year', l_shipdate) AS BIGINT) >= cy
)
SELECT
  (SELECT count(*) FROM hit) AS n_rows,
  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
   FROM hit) AS sum_price,
  (SELECT count(*) FROM yr, mx WHERE y >= cy) AS n_dirs_scanned,
  (SELECT count(*) FROM yr, mx WHERE y < cy) AS n_dirs_skipped
""",
)
def q115_versioned_data_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stats-based data skipping through the versioned table: lineitem is
    committed one ship-year per append (one data dir each), then a
    predicated read for the last three years consults the manifest's
    footer-harvested min/max stats and skips every older dir WITHOUT
    planning a scan over it. The query returns both the aggregate over the
    pruned read (proves pruning lost no rows — the oracle recomputes it
    from raw lineitem) and the scanned/skipped dir counts from prune_info
    (proves pruning actually happened — the oracle derives the expected
    counts from the distinct ship years). This is the manifest-level
    file-skipping Delta/Iceberg do; the reference has no analog (its RDBMS
    prunes via indexes server-side, `SqlServerDataSource.cs:20-73`)."""
    env = Env(spark, sf_dir)
    lineitem = env.t("lineitem")

    # One data dir per ship-year (collect is over ~7 year values, metadata
    # scale; at 100 TB the same loop is "commit per ingest batch").
    years = sorted(
        r.y
        for r in lineitem.select(
            F.year("l_shipdate").alias("y")
        ).distinct().collect()
    )
    root = os.path.join(
        tempfile.gettempdir(), f"dlis_skipping_{uuid.uuid4().hex}"
    )
    t = VersionedTable.create(
        spark, root, lineitem.filter(F.year("l_shipdate") == years[0])
    )
    for y in years[1:]:
        t.append(lineitem.filter(F.year("l_shipdate") == y))

    import datetime as dt

    cutoff_year = years[-1] - 2
    predicates = [("l_shipdate", ">=", dt.datetime(cutoff_year, 1, 1))]
    pruned = t.read(predicates=predicates)
    info = t.prune_info(predicates)

    return (
        pruned.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn(
            "n_dirs_scanned", F.lit(info["n_scanned"]).cast("long")
        )
        .withColumn(
            "n_dirs_skipped", F.lit(info["n_skipped"]).cast("long")
        )
    )


@register(
    "q117_change_feed",
    tags=("lake", "cdc", "change-feed"),
    oracle="""
WITH v2_ins AS (
  SELECT o_totalprice FROM orders WHERE o_orderkey % 4 = 0
),
v3_del AS (
  SELECT o_totalprice FROM orders WHERE o_totalprice < 50000.0
)
SELECT * FROM (
  SELECT CAST(2 AS BIGINT) AS commit_version, 'insert' AS change_type,
         count(*) AS n_rows,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
  FROM v2_ins
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'delete', count(*),
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM v3_del
)
""",
)
def q117_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CDC through the versioned table: v1 = orders without the
    %4==0 keys, v2 appends them (change feed serves these straight from
    the appended data dirs — no diff compute), v3 deletes cheap orders via
    copy-on-write (served as a snapshot exceptAll diff). changes(1, 3) is
    then aggregated per (commit, change type); the oracle recomputes both
    change sets from raw orders. Proves the feed's two serving paths —
    scan-speed appends and bounded diffs for DML — return exactly the rows
    a downstream incremental consumer must see. The reference's CDC story
    is 'rerun the extraction on a cron' (`JobSchedulingService.cs:24-75`);
    this replaces it with an incremental one."""
    env = Env(spark, sf_dir)
    orders = env.t("orders")

    root = os.path.join(
        tempfile.gettempdir(), f"dlis_cdc_{uuid.uuid4().hex}"
    )
    k = F.col("o_orderkey")
    t = VersionedTable.create(spark, root, orders.filter(k % 4 != 0))
    t.append(orders.filter(k % 4 == 0))
    t.delete_where(F.col("o_totalprice") < 50000.0)

    feed = t.changes(1, 3)
    return feed.groupBy(
        F.col("_commit_version").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "q121_incremental_mv",
    tags=("lake", "materialized-view", "incremental", "cdc"),
    oracle="""
WITH v4_rows AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 10 <> 1
  UNION ALL
  SELECT o_orderpriority, o_totalprice AS p
  FROM orders WHERE o_orderkey % 10 = 2
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM v4_rows
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q121_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate view (counting algorithm over the
    change feed, `sinks/incremental_view.py`): materialize
    SUM(o_totalprice), COUNT(*) BY o_orderpriority at v1 of a versioned
    orders table, then push three DML commits — price bump on keys %10==0
    (merge), delete keys %10==1, append clones of keys %10==2 — and
    REFRESH. The refresh reads only the change feed (cost ∝ changed rows,
    not table size) and merges per-key deltas into the view state; the
    oracle recomputes the aggregate from scratch over the reconstructed
    final snapshot, so the equality proves incremental == full recompute
    against an independent engine. Sums accumulate in exact decimal with
    one final double cast (FUZZ.md rule 2). The reference recomputes its
    scheduled extractions from zero every cron fire
    (`src/Worker/Services/JobSchedulingService.cs:24-75`); this is the
    lake-native incremental replacement."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )

    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_mv_{uuid.uuid4().hex}"
    )
    t = VersionedTable.create(spark, os.path.join(base, "src"), orders)

    view = IncrementalAggView(
        spark,
        os.path.join(base, "src"),
        os.path.join(base, "view"),
        keys=["o_orderpriority"],
        sums={"total_price": "o_totalprice"},
    )
    view.refresh()  # materializes at v1

    k = F.col("o_orderkey")
    t.merge(
        orders.filter(k % 10 == 0).withColumn(
            "o_totalprice",
            (F.col("o_totalprice") + F.lit(10.0).cast("decimal(18,2)"))
            .cast("decimal(18,2)"),
        ),
        ["o_orderkey"],
    )
    t.delete_where(k % 10 == 1)
    t.append(
        orders.filter(k % 10 == 2).withColumn("o_orderkey", k + 1_000_000_000)
    )
    view.refresh()  # one catch-up across all three DML versions

    return (
        view.read()
        .select(
            "o_orderpriority",
            F.col("_n").alias("n_orders"),
            F.col("total_price").cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q122_scoped_merge",
    tags=("lake", "dml", "merge", "pruning", "stats"),
    oracle="""
WITH yr AS (
  SELECT DISTINCT CAST(date_part('year', l_shipdate) AS BIGINT) AS y
  FROM lineitem
),
mx AS (SELECT max(y) AS my FROM yr),
merged AS (
  SELECT CASE WHEN CAST(date_part('year', l_shipdate) AS BIGINT)
                   = (SELECT my FROM mx)
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) + 5.00
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END AS p
  FROM lineitem
)
SELECT (SELECT count(*) FROM merged) AS n_rows,
       (SELECT CAST(sum(p) AS DOUBLE) FROM merged) AS sum_price,
       (SELECT count(*) FROM yr) - 1 AS n_dirs_untouched,
       (SELECT count(*) FROM yr) AS n_dirs_total
""",
)
def q122_scoped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-scoped MERGE (E20): lineitem committed one ship-year per data
    dir; a MERGE bumping prices of ONLY the newest year's rows (merge keys
    lead with l_shipdate, so the update-key bounds refute every older
    dir's stats) rewrites exactly one dir — the others ride into the new
    version physically untouched. The query returns the merged table's
    aggregate (oracle recomputes it from raw lineitem — proves no row was
    lost or doubled by scoping) AND the untouched/total dir counts from
    the commit summary (proves the scoping actually engaged). Prices
    accumulate in exact decimal with one final double cast."""
    env = Env(spark, sf_dir)
    lineitem = env.t("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )

    years = sorted(
        r.y for r in lineitem.select(
            F.year("l_shipdate").alias("y")
        ).distinct().collect()
    )
    root = os.path.join(
        tempfile.gettempdir(), f"dlis_scoped_{uuid.uuid4().hex}"
    )
    t = VersionedTable.create(
        spark, root, lineitem.filter(F.year("l_shipdate") == years[0])
    )
    for y in years[1:]:
        t.append(lineitem.filter(F.year("l_shipdate") == y))

    updates = lineitem.filter(F.year("l_shipdate") == years[-1]).withColumn(
        "price",
        (F.col("price") + F.lit(5.0).cast("decimal(18,2)"))
        .cast("decimal(18,2)"),
    )
    t.merge(updates, ["l_shipdate", "l_orderkey", "l_linenumber"])
    m = t.manifest()

    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
        )
        .withColumn(
            "n_dirs_untouched",
            F.lit(m.summary["n_dirs_untouched"]).cast("long"),
        )
        .withColumn("n_dirs_total", F.lit(len(m.files)).cast("long"))
    )


@register(
    "q123_partitioned_table",
    tags=("lake", "partitioning", "pruning", "layout"),
    oracle="""
WITH p AS (
  SELECT DISTINCT CAST(date_part('year', l_shipdate) AS BIGINT) AS y,
         l_orderkey % 2 AS par
  FROM lineitem
),
mx AS (SELECT max(y) - 2 AS cy FROM p),
hit AS (
  SELECT l_extendedprice FROM lineitem, mx
  WHERE CAST(date_part('year', l_shipdate) AS BIGINT) >= cy
)
SELECT
  (SELECT count(*) FROM hit) AS n_rows,
  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
   FROM hit) AS sum_price,
  (SELECT count(*) FROM p, mx WHERE y >= cy) AS n_parts_scanned,
  (SELECT count(*) FROM p, mx WHERE y < cy) AS n_parts_skipped
""",
)
def q123_partitioned_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout: lineitem goes into a versioned table
    `partition_by=["l_shipyear"]` in TWO commits (even / odd order keys),
    so every commit lays out one `l_shipyear=YYYY/` leaf per year it
    contains. A predicated read for the last three years then prunes from
    the directory NAMES alone — the partition column isn't stored in the
    parquet files at all, so no footer stat could have done it — and the
    query returns the pruned read's aggregate (oracle recomputes it from
    raw lineitem: proves dir-name pruning lost no rows) plus the
    scanned/skipped LEAF counts from prune_info (oracle derives them from
    the distinct (year, parity) pairs: proves pruning engaged per leaf,
    across both commits). At 100 TB this is the layout every real lake
    table declares first; dir-name pruning needs zero stat harvesting and
    works for stat-less types (decimal). Reference anchor: config-driven
    output pathing `FileSystemUploadProvider.cs:64-76` — partition dirs
    are the lake-native generalization."""
    env = Env(spark, sf_dir)
    lineitem = env.t("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_extendedprice",
        F.year("l_shipdate").cast("bigint").alias("l_shipyear"),
    )

    years = sorted(
        r.y
        for r in lineitem.select(
            F.col("l_shipyear").alias("y")
        ).distinct().collect()
    )
    root = os.path.join(
        tempfile.gettempdir(), f"dlis_partitioned_{uuid.uuid4().hex}"
    )
    parity = F.col("l_orderkey") % 2
    t = VersionedTable.create(
        spark,
        root,
        lineitem.filter(parity == 0),
        partition_by=["l_shipyear"],
    )
    t.append(lineitem.filter(parity != 0))

    cutoff = years[-1] - 2
    predicates = [("l_shipyear", ">=", cutoff)]
    pruned = t.read(predicates=predicates)
    info = t.prune_info(predicates)

    return (
        pruned.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn(
            "n_parts_scanned", F.lit(info["n_scanned"]).cast("long")
        )
        .withColumn(
            "n_parts_skipped", F.lit(info["n_skipped"]).cast("long")
        )
    )


@register(
    "q124_file_scoped_merge",
    tags=("lake", "dml", "merge", "pruning", "file-granular"),
    oracle="""
WITH tot AS (SELECT count(*) AS t FROM lineitem),
mx AS (
  SELECT max(CAST(date_part('year', l_shipdate) AS BIGINT)) AS my
  FROM lineitem
),
sfx AS (
  SELECT count(*) AS s FROM lineitem, mx
  WHERE CAST(date_part('year', l_shipdate) AS BIGINT) = my
),
n AS (SELECT CAST(ceil(t / 8.0) AS BIGINT) AS recs FROM tot),
merged AS (
  SELECT CASE WHEN CAST(date_part('year', l_shipdate) AS BIGINT)
                   = (SELECT my FROM mx)
              THEN CAST(l_extendedprice AS DECIMAL(18,2)) + 5.00
              ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END AS p
  FROM lineitem
)
SELECT (SELECT count(*) FROM merged) AS n_rows,
       (SELECT CAST(sum(p) AS DOUBLE) FROM merged) AS sum_price,
       CAST(0 AS BIGINT) AS n_dirs_untouched,
       (SELECT CAST(floor((t - s) * 1.0 / recs) AS BIGINT)
        FROM tot, sfx, n) AS n_files_untouched
""",
)
def q124_file_scoped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-granular scoped MERGE: all of lineitem goes into ONE data dir
    as ~8 files with disjoint l_shipdate ranges (one sorted partition
    rolled by spark.sql.files.maxRecordsPerFile = ceil(total/8) — file
    boundaries at exact row offsets, so the layout is closed-form). A
    MERGE bumping only the newest ship-year's prices then keeps the dir
    (its envelope spans all years) but refutes every file that ends
    before the first newest-year row: those files carry into the new
    version byte-identical as file entries, and only the tail files are
    read and rewritten. The oracle recomputes the merged aggregate from
    raw lineitem (no row lost or doubled) AND derives the untouched-file
    count arithmetically — rows sort by date, the newest year is a
    contiguous suffix, so untouched files = floor((total − suffix)/recs)
    regardless of tie order at the boundary. This is merge cost ∝
    affected FILES (Delta's file-level MERGE pruning), one granularity
    below q122's dir scoping."""
    env = Env(spark, sf_dir)
    lineitem = env.t("lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    total = lineitem.count()
    recs = -(-total // 8)  # ceil

    root = os.path.join(
        tempfile.gettempdir(), f"dlis_filescoped_{uuid.uuid4().hex}"
    )
    conf_key = "spark.sql.files.maxRecordsPerFile"
    prev = spark.conf.get(conf_key, "0")
    spark.conf.set(conf_key, str(recs))
    try:
        t = VersionedTable.create(
            spark,
            root,
            lineitem.repartition(1).sortWithinPartitions("l_shipdate"),
        )
    finally:
        spark.conf.set(conf_key, prev)

    top_year = lineitem.agg(
        F.max(F.year("l_shipdate"))
    ).collect()[0][0]
    updates = lineitem.filter(
        F.year("l_shipdate") == top_year
    ).withColumn(
        "price",
        (F.col("price") + F.lit(5.0).cast("decimal(18,2)"))
        .cast("decimal(18,2)"),
    )
    t.merge(updates, ["l_shipdate", "l_orderkey", "l_linenumber"])
    m = t.manifest()

    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("sum_price"),
        )
        .withColumn(
            "n_dirs_untouched",
            F.lit(m.summary["n_dirs_untouched"]).cast("long"),
        )
        .withColumn(
            "n_files_untouched",
            F.lit(m.summary["n_files_untouched"]).cast("long"),
        )
    )


@register(
    "q127_incremental_mv_minmax",
    tags=("lake", "materialized-view", "incremental", "minmax", "cdc"),
    oracle="""
WITH v4_rows AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 10.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 10 <> 1
  UNION ALL
  SELECT o_orderpriority, o_totalprice - 50.0 AS p
  FROM orders WHERE o_orderkey % 10 = 2
)
SELECT o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(min(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
       CAST(max(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM v4_rows
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q127_incremental_mv_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view WITH min/max (partial-rebuild maintenance,
    `sinks/incremental_view.py`): same DML gauntlet as q121 — price bump
    on keys %10==0 (merge: preimage deletes can remove a group's stored
    extreme), delete keys %10==1 (ditto), append discounted clones of
    %10==2 (new min candidates fold in as `least`) — then one catch-up
    refresh. Inserts maintain extremes incrementally; only groups whose
    stored extreme was deleted rescan, via a key-bounded predicated read
    + broadcast semi-join on exactly those groups. The oracle recomputes
    count/sum/min/max from the reconstructed final snapshot, proving
    partial rebuild == full recompute on an independent engine."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalAggView,
    )

    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_mvmm_{uuid.uuid4().hex}"
    )
    t = VersionedTable.create(spark, os.path.join(base, "src"), orders)

    view = IncrementalAggView(
        spark,
        os.path.join(base, "src"),
        os.path.join(base, "view"),
        keys=["o_orderpriority"],
        sums={"total_price": "o_totalprice"},
        mins={"min_price": "o_totalprice"},
        maxs={"max_price": "o_totalprice"},
    )
    view.refresh()  # materializes at v1

    k = F.col("o_orderkey")
    ten = F.lit(10.0).cast("decimal(18,2)")
    fifty = F.lit(50.0).cast("decimal(18,2)")
    t.merge(
        orders.filter(k % 10 == 0).withColumn(
            "o_totalprice",
            (F.col("o_totalprice") + ten).cast("decimal(18,2)"),
        ),
        ["o_orderkey"],
    )
    t.delete_where(k % 10 == 1)
    t.append(
        orders.filter(k % 10 == 2)
        .withColumn("o_orderkey", k + 1_000_000_000)
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice") - fifty).cast("decimal(18,2)"),
        )
    )
    view.refresh()  # one catch-up across all three DML versions

    return (
        view.read()
        .select(
            "o_orderpriority",
            F.col("_n").alias("n_orders"),
            F.col("total_price").cast("double").alias("total_price"),
            F.col("min_price").cast("double").alias("min_price"),
            F.col("max_price").cast("double").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q128_restore_time_travel",
    tags=("lake", "restore", "time-travel", "dml"),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       CAST(3 AS BIGINT) AS final_version,
       'restore' AS last_op
FROM orders
""",
)
def q128_restore_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE as a forward-moving metadata-only commit: commit orders
    (v1), delete a tenth of it (v2), RESTORE to v1 (v3 — references v1's
    data entries verbatim, zero rows rewritten) and also resolve v1 via
    timestamp time travel. The restored aggregate must equal raw orders
    exactly (oracle recomputes it), and the manifest records
    operation='restore'. Delta-parity rollback semantics: history stays
    auditable, downstream feeds follow via the overwrite-shaped change
    files."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_restore_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    t = VersionedTable.create(spark, base, orders)
    t.delete_where(F.col("o_orderkey") % 10 == 1)
    ts1 = t.manifest(1).committed_at
    v = t.restore(t.version_at(ts1))
    m = t.manifest(v)
    return t.read(v).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").cast("double").alias("total_price"),
        F.lit(v).cast("long").alias("final_version"),
        F.lit(m.operation).alias("last_op"),
    )


@register(
    "q129_bloom_point_lookup",
    tags=("lake", "bloom", "pruning", "point-lookup"),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       TRUE AS bloom_pruned_ok
FROM lineitem
WHERE l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
""",
)
def q129_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping for the needle-in-haystack lookup:
    lineitem committed as four appends bucketed by l_orderkey % 4 — every
    entry's [min, max] spans nearly the whole key range, so range stats
    can NEVER refute an equality probe — with a bloom filter on
    l_orderkey. A point lookup of the max orderkey then prunes the
    non-owning entries through the bloom alone (asserted as
    `bloom_pruned_ok`: >= 1 entry skipped, tolerant of the filter's
    configured ~3% false-positive rate), and the matched aggregate equals
    the oracle's raw-scan answer. At 100 TB this is 'fetch one order
    without touching the table': Delta/Iceberg ship the same opt-in
    per-column blooms for exactly this query shape."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_bloom_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("l_quantity"),
    )
    t = None
    for b in range(4):
        piece = li.filter(F.col("l_orderkey") % 4 == b)
        if t is None:
            t = VersionedTable.create(
                spark, base, piece, bloom_columns=["l_orderkey"]
            )
        else:
            t.append(piece)
    probe = li.agg(F.max("l_orderkey")).collect()[0][0]
    info = t.prune_info([("l_orderkey", "=", int(probe))])
    return (
        t.read(predicates=[("l_orderkey", "=", int(probe))])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
        )
        .withColumn(
            "bloom_pruned_ok", F.lit(info["n_skipped"] >= 1)
        )
    )


@register(
    "q130_deferred_delete",
    tags=("lake", "dml", "merge-on-read", "delete"),
    oracle="""
WITH mx AS (
  SELECT max(CAST(date_part('year', l_shipdate) AS BIGINT)) AS my
  FROM lineitem
),
kept AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS p
  FROM lineitem
  WHERE CAST(date_part('year', l_shipdate) AS BIGINT) <> (SELECT my FROM mx)
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       TRUE AS zero_rewrite_ok
FROM kept
""",
)
def q130_deferred_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE: lineitem committed once, then the newest
    ship-year deleted via `delete_where_deferred` — a metadata commit
    whose manifest references the SAME data entries (asserted as
    `zero_rewrite_ok`), with reads applying NOT(predicate) to exactly the
    entries that existed at delete time. The oracle recomputes the kept
    aggregate from raw lineitem, proving the deferred filter equals a
    physical delete. At 100 TB this is Iceberg's delete-file story:
    delete cost ∝ the predicate (plus one scan for the change feed),
    never a table rewrite; the next OPTIMIZE materializes it."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_mord_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
    )
    t = VersionedTable.create(spark, base, li)
    files_before = t.manifest().files
    my = li.agg(F.max(F.year("l_shipdate"))).collect()[0][0]
    v = t.delete_where_deferred(f"year(l_shipdate) = {int(my)}")
    same_files = t.manifest(v).files == files_before
    return t.read(v).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p").cast("double").alias("sum_price"),
    ).withColumn("zero_rewrite_ok", F.lit(bool(same_files)))


@register(
    "q131_versioned_datasource",
    tags=("lake", "datasource", "pushdown", "sql-surface"),
    oracle="""
WITH mx AS (
  SELECT max(CAST(date_part('year', l_shipdate) AS BIGINT)) AS my
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       TRUE AS pushdown_pruned_ok
FROM lineitem
WHERE CAST(date_part('year', l_shipdate) AS BIGINT) = (SELECT my FROM mx)
""",
)
def q131_versioned_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned table as a first-class Spark source
    (`sources/versioned_batch.py`): lineitem committed one ship-year per
    version, then read through `spark.read.format("versioned")` with a
    PLAIN `.filter(...)` — Catalyst pushes the comparison filters into
    the reader via the DataSource `pushFilters` API, the reader prunes
    manifest entries through partition/bloom/min-max stats (verified
    here: the planned partition count drops to a strict minority,
    reported as `pushdown_pruned_ok`), and Spark re-applies the filters
    row-level so results stay exact. This is the planner-integrated twin
    of `read(predicates=...)`: zero predicate plumbing in user code, and
    it works from pure SQL over a temp view."""
    import datetime as _dt

    from datalakeingestionservice_spark.sources.versioned_batch import (
        VersionedTableReader,
        register as register_source,
    )
    from pyspark.sql.datasource import GreaterThanOrEqual

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_vds_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_shipdate",
        F.col("l_quantity").cast("decimal(18,2)").alias("l_quantity"),
    )
    years = [
        r[0]
        for r in sorted(li.select(F.year("l_shipdate")).distinct().collect())
    ]
    t = None
    for y in years:
        piece = li.filter(F.year("l_shipdate") == y)
        if t is None:
            t = VersionedTable.create(spark, base, piece)
        else:
            t.append(piece)

    boundary = _dt.date(years[-1], 1, 1)
    # Reader-level pruning proof (the planner path below uses the same
    # pushFilters implementation).
    rd = VersionedTableReader({"table_root": base})
    list(rd.pushFilters([GreaterThanOrEqual(("l_shipdate",), boundary)]))
    pruned_ok = len(rd.partitions()) == 1 and len(years) > 1

    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
        .filter(F.col("l_shipdate") >= F.lit(boundary))
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    ).withColumn("pushdown_pruned_ok", F.lit(bool(pruned_ok)))


@register(
    "q132_partition_evolution",
    tags=("lake", "partitioning", "evolution", "layout"),
    oracle="""
WITH all_rows AS (
  SELECT o_orderpriority FROM orders
  UNION ALL
  SELECT o_orderpriority FROM orders WHERE o_orderkey % 10 = 2
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       TRUE AS evolution_pruned_ok
FROM all_rows
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q132_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition evolution (Iceberg spec-change shape): orders committed
    UNPARTITIONED, the spec evolved to `o_orderpriority` via a
    metadata-only commit, then clones of keys %10==2 appended under the
    NEW hive layout. The mixed table reads as one snapshot (oracle
    recomputes the per-priority counts from raw orders), and a
    priority-equality predicate prunes every other NEW leaf from its dir
    NAME while the pre-evolution entry is stats-scanned
    (`evolution_pruned_ok` asserts >= n_leaves-1 entries skipped). Old
    data never rewrites on a spec change; rewrites migrate it
    incrementally — Iceberg's partition-spec versioning, on this
    format."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_pevo_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select("o_orderkey", "o_orderpriority")
    t = VersionedTable.create(spark, base, orders)
    t.set_partition_spec(["o_orderpriority"])
    k = F.col("o_orderkey")
    t.append(
        orders.filter(k % 10 == 2).withColumn(
            "o_orderkey", k + 1_000_000_000
        )
    )
    prios = sorted(
        r[0] for r in orders.select("o_orderpriority").distinct().collect()
    )
    info = t.prune_info([("o_orderpriority", "=", prios[0])])
    pruned_ok = info["n_skipped"] >= len(prios) - 1
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("evolution_pruned_ok", F.lit(bool(pruned_ok)))
        .orderBy("o_orderpriority")
    )


@register(
    "q133_column_mapping",
    tags=("lake", "schema-evolution", "rename", "drop", "column-mapping"),
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       TRUE AS zero_rewrite_ok
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""",
)
def q133_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping (Delta shape): commit orders, RENAME
    o_orderpriority -> priority and DROP o_orderdate — both metadata-only
    (asserted: the manifest still references the same data entries) —
    then aggregate by the NEW name. Files keep physical names forever;
    reads translate, stats stay keyed physical so pruning survives the
    rename, and the oracle recomputes from raw orders under the original
    names, proving the logical view is a pure relabeling."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_cmap_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    t = VersionedTable.create(spark, base, orders)
    files_before = t.manifest().files
    t.rename_column("o_orderpriority", "priority")
    t.drop_column("o_orderdate")
    same = t.manifest().files == files_before
    return (
        t.read()
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total_price"),
        )
        .withColumn("zero_rewrite_ok", F.lit(bool(same)))
        .orderBy("priority")
    )


@register(
    "q134_datasource_merge_on_read",
    tags=("lake", "datasource", "merge-on-read", "delete", "pushdown"),
    oracle="""
WITH mx AS (
  SELECT max(CAST(date_part('year', l_shipdate) AS BIGINT)) AS my
  FROM lineitem
),
base AS (
  SELECT l_shipdate, l_orderkey,
         CAST(date_part('year', l_shipdate) AS BIGINT) AS yr,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS p
  FROM lineitem
),
kept AS (
  SELECT p FROM base WHERE yr <> (SELECT my FROM mx)
  UNION ALL
  SELECT p FROM base
  WHERE yr = (SELECT my FROM mx) AND l_orderkey % 2 = 0
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       TRUE AS mor_served_ok
FROM kept
""",
)
def q134_datasource_merge_on_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The batch DataSource SERVING a merge-on-read table
    (`sources/versioned_batch.py` + `sources/sql_predicates.py`):
    lineitem committed once, the newest ship-year deferred-deleted (a
    metadata-only commit — asserted as part of `mor_served_ok`), then
    HALF that year re-appended. `spark.read.format("versioned")` compiles
    the recorded predicate driver-side into a serializable AST and the
    sessionless executors evaluate it with pyarrow under SQL three-valued
    logic, scoped to the entries recorded at delete time — so the
    re-appended rows (which MATCH the predicate) survive, exactly like
    Iceberg sequence numbers. The oracle recomputes kept = other-years ∪
    re-appended-half from raw lineitem. At 100 TB this is the read path
    that lets cheap metadata deletes coexist with planner-integrated
    scans: no compaction required before the table is queryable from
    pure SQL."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_dsmor_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_shipdate",
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
    )
    t = VersionedTable.create(spark, base, li)
    files_before = t.manifest().files
    my = li.agg(F.max(F.year("l_shipdate"))).collect()[0][0]
    v = t.delete_where_deferred(f"l_shipdate >= DATE '{int(my)}-01-01'")
    zero_rewrite = t.manifest(v).files == files_before
    t.append(
        li.filter(
            (F.year("l_shipdate") == int(my))
            & (F.col("l_orderkey") % 2 == 0)
        )
    )
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p").cast("double").alias("sum_price"),
    ).withColumn("mor_served_ok", F.lit(bool(zero_rewrite)))


@register(
    "q135_datasource_writer",
    tags=("lake", "datasource", "writer", "sql-surface"),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(min(l_orderkey) AS BIGINT) AS min_key,
       CAST(max(l_orderkey) AS BIGINT) AS max_key,
       TRUE AS zero_copy_ok
FROM lineitem
""",
)
def q135_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataSource WRITE path (`df.write.format("versioned")`,
    `sources/versioned_batch.py` VersionedTableWriter): the even-orderkey
    half of lineitem CREATES the table through the writer, the odd half
    APPENDS through it — executor tasks stage parquet with pyarrow and
    the sessionless commit worker publishes through the table's own
    commit protocol, ZERO-COPY (asserted via the manifest's `staged`
    flag: the staged dir moved, nothing was rewritten). Reading back
    through `spark.read.format("versioned")` and aggregating must equal
    raw lineitem — the full write→commit→read loop works from the plain
    DataFrame writer API, no VersionedTable import in user code. At
    100 TB this is the Delta story: any Spark job writes the table with
    `df.write`, the format guarantees atomicity and schema enforcement."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_vwr_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("l_quantity"),
    )
    k = F.col("l_orderkey")
    for half in (li.filter(k % 2 == 0), li.filter(k % 2 == 1)):
        (
            half.write.format("versioned")
            .mode("append")
            .option("table_root", base)
            .save()
        )
    t = VersionedTable(spark, base)
    zero_copy = t.manifest().summary.get("staged") is True
    df = (
        spark.read.format("versioned").option("table_root", base).load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    ).withColumn("zero_copy_ok", F.lit(bool(zero_copy)))


@register(
    "q137_hidden_partitioning",
    tags=("lake", "partitioning", "transforms", "iceberg-parity"),
    oracle="""
WITH bounds AS (
  SELECT CAST(max(l_shipdate) AS DATE) - INTERVAL 120 DAY AS cutoff
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(min(l_shipdate) AS DATE) AS min_ship,
       TRUE AS hidden_pruned_ok
FROM lineitem, bounds
WHERE CAST(l_shipdate AS DATE) >= CAST(cutoff AS DATE)
""",
)
def q137_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden partitioning (Iceberg transform specs,
    `sinks/versioned.py` transform block): lineitem committed under
    `partition_by=["month(l_shipdate)"]` — dirs are
    `l_shipdate_month=yyyy-MM/`, the source column STAYS in the files,
    and no derived column exists in the schema. A plain range predicate
    on l_shipdate derives a conservative month-string predicate
    automatically and prunes every older-month leaf from the dir NAMES
    (`hidden_pruned_ok` asserts the majority of ~84 month leaves skip);
    the oracle recomputes the recent-window aggregate from raw lineitem.
    This is the core Iceberg ergonomics win at 100 TB: users query
    columns, never partition helpers, and the layout still prunes."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_hp_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        F.col("l_quantity").cast("decimal(18,2)").alias("l_quantity"),
    )
    t = VersionedTable.create(
        spark, base, li, partition_by=["month(l_shipdate)"]
    )
    cutoff = li.agg(
        F.date_sub(F.max("l_shipdate"), 120)
    ).collect()[0][0]
    info = t.prune_info([("l_shipdate", ">=", cutoff)])
    pruned_ok = (
        info["n_skipped"] > info["n_scanned"]
        and info["n_scanned"] >= 1
    )
    return (
        t.read(predicates=[("l_shipdate", ">=", cutoff)])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.min("l_shipdate").alias("min_ship"),
        )
        .withColumn("hidden_pruned_ok", F.lit(bool(pruned_ok)))
    )


@register(
    "q138_shallow_clone",
    tags=("lake", "clone", "zero-copy", "isolation"),
    oracle="""
WITH mx AS (
  SELECT max(CAST(date_part('year', l_shipdate) AS BIGINT)) AS my
  FROM lineitem
),
clone_side AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS p
  FROM lineitem
  WHERE CAST(date_part('year', l_shipdate) AS BIGINT) <> (SELECT my FROM mx)
),
source_side AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS p FROM lineitem
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM clone_side)  AS clone_rows,
  (SELECT CAST(sum(p) AS DOUBLE)  FROM clone_side)   AS clone_price,
  (SELECT CAST(count(*) AS BIGINT) FROM source_side) AS source_rows,
  TRUE AS zero_copy_ok
""",
)
def q138_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow CLONE under the oracle (`sinks/versioned.py clone`):
    lineitem committed once, cloned (hard links — `zero_copy_ok`
    asserts the clone's data files share INODES with the source, i.e.
    the bytes exist exactly once), then the clone deletes its newest
    ship-year while the source stays untouched. The oracle recomputes
    both sides from raw lineitem: the clone's post-delete aggregate AND
    the source's full row count — divergence without interference, at
    metadata cost. At 100 TB this is how experiment branches, dev
    copies, and reproducible-snapshot handoffs avoid petabyte copies."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_cl_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
    )
    t = VersionedTable.create(spark, base, li)
    c = t.clone(base + "_clone")
    import glob as _glob

    src_inodes = {
        os.stat(f).st_ino
        for f in _glob.glob(os.path.join(base, "data", "*", "*.parquet"))
    }
    cl_inodes = {
        os.stat(f).st_ino
        for f in _glob.glob(
            os.path.join(base + "_clone", "data", "*", "*.parquet")
        )
    }
    zero_copy = bool(src_inodes) and src_inodes == cl_inodes
    my = li.agg(F.max(F.year("l_shipdate"))).collect()[0][0]
    c.delete_where(F.year(F.col("l_shipdate")) == int(my))
    clone_agg = c.read().agg(
        F.count(F.lit(1)).alias("clone_rows"),
        F.sum("p").cast("double").alias("clone_price"),
    )
    source_rows = t.read().count()
    return (
        clone_agg.withColumn("source_rows", F.lit(int(source_rows)))
        .withColumn("zero_copy_ok", F.lit(zero_copy))
        .select("clone_rows", "clone_price", "source_rows", "zero_copy_ok")
    )


@register(
    "q139_mor_predicate_subset",
    tags=("lake", "datasource", "merge-on-read", "predicates"),
    oracle="""
WITH cutoff AS (
  SELECT max(l_orderkey) // 2 AS c FROM lineitem
),
kept AS (
  SELECT l_orderkey,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
         l_returnflag
  FROM lineitem
  WHERE NOT (l_returnflag LIKE 'N%')
    AND NOT (l_orderkey * 3 >= 3 * (SELECT c FROM cutoff))
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_modes,
       TRUE AS mor_served_ok
FROM kept
""",
)
def q139_mor_predicate_subset(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The WIDENED deferred-delete predicate subset served through the
    batch DataSource (`sources/sql_predicates.py` round 6: LIKE and
    column-side arithmetic — both REFUSED by the round-5 compiler):
    lineitem committed once, then two metadata-only deletes — `l_returnflag
    LIKE 'N%'` and `l_orderkey * 3 >= 3*cutoff` (cutoff = max key / 2)
    — and `spark.read.format("versioned")` must serve the MoR table by
    compiling both predicates to the serializable AST and evaluating
    them executor-side with pyarrow (`pc.match_like`, checked int64
    arithmetic) under the same 3VL as Spark's `filter(~expr)`. Both
    deletes are asserted zero-rewrite in-plan; the oracle recomputes the
    kept set from raw lineitem with the equivalent WHERE. At 100 TB:
    the wider the compilable subset, the more real delete predicates
    stay metadata-only without forcing a compaction before the table is
    SQL-queryable."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_morps_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        "l_returnflag",
    )
    t = VersionedTable.create(spark, base, li)
    files_before = t.manifest().files
    t.delete_where_deferred("l_returnflag LIKE 'N%'")
    cutoff = (
        li.agg(F.max("l_orderkey")).collect()[0][0] // 2
    )
    v = t.delete_where_deferred(f"l_orderkey * 3 >= {3 * int(cutoff)}")
    zero_rewrite = t.manifest(v).files == files_before
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p").cast("double").alias("sum_price"),
        F.countDistinct("l_returnflag").alias("n_modes"),
    ).withColumn("mor_served_ok", F.lit(bool(zero_rewrite)))


@register(
    "q140_hour_partitioning",
    tags=("lake", "partitioning", "transforms", "iceberg-parity"),
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', max(ts)) - INTERVAL 6 HOUR AS cutoff
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(CAST(sum(value) AS DOUBLE), 2) AS sum_value,
       TRUE AS hour_pruned_ok
FROM events, bounds
WHERE ts >= cutoff
""",
)
def q140_hour_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hour(ts) hidden partitioning (round-6 E51): events committed
    under `partition_by=["hour(ts)"]` — dirs are zero-padded
    `ts_hour=YYYY-MM-DD-HH/` whose lexicographic order is chronological,
    so a plain timestamp range predicate derives an hour-string range
    and prunes every older-hour leaf from dir NAMES alone
    (`hour_pruned_ok` asserts the majority of leaves skip and in-range
    leaves survive). The last-6-hours window is the canonical streaming
    serving read; the oracle recomputes it from raw events. At 100 TB,
    hour granularity is what event tables actually partition by — day
    leaves are too coarse for hot-window queries, and hidden
    partitioning keeps user SQL free of derived helper columns."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_hrp_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    ev = env.t("events").select("event_id", "ts", "user_id", "value")
    t = VersionedTable.create(
        spark, base, ev, partition_by=["hour(ts)"]
    )
    cutoff = ev.agg(
        F.date_trunc("hour", F.max("ts")) - F.expr("INTERVAL 6 HOURS")
    ).collect()[0][0]
    info = t.prune_info([("ts", ">=", cutoff)])
    pruned_ok = (
        info["n_skipped"] > info["n_scanned"]
        and info["n_scanned"] >= 1
    )
    return (
        t.read(predicates=[("ts", ">=", cutoff)])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value").cast("double"), 2).alias("sum_value"),
        )
        .withColumn("hour_pruned_ok", F.lit(bool(pruned_ok)))
    )


@register(
    "q141_bucket_join",
    tags=("lake", "join", "bucketing", "storage-partitioned-join"),
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT c.custkey) AS BIGINT) AS n_customers,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       TRUE AS no_shuffle_ok
FROM (SELECT o_custkey AS custkey, o_totalprice FROM orders) o
JOIN (SELECT c_custkey AS custkey, c_mktsegment FROM customer) c
  USING (custkey)
""",
)
def q141_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-wise co-located join (round-6 `VersionedTable.bucket_join`
    — the storage-partitioned-join shape Iceberg ships): orders and
    customer both land under `partition_by=["bucket(16, custkey)"]`, so
    equal keys provably share a bucket index and the join runs as 16
    independent per-bucket broadcast joins unioned together — ZERO
    table-wide shuffle of either side, asserted in-plan
    (`no_shuffle_ok`: no SortMergeJoin, no hash-partitioning Exchange in
    the executed plan). The oracle recomputes the join aggregate from
    raw orders x customer. At 100 TB this converts the fact-to-dim (or
    fact-to-fact on a shared key) join from the cluster's dominant
    shuffle into N embarrassingly parallel pieces whose only movement is
    smaller-side/N broadcasts."""
    import re as _re

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_bj_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    customer = env.t("customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    to = VersionedTable.create(
        spark, base + "_o", orders, partition_by=["bucket(16, custkey)"]
    )
    tc = VersionedTable.create(
        spark, base + "_c", customer, partition_by=["bucket(16, custkey)"]
    )
    joined = to.bucket_join(tc, "custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    no_shuffle = (
        "SortMergeJoin" not in plan
        and not _re.search(r"Exchange \w*hashpartitioning", plan)
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("custkey").alias("n_customers"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
    ).withColumn("no_shuffle_ok", F.lit(bool(no_shuffle)))


@register(
    "q143_scoped_optimize",
    tags=("lake", "maintenance", "compaction", "optimize-where"),
    oracle="""
WITH mm AS (
  SELECT strftime(max(CAST(l_shipdate AS DATE)), '%Y-%m') AS top_month
  FROM lineitem
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CASE WHEN strftime(CAST(l_shipdate AS DATE), '%Y-%m')
                          = (SELECT top_month FROM mm)
                THEN 1 ELSE 0 END) AS BIGINT) AS top_month_rows,
       TRUE AS scoped_ok
FROM lineitem
""",
)
def q143_scoped_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-scoped OPTIMIZE (round-6 `compact(where=[...])` —
    Delta's OPTIMIZE WHERE): lineitem lands month-partitioned, three
    drip appends hit the NEWEST month, and the maintenance pass runs
    `compact(where=[l_shipdate >= first-of-top-month])`. In-plan
    assertions (folded into `scoped_ok`): exactly the top month's 4
    entries compacted into 1, every other month's entry rel carried
    BYTE-IDENTICAL, and the change feed skips the commit. The oracle
    recomputes the row/aggregate totals from raw lineitem — a scoped
    compact that lost or duplicated rows anywhere shifts them. At
    100 TB this is the maintenance primitive: 'optimize the current
    month' costs the current month, not the table."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ow_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    li = env.t("lineitem").select(
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        F.col("l_quantity").cast("decimal(18,2)").alias("l_quantity"),
    )
    t = VersionedTable.create(
        spark, base, li, partition_by=["month(l_shipdate)"]
    )
    top = li.agg(F.max("l_shipdate")).collect()[0][0]
    first = top.replace(day=1)
    for k in range(3):
        t.append(
            spark.createDataFrame(
                [(top, None)], "l_shipdate date, l_quantity decimal(18,2)"
            ).select(
                "l_shipdate",
                F.lit(k + 1).cast("decimal(18,2)").alias("l_quantity"),
            )
        )
    pm = t.manifest()
    alias = "l_shipdate_month"
    top_key = f"{first.year:04d}-{first.month:02d}"
    before_top = [
        r for r in pm.files
        if pm.stats[r]["part_values"].get(alias) == top_key
    ]
    others = [r for r in pm.files if r not in before_top]
    v = t.compact(where=[("l_shipdate", ">=", first)])
    m2 = t.manifest(v)
    after_top = [
        r for r in m2.files
        if m2.stats[r]["part_values"].get(alias) == top_key
    ]
    scoped_ok = (
        len(before_top) == 4
        and len(after_top) == 1
        and set(others) <= set(m2.files)
        and m2.summary.get("n_entries_carried") == len(others)
        and t.changes(v - 1, v).count() == 0
    )
    # The three drip rows are synthetic; subtract them so the oracle
    # recomputes from RAW lineitem alone (their quantities 1+2+3 and
    # count 3 are constants both sides could bake in — cleaner to keep
    # the oracle pure).
    agg = t.read().agg(
        (F.count(F.lit(1)) - 3).alias("n_rows"),
        (F.sum("l_quantity") - 6).cast("double").alias("sum_qty"),
        (
            F.sum(
                (
                    F.date_format("l_shipdate", "yyyy-MM")
                    == F.lit(top_key)
                ).cast("bigint")
            )
            - 3
        ).alias("top_month_rows"),
    )
    return agg.withColumn("scoped_ok", F.lit(bool(scoped_ok)))


@register(
    "q144_spec_snapshot_pruning",
    tags=("lake", "partitioning", "evolution", "spec-snapshots"),
    oracle="""
WITH probe AS (
  SELECT min(o_orderkey) AS k FROM orders WHERE o_orderkey % 10 = 3
),
all_rows AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  UNION ALL
  SELECT o_orderkey + 1000000000, CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 10 = 3
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       CAST((SELECT count(*) FROM all_rows, probe
             WHERE all_rows.k = probe.k) AS BIGINT) AS probe_old_rows,
       CAST((SELECT count(*) FROM all_rows, probe
             WHERE all_rows.k = probe.k + 1000000000) AS BIGINT)
         AS probe_new_rows,
       TRUE AS exact_prune_ok
FROM all_rows
""",
)
def q144_spec_snapshot_pruning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-entry partition-spec snapshots (Iceberg's per-manifest
    spec-id, round-6 continuation): orders committed under
    `bucket(4, o_orderkey)`, the spec evolved to `bucket(8, o_orderkey)`
    (metadata-only), then clones of keys %10==3 (key+1e9) appended under
    the NEW modulus. Every entry records the spec that governed its
    write, so a key-equality read derives the bucket index PER
    GENERATION — old leaves prune with modulus 4, new leaves with
    modulus 8 — where union-derivation had to abandon the
    param-ambiguous alias entirely. `exact_prune_ok` asserts both probes
    scan <= 2 of the ~12 leaves; the oracle recomputes the mixed
    snapshot and both probe counts from raw orders. At 100 TB a bucket
    respec (4->8 shards as a table grows) is routine; without per-entry
    specs every point lookup degrades to a stats-only scan until a full
    table rewrite."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_specsnap_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    t = VersionedTable.create(
        spark, base, orders, partition_by=["bucket(4, o_orderkey)"]
    )
    t.set_partition_spec(["bucket(8, o_orderkey)"])
    k = F.col("o_orderkey")
    t.append(
        orders.filter(k % 10 == 3).withColumn(
            "o_orderkey", k + 1_000_000_000
        )
    )
    k0 = int(
        orders.filter(k % 10 == 3).agg(F.min("o_orderkey")).collect()[0][0]
    )
    n_leaves = len(t.manifest().files)
    info_old = t.prune_info([("o_orderkey", "=", k0)])
    info_new = t.prune_info(
        [("o_orderkey", "=", k0 + 1_000_000_000)]
    )
    exact = (
        info_old["n_scanned"] <= 2
        and info_new["n_scanned"] <= 2
        and n_leaves >= 10
    )
    probe_old = t.read(
        predicates=[("o_orderkey", "=", k0)]
    ).count()
    probe_new = t.read(
        predicates=[("o_orderkey", "=", k0 + 1_000_000_000)]
    ).count()
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("p").cast("double").alias("sum_price"),
        )
        .withColumn("probe_old_rows", F.lit(probe_old).cast("bigint"))
        .withColumn("probe_new_rows", F.lit(probe_new).cast("bigint"))
        .withColumn("exact_prune_ok", F.lit(bool(exact)))
    )


@register(
    "q145_mor_predicate_functions",
    tags=("lake", "datasource", "merge-on-read", "predicates"),
    oracle="""
WITH cutoff AS (SELECT max(o_orderkey) AS c FROM orders),
kept AS (
  SELECT o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         o_orderstatus, o_orderpriority, o_custkey
  FROM orders
  WHERE NOT (concat(o_orderstatus, '-', o_orderpriority) = 'O-1-URGENT')
    AND NOT (substring(o_orderpriority, 1, 1) = '3')
    AND NOT (o_orderkey + o_custkey >= (SELECT c FROM cutoff))
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prios,
       TRUE AS mor_served_ok
FROM kept
""",
)
def q145_mor_predicate_functions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deferred-delete predicates using the round-6 THIRD-pass compiler
    subset (`sources/sql_predicates.py`: concat / substring /
    column-vs-column arithmetic), served merge-on-read through the
    batch DataSource: three metadata-only deletes —
    `concat(o_orderstatus, '-', o_orderpriority) = 'O-1-URGENT'`,
    `substring(o_orderpriority, 1, 1) = '3'`, and
    `o_orderkey + o_custkey >= max_key` — and
    `spark.read.format("versioned")` compiles each to the serializable
    AST and evaluates executor-side with pyarrow
    (binary_join_element_wise emit_null, utf8_slice_codeunits, checked
    int64 add) under Spark-identical 3VL. Zero rewrite asserted
    in-plan; the oracle recomputes the kept set from raw orders with
    the same WHERE. The wider the compilable subset, the more of a real
    table's delete backlog stays metadata-only at 100 TB."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_morfn_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
    )
    t = VersionedTable.create(spark, base, orders)
    files_before = t.manifest().files
    t.delete_where_deferred(
        "concat(o_orderstatus, '-', o_orderpriority) = 'O-1-URGENT'"
    )
    t.delete_where_deferred("substring(o_orderpriority, 1, 1) = '3'")
    cutoff = int(orders.agg(F.max("o_orderkey")).collect()[0][0])
    v = t.delete_where_deferred(
        f"o_orderkey + o_custkey >= {cutoff}"
    )
    zero_rewrite = t.manifest(v).files == files_before
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("p").cast("double").alias("sum_price"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    ).withColumn("mor_served_ok", F.lit(bool(zero_rewrite)))


@register(
    "q146_scoped_update",
    tags=("lake", "dml", "update", "scoped-cow"),
    oracle="""
WITH target AS (
  SELECT min(o_orderpriority) AS p FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o_orderpriority = (SELECT p FROM target)
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                          + CAST(10.00 AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS total_price,
       TRUE AS scoped_ok
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q146_scoped_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-scoped COW UPDATE (`VersionedTable.update_where`, Delta's
    `UPDATE ... WHERE` — round-6 continuation): orders partitioned by
    o_orderpriority, then one priority's prices bumped +10.00 via the
    triple-predicate form. The rewrite is PARTITION-SCOPED: every other
    priority's leaf carries forward byte-identically (`scoped_ok`
    asserts n_dirs_untouched == n_priorities - 1 and that those rels
    survive verbatim in the new manifest), the match is TRUE-only SQL
    UPDATE semantics, and the change feed records delete(preimage) +
    insert(postimage) pairs — MERGE's encoding, so MVs replay it
    unchanged. The oracle recomputes the post-update aggregate from raw
    orders with a CASE. At 100 TB, UPDATE cost ∝ the updated partition,
    not the table — the difference between an hourly repricing job and
    an impossible one."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_upd_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    t = VersionedTable.create(
        spark, base, orders, partition_by=["o_orderpriority"]
    )
    target = orders.agg(F.min("o_orderpriority")).collect()[0][0]
    n_prios = orders.select("o_orderpriority").distinct().count()
    before = t.manifest()
    v = t.update_where(
        [("o_orderpriority", "=", target)],
        {"o_totalprice": "o_totalprice + CAST(10.00 AS DECIMAL(18,2))"},
    )
    m = t.manifest(v)
    carried = set(before.files) & set(m.files)
    scoped_ok = (
        m.summary.get("n_dirs_untouched") == n_prios - 1
        and len(carried) == n_prios - 1
    )
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").cast("double").alias("total_price"),
        )
        .withColumn("scoped_ok", F.lit(bool(scoped_ok)))
        .orderBy("o_orderpriority")
    )


@register(
    "q147_sql_dml_statements",
    tags=("lake", "dml", "sql-surface"),
    oracle="""
WITH target AS (SELECT min(o_orderpriority) AS p FROM orders),
after_update AS (
  SELECT o_orderkey,
         o_orderstatus,
         o_orderpriority,
         CASE WHEN o_orderpriority = (SELECT p FROM target)
              THEN CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(5.00 AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
  FROM orders
),
after_delete AS (
  SELECT * FROM after_update WHERE NOT (o_orderstatus = 'F')
),
after_insert AS (
  SELECT o_orderkey, price FROM after_delete
  UNION ALL
  SELECT o_orderkey + 2000000000,
         CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 100 = 7
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price,
       TRUE AS dml_ok
FROM after_insert
""",
)
def q147_sql_dml_statements(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SQL DML front door (`sinks/sql_dml.py` — the lake-native
    twin of the reference's raw-SQL DML execution,
    `src/Infrastructure/DataExtraction/SqlServerDataSource.cs:20-73`):
    three statements run verbatim against the versioned table —
    `UPDATE ... SET price = price + 5.00 WHERE priority = <min>`
    (compiles to the scoped triple form: every other priority's leaf
    carries byte-identically), `DELETE FROM ... WHERE status = 'F'`,
    and `INSERT INTO ... SELECT` of shifted clones from a registered
    view. The oracle replays the same three statements as relational
    algebra over raw orders. `dml_ok` asserts the UPDATE was
    partition-scoped and the three commits are separate versions."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_dml

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_dml_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(
        spark, base, orders, partition_by=["o_orderpriority"]
    )
    target = orders.agg(F.min("o_orderpriority")).collect()[0][0]
    n_prios = orders.select("o_orderpriority").distinct().count()
    tables = {"ord": t}
    v1 = execute_dml(
        spark,
        "UPDATE ord SET price = price + CAST(5.00 AS DECIMAL(18,2)) "
        f"WHERE o_orderpriority = '{target}'",
        tables,
    )
    scoped = (
        t.manifest(v1).summary.get("n_dirs_untouched") == n_prios - 1
    )
    execute_dml(
        spark, "DELETE FROM ord WHERE o_orderstatus = 'F'", tables
    )
    orders.filter(F.col("o_orderkey") % 100 == 7).createOrReplaceTempView(
        "dml_staging"
    )
    v3 = execute_dml(
        spark,
        "INSERT INTO ord (o_orderkey, price) "
        "SELECT o_orderkey + 2000000000, price FROM dml_staging",
        tables,
    )
    dml_ok = scoped and v3 == v1 + 2
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("dml_ok", F.lit(bool(dml_ok)))
    )


@register(
    "q148_type_widening",
    tags=("lake", "schema-evolution", "type-widening"),
    oracle="""
WITH all_rows AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  UNION ALL
  SELECT o_orderkey + 10000000000,
         CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 10 = 4
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS sum_price,
       CAST((SELECT count(*) FROM all_rows WHERE k >= 10000000000)
            AS BIGINT) AS n_wide,
       TRUE AS widened_ok
FROM all_rows
""",
)
def q148_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema TYPE WIDENING (Delta's type-widening shape, round-6
    continuation): orders committed with an INT key column and a
    decimal(12,2) price, then a merge_schema append of clones whose
    keys exceed int range (key + 1e10, BIGINT) and whose price column
    is decimal(18,2) — the table DDL widens along the safe promotion
    chains while the v1 files keep their narrow physical types; the
    explicit read schema upcasts them inside the parquet reader, so the
    mixed-generation snapshot aggregates exactly (`widened_ok` asserts
    the DDL changed, v1 still time-travels narrow, and a predicate
    over the widened key range scans only the wide generation). At
    100 TB, key columns outgrow int32 mid-life; type widening makes
    that a metadata change instead of a full-table rewrite."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_widen_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders")
    narrow = orders.select(
        F.col("o_orderkey").cast("int").alias("k"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    t = VersionedTable.create(spark, base, narrow)
    ddl_before = t.manifest().schema_ddl
    wide = orders.filter(F.col("o_orderkey") % 10 == 4).select(
        (F.col("o_orderkey") + 10_000_000_000).alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    t.append(wide, merge_schema=True)
    ddl_after = t.manifest().schema_ddl
    info = t.prune_info([("k", ">=", 10_000_000_000)])
    n_wide = t.read(
        predicates=[("k", ">=", 10_000_000_000)]
    ).count()
    widened_ok = (
        "k:bigint" in ddl_after.replace(" ", "")
        and "decimal(18,2)" in ddl_after
        and "k:int" in ddl_before.replace(" ", "")
        and t.read(1).schema["k"].dataType.simpleString() == "int"
        and info["n_skipped"] >= 1  # narrow entry refuted by stats
    )
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("p").cast("double").alias("sum_price"),
        )
        .withColumn("n_wide", F.lit(n_wide).cast("bigint"))
        .withColumn("widened_ok", F.lit(bool(widened_ok)))
    )


@register(
    "q149_replace_where",
    tags=("lake", "dml", "replace-where", "overwrite"),
    oracle="""
WITH target AS (SELECT min(o_orderpriority) AS p FROM orders),
kept AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderpriority <> (SELECT p FROM target)
),
replacement AS (
  SELECT o_orderkey + 3000000000 AS k,
         o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2))
           + CAST(1.00 AS DECIMAL(18,2)) AS price
  FROM orders
  WHERE o_orderpriority = (SELECT p FROM target)
    AND o_orderkey % 2 = 0
),
final AS (SELECT * FROM kept UNION ALL SELECT * FROM replacement)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price,
       TRUE AS scoped_ok
FROM final
GROUP BY prio
ORDER BY prio
""",
)
def q149_replace_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`overwrite_where` — Delta's replaceWhere (round-6 continuation):
    orders partitioned by priority; ONE priority's contents are
    atomically replaced by a recomputed frame (even keys only, shifted
    ids, +1.00 prices) under `[("o_orderpriority", "=", <min>)]`. The
    rewrite is partition-scoped (`scoped_ok` asserts every other
    priority's leaf carried byte-identically and that a row outside the
    region REFUSES), readers only ever see the old or the new region —
    never a mix — and the oracle recomputes the post-swap per-priority
    aggregate from raw orders. The canonical 100 TB shape: recompute
    one day of a derived table and swap it in while the pipeline keeps
    reading consistent snapshots."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_rw_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(
        spark, base, orders, partition_by=["prio"]
    )
    target = orders.agg(F.min("prio")).collect()[0][0]
    n_prios = orders.select("prio").distinct().count()
    replacement = (
        orders.filter(
            (F.col("prio") == target) & (F.col("k") % 2 == 0)
        )
        .withColumn("k", F.col("k") + 3_000_000_000)
        .withColumn(
            "price",
            (
                F.col("price")
                + F.lit("1.00").cast("decimal(18,2)")
            ).cast("decimal(18,2)"),
        )
    )
    before = t.manifest()
    refused = False
    try:
        t.overwrite_where(
            replacement.withColumn("prio", F.lit(target + "X")),
            [("prio", "=", target)],
        )
    except ValueError:
        refused = True
    v = t.overwrite_where(replacement, [("prio", "=", target)])
    m = t.manifest(v)
    carried = set(before.files) & set(m.files)
    scoped_ok = (
        refused
        and m.summary.get("n_dirs_untouched") == n_prios - 1
        and len(carried) == n_prios - 1
    )
    return (
        t.read()
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("scoped_ok", F.lit(bool(scoped_ok)))
        .orderBy("prio")
    )


@register(
    "q150_cdc_replication",
    tags=("lake", "streaming", "cdc", "merge", "exactly-once"),
    oracle="""
WITH bounds AS (
  SELECT min(o_orderpriority) AS mn, max(o_orderpriority) AS mx
  FROM orders
),
base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  UNION ALL
  SELECT o_orderkey + 4000000000, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 10 = 6
),
final AS (
  SELECT k, prio,
         CASE WHEN prio = (SELECT mn FROM bounds)
              THEN price + CAST(5.00 AS DECIMAL(18,2))
              ELSE price END AS price
  FROM base WHERE prio <> (SELECT mx FROM bounds)
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price,
       TRUE AS replicated_ok
FROM final
GROUP BY prio
ORDER BY prio
""",
)
def q150_cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY under the value oracle (`streaming/cdc_apply.py` —
    the consume half of change-data-capture, Delta's foreachBatch+MERGE
    idiom): a source table built from orders takes a MERGE (shifted-key
    clone inserts), a scoped UPDATE (+5.00 on the min priority), and a
    scoped DELETE (the max priority); its change feed then drives the
    CDC committer into a fresh REPLICA in three epochs — bootstrap
    snapshot, merge+update feed, delete feed — with epoch 1 COMMITTED
    TWICE (crash-replay; the high-water marker makes it a no-op).
    `replicated_ok` asserts replica == source row-for-row AND exactly
    3 replica versions (the replay added none); the oracle recomputes
    the final state from raw orders as pure relational algebra. At
    100 TB this is table replication: ship the feed, not the table."""
    from datalakeingestionservice_spark.streaming.cdc_apply import (
        make_cdc_apply_committer,
    )

    src_root = os.path.join(
        tempfile.gettempdir(), f"dlis_cdcs_{uuid.uuid4().hex}"
    )
    rep_root = os.path.join(
        tempfile.gettempdir(), f"dlis_cdcr_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    src = VersionedTable.create(
        spark, src_root, orders, materialize_changes=True
    )
    mn, mx = orders.agg(F.min("prio"), F.max("prio")).collect()[0]
    src.merge(
        orders.filter(F.col("k") % 10 == 6).withColumn(
            "k", F.col("k") + 4_000_000_000
        ),
        ["k"],
    )  # v2
    src.update_where(
        [("prio", "=", mn)],
        {"price": "price + CAST(5.00 AS DECIMAL(18,2))"},
    )  # v3
    src.delete_where([("prio", "=", mx)])  # v4
    commit = make_cdc_apply_committer(rep_root, ["k"])
    epoch0 = (
        src.read(1)
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(1).cast("long"))
    )
    commit(epoch0, 0)
    commit(src.changes(1, 3), 1)
    commit(src.changes(3, 4), 2)
    commit(src.changes(1, 3), 1)  # crash-replay: must be a no-op
    rep = VersionedTable(spark, rep_root)
    src_rows = src.read().count()
    rep_rows = rep.read().count()
    mismatches = (
        src.read().exceptAll(rep.read()).count()
        + rep.read().exceptAll(src.read()).count()
    )
    ok = (
        rep.latest_version() == 3
        and src_rows == rep_rows
        and mismatches == 0
    )
    return (
        rep.read()
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("replicated_ok", F.lit(bool(ok)))
        .orderBy("prio")
    )


@register(
    "q151_position_delete_mor",
    tags=("lake", "dml", "merge-on-read", "position-deletes"),
    oracle="""
WITH bounds AS (
  SELECT min(o_orderpriority) AS mn FROM orders
),
base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
after_update AS (
  SELECT k, prio,
         CASE WHEN prio = (SELECT mn FROM bounds)
              THEN price + CAST(5.00 AS DECIMAL(18,2))
              ELSE price END AS price
  FROM base
),
final AS (
  SELECT k, prio,
         CASE WHEN k % 10 = 3
              THEN price + CAST(1.00 AS DECIMAL(18,2))
              ELSE price END AS price
  FROM after_update WHERE k % 10 <> 9
  UNION ALL
  SELECT k + 4000000000, prio, price
  FROM after_update WHERE k % 10 = 7
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price,
       TRUE AS mor_ok
FROM final
GROUP BY prio
ORDER BY prio
""",
)
def q151_position_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATE + MERGE via POSITION DELETES (Iceberg
    positional-delete / Delta deletion-vector shape; `sinks/versioned.py`
    `update_where_deferred` / `merge_deferred`): orders snapshots into a
    prio-partitioned versioned table, then (1) a deferred UPDATE adds
    5.00 to every min-priority price and (2) a deferred MERGE — sourced
    from the MoR-served session read itself — replaces keys %10==3 at
    +1.00, deletes keys %10==9, and inserts shifted-key clones of
    %10==7. NEITHER DML rewrites a data file: matched rows' (file,
    row-ordinal) coordinates land in delete files under `deletes/`, and
    `mor_ok` asserts every v1 manifest entry survives verbatim into the
    final manifest plus exactly two live position-delete references. The
    final state is served through `spark.read.format("versioned")` —
    the sessionless DataSource anti-applies the coordinates executor-
    side with pyarrow — and the oracle recomputes it from raw orders as
    pure relational algebra. At 100 TB this is the streaming-upsert
    path: an update touching 1k rows across 1k multi-GB files writes
    kilobytes of coordinates instead of rewriting terabytes (the reason
    Iceberg v2 and Delta deletion vectors exist; the reference defers
    the whole problem to its RDBMS, `SqlServerDataSource.cs:83-90`)."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_posd_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(
        spark, base, orders, partition_by=["prio"]
    )
    v1_entries = set(t.manifest().files)
    mn = orders.agg(F.min("prio")).collect()[0][0]
    t.update_where_deferred(
        [("prio", "=", mn)],
        {"price": "price + CAST(5.00 AS DECIMAL(18,2))"},
    )
    cur = t.read()  # MoR-served: postimages visible, preimages masked
    upd = cur.filter(F.col("k") % 10 == 3).withColumn(
        "price",
        (F.col("price") + F.expr("CAST(1.00 AS DECIMAL(18,2))")).cast(
            "decimal(18,2)"
        ),
    )
    ins = cur.filter(F.col("k") % 10 == 7).withColumn(
        "k", F.col("k") + 4_000_000_000
    )
    dels = cur.filter(F.col("k") % 10 == 9).withColumn(
        "__del", F.lit(True)
    )
    updates = (
        upd.unionByName(ins)
        .withColumn("__del", F.lit(False))
        .unionByName(dels)
    )
    v = t.merge_deferred(updates, ["k"], delete_col="__del")
    m = t.manifest(v)
    n_pos = sum(1 for p in m.delete_predicates if "pos" in p)
    mor_ok = v1_entries <= set(m.files) and n_pos == 2
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return (
        df.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("mor_ok", F.lit(bool(mor_ok)))
        .orderBy("prio")
    )


@register(
    "q152_sql_time_travel",
    tags=("lake", "sql-front-door", "time-travel", "select"),
    oracle="""
WITH bounds AS (
  SELECT min(o_orderpriority) AS mn FROM orders
)
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_changed,
       CAST(count(*) * 5.00 AS DOUBLE) AS delta,
       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_v1
FROM orders
WHERE o_orderpriority = (SELECT mn FROM bounds)
GROUP BY prio
ORDER BY prio
""",
)
def q152_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door end-to-end (`sinks/sql_dml.py` `execute_sql` /
    `execute_select`): orders snapshots into a versioned table, one
    UPDATE STATEMENT (+5.00 on the min priority, stats-scoped through
    the triple compiler) commits v2, then ONE SELECT statement audits
    the change with per-reference time travel — the current snapshot
    joins `t VERSION AS OF 1` on key to count changed rows and sum the
    price deltas, while a scalar subquery reads `t TIMESTAMP AS OF
    '<v1 commit time>'` for the version-1 row count. Qualified refs
    (`cur.price`, `old.price`) survive because the rewrite keeps each
    table name visible as an alias. The oracle recomputes everything
    from raw orders. This closes the reference's "ship SQL text at it"
    UX (`SqlServerDataSource.cs:55-62`) over lake snapshots: a user
    migrating dataset configs full of SQL statements points them at
    table roots and keeps both their DML and their audit SELECTs."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_sqltt_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders)
    tables = {"t": t}
    mn = orders.agg(F.min("prio")).collect()[0][0]
    ts1 = t.manifest(1).committed_at
    v = execute_sql(
        spark,
        "UPDATE t SET price = CAST(price + 5.00 AS DECIMAL(18,2)) "
        f"WHERE prio = '{mn}'",
        tables,
    )
    assert v == 2
    return execute_select(
        spark,
        "SELECT cur.prio AS prio, "
        "CAST(count(*) AS BIGINT) AS n_changed, "
        "CAST(sum(cur.price - old.price) AS DOUBLE) AS delta, "
        f"(SELECT CAST(count(*) AS BIGINT) "
        f"FROM t TIMESTAMP AS OF '{ts1}') AS n_v1 "
        "FROM t cur JOIN t VERSION AS OF 1 AS old ON cur.k = old.k "
        "WHERE cur.price <> old.price "
        "GROUP BY cur.prio ORDER BY prio",
        tables,
    )


@register(
    "q153_mor_upsert_loop",
    tags=("lake", "merge-on-read", "position-deletes", "maintenance"),
    oracle="""
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 10 IN (1, 2, 3)
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                          + CAST(o_orderkey % 10 AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS total_price,
       TRUE AS mor_ok
FROM orders
GROUP BY prio
ORDER BY prio
""",
)
def q153_mor_upsert_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING-UPSERT MoR lifecycle in one plan: three
    `merge_deferred` epochs land position-delete files + postimage
    appends against an orders snapshot (epoch i replaces keys %10==i at
    +i.00 — zero data-file rewrite each time), then `compact_deletes()`
    merges the three coordinate files into ONE without touching a
    single data file, and the final state serves through
    `spark.read.format("versioned")`. `mor_ok` asserts the full
    contract in-manifest: every v1 entry survives verbatim through all
    five commits, 3 live delete files before maintenance, exactly 1
    after, and the maintenance commit is data-preserving
    (`cdf_empty`). The oracle recomputes the final state from raw
    orders. At 100 TB this IS the CDC-upsert serving story: upserts
    cost coordinates, maintenance costs coordinates, and reads load one
    delete file instead of one per epoch."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_morloop_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders, partition_by=["prio"])
    v1_entries = set(t.manifest().files)
    for i in (1, 2, 3):
        t.merge_deferred(
            orders.filter(F.col("k") % 10 == i).withColumn(
                "price",
                (
                    F.col("price")
                    + F.expr(f"CAST({i}.00 AS DECIMAL(18,2))")
                ).cast("decimal(18,2)"),
            ),
            ["k"],
        )
    n_before = sum(
        1 for p in t.manifest().delete_predicates if "pos" in p
    )
    v = t.compact_deletes()
    m = t.manifest(v)
    n_after = sum(1 for p in m.delete_predicates if "pos" in p)
    mor_ok = (
        v1_entries <= set(m.files)
        and n_before == 3
        and n_after == 1
        and m.summary.get("cdf_empty") is True
    )
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return (
        df.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("mor_ok", F.lit(bool(mor_ok)))
        .orderBy("prio")
    )


@register(
    "q154_equality_delete_upsert",
    tags=("lake", "merge-on-read", "equality-deletes", "upsert"),
    oracle="""
SELECT o_orderpriority AS prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN o_orderkey % 10 = 3
                     THEN CAST(o_totalprice AS DECIMAL(18,2))
                          + CAST(1.00 AS DECIMAL(18,2))
                     ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS total_price,
       TRUE AS eq_ok
FROM orders
WHERE o_orderkey % 10 <> 9
GROUP BY prio
ORDER BY prio
""",
)
def q154_equality_delete_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EQUALITY DELETES + SCAN-FREE UPSERT (Iceberg's second delete-file
    kind; `delete_keys_deferred` / `upsert_deferred`): against a
    prio-partitioned orders snapshot, (1) every key %10==9 is deleted by
    VALUE — the delete file stores keys, the table is NEVER read, write
    cost ∝ |keys| — and (2) one `upsert_deferred` commit replaces keys
    %10==3 at +1.00 via an equality-delete file plus a postimage append
    (Flink→Iceberg upsert-mode shape: no coordinate scan, unlike
    `merge_deferred`). `eq_ok` asserts zero data-file rewrite (every v1
    entry survives verbatim) and exactly two live equality-delete
    references; the final state serves through
    `spark.read.format("versioned")` — the sessionless reader
    anti-joins the key values executor-side — and the oracle recomputes
    it from raw orders. At 100 TB this is the CDC-at-full-firehose
    primitive: a writer that cannot afford to read the table still
    upserts in one atomic commit."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_eqdel_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders, partition_by=["prio"])
    v1_entries = set(t.manifest().files)
    t.delete_keys_deferred(
        orders.filter(F.col("k") % 10 == 9).select("k")
    )
    v = t.upsert_deferred(
        orders.filter(F.col("k") % 10 == 3).withColumn(
            "price",
            (
                F.col("price") + F.expr("CAST(1.00 AS DECIMAL(18,2))")
            ).cast("decimal(18,2)"),
        ),
        ["k"],
    )
    m = t.manifest(v)
    n_eq = sum(1 for p in m.delete_predicates if "eq" in p)
    eq_ok = v1_entries <= set(m.files) and n_eq == 2
    df = (
        spark.read.format("versioned")
        .option("table_root", base)
        .load()
    )
    return (
        df.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("eq_ok", F.lit(bool(eq_ok)))
        .orderBy("prio")
    )


@register(
    "q155_cdc_mor_replication",
    tags=("lake", "streaming", "cdc", "merge-on-read", "equality-deletes"),
    oracle="""
WITH bounds AS (
  SELECT min(o_orderpriority) AS mn, max(o_orderpriority) AS mx
  FROM orders
),
base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
  UNION ALL
  SELECT o_orderkey + 4000000000, o_orderpriority,
         CAST(o_totalprice AS DECIMAL(18,2))
  FROM orders WHERE o_orderkey % 10 = 6
),
final AS (
  SELECT k, prio,
         CASE WHEN prio = (SELECT mn FROM bounds)
              THEN price + CAST(5.00 AS DECIMAL(18,2))
              ELSE price END AS price
  FROM base WHERE prio <> (SELECT mx FROM bounds)
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price,
       TRUE AS mor_cdc_ok
FROM final
GROUP BY prio
ORDER BY prio
""",
)
def q155_cdc_mor_replication(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE-ON-READ CDC REPLICATION (q150's scenario with the
    committer in `mode="upsert_deferred"` + the maintenance half): the
    same source DML mix (MERGE inserts, scoped UPDATE, scoped DELETE)
    feeds the replica in three epochs, but each netted batch lands as
    ONE equality-delete file + postimage appends — `mor_cdc_ok`
    asserts the replica was NEVER rewritten (every post-bootstrap
    data file survives every later epoch verbatim), all apply commits
    are `upsert_deferred`, and the replayed epoch is a no-op. Then
    the maintenance half runs IN the loop via the committer's
    threshold policy (`maintain_every_epochs=2`,
    `max_delete_files=1` → `maintain_deletes` fires after epoch 2 and
    converts the per-epoch key files to ONE coordinate file,
    data-preserving) and the final state serves through
    `spark.read.format("versioned")` with the oracle recomputing it
    from raw orders. At 100 TB this is CDC replication at firehose
    rates: per-epoch cost ∝ batch, never ∝ replica, with the read-side
    anti-join backlog bounded by policy instead of by an external
    scheduler remembering to run."""
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )
    from datalakeingestionservice_spark.streaming.cdc_apply import (
        make_cdc_apply_committer,
    )

    register_source(spark)
    src_root = os.path.join(
        tempfile.gettempdir(), f"dlis_morcs_{uuid.uuid4().hex}"
    )
    rep_root = os.path.join(
        tempfile.gettempdir(), f"dlis_morcr_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    src = VersionedTable.create(
        spark, src_root, orders, materialize_changes=True
    )
    mn, mx = orders.agg(F.min("prio"), F.max("prio")).collect()[0]
    src.merge(
        orders.filter(F.col("k") % 10 == 6).withColumn(
            "k", F.col("k") + 4_000_000_000
        ),
        ["k"],
    )  # v2
    src.update_where(
        [("prio", "=", mn)],
        {"price": "price + CAST(5.00 AS DECIMAL(18,2))"},
    )  # v3
    src.delete_where([("prio", "=", mx)])  # v4
    commit = make_cdc_apply_committer(
        rep_root,
        ["k"],
        mode="upsert_deferred",
        maintain_every_epochs=2,
        maintain_policy={
            "max_delete_files": 1,
            "max_deleted_fraction": 0.95,
        },
    )
    epoch0 = (
        src.read(1)
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(1).cast("long"))
    )
    commit(epoch0, 0)
    rep = VersionedTable(spark, rep_root)

    def _files(root):
        out = set()
        for dirpath, _d, fns in os.walk(os.path.join(root, "data")):
            out |= {
                os.path.join(dirpath, f)
                for f in fns
                if f.endswith(".parquet")
            }
        return out

    boot_files = _files(rep_root)
    commit(src.changes(1, 3), 1)
    commit(src.changes(3, 4), 2)  # epoch 2 also fires the policy
    commit(src.changes(1, 3), 1)  # crash-replay: must be a no-op
    ops = {m.version: m.operation for m in rep.versions()}
    apply_ops = {
        op for v2, op in ops.items() if v2 > 1 and op != "compact_deletes"
    }
    zero_rewrite = boot_files <= _files(rep_root)
    mismatches = (
        src.read().exceptAll(rep.read()).count()
        + rep.read().exceptAll(src.read()).count()
    )
    m = rep.manifest()
    ok = (
        rep.latest_version() == 4  # 3 applies + 1 in-loop maintenance
        and ops.get(4) == "compact_deletes"  # the policy ran at epoch 2
        and apply_ops == {"upsert_deferred"}
        and zero_rewrite
        and mismatches == 0
        and m.summary.get("cdf_empty") is True
        and sum(1 for p in m.delete_predicates if "pos" in p) == 1
        and not any("eq" in p for p in m.delete_predicates)
    )
    df = (
        spark.read.format("versioned")
        .option("table_root", rep_root)
        .load()
    )
    return (
        df.groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("mor_cdc_ok", F.lit(bool(ok)))
        .orderBy("prio")
    )


@register(
    "q157_table_changes_tvf",
    tags=("lake", "sql-front-door", "change-feed", "cdf"),
    oracle="""
WITH upd AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 = 0
),
del AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 = 1
),
feed AS (
  SELECT 2 AS cv, 'delete' AS ct, p FROM upd
  UNION ALL
  SELECT 2 AS cv, 'insert' AS ct, CAST(p + 5.00 AS DECIMAL(18,2)) FROM upd
  UNION ALL
  SELECT 3 AS cv, 'delete' AS ct, p FROM del
)
SELECT CAST(cv AS BIGINT) AS commit_version,
       ct AS change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM feed
GROUP BY cv, ct
ORDER BY commit_version, change_type
""",
)
def q157_table_changes_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed read as SQL TEXT — `table_changes('t', v1[,v2])`
    through the front door (`sinks/sql_dml.py` `execute_select`), the
    Delta-CDF read idiom and the last lake read surface that wasn't
    reachable as a statement. Orders snapshot -> t (v1); two DML
    STATEMENTS commit v2 (UPDATE +5.00 on keys %10==0) and v3 (DELETE
    keys %10==1); then ONE SELECT aggregates the whole feed per
    (commit, change type) — `table_changes` routes to
    `VersionedTable.changes(1)` verbatim (exclusive of v1), and because
    both DML paths MATERIALIZE their change files at commit time, the
    feed read costs a scan of exactly the changed rows, never a
    snapshot diff — the property that makes incremental consumers
    viable at 100 TB. The oracle recomputes the expected feed from raw
    orders. (+5.00 keeps prices at 2 decimals — FUZZ.md rule 2.)"""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_tvf_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders)
    tables = {"t": t}
    v = execute_sql(
        spark,
        "UPDATE t SET price = CAST(price + 5.00 AS DECIMAL(18,2)) "
        "WHERE k % 10 = 0",
        tables,
    )
    assert v == 2
    v = execute_sql(spark, "DELETE FROM t WHERE k % 10 = 1", tables)
    assert v == 3
    return execute_select(
        spark,
        "SELECT _commit_version AS commit_version, "
        "_change_type AS change_type, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(price) AS DOUBLE) AS total_price "
        "FROM table_changes('t', 1) "
        "GROUP BY _commit_version, _change_type "
        "ORDER BY commit_version, change_type",
        tables,
    )


@register(
    "q156_branch_wap",
    tags=("lake", "branches", "write-audit-publish", "refs"),
    oracle="""
WITH good AS (
  SELECT o_orderkey + 1000000000 AS k,
         o_orderpriority AS prio,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1.00
              AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 = 5
),
final AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
  UNION ALL SELECT prio, p FROM good
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price,
       TRUE AS wap_ok
FROM final
GROUP BY prio
ORDER BY prio
""",
)
def q156_branch_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH on a named ref (Iceberg WAP / Nessie branch
    shape, on this engine's own commit protocol): orders snapshot (with
    a `price > 0` CHECK) -> t; a BAD batch (negative-price clones of
    keys %10==4) is written to branch `staging` and dies THERE — the
    constraint fires at branch-append time and main readers never see a
    row of it; the branch is dropped and its data reclaimed by vacuum.
    A GOOD batch (price+1.00 clones of keys %10==5) lands on a fresh
    branch, is AUDITED with real queries against the branch handle
    (row count, min price, zero key overlap with main) while main still
    serves the untouched snapshot, then `publish_branch` fast-forwards
    it into main as ONE atomic squash commit — the commit protocol's
    version claim makes a divergent publish refuse rather than
    half-apply. `wap_ok` asserts the full contract in-plan: the bad
    batch raised, main stayed at v1 (bit-identical file set) until
    publish, the publish commit records its branch lineage, and the
    branch's data dirs were shared (zero data movement at publish: the
    published manifest references the SAME dirs the branch wrote). The
    oracle recomputes the final state from raw orders. At 100 TB this
    is how a pipeline lands a 10 TB daily batch: write+validate on a
    ref with creation cost of ONE manifest, publish by metadata."""
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_wap_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(
        spark, base, orders, check_constraints={"price_pos": "price > 0"}
    )
    from datalakeingestionservice_spark.sinks.versioned import (
        ConstraintViolationError,
    )

    v1_files = set(t.manifest().files)

    # -- write (bad): dies on the branch, never on main
    bad_branch = t.create_branch("staging")
    bad = orders.filter(F.col("k") % 10 == 4).select(
        (F.col("k") + 1_000_000_000).alias("k"),
        F.col("prio"),
        (-F.col("price")).cast("decimal(18,2)").alias("price"),
    )
    bad_caught = False
    try:
        bad_branch.append(bad)
    except ConstraintViolationError:
        bad_caught = True
    main_clean_after_bad = set(t.manifest().files) == v1_files
    t.drop_branch("staging")
    t.vacuum(claim_timeout_s=None)

    # -- write (good) + audit on the branch, then atomic publish
    b = t.create_branch("staging")
    good = orders.filter(F.col("k") % 10 == 5).select(
        (F.col("k") + 1_000_000_000).alias("k"),
        F.col("prio"),
        (F.col("price") + F.lit(1.00).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("price"),
    )
    n_good = good.count()
    b.append(good)
    audit = b.read(b.latest_version()).filter(
        F.col("k") >= 1_000_000_000
    )
    audited = (
        audit.count() == n_good
        and audit.agg(F.min("price")).collect()[0][0] > 0
        and t.read()
        .join(audit, "k", "left_semi")
        .count()
        == 0  # no key overlap with main
    )
    main_pinned_during_audit = t.latest_version() == 1
    branch_files = set(b.manifest().files)
    v = t.publish_branch("staging")
    m = t.manifest(v)
    ok = (
        bad_caught
        and main_clean_after_bad
        and audited
        and main_pinned_during_audit
        and v == 2
        and m.operation == "publish_branch"
        and m.summary.get("branch") == "staging"
        and set(m.files) == branch_files  # zero data movement
    )
    return (
        t.read()
        .groupBy("prio")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("wap_ok", F.lit(bool(ok)))
        .orderBy("prio")
    )


@register(
    "q159_catalog_transaction",
    tags=("lake", "catalog", "multi-table", "transaction"),
    oracle="""
WITH live AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 NOT IN (7, 8)
),
archived AS (
  SELECT o_orderpriority AS prio,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 2.00
              AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 IN (7, 8)
)
SELECT prio,
       (SELECT CAST(count(*) AS BIGINT) FROM live l
        WHERE l.prio = x.prio) AS n_live,
       (SELECT CAST(count(*) AS BIGINT) FROM archived a
        WHERE a.prio = x.prio) AS n_archived,
       CAST((SELECT coalesce(sum(p), 0) FROM live l
             WHERE l.prio = x.prio)
          + (SELECT coalesce(sum(p), 0) FROM archived a
             WHERE a.prio = x.prio) AS DOUBLE) AS total_price,
       TRUE AS catalog_ok
FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) x
ORDER BY prio
""",
)
def q159_catalog_transaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATOMIC MULTI-TABLE TRANSACTIONS (`sinks/multi_table.py`, the
    Nessie catalog shape): single-table commits are already atomic, but
    moving rows BETWEEN tables isn't — a reader can see the append
    without the delete. Here a `TableCatalog` pins (table -> version)
    per catalog commit and a transaction swaps every pin in ONE atomic
    catalog commit: orders -> `live`, empty `archive`; txn1 MOVES keys
    %10 in (7,8) (append to archive + delete from live, two table
    commits, one pin swap); txn2 bumps archived prices +2.00; a third
    transaction appends junk and CRASHES — its table version exists as
    an unpinned orphan but no catalog reader ever sees it.
    `catalog_ok` asserts the contract in-plan: the row-conservation
    invariant (|live| + |archive| - junk = |orders|) holds at EVERY
    catalog version via `cat.sql` (the property a partial transaction
    would break), cross-table time travel reproduces the pre-bump
    archive total, the crashed transaction moved no pin, and the junk
    orphan is visible by direct table read but not through the catalog.
    The oracle recomputes the final catalog state from raw orders. At
    100 TB a catalog commit is O(#tables) JSON bytes — the ledger
    debit/credit pattern with zero cross-table lock."""
    from datalakeingestionservice_spark.sinks.multi_table import (
        TableCatalog,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_cat_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    live = VersionedTable.create(spark, os.path.join(base, "live"), orders)
    archive = VersionedTable.create(
        spark, os.path.join(base, "archive"), orders.limit(0)
    )
    cat = TableCatalog.create(
        spark, os.path.join(base, "cat"), {"live": live, "archive": archive}
    )

    moved = orders.filter((F.col("k") % 10).isin(7, 8))
    n_moved = moved.count()
    with cat.transaction() as txn:  # catalog v2: the atomic move
        txn["archive"].append(moved)
        txn["live"].delete_where((F.col("k") % 10).isin(7, 8))
    with cat.transaction() as txn:  # catalog v3: archive price bump
        txn["archive"].update_where(
            [("k", ">", 0)],
            {"price": "CAST(price + 2.00 AS DECIMAL(18,2))"},
        )
    crashed = False
    try:
        with cat.transaction() as txn:  # never becomes a catalog commit
            txn["archive"].append(
                moved.withColumn("k", F.col("k") + 5_000_000_000)
            )
            raise RuntimeError("simulated crash before pin swap")
    except RuntimeError:
        crashed = True

    n_orders = orders.count()
    conserved = all(
        cat.sql(
            "SELECT (SELECT count(*) FROM live) "
            "+ (SELECT count(*) FROM archive) AS n",
            cv,
        ).collect()[0].n
        == n_orders
        for cv in (1, 2, 3)
    )
    bump = (
        cat.sql(
            "SELECT CAST(sum(price) AS DOUBLE) AS s FROM archive", 3
        ).collect()[0].s
        or 0.0
    ) - (
        cat.sql(
            "SELECT CAST(sum(price) AS DOUBLE) AS s FROM archive", 2
        ).collect()[0].s
        or 0.0
    )
    orphan_hidden = (
        cat.latest_version() == 3
        and cat.read("archive").count() == n_moved  # junk not visible
        and cat.table("archive").read().count() == 2 * n_moved  # orphan
    )
    ok = (
        crashed
        and conserved
        and abs(bump - 2.0 * n_moved) < 1e-6
        and orphan_hidden
    )
    merged = cat.read("live").unionByName(cat.read("archive"))
    return (
        merged.groupBy("prio")
        .agg(
            F.sum(
                ((F.col("k") % 10).isin(7, 8) == False).cast("long")  # noqa: E712
            ).alias("n_live"),
            F.sum(((F.col("k") % 10).isin(7, 8)).cast("long")).alias(
                "n_archived"
            ),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("catalog_ok", F.lit(bool(ok)))
        .orderBy("prio")
    )


@register(
    "q161_staged_catalog_wap",
    tags=("lake", "catalog", "write-audit-publish", "branches"),
    oracle="""
WITH live AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 <> 6
),
archived AS (
  SELECT o_orderpriority AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 10 = 6
)
SELECT prio,
       (SELECT CAST(count(*) AS BIGINT) FROM live l
        WHERE l.prio = x.prio) AS n_live,
       (SELECT CAST(count(*) AS BIGINT) FROM archived a
        WHERE a.prio = x.prio) AS n_archived,
       CAST((SELECT coalesce(sum(p), 0) FROM live l
             WHERE l.prio = x.prio)
          + (SELECT coalesce(sum(p), 0) FROM archived a
             WHERE a.prio = x.prio) AS DOUBLE) AS total_price,
       TRUE AS wap_ok
FROM (SELECT DISTINCT o_orderpriority AS prio FROM orders) x
ORDER BY prio
""",
)
def q161_staged_catalog_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CATALOG-LEVEL WRITE-AUDIT-PUBLISH (E85 = E79 branches × E82
    catalog pins, `staged_transaction`): a BAD cross-table group
    (negative-price clones appended to archive + a live delete) stages
    on per-transaction BRANCHES, its cross-table AUDIT (`txn.sql` over
    the staged world) vetoes by raising — and unlike a plain catalog
    transaction, NOTHING lands on any main: no orphan versions, no
    branches left, both tables bit-identical. The GOOD group (move keys
    %10==6 from live to archive) audits green on the staged world
    (conservation + no negatives) and publishes: every touched branch
    fast-forwards and ONE pin swap makes both sides visible together.
    `wap_ok` asserts the veto left zero trace (table versions AND file
    sets unchanged, branch lists empty), the staged world was invisible
    to catalog readers during the audit, and the publish moved the pin
    exactly once. The oracle recomputes the final catalog state from
    raw orders. At 100 TB this is the nightly multi-table load: stage a
    10-table batch on refs, run the audit suite against the staged
    catalog, publish by metadata — a bad batch costs branch manifests,
    never a cleanup job."""
    from datalakeingestionservice_spark.sinks.multi_table import (
        TableCatalog,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_swap_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    live = VersionedTable.create(spark, os.path.join(base, "live"), orders)
    archive = VersionedTable.create(
        spark, os.path.join(base, "archive"), orders.limit(0)
    )
    cat = TableCatalog.create(
        spark, os.path.join(base, "cat"), {"live": live, "archive": archive}
    )

    # -- bad group: vetoed by the cross-table audit, zero trace
    bad = orders.filter(F.col("k") % 10 == 6).select(
        (F.col("k") + 1_000_000_000).alias("k"),
        F.col("prio"),
        (-F.col("price")).cast("decimal(18,2)").alias("price"),
    )
    vetoed = False
    try:
        with cat.staged_transaction() as txn:
            txn["archive"].append(bad)
            txn["live"].delete_where([("k", ">", 0)])  # would empty live
            n_bad = txn.sql(
                "SELECT count(*) AS n FROM archive WHERE price <= 0"
            ).collect()[0].n
            if n_bad:
                raise ValueError("audit: non-positive archive prices")
    except ValueError:
        vetoed = True
    zero_trace = (
        live.latest_version() == 1
        and archive.latest_version() == 1
        and live.list_branches() == {}
        and archive.list_branches() == {}
    )

    # -- good group: staged, audited on the staged world, published
    moved = orders.filter(F.col("k") % 10 == 6)
    n_orders, n_moved = orders.count(), moved.count()
    with cat.staged_transaction() as txn:
        txn["archive"].append(moved)
        txn["live"].delete_where((F.col("k") % 10) == 6)
        invisible_mid_txn = (
            cat.read("archive").count() == 0  # catalog: pre-txn world
        )
        audit = txn.sql(
            "SELECT (SELECT count(*) FROM live) "
            "+ (SELECT count(*) FROM archive) AS n, "
            "(SELECT count(*) FROM archive WHERE price <= 0) AS n_bad"
        ).collect()[0]
        assert audit.n == n_orders and audit.n_bad == 0
    ok = (
        vetoed
        and zero_trace
        and invisible_mid_txn
        and cat.latest_version() == 2
        and cat.manifest()["operation"] == "staged_transaction"
        and cat.read("live").count() == n_orders - n_moved
        and cat.read("archive").count() == n_moved
        and live.list_branches() == {}
        and archive.list_branches() == {}
    )
    merged = cat.read("live").unionByName(cat.read("archive"))
    return (
        merged.groupBy("prio")
        .agg(
            F.sum(((F.col("k") % 10) != 6).cast("long")).alias("n_live"),
            F.sum(((F.col("k") % 10) == 6).cast("long")).alias(
                "n_archived"
            ),
            F.sum("price").cast("double").alias("total_price"),
        )
        .withColumn("wap_ok", F.lit(bool(ok)))
        .orderBy("prio")
    )


@register(
    "q164_ctas_from_change_feed",
    tags=("lake", "sql-front-door", "change-feed", "cdf", "ctas"),
    oracle="""
WITH upd AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 7 = 0
),
del AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders WHERE o_orderkey % 7 = 1
),
feed AS (
  SELECT 2 AS cv, 'delete' AS ct, p FROM upd
  UNION ALL
  SELECT 2 AS cv, 'insert' AS ct, CAST(p + 2.50 AS DECIMAL(18,2)) FROM upd
  UNION ALL
  SELECT 3 AS cv, 'delete' AS ct, p FROM del
)
SELECT CAST(cv AS BIGINT) AS commit_version,
       ct AS change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS DOUBLE) AS total_price
FROM feed
GROUP BY cv, ct
ORDER BY commit_version, change_type
""",
)
def q164_ctas_from_change_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FEED -> TABLE materialization end-to-end (VERDICT r8 #6): the
    CDC-to-table idiom `CREATE TABLE mat ... AS SELECT ... FROM
    table_changes('t', v)` as ONE front-door statement. Orders
    snapshot -> t (v1); UPDATE (+2.50 on keys %7==0) commits v2 and
    DELETE (keys %7==1) commits v3 — both materialize change files at
    commit time, so the CTAS's SELECT scans exactly the changed rows,
    never a snapshot diff; the result becomes version 1 of a NEW
    versioned table that later statements read like any other. The
    returned aggregate is computed FROM THE MATERIALIZED TABLE through
    the same front door — proving the persisted feed, not the feed
    itself — and the oracle recomputes it from raw orders."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ctasfeed_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, os.path.join(base, "t"), orders)
    tables = {"t": t}
    assert (
        execute_sql(
            spark,
            "UPDATE t SET price = CAST(price + 2.50 AS DECIMAL(18,2)) "
            "WHERE k % 7 = 0",
            tables,
        )
        == 2
    )
    assert execute_sql(spark, "DELETE FROM t WHERE k % 7 = 1", tables) == 3
    mat_loc = os.path.join(base, "mat")
    v = execute_sql(
        spark,
        f"CREATE TABLE mat USING VERSIONED LOCATION '{mat_loc}' AS "
        "SELECT k, price, _change_type AS change_type, "
        "_commit_version AS commit_version "
        "FROM table_changes('t', 1)",
        tables,
    )
    assert v == 1 and isinstance(tables["mat"], VersionedTable)
    return execute_select(
        spark,
        "SELECT commit_version, change_type, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(price) AS DOUBLE) AS total_price "
        "FROM mat "
        "GROUP BY commit_version, change_type "
        "ORDER BY commit_version, change_type",
        tables,
    )


@register(
    "q165_add_column_default",
    tags=("lake", "schema-evolution", "column-defaults", "sql-front-door"),
    oracle="""
WITH old AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         'unassigned' AS region
  FROM orders
),
new AS (
  SELECT o_orderkey + 1000000000 AS k,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CASE WHEN o_orderkey % 2 = 0 THEN 'emea' ELSE 'apac' END AS region
  FROM orders WHERE o_orderkey % 10 = 3
),
allrows AS (SELECT * FROM old UNION ALL SELECT * FROM new)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price
FROM allrows
GROUP BY region
ORDER BY region
""",
)
def q165_add_column_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFAULT values on ADD COLUMN (VERDICT r8 #7, Iceberg v3
    initial-default shape) end-to-end through the SQL front door:
    orders snapshot -> t (v1); `ALTER TABLE t ADD COLUMN region STRING
    DEFAULT 'unassigned'` commits v2 METADATA-ONLY (no data read or
    written — the default is recorded with an entry scope, exactly the
    deferred-delete scoping rule); an INSERT-shaped append commits v3
    with explicit regions. The final aggregate groups the WHOLE table
    by region: pre-add rows read the default (their files physically
    lack the column), appended rows read their stored values — the
    precedence the engine pins in tests/test_default_columns.py. The
    oracle recomputes both populations from raw orders."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_coldef_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders)
    tables = {"t": t}
    v = execute_sql(
        spark,
        "ALTER TABLE t ADD COLUMN region STRING DEFAULT 'unassigned'",
        tables,
    )
    assert v == 2
    fresh = (
        env.t("orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select(
            (F.col("o_orderkey") + 1000000000).alias("k"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.when(F.col("o_orderkey") % 2 == 0, "emea")
            .otherwise("apac")
            .alias("region"),
        )
    )
    t.append(fresh)
    return execute_select(
        spark,
        "SELECT region, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(price) AS DOUBLE) AS total_price "
        "FROM t GROUP BY region ORDER BY region",
        tables,
    )


@register(
    "q167_write_default_fill",
    tags=("lake", "schema-evolution", "column-defaults", "sql-front-door"),
    oracle="""
WITH old AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         'legacy' AS region
  FROM orders
),
fresh AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         'fresh' AS region
  FROM orders WHERE o_orderkey % 10 = 3
),
allrows AS (SELECT * FROM old UNION ALL SELECT * FROM fresh)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price) AS DOUBLE) AS total_price
FROM allrows
GROUP BY region
ORDER BY region
""",
)
def q167_write_default_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE defaults end-to-end (the Delta `ALTER COLUMN ... SET
    DEFAULT` shape, orthogonal to q165's INITIAL default): orders -> t
    (v1); `ALTER TABLE t ADD COLUMN region STRING DEFAULT 'legacy'`
    (v2 — initial default backfills history at read); `ALTER TABLE t
    ALTER COLUMN region SET DEFAULT 'fresh'` (v3 — write default for
    future omitting writes); an append that OMITS region entirely
    (v4) stores 'fresh' as real file bytes — no merge_schema, no
    read-side machinery for the new rows. The final aggregate groups
    the whole table by region: pre-add rows read the initial default,
    the omitting append's rows carry the stored write default — the
    two defaults coexist on one column with different literals. The
    oracle recomputes both populations from raw orders."""
    from datalakeingestionservice_spark.sinks.sql_dml import (
        execute_select,
        execute_sql,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_wdef_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    orders = env.t("orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = VersionedTable.create(spark, base, orders)
    tables = {"t": t}
    assert (
        execute_sql(
            spark,
            "ALTER TABLE t ADD COLUMN region STRING DEFAULT 'legacy'",
            tables,
        )
        == 2
    )
    assert (
        execute_sql(
            spark,
            "ALTER TABLE t ALTER COLUMN region SET DEFAULT 'fresh'",
            tables,
        )
        == 3
    )
    fresh = (
        env.t("orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select(
            (F.col("o_orderkey") + 1000000000).alias("k"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    t.append(fresh)  # omits region -> the write default fills it
    return execute_select(
        spark,
        "SELECT region, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(price) AS DOUBLE) AS total_price "
        "FROM t GROUP BY region ORDER BY region",
        tables,
    )


# ---------------------------------------------------------------------------
# q171 — the curation loop at the LAKE surface (VERDICT r9 #5): exact-
# substring scrub -> df.write.format("versioned") OVERWRITE of the corpus
# table -> table_changes TVF serves the row-level delta. q163 proves the
# scrub against DuckDB; this proves it COMPOSES with the lake half of the
# engine: the corpus is read back through the sessionless DataSource, the
# scrubbed corpus lands in place through the sessionless Arrow writer, and
# the change feed serves exactly the rows the scrub touched (unchanged
# docs cancel in the snapshot diff) through the SQL front door. The oracle
# recomputes the scrub from raw documents and reconstructs both sides of
# the delta.
# ---------------------------------------------------------------------------
_Q171_L = 20


@register(
    "q171_scrub_to_lake_change_feed",
    tags=("lake", "dedup", "exact-substring", "cdf", "curation"),
    oracle=f"""
WITH words AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, u.i AS pos,
         array_to_string(w[u.i:u.i + {_Q171_L - 1}], ' ') AS g
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w) - {_Q171_L - 1})) AS i
  ) u
  WHERE len(w) >= {_Q171_L}
),
dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
cover AS (
  SELECT DISTINCT doc_id, h.pos + v.o AS p
  FROM hits h
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(0, {_Q171_L - 1})) AS o
  ) v
),
toks AS (
  SELECT doc_id, u.i AS p, w[u.i] AS tok
  FROM words
  CROSS JOIN LATERAL (
    SELECT unnest(generate_series(1, len(w))) AS i
  ) u
),
kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM toks t ANTI JOIN cover c ON t.doc_id = c.doc_id AND t.p = c.p
),
rebuilt AS (
  SELECT w.doc_id, w.text,
         coalesce(a.clean_text, '') AS clean_text
  FROM words w
  LEFT JOIN (
    SELECT doc_id,
           array_to_string(list(tok ORDER BY p), ' ') AS clean_text
    FROM kept GROUP BY doc_id
  ) a USING (doc_id)
),
changed AS (SELECT * FROM rebuilt WHERE clean_text <> text),
delta AS (
  SELECT doc_id, text, 'delete' AS change_type FROM changed
  UNION ALL
  SELECT doc_id, clean_text AS text, 'insert' AS change_type FROM changed
)
SELECT change_type,
       CAST(2 AS BIGINT) AS commit_version,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM delta
GROUP BY change_type
ORDER BY change_type
""",
)
def q171_scrub_to_lake_change_feed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The in-place corpus curation loop THROUGH the lake: documents
    land in a versioned table (v1), the corpus is read back through the
    sessionless DataSource, `exact_substring_scrub` (L=20) rebuilds
    every document, and the scrubbed corpus OVERWRITES the table via
    `df.write.format("versioned")` (v2, the sessionless Arrow writer).
    `table_changes('corpus', 1)` then serves v2's ROW-LEVEL delta
    through the SQL front door — unchanged documents cancel in the
    snapshot diff, so downstream consumers stream exactly the docs the
    scrub touched: the old text as 'delete', the cleaned text as
    'insert'. This is the dedup family composing with the lake half of
    the engine, not just with DuckDB."""
    from datalakeingestionservice_spark.operators.dedup import (
        exact_substring_scrub,
    )
    from datalakeingestionservice_spark.sinks.sql_dml import execute_select
    from datalakeingestionservice_spark.sources.versioned_batch import (
        register as register_source,
    )

    register_source(spark)
    base = os.path.join(
        tempfile.gettempdir(), f"dlis_scrublake_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    docs = env.t("documents").select("doc_id", "text")
    root = os.path.join(base, "corpus")
    VersionedTable.create(spark, root, docs)
    corpus = (
        spark.read.format("versioned")
        .option("table_root", root)
        .load()
    )
    scrubbed = exact_substring_scrub(corpus, min_len=_Q171_L).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    (
        scrubbed.write.format("versioned")
        .mode("overwrite")
        .option("table_root", root)
        .save()
    )
    tables = {"corpus": VersionedTable(spark, root)}
    return execute_select(
        spark,
        "SELECT _change_type AS change_type, "
        "CAST(_commit_version AS BIGINT) AS commit_version, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(length(text)) AS BIGINT) AS total_chars, "
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc "
        "FROM table_changes('corpus', 1) "
        "GROUP BY change_type, commit_version "
        "ORDER BY change_type",
        tables,
    )


# ---------------------------------------------------------------------------
# q175 — incrementally-maintained JOIN view (E102): orders ⋈ customer kept
# fresh from BOTH change feeds via the Gupta–Mumick join delta rules
# (ΔJ = ΔL⋈R_old ∪ L_new⋈ΔR as signed multisets) — never a view rescan,
# never |L|×|R|. The oracle recomputes the final join from raw tables with
# the same mutations applied, so the whole maintenance algebra (two delta
# terms, full-row netting, pk-pair merge apply) sits behind a value check.
# ---------------------------------------------------------------------------
@register(
    "q175_incremental_join_view",
    tags=("lake", "incremental-view", "join", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
  UNION ALL
  SELECT k + 1000000000 AS k, ck, 1.0 AS price FROM l0 WHERE k % 10 = 2
),
r0 AS (SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer),
r1 AS (
  SELECT ck, CASE WHEN ck % 7 = 0 THEN 'MOVED' ELSE seg END AS seg
  FROM r0 WHERE ck % 11 <> 3
),
j AS (SELECT l1.k, l1.ck, l1.price, r1.seg FROM l1 JOIN r1 USING (ck))
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price,
       min(k) AS min_k, max(k) AS max_k
FROM j GROUP BY seg ORDER BY seg
""",
)
def q175_incremental_join_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders ⋈ customer as an incrementally-maintained materialized
    view: materialize once, mutate BOTH sides (left update + delete +
    insert; right payload update + customer delete — which must drop
    every join row of that customer), then ONE incremental refresh
    applies the two signed delta terms through a single pk-pair merge.
    The returned per-segment aggregate reads from the VIEW STATE table,
    so the value check covers the maintenance algebra, not a recompute."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_joinview_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    view = IncrementalJoinView(
        spark,
        l.root,
        r.root,
        os.path.join(base, "v"),
        on=["ck"],
        left_pk="k",
        right_pk="ck",
    )
    assert view.refresh() == (1, 1)  # initial materialize

    inserts = l.read(1).filter(F.col("k") % 10 == 2).select(
        (F.col("k") + 1_000_000_000).alias("k"),
        "ck",
        F.lit(1.0).alias("price"),
    )
    l.update_where(F.col("k") % 10 == 0, {"price": F.col("price") + 5})
    l.delete_where(F.col("k") % 10 == 1)
    l.append(inserts)
    r.update_where(F.col("ck") % 7 == 0, {"seg": F.lit("MOVED")})
    r.delete_where(F.col("ck") % 11 == 3)
    marks = view.refresh()  # ONE incremental refresh over both feeds
    assert marks == (4, 3), marks
    assert view.refresh() is None  # idempotent

    return (
        view.read()
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q176 — incrementally-maintained LEFT OUTER join view (E105): the outer
# extension of q175 — unmatched orders ride null-padded, and the padded set
# TRANSITIONS as deltas land (deleting a customer pads all its orders;
# inserting an order with an unknown customer pads it immediately). The
# oracle recomputes the mutated LEFT JOIN from raw tables.
# ---------------------------------------------------------------------------
@register(
    "q176_incremental_left_join_view",
    tags=("lake", "incremental-view", "join", "outer", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck, price FROM l0 WHERE k % 10 <> 1
  UNION ALL
  SELECT k + 2000000000 AS k, -1 AS ck, 0.5 AS price
  FROM l0 WHERE k % 10 = 3
),
r0 AS (SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer),
r1 AS (SELECT ck, seg FROM r0 WHERE ck % 11 <> 3),
j AS (
  SELECT l1.k, l1.ck, l1.price, r1.seg
  FROM l1 LEFT JOIN r1 ON l1.ck = r1.ck
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price,
       min(k) AS min_k, max(k) AS max_k
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q176_incremental_left_join_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders LEFT OUTER customer as an incrementally-maintained view:
    materialize, then delete orders (k%10=1), insert orders pointing at
    a NONEXISTENT customer (padded immediately), and delete customers
    (ck%11=3) — padding every order they leave behind. One incremental
    refresh applies the inner delta AND both padded-set transitions;
    the aggregate reads from the view state (inner ∪ null-extended
    padded)."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalLeftJoinView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ljview_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    view = IncrementalLeftJoinView(
        spark, l.root, r.root, os.path.join(base, "v"),
        on=["ck"], left_pk="k", right_pk="ck",
    )
    assert view.refresh() == (1, 1)

    orphans = l.read(1).filter(F.col("k") % 10 == 3).select(
        (F.col("k") + 2_000_000_000).alias("k"),
        F.lit(-1).cast("long").alias("ck"),
        F.lit(0.5).alias("price"),
    )
    l.delete_where(F.col("k") % 10 == 1)
    l.append(orphans)
    r.delete_where(F.col("ck") % 11 == 3)
    marks = view.refresh()
    assert marks == (3, 2), marks
    assert view.refresh() is None

    return (
        view.read()
        .groupBy(F.coalesce(F.col("seg"), F.lit("(unmatched)")).alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("price"), 2).alias("total_price"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q177 — incrementally-maintained AGGREGATE OVER A JOIN (E106): the classic
# select-project-join-aggregate IVM composition — per-segment order totals
# (SELECT seg, count(*), sum(price) FROM orders JOIN customer GROUP BY seg)
# maintained from BOTH change feeds in one refresh, the join itself never
# materialized. Oracle recomputes the mutated join+aggregate from raw.
# ---------------------------------------------------------------------------
@register(
    "q177_incremental_join_agg_view",
    tags=("lake", "incremental-view", "join", "agg", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
),
r0 AS (SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer),
r1 AS (
  SELECT ck, CASE WHEN ck % 7 = 0 THEN 'MOVED' ELSE seg END AS seg
  FROM r0 WHERE ck % 11 <> 3
),
j AS (SELECT l1.k, l1.price, r1.seg FROM l1 JOIN r1 USING (ck))
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price
FROM j GROUP BY seg ORDER BY seg
""",
)
def q177_incremental_join_agg_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-segment totals over orders ⋈ customer as ONE incrementally-
    maintained view: the netted join delta feeds the signed counting
    aggregate directly (never materializing the join), groups empty
    out and reappear as mutations land, and the returned result reads
    FROM THE GROUP-STATE TABLE after one incremental refresh covering
    mutations on BOTH sides."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalJoinAggView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_jaggview_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    view = IncrementalJoinAggView(
        spark, l.root, r.root, os.path.join(base, "v"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"], sums={"total_price": "price"},
    )
    assert view.refresh() == (1, 1)

    l.update_where(F.col("k") % 10 == 0, {"price": F.col("price") + 5})
    l.delete_where(F.col("k") % 10 == 1)
    r.update_where(F.col("ck") % 7 == 0, {"seg": F.lit("MOVED")})
    r.delete_where(F.col("ck") % 11 == 3)
    assert view.refresh() == (3, 3)
    assert view.refresh() is None

    return (
        view.read()
        .select(
            "seg",
            F.col("_n").alias("n_rows"),
            F.round(F.col("total_price"), 2).alias("total_price"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q178 — incrementally-maintained FULL OUTER join view (E107): both padded
# sets live — customers whose orders all vanish become right-padded rows,
# orphan orders (unknown customer) ride left-padded — and both transition
# from the change feeds. Oracle recomputes the mutated FULL JOIN from raw.
# ---------------------------------------------------------------------------
@register(
    "q178_incremental_full_join_view",
    tags=("lake", "incremental-view", "join", "outer", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck, price FROM l0 WHERE ck % 5 <> 2
  UNION ALL
  SELECT k + 2000000000 AS k, -1 AS ck, 0.5 AS price
  FROM l0 WHERE k % 10 = 3
),
r0 AS (SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer),
r1 AS (SELECT ck, seg FROM r0 WHERE ck % 11 <> 3),
j AS (
  SELECT l1.k, l1.price, r1.seg
  FROM l1 FULL JOIN r1 ON l1.ck = r1.ck
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(k) AS BIGINT) AS n_orders,
       round(coalesce(sum(price), 0.0), 2) AS total_price
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q178_incremental_full_join_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders FULL OUTER customer, incrementally maintained: deleting
    EVERY order of ck%5=2 customers re-pads those customers on the
    right; inserting orders pointing at a nonexistent customer pads
    them on the left; deleting ck%11=3 customers pads their surviving
    orders. One incremental refresh applies the inner delta plus BOTH
    padded-set transitions; the aggregate reads the three-table view
    state (n_orders counts only real order rows — right-padded rows
    carry NULL keys, exactly like the recompute)."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalFullJoinView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_fjview_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    view = IncrementalFullJoinView(
        spark, l.root, r.root, os.path.join(base, "v"),
        on=["ck"], left_pk="k", right_pk="ck",
    )
    assert view.refresh() == (1, 1)

    orphans = l.read(1).filter(F.col("k") % 10 == 3).select(
        (F.col("k") + 2_000_000_000).alias("k"),
        F.lit(-1).cast("long").alias("ck"),
        F.lit(0.5).alias("price"),
    )
    l.delete_where(F.col("ck") % 5 == 2)
    l.append(orphans)
    r.delete_where(F.col("ck") % 11 == 3)
    marks = view.refresh()
    assert marks == (3, 2), marks
    assert view.refresh() is None

    return (
        view.read()
        .groupBy(
            F.coalesce(F.col("seg"), F.lit("(unmatched)")).alias("seg")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k").alias("n_orders"),
            F.round(F.coalesce(F.sum("price"), F.lit(0.0)), 2).alias(
                "total_price"
            ),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q180 — AGGREGATE OVER A LEFT OUTER JOIN, incrementally maintained (E109):
# the last rung of the IVM ladder — per-segment totals over
# orders LEFT OUTER customer where padded-set TRANSITIONS change a group's
# contribution (a customer delete moves its orders into the NULL-segment
# group; a customer insert moves them back out). The group state consumes
# the outer view's own state-table change feeds, so pad/unpad arrives as
# natural CDC delete+insert pairs. Oracle recomputes the mutated
# outer-join aggregate from raw tables.
# ---------------------------------------------------------------------------
@register(
    "q180_incremental_left_join_agg_view",
    tags=("lake", "incremental-view", "join", "outer", "agg", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck, price FROM l0 WHERE k % 10 <> 1
  UNION ALL
  SELECT k + 2000000000 AS k, -1 AS ck, 0.5 AS price
  FROM l0 WHERE k % 10 = 3
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg,
         CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer WHERE c_custkey % 11 <> 3
),
j AS (
  SELECT l1.price, r1.seg, r1.bal
  FROM l1 LEFT JOIN r1 ON l1.ck = r1.ck
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price,
       round(sum(bal), 2) AS total_bal
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q180_incremental_left_join_agg_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-segment count/sum over orders LEFT OUTER customer as ONE
    incrementally-maintained group state. The customer table starts
    MISSING every ck%13=5 customer (their orders born padded into the
    NULL group); mutations then pad AND unpad: delete orders, insert
    orphan orders (padded immediately), re-insert the ck%13=5
    customers (their orders UNPAD — the NULL group shrinks), delete
    ck%11=3 customers (their orders pad). One refresh drains all of
    it; the result reads FROM THE GROUP-STATE TABLE. total_bal sums a
    RIGHT column, so the padded-only group renders SQL NULL exactly
    like the recompute."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalLeftJoinAggView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ljagg_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    cust = env.t("customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        cust.filter(F.col("ck") % 13 != 5),
    )
    view = IncrementalLeftJoinAggView(
        spark, l.root, r.root, os.path.join(base, "v"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"],
        sums={"total_price": "price", "total_bal": "bal"},
    )
    assert view.refresh() == (1, 1)

    orphans = l.read(1).filter(F.col("k") % 10 == 3).select(
        (F.col("k") + 2_000_000_000).alias("k"),
        F.lit(-1).cast("long").alias("ck"),
        F.lit(0.5).alias("price"),
    )
    l.delete_where(F.col("k") % 10 == 1)
    l.append(orphans)
    r.append(cust.filter(F.col("ck") % 13 == 5))  # UNPAD their orders
    r.delete_where(F.col("ck") % 11 == 3)  # pad their orders
    marks = view.refresh()
    assert marks == (3, 3), marks
    assert view.refresh() is None

    return (
        view.read()
        .select(
            F.coalesce(F.col("seg"), F.lit("(unmatched)")).alias("seg"),
            F.col("_n").alias("n_rows"),
            F.round(F.col("total_price"), 2).alias("total_price"),
            F.round(F.col("total_bal"), 2).alias("total_bal"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q181 — AGGREGATE OVER A FULL OUTER JOIN, incrementally maintained (E109):
# both sides' pad/unpad transitions flow into the group state — customers
# whose orders all vanish keep their group alive as right-padded rows
# (count rises, order sums go NULL), orphan orders ride the NULL-segment
# group. Oracle recomputes the mutated FULL JOIN aggregate from raw.
# ---------------------------------------------------------------------------
@register(
    "q181_incremental_full_join_agg_view",
    tags=("lake", "incremental-view", "join", "outer", "agg", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck, price FROM l0 WHERE ck % 5 <> 2
  UNION ALL
  SELECT k + 2000000000 AS k, -1 AS ck, 0.5 AS price
  FROM l0 WHERE k % 10 = 3
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg,
         CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer WHERE c_custkey % 11 <> 3
),
j AS (
  SELECT l1.k, l1.price, r1.seg, r1.bal
  FROM l1 FULL JOIN r1 ON l1.ck = r1.ck
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(k) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total_price,
       round(sum(bal), 2) AS total_bal
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q181_incremental_full_join_agg_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-segment count/sum over orders FULL OUTER customer from all
    three state-table feeds. Deleting EVERY order of ck%5=2 customers
    re-pads those customers on the right (their groups keep counting
    them, order sums excluded); orphan orders pad left into the NULL
    group; the ck%13=5 customers arrive mid-stream and unpad their
    orders. n_orders counts only real order rows (a sum over
    `k IS NOT NULL`), exactly like the recompute's count(k)."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalFullJoinAggView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_fjagg_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    cust = env.t("customer").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    l = VersionedTable.create(
        spark,
        os.path.join(base, "l"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "r"),
        cust.filter(F.col("ck") % 13 != 5),
    )
    view = IncrementalFullJoinAggView(
        spark, l.root, r.root, os.path.join(base, "v"),
        on=["ck"], left_pk="k", right_pk="ck",
        group_keys=["seg"],
        sums={
            "total_price": "price",
            "total_bal": "bal",
            "n_orders": "CAST((k IS NOT NULL) AS INT)",
        },
    )
    assert view.refresh() == (1, 1)

    orphans = l.read(1).filter(F.col("k") % 10 == 3).select(
        (F.col("k") + 2_000_000_000).alias("k"),
        F.lit(-1).cast("long").alias("ck"),
        F.lit(0.5).alias("price"),
    )
    l.delete_where(F.col("ck") % 5 == 2)  # re-pads those customers
    l.append(orphans)
    r.append(cust.filter(F.col("ck") % 13 == 5))
    r.delete_where(F.col("ck") % 11 == 3)
    marks = view.refresh()
    assert marks == (3, 3), marks
    assert view.refresh() is None

    return (
        view.read()
        .select(
            F.coalesce(F.col("seg"), F.lit("(unmatched)")).alias("seg"),
            F.col("_n").alias("n_rows"),
            F.coalesce(F.col("n_orders"), F.lit(0))
            .cast("bigint")
            .alias("n_orders"),
            F.round(F.col("total_price"), 2).alias("total_price"),
            F.round(F.col("total_bal"), 2).alias("total_bal"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q183 — MATERIALIZED VIEW statements (E111): the IVM family behind the SQL
# front door — CREATE MATERIALIZED VIEW parses a restricted SELECT onto the
# incremental-view classes, DML mutates the SOURCES through the same front
# door, REFRESH runs one incremental maintenance pass, and the final SELECT
# reads the maintained state by name. Oracle recomputes the mutated
# outer-join aggregate from raw tables.
# ---------------------------------------------------------------------------
@register(
    "q183_materialized_view_sql",
    tags=("lake", "sql", "incremental-view", "matview", "outer", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 11 <> 3
),
j AS (
  SELECT l1.price, r1.seg FROM l1 LEFT JOIN r1 ON l1.ck = r1.ck
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q183_materialized_view_sql(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The whole materialized-view statement loop at the front door:
    CREATE MATERIALIZED VIEW (left-outer join aggregate — the E109
    class behind SQL text), three DML statements on the sources
    (update prices, delete orders, delete customers — padding their
    surviving orders into the NULL group), REFRESH MATERIALIZED VIEW
    (one incremental pass over both change feeds), and a SELECT that
    reads the maintained group state BY NAME through the same door."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_mv_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_totals LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n_rows, SUM(price) AS total_price "
        "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 11 = 3", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW seg_totals", tables)
    return execute_sql(
        spark,
        "SELECT coalesce(seg, '(unmatched)') AS seg, n_rows, "
        "round(total_price, 2) AS total_price "
        "FROM seg_totals ORDER BY seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q184 — FILTERED materialized view (E112): WHERE composes with the IVM
# delta algebra where selection commutes — the view is the aggregate of
# σ_pred(source), maintenance filters the snapshot, the change feed, and
# the endangered min/max rescans with the SAME predicate. The mutation set
# makes rows CROSS the predicate boundary via UPDATE (entering/leaving the
# view without an insert/delete) and deletes AT a filtered extreme (an
# unfiltered rescan would resurrect a sub-threshold value). Oracle
# recomputes filter-then-aggregate from raw.
# ---------------------------------------------------------------------------
@register(
    "q184_filtered_materialized_view",
    tags=("lake", "sql", "incremental-view", "matview", "filter", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price * 0.001
              WHEN k % 10 = 5 THEN price + 100000
              ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
)
SELECT ck,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total_price,
       round(max(price), 2) AS max_price
FROM l1 WHERE price >= 1000
GROUP BY ck
HAVING count(*) >= 3
ORDER BY ck
""",
)
def q184_filtered_materialized_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered single-table aggregate MV at the statement surface:
    CREATE ... AS SELECT ck, COUNT(*), SUM(price), MAX(price) FROM
    orders WHERE price >= 1000 GROUP BY ck — then mutations push rows
    ACROSS the 1000 boundary both ways (k%10=0 prices shrink 1000×,
    leaving the view; k%10=5 prices jump +100000, entering it and
    becoming per-group maxima) and delete k%10=1 rows (some AT the
    filtered max — the endangered rescan applies the same WHERE). The
    HAVING in the final read is plain post-filtering of the maintained
    state."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_fmv_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    tables = {"orders": l}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW big_orders LOCATION "
        f"'{os.path.join(base, 'mv')}' AS "
        "SELECT ck, COUNT(*) AS n_orders, SUM(price) AS total_price, "
        "MAX(price) AS max_price "
        "FROM orders WHERE price >= 1000 GROUP BY ck",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price * 0.001 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 100000 WHERE k % 10 = 5",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW big_orders", tables)
    return execute_sql(
        spark,
        "SELECT ck, n_orders, round(total_price, 2) AS total_price, "
        "round(max_price, 2) AS max_price "
        "FROM big_orders WHERE n_orders >= 3 ORDER BY ck",
        tables,
    )


# ---------------------------------------------------------------------------
# q185 — COUNT(DISTINCT) materialized view (E113): the textbook
# not-self-maintainable aggregate, maintained via auxiliary (keys, value)
# multiplicity state — a delete alone can't tell whether it removed the
# LAST occurrence of a value, so the side table tracks multiplicities with
# the counting algorithm and the distinct count is a read-time aggregate
# over it. The mutation set collapses distinct values via UPDATE (many
# priorities become one) and deletes occurrences both redundant and final.
# ---------------------------------------------------------------------------
@register(
    "q185_count_distinct_materialized_view",
    tags=("lake", "sql", "incremental-view", "matview", "distinct", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS prio
  FROM orders
),
l1 AS (
  SELECT k, ck, price,
         CASE WHEN k % 3 = 0 THEN '9-SAME' ELSE prio END AS prio
  FROM l0 WHERE k % 10 <> 1
)
SELECT ck,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT prio) AS BIGINT) AS n_prios,
       round(sum(price), 2) AS total_price
FROM l1 GROUP BY ck ORDER BY ck
""",
)
def q185_count_distinct_materialized_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-customer order stats with COUNT(DISTINCT priority) as ONE
    maintained view: the UPDATE collapses every k%3=0 order's priority
    to a single value (multiplicities churn — distinct counts must
    drop only when a group's last occurrence of a priority leaves),
    then deletes remove k%10=1 orders (some the final occurrence of
    their priority in the group, some redundant). One REFRESH drains
    the main state and the (ck, prio) multiplicity side state."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_cdmv_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        ),
    )
    tables = {"orders": l}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW per_cust LOCATION "
        f"'{os.path.join(base, 'mv')}' AS "
        "SELECT ck, COUNT(*) AS n_orders, "
        "COUNT(DISTINCT prio) AS n_prios, SUM(price) AS total_price "
        "FROM orders GROUP BY ck",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET prio = '9-SAME' WHERE k % 3 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW per_cust", tables)
    return execute_sql(
        spark,
        "SELECT ck, n_orders, n_prios, "
        "round(total_price, 2) AS total_price "
        "FROM per_cust ORDER BY ck",
        tables,
    )


# ---------------------------------------------------------------------------
# q186 — AVG / STDDEV / VARIANCE materialized view (E114): the moment
# aggregates maintained through their sufficient statistics (Σx, Σx²,
# non-null count ride the sum machinery; the ratio renders at read time,
# NULL below minimum support). Oracle recomputes avg/stddev_samp/var_samp
# from the mutated raw table; outputs round to 2dp, well inside the
# sufficient-statistics FP envelope at these scales.
# ---------------------------------------------------------------------------
@register(
    "q186_moment_aggregates_materialized_view",
    tags=("lake", "sql", "incremental-view", "matview", "stats", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS prio
  FROM orders
),
l1 AS (
  SELECT k, ck, prio,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
)
SELECT prio,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(price), 2) AS avg_price,
       round(stddev_samp(price), 2) AS std_price,
       round(var_samp(price) / 1000000, 4) AS var_price_m
FROM l1 GROUP BY prio ORDER BY prio
""",
)
def q186_moment_aggregates_materialized_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-priority price moments as ONE maintained view at the
    statement surface: AVG, STDDEV, and VARIANCE ride hidden Σx/Σx²
    accumulators with per-sum non-null counters (self-maintainable —
    no rescans, unlike min/max), mutations update and delete through
    the change feed, one REFRESH, read by name. Variance reported in
    millions to keep the hash comparison inside the shared FP envelope
    of the two evaluation orders."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_momv_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        ),
    )
    tables = {"orders": l}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW prio_stats LOCATION "
        f"'{os.path.join(base, 'mv')}' AS "
        "SELECT prio, COUNT(*) AS n_orders, AVG(price) AS avg_price, "
        "STDDEV(price) AS std_price, VARIANCE(price) AS var_price "
        "FROM orders GROUP BY prio",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW prio_stats", tables)
    return execute_sql(
        spark,
        "SELECT prio, n_orders, round(avg_price, 2) AS avg_price, "
        "round(std_price, 2) AS std_price, "
        "round(var_price / 1000000, 4) AS var_price_m "
        "FROM prio_stats ORDER BY prio",
        tables,
    )


# ---------------------------------------------------------------------------
# q187 — INCREMENTAL TOP-K PER GROUP (E115, the leaderboard view): min/max's
# endangered-group idea extended k-deep — state holds each group's current
# top-k rows; inserts fold in with NO source read (re-rank of stored ∪ new),
# a delete inside the stored top-k rescans THAT group only, a delete below
# the stored k-th is provably free. Oracle recomputes row_number()<=k over
# the mutated table.
# ---------------------------------------------------------------------------
@register(
    "q187_incremental_topk_view",
    tags=("lake", "incremental-view", "topk", "window", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, prio,
         CASE WHEN k % 1000 = 7 THEN price + 1000000 ELSE price END
           AS price
  FROM l0 WHERE k % 10 <> 1
  UNION ALL
  SELECT k + 3000000000 AS k, '0-INJECTED' AS prio, 9999999.0 AS price
  FROM l0 WHERE k % 5000 = 11
),
ranked AS (
  SELECT k, prio, price,
         row_number() OVER (PARTITION BY prio
                            ORDER BY price DESC, k) AS rk
  FROM l1
)
SELECT prio, rk, k, round(price, 2) AS price
FROM ranked WHERE rk <= 5 ORDER BY prio, rk
""",
)
def q187_incremental_topk_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-5 priciest orders per priority as a maintained leaderboard:
    mutations hit every delta case — k%10=1 deletes remove rows both
    inside and below the stored top-5 (endangered rescans of only the
    groups whose leaders died), k%1000=7 price bumps vault rows INTO
    leaderboards through the feed's delete+insert, and a brand-new
    '0-INJECTED' priority group is born from inserts alone (fold-in,
    no rescan). Result reads the view state re-ranked for display."""
    from pyspark.sql import Window

    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalTopKView,
    )

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_topk_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    view = IncrementalTopKView(
        spark, l.root, os.path.join(base, "v"),
        keys=["prio"], order_col="price", k=5, pk="k",
    )
    assert view.refresh() == 1

    injected = l.read(1).filter(F.col("k") % 5000 == 11).select(
        (F.col("k") + 3_000_000_000).alias("k"),
        F.lit("0-INJECTED").alias("prio"),
        F.lit(9_999_999.0).alias("price"),
    )
    l.delete_where(F.col("k") % 10 == 1)
    l.update_where(
        F.col("k") % 1000 == 7, {"price": F.col("price") + 1_000_000}
    )
    l.append(injected)
    assert view.refresh() == 4
    assert view.refresh() is None

    w = Window.partitionBy("prio").orderBy(
        F.col("price").desc(), F.col("k").asc()
    )
    return (
        view.read()
        .withColumn("rk", F.row_number().over(w))
        .select("prio", "rk", "k", F.round("price", 2).alias("price"))
        .orderBy("prio", "rk")
    )


# ---------------------------------------------------------------------------
# q188 — TIME-BUCKETED ROLLUP materialized view (E116, computed group keys):
# the month bucket is an EXPRESSION key ({alias: expr}), projected onto the
# snapshot, the change feed, and the rescans alike — so a dt UPDATE that
# moves an order BETWEEN months maintains both buckets, which a plain
# column key can't express. Oracle recomputes the mutated monthly rollup.
# ---------------------------------------------------------------------------
@register(
    "q188_monthly_rollup_materialized_view",
    tags=("lake", "sql", "incremental-view", "matview", "rollup", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_orderdate AS dt,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k,
         CASE WHEN k % 97 = 3 THEN dt + INTERVAL 40 DAY ELSE dt END
           AS dt,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
)
SELECT substr(CAST(dt AS VARCHAR), 1, 7) AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS revenue,
       round(max(price), 2) AS max_price
FROM l1 GROUP BY substr(CAST(dt AS VARCHAR), 1, 7) ORDER BY month
""",
)
def q188_monthly_rollup_materialized_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly revenue rollup maintained through bucket churn: the
    k%97=3 orders shift 40 days (many cross a month boundary — their
    old bucket decrements and their new one increments through the
    feed's delete+insert pair), prices update (endangering
    month maxima — the computed-key rescan path), rows delete. One
    REFRESH, read by name, ordered by month. (No AVG in the oracle
    output: an average's true value can land exactly on a rounding
    boundary — a 12-row month at sf0.001 did — making the comparison a
    coin flip between the two engines' FP orders; sums and extremes of
    2-decimal prices cannot hit boundaries.)"""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_roll_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").alias("dt"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    tables = {"orders": l}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW monthly LOCATION "
        f"'{os.path.join(base, 'mv')}' AS "
        "SELECT substring(cast(dt as string), 1, 7) AS month, "
        "COUNT(*) AS n_orders, SUM(price) AS revenue, "
        "MAX(price) AS max_price FROM orders GROUP BY month",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET dt = date_add(dt, 40) WHERE k % 97 = 3",
        tables,
    )
    execute_sql(spark, "REFRESH MATERIALIZED VIEW monthly", tables)
    return execute_sql(
        spark,
        "SELECT month, n_orders, round(revenue, 2) AS revenue, "
        "round(max_price, 2) AS max_price "
        "FROM monthly ORDER BY month",
        tables,
    )


# ---------------------------------------------------------------------------
# q189 — FILTERED OUTER-JOIN materialized view (E117): WHERE over a FULL
# OUTER join with SQL's WHERE-after-padding semantics, incrementally
# maintained — padded membership derives from the raw other side's join
# keys (the σ-filtered inner state can no longer witness matched-ness) and
# the predicate applies to the null-padded render: an unmatched order
# survives only if price passes, an order-less customer only if seg does.
# The aggregate composes over the filtered outer view's state CDC.
# ---------------------------------------------------------------------------
@register(
    "q189_filtered_outer_matview",
    tags=("lake", "sql", "incremental-view", "matview", "outer",
          "filter", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price * 0.001
              WHEN k % 10 = 5 THEN price + 500000
              ELSE price END AS price
  FROM l0 WHERE k % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 7 <> 2
),
j AS (
  SELECT l1.price, r1.seg
  FROM l1 FULL JOIN r1 ON l1.ck = r1.ck
  WHERE l1.price >= 2000 OR r1.seg = 'BUILDING'
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total_price
FROM j GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q189_filtered_outer_matview(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered FULL OUTER join aggregate MV at the statement surface:
    CREATE ... AS SELECT seg, COUNT(*), SUM(price) FROM orders FULL
    JOIN customer USING (ck) WHERE price >= 2000 OR seg = 'BUILDING'
    GROUP BY seg. Mutations cross the boundary both ways while padded
    and matched (k%10=0 prices shrink 1000x — their padded rows leave
    unless the seg arm holds; k%10=5 jump +500000), delete orders
    (customers becoming right-padded survive only via seg='BUILDING')
    and delete customers (their orders pad into the NULL group only if
    price passes). One REFRESH drains both feeds; the SELECT reads the
    maintained group state by name."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_fomv_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_filtered LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n_rows, SUM(price) AS total_price "
        "FROM orders FULL JOIN customer USING (ck) "
        "WHERE price >= 2000 OR seg = 'BUILDING' GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price * 0.001 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 500000 WHERE k % 10 = 5",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 7 = 2", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_filtered", tables
    )
    return execute_sql(
        spark,
        "SELECT coalesce(seg, '(unmatched)') AS seg, n_rows, "
        "round(total_price, 2) AS total_price "
        "FROM seg_filtered ORDER BY seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q190 — MV-over-MV CASCADE (E118): the aggregate MV's FROM names the join
# MV directly (its state table resolves as the source; the dependency
# persists in _mv.json), and ONE `REFRESH MATERIALIZED VIEW ... CASCADE`
# statement drains base tables → join view → aggregate view in topo order.
# This is how MIN/MAX over a join become incrementally maintainable: the
# endangered-extreme rescan reads the join MV's state table, never the raw
# sources. Oracle recomputes the mutated join + extremes from raw.
# ---------------------------------------------------------------------------
@register(
    "q190_mv_cascade",
    tags=("lake", "sql", "incremental-view", "matview", "cascade", "cdf"),
    oracle="""
WITH l1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice AS DOUBLE) + 5
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders WHERE o_orderkey % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 11 <> 3
)
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total_price,
       round(min(price), 2) AS lo,
       round(max(price), 2) AS hi
FROM l1 JOIN r1 ON l1.ck = r1.ck
GROUP BY seg ORDER BY seg
""",
)
def q190_mv_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MV dependency chain end-to-end at the front door: CREATE a
    SELECT * inner-join MV, CREATE an aggregate MV whose FROM names it
    (COUNT/SUM/MIN/MAX — extremes over a join, maintainable only
    through the chain), mutate BOTH base tables (updates at group
    extremes, deletes of ~10% of orders including per-segment minima,
    customer deletions that evict their orders from the join), then
    ONE REFRESH ... CASCADE and a SELECT of the maintained state."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_casc_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW oj LOCATION "
        f"'{os.path.join(base, 'join_mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT * FROM orders JOIN customer USING (ck)",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_stats LOCATION "
        f"'{os.path.join(base, 'agg_mv')}' AS "
        "SELECT seg, COUNT(*) AS n_orders, SUM(price) AS total_price, "
        "MIN(price) AS lo, MAX(price) AS hi FROM oj GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 11 = 3", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_stats CASCADE", tables
    )
    return execute_sql(
        spark,
        "SELECT seg, n_orders, round(total_price, 2) AS total_price, "
        "round(lo, 2) AS lo, round(hi, 2) AS hi "
        "FROM seg_stats ORDER BY seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q192 — computed group keys over a JOIN aggregate view (E120): the
# time-bucketed-rollup shape over CDC-joined tables — GROUP BY a key
# EXPRESSION (month bucket over the left side) plus a plain right-side key,
# over a LEFT OUTER join, maintained incrementally. The key expression
# projects onto the bootstrap join, every netted delta, and every padded
# render before grouping: bucket-crossing date updates maintain both
# buckets, and customer deletions pad their orders into the NULL-seg group.
# Oracle recomputes the mutated outer join + bucketed rollup from raw.
# ---------------------------------------------------------------------------
@register(
    "q192_monthly_rollup_over_join",
    tags=("lake", "sql", "incremental-view", "matview", "outer",
          "computed-keys", "cdf"),
    oracle="""
WITH l1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CASE WHEN o_orderkey % 97 = 3
              THEN o_orderdate + INTERVAL 40 DAY
              ELSE o_orderdate END AS dt,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice AS DOUBLE) + 5
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders WHERE o_orderkey % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 11 <> 3
)
SELECT substr(CAST(dt AS VARCHAR), 1, 7) AS month,
       coalesce(seg, '(none)') AS seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS revenue
FROM l1 LEFT JOIN r1 ON l1.ck = r1.ck
GROUP BY substr(CAST(dt AS VARCHAR), 1, 7), coalesce(seg, '(none)')
ORDER BY month, seg
""",
)
def q192_monthly_rollup_over_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly revenue rollup per market segment over orders LEFT JOIN
    customer, maintained as ONE materialized view with a computed month
    key: CREATE ... AS SELECT substring(cast(dt as string), 1, 7) AS
    month, seg, COUNT(*), SUM(price) FROM orders LEFT JOIN customer
    USING (ck) GROUP BY month, seg. Mutations shift ~1% of order dates
    across month boundaries (both buckets maintained), bump prices,
    delete orders, and delete customers (their surviving orders pad
    into the NULL-seg group). One REFRESH drains both feeds."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_rollup_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_orderdate").alias("dt"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW monthly_seg LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT substring(cast(dt as string), 1, 7) AS month, seg, "
        "COUNT(*) AS n_orders, SUM(price) AS revenue "
        "FROM orders LEFT JOIN customer USING (ck) "
        "GROUP BY month, seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET dt = date_add(dt, 40) WHERE k % 97 = 3",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 11 = 3", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW monthly_seg", tables
    )
    return execute_sql(
        spark,
        "SELECT month, coalesce(seg, '(none)') AS seg, n_orders, "
        "round(revenue, 2) AS revenue "
        "FROM monthly_seg ORDER BY month, seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q193 — extremes + distinct counts over a JOIN in ONE statement (E121):
# the grammar's last refusal family removed — MIN/MAX/COUNT(DISTINCT) over
# an inner join auto-compose (IncrementalComposedJoinAggView): the join
# materializes under the view root, the aggregate view consumes its state
# feed, endangered-extreme rescans and multiplicity side state read the
# join STATE table, never the raw sources. DML hits per-group extremes and
# collapses distinct priorities; oracle recomputes from mutated raw.
# ---------------------------------------------------------------------------
@register(
    "q193_composed_extremes_over_join",
    tags=("lake", "sql", "incremental-view", "matview", "composed", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS pri
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price,
         CASE WHEN k % 5 = 0 THEN '1-URGENT' ELSE pri END AS pri
  FROM l0 WHERE k % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 11 <> 3
)
SELECT seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total_price,
       round(min(price), 2) AS lo,
       round(max(price), 2) AS hi,
       CAST(count(DISTINCT pri) AS BIGINT) AS n_priorities
FROM l1 JOIN r1 ON l1.ck = r1.ck
GROUP BY seg ORDER BY seg
""",
)
def q193_composed_extremes_over_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MIN/MAX/SUM/COUNT(DISTINCT) over orders JOIN customer as ONE
    materialized view — the statement the grammar used to refuse with
    composition instructions now auto-composes. Mutations: price bumps
    at per-group extremes, deletion of ~10% of orders (some AT group
    minima — the rescan reads the materialized join state), priority
    collapse (distinct count drops), customer evictions. One REFRESH
    drains base → join state → aggregate."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_comp_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("pri"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_profile LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n_orders, SUM(price) AS total_price, "
        "MIN(price) AS lo, MAX(price) AS hi, "
        "COUNT(DISTINCT pri) AS n_priorities "
        "FROM orders JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET pri = '1-URGENT' WHERE k % 5 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 11 = 3", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_profile", tables
    )
    return execute_sql(
        spark,
        "SELECT seg, n_orders, round(total_price, 2) AS total_price, "
        "round(lo, 2) AS lo, round(hi, 2) AS hi, n_priorities "
        "FROM seg_profile ORDER BY seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q197 — extremes + distinct counts over an OUTER join in ONE statement
# (E126, the rendered composition): the outer view's state tables merge
# into one RENDERED relation (__rk = the pk pair with nulls kept), and a
# null-safe aggregate view maintains MIN/MAX/COUNT(DISTINCT) over its
# change feed — padded rows group under the NULL segment key, pad/unpad
# transitions move group extremes, endangered rescans read the rendered
# rows. DML pads whole customer segments at their extremes; oracle
# recomputes the mutated LEFT JOIN + aggregate from raw.
# ---------------------------------------------------------------------------
@register(
    "q197_composed_extremes_over_outer_join",
    tags=("lake", "sql", "incremental-view", "matview", "outer",
          "composed", "cdf"),
    oracle="""
WITH l0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price,
         o_orderpriority AS pri
  FROM orders
),
l1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price,
         CASE WHEN k % 5 = 0 THEN '1-URGENT' ELSE pri END AS pri
  FROM l0 WHERE k % 10 <> 1
),
r1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 7 <> 2
)
SELECT coalesce(seg, '(unmatched)') AS seg,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(price), 2) AS lo,
       round(max(price), 2) AS hi,
       CAST(count(DISTINCT pri) AS BIGINT) AS n_priorities
FROM l1 LEFT JOIN r1 ON l1.ck = r1.ck
GROUP BY coalesce(seg, '(unmatched)') ORDER BY seg
""",
)
def q197_composed_extremes_over_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MIN/MAX/COUNT(DISTINCT) over orders LEFT JOIN customer as ONE
    materialized view — the statement form of the rendered-outer
    composition. Mutations: price bumps at per-group extremes,
    priority collapse (distinct counts drop), deletion of ~10% of
    orders (some AT group minima — rescans read the rendered outer
    relation), and deletion of 1/7 of customers (their surviving
    orders pad into the NULL group, MOVING its extremes). One REFRESH
    drains base → outer state → rendered → aggregate."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_oxt_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    l = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
            F.col("o_orderpriority").alias("pri"),
        ),
    )
    r = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": l, "customer": r}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_outer_profile LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n_orders, MIN(price) AS lo, "
        "MAX(price) AS hi, COUNT(DISTINCT pri) AS n_priorities "
        "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET pri = '1-URGENT' WHERE k % 5 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 7 = 2", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_outer_profile", tables
    )
    return execute_sql(
        spark,
        "SELECT coalesce(seg, '(unmatched)') AS seg, n_orders, "
        "round(lo, 2) AS lo, round(hi, 2) AS hi, n_priorities "
        "FROM seg_outer_profile ORDER BY seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q198 — the star-schema rollup as ONE maintained statement: a 3-table
# chained-join MATERIALIZED VIEW (fact ⋈ dim ⋈ dim), the round-12
# extension of the MV grammar. The chain compiles onto cascaded INNER
# join views — the intermediate (orders⋈customer) state table is itself
# a versioned table whose change feed the final join-agg stage consumes
# (the E118 MV-over-MV mechanism with the intermediate auto-
# materialized), so DML on ANY of the three feeds flows through as
# deltas: each stage's refresh cost is ∝ its own delta, never a rescan.
# Mutations hit all three tables, incl. a MIDDLE-table delete that must
# cascade both ways (orders lose their rollup rows; nation counts
# drop). Oracle recomputes the mutated 3-way join aggregate from raw.
# Reference parity: the sp_GetDailyTrades-style fact⋈dim⋈dim shape the
# reference delegates to its RDBMS per cron fire
# (src/Worker/Services/JobSchedulingService.cs:24-75), maintained
# incrementally instead.
# ---------------------------------------------------------------------------
@register(
    "q198_three_table_chain_matview",
    tags=("lake", "sql", "incremental-view", "matview", "chain", "cdf"),
    oracle="""
WITH o0 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
o1 AS (
  SELECT k, ck,
         CASE WHEN k % 10 = 0 THEN price + 7 ELSE price END AS price
  FROM o0 WHERE k % 10 <> 1
),
c1 AS (
  SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 13 <> 3
),
n1 AS (
  SELECT n_nationkey AS nk,
         CASE WHEN n_nationkey % 5 = 0 THEN n_name || '_R'
              ELSE n_name END AS nname
  FROM nation
)
SELECT nname, seg, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total
FROM o1 JOIN c1 USING (ck) JOIN n1 USING (nk)
GROUP BY nname, seg ORDER BY nname, seg
""",
)
def q198_three_table_chain_matview(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders ⋈ customer ⋈ nation per (nation, segment) as ONE
    CREATE MATERIALIZED VIEW statement with chained USING joins and a
    3-column PRIMARY KEY (one pk per table in FROM order). DML on all
    three feeds — order price bumps + deletions, a customer (middle
    table) deletion cascading both ways, a nation rename moving whole
    groups — then ONE REFRESH drains the cascade."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ch3_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    o = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    c = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    n = VersionedTable.create(
        spark,
        os.path.join(base, "nation"),
        env.t("nation").select(
            F.col("n_nationkey").alias("nk"),
            F.col("n_name").alias("nname"),
        ),
    )
    tables = {"orders": o, "customer": c, "nation": n}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW nation_seg_rollup LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck, nk) AS "
        "SELECT nname, seg, COUNT(*) AS n_orders, SUM(price) AS total "
        "FROM orders JOIN customer USING (ck) JOIN nation USING (nk) "
        "GROUP BY nname, seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 7 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 13 = 3", tables)
    execute_sql(
        spark,
        "UPDATE nation SET nname = concat(nname, '_R') WHERE nk % 5 = 0",
        tables,
    )
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW nation_seg_rollup", tables
    )
    return execute_sql(
        spark,
        "SELECT nname, seg, n_orders, round(total, 2) AS total "
        "FROM nation_seg_rollup ORDER BY nname, seg",
        tables,
    )


# ---------------------------------------------------------------------------
# q200 — OUTER-FINAL chained-join MV (r12, the chain surface completed):
# fact ⋈ dim1 ⟕ dim2 in ONE statement — the star shape where the last
# dim may be missing rows. The INNER prefix cascades as in q198; the
# last intermediate synthesizes a single pk (__lk, the JSON render of
# its pk tuple) so the outer padded machinery has a row identity, and
# unmatched (order, customer) rows null-pad the nation side, grouping
# under the NULL name. DML hits all three feeds incl. pad->match and
# match->pad transitions on the LAST dim; oracle recomputes the
# mutated (orders ⋈ customer) LEFT JOIN nation aggregate from raw.
# ---------------------------------------------------------------------------
@register(
    "q200_outer_final_chain_matview",
    tags=("lake", "sql", "incremental-view", "matview", "chain",
          "outer", "cdf"),
    oracle="""
WITH o1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(o_totalprice AS DOUBLE) + 3
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders WHERE o_orderkey % 10 <> 1
),
c1 AS (
  SELECT c_custkey AS ck, c_nationkey AS nk, c_mktsegment AS seg
  FROM customer
),
n1 AS (
  SELECT n_nationkey AS nk, n_name AS nname
  FROM nation WHERE n_nationkey % 5 <> 2 AND n_nationkey % 7 <> 3
)
SELECT coalesce(nname, '(no nation)') AS nname,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(price), 2) AS total
FROM o1 JOIN c1 USING (ck) LEFT JOIN n1 USING (nk)
GROUP BY coalesce(nname, '(no nation)') ORDER BY nname
""",
)
def q200_outer_final_chain_matview(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders ⋈ customer ⟕ nation per nation name, maintained: nations
    %5==2 are deleted BEFORE the view exists (their orders bootstrap
    padded), then DML bumps/deletes orders and deletes nations %7==3
    (whole groups transition match->pad into the NULL-name group), one
    REFRESH drains the cascade."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_ofc_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    o = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    c = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_nationkey").alias("nk"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    n = VersionedTable.create(
        spark,
        os.path.join(base, "nation"),
        env.t("nation").select(
            F.col("n_nationkey").alias("nk"),
            F.col("n_name").alias("nname"),
        ),
    )
    tables = {"orders": o, "customer": c, "nation": n}
    # bootstrap-time padding: some nations never exist for this view
    execute_sql(spark, "DELETE FROM nation WHERE nk % 5 = 2", tables)
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW nation_rollup LOCATION "
        f"'{os.path.join(base, 'mv')}' PRIMARY KEY (k, ck, nk) AS "
        "SELECT nname, COUNT(*) AS n_orders, SUM(price) AS total "
        "FROM orders JOIN customer USING (ck) "
        "LEFT JOIN nation USING (nk) GROUP BY nname",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 3 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 10 = 1", tables)
    execute_sql(spark, "DELETE FROM nation WHERE nk % 7 = 3", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW nation_rollup", tables
    )
    return execute_sql(
        spark,
        "SELECT coalesce(nname, '(no nation)') AS nname, n_orders, "
        "round(total, 2) AS total FROM nation_rollup ORDER BY nname",
        tables,
    )


# ---------------------------------------------------------------------------
# q204 — ROLLUP PYRAMID: an aggregate MV feeding another aggregate MV
# (r13, E130). An aggregate view's STATE table keeps hidden
# accumulators (`_n`, `_nn_*`) and applies HAVING/aliases at read, so
# it could not feed a downstream view — now its RENDERED projection
# (`rendered/` under the view root, exactly the SQL-visible rows,
# maintained from the agg state's CDC: affected groups re-rendered,
# vanished / HAVING-crossing groups merge-deleted) is a versioned
# table whose change feed the monthly view consumes like any table's.
# DML on the base flows base → daily (∝ |Δ| counting algebra) →
# rendered (∝ affected groups) → monthly (∝ |Δdaily|) under ONE
# REFRESH ... CASCADE. The daily HAVING forces a real two-level
# recompute in the oracle (monthly sums only qualifying days — a
# single GROUP BY month cannot reproduce it), and the day moved across
# months exercises a group LEAVING one rollup bucket and ENTERING
# another at both levels.
# ---------------------------------------------------------------------------
@register(
    "q204_rollup_pyramid_matview",
    tags=("lake", "sql", "incremental-view", "matview", "rollup", "cdf"),
    oracle="""
WITH o0 AS (
  SELECT o_orderkey AS k, CAST(o_orderdate AS VARCHAR) AS d,
         CAST(o_totalprice AS DOUBLE) AS price
  FROM orders
),
o1 AS (
  SELECT k,
         CASE WHEN k % 11 = 5 THEN '1995-01-15' ELSE d END AS d,
         CASE WHEN k % 10 = 0 THEN price + 5 ELSE price END AS price
  FROM o0 WHERE k % 7 <> 3
),
daily AS (
  SELECT d, count(*) AS n, sum(price) AS total
  FROM o1 GROUP BY d HAVING count(*) >= 2
)
SELECT substr(d, 1, 7) AS month,
       CAST(sum(n) AS BIGINT) AS n_orders,
       round(sum(total), 2) AS total
FROM daily GROUP BY substr(d, 1, 7) ORDER BY month
""",
)
def q204_rollup_pyramid_matview(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE daily (COUNT/SUM per day, HAVING n >= 2) -> CREATE
    monthly over DAILY (SUM of the daily aggregates per month) -> DML
    on the base (price bumps, deletes, a day moved across months) ->
    ONE REFRESH monthly CASCADE -> read the top of the pyramid."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_pyr_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    o = VersionedTable.create(
        spark,
        os.path.join(base, "ord"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderdate").cast("string").alias("d"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    tables = {"ord": o}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW daily LOCATION "
        f"'{os.path.join(base, 'daily')}' AS "
        "SELECT d, COUNT(*) AS n, SUM(price) AS total FROM ord "
        "GROUP BY d HAVING n >= 2",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW monthly LOCATION "
        f"'{os.path.join(base, 'monthly')}' AS "
        "SELECT substr(d, 1, 7) AS month, SUM(n) AS n_orders, "
        "SUM(total) AS total FROM daily GROUP BY month",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE ord SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE ord SET d = '1995-01-15' WHERE k % 11 = 5",
        tables,
    )
    execute_sql(spark, "DELETE FROM ord WHERE k % 7 = 3", tables)
    execute_sql(spark, "REFRESH MATERIALIZED VIEW monthly CASCADE", tables)
    return execute_sql(
        spark,
        "SELECT month, n_orders, round(total, 2) AS total "
        "FROM monthly ORDER BY month",
        tables,
    )


# ---------------------------------------------------------------------------
# q207 — OUTER-AGG ROLLUP PYRAMID (r13, E131 completed): an OUTER-join
# aggregate MV feeding a downstream aggregate MV. The upstream's
# rendered projection carries the padded NULL-segment group, so it
# keys by the hidden null-safe __gid and the downstream single-table
# aggregate is built null-safe (NULL groups combine instead of
# duplicating — SQL-MERGE equality never matches NULL). DML drives
# pad↔match transitions (a dim row arrives claiming previously-padded
# facts; a dim deletion pads a whole segment) through base → outer agg
# → rollup under ONE REFRESH ... CASCADE. Oracle recomputes the
# two-level aggregate over the mutated LEFT JOIN, NULL bucket included.
# ---------------------------------------------------------------------------
@register(
    "q207_outer_agg_rollup_pyramid",
    tags=("lake", "sql", "incremental-view", "matview", "rollup",
          "outer-join", "cdf"),
    oracle="""
WITH o1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE)
           + CASE WHEN o_orderkey % 10 = 0 THEN 5 ELSE 0 END AS price
  FROM orders WHERE o_orderkey % 7 <> 3
),
c1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 5 <> 2
),
seg_agg AS (
  SELECT seg, count(*) AS n, sum(price) AS total
  FROM o1 LEFT JOIN c1 USING (ck)
  GROUP BY seg
)
SELECT substr(seg, 1, 1) AS s1,
       CAST(sum(n) AS BIGINT) AS n_orders,
       round(sum(total), 2) AS total
FROM seg_agg GROUP BY substr(seg, 1, 1)
ORDER BY s1 NULLS FIRST
""",
)
def q207_outer_agg_rollup_pyramid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE seg_profile (COUNT/SUM per segment over orders LEFT JOIN
    customer — unmatched orders group under NULL) -> CREATE rollup
    over SEG_PROFILE (per first letter) -> DML on both bases (price
    bumps, order deletes, customer deletes padding whole segments) ->
    ONE REFRESH rollup CASCADE."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_oap_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    o = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    c = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": o, "customer": c}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_profile LOCATION "
        f"'{os.path.join(base, 'up')}' PRIMARY KEY (k, ck) AS "
        "SELECT seg, COUNT(*) AS n, SUM(price) AS total "
        "FROM orders LEFT JOIN customer USING (ck) GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_rollup LOCATION "
        f"'{os.path.join(base, 'down')}' AS "
        "SELECT substr(seg, 1, 1) AS s1, SUM(n) AS n_orders, "
        "SUM(total) AS total FROM seg_profile GROUP BY s1",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 5 WHERE k % 10 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 7 = 3", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 5 = 2", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_rollup CASCADE", tables
    )
    return execute_sql(
        spark,
        "SELECT s1, n_orders, round(total, 2) AS total "
        "FROM seg_rollup ORDER BY s1 NULLS FIRST",
        tables,
    )


# ---------------------------------------------------------------------------
# q208 — SELECT * OUTER VIEW AS AN MV UPSTREAM (r13; the LAST upstream
# refusal removed): a maintained LEFT-JOIN row view feeds a downstream
# aggregate through its rendered join-row projection — one versioned
# table of every visible (padded) join row keyed by the null-safe
# pk-pair __gid, maintained from the inner AND padded state tables'
# own change feeds (a pad↔match transition arrives as a padded-table
# delete + an inner-table insert naming the same gid). The downstream
# aggregate is built null-safe (padded rows group under NULL keys).
# DML drives both transition directions plus row churn; oracle
# recomputes the aggregate over the mutated LEFT JOIN.
# ---------------------------------------------------------------------------
@register(
    "q208_outer_star_view_upstream",
    tags=("lake", "sql", "incremental-view", "matview", "outer-join",
          "cdf"),
    oracle="""
WITH o1 AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(o_totalprice AS DOUBLE)
           + CASE WHEN o_orderkey % 8 = 0 THEN 3 ELSE 0 END AS price
  FROM orders WHERE o_orderkey % 11 <> 6
),
c1 AS (
  SELECT c_custkey AS ck, c_mktsegment AS seg
  FROM customer WHERE c_custkey % 4 <> 1
)
SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(price), 2) AS total
FROM o1 LEFT JOIN c1 USING (ck)
GROUP BY seg ORDER BY seg NULLS FIRST
""",
)
def q208_outer_star_view_upstream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CREATE order_rows (SELECT * FROM orders LEFT JOIN customer) ->
    CREATE seg_stats over ORDER_ROWS (COUNT/SUM per segment) -> DML on
    both bases (price bumps, order deletes, customer deletes padding
    whole segments) -> ONE REFRESH seg_stats CASCADE."""
    from datalakeingestionservice_spark.sinks.sql_dml import execute_sql

    base = os.path.join(
        tempfile.gettempdir(), f"dlis_osu_{uuid.uuid4().hex}"
    )
    env = Env(spark, sf_dir)
    o = VersionedTable.create(
        spark,
        os.path.join(base, "orders"),
        env.t("orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_totalprice").cast("double").alias("price"),
        ),
    )
    c = VersionedTable.create(
        spark,
        os.path.join(base, "customer"),
        env.t("customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("seg"),
        ),
    )
    tables = {"orders": o, "customer": c}
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW order_rows LOCATION "
        f"'{os.path.join(base, 'up')}' PRIMARY KEY (k, ck) AS "
        "SELECT * FROM orders LEFT JOIN customer USING (ck)",
        tables,
    )
    execute_sql(
        spark,
        f"CREATE MATERIALIZED VIEW seg_stats LOCATION "
        f"'{os.path.join(base, 'down')}' AS "
        "SELECT seg, COUNT(*) AS n_rows, SUM(price) AS total "
        "FROM order_rows GROUP BY seg",
        tables,
    )
    execute_sql(
        spark,
        "UPDATE orders SET price = price + 3 WHERE k % 8 = 0",
        tables,
    )
    execute_sql(spark, "DELETE FROM orders WHERE k % 11 = 6", tables)
    execute_sql(spark, "DELETE FROM customer WHERE ck % 4 = 1", tables)
    execute_sql(
        spark, "REFRESH MATERIALIZED VIEW seg_stats CASCADE", tables
    )
    return execute_sql(
        spark,
        "SELECT seg, n_rows, round(total, 2) AS total "
        "FROM seg_stats ORDER BY seg NULLS FIRST",
        tables,
    )
