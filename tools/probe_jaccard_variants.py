"""A/B probe for lossless jaccard_pairs restructurings (optimization r14).

Variants (all produce the IDENTICAL (doc_a, doc_b, jaccard) set):

  A  current: inverted-index self-join -> pair groupBy -> sizes agg +
     2 pair-sized joins -> threshold filter
  B  fused:   n_sh attached to posting rows via one doc-keyed window;
     self-join carries the LENGTH FILTER (t*nB <= nA, t*nA <= nB) so
     non-viable pairs die before the pair groupBy; groupBy carries
     first(n_sh) per side so the sizes joins vanish
  P  ppjoin:  global df-order prefix filter (prefix len = n - ceil(t*n) + 1)
     generates candidates from prefix-vs-prefix join only, then verifies
     via full-array intersection (collect_list per doc joined onto the
     candidate pairs)

Each variant is timed on the q195-tier shingle profile (n=3,
max_shingle_freq=20, per_doc_dedup=True, threshold=0.4) over
documents.parquet of the given sf dirs; result equality is asserted
against variant A the first time each sf runs.

Usage: python tools/probe_jaccard_variants.py /tmp/sfscale/sf1 [more dirs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

THRESHOLD = 0.4
MAXFREQ = 20


def build_session():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def shingle_rows(spark, sf_dir: str) -> DataFrame:
    from datalakeingestionservice_spark.operators.dedup import word_shingles

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return word_shingles(
        docs.select("doc_id", "text"),
        "doc_id",
        "text",
        n=3,
        max_shingle_freq=MAXFREQ,
        per_doc_dedup=True,
    )


def variant_a(sh: DataFrame) -> DataFrame:
    from datalakeingestionservice_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(sh, id_col="doc_id", threshold=THRESHOLD, persist=True)


def variant_b(sh: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    t = THRESHOLD
    sh = sh.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ).persist()
    a, b = sh.alias("a"), sh.alias("b")
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") * t <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * t <= F.col("a.n_sh")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first(F.col("a.n_sh")).alias("na"),
            F.first(F.col("b.n_sh")).alias("nb"),
        )
        .filter(jac >= t)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


def variant_p(sh: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    t = THRESHOLD
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        sh.join(df_tab, "shingle")
        .withColumn(
            "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("__df", "shingle")
            ),
        )
        .persist()
    )
    # prefix length for Jaccard >= t: n - ceil(t*n) + 1
    prefix = ranked.filter(
        F.col("__r") <= F.col("n_sh") - F.ceil(F.col("n_sh") * t) + 1
    )
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cand = (
        pa.join(
            pb,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") * t <= F.col("b.n_sh"))
            & (F.col("b.n_sh") * t <= F.col("a.n_sh")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sets = ranked.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("__set"),
        F.first("n_sh").alias("n_sh"),
    )
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("__set").alias("sa"),
                F.col("n_sh").alias("na"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("__set").alias("sb"),
                F.col("n_sh").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn(
            "n_common", F.size(F.array_intersect("sa", "sb")).cast("long")
        )
        .filter(jac >= t)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


VARIANTS = {
    k: v
    for k, v in {"A": variant_a, "B": variant_b, "P": variant_p}.items()
    if k in os.environ.get("JACCARD_VARIANTS", "ABP")
}


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/sfscale/sf1"]
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for sf_dir in sf_dirs:
        ref = None
        for name, fn in VARIANTS.items():
            spark.sparkContext.setJobDescription(f"jaccard:{name}:{sf_dir}")
            best = float("inf")
            n = -1
            for _ in range(2):
                sh = shingle_rows(spark, sf_dir)
                t0 = time.perf_counter()
                out = fn(sh)
                out.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                n = out.count()
                spark.catalog.clearCache()
            print(f"{sf_dir} variant {name}: {best:.3f}s rows={n}", flush=True)
            rows = None
            if ref is None or name != "A":
                sh = shingle_rows(spark, sf_dir)
                rows = {
                    (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
                    for r in fn(sh).collect()
                }
                spark.catalog.clearCache()
            if name == "A":
                ref = rows
            elif ref is not None and rows is not None:
                assert rows == ref, (
                    f"{name} diverges from A at {sf_dir}: "
                    f"{len(rows ^ ref)} differing pairs"
                )
                print(f"  {name} == A ({len(ref)} pairs)", flush=True)


if __name__ == "__main__":
    main()
