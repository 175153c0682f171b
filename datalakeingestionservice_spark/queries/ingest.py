"""Ingestion-pipeline operators as verifiable queries (SURVEY.md A7-A9, A22, A23).

Each entry applies the REAL step implementations from
`datalakeingestionservice_spark.steps` to data dirtied in-query (the lake
tables are clean), with a DuckDB oracle reproducing the step semantics — so the
reference's transformation surface is hash-verified, not just unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.catalog import Env
from datalakeingestionservice_spark.queries.registry import register
from datalakeingestionservice_spark.steps import create_step


def _dirty_customers(env: Env) -> DataFrame:
    """Customer names wrapped in whitespace; every 10th name blanked —
    exercises the DataCleansing truth table (`DataCleansingStep.cs:43-51`)."""
    return env.t("customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("   "))
        .otherwise(F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")))
        .alias("c_name"),
        "c_mktsegment",
    )


_DIRTY_SQL = """
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 0 THEN '   '
              ELSE '  ' || c_name || '  ' END AS c_name,
         c_mktsegment
  FROM customer
"""


# ---------------------------------------------------------------------------
# q60 — DataCleansing step (A7): trim + empty->NULL.
# ---------------------------------------------------------------------------
@register(
    "q60_step_cleansing",
    tags=("ingest", "step", "cleansing"),
    oracle=f"""
WITH dirty AS ({_DIRTY_SQL})
SELECT c_custkey,
       nullif(trim(c_name), '') AS c_name,
       trim(c_mktsegment) AS c_mktsegment,
       CASE WHEN nullif(trim(c_name), '') IS NULL THEN 1 ELSE 0 END AS was_blanked
FROM dirty
ORDER BY c_custkey
""",
)
def q60_step_cleansing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trimWhitespace + removeEmptyStrings over string columns only."""
    env = Env(spark, sf_dir)
    step = create_step(
        "DataCleansing", {"trimWhitespace": True, "removeEmptyStrings": True}
    )
    cleaned = step.apply(_dirty_customers(env))
    return cleaned.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.when(F.col("c_name").isNull(), 1).otherwise(0).alias("was_blanked"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q61 — DataValidation step (A8) incl. the email check the reference TODO'd.
# ---------------------------------------------------------------------------
@register(
    "q61_step_validation",
    tags=("ingest", "step", "validation"),
    oracle="""
WITH with_email AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0
              THEN 'not-an-email'
              ELSE lower(replace(c_name, '#', '')) || '@corp.example.com'
         END AS email
  FROM customer
)
SELECT c_custkey, email,
       CASE WHEN regexp_matches(email,
            '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$')
            THEN true ELSE false END AS email_valid
FROM with_email
ORDER BY c_custkey
""",
)
def q61_step_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """requiredColumns assertion + email-format flagging (reference left this
    as TODO at `DataValidationStep.cs:41-45`; implemented here via rlike)."""
    env = Env(spark, sf_dir)
    with_email = env.t("customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("not-an-email"))
        .otherwise(
            F.concat(
                F.lower(F.regexp_replace("c_name", "#", "")),
                F.lit("@corp.example.com"),
            )
        )
        .alias("email"),
    )
    step = create_step(
        "DataValidation",
        {
            "requiredColumns": ["c_custkey", "email"],
            "validateEmail": True,
            "emailColumns": ["email"],
        },
    )
    return step.apply(with_email).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q62 — DataMasking step (A23): partial + hash modes.
# ---------------------------------------------------------------------------
@register(
    "q62_step_masking",
    tags=("ingest", "step", "masking"),
    oracle="""
SELECT c_custkey,
       repeat('*', greatest(length(c_name) - 4, 0))
         || substr(c_name, greatest(length(c_name) - 3, 1)) AS c_name,
       sha256(c_mktsegment) AS c_mktsegment
FROM customer
ORDER BY c_custkey
""",
)
def q62_step_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partial mode (keep last 4) on the name; hash mode (sha256 pseudonym) on
    the segment — the two deterministic masking strategies."""
    env = Env(spark, sf_dir)
    partial = create_step(
        "DataMasking",
        {"columns": ["c_name"], "mode": "partial", "unmaskedSuffixLength": 4},
    )
    hashed = create_step("DataMasking", {"columns": ["c_mktsegment"], "mode": "hash"})
    df = env.t("customer").select("c_custkey", "c_name", "c_mktsegment")
    return hashed.apply(partial.apply(df)).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# q63 — DateFormat step (A23).
# ---------------------------------------------------------------------------
@register(
    "q63_step_dateformat",
    tags=("ingest", "step", "dateformat"),
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y/%m/%d') AS o_orderdate,
       o_orderstatus
FROM orders
WHERE o_orderkey % 100 = 0
ORDER BY o_orderkey
""",
)
def q63_step_dateformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp -> formatted string column, in place (reference README example)."""
    env = Env(spark, sf_dir)
    step = create_step(
        "DateFormat", {"columns": ["o_orderdate"], "targetFormat": "yyyy/MM/dd"}
    )
    df = env.t("orders").filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    return step.apply(df).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q64 — ColumnMapping step (A23).
# ---------------------------------------------------------------------------
@register(
    "q64_step_column_mapping",
    tags=("ingest", "step", "rename"),
    oracle="""
SELECT c_custkey AS customer_id,
       c_name AS customer_name,
       c_mktsegment AS segment,
       round(c_acctbal, 2) AS account_balance
FROM customer
ORDER BY customer_id
""",
)
def q64_step_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename-and-project per mapping config."""
    env = Env(spark, sf_dir)
    step = create_step(
        "ColumnMapping",
        {
            "mappings": {
                "c_custkey": "customer_id",
                "c_name": "customer_name",
                "c_mktsegment": "segment",
                "c_acctbal": "account_balance",
            },
            "dropUnmapped": True,
        },
    )
    df = env.t("customer").withColumn("c_acctbal", F.round("c_acctbal", 2))
    return step.apply(df).orderBy("customer_id")


# ---------------------------------------------------------------------------
# q65 — LookupJoin step (A22, the reference's empty-file intent) + full chain.
# ---------------------------------------------------------------------------
@register(
    "q65_step_chain",
    headline=True,
    tags=("ingest", "step", "chain", "lookup-join"),
    oracle="""
WITH dirty AS (
  SELECT c_custkey,
         '  ' || c_name || '  ' AS c_name,
         c_nationkey, c_mktsegment
  FROM customer
),
cleaned AS (
  SELECT c_custkey, nullif(trim(c_name), '') AS c_name, c_nationkey,
         trim(c_mktsegment) AS c_mktsegment
  FROM dirty
),
joined AS (
  SELECT c.*, n.n_name
  FROM cleaned c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT c_custkey AS customer_id,
       repeat('*', greatest(length(c_name) - 4, 0))
         || substr(c_name, greatest(length(c_name) - 3, 1)) AS masked_name,
       n_name AS nation_name,
       c_mktsegment AS segment
FROM joined
ORDER BY customer_id
""",
)
def q65_step_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's transformation fold (A9): Cleansing -> LookupJoin
    (broadcast nation) -> Masking -> ColumnMapping, composed lazily into ONE
    Catalyst plan — no per-step materialization (vs the reference's in-memory
    DataTable rewrites per step)."""
    env = Env(spark, sf_dir)
    dirty = env.t("customer").select(
        "c_custkey",
        F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")).alias("c_name"),
        "c_nationkey",
        "c_mktsegment",
    )
    from datalakeingestionservice_spark.steps.common import LookupJoinStep

    cleanse = create_step(
        "DataCleansing", {"trimWhitespace": True, "removeEmptyStrings": True}
    )
    lookup = LookupJoinStep(
        {"on": "c_nationkey", "how": "left", "select": ["n_name"]},
        lookup_df=env.t("nation").withColumnRenamed("n_nationkey", "c_nationkey"),
    )
    mask = create_step(
        "DataMasking",
        {"columns": ["c_name"], "mode": "partial", "unmaskedSuffixLength": 4},
    )
    rename = create_step(
        "ColumnMapping",
        {
            "mappings": {
                "c_custkey": "customer_id",
                "c_name": "masked_name",
                "n_name": "nation_name",
                "c_mktsegment": "segment",
            },
            "dropUnmapped": True,
        },
    )
    df = dirty
    for step in (cleanse, lookup, mask, rename):
        df = step.apply(df)
    return df.orderBy("customer_id")
