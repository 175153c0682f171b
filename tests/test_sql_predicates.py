"""sources/sql_predicates.py: the deferred-delete predicate compiler.

The contract is EXACT parity with Spark's evaluation of the same SQL —
including three-valued logic — so the core test evaluates a battery of
predicates both ways (Spark `F.expr` vs pyarrow compute) over a frame
with NULLs in every column and asserts identical truth vectors, and the
keep-mask path against `df.filter(~F.expr(p))`.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.sources.sql_predicates import (
    UnsupportedPredicateError,
    compile_predicate,
    evaluate,
    keep_mask,
    parse_predicate,
)

ROWS = [
    (0, 1, 1.5, "alpha", dt.date(2024, 1, 1),
     dt.datetime(2024, 1, 1, 10, 30), Decimal("1.50"), True),
    (1, 2, 2.5, "beta", dt.date(2024, 6, 1),
     dt.datetime(2024, 6, 1, 0, 0), Decimal("2.25"), False),
    (2, 3, None, None, dt.date(2025, 1, 1), None, None, None),
    (3, None, 4.0, "d'oh", None,
     dt.datetime(2025, 3, 1, 23, 59), Decimal("9.99"), True),
    (4, 5, -0.5, "Epsilon", dt.date(2023, 12, 31),
     dt.datetime(2023, 12, 31, 0, 0), Decimal("-3.00"), False),
]
DDL = (
    "rid bigint, id bigint, v double, s string, d date, "
    "ts timestamp_ntz, amt decimal(10,2), flag boolean"
)
TYPES = {
    "rid": "bigint", "id": "bigint", "v": "double", "s": "string",
    "d": "date", "ts": "timestamp_ntz", "amt": "decimal(10,2)",
    "flag": "boolean",
}

PREDICATES = [
    "id = 2",
    "id != 2",
    "id <> 2",
    "id == 2",
    "2 = id",
    "id > 1 AND v < 3.0",
    "id > 1 OR v < 0.0",
    "NOT (id = 1 OR s = 'beta')",
    "s IN ('alpha', 'Epsilon')",
    "id NOT IN (1, 2)",
    "s = 'd''oh'",
    "v BETWEEN 0.0 AND 2.5",
    "v NOT BETWEEN 0.0 AND 2.5",
    "d >= '2024-06-01'",
    "d >= DATE '2024-06-01'",
    "d < DATE '2024-01-01' OR d IS NULL",
    "ts > TIMESTAMP '2024-06-01 00:00:00'",
    "ts >= DATE '2024-06-01'",
    "ts <= '2024-01-01 10:30:00'",
    "amt BETWEEN 1.0 AND 2.5",
    "amt = 2.25",
    "amt <= -1",
    "s IS NULL",
    "v IS NOT NULL",
    "id > 2.5",
    "v = -0.5",
    "flag = TRUE",
    "flag != FALSE",
    "`id` >= 3",
    "(id = 1 AND flag) OR (id = 5 AND NOT flag)",
    "id >= 1 AND id <= 3 AND NOT (s = 'beta') AND v IS NOT NULL",
    # round 6: LIKE / column-side arithmetic
    "s LIKE 'a%'",
    "s LIKE '%a'",
    "s LIKE '%e%'",
    "s LIKE 'd''%'",
    "s NOT LIKE 'a_pha'",
    "s LIKE '_lpha' OR s IS NULL",
    "id + 1 = 2",
    "id * 2 > 4",
    "id - 1 BETWEEN 1 AND 2",
    "v * 2 <= 5.0",
    "id / 2 > 1.2",
    "id + 1 IN (2, 4)",
    "2 = id + 1",
    "id + -1 = 0",
    "id + 1 + 1 = 4",
    "v / 4 = 1.0",
    "id * 2 IS NOT NULL",
    # round 6 (second pass): col-vs-col + unary functions
    "id = rid",
    "id < rid",
    "id + 1 > rid",
    "v > id",
    "s = s",
    "d < ts",
    "length(s) > 4",
    "length(s) = 5",
    "lower(s) = 'epsilon'",
    "upper(s) LIKE 'E%'",
    "trim(s) = 'alpha'",
    "abs(v) > 0.4",
    "abs(id) = 2",
    "length(s) + 1 = 6",
    # round 6 (third pass): concat/substring/coalesce + col-vs-col math
    "concat(s, '!') = 'alpha!'",
    "concat(s, s) LIKE '%aa%'",
    "concat('pre-', lower(s)) = 'pre-epsilon'",
    "concat(s, '-', s) = 'beta-beta'",
    "substring(s, 2) = 'lpha'",
    "substring(s, 1, 3) = 'alp'",
    "substring(s, 2, 2) IN ('lp', 'et')",
    "substr(s, 1, 1) = 'd'",
    "substring(s, 10) = ''",
    "substring(s, 3, 0) = ''",
    "length(substring(s, 2)) = 4",
    "coalesce(s, 'none') = 'none'",
    "coalesce(v, 0.0) <= 0.5",
    "coalesce(id, rid) = rid",
    "coalesce(v, id, 0.5) > 2.0",
    "coalesce(ts, TIMESTAMP '2024-01-01 00:00:00') "
    ">= TIMESTAMP '2024-06-01 00:00:00'",
    "coalesce(d, DATE '2024-06-01') = DATE '2024-06-01'",
    "id + rid > 4",
    "id - rid = 1",
    "id * rid >= 6",
    "v - id < 0",
    "length(s) = rid + 4",
    "id + rid + 1 > 5",
    "abs(v) - id <= 0.0",
    "coalesce(substring(s, 1, 2), 'zz') IN ('al', 'be', 'zz')",
    # round 6 (fourth pass): null-safe equality
    "v <=> 4.0",
    "s <=> 'beta'",
    "NOT (v <=> -0.5)",
    "amt <=> 2.25",
    "id <=> rid",
    "v <=> id",
    "s <=> s",
    "2.5 <=> v",
    "id + 1 <=> rid",
    "lower(s) <=> 'epsilon'",
    "flag <=> TRUE",
    "(s <=> 'alpha') OR (s <=> 'd''oh')",
    # round 6 (fifth pass): CASE WHEN operands
    "CASE WHEN v > 2 THEN s ELSE 'lo' END = 'lo'",
    "CASE WHEN s IS NULL THEN 0 ELSE length(s) END >= 5",
    "CASE WHEN flag THEN v ELSE id END > 1.5",
    "CASE WHEN id = 1 THEN s WHEN id = 2 THEN 'two' END = 'two'",
    "CASE WHEN id = 1 THEN s WHEN id = 2 THEN 'two' END IS NULL",
    "CASE WHEN v > 0 THEN id + 1 ELSE id END IN (2, 3)",
    "CASE WHEN s LIKE 'a%' THEN 'A' WHEN s LIKE 'b%' THEN 'B' "
    "ELSE upper(s) END = 'B'",
    "CASE WHEN flag THEN 'y' ELSE coalesce(s, 'n') END <=> 'y'",
    "CASE WHEN v BETWEEN 0.0 AND 2.0 THEN d END = DATE '2024-01-01'",
    "NOT (CASE WHEN id > 2 THEN flag ELSE FALSE END = TRUE)",
]


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(ROWS, DDL)
    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # Pandas round-trips decimal to object; rebuild typed columns the way
    # a parquet read would present them.
    table = table.set_column(
        table.column_names.index("amt"),
        "amt",
        pa.array(pdf["amt"].tolist(), pa.decimal128(10, 2)),
    )
    return df, table


@pytest.mark.parametrize("sql", PREDICATES)
def test_parity_with_spark(frame, sql):
    df, table = frame
    ast = compile_predicate(sql, TYPES)
    spark_vec = [
        r.p
        for r in df.select("rid", F.expr(sql).alias("p"))
        .orderBy("rid")
        .collect()
    ]
    arrow_vec = evaluate(ast, table).to_pylist()
    assert arrow_vec == spark_vec, f"{sql}: {arrow_vec} != {spark_vec}"


@pytest.mark.parametrize("sql", PREDICATES)
def test_keep_mask_matches_spark_filter(frame, sql):
    df, table = frame
    ast = compile_predicate(sql, TYPES)
    want = sorted(r.rid for r in df.filter(~F.expr(sql)).collect())
    kept = table.filter(keep_mask([ast], table))
    assert sorted(kept.column("rid").to_pylist()) == want


def test_stacked_keep_mask(frame):
    df, table = frame
    asts = [
        compile_predicate("id <= 2", TYPES),
        compile_predicate("flag = FALSE", TYPES),
    ]
    want = sorted(
        r.rid
        for r in df.filter(~F.expr("id <= 2"))
        .filter(~F.expr("flag = FALSE"))
        .collect()
    )
    kept = table.filter(keep_mask(asts, table))
    assert sorted(kept.column("rid").to_pylist()) == want


def test_null_type_column_comparisons():
    """A column materialized as all-NULL (schema evolution fill) has
    arrow null type; comparisons yield NULL, IS NULL yields TRUE."""
    t = pa.table({"x": pa.nulls(3)})
    assert evaluate(parse_predicate("x = 1"), t).to_pylist() == [None] * 3
    assert evaluate(parse_predicate("x IN (1, 2)"), t).to_pylist() == [
        None
    ] * 3
    assert evaluate(parse_predicate("x IS NULL"), t).to_pylist() == [
        True
    ] * 3


@pytest.mark.parametrize(
    "sql",
    [
        "id = other_col",          # unknown column on the right
        "md5(s) = 'a'",            # unsupported function
        "substring(s, 0, 2) = 'a'",   # 0-based position (Spark quirk)
        "substring(s, -2) = 'ha'",    # negative position (from-end)
        "substring(id, 1, 2) = '1'",  # substring of a non-string
        "concat(s) = 'a'",            # concat needs >= 2 args
        "concat(s, 5) = 'a5'",        # non-string concat literal
        "concat(s, id) = 'a1'",       # non-string concat column
        "coalesce(s, 5) = 'a'",       # cross-category coalesce
        "coalesce('a', 'b') = 'a'",   # no column argument
        "id / rid > 1",               # col-by-col division (zero risk)
        "s + s = 'aa'",               # string col-vs-col arithmetic
        "length(id) > 0",          # length of a non-string
        "abs(s) = 1",              # abs of a string
        "id = flag",               # cross-category col-vs-col
        "amt = v",                 # decimal-vs-double col comparison
        "id + 1 * 2 = 3",          # mixed-precedence arithmetic
        "amt * 2 > 2",             # decimal arithmetic
        "s + 1 = 2",               # arithmetic on a string column
        "id / 0 = 1",              # division by literal zero
        "s LIKE 5",                # non-string LIKE pattern
        "id LIKE 'a%'",            # LIKE on a numeric column
        "s = 5",                   # type-incompatible literal
        "nope = 1",                # unknown column
        "d >= 'not-a-date'",       # unparseable date literal
        "id =",                    # truncated
        "id = 1 extra",            # trailing garbage
        "",                        # empty
        "id IN (s)",               # non-literal IN list
        "CASE WHEN id = 1 THEN 'a' ELSE 'b' END = 'a'",  # all-literal
        "CASE ELSE 'x' END = 'x'",                       # no WHEN
        "CASE WHEN id = 1 THEN s ELSE v END = 'a'",      # mixed cats
        # date/timestamp must NOT mix in value-producing contexts: the
        # arrow evaluator would coerce to the FIRST array's type
        # (timestamp->date32 truncates time-of-day) while Spark promotes
        # to timestamp — the two MoR readers would disagree.
        "CASE WHEN flag THEN d ELSE ts END = DATE '2024-01-01'",
        "coalesce(d, ts) = DATE '2024-01-01'",
        "coalesce(ts, DATE '2024-01-01') IS NULL",  # date lit, ts col
    ],
)
def test_unsupported_rejected(sql):
    with pytest.raises(UnsupportedPredicateError):
        compile_predicate(sql, TYPES)


def test_ast_is_plain_data():
    import json

    ast = parse_predicate(
        "id > 1 AND (s IN ('a', 'b') OR d >= DATE '2024-01-01') "
        "AND v IS NOT NULL"
    )
    assert json.loads(json.dumps(ast)) == ast


def test_decimal_literal_scale_overflow_refused_driver_side():
    """A numeric literal with more scale than the decimal column (or
    more integer digits than fit its precision) used to pass
    check_supported and blow up executor-side with ArrowInvalid on
    rescale; the contract is refusal DRIVER-side."""
    from datalakeingestionservice_spark.sources.sql_predicates import (
        UnsupportedPredicateError,
        compile_predicate,
    )

    types = {"price": "decimal(18,2)"}
    compile_predicate("price = 1.55", types)
    compile_predicate("price > 1", types)
    compile_predicate("price IN (1.5, 2)", types)
    for bad in (
        "price = 1.555",
        "price >= -0.001",
        "price IN (1.5, 2.125)",
        "price = 123456789012345678.55",  # 18 digits > p-s = 16
    ):
        with pytest.raises(UnsupportedPredicateError):
            compile_predicate(bad, types)


def test_columns_of_collects_every_reference():
    from datalakeingestionservice_spark.sources.sql_predicates import (
        columns_of,
        parse_predicate,
    )

    ast = parse_predicate(
        "a > 1 AND (b IS NULL OR NOT c IN ('x')) AND d BETWEEN 1 AND 2"
    )
    assert columns_of(ast) == {"a", "b", "c", "d"}


def test_struct_field_access_parity(spark):
    """Dotted struct-field predicates (`st.x`) evaluate identically in
    Spark and arrow, including null structs and null fields."""
    rows = [
        (0, {"x": 1, "y": "u"}),
        (1, {"x": None, "y": "v"}),
        (2, None),
        (3, {"x": 7, "y": None}),
    ]
    ddl = "rid bigint, st struct<x:int,y:string>"
    types = {"rid": "bigint", "st": "struct<x:int,y:string>"}
    df = spark.createDataFrame(rows, ddl)
    table = pa.table(
        {
            "rid": pa.array([r[0] for r in rows], pa.int64()),
            "st": pa.array(
                [r[1] for r in rows],
                pa.struct([("x", pa.int32()), ("y", pa.string())]),
            ),
        }
    )
    for sql in (
        "st.x = 1",
        "st.x > 0",
        "st.x IS NULL",
        "st.x IS NOT NULL",
        "st.y LIKE 'u%'",
        "st.x + 1 = 8",
        "st.x IN (1, 7)",
        "`st`.`y` = 'v'",
    ):
        ast = compile_predicate(sql, types)
        spark_vec = [
            r.p
            for r in df.select("rid", F.expr(sql).alias("p"))
            .orderBy("rid")
            .collect()
        ]
        assert evaluate(ast, table).to_pylist() == spark_vec, sql
    with pytest.raises(UnsupportedPredicateError):
        compile_predicate("st.zzz = 1", types)
    with pytest.raises(UnsupportedPredicateError):
        compile_predicate("rid.x = 1", types)


def test_unicode_substring_length_parity(spark):
    """Spark's substring/length count CODEPOINTS; the arrow twin must
    agree on non-ASCII strings (this is what makes utf8_slice_codeunits
    the right kernel — despite its name it slices codepoints)."""
    rows = [("héllo",), ("日本語テスト",), ("naïve",), (None,), ("🎉x🎊",)]
    df = spark.createDataFrame(rows, "s string")
    table = pa.table({"s": pa.array([r[0] for r in rows], pa.string())})
    types = {"s": "string"}
    for sql in (
        "substring(s, 2) = 'éllo'",
        "substring(s, 1, 2) = '日本'",
        "substring(s, 2, 3) IN ('éll', '本語テ')",
        "length(s) = 5",
        "length(s) = 6",
        "substring(s, 2, 1) = 'x'",
        "concat(substring(s, 1, 1), '!') = '🎉!'",
    ):
        ast = compile_predicate(sql, types)
        spark_vec = [
            r.p for r in df.select(F.expr(sql).alias("p")).collect()
        ]
        arrow_vec = evaluate(ast, table).to_pylist()
        assert arrow_vec == spark_vec, (
            f"{sql}: {arrow_vec} != {spark_vec}"
        )


def test_null_safe_equality_never_null():
    """<=> yields a non-NULL boolean for every row, including null-typed
    (schema-evolution fill) columns."""
    t = pa.table({"x": pa.nulls(3), "y": pa.array([1, None, 3])})
    assert evaluate(
        parse_predicate("x <=> 1"), t
    ).to_pylist() == [False] * 3
    assert evaluate(
        parse_predicate("x <=> y"), t
    ).to_pylist() == [False, True, False]
    assert evaluate(
        parse_predicate("x <=> x"), t
    ).to_pylist() == [True] * 3
