"""Oracle fuzzer: random engine-portable SQL, executed by BOTH Spark and
DuckDB, results compared exactly.

Hand-written queries cover the operators we thought of; the fuzzer sweeps the
combinatorial space around them (predicate shapes x groupings x aggregates x
ordering x limits) and catches expression-semantics drift between engines.

Usage: python tools/fuzz_correctness.py [n_cases] [seed] [sf_dir]
Every case prints its seed on failure — re-run with that seed to reproduce.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_correctness import duck_connection, rows_key  # noqa: E402

#: Engine-portability rule learned from fuzzing: round() on INTEGER columns
#: diverges (Spark keeps the integer type, DuckDB promotes to DOUBLE — same
#: value, different type/repr), so round-style aggregates draw only from
#: DOUBLE columns; integer columns use un-rounded aggregates.
DOUBLE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
NUMERIC_COLS = DOUBLE_COLS + INT_COLS
STRING_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
GROUP_EXPRS = [
    ("l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus"),
    ("CAST(year(l_shipdate) AS INTEGER)", "ship_year"),
    ("CAST(month(l_shipdate) AS INTEGER)", "ship_month"),
    ("CAST(l_linenumber % 3 AS INTEGER)", "line_mod"),
    ("CAST(l_quantity AS INTEGER) % 10", "qty_mod"),
]
#: (template, column pool) aggregate builders.
#: No avg(): a group average can land EXACTLY on .xx5 (e.g. two 2-decimal
#: values), where Spark (BigDecimal HALF_UP) and DuckDB (scaled llround on
#: the inexact double) systematically disagree — found by this fuzzer.
#: Sums of 2-decimal data have 2-decimal true values, so round-2 is exact.
AGGS = [
    ("count(*)", None),
    ("count(DISTINCT {c})", NUMERIC_COLS),
    ("round(sum({c}), 2)", DOUBLE_COLS),
    ("round(min({c}), 4)", DOUBLE_COLS),
    ("round(max({c}), 4)", DOUBLE_COLS),
    ("min({c})", INT_COLS),
    ("max({c})", INT_COLS),
    ("sum(CASE WHEN {c} > 10 THEN 1 ELSE 0 END)", NUMERIC_COLS),
]
_NUM_BOUNDS = {
    "l_quantity": (1, 50), "l_extendedprice": (900, 100000),
    "l_discount": (0, 0.1), "l_tax": (0, 0.08), "l_orderkey": (1, 15000),
    "l_partkey": (1, 2000), "l_suppkey": (1, 100), "l_linenumber": (1, 7),
}


def _predicate(rng: random.Random) -> str:
    kind = rng.randrange(5)
    if kind == 0:
        col = rng.choice(list(STRING_COLS))
        value = rng.choice(STRING_COLS[col])
        op = rng.choice(["=", "<>"])
        return f"{col} {op} '{value}'"
    if kind == 1:
        col = rng.choice(NUMERIC_COLS)
        lo, hi = _NUM_BOUNDS[col]
        v = round(rng.uniform(lo, hi), 2)
        op = rng.choice(["<", "<=", ">", ">="])
        return f"{col} {op} {v}"
    if kind == 2:
        col = rng.choice(NUMERIC_COLS)
        lo, hi = _NUM_BOUNDS[col]
        a = round(rng.uniform(lo, hi), 2)
        b = round(rng.uniform(lo, hi), 2)
        lo_v, hi_v = min(a, b), max(a, b)
        return f"{col} BETWEEN {lo_v} AND {hi_v}"
    if kind == 3:
        year = rng.randrange(1995, 2002)
        op = rng.choice(["<", ">="])
        return f"l_shipdate {op} TIMESTAMP '{year}-06-01 00:00:00'"
    col = rng.choice(list(STRING_COLS))
    values = rng.sample(STRING_COLS[col], k=rng.randrange(1, len(STRING_COLS[col]) + 1))
    vals = ", ".join(f"'{v}'" for v in values)
    return f"{col} IN ({vals})"


_JOIN_AGGS = [
    ("count(*)", None),
    ("round(sum(o_totalprice), 2)", None),
    ("count(DISTINCT o_custkey)", None),
    ("min(o_orderkey)", None),
    ("max(c_custkey)", None),
]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def _three_way_join_case(rng: random.Random) -> str:
    """nation x customer x orders chain with mixed-level predicates."""
    nk = rng.randrange(5, 25)
    status = rng.choice(["F", "O", "P"])
    group = rng.choice(["n.n_name", "c.c_mktsegment", "o.o_orderpriority"])
    return (
        f"SELECT {group} AS grp, count(*) AS n, "
        f"round(sum(o.o_totalprice), 2) AS total, "
        f"count(DISTINCT c.c_custkey) AS n_cust "
        f"FROM nation n "
        f"JOIN customer c ON c.c_nationkey = n.n_nationkey "
        f"JOIN orders o ON o.o_custkey = c.c_custkey "
        f"WHERE n.n_nationkey < {nk} AND o.o_orderstatus = '{status}' "
        f"GROUP BY {group} ORDER BY grp"
    )


def _join_case(rng: random.Random) -> str:
    """customer x orders join family (inner/left), grouped aggregate."""
    if rng.random() < 0.35:
        return _three_way_join_case(rng)
    how = rng.choice(["JOIN", "LEFT JOIN"])
    seg = rng.sample(_SEGMENTS, k=rng.randrange(1, 3))
    seg_list = ", ".join(f"'{s}'" for s in seg)
    preds = [f"c.c_mktsegment IN ({seg_list})"]
    if rng.random() < 0.5:
        preds.append(f"c.c_acctbal > {round(rng.uniform(-500, 8000), 2)}")
    where = " AND ".join(preds)
    group = rng.choice(
        ["c.c_mktsegment", "c.c_nationkey", "o.o_orderstatus", "o.o_orderpriority"]
    )
    aggs = ", ".join(
        f"{rng.choice(_JOIN_AGGS)[0]} AS agg_{i}" for i in range(rng.randrange(1, 3))
    )
    # LEFT JOIN makes o.* nullable; group keys from o need NULLS FIRST parity
    # (both engines default differently for DESC) -> keep ASC NULLS FIRST.
    return (
        f"SELECT {group} AS grp, {aggs} "
        f"FROM customer c {how} orders o ON c.c_custkey = o.o_custkey "
        f"WHERE {where} GROUP BY {group} ORDER BY grp ASC NULLS FIRST"
    )


#: Unique total order within lineitem (verified: 4-tuple is a key).
_UNIQUE_ORDER = "l_orderkey, l_linenumber, l_partkey, l_suppkey"


def _window_case(rng: random.Random) -> str:
    """Window-function family: ranks/offsets/frames over a deterministic
    total order within partitions."""
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey % 10"])
    fn = rng.choice(
        [
            "row_number()",
            "rank()",
            "dense_rank()",
            "lag(l_quantity, 1)",
            "lead(l_linenumber, 1)",
            "round(sum(l_quantity) OVER (PARTITION BY {p} ORDER BY {o} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)",
        ]
    )
    where = _predicate(rng)
    if "OVER" in fn:
        expr = fn.format(p=part, o=_UNIQUE_ORDER)
    else:
        expr = f"{fn} OVER (PARTITION BY {part} ORDER BY {_UNIQUE_ORDER})"
    return (
        f"SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        f"{expr} AS w FROM lineitem WHERE {where} "
        f"ORDER BY {_UNIQUE_ORDER} LIMIT 2000"
    )


def _range_window_case(rng: random.Random) -> str:
    """RANGE-frame window family: value-based frames over a numeric ORDER BY.

    RANGE frames include PEER rows (equal order keys), so the aggregate is
    deterministic even where the order key ties — no total order needed for
    the frame itself; the outer ORDER BY still totals over output columns.
    """
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey % 10"])
    span = rng.choice([2, 5, 10, 100])
    okey = rng.choice(["l_orderkey", "l_partkey"])
    fn = rng.choice(
        [
            f"round(sum(l_quantity) OVER (PARTITION BY {part} ORDER BY {okey} "
            f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW), 2)",
            f"count(*) OVER (PARTITION BY {part} ORDER BY {okey} "
            f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW)",
            f"min(l_linenumber) OVER (PARTITION BY {part} ORDER BY {okey} "
            f"RANGE BETWEEN {span} PRECEDING AND {span} FOLLOWING)",
            f"max(l_suppkey) OVER (PARTITION BY {part} ORDER BY {okey} "
            f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
        ]
    )
    where = _predicate(rng)
    return (
        f"SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, "
        f"{fn} AS w FROM lineitem WHERE {where} "
        f"ORDER BY {_UNIQUE_ORDER} LIMIT 2000"
    )


def _deep_join_case(rng: random.Random) -> str:
    """5-table chain: region -> nation -> customer -> orders -> lineitem."""
    rk = rng.randrange(1, 5)
    status = rng.choice(["F", "O", "P"])
    qty = rng.randrange(5, 45)
    group = rng.choice(["r.r_name", "n.n_name", "o.o_orderpriority"])
    having = (
        f"HAVING count(*) >= {rng.randrange(1, 4)} "
        if rng.random() < 0.4
        else ""
    )
    return (
        f"SELECT {group} AS grp, count(*) AS n, "
        f"round(sum(l.l_extendedprice), 2) AS revenue, "
        f"count(DISTINCT o.o_orderkey) AS n_orders "
        f"FROM region r "
        f"JOIN nation n ON n.n_regionkey = r.r_regionkey "
        f"JOIN customer c ON c.c_nationkey = n.n_nationkey "
        f"JOIN orders o ON o.o_custkey = c.c_custkey "
        f"JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        f"WHERE r.r_regionkey < {rk} AND o.o_orderstatus = '{status}' "
        f"AND l.l_quantity > {qty} "
        f"GROUP BY {group} {having}ORDER BY grp"
    )


def _rollup_case(rng: random.Random) -> str:
    """ROLLUP family: subtotal rows (NULL-filled keys) must match exactly.

    grouping() disambiguates real NULLs from subtotal NULLs in both engines;
    ordering totals over (grouping levels, keys) with NULLS FIRST parity.

    Divergence class found by this family (FUZZ.md #5): over an EMPTY input
    relation DuckDB emits the grand-total grouping-set row (count 0, SQL
    standard — same as a global aggregate), Spark emits NO rows for any
    grouping set. Portable spelling: `HAVING count(*) > 0`, a no-op on every
    non-empty group and a normalizer on the empty-input grand row.
    """
    a, b = rng.sample(["l_returnflag", "l_linestatus"], k=2)
    where = _predicate(rng)
    return (
        f"SELECT {a} AS ga, {b} AS gb, "
        f"CAST(grouping({a}) AS INTEGER) AS lv_a, "
        f"CAST(grouping({b}) AS INTEGER) AS lv_b, "
        f"count(*) AS n, round(sum(l_quantity), 2) AS qty "
        f"FROM lineitem WHERE {where} "
        f"GROUP BY ROLLUP ({a}, {b}) "
        f"HAVING count(*) > 0 "
        f"ORDER BY lv_a, lv_b, ga NULLS FIRST, gb NULLS FIRST"
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events_case(rng: random.Random) -> str:
    """events family: timestamp truncation/extraction + JSON access."""
    group = rng.choice(
        [
            "CAST(date_trunc('day', ts) AS DATE)",
            "CAST(hour(ts) AS INTEGER)",
            "CAST(dayofmonth(ts) AS INTEGER)",
            "event_type",
            "CAST(json_extract_string_portable(props) AS BIGINT) % 10",
        ]
    )
    # Portable JSON accessor differs per engine; substitute below.
    preds = []
    types = rng.sample(_EVENT_TYPES, k=rng.randrange(1, 3))
    preds.append("event_type IN (" + ", ".join(f"'{t}'" for t in types) + ")")
    if rng.random() < 0.5:
        day = rng.randrange(2, 29)
        op = rng.choice(["<", ">="])
        preds.append(f"ts {op} TIMESTAMP '2024-01-{day:02d} 00:00:00'")
    if rng.random() < 0.4:
        preds.append(f"value > {round(rng.uniform(1, 150), 2)}")
    aggs = ["count(*) AS n", "round(sum(value), 2) AS total"]
    if rng.random() < 0.5:
        aggs.append("count(DISTINCT user_id) AS n_users")
    sql = (
        f"SELECT {group} AS grp, {', '.join(aggs)} FROM events "
        f"WHERE {' AND '.join(preds)} GROUP BY {group} "
        f"ORDER BY grp NULLS FIRST"
    )
    return sql


#: json accessor spellings per engine (same semantics).
_JSON_SPARK = "get_json_object(props, '$.k')"
_JSON_DUCK = "json_extract_string(props, '$.k')"


def _text_case(rng: random.Random) -> str:
    """documents family: portable string scalar functions."""
    exprs = rng.sample(
        [
            "length(text) AS e_len",
            "upper(substr(text, 1, 12)) AS e_upper",
            "reverse(substr(text, 1, 8)) AS e_rev",
            "replace(substr(text, 1, 30), ' ', '_') AS e_repl",
            f"position('{rng.choice(['scan', 'join', 'row', 'data'])}' IN text) AS e_pos",
            "NTOK_PORTABLE(text) AS e_ntok",
            "lower(lang) AS e_lang",
            f"CASE WHEN length(text) > {rng.randrange(100, 400)} THEN 'long' ELSE 'short' END AS e_bucket",
            "substr(SHA256HEX_PORTABLE(text), 1, 12) AS e_sha",
            f"lpad(CAST(doc_id AS STRING), {rng.randrange(6, 12)}, '0') AS e_pad",
        ],
        k=rng.randrange(2, 5),
    )
    preds = []
    if rng.random() < 0.6:
        preds.append(f"lang IN ('{rng.choice(['en', 'de', 'es', 'fr', 'zh'])}', 'en')")
    if rng.random() < 0.5:
        preds.append(f"n_chars BETWEEN {rng.randrange(50, 200)} AND {rng.randrange(250, 600)}")
    if rng.random() < 0.3:
        preds.append(f"text LIKE '%{rng.choice(['the', 'scan', 'merge'])}%'")
    where = " AND ".join(preds) if preds else "doc_id >= 0"
    return (
        f"SELECT doc_id, {', '.join(exprs)} FROM documents "
        f"WHERE {where} ORDER BY doc_id"
    )


def _array_case(rng: random.Random) -> str:
    """embeddings family: grouped aggregates over array-derived scalars."""
    derived = rng.sample(
        [
            "ARRLEN_PORTABLE(embedding) AS dim",
            "round(CAST(ELEM1_PORTABLE(embedding) AS DOUBLE), 4) AS first_e",
            "round(CAST(ARRMIN_PORTABLE(embedding) AS DOUBLE), 4) AS min_e",
            "round(CAST(ARRMAX_PORTABLE(embedding) AS DOUBLE), 4) AS max_e",
            "NPOS_PORTABLE(embedding) AS n_pos",
        ],
        k=rng.randrange(1, 4),
    )
    vec_cap = rng.choice([200, 400, 500])
    label_max = rng.randrange(3, 10)
    return (
        f"SELECT vec_id, label, {', '.join(derived)} FROM embeddings "
        f"WHERE vec_id < {vec_cap} AND label <= {label_max} "
        f"ORDER BY vec_id"
    )


def generate_case(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.13:
        return _join_case(rng)
    if roll < 0.24:
        return _window_case(rng)
    if roll < 0.33:
        return _range_window_case(rng)
    if roll < 0.40:
        return _deep_join_case(rng)
    if roll < 0.46:
        return _rollup_case(rng)
    if roll < 0.58:
        return _events_case(rng)
    if roll < 0.66:
        return _text_case(rng)
    if roll < 0.72:
        return _array_case(rng)
    where_parts = [_predicate(rng) for _ in range(rng.randrange(1, 4))]
    joiner = " AND " if rng.random() < 0.7 else " OR "
    where = joiner.join(where_parts)

    if rng.random() < 0.65:
        # Aggregation query.
        groups = rng.sample(GROUP_EXPRS, k=rng.randrange(1, 3))
        group_sql = ", ".join(expr for expr, _ in groups)
        group_aliases = ", ".join(
            f"{expr} AS {alias}" for expr, alias in groups
        )
        aggs = []
        for i in range(rng.randrange(1, 4)):
            template, cols = rng.choice(AGGS)
            col = rng.choice(cols) if cols else rng.choice(NUMERIC_COLS)
            aggs.append(template.format(c=col) + f" AS agg_{i}")
        order = ", ".join(alias for _, alias in groups)
        return (
            f"SELECT {group_aliases}, {', '.join(aggs)} FROM lineitem "
            f"WHERE {where} GROUP BY {group_sql} ORDER BY {order}"
        )

    # Projection query with deterministic order + limit. Scaled projections
    # round at 4 dp: inputs carry <=2 decimals and the multiplier 2, so the
    # product has <=4 decimals and round-4 is exact in both engines. Rounding
    # at 2 hits exact .005 boundaries where Spark (BigDecimal shortest-repr,
    # HALF_UP) and DuckDB (scale + llround) legitimately disagree — found by
    # this fuzzer, avoided in every curated query the same way.
    n_cols = rng.randrange(2, 5)
    cols = rng.sample(NUMERIC_COLS, k=n_cols)
    proj = ", ".join(
        f"round({c} * {round(rng.uniform(0.5, 2.0), 2)}, 4) AS p_{i}"
        if rng.random() < 0.5 and c in DOUBLE_COLS
        else c
        for i, c in enumerate(cols)
    )
    limit = rng.choice([50, 200, 1000])
    # ORDER BY every output column (positionally): (l_orderkey, l_linenumber)
    # is NOT unique in this data, so a prefix sort + LIMIT would cut a
    # nondeterministic row set; with a total order over all outputs, any
    # remaining ties are rows identical in every compared column.
    order = ", ".join(str(i + 1) for i in range(2 + n_cols))
    return (
        f"SELECT l_orderkey, l_linenumber, {proj} FROM lineitem "
        f"WHERE {where} ORDER BY {order} LIMIT {limit}"
    )


def run_fuzz(n_cases: int = 100, seed: int = 42, sf_dir: str = "/root/testdata/sf0.001",
             spark=None, verbose: bool = True) -> list[tuple[int, str, str]]:
    """Returns list of (case_seed, sql, problem) for failing cases."""
    from datalakeingestionservice_spark.catalog import register_views
    from datalakeingestionservice_spark.session import build_session

    spark = spark or build_session("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)
    con = duck_connection(sf_dir)

    failures: list[tuple[int, str, str]] = []
    master = random.Random(seed)
    for i in range(n_cases):
        case_seed = master.randrange(2**31)
        sql = generate_case(random.Random(case_seed))
        spark_sql, duck_sql = sql, sql
        for marker, spark_form, duck_form in (
            ("json_extract_string_portable(props)", _JSON_SPARK, _JSON_DUCK),
            ("NTOK_PORTABLE(text)", "size(split(text, ' '))",
             "len(string_split(text, ' '))"),
            ("SHA256HEX_PORTABLE(text)", "sha2(text, 256)", "sha256(text)"),
            ("ARRLEN_PORTABLE(embedding)", "size(embedding)", "len(embedding)"),
            ("ARRMIN_PORTABLE(embedding)", "array_min(embedding)",
             "list_min(embedding)"),
            ("ARRMAX_PORTABLE(embedding)", "array_max(embedding)",
             "list_max(embedding)"),
            ("ELEM1_PORTABLE(embedding)", "element_at(embedding, 1)",
             "embedding[1]"),
            ("NPOS_PORTABLE(embedding)",
             "size(filter(embedding, x -> x > 0))",
             "len(list_filter(embedding, x -> x > 0))"),
        ):
            spark_sql = spark_sql.replace(marker, spark_form)
            duck_sql = duck_sql.replace(marker, duck_form)
        problem = None
        try:
            sdf = spark.sql(spark_sql)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            problem = f"spark error: {exc}"
            s_cols = s_rows = None
        if problem is None:
            try:
                res = con.execute(duck_sql)
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
            except Exception as exc:
                problem = f"duckdb error: {exc}"
        if problem is None:
            if len(s_rows) != len(d_rows):
                problem = f"rows spark={len(s_rows)} duck={len(d_rows)}"
            elif rows_key(s_rows, s_cols) != rows_key(d_rows, d_cols):
                problem = "values differ"
        if problem:
            failures.append((case_seed, sql, problem))
            if verbose:
                print(f"FAIL seed={case_seed}: {problem}\n  {sql}")
        elif verbose and i % 25 == 0:
            print(f"... {i}/{n_cases} ok")
    if verbose:
        print(f"\n{n_cases - len(failures)}/{n_cases} cases passed")
    return failures


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    sys.exit(1 if run_fuzz(n, seed, sf) else 0)
