"""Property fuzz for the materialized-view family: RANDOM view
definitions (kind × aggregates × filter × computed keys × join type)
driven through RANDOM DML sequences, with the maintained state checked
against a full recompute after EVERY refresh. This is the interaction
gate for the round-11 IVM surface — a single deterministic test can't
cover filter×distinct×computed-key×outer-pad combinations; seeded
randomness does.

Determinism: every seed fully determines the definition, the data, and
the DML — failures replay exactly.

Depth knob: FUZZ_ROUNDS bounds the DML+refresh+recompute rounds per
case (optimization r15). The default (1) keeps every definition/DML
combination exercised — bootstrap check plus one random DML round —
while fitting the external verification window; set DLIS_FUZZ_ROUNDS=5
to restore the deep interaction fuzz (same seeds, longer sequences).
"""

import math
import os
import random

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.incremental_view import (
    IncrementalAggView,
    IncrementalFullJoinAggView,
    IncrementalFullJoinView,
    IncrementalJoinAggView,
    IncrementalJoinView,
    IncrementalLeftJoinAggView,
    IncrementalLeftJoinView,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

FUZZ_ROUNDS = int(os.environ.get("DLIS_FUZZ_ROUNDS", "1"))

GRPS = ["a", "b", "c", "d"]
VALS = ["x", "y", "z", None]
DATES = ["2024-01-05", "2024-02-11", "2024-03-20", "2024-03-29"]


def _row(rng, rid):
    return (
        rid,
        rng.choice(GRPS),
        rng.choice(VALS),
        round(rng.uniform(-50, 150), 2) if rng.random() > 0.1 else None,
        rng.choice(DATES),
    )


L_SCHEMA = "id bigint, grp string, val string, x double, dt string"
R_SCHEMA = "grp string, seg string, w double"


def _mk_left(spark, tmp_path, rng, n=30):
    rows = [_row(rng, i) for i in range(n)]
    return (
        VersionedTable.create(
            spark, str(tmp_path / "fl"),
            spark.createDataFrame(rows, L_SCHEMA),
        ),
        n,
    )


def _mk_right(spark, tmp_path, rng):
    # one row per group, one group intentionally missing (pads)
    rows = [
        (g, rng.choice(["s1", "s2"]), round(rng.uniform(0, 9), 2))
        for g in GRPS[:-1]
    ]
    return VersionedTable.create(
        spark, str(tmp_path / "fr"),
        spark.createDataFrame(rows, R_SCHEMA),
    )


def _mutate_left(spark, l, rng, next_id):
    op = rng.choice(["ins", "del", "upd_x", "upd_grp", "upd_dt", "mix"])
    if op in ("ins", "mix"):
        rows = [_row(rng, next_id + i) for i in range(rng.randint(1, 4))]
        l.append(spark.createDataFrame(rows, L_SCHEMA))
        next_id += len(rows)
    if op in ("del", "mix"):
        m = rng.randint(2, 7)
        r = rng.randint(0, m - 1)
        l.delete_where(F.col("id") % m == r)
    if op == "upd_x":
        m = rng.randint(2, 5)
        l.update_where(
            F.col("id") % m == 0,
            {"x": F.col("x") + F.lit(float(rng.randint(-20, 20)))},
        )
    if op == "upd_grp":
        l.update_where(
            F.col("id") % 3 == rng.randint(0, 2),
            {"grp": F.lit(rng.choice(GRPS))},
        )
    if op == "upd_dt":
        l.update_where(
            F.col("id") % 4 == rng.randint(0, 3),
            {"dt": F.lit(rng.choice(DATES))},
        )
    return next_id


def _mutate_right(r, rng, spark):
    op = rng.choice(["del", "upd", "ins"])
    if op == "del":
        r.delete_where([("grp", "=", rng.choice(GRPS))])
    elif op == "upd":
        r.update_where(
            F.col("grp") == rng.choice(GRPS),
            {"seg": F.lit(rng.choice(["s1", "s2", "s3"]))},
        )
    else:
        g = rng.choice(GRPS)
        # re-insert only if absent (right pk is unique by contract)
        if r.read().filter(F.col("grp") == g).count() == 0:
            r.append(
                spark.createDataFrame(
                    [(g, "s9", 1.0)], R_SCHEMA
                )
            )


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _rows_match(got, exp):
    if len(got) != len(exp):
        return False
    key = lambda t: tuple(  # noqa: E731
        (x is None, x) for x in t
    )
    for g, e in zip(sorted(got, key=key), sorted(exp, key=key)):
        if len(g) != len(e) or not all(_close(a, b) for a, b in zip(g, e)):
            return False
    return True


@pytest.mark.parametrize("seed", [7, 23, 61])
def test_fuzz_single_table_agg_views(spark, tmp_path, seed):
    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng)

    # random definition
    use_filter = rng.random() < 0.5
    computed = rng.random() < 0.5
    keys = (
        {"mon": "substring(dt, 1, 7)"} if computed else ["grp"]
    )
    flt = "x >= 0" if use_filter else None
    v = IncrementalAggView(
        spark, l.root, str(tmp_path / "fv"),
        keys=keys,
        sums={"sx": "x"},
        mins={"lo": "x"},
        maxs={"hi": "x"},
        avgs={"ax": "x"},
        variances={"vx": "x"},
        distincts={"nv": "val"},
        filter=flt,
    )
    key_col = "mon" if computed else "grp"

    def recompute():
        df = l.read()
        if flt:
            df = df.filter(F.coalesce(F.expr(flt), F.lit(False)))
        if computed:
            df = df.withColumn("mon", F.expr("substring(dt, 1, 7)"))
        return [
            tuple(x)
            for x in df.groupBy(key_col)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("x").alias("sx"),
                F.min("x").alias("lo"),
                F.max("x").alias("hi"),
                F.avg("x").alias("ax"),
                F.var_samp("x").alias("vx"),
                F.countDistinct("val").alias("nv"),
            )
            .collect()
        ]

    def got():
        return [
            tuple(x)
            for x in v.read()
            .select(key_col, "_n", "sx", "lo", "hi", "ax", "vx", "nv")
            .collect()
        ]

    v.refresh()
    assert _rows_match(got(), recompute()), (seed, 0)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        v.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd)
    v.refresh()
    assert _rows_match(got(), recompute())


@pytest.mark.parametrize(
    "seed,jt,use_filter",
    [
        (11, "left", False),
        (43, "full", False),
        (17, "inner", True),
        (29, "left", True),
        (53, "full", True),
    ],
)
def test_fuzz_join_views(spark, tmp_path, seed, jt, use_filter):
    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng, n=24)
    r = _mk_right(spark, tmp_path, rng)
    cls = {
        "inner": IncrementalJoinView,
        "left": IncrementalLeftJoinView,
        "full": IncrementalFullJoinView,
    }[jt]
    kw = dict(on=["grp"], left_pk="id", right_pk="grp")
    if use_filter:
        # both-sides predicate: padded renders (one side NULL) decide
        # on the surviving side's term — WHERE-after-padding semantics
        kw["filter"] = (
            "x >= 10" if jt == "inner" else "x >= 10 OR seg = 's1'"
        )
    v = cls(spark, l.root, r.root, str(tmp_path / "fjv"), **kw)
    how = {"inner": "inner", "left": "left", "full": "full"}[jt]

    def recompute():
        df = l.read().join(r.read(), "grp", how)
        if kw.get("filter"):
            df = df.filter(
                F.coalesce(F.expr(kw["filter"]), F.lit(False))
            )
        return [
            (x.grp, x.id, x.val, x.x, x.dt, x.seg, x.w)
            for x in df.collect()
        ]

    def got():
        return [
            (x.grp, x.id, x.val, x.x, x.dt, x.seg, x.w)
            for x in v.read().collect()
        ]

    v.refresh()
    assert _rows_match(got(), recompute()), (seed, 0, jt)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        _mutate_right(r, rng, spark)
        v.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd, jt)


@pytest.mark.parametrize(
    "seed,jt,use_filter",
    [
        (5, "left", False),
        (31, "full", False),
        (19, "left", True),
        (47, "full", True),
    ],
)
def test_fuzz_join_agg_views(spark, tmp_path, seed, jt, use_filter):
    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng, n=24)
    r = _mk_right(spark, tmp_path, rng)
    cls = {
        "inner": IncrementalJoinAggView,
        "left": IncrementalLeftJoinAggView,
        "full": IncrementalFullJoinAggView,
    }[jt]
    flt = "x >= 10 OR seg = 's1'" if use_filter else None
    v = cls(
        spark, l.root, r.root, str(tmp_path / "fjav"),
        on=["grp"], left_pk="id", right_pk="grp",
        group_keys=["seg"], sums={"sx": "x", "sw": "w"},
        filter=flt,
    )
    how = {"inner": "inner", "left": "left", "full": "full"}[jt]

    def recompute():
        df = l.read().join(r.read(), "grp", how)
        if flt:
            df = df.filter(F.coalesce(F.expr(flt), F.lit(False)))
        return [
            tuple(x)
            for x in df.groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("x").alias("sx"),
                F.sum("w").alias("sw"),
            )
            .collect()
        ]

    def got():
        return [
            tuple(x)
            for x in v.read().select("seg", "_n", "sx", "sw").collect()
        ]

    v.refresh()
    assert _rows_match(got(), recompute()), (seed, 0, jt)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        _mutate_right(r, rng, spark)
        v.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd, jt)


@pytest.mark.parametrize("seed", [13, 37])
def test_fuzz_composed_extremes_over_join(spark, tmp_path, seed):
    """The composed class (join materialized + agg over its state
    feed) through random DML: extremes, distinct counts, and moments
    over an inner join must equal a full recompute after every
    refresh — deletes at stored extremes, value collapses, group
    churn, and both-feed mutations included by construction."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalComposedJoinAggView,
    )

    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng, n=24)
    r = _mk_right(spark, tmp_path, rng)
    v = IncrementalComposedJoinAggView(
        spark, l.root, r.root, str(tmp_path / "fcv"),
        on=["grp"], left_pk="id", right_pk="grp",
        group_keys=["seg"], sums={"sx": "x"},
        mins={"lo": "x"}, maxs={"hi": "x"},
        distincts={"nv": "val"}, avgs={"ax": "x"},
    )

    def recompute():
        return [
            tuple(x)
            for x in l.read()
            .join(r.read(), "grp")
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("x").alias("sx"),
                F.min("x").alias("lo"),
                F.max("x").alias("hi"),
                F.countDistinct("val").alias("nv"),
                F.avg("x").alias("ax"),
            )
            .collect()
        ]

    def got():
        return [
            tuple(x)
            for x in v.read()
            .select("seg", "_n", "sx", "lo", "hi", "nv", "ax")
            .collect()
        ]

    v.refresh()
    assert _rows_match(got(), recompute()), (seed, 0)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        _mutate_right(r, rng, spark)
        v.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd)


@pytest.mark.parametrize("seed,jt", [(17, "left"), (41, "full")])
def test_fuzz_composed_outer_extremes(spark, tmp_path, seed, jt):
    """The rendered-outer composition through random DML: extremes,
    distinct counts, and moments over LEFT/FULL OUTER joins must equal
    a full recompute after every refresh — pad/unpad transitions at
    extremes and NULL-group churn arise by construction from the
    random right-side deletes/reinserts."""
    from datalakeingestionservice_spark.sinks.incremental_view import (
        IncrementalComposedOuterJoinAggView,
    )

    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng, n=24)
    r = _mk_right(spark, tmp_path, rng)
    v = IncrementalComposedOuterJoinAggView(
        spark, l.root, r.root, str(tmp_path / "fov"),
        on=["grp"], left_pk="id", right_pk="grp",
        group_keys=["seg"], join_type=jt,
        sums={"sx": "x"}, mins={"lo": "x"}, maxs={"hi": "x"},
        distincts={"nv": "val"}, avgs={"ax": "x"},
    )
    how = jt

    def recompute():
        return [
            tuple(x)
            for x in l.read()
            .join(r.read(), "grp", how)
            .groupBy("seg")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum("x").alias("sx"),
                F.min("x").alias("lo"),
                F.max("x").alias("hi"),
                F.countDistinct("val").alias("nv"),
                F.avg("x").alias("ax"),
            )
            .collect()
        ]

    def got():
        return [
            tuple(x)
            for x in v.read()
            .select("seg", "_n", "sx", "lo", "hi", "nv", "ax")
            .collect()
        ]

    v.refresh()
    assert _rows_match(got(), recompute()), (seed, 0, jt)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        _mutate_right(r, rng, spark)
        v.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd, jt)


T3_SCHEMA = "seg string, region string, b double"
SEGS = ["s1", "s2", "s3", "s9"]


def _mk_third(spark, tmp_path, rng):
    rows = [
        (s, rng.choice(["amer", "emea"]), round(rng.uniform(0, 5), 2))
        for s in SEGS[:-1]  # one seg intentionally missing
    ]
    return VersionedTable.create(
        spark, str(tmp_path / "ft3"),
        spark.createDataFrame(rows, T3_SCHEMA),
    )


def _mutate_third(t, rng, spark):
    op = rng.choice(["del", "upd", "ins"])
    if op == "del":
        t.delete_where([("seg", "=", rng.choice(SEGS))])
    elif op == "upd":
        t.update_where(
            F.col("seg") == rng.choice(SEGS),
            {"region": F.lit(rng.choice(["amer", "emea", "apac"]))},
        )
    else:
        s = rng.choice(SEGS)
        if t.read().filter(F.col("seg") == s).count() == 0:
            t.append(
                spark.createDataFrame([(s, "apac", 2.0)], T3_SCHEMA)
            )


@pytest.mark.parametrize(
    "seed,kind,use_filter",
    [
        (11, "star", False),
        (29, "star", True),
        (43, "agg", False),
        (59, "agg", True),
        (73, "ext", False),
    ],
)
def test_fuzz_chain_matviews(spark, tmp_path, seed, kind, use_filter):
    """Chained 3-table join MVs (E128) under random DML on ALL THREE
    feeds, through the STATEMENT surface (CREATE/REFRESH), checked
    against a full 3-way recompute after every refresh."""
    from datalakeingestionservice_spark.sinks.matview import (
        MaterializedView,
    )

    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng, n=24)
    r = _mk_right(spark, tmp_path, rng)
    t3 = _mk_third(spark, tmp_path, rng)
    tables = {"fact": l, "dim1": r, "dim2": t3}
    where = " WHERE x >= 0" if use_filter else ""
    body = {
        "star": (
            "SELECT * FROM fact JOIN dim1 USING (grp) "
            f"JOIN dim2 USING (seg){where}"
        ),
        "agg": (
            "SELECT region, COUNT(*) AS n, SUM(x) AS sx FROM fact "
            "JOIN dim1 USING (grp) JOIN dim2 USING (seg)"
            f"{where} GROUP BY region"
        ),
        "ext": (
            "SELECT region, MIN(x) AS lo, MAX(x) AS hi, "
            "COUNT(DISTINCT val) AS nv FROM fact JOIN dim1 USING (grp) "
            f"JOIN dim2 USING (seg){where} GROUP BY region"
        ),
    }[kind]
    mv = MaterializedView.create(
        spark, str(tmp_path / "fchain"), body, tables,
        primary_key=("id", "grp", "seg"),
    )

    def recompute():
        df = l.read().join(r.read(), "grp").join(t3.read(), "seg")
        if use_filter:
            df = df.filter(
                F.coalesce(F.expr("x >= 0"), F.lit(False))
            )
        if kind == "star":
            return [
                (x.id, x.grp, x.seg, x.val, x.x, x.dt, x.w, x.region, x.b)
                for x in df.collect()
            ]
        if kind == "agg":
            return [
                (x.region, x.n, x.sx)
                for x in df.groupBy("region").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
                ).collect()
            ]
        return [
            (x.region, x.lo, x.hi, x.nv)
            for x in df.groupBy("region").agg(
                F.min("x").alias("lo"), F.max("x").alias("hi"),
                F.countDistinct("val").alias("nv"),
            ).collect()
        ]

    def got():
        df = mv.read()
        if kind == "star":
            return [
                (x.id, x.grp, x.seg, x.val, x.x, x.dt, x.w, x.region, x.b)
                for x in df.collect()
            ]
        return [tuple(x) for x in df.collect()]

    assert _rows_match(got(), recompute()), (seed, 0, kind)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        _mutate_right(r, rng, spark)
        _mutate_third(t3, rng, spark)
        mv.refresh()
        assert _rows_match(got(), recompute()), (seed, rnd, kind)


@pytest.mark.parametrize(
    "seed,upstream",
    [
        (71, "agg_having"),
        (83, "outer_agg"),
        (97, "outer_star"),
        (101, "agg_computed"),
    ],
)
def test_fuzz_rendered_upstream_pyramids(spark, tmp_path, seed, upstream):
    """r13 rendered-projection fuzz: a random upstream MV (single-table
    agg with HAVING / computed keys, OUTER-join agg, SELECT * outer
    row view) feeds a downstream aggregate; random DML on the bases +
    one CASCADE per round must equal the two-level recompute — incl.
    groups crossing the HAVING boundary, pad↔match transitions, and
    NULL rollup buckets."""
    from datalakeingestionservice_spark.sinks.matview import (
        MaterializedView,
    )

    rng = random.Random(seed)
    l, next_id = _mk_left(spark, tmp_path, rng)
    r = _mk_right(spark, tmp_path, rng)
    up_root = str(tmp_path / "fup")
    down_root = str(tmp_path / "fdown")

    if upstream == "agg_having":
        up = MaterializedView.create(
            spark, up_root,
            "SELECT grp, COUNT(*) AS n, SUM(x) AS sx FROM l "
            "GROUP BY grp HAVING n >= 2",
            {"l": l},
        )
        down = MaterializedView.create(
            spark, down_root,
            "SELECT COUNT(*) AS grps, SUM(sx) AS sx, SUM(n) AS n, "
            "substring(grp, 1, 1) AS g1 FROM up GROUP BY g1",
            {"up": up},
        )

        def recompute():
            d = (
                l.read().groupBy("grp")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
                .filter(F.col("n") >= 2)
            )
            return [
                tuple(x)
                for x in d.groupBy(
                    F.substring("grp", 1, 1).alias("g1")
                )
                .agg(
                    F.count(F.lit(1)).alias("grps"),
                    F.sum("sx").alias("sx"),
                    F.sum("n").alias("n"),
                )
                .select("g1", "grps", "sx", "n")
                .collect()
            ]

        def got():
            return [
                tuple(x)
                for x in down.read()
                .select("g1", "grps", "sx", "n")
                .collect()
            ]

    elif upstream == "agg_computed":
        up = MaterializedView.create(
            spark, up_root,
            "SELECT substring(dt, 1, 7) AS mon, COUNT(*) AS n, "
            "SUM(x) AS sx FROM l GROUP BY mon",
            {"l": l},
        )
        down = MaterializedView.create(
            spark, down_root,
            "SELECT substring(mon, 1, 4) AS yr, SUM(n) AS n, "
            "SUM(sx) AS sx FROM up GROUP BY yr",
            {"up": up},
        )

        def recompute():
            d = (
                l.read()
                .groupBy(F.substring("dt", 1, 7).alias("mon"))
                .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
            )
            return [
                tuple(x)
                for x in d.groupBy(
                    F.substring("mon", 1, 4).alias("yr")
                )
                .agg(F.sum("n").alias("n"), F.sum("sx").alias("sx"))
                .select("yr", "n", "sx")
                .collect()
            ]

        def got():
            return [
                tuple(x)
                for x in down.read().select("yr", "n", "sx").collect()
            ]

    elif upstream == "outer_agg":
        up = MaterializedView.create(
            spark, up_root,
            "SELECT seg, COUNT(*) AS n, SUM(x) AS sx "
            "FROM l LEFT JOIN r USING (grp) GROUP BY seg",
            {"l": l, "r": r},
            primary_key=("id", "grp"),
        )
        down = MaterializedView.create(
            spark, down_root,
            "SELECT seg, SUM(n) AS n, SUM(sx) AS sx FROM up "
            "GROUP BY seg",
            {"up": up},
        )

        def recompute():
            d = (
                l.read().join(r.read(), "grp", "left")
                .groupBy("seg")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
            )
            return [
                tuple(x) for x in d.select("seg", "n", "sx").collect()
            ]

        def got():
            return [
                tuple(x)
                for x in down.read().select("seg", "n", "sx").collect()
            ]

    else:  # outer_star
        up = MaterializedView.create(
            spark, up_root,
            "SELECT * FROM l LEFT JOIN r USING (grp)",
            {"l": l, "r": r},
            primary_key=("id", "grp"),
        )
        down = MaterializedView.create(
            spark, down_root,
            "SELECT seg, COUNT(*) AS n, SUM(x) AS sx, "
            "SUM(w) AS sw FROM up GROUP BY seg",
            {"up": up},
        )

        def recompute():
            d = (
                l.read().join(r.read(), "grp", "left")
                .groupBy("seg")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("x").alias("sx"),
                    F.sum("w").alias("sw"),
                )
            )
            return [
                tuple(x)
                for x in d.select("seg", "n", "sx", "sw").collect()
            ]

        def got():
            return [
                tuple(x)
                for x in down.read()
                .select("seg", "n", "sx", "sw")
                .collect()
            ]

    assert _rows_match(got(), recompute()), (seed, 0)
    for rnd in range(1, FUZZ_ROUNDS + 1):
        next_id = _mutate_left(spark, l, rng, next_id)
        if upstream in ("outer_agg", "outer_star") and rng.random() < 0.6:
            _mutate_right(r, rng, spark)
        down.refresh(cascade=True)
        assert _rows_match(got(), recompute()), (seed, rnd)
    down.refresh(cascade=True)
    assert _rows_match(got(), recompute()), (seed, "final")
