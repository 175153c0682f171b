"""SQL-defined incremental MATERIALIZED VIEWs — the statement front
door for the IVM family (`sinks/incremental_view.py`):

    CREATE MATERIALIZED VIEW mv LOCATION '/lake/mv'
      AS SELECT seg, COUNT(*) AS n, SUM(price) AS total
         FROM orders JOIN customer USING (ck) GROUP BY seg
    REFRESH MATERIALIZED VIEW mv
    SELECT * FROM mv                      -- reads the maintained state
    DROP MATERIALIZED VIEW mv             -- deregisters (data stays)

The AS body is a RESTRICTED grammar that maps 1:1 onto the maintained
view classes — refuse-never-reinterpret, exactly like the rest of the
statement surface (`sinks/sql_dml.py`):

- ``SELECT keys…, COUNT(*) AS a, SUM(e) AS b, MIN(e) AS c, MAX(e) AS d
  FROM t GROUP BY keys…`` → :class:`IncrementalAggView` (counting
  algorithm; min/max with endangered-group partial rebuild).
- ``SELECT * FROM l [INNER|LEFT|FULL [OUTER]] JOIN r USING (k…)``
  with ``PRIMARY KEY (lpk, rpk)`` → :class:`IncrementalJoinView` /
  :class:`IncrementalLeftJoinView` / :class:`IncrementalFullJoinView`
  (join rows are identified by the two pks — the statement must name
  them because no SQL text can infer uniqueness).
- ``SELECT keys…, COUNT(*)/SUM(…)… FROM l [LEFT|FULL] JOIN r
  USING (k…) GROUP BY keys…`` with ``PRIMARY KEY`` →
  :class:`IncrementalJoinAggView` / the E109 outer-agg classes.
  MIN/MAX over a join refuses with the documented composition
  (IncrementalAggView over a join view's state table).
- ``FROM t1 JOIN t2 USING (a) JOIN t3 USING (b) …`` — CHAINED (3+
  table) INNER joins, the star-schema rollup in one statement
  (``PRIMARY KEY`` takes one pk per table in FROM order) →
  :class:`_JoinChain`: cascaded INNER join views with the
  intermediates auto-materialized under the view root, the final
  stage any of the inner forms (SELECT * / count-sum agg / composed
  extremes). OUTER members refuse with the MV-over-MV recipe.

The definition persists as ``_mv.json`` at the view LOCATION (source
table ROOTS, parsed spec, original SQL), so
:meth:`MaterializedView.open` rebuilds the view in a fresh session and
``REFRESH`` works without the CREATE statement's context. JOIN USING
(not ON) is the accepted form because the maintained join classes
equate SAME-NAMED columns. WHERE is supported everywhere the delta
algebra can carry it: single-table aggregates and INNER joins filter
every term identically (σ(ΔJ) = Δ(σJ) for a row-deterministic
predicate); OUTER joins honor SQL's WHERE-after-padding — the padded
sets derive matched-ness from the raw other side's join keys and
apply the predicate to the null-padded render (a predicate needing
the other side's columns excludes all padded rows, exactly like a
full recompute).

Reference anchor: the reference re-runs its extraction queries from
scratch on every cron fire (`src/Worker/Services/
JobSchedulingService.cs:24-75`); a materialized view with incremental
refresh is the lake-native replacement for that whole recompute loop.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.incremental_view import (
    IncrementalAggView,
    IncrementalComposedJoinAggView,
    IncrementalComposedOuterJoinAggView,
    IncrementalFullJoinAggView,
    IncrementalFullJoinView,
    IncrementalJoinAggView,
    IncrementalJoinView,
    IncrementalLeftJoinAggView,
    IncrementalLeftJoinView,
)
from datalakeingestionservice_spark.sinks.versioned import VersionedTable

_SPEC_FILE = "_mv.json"

_BODY_RE = re.compile(
    r"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t1>[A-Za-z_]\w*)"
    r"(?:\s+(?P<jt>INNER\s+|LEFT\s+(?:OUTER\s+)?|FULL\s+(?:OUTER\s+)?)?"
    r"JOIN\s+(?P<t2>[A-Za-z_]\w*)\s+USING\s*\((?P<using>[^)]+)\))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<gb>.+?))?"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: chained (3+ table) joins — the star-schema rollup in ONE statement:
#: ``FROM t1 JOIN t2 USING (a) JOIN t3 USING (b) …``. INNER only: the
#: chain compiles onto a cascade of maintained INNER join views (each
#: intermediate's state table feeds the next stage's change feed —
#: the same mechanism as MV-over-MV, with the intermediates
#: auto-materialized under the view root), and only INNER state tables
#: ARE their SQL-visible rows. OUTER members refuse with the
#: composition recipe.
_CHAIN_BODY_RE = re.compile(
    r"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<t1>[A-Za-z_]\w*)"
    r"(?P<joins>(?:\s+(?:INNER\s+|LEFT\s+(?:OUTER\s+)?|"
    r"FULL\s+(?:OUTER\s+)?)?JOIN\s+[A-Za-z_]\w*"
    r"\s+USING\s*\([^)]+\)){2,})"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<gb>.+?))?"
    r"(?:\s+HAVING\s+(?P<having>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CHAIN_JOIN_RE = re.compile(
    r"\s+(?P<jt>INNER\s+|LEFT\s+(?:OUTER\s+)?|FULL\s+(?:OUTER\s+)?)?"
    r"JOIN\s+(?P<t>[A-Za-z_]\w*)"
    r"\s+USING\s*\((?P<using>[^)]+)\)",
    re.IGNORECASE,
)
_AGG_ITEM_RE = re.compile(
    r"^(?P<fn>COUNT|SUM|MIN|MAX|AVG|STDDEV_SAMP|STDDEV|VAR_SAMP|"
    r"VARIANCE)\s*\(\s*(?P<arg>.+?)\s*\)\s+"
    r"AS\s+(?P<alias>[A-Za-z_]\w*)$",
    re.IGNORECASE | re.DOTALL,
)
_IDENT_RE = re.compile(r"^[A-Za-z_]\w*$")


class MaterializedViewError(ValueError):
    """Statement outside the materialized-view grammar."""


def _split_top_level(text: str) -> list[str]:
    """Split on commas outside parentheses/quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return [p for p in parts if p]


_HAVING_KEYWORDS = {
    "and", "or", "not", "in", "is", "null", "between", "like", "rlike",
    "true", "false", "case", "when", "then", "else", "end", "distinct",
    "escape", "div", "interval", "date", "timestamp",
}
_AGG_FN_NAMES = {
    "count", "sum", "min", "max", "avg", "mean", "stddev", "stddev_samp",
    "stddev_pop", "variance", "var_samp", "var_pop", "collect_list",
    "collect_set", "first", "last", "any_value", "approx_count_distinct",
    "percentile", "percentile_approx", "median",
}


def _validate_having(having: str, out_cols: set[str]) -> None:
    """Parse-time check that HAVING references only the SELECT's output
    aliases / group keys. HAVING is applied at read() as F.expr over the
    view's output schema, so an aggregate call (`HAVING count(*) > 1`
    with no COUNT(*) alias) or an unknown column would let CREATE and
    REFRESH succeed and then raise AnalysisException on EVERY read —
    fail loudly at CREATE instead (ADVICE r11)."""
    no_str = re.sub(r"'(?:[^']|'')*'", "''", having)
    for m in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*", no_str):
        tok = m.group(0)
        low = tok.lower()
        is_call = no_str[m.end():].lstrip().startswith("(")
        if is_call:
            if low in _AGG_FN_NAMES:
                raise MaterializedViewError(
                    f"HAVING references the aggregate {tok}(...): HAVING "
                    "is evaluated over the view's OUTPUT columns — alias "
                    "the aggregate in the SELECT list (e.g. COUNT(*) AS "
                    "n) and reference the alias"
                )
            continue  # scalar functions over output columns are fine
        if low in _HAVING_KEYWORDS:
            continue
        if tok not in out_cols:
            raise MaterializedViewError(
                f"HAVING references {tok!r}, which is not a SELECT "
                f"output alias or group key {sorted(out_cols)}; alias "
                "the expression in the SELECT list and reference the "
                "alias"
            )


def parse_mv_body(body: str, primary_key: tuple[str, str] | None) -> dict:
    """Parse the AS body into a spec dict (kind + class parameters).
    Refuses anything outside the grammar with a targeted message."""
    sql = body.strip().rstrip(";").strip()
    if re.search(r"\bJOIN\b.+\bON\b", sql, re.IGNORECASE | re.DOTALL):
        raise MaterializedViewError(
            "join views equate SAME-NAMED columns: use "
            "JOIN <t2> USING (col[, ...]), not ON"
        )
    m = _BODY_RE.match(sql)
    cm = None
    if not m:
        cm = _CHAIN_BODY_RE.match(sql)
    if not m and not cm:
        if len(re.findall(r"\bJOIN\b", sql, re.IGNORECASE)) >= 2 and (
            re.search(
                r"\b(LEFT|FULL)\s+(OUTER\s+)?JOIN\b", sql, re.IGNORECASE
            )
        ):
            raise MaterializedViewError(
                "chained (3+ table) joins are INNER-only (each "
                "intermediate's state table IS its visible rows, which "
                "is what lets the next stage consume its change feed); "
                "put the OUTER join in its own materialized view and "
                "compose (MV-over-MV)"
            )
        raise MaterializedViewError(
            "materialized-view body must be SELECT <items> FROM <t> "
            "[<jointype> JOIN <t2> USING (cols) [JOIN <t3> USING "
            "(cols) ...]] [GROUP BY keys]; "
            f"got {sql[:80]!r}"
        )
    src = m or cm
    items = _split_top_level(src.group("items"))
    is_join = cm is not None or m.group("t2") is not None
    where = src.group("where").strip() if src.group("where") else None
    having = src.group("having").strip() if src.group("having") else None
    gb = (
        [c.strip().strip("`") for c in _split_top_level(src.group("gb"))]
        if src.group("gb")
        else None
    )

    keys: list[str] = []
    key_exprs: dict[str, str] = {}
    count_alias: str | None = None
    sums: dict[str, str] = {}
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    distincts: dict[str, str] = {}
    avgs: dict[str, str] = {}
    stddevs: dict[str, str] = {}
    variances: dict[str, str] = {}
    star = False
    for item in items:
        if item == "*":
            star = True
            continue
        am = _AGG_ITEM_RE.match(item)
        if am:
            fn = am.group("fn").upper()
            arg, alias = am.group("arg").strip(), am.group("alias")
            if fn == "COUNT":
                dm = re.match(r"^DISTINCT\s+(.+)$", arg, re.IGNORECASE)
                if dm:
                    if alias in distincts:
                        raise MaterializedViewError(
                            f"duplicate output alias {alias!r}"
                        )
                    distincts[alias] = dm.group(1).strip()
                    continue
                if arg != "*":
                    raise MaterializedViewError(
                        "only COUNT(*) and COUNT(DISTINCT expr) are "
                        "maintainable (COUNT(col) = "
                        "SUM(CAST(col IS NOT NULL AS INT)))"
                    )
                if count_alias is not None:
                    raise MaterializedViewError("duplicate COUNT(*)")
                count_alias = alias
            else:
                dst = {
                    "SUM": sums,
                    "MIN": mins,
                    "MAX": maxs,
                    "AVG": avgs,
                    "STDDEV": stddevs,
                    "STDDEV_SAMP": stddevs,
                    "VARIANCE": variances,
                    "VAR_SAMP": variances,
                }[fn]
                taken = (
                    set(sums) | set(mins) | set(maxs) | set(avgs)
                    | set(stddevs) | set(variances)
                )
                if alias in taken:
                    raise MaterializedViewError(
                        f"duplicate output alias {alias!r}"
                    )
                dst[alias] = arg
            continue
        if _IDENT_RE.match(item.strip("`")):
            keys.append(item.strip("`"))
            key_exprs[item.strip("`")] = item.strip("`")
            continue
        km = re.match(
            r"^(?P<expr>.+?)\s+AS\s+(?P<alias>[A-Za-z_]\w*)$",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        if km:
            # computed group key (e.g. date_trunc('day', ts) AS day) —
            # must be aggregate-free (a malformed aggregate item would
            # otherwise be silently reinterpreted as a key expression)
            if re.search(
                r"\b(COUNT|SUM|MIN|MAX|AVG|STDDEV|STDDEV_SAMP|VAR_SAMP"
                r"|VARIANCE)\s*\(",
                km.group("expr"),
                re.IGNORECASE,
            ):
                raise MaterializedViewError(
                    f"select item {item!r}: aggregate expressions "
                    "outside the supported forms refuse rather than "
                    "becoming group keys"
                )
            alias = km.group("alias")
            keys.append(alias)
            key_exprs[alias] = km.group("expr").strip()
            continue
        raise MaterializedViewError(
            f"select item {item!r} outside the grammar: plain column, "
            "<expr> AS key, COUNT(*) AS a, SUM/MIN/MAX/AVG/STDDEV/"
            "VARIANCE(expr) AS a, COUNT(DISTINCT e) AS a, or * "
            "(join views)"
        )

    has_agg = bool(
        count_alias or sums or mins or maxs or distincts or avgs
        or stddevs or variances
    )
    if star and (has_agg or keys or gb):
        raise MaterializedViewError(
            "SELECT * is the whole-row join-view form; it cannot mix "
            "with aggregates or GROUP BY"
        )
    if has_agg:
        if gb is None:
            raise MaterializedViewError(
                "aggregate views need GROUP BY (whole-table scalars "
                "are a one-group GROUP BY away)"
            )
        # GROUP BY entries may be the key alias OR the verbatim
        # expression (both are valid SQL); match either per key.
        norm = {
            k: key_exprs[k].replace(" ", "").lower() for k in keys
        }
        gb_norm = sorted(
            g if _IDENT_RE.match(g) else g.replace(" ", "").lower()
            for g in gb
        )
        ok = gb_norm == sorted(keys) or gb_norm == sorted(norm.values())
        if not ok and sorted(gb) != sorted(keys):
            raise MaterializedViewError(
                f"GROUP BY columns {gb} must equal the select's key "
                f"columns/aliases {keys}"
            )
    elif gb is not None:
        raise MaterializedViewError("GROUP BY without aggregates")
    if having is not None and not has_agg:
        raise MaterializedViewError(
            "HAVING needs aggregates (for a row predicate use WHERE)"
        )
    if having is not None:
        out_cols = (
            set(keys) | set(sums) | set(mins) | set(maxs)
            | set(distincts) | set(avgs) | set(stddevs) | set(variances)
        )
        if count_alias:
            out_cols.add(count_alias)
        _validate_having(having, out_cols)
    computed = any(key_exprs[k] != k for k in keys)

    if not is_join:
        if star or not has_agg:
            raise MaterializedViewError(
                "single-table views must aggregate (a non-aggregating "
                "copy is a plain table — use CREATE TABLE ... AS)"
            )
        if primary_key is not None:
            raise MaterializedViewError(
                "PRIMARY KEY applies to join views only (single-table "
                "aggregates are keyed by their GROUP BY columns)"
            )
        return {
            "kind": "agg",
            "having": having,
            "source": m.group("t1"),
            "keys": key_exprs if computed else keys,
            "count_alias": count_alias,
            "sums": sums,
            "mins": mins,
            "maxs": maxs,
            "distincts": distincts,
            "avgs": avgs,
            "stddevs": stddevs,
            "variances": variances,
            "filter": where,
        }

    if computed and not has_agg:
        raise MaterializedViewError(
            "computed keys need aggregates (a non-aggregating join "
            "view is SELECT * — project at read time instead)"
        )
    if cm is not None:
        # chained (3+ table) joins: one pk per table in FROM order.
        # The prefix must be INNER (each intermediate's state table IS
        # its visible rows — the cascade mechanism); only the FINAL
        # join may be LEFT/FULL OUTER (its left side is the last
        # intermediate, identified by a synthesized single pk).
        tables = [cm.group("t1")]
        ons: list[list[str]] = []
        jts: list[str] = []
        for jm in _CHAIN_JOIN_RE.finditer(cm.group("joins")):
            tables.append(jm.group("t"))
            ons.append(
                [c.strip().strip("`") for c in jm.group("using").split(",")]
            )
            raw = (jm.group("jt") or "INNER").strip().upper().split()[0]
            jts.append(
                {"INNER": "inner", "LEFT": "left", "FULL": "full"}[raw]
            )
        if any(jt != "inner" for jt in jts[:-1]):
            raise MaterializedViewError(
                "only the FINAL join of a chain may be OUTER (an "
                "intermediate outer would spread its rows across "
                "padded side tables, which cannot feed the next "
                "stage); put the outer join last, or in its own "
                "materialized view and compose (MV-over-MV)"
            )
        if primary_key is None or len(primary_key) != len(tables):
            raise MaterializedViewError(
                f"a {len(tables)}-table join view needs PRIMARY KEY "
                f"with ONE pk per table in FROM order "
                f"({len(tables)} columns) — join rows are identified "
                "by the tuple of every side's unique key"
            )
        base = {
            "tables": tables,
            "ons": ons,
            "pks": list(primary_key),
            "last_join_type": jts[-1],
            "filter": where,
        }
        if not has_agg:
            if not star:
                raise MaterializedViewError(
                    "non-aggregating join views must be SELECT * (the "
                    "maintained state is the full join row)"
                )
            return {"kind": "join_chain", **base}
        return {
            "kind": "join_chain_agg",
            **base,
            "having": having,
            "group_keys": key_exprs if computed else keys,
            "count_alias": count_alias,
            "sums": sums,
            "mins": mins,
            "maxs": maxs,
            "distincts": distincts,
            "avgs": avgs,
            "stddevs": stddevs,
            "variances": variances,
            "materialize_join": bool(
                mins or maxs or distincts or avgs or stddevs or variances
            ),
        }
    jt_raw = (m.group("jt") or "INNER").strip().upper().split()[0]
    join_type = {"INNER": "inner", "LEFT": "left", "FULL": "full"}[jt_raw]
    if primary_key is None:
        raise MaterializedViewError(
            "join views need PRIMARY KEY (<left_pk>, <right_pk>) — "
            "join rows are identified by the two sides' unique keys, "
            "which SQL text cannot infer"
        )
    if len(primary_key) != 2:
        raise MaterializedViewError(
            "a two-table join view needs PRIMARY KEY with exactly two "
            f"columns (got {len(primary_key)})"
        )
    on = [c.strip().strip("`") for c in m.group("using").split(",")]
    spec = {
        "left": m.group("t1"),
        "right": m.group("t2"),
        "on": on,
        "join_type": join_type,
        "left_pk": primary_key[0],
        "right_pk": primary_key[1],
        "filter": where,
    }
    if not has_agg:
        if not star:
            raise MaterializedViewError(
                "non-aggregating join views must be SELECT * (the "
                "maintained state is the full join row)"
            )
        return {"kind": "join", **spec}
    needs_join_state = bool(
        mins or maxs or distincts or avgs or stddevs or variances
    )
    return {
        "kind": "join_agg",
        **spec,
        "having": having,
        "group_keys": key_exprs if computed else keys,
        "count_alias": count_alias,
        "sums": sums,
        "mins": mins,
        "maxs": maxs,
        "distincts": distincts,
        "avgs": avgs,
        "stddevs": stddevs,
        "variances": variances,
        # extremes/distincts/moments need the join MATERIALIZED (the
        # composed class); count/sum alone keep it un-materialized
        "materialize_join": needs_join_state,
    }


class _JoinChain:
    """A cascade of maintained join stages compiled from ONE chained-
    JOIN statement (``FROM t1 JOIN t2 USING … JOIN t3 USING …``): each
    intermediate INNER join view's STATE table is the next stage's
    left source — the MV-over-MV mechanism (E118) with the
    intermediates auto-materialized under the view root (``j1/``,
    ``j2/``, …; the final stage at ``state/``). Refresh drains
    left-to-right, so each stage consumes exactly the state versions
    the previous stage just committed: one pass brings the whole chain
    current, and each stage's cost stays ∝ its own delta (a one-row
    base change flows through k−1 delta joins, never a rescan).

    The intermediate rows are identified by the TUPLE of every joined
    table's pk so far (composite left pks), which is why the statement
    requires PRIMARY KEY with one column per table in FROM order."""

    def __init__(self, spark, base_roots: list[str], stages: list):
        self.spark = spark
        self.base_roots = list(base_roots)
        self.stages = list(stages)

    def refresh(self, max_retries: int = 3):
        res = None
        for v in self.stages:
            r = v.refresh(max_retries=max_retries)
            res = r if r is not None else res
        return res

    def read(self) -> DataFrame:
        return self.stages[-1].read()

    def read_join(self) -> DataFrame:
        last = self.stages[-1]
        return last.read_join() if hasattr(last, "read_join") else last.read()

    def start_continuous_refresh(
        self, checkpoint_dir: str, processing_time: str = "0 seconds"
    ) -> tuple:
        """One change stream per BASE table; any side's commit triggers
        a full chain drain (idempotent — the marks are the truth)."""
        from datalakeingestionservice_spark.sources.versioned_changes import (
            register,
        )

        register(self.spark)
        queries = []
        for i, root in enumerate(self.base_roots):
            feed = (
                self.spark.readStream.format("versioned_changes")
                .option("table_root", root)
                .load()
            )

            def _on_batch(batch_df, batch_id: int) -> None:
                self.refresh()

            queries.append(
                feed.writeStream.foreachBatch(_on_batch)
                .trigger(processingTime=processing_time)
                .option(
                    "checkpointLocation",
                    os.path.join(checkpoint_dir, f"t{i}"),
                )
                .start()
            )
        return tuple(queries)


class MaterializedView:
    """A persisted, incrementally-refreshed view. Construct via
    :meth:`create` (parses + materializes + writes `_mv.json`) or
    :meth:`open` (rebuilds from the persisted spec)."""

    def __init__(self, spark: SparkSession, root: str, spec: dict):
        self.spark = spark
        self.root = root
        self.spec = spec
        self._view = self._build()

    # -- lifecycle -----------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        body: str,
        sources: dict[str, str],
        primary_key: tuple[str, str] | None = None,
        name: str | None = None,
    ) -> "MaterializedView":
        """Parse `body`, resolve source names to table ROOTS via
        `sources`, materialize once, persist the spec.

        A source may itself be a MATERIALIZED VIEW (an MV-over-MV
        cascade): INNER join views only — their state table IS the
        SQL-visible rows, so the downstream view consumes its change
        feed like any table's (this is how MIN/MAX/COUNT(DISTINCT)/
        moments over a join become maintainable: join view below,
        aggregate view above). Aggregate and OUTER views keep internal
        encodings (hidden accumulators; padded rows in side tables)
        and refuse as upstreams. The dependency persists in the spec,
        and ``refresh(cascade=True)`` refreshes upstreams first."""
        if os.path.exists(os.path.join(root, _SPEC_FILE)):
            raise MaterializedViewError(
                f"{root}: already holds a materialized view; "
                "open() or REFRESH it instead"
            )
        spec = parse_mv_body(body, primary_key)

        def _resolve(src: str) -> str:
            if src not in sources:
                raise MaterializedViewError(
                    f"unknown source table {src!r} "
                    f"(registered: {sorted(sources)})"
                )
            t = sources[src]
            if isinstance(t, MaterializedView) or (
                not isinstance(t, VersionedTable)
                and MaterializedView.exists(t)
            ):
                up = (
                    t
                    if isinstance(t, MaterializedView)
                    else MaterializedView.open(spark, str(t))
                )
                # an all-INNER join_chain qualifies on the same grounds
                # as an inner join view: its final state table IS its
                # visible rows (an outer-final chain spreads across
                # padded side tables like any outer view)
                up_jt = (
                    up.spec.get("last_join_type", "inner")
                    if up.spec["kind"].startswith("join_chain")
                    else up.spec.get("join_type", "inner")
                )
                chain_ok = (
                    up.spec["kind"] == "join_chain" and up_jt == "inner"
                )
                if chain_ok or (
                    up.spec["kind"] == "join" and up_jt == "inner"
                ):
                    spec.setdefault("deps", {})[src] = up.root
                    return os.path.join(up.root, "state")
                if up.spec["kind"] in ("agg", "join_agg", "join_chain_agg"):
                    # aggregate upstream (ANY join type): the state
                    # table keeps hidden accumulators, so the
                    # downstream consumes the RENDERED visible-rows
                    # projection instead — a versioned table maintained
                    # from the agg state's CDC (the rollup-pyramid
                    # mechanism: daily agg MV feeds monthly agg MV). An
                    # OUTER-agg upstream's rendered rows carry NULL
                    # group keys (the padded groups), so the DOWNSTREAM
                    # single-table aggregate keys null-safely — without
                    # it, SQL-MERGE equality would silently duplicate
                    # the NULL groups.
                    spec.setdefault("deps", {})[src] = up.root
                    if up._rendered_null_safe():
                        if spec["kind"] != "agg":
                            raise MaterializedViewError(
                                f"source {src!r} is an OUTER-join "
                                "aggregate: its rendered rows carry "
                                "NULL group keys, which only a "
                                "single-table aggregate downstream "
                                "can key (null-safe); join views "
                                "need non-NULL PRIMARY KEYs"
                            )
                        spec["null_safe_source"] = True
                    return up.ensure_rendered()
                # SELECT * OUTER views (incl. outer-final chains): the
                # visible relation spans padded side tables, so the
                # downstream consumes the RENDERED join-row projection
                # (pk-pair __gid keyed). Padded rows carry NULLs in the
                # missing side's columns, so only a null-safe aggregate
                # downstream can consume it.
                if up.spec["kind"] in ("join", "join_chain"):
                    if spec["kind"] != "agg":
                        raise MaterializedViewError(
                            f"source {src!r} is an OUTER join view: "
                            "its rendered rows carry NULLs in the "
                            "padded side (incl. potential pk "
                            "columns), which only a single-table "
                            "aggregate downstream can key "
                            "(null-safe); join it upstream instead — "
                            "chains accept an OUTER FINAL join"
                        )
                    spec.setdefault("deps", {})[src] = up.root
                    spec["null_safe_source"] = True
                    return up.ensure_rendered()
                raise MaterializedViewError(
                    f"source {src!r} is a materialized view of "
                    f"kind {up.spec['kind']}/{up_jt} outside the "
                    "upstream matrix"
                )
            return t.root if isinstance(t, VersionedTable) else str(t)

        for key in ("source", "left", "right"):
            if key in spec:
                spec[f"{key}_root"] = _resolve(spec[key])
        if "tables" in spec:
            spec["table_roots"] = [_resolve(s) for s in spec["tables"]]
        spec["sql"] = body.strip()
        if name:
            spec["name"] = name
        mv = cls(spark, root, spec)
        mv.refresh()
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, _SPEC_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(spec, f, indent=1)
        os.replace(tmp, os.path.join(root, _SPEC_FILE))
        return mv

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "MaterializedView":
        path = os.path.join(root, _SPEC_FILE)
        if not os.path.exists(path):
            raise MaterializedViewError(
                f"{root}: no materialized view here ({_SPEC_FILE} missing)"
            )
        with open(path) as f:
            return cls(spark, root, json.load(f))

    @staticmethod
    def exists(root) -> bool:
        return isinstance(root, str) and os.path.exists(
            os.path.join(root, _SPEC_FILE)
        )

    def _build(self):
        s = self.spec
        state = os.path.join(self.root, "state")
        flt = s.get("filter")
        if s["kind"] == "agg":
            return IncrementalAggView(
                self.spark, s["source_root"], state,
                keys=s["keys"], sums=s["sums"],
                mins=s["mins"], maxs=s["maxs"], filter=flt,
                distincts=s.get("distincts") or {},
                avgs=s.get("avgs") or {},
                stddevs=s.get("stddevs") or {},
                variances=s.get("variances") or {},
                # set when the source is an OUTER-agg upstream's
                # rendered projection: its rows group under NULL keys
                null_safe_keys=s.get("null_safe_source", False),
            )
        if s["kind"] in ("join_chain", "join_chain_agg"):
            return self._build_chain(s, state, flt)
        args = (
            self.spark, s["left_root"], s["right_root"], state,
        )
        kw = dict(
            on=s["on"], left_pk=s["left_pk"], right_pk=s["right_pk"]
        )
        if flt is not None:
            # all join types: outer variants derive padded membership
            # from the raw other side and apply σ to the padded render
            kw["filter"] = flt
        if s["kind"] == "join":
            cls = {
                "inner": IncrementalJoinView,
                "left": IncrementalLeftJoinView,
                "full": IncrementalFullJoinView,
            }[s["join_type"]]
            return cls(*args, **kw)
        if s.get("materialize_join"):
            # extremes/distincts/moments over the join: the composed
            # classes materialize the joined rows under the view root
            # (inner: the join state table; outer: the RENDERED outer
            # relation merged from the state tables' CDC, aggregated
            # null-safely — padded rows group under NULL keys) and an
            # aggregate view maintains over that feed; rescans read the
            # materialized rows, never the raw sources
            extra = dict(
                group_keys=s["group_keys"], sums=s["sums"],
                mins=s.get("mins") or {}, maxs=s.get("maxs") or {},
                distincts=s.get("distincts") or {},
                avgs=s.get("avgs") or {},
                stddevs=s.get("stddevs") or {},
                variances=s.get("variances") or {},
            )
            if s["join_type"] == "inner":
                return IncrementalComposedJoinAggView(
                    *args, **kw, **extra
                )
            return IncrementalComposedOuterJoinAggView(
                *args, **kw, **extra, join_type=s["join_type"]
            )
        cls = {
            "inner": IncrementalJoinAggView,
            "left": IncrementalLeftJoinAggView,
            "full": IncrementalFullJoinAggView,
        }[s["join_type"]]
        return cls(*args, **kw, group_keys=s["group_keys"], sums=s["sums"])

    def _build_chain(self, s: dict, state: str, flt):
        """Compile a chained-JOIN spec onto cascaded INNER join views:
        stages ``j1 … j(k-1)`` materialize intermediates under the view
        root, the final stage (plain join / join-agg / composed
        join-agg) lands at ``state/``. The WHERE predicate applies at
        the FINAL stage only — σ over the complete joined row, correct
        for INNER chains because selection commutes with every signed
        delta term (the intermediates deliberately keep σ-failing rows:
        a row entering the predicate later must still find its join
        partners)."""
        roots, ons, pks = s["table_roots"], s["ons"], s["pks"]
        last_jt = s.get("last_join_type", "inner")
        stages: list = []
        left_root, left_pks = roots[0], [pks[0]]
        n = len(roots)
        for i in range(1, n):
            on, right_root, rpk = ons[i - 1], roots[i], pks[i]
            if i < n - 1:
                # an OUTER final stage needs a SINGLE left pk: the last
                # intermediate synthesizes one (__lk, the JSON render of
                # its pk tuple — dropped from the visible read)
                synth = (
                    "__lk" if i == n - 2 and last_jt != "inner" else None
                )
                j = IncrementalJoinView(
                    self.spark, left_root, right_root,
                    os.path.join(self.root, f"j{i}"),
                    on=on, left_pk=list(left_pks), right_pk=rpk,
                    synth_pk=synth,
                )
                stages.append(j)
                left_root = j.view_root
                left_pks = list(dict.fromkeys([*left_pks, rpk]))
                continue
            args = (self.spark, left_root, right_root, state)
            if last_jt == "inner":
                kw = dict(on=on, left_pk=list(left_pks), right_pk=rpk)
            else:
                kw = dict(on=on, left_pk="__lk", right_pk=rpk)
            if flt is not None:
                kw["filter"] = flt
            if s["kind"] == "join_chain":
                cls = {
                    "inner": IncrementalJoinView,
                    "left": IncrementalLeftJoinView,
                    "full": IncrementalFullJoinView,
                }[last_jt]
                stages.append(cls(*args, **kw))
            elif s.get("materialize_join"):
                extra = dict(
                    group_keys=s["group_keys"], sums=s["sums"],
                    mins=s.get("mins") or {},
                    maxs=s.get("maxs") or {},
                    distincts=s.get("distincts") or {},
                    avgs=s.get("avgs") or {},
                    stddevs=s.get("stddevs") or {},
                    variances=s.get("variances") or {},
                )
                if last_jt == "inner":
                    stages.append(
                        IncrementalComposedJoinAggView(
                            *args, **kw, **extra
                        )
                    )
                else:
                    stages.append(
                        IncrementalComposedOuterJoinAggView(
                            *args, **kw, **extra, join_type=last_jt
                        )
                    )
            else:
                cls = {
                    "inner": IncrementalJoinAggView,
                    "left": IncrementalLeftJoinAggView,
                    "full": IncrementalFullJoinAggView,
                }[last_jt]
                stages.append(
                    cls(
                        *args, **kw,
                        group_keys=s["group_keys"], sums=s["sums"],
                    )
                )
        return _JoinChain(self.spark, roots, stages)

    # -- operations ----------------------------------------------------------
    def refresh(self, cascade: bool = False, _seen: set | None = None) -> int:
        """One incremental refresh; returns the view's state version.

        ``cascade=True`` refreshes upstream materialized views first
        (depth-first over the persisted ``deps``, each upstream opened
        from its own ``_mv.json``), so a chain
        ``base tables → join view → aggregate view`` drains end-to-end
        in ONE statement. A visited set keyed by realpath guards
        diamond dependencies — each view refreshes at most once per
        cascade."""
        if cascade and self.spec.get("deps"):
            seen = _seen if _seen is not None else set()
            seen.add(os.path.realpath(self.root))
            for dep_root in self.spec["deps"].values():
                rp = os.path.realpath(dep_root)
                if rp in seen:
                    continue
                seen.add(rp)
                MaterializedView.open(self.spark, dep_root).refresh(
                    cascade=True, _seen=seen
                )
        self._view.refresh()
        if self.spec.get("rendered"):
            # a downstream view consumes rendered/'s change feed — keep
            # it lockstep with the state it projects
            self.refresh_rendered()
        return self.state_version()

    def _main_state_root(self) -> str:
        """The versioned table holding the view's MAIN maintained state
        (the one whose commit marks define freshness — and whose change
        feed identifies the groups a rendered-projection refresh must
        re-render)."""
        s = self.spec
        sub = {
            "agg": "state",
            "join": "state",
            "join_agg": "state",
            "join_chain": "state",
            "join_chain_agg": "state",
        }[s["kind"]]
        root = os.path.join(self.root, sub)
        jt = (
            s.get("last_join_type", "inner")
            if s["kind"].startswith("join_chain")
            else s.get("join_type")
        )
        if s["kind"] in ("join", "join_chain") and jt != "inner":
            root = os.path.join(root, "inner")
        elif s["kind"].endswith("agg") and s.get("materialize_join"):
            root = os.path.join(root, "state")  # composed: agg state
        elif s["kind"] in ("join_agg", "join_chain_agg") and jt != "inner":
            root = os.path.join(root, "agg")
        return root

    def state_version(self) -> int:
        return VersionedTable(
            self.spark, self._main_state_root()
        ).latest_version()

    # -- rendered projection (aggregate views as MV upstreams) ---------------
    #
    # An aggregate view's STATE table is NOT its SQL-visible rows (hidden
    # `_n`/`_nn_*`/`__ac_*` accumulators; HAVING applied at read; COUNT
    # alias renames), so its change feed cannot feed a downstream view
    # directly. The RENDERED projection closes that gap: `rendered/`
    # under the view root is a versioned table holding EXACTLY the
    # view's visible rows (read()'s output — aliases applied, internals
    # dropped, HAVING honored), keyed by the group-key columns and
    # maintained from the agg state table's CDC. A downstream
    # `CREATE MATERIALIZED VIEW monthly AS SELECT ... FROM daily ...`
    # then consumes rendered/'s change feed like any table's — the
    # rollup-pyramid composition (daily → monthly → ...).
    #
    # Refresh is delta-scoped: the state feed names the affected groups
    # (∝ |Δ|), read() re-renders ONLY those groups (leftsemi on the
    # keys), and groups with no surviving visible row (count hit zero,
    # or the group crossed the HAVING boundary) leave via merge deletes.
    # The one state-sized term is read()'s scan — the same envelope the
    # agg refresh itself pays for its delta-state join. Group keys must
    # be NON-NULL, the same contract the underlying view's merge already
    # imposes (SQL-MERGE equality never matches NULL); that is why the
    # rendered upstream form is limited to aggregate kinds whose group
    # keys obey it (single-table aggregates and INNER join aggregates).
    def rendered_root(self) -> str:
        return os.path.join(self.root, "rendered")

    def _rendered_keys(self) -> list[str]:
        s = self.spec
        if s["kind"] == "agg":
            ks = s["keys"]
        else:
            ks = s["group_keys"]
        # dict-form computed keys iterate as their aliases, which is
        # exactly the rendered table's column names — list() covers
        # both the list and dict spec shapes.
        return list(ks)

    def _rendered_null_safe(self) -> bool:
        """OUTER-join aggregates group padded rows under NULL keys, so
        the rendered projection keys by the hidden ``__gid`` (the
        null-safe JSON group id the agg STATE already stores) instead
        of the key columns (SQL-MERGE equality never matches NULL)."""
        s = self.spec
        if s["kind"] == "agg":
            return False
        jt = (
            s.get("last_join_type", "inner")
            if s["kind"].startswith("join_chain")
            else s.get("join_type", "inner")
        )
        return jt != "inner"

    def _rendered_gid(self, df: DataFrame) -> DataFrame:
        from datalakeingestionservice_spark.sinks.incremental_view import (
            _GID_JSON_OPTS,
        )

        return df.withColumn(
            "__gid",
            F.to_json(
                F.struct(
                    *[F.col(k) for k in self._rendered_keys()]
                ),
                _GID_JSON_OPTS,
            ),
        )

    # -- rendered projection for SELECT * OUTER views -------------------------
    def _outer_parts(self) -> dict[str, str]:
        """name -> state-table root whose change feed identifies
        affected visible rows of a SELECT * OUTER view (the visible
        relation spans 2-3 state tables)."""
        s = self.spec
        state = os.path.join(self.root, "state")
        jt = (
            s.get("last_join_type", "inner")
            if s["kind"].startswith("join_chain")
            else s.get("join_type", "inner")
        )
        parts = {
            "inner": os.path.join(state, "inner"),
            "padded": os.path.join(state, "padded"),
        }
        if jt == "full":
            parts["rpadded"] = os.path.join(state, "rpadded")
        return parts

    def _rendered_pks(self) -> list[str]:
        """The pk pair identifying a visible outer row: (left_pk,
        right_pk) for two-table views; (__lk, last_pk) for outer-final
        chains (the synthesized intermediate pk — an internal column,
        so chain rendered rows carry it)."""
        s = self.spec
        if s["kind"] == "join":
            return [s["left_pk"], s["right_pk"]]
        return ["__lk", s["pks"][-1]]

    def _outer_raw_rows(self) -> DataFrame:
        """The view's visible rows WITH the pk columns rendered
        projection needs — for outer-final chains that means keeping
        the internal __lk the user-facing read() drops."""
        return self._view.read()

    def _refresh_rendered_outer(self) -> None:
        """Rendered projection of a SELECT * OUTER view: one versioned
        table holding every visible (padded) join row, keyed by the
        null-safe __gid of the pk pair, maintained from the 2-3 state
        tables' OWN change feeds (a pad↔match transition arrives as a
        padded-table delete + an inner-table insert; both name the
        affected gid). Marks: a per-state-table version dict in the
        rendered commit summary.

        Scale contract: after bootstrap, a refresh derives its merge
        input from the CHANGE ROWS ALONE — SELECT * deltas carry the
        full visible payload, so the replacement rows are the final
        image per gid of each feed (one window over O(|Δ|) rows), and
        NO state table is re-read (spy-pinned in
        tests/test_matview_rollup.py). A gid's visible row lives in
        exactly one state table (the NULL-pattern of the pk pair picks
        the table), so per-table final images compose without
        cross-table reconciliation. Because the feeds are
        version-bounded at the recorded marks, the merged rows are
        exactly the state at `latests` — the outer path has no
        unpinned-read race."""
        from pyspark.sql.types import StructType
        from pyspark.sql.window import Window

        from datalakeingestionservice_spark.sinks.incremental_view import (
            _GID_JSON_OPTS,
        )
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
            NoSuchVersionError,
        )

        parts = {
            n: VersionedTable(self.spark, r)
            for n, r in self._outer_parts().items()
        }
        latests = {n: t.latest_version() for n, t in parts.items()}
        pks = self._rendered_pks()
        # Visible schema == the INNER state table's schema (padded
        # sides render as NULL-extensions of it) — read from the
        # manifest so the incremental path never constructs a
        # state-table scan.
        vis_fields = StructType.fromDDL(
            parts["inner"].manifest().schema_ddl
        ).fields
        pk_types = {
            f.name: f.dataType for f in vis_fields if f.name in pks
        }

        def gid(df: DataFrame) -> DataFrame:
            # feed rows may lack a pk column (the padded table stores
            # one side's rows): NULL-fill with the visible type so the
            # encoding matches the base rows' byte-for-byte
            fields = [
                (
                    F.col(k).cast(pk_types[k])
                    if k in df.columns
                    else F.lit(None).cast(pk_types[k])
                ).alias(k)
                for k in pks
            ]
            return df.withColumn(
                "__gid", F.to_json(F.struct(*fields), _GID_JSON_OPTS)
            )

        def to_visible(df: DataFrame) -> DataFrame:
            # Conform a state table's (change) rows to the visible
            # schema: padded feeds lack the other side's non-join
            # columns — NULL-extend with the visible types, exactly as
            # read() renders them. CDF bookkeeping columns ride along.
            keep = [
                c
                for c in ("_change_type", "_commit_version")
                if c in df.columns
            ]
            return df.select(
                *[
                    (
                        F.col(f.name).cast(f.dataType)
                        if f.name in df.columns
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in vis_fields
                ],
                *keep,
            )

        try:
            rend = VersionedTable(self.spark, self.rendered_root())
        except NoSuchVersionError:
            VersionedTable.create(
                self.spark,
                self.rendered_root(),
                gid(to_visible(self._outer_raw_rows())),
                summary={"state_versions": latests},
                optimize_write=True,
            )
            return
        last = None
        for m in reversed(rend.versions()):
            if "state_versions" in m.summary:
                last = m.summary["state_versions"]
                break
        if last is None:
            raise NoSuchVersionError(
                f"{self.rendered_root()}: no state_versions mark"
            )
        for _ in range(4):
            if all(latests[n] <= last.get(n, 0) for n in parts):
                return
            rv = rend.latest_version()
            affected = None
            live = None
            for n, t in parts.items():
                a, b = last.get(n, 0), latests[n]
                if b <= a:
                    continue
                ch = gid(to_visible(t.changes(a, b)))
                piece = ch.select("__gid").distinct()
                affected = (
                    piece
                    if affected is None
                    else affected.unionByName(piece).distinct()
                )
                # Final image per gid within this feed: latest commit
                # wins; within one commit an update's insert (new
                # image) outranks its delete (old image). The gid is
                # live iff its final event is an insert.
                w = Window.partitionBy("__gid").orderBy(
                    F.col("_commit_version").desc(),
                    F.when(
                        F.col("_change_type") == "insert", 0
                    ).otherwise(1),
                )
                img = (
                    ch.withColumn("__rn", F.row_number().over(w))
                    .where(
                        (F.col("__rn") == 1)
                        & (F.col("_change_type") == "insert")
                    )
                    .drop("__rn", "_change_type", "_commit_version")
                )
                live = (
                    img if live is None else live.unionByName(img)
                )
            new = live
            types = {f.name: f.dataType for f in new.schema.fields}
            gone = affected.join(
                new.select("__gid"), "__gid", "left_anti"
            )
            dels = gone.select(
                *[
                    F.col(c).alias(c)
                    if c == "__gid"
                    else F.lit(None).cast(t).alias(c)
                    for c, t in types.items()
                ]
            ).withColumn("__is_delete", F.lit(True))
            ups = new.withColumn("__is_delete", F.lit(False))
            try:
                rend.merge(
                    ups.unionByName(dels),
                    ["__gid"],
                    delete_col="__is_delete",
                    summary={"state_versions": latests},
                    expected_version=rv,
                )
                return
            except ConcurrentCommitError:
                for m in reversed(rend.versions()):
                    if "state_versions" in m.summary:
                        last = m.summary["state_versions"]
                        break
                continue
        raise ConcurrentCommitError(
            f"{self.rendered_root()}: merge lost every retry"
        )

    def _persist_spec(self) -> None:
        tmp = os.path.join(self.root, _SPEC_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self.spec, f, indent=1)
        os.replace(tmp, os.path.join(self.root, _SPEC_FILE))

    def ensure_rendered(self) -> str:
        """Enable + bring current the rendered projection; returns its
        root. Persists ``"rendered": true`` into `_mv.json`, so EVERY
        later refresh of this view — from any session or handle — also
        refreshes rendered/ (a downstream view's freshness must not
        depend on which handle refreshed its upstream)."""
        s = self.spec
        agg_kinds = ("agg", "join_agg", "join_chain_agg")
        outer_star = s["kind"] in ("join", "join_chain") and (
            s.get("last_join_type", "inner")
            if s["kind"].startswith("join_chain")
            else s.get("join_type", "inner")
        ) != "inner"
        if s["kind"] not in agg_kinds and not outer_star:
            raise MaterializedViewError(
                f"rendered projection applies to aggregate views and "
                f"SELECT * OUTER views (kind {s['kind']}): INNER join "
                "views feed downstream views from their state table "
                "directly"
            )
        if not self.spec.get("rendered"):
            self.spec["rendered"] = True
            if os.path.exists(os.path.join(self.root, _SPEC_FILE)):
                self._persist_spec()
        self.refresh_rendered()
        return self.rendered_root()

    def refresh_rendered(self) -> None:
        """Bring rendered/ to the main state table's latest version.
        Idempotent (the `state_version` mark in the rendered table's
        commit summary is the truth); concurrent-safe the same way the
        view family is (expected_version + retry).

        Scale audit (aggregate kinds): the refresh re-renders affected
        groups from `self.read()` — a scan of the AGG STATE table,
        which holds one row per group. That is the one state-sized
        term in the pyramid's refresh, and it is groups-sized by
        construction (bounded by key cardinality, not corpus rows), so
        it does NOT invert the CDC promise the way a row-sized scan
        would: at 100x corpus volume the agg state grows only with
        distinct keys. SELECT * OUTER row views — where the state IS
        row-sized — take `_refresh_rendered_outer`, which builds the
        merge input from the change rows alone and never re-reads a
        state table.

        Unpinned-read race (agg path): `self.read()` is evaluated at
        merge time against the LATEST state, while the mark records
        `sv` captured at entry. A concurrent upstream refresh between
        the two can leave rendered rows newer than the mark. The loop
        below re-checks the state version after a successful merge and
        immediately re-refreshes when it moved, so the mixed window
        closes within this call instead of waiting for the next
        refresh; the final commit's rows and mark always agree."""
        from datalakeingestionservice_spark.sinks.versioned import (
            ConcurrentCommitError,
            NoSuchVersionError,
        )

        if self.spec["kind"] in ("join", "join_chain"):
            # SELECT * OUTER views: 2-3 state-table feeds, pk-pair gid
            return self._refresh_rendered_outer()
        st = VersionedTable(self.spark, self._main_state_root())
        sv = st.latest_version()
        null_safe = self._rendered_null_safe()
        keys = ["__gid"] if null_safe else self._rendered_keys()

        def _vis(df: DataFrame) -> DataFrame:
            # null-safe kinds carry the hidden __gid merge key in the
            # rendered table (the agg STATE stores the same encoding,
            # so the feed's gids and the re-rendered rows' gids match
            # byte-for-byte); inner kinds stay pure visible rows.
            return self._rendered_gid(df) if null_safe else df

        try:
            rend = VersionedTable(self.spark, self.rendered_root())
        except NoSuchVersionError:
            VersionedTable.create(
                self.spark,
                self.rendered_root(),
                _vis(self.read()),
                summary={"state_version": sv},
                optimize_write=True,
            )
            return
        last = None
        for m in reversed(rend.versions()):
            if "state_version" in m.summary:
                last = m.summary["state_version"]
                break
        if last is None:
            raise NoSuchVersionError(
                f"{self.rendered_root()}: no state_version mark"
            )
        for _ in range(4):
            if sv <= last:
                return
            rv = rend.latest_version()
            affected = st.changes(last, sv).select(*keys).distinct()
            new = _vis(self.read()).join(affected, keys, "leftsemi")
            types = {f.name: f.dataType for f in new.schema.fields}
            gone = affected.join(new.select(*keys), keys, "left_anti")
            dels = gone.select(
                *[
                    F.col(c).alias(c)
                    if c in keys
                    else F.lit(None).cast(t).alias(c)
                    for c, t in types.items()
                ]
            ).withColumn("__is_delete", F.lit(True))
            ups = new.withColumn("__is_delete", F.lit(False))
            try:
                rend.merge(
                    ups.unionByName(dels),
                    keys,
                    delete_col="__is_delete",
                    summary={"state_version": sv},
                    expected_version=rv,
                )
                # read() evaluated against latest state during the
                # merge; if the state moved past sv meanwhile, the
                # committed rows may already reflect the newer state
                # while the mark says sv — re-refresh NOW so rows and
                # mark agree before this call returns (docstring:
                # unpinned-read race).
                sv2 = st.latest_version()
                if sv2 <= sv:
                    return
                last, sv = sv, sv2
                continue
            except ConcurrentCommitError:
                for m in reversed(rend.versions()):
                    if "state_version" in m.summary:
                        last = m.summary["state_version"]
                        break
                continue
        raise ConcurrentCommitError(
            f"{self.rendered_root()}: merge lost every retry"
        )

    def read(self) -> DataFrame:
        """The view in its SQL-visible shape: GROUP BY keys + aliased
        aggregates (internal `_n` renamed to the COUNT(*) alias and
        dropped if the SELECT didn't ask for it), or the whole join
        rows for SELECT * views."""
        s = self.spec
        df = self._view.read()
        if s["kind"] in ("join", "join_chain"):
            # __lk is the synthesized intermediate pk behind an
            # outer-final chain — internal, not a SQL-visible column
            return df.drop("__lk") if "__lk" in df.columns else df
        keys = s["keys"] if s["kind"] == "agg" else s["group_keys"]
        cols = [F.col(k) for k in keys]
        if s["count_alias"]:
            cols.append(F.col("_n").alias(s["count_alias"]))
        cols += [F.col(c) for c in s["sums"]]
        if s["kind"] == "agg" or s.get("materialize_join"):
            cols += [F.col(c) for c in s["mins"]]
            cols += [F.col(c) for c in s["maxs"]]
            cols += [F.col(c) for c in s.get("distincts") or {}]
            cols += [F.col(c) for c in s.get("avgs") or {}]
            cols += [F.col(c) for c in s.get("stddevs") or {}]
            cols += [F.col(c) for c in s.get("variances") or {}]
        out = df.select(*cols)
        if s.get("having"):
            # HAVING is a read-time filter over the MAINTAINED groups
            # (the state keeps every group; a group crossing the HAVING
            # boundary appears/disappears without state churn). It
            # references the SELECT's output aliases, SQL NULL->excluded.
            out = out.filter(
                F.coalesce(F.expr(s["having"]), F.lit(False))
            )
        return out

    def start_continuous_refresh(self, checkpoint_dir: str, **kw):
        return self._view.start_continuous_refresh(checkpoint_dir, **kw)
