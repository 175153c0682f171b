"""SQL DML statements over versioned lake tables.

The reference service's ingestion surface executes raw SQL — including
DML — against its server RDBMS (`src/Infrastructure/DataExtraction/
SqlServerDataSource.cs:20-73` runs whatever statement the dataset config
carries). This module is the lake-native equivalent: a small front door
that parses one DML statement and routes it to the engine's native
operations, so a user migrating a config full of UPDATE/DELETE/INSERT
statements keeps running them verbatim:

    execute_dml(spark, "UPDATE trades SET price = price * 1.1 "
                       "WHERE region = 'EU'",
                tables={"trades": "/lake/trades"})

Supported statements (one per call):

- ``UPDATE <t> SET col = expr[, ...] [WHERE pred]`` →
  :meth:`VersionedTable.update_where` (TRUE-only SQL match). When the
  WHERE is a conjunction of simple ``col op literal`` comparisons it
  compiles to the TRIPLE form — the rewrite is stats-scoped to the
  affected partitions/files; anything else falls back to a full-scan
  COW rewrite with identical results.
- ``DELETE FROM <t> [WHERE pred]`` → scoped triple-form
  :meth:`VersionedTable.delete_where` when compilable, else a COW
  delete under SQL semantics (TRUE rows deleted, NULL rows kept — the
  predicate is NULL-guarded before the legacy Column path). A bare
  ``DELETE FROM t`` truncates (commits an empty snapshot).
- ``INSERT INTO <t> [(col, ...)] VALUES (...), (...)`` and
  ``INSERT INTO <t> [(col, ...)] SELECT ...`` →
  :meth:`VersionedTable.append`. VALUES/SELECT run through `spark.sql`
  (SELECT resolves against the session's registered views), columns
  map positionally — or by the explicit column list — onto the table
  schema, absent columns fill with typed NULLs, and every value casts
  to the table column's type.

- ``MERGE INTO <t> USING <view> ON t.k = s.k ... UPDATE SET * /
  INSERT * [/ flag-guarded DELETE]`` → :meth:`VersionedTable.merge`
  (see :func:`execute_merge` for the exact subset).
- ``EXPLAIN [FORMATTED|EXTENDED] <SELECT ...>`` → one-row plan-text
  DataFrame (:func:`execute_explain`) — the resolved Spark plan of the
  front-door SELECT, time travel/branches/TVF included; non-SELECT
  bodies refuse (engine statements are not Spark plans).
- ``DESCRIBE HISTORY <t> [LIMIT n]`` / ``DESCRIBE DETAIL <t>`` →
  metadata DataFrames (:func:`execute_describe`), Delta's
  introspection statements over the manifest — never touch data.
- ``RESTORE [TABLE] <t> TO VERSION AS OF n | TIMESTAMP AS OF '<iso>'``
  → :meth:`VersionedTable.restore` (a new commit of the pinned
  snapshot; the undone versions stay time-travelable).
- ``CREATE SEARCH INDEX <n> ON <t> (<id>, <text>) LOCATION '...'`` /
  ``REFRESH SEARCH INDEX`` / ``DROP SEARCH INDEX`` /
  ``SEARCH <n> FOR '<terms>' [TOP k] [REQUIRE ALL]`` /
  ``ALTER SEARCH INDEX <n> START|STOP CONTINUOUS REFRESH`` /
  ``ALTER SEARCH INDEX <n> REBUILD [BUCKETS n] [WITH POSITIONS]``
  (legacy-layout migration: re-bootstrap at the preserved high-water
  mark, atomic swap) → the incrementally-maintained BM25 index
  (`sinks/bm25_index.py`), served from maintained postings/df/corpus
  stats.
- ``ALTER TABLE <t> RENAME COLUMN a TO b | DROP COLUMN c |
  ADD CONSTRAINT name CHECK (expr) | DROP CONSTRAINT name`` →
  the metadata-only column-mapping / constraint commits.

Everything else (multi-statement scripts, DDL, out-of-subset MERGE
forms) raises ``UnsupportedStatementError`` — the native APIs cover
those with more control than statements would.

WHERE-clause semantics are SQL throughout: rows are affected only where
the predicate is TRUE; NULL/FALSE rows are untouched.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakeingestionservice_spark.sinks.versioned import VersionedTable


class UnsupportedStatementError(ValueError):
    """Statement outside the supported DML subset."""


def _strip(sql: str) -> str:
    return sql.strip().rstrip(";").strip()


def _mask_literals(sql: str) -> str:
    """Same-length copy of `sql` with the INTERIOR of quoted string
    literals ('…' / "…", with backslash and doubled-quote escapes)
    replaced by NUL bytes and comments (`-- …\\n`, `/* … */`) replaced
    by spaces. Structural regexes (table-reference rewrite) run over
    the masked text so a literal containing e.g. `FROM trades` can
    never be mistaken for a table reference — refuse-never-reinterpret
    extends to quoted text. Because lengths are preserved, match spans
    index straight back into the original statement, so extracted
    group text (names, versions, quoted timestamps) is read from the
    ORIGINAL, unmasked characters."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in ("'", '"'):
            q, i = c, i + 1
            while i < n:
                if sql[i] == "\\" and i + 1 < n:
                    out[i] = out[i + 1] = "\x00"
                    i += 2
                    continue
                if sql[i] == q:
                    if i + 1 < n and sql[i + 1] == q:  # doubled escape
                        out[i] = out[i + 1] = "\x00"
                        i += 2
                        continue
                    i += 1
                    break
                out[i] = "\x00"
                i += 1
        elif c == "-" and sql[i : i + 2] == "--":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
        elif c == "/" and sql[i : i + 2] == "/*":
            out[i] = out[i + 1] = " "
            i += 2
            while i < n:
                if sql[i : i + 2] == "*/":
                    out[i] = out[i + 1] = " "
                    i += 2
                    break
                out[i] = " "
                i += 1
        else:
            i += 1
    return "".join(out)


def _resolve(
    spark: SparkSession, name: str, tables: dict
) -> VersionedTable:
    if name not in tables:
        raise UnsupportedStatementError(
            f"unknown table {name!r} (registered: {sorted(tables)})"
        )
    t = tables[name]
    if isinstance(t, VersionedTable):
        return t
    if _is_mv(t):
        raise UnsupportedStatementError(
            f"{name!r} is a materialized view — read-only through the "
            "front door; DML its SOURCE tables and REFRESH"
        )
    return VersionedTable(spark, t)


def _where_triples(where: str, t: VersionedTable) -> list | None:
    """Compile a WHERE clause to the scoped triple form when it is a
    pure conjunction of `col op literal` comparisons on the table's
    schema; None → caller falls back to the Column path (same result,
    unscoped rewrite)."""
    from datalakeingestionservice_spark.sources.sql_predicates import (
        UnsupportedPredicateError,
        parse_predicate,
    )

    try:
        ast = parse_predicate(where)
    except UnsupportedPredicateError:
        return None
    import datetime as _dt
    from decimal import Decimal

    m = t.manifest()
    types = {}
    from pyspark.sql.types import StructType

    for f in StructType.fromDDL(m.schema_ddl).fields:
        types[f.name] = f.dataType.simpleString()

    def lit_value(lit: list, col_type: str):
        tag, v = lit[0], lit[1]
        if tag == "n":
            if col_type.startswith("decimal"):
                return Decimal(v)
            return (
                float(v) if ("." in v or "e" in v.lower()) else int(v)
            )
        if tag == "d" or (tag == "s" and col_type == "date"):
            return _dt.date.fromisoformat(v)
        if tag == "t" or (
            tag == "s" and col_type.startswith("timestamp")
        ):
            return _dt.datetime.fromisoformat(v)
        if tag == "s":
            return v
        return None  # booleans etc.: not worth the triple path

    triples: list = []

    def walk(node: list) -> bool:
        if node[0] == "and":
            return walk(node[1]) and walk(node[2])
        if node[0] == "cmp" and node[1] in ("=", "<", "<=", ">", ">="):
            colx, lit = node[2], node[3]
            if not isinstance(colx, str) or colx not in types:
                return False
            v = lit_value(lit, types[colx])
            if v is None:
                return False
            triples.append((colx, node[1], v))
            return True
        return False

    return triples if walk(ast) else None


def _qcol(df, name: str):
    """Column of `df` by EXACT name, backtick-quoted: an unaliased
    literal SELECT yields names like '3.5' that a bare F.col / getitem
    lookup would parse as a struct path."""
    return df["`" + name.replace("`", "``") + "`"]


def _positional_append(
    spark: SparkSession,
    t: VersionedTable,
    df: DataFrame,
    cols: list[str] | None,
) -> int:
    """Map `df` onto the table schema (positionally, or via the INSERT
    column list); absent columns fill their WRITE default when one is
    declared (`ALTER COLUMN ... SET DEFAULT`) and NULL otherwise; cast
    everything."""
    from pyspark.sql.types import StructType

    m = t.manifest()
    schema = StructType.fromDDL(m.schema_ddl)
    names = [f.name for f in schema.fields]
    target = cols if cols is not None else names[: len(df.columns)]
    unknown = [c for c in target if c not in names]
    if unknown:
        raise UnsupportedStatementError(
            f"INSERT column(s) {unknown} not in table schema {names}"
        )
    if len(df.columns) != len(target):
        raise UnsupportedStatementError(
            f"INSERT provides {len(df.columns)} values for "
            f"{len(target)} column(s)"
        )
    src = dict(zip(target, df.columns))
    types = {f.name: f.dataType for f in schema.fields}
    wd = m.write_defaults

    def absent(c):
        return (
            F.expr(wd[c]) if c in wd else F.lit(None)
        ).cast(types[c]).alias(c)

    out = df.select(
        *[
            _qcol(df, src[c]).cast(types[c]).alias(c)
            if c in src
            else absent(c)
            for c in names
        ]
    )
    return t.append(out)


_UPDATE_RE = re.compile(
    r"^UPDATE\s+(?P<name>[A-Za-z_][\w.]*)\s+SET\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^DELETE\s+FROM\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^INSERT\s+INTO\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s*\((?P<cols>[^)]*)\))?\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_OVERWRITE_RE = re.compile(
    r"^INSERT\s+OVERWRITE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_][\w.]*)"
    r"\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_REPLACE_WHERE_RE = re.compile(
    r"^INSERT\s+INTO\s+(?P<name>[A-Za-z_][\w.]*)"
    r"\s+REPLACE\s+WHERE\s+(?P<where>.+?)"
    r"\s+(?P<rest>(?:SELECT|WITH|VALUES|\().+)$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE_RE = re.compile(
    r"^OPTIMIZE\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+ZORDER\s+BY\s+\(?(?P<zcols>[^)]+?)\)?)?$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM_RE = re.compile(
    r"^VACUUM\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+RETAIN\s+(?P<keep>\d+)\s+VERSIONS)?$",
    re.IGNORECASE,
)
_DESCRIBE_RE = re.compile(
    r"^DESC(?:RIBE)?\s+(?P<what>HISTORY|DETAIL)\s+"
    r"(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?$",
    re.IGNORECASE,
)
_CREATE_TABLE_RE = re.compile(
    r"^CREATE\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+USING\s+VERSIONED\s+"
    r"LOCATION\s+'(?P<loc>[^']+)'"
    r"(?:\s+PARTITIONED\s+BY\s+\((?P<pb>[^)]+)\))?"
    r"\s+AS\s+(?P<rest>(?:SELECT|WITH)\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE_RE = re.compile(
    r"^DROP\s+TABLE\s+(?P<name>[A-Za-z_]\w*)$", re.IGNORECASE
)
_CREATE_MV_RE = re.compile(
    r"^CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"LOCATION\s+'(?P<loc>[^']+)'"
    r"(?:\s+PRIMARY\s+KEY\s*\(\s*(?P<pks>[A-Za-z_]\w*"
    r"(?:\s*,\s*[A-Za-z_]\w*)+)\s*\))?"
    r"\s+AS\s+(?P<rest>SELECT\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV_RE = re.compile(
    r"^REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+(?P<cascade>CASCADE))?$",
    re.IGNORECASE,
)
_DROP_MV_RE = re.compile(
    r"^DROP\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_START_CR_RE = re.compile(
    r"^ALTER\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"START\s+CONTINUOUS\s+REFRESH\s+CHECKPOINT\s+'(?P<ck>[^']+)'$",
    re.IGNORECASE,
)
_STOP_CR_RE = re.compile(
    r"^ALTER\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"STOP\s+CONTINUOUS\s+REFRESH$",
    re.IGNORECASE,
)
#: SEARCH INDEX statements (E129 at the statement surface): a
#: maintained BM25 index over a registered table's change feed —
#: CREATE [BUCKETS n] [WITH POSITIONS] bootstraps + persists
#: `_bm25.json` at LOCATION, REFRESH drains the feed, SEARCH ranks
#: from the maintained postings (`SEARCH idx FOR '"exact phrase"'`
#: serves phrase queries from a WITH POSITIONS index — adjacency over
#: the maintained offsets; an index without positions refuses with
#: the rebuild recipe), DROP deregisters (state stays), ALTER ...
#: START/STOP CONTINUOUS REFRESH manages the per-process stream
#: registry exactly like the MV form.
_CREATE_SIDX_RE = re.compile(
    r"^CREATE\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)\s+ON\s+"
    r"(?P<table>[A-Za-z_]\w*)\s*\(\s*(?P<id>[A-Za-z_]\w*)\s*,\s*"
    r"(?P<text>[A-Za-z_]\w*)\s*\)\s+LOCATION\s+'(?P<loc>[^']+)'"
    r"(?:\s+BUCKETS\s+(?P<buckets>\d+))?"
    r"(?:\s+(?P<pos>WITH\s+POSITIONS))?$",
    re.IGNORECASE,
)
_REFRESH_SIDX_RE = re.compile(
    r"^REFRESH\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_DROP_SIDX_RE = re.compile(
    r"^DROP\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_SIDX_CR_RE = re.compile(
    r"^ALTER\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"(?P<verb>START|STOP)\s+CONTINUOUS\s+REFRESH"
    r"(?:\s+CHECKPOINT\s+'(?P<ck>[^']+)')?$",
    re.IGNORECASE,
)
#: `ALTER SEARCH INDEX <n> REBUILD [BUCKETS n] [WITH POSITIONS]` —
#: migrate a legacy-layout index (pre-bucketing, or positionless)
#: into the pruned-serving layout in place: re-bootstrap at the
#: index's current high-water mark, atomic swap, spec + mark
#: preserved. Refuses while the index runs continuous refresh in
#: this process (stream merges would race the swap).
_SIDX_REBUILD_RE = re.compile(
    r"^ALTER\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)\s+REBUILD"
    r"(?:\s+BUCKETS\s+(?P<buckets>\d+))?"
    r"(?:\s+(?P<pos>WITH\s+POSITIONS))?$",
    re.IGNORECASE,
)
_SEARCH_RE = re.compile(
    r"^SEARCH\s+(?P<name>[A-Za-z_]\w*)\s+FOR\s+'(?P<q>[^']*)'"
    r"(?:\s+TOP\s+(?P<k>\d+))?(?:\s+(?P<all>REQUIRE\s+ALL))?$",
    re.IGNORECASE,
)

_MV_STMT_RES = (
    _CREATE_MV_RE, _REFRESH_MV_RE, _DROP_MV_RE, _START_CR_RE, _STOP_CR_RE,
    _CREATE_SIDX_RE, _REFRESH_SIDX_RE, _DROP_SIDX_RE, _SIDX_CR_RE,
    _SIDX_REBUILD_RE,
)

#: Live continuous-refresh handles, keyed by the view root's realpath.
#: Streaming query handles are PROCESS state — they cannot persist in
#: `_mv.json` (a handle is not serializable and dies with the session),
#: so START/STOP are per-process statements: START refuses if the view
#: already runs here, STOP refuses if it doesn't. After a process
#: restart the checkpoints make a new START resume exactly (the marks,
#: not the stream offsets, are the truth — see the view classes).
_CR_REGISTRY: dict = {}


def _cr_running(rp: str) -> bool:
    """True iff the view at realpath `rp` has LIVE continuous-refresh
    streams. A query that died on its own (exception in foreachBatch)
    leaves a stale registry entry; treating it as running would block
    DROP and a re-START with 'already runs' for streams that no longer
    exist (ADVICE r11) — prune dead entries on consultation instead."""
    qs = _CR_REGISTRY.get(rp)
    if qs is None:
        return False
    if any(q.isActive for q in qs):
        return True
    _CR_REGISTRY.pop(rp, None)
    return False


def _is_mv(value) -> bool:
    from datalakeingestionservice_spark.sinks.matview import (
        MaterializedView,
    )

    return isinstance(value, MaterializedView) or MaterializedView.exists(
        value
    )


def _resolve_mv(spark: SparkSession, name: str, tables: dict):
    from datalakeingestionservice_spark.sinks.matview import (
        MaterializedView,
    )

    if name not in tables:
        raise UnsupportedStatementError(
            f"unknown materialized view {name!r} "
            f"(registered: {sorted(tables)})"
        )
    v = tables[name]
    if isinstance(v, MaterializedView):
        return v
    if MaterializedView.exists(v):
        return MaterializedView.open(spark, v)
    raise UnsupportedStatementError(
        f"{name!r} is a table, not a materialized view"
    )


def _resolve_sidx(spark: SparkSession, name: str, tables: dict):
    from datalakeingestionservice_spark.sinks.bm25_index import (
        IncrementalBM25Index,
    )

    if name not in tables:
        raise UnsupportedStatementError(
            f"unknown search index {name!r} "
            f"(registered: {sorted(tables)})"
        )
    v = tables[name]
    if isinstance(v, IncrementalBM25Index):
        return v
    if IncrementalBM25Index.exists(v):
        return IncrementalBM25Index.open(spark, str(v))
    raise UnsupportedStatementError(
        f"{name!r} is not a search index"
    )
_RESTORE_RE = re.compile(
    r"^RESTORE\s+(?:TABLE\s+)?(?P<name>[A-Za-z_][\w.]*)\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')$",
    re.IGNORECASE,
)
_ALTER_RENAME_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>[A-Za-z_]\w*)\s+TO\s+(?P<new>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_ALTER_DROP_COL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+DROP\s+COLUMN\s+"
    r"(?P<col>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
#: ADD COLUMN with an optional INITIAL DEFAULT (Iceberg v3 shape; see
#: VersionedTable.add_column for the precedence spec). The default text
#: is validated downstream against the literal-only grammar — the regex
#: only carves the statement.
_ALTER_ADD_COL_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+ADD\s+COLUMN\s+"
    r"(?P<col>[A-Za-z_]\w*)\s+"
    r"(?P<type>[A-Za-z_]\w*(?:\s*\([\d,\s]+\))?)"
    r"(?:\s+DEFAULT\s+(?P<def>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_SET_DEFAULT_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+ALTER\s+COLUMN\s+"
    r"(?P<col>[A-Za-z_]\w*)\s+SET\s+DEFAULT\s+(?P<def>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_DEFAULT_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+ALTER\s+COLUMN\s+"
    r"(?P<col>[A-Za-z_]\w*)\s+DROP\s+DEFAULT$",
    re.IGNORECASE,
)
_ALTER_ADD_CONSTRAINT_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+ADD\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_]\w*)\s+CHECK\s*\((?P<expr>.+)\)$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_CONSTRAINT_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+DROP\s+CONSTRAINT\s+"
    r"(?P<cname>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
#: Branch admin, Iceberg-SQL shaped (`ALTER TABLE t CREATE BRANCH b`).
#: PUBLISH BRANCH is this engine's statement form of Iceberg's
#: fast_forward procedure — kept as ALTER TABLE so the whole branch
#: lifecycle lives behind one statement family.
_ALTER_CREATE_BRANCH_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+CREATE\s+BRANCH\s+"
    r"(?P<branch>[A-Za-z0-9._-]+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?$",
    re.IGNORECASE,
)
_ALTER_DROP_BRANCH_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+DROP\s+BRANCH\s+"
    r"(?P<branch>[A-Za-z0-9._-]+)$",
    re.IGNORECASE,
)
_ALTER_PUBLISH_BRANCH_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+PUBLISH\s+BRANCH\s+"
    r"(?P<branch>[A-Za-z0-9._-]+)$",
    re.IGNORECASE,
)
_ALTER_CREATE_TAG_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+CREATE\s+TAG\s+"
    r"(?P<tag>[A-Za-z0-9._-]+)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<v>\d+))?$",
    re.IGNORECASE,
)
_ALTER_DROP_TAG_RE = re.compile(
    r"^ALTER\s+TABLE\s+(?P<name>[A-Za-z_][\w.]*)\s+DROP\s+TAG\s+"
    r"(?P<tag>[A-Za-z0-9._-]+)$",
    re.IGNORECASE,
)


def _split_set_where(rest: str) -> tuple[str, str | None]:
    """Split `SET ... [WHERE ...]` at the first top-level WHERE (outside
    quotes and parentheses)."""
    depth = 0
    i = 0
    n = len(rest)
    while i < n:
        ch = rest[i]
        if ch == "'":
            i += 1
            while i < n:
                if rest[i] == "'":
                    if i + 1 < n and rest[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch in "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and rest[i : i + 5].upper() == "WHERE":
            before = rest[i - 1] if i else " "
            after = rest[i + 5] if i + 5 < n else " "
            if not before.strip() and (
                not after.strip() or after == "("
            ):
                return rest[:i].strip(), rest[i + 5 :].strip()
        i += 1
    return rest.strip(), None


def _split_assignments(setpart: str) -> dict[str, str]:
    """`a = expr, b = expr` → {col: expr}, commas split outside
    quotes/parens."""
    parts: list[str] = []
    depth = 0
    tok: list[str] = []
    i = 0
    n = len(setpart)
    while i < n:
        ch = setpart[i]
        if ch == "'":
            tok.append(ch)
            i += 1
            while i < n:
                tok.append(setpart[i])
                if setpart[i] == "'":
                    if i + 1 < n and setpart[i + 1] == "'":
                        tok.append(setpart[i + 1])
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if ch in "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(tok))
            tok = []
        else:
            tok.append(ch)
        i += 1
    if tok:
        parts.append("".join(tok))
    if not any(p.strip() for p in parts):
        raise UnsupportedStatementError("UPDATE needs SET assignments")
    out: dict[str, str] = {}
    for p in parts:
        col, eq, expr = p.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise UnsupportedStatementError(
                f"cannot parse assignment {p.strip()!r}"
            )
        out[col.strip().strip("`")] = expr.strip()
    return out


def execute_dml(
    spark: SparkSession, statement: str, tables: dict
) -> int:
    """Execute one DML statement against the registered lake tables.
    `tables` maps statement-visible names to VersionedTable instances or
    table roots. Returns the committed version number."""
    sql = _strip(statement)
    mmv = _CREATE_MV_RE.match(sql)
    if mmv:
        # CREATE MATERIALIZED VIEW: the restricted AS body maps onto
        # the incremental-view family (sinks/matview.py's grammar);
        # sources resolve through the registered tables, the spec
        # persists at LOCATION, and the name registers into the
        # caller's dict — later SELECTs read the maintained state.
        from datalakeingestionservice_spark.sinks.matview import (
            MaterializedView,
        )

        name = mmv.group("name")
        if name in tables:
            raise UnsupportedStatementError(
                f"{name!r} is already registered; DROP it first"
            )
        # one pk per table in FROM order: 2 for a single join, n for
        # a chained (3+ table) join — the grammar validates the arity
        pk = (
            tuple(
                c.strip() for c in mmv.group("pks").split(",")
            )
            if mmv.group("pks")
            else None
        )
        mv = MaterializedView.create(
            spark,
            mmv.group("loc"),
            mmv.group("rest"),
            tables,
            primary_key=pk,
            name=name,
        )
        tables[name] = mv
        return mv.state_version()
    mrf = _REFRESH_MV_RE.match(sql)
    if mrf:
        # CASCADE refreshes upstream MVs first (persisted deps, topo
        # order) — one statement drains base → join view → agg view.
        return _resolve_mv(spark, mrf.group("name"), tables).refresh(
            cascade=mrf.group("cascade") is not None
        )
    mdv = _DROP_MV_RE.match(sql)
    if mdv:
        # Deregistration only, like DROP TABLE — state stays on disk.
        # A view still running continuous refresh must STOP first (a
        # deregistered name with live streams would be unstoppable
        # through the front door).
        name = mdv.group("name")
        mv = _resolve_mv(spark, name, tables)
        if _cr_running(os.path.realpath(mv.root)):
            raise UnsupportedStatementError(
                f"materialized view {name!r} is running continuous "
                "refresh; ALTER MATERIALIZED VIEW ... STOP CONTINUOUS "
                "REFRESH first"
            )
        v = mv.state_version()
        del tables[name]
        return v
    mcr = _START_CR_RE.match(sql)
    if mcr:
        # Streaming handles are process state (see _CR_REGISTRY note):
        # start both source-feed streams, remember them by view root.
        mv = _resolve_mv(spark, mcr.group("name"), tables)
        rp = os.path.realpath(mv.root)
        if _cr_running(rp):
            raise UnsupportedStatementError(
                f"{mcr.group('name')!r} already runs continuous "
                "refresh in this process; STOP it first"
            )
        qs = mv.start_continuous_refresh(mcr.group("ck"))
        _CR_REGISTRY[rp] = qs if isinstance(qs, tuple) else (qs,)
        return len(_CR_REGISTRY[rp])
    mcs = _STOP_CR_RE.match(sql)
    if mcs:
        mv = _resolve_mv(spark, mcs.group("name"), tables)
        rp = os.path.realpath(mv.root)
        qs = _CR_REGISTRY.pop(rp, None)
        if qs is None:
            raise UnsupportedStatementError(
                f"{mcs.group('name')!r} is not running continuous "
                "refresh in this process"
            )
        for q in qs:
            q.stop()
        return len(qs)
    msi = _CREATE_SIDX_RE.match(sql)
    if msi:
        from datalakeingestionservice_spark.sinks.bm25_index import (
            IncrementalBM25Index,
        )

        name = msi.group("name")
        if name in tables:
            raise UnsupportedStatementError(
                f"{name!r} is already registered; DROP it first"
            )
        src_name = msi.group("table")
        if src_name not in tables:
            raise UnsupportedStatementError(
                f"unknown source table {src_name!r} "
                f"(registered: {sorted(tables)})"
            )
        t = tables[src_name]
        src_root = t.root if isinstance(t, VersionedTable) else str(t)
        idx = IncrementalBM25Index.create(
            spark,
            msi.group("loc"),
            src_root,
            id_col=msi.group("id"),
            text_col=msi.group("text"),
            name=name,
            # postings/terms layout: bucket(N, term) hidden
            # partitioning so SEARCH prunes to its terms' leaves
            **(
                {"buckets": int(msi.group("buckets"))}
                if msi.group("buckets")
                else {}
            ),
            # WITH POSITIONS: positional postings, phrase-servable
            positions=msi.group("pos") is not None,
        )
        tables[name] = idx
        return idx.last_refreshed_version()
    msr = _REFRESH_SIDX_RE.match(sql)
    if msr:
        idx = _resolve_sidx(spark, msr.group("name"), tables)
        v = idx.refresh()
        return v if v is not None else idx.last_refreshed_version()
    msd = _DROP_SIDX_RE.match(sql)
    if msd:
        # deregistration only — index state stays on disk
        name = msd.group("name")
        idx = _resolve_sidx(spark, name, tables)
        if _cr_running(os.path.realpath(idx.index_root)):
            raise UnsupportedStatementError(
                f"search index {name!r} is running continuous "
                "refresh; ALTER SEARCH INDEX ... STOP CONTINUOUS "
                "REFRESH first"
            )
        v = idx.last_refreshed_version()
        del tables[name]
        return v
    msc = _SIDX_CR_RE.match(sql)
    if msc:
        idx = _resolve_sidx(spark, msc.group("name"), tables)
        rp = os.path.realpath(idx.index_root)
        if msc.group("verb").upper() == "START":
            if not msc.group("ck"):
                raise UnsupportedStatementError(
                    "START CONTINUOUS REFRESH needs CHECKPOINT '<path>'"
                )
            if _cr_running(rp):
                raise UnsupportedStatementError(
                    f"{msc.group('name')!r} already runs continuous "
                    "refresh in this process; STOP it first"
                )
            q = idx.start_continuous_refresh(msc.group("ck"))
            _CR_REGISTRY[rp] = (q,)
            return 1
        qs = _CR_REGISTRY.pop(rp, None)
        if qs is None:
            raise UnsupportedStatementError(
                f"{msc.group('name')!r} is not running continuous "
                "refresh in this process"
            )
        for q in qs:
            q.stop()
        return len(qs)
    msb = _SIDX_REBUILD_RE.match(sql)
    if msb:
        idx = _resolve_sidx(spark, msb.group("name"), tables)
        if _cr_running(os.path.realpath(idx.index_root)):
            raise UnsupportedStatementError(
                f"search index {msb.group('name')!r} is running "
                "continuous refresh; ALTER SEARCH INDEX ... STOP "
                "CONTINUOUS REFRESH first, then REBUILD"
            )
        return idx.rebuild(
            buckets=(
                int(msb.group("buckets"))
                if msb.group("buckets")
                else None
            ),
            positions=True if msb.group("pos") else None,
        )
    mc = _CREATE_TABLE_RE.match(sql)
    if mc:
        # CTAS: the SELECT resolves through execute_select, so it can
        # read other registered tables WITH time travel / branches /
        # table_changes; the result becomes version 1 of a new
        # versioned table, which registers into the caller's `tables`
        # dict under the statement name — later statements see it.
        name = mc.group("name")
        if name in tables:
            raise UnsupportedStatementError(
                f"table {name!r} is already registered; DROP TABLE "
                "first (deregistration only — data is never deleted)"
            )
        loc = mc.group("loc")
        if os.path.isdir(os.path.join(loc, "_manifests")):
            raise UnsupportedStatementError(
                f"location {loc!r} already holds a versioned table; "
                "register it instead of CREATE TABLE"
            )
        df = execute_select(spark, mc.group("rest"), tables)
        pb = (
            [c.strip().strip("`") for c in mc.group("pb").split(",")]
            if mc.group("pb")
            else None
        )
        t = VersionedTable.create(spark, loc, df, partition_by=pb)
        tables[name] = t
        return t.latest_version()
    mdrop = _DROP_TABLE_RE.match(sql)
    if mdrop:
        # DROP TABLE deregisters the NAME only — the table's data and
        # manifests stay on disk (re-register to get it back). A front
        # door that silently rm -rf'd a lake table would be the wrong
        # kind of convenient.
        name = mdrop.group("name")
        if name not in tables:
            raise UnsupportedStatementError(
                f"unknown table {name!r} (registered: {sorted(tables)})"
            )
        t = tables[name]
        v = (
            t.latest_version()
            if isinstance(t, VersionedTable)
            else VersionedTable(spark, t).latest_version()
        )
        del tables[name]
        return v
    mu = _UPDATE_RE.match(sql)
    if mu:
        t = _resolve(spark, mu.group("name"), tables)
        setpart, where = _split_set_where(mu.group("rest"))
        assigns = _split_assignments(setpart)
        if where is None:
            # UPDATE without WHERE: every row matches.
            return t.update_where(F.lit(True), assigns)
        triples = _where_triples(where, t)
        if triples is not None:
            return t.update_where(triples, assigns)
        return t.update_where(F.expr(where), assigns)
    md = _DELETE_RE.match(sql)
    if md:
        t = _resolve(spark, md.group("name"), tables)
        where = md.group("where")
        if where is None:
            # Bare DELETE truncates: empty snapshot, full change feed.
            return t.delete_where(F.lit(True))
        triples = _where_triples(where, t)
        if triples is not None:
            return t.delete_where(triples)
        # SQL semantics on the Column path: NULL-guard the predicate so
        # only TRUE rows delete (filter(~pred) alone would drop NULLs).
        return t.delete_where(
            F.coalesce(F.expr(where), F.lit(False))
        )
    mr = _REPLACE_WHERE_RE.match(sql)
    if mr:
        # Delta's `INSERT INTO t REPLACE WHERE pred SELECT ...`:
        # atomically replace the predicate region with the result set.
        # The region predicate must compile to the scoped triple form —
        # that is what guarantees the incoming-rows-inside-region check
        # and the carry classification agree exactly.
        t = _resolve(spark, mr.group("name"), tables)
        triples = _where_triples(mr.group("where"), t)
        if triples is None:
            raise UnsupportedStatementError(
                "REPLACE WHERE needs a conjunction of simple "
                f"col-op-literal comparisons; got "
                f"{mr.group('where')[:60]!r}"
            )
        rest = mr.group("rest").strip()
        if rest.upper().startswith("VALUES"):
            df = spark.sql(f"SELECT * FROM ({rest})")
        else:
            df = spark.sql(rest)
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL(t.manifest().schema_ddl)
        names = [f.name for f in schema.fields]
        types = {f.name: f.dataType for f in schema.fields}
        if len(df.columns) != len(names):
            raise UnsupportedStatementError(
                f"REPLACE WHERE provides {len(df.columns)} columns "
                f"for a {len(names)}-column table"
            )
        out = df.select(
            *[
                _qcol(df, src).cast(types[c]).alias(c)
                for c, src in zip(names, df.columns)
            ]
        )
        return t.overwrite_where(out, triples)
    mo = _INSERT_OVERWRITE_RE.match(sql)
    if mo:
        # Hive/Spark INSERT OVERWRITE semantics: unpartitioned tables
        # truncate-and-load; identity-partitioned tables replace exactly
        # the partitions PRESENT in the result (dynamic partition
        # overwrite). The body runs through spark.sql like INSERT INTO.
        t = _resolve(spark, mo.group("name"), tables)
        rest = mo.group("rest").strip()
        if rest.upper().startswith("VALUES"):
            df = spark.sql(f"SELECT * FROM ({rest})")
        elif rest.upper().startswith(("SELECT", "WITH", "(")):
            df = spark.sql(rest)
        else:
            raise UnsupportedStatementError(
                f"INSERT OVERWRITE body must be VALUES or a SELECT: "
                f"{rest[:40]!r}"
            )
        from pyspark.sql.types import StructType

        schema = StructType.fromDDL(t.manifest().schema_ddl)
        names = [f.name for f in schema.fields]
        types = {f.name: f.dataType for f in schema.fields}
        if len(df.columns) != len(names):
            raise UnsupportedStatementError(
                f"INSERT OVERWRITE provides {len(df.columns)} columns "
                f"for a {len(names)}-column table"
            )
        out = df.select(
            *[
                _qcol(df, src).cast(types[c]).alias(c)
                for c, src in zip(names, df.columns)
            ]
        )
        if t.partition_by:
            return t.overwrite_partitions(out)
        return t.overwrite(out)
    mi = _INSERT_RE.match(sql)
    if mi:
        t = _resolve(spark, mi.group("name"), tables)
        cols = (
            [c.strip().strip("`") for c in mi.group("cols").split(",")]
            if mi.group("cols")
            else None
        )
        rest = mi.group("rest").strip()
        if rest.upper().startswith("VALUES"):
            df = spark.sql(f"SELECT * FROM ({rest})")
        elif rest.upper().startswith(("SELECT", "WITH", "(")):
            df = spark.sql(rest)
        else:
            raise UnsupportedStatementError(
                f"INSERT body must be VALUES or a SELECT: {rest[:40]!r}"
            )
        return _positional_append(spark, t, df, cols)
    if re.match(r"^MERGE\s", sql, re.IGNORECASE):
        return execute_merge(spark, sql, tables)
    mz = _OPTIMIZE_RE.match(sql)
    if mz:
        # Delta's OPTIMIZE [WHERE pred] [ZORDER BY (cols)]: predicate-
        # scoped / z-ordered compaction. The WHERE must triple-compile
        # (that is what scopes the rewrite through the stats) — other
        # forms refuse rather than silently compacting everything.
        t = _resolve(spark, mz.group("name"), tables)
        kwargs: dict = {}
        if mz.group("where"):
            triples = _where_triples(mz.group("where"), t)
            if triples is None:
                raise UnsupportedStatementError(
                    "OPTIMIZE WHERE needs a conjunction of simple "
                    "col-op-literal comparisons; got "
                    f"{mz.group('where')[:60]!r}"
                )
            kwargs["where"] = triples
        if mz.group("zcols"):
            kwargs["zorder_by"] = [
                c.strip().strip("`")
                for c in mz.group("zcols").split(",")
            ]
        return t.compact(**kwargs)
    mv = _VACUUM_RE.match(sql)
    if mv:
        # VACUUM t [RETAIN n VERSIONS]: expire history beyond n (default
        # keep everything reachable) and collect unreferenced files.
        t = _resolve(spark, mv.group("name"), tables)
        if mv.group("keep"):
            t.expire_versions(keep_last=int(mv.group("keep")))
        t.vacuum()
        return t.latest_version()
    mrs = _RESTORE_RE.match(sql)
    if mrs:
        # Delta's RESTORE TABLE t TO VERSION/TIMESTAMP AS OF: a new
        # commit whose content is the pinned snapshot (history keeps
        # the undone versions — time travel still sees them).
        t = _resolve(spark, mrs.group("name"), tables)
        v = (
            int(mrs.group("v"))
            if mrs.group("v") is not None
            else t.version_at(mrs.group("ts"))
        )
        return t.restore(v)
    ma = _ALTER_RENAME_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.rename_column(ma.group("old"), ma.group("new"))
    ma = _ALTER_DROP_COL_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.drop_column(ma.group("col"))
    ma = _ALTER_ADD_COL_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.add_column(
            ma.group("col"),
            ma.group("type").strip(),
            default=(
                ma.group("def").strip()
                if ma.group("def") is not None
                else None
            ),
        )
    ma = _ALTER_SET_DEFAULT_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.set_column_default(
            ma.group("col"), ma.group("def").strip()
        )
    ma = _ALTER_DROP_DEFAULT_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.drop_column_default(ma.group("col"))
    ma = _ALTER_ADD_CONSTRAINT_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.add_check_constraint(
            ma.group("cname"), ma.group("expr").strip()
        )
    ma = _ALTER_DROP_CONSTRAINT_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.drop_check_constraint(ma.group("cname"))
    ma = _ALTER_CREATE_BRANCH_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        b = t.create_branch(
            ma.group("branch"),
            from_version=(
                int(ma.group("v")) if ma.group("v") is not None else None
            ),
        )
        return b.latest_version()
    ma = _ALTER_DROP_BRANCH_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        t.drop_branch(ma.group("branch"))
        return t.latest_version()
    ma = _ALTER_PUBLISH_BRANCH_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.publish_branch(ma.group("branch"))
    ma = _ALTER_CREATE_TAG_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        return t.create_tag(
            ma.group("tag"),
            version=(
                int(ma.group("v")) if ma.group("v") is not None else None
            ),
        )
    ma = _ALTER_DROP_TAG_RE.match(sql)
    if ma:
        t = _resolve(spark, ma.group("name"), tables)
        t.drop_tag(ma.group("tag"))
        return t.latest_version()
    if re.match(r"^ALTER\s+TABLE\b", sql, re.IGNORECASE):
        raise UnsupportedStatementError(
            "ALTER TABLE subset: RENAME COLUMN a TO b, DROP COLUMN c, "
            "ADD COLUMN c type [DEFAULT literal], "
            "ALTER COLUMN c SET DEFAULT literal | DROP DEFAULT, "
            "ADD CONSTRAINT name CHECK (expr), DROP CONSTRAINT name, "
            "CREATE BRANCH b [AS OF VERSION n], DROP BRANCH b, "
            "PUBLISH BRANCH b, CREATE TAG n [AS OF VERSION v], "
            f"DROP TAG n; got: {sql[:60]!r}"
        )
    raise UnsupportedStatementError(
        "supported statements: UPDATE ... SET ... [WHERE], DELETE FROM "
        "... [WHERE], INSERT INTO ... VALUES/SELECT, MERGE INTO "
        "(restricted form), OPTIMIZE t [WHERE] [ZORDER BY], VACUUM t "
        "[RETAIN n VERSIONS], RESTORE t TO VERSION/TIMESTAMP AS OF, "
        "ALTER TABLE (rename/drop column, add/drop constraint, "
        "create/drop/publish branch/tag), CREATE TABLE n USING versioned "
        "LOCATION 'p' [PARTITIONED BY (c)] AS SELECT, DROP TABLE n "
        "(deregistration only); got: "
        f"{sql[:60]!r}"
    )


_MERGE_RE = re.compile(
    r"^MERGE\s+INTO\s+(?P<name>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<talias>[A-Za-z_]\w*))?"
    r"\s+USING\s+(?P<src>[A-Za-z_][\w.]*)"
    r"(?:\s+(?:AS\s+)?(?P<salias>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+AND\s+(?P<cond>.+?))?"
    r"\s+THEN\s+(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)",
    re.IGNORECASE | re.DOTALL,
)


def execute_merge(
    spark: SparkSession, statement: str, tables: dict
) -> int:
    """The restricted MERGE INTO statement form (Delta's
    `UPDATE SET * / INSERT *` shorthand), routed to the native
    :meth:`VersionedTable.merge`:

        MERGE INTO t USING src ON t.id = s.id
        [WHEN MATCHED AND s.<flag> THEN DELETE]
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *

    - `src` is a registered Spark view whose schema matches the table
      (plus the optional boolean delete-flag column).
    - ON must be a conjunction of `t.k = s.k` equalities on identically
      named columns — that's what makes keys co-locatable and lets the
      stats-scoped rewrite engage.
    - The only supported actions are the starred shorthands and a
      flag-guarded DELETE; column-level assignments or extra conditions
      need the native `merge()` API (which offers strictly more
      control). Out-of-subset statements raise
      `UnsupportedStatementError`, never a reinterpreted result.
    """
    sql = _strip(statement)
    mm = _MERGE_RE.match(sql)
    if mm is None:
        raise UnsupportedStatementError(
            "MERGE subset: MERGE INTO t USING view ON t.k = s.k "
            "[WHEN MATCHED AND s.flag THEN DELETE] WHEN MATCHED THEN "
            "UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
    t = _resolve(spark, mm.group("name"), tables)
    updates = spark.table(mm.group("src"))
    talias = (mm.group("talias") or mm.group("name")).lower()
    salias = (mm.group("salias") or mm.group("src")).lower()

    # ON: conjunction of qualified equality pairs on the SAME column.
    key_cols: list[str] = []
    for part in re.split(r"\s+AND\s+", mm.group("on"), flags=re.IGNORECASE):
        pe = re.match(
            r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*"
            r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$",
            part,
        )
        if pe is None:
            raise UnsupportedStatementError(
                f"ON must be t.k = s.k equalities; got {part.strip()!r}"
            )
        q1, c1, q2, c2 = (g.lower() for g in pe.groups())
        quals = {q1, q2}
        if c1 != c2 or quals != {talias, salias}:
            raise UnsupportedStatementError(
                "ON must equate the SAME column across the two sides "
                f"(got {part.strip()!r})"
            )
        key_cols.append(pe.group(2))

    saw_update = saw_insert = False
    delete_col: str | None = None
    # Every WHEN clause must be consumed by _WHEN_RE. An unrecognized
    # clause (e.g. `WHEN NOT MATCHED BY SOURCE THEN DELETE`) would
    # otherwise be silently skipped and the statement executed as a
    # plain upsert — losing its semantics. Compare the raw WHEN keyword
    # count against the matched-clause count and refuse on mismatch
    # (a WHEN inside a condition, e.g. CASE WHEN, is out of subset
    # anyway, so over-counting only ever refuses — never reinterprets).
    n_when = len(
        re.findall(r"\bWHEN\b", mm.group("clauses"), re.IGNORECASE)
    )
    matched_clauses = list(_WHEN_RE.finditer(mm.group("clauses")))
    if len(matched_clauses) != n_when:
        raise UnsupportedStatementError(
            f"MERGE subset: {n_when} WHEN clause(s) present but only "
            f"{len(matched_clauses)} recognized — out-of-subset WHEN "
            "forms (e.g. WHEN NOT MATCHED BY SOURCE, column-level SET, "
            "extra conditions) refuse rather than being ignored"
        )
    for wm in matched_clauses:
        action = re.sub(r"\s+", " ", wm.group("action").upper())
        negated = wm.group("not") is not None
        cond = wm.group("cond")
        if action == "DELETE":
            if negated or cond is None:
                raise UnsupportedStatementError(
                    "DELETE needs WHEN MATCHED AND s.<flag> THEN DELETE"
                )
            ce = re.match(
                r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(?:=\s*TRUE)?"
                r"\s*$",
                cond,
                re.IGNORECASE,
            )
            if ce is None or ce.group(1).lower() != salias:
                raise UnsupportedStatementError(
                    f"DELETE condition must be a source boolean flag; "
                    f"got {cond.strip()!r}"
                )
            delete_col = ce.group(2)
        elif action == "UPDATE SET *":
            if negated or cond is not None:
                raise UnsupportedStatementError(
                    "UPDATE SET * supports no extra condition here"
                )
            saw_update = True
        elif action == "INSERT *":
            if not negated or cond is not None:
                raise UnsupportedStatementError(
                    "INSERT * must be WHEN NOT MATCHED, unconditioned"
                )
            saw_insert = True
    if not (saw_update and saw_insert):
        raise UnsupportedStatementError(
            "the subset requires both WHEN MATCHED THEN UPDATE SET * "
            "and WHEN NOT MATCHED THEN INSERT *"
        )
    return t.merge(updates, key_cols, delete_col=delete_col)


# -- SELECT front door with time travel ------------------------------------

#: Keywords that can directly follow a table reference — NOT aliases.
_POST_REF_KEYWORDS = (
    "WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|UNION|INTERSECT|EXCEPT|"
    "ON|USING|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|NATURAL|SEMI|ANTI|"
    "VERSION|TIMESTAMP|AS|QUALIFY|DISTRIBUTE|CLUSTER|SORT|LATERAL|"
    "TABLESAMPLE|PIVOT|UNPIVOT|FOR|BRANCH|TAG"
)


#: `table_changes('<name>', v1 [, v2])` in FROM/JOIN position — the
#: Delta-CDF read idiom. The quoted name's interior is NUL-masked when
#: this runs over `_mask_literals` output; `[^']*` matches the mask and
#: the real characters are recovered from the original via the span.
_TVF_CHANGES_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+TABLE_CHANGES\s*\(\s*"
    r"'(?P<name>[^']*)'\s*,\s*(?P<v1>\d+)\s*"
    r"(?:,\s*(?P<v2>\d+)\s*)?\)"
    rf"(?:\s+AS\s+(?P<alias1>[A-Za-z_]\w*)"
    rf"|\s+(?!(?:{_POST_REF_KEYWORDS})\b)(?P<alias2>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)

#: `search_index('<index>', '<terms>' [, k])` in FROM/JOIN position —
#: full-text retrieval COMPOSABLE with SQL (r13): the hits table
#: (<id_col>, score) of the maintained BM25 index, rankable/joinable/
#: filterable in one statement (`FROM search_index('fts', 'spark
#: stream', 50) h JOIN documents d ON h.doc_id = d.doc_id ...`),
#: where the standalone SEARCH statement needed a second step to get
#: at the documents. Terms are whitespace-split exactly like SEARCH;
#: the quoted interiors are literal-masked, recovered by span.
_TVF_SEARCH_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+SEARCH_INDEX\s*\(\s*"
    r"'(?P<name>[^']*)'\s*,\s*'(?P<q>[^']*)'\s*"
    r"(?:,\s*(?P<k>\d+)\s*)?\)"
    rf"(?:\s+AS\s+(?P<alias1>[A-Za-z_]\w*)"
    rf"|\s+(?!(?:{_POST_REF_KEYWORDS})\b)(?P<alias2>[A-Za-z_]\w*))?",
    re.IGNORECASE,
)


def _select_ref_re(names: list[str]) -> re.Pattern:
    """One regex matching a registered-table reference in FROM/JOIN
    position, with optional Delta-style time travel and optional alias:

        FROM <name> [VERSION AS OF <n> | TIMESTAMP AS OF '<ts>']
                    [[AS] alias]
    """
    alts = "|".join(
        re.escape(n) for n in sorted(names, key=len, reverse=True)
    )
    return re.compile(
        rf"(?P<kw>\b(?:FROM|JOIN)\b)\s+(?P<name>{alts})\b"
        rf"(?:\s+BRANCH\s+'(?P<br>[^']+)'"
        rf"|\s+TAG\s+'(?P<tag>[^']+)')?"
        rf"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
        rf"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?"
        rf"(?:\s+AS\s+(?P<alias1>[A-Za-z_]\w*)"
        rf"|\s+(?!(?:{_POST_REF_KEYWORDS})\b)(?P<alias2>[A-Za-z_]\w*))?",
        re.IGNORECASE,
    )


def execute_select(
    spark: SparkSession, statement: str, tables: dict
) -> DataFrame:
    """Run a SELECT over registered versioned lake tables, with
    Delta-style time travel per table reference:

        execute_select(spark,
            "SELECT region, sum(amount) FROM trades VERSION AS OF 3 "
            "GROUP BY region",
            tables={"trades": "/lake/trades"})

    Each `FROM`/`JOIN` reference to a registered name resolves to the
    table's MoR-served snapshot read — `VERSION AS OF n` pins commit n,
    `TIMESTAMP AS OF '<iso>'` pins the largest version committed at or
    before the timestamp (`VersionedTable.version_at`), and an
    unpinned reference reads the version current when the statement
    started (one statement = one snapshot per table, even when the
    same unpinned name appears twice). The rewritten statement keeps
    the original name visible as an alias, so qualified column
    references (`trades.price`) and self-joins across versions work
    unchanged. References are matched in FROM/JOIN position only; a
    registered name anywhere else (e.g. a comma cross-join) is NOT
    rewritten and fails Spark's resolution loudly — out-of-subset
    statements refuse, never reinterpret. Everything after resolution
    is Spark SQL — joins, CTEs, windows, subqueries all apply.

    Branch (named-ref) reads: `FROM t BRANCH 'name'` resolves the
    reference against the branch's manifest chain instead of main —
    the write-audit-publish audit read as SQL text — and composes with
    VERSION/TIMESTAMP AS OF within the branch and with aliases/joins
    (a branch snapshot joins main's in one statement). An unpinned
    branch reference is snapshot-pinned at statement start, same as
    main references. Unknown branch names refuse loudly. The branch
    LIFECYCLE is statements too (`execute_dml`): `ALTER TABLE t
    CREATE BRANCH b [AS OF VERSION n]` / `DROP BRANCH b` /
    `PUBLISH BRANCH b`.

    The change feed is readable as SQL text through the Delta-CDF
    idiom `table_changes('<name>', v1 [, v2])` in FROM/JOIN position,
    routing to :meth:`VersionedTable.changes` verbatim — so the
    version arguments follow THAT contract (EXCLUSIVE of v1, inclusive
    of v2, default v2 = latest; note Delta's own table_changes is
    inclusive of its start version) and the result carries the data
    columns plus `_change_type` / `_commit_version`. The name must be
    single-quoted and registered, versions must be integer literals;
    any other table_changes form in FROM/JOIN position refuses loudly
    rather than reaching Spark as an unresolvable function.

    This is the reference's "ship SQL text at it" read UX
    (`SqlServerDataSource.cs:55-62`) pointed at lake snapshots instead
    of a server RDBMS."""
    sql = _strip(statement)
    if not re.match(r"^(SELECT|WITH)\b", sql, re.IGNORECASE):
        raise UnsupportedStatementError(
            f"execute_select handles SELECT/WITH statements; got "
            f"{sql[:40]!r} (use execute_dml for DML)"
        )
    import uuid as _uuid

    resolved: dict[tuple[str | None, str, int], str] = {}
    latest: dict[tuple[str | None, str], int] = {}
    views: list[str] = []

    def pin(
        name: str,
        v: str | None,
        ts: str | None,
        br: str | None = None,
        tag: str | None = None,
    ) -> str:
        if name in tables and _is_mv(tables[name]):
            # A materialized view serves its CURRENT maintained state
            # in the SQL-visible shape; pins refuse — the state tables
            # under <root>/state are versioned and registrable for
            # time travel when the history is wanted.
            if v is not None or ts is not None or br or tag:
                raise UnsupportedStatementError(
                    f"materialized view {name!r} serves current state "
                    "only; register its state table for time travel"
                )
            key = (None, name, -1)
            if key not in resolved:
                view = f"__mv_{name}_{_uuid.uuid4().hex[:8]}"
                _resolve_mv(spark, name, tables).read(
                ).createOrReplaceTempView(view)
                resolved[key] = view
                views.append(view)
            return resolved[key]
        t = _resolve(spark, name, tables)
        if br is not None:
            # `t BRANCH 'b'` reads the named ref's chain — the WAP
            # audit read as SQL text; VERSION/TIMESTAMP pins compose
            # within the branch. NoSuchBranchError propagates loudly.
            t = t.branch(br)
        if tag is not None:
            # `t TAG 'name'`: an immutable ref IS a version pin.
            v = str(t.tag_version(tag))
        if v is not None:
            version = int(v)
        elif ts is not None:
            version = t.version_at(ts)
        else:
            if (br, name) not in latest:
                latest[(br, name)] = t.latest_version()
            version = latest[(br, name)]
        key = (br, name, version)
        if key not in resolved:
            view = f"__vt_{name}_{version}_{_uuid.uuid4().hex[:8]}"
            t.read(version).createOrReplaceTempView(view)
            resolved[key] = view
            views.append(view)
        return resolved[key]

    # Match against the literal/comment-masked text (same length as
    # `sql`), then read every group's characters from the ORIGINAL via
    # its span — a quoted literal containing "FROM <name>" is opaque to
    # the rewrite, while a quoted TIMESTAMP AS OF value (which the mask
    # blanks) is still recovered exactly from the source text.
    def grp(m: re.Match, name: str) -> str | None:
        s, e = m.span(name)
        return None if s == -1 else sql[s:e]

    # One try/finally covers BOTH rewrite passes and the final
    # spark.sql: a reference that fails resolution mid-rewrite
    # (NoSuchBranchError / NoSuchTagError / NoSuchVersionError /
    # unknown timestamp) must not leak views created by earlier
    # iterations into the caller's session namespace.
    try:
        # Pass 1: table_changes TVF references. Rewritten views carry a
        # uuid-only name (never the registered name), so pass 2's
        # plain-reference regex cannot re-match inside them.
        masked = _mask_literals(sql)
        parts: list[str] = []
        last = 0
        for m in _TVF_CHANGES_RE.finditer(masked):
            s, e = m.span("name")
            name = sql[s:e]
            t = _resolve(spark, name, tables)
            v1 = int(grp(m, "v1"))
            v2 = grp(m, "v2")
            df = t.changes(v1, None if v2 is None else int(v2))
            view = f"__vtc_{_uuid.uuid4().hex[:8]}"
            df.createOrReplaceTempView(view)
            views.append(view)
            alias = grp(m, "alias1") or grp(m, "alias2")
            parts.append(sql[last : m.start()])
            parts.append(
                f"{grp(m, 'kw')} {view}"
                + (f" AS {alias}" if alias else "")
            )
            last = m.end()
        parts.append(sql[last:])
        sql = "".join(parts)
        masked = _mask_literals(sql)
        if re.search(
            r"\b(?:FROM|JOIN)\s+TABLE_CHANGES\s*\(",
            masked,
            re.IGNORECASE,
        ):
            raise UnsupportedStatementError(
                "table_changes subset: table_changes("
                "'<registered-name>', <v1>[, <v2>]) with a "
                "single-quoted name and integer version literals — "
                "other argument forms refuse rather than reaching "
                "Spark as an unresolvable function"
            )

        # Pass 1b: search_index TVF references — retrieval in FROM
        # position, served from the maintained BM25 index's pruned
        # postings (same rank() as the SEARCH statement).
        parts = []
        last = 0
        for m in _TVF_SEARCH_RE.finditer(masked):
            s, e = m.span("name")
            idx = _resolve_sidx(spark, sql[s:e], tables)
            s, e = m.span("q")
            terms = sql[s:e].split()
            if not terms:
                raise UnsupportedStatementError(
                    "search_index needs at least one term"
                )
            k = grp(m, "k")
            df = idx.rank(terms, top_k=int(k) if k else 20)
            view = f"__vts_{_uuid.uuid4().hex[:8]}"
            df.createOrReplaceTempView(view)
            views.append(view)
            alias = grp(m, "alias1") or grp(m, "alias2")
            parts.append(sql[last : m.start()])
            parts.append(
                f"{grp(m, 'kw')} {view}"
                + (f" AS {alias}" if alias else "")
            )
            last = m.end()
        parts.append(sql[last:])
        sql = "".join(parts)
        masked = _mask_literals(sql)
        if re.search(
            r"\b(?:FROM|JOIN)\s+SEARCH_INDEX\s*\(",
            masked,
            re.IGNORECASE,
        ):
            raise UnsupportedStatementError(
                "search_index subset: search_index('<index-name>', "
                "'<terms>'[, <top_k>]) with single-quoted literals "
                "and an integer k — other argument forms refuse "
                "rather than reaching Spark as an unresolvable "
                "function"
            )

        # Pass 2: plain registered-table references with time travel.
        parts = []
        last = 0
        for m in _select_ref_re(list(tables)).finditer(masked):
            view = pin(
                grp(m, "name"),
                grp(m, "v"),
                grp(m, "ts"),
                grp(m, "br"),
                grp(m, "tag"),
            )
            alias = (
                grp(m, "alias1") or grp(m, "alias2") or grp(m, "name")
            )
            parts.append(sql[last : m.start()])
            parts.append(f"{grp(m, 'kw')} {view} AS {alias}")
            last = m.end()
        parts.append(sql[last:])
        rewritten = "".join(parts)
        return spark.sql(rewritten)
    finally:
        # The analyzed plan is resolved at sql() time; dropping the
        # helper views immediately keeps the session namespace clean.
        for view in views:
            spark.catalog.dropTempView(view)


def execute_describe(
    spark: SparkSession, statement: str, tables: dict
) -> DataFrame:
    """Delta-shaped table introspection statements:

    - ``DESCRIBE HISTORY <t> [LIMIT n]`` — the commit log newest-first
      (version, operation, n_files, committed_at, summary JSON), the
      shape :meth:`VersionedTable.history` already serves.
    - ``DESCRIBE DETAIL <t>`` — ONE row of current-snapshot metadata:
      format/location/version plus file, delete-file, and layout facts
      (partition columns as the user sees them — hidden-partitioning
      transform text included — bloom columns, constraint names, schema
      DDL). Metadata-only: reads the manifest, never a data file, so
      cost is independent of table size.
    """
    sql = _strip(statement)
    msx = re.match(
        r"^DESC(?:RIBE)?\s+SEARCH\s+INDEX\s+(?P<name>[A-Za-z_]\w*)$",
        sql,
        re.IGNORECASE,
    )
    if msx:
        # The persisted definition + freshness + vocabulary/corpus
        # sizes from the maintained stats — no postings scan.
        idx = _resolve_sidx(spark, msx.group("name"), tables)
        terms_t = VersionedTable(spark, idx.terms_root)
        stats = (
            VersionedTable(spark, idx.stats_root).read().collect()[0]
        )
        row = (
            msx.group("name"),
            idx.source_root,
            idx.id_col,
            idx.text_col,
            idx.index_root,
            idx.last_refreshed_version(),
            int(terms_t.read().count()),
            int(stats.n_docs),
            int(stats.sum_dl),
            int(idx.buckets),
            bool(idx.positions),
        )
        return spark.createDataFrame(
            [row],
            "name string, source_root string, id_col string, "
            "text_col string, location string, source_version int, "
            "n_terms bigint, n_docs bigint, sum_dl bigint, "
            "buckets int, positions boolean",
        )
    mdv = re.match(
        r"^DESC(?:RIBE)?\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)$",
        sql,
        re.IGNORECASE,
    )
    if mdv:
        # The persisted definition + freshness, metadata-only.
        import json as _json

        mv = _resolve_mv(spark, mdv.group("name"), tables)
        s = mv.spec
        row = (
            s.get("name", mdv.group("name")),
            s["kind"],
            s.get("join_type"),
            s.get("filter"),
            s["sql"],
            mv.root,
            mv.state_version(),
            _json.dumps(
                {
                    k: s[k]
                    for k in (
                        "source_root", "left_root", "right_root",
                        "table_roots",
                    )
                    if k in s
                }
            ),
            _json.dumps(s.get("deps") or {}),
        )
        return spark.createDataFrame(
            [row],
            "name string, kind string, join_type string, "
            "filter string, sql string, location string, "
            "state_version int, sources string, depends_on string",
        )
    m = _DESCRIBE_RE.match(sql)
    if not m:
        raise UnsupportedStatementError(
            f"execute_describe handles DESCRIBE HISTORY|DETAIL|"
            f"MATERIALIZED VIEW; got {sql[:40]!r}"
        )
    t = _resolve(spark, m.group("name"), tables)
    what = m.group("what").upper()
    if what == "HISTORY":
        h = t.history().orderBy(F.col("version").desc())
        if m.group("limit") is not None:
            h = h.limit(int(m.group("limit")))
        return h
    if m.group("limit") is not None:
        raise UnsupportedStatementError("DESCRIBE DETAIL takes no LIMIT")
    pm = t.manifest()
    n_pos = sum(1 for p in pm.delete_predicates if "pos" in p)
    n_eq = sum(1 for p in pm.delete_predicates if "eq" in p)
    n_sql = sum(1 for p in pm.delete_predicates if "sql" in p)
    row = (
        "versioned",
        t.root,
        pm.version,
        pm.operation,
        pm.committed_at,
        len(pm.files),
        list(pm.partition_by),
        n_pos,
        n_eq,
        n_sql,
        list(pm.bloom_columns),
        sorted(pm.constraints),
        pm.schema_ddl,
    )
    return spark.createDataFrame(
        [row],
        "format string, location string, version int, "
        "last_operation string, last_committed_at string, "
        "num_entries int, partition_columns array<string>, "
        "num_position_delete_files int, num_equality_delete_files int, "
        "num_deferred_delete_predicates int, bloom_columns array<string>, "
        "check_constraints array<string>, schema_ddl string",
    )


_EXPLAIN_RE = re.compile(
    r"^EXPLAIN(?:\s+(?P<mode>FORMATTED|EXTENDED))?\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)


def execute_explain(
    spark: SparkSession, statement: str, tables: dict
) -> DataFrame:
    """`EXPLAIN [FORMATTED|EXTENDED] <SELECT ...>`: resolve the SELECT
    through the front door (time travel, branches, tags, table_changes
    all engage) and return the Spark plan text as a one-row DataFrame —
    the plan-inspection UX for statement users. Non-SELECT bodies
    refuse: UPDATE/MERGE/ALTER route to engine operations, not a single
    Spark plan, so an "explained" DML would be an invented answer."""
    m = _EXPLAIN_RE.match(_strip(statement))
    if m is None:
        raise UnsupportedStatementError(
            "EXPLAIN [FORMATTED|EXTENDED] <SELECT|WITH ...>"
        )
    rest = m.group("rest").strip()
    if not re.match(r"^(SELECT|WITH)\b", rest, re.IGNORECASE):
        raise UnsupportedStatementError(
            "EXPLAIN covers SELECT/WITH statements only — DML routes "
            "to engine operations, not a single Spark plan; got "
            f"{rest[:40]!r}"
        )
    df = execute_select(spark, rest, tables)
    mode = (m.group("mode") or "simple").lower()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: E501
        mode
    )
    txt = df._jdf.queryExecution().explainString(jmode)
    return spark.createDataFrame([(txt,)], "plan string")


def execute_sql(
    spark: SparkSession, statement: str, tables: dict
) -> DataFrame | int:
    """One front door for SQL text: SELECT/WITH statements return the
    result DataFrame (:func:`execute_select`, time travel included);
    DESCRIBE HISTORY/DETAIL return metadata DataFrames
    (:func:`execute_describe`); everything else routes to
    :func:`execute_dml` and returns the committed version."""
    sql = _strip(statement)
    ms = _SEARCH_RE.match(sql)
    if ms:
        # SEARCH <idx> FOR '<terms>' [TOP k] [REQUIRE ALL] — BM25
        # ranking served from the MAINTAINED index state (term-pruned
        # postings scan; df + corpus scalars broadcast). Terms are
        # whitespace-split; ordering is score DESC then id, 4dp like
        # the bm25_rank recompute path.
        idx = _resolve_sidx(spark, ms.group("name"), tables)
        q = ms.group("q").strip()
        phrase = None
        if '"' in q:
            # `SEARCH idx FOR '"exact phrase"'` — the whole query must
            # be ONE double-quoted phrase (mixed bag+phrase forms
            # refuse rather than guessing which words are the phrase);
            # serving needs a WITH POSITIONS index.
            if not (
                len(q) >= 2
                and q.startswith('"')
                and q.endswith('"')
                and '"' not in q[1:-1]
            ):
                raise UnsupportedStatementError(
                    "SEARCH phrase subset: the query must be a single "
                    "double-quoted phrase ('\"...\"') or a plain "
                    "whitespace bag of terms — mixed forms refuse"
                )
            phrase = q[1:-1].split()
            terms = list(dict.fromkeys(phrase))
        else:
            terms = q.split()
        if not terms:
            raise UnsupportedStatementError(
                "SEARCH needs at least one term"
            )
        return idx.rank(
            terms,
            top_k=int(ms.group("k")) if ms.group("k") else 20,
            require_all=ms.group("all") is not None,
            phrase=phrase,
        )
    if re.match(r"^(SELECT|WITH)\b", sql, re.IGNORECASE):
        return execute_select(spark, sql, tables)
    if re.match(r"^EXPLAIN\b", sql, re.IGNORECASE):
        return execute_explain(spark, sql, tables)
    if re.match(r"^DESC(RIBE)?\b", sql, re.IGNORECASE):
        return execute_describe(spark, sql, tables)
    return execute_dml(spark, sql, tables)


class _ScriptTables:
    """Mapping view of a staged catalog transaction for the statement
    router: membership/iteration come from the catalog's pin map,
    lookups hand out the transaction's per-table STAGED branch handles
    (so every statement in the script reads and writes the staged
    world). Table-set evolution is blocked — a script is a group of
    table reads/writes, not a catalog schema change."""

    def __init__(self, catalog, txn):
        self._catalog = catalog
        self._txn = txn

    def _names(self):
        return self._catalog.pins(self._txn._base).keys()

    def __contains__(self, name) -> bool:
        return name in self._names()

    def __iter__(self):
        return iter(sorted(self._names()))

    def __len__(self) -> int:
        return len(self._names())

    def __getitem__(self, name):
        return self._txn[name]


def execute_script(
    spark: SparkSession,
    statements: list[str],
    catalog,
    audit=None,
    max_result_rows: int = 100_000,
) -> list:
    """Run a SCRIPT of statements as ONE atomic unit — the
    multi-statement form `execute_sql` refuses, made safe: the whole
    script runs inside a catalog staged transaction
    (write-audit-publish), so every DML lands on per-transaction table
    branches, later statements read earlier statements' staged writes,
    and ANY error (parse refusal, constraint violation, audit assert)
    rolls the entire script back with nothing left on any table main.
    One pin swap publishes everything together on success. An
    optional `audit` callback runs LAST, still inside the transaction,
    with the staged txn handle (`audit(txn)` — use `txn.sql(...)` to
    query the staged cross-table world); raising vetoes the whole
    script, same as a failing statement.

    Returns one result per statement: the staged-branch commit version
    for DML, MATERIALIZED rows (list[Row]) for SELECT/DESCRIBE/EXPLAIN
    — materialized because the staged branches are reclaimed after
    publish, so a lazy DataFrame would dangle. Because that
    materialization is driver-side, result sets are capped at
    `max_result_rows` per statement: a script `SELECT * FROM
    huge_table` REFUSES (rolling the script back) instead of OOMing
    the driver — run large reads through `execute_select` outside a
    script, where the result stays a lazy DataFrame. CREATE TABLE /
    DROP TABLE refuse up front: table-set evolution is a catalog
    commit of its own (`add_table`/`remove_table`), not a table write,
    and a half-created table directory could not be rolled back."""
    for stmt in statements:
        s = _strip(stmt)
        if _CREATE_TABLE_RE.match(s) or _DROP_TABLE_RE.match(s):
            raise UnsupportedStatementError(
                "CREATE TABLE / DROP TABLE are table-set evolution — "
                "use catalog.add_table/remove_table outside a script; "
                f"got: {s[:60]!r}"
            )
        if any(rx.match(s) for rx in _MV_STMT_RES) or _SEARCH_RE.match(s):
            raise UnsupportedStatementError(
                "materialized-view / search-index statements commit to "
                "(or read) their own state tables outside the script's "
                "staged transaction — run them outside scripts; "
                f"got: {s[:60]!r}"
            )
    results: list = []
    with catalog.staged_transaction() as txn:
        wrapped = _ScriptTables(catalog, txn)
        for stmt in statements:
            r = execute_sql(spark, stmt, wrapped)
            if isinstance(r, DataFrame):
                # the cap probe fetches max+1 rows, never the table
                rows = r.limit(max_result_rows + 1).collect()
                if len(rows) > max_result_rows:
                    raise UnsupportedStatementError(
                        f"script statement returned more than "
                        f"{max_result_rows} rows (driver-side "
                        "materialization cap); read large results via "
                        f"execute_select outside a script: {stmt[:60]!r}"
                    )
                results.append(rows)
            else:
                results.append(r)
        if audit is not None:
            audit(txn)
    return results
