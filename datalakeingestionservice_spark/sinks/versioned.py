"""Versioned table format: ACID-ish snapshots over plain parquet.

The reference delegates DML to the source RDBMS and gets transactions for
free (`SqlServerDataSource.cs:83-90`); a lake engine needs a table format.
No Delta/Iceberg jars exist in this environment, so this module implements
the minimal honest core of one — the same design (manifest files naming
immutable data files, atomic manifest publication, optimistic concurrency)
at directory granularity:

    table_root/
      data/<uuid>/           immutable parquet datasets (never rewritten)
      _manifests/vNNNNNNNN.json   one manifest per committed version

A snapshot IS its manifest: the ordered list of data directories visible at
that version plus operation metadata. Commit = write manifest to a temp name,
then atomically CLAIM the next version number with os.link (hardlink fails
with EEXIST if a concurrent writer claimed it first — the whole conflict
story in one syscall). Readers list manifests only; uncommitted data dirs
are invisible, so writers never block readers and a crashed writer leaves
only orphans for vacuum().

Scale notes: manifests hold directory paths, not row data — KBs at any table
size. Reads fan out to `spark.read.parquet(dirs...)`, preserving pushdown /
pruning / split planning. merge() is copy-on-write at snapshot granularity
(rewrite-what-you-read); partition-scoped merges bound the rewrite exactly as
`operators/upsert.py` documents.

Data skipping: every commit records per-data-dir column min/max/null-count
stats harvested from the parquet FOOTERS of the files it wrote (no data
scan), and `read(predicates=...)` drops whole data dirs the stats prove
empty before Spark plans the scan — the manifest-level twin of parquet's
row-group pruning, same design as Delta/Iceberg file stats.
"""

from __future__ import annotations

import datetime as _dt
import glob
import json
import os
import re
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone
from decimal import Decimal, InvalidOperation
from urllib.parse import unquote

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentCommitError(Exception):
    """Another writer committed the version this writer was about to claim."""


class NoSuchBranchError(Exception):
    pass


class BranchExistsError(Exception):
    pass


class NoSuchTagError(Exception):
    pass


class TagExistsError(Exception):
    pass


class NoSuchVersionError(Exception):
    pass


class SchemaMismatchError(Exception):
    """Append schema differs from the table schema (and merge_schema was
    not requested, or the difference is a type conflict)."""


class ConstraintViolationError(Exception):
    """Incoming rows violate a table CHECK constraint; nothing commits."""


_MANIFEST_DIR = "_manifests"
#: Branch manifest chains live INSIDE the manifest dir so clone() carries
#: them and nothing outside `_manifests/` is metadata.
_BRANCHES_SUBDIR = "branches"
#: Immutable named refs: one tiny JSON file per tag pointing at a main
#: version — `release-2024` instead of `VERSION AS OF 17`.
_TAGS_SUBDIR = "tags"


def _tag_path(root: str, name: str) -> str:
    return os.path.join(
        root, _MANIFEST_DIR, _TAGS_SUBDIR, f"{name}.json"
    )


def _tag_versions(root: str) -> dict[str, int]:
    tdir = os.path.join(root, _MANIFEST_DIR, _TAGS_SUBDIR)
    if not os.path.isdir(tdir):
        return {}
    out: dict[str, int] = {}
    for n in sorted(os.listdir(tdir)):
        if not n.endswith(".json"):
            continue
        try:
            with open(os.path.join(tdir, n)) as f:
                out[n[: -len(".json")]] = int(json.load(f)["version"])
        except (OSError, ValueError, KeyError):
            continue  # torn tag claim; vacuum's timeout machinery N/A —
            # tags are tiny and recreating is a no-op overwrite refusal
    return out


def _branch_names(root: str) -> list[str]:
    bdir = os.path.join(root, _MANIFEST_DIR, _BRANCHES_SUBDIR)
    if not os.path.isdir(bdir):
        return []
    return sorted(
        n
        for n in os.listdir(bdir)
        if os.path.isdir(os.path.join(bdir, n))
    )
_DATA_DIR = "data"
#: Materialized change files (Delta-CDF style) for copy-on-write commits:
#: written AT COMMIT TIME from row sets the DML already has in hand, so the
#: change feed never recomputes a snapshot diff and the streaming source can
#: serve COW commits at scan speed. Manifest summary keys: "cdf" (dir rel
#: path) or "cdf_empty" (data-preserving commit, e.g. compact).
_CDF_DIR = "changes"
#: Position-delete files (Iceberg positional-delete / Delta deletion-vector
#: shape): parquet dirs of (file_rel string, pos long) rows naming exact
#: (data file, row ordinal) pairs deleted merge-on-read. Referenced from
#: manifest delete_predicates as {"pos": <rel>, "entries": [scoped rels]} —
#: the same carry/retire/scoping machinery as SQL deferred deletes, so a
#: rewrite of every scoped entry retires the file automatically.
_DELETES_DIR = "deletes"


# -- data-skipping statistics (parquet footers -> manifest) -----------------
#
# Per data-dir, per top-level column: min / max / null count, harvested from
# the parquet FOOTERS of the files just written — zero data scan, the same
# source Delta/Iceberg use for their file-level stats. At 100 TB the
# manifest stays KB-scale (one entry per data dir, not per row), and a
# selective predicate skips whole directories before Spark even plans the
# scan — the coarse-grained twin of parquet's own row-group pruning.

def _stat_jsonable(v):
    """Footer stat value -> JSON-storable form that preserves ORDER.

    Dates/timestamps become ISO-8601 strings (lexicographic == chronologic
    for fixed-format ISO); types without an order-faithful JSON form
    (bytes, Decimal) are dropped -> the column just isn't prunable."""
    if isinstance(v, bool) or v is None:
        return None  # parquet bool stats are useless for pruning
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return None


#: Persist per-row-group envelopes only for files with at most this many
#: groups: bounds manifest JSON growth to a small constant factor over
#: the per-file stats (Spark writes ~128 MB groups, the Arrow writer
#: coalesces to 64k-row groups — both land well under this in practice).
_RG_STATS_MAX = 64


def _collect_file_stats(path: str) -> dict:
    """Row-group footer stats for ONE parquet file.

    Returns {"rows": n, "columns": {col: {"min":…, "max":…, "nulls": n}},
    "rgs": [per-row-group envelopes]} (rgs only for multi-group files).
    A column appears only if EVERY row group carried usable min/max (or was
    all-null) — partial stats can't prove absence, so they're discarded."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    broken: set[str] = set()
    #: Per-row-group envelopes (same {columns: {col: {min,max,nulls}}}
    #: shape as the file/dir level, so `_dir_may_match` evaluates them
    #: directly). Kept only for multi-group files below `_RG_STATS_MAX`
    #: groups — a file whose groups ALL refute a predicate conjunction
    #: is skipped at PLANNING even when its file-level envelope matches
    #: (disjoint clustered ranges: file [1..30]∪[70..100] vs x=50).
    rgs: list[dict] = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        rg_cols: dict[str, dict] = {}
        for j in range(rg.num_columns):
            col = rg.column(j)
            name = col.path_in_schema
            if "." in name or name in broken:
                continue  # nested leaves aren't prunable columns
            try:
                st = col.statistics
                if st is None or st.null_count is None:
                    broken.add(name)
                    continue
                nulls[name] = nulls.get(name, 0) + st.null_count
                if st.null_count == rg.num_rows:
                    # all-null group: no min/max to contribute
                    rg_cols[name] = {"nulls": st.null_count}
                    continue
                if not st.has_min_max:
                    broken.add(name)
                    continue
                lo, hi = _stat_jsonable(st.min), _stat_jsonable(st.max)
            except Exception:
                # pyarrow can't surface stats for every physical type
                # (e.g. decimal raises ArrowNotImplementedError) — the
                # column simply isn't prunable.
                broken.add(name)
                continue
            if lo is None or hi is None:
                broken.add(name)
                continue
            rg_cols[name] = {"nulls": st.null_count, "min": lo, "max": hi}
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
        rgs.append({"rows": rg.num_rows, "columns": rg_cols})
    columns = {}
    for name, n_null in nulls.items():
        if name in broken:
            continue
        entry: dict = {"nulls": n_null}
        if name in mins:
            entry["min"] = mins[name]
            entry["max"] = maxs[name]
        columns[name] = entry
    out = {"rows": md.num_rows, "columns": columns}
    if 1 < len(rgs) <= _RG_STATS_MAX:
        # Drop broken columns from the group envelopes too (partial
        # stats must not pretend to prove anything), then persist.
        for rg_st in rgs:
            for name in broken:
                rg_st["columns"].pop(name, None)
        out["rgs"] = rgs
    return out


def _collect_dir_stats(abs_dir: str) -> dict:
    """Stats for all parquet files in a dir: the dir-level envelope PLUS a
    per-file map, so `read(predicates=…)` prunes at file granularity —
    `compact()` merging many dirs into one multi-file dir no longer
    coarsens skipping (the files, z-ordered or range-partitioned, keep
    their own tight min/max). At extreme file counts the per-file map is
    what Iceberg pages into avro manifest files; JSON suffices here
    because dirs hold O(partitions) files, not O(rows)."""
    files: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(abs_dir, "*.parquet"))):
        files[os.path.basename(path)] = _collect_file_stats(path)

    rows = sum(f["rows"] for f in files.values())
    # A column is prunable at dir level only if EVERY non-empty file
    # harvested it (a file with unusable stats can't prove absence; a
    # 0-row file has nothing to prove and must not poison the merge).
    nonempty = [f for f in files.values() if f["rows"] > 0]
    common = (
        set.intersection(*[set(f["columns"]) for f in nonempty])
        if nonempty
        else set()
    )
    columns: dict[str, dict] = {}
    for name in common:
        entries = [f["columns"][name] for f in nonempty]
        entry: dict = {"nulls": sum(e["nulls"] for e in entries)}
        mins = [e["min"] for e in entries if "min" in e]
        maxs = [e["max"] for e in entries if "max" in e]
        if mins:
            entry["min"] = min(mins)
            entry["max"] = max(maxs)
        columns[name] = entry
    return {"rows": rows, "columns": columns, "files": files}


_PRUNE_OPS = ("=", "<", "<=", ">", ">=", "in")


# -- bloom-filter data skipping ---------------------------------------------
#
# min/max stats prune RANGE predicates, but an equality lookup on a column
# the table isn't clustered by (the needle-in-haystack query: "fetch order
# 4242 from 100 TB") matches every dir's [min, max] envelope. Opt-in
# per-column BLOOM FILTERS close that gap, same as Delta/Iceberg: each
# commit aggregates its NEW rows' hash bit-positions (distributed — the
# driver receives at most m distinct positions per entry, never row data)
# into an m-bit bitmap stored in the manifest entry; an `=` predicate
# whose k positions aren't all set provably has no match in that entry.
# Hashing is sha256 over the value's canonical string + seed, computed
# identically by Spark executors (build side) and driver Python (probe
# side), so no engine-specific hash needs to match.

_BLOOM_M = 1 << 18  # bits per filter (32 KiB bitmap)
_BLOOM_K = 5  # hash functions; ~0.2% fpp at ~20k distinct values

_BLOOM_TYPES = ("tinyint", "smallint", "int", "bigint", "string")


def _bloom_positions_py(value, m: int = _BLOOM_M, k: int = _BLOOM_K):
    """Driver-side probe positions for a literal; MUST mirror the Spark
    expression in `_bloom_position_cols` bit for bit."""
    import hashlib

    return [
        int(
            hashlib.sha256(f"{value}#{seed}".encode()).hexdigest()[:15], 16
        )
        % m
        for seed in range(k)
    ]


def _bloom_position_cols(col: str, m: int = _BLOOM_M, k: int = _BLOOM_K):
    """One position column per seed: sha256(value_string + '#seed'),
    first 15 hex chars (60 bits, exact in a long) mod m. int/string
    columns only — their Spark cast-to-string equals Python str()."""
    return [
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.col(col).cast("string"), F.lit(f"#{seed}")
                    ),
                    256,
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        % m
        for seed in range(k)
    ]


def _bloom_from_positions(positions, m: int = _BLOOM_M) -> str:
    bitmap = bytearray(m // 8)
    for p in positions:
        bitmap[p >> 3] |= 1 << (p & 7)
    import base64
    import zlib

    return base64.b64encode(zlib.compress(bytes(bitmap), 6)).decode()


def _bloom_may_contain(b64: str, value, m: int, k: int) -> bool:
    import base64
    import zlib

    bitmap = zlib.decompress(base64.b64decode(b64))
    return all(
        bitmap[p >> 3] & (1 << (p & 7))
        for p in _bloom_positions_py(value, m, k)
    )


def _union_blooms(metas: list[dict], m: int = _BLOOM_M) -> dict:
    """OR per-leaf bitmaps into one commit-wide over-approximation (the
    fallback for a leaf whose dir-name key defied matching — costs
    selectivity only, never correctness)."""
    import base64
    import zlib

    import numpy as np

    bm = np.zeros(m // 8, dtype=np.uint8)
    for meta in metas:
        bm |= np.frombuffer(
            zlib.decompress(base64.b64decode(meta["b64"])), dtype=np.uint8
        )
    return {
        "m": m,
        "k": _BLOOM_K,
        "b64": base64.b64encode(zlib.compress(bm.tobytes(), 6)).decode(),
    }

_ISO_PREFIX = re.compile(r"^\d{4}-\d{2}-\d{2}([T ]|$)")

# -- hive-style partition layout --------------------------------------------
#
# With `partition_by=[...]` the table writes `col=value/` directory names
# (Spark's partitionBy, the layout every Hive/Delta/Iceberg table uses) and
# each LEAF directory becomes its own manifest entry carrying the parsed
# partition values. Pruning on a partition column then needs ZERO footer
# stats — the dir NAME proves the value — which also makes types that
# pyarrow can't harvest stats for (decimal) fully prunable, and scoped
# MERGE aligns its rewrite scope with partitions for free.

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _parse_part_path(rel: str) -> dict[str, str | None]:
    """`'k=v/k2=v2'` (as written by Spark's partitionBy) -> raw string
    values, unescaped; the hive null sentinel maps to None."""
    out: dict[str, str | None] = {}
    for seg in rel.replace(os.sep, "/").split("/"):
        k, _, raw = seg.partition("=")
        out[k] = None if raw == _HIVE_NULL else unquote(raw)
    return out


# -- hidden partitioning (Iceberg transforms) --------------------------------
#
# A partition spec entry is either a plain column (identity) or a TRANSFORM:
# `year(ts)`, `month(ts)`, `day(ts)`, `bucket(N, col)`, `truncate(W, col)`.
# Transform specs partition the LAYOUT without surfacing a derived column to
# queries (Iceberg's "hidden partitioning"): writes compute the transform
# into a hive dir segment named `<col>_<fn>=<value>` and — unlike identity —
# keep the SOURCE column in the data files (so reads need no recovery and
# footer-stat pruning still works), while predicates on the source column
# derive conservative dir-name predicates automatically:
#
#   ts >= DATE '2024-03-05'  +  spec year(ts)   =>  ts_year >= 2024
#
# month/day use lexicographically-ordered string forms ('yyyy-MM',
# 'yyyy-MM-dd') so string comparison IS chronological comparison; year is an
# int; bucket uses the same sha256 canonical-string hash as the bloom layer
# (computed identically by the Spark expression and the Python probe), and
# derives only equality; truncate is floor-to-multiple for ints and prefix
# for strings — both monotone, so range predicates carry over.

_TRANSFORM_RE = re.compile(
    r"^\s*(year|month|day|hour|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)

#: Transforms valid per source simpleString type (prefix match for
#: timestamp*/varchar/char handled in _validate_spec).
_TEMPORAL_TRANSFORMS = ("year", "month", "day", "hour")


def _parse_spec_entry(entry: str) -> tuple[str, int | None, str]:
    """'col' -> ("identity", None, col); 'year(ts)' -> ("year", None,
    "ts"); 'bucket(16, id)' -> ("bucket", 16, "id")."""
    m = _TRANSFORM_RE.match(entry)
    if not m:
        return ("identity", None, entry)
    fn, param, col = m.group(1), m.group(2), m.group(3)
    return (fn, int(param) if param is not None else None, col)


def _transform_alias(fn: str, col: str) -> str:
    return f"{col}_{fn}"


def _render_spec_entry(fn: str, param: int | None, col: str) -> str:
    if fn == "identity":
        return col
    if param is not None:
        return f"{fn}({param}, {col})"
    return f"{fn}({col})"


def _validate_spec(
    partition_by: tuple[str, ...], types: dict[str, str]
) -> None:
    """Raise on an invalid spec: unknown source column, wrong source
    type for the transform, missing/invalid parameter, or an alias
    colliding with a real column."""
    for entry in partition_by:
        fn, param, col = _parse_spec_entry(entry)
        t = types.get(col)
        if t is None:
            raise ValueError(f"partition columns not in schema: ['{col}']")
        if fn == "identity":
            continue
        if fn in _TEMPORAL_TRANSFORMS:
            if fn == "hour":
                # A date has no hour; Iceberg likewise restricts hour()
                # to timestamps.
                if not t.startswith("timestamp"):
                    raise ValueError(
                        f"hour() needs a timestamp column, {col} is {t}"
                    )
            elif not (t == "date" or t.startswith("timestamp")):
                raise ValueError(
                    f"{fn}() needs a date/timestamp column, "
                    f"{col} is {t}"
                )
            if param is not None:
                raise ValueError(f"{fn}() takes no parameter")
        else:  # bucket / truncate
            if param is None or param <= 0:
                raise ValueError(
                    f"{fn}() needs a positive parameter: "
                    f"{fn}(N, {col})"
                )
            stringy = t == "string" or t.startswith(("varchar", "char"))
            intish = t in ("tinyint", "smallint", "int", "bigint")
            if fn == "bucket":
                # date/timestamp buckets hash a CANONICAL string: dates
                # use the ISO form (= Spark's date->string cast),
                # timestamps a FIXED-width `yyyy-MM-dd HH:mm:ss.SSSSSS`
                # date_format (Spark's plain cast trims fractions, which
                # has no byte-exact sessionless twin — the fixed format
                # does: strftime %f).
                ok = (
                    stringy or intish or t == "date"
                    or t.startswith("timestamp")
                )
                if not ok:
                    raise ValueError(
                        f"bucket() needs an int/string/date/timestamp "
                        f"column, {col} is {t}"
                    )
            else:  # truncate
                ok = stringy or intish or t.startswith("decimal")
                if not ok:
                    raise ValueError(
                        f"truncate() needs an int/string/decimal "
                        f"column, {col} is {t}"
                    )
        alias = _transform_alias(fn, col)
        if alias in types:
            raise ValueError(
                f"transform dir name {alias!r} collides with a column"
            )


def _cast_to_ddl_types(df: DataFrame, ddl: str) -> DataFrame:
    """Cast df columns whose type differs from the DDL's (keeps written
    files homogeneous when an append carries columns NARROWER than the
    table type). Columns absent from the DDL pass through unchanged."""
    from pyspark.sql.types import StructType

    want = {f.name: f.dataType for f in StructType.fromDDL(ddl).fields}
    have = {f.name: f.dataType for f in df.schema.fields}
    if all(want.get(c, have[c]) == have[c] for c in have):
        return df
    return df.select(
        *[
            F.col(c).cast(want[c]).alias(c)
            if c in want and want[c] != have[c]
            else F.col(c)
            for c in df.columns
        ]
    )


def _key_bounds_preds(df: DataFrame, key_cols) -> list[tuple]:
    """(col, >=, lo) / (col, <=, hi) logical triples from df's per-key
    min/max, for stats-scoping a key-addressed DML to the entries that
    can contain matches. A NaN bound (float key containing NaN) poisons
    every comparison ('x <= NaN' is False), which would classify ALL
    dirs as untouched and silently skip matched rows — scoping stands
    down entirely (returns []). Callers owning column mapping translate
    to physical names themselves."""
    if not key_cols:
        return []
    row = df.agg(
        *[
            f
            for k in key_cols
            for f in (
                F.min(k).alias(f"__lo_{k}"),
                F.max(k).alias(f"__hi_{k}"),
            )
        ]
    ).collect()[0]
    preds: list[tuple] = []
    for k in key_cols:
        lo, hi = row[f"__lo_{k}"], row[f"__hi_{k}"]
        if any(isinstance(b, float) and b != b for b in (lo, hi)):
            return []
        if lo is not None and hi is not None:
            preds += [(k, ">=", lo), (k, "<=", hi)]
    return preds


def _refuse_null_keys(keys: DataFrame, cols, message: str) -> None:
    """Raise `message` when any key row has a NULL in `cols` — SQL
    equality never matches NULL, so a null key could never affect a
    row; accepting it would silently do nothing."""
    null_cond = None
    for c in cols:
        nc = F.col(c).isNull()
        null_cond = nc if null_cond is None else (null_cond | nc)
    if null_cond is not None and keys.filter(null_cond).limit(1).count():
        raise ValueError(message)


_INT_CHAIN = ("tinyint", "smallint", "int", "bigint")


def _widened_simple(a: str, b: str) -> str | None:
    """simpleString twin of `_widened_type` for sessionless contexts
    (the DataSource writer's driver/commit path)."""
    if a == b:
        return a
    if a in _INT_CHAIN and b in _INT_CHAIN:
        return a if _INT_CHAIN.index(a) > _INT_CHAIN.index(b) else b
    if {a, b} == {"float", "double"}:
        return "double"
    ma = re.match(r"decimal\((\d+),\s*(\d+)\)", a)
    mb = re.match(r"decimal\((\d+),\s*(\d+)\)", b)
    if ma and mb and ma.group(2) == mb.group(2):
        return a if int(ma.group(1)) >= int(mb.group(1)) else b
    return None


def _widened_type(a, b):
    """The wider of two Spark DataTypes under the SAFE promotion chains
    (every narrow value is exactly representable in the wide type):
    tinyint→smallint→int→bigint, float→double, and decimal(p,s)→
    decimal(p',s) with p' >= p (same scale). None when the pair is not
    on a chain — the caller raises SchemaMismatchError."""
    from pyspark.sql.types import DecimalType

    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    if sa in _INT_CHAIN and sb in _INT_CHAIN:
        return a if _INT_CHAIN.index(sa) > _INT_CHAIN.index(sb) else b
    if {sa, sb} == {"float", "double"}:
        return a if sa == "double" else b
    if isinstance(a, DecimalType) and isinstance(b, DecimalType):
        if a.scale == b.scale:
            return a if a.precision >= b.precision else b
    return None


def _decimal_scale(type_simple: str) -> int:
    """Scale of a `decimal(p,s)` simpleString (0 when unparseable)."""
    mm = re.match(r"decimal\((\d+),\s*(\d+)\)", type_simple)
    return int(mm.group(2)) if mm else 0


def _transform_expr(fn: str, param: int | None, col: str, type_simple: str):
    """The Spark column computing a transform's DIR value; must agree
    byte-for-byte with `_transform_py` on every non-null input."""
    c = F.col(col)
    if fn == "year":
        return F.year(c)
    if fn == "month":
        return F.date_format(c, "yyyy-MM")
    if fn == "day":
        return F.date_format(c, "yyyy-MM-dd")
    if fn == "hour":
        # Zero-padded, so lexicographic order stays chronological and
        # range predicates derive like month/day.
        return F.date_format(c, "yyyy-MM-dd-HH")
    if fn == "bucket":
        # Same canonical-string sha256 scheme as the bloom layer, so the
        # Spark build side and the Python probe side agree by
        # construction. Timestamps render through a FIXED-width
        # date_format (plain cast trims zero fractions — no byte-exact
        # Python twin); everything else through the string cast.
        canon = (
            F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
            if type_simple.startswith("timestamp")
            else c.cast("string")
        )
        return (
            F.conv(
                F.substring(
                    F.sha2(
                        F.concat(canon, F.lit("#bucket")), 256
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % param
        ).cast("int")
    if fn == "truncate":
        if type_simple in ("tinyint", "smallint", "int", "bigint"):
            # floor-to-multiple (matches Python's // for negatives).
            return F.floor(c / F.lit(param)).cast("bigint") * param
        if type_simple.startswith("decimal"):
            # Iceberg decimal truncate: floor the UNSCALED value to a
            # multiple of W, i.e. subtract the floor-mod of the value by
            # step = W * 10^-s. `%` truncates toward zero in both Spark
            # and Python Decimal, so ((v % step) + step) % step is the
            # shared floor-mod; the result keeps the source scale, so
            # its dir-name rendering matches the Python twin's
            # str(Decimal) exactly.
            s = _decimal_scale(type_simple)
            step = F.lit(str(Decimal(param).scaleb(-s))).cast(
                f"decimal(38,{s})"
            )
            # Cast to decimal(38,s), NOT the source type: values in the
            # bottom window near the type's most-negative bound floor to
            # a multiple needing precision p+1 (decimal(4,2) -99.95 with
            # truncate(10) -> -100.00), which would overflow the source
            # type to NULL and land the row in the null partition dir
            # while the Python twin (prec=60) returns the exact value —
            # pruning would then silently skip the entry. Scale is
            # preserved, so str(Decimal) dir rendering still matches.
            return (c - ((c % step + step) % step)).cast(
                f"decimal(38,{s})"
            )
        return F.substring(c, 1, param)
    raise ValueError(f"unknown transform {fn!r}")


def _transform_py(fn: str, param: int | None, v, type_simple: str):
    """Python twin of the transform, for pruning probes and the
    sessionless writer. None when not computable for this value."""
    import hashlib

    if v is None:
        return None
    if fn in _TEMPORAL_TRANSFORMS:
        if not isinstance(v, (_dt.date, _dt.datetime)):
            return None
        if fn == "hour":
            if not isinstance(v, _dt.datetime):
                return None  # a bare date has no hour
            return (
                f"{v.year:04d}-{v.month:02d}-{v.day:02d}-{v.hour:02d}"
            )
        if fn == "year":
            return v.year
        if fn == "month":
            return f"{v.year:04d}-{v.month:02d}"
        return f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
    if fn == "bucket":
        if isinstance(v, _dt.datetime):
            if not type_simple.startswith("timestamp"):
                return None  # datetime probe against a non-ts column
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            v = v.strftime("%Y-%m-%d %H:%M:%S.%f")  # fixed 6-digit frac
        elif isinstance(v, _dt.date):
            v = v.isoformat()  # the canonical Spark date->string cast
        if not isinstance(v, (int, str)) or isinstance(v, bool):
            return None
        return (
            int(
                hashlib.sha256(f"{v}#bucket".encode()).hexdigest()[:15],
                16,
            )
            % param
        )
    if fn == "truncate":
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return (v // param) * param
        if isinstance(v, Decimal):
            from decimal import localcontext

            s = _decimal_scale(type_simple)
            step = Decimal(param).scaleb(-s)
            with localcontext() as ctx:
                ctx.prec = 60  # decimal(38) headroom
                return v - ((v % step + step) % step)
        if isinstance(v, str):
            return v[:param]
        return None
    return None


def _union_transform_entries(
    partition_by: tuple[str, ...], past_specs: tuple = ()
) -> list[tuple]:
    """(fn, param, col) transform entries of the CURRENT spec unioned
    with every HISTORICAL spec (partition evolution keeps old-spec
    leaves readable and prunable forever). An alias whose (fn, col)
    appears with MULTIPLE params across history (`bucket(4,id)` evolved
    to `bucket(8,id)` — same `id_bucket` dir name, different hash) is
    AMBIGUOUS: a derived predicate could wrongly refute the other
    generation's leaves, so such aliases are excluded from derivation
    entirely (pruning weakens, correctness never)."""
    params: dict[tuple[str, str], set] = {}
    for spec in (tuple(partition_by), *tuple(past_specs)):
        for entry in spec:
            fn, param, col = _parse_spec_entry(entry)
            if fn == "identity":
                continue
            params.setdefault((fn, col), set()).add(param)
    return [
        (fn, ps.pop(), col)
        for (fn, col), ps in params.items()
        if len(ps) == 1
    ]


def _spec_alias_types(
    partition_by: tuple[str, ...],
    fwd: dict,
    schema_types: dict[str, str],
    past_specs: tuple = (),
) -> dict[str, str]:
    """{physical alias dir name: simpleString} for the spec's transform
    entries — what `_typed_part_value` needs to type dir values. Unions
    historical specs: the alias embeds (fn, col), and fn+source type
    determine the dir-value type, so types never conflict across
    evolutions."""
    out: dict[str, str] = {}
    seen: set[tuple[str, str]] = set()
    for spec in (tuple(partition_by), *tuple(past_specs)):
        for entry in spec:
            fn, _param, col = _parse_spec_entry(entry)
            if fn == "identity" or (fn, col) in seen:
                continue
            # NOTE: deliberately NOT `_union_transform_entries` — that
            # helper excludes param-AMBIGUOUS aliases (bucket(4)→bucket(8))
            # from predicate DERIVATION, but the alias TYPE depends only
            # on fn + source type, and per-entry spec snapshots derive
            # exact predicates for those aliases that still need typing.
            seen.add((fn, col))
            pcol = fwd.get(col, col)
            alias = _transform_alias(fn, pcol)
            if fn in ("year", "bucket"):
                out[alias] = "int"
            elif fn in ("month", "day", "hour"):
                out[alias] = "string"
            else:  # truncate: source-typed (bigint for ints)
                src = schema_types.get(col, "string")
                if src in ("tinyint", "smallint", "int", "bigint"):
                    out[alias] = "bigint"
                elif src.startswith("decimal"):
                    out[alias] = src  # dir values parse as Decimal
                else:
                    out[alias] = "string"
    return out


def _derive_transform_preds(
    preds: list[tuple] | None,
    partition_by: tuple[str, ...],
    fwd: dict,
    schema_types: dict[str, str],
    past_specs: tuple = (),
) -> list[tuple] | None:
    """Augment PHYSICAL predicates with conservative dir-name predicates
    on transform aliases: equality derives for every transform, range
    ops derive for the monotone ones (year/month/day/truncate), bucket
    derives equality only. Derived predicates refute leaves by dir name
    exactly like identity partitioning — the 'hidden' in hidden
    partitioning. Historical specs derive too (leaves written before a
    `set_partition_spec` keep dir-name pruning); a derived predicate
    only ever fires against an entry whose part_values carry that alias,
    and param-ambiguous aliases are excluded up front."""
    if not preds:
        return preds
    extra: list[tuple] = []
    for fn, param, col in _union_transform_entries(
        partition_by, past_specs
    ):
        pcol = fwd.get(col, col)
        alias = _transform_alias(fn, pcol)
        for c, op, v in preds:
            if c != pcol or v is None:
                continue
            if op == "in":
                # Equality-class: derives for every transform (bucket
                # included) — each value maps through the transform and
                # the alias keeps IN semantics (dir value ∈ mapped set).
                if not isinstance(v, (list, tuple, set)):
                    continue
                fvs = [
                    _transform_py(fn, param, x, schema_types.get(col, ""))
                    for x in v
                    if x is not None
                ]
                if fvs and all(fv is not None for fv in fvs):
                    extra.append((alias, "in", fvs))
                continue
            fv = _transform_py(fn, param, v, schema_types.get(col, ""))
            if fv is None:
                continue
            if op == "=":
                extra.append((alias, "=", fv))
            elif fn == "bucket":
                continue  # hash: only equality is derivable
            elif op in ("<", "<="):
                extra.append((alias, "<=", fv))
            elif op in (">", ">="):
                extra.append((alias, ">=", fv))
    return preds + extra


def _entry_specs(stats: dict) -> tuple:
    """Distinct per-entry governing specs recorded in a manifest's stats
    (entries written since spec snapshots stamp ``stats["spec"]`` with
    the logical spec that governed the write). Used to union alias TYPES
    — fn + source type determine a dir-value type, so unioning never
    conflicts — and to key exact per-entry predicate derivation."""
    out: list[tuple] = []
    seen: set[tuple] = set()
    for st in stats.values():
        sp = st.get("spec")
        if sp:
            key = tuple(sp)
            if key not in seen:
                seen.add(key)
                out.append(key)
    return tuple(out)


def _entry_derived_preds(
    base_preds: list[tuple] | None,
    stats: dict,
    partition_by: tuple[str, ...],
    fwd: dict,
    schema_types: dict[str, str],
    past_specs: tuple,
    cache: dict,
) -> list[tuple] | None:
    """Transform-derived pruning predicates for ONE entry.

    An entry that recorded its governing spec (``stats["spec"]``,
    written since spec snapshots) derives against EXACTLY that spec —
    single-spec derivation has one param per (fn, col), so the
    param-ambiguity exclusion of `_union_transform_entries` never
    applies: after `bucket(4, id)` evolves to `bucket(8, id)`, old
    leaves prune with their own modulus 4 and new leaves with 8, where
    the union path had to give up on the alias entirely. Legacy entries
    (no snapshot) keep the conservative union/ambiguity-excluded
    derivation. Results are cached per distinct spec — derivation cost
    is O(distinct specs), not O(entries)."""
    spec = stats.get("spec")
    key = tuple(spec) if spec else None
    if key not in cache:
        cache[key] = _derive_transform_preds(
            base_preds,
            key if key is not None else partition_by,
            fwd,
            schema_types,
            () if key is not None else past_specs,
        )
    return cache[key]


def _type_contains_map(dt) -> bool:
    """True iff the type is, or nests anywhere, a MapType. F.hash()
    raises AnalysisException on maps at ANY depth (struct field,
    array element), so the optimize_write salt must exclude a column
    whose type merely *contains* a map, not only top-level maps."""
    name = dt.typeName()
    if name == "map":
        return True
    if name == "array":
        return _type_contains_map(dt.elementType)
    if name == "struct":
        return any(_type_contains_map(f.dataType) for f in dt.fields)
    return False


def _typed_part_value(raw: str | None, type_simple: str):
    """Parse a raw partition-dir string into the column's Python value.

    Runs in sessionless contexts (streaming DataSource workers), so it is
    textual on the simpleString type name — no StructType machinery."""
    if raw is None:
        return None
    t = type_simple
    if t in ("tinyint", "smallint", "int", "bigint"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t.startswith("decimal"):
        return Decimal(raw)
    if t == "date":
        return _dt.date.fromisoformat(raw)
    if t.startswith("timestamp"):
        return _dt.datetime.fromisoformat(raw)
    if t == "boolean":
        return raw.lower() == "true"
    return raw  # string / varchar / char


#: Grammar for ADD COLUMN defaults: plain literals only. Expressions,
#: function calls (current_date(), uuid()), and column references are
#: REFUSED — a non-literal default would evaluate per-read (different
#: answers on different days) and could never be applied consistently
#: by the sessionless reader, which has no SQL evaluator.
_DEFAULT_LITERAL_RE = re.compile(
    r"^\s*(?:"
    r"(?P<null>NULL)"
    r"|(?P<bool>TRUE|FALSE)"
    r"|(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<kind>DATE|TIMESTAMP)\s+'(?P<tval>[^']*)'"
    r"|'(?P<str>(?:[^']|'')*)'"
    r")\s*$",
    re.IGNORECASE,
)


def _default_fill_text(literal: str) -> str | None:
    """Raw string form of a validated default literal — the form
    `_typed_part_value` types for the sessionless reader's fill path
    (None for a NULL literal). Raises ValueError for anything outside
    the literal grammar."""
    m = _DEFAULT_LITERAL_RE.match(literal)
    if not m:
        raise ValueError(
            f"default {literal!r} is not a plain literal (allowed: "
            "NULL, TRUE/FALSE, numbers, 'strings', DATE '...', "
            "TIMESTAMP '...'); expressions and functions refuse — they "
            "would re-evaluate per read"
        )
    if m.group("null"):
        return None
    if m.group("bool"):
        return m.group("bool").lower()
    if m.group("num"):
        return m.group("num")
    if m.group("kind"):
        return m.group("tval")
    return m.group("str").replace("''", "'")


def _promote_temporal(a, b):
    """date vs datetime ordering raises TypeError in Python; promote the
    date side to its midnight instant (SQL comparison semantics). Naive
    the tz-aware side like `_canon_temporal` does."""
    def fix(x, other):
        if isinstance(x, _dt.datetime):
            if x.tzinfo is not None:
                x = x.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return x
        if isinstance(x, _dt.date) and isinstance(other, _dt.datetime):
            return _dt.datetime(x.year, x.month, x.day)
        return x
    return fix(a, b), fix(b, a)


def _range_refutes(lo, hi, op, v) -> bool:
    """True iff [lo, hi] provably contains NO value satisfying `op v`.
    Raises TypeError on incomparable operands — callers treat that as
    'cannot prove, keep'."""
    if op == "=":
        return not (lo <= v <= hi)
    if op == "<":
        return not (lo < v)
    if op == "<=":
        return not (lo <= v)
    if op == ">":
        return not (hi > v)
    if op == ">=":
        return not (hi >= v)
    return False


def _parts_refute(
    part_values: dict, part_types: dict, predicates: list[tuple]
) -> bool:
    """True iff the entry's partition values prove no row can satisfy the
    predicate conjunction. A None (hive-null) partition value refutes any
    comparison predicate on that column (NULL matches none)."""
    for col, op, val in predicates:
        if col not in part_values or op not in _PRUNE_OPS:
            continue
        if op == "in":
            # Disjunction of equalities: the entry is refuted iff EVERY
            # value is refuted individually (empty list = IN () matches
            # no row, so vacuous all() correctly refutes).
            if isinstance(val, (list, tuple, set)) and all(
                _parts_refute(part_values, part_types, [(col, "=", v)])
                for v in val
            ):
                return True
            continue
        raw = part_values[col]
        if raw is None:
            return True
        try:
            pv = _typed_part_value(raw, part_types.get(col, "string"))
            a, b = _promote_temporal(pv, val)
            if _range_refutes(a, a, op, b):
                return True
        except (TypeError, ValueError, InvalidOperation, OverflowError):
            continue  # unparseable / incomparable: can't prove, keep
    return False


def _entry_may_match(
    stats: dict, predicates: list[tuple], part_types: dict
) -> bool:
    """Entry-level pruning = partition-name refutation OR bloom-filter
    refutation (equality predicates) OR footer-stat refutation; any one
    alone suffices to skip the entry."""
    pv = stats.get("part_values")
    if pv and _parts_refute(pv, part_types, predicates):
        return False
    blooms = stats.get("bloom")
    if blooms:
        for col, op, val in predicates:
            if (
                op == "in"
                and col in blooms
                and isinstance(val, (list, tuple, set))
                and val
                and all(
                    isinstance(v, (int, str)) and not isinstance(v, bool)
                    for v in val
                )
            ):
                # Disjunction of equalities: refuted iff the filter
                # proves absent for EVERY value.
                meta = blooms[col]
                try:
                    if all(
                        not _bloom_may_contain(
                            meta["b64"], v, meta["m"], meta["k"]
                        )
                        for v in val
                    ):
                        return False
                except (KeyError, ValueError, TypeError):
                    continue  # malformed filter: can't prove, keep
            if (
                op == "="
                and col in blooms
                and isinstance(val, (int, str))
                and not isinstance(val, bool)
            ):
                meta = blooms[col]
                try:
                    if not _bloom_may_contain(
                        meta["b64"], val, meta["m"], meta["k"]
                    ):
                        return False
                except (KeyError, ValueError, TypeError):
                    continue  # malformed filter: can't prove, keep
    return _dir_may_match(stats, predicates)


def _canon_temporal(v):
    """Canonicalize ISO date/datetime STRINGS to datetime for comparison.

    Footer stats for DATE columns serialize as ``'YYYY-MM-DD'`` while a
    datetime predicate serializes as ``'YYYY-MM-DDTHH:MM:SS'``; raw
    lexicographic comparison then prunes a dir whose min==max equals the
    predicate's date (``'1998-12-01' >= '1998-12-01T00:00:00'`` is False as
    strings) — silent row loss. Parsing both sides restores SQL semantics:
    a date promotes to its midnight instant, and tz-aware values (UTC
    footer stats serialize with '+00:00') normalize to naive UTC per the
    engine's session-TZ-pinned-UTC contract. Non-temporal values pass
    through; anything still incomparable raises TypeError downstream,
    which the caller treats as 'cannot prove, keep the dir'."""
    if isinstance(v, str) and _ISO_PREFIX.match(v):
        try:
            d = _dt.datetime.fromisoformat(v)
        except ValueError:
            return v
        if d.tzinfo is not None:
            d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return d
    return v


def _dir_may_match(dir_stats: dict, predicates: list[tuple]) -> bool:
    """False only when the stats PROVE no row in the dir satisfies every
    predicate (conjunction). Missing stats always mean 'may match' —
    pruning must never be load-bearing for correctness."""
    if not dir_stats:
        return True
    if dir_stats.get("rows") == 0:
        return False  # provably empty: nothing to match
    for col, op, val in predicates:
        if op == "in":
            # Disjunction of equalities: the dir is refuted iff its
            # stats refute EVERY value (empty IN () matches no row).
            if isinstance(val, (list, tuple, set)) and all(
                not _dir_may_match(dir_stats, [(col, "=", v)])
                for v in val
            ):
                return False
            continue
        cs = dir_stats.get("columns", {}).get(col)
        if cs is None:
            continue
        if "min" not in cs:
            # Column has stats but no min/max => every value is NULL in
            # this dir, and no comparison predicate matches NULL.
            if cs["nulls"] >= dir_stats.get("rows", 0) > 0:
                return False
            continue
        is_temporal_pred = isinstance(val, (_dt.date, _dt.datetime))
        v = _stat_jsonable(val)
        if v is None:
            continue
        if is_temporal_pred:
            # Canonicalize ONLY when the predicate value is a real
            # date/datetime: a STRING column whose values happen to look
            # ISO (possibly with mixed UTC offsets) must keep raw
            # lexicographic comparison — canon is not order-preserving
            # across offsets, so it could refute a dir whose string
            # min/max actually bound the matching row.
            v = _canon_temporal(v)
            lo, hi = _canon_temporal(cs["min"]), _canon_temporal(cs["max"])
        else:
            lo, hi = cs["min"], cs["max"]
        try:
            if _range_refutes(lo, hi, op, v):
                return False
        except TypeError:
            continue  # cross-type comparison: can't prove, keep the dir
    return True


def _file_may_match(fs: dict, predicates: list[tuple]) -> bool:
    """Per-FILE refutation: the file-level envelope first, then — when
    per-row-group envelopes were harvested — a file every one of whose
    row groups individually refutes the conjunction is skipped at
    planning even though its file-level [min, max] matches (clustered
    files hold disjoint ranges; z-order/sorted writes produce exactly
    this shape). Row-group granularity beyond that is Spark's own
    footer-based skipping at scan time — pushed filters reach the
    parquet reader, which drops refuted groups per file it does open."""
    if not _dir_may_match(fs, predicates):
        return False
    rgs = fs.get("rgs")
    if rgs and all(
        not _dir_may_match(rg_st, predicates) for rg_st in rgs
    ):
        return False
    return True


def _conform(
    df: DataFrame, schema, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Project `df` onto `schema`'s columns in order — columns the frame
    lacks (files predating an evolved column, subset appends) become typed
    NULLs, exactly like a mergeSchema read; `extra_cols` (e.g.
    `_change_type`) are carried through verbatim after the data columns.
    One definition for every conform site (snapshot-scoped reads, the
    change feed's append and CDF pieces) so their semantics can't drift.
    Columns present under a NARROWER type (change files written before a
    type widening) cast up to the schema type."""
    have = {f.name: f.dataType for f in df.schema.fields}
    return df.select(
        *[
            (
                F.col(f.name)
                if have[f.name] == f.dataType
                else F.col(f.name).cast(f.dataType).alias(f.name)
            )
            if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ],
        *extra_cols,
    )


def _rename_columns(df: DataFrame, names: dict[str, str]) -> DataFrame:
    """Rename by map (missing keys pass through); one projection."""
    if not names:
        return df
    return df.select(
        *[F.col(c).alias(names.get(c, c)) for c in df.columns]
    )


def _log_to_phys(mapping: dict) -> dict[str, str]:
    return {
        l: p for l, p in mapping.get("map", {}).items() if l != p
    }


def _phys_to_log(mapping: dict) -> dict[str, str]:
    return {
        p: l for l, p in mapping.get("map", {}).items() if l != p
    }


def _enforce_constraints(df: DataFrame, constraints: dict) -> None:
    """Raise ConstraintViolationError iff any row of `df` makes any CHECK
    expression FALSE (standard SQL CHECK: NULL passes — spell
    `col IS NOT NULL` to forbid it). Short-circuiting limit-1 scans of
    the INCOMING rows only, never of the table; a violation aborts before
    any data is written."""
    if not constraints:
        return
    for name, expr in constraints.items():
        bad = df.filter(F.expr(expr) == False).limit(1).collect()  # noqa: E712
        if bad:
            raise ConstraintViolationError(
                f"CHECK constraint {name!r} ({expr}) violated, e.g. by "
                f"row {bad[0].asDict()}"
            )


def _predicates_to_column(predicates: list[tuple]) -> Column:
    ops = {
        "=": Column.__eq__,
        "<": Column.__lt__,
        "<=": Column.__le__,
        ">": Column.__gt__,
        ">=": Column.__ge__,
    }
    cond = F.lit(True)
    for col, op, val in predicates:
        if op == "in":
            # Match the _parts_refute guard: a scalar here would
            # list()-explode a string into characters while the
            # pruning layers silently skip it — the row filter and the
            # prune stack must agree on what an `in` predicate means.
            if not isinstance(val, (list, tuple, set)):
                raise ValueError(
                    "'in' predicate value must be a list/tuple/set, "
                    f"got {type(val).__name__}"
                )
            cond = cond & F.col(col).isin(list(val))
            continue
        if op not in ops:
            raise ValueError(f"unsupported op {op!r}; one of {_PRUNE_OPS}")
        cond = cond & ops[op](F.col(col), F.lit(val))
    return cond


@dataclass(frozen=True)
class Manifest:
    version: int
    operation: str
    #: Entries relative to table root, read order. An entry is a whole
    #: data dir (`data/<uuid>`), a hive partition LEAF dir
    #: (`data/<uuid>/col=val/...`, partitioned tables), or a single
    #: parquet file (`.../part-*.parquet`, carried forward by a
    #: file-granular scoped merge).
    files: tuple[str, ...]
    schema_ddl: str
    committed_at: str
    summary: dict
    stats: dict = field(default_factory=dict)  # entry -> footer stats
    #: Hive-style partition columns, fixed at create(); leaf entries carry
    #: their parsed values in stats[rel]["part_values"].
    partition_by: tuple[str, ...] = ()
    #: CHECK constraints {name: boolean SQL expr}, enforced on every write
    #: of new rows; carried forward per commit (missing in pre-constraint
    #: manifests -> no constraints).
    constraints: dict = field(default_factory=dict)
    #: Columns with per-commit bloom filters for `=` pruning; fixed at
    #: create(), carried forward.
    bloom_columns: tuple[str, ...] = ()
    #: Merge-on-read deferred deletes: [{"sql": predicate, "entries":
    #: [rels it applies to]}]. A predicate filters ONLY the entries (or
    #: their carried descendants) that existed when it committed — later
    #: appends are untouched, rewrites materialize it — the role of
    #: Iceberg's sequence-number scoping for delete files.
    delete_predicates: tuple = ()
    #: Column mapping (Delta column-mapping shape): {"map": {logical:
    #: physical}, "retired": [physical...]}. Empty = identity. Renames
    #: and drops are metadata-only; files keep their physical names
    #: forever, reads translate.
    column_mapping: dict = field(default_factory=dict)
    #: Partition specs that PREVIOUSLY governed writes (partition
    #: evolution history, oldest first, current spec excluded): old-spec
    #: leaves keep transform-alias dir-name pruning forever because
    #: predicate derivation unions these with the current spec.
    past_specs: tuple = ()
    #: Initial defaults for columns added by `add_column(default=...)`
    #: (Iceberg v3 initial-default shape): {logical column: {"default":
    #: SQL literal text, "entries": [rels live at add time],
    #: "since_version": add version}}. A column physically absent from
    #: a scoped entry reads its default instead of NULL; entries
    #: written after the add (including merge_schema subset appends)
    #: are out of scope and keep the NULL posture — the default
    #: backfills history, it is not a write default.
    column_defaults: dict = field(default_factory=dict)
    #: WRITE defaults (`ALTER COLUMN c SET DEFAULT lit`, the Delta
    #: allowColumnDefaults shape): {logical column: SQL literal text}.
    #: Future appends/INSERTs that OMIT the column store the literal
    #: (filled at write — real values in the files); columns present in
    #: the frame are never touched (an explicit NULL stays NULL).
    #: Orthogonal to `column_defaults` (which backfills history at
    #: read); both may exist on one column with different literals.
    write_defaults: dict = field(default_factory=dict)
    #: Optimized write (Delta's optimizeWrite shape, opt-in at
    #: create()): partitioned commits repartition by the partition dir
    #: columns before writing, so each leaf gets ONE file per commit
    #: instead of one per shuffle task — without it a 32-task write
    #: into N leaves fragments into 32×N small files, and a pruned
    #: read's per-file open cost eats the pruning win. Off by default:
    #: the shuffle it adds is wasted on unpartitioned tables, and a
    #: huge single-leaf bootstrap would serialize into one task.
    optimize_write: bool = False

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "files": list(self.files),
                "schema_ddl": self.schema_ddl,
                "committed_at": self.committed_at,
                "summary": self.summary,
                "stats": self.stats,
                "partition_by": list(self.partition_by),
                "constraints": self.constraints,
                "bloom_columns": list(self.bloom_columns),
                "delete_predicates": list(self.delete_predicates),
                "column_mapping": self.column_mapping,
                "past_specs": [list(sp) for sp in self.past_specs],
                "column_defaults": self.column_defaults,
                "write_defaults": self.write_defaults,
                "optimize_write": self.optimize_write,
            },
            indent=2,
            sort_keys=True,
        )

    def to_delta_json(self, parent: "Manifest") -> str | None:
        """Delta encoding vs the immediate parent (the Delta-log /
        Iceberg-manifest-list idea): a commit records only the entries
        it ADDED and REMOVED (plus any changed metadata fields), so
        commit metadata cost is proportional to the CHANGE, not to the
        number of live files — the property that keeps a scan-free MoR
        upsert genuinely O(batch) when the table holds millions of
        entries. Every `_CHECKPOINT_INTERVAL`-th version is written as
        a full snapshot instead, bounding read-side reconstruction to a
        short tail.

        Returns None when a delta cannot reproduce this manifest
        byte-exactly (surviving entries were REORDERED — compact /
        z-order rewrites) or would not be smaller than a checkpoint —
        the caller writes a full snapshot."""
        if parent.version != self.version - 1:
            return None
        pset = set(parent.files)
        nset = set(self.files)
        removed = [f for f in parent.files if f not in nset]
        added = [f for f in self.files if f not in pset]
        recon = [f for f in parent.files if f in nset] + added
        if recon != list(self.files):
            return None  # surviving-entry reorder: full snapshot
        stats_set = {
            k: v
            for k, v in self.stats.items()
            if k not in parent.stats or parent.stats[k] != v
        }
        stats_dropped = [k for k in parent.stats if k not in self.stats]
        if len(added) + len(removed) + len(stats_set) >= max(
            1, len(self.files) + len(self.stats)
        ):
            return None  # delta would be as big as the checkpoint
        d: dict = {
            "delta_of": parent.version,
            "version": self.version,
            "operation": self.operation,
            "committed_at": self.committed_at,
            "summary": self.summary,
            "files_added": added,
            "files_removed": removed,
            "stats_set": stats_set,
            "stats_dropped": stats_dropped,
        }
        for key, mine, theirs in (
            ("schema_ddl", self.schema_ddl, parent.schema_ddl),
            (
                "partition_by",
                list(self.partition_by),
                list(parent.partition_by),
            ),
            ("constraints", self.constraints, parent.constraints),
            (
                "bloom_columns",
                list(self.bloom_columns),
                list(parent.bloom_columns),
            ),
            (
                "delete_predicates",
                list(self.delete_predicates),
                list(parent.delete_predicates),
            ),
            ("column_mapping", self.column_mapping, parent.column_mapping),
            (
                "past_specs",
                [list(sp) for sp in self.past_specs],
                [list(sp) for sp in parent.past_specs],
            ),
            (
                "column_defaults",
                self.column_defaults,
                parent.column_defaults,
            ),
            (
                "write_defaults",
                self.write_defaults,
                parent.write_defaults,
            ),
            (
                "optimize_write",
                self.optimize_write,
                parent.optimize_write,
            ),
        ):
            if mine != theirs:
                d[key] = mine
        return json.dumps(d, indent=2, sort_keys=True)

    @staticmethod
    def from_json_dict(d: dict) -> "Manifest":
        return Manifest(
            version=d["version"],
            operation=d["operation"],
            files=tuple(d["files"]),
            schema_ddl=d["schema_ddl"],
            committed_at=d["committed_at"],
            summary=d.get("summary", {}),
            stats=d.get("stats", {}),
            partition_by=tuple(d.get("partition_by", ())),
            constraints=d.get("constraints", {}),
            bloom_columns=tuple(d.get("bloom_columns", ())),
            delete_predicates=tuple(d.get("delete_predicates", ())),
            column_mapping=d.get("column_mapping", {}),
            past_specs=tuple(
                tuple(sp) for sp in d.get("past_specs", ())
            ),
            column_defaults=d.get("column_defaults", {}),
            write_defaults=d.get("write_defaults", {}),
            optimize_write=d.get("optimize_write", False),
        )

    @staticmethod
    def from_json(text: str) -> "Manifest":
        return Manifest.from_json_dict(json.loads(text))

    def physical_name(self, logical: str) -> str:
        return self.column_mapping.get("map", {}).get(logical, logical)


def _manifest_name(version: int) -> str:
    return f"v{version:08d}.json"


#: Every Nth version is a FULL snapshot (checkpoint); the versions in
#: between are deltas vs their parent. Reconstruction of any version
#: therefore reads at most N small files. 10 matches Delta's default
#: checkpoint interval.
_CHECKPOINT_INTERVAL = 10

#: Sharded checkpoints (the Iceberg manifest-LIST shape): a checkpoint
#: of a table with >= _SHARD_MIN_ENTRIES entries does not inline its
#: entry list — the ordered list is cut into _CHUNK_SIZE-entry slices,
#: each written once as an immutable CONTENT-ADDRESSED file under
#: `_manifests/chunks/` and referenced by name from the checkpoint
#: skeleton. Appends extend the tail, so every earlier slice's content
#: (and therefore its name) is unchanged and the file is NOT rewritten:
#: periodic-checkpoint cost is ∝ changed slices, not O(live entries) —
#: the last metadata-plane ceiling. Branch seeds reference the same
#: shared chunk store, so branch creation writes only slices main never
#: checkpointed. Chunks are written BEFORE the manifest claims its
#: version (write-ahead; a crash leaves orphan chunks that vacuum
#: reclaims) and content addressing makes racing same-content writers
#: idempotent. Below the threshold a checkpoint stays a plain inline
#: snapshot — sharding tiny tables would only multiply file counts.
_CHUNKS_SUBDIR = "chunks"
_CHUNK_SIZE = 100
_SHARD_MIN_ENTRIES = 200


def _chunks_dir_for(mdir: str) -> str:
    """The table-shared chunk store for a manifest dir — branch dirs
    (`<root>/_manifests/branches/<name>`) resolve to the SAME store as
    main, so seeds and publishes reuse each other's slices."""
    parent = os.path.dirname(mdir)
    if os.path.basename(parent) == _BRANCHES_SUBDIR:
        return os.path.join(os.path.dirname(parent), _CHUNKS_SUBDIR)
    return os.path.join(mdir, _CHUNKS_SUBDIR)


def _write_chunk(cdir: str, name: str, body: str) -> str:
    """Write a content-addressed chunk if absent; if it already exists,
    REFRESH its mtime — reuse is a write-ahead claim exactly like a
    fresh write, so vacuum's mtime guard covers reused slices too (an
    orphaned chunk being re-adopted must not be reclaimed between the
    existence check and the version claim). A FileNotFoundError from
    utime means vacuum won the race — fall through and rewrite."""
    path = os.path.join(cdir, name)
    try:
        os.utime(path, None)
        return name
    except FileNotFoundError:
        pass
    tmp = os.path.join(cdir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(body)
    os.replace(tmp, path)
    return name


def _checkpoint_text(m: "Manifest", mdir: str) -> str:
    """Serialize a FULL snapshot: inline below _SHARD_MIN_ENTRIES
    entries, sharded manifest-list form at or above it (side effect:
    missing chunk files are written, atomically via temp+rename).
    Initial-default entry scopes (`column_defaults[col]['entries']`,
    O(live-entries-at-add-time) rels) shard through the SAME chunk
    store once they cross _SHARD_MIN_ENTRIES — content-addressed, so
    every checkpoint after the add references one immutable chunk
    instead of re-inlining the list (the list never changes after the
    add, so the name never changes and the file is written once)."""
    import hashlib

    def chunkname(body: str) -> str:
        return f"c-{hashlib.sha256(body.encode()).hexdigest()[:16]}.json"

    big_defaults = [
        c
        for c, spec in m.column_defaults.items()
        if len(spec.get("entries", ())) >= _SHARD_MIN_ENTRIES
    ]
    if len(m.files) < _SHARD_MIN_ENTRIES and not big_defaults:
        return m.to_json()
    cdir = _chunks_dir_for(mdir)
    os.makedirs(cdir, exist_ok=True)
    d = json.loads(m.to_json())
    if len(m.files) >= _SHARD_MIN_ENTRIES:
        chunk_names: list[str] = []
        covered: set[str] = set()
        for i in range(0, len(m.files), _CHUNK_SIZE):
            sl = list(m.files[i : i + _CHUNK_SIZE])
            covered.update(sl)
            body = json.dumps(
                {
                    "files": sl,
                    "stats": {
                        r: m.stats[r] for r in sl if r in m.stats
                    },
                },
                sort_keys=True,
            )
            chunk_names.append(_write_chunk(cdir, chunkname(body), body))
        del d["files"]
        # Residual stats (keys outside the entry list — e.g.
        # annotations for non-entry rels) stay inline so nothing is
        # silently dropped.
        d["stats"] = {
            k: v for k, v in m.stats.items() if k not in covered
        }
        d["chunks"] = chunk_names
    for c in big_defaults:
        spec = dict(d["column_defaults"][c])
        body = json.dumps(
            {"entries": list(spec.pop("entries"))}, sort_keys=True
        )
        spec["entries_chunk"] = _write_chunk(cdir, chunkname(body), body)
        d["column_defaults"][c] = spec
    return json.dumps(d, indent=2, sort_keys=True)


def _has_chunk_refs(d: dict) -> bool:
    """True iff a raw version-file dict references the chunk store
    anywhere (sharded entry list OR sharded default scope) and must go
    through :func:`_inline_chunks` before Manifest construction."""
    return "chunks" in d or any(
        "entries_chunk" in spec
        for spec in d.get("column_defaults", {}).values()
    )


def _inline_chunks(d: dict, mdir: str) -> dict:
    """Resolve a sharded checkpoint dict into plain inline form. A
    missing or unreadable chunk raises loudly (chunks referenced by any
    live manifest are never vacuumed — absence is corruption, and a
    silently shorter table would be the worst possible answer)."""
    cdir = _chunks_dir_for(mdir)
    out = {k: v for k, v in d.items() if k != "chunks"}
    if "chunks" in d:
        files: list[str] = []
        stats: dict = dict(d.get("stats", {}))
        for name in d["chunks"]:
            with open(os.path.join(cdir, name)) as f:
                c = json.loads(f.read())
            files.extend(c["files"])
            stats.update(c["stats"])
        out["files"] = files
        out["stats"] = stats
    defaults = {}
    for col, spec in d.get("column_defaults", {}).items():
        if "entries_chunk" in spec:
            spec = dict(spec)
            with open(os.path.join(cdir, spec.pop("entries_chunk"))) as f:
                spec["entries"] = json.loads(f.read())["entries"]
        defaults[col] = spec
    if defaults:
        out["column_defaults"] = defaults
    return out


def _parse_version_file(text: str) -> dict:
    """Raw dict of a committed version file (full snapshot OR delta);
    raises KeyError/ValueError for a TORN CLAIM (crashed writer left
    the name without parseable content) — callers skip those."""
    d = json.loads(text)
    if "version" not in d or (
        "files" not in d and "delta_of" not in d and "chunks" not in d
    ):
        raise KeyError("not a committed manifest")
    return d


def _apply_delta(parent: Manifest, d: dict) -> Manifest:
    """Reconstruct a delta-encoded version on top of its parent."""
    removed = set(d.get("files_removed", ()))
    nfiles = [f for f in parent.files if f not in removed] + list(
        d.get("files_added", ())
    )
    dropped = set(d.get("stats_dropped", ()))
    stats = {
        k: v for k, v in parent.stats.items() if k not in dropped
    }
    stats.update(d.get("stats_set", {}))
    return Manifest(
        version=d["version"],
        operation=d["operation"],
        files=tuple(nfiles),
        schema_ddl=d.get("schema_ddl", parent.schema_ddl),
        committed_at=d["committed_at"],
        summary=d.get("summary", {}),
        stats=stats,
        partition_by=(
            tuple(d["partition_by"])
            if "partition_by" in d
            else parent.partition_by
        ),
        constraints=(
            dict(d["constraints"])
            if "constraints" in d
            else parent.constraints
        ),
        bloom_columns=(
            tuple(d["bloom_columns"])
            if "bloom_columns" in d
            else parent.bloom_columns
        ),
        delete_predicates=(
            tuple(d["delete_predicates"])
            if "delete_predicates" in d
            else parent.delete_predicates
        ),
        column_mapping=(
            dict(d["column_mapping"])
            if "column_mapping" in d
            else parent.column_mapping
        ),
        past_specs=(
            tuple(tuple(sp) for sp in d["past_specs"])
            if "past_specs" in d
            else parent.past_specs
        ),
        column_defaults=(
            dict(d["column_defaults"])
            if "column_defaults" in d
            else parent.column_defaults
        ),
        write_defaults=(
            dict(d["write_defaults"])
            if "write_defaults" in d
            else parent.write_defaults
        ),
        optimize_write=d.get("optimize_write", parent.optimize_write),
    )


def load_all_manifests(mdir: str) -> list[Manifest]:
    """Every committed version, oldest first, reconstructing deltas on
    the fly in one forward pass. Torn claims are skipped (they can't
    serve reads); a delta whose parent is unreadable is skipped too —
    `expire_versions` guarantees that never happens for retained
    versions by materializing the oldest survivor as a checkpoint."""
    out: list[Manifest] = []
    prev: Manifest | None = None
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                d = _parse_version_file(f.read())
        except (OSError, ValueError, KeyError):
            continue  # torn claim
        if "delta_of" in d and "files" not in d:
            if prev is None or prev.version != d["delta_of"]:
                continue  # broken chain head; unreadable
            m = _apply_delta(prev, d)
        else:
            # Chunk resolution OUTSIDE the torn-claim net: a missing
            # chunk is corruption and must raise, never skip.
            if _has_chunk_refs(d):
                d = _inline_chunks(d, mdir)
            m = Manifest.from_json_dict(d)
        out.append(m)
        prev = m
    return out


def load_manifest_at(mdir: str, version: int) -> Manifest:
    """One version, reading only its delta chain back to the nearest
    checkpoint — at most `_CHECKPOINT_INTERVAL` small files, never the
    whole history."""
    chain: list[dict] = []
    v = version
    while True:
        path = os.path.join(mdir, _manifest_name(v))
        try:
            with open(path) as f:
                d = _parse_version_file(f.read())
        except (OSError, ValueError, KeyError):
            raise NoSuchVersionError(f"{mdir}: no version {v}")
        chain.append(d)
        if "delta_of" not in d or "files" in d:
            break
        v = d["delta_of"]
    base = chain[-1]
    if _has_chunk_refs(base):
        base = _inline_chunks(base, mdir)
    m = Manifest.from_json_dict(base)
    for d in reversed(chain[:-1]):
        m = _apply_delta(m, d)
    return m


# -- commit protocol ---------------------------------------------------------
#
# The table's ONLY synchronization point is "claim the next manifest path,
# exactly one racing writer wins". That primitive is storage-specific, so it
# lives behind an interface: POSIX filesystems get hard-link semantics;
# object stores (S3 Nov-2024+ conditional writes, GCS if-generation-match,
# ABFS If-None-Match ETag) get a single conditional PUT. Everything above —
# optimistic retry, rebase, snapshot isolation — is protocol-agnostic.

class CommitProtocol:
    """Atomically publish `content` at `final_path`, failing with
    ConcurrentCommitError iff the path already exists."""

    def publish(self, final_path: str, content: str) -> None:
        raise NotImplementedError


class HardLinkCommitProtocol(CommitProtocol):
    """POSIX: write a temp file, then link(2) it to the final name.

    link fails with EEXIST when the version already exists, so exactly one
    of any number of racing writers wins — no locks, no read-modify-write
    window — and readers only ever see complete manifests (the content is
    durable before the name appears)."""

    def publish(self, final_path: str, content: str) -> None:
        d = os.path.dirname(final_path)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(content)
        try:
            os.link(tmp, final_path)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"{os.path.basename(final_path)} was committed concurrently"
            ) from None
        finally:
            os.remove(tmp)


class ConditionalPutCommitProtocol(CommitProtocol):
    """Object-store shape: ONE conditional create of the final object —
    no temp name, no rename, no link (none of which object stores offer
    atomically). Subclass and override `_put_if_absent` with the store's
    real call (S3 `PUT If-None-Match: *`, GCS `if-generation-match: 0`,
    ABFS `If-None-Match` on the ETag).

    The local emulation uses O_CREAT|O_EXCL, which matches the claim
    semantics exactly; unlike a real object store (whole-object PUT
    atomicity) it has a create-then-write window: a concurrent local
    READER could observe a partial manifest, and a hard crash (SIGKILL)
    between create and write leaves a torn file that both claims the
    version and fails manifest parsing — readers skip torn manifests, and
    `vacuum()` reclaims claims older than its timeout so the version
    number un-burns and the next writer commits it.
    A failed write cleans up after itself (claim released, caller can
    retry). On POSIX filesystems prefer HardLinkCommitProtocol, which has
    neither window — this class exists to validate the protocol logic and
    as the template for real object-store bindings, where the single
    conditional PUT is genuinely atomic and the windows don't exist."""

    def _put_if_absent(self, path: str, content: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
        except BaseException:
            # Release the claim instead of leaving a torn manifest that
            # permanently wedges the version number.
            try:
                os.remove(path)
            except OSError:
                pass
            raise
        return True

    def publish(self, final_path: str, content: str) -> None:
        if not self._put_if_absent(final_path, content):
            raise ConcurrentCommitError(
                f"{os.path.basename(final_path)} was committed concurrently"
            )


class VersionedTable:
    """A versioned parquet table rooted at a directory.

    Use :meth:`create` to initialize, then :meth:`append` / :meth:`overwrite`
    / :meth:`merge` / :meth:`delete_where` to evolve it; every operation
    commits a NEW immutable version. :meth:`read` time-travels.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        commit_protocol: CommitProtocol | None = None,
        materialize_changes: bool = True,
        branch: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self._protocol = commit_protocol or HardLinkCommitProtocol()
        #: version -> ((mtime_ns, size), Manifest) reconstruction memo.
        self._mcache: dict[int, tuple] = {}
        #: With False, copy-on-write DML skips writing change files (Delta
        #: makes CDF opt-in for the same reason: a table nobody consumes
        #: as a feed shouldn't pay an extra snapshot-sized write per
        #: commit). Batch `changes()` then falls back to the exceptAll
        #: diff for those commits; the STREAMING source refuses them.
        self._materialize_changes = materialize_changes
        if not os.path.isdir(os.path.join(root, _MANIFEST_DIR)):
            raise NoSuchVersionError(
                f"{root} is not a versioned table (no {_MANIFEST_DIR}/); "
                "use VersionedTable.create"
            )
        #: Named ref (Iceberg branch / Nessie ref shape). A branch handle
        #: shares the table's DATA space (root/data, root/deletes, ...)
        #: but commits to its OWN manifest chain under
        #: `_manifests/branches/<name>/`, seeded at create_branch time
        #: with a full checkpoint of the branch-point version — so every
        #: read/DML method works on a branch unchanged, main never sees
        #: branch commits, and creation is O(one manifest), zero data.
        self.branch_name = branch
        if branch is None:
            self._mdir = os.path.join(root, _MANIFEST_DIR)
        else:
            self._mdir = os.path.join(
                root, _MANIFEST_DIR, _BRANCHES_SUBDIR, branch
            )
            if not os.path.isdir(self._mdir):
                raise NoSuchBranchError(
                    f"{root}: no branch {branch!r} "
                    f"(existing: {_branch_names(root)})"
                )

    # -- creation ----------------------------------------------------------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        df: DataFrame,
        summary: dict | None = None,
        commit_protocol: CommitProtocol | None = None,
        materialize_changes: bool = True,
        partition_by: list[str] | None = None,
        check_constraints: dict[str, str] | None = None,
        not_null: list[str] | None = None,
        bloom_columns: list[str] | None = None,
        optimize_write: bool = False,
    ) -> "VersionedTable":
        """With `partition_by`, data is laid out hive-style
        (`col=value/` leaf dirs, one manifest entry each) and reads prune
        partition-column predicates from the dir NAMES — no footer stats
        involved, so even stat-less types (decimal) prune. The spec can
        evolve later via :meth:`set_partition_spec` (Iceberg-style: old
        entries keep their layout, new writes use the new spec).

        Reference anchor: the reference's output pathing is config-driven
        `{basePath}/{relativePath}`
        (`src/Infrastructure/Upload/Providers/FileSystemUploadProvider.cs:64-76`);
        partition-column directories are the lake-native generalization."""
        pb = tuple(partition_by or ())
        _types0 = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        _validate_spec(pb, _types0)
        identity_cols = {
            _parse_spec_entry(e)[2]
            for e in pb
            if _parse_spec_entry(e)[0] == "identity"
        }
        if pb and len(identity_cols) == len(df.columns):
            raise ValueError("cannot partition by every column")
        constraints = dict(check_constraints or {})
        for col in not_null or ():
            # NOT NULL is CHECK sugar; the explicit IS NOT NULL overrides
            # standard CHECK's NULL-passes semantics for that column.
            constraints[f"{col}_not_null"] = f"{col} IS NOT NULL"
        bc = tuple(bloom_columns or ())
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for col in bc:
            if types.get(col) not in _BLOOM_TYPES:
                raise ValueError(
                    f"bloom column {col!r} must be one of {_BLOOM_TYPES}, "
                    f"got {types.get(col)}"
                )
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)
        table = VersionedTable(
            spark,
            root,
            commit_protocol=commit_protocol,
            materialize_changes=materialize_changes,
        )
        _enforce_constraints(df, constraints)
        entries = table._write_data_entries(
            df, pb, bloom_columns=bc, optimize_write=optimize_write
        )
        table._commit(
            operation="create",
            files=tuple(entries),
            schema_ddl=df.schema.simpleString(),
            expected_parent=0,
            summary=summary,
            stats=entries,
            partition_by=pb,
            constraints=constraints,
            bloom_columns=bc,
            optimize_write=bool(optimize_write),
        )
        return table

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN as a metadata-only commit (Delta column-mapping
        shape): files keep the old PHYSICAL name forever; the manifest's
        logical schema renames and the mapping records logical → physical.
        Reads translate on the fly (zero rewrite), stats/blooms/partition
        dirs keep working (they're keyed physical), and the change feed
        serves pre-rename history under the new name. Constraints and
        deferred-delete predicates referencing the column by its old name
        must be dropped first (they're SQL text; renaming under them would
        break or silently misbind them)."""
        from pyspark.sql.types import StructField, StructType

        parent = self.latest_version()
        pm = self.manifest(parent)
        schema = StructType.fromDDL(pm.schema_ddl)
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"no column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        for cname, expr in pm.constraints.items():
            if re.search(rf"\b{re.escape(old)}\b", expr):
                raise ValueError(
                    f"constraint {cname!r} references {old!r}; drop it "
                    "before renaming"
                )
        for p in pm.delete_predicates:
            # Position deletes reference (file, row) coordinates, never
            # column names — rename-safe; SQL predicates and equality
            # deletes bind names.
            if "sql" in p and re.search(
                rf"\b{re.escape(old)}\b", p["sql"]
            ):
                raise ValueError(
                    f"a deferred delete references {old!r}; compact() to "
                    "materialize it before renaming"
                )
            if old in p.get("cols", ()):
                raise ValueError(
                    f"an equality delete keys on {old!r}; compact() to "
                    "materialize it before renaming"
                )
        mapping = {
            "map": dict(pm.column_mapping.get("map", {})),
            "retired": list(pm.column_mapping.get("retired", [])),
        }
        physical = mapping["map"].pop(old, old)
        mapping["map"][new] = physical
        new_schema = StructType(
            [
                StructField(new, f.dataType, f.nullable)
                if f.name == old
                else f
                for f in schema.fields
            ]
        )
        pb = tuple(new if c == old else c for c in pm.partition_by)
        blooms = tuple(new if c == old else c for c in pm.bloom_columns)
        # A default follows its column's LOGICAL name (the literal text
        # can't reference columns, so only the key moves).
        defaults = {
            (new if c == old else c): spec
            for c, spec in pm.column_defaults.items()
        }
        wdefaults = {
            (new if c == old else c): lit
            for c, lit in pm.write_defaults.items()
        }
        return self._commit(
            operation="rename_column",
            files=pm.files,
            schema_ddl=new_schema.simpleString(),
            expected_parent=parent,
            summary={
                "renamed": {"from": old, "to": new},
                "cdf_empty": True,
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            partition_by=pb,
            bloom_columns=blooms,
            column_mapping=mapping,
            column_defaults=defaults,
            write_defaults=wdefaults,
        )

    def drop_column(self, col: str) -> int:
        """DROP COLUMN as a metadata-only commit: the physical column
        stays in old files (reads shed it via the logical schema), its
        physical name is RETIRED so a future added column can't collide
        with lingering data, and rewrites simply stop carrying it.
        Partition/bloom columns and columns referenced by constraints or
        deferred deletes cannot be dropped."""
        from pyspark.sql.types import StructType

        parent = self.latest_version()
        pm = self.manifest(parent)
        schema = StructType.fromDDL(pm.schema_ddl)
        names = [f.name for f in schema.fields]
        if col not in names:
            raise ValueError(f"no column {col!r}")
        if len(names) == 1:
            raise ValueError("cannot drop the only column")
        if col in pm.partition_by:
            raise ValueError(f"{col!r} is a partition column")
        if col in pm.bloom_columns:
            raise ValueError(f"{col!r} is a bloom column")
        for cname, expr in pm.constraints.items():
            if re.search(rf"\b{re.escape(col)}\b", expr):
                raise ValueError(
                    f"constraint {cname!r} references {col!r}"
                )
        for p in pm.delete_predicates:
            if "sql" in p and re.search(
                rf"\b{re.escape(col)}\b", p["sql"]
            ):
                raise ValueError(
                    f"a deferred delete references {col!r}; compact() "
                    "first"
                )
            if col in p.get("cols", ()):
                raise ValueError(
                    f"an equality delete keys on {col!r}; compact() "
                    "first"
                )
        mapping = {
            "map": dict(pm.column_mapping.get("map", {})),
            "retired": list(pm.column_mapping.get("retired", [])),
        }
        physical = mapping["map"].pop(col, col)
        mapping["retired"].append(physical)
        new_schema = StructType(
            [f for f in schema.fields if f.name != col]
        )
        return self._commit(
            operation="drop_column",
            files=pm.files,
            schema_ddl=new_schema.simpleString(),
            expected_parent=parent,
            summary={
                "dropped": col,
                "cdf_empty": True,
                # Old files are now WIDER than the schema: reads must
                # mergeSchema across heterogeneous footers.
                "schema_evolved": True,
            },
            stats=dict(pm.stats),
            column_mapping=mapping,
            column_defaults={
                c: spec
                for c, spec in pm.column_defaults.items()
                if c != col
            },
            write_defaults={
                c: lit
                for c, lit in pm.write_defaults.items()
                if c != col
            },
        )

    def _validate_default_literal(self, default: str, dtype) -> None:
        """Validate a non-NULL default literal at DDL time against BOTH
        evaluators that will later apply it: the SESSION cast (scoped
        session reads / session-side write fill) and the SESSIONLESS
        textual parser (`_typed_part_value`, the DataSource fill path
        and the Arrow writer). The two disagree on literals like
        `INT DEFAULT 2.5` (session cast truncates to 2; `int('2.5')`
        raises) or `DATE '2024-7-4'` (lenient Spark date parse vs
        strict ISO `date.fromisoformat`) — accepting such a literal
        would defer a crash to every sessionless read and silently
        serve the truncated value on session reads. Refuse at DDL time
        unless both parse AND agree on the value."""
        try:
            probe = (
                self.spark.range(1)
                .select(F.expr(default).cast(dtype).alias("v"))
                .collect()[0]
                .v
            )
        except Exception:
            probe = None  # ANSI cast raised: same refusal
        if probe is None:
            raise ValueError(
                f"default {default!r} does not cast to "
                f"{dtype.simpleString()!r}"
            )
        try:
            sl = _typed_part_value(
                _default_fill_text(default), dtype.simpleString()
            )
            a, b = _promote_temporal(sl, probe)
            agree = a == b
        except Exception:
            agree = False
        if not agree:
            raise ValueError(
                f"default {default!r} casts to {probe!r} in-session "
                "but the sessionless reader/writer parses it "
                "differently or not at all; write the literal in the "
                f"canonical text form of {dtype.simpleString()!r}"
            )

    def add_column(
        self, name: str, type_ddl: str, default: str | None = None
    ) -> int:
        """ADD COLUMN as a metadata-only commit, with an optional
        INITIAL DEFAULT (Iceberg v3 initial-default shape; Delta ships
        the same idea behind the allowColumnDefaults feature): existing
        rows — every entry live at this commit, whose files physically
        lack the column — read `default` instead of NULL, on BOTH read
        surfaces (session reads and the sessionless DataSource). No
        data is read or written.

        Precedence spec (the merge_schema interplay):

        1. column physically present in the file -> stored value, even
           when that value is NULL;
        2. physically absent + entry live at add time -> the default
           (scoped by entry rel exactly like deferred deletes: carried
           file entries keep their ancestor rel, so they stay covered;
           compaction READS defaults and so materializes them into the
           rewritten files, whose new rels leave the scope);
        3. physically absent + entry written after the add (a
           merge_schema subset append) -> NULL, unchanged — this is an
           initial default that backfills history, NOT a write default.

        `default` must be a plain literal (NULL, TRUE/FALSE, numbers,
        'strings', DATE/TIMESTAMP '...'); expressions and functions
        refuse — they would re-evaluate per read and the sessionless
        reader has no SQL evaluator. The literal must cast to
        `type_ddl` (validated here, against a one-row frame). Without
        `default` this is plain schema evolution: absent reads NULL,
        same as an explicit NULL default."""
        from pyspark.sql.types import StructType

        parent = self.latest_version()
        pm = self.manifest(parent)
        schema = StructType.fromDDL(pm.schema_ddl)
        if name in {f.name for f in schema.fields}:
            raise ValueError(f"column {name!r} already exists")
        retired = set(pm.column_mapping.get("retired", ())) | set(
            pm.column_mapping.get("map", {}).values()
        )
        if name in retired:
            raise ValueError(
                f"column {name!r} collides with a retired/physical "
                "name still present in data files; pick another name"
            )
        try:
            field = StructType.fromDDL(f"{name} {type_ddl}").fields[0]
        except Exception:
            raise ValueError(
                f"cannot parse column type {type_ddl!r}"
            ) from None
        defaults = dict(pm.column_defaults)
        if default is not None:
            fill = _default_fill_text(default)  # grammar check
            if fill is not None:
                self._validate_default_literal(default, field.dataType)
                defaults[name] = {
                    "default": default,
                    "entries": [
                        f.replace(os.sep, "/") for f in pm.files
                    ],
                    "since_version": parent + 1,
                }
        new_schema = StructType(
            [*schema.fields, field]
        )
        return self._commit(
            operation="add_column",
            files=pm.files,
            schema_ddl=new_schema.simpleString(),
            expected_parent=parent,
            summary={
                "added": {"column": name, "type": type_ddl,
                          "default": default},
                "cdf_empty": True,
                "schema_evolved": True,
            },
            stats=dict(pm.stats),
            column_defaults=defaults,
        )

    def set_column_default(self, col: str, default: str) -> int:
        """WRITE default (Delta `ALTER COLUMN ... SET DEFAULT` shape,
        metadata-only): future appends / INSERTs that OMIT `col` store
        this literal — filled at write time, real values in the files,
        so the append no longer needs merge_schema for the omission.
        Columns PRESENT in the frame are never touched (an explicit
        NULL stays NULL — a default never overwrites). Orthogonal to
        :meth:`add_column`'s INITIAL default, which backfills history
        at read; both can exist on one column with different literals
        (old absent files read the initial default; new omitting writes
        store the write default). Same literal-only grammar and cast
        validation; re-setting replaces the previous literal."""
        from pyspark.sql.types import StructType

        parent = self.latest_version()
        pm = self.manifest(parent)
        types = {
            f.name: f.dataType
            for f in StructType.fromDDL(pm.schema_ddl).fields
        }
        if col not in types:
            raise ValueError(f"no column {col!r}")
        fill = _default_fill_text(default)  # grammar check
        if fill is not None:
            self._validate_default_literal(default, types[col])
        return self._commit(
            operation="set_column_default",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                "set_default": {"column": col, "default": default},
                "cdf_empty": True,
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            write_defaults={**pm.write_defaults, col: default},
        )

    def drop_column_default(self, col: str) -> int:
        """Remove a column's WRITE default: future omitting writes go
        back to requiring merge_schema (and storing nothing)."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        if col not in pm.write_defaults:
            raise ValueError(
                f"column {col!r} has no write default "
                f"(set: {sorted(pm.write_defaults)})"
            )
        return self._commit(
            operation="drop_column_default",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                "dropped_default": col,
                "cdf_empty": True,
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            write_defaults={
                c: v for c, v in pm.write_defaults.items() if c != col
            },
        )

    def _apply_write_defaults(
        self, df: DataFrame, m: Manifest
    ) -> DataFrame:
        """Fill table columns ABSENT from the incoming frame that
        declare a write default; present columns pass through untouched
        (explicit NULLs stay NULL). Runs BEFORE schema validation, so
        an append omitting only write-defaulted columns needs no
        merge_schema."""
        if not m.write_defaults:
            return df
        from pyspark.sql.types import StructType

        have = set(df.columns)
        types = {
            f.name: f.dataType
            for f in StructType.fromDDL(m.schema_ddl).fields
        }
        for c, lit in m.write_defaults.items():
            if c not in have and c in types:
                df = df.withColumn(c, F.expr(lit).cast(types[c]))
        return df

    def set_partition_spec(self, partition_by: list[str]) -> int:
        """PARTITION EVOLUTION (Iceberg spec-change shape): switch the
        layout future writes use, as a metadata-only commit — existing
        entries keep their physical layout and stay fully readable and
        PRUNABLE (each entry's own `part_values` drive dir-name pruning
        regardless of the current spec; `_part_types` resolves old-spec
        columns type-exactly), while appends/merges/compactions from now
        on write `col=value/` leaves per the NEW spec. Rewrites migrate
        data to the new layout incrementally — run `compact()` to migrate
        wholesale. Pass `[]` to stop partitioning."""
        pb = tuple(partition_by)
        parent = self.latest_version()
        pm = self.manifest(parent)
        from pyspark.sql.types import StructType

        types = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromDDL(pm.schema_ddl).fields
        }
        _validate_spec(pb, types)
        identity_cols = {
            _parse_spec_entry(e)[2]
            for e in pb
            if _parse_spec_entry(e)[0] == "identity"
        }
        if pb and len(identity_cols) == len(types):
            raise ValueError("cannot partition by every column")
        if pb == pm.partition_by:
            raise ValueError(f"partition spec is already {list(pb)}")
        return self._commit(
            operation="set_partition_spec",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                "partition_spec": list(pb),
                "cdf_empty": True,  # data-preserving
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            partition_by=pb,
            past_specs=(
                pm.past_specs + (pm.partition_by,)
                if pm.partition_by
                and pm.partition_by not in pm.past_specs
                else pm.past_specs
            ),
        )

    @property
    def check_constraints(self) -> dict[str, str]:
        return dict(self.manifest().constraints)

    def add_check_constraint(self, name: str, expr: str) -> int:
        """ADD CONSTRAINT: the CURRENT snapshot must already satisfy
        `expr` (one validation scan, like Delta's ALTER TABLE ADD
        CONSTRAINT), then a metadata-only commit (parent's data entries
        verbatim) records it; every later write of new rows enforces it."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        if name in pm.constraints:
            raise ValueError(f"constraint {name!r} already exists")
        _enforce_constraints(self.read(parent), {name: expr})
        return self._commit(
            operation="add_constraint",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                "constraint": name,
                "cdf_empty": True,  # data-preserving
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            constraints={**pm.constraints, name: expr},
        )

    def drop_check_constraint(self, name: str) -> int:
        parent = self.latest_version()
        pm = self.manifest(parent)
        if name not in pm.constraints:
            raise ValueError(f"no constraint {name!r}")
        remaining = {
            k: v for k, v in pm.constraints.items() if k != name
        }
        return self._commit(
            operation="drop_constraint",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                "constraint": name,
                "cdf_empty": True,
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            constraints=remaining,
        )

    @property
    def partition_by(self) -> tuple[str, ...]:
        return self.manifest().partition_by

    # -- metadata ----------------------------------------------------------
    def versions(self) -> list[Manifest]:
        # One forward pass reconstructing deltas; torn manifests
        # (ORPHANED CLAIMS: the conditional-PUT emulation crashed
        # between creating the name and writing its content) are
        # skipped — they can't serve reads, and writers trying to claim
        # that number conflict until vacuum() reclaims them.
        return load_all_manifests(self._mdir)

    def latest_version(self) -> int:
        # Planning cost must not be O(history): read file NAMES, then
        # parse from the newest until one is a committed version (torn
        # claims skipped) — normally exactly one small read.
        mdir = self._mdir
        names = sorted(
            n
            for n in os.listdir(mdir)
            if n.startswith("v") and n.endswith(".json")
        )
        for name in reversed(names):
            try:
                with open(os.path.join(mdir, name)) as f:
                    return _parse_version_file(f.read())["version"]
            except (OSError, ValueError, KeyError):
                continue  # torn claim
        raise NoSuchVersionError(f"{self.root}: no committed versions")

    def manifest(self, version: int | None = None) -> Manifest:
        version = self.latest_version() if version is None else version
        mdir = self._mdir
        path = os.path.join(mdir, _manifest_name(version))
        try:
            st = os.stat(path)
        except OSError:
            raise NoSuchVersionError(f"{self.root}: no version {version}")
        # Per-version memo, validated by the file's identity (a
        # committed version is immutable except for in-place summary
        # annotation, which changes mtime/size and so misses the memo).
        key = (st.st_mtime_ns, st.st_size)
        hit = self._mcache.get(version)
        if hit is not None and hit[0] == key:
            return hit[1]
        m = load_manifest_at(mdir, version)
        self._mcache[version] = (key, m)
        return m

    def history(self) -> DataFrame:
        rows = [
            (
                m.version,
                m.operation,
                len(m.files),
                m.committed_at,
                json.dumps(m.summary, sort_keys=True),
            )
            for m in self.versions()
        ]
        return self.spark.createDataFrame(
            rows,
            "version int, operation string, n_files int, "
            "committed_at string, summary string",
        )

    # -- reads -------------------------------------------------------------
    def read(
        self,
        version: int | None = None,
        predicates: list[tuple] | None = None,
    ) -> DataFrame:
        """Read a snapshot. With `predicates` — a conjunction of
        (column, op, literal) triples, op in =,<,<=,>,>=,in (`in` takes
        a list of literals: a disjunction of equalities, pruning an
        entry only when EVERY value is refuted) — data dirs (and,
        within surviving dirs, individual FILES via the manifest's
        per-file stats) that the stats prove empty for the predicate are
        skipped BEFORE Spark plans the scan, and the same predicate is
        applied as a filter, so results are identical to an unpruned
        read + filter."""
        m = self.manifest(version)
        part_types = self._part_types(m)
        # Stats/blooms/partition dirs are keyed by PHYSICAL column names;
        # the row-level filter below stays logical.
        fwd = _log_to_phys(m.column_mapping)
        base_preds = (
            [(fwd.get(c, c), op, v) for c, op, v in predicates]
            if predicates
            else None
        )
        schema_types = self._schema_types(m)
        derive_cache: dict = {}
        sel: list[tuple[str, list[str] | None]] = []
        for rel in m.files:
            stats = m.stats.get(rel, {})
            phys_preds = _entry_derived_preds(
                base_preds, stats, m.partition_by, fwd, schema_types,
                m.past_specs, derive_cache,
            )
            if phys_preds and not _entry_may_match(
                stats, phys_preds, part_types
            ):
                continue
            fmap = stats.get("files")
            if phys_preds and fmap:
                keep = [
                    fn for fn, fs in sorted(fmap.items())
                    if _file_may_match(fs, phys_preds)
                ]
                if not keep:
                    continue  # every file refuted: skip the entry whole
                if len(keep) < len(fmap):
                    # A dir envelope can match while every file's tighter
                    # range refutes — dropping to file paths is safe
                    # because data dirs are immutable once committed.
                    sel.append((rel, keep))
                    continue
            sel.append((rel, None))
        df = self._scan_entries(sel, m)
        if df is None:
            return self.spark.createDataFrame([], m.schema_ddl)
        if predicates:
            df = df.filter(_predicates_to_column(predicates))
        return df

    def _schema_types(self, m: Manifest) -> dict[str, str]:
        """LOGICAL column -> simpleString (transform-predicate
        derivation needs the source column's declared type)."""
        from pyspark.sql.types import StructType

        return {
            f.name: f.dataType.simpleString()
            for f in StructType.fromDDL(m.schema_ddl).fields
        }

    def _part_types(self, m: Manifest) -> dict[str, str]:
        """Column -> simpleString type for EVERY schema column: after a
        partition-spec evolution, surviving entries may carry part_values
        for columns no longer in the current spec, and their pruning
        should stay type-exact, not fall back to string comparison."""
        if not m.partition_by and not any(
            "part_values" in s for s in m.stats.values()
        ):
            return {}
        from pyspark.sql.types import StructType

        fwd = _log_to_phys(m.column_mapping)
        schema_types = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromDDL(m.schema_ddl).fields
        }
        out = {
            fwd.get(c, c): t for c, t in schema_types.items()
        }
        # Transform aliases (hidden partitioning) type their dir values
        # too: ts_year ints, ts_month/day ordered strings, etc. Union in
        # per-entry spec snapshots so alias typing survives even if a
        # spec ever leaves the past_specs history while its entries live.
        out.update(
            _spec_alias_types(
                m.partition_by, fwd, schema_types,
                m.past_specs + _entry_specs(m.stats),
            )
        )
        return out

    def _pos_meta_cols(self) -> list[Column]:
        """`__file_rel` (data-file path relative to the table root, "/"
        separators) + `__pos` (row ordinal within the file) computed from
        Spark's `_metadata` struct — the coordinates position deletes are
        keyed on. Pure JVM expressions (locate+substring on the file-path
        URI), no probe job.

        `_metadata.file_path` is a URI, so hive dir values with special
        chars arrive percent-encoded (`prio=4-NOT%20SPECIFIED`); the rel
        is url_decode'd so the stored coordinate is the PLAIN filesystem
        path — the form `os.path.relpath` yields in the sessionless
        DataSource reader (a literal `+` is pre-escaped to `%2B` because
        URI paths leave `+` unencoded but url_decode would turn it into
        a space)."""
        norm = os.path.abspath(self.root).replace(os.sep, "/").rstrip("/")
        esc = norm.replace("'", "\\'")
        # Decode the FULL URI first, then locate the plain root inside
        # the decoded text: a root that itself contains a URI-encoded
        # char (e.g. a space — '/data/John Doe/lake') arrives as
        # '%20' in `_metadata.file_path`, so locate() on the raw URI
        # would return 0 and the fixed-offset substring would store
        # offset-garbage coordinates that the sessionless reader
        # (os.path.relpath, plain) silently never matches. If the root
        # still can't be found, fail the job loudly rather than commit
        # wrong coordinates.
        dec = "url_decode(replace(_metadata.file_path, '+', '%2B'))"
        rel = F.expr(
            f"CASE WHEN locate('{esc}/', {dec}) = 0 THEN "
            f"raise_error('position-delete coordinates: table root "
            f"{esc} not found in decoded file_path ' || {dec}) "
            f"ELSE substring({dec}, locate('{esc}/', {dec}) "
            f"+ {len(norm) + 1}) END"
        )
        return [
            rel.alias("__file_rel"),
            F.col("_metadata.row_index").alias("__pos"),
        ]

    def _scan_entries(
        self,
        sel: list[tuple[str, list[str] | None]],
        m: Manifest,
        with_pos: bool = False,
    ) -> DataFrame | None:
        """Scan selected entries, applying any merge-on-read deletes
        scoped to them. Three delete shapes share one scoping rule (a
        delete applies iff its recorded rel equals the entry or is an
        ancestor — covers partition leaves and file entries carried
        forward by a scoped merge):

        - {"sql": pred}: the group filters with NOT(pred) (NULL drops,
          matching the COW delete's semantics);
        - {"pos": rel}: POSITION deletes — the group reads with
          `_metadata`-derived (file, row-ordinal) coordinates and
          anti-joins the delete file's (file_rel, pos) pairs, the
          Iceberg positional-delete application;
        - {"eq": rel, "cols": [...]}: EQUALITY deletes — the group
          anti-joins the delete file's key VALUES on the listed
          columns (Iceberg equality-delete application; a data row
          with a NULL key column never matches, SQL equality).

        Entries written AFTER a deferred delete have fresh rels no
        delete records, so new data is never filtered — the role
        sequence numbers play for Iceberg's delete files. With
        `with_pos`, `__file_rel`/`__pos` columns survive into the result
        (the MoR DML write paths need the surviving rows' coordinates)."""
        preds = m.delete_predicates
        if not preds:
            return self._scan_entries_raw(sel, m, with_pos)

        def applicable(rel: str) -> tuple[tuple, ...]:
            r = rel.replace(os.sep, "/")
            return tuple(
                ("pos", p["pos"])
                if "pos" in p
                else ("eq", p["eq"], tuple(p["cols"]))
                if "eq" in p
                else ("sql", p["sql"])
                for p in preds
                if any(
                    r == pr or r.startswith(pr.rstrip("/") + "/")
                    for pr in (
                        e.replace(os.sep, "/") for e in p["entries"]
                    )
                )
            )

        groups: dict[tuple, list] = {}
        for item in sel:
            groups.setdefault(applicable(item[0]), []).append(item)
        pieces: list[DataFrame] = []
        for key in sorted(groups):
            pos_rels = [t[1] for t in key if t[0] == "pos"]
            df = self._scan_entries_raw(
                groups[key], m, with_pos or bool(pos_rels)
            )
            if df is None:
                continue
            for t in key:
                if t[0] == "sql":
                    df = df.filter(~F.expr(t[1]))
                elif t[0] == "eq":
                    _rel, cols = t[1], list(t[2])
                    dels = self.spark.read.parquet(
                        os.path.join(self.root, _rel)
                    ).select(*cols).dropDuplicates()
                    df = df.join(dels, cols, "left_anti")
            if pos_rels:
                dels = self.spark.read.parquet(
                    *[os.path.join(self.root, r) for r in pos_rels]
                ).select("file_rel", "pos")
                df = df.join(
                    dels,
                    (F.col("__file_rel") == F.col("file_rel"))
                    & (F.col("__pos") == F.col("pos")),
                    "left_anti",
                )
                if not with_pos:
                    df = df.drop("__file_rel", "__pos")
            pieces.append(df)
        if not pieces:
            return None
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def _entry_defaults(
        self, m: Manifest, rel: str
    ) -> tuple[tuple[str, str], ...]:
        """(column, default literal) pairs whose initial-default scope
        covers this entry — same ancestor-rel rule as deferred deletes
        (file entries carried forward by a scoped merge keep their
        ancestor rel, so they stay covered)."""
        r = rel.replace(os.sep, "/")
        out = []
        for col, spec in m.column_defaults.items():
            if any(
                r == e or r.startswith(e.rstrip("/") + "/")
                for e in spec["entries"]
            ):
                out.append((col, spec["default"]))
        return tuple(sorted(out))

    def _scan_entries_raw(
        self,
        sel: list[tuple[str, list[str] | None]],
        m: Manifest,
        with_pos: bool = False,
    ) -> DataFrame | None:
        """Defaults-aware wrapper over :meth:`_scan_entries_plain`:
        entries scoped by an initial default (`add_column(default=)`)
        group separately and overlay the default over the reader's
        null-fill — exact, because scoped entries' files physically
        lack the column (add_column refuses names colliding with
        retired physical names, so a scoped file can never carry the
        column under any name)."""
        if m.column_defaults:
            groups: dict[tuple, list] = {}
            for item in sel:
                groups.setdefault(
                    self._entry_defaults(m, item[0]), []
                ).append(item)
            if any(groups):
                from pyspark.sql.types import StructType

                types = {
                    f.name: f.dataType
                    for f in StructType.fromDDL(m.schema_ddl).fields
                }
                pieces: list[DataFrame] = []
                for key in sorted(groups):
                    df = self._scan_entries_plain(
                        groups[key], m, with_pos
                    )
                    if df is None:
                        continue
                    if key:
                        dmap = dict(key)
                        df = df.select(
                            *[
                                F.coalesce(
                                    F.col(c),
                                    F.expr(dmap[c]).cast(types[c]),
                                ).alias(c)
                                if c in dmap
                                else F.col(c)
                                for c in df.columns
                            ]
                        )
                    pieces.append(df)
                if not pieces:
                    return None
                out = pieces[0]
                for p in pieces[1:]:
                    out = out.unionByName(p)
                return out
        return self._scan_entries_plain(sel, m, with_pos)

    def _scan_entries_plain(
        self,
        sel: list[tuple[str, list[str] | None]],
        m: Manifest,
        with_pos: bool = False,
    ) -> DataFrame | None:
        """Plan ONE DataFrame over selected manifest entries; each item is
        (entry rel, optional file-name subset). Returns None for an empty
        selection. With `with_pos`, each branch additionally carries
        `__file_rel`/`__pos` (see `_pos_meta_cols`) — attached straight
        off the file scan, before any projection drops `_metadata`.

        Partitioned leaves don't store their partition columns in the
        parquet files (hive layout) — they're recovered from the dir names
        via Spark's basePath partition discovery, grouped per top-level
        data dir (Spark refuses discovery across roots with differing
        structure). Type inference is DISABLED for the discovery so values
        come back as exact strings (no float round-trip for decimals),
        then cast to the declared column types; Spark itself maps the hive
        null sentinel to NULL. Every branch is conformed to the manifest
        schema, so unions line up and pruning can never change the result
        schema."""
        from pyspark.sql.types import StructField, StructType

        if not sel:
            return None
        schema = StructType.fromDDL(m.schema_ddl)

        # EXPLICIT physical read schema instead of footer merging: files
        # predating an added column fill NULL, files written before a
        # TYPE WIDENING (int->bigint, float->double, decimal precision)
        # upcast inside the parquet reader, and identity-partition dir
        # values type directly from the schema — all without a
        # mergeSchema footer pass (which would refuse mixed-width
        # files outright).
        fwd_names = _log_to_phys(m.column_mapping)
        phys_schema = StructType(
            [
                StructField(
                    fwd_names.get(f.name, f.name), f.dataType, True
                )
                for f in schema.fields
            ]
        )

        def reader():
            return self.spark.read.schema(phys_schema)

        # Partition recovery keys on each ENTRY's own part_values, not the
        # table's CURRENT spec: after partition evolution, entries written
        # under an old spec still carry their columns in dir names and
        # must recover them — and all entries under one top-level commit
        # dir share one spec by construction.
        plain: list[str] = []
        groups: dict[str, list[str]] = {}
        group_pcols: dict[str, set[str]] = {}
        for rel, files in sel:
            paths = (
                [os.path.join(self.root, rel, fn) for fn in files]
                if files is not None
                else [os.path.join(self.root, rel)]
            )
            pv = m.stats.get(rel, {}).get("part_values")
            if pv:
                top = "/".join(rel.replace(os.sep, "/").split("/")[:2])
                groups.setdefault(top, []).extend(paths)
                group_pcols.setdefault(top, set()).update(pv)
            else:
                plain.extend(paths)

        # Files carry PHYSICAL column names forever (column mapping makes
        # rename/drop metadata-only); translate to logical before
        # conforming — conform then also sheds dropped physical columns.
        back = _phys_to_log(m.column_mapping)
        log_types = {
            _log_to_phys(m.column_mapping).get(f.name, f.name): f.dataType
            for f in schema.fields
        }

        extra = ("__file_rel", "__pos") if with_pos else ()
        pieces: list[DataFrame] = []
        if plain:
            raw = reader().parquet(*plain)
            if with_pos:
                raw = raw.select("*", *self._pos_meta_cols())
            pieces.append(
                _conform(_rename_columns(raw, back), schema, extra)
            )
        conf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        for top in sorted(groups):
            prev = self.spark.conf.get(conf_key, "true")
            self.spark.conf.set(conf_key, "false")
            try:
                # Schema resolution is eager, so the conf only needs to
                # hold across the .parquet() call itself.
                df = (
                    reader()
                    .option("basePath", os.path.join(self.root, top))
                    .parquet(*groups[top])
                )
            finally:
                self.spark.conf.set(conf_key, prev)
            if with_pos:
                df = df.select("*", *self._pos_meta_cols())
            pcols = group_pcols[top]
            df = df.select(
                *[
                    F.col(c).cast(log_types[c]).alias(c)
                    if c in pcols and c in log_types
                    else F.col(c)
                    for c in df.columns
                ]
            )
            pieces.append(_conform(_rename_columns(df, back), schema, extra))
        if not pieces:
            return None  # every selected entry pruned to zero files
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def bucket_join(
        self,
        other: "VersionedTable",
        on: str,
        how: str = "inner",
        broadcast_rows: int = 2_000_000,
    ) -> DataFrame:
        """BUCKET-WISE CO-LOCATED JOIN (the storage-partitioned-join
        shape Iceberg ships for Spark): both tables must be partitioned
        by `bucket(N, on)` with the SAME N — rows with equal keys then
        provably live in the same bucket index on both sides (the bucket
        transform is one shared deterministic hash), so the join
        decomposes into N independent per-bucket joins unioned back
        together, and NO table-wide shuffle of either side ever happens.

        Each per-bucket pair joins with the smaller side BROADCAST when
        its manifest row count is under `broadcast_rows` — the common
        case (a bucket is ~1/N of the table) — making the whole join
        exchange-free: the only data movement is smaller-side/N per
        bucket. Pairs too big to broadcast fall back to a normal
        per-bucket shuffle join (correct, still bucket-local and
        AQE-sized). At 100 TB this turns the fact-to-fact join on a
        shared bucket key from the cluster's biggest shuffle into N
        embarrassingly parallel joins.

        Supported joins: inner, left_semi, left_anti, left (outer), and
        full (outer). Outer joins stitch the unmatched sides back in
        from METADATA alone: a bucket present on only one side provably
        has no matches, so its rows union in padded with typed NULLs —
        no join runs for it at all — and NULL-key rows (isolated in the
        hive-null leaf by the bucket layout) are likewise emitted
        unmatched for the sides outer semantics keeps. Full-outer
        per-bucket pairs can't broadcast (Spark can't broadcast either
        side of a full join), so they fall back to bucket-local shuffle
        joins. Entries not carrying the bucket alias (written under an
        older spec) refuse with a pointer — `compact()` migrates
        them."""
        hows = {
            "inner": "inner",
            "left_semi": "left_semi", "leftsemi": "left_semi",
            "semi": "left_semi",
            "left_anti": "left_anti", "leftanti": "left_anti",
            "anti": "left_anti",
            "left": "left", "left_outer": "left", "leftouter": "left",
            "right": "right", "right_outer": "right",
            "rightouter": "right",
            "full": "full", "full_outer": "full", "fullouter": "full",
            "outer": "full",
        }
        how = hows.get(how)
        if how is None:
            raise ValueError(
                "bucket_join supports inner/left-semi/left-anti/left/"
                "right/full"
            )

        def bucket_spec(t: "VersionedTable", m) -> tuple[int, str]:
            for entry in m.partition_by:
                fn, param, col = _parse_spec_entry(entry)
                if fn == "bucket" and col == on:
                    # A spec history with a different modulus means some
                    # entries MAY carry bucket indices computed mod the
                    # OLD N — pairing them by index would silently drop
                    # matches. Spec snapshots make the check per LIVE
                    # entry: only an entry actually written under a
                    # different modulus refuses (so once old-generation
                    # entries are rewritten by DML/compaction, the join
                    # is accepted with no FULL compact needed); legacy
                    # entries without a snapshot refuse conservatively
                    # whenever history is param-ambiguous.
                    ambiguous = any(
                        fn2 == "bucket" and c2 == on and p2 != param
                        for spec in m.past_specs
                        for fn2, p2, c2 in (
                            _parse_spec_entry(e2) for e2 in spec
                        )
                    )
                    for rel in m.files:
                        esp = m.stats.get(rel, {}).get("spec")
                        if esp is None:
                            if ambiguous:
                                raise ValueError(
                                    f"{t.root}: bucket modulus evolved "
                                    f"for {on} and entry {rel} predates "
                                    "spec snapshots — its indices may "
                                    "group under the old modulus; run a "
                                    "full compact() to migrate before "
                                    "bucket_join"
                                )
                            continue
                        for e2 in esp:
                            fn2, p2, c2 = _parse_spec_entry(e2)
                            if (
                                fn2 == "bucket"
                                and c2 == on
                                and p2 != param
                            ):
                                raise ValueError(
                                    f"{t.root}: entry {rel} was written "
                                    f"under bucket({p2}, {on}) which "
                                    f"evolved to bucket({param}, {on}) "
                                    "— its indices group under the old "
                                    "modulus; run a full compact() (or "
                                    "rewrite that entry) before "
                                    "bucket_join"
                                )
                    fwd = _log_to_phys(m.column_mapping)
                    return param, _transform_alias(
                        "bucket", fwd.get(col, col)
                    )
            raise ValueError(
                f"{t.root}: not partitioned by bucket(N, {on}) "
                f"(spec is {list(m.partition_by)})"
            )

        ml, mr = self.manifest(), other.manifest()
        nl, alias_l = bucket_spec(self, ml)
        nr, alias_r = bucket_spec(other, mr)
        if nl != nr:
            raise ValueError(
                f"bucket counts differ ({nl} vs {nr}); keys do not "
                "co-locate — rebucket one side"
            )

        def by_bucket(t: "VersionedTable", m, alias: str):
            groups: dict[int, list] = {}
            null_sel: list = []
            for rel in m.files:
                pv = m.stats.get(rel, {}).get("part_values")
                if pv is None or alias not in pv:
                    raise ValueError(
                        f"{t.root}: entry {rel} predates the bucket "
                        "spec; run compact() to migrate it"
                    )
                raw = pv[alias]
                if raw is None:
                    # NULL keys match nothing in an equi-join; outer
                    # semantics emit them unmatched from this list.
                    null_sel.append((rel, None))
                    continue
                groups.setdefault(int(raw), []).append((rel, None))
            return groups, null_sel

        gl, null_l = by_bucket(self, ml, alias_l)
        gr, null_r = by_bucket(other, mr, alias_r)

        def rows_of(m, sel) -> int:
            return sum(
                m.stats.get(rel, {}).get("rows", 0) or 0
                for rel, _ in sel
            )

        from pyspark.sql.types import StructType as _St

        l_fields = _St.fromDDL(ml.schema_ddl).fields
        r_fields = _St.fromDDL(mr.schema_ddl).fields
        l_mk = [f for f in l_fields if f.name != on]
        r_mk = [f for f in r_fields if f.name != on]

        def pad_left(dfl: DataFrame) -> DataFrame:
            """Left rows provably unmatched -> join-output shape
            ([key, left-minus-key, right-minus-key(NULL-typed)])."""
            return dfl.select(
                F.col(on),
                *[F.col(f.name) for f in l_mk],
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in r_mk
                ],
            )

        def pad_right(dfr: DataFrame) -> DataFrame:
            return dfr.select(
                F.col(on),
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in l_mk
                ],
                *[F.col(f.name) for f in r_mk],
            )

        left_order = how in ("left_semi", "left_anti")
        pieces: list[DataFrame] = []
        for b in sorted(set(gl) & set(gr)):
            dfl = self._scan_entries(gl[b], ml)
            dfr = other._scan_entries(gr[b], mr)
            if dfl is None and dfr is None:
                continue
            if dfr is None:
                dfr = self.spark.createDataFrame([], _St(r_fields))
            if dfl is None:
                dfl = self.spark.createDataFrame([], _St(l_fields))
            rl, rr = rows_of(ml, gl[b]), rows_of(mr, gr[b])
            if how in ("left_semi", "left_anti", "left"):
                # Only the right side may broadcast under these joins.
                if rr <= broadcast_rows:
                    dfr = F.broadcast(dfr)
                pieces.append(dfl.join(dfr, on=[on], how=how))
            elif how == "right":
                # Mirror: only the LEFT (build) side may broadcast.
                if rl <= broadcast_rows:
                    dfl = F.broadcast(dfl)
                pieces.append(dfl.join(dfr, on=[on], how="right"))
            elif how == "full":
                # Neither side of a full join broadcasts: bucket-local
                # shuffle pairs, AQE-sized.
                pieces.append(dfl.join(dfr, on=[on], how="full"))
            elif rr <= rl and rr <= broadcast_rows:
                pieces.append(dfl.join(F.broadcast(dfr), on=[on]))
            elif rl < rr and rl <= broadcast_rows:
                pieces.append(F.broadcast(dfl).join(dfr, on=[on]))
            else:
                pieces.append(dfl.join(dfr, on=[on]))
        # Metadata-only stitching: one-sided buckets and null-key
        # leaves never run a join at all.
        if how in ("left_anti", "left", "full"):
            lonely = [
                sel for b, sel in sorted(gl.items()) if b not in gr
            ]
            for sel in lonely + ([null_l] if null_l else []):
                dfl = self._scan_entries(sel, ml)
                if dfl is None:
                    continue
                pieces.append(
                    dfl if left_order else pad_left(dfl)
                )
        if how in ("right", "full"):
            lonely_r = [
                sel for b, sel in sorted(gr.items()) if b not in gl
            ]
            for sel in lonely_r + ([null_r] if null_r else []):
                dfr = other._scan_entries(sel, mr)
                if dfr is None:
                    continue
                pieces.append(pad_right(dfr))
        if not pieces:
            out_fields = (
                list(l_fields)
                if left_order
                else [f for f in l_fields if f.name == on]
                + l_mk
                + r_mk
            )
            return self.spark.createDataFrame([], _St(out_fields))
        out = pieces[0]
        for p in pieces[1:]:
            # Positional union: every piece is conformed to the same
            # join-output shape, so schemas align by construction — and
            # unlike unionByName this tolerates the duplicate non-key
            # column names a plain join output allows.
            out = out.union(p)
        return out

    def prune_info(
        self,
        predicates: list[tuple],
        version: int | None = None,
    ) -> dict:
        """Which data dirs (and files within kept dirs) a predicated read
        would scan vs skip."""
        m = self.manifest(version)
        part_types = self._part_types(m)
        fwd = _log_to_phys(m.column_mapping)
        base = [(fwd.get(c, c), op, v) for c, op, v in predicates]
        schema_types = self._schema_types(m)
        derive_cache: dict = {}
        kept, skipped = [], []
        n_files_scanned = n_files_skipped = 0
        n_rgs_scanned = n_rgs_skipped = 0
        for rel in m.files:
            stats = m.stats.get(rel, {})
            predicates = _entry_derived_preds(
                base, stats, m.partition_by, fwd, schema_types,
                m.past_specs, derive_cache,
            )
            if not _entry_may_match(stats, predicates, part_types):
                skipped.append(rel)
                n_files_skipped += len(stats.get("files", ()) or ())
                continue
            kept.append(rel)
            fmap = stats.get("files")
            if fmap:
                for fs in fmap.values():
                    if _file_may_match(fs, predicates):
                        n_files_scanned += 1
                        for rg_st in fs.get("rgs", ()):
                            if _dir_may_match(rg_st, predicates):
                                n_rgs_scanned += 1
                            else:
                                n_rgs_skipped += 1
                    else:
                        n_files_skipped += 1
        return {
            "scanned": kept,
            "skipped": skipped,
            "n_scanned": len(kept),
            "n_skipped": len(skipped),
            "n_files_scanned": n_files_scanned,
            "n_files_skipped": n_files_skipped,
            "n_rowgroups_scanned": n_rgs_scanned,
            "n_rowgroups_skipped": n_rgs_skipped,
        }

    # -- writes ------------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        max_retries: int = 3,
        summary: dict | None = None,
        merge_schema: bool = False,
    ) -> int:
        """Append-only commit. Appends commute, so a version conflict is
        rebased automatically: re-read the new latest manifest and retry
        (the already-written data dir is reused — no rewrite).

        Schema is ENFORCED: an append whose schema differs from the table
        raises SchemaMismatchError. With merge_schema=True, new nullable
        columns widen the table schema (Delta-style evolution: old files
        read as NULL for the added columns) and same-name columns may
        WIDEN along the safe promotion chains (int chain, float→double,
        decimal precision — Delta's type widening: old files keep their
        narrow physical type, the explicit read schema upcasts them). A
        NARROWER incoming column is accepted silently and cast up before
        writing (files stay homogeneous); incompatible retypes raise."""
        # Fail fast on an invalid schema or constraint violation BEFORE
        # writing any data files…
        m0 = self.manifest()
        df = self._apply_write_defaults(df, m0)
        ddl0 = self._evolved_schema_ddl(df, merge_schema, m0.schema_ddl)
        df = _cast_to_ddl_types(df, ddl0)
        _enforce_constraints(df, m0.constraints)
        entries = self._write_data_entries(df, self.partition_by)
        attempt = 0
        while True:
            parent = self.latest_version()
            pm = self.manifest(parent)
            # …but compute the committed DDL against the CURRENT parent,
            # inside the retry loop: computing it once up front regressed a
            # concurrent winner's schema evolution on rebase (their added
            # column vanished from the table DDL).
            ddl = self._evolved_schema_ddl(df, merge_schema, pm.schema_ddl)
            if ddl != pm.schema_ddl and pm.column_mapping:
                # A NEW logical column becomes its own physical name; it
                # must not collide with a retired physical (dropped
                # column's data lingers in old files) or another logical
                # column's physical name.
                from pyspark.sql.types import StructType

                old_names = {
                    f.name
                    for f in StructType.fromDDL(pm.schema_ddl).fields
                }
                used_phys = set(
                    pm.column_mapping.get("retired", ())
                ) | set(pm.column_mapping.get("map", {}).values())
                for f in df.schema.fields:
                    if f.name not in old_names and f.name in used_phys:
                        raise SchemaMismatchError(
                            f"column name {f.name!r} collides with a "
                            "physical column of a dropped/renamed "
                            "column; choose another name"
                        )
            try:
                # schema_evolved means "data dirs have heterogeneous file
                # schemas" (subset appends, added columns, type
                # widening). Reads are immune — they pass the manifest
                # schema explicitly — but a partial compact must keep
                # the flag so later full compacts know to homogenize.
                evolved = (
                    bool(pm.summary.get("schema_evolved"))
                    or ddl != pm.schema_ddl
                    or df.schema.simpleString() != ddl
                )
                return self._commit(
                    operation="append",
                    files=pm.files + tuple(entries),
                    schema_ddl=ddl,
                    expected_parent=parent,
                    summary={
                        **(summary or {}),
                        **({"schema_evolved": True} if evolved else {}),
                    },
                    stats={**pm.stats, **entries},
                )
            except ConcurrentCommitError:
                attempt += 1
                if attempt > max_retries:
                    raise

    def append_staged(
        self,
        staged_dir: str,
        merge_schema: bool = False,
        max_retries: int = 3,
    ) -> int:
        """Append parquet files ALREADY WRITTEN by someone else (the
        DataSource writer's executor tasks, a bulk loader) without
        rewriting them: validate schema + constraints by READING the
        staged files (metadata + limit-1 scans), then MOVE the directory
        into the table and commit — the data bytes are written exactly
        once, by whoever staged them.

        Falls back to a regular `append` (one rewrite) when zero-copy
        can't preserve the table's physical contract: hive-partitioned
        layout (staged files aren't leaf-structured) or an active column
        mapping (data files must carry PHYSICAL names). Either way the
        commit semantics are identical to `append`."""
        import shutil

        m0 = self.manifest()
        df = self.spark.read.option("mergeSchema", "true").parquet(
            staged_dir
        )
        if self.partition_by or _log_to_phys(m0.column_mapping):
            try:
                return self.append(df, merge_schema=merge_schema)
            finally:
                shutil.rmtree(staged_dir, ignore_errors=True)
        self._evolved_schema_ddl(df, merge_schema, m0.schema_ddl)
        _enforce_constraints(df, m0.constraints)
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        os.makedirs(os.path.join(self.root, _DATA_DIR), exist_ok=True)
        os.rename(staged_dir, os.path.join(self.root, rel))
        st = _collect_dir_stats(os.path.join(self.root, rel))
        blooms = self._compute_blooms(
            self.spark.read.option("mergeSchema", "true").parquet(
                os.path.join(self.root, rel)
            ),
            m0.bloom_columns,
        )
        if blooms:
            st["bloom"] = blooms
        entries = {rel: st}
        attempt = 0
        while True:
            parent = self.latest_version()
            pm = self.manifest(parent)
            ddl = self._evolved_schema_ddl(df, merge_schema, pm.schema_ddl)
            try:
                evolved = (
                    bool(pm.summary.get("schema_evolved"))
                    or ddl != pm.schema_ddl
                    or df.schema.simpleString() != ddl
                )
                return self._commit(
                    operation="append",
                    files=pm.files + tuple(entries),
                    schema_ddl=ddl,
                    expected_parent=parent,
                    summary={
                        "staged": True,
                        **({"schema_evolved": True} if evolved else {}),
                    },
                    stats={**pm.stats, **entries},
                )
            except ConcurrentCommitError:
                attempt += 1
                if attempt > max_retries:
                    raise

    def _evolved_schema_ddl(
        self, df: DataFrame, merge_schema: bool, table_ddl: str
    ) -> str:
        """Validate an append schema against ``table_ddl``; return the
        (possibly widened) table schema DDL.

        Same-name columns may differ in type only along the SAFE
        promotion chains (`_widened_type`): an incoming NARROWER column
        is accepted silently (the append casts up before writing, the
        table DDL is unchanged), an incoming WIDER column evolves the
        table type under merge_schema=True (Delta's type widening — old
        files keep their narrow physical type; the explicit read schema
        upcasts them in the parquet reader). Anything else raises."""
        from pyspark.sql.types import StructField, StructType

        table = StructType.fromDDL(table_ddl)
        incoming = df.schema
        t_types = {f.name: f.dataType for f in table.fields}
        widened: dict[str, object] = {}
        for f in incoming.fields:
            if f.name in t_types and t_types[f.name] != f.dataType:
                w = _widened_type(t_types[f.name], f.dataType)
                if w is None:
                    raise SchemaMismatchError(
                        f"column {f.name!r}: table has "
                        f"{t_types[f.name].simpleString()}, append has "
                        f"{f.dataType.simpleString()}"
                    )
                if w != t_types[f.name]:
                    if not merge_schema:
                        raise SchemaMismatchError(
                            f"column {f.name!r}: append widens "
                            f"{t_types[f.name].simpleString()} to "
                            f"{w.simpleString()}; pass "
                            "merge_schema=True to evolve the type"
                        )
                    widened[f.name] = w
        added = [f for f in incoming.fields if f.name not in t_types]
        missing = [f for f in table.fields if f.name not in
                   {g.name for g in incoming.fields}]
        if not merge_schema and (added or missing):
            raise SchemaMismatchError(
                f"append schema {incoming.simpleString()} != table schema "
                f"{table.simpleString()}; pass merge_schema=True to evolve"
            )
        out = [
            StructField(f.name, widened.get(f.name, f.dataType), True)
            if f.name in widened
            else f
            for f in table.fields
        ]
        return StructType(out + added).simpleString()

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents. NOT auto-rebased on conflict — the
        caller's snapshot assumption broke, so the conflict surfaces.

        Change feed: the whole old snapshot is materialized as deletes and
        the new content as inserts (an overwrite's diff IS both snapshots;
        consumers that treat overwrite as a reload should read the new
        snapshot instead of the feed)."""
        from pyspark.errors import AnalysisException

        parent = self.latest_version()
        df = self._apply_write_defaults(df, self.manifest(parent))
        _enforce_constraints(df, self.manifest(parent).constraints)
        old = self.read(parent)
        entries = self._write_data_entries(df, self.partition_by)
        # Overwrite may REPLACE the schema entirely; when old and new
        # schemas can't union (non-coercible retype), a change feed across
        # the replacement is undefined — commit WITHOUT change files and
        # record the downgrade in the summary. Only the schema
        # incompatibility (AnalysisException from unionByName) downgrades;
        # a transient write failure (disk full, executor error) propagates
        # instead of silently committing a feed-less version.
        summary = {}
        if self._materialize_changes:
            try:
                cdf_dir = self._write_cdf(
                    old.withColumn(
                        "_change_type", F.lit("delete")
                    ).unionByName(
                        df.withColumn("_change_type", F.lit("insert")),
                        allowMissingColumns=True,
                    )
                )
                summary["cdf"] = cdf_dir
            except AnalysisException as e:
                summary["cdf_skipped"] = (
                    f"replacement schema not unionable: {e}"[:500]
                )
        return self._commit(
            operation="overwrite",
            files=tuple(entries),
            schema_ddl=df.schema.simpleString(),
            expected_parent=parent,
            summary=summary,
            stats=entries,
        )

    def overwrite_where(
        self,
        df: DataFrame,
        predicates: list[tuple],
        expected_version: int | None = None,
    ) -> int:
        """Delta's ``replaceWhere``: atomically DELETE every row matching
        the predicate conjunction (TRUE-only) and INSERT `df`, in one
        commit. Every incoming row must itself satisfy the predicate —
        rows outside the replaced region raise (Delta's constraint), so
        the operation is exactly "replace this region's contents".

        STATS-SCOPED like the other triple-form DML: entries/files the
        stats prove untouched carry forward byte-identical; entries the
        envelope merely MAY touch rewrite their surviving (non-matching)
        rows alongside the new data. The canonical 100 TB use: recompute
        one day/partition of a derived table and swap it in atomically
        while readers keep seeing consistent snapshots.

        Change feed: matched old rows leave as deletes, `df` arrives as
        inserts — downstream MVs/streams replay it like any DML."""
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        preds = [tuple(p) for p in predicates]
        if not preds:
            raise ValueError(
                "overwrite_where needs a non-empty predicate list; use "
                "overwrite() to replace the whole table"
            )
        cond = _predicates_to_column(preds)
        # Schema is ENFORCED (same contract as append; narrower incoming
        # columns cast up).
        ddl = self._evolved_schema_ddl(df, False, pm.schema_ddl)
        df = _cast_to_ddl_types(df, ddl)
        _enforce_constraints(df, pm.constraints)
        # Delta's replaceWhere constraint: the new data must live
        # entirely inside the replaced region.
        n_outside = df.filter(
            ~F.coalesce(cond, F.lit(False))
        ).count()
        if n_outside:
            raise ValueError(
                f"overwrite_where: {n_outside} incoming row(s) do not "
                f"satisfy the replace predicate {preds} — refusing to "
                "write outside the replaced region"
            )
        (
            scoped_sel, untouched, carried_files, n_files_untouched,
        ) = self._scoped_cow_selection(pm, preds)
        target = self._scan_entries(scoped_sel, pm)
        if target is None:
            target = self.spark.createDataFrame([], pm.schema_ddl)
        survivors = target.filter(~F.coalesce(cond, F.lit(False)))
        merged = survivors.unionByName(df)
        cdf_summary: dict = {
            "n_dirs_untouched": len(untouched),
            "n_files_untouched": n_files_untouched,
        }
        cdf_df = (
            target.filter(cond)
            .withColumn("_change_type", F.lit("delete"))
            .unionByName(df.withColumn("_change_type", F.lit("insert")))
            if self._materialize_changes
            else None
        )
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, merged, self.partition_by
        )
        if cdf_rel is not None:
            cdf_summary["cdf"] = cdf_rel
        return self._commit(
            operation="overwrite_where",
            files=tuple(untouched)
            + tuple(carried_files)
            + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=cdf_summary,
            stats={
                **{
                    rel: pm.stats[rel]
                    for rel in untouched
                    if rel in pm.stats
                },
                **carried_files,
                **entries,
            },
        )

    def overwrite_partitions(self, df: DataFrame) -> int:
        """DYNAMIC PARTITION OVERWRITE (Spark's
        `partitionOverwriteMode=dynamic`, Hive's insert-overwrite): on an
        identity-partitioned table, atomically replace exactly the
        partitions PRESENT in `df` — every other partition carries
        byte-identical. The partition set is discovered from the data
        (distinct partition-column tuples, a metadata-sized collect), so
        a daily job can recompute "whatever days I produced" without
        enumerating them.

        Transform specs (hidden partitioning — `day(ts)`, `bucket(16,
        id)`, ...) work too: the replaced leaves derive from the
        TRANSFORM VALUES of the incoming frame (`_transform_expr`, the
        exact dir-value computation the writer uses), so "overwrite
        whatever days these rows land in" needs no alias columns in
        user code — Iceberg's dynamic-overwrite-over-hidden-partitions
        behavior. Entries written under a DIFFERENT spec than the
        current one (param evolution, pre-spec legacy) are
        uncomparable and refuse — compact() migrates them first.

        Refuses on unpartitioned tables."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        spec = [_parse_spec_entry(e) for e in pm.partition_by]
        if not spec:
            raise ValueError(
                "overwrite_partitions needs a partitioned table; use "
                "overwrite() to replace an unpartitioned snapshot"
            )
        # Schema ENFORCED like append/overwrite_where: a retyped, extra,
        # or reordered frame must not land files inconsistent with the
        # manifest schema (direct API callers were unprotected — the SQL
        # front door casts first, but this is the public method).
        ddl = self._evolved_schema_ddl(df, False, pm.schema_ddl)
        df = _cast_to_ddl_types(df, ddl)
        _enforce_constraints(df, pm.constraints)
        fwd = _log_to_phys(pm.column_mapping)
        part_types = self._part_types(pm)
        src_types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        # Per spec entry: the frame-side value column (identity = the
        # column; transform = its dir-value expression) and the
        # entry-side (physical part_values key, simpleString type).
        val_cols: list[Column] = []
        keys: list[tuple[str, str]] = []
        alias_types = _spec_alias_types(
            pm.partition_by, fwd, self._schema_types(pm)
        )
        for fn, param, col in spec:
            pcol = fwd.get(col, col)
            if fn == "identity":
                val_cols.append(F.col(col))
                keys.append((pcol, part_types.get(pcol, "string")))
            else:
                alias = _transform_alias(fn, pcol)
                val_cols.append(
                    _transform_expr(
                        fn, param, col, src_types.get(col, "")
                    )
                )
                keys.append((alias, alias_types.get(alias, "string")))
        new_parts = {
            tuple(r)
            for r in df.select(
                *[c.alias(f"__p{i}") for i, c in enumerate(val_cols)]
            )
            .distinct()
            .collect()
        }
        has_transform = any(fn != "identity" for fn, _p, _c in spec)
        cur_spec = list(pm.partition_by)

        def entry_tuple(rel: str) -> tuple:
            # MISSING part_values (or a missing partition key after a
            # spec change) make the entry uncomparable: stale rows of a
            # replaced partition could silently survive in it, so refuse
            # rather than guess. Same for a transform entry written
            # under a DIFFERENT spec (its dir values used another
            # param/transform — `bucket(4)` leaves are meaningless under
            # `bucket(8)`).
            st = pm.stats.get(rel, {})
            pv = st.get("part_values")
            if pv is None or any(pc not in pv for pc, _t in keys):
                raise ValueError(
                    f"{self.root}: entry {rel} predates the current "
                    "partition spec; run compact() to migrate it before "
                    "overwrite_partitions"
                )
            if has_transform:
                snap = st.get("spec")
                if (
                    snap is not None and list(snap) != cur_spec
                ) or (snap is None and pm.past_specs):
                    raise ValueError(
                        f"{self.root}: entry {rel} was written under a "
                        "different partition spec; run compact() to "
                        "migrate it before overwrite_partitions"
                    )
            return tuple(
                _typed_part_value(pv[pc], t) for pc, t in keys
            )

        replaced_rels = []
        untouched = []
        for rel in pm.files:
            if entry_tuple(rel) in new_parts:
                replaced_rels.append(rel)
            else:
                untouched.append(rel)
        cdf_summary: dict = {
            "n_dirs_untouched": len(untouched),
            "n_partitions_replaced": len(new_parts),
        }
        cdf_df = None
        if self._materialize_changes:
            old = self._scan_entries(
                [(rel, None) for rel in replaced_rels], pm
            )
            old_piece = (
                old.withColumn("_change_type", F.lit("delete"))
                if old is not None
                else None
            )
            ins = df.withColumn("_change_type", F.lit("insert"))
            cdf_df = (
                old_piece.unionByName(ins)
                if old_piece is not None
                else ins
            )
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, df, self.partition_by
        )
        if cdf_rel is not None:
            cdf_summary["cdf"] = cdf_rel
        return self._commit(
            operation="overwrite_partitions",
            files=tuple(untouched) + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=cdf_summary,
            stats={
                **{
                    rel: pm.stats[rel]
                    for rel in untouched
                    if rel in pm.stats
                },
                **entries,
            },
        )

    def merge(
        self,
        updates: DataFrame,
        key_cols: list[str],
        delete_col: str | None = None,
        summary: dict | None = None,
        scope_by_stats: bool = True,
        expected_version: int | None = None,
        merge_schema: bool = False,
        updates_materialized: bool = False,
    ) -> int:
        """MERGE (upsert + optional deletes) as a copy-on-write commit:
        matched keys replaced, `delete_col`=true rows removed, unmatched
        update rows inserted. Snapshot-isolated: reads the latest version
        (or `expected_version` when the caller pins the snapshot it
        computed `updates` against), commits against exactly that parent
        (conflict => ConcurrentCommitError, rerun).

        `updates` is localCheckpoint-ed up front: the merge evaluates it
        several times (key bounds, anti-joins, change feed, data write),
        and a non-deterministic input (rand(), re-read of a changing
        source) could otherwise yield rows outside the collected key
        bounds whose matches live in dirs already classified untouched —
        silent row loss. Materializing once makes every evaluation see
        the same rows (Delta instead documents a determinism requirement;
        we pay one bounded write, |updates|-sized, not table-sized).

        With `scope_by_stats` (default) the rewrite is SCOPED: the update
        keys' min/max (one 1-row aggregate) prune the target's data dirs
        through the manifest stats, and dirs that provably contain no key
        in range are carried into the new version UNTOUCHED — no read, no
        rewrite. At 100 TB this is the difference between 'merge costs
        what the affected partitions cost' and 'every merge rewrites the
        table'; the same key-locality argument Delta/Iceberg make for
        clustering on merge keys (z-order the table by its merge key and
        scoping tightens further, file-granular).

        `updates_materialized=True` skips the up-front localCheckpoint:
        callers whose updates plan is ALREADY rooted at materialized
        inputs (the IVM refreshes checkpoint their delta once and pass
        cheap filters/anti-joins over it) assert determinism themselves
        and save one job + one |updates| write per commit (optimization
        r15 — the census measured the double materialization at ~10% of
        a q183 refresh). The multi-evaluation then recomputes only the
        trivial post-checkpoint operators."""
        if not updates_materialized:
            updates = updates.localCheckpoint(eager=True)
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)

        untouched: list[str] = []
        scoped_rels = list(pm.files)
        preds: list[tuple] = []
        # Scoping requires TYPE-STABLE output: if an upsert column is wider
        # than the table's (e.g. a widened decimal), unionByName widens the
        # rewritten rows while untouched dirs keep the old physical type —
        # a mixed-type table that fails on read. A full rewrite (scoping
        # off) homogenizes, which was the pre-scoping behavior.
        if scope_by_stats and key_cols:
            from pyspark.sql.types import StructType

            t_types = {
                f.name: f.dataType
                for f in StructType.fromDDL(pm.schema_ddl).fields
            }
            scope_by_stats = all(
                f.dataType == t_types[f.name]
                for f in updates.schema.fields
                if f.name in t_types
            )
        if scope_by_stats and key_cols:
            preds = _key_bounds_preds(updates, key_cols)
            # Stats are keyed by physical names (column mapping).
            fwd = _log_to_phys(pm.column_mapping)
            preds = [(fwd.get(c, c), op, v) for c, op, v in preds]
            # Hidden partitioning: key bounds derive transform-leaf
            # predicates too, so a merge keyed on a transform's source
            # column scopes to the matching transform leaves (monotone
            # transforms carry the range; bucket derives nothing from
            # ranges — stats scoping still applies). Derivation is
            # per-entry: spec-snapshot entries derive against their OWN
            # spec (exact across evolution), legacy entries the union.
            if preds:
                schema_types = self._schema_types(pm)
                dcache: dict = {}

                def dpreds(rel: str) -> list[tuple]:
                    return (
                        _entry_derived_preds(
                            preds, pm.stats.get(rel, {}),
                            pm.partition_by, fwd, schema_types,
                            pm.past_specs, dcache,
                        )
                        or []
                    )

                part_types = self._part_types(pm)
                scoped_rels = [
                    rel for rel in pm.files
                    if _entry_may_match(
                        pm.stats.get(rel, {}), dpreds(rel), part_types
                    )
                ]
                untouched = [
                    rel for rel in pm.files if rel not in scoped_rels
                ]

        # FILE-granular scoping within kept entries: a dir's envelope can
        # match while individual files' tighter ranges refute every update
        # key — those files become their own manifest entries, carried
        # forward byte-identical, and only the matching files are read and
        # rewritten. Cluster the table on its merge key (compact + z-order
        # or range layout) and merge cost drops from affected-dirs to
        # affected-FILES — the same refinement Delta's file-level MERGE
        # pruning makes over partition pruning.
        scoped_sel: list[tuple[str, list[str] | None]] = []
        carried_files: dict[str, dict] = {}
        n_files_untouched = 0
        for rel in scoped_rels:
            stats = pm.stats.get(rel, {})
            fmap = stats.get("files")
            if preds and fmap and len(fmap) > 1:
                keep = [
                    fn for fn, fs in sorted(fmap.items())
                    if _file_may_match(fs, preds)
                ]
                if not keep:
                    # Envelope matched but every file refutes: the whole
                    # entry is untouched after all.
                    untouched.append(rel)
                    continue
                if len(keep) < len(fmap):
                    for fn, fs in sorted(fmap.items()):
                        if fn in keep:
                            continue
                        fstats = dict(fs)
                        if "part_values" in stats:
                            fstats["part_values"] = stats["part_values"]
                        if "spec" in stats:
                            fstats["spec"] = stats["spec"]
                        carried_files[f"{rel}/{fn}"] = fstats
                        n_files_untouched += 1
                    scoped_sel.append((rel, keep))
                    continue
            scoped_sel.append((rel, None))

        target = self._scan_entries(scoped_sel, pm)
        if target is None:
            target = self.spark.createDataFrame([], pm.schema_ddl)

        if delete_col and delete_col in updates.columns:
            deletes = updates.filter(F.col(delete_col) == True)  # noqa: E712
            upserts = updates.filter(
                F.col(delete_col).isNull() | (F.col(delete_col) == False)  # noqa: E712
            ).drop(delete_col)
            delete_keys = deletes.select(*key_cols)
        else:
            upserts = updates
            delete_keys = None
        # Schema evolution (merge_schema): the upsert schema may widen
        # column types or add columns, exactly like append(merge_schema=)
        # — the promotion chains validate, both sides conform to the
        # evolved schema (survivors null-fill added columns), and the
        # committed DDL is the evolved one. Off-chain retypes raise.
        if merge_schema:
            from pyspark.sql.types import StructType

            ev_ddl = self._evolved_schema_ddl(
                upserts, True, pm.schema_ddl
            )
            sch = StructType.fromDDL(ev_ddl)
            target = _conform(target, sch)
            upserts = _conform(upserts, sch)
        # CHECK constraints gate the NEW rows (upserts); surviving rows
        # were validated when they were written.
        _enforce_constraints(upserts, pm.constraints)

        survivors = target.join(
            upserts.select(*key_cols), key_cols, "left_anti"
        )
        if delete_keys is not None:
            survivors = survivors.join(delete_keys, key_cols, "left_anti")
        merged = survivors.unionByName(upserts)

        # Materialized change feed, from row sets the MERGE already knows:
        # matched old rows (replaced or deleted) leave as deletes, every
        # upsert row arrives as an insert. NB an update whose new row equals
        # the old one still emits its delete+insert pair (the lazy
        # exceptAll diff used to cancel those) — replay semantics are
        # identical, row counts per commit can differ for no-op updates.
        cdf_summary = {}
        cdf_df = None
        if self._materialize_changes:
            match_keys = upserts.select(*key_cols)
            if delete_keys is not None:
                match_keys = match_keys.unionByName(delete_keys)
            # ONE semi join on the union of keys: leftsemi emits each
            # target row at most once, so a key present as both upsert
            # and delete can't double-emit its old row.
            removed = target.join(match_keys, key_cols, "leftsemi")
            cdf_df = removed.withColumn(
                "_change_type", F.lit("delete")
            ).unionByName(
                upserts.withColumn("_change_type", F.lit("insert"))
            )

        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, merged, pm.partition_by
        )
        if cdf_rel is not None:
            cdf_summary["cdf"] = cdf_rel
        # Untouched dirs ride along with their existing stats; the evolved
        # flag must survive when heterogeneous old dirs remain (a full
        # rewrite — untouched empty — homogenizes and may drop it), and
        # must be SET when this merge itself evolved the schema while
        # untouched old-schema dirs remain.
        evolved = (
            bool(pm.summary.get("schema_evolved"))
            or merged.schema.simpleString() != pm.schema_ddl
        ) and bool(untouched or carried_files)
        return self._commit(
            operation="merge",
            files=tuple(untouched) + tuple(carried_files) + tuple(entries),
            schema_ddl=merged.schema.simpleString(),
            expected_parent=parent,
            summary={
                **(summary or {}),
                **cdf_summary,
                **({"schema_evolved": True} if evolved else {}),
                "n_dirs_untouched": len(untouched),
                "n_files_untouched": n_files_untouched,
            },
            stats={
                **{rel: pm.stats[rel] for rel in untouched
                   if rel in pm.stats},
                **carried_files,
                **entries,
            },
        )

    def _scoped_cow_selection(
        self, pm: Manifest, predicates: list[tuple]
    ) -> tuple[list, list, dict, int]:
        """Entry+file-granular selection for a scoped COW rewrite
        (delete_where / update_where triple form — same refinement the
        MERGE path applies to its key bounds). Returns
        (scoped_sel, untouched_rels, carried_files, n_files_untouched):
        entries/files in the latter two PROVABLY contain no row the
        predicate conjunction selects (TRUE rows; stats / partition
        dirs / blooms / per-row-group envelopes each suffice alone) and
        carry forward byte-identical. Derivation is per-entry
        (spec snapshots), so transform-partitioned leaves scope exactly
        across partition evolution."""
        fwd = _log_to_phys(pm.column_mapping)
        phys = [(fwd.get(c, c), op, v) for c, op, v in predicates]
        schema_types = self._schema_types(pm)
        part_types = self._part_types(pm)
        cache: dict = {}
        untouched: list[str] = []
        scoped: list[str] = []
        for rel in pm.files:
            stats = pm.stats.get(rel, {})
            dp = (
                _entry_derived_preds(
                    phys, stats, pm.partition_by, fwd, schema_types,
                    pm.past_specs, cache,
                )
                or []
            )
            if dp and not _entry_may_match(stats, dp, part_types):
                untouched.append(rel)
            else:
                scoped.append(rel)
        scoped_sel: list[tuple[str, list[str] | None]] = []
        carried_files: dict[str, dict] = {}
        n_files_untouched = 0
        for rel in scoped:
            stats = pm.stats.get(rel, {})
            fmap = stats.get("files")
            if phys and fmap and len(fmap) > 1:
                keep = [
                    fn for fn, fs in sorted(fmap.items())
                    if _file_may_match(fs, phys)
                ]
                if not keep:
                    untouched.append(rel)
                    continue
                if len(keep) < len(fmap):
                    for fn, fs in sorted(fmap.items()):
                        if fn in keep:
                            continue
                        fstats = dict(fs)
                        for carry_key in ("part_values", "spec"):
                            if carry_key in stats:
                                fstats[carry_key] = stats[carry_key]
                        carried_files[f"{rel}/{fn}"] = fstats
                        n_files_untouched += 1
                    scoped_sel.append((rel, keep))
                    continue
            scoped_sel.append((rel, None))
        return scoped_sel, untouched, carried_files, n_files_untouched

    def delete_where(self, predicate: Column | list) -> int:
        """Copy-on-write DELETE.

        Column form (legacy): keep rows NOT matching — rows where the
        predicate evaluates NULL are dropped too (Spark filter
        semantics), and the whole table rewrites.

        Triple form (`[(col, op, literal), ...]` — the
        `read(predicates=)` shape): deletes EXACTLY the rows the
        predicated read selects (TRUE-only, SQL DELETE semantics) and
        the rewrite is STATS-SCOPED: entries (and individual files
        inside kept entries) whose stats / partition dirs / blooms
        prove no matching row carry forward byte-identical, so a
        partition-aligned delete on a 100 TB table costs the affected
        leaves, not the table — with the change feed still exact."""
        parent = self.latest_version()
        if isinstance(predicate, (list, tuple)):
            pm = self.manifest(parent)
            preds = [tuple(p) for p in predicate]
            cond = _predicates_to_column(preds)
            (
                scoped_sel, untouched, carried_files, n_files_untouched,
            ) = self._scoped_cow_selection(pm, preds)
            target = self._scan_entries(scoped_sel, pm)
            if target is None:
                target = self.spark.createDataFrame([], pm.schema_ddl)
            kept = target.filter(~F.coalesce(cond, F.lit(False)))
            cdf_summary: dict = {
                "n_dirs_untouched": len(untouched),
                "n_files_untouched": n_files_untouched,
            }
            cdf_df = (
                target.filter(cond).withColumn(
                    "_change_type", F.lit("delete")
                )
                if self._materialize_changes
                else None
            )
            cdf_rel, entries = self._write_cdf_and_data(
                cdf_df, kept, self.partition_by
            )
            if cdf_rel is not None:
                cdf_summary["cdf"] = cdf_rel
            return self._commit(
                operation="delete",
                files=tuple(untouched)
                + tuple(carried_files)
                + tuple(entries),
                schema_ddl=pm.schema_ddl,
                expected_parent=parent,
                summary=cdf_summary,
                stats={
                    **{
                        rel: pm.stats[rel]
                        for rel in untouched
                        if rel in pm.stats
                    },
                    **carried_files,
                    **entries,
                },
            )
        snapshot = self.read(parent)
        kept = snapshot.filter(~predicate)
        cdf_summary = {}
        # Exact complement of `kept`: rows where the predicate is NULL
        # are dropped by filter(~pred) too, so they must appear as
        # deletes — filter(pred) alone would lose them from the feed.
        cdf_df = (
            snapshot.filter(
                F.coalesce(predicate, F.lit(True))
            ).withColumn("_change_type", F.lit("delete"))
            if self._materialize_changes
            else None
        )
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, kept, self.partition_by
        )
        if cdf_rel is not None:
            cdf_summary["cdf"] = cdf_rel
        return self._commit(
            operation="delete",
            files=tuple(entries),
            schema_ddl=kept.schema.simpleString(),
            expected_parent=parent,
            summary=cdf_summary,
            stats=entries,
        )

    def update_where(
        self,
        predicate: Column | list,
        set: dict[str, Column | str],
        expected_version: int | None = None,
    ) -> int:
        """Copy-on-write UPDATE (Delta's `UPDATE ... WHERE` shape): rows
        matching the predicate (TRUE only — NULL rows stay unchanged,
        SQL UPDATE semantics) get the `set` assignments applied;
        everything else is untouched. Assignment values are Columns or
        SQL expression strings over the PRE-update row, each cast to the
        target column's existing type (an UPDATE never changes the
        schema); CHECK constraints re-validate the updated rows.

        With the triple predicate form the rewrite is STATS-SCOPED like
        `delete_where`: provably unmatched entries/files carry forward
        byte-identical, so updating one partition costs that partition.
        The change feed represents each update as its delete(preimage) +
        insert(postimage) pair — the same encoding MERGE emits, so
        incremental MVs and downstream replays need no new change
        type.

        Snapshot-isolated like MERGE: commits against the version it
        read (or `expected_version` when the caller pins one); any
        commit landing in between raises `ConcurrentCommitError` and
        the caller re-runs against the new snapshot."""
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        schema_cols = {
            f.name: f.dataType
            for f in self.spark.createDataFrame(
                [], pm.schema_ddl
            ).schema.fields
        }
        for col in set:
            if col not in schema_cols:
                raise ValueError(
                    f"update_where: unknown column {col!r} "
                    f"(table has {sorted(schema_cols)})"
                )
        assigns = {
            col: (F.expr(v) if isinstance(v, str) else v).cast(
                schema_cols[col]
            )
            for col, v in set.items()
        }
        scoped = isinstance(predicate, (list, tuple))
        if scoped:
            preds = [tuple(p) for p in predicate]
            cond = _predicates_to_column(preds)
            (
                scoped_sel, untouched, carried_files, n_files_untouched,
            ) = self._scoped_cow_selection(pm, preds)
            target = self._scan_entries(scoped_sel, pm)
            if target is None:
                target = self.spark.createDataFrame([], pm.schema_ddl)
        else:
            cond = predicate
            untouched, carried_files, n_files_untouched = [], {}, 0
            target = self.read(parent)
        # The match decision is pinned BEFORE assignments apply: an
        # assignment that rewrites a predicate column must not change
        # which rows count as matched for the postimage/constraint
        # selections below.
        marked = target.withColumn(
            "__upd_match", F.coalesce(cond, F.lit(False))
        )
        upd_marked = marked.select(
            *[
                F.when(F.col("__upd_match"), assigns[c])
                .otherwise(F.col(c))
                .alias(c)
                if c in assigns
                else F.col(c)
                for c in target.columns
            ],
            F.col("__upd_match"),
        )
        updated = upd_marked.drop("__upd_match")
        # Only updated rows can newly violate a CHECK constraint.
        _enforce_constraints(
            upd_marked.filter("__upd_match").drop("__upd_match"),
            pm.constraints,
        )
        cdf_summary: dict = {
            "n_dirs_untouched": len(untouched),
            "n_files_untouched": n_files_untouched,
        }
        cdf_df = None
        if self._materialize_changes:
            pre = (
                marked.filter("__upd_match")
                .drop("__upd_match")
                .withColumn("_change_type", F.lit("delete"))
            )
            post = (
                upd_marked.filter("__upd_match")
                .drop("__upd_match")
                .withColumn("_change_type", F.lit("insert"))
            )
            cdf_df = pre.unionByName(post)
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, updated, self.partition_by
        )
        if cdf_rel is not None:
            cdf_summary["cdf"] = cdf_rel
        return self._commit(
            operation="update",
            files=tuple(untouched)
            + tuple(carried_files)
            + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=cdf_summary,
            stats={
                **{
                    rel: pm.stats[rel]
                    for rel in untouched
                    if rel in pm.stats
                },
                **carried_files,
                **entries,
            },
        )

    def delete_where_deferred(self, predicate_sql: str) -> int:
        """Merge-on-read DELETE (Iceberg predicate-delete shape): instead
        of rewriting every affected entry (copy-on-write), record the
        predicate in the manifest, scoped to the entries that exist NOW;
        reads apply NOT(predicate) to exactly those entries. Delete cost
        = one metadata commit plus (when change materialization is on)
        one scan for the matched rows' change file — never a data
        rewrite. Later appends are untouched by construction (fresh entry
        rels); `compact()` or any rewriting DML materializes the
        deletion and retires the predicate.

        Trade-off vs `delete_where` (COW): reads pay the filter until a
        rewrite happens, and entry stats/blooms stay un-tightened
        (pruning remains safe — deletion only removes rows). The
        predicate must be a deterministic SQL boolean over table columns
        (validated by resolving it against the schema up front)."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        # Fail fast on an unresolvable/na predicate before committing.
        self.spark.createDataFrame([], pm.schema_ddl).filter(
            F.expr(predicate_sql)
        ).schema
        summary: dict = {"delete_predicate": predicate_sql}
        if self._materialize_changes:
            matched = self.read(parent).filter(
                F.coalesce(F.expr(predicate_sql), F.lit(True))
            )
            rel = self._write_cdf(
                matched.withColumn("_change_type", F.lit("delete"))
            )
            if _collect_dir_stats(os.path.join(self.root, rel))["rows"]:
                summary["cdf"] = rel
            else:
                summary["cdf_empty"] = True
        evolved = bool(pm.summary.get("schema_evolved"))
        return self._commit(
            operation="delete_deferred",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                **summary,
                **({"schema_evolved": True} if evolved else {}),
            },
            stats=dict(pm.stats),
            delete_predicates=tuple(pm.delete_predicates)
            + (
                {
                    "sql": predicate_sql,
                    "entries": [
                        r.replace(os.sep, "/") for r in pm.files
                    ],
                },
            ),
        )

    def _write_position_deletes(self, matched: DataFrame) -> tuple:
        """Write the (file_rel, pos) coordinates of `matched` (a frame
        carrying `__file_rel`/`__pos`) as a position-delete parquet dir
        under `deletes/`. Returns (rel, n_rows); the dir is removed again
        when zero rows matched (nothing to reference)."""
        import shutil as _shutil

        rel = os.path.join(_DELETES_DIR, uuid.uuid4().hex)
        absd = os.path.join(self.root, rel)
        matched.select(
            F.col("__file_rel").alias("file_rel"),
            F.col("__pos").alias("pos"),
        ).write.mode("errorifexists").parquet(absd)
        n = _collect_dir_stats(absd)["rows"]
        if n == 0:
            _shutil.rmtree(absd, ignore_errors=True)
        return rel, n

    def update_where_deferred(
        self,
        predicate: list,
        set: dict[str, Column | str],
        expected_version: int | None = None,
    ) -> int:
        """MERGE-ON-READ UPDATE via position deletes (Iceberg
        positional-delete / Delta deletion-vector shape): instead of
        rewriting every file holding a matched row (copy-on-write
        `update_where`), the matched rows' (file, row-ordinal)
        coordinates land in a delete file under `deletes/` and the
        POSTIMAGES append as a fresh entry — write cost ∝ matched ROWS,
        never ∝ the files they live in. On a 100 TB table where an
        update touches 1k rows spread across 1k large files, COW
        rewrites those files wholesale; this writes kilobytes.

        Reads (session `read()` AND `spark.read.format("versioned")`)
        apply the delete file by anti-joining coordinates, scoped to the
        entries that existed at commit time — later appends are
        untouched by construction. Any rewriting DML or `compact()`
        materializes the deletions and retires the file (same
        lifecycle as SQL deferred deletes).

        The predicate must be the triple form (`[(col, op, literal),
        ...]`) — its stats scoping bounds the coordinate scan to the
        entries that may hold matches. Semantics match `update_where`:
        TRUE-only match on PRE-update values, assignments cast to the
        column's existing type, CHECK constraints re-validated on
        postimages, change feed emits delete(preimage)+insert(postimage)
        pairs. Snapshot-isolated via `expected_version` like MERGE."""
        if not isinstance(predicate, (list, tuple)):
            raise ValueError(
                "update_where_deferred requires the triple predicate "
                "form [(col, op, literal), ...] (stats scoping bounds "
                "the coordinate scan); use update_where for Column "
                "predicates"
            )
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        schema_cols = {
            f.name: f.dataType
            for f in self.spark.createDataFrame(
                [], pm.schema_ddl
            ).schema.fields
        }
        for col in set:
            if col not in schema_cols:
                raise ValueError(
                    f"update_where_deferred: unknown column {col!r} "
                    f"(table has {sorted(schema_cols)})"
                )
        assigns = {
            col: (F.expr(v) if isinstance(v, str) else v).cast(
                schema_cols[col]
            )
            for col, v in set.items()
        }
        preds = [tuple(p) for p in predicate]
        cond = _predicates_to_column(preds)
        (
            scoped_sel, untouched, _carried, n_files_untouched,
        ) = self._scoped_cow_selection(pm, preds)
        target = self._scan_entries(scoped_sel, pm, with_pos=True)
        if target is None:
            return parent  # provably zero matches: nothing to commit
        matched = target.filter(F.coalesce(cond, F.lit(False)))
        data_cols = [c for c in matched.columns if c not in
                     ("__file_rel", "__pos")]
        post = matched.select(
            *[
                assigns[c].alias(c) if c in assigns else F.col(c)
                for c in data_cols
            ]
        )
        _enforce_constraints(post, pm.constraints)
        rel_del, n_del = self._write_position_deletes(matched)
        if n_del == 0:
            return parent  # no matched rows: no-op, no commit
        cdf_df = None
        if self._materialize_changes:
            pre = matched.select(*data_cols).withColumn(
                "_change_type", F.lit("delete")
            )
            ins = post.withColumn("_change_type", F.lit("insert"))
            cdf_df = pre.unionByName(ins)
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, post, self.partition_by
        )
        summary: dict = {
            "pos_deletes": rel_del,
            "n_position_deletes": n_del,
            "n_dirs_untouched": len(untouched),
            "n_files_untouched": n_files_untouched,
        }
        if cdf_rel is not None:
            summary["cdf"] = cdf_rel
        if pm.summary.get("schema_evolved"):
            summary["schema_evolved"] = True
        return self._commit(
            operation="update_deferred",
            files=pm.files + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=summary,
            stats={**dict(pm.stats), **entries},
            delete_predicates=tuple(pm.delete_predicates)
            + (
                {
                    "pos": rel_del.replace(os.sep, "/"),
                    "entries": [
                        rel.replace(os.sep, "/")
                        for rel, _files in scoped_sel
                    ],
                },
            ),
        )

    def merge_deferred(
        self,
        updates: DataFrame,
        key_cols: list[str],
        delete_col: str | None = None,
        expected_version: int | None = None,
    ) -> int:
        """MERGE-ON-READ MERGE: matched target rows are position-deleted
        (coordinates only — zero data-file rewrite), upsert rows append
        as a fresh entry. The MoR twin of `merge`, with identical
        semantics: matched keys replaced, `delete_col`=true rows
        removed, unmatched update rows inserted, CHECK constraints on
        the new rows, delete+insert change-feed pairs. Write cost ∝
        |updates| + |matched rows|, independent of the size of the files
        the matches live in — the reason Iceberg/Delta grew position
        deletes for streaming upsert workloads.

        Stats scoping bounds the coordinate scan exactly like `merge`:
        update-key min/max bounds prune entries/files through the
        manifest before anything is read."""
        updates = updates.localCheckpoint(eager=True)
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        if delete_col and delete_col in updates.columns:
            deletes = updates.filter(F.col(delete_col) == True)  # noqa: E712
            upserts = updates.filter(
                F.col(delete_col).isNull()
                | (F.col(delete_col) == False)  # noqa: E712
            ).drop(delete_col)
            delete_keys = deletes.select(*key_cols)
        else:
            upserts = updates
            delete_keys = None
        # Appended rows must be manifest-schema exact (no widening — the
        # old files are NOT rewritten here, so a wider upsert schema
        # would leave the table heterogeneous with no evolved marker).
        ddl = self._evolved_schema_ddl(upserts, False, pm.schema_ddl)
        upserts = _cast_to_ddl_types(upserts, ddl)
        _enforce_constraints(upserts, pm.constraints)
        # Key bounds -> logical triples -> the same scoped selection the
        # COW paths use (NaN bounds poison comparisons: scoping stands
        # down entirely, like merge()).
        preds = _key_bounds_preds(updates, key_cols)
        (
            scoped_sel, untouched, _carried, n_files_untouched,
        ) = self._scoped_cow_selection(pm, preds)
        target = self._scan_entries(scoped_sel, pm, with_pos=True)
        match_keys = upserts.select(*key_cols)
        if delete_keys is not None:
            match_keys = match_keys.unionByName(delete_keys)
        n_del = 0
        rel_del = None
        matched = None
        if target is not None:
            matched = target.join(match_keys, key_cols, "leftsemi")
            rel_del, n_del = self._write_position_deletes(matched)
        cdf_df = None
        if self._materialize_changes:
            data_cols = [
                c
                for c in (target.columns if target is not None else [])
                if c not in ("__file_rel", "__pos")
            ]
            pre = (
                matched.select(*data_cols)
                if matched is not None
                else self.spark.createDataFrame([], pm.schema_ddl)
            ).withColumn("_change_type", F.lit("delete"))
            ins = upserts.withColumn("_change_type", F.lit("insert"))
            cdf_df = pre.unionByName(ins)
        cdf_rel, entries = self._write_cdf_and_data(
            cdf_df, upserts, self.partition_by
        )
        summary: dict = {
            "n_position_deletes": n_del,
            "n_dirs_untouched": len(untouched),
            "n_files_untouched": n_files_untouched,
        }
        if rel_del is not None and n_del:
            summary["pos_deletes"] = rel_del
        if cdf_rel is not None:
            summary["cdf"] = cdf_rel
        if pm.summary.get("schema_evolved"):
            summary["schema_evolved"] = True
        extra_pred = (
            (
                {
                    "pos": rel_del.replace(os.sep, "/"),
                    "entries": [
                        rel.replace(os.sep, "/")
                        for rel, _files in scoped_sel
                    ],
                },
            )
            if rel_del is not None and n_del
            else ()
        )
        return self._commit(
            operation="merge_deferred",
            files=pm.files + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=summary,
            stats={**dict(pm.stats), **entries},
            delete_predicates=tuple(pm.delete_predicates) + extra_pred,
        )

    def delete_keys_deferred(
        self,
        keys: DataFrame,
        expected_version: int | None = None,
    ) -> int:
        """EQUALITY DELETES (Iceberg's second delete-file kind): defer
        deletion of every row whose values on `keys`' columns match a
        key row — WITHOUT reading the table at all. The delete file
        stores key VALUES; write cost ∝ |keys|, zero scan (position
        deletes need the target's coordinates, i.e. a scan — equality
        deletes are what a pure streaming writer that never reads the
        table can afford), zero data-file rewrite. Reads anti-join the
        key columns, scoped to the entries that exist NOW (a later
        re-insert of the same key survives — sequence-number
        semantics); rewriting DML / compact() materialize and retire;
        `compact_deletes()` merges same-column files.

        Every column of `keys` is an equality column and must exist in
        the table schema (values cast to the table's types). NULL key
        values refuse: SQL equality never matches NULL, so a null key
        row could never delete anything — accepting it would silently
        do nothing. The key-bounds scope also tightens the recorded
        entry list through the manifest stats, so reads of provably
        key-free entries never load the delete file."""
        keys = keys.localCheckpoint(eager=True)
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        from pyspark.sql.types import StructType

        t_types = {
            f.name: f.dataType
            for f in StructType.fromDDL(pm.schema_ddl).fields
        }
        cols = list(keys.columns)
        unknown = [c for c in cols if c not in t_types]
        if not cols or unknown:
            raise ValueError(
                f"delete_keys_deferred: key columns {unknown or cols} "
                f"not in table schema ({sorted(t_types)})"
            )
        keys = keys.select(
            *[F.col(c).cast(t_types[c]).alias(c) for c in cols]
        ).dropDuplicates()
        null_cond = None
        for c in cols:
            nc = F.col(c).isNull()
            null_cond = nc if null_cond is None else (null_cond | nc)
        if keys.filter(null_cond).limit(1).count():
            raise ValueError(
                "delete_keys_deferred: NULL key values never match "
                "(SQL equality) — drop them or use delete_where"
            )
        # Key bounds tighten the recorded scope through the stats —
        # same pruning merge uses (NaN bounds stand down).
        preds: list[tuple] = []
        row = keys.agg(
            *[
                f
                for k in cols
                for f in (
                    F.min(k).alias(f"__lo_{k}"),
                    F.max(k).alias(f"__hi_{k}"),
                )
            ]
        ).collect()[0]
        for k in cols:
            lo, hi = row[f"__lo_{k}"], row[f"__hi_{k}"]
            if any(isinstance(b, float) and b != b for b in (lo, hi)):
                preds = []
                break
            if lo is not None and hi is not None:
                preds += [(k, ">=", lo), (k, "<=", hi)]
        (
            scoped_sel, _untouched, _carried, _nfu,
        ) = self._scoped_cow_selection(pm, preds)
        rel = os.path.join(_DELETES_DIR, uuid.uuid4().hex)
        keys.coalesce(1).write.mode("errorifexists").parquet(
            os.path.join(self.root, rel)
        )
        n_keys = _collect_dir_stats(os.path.join(self.root, rel))["rows"]
        summary: dict = {
            "n_equality_delete_keys": n_keys,
            "eq_deletes": rel.replace(os.sep, "/"),
        }
        if self._materialize_changes:
            target = self._scan_entries(scoped_sel, pm)
            matched = (
                target.join(keys, cols, "leftsemi")
                if target is not None
                else self.spark.createDataFrame([], pm.schema_ddl)
            )
            summary["cdf"] = self._write_cdf(
                matched.withColumn("_change_type", F.lit("delete"))
            )
        if pm.summary.get("schema_evolved"):
            summary["schema_evolved"] = True
        return self._commit(
            operation="delete_keys_deferred",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary=summary,
            stats=dict(pm.stats),
            delete_predicates=tuple(pm.delete_predicates)
            + (
                {
                    "eq": rel.replace(os.sep, "/"),
                    "cols": cols,
                    "entries": [
                        r.replace(os.sep, "/")
                        for r, _files in scoped_sel
                    ],
                },
            ),
        )

    def upsert_deferred(
        self,
        updates: DataFrame,
        key_cols: list[str],
        expected_version: int | None = None,
        delete_keys: DataFrame | None = None,
        summary: dict | None = None,
        merge_schema: bool = False,
    ) -> int:
        """SCAN-FREE UPSERT in one commit (Flink→Iceberg upsert-mode
        shape): an equality-delete file of `updates`' keys — scoped to
        the entries that exist now — plus the updates appended as fresh
        entries. The table is never read (except to materialize the
        change feed's preimages when that is on): matched old rows
        vanish merge-on-read via the key anti-join, unmatched keys
        simply delete nothing. Write cost ∝ |updates| regardless of
        table size or layout — cheaper than `merge_deferred` (which
        scans for coordinates) and radically cheaper than COW `merge`;
        reads pay the anti-join until compaction. The CDC-at-full-
        firehose primitive.

        `delete_keys` (optional, columns == `key_cols`): extra keys
        whose matches just DELETE — no postimage. They land in the SAME
        equality-delete file, so a netted CDC micro-batch (upserts +
        deletes) applies as ONE atomic commit. A key in both frames is
        refused (ambiguous disposition — net the feed first).

        `merge_schema`: the updates frame may widen types or add
        columns under the append promotion rules; the evolved DDL
        commits and surviving old entries null-fill at read (same
        contract as `append(merge_schema=True)` / `merge`)."""
        updates = updates.localCheckpoint(eager=True)
        parent = (
            self.latest_version()
            if expected_version is None
            else expected_version
        )
        pm = self.manifest(parent)
        ddl = self._evolved_schema_ddl(updates, merge_schema, pm.schema_ddl)
        updates = _cast_to_ddl_types(updates, ddl)
        _enforce_constraints(updates, pm.constraints)
        if not key_cols:
            raise ValueError("upsert_deferred needs key_cols")
        if ddl != pm.schema_ddl and pm.column_mapping:
            # Same new-logical-vs-retired-physical collision rule as
            # append's evolution path.
            from pyspark.sql.types import StructType

            old_names = {
                f.name for f in StructType.fromDDL(pm.schema_ddl).fields
            }
            used_phys = set(
                pm.column_mapping.get("retired", ())
            ) | set(pm.column_mapping.get("map", {}).values())
            for f in updates.schema.fields:
                if f.name not in old_names and f.name in used_phys:
                    raise SchemaMismatchError(
                        f"column name {f.name!r} collides with a "
                        "physical column of a dropped/renamed column; "
                        "choose another name"
                    )
        keys = updates.select(*key_cols).dropDuplicates()
        if delete_keys is not None:
            if sorted(delete_keys.columns) != sorted(key_cols):
                raise ValueError(
                    f"delete_keys columns {delete_keys.columns} must "
                    f"equal key_cols {key_cols}"
                )
            key_types = {f.name: f.dataType for f in keys.schema.fields}
            delete_keys = (
                delete_keys.select(
                    *[
                        F.col(c).cast(key_types[c]).alias(c)
                        for c in key_cols
                    ]
                )
                .dropDuplicates()
                .localCheckpoint(eager=True)
            )
            if delete_keys.join(keys, key_cols, "semi").limit(1).count():
                raise ValueError(
                    "upsert_deferred: a key appears in both updates "
                    "and delete_keys — net the feed to one final "
                    "disposition per key first"
                )
            keys = keys.unionByName(delete_keys).dropDuplicates()
        null_cond = None
        for c in key_cols:
            nc = F.col(c).isNull()
            null_cond = nc if null_cond is None else (null_cond | nc)
        if keys.filter(null_cond).limit(1).count():
            raise ValueError(
                "upsert_deferred: NULL key values (SQL MERGE equality "
                "contract) — clean the feed or use merge()"
            )
        preds: list[tuple] = []
        row = keys.agg(
            *[
                f
                for k in key_cols
                for f in (
                    F.min(k).alias(f"__lo_{k}"),
                    F.max(k).alias(f"__hi_{k}"),
                )
            ]
        ).collect()[0]
        for k in key_cols:
            lo, hi = row[f"__lo_{k}"], row[f"__hi_{k}"]
            if any(isinstance(b, float) and b != b for b in (lo, hi)):
                preds = []
                break
            if lo is not None and hi is not None:
                preds += [(k, ">=", lo), (k, "<=", hi)]
        (
            scoped_sel, untouched, _carried, n_files_untouched,
        ) = self._scoped_cow_selection(pm, preds)
        rel = os.path.join(_DELETES_DIR, uuid.uuid4().hex)
        keys.coalesce(1).write.mode("errorifexists").parquet(
            os.path.join(self.root, rel)
        )
        entries = self._write_data_entries(updates, self.partition_by)
        smry: dict = {
            **(summary or {}),
            "n_equality_delete_keys": keys.count(),
            "eq_deletes": rel.replace(os.sep, "/"),
            "n_dirs_untouched": len(untouched),
            "n_files_untouched": n_files_untouched,
        }
        if self._materialize_changes:
            target = self._scan_entries(scoped_sel, pm)
            pre = (
                target.join(keys, key_cols, "leftsemi")
                if target is not None
                else self.spark.createDataFrame([], pm.schema_ddl)
            ).withColumn("_change_type", F.lit("delete"))
            ins = updates.withColumn("_change_type", F.lit("insert"))
            smry["cdf"] = self._write_cdf(
                pre.unionByName(ins, allowMissingColumns=True)
            )
        if (
            pm.summary.get("schema_evolved")
            or ddl != pm.schema_ddl
            or updates.schema.simpleString() != ddl
        ):
            smry["schema_evolved"] = True
        return self._commit(
            operation="upsert_deferred",
            files=pm.files + tuple(entries),
            schema_ddl=ddl,
            expected_parent=parent,
            summary=smry,
            stats={**dict(pm.stats), **entries},
            delete_predicates=tuple(pm.delete_predicates)
            + (
                {
                    "eq": rel.replace(os.sep, "/"),
                    "cols": list(key_cols),
                    "entries": [
                        r.replace(os.sep, "/")
                        for r, _files in scoped_sel
                    ],
                },
            ),
        )

    # -- change feed -------------------------------------------------------
    def changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed between two committed versions (exclusive
        of `from_version`, inclusive of `to_version`), Delta-CDF shaped:
        data columns plus `_change_type` ('insert' | 'delete') and
        `_commit_version`.

        Append/create commits are read STRAIGHT from their added data dirs
        — no diff computation at all, so the common ingest path streams
        changes at scan speed. Copy-on-write commits (merge / delete /
        overwrite) serve their MATERIALIZED change files (written at commit
        time from row sets the DML already had in hand — Delta-CDF design),
        also scan speed; `compact` marks itself change-free and is skipped.
        Tables written before change-file materialization fall back to the
        snapshot-vs-snapshot exceptAll diff (an update surfaces as
        delete + insert), bounded by the two snapshots the commit rewrote.
        """
        to_version = (
            self.latest_version() if to_version is None else to_version
        )
        if from_version < 1:
            raise NoSuchVersionError("from_version must be >= 1")

        from pyspark.sql.types import StructType

        # Conform every piece to the END schema of the range: under schema
        # evolution, dirs written before an added column (or by a subset
        # append) lack it, and a raw read of just those dirs would break
        # the unionByName across versions — or diff with mismatched
        # schemas. Missing columns read as NULL, same as `read()`.
        final_m = self.manifest(to_version)
        final = StructType.fromDDL(final_m.schema_ddl)
        # Change files (like data files) carry physical names; translate
        # with the END mapping so renamed columns keep their history.
        cdf_back = _phys_to_log(final_m.column_mapping)

        def fill_initial_defaults(df: DataFrame, v: int) -> DataFrame:
            """Initial defaults (add_column): pieces drawn from commits
            BEFORE a column's add (since_version > v) physically lack
            it, and the final snapshot serves those rows' column as the
            default — the conformed feed must agree, or replaying the
            feed diverges from the snapshots it reconstructs."""
            overlay = {
                c: spec["default"]
                for c, spec in final_m.column_defaults.items()
                if spec.get("since_version", 0) > v
            }
            if not overlay:
                return df
            ftypes = {f.name: f.dataType for f in final.fields}
            return df.select(
                *[
                    F.coalesce(
                        F.col(c), F.expr(overlay[c]).cast(ftypes[c])
                    ).alias(c)
                    if c in overlay
                    else F.col(c)
                    for c in df.columns
                ]
            )

        pieces: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            cur = self.manifest(v)
            prev = self.manifest(v - 1)
            if cur.operation in ("append", "create"):
                added = [f for f in cur.files if f not in prev.files]
                if not added:
                    continue
                raw = self._scan_entries([(r, None) for r in added], cur)
                if raw is None:
                    continue
                df = fill_initial_defaults(_conform(raw, final), v)
                pieces.append(
                    df.withColumn("_change_type", F.lit("insert"))
                    .withColumn("_commit_version", F.lit(v).cast("long"))
                )
            elif cur.summary.get("cdf_empty"):
                continue  # provably data-preserving (compact)
            elif cur.summary.get("cdf"):
                cdf = _rename_columns(
                    self.spark.read.parquet(
                        os.path.join(self.root, cur.summary["cdf"])
                    ),
                    cdf_back,
                )
                piece = fill_initial_defaults(
                    _conform(cdf, final, extra_cols=("_change_type",)),
                    v,
                )
                pieces.append(
                    piece.withColumn(
                        "_commit_version", F.lit(v).cast("long")
                    )
                )
            else:
                before = fill_initial_defaults(
                    _conform(self.read(v - 1), final), v - 1
                )
                after = fill_initial_defaults(
                    _conform(self.read(v), final), v
                )
                ins = after.exceptAll(before).withColumn(
                    "_change_type", F.lit("insert")
                )
                dels = before.exceptAll(after).withColumn(
                    "_change_type", F.lit("delete")
                )
                pieces.append(
                    ins.unionByName(dels).withColumn(
                        "_commit_version", F.lit(v).cast("long")
                    )
                )
        if not pieces:
            schema = self.manifest(to_version).schema_ddl
            return (
                self.spark.createDataFrame([], schema)
                .withColumn("_change_type", F.lit("").cast("string"))
                .withColumn("_commit_version", F.lit(0).cast("long"))
                .limit(0)
            )
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def version_at(self, timestamp: str | _dt.datetime) -> int:
        """Largest committed version whose commit time is <= `timestamp`
        (ISO string or datetime; naive values are taken as UTC, matching
        the manifests' committed_at). Timestamp-based time travel:
        ``read(version=t.version_at("2026-08-01T00:00:00"))``."""
        if isinstance(timestamp, str):
            ts = _dt.datetime.fromisoformat(timestamp)
        else:
            ts = timestamp
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        best: int | None = None
        for m in self.versions():
            if _dt.datetime.fromisoformat(m.committed_at) <= ts:
                best = m.version
        if best is None:
            raise NoSuchVersionError(
                f"{self.root}: no version committed at or before {ts}"
            )
        return best

    # -- branches (named refs) + write-audit-publish -------------------------
    def create_branch(
        self,
        name: str,
        from_version: int | None = None,
        from_ref: str | None = None,
    ) -> "VersionedTable":
        """Named ref, Iceberg-branch shaped: a SEPARATE manifest chain
        under `_manifests/branches/<name>/` seeded with a full checkpoint
        of the branch-point version, sharing the table's data space.
        Creation cost is O(one manifest) — never data, never O(files) of
        filesystem work (contrast :meth:`clone`, which links every data
        dir into a new root). Every read/DML method works on the returned
        handle unchanged (same commit protocol, so racing branch writers
        serialize exactly like main writers), main never sees branch
        commits, and `vacuum` counts branch manifests as references until
        :meth:`drop_branch`. Branch history starts at the branch point —
        time travel below it stays on main, where those versions live.

        This enables WRITE-AUDIT-PUBLISH: write a batch to a branch,
        validate it there (constraints, audit queries), then
        :meth:`publish_branch` atomically — a bad batch dies on the
        branch without ever being visible to main readers.

        `from_ref` seeds the new branch from ANOTHER branch's snapshot
        (that branch's head, or `from_version` within its chain)
        instead of main's — branches share the table's data space, so
        the seed checkpoint's entries stay vacuum-protected either way.
        The HANDLE is still created from main (no nested lineage: time
        travel below the seed lives wherever the seed's history lives);
        this is the catalog's staging primitive — a staged transaction
        on a catalog branch forks each table at the catalog's pinned
        branch coordinate."""
        if self.branch_name is not None:
            raise ValueError(
                "create_branch from the MAIN handle (branch-of-branch "
                "lineage is out of scope; branch from main again)"
            )
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(
                f"branch name {name!r} must match [A-Za-z0-9._-]{{1,64}}"
            )
        src = self if from_ref is None else self.branch(from_ref)
        m = src.manifest(from_version)
        bdir = os.path.join(
            self.root, _MANIFEST_DIR, _BRANCHES_SUBDIR, name
        )
        if os.path.isdir(bdir):
            raise BranchExistsError(f"{self.root}: branch {name!r} exists")
        os.makedirs(bdir, exist_ok=True)
        # Atomic seed through the commit protocol: exactly one of any
        # racing create_branch(name) writers publishes the checkpoint
        # (both can pass the isdir probe above; the claim decides).
        try:
            # Sharded seed: slices already checkpointed by main (or any
            # branch) are reused from the shared chunk store, so branch
            # creation writes O(changed slices), not O(live entries).
            self._protocol.publish(
                os.path.join(bdir, _manifest_name(m.version)),
                _checkpoint_text(m, bdir),
            )
        except ConcurrentCommitError:
            raise BranchExistsError(
                f"{self.root}: branch {name!r} exists (lost a "
                "create_branch race)"
            ) from None
        return self.branch(name)

    # -- tags (immutable named refs) -----------------------------------------
    def create_tag(self, name: str, version: int | None = None) -> int:
        """Immutable named ref: `release-2024` instead of `VERSION AS OF
        17` (Iceberg tag shape). One tiny JSON file, published through
        the commit protocol so racing same-name taggers resolve to
        exactly one winner; re-tagging an existing name refuses — drop
        first (a tag that silently moved would defeat its purpose).
        `expire_versions` refuses to drop a tagged version, so a tag is
        also a retention pin."""
        if self.branch_name is not None:
            raise ValueError(
                "create_tag from the MAIN handle (tags name main "
                "versions; tag a branch by publishing it first)"
            )
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(
                f"tag name {name!r} must match [A-Za-z0-9._-]{{1,64}}"
            )
        m = self.manifest(version)  # validates the version exists
        path = _tag_path(self.root, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            self._protocol.publish(
                path, json.dumps({"version": m.version})
            )
        except ConcurrentCommitError:
            raise TagExistsError(
                f"{self.root}: tag {name!r} exists (at "
                f"v{_tag_versions(self.root).get(name)}); drop_tag first"
            ) from None
        return m.version

    def drop_tag(self, name: str) -> None:
        if self.branch_name is not None:
            raise ValueError("drop_tag from the MAIN handle")
        path = _tag_path(self.root, name)
        if not os.path.exists(path):
            raise NoSuchTagError(
                f"{self.root}: no tag {name!r} "
                f"(existing: {sorted(_tag_versions(self.root))})"
            )
        os.remove(path)

    def list_tags(self) -> dict[str, int]:
        return _tag_versions(self.root)

    def tag_version(self, name: str) -> int:
        """Resolve a tag to its version — `read(t.tag_version('rel'))`
        is the tagged snapshot."""
        versions = _tag_versions(self.root)
        if name not in versions:
            raise NoSuchTagError(
                f"{self.root}: no tag {name!r} "
                f"(existing: {sorted(versions)})"
            )
        return versions[name]

    def branch(self, name: str) -> "VersionedTable":
        """Handle bound to an existing branch's manifest chain."""
        return VersionedTable(
            self.spark,
            self.root,
            commit_protocol=self._protocol,
            materialize_changes=self._materialize_changes,
            branch=name,
        )

    def list_branches(self) -> dict[str, dict]:
        """{name: {head, base}} for every live branch — name-listing plus
        one small manifest read per branch, never data."""
        out: dict[str, dict] = {}
        for name in _branch_names(self.root):
            b = self.branch(name)
            vs = sorted(
                int(n[1:9])
                for n in os.listdir(b._mdir)
                if n.startswith("v") and n.endswith(".json")
            )
            out[name] = {
                "head": b.latest_version(),
                "base": vs[0] if vs else None,
            }
        return out

    def drop_branch(self, name: str) -> None:
        """Remove the branch ref (its manifest chain). Data dirs only it
        referenced become orphans and are reclaimed by :meth:`vacuum`."""
        import shutil

        if self.branch_name is not None:
            raise ValueError("drop_branch from the MAIN handle")
        bdir = os.path.join(
            self.root, _MANIFEST_DIR, _BRANCHES_SUBDIR, name
        )
        if not os.path.isdir(bdir):
            raise NoSuchBranchError(
                f"{self.root}: no branch {name!r} "
                f"(existing: {_branch_names(self.root)})"
            )
        shutil.rmtree(bdir)

    def _branch_base(self, b: "VersionedTable") -> int:
        return min(
            int(n[1:9])
            for n in os.listdir(b._mdir)
            if n.startswith("v") and n.endswith(".json")
        )

    def publish_branch(
        self, name: str, expected_parent: int | None = None
    ) -> int:
        """Fast-forward the branch into main as ONE atomic squash commit
        (operation `publish_branch`) whose content IS the branch head's
        manifest — Iceberg's WAP publish. Atomicity is the commit
        protocol's version claim: the commit targets `base+1`, so it
        succeeds iff main still stands at the branch point; ANY
        concurrent main commit (including another publish) takes that
        number first and this publish refuses with
        :class:`ConcurrentCommitError` — a divergent fast-forward can
        never half-apply or overwrite. The branch ref survives publish
        (drop it separately); its data dirs are now referenced by main,
        so vacuum keeps them either way. Cost: O(head manifest) metadata,
        zero data movement — the branch's data dirs were already in the
        table's data space.

        `expected_parent` overrides the fast-forward base check for
        branches NOT seeded from main's head (a `from_ref` seed chain,
        where the branch dir's lowest version number is a position in
        another branch's chain, not main's): the squash targets
        `expected_parent + 1`, so it succeeds iff main still stands at
        the fork point the CALLER recorded — the catalog uses this to
        publish branch-pinned tables with its own divergence check
        backed by the same atomic claim."""
        if self.branch_name is not None:
            raise ValueError("publish_branch from the MAIN handle")
        b = self.branch(name)
        base = (
            self._branch_base(b)
            if expected_parent is None
            else expected_parent
        )
        head = b.manifest()
        if expected_parent is None and head.version == base:
            raise ValueError(
                f"branch {name!r} has no commits beyond its base "
                f"v{base}; nothing to publish"
            )
        cur = self.latest_version()
        if cur != base:
            raise ConcurrentCommitError(
                f"cannot fast-forward branch {name!r}: main is at "
                f"v{cur} but the branch forked at v{base} — re-branch "
                "from current main and replay, or cherry_pick individual "
                "branch commits"
            )
        # With an explicit expected_parent the branch's own numbering
        # lives in another chain: compute squashed ops relative to the
        # branch dir's seed, and never carry a cdf reference (head's cdf
        # covers only the last branch commit and `head.version ==
        # base + 1` would compare across chains — the feed falls back to
        # the snapshot diff, which is always correct).
        seed = (
            base if expected_parent is None else self._branch_base(b)
        )
        ops = [m.operation for m in b.versions() if m.version > seed]
        # A change-file reference carries over only when the squash IS a
        # single branch commit — otherwise the head's cdf covers just the
        # last commit, not the net delta, and the feed must fall back to
        # the snapshot diff for this version.
        cdf_keys = (
            {
                k: v
                for k, v in head.summary.items()
                if k in ("cdf", "cdf_empty")
            }
            if expected_parent is None and head.version == base + 1
            else {}
        )
        return self._commit(
            operation="publish_branch",
            files=head.files,
            schema_ddl=head.schema_ddl,
            expected_parent=base,
            summary={
                "branch": name,
                "branch_head": head.version,
                "squashed_operations": ops,
                **cdf_keys,
            },
            stats=dict(head.stats),
            partition_by=head.partition_by,
            constraints=dict(head.constraints),
            bloom_columns=head.bloom_columns,
            delete_predicates=head.delete_predicates,
            column_mapping=dict(head.column_mapping),
            past_specs=head.past_specs,
            column_defaults=dict(head.column_defaults),
            write_defaults=dict(head.write_defaults),
        )

    def cherry_pick(self, name: str, version: int) -> int:
        """Apply ONE branch commit's file-level delta onto main's head
        as a new commit (operation `cherry_pick`) — the selective half
        of WAP, for when a branch carries several audited batches and
        only some should publish. Supported shape: commits that add
        and/or remove whole entries without touching schema, partition
        spec, constraints, column mapping, or MoR delete predicates
        (append, overwrite, compact...); anything else refuses — a
        cherry-pick that silently reinterpreted a schema change or a
        delete-file scope would corrupt main. Refuses when the delta
        doesn't apply cleanly (a removed entry is no longer live on
        main, or an added entry already is)."""
        if self.branch_name is not None:
            raise ValueError("cherry_pick from the MAIN handle")
        b = self.branch(name)
        base = self._branch_base(b)
        if version <= base:
            raise ValueError(
                f"v{version} is at or before branch base v{base} — "
                "those versions are main history, not branch commits"
            )
        m = b.manifest(version)
        parent = b.manifest(version - 1)
        for field, label in (
            ("schema_ddl", "schema"),
            ("partition_by", "partition spec"),
            ("constraints", "constraints"),
            ("column_mapping", "column mapping"),
            ("delete_predicates", "delete predicates"),
            ("bloom_columns", "bloom columns"),
            ("column_defaults", "column defaults"),
            ("write_defaults", "write defaults"),
        ):
            if getattr(m, field) != getattr(parent, field):
                raise ValueError(
                    f"cherry_pick supports pure file-delta commits; "
                    f"branch commit v{version} changes the {label} — "
                    "publish_branch the whole branch instead"
                )
        added = [f for f in m.files if f not in set(parent.files)]
        removed = {f for f in parent.files if f not in set(m.files)}
        cur = self.manifest()
        cur_files = set(cur.files)
        if not removed <= cur_files:
            raise ConcurrentCommitError(
                f"cherry_pick v{version} of branch {name!r}: entries it "
                f"rewrites are no longer live on main "
                f"({sorted(removed - cur_files)[:3]}...)"
            )
        clash = [f for f in added if f in cur_files]
        if clash:
            raise ConcurrentCommitError(
                f"cherry_pick v{version} of branch {name!r}: entries "
                f"already live on main ({clash[:3]}...)"
            )
        files = tuple(
            f for f in cur.files if f not in removed
        ) + tuple(added)
        stats = {
            k: v for k, v in cur.stats.items() if k not in removed
        }
        stats.update({k: m.stats[k] for k in added if k in m.stats})
        return self._commit(
            operation="cherry_pick",
            files=files,
            schema_ddl=cur.schema_ddl,
            expected_parent=cur.version,
            summary={
                "branch": name,
                "branch_version": version,
                "branch_operation": m.operation,
                **{
                    k: v
                    for k, v in m.summary.items()
                    if k in ("cdf", "cdf_empty")
                },
            },
            stats=stats,
        )

    def clone(
        self,
        target_root: str,
        version: int | None = None,
        commit_protocol: "CommitProtocol | None" = None,
    ) -> "VersionedTable":
        """SHALLOW CLONE (Delta's shape, made self-contained): stand up
        an independent table at `target_root` whose v1 is this table's
        snapshot at `version` (default latest) — ZERO data copy, O(files)
        metadata ops. Data files hard-link (same inodes; falls back to a
        real copy per file across filesystems), so either table may
        evolve, expire, vacuum, or be deleted without touching the other:
        vacuum unlinks NAMES, and an inode lives while any table still
        references it.

        Everything the snapshot needs carries: entry stats (pruning and
        scoped merge work immediately), partition spec + leaf part
        values, blooms, CHECK constraints, column mapping, and live
        deferred-delete predicates (entry rels are preserved verbatim,
        so their scoping holds). History does NOT carry — the clone's v1
        is a fresh root (Delta shallow clones behave the same); use the
        change feed on the SOURCE for pre-clone history.

        Reference anchor: the reference copies datasets by re-running
        extraction into a new destination path
        (`src/Infrastructure/Upload/Providers/FileSystemUploadProvider.cs:64-76`);
        a lake format makes that a metadata operation."""
        import shutil as _shutil

        m = self.manifest(version)
        if os.path.exists(
            os.path.join(target_root, _MANIFEST_DIR)
        ):
            raise ValueError(f"{target_root} is already a versioned table")
        # Hard-link the referenced TOP-LEVEL uuid dirs wholesale (same
        # granularity vacuum works at); extra files inside a partially-
        # referenced dir cost inodes only, never correctness.
        referenced: set[str] = set()
        for rel in m.files:
            top = os.sep.join(rel.split(os.sep)[:2])
            referenced.add(top)
        # Live position/equality-delete files carry too (their scoped
        # entry rels are preserved verbatim, and `file_rel` coordinates
        # stay valid because the data dirs link with identical relative
        # paths).
        for p in m.delete_predicates:
            for kind in ("pos", "eq"):
                if kind in p:
                    referenced.add(
                        os.sep.join(p[kind].split(os.sep)[:2])
                    )

        def _link_tree(src: str, dst: str) -> None:
            for dirpath, _dirs, files in os.walk(src):
                rel_d = os.path.relpath(dirpath, src)
                d = dst if rel_d == "." else os.path.join(dst, rel_d)
                os.makedirs(d, exist_ok=True)
                for fn in files:
                    s = os.path.join(dirpath, fn)
                    t = os.path.join(d, fn)
                    try:
                        os.link(s, t)
                    except OSError:
                        _shutil.copy2(s, t)  # cross-device fallback

        os.makedirs(os.path.join(target_root, _MANIFEST_DIR))
        os.makedirs(os.path.join(target_root, _DATA_DIR), exist_ok=True)
        for top in sorted(referenced):
            _link_tree(
                os.path.join(self.root, top),
                os.path.join(target_root, top),
            )
        clone = VersionedTable(
            self.spark,
            target_root,
            commit_protocol=commit_protocol,
            materialize_changes=self._materialize_changes,
        )
        clone._commit(
            operation="clone",
            files=m.files,
            schema_ddl=m.schema_ddl,
            expected_parent=0,
            summary={
                "cloned_from": self.root,
                "source_version": m.version,
                # Heterogeneous file schemas must keep reading with
                # mergeSchema in the clone too.
                **(
                    {"schema_evolved": True}
                    if m.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(m.stats),
            partition_by=m.partition_by,
            constraints=dict(m.constraints),
            bloom_columns=m.bloom_columns,
            delete_predicates=m.delete_predicates,
            column_mapping=dict(m.column_mapping),
            column_defaults=dict(m.column_defaults),
            write_defaults=dict(m.write_defaults),
        )
        return clone

    def restore(self, version: int) -> int:
        """RESTORE the table to a prior version as a NEW commit: the new
        manifest references the old version's data entries verbatim (pure
        metadata — no data is read or rewritten, and the restored-to
        version must still exist, i.e. not expired), so history moves
        forward and the bad versions stay auditable, exactly like Delta's
        RESTORE. The change feed materializes the transition as
        current-as-deletes + restored-as-inserts (an overwrite-shaped
        diff), so downstream incremental consumers follow the rollback
        instead of desyncing."""
        target = self.manifest(version)  # raises if expired/unknown
        parent = self.latest_version()
        if version == parent:
            raise ValueError(f"already at version {version}")
        summary: dict = {"restored_version": version}
        if self._materialize_changes:
            from pyspark.errors import AnalysisException

            old = self.read(parent)
            new = self.read(version)
            try:
                summary["cdf"] = self._write_cdf(
                    old.withColumn(
                        "_change_type", F.lit("delete")
                    ).unionByName(
                        new.withColumn("_change_type", F.lit("insert")),
                        allowMissingColumns=True,
                    )
                )
            except AnalysisException as e:
                summary["cdf_skipped"] = (
                    f"restored schema not unionable: {e}"[:500]
                )
        return self._commit(
            operation="restore",
            files=target.files,
            schema_ddl=target.schema_ddl,
            expected_parent=parent,
            summary={
                **summary,
                **(
                    {"schema_evolved": True}
                    if target.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(target.stats),
            partition_by=target.partition_by,
            # Restore rolls metadata back too: the restored version's
            # constraint set (its data provably satisfied it), its
            # deferred-delete predicates (they scope its entries), and
            # its column mapping (its schema's physical bindings).
            constraints=dict(target.constraints),
            delete_predicates=target.delete_predicates,
            column_mapping=dict(target.column_mapping),
            column_defaults=dict(target.column_defaults),
            write_defaults=dict(target.write_defaults),
        )

    def materialize_changes(
        self, from_version: int = 1, to_version: int | None = None
    ) -> dict[int, str]:
        """Retro-write change files for LEGACY copy-on-write commits
        (merge/delete/overwrite committed before CDF materialization, or
        with `materialize_changes=False`) in `[from_version, to_version]`.

        Each backfilled version gets the snapshot-vs-snapshot exceptAll
        diff — exactly what batch `changes()` computes lazily for such
        commits — written once under `changes/` and referenced from the
        manifest, after which BOTH the batch feed and the streaming source
        (`sources/versioned_changes.py`, which refuses feed-less COW
        commits) serve it at scan speed. The manifest rewrite is
        metadata-only (same data entries, same schema; summary gains
        "cdf" / "cdf_empty") and atomic (temp + rename), so concurrent
        readers see either the old or the new manifest, never a torn one.

        An overwrite whose replacement schema can't union with its parent
        gets "cdf_skipped" (a change feed across it is undefined), same as
        commit-time materialization. Returns {version: change dir rel}
        for the versions actually backfilled. Raises NoSuchVersionError
        when a needed parent snapshot was expired."""
        from pyspark.errors import AnalysisException
        from pyspark.sql.types import StructType

        to_version = (
            self.latest_version() if to_version is None else to_version
        )
        done: dict[int, str] = {}
        for v in range(max(from_version, 2), to_version + 1):
            cur = self.manifest(v)
            if (
                cur.operation in ("append", "create")
                or cur.summary.get("cdf")
                or cur.summary.get("cdf_empty")
                or cur.summary.get("cdf_skipped")
            ):
                continue
            schema = StructType.fromDDL(cur.schema_ddl)
            summary = dict(cur.summary)
            try:
                before = _conform(self.read(v - 1), schema)
                after = _conform(self.read(v), schema)
                diff = (
                    after.exceptAll(before)
                    .withColumn("_change_type", F.lit("insert"))
                    .unionByName(
                        before.exceptAll(after).withColumn(
                            "_change_type", F.lit("delete")
                        )
                    )
                )
                rel = self._write_cdf(diff)
            except AnalysisException as e:
                summary["cdf_skipped"] = (
                    f"parent schema not unionable: {e}"[:500]
                )
            else:
                # An empty diff (data-preserving legacy commit) records the
                # commit as provably change-free — footer row counts, no
                # data scan; the rowless dir is left for vacuum.
                if _collect_dir_stats(
                    os.path.join(self.root, rel)
                )["rows"] > 0:
                    summary["cdf"] = rel
                    done[v] = rel
                else:
                    summary["cdf_empty"] = True
            self._rewrite_manifest_summary(cur, summary)
        return done

    def _rewrite_manifest_summary(self, m: Manifest, summary: dict) -> None:
        """Atomically replace a committed manifest with a copy whose ONLY
        difference is its summary (metadata annotation, e.g. a backfilled
        change-file reference) — data entries, schema, and version are
        untouched, so snapshot immutability holds for readers."""
        import dataclasses

        new = dataclasses.replace(m, summary=summary)
        mdir = self._mdir
        path = os.path.join(mdir, _manifest_name(m.version))
        # Preserve the storage form: if the version is delta-encoded,
        # rewrite it as a delta (summary is carried fully in every
        # delta), so annotation doesn't balloon a small commit record
        # back to O(table).
        with open(path) as f:
            d = _parse_version_file(f.read())
        if ("delta_of" in d and "files" not in d) or _has_chunk_refs(d):
            # Delta or sharded checkpoint: patch the summary in place —
            # annotation must not balloon the record back to O(table).
            d["summary"] = summary
            text = json.dumps(d, indent=2, sort_keys=True)
        else:
            text = new.to_json()
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        self._mcache.pop(m.version, None)

    # -- maintenance -------------------------------------------------------
    def delete_stats(self) -> dict:
        """Live merge-on-read delete posture — manifest + parquet
        FOOTERS only, never a data scan, so the probe is safe to run at
        streaming-upsert cadence. `n_deleted_rows` counts coordinate
        rows exactly and equality-delete KEYS as an upper bound (a key
        may match 0..n rows); `deleted_fraction` compares it against
        the live entries' row stats."""
        import pyarrow.parquet as _pq

        m = self.manifest()
        n_files = 0
        n_rows = 0
        n_sql = 0
        for p in m.delete_predicates:
            rel = p.get("pos") or p.get("eq")
            if rel is None:
                n_sql += 1
                continue
            d = os.path.join(self.root, rel)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                n_files += 1
                n_rows += _pq.read_metadata(f).num_rows
        total = sum(
            s.get("rows", 0) for s in m.stats.values()
        )
        return {
            "n_delete_predicates": len(m.delete_predicates),
            "n_sql_delete_predicates": n_sql,
            "n_delete_files": n_files,
            "n_deleted_rows": n_rows,
            "n_table_rows": total,
            "deleted_fraction": (n_rows / total) if total else 0.0,
        }

    def maintain_deletes(
        self,
        max_delete_files: int = 8,
        max_deleted_fraction: float = 0.3,
        num_partitions: int | None = None,
    ) -> dict:
        """Threshold policy closing the MoR write/read bargain: deferred
        DML makes writes cheap by deferring cost to reads (per-entry
        anti-joins against every live delete file), which is only
        sustainable if something bounds the backlog. Two escalating
        actions, cheapest that clears the breach:

        - live delete FILES exceed `max_delete_files` →
          :meth:`compact_deletes` — merges them into ONE coordinate
          file; data files untouched, cost ∝ delete-file bytes.
        - estimated deleted FRACTION exceeds `max_deleted_fraction` →
          full :meth:`compact` — materializes the deletions into the
          data and retires every predicate; cost ∝ table, which is the
          point: past this fraction every read is re-paying a
          comparable anti-join tax anyway.

        No-op when neither threshold is breached. The CDC committer can
        run this every K epochs (`make_cdc_apply_committer(...,
        maintain_every_epochs=K)`), giving the Flink→Iceberg
        upsert+maintenance loop in one knob.

        `num_partitions` defaults to the LIVE ENTRY COUNT rather than
        compact()'s explicit-call default of 1: the policy runs
        unattended, and an escalation that silently collapsed a wide
        table into one file would trade the read tax for a worse one.
        Pass an explicit value to retarget the layout."""
        st = self.delete_stats()
        executed: list[str] = []
        if (
            st["n_table_rows"]
            and st["deleted_fraction"] > max_deleted_fraction
        ):
            if num_partitions is None:
                num_partitions = max(len(self.manifest().files), 1)
            self.compact(num_partitions=num_partitions)
            executed.append("compact_materialize")
        elif st["n_delete_files"] > max_delete_files:
            before = self.latest_version()
            if self.compact_deletes() != before:
                executed.append("compact_deletes")
        return {**st, "executed": executed}

    def compact_deletes(self) -> int:
        """Merge every live position-delete file into ONE — the
        maintenance op that keeps streaming MoR upserts viable: each
        `update_where_deferred`/`merge_deferred` commit adds a small
        delete file, and a reader must load every file scoped to the
        entries it scans; at upsert cadence that's thousands of tiny
        parquet reads per query. This rewrites ONLY the coordinate
        files (data files untouched — unlike `compact()`, which
        materializes deletions INTO the data): the union of all
        (file_rel, pos) rows lands as one delete dir whose scope is the
        union of the originals' entry lists. Safe by construction:
        coordinates name exact (file, row-ordinal) pairs, so applying
        one against an entry that doesn't contain the file is a no-op
        anti-join — widening a scope can never drop an extra row, it
        can only cost a pruning opportunity. EQUALITY delete files are
        CONVERTED to coordinates first (Iceberg's
        convert-equality-deletes minor compaction): each key file
        semi-joins the entries within its OWN scope — key values must
        respect per-pred scope (re-inserted keys survive), coordinates
        need not — and the result merges into the same single position
        file. SQL deferred deletes are untouched (they carry semantics,
        not coordinates). Old delete dirs stay referenced by prior
        manifests for time travel; `vacuum()` collects them after
        `expire_versions`. No-op (no commit) when there is nothing to
        merge or convert."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        pos = [p for p in pm.delete_predicates if "pos" in p]
        eqs = [p for p in pm.delete_predicates if "eq" in p]
        if len(pos) + len(eqs) < 2 and not eqs:
            return parent
        # EQUALITY deletes CONVERT to coordinates (Iceberg's
        # convert-equality-deletes minor compaction): each pred's key
        # file semi-joins the entries within ITS OWN scope — per-pred
        # scoping is what encodes "keys re-inserted later survive", so
        # scope-UNION of raw key files would wrongly delete re-inserts;
        # coordinates have no such hazard (a (file, pos) pair against an
        # entry lacking the file is a no-op anti-join), so after
        # conversion everything merges into ONE position file. Reads the
        # scoped entries once per eq pred; writes nothing but
        # coordinates.
        coord_pieces: list[DataFrame] = []
        if pos:
            coord_pieces.append(
                self.spark.read.parquet(
                    *[os.path.join(self.root, p["pos"]) for p in pos]
                ).select("file_rel", "pos")
            )
        for p in eqs:
            scope = [
                e.replace(os.sep, "/").rstrip("/")
                for e in p["entries"]
            ]
            sel = [
                (rel, None)
                for rel in pm.files
                if any(
                    rel.replace(os.sep, "/") == pr
                    or rel.replace(os.sep, "/").startswith(pr + "/")
                    for pr in scope
                )
            ]
            df = self._scan_entries_raw(sel, pm, with_pos=True)
            if df is None:
                continue
            keys = self.spark.read.parquet(
                os.path.join(self.root, p["eq"])
            ).select(*p["cols"]).dropDuplicates()
            coord_pieces.append(
                df.join(keys, list(p["cols"]), "leftsemi").select(
                    F.col("__file_rel").alias("file_rel"),
                    F.col("__pos").alias("pos"),
                )
            )
        if not coord_pieces:
            return parent
        merged = coord_pieces[0]
        for piece in coord_pieces[1:]:
            merged = merged.unionByName(piece)
        merged = merged.dropDuplicates()
        rel = os.path.join(_DELETES_DIR, uuid.uuid4().hex)
        merged.coalesce(1).write.mode("errorifexists").parquet(
            os.path.join(self.root, rel)
        )
        n_rows = _collect_dir_stats(os.path.join(self.root, rel))["rows"]
        n_merged = len(pos) + len(eqs)
        entries_union = sorted(
            {e for p in (*pos, *eqs) for e in p["entries"]}
        )
        keep = tuple(
            p
            for p in pm.delete_predicates
            if "pos" not in p and "eq" not in p
        )
        summary = {"pos_deletes": rel.replace(os.sep, "/")}
        new_preds = [
            {
                "pos": rel.replace(os.sep, "/"),
                "entries": entries_union,
            }
        ]
        return self._commit(
            operation="compact_deletes",
            files=pm.files,
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            summary={
                **summary,
                "n_delete_files_merged": n_merged,
                "n_position_deletes": n_rows,
                # Data-preserving commit: the change feed across it is
                # empty, like compact().
                "cdf_empty": True,
                **(
                    {"schema_evolved": True}
                    if pm.summary.get("schema_evolved")
                    else {}
                ),
            },
            stats=dict(pm.stats),
            delete_predicates=keep + tuple(new_preds),
        )

    def compact(
        self,
        num_partitions: int = 1,
        zorder_by: list[str] | None = None,
        bits: int = 8,
        small_entry_max_rows: int | None = None,
        where: list[tuple] | None = None,
    ) -> int:
        """OPTIMIZE: rewrite the current snapshot's many small data dirs
        into one fresh dir (the small-files problem every streaming sink
        creates — E8 commits one dir per micro-batch). With `zorder_by`,
        the rewrite routes through the Morton-curve repartition
        (`operators/layout.py`), so the compacted files also cluster on
        every listed column and the manifest's footer stats turn selective
        on all of them — Delta's OPTIMIZE ZORDER BY, on this format.

        With `small_entry_max_rows`, the compaction is INCREMENTAL: only
        entries holding fewer rows than the threshold rewrite; every
        already-well-sized entry rides into the new version physically
        untouched, with its stats. On a table where a streaming sink
        drips micro-batches next to big compacted dirs, that makes the
        periodic OPTIMIZE cost ∝ the drip, not the table — at 100 TB the
        difference between a maintenance job and a table rewrite. Returns
        the current version unchanged when fewer than two small entries
        exist (nothing to gain).

        With `where` — a conjunction of (column, op, literal) triples,
        same shape as `read(predicates=)` — the compaction is
        PREDICATE-SCOPED (Delta's `OPTIMIZE WHERE`): only entries whose
        stats / partition values / blooms MAY match the predicate
        rewrite; everything provably outside it carries untouched. On a
        month-partitioned 100 TB table, "optimize the current month"
        costs the current month. Composes with `small_entry_max_rows`
        (intersection) and `zorder_by`.

        Data-preserving: commits operation='compact' with identical rows;
        `changes()` across it diffs to empty, and readers of old versions
        still see the old dirs until expire+vacuum."""
        parent = self.latest_version()
        pm = self.manifest(parent)
        carried_rels: list[str] = []
        scoped = where is not None or small_entry_max_rows is not None
        rewrite = list(pm.files)
        if where:
            part_types = self._part_types(pm)
            fwd = _log_to_phys(pm.column_mapping)
            phys = [(fwd.get(c, c), op, v) for c, op, v in where]
            schema_types = self._schema_types(pm)
            dcache: dict = {}
            rewrite = [
                rel
                for rel in rewrite
                if _entry_may_match(
                    pm.stats.get(rel, {}),
                    _entry_derived_preds(
                        phys, pm.stats.get(rel, {}), pm.partition_by,
                        fwd, schema_types, pm.past_specs, dcache,
                    )
                    or [],
                    part_types,
                )
            ]
        if small_entry_max_rows is not None:
            # Missing row stats read as small: the entry gets rewritten,
            # which is safe (and gives it stats).
            rewrite = [
                rel
                for rel in rewrite
                if pm.stats.get(rel, {}).get("rows", -1)
                < small_entry_max_rows
            ]
        if scoped:
            if len(rewrite) <= 1:
                return parent  # nothing to gain from rewriting <=1 entry
            carried_rels = [
                rel for rel in pm.files if rel not in rewrite
            ]
        sel = [(rel, None) for rel in rewrite]
        df = self._scan_entries(sel, pm)
        if df is None:
            return parent
        if zorder_by:
            from datalakeingestionservice_spark.operators.layout import (
                zorder_repartition,
            )

            # Bucket ranges from MANIFEST STATS when every rewritten
            # entry carries min/max for every clustered column
            # (optimization r15, guide §6/§1.2): the ranges aggregate
            # was a full scan of the rewrite set whose answer the
            # manifest already knows — at 100 TB that's a table scan
            # replaced by driver-side metadata. Footer envelopes are
            # conservative bounds (string stats may be truncated by
            # writers), which only coarsens bucket edges — clustering
            # stays valid; rows are never affected. Falls back to the
            # one-aggregate scan when any entry lacks stats.
            ranges = self._zorder_ranges_from_stats(zorder_by, rewrite, pm)
            df = zorder_repartition(
                df, zorder_by, num_partitions, bits=bits, ranges=ranges
            )
        else:
            df = df.repartition(num_partitions)
        entries = self._write_data_entries(df, self.partition_by)
        # Heterogeneous old entries surviving a PARTIAL compact keep the
        # table mergeSchema-dependent; a full compact homogenizes.
        evolved = bool(pm.summary.get("schema_evolved")) and bool(
            carried_rels
        )
        return self._commit(
            operation="compact",
            files=tuple(carried_rels) + tuple(entries),
            schema_ddl=pm.schema_ddl,
            expected_parent=parent,
            # A FULL compact rewrites every entry under the CURRENT
            # spec: historical-spec aliases no longer exist in any
            # entry, so the spec history resets (old-alias predicate
            # derivation becomes moot and bucket_join's param-evolution
            # refusal lifts). Scoped compacts carry old entries and
            # must keep the history.
            past_specs=() if not carried_rels else None,
            # Data-preserving by construction: the change feed skips this
            # commit outright instead of diffing two identical snapshots.
            summary={
                "cdf_empty": True,
                **({"schema_evolved": True} if evolved else {}),
                **(
                    {
                        "n_entries_compacted": len(sel),
                        "n_entries_carried": len(carried_rels),
                    }
                    if scoped
                    else {}
                ),
            },
            stats={
                **{
                    rel: pm.stats[rel]
                    for rel in carried_rels
                    if rel in pm.stats
                },
                **entries,
            },
        )

    def _zorder_ranges_from_stats(
        self, cols: list[str], rels: list[str], pm
    ) -> dict[str, tuple] | None:
        """(lo, hi) per z-order column from the manifest's per-entry
        min/max envelopes — None when any NON-EMPTY rewritten entry
        lacks stats for any clustered column (caller then pays the
        one-aggregate scan). Values are converted back to the column's
        logical type (stats JSON stores dates/timestamps as ISO
        strings) so `zorder_repartition`'s own normalization applies
        identically; timestamp second-flooring in `_int_value` matches
        the scan path's `unix_seconds` for the post-epoch stats real
        tables carry. Decimal/binary columns never have stats
        (`_stat_jsonable` drops them) and fall back."""
        import datetime as _dtmod

        fwd = _log_to_phys(pm.column_mapping)
        types = self._schema_types(pm)
        out: dict[str, tuple] = {}
        for c in cols:
            pc = fwd.get(c, c)
            mins: list = []
            maxs: list = []
            for rel in rels:
                st = pm.stats.get(rel, {})
                if st.get("rows") == 0:
                    continue  # nothing to bound
                colst = st.get("columns", {}).get(pc)
                if (
                    not colst
                    or "min" not in colst
                    or "max" not in colst
                ):
                    return None
                mins.append(colst["min"])
                maxs.append(colst["max"])
            if not mins:
                return None
            lo, hi = min(mins), max(maxs)
            t = types.get(c, "")
            try:
                if t == "date":
                    lo = _dtmod.date.fromisoformat(str(lo))
                    hi = _dtmod.date.fromisoformat(str(hi))
                elif t.startswith("timestamp"):
                    lo = _dtmod.datetime.fromisoformat(str(lo))
                    hi = _dtmod.datetime.fromisoformat(str(hi))
            except ValueError:
                return None
            out[c] = (lo, hi)
        return out

    def maintenance_plan(
        self,
        small_entry_max_rows: int = 100_000,
        max_live_delete_predicates: int = 3,
    ) -> dict:
        """Inspect the table and report which maintenance actions are
        due — pure metadata, no data scan. Keys: `compact_small_entries`
        (more than one entry under the row threshold — the streaming-sink
        drip), `materialize_deletes` (>= N live merge-on-read predicates:
        reads pay N filters until a rewrite), and counts for context.
        Feed this to a scheduler (`pipeline/scheduler.py`) and the table
        maintains itself the way OPTIMIZE jobs do on Delta."""
        m = self.manifest()
        small = [
            rel
            for rel in m.files
            if m.stats.get(rel, {}).get("rows", -1) < small_entry_max_rows
        ]
        return {
            "version": m.version,
            "n_entries": len(m.files),
            "n_small_entries": len(small),
            "n_live_delete_predicates": len(m.delete_predicates),
            "compact_small_entries": len(small) > 1,
            "materialize_deletes": (
                len(m.delete_predicates) >= max_live_delete_predicates
            ),
        }

    def run_maintenance(
        self,
        small_entry_max_rows: int = 100_000,
        max_live_delete_predicates: int = 3,
        num_partitions: int = 1,
        zorder_by: list[str] | None = None,
        vacuum: bool = True,
    ) -> dict:
        """Execute the :meth:`maintenance_plan`: a FULL compact when
        deferred deletes are due for materialization (the rewrite retires
        every predicate), else an INCREMENTAL small-entry compact when the
        drip warrants one, then optionally vacuum. Idempotent: a table
        with nothing due commits nothing. Returns the plan plus what
        ran."""
        plan = self.maintenance_plan(
            small_entry_max_rows, max_live_delete_predicates
        )
        executed: list[str] = []
        if plan["materialize_deletes"]:
            self.compact(
                num_partitions=num_partitions, zorder_by=zorder_by
            )
            executed.append("compact_full")
        elif plan["compact_small_entries"]:
            before = self.latest_version()
            if (
                self.compact(
                    num_partitions=num_partitions,
                    zorder_by=zorder_by,
                    small_entry_max_rows=small_entry_max_rows,
                )
                != before
            ):
                executed.append("compact_small_entries")
        if vacuum:
            removed = self.vacuum()
            if removed:
                executed.append(f"vacuum:{len(removed)}")
        return {**plan, "executed": executed}

    def expire_versions(self, keep_last: int) -> list[int]:
        """Drop the oldest manifests, keeping `keep_last` most recent.
        Data files they referenced become vacuum-eligible unless a surviving
        version still references them. A TAGGED version refuses to
        expire (the tag is a retention pin — Iceberg semantics); drop
        the tag first."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.versions()
        expired = versions[:-keep_last]
        if not expired:
            return []
        if self.branch_name is None:
            doomed = {m.version for m in expired}
            pinned = {
                name: v
                for name, v in _tag_versions(self.root).items()
                if v in doomed
            }
            if pinned:
                raise ValueError(
                    f"expire_versions(keep_last={keep_last}) would drop "
                    f"tagged version(s) {pinned} — drop_tag first, or "
                    "keep more versions"
                )
        # The oldest RETAINED version must stand alone once its
        # ancestors are gone: if it is stored as a delta, rewrite it in
        # place as a full checkpoint first (same logical content, so
        # snapshot immutability holds for readers).
        self._materialize_checkpoint(versions[-keep_last])
        for m in expired:
            os.remove(
                os.path.join(self._mdir, _manifest_name(m.version))
            )
            self._mcache.pop(m.version, None)
        return [m.version for m in expired]

    def _materialize_checkpoint(self, m: Manifest) -> None:
        """Rewrite version `m.version`'s file as a FULL snapshot iff it
        is currently delta-encoded (no-op otherwise)."""
        mdir = self._mdir
        path = os.path.join(mdir, _manifest_name(m.version))
        with open(path) as f:
            d = _parse_version_file(f.read())
        if "delta_of" not in d or "files" in d:
            return  # already a checkpoint (inline or sharded)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(_checkpoint_text(m, mdir))
        os.replace(tmp, path)
        self._mcache.pop(m.version, None)

    def vacuum(self, claim_timeout_s: float | None = 3600.0) -> list[str]:
        """Delete data dirs (and materialized change dirs) referenced by NO
        surviving manifest — orphans from crashed writers and data expired
        via expire_versions.

        Also reclaims ORPHANED VERSION CLAIMS: a writer that hard-crashed
        between claiming a version (conditional-PUT create) and publishing
        its manifest content leaves a torn manifest file that conflicts
        every later writer out of that version number. Torn manifests older
        than `claim_timeout_s` (measured by file mtime, so an in-flight
        writer's sub-second window is never touched at the default 1 h) are
        deleted, un-burning the version — the next commit claims it
        normally. Pass None to disable reclamation.

        Vacuum reasons about the WHOLE table — every branch's manifests
        count as references (a branch commit's data must survive until
        the branch is dropped or expired), and dropped-branch data dirs
        become ordinary orphans. Run it from the main handle; a branch
        handle refuses (its view of "referenced" is partial by design)."""
        import shutil
        import time

        if self.branch_name is not None:
            raise ValueError(
                "vacuum from the MAIN table handle (a branch handle sees "
                "only its own manifests and would reclaim live files)"
            )
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        branch_dirs = [
            os.path.join(mdir, _BRANCHES_SUBDIR, b)
            for b in _branch_names(self.root)
        ]
        reclaimed: list[str] = []
        if claim_timeout_s is not None:
            now = time.time()
            for d in [mdir, *branch_dirs]:
                for name in sorted(os.listdir(d)):
                    if not (name.startswith("v") and name.endswith(".json")):
                        continue
                    path = os.path.join(d, name)
                    try:
                        with open(path) as f:
                            _parse_version_file(f.read())
                        continue  # parseable: a real committed version
                    except (json.JSONDecodeError, KeyError, OSError):
                        pass
                    try:
                        if now - os.path.getmtime(path) >= claim_timeout_s:
                            os.remove(path)
                            reclaimed.append(
                                os.path.relpath(path, self.root)
                            )
                    except OSError:
                        continue  # raced with the claiming writer; leave it
            # Orphaned DataSource-writer staging dirs (job hard-crashed
            # between tasks staging and commit/abort) are invisible to
            # readers — nothing references them — but hold disk; reclaim
            # past the same timeout.
            sdir = os.path.join(self.root, "_staging")
            if os.path.isdir(sdir):
                for name in sorted(os.listdir(sdir)):
                    p = os.path.join(sdir, name)
                    try:
                        if now - os.path.getmtime(p) >= claim_timeout_s:
                            shutil.rmtree(p)
                            reclaimed.append(
                                os.path.join("_staging", name)
                            )
                    except OSError:
                        continue

        manifests = self.versions()
        for d in branch_dirs:
            manifests.extend(load_all_manifests(d))
        # An entry may be a whole data dir, a partition LEAF inside one, or
        # a single carried-forward file — referencing ANY of them keeps the
        # top-level uuid dir alive (vacuum granularity is the uuid dir; a
        # partially-dead dir is reclaimed after the next compact rewrites
        # its survivors into a fresh dir).
        referenced = set()
        for m in manifests:
            for rel in m.files:
                parts = rel.replace(os.sep, "/").split("/")
                referenced.add("/".join(parts[:2]))
        referenced |= {
            m.summary["cdf"].replace(os.sep, "/")
            for m in manifests
            if m.summary.get("cdf")
        }
        # Live position/equality-delete files: referenced from ANY
        # surviving manifest's delete_predicates (a retired file becomes
        # unreferenced once every manifest carrying it expires).
        referenced |= {
            p[kind].replace(os.sep, "/")
            for m in manifests
            for p in m.delete_predicates
            for kind in ("pos", "eq")
            if kind in p
        }
        removed = []
        for sub in (_DATA_DIR, _CDF_DIR, _DELETES_DIR):
            sub_root = os.path.join(self.root, sub)
            if not os.path.isdir(sub_root):
                continue
            for name in sorted(os.listdir(sub_root)):
                rel = f"{sub}/{name}"
                if rel not in referenced:
                    shutil.rmtree(os.path.join(sub_root, name))
                    removed.append(os.path.join(sub, name))
        # Checkpoint CHUNKS referenced by no surviving manifest file
        # (expired checkpoints, crashed writers' write-ahead slices).
        # Raw-dict scan: chunk references live in checkpoint skeletons
        # only. The same mtime guard protects a writer that has staged
        # chunks but not yet claimed its version; with reclamation
        # disabled (claim_timeout_s=None) chunks are left alone too.
        cdir = os.path.join(mdir, _CHUNKS_SUBDIR)
        if claim_timeout_s is not None and os.path.isdir(cdir):
            live_chunks: set[str] = set()
            for d in [mdir, *branch_dirs]:
                for name in sorted(os.listdir(d)):
                    if not (
                        name.startswith("v") and name.endswith(".json")
                    ):
                        continue
                    try:
                        with open(os.path.join(d, name)) as f:
                            vd = _parse_version_file(f.read())
                        live_chunks.update(vd.get("chunks", ()))
                        live_chunks.update(
                            spec["entries_chunk"]
                            for spec in vd.get(
                                "column_defaults", {}
                            ).values()
                            if "entries_chunk" in spec
                        )
                    except (OSError, ValueError, KeyError):
                        continue
            now = time.time()
            for name in sorted(os.listdir(cdir)):
                p = os.path.join(cdir, name)
                if name in live_chunks:
                    continue
                try:
                    if now - os.path.getmtime(p) >= claim_timeout_s:
                        os.remove(p)
                        removed.append(
                            os.path.join(
                                _MANIFEST_DIR, _CHUNKS_SUBDIR, name
                            )
                        )
                except OSError:
                    continue  # raced with a staging writer; leave it
        return reclaimed + removed

    # -- internals ---------------------------------------------------------
    def _write_cdf(self, df: DataFrame) -> str:
        """Write a commit's change rows (data columns + `_change_type`)
        under `changes/`; same atomicity story as data dirs (invisible
        until the manifest referencing them commits). Change files use
        PHYSICAL column names like data files, so one translation point
        (`changes()`) serves files from before and after any rename."""
        try:
            fwd = _log_to_phys(self.manifest().column_mapping)
        except NoSuchVersionError:
            fwd = {}
        df = _rename_columns(df, fwd)
        rel = os.path.join(_CDF_DIR, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(os.path.join(self.root, rel))
        return rel

    def _write_cdf_and_data(
        self,
        cdf_df: DataFrame | None,
        data_df: DataFrame,
        partition_by: tuple[str, ...],
        bloom_columns: tuple[str, ...] | None = None,
        optimize_write: bool | None = None,
    ) -> tuple[str | None, dict[str, dict]]:
        """Run a commit's change-feed write and data write as TWO
        CONCURRENT Spark jobs instead of back-to-back actions.

        The two writes are independent (both consume the already-
        materialized update set plus a read-only scan of the parent
        version's files; neither result feeds the other — only the
        manifest commit, which happens after both), so the only thing
        sequential execution buys is idle cores while each job's tail
        finishes. Submitting the CDF write from a second driver thread
        lets the scheduler back-fill — wall-clock becomes
        max(cdf, data) instead of cdf + data, and every COW commit on
        the DML/merge/refresh path pays that twice per statement.
        Failure semantics are unchanged: either exception propagates
        before the manifest commit, and orphaned files from the other
        write stay invisible (same atomicity story as any failed
        write). Returns (cdf rel or None, data entries)."""
        if cdf_df is None:
            return None, self._write_data_entries(
                data_df, partition_by, bloom_columns, optimize_write
            )
        # DLIS_COW_OVERLAP_CDF=0 runs the two writes sequentially (the
        # pre-r14 shape) for A/B measurement: overlap wins when both
        # jobs have enough tasks to back-fill each other's tails; on a
        # latency-bound local commit the second driver thread can be
        # pure overhead.
        if os.environ.get("DLIS_COW_OVERLAP_CDF", "1") == "0":
            conf_key = "spark.sql.parquet.outputTimestampType"
            prev = self.spark.conf.get(conf_key)
            self.spark.conf.set(conf_key, "TIMESTAMP_MICROS")
            try:
                rel = self._write_cdf(cdf_df)
                entries = self._write_data_entries(
                    data_df, partition_by, bloom_columns, optimize_write
                )
            finally:
                self.spark.conf.set(conf_key, prev)
            return rel, entries
        from concurrent.futures import ThreadPoolExecutor

        # Pin the parquet timestamp type around BOTH writes: the session
        # conf is shared across driver threads, and _write_data_entries'
        # own set/restore would otherwise race the concurrent CDF write
        # into a nondeterministic encoding. With the outer pin, the
        # inner set/restore reads and restores the same value — and CDF
        # files gain the footer-prunable MICROS encoding data files
        # already use.
        conf_key = "spark.sql.parquet.outputTimestampType"
        prev = self.spark.conf.get(conf_key)
        self.spark.conf.set(conf_key, "TIMESTAMP_MICROS")
        try:
            with ThreadPoolExecutor(max_workers=1) as ex:
                cdf_fut = ex.submit(self._write_cdf, cdf_df)
                entries = self._write_data_entries(
                    data_df, partition_by, bloom_columns, optimize_write
                )
                rel = cdf_fut.result()
        finally:
            self.spark.conf.set(conf_key, prev)
        return rel, entries

    def _write_data_entries(
        self,
        df: DataFrame,
        partition_by: tuple[str, ...],
        bloom_columns: tuple[str, ...] | None = None,
        optimize_write: bool | None = None,
    ) -> dict[str, dict]:
        """Write one commit's data; return {manifest entry rel: stats}.

        Unpartitioned: one uuid data dir, one entry (the historic layout).
        Partitioned: `df.write.partitionBy(...)` lays out hive-style
        `col=value/` leaves under the uuid dir, and EACH LEAF becomes an
        entry with its parsed partition values in stats["part_values"] —
        the source of dir-name pruning and partition-aligned merge scope.

        With bloom columns, one DISTRIBUTED aggregate over the commit's
        rows produces the bloom bitmap(s). Unpartitioned: the driver
        receives distinct bit POSITIONS (<= m of them), never values.
        Partitioned: blooms are PER LEAF — positions group by the leaf
        key and fold into each leaf's bitmap executor-side
        (applyInPandas), so the driver receives one ~32 KiB compressed
        bitmap per (leaf, column) and a point lookup on a non-partition
        column prunes sibling leaves individually; a leaf whose dir-name
        key can't be matched back falls back to the OR-union of all leaf
        blooms (selectivity cost only, never correctness).

        Spark still defaults timestamps to INT96, which carries NO footer
        min/max — write TIMESTAMP_MICROS so timestamp columns are
        prunable."""
        try:
            latest = self.manifest()
        except NoSuchVersionError:
            latest = None
        if bloom_columns is None:
            bloom_columns = latest.bloom_columns if latest else ()
        # Data files carry PHYSICAL names: translate the (logical) frame,
        # partition spec, and bloom columns before writing, so renames
        # never require rewrites and rewritten files stay join-compatible
        # with old ones.
        fwd = _log_to_phys(latest.column_mapping) if latest else {}
        df = _rename_columns(df, fwd)
        bloom_columns = tuple(fwd.get(c, c) for c in bloom_columns)
        # Partition spec: translate each entry's SOURCE column to its
        # physical name; identity entries partition by the column itself
        # (dropped from files, recovered from dir names), transform
        # entries compute an alias dir column and KEEP the source column
        # in the files (hidden partitioning — no recovery needed, footer
        # stats still prune).
        src_types = {
            f.name: f.dataType.simpleString() for f in df.schema.fields
        }
        # Spec snapshot: every partitioned entry records the LOGICAL spec
        # that governed its write, so reads can derive transform-alias
        # predicates per entry (exact across partition evolution) and
        # bucket_join can verify an entry's bucket modulus directly.
        logical_spec = list(partition_by)
        dir_cols: list[str] = []
        for entry in partition_by:
            fn, param, col = _parse_spec_entry(entry)
            pcol = fwd.get(col, col)
            if fn == "identity":
                dir_cols.append(pcol)
            else:
                alias = _transform_alias(fn, pcol)
                df = df.withColumn(
                    alias,
                    _transform_expr(
                        fn, param, pcol, src_types.get(pcol, "")
                    ),
                )
                dir_cols.append(alias)
        partition_by = tuple(dir_cols)
        if optimize_write is None:
            optimize_write = latest.optimize_write if latest else False
        if optimize_write and dir_cols:
            # Optimized write (Delta optimizeWrite shape): cluster the
            # commit's rows by their leaf key so each leaf receives a
            # BOUNDED number of files instead of one per shuffle task —
            # a 32-task write into N leaves otherwise fragments into
            # 32×N small files, and every pruned read pays the opens.
            # Pure one-file-per-leaf over-consolidates the other way: a
            # pruned probe of k leaves then reads with only k-way
            # parallelism (sub-128MB files don't split), so a small
            # SALT keeps each leaf at ≤ salt_n files — pruned reads
            # keep multi-way parallelism, fragmentation stays bounded.
            # One extra shuffle, ∝ the commit (for the index state
            # tables that opt in, that is the delta, never the table).
            n_shuf = int(
                self.spark.conf.get("spark.sql.shuffle.partitions")
            )
            salt_n = max(1, min(8, n_shuf // 8))
            hashable = [
                F.col(f.name)
                for f in df.schema.fields
                if not _type_contains_map(f.dataType)
            ] or [F.lit(0)]
            salt = F.pmod(F.hash(*hashable), F.lit(salt_n))
            df = df.repartition(*[F.col(c) for c in dir_cols], salt)
        elif optimize_write and os.environ.get(
            "DLIS_OPTIMIZE_WRITE", "1"
        ) != "0":
            # Unpartitioned optimized write (r14 — the view family's
            # state tables opt in): size the write to the DATA, not the
            # task count, so a refresh commit never fans a tiny delta
            # out to one file per shuffle task (32 tiny files per
            # commit = pure open-cost for every maintained-view read).
            # Scale-gated mechanism (optimization r15, cold-protocol
            # A/B over 6 rotated fresh-JVM rounds): the AQE REBALANCE
            # hint is one extra exchange of the full merged output per
            # commit — data-proportional and worth it at scale, but on
            # the latency-bound small-table commits that dominate the
            # MV statement loop it measured ~40% of q183's wall
            # (12.1 s median with vs 7.5 s without, both mechanisms
            # tried; a shuffle-free coalesce(1) was no better — it
            # collapses the whole final stage to one task). So:
            # - CREATE (no parent manifest): keep the rebalance — a
            #   bootstrap's size is unknown and its plan may end
            #   WITHOUT an exchange (broadcast joins), fanning out to
            #   input partitioning; one rebalance per table lifetime
            #   is the cheap side of the trade (the A/B's bootstrap
            #   metric showed no arm difference);
            # - commits onto a parent whose manifest proves ≤
            #   DLIS_OPTIMIZE_WRITE_MIN_ROWS total rows (default 2M):
            #   skip — a small table's per-version file count is
            #   bounded by its scoped COW rewrites, never accumulates,
            #   and the open cost is measurably cheaper than the
            #   per-commit exchange;
            # - everything bigger or of unknown size: REBALANCE —
            #   Delta's optimizeWrite bin-packing as the built-in AQE
            #   rebalance stage, full write parallelism.
            # DLIS_OPTIMIZE_WRITE=0 disables outright (A/B hook).
            min_rows = int(
                os.environ.get("DLIS_OPTIMIZE_WRITE_MIN_ROWS", "2000000")
            )
            if latest is not None and all(
                "rows" in latest.stats.get(rel, {})
                for rel in latest.files
            ):
                parent_rows = sum(
                    latest.stats[rel]["rows"] for rel in latest.files
                )
            else:
                parent_rows = None  # unknown size
            if parent_rows is None or parent_rows > min_rows:
                df = df.hint("rebalance")
        conf_key = "spark.sql.parquet.outputTimestampType"
        prev = self.spark.conf.get(conf_key)
        self.spark.conf.set(conf_key, "TIMESTAMP_MICROS")
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        abs_dir = os.path.join(self.root, rel)
        try:
            writer = df.write.mode("errorifexists")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(abs_dir)
        finally:
            self.spark.conf.set(conf_key, prev)
        if not partition_by:
            blooms = self._compute_blooms(df, bloom_columns)
            st = _collect_dir_stats(abs_dir)
            if blooms:
                st["bloom"] = blooms
            return {rel: st}
        leaf_blooms = self._compute_leaf_blooms(
            df, bloom_columns, partition_by
        )
        union = (
            {
                c: _union_blooms(
                    [lb[c] for lb in leaf_blooms.values() if c in lb]
                )
                for c in {c for lb in leaf_blooms.values() for c in lb}
            }
            if leaf_blooms
            else {}
        )
        entries: dict[str, dict] = {}
        for dirpath, _dirs, files in sorted(os.walk(abs_dir)):
            if not any(f.endswith(".parquet") for f in files):
                continue
            sub = os.path.relpath(dirpath, abs_dir)
            st = _collect_dir_stats(dirpath)
            st["part_values"] = _parse_part_path(sub)
            st["spec"] = logical_spec
            if leaf_blooms:
                key = tuple(
                    st["part_values"].get(pc) for pc in partition_by
                )
                st["bloom"] = leaf_blooms.get(key, union)
            entries[os.path.join(rel, sub)] = st
        return entries

    def _compute_blooms(
        self, df: DataFrame, bloom_columns: tuple[str, ...]
    ) -> dict:
        """{col: {"m", "k", "b64"}} for this commit's rows, one Spark job
        for all columns (explode each column's k position expressions,
        distinct them per column tag, collect bounded bit positions)."""
        cols = [c for c in bloom_columns if c in df.columns]
        if not cols:
            return {}
        pieces = None
        for ci, c in enumerate(cols):
            p = df.select(
                F.lit(ci).alias("_bc"),
                F.explode(F.array(*_bloom_position_cols(c))).alias("_pos"),
            ).filter(F.col("_pos").isNotNull())
            pieces = p if pieces is None else pieces.unionAll(p)
        rows = pieces.distinct().collect()
        by_col: dict[int, list[int]] = {}
        for r in rows:
            by_col.setdefault(r._bc, []).append(r._pos)
        return {
            c: {
                "m": _BLOOM_M,
                "k": _BLOOM_K,
                "b64": _bloom_from_positions(by_col.get(ci, [])),
            }
            for ci, c in enumerate(cols)
        }

    def _compute_leaf_blooms(
        self,
        df: DataFrame,
        bloom_columns: tuple[str, ...],
        partition_by: tuple[str, ...],
    ) -> dict[tuple, dict[str, dict]]:
        """{leaf key: {col: {"m","k","b64"}}} — PER-LEAF blooms for a
        partitioned commit, so a point lookup on a non-partition column
        prunes sibling leaves individually instead of sharing one
        commit-wide filter.

        The leaf key is the partition columns cast to string — the same
        strings Spark writes into the `col=value/` dir names (NULL maps
        to the hive sentinel, parsed back to None), which is how
        `_write_data_entries` matches a bitmap to its leaf entry.
        Distinct (leaf, column, position) rows group by leaf and fold
        into 32 KiB bitmaps EXECUTOR-side (applyInPandas, Arrow-batched —
        a genuine custom aggregate no builtin expresses), so the driver
        collects one small compressed string per (leaf, column), never
        position lists: collect volume ∝ leaves, not leaves × m."""
        cols = [c for c in bloom_columns if c in df.columns]
        if not cols:
            return {}
        import pandas as pd

        keys = [f"_pk{i}" for i in range(len(partition_by))]
        key_exprs = [
            F.col(pc).cast("string").alias(k)
            for pc, k in zip(partition_by, keys)
        ]
        pieces = None
        for ci, c in enumerate(cols):
            p = df.select(
                *key_exprs,
                F.lit(ci).alias("_bc"),
                F.explode(F.array(*_bloom_position_cols(c))).alias("_pos"),
            ).filter(F.col("_pos").isNotNull())
            pieces = p if pieces is None else pieces.unionAll(p)

        def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
            out = {k: [pdf[k].iloc[0]] for k in keys}
            out["_bc"] = [int(pdf["_bc"].iloc[0])]
            out["_b64"] = [_bloom_from_positions(pdf["_pos"].tolist())]
            return pd.DataFrame(out)

        schema = ", ".join(
            [f"{k} string" for k in keys] + ["_bc int", "_b64 string"]
        )
        rows = (
            pieces.distinct()
            .groupBy(*keys, "_bc")
            .applyInPandas(fold, schema)
            .collect()
        )
        out: dict[tuple, dict[str, dict]] = {}
        for r in rows:
            key = tuple(r[k] for k in keys)
            out.setdefault(key, {})[cols[r._bc]] = {
                "m": _BLOOM_M,
                "k": _BLOOM_K,
                "b64": r._b64,
            }
        return out

    def _commit(
        self,
        operation: str,
        files: tuple[str, ...],
        schema_ddl: str,
        expected_parent: int,
        summary: dict | None = None,
        stats: dict | None = None,
        partition_by: tuple[str, ...] | None = None,
        constraints: dict | None = None,
        bloom_columns: tuple[str, ...] | None = None,
        delete_predicates: tuple | None = None,
        column_mapping: dict | None = None,
        past_specs: tuple | None = None,
        column_defaults: dict | None = None,
        write_defaults: dict | None = None,
        optimize_write: bool | None = None,
    ) -> int:
        """Atomically claim version expected_parent+1 via the table's
        commit protocol (hard-link on POSIX, conditional PUT on object
        stores): publishing the manifest name fails iff the version
        already exists, so exactly one racing writer wins — no locks, no
        read-modify-write window."""
        version = expected_parent + 1
        if (
            partition_by is None
            or constraints is None
            or bloom_columns is None
            or delete_predicates is None
        ):
            # Partition spec and bloom columns are fixed at create(),
            # constraints evolve only through add/drop commits; all carry
            # forward otherwise.
            pm = self.manifest(expected_parent) if expected_parent else None
            if partition_by is None:
                partition_by = pm.partition_by if pm else ()
            if constraints is None:
                constraints = dict(pm.constraints) if pm else {}
            if bloom_columns is None:
                bloom_columns = pm.bloom_columns if pm else ()
            if delete_predicates is None:
                delete_predicates = pm.delete_predicates if pm else ()
        if (
            column_mapping is None
            or past_specs is None
            or column_defaults is None
            or write_defaults is None
        ):
            pm2 = self.manifest(expected_parent) if expected_parent else None
            if column_mapping is None:
                column_mapping = dict(pm2.column_mapping) if pm2 else {}
            if past_specs is None:
                past_specs = pm2.past_specs if pm2 else ()
            if column_defaults is None:
                column_defaults = dict(pm2.column_defaults) if pm2 else {}
            if write_defaults is None:
                write_defaults = dict(pm2.write_defaults) if pm2 else {}
        if optimize_write is None:
            pm3 = self.manifest(expected_parent) if expected_parent else None
            optimize_write = pm3.optimize_write if pm3 else False
        # Retire predicates that no longer touch any surviving entry
        # (every entry they scoped was rewritten — the rewrite read
        # through the filter, materializing the deletion).
        norm_files = [f.replace(os.sep, "/") for f in files]
        delete_predicates = tuple(
            p
            for p in delete_predicates
            if any(
                f == pr or f.startswith(pr.rstrip("/") + "/")
                for pr in (e.replace(os.sep, "/") for e in p["entries"])
                for f in norm_files
            )
        )
        m = Manifest(
            version=version,
            operation=operation,
            files=files,
            schema_ddl=schema_ddl,
            committed_at=datetime.now(timezone.utc).isoformat(),
            summary={"n_files": len(files), **(summary or {})},
            stats=stats or {},
            partition_by=partition_by,
            constraints=constraints,
            bloom_columns=bloom_columns,
            delete_predicates=delete_predicates,
            column_mapping=column_mapping,
            past_specs=past_specs,
            column_defaults=column_defaults,
            write_defaults=write_defaults,
            optimize_write=optimize_write,
        )
        final = os.path.join(self._mdir, _manifest_name(version))
        # Delta-encode vs the parent (commit metadata ∝ the CHANGE, not
        # O(live files)); every _CHECKPOINT_INTERVAL-th version — and
        # any commit a delta can't represent byte-exactly — is a full
        # checkpoint, bounding read-side reconstruction to a short tail.
        text = None
        if expected_parent and version % _CHECKPOINT_INTERVAL != 0:
            try:
                text = m.to_delta_json(self.manifest(expected_parent))
            except NoSuchVersionError:
                text = None
        if text is None:
            # Full checkpoint: sharded manifest-list form above the
            # size threshold (chunks written BEFORE the version claim —
            # a crash leaves only vacuum-able orphan chunks).
            text = _checkpoint_text(m, self._mdir)
        self._protocol.publish(final, text)
        return version
