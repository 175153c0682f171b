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
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentCommitError(Exception):
    """Another writer committed the version this writer was about to claim."""


class NoSuchVersionError(Exception):
    pass


_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


@dataclass(frozen=True)
class Manifest:
    version: int
    operation: str
    files: tuple[str, ...]  # data dirs relative to table root, read order
    schema_ddl: str
    committed_at: str
    summary: dict

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "operation": self.operation,
                "files": list(self.files),
                "schema_ddl": self.schema_ddl,
                "committed_at": self.committed_at,
                "summary": self.summary,
            },
            indent=2,
            sort_keys=True,
        )

    @staticmethod
    def from_json(text: str) -> "Manifest":
        d = json.loads(text)
        return Manifest(
            version=d["version"],
            operation=d["operation"],
            files=tuple(d["files"]),
            schema_ddl=d["schema_ddl"],
            committed_at=d["committed_at"],
            summary=d.get("summary", {}),
        )


def _manifest_name(version: int) -> str:
    return f"v{version:08d}.json"


class VersionedTable:
    """A versioned parquet table rooted at a directory.

    Use :meth:`create` to initialize, then :meth:`append` / :meth:`overwrite`
    / :meth:`merge` / :meth:`delete_where` to evolve it; every operation
    commits a NEW immutable version. :meth:`read` time-travels.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        if not os.path.isdir(os.path.join(root, _MANIFEST_DIR)):
            raise NoSuchVersionError(
                f"{root} is not a versioned table (no {_MANIFEST_DIR}/); "
                "use VersionedTable.create"
            )

    # -- creation ----------------------------------------------------------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        df: DataFrame,
        summary: dict | None = None,
    ) -> "VersionedTable":
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)
        table = VersionedTable(spark, root)
        data_dir = table._write_data(df)
        table._commit(
            operation="create",
            files=(data_dir,),
            schema_ddl=df.schema.simpleString(),
            expected_parent=0,
            summary=summary,
        )
        return table

    # -- metadata ----------------------------------------------------------
    def versions(self) -> list[Manifest]:
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        out = []
        for name in sorted(os.listdir(mdir)):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    out.append(Manifest.from_json(f.read()))
        return out

    def latest_version(self) -> int:
        versions = self.versions()
        if not versions:
            raise NoSuchVersionError(f"{self.root}: no committed versions")
        return versions[-1].version

    def manifest(self, version: int | None = None) -> Manifest:
        version = self.latest_version() if version is None else version
        path = os.path.join(self.root, _MANIFEST_DIR, _manifest_name(version))
        if not os.path.exists(path):
            raise NoSuchVersionError(f"{self.root}: no version {version}")
        with open(path) as f:
            return Manifest.from_json(f.read())

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
    def read(self, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        paths = [os.path.join(self.root, rel) for rel in m.files]
        return self.spark.read.parquet(*paths)

    # -- writes ------------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        max_retries: int = 3,
        summary: dict | None = None,
    ) -> int:
        """Append-only commit. Appends commute, so a version conflict is
        rebased automatically: re-read the new latest manifest and retry
        (the already-written data dir is reused — no rewrite)."""
        data_dir = self._write_data(df)
        attempt = 0
        while True:
            parent = self.latest_version()
            try:
                return self._commit(
                    operation="append",
                    files=self.manifest(parent).files + (data_dir,),
                    schema_ddl=df.schema.simpleString(),
                    expected_parent=parent,
                    summary=summary,
                )
            except ConcurrentCommitError:
                attempt += 1
                if attempt > max_retries:
                    raise

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents. NOT auto-rebased on conflict — the
        caller's snapshot assumption broke, so the conflict surfaces."""
        parent = self.latest_version()
        data_dir = self._write_data(df)
        return self._commit(
            operation="overwrite",
            files=(data_dir,),
            schema_ddl=df.schema.simpleString(),
            expected_parent=parent,
        )

    def merge(
        self,
        updates: DataFrame,
        key_cols: list[str],
        delete_col: str | None = None,
    ) -> int:
        """MERGE (upsert + optional deletes) as a copy-on-write commit:
        matched keys replaced, `delete_col`=true rows removed, unmatched
        update rows inserted. Snapshot-isolated: reads the latest version,
        commits against exactly that parent (conflict => error, rerun)."""
        parent = self.latest_version()
        target = self.read(parent)

        if delete_col and delete_col in updates.columns:
            deletes = updates.filter(F.col(delete_col) == True)  # noqa: E712
            upserts = updates.filter(
                F.col(delete_col).isNull() | (F.col(delete_col) == False)  # noqa: E712
            ).drop(delete_col)
            delete_keys = deletes.select(*key_cols)
        else:
            upserts = updates
            delete_keys = None

        survivors = target.join(
            upserts.select(*key_cols), key_cols, "left_anti"
        )
        if delete_keys is not None:
            survivors = survivors.join(delete_keys, key_cols, "left_anti")
        merged = survivors.unionByName(upserts)

        data_dir = self._write_data(merged)
        return self._commit(
            operation="merge",
            files=(data_dir,),
            schema_ddl=merged.schema.simpleString(),
            expected_parent=parent,
        )

    def delete_where(self, predicate: Column) -> int:
        """Copy-on-write DELETE: keep rows NOT matching the predicate."""
        parent = self.latest_version()
        kept = self.read(parent).filter(~predicate)
        data_dir = self._write_data(kept)
        return self._commit(
            operation="delete",
            files=(data_dir,),
            schema_ddl=kept.schema.simpleString(),
            expected_parent=parent,
        )

    # -- maintenance -------------------------------------------------------
    def expire_versions(self, keep_last: int) -> list[int]:
        """Drop the oldest manifests, keeping `keep_last` most recent.
        Data files they referenced become vacuum-eligible unless a surviving
        version still references them."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = self.versions()
        expired = versions[:-keep_last]
        for m in expired:
            os.remove(
                os.path.join(self.root, _MANIFEST_DIR, _manifest_name(m.version))
            )
        return [m.version for m in expired]

    def vacuum(self) -> list[str]:
        """Delete data dirs referenced by NO surviving manifest — orphans
        from crashed writers and data expired via expire_versions."""
        import shutil

        referenced = {rel for m in self.versions() for rel in m.files}
        data_root = os.path.join(self.root, _DATA_DIR)
        removed = []
        for name in sorted(os.listdir(data_root)):
            rel = os.path.join(_DATA_DIR, name)
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
        return removed

    # -- internals ---------------------------------------------------------
    def _write_data(self, df: DataFrame) -> str:
        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(os.path.join(self.root, rel))
        return rel

    def _commit(
        self,
        operation: str,
        files: tuple[str, ...],
        schema_ddl: str,
        expected_parent: int,
        summary: dict | None = None,
    ) -> int:
        """Atomically claim version expected_parent+1.

        Write the manifest under a temp name, then os.link it to the final
        name: link(2) fails with EEXIST when the version already exists, so
        exactly one of any number of racing writers wins — no locks, no
        read-modify-write window."""
        version = expected_parent + 1
        m = Manifest(
            version=version,
            operation=operation,
            files=files,
            schema_ddl=schema_ddl,
            committed_at=datetime.now(timezone.utc).isoformat(),
            summary={"n_files": len(files), **(summary or {})},
        )
        mdir = os.path.join(self.root, _MANIFEST_DIR)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(mdir, _manifest_name(version))
        with open(tmp, "w") as f:
            f.write(m.to_json())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} was committed concurrently"
            ) from None
        finally:
            os.remove(tmp)
        return version
