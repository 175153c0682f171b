"""Catalog-level atomic multi-table transactions (the Nessie catalog
shape): a `TableCatalog` owns a set of versioned tables and keeps
its OWN commit log, where every catalog version is one tiny JSON pin map
`{table name -> (root, table version)}` published through the same
atomic commit protocol the tables use.

Why this exists: single-table commits are already atomic, but a
pipeline that moves rows BETWEEN tables (ledger debit/credit, fact +
summary, delete-from-staging/append-to-curated) has no cross-table
atomicity — a reader can see table A after the move and table B before
it. The catalog closes that hole the way Nessie does: table commits
happen first (they are invisible to catalog readers — just unpinned
tail versions), then ONE catalog commit swaps every pin atomically.
A reader that resolves versions through the catalog can never observe
a partial transaction, no matter where a writer crashes:

- crash BEFORE any table commit: nothing anywhere;
- crash between table commits: orphan table versions exist but no
  catalog pin references them — catalog readers still see the old
  consistent snapshot (the orphans are time-travelable on the tables
  and reclaimable via `restore`/`expire_versions`);
- crash after the catalog commit: the transaction is fully visible.

Concurrency: catalog committers race on the catalog version claim —
exactly one wins; the loser raises `CatalogConflictError` (its table
commits stand as unpinned versions; re-running the transaction rebases
on the new catalog head). Writes that go straight to a table without
the catalog are absorbed into the next transaction's pin — the catalog
serializes CATALOG commits, it does not lock tables (same posture as
Nessie: the catalog is the source of truth for whoever reads through
it).

Cross-table TIME TRAVEL falls out: `read(name, catalog_version=k)`
reads every table as of one catalog commit — a consistent snapshot of
the whole lake, not per-table guesses.

100 TB posture: a catalog commit is O(#tables) bytes of JSON — never
table metadata, never data; reads add one small pin-map load.

Scale note — catalog metadata: pin maps are full snapshots per commit
(not delta-encoded like table manifests) because they are O(#tables),
not O(files); a thousand-table catalog is ~100 KB per commit.

Catalog BRANCH pins are branch coordinates: a staged transaction on a
lake branch keeps its work on per-transaction TABLE branches and pins
`(root, version, branch, base)` — no table main ever moves until the
catalog branch publishes, so lake-branch work can never leak into
catalog-main reads through a later plain transaction's absorb pin, and
two lake branches staging on the same table stay isolated. Catalog
`publish_branch` squashes each staged table branch onto its table main
at the recorded fork point (`base`) and swaps the main pin map once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from datalakeingestionservice_spark.sinks.versioned import (
    CommitProtocol,
    ConcurrentCommitError,
    HardLinkCommitProtocol,
    NoSuchBranchError,
    NoSuchVersionError,
    VersionedTable,
    _manifest_name,
)

_CATALOG_DIR = "_catalog_commits"
_BRANCHES_SUBDIR = "branches"
_TAGS_SUBDIR = "tags"


class CatalogConflictError(Exception):
    """Another transaction committed first; re-run to rebase."""


class NoSuchTableError(Exception):
    pass


def _run_with_views(
    spark: SparkSession, dfs: dict[str, DataFrame], statement: str
) -> DataFrame:
    """Materialize each DataFrame as a temp view named exactly its
    table name (so the statement reads naturally), run the statement,
    then put the session namespace back: a name that shadowed a
    PRE-EXISTING user temp view is restored to that view, everything
    else is dropped — caller session state is never destroyed (the
    uuid-view alternative would force a statement rewrite; restoring
    is equivalent and keeps `cat.sql` a plain passthrough)."""
    prior: dict[str, DataFrame] = {}
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name in dfs:
            prior[t.name] = spark.table(t.name)
    created = []
    try:
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
            created.append(name)
        return spark.sql(statement)
    finally:
        for name in created:
            if name in prior:
                prior[name].createOrReplaceTempView(name)
            else:
                spark.catalog.dropTempView(name)


class TableCatalog:
    """A named set of versioned tables with atomic multi-table commits.

    ::

        cat = TableCatalog.create(spark, "/lake/cat",
                                  {"orders": "/lake/orders",
                                   "summary": "/lake/summary"})
        with cat.transaction() as txn:
            txn["orders"].delete_where([("k", "=", 42)])
            txn["summary"].append(delta_df)
        # exactly here both changes became visible to catalog readers,
        # in one atomic catalog commit — or neither did.

    `read(name)` resolves the table version through the catalog pin;
    `read(name, catalog_version=k)` time-travels the WHOLE catalog.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        commit_protocol: CommitProtocol | None = None,
        branch: str | None = None,
    ):
        self.spark = spark
        self.root = root
        self._protocol = commit_protocol or HardLinkCommitProtocol()
        self._cdir = os.path.join(root, _CATALOG_DIR)
        if not os.path.isdir(self._cdir):
            raise NoSuchVersionError(
                f"{root} is not a table catalog (no {_CATALOG_DIR}/); "
                "use TableCatalog.create"
            )
        #: Catalog-level named ref (the Nessie headline: branch the
        #: WHOLE lake). A branch handle commits pin maps to its own
        #: chain under `_catalog_commits/branches/<name>/`; every read,
        #: transaction, and staged transaction works on it unchanged,
        #: and catalog-main readers never see branch pins.
        self.branch_name = branch
        if branch is not None:
            self._cdir = os.path.join(
                self._cdir, _BRANCHES_SUBDIR, branch
            )
            if not os.path.isdir(self._cdir):
                raise NoSuchVersionError(
                    f"{root}: no catalog branch {branch!r} "
                    f"(existing: {self._branch_names(root)})"
                )

    # -- creation ------------------------------------------------------------
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        tables: dict[str, str | VersionedTable],
        commit_protocol: CommitProtocol | None = None,
    ) -> "TableCatalog":
        """Pin every table at its CURRENT head as catalog version 1."""
        os.makedirs(os.path.join(root, _CATALOG_DIR), exist_ok=True)
        cat = TableCatalog(spark, root, commit_protocol=commit_protocol)
        try:
            cat.latest_version()
        except NoSuchVersionError:
            pass
        else:
            raise ValueError(
                f"{root} is already a table catalog; open it with "
                "TableCatalog(spark, root)"
            )
        pins = {}
        for name, t in tables.items():
            tab = (
                t
                if isinstance(t, VersionedTable)
                else VersionedTable(spark, t)
            )
            pins[name] = {
                "root": tab.root,
                "version": tab.latest_version(),
            }
        try:
            cat._publish(1, pins, operation="create")
        except ConcurrentCommitError:
            # Two racing creates can both pass the emptiness probe
            # above; the v1 claim decides. The loser's table-set
            # argument is ignored in favor of the winner's — surface
            # that clearly instead of a raw protocol error.
            raise ValueError(
                f"{root}: catalog was created concurrently by another "
                "writer (this call's table set was NOT registered); "
                "open it with TableCatalog(spark, root)"
            ) from None
        return cat

    # -- commit log ------------------------------------------------------------
    def _publish(self, version: int, pins: dict, operation: str) -> int:
        from datetime import datetime, timezone

        body = json.dumps(
            {
                "catalog_version": version,
                "operation": operation,
                "committed_at": datetime.now(timezone.utc).isoformat(),
                "pins": pins,
            },
            sort_keys=True,
        )
        self._protocol.publish(
            os.path.join(self._cdir, _manifest_name(version)), body
        )
        return version

    def latest_version(self) -> int:
        names = sorted(
            n
            for n in os.listdir(self._cdir)
            if n.startswith("v") and n.endswith(".json")
        )
        for name in reversed(names):
            try:
                with open(os.path.join(self._cdir, name)) as f:
                    return json.load(f)["catalog_version"]
            except (OSError, ValueError, KeyError):
                continue  # torn claim
        raise NoSuchVersionError(f"{self.root}: no catalog commits")

    def manifest(self, version: int | None = None) -> dict:
        version = self.latest_version() if version is None else version
        path = os.path.join(self._cdir, _manifest_name(version))
        try:
            with open(path) as f:
                return json.load(f)
        except OSError:
            raise NoSuchVersionError(
                f"{self.root}: no catalog version {version}"
            )

    def pins(self, version: int | None = None) -> dict[str, dict]:
        return self.manifest(version)["pins"]

    # -- reads ------------------------------------------------------------
    def table(self, name: str) -> VersionedTable:
        """Raw handle (UNPINNED — reads the table head). For consistent
        reads use :meth:`read`; for writes use :meth:`transaction`."""
        pins = self.pins()
        if name not in pins:
            raise NoSuchTableError(
                f"{self.root}: no table {name!r} "
                f"(registered: {sorted(pins)})"
            )
        return VersionedTable(
            self.spark, pins[name]["root"], commit_protocol=self._protocol
        )

    def table_version(
        self, name: str, catalog_version: int | None = None
    ) -> int:
        pins = self.pins(catalog_version)
        if name not in pins:
            raise NoSuchTableError(
                f"{self.root}: no table {name!r} "
                f"(registered: {sorted(pins)})"
            )
        return pins[name]["version"]

    def _pin_table(self, p: dict) -> VersionedTable:
        """Handle for resolving a pin: pins carry `(root, version)` on
        catalog main; on a catalog branch a staged transaction's pin
        additionally carries `branch` (the staged table branch whose
        chain holds `version`) and `base` (the table-main version the
        stage forked from, used by :meth:`publish_branch` as the
        divergence check)."""
        t = VersionedTable(
            self.spark, p["root"], commit_protocol=self._protocol
        )
        if p.get("branch"):
            t = t.branch(p["branch"])
        return t

    def read(
        self, name: str, catalog_version: int | None = None
    ) -> DataFrame:
        """Snapshot read through the catalog pin — with
        `catalog_version`, a cross-table-consistent time travel.
        Branch-coordinate pins (staged work on a catalog branch)
        resolve through the staged table branch's chain — catalog-
        branch readers see the staged world without any table main
        ever having moved."""
        pins = self.pins(catalog_version)
        if name not in pins:
            raise NoSuchTableError(
                f"{self.root}: no table {name!r} "
                f"(registered: {sorted(pins)})"
            )
        p = pins[name]
        return self._pin_table(p).read(p["version"])

    def sql(
        self, statement: str, catalog_version: int | None = None
    ) -> DataFrame:
        """Run a SELECT over the catalog's consistent snapshot: every
        registered table is materialized as a temp view at its PINNED
        version (all from ONE catalog commit), the statement runs
        against them, then the session namespace is restored
        (pre-existing same-named user temp views come back; helper
        views are dropped). Cross-table joins can never straddle a
        transaction."""
        pins = self.pins(catalog_version)
        return _run_with_views(
            self.spark,
            {
                name: self._pin_table(p).read(p["version"])
                for name, p in pins.items()
            },
            statement,
        )

    # -- table-set evolution ---------------------------------------------------
    def add_table(
        self, name: str, table: str | VersionedTable
    ) -> int:
        tab = (
            table
            if isinstance(table, VersionedTable)
            else VersionedTable(self.spark, table)
        )
        base = self.latest_version()
        pins = dict(self.pins(base))
        if name in pins:
            raise ValueError(f"table {name!r} already registered")
        pins[name] = {"root": tab.root, "version": tab.latest_version()}
        return self._try_publish(base, pins, "add_table")

    def remove_table(self, name: str) -> int:
        base = self.latest_version()
        pins = dict(self.pins(base))
        if name not in pins:
            raise NoSuchTableError(f"no table {name!r}")
        del pins[name]
        return self._try_publish(base, pins, "remove_table")

    def _try_publish(self, base: int, pins: dict, op: str) -> int:
        try:
            return self._publish(base + 1, pins, operation=op)
        except ConcurrentCommitError:
            raise CatalogConflictError(
                f"catalog commit v{base + 1} was taken concurrently; "
                "re-run against the new head"
            ) from None

    # -- catalog branches (refs over the WHOLE lake) ---------------------------
    @staticmethod
    def _branch_names(root: str) -> list[str]:
        bdir = os.path.join(root, _CATALOG_DIR, _BRANCHES_SUBDIR)
        if not os.path.isdir(bdir):
            return []
        return sorted(
            n
            for n in os.listdir(bdir)
            if os.path.isdir(os.path.join(bdir, n))
        )

    def create_branch(
        self, name: str, from_version: int | None = None
    ) -> "TableCatalog":
        """Branch the WHOLE catalog (the Nessie model): a separate pin-
        map chain seeded with one catalog commit — O(#tables) bytes.
        Transactions on the branch handle evolve its pins; catalog-main
        readers never see them; :meth:`publish_branch` fast-forwards.
        Table versions pinned only by a catalog branch are plain table
        versions — each table's own retention (`expire_versions`)
        governs how long they stay readable, same as main pins."""
        if self.branch_name is not None:
            raise ValueError("create_branch from the MAIN catalog handle")
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(
                f"branch name {name!r} must match [A-Za-z0-9._-]{{1,64}}"
            )
        m = self.manifest(from_version)
        bdir = os.path.join(self._cdir, _BRANCHES_SUBDIR, name)
        if os.path.isdir(bdir):
            raise ValueError(f"{self.root}: catalog branch {name!r} exists")
        os.makedirs(bdir, exist_ok=True)
        try:
            self._protocol.publish(
                os.path.join(
                    bdir, _manifest_name(m["catalog_version"])
                ),
                json.dumps(m, sort_keys=True),
            )
        except ConcurrentCommitError:
            raise ValueError(
                f"{self.root}: catalog branch {name!r} exists (lost a "
                "create race)"
            ) from None
        return self.branch(name)

    def branch(self, name: str) -> "TableCatalog":
        return TableCatalog(
            self.spark,
            self.root,
            commit_protocol=self._protocol,
            branch=name,
        )

    def list_branches(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        for name in self._branch_names(self.root):
            b = self.branch(name)
            vs = sorted(
                int(n[1:9])
                for n in os.listdir(b._cdir)
                if n.startswith("v") and n.endswith(".json")
            )
            out[name] = {
                "head": b.latest_version(),
                "base": vs[0] if vs else None,
            }
        return out

    def _staged_table_branches(self, bdir: str) -> set[tuple[str, str]]:
        """(table root, staged branch name) pairs referenced by ANY pin
        map in a catalog branch's chain — the table branches its staged
        transactions created, reclaimable once the catalog branch is
        published or dropped."""
        out: set[tuple[str, str]] = set()
        for n in os.listdir(bdir):
            if not (n.startswith("v") and n.endswith(".json")):
                continue
            try:
                with open(os.path.join(bdir, n)) as f:
                    m = json.load(f)
            except (OSError, ValueError):
                continue  # torn claim
            for p in m.get("pins", {}).values():
                if p.get("branch"):
                    out.add((p["root"], p["branch"]))
        return out

    def _drop_staged_table_branches(self, bdir: str) -> None:
        for root, branch in self._staged_table_branches(bdir):
            try:
                VersionedTable(
                    self.spark, root, commit_protocol=self._protocol
                ).drop_branch(branch)
            except (NoSuchBranchError, NoSuchVersionError):
                pass  # already reclaimed

    def drop_branch(self, name: str) -> None:
        """Remove a catalog branch AND the staged table branches its
        transactions created (every (root, branch) coordinate any of
        its pin maps reference) — aborting a lake branch leaves no
        staged refs pinning data against vacuum."""
        import shutil

        if self.branch_name is not None:
            raise ValueError("drop_branch from the MAIN catalog handle")
        bdir = os.path.join(self._cdir, _BRANCHES_SUBDIR, name)
        if not os.path.isdir(bdir):
            raise NoSuchVersionError(
                f"{self.root}: no catalog branch {name!r} "
                f"(existing: {self._branch_names(self.root)})"
            )
        self._drop_staged_table_branches(bdir)
        shutil.rmtree(bdir)

    def publish_branch(self, name: str) -> int:
        """Fast-forward a catalog branch into main as ONE catalog commit
        — atomic via the claim on base+1, so any concurrent main commit
        makes this refuse with :class:`CatalogConflictError` (re-branch
        and replay). The whole staged lake state — every table the
        branch's transactions touched — becomes visible to main readers
        together.

        Branch-coordinate pins (work staged on per-transaction table
        branches, never on any table main) are published here: each
        staged table branch head squashes onto its table's MAIN at the
        recorded fork point (`pin['base']`) — if a direct writer moved
        that table's main past the fork, the table-level claim refuses
        and the whole catalog publish refuses (tables already published
        carry published-but-unpinned main versions; catalog-main
        readers still see nothing new — the pin swap is the source of
        truth, same posture as the staged transaction). The staged
        table branches SURVIVE the publish — the catalog branch's own
        history still resolves through them (cross-table time travel
        on the branch keeps working) — and are reclaimed by
        :meth:`drop_branch`, mirroring table WAP (the branch ref
        survives publish; drop it separately)."""
        if self.branch_name is not None:
            raise ValueError("publish_branch from the MAIN catalog handle")
        b = self.branch(name)
        base = min(
            int(n[1:9])
            for n in os.listdir(b._cdir)
            if n.startswith("v") and n.endswith(".json")
        )
        head = b.manifest()
        if head["catalog_version"] == base:
            raise ValueError(
                f"catalog branch {name!r} has no commits beyond its "
                f"base v{base}; nothing to publish"
            )
        cur = self.latest_version()
        if cur != base:
            raise CatalogConflictError(
                f"cannot fast-forward catalog branch {name!r}: main is "
                f"at v{cur} but the branch forked at v{base} — "
                "re-branch from current main and replay"
            )
        pins = dict(head["pins"])
        published: dict[str, int] = {}
        for tname, p in pins.items():
            if not p.get("branch"):
                continue
            main = VersionedTable(
                self.spark, p["root"], commit_protocol=self._protocol
            )
            try:
                v = main.publish_branch(
                    p["branch"], expected_parent=p["base"]
                )
            except ConcurrentCommitError as e:
                raise CatalogConflictError(
                    f"cannot publish catalog branch {name!r}: table "
                    f"{tname!r} diverged ({e}); tables already "
                    f"published this attempt: {sorted(published)} — "
                    "catalog-main readers never saw them (restore "
                    "those mains or let the next transaction absorb); "
                    "re-branch from current state and replay"
                ) from None
            published[tname] = v
            pins[tname] = {"root": p["root"], "version": v}
        return self._try_publish(base, pins, "publish_branch")

    # -- catalog tags (immutable whole-lake refs) -------------------------------
    def create_tag(
        self, name: str, catalog_version: int | None = None
    ) -> int:
        """Immutable named ref over the WHOLE lake: `release-2024`
        instead of `catalog_version=17` — one consistent cross-table
        snapshot by name (the catalog twin of table tags, completing
        the Nessie ref symmetry). One tiny JSON file published through
        the commit protocol, so racing same-name taggers resolve to
        exactly one winner; re-tagging refuses (a tag that silently
        moved would defeat its purpose) — drop first.

        Retention note: a catalog tag pins a PIN MAP, not the table
        versions it references — each table's own retention
        (`expire_versions`, itself blocked by TABLE tags) governs how
        long those versions stay readable, same posture as catalog
        branch pins."""
        if self.branch_name is not None:
            raise ValueError(
                "create_tag from the MAIN catalog handle (tags name "
                "main catalog versions; publish a branch first)"
            )
        import re as _re

        if not _re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(
                f"tag name {name!r} must match [A-Za-z0-9._-]{{1,64}}"
            )
        m = self.manifest(catalog_version)  # validates it exists
        tdir = os.path.join(self._cdir, _TAGS_SUBDIR)
        os.makedirs(tdir, exist_ok=True)
        try:
            self._protocol.publish(
                os.path.join(tdir, f"{name}.json"),
                json.dumps(
                    {"catalog_version": m["catalog_version"]}
                ),
            )
        except ConcurrentCommitError:
            raise ValueError(
                f"{self.root}: catalog tag {name!r} exists (at "
                f"v{self.list_tags().get(name)}); drop_tag first"
            ) from None
        return m["catalog_version"]

    def list_tags(self) -> dict[str, int]:
        tdir = os.path.join(
            self.root, _CATALOG_DIR, _TAGS_SUBDIR
        )
        out: dict[str, int] = {}
        if not os.path.isdir(tdir):
            return out
        for n in sorted(os.listdir(tdir)):
            if not n.endswith(".json"):
                continue
            try:
                with open(os.path.join(tdir, n)) as f:
                    out[n[:-5]] = json.load(f)["catalog_version"]
            except (OSError, ValueError, KeyError):
                continue  # torn claim
        return out

    def tag_version(self, name: str) -> int:
        """Resolve a catalog tag — `read(t, catalog_version=
        cat.tag_version('rel'))` / `sql(stmt, cat.tag_version('rel'))`
        are the tagged consistent cross-table snapshot."""
        tags = self.list_tags()
        if name not in tags:
            raise NoSuchVersionError(
                f"{self.root}: no catalog tag {name!r} "
                f"(existing: {sorted(tags)})"
            )
        return tags[name]

    def drop_tag(self, name: str) -> None:
        if self.branch_name is not None:
            raise ValueError("drop_tag from the MAIN catalog handle")
        path = os.path.join(
            self._cdir, _TAGS_SUBDIR, f"{name}.json"
        )
        if not os.path.exists(path):
            raise NoSuchVersionError(
                f"{self.root}: no catalog tag {name!r} "
                f"(existing: {sorted(self.list_tags())})"
            )
        os.remove(path)

    # -- transactions ------------------------------------------------------------
    def transaction(self) -> "CatalogTransaction":
        """See :class:`CatalogTransaction`. On a catalog BRANCH handle
        this refuses: a plain transaction writes on the shared
        table-main heads (the absorb posture — correct on catalog main),
        so two lake branches transacting on the same table would
        silently COMPOSE instead of isolating. Staged transactions fork
        each table at the branch's PIN, giving isolate-or-refuse — the
        only honest semantics for a branch of the whole lake."""
        if self.branch_name is not None:
            raise ValueError(
                "on a catalog branch use staged_transaction(): plain "
                "transactions write on shared table-main heads and "
                "would compose across lake branches instead of "
                "isolating"
            )
        return CatalogTransaction(self)

    def staged_transaction(self) -> "StagedCatalogTransaction":
        """Catalog-level WRITE-AUDIT-PUBLISH: like :meth:`transaction`,
        but every table write lands on a per-transaction BRANCH of that
        table, so even direct table readers never see uncommitted work
        (plain transactions leave table-head orphans; staged ones leave
        nothing on any main until exit). `txn.sql(...)` queries the
        STAGED state — touched tables at their branch heads, untouched
        tables at their catalog pins — so a cross-table audit can veto
        the whole group by raising. On success every touched branch
        fast-forwards and ONE pin swap publishes; on failure branches
        are dropped and no main moved."""
        return StagedCatalogTransaction(self)


class CatalogTransaction:
    """Context manager binding a group of table writes to ONE atomic
    catalog commit. `txn[name]` hands out the plain table handle —
    every existing DML works; the table versions those commits create
    stay invisible to catalog readers until the exit pin-swap. On ANY
    exception the pin is not moved (already-committed table versions
    become unpinned orphans — time-travelable, restorable, expirable —
    and catalog readers never saw them)."""

    def __init__(self, catalog: TableCatalog):
        self.catalog = catalog
        self._base: int | None = None
        self._handles: dict[str, VersionedTable] = {}

    def __enter__(self) -> "CatalogTransaction":
        self._base = self.catalog.latest_version()
        return self

    def __getitem__(self, name: str) -> VersionedTable:
        if name not in self._handles:
            pins = self.catalog.pins(self._base)
            if name not in pins:
                raise NoSuchTableError(
                    f"{self.catalog.root}: no table {name!r} "
                    f"(registered: {sorted(pins)})"
                )
            self._handles[name] = VersionedTable(
                self.catalog.spark,
                pins[name]["root"],
                commit_protocol=self.catalog._protocol,
            )
        return self._handles[name]

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            return False  # no pin swap; orphans stay invisible
        pins = dict(self.catalog.pins(self._base))
        for name, t in self._handles.items():
            pins[name] = {
                "root": t.root,
                "version": t.latest_version(),
            }
        self.catalog._try_publish(self._base, pins, "transaction")
        return False


class StagedCatalogTransaction:
    """Write-audit-publish across tables (see
    :meth:`TableCatalog.staged_transaction`). Write path: `txn[name]`
    returns a BRANCH handle of the table (branch `__txn_<id>`, created
    lazily at the table's pinned version); audit path: `txn.sql(stmt)`
    sees the staged world; exit publishes each touched branch
    (fast-forward squash — refuses if the table's main moved past the
    pin, i.e. a concurrent direct writer) and swaps the catalog pin
    once. Exceptions (including an audit raising) drop the branches:
    no main table ever carried the aborted work, not even as orphans.

    Failure atomicity note (catalog MAIN): the PIN swap is atomic,
    table-main visibility is not quite — if publish k succeeds and
    publish k+1 refuses, the first k tables carry published-but-
    unpinned versions (catalog readers still see nothing new; `restore`
    the mains or let the next transaction absorb them). The pin is the
    source of truth, same as the plain transaction.

    On a catalog BRANCH handle the exit differs: staged table commits
    are NOT published to table mains (that would leak lake-branch rows
    into catalog-main reads through the next plain transaction's
    absorb pin, and make the branch's own later publish refuse).
    Instead the per-transaction table branches are KEPT and the
    catalog-branch pin records the branch coordinate
    `(root, version, branch, base)` — reads on the catalog branch
    resolve through the staged chain, table mains never move, and
    `TableCatalog.publish_branch` squashes every staged branch onto
    its table main at the recorded fork point when the lake branch
    publishes. A later staged transaction on the same catalog branch
    forks its fresh per-txn branch FROM the pinned branch coordinate,
    so staged work composes transaction-by-transaction without ever
    touching a main. Aborts drop the per-txn branches — nothing
    anywhere, on any main or any catalog ref."""

    def __init__(self, catalog: TableCatalog):
        self.catalog = catalog
        self._base: int | None = None
        self._branch = f"__txn_{os.urandom(4).hex()}"
        self._staged: dict[str, VersionedTable] = {}  # branch handles
        self._mains: dict[str, VersionedTable] = {}
        self._fork_base: dict[str, int] = {}  # table-main fork version

    def __enter__(self) -> "StagedCatalogTransaction":
        self._base = self.catalog.latest_version()
        return self

    def __getitem__(self, name: str) -> VersionedTable:
        if name not in self._staged:
            pins = self.catalog.pins(self._base)
            if name not in pins:
                raise NoSuchTableError(
                    f"{self.catalog.root}: no table {name!r} "
                    f"(registered: {sorted(pins)})"
                )
            p = pins[name]
            main = VersionedTable(
                self.catalog.spark,
                p["root"],
                commit_protocol=self.catalog._protocol,
            )
            self._mains[name] = main
            # On a catalog branch the pin may itself be a branch
            # coordinate (staged by an earlier transaction): fork the
            # fresh per-txn branch from THAT snapshot, and carry the
            # original table-main fork point forward for the eventual
            # publish divergence check.
            self._staged[name] = main.create_branch(
                self._branch,
                from_version=p["version"],
                from_ref=p.get("branch"),
            )
            self._fork_base[name] = p.get("base", p["version"])
        return self._staged[name]

    def sql(self, statement: str) -> DataFrame:
        """Query the STAGED world: touched tables at their branch
        heads, untouched tables at their catalog pins — the cross-table
        audit surface. Raise from the `with` body to veto the group.
        Session namespace is restored afterwards (pre-existing
        same-named user temp views survive)."""
        pins = self.catalog.pins(self._base)
        return _run_with_views(
            self.catalog.spark,
            {
                name: (
                    self._staged[name].read()
                    if name in self._staged
                    else self.catalog._pin_table(p).read(p["version"])
                )
                for name, p in pins.items()
            },
            statement,
        )

    def _drop_branches(self) -> None:
        for name, main in self._mains.items():
            try:
                main.drop_branch(self._branch)
            except NoSuchBranchError:  # pragma: no cover - already gone
                pass

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            self._drop_branches()
            return False
        pins = dict(self.catalog.pins(self._base))
        if self.catalog.branch_name is not None:
            # Lake-branch posture: keep staged work on the per-txn
            # table branches and pin their coordinates — no table main
            # moves until the CATALOG branch publishes. Untouched
            # forks are dropped and keep their old pins.
            touched: dict[str, dict] = {}
            for name, staged in self._staged.items():
                head = staged.latest_version()
                if head == pins[name]["version"]:
                    continue  # touched but never written
                touched[name] = {
                    "root": self._mains[name].root,
                    "version": head,
                    "branch": self._branch,
                    "base": self._fork_base[name],
                }
            if not touched:
                self._drop_branches()
                return False
            pins.update(touched)
            try:
                self.catalog._try_publish(
                    self._base, pins, "staged_transaction"
                )
            except CatalogConflictError:
                self._drop_branches()
                raise
            for name, main in self._mains.items():
                if name not in touched:  # drop only the unwritten forks
                    try:
                        main.drop_branch(self._branch)
                    except NoSuchBranchError:  # pragma: no cover
                        pass
            return False
        published: dict[str, int] = {}
        try:
            for name, main in self._mains.items():
                branch_head = self._staged[name].latest_version()
                if branch_head == pins[name]["version"]:
                    continue  # touched but never written
                published[name] = main.publish_branch(self._branch)
            for name, v in published.items():
                pins[name] = {
                    "root": self._mains[name].root,
                    "version": v,
                }
            self.catalog._try_publish(
                self._base, pins, "staged_transaction"
            )
        except (ConcurrentCommitError, CatalogConflictError) as e:
            self._drop_branches()
            raise CatalogConflictError(
                f"staged transaction lost a race ({e}); "
                f"published-but-unpinned table versions: "
                f"{sorted(published)} — catalog readers never saw "
                "them; restore the mains or let the next transaction "
                "absorb"
            ) from None
        self._drop_branches()
        return False
