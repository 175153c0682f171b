"""Source-schema-evolution posture for the r12 components (VERDICT
r12 #6): the same contract the r12 view family defined — aggregate-
shaped maintenance CONVERGES through unrelated ADD COLUMN and safe
widening (its deltas project only the referenced expressions), full-
row join state REFUSES LOUDLY with the rebuild recipe — extended to

- chained (3+ table) join MVs when a MIDDLE dim evolves (the stage
  join views are full-row: refuse, never silently drop the column),
- the maintained BM25 index (projects only (id, text): an unrelated
  documents column must converge; widening the id column folds
  through the state merge exactly like an agg-state widening).
"""

import pytest
from pyspark.sql import functions as F

from datalakeingestionservice_spark.operators.text import bm25_rank
from datalakeingestionservice_spark.sinks.bm25_index import (
    IncrementalBM25Index,
)
from datalakeingestionservice_spark.sinks.incremental_view import (
    SchemaDriftError,
)
from datalakeingestionservice_spark.sinks.matview import MaterializedView
from datalakeingestionservice_spark.sinks.versioned import VersionedTable


def _star(spark, tmp_path):
    o = VersionedTable.create(
        spark,
        str(tmp_path / "o"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0), (3, 10, 3.0)],
            "k bigint, ck bigint, price double",
        ),
    )
    c = VersionedTable.create(
        spark,
        str(tmp_path / "c"),
        spark.createDataFrame(
            [(10, 100, "a"), (20, 200, "b")],
            "ck bigint, nk bigint, seg string",
        ),
    )
    n = VersionedTable.create(
        spark,
        str(tmp_path / "n"),
        spark.createDataFrame(
            [(100, "US"), (200, "DE")], "nk bigint, nname string"
        ),
    )
    return o, c, n


class TestChainEvolution:
    def test_middle_dim_add_column_refuses_with_recipe(
        self, spark, tmp_path
    ):
        o, c, n = _star(spark, tmp_path)
        mv = MaterializedView.create(
            spark,
            str(tmp_path / "mv"),
            "SELECT nname, COUNT(*) AS cnt, SUM(price) AS total "
            "FROM o JOIN c USING (ck) JOIN n USING (nk) GROUP BY nname",
            {"o": o, "c": c, "n": n},
            primary_key=("k", "ck", "nk"),
        )
        before = sorted(tuple(x) for x in mv.read().collect())
        c.add_column("extra", "string")
        c.append(
            spark.createDataFrame(
                [(30, 100, "c", "x")],
                "ck bigint, nk bigint, seg string, extra string",
            )
        )
        with pytest.raises(SchemaDriftError, match="rebuild"):
            mv.refresh()
        # refuse-never-reinterpret: the maintained state did not move
        assert sorted(tuple(x) for x in mv.read().collect()) == before

    def test_middle_dim_retype_refuses(self, spark, tmp_path):
        o = VersionedTable.create(
            spark,
            str(tmp_path / "o"),
            spark.createDataFrame(
                [(1, 10, 1.0)], "k bigint, ck bigint, price double"
            ),
        )
        c = VersionedTable.create(
            spark,
            str(tmp_path / "c"),
            spark.createDataFrame(
                [(10, 100, "a")], "ck bigint, nk int, seg string"
            ),
        )
        n = VersionedTable.create(
            spark,
            str(tmp_path / "n"),
            spark.createDataFrame(
                [(100, "US")], "nk int, nname string"
            ),
        )
        mv = MaterializedView.create(
            spark,
            str(tmp_path / "mv"),
            "SELECT * FROM o JOIN c USING (ck) JOIN n USING (nk)",
            {"o": o, "c": c, "n": n},
            primary_key=("k", "ck", "nk"),
        )
        # a WIDENING retype of a carried middle-table column refuses
        c.append(
            spark.createDataFrame(
                [(40, 2_200_000_000, "d")],
                "ck bigint, nk bigint, seg string",
            ),
            merge_schema=True,
        )
        with pytest.raises(SchemaDriftError):
            mv.refresh()

    def test_base_fact_evolution_refuses_first_stage(
        self, spark, tmp_path
    ):
        o, c, n = _star(spark, tmp_path)
        mv = MaterializedView.create(
            spark,
            str(tmp_path / "mv"),
            "SELECT nname, COUNT(*) AS cnt FROM o JOIN c USING (ck) "
            "JOIN n USING (nk) GROUP BY nname",
            {"o": o, "c": c, "n": n},
            primary_key=("k", "ck", "nk"),
        )
        o.add_column("note", "string")
        o.append(
            spark.createDataFrame(
                [(9, 10, 9.0, "z")],
                "k bigint, ck bigint, price double, note string",
            )
        )
        with pytest.raises(SchemaDriftError, match="rebuild"):
            mv.refresh()


class TestBM25IndexEvolution:
    def _corpus(self, spark, tmp_path, id_type="bigint"):
        return VersionedTable.create(
            spark,
            str(tmp_path / "docs"),
            spark.createDataFrame(
                [
                    (1, "spark streams quickly"),
                    (2, "slow rivers run deep"),
                    (3, "spark and stream engines"),
                ],
                f"doc_id {id_type}, text string",
            ),
        )

    def _parity(self, idx, src, terms=("spark", "stream")):
        got = [(r.doc_id, r.score) for r in idx.rank(list(terms)).collect()]
        exp = [
            (r.doc_id, r.score)
            for r in bm25_rank(src.read(), list(terms)).collect()
        ]
        assert got == exp, (got, exp)

    def test_unrelated_add_column_converges(self, spark, tmp_path):
        src = self._corpus(spark, tmp_path)
        idx = IncrementalBM25Index(
            spark, src.root, str(tmp_path / "idx")
        )
        idx.refresh()
        src.add_column("lang", "string", default="'en'")
        src.append(
            spark.createDataFrame(
                [(4, "spark engines again", "de")],
                "doc_id bigint, text string, lang string",
            )
        )
        src.update_where(
            F.col("doc_id") == 1, {"text": F.lit("rivers of sparks")}
        )
        src.delete_where(F.col("doc_id") == 2)
        idx.refresh()
        self._parity(idx, src)
        self._parity(idx, src, terms=("rivers",))

    def test_id_widening_converges_through_state_cast(
        self, spark, tmp_path
    ):
        src = self._corpus(spark, tmp_path, id_type="int")
        idx = IncrementalBM25Index(
            spark, src.root, str(tmp_path / "idx")
        )
        idx.refresh()
        src.append(
            spark.createDataFrame(
                [(3_000_000_000, "spark at billion scale")],
                "doc_id bigint, text string",
            ),
            merge_schema=True,
        )
        src.delete_where(F.col("doc_id") == 1)
        idx.refresh()
        self._parity(idx, src)
        big = idx.rank(["billion"]).collect()
        assert [r.doc_id for r in big] == [3_000_000_000]

    def test_text_retype_refuses_loudly(self, spark, tmp_path):
        src = self._corpus(spark, tmp_path)
        idx = IncrementalBM25Index(
            spark, src.root, str(tmp_path / "idx")
        )
        idx.refresh()
        src.rename_column("text", "body")
        src.append(
            spark.createDataFrame(
                [(9, "renamed corpus column")],
                "doc_id bigint, body string",
            )
        )
        with pytest.raises(Exception) as ei:
            idx.refresh()
            idx.rank(["renamed"]).collect()
        # whatever the layer, the failure must NAME the missing column
        # rather than silently serving a stale index
        assert "text" in str(ei.value)


class TestRenderedEvolution:
    """r14 (VERDICT r13 #4): evolve the upstream under an ACTIVE
    rollup pyramid. The rendered projection inherits its view's
    posture exactly — aggregate upstreams CONVERGE through an
    unrelated ADD COLUMN (the agg deltas project only referenced
    expressions, and rendered re-renders from the converged state),
    SELECT*-OUTER row-view upstreams REFUSE LOUDLY (full-row state),
    with neither the state nor rendered/ moving on refusal."""

    def test_agg_upstream_add_column_converges_rendered(
        self, spark, tmp_path
    ):
        t = VersionedTable.create(
            spark,
            str(tmp_path / "t"),
            spark.createDataFrame(
                [("d1", 1.0), ("d1", 2.0), ("d2", 3.0)],
                "day string, amt double",
            ),
        )
        daily = MaterializedView.create(
            spark,
            str(tmp_path / "daily"),
            "SELECT day, COUNT(*) AS n, SUM(amt) AS total "
            "FROM t GROUP BY day",
            {"t": t},
        )
        monthly = MaterializedView.create(
            spark,
            str(tmp_path / "monthly"),
            "SELECT substr(day, 1, 1) AS bucket, SUM(n) AS n, "
            "SUM(total) AS total FROM daily GROUP BY bucket",
            {"daily": daily},
        )
        # unrelated column lands on the base table under the pyramid
        t.add_column("note", "string")
        t.append(
            spark.createDataFrame(
                [("d2", 4.0, "x"), ("d3", 5.0, None)],
                "day string, amt double, note string",
            )
        )
        monthly.refresh(cascade=True)  # must converge end-to-end
        rendered = VersionedTable(spark, daily.rendered_root()).read()
        assert sorted(map(tuple, rendered.collect())) == sorted(
            map(tuple, daily.read().collect())
        )
        row = monthly.read().collect()[0]
        assert (row.bucket, row.n, row.total) == ("d", 5, 15.0)

    def test_row_view_upstream_evolution_refuses_state_pinned(
        self, spark, tmp_path
    ):
        left = VersionedTable.create(
            spark,
            str(tmp_path / "l"),
            spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0), (3, "zz", 3.0)],
                "lid bigint, dk string, v double",
            ),
        )
        right = VersionedTable.create(
            spark,
            str(tmp_path / "r"),
            spark.createDataFrame(
                [(10, "a"), (20, "b")], "rid bigint, dk string"
            ),
        )
        outer = MaterializedView.create(
            spark,
            str(tmp_path / "outer"),
            "SELECT * FROM l LEFT JOIN r USING (dk)",
            {"l": left, "r": right},
            primary_key=("lid", "rid"),
        )
        down = MaterializedView.create(
            spark,
            str(tmp_path / "down"),
            "SELECT dk, COUNT(*) AS n, SUM(v) AS sv FROM outer "
            "GROUP BY dk",
            {"outer": outer},
        )
        before_rend = sorted(
            map(
                tuple,
                VersionedTable(spark, outer.rendered_root())
                .read()
                .collect(),
            )
        )
        before_down = sorted(map(tuple, down.read().collect()))
        left.add_column("extra", "string")
        left.append(
            spark.createDataFrame(
                [(4, "a", 4.0, "e")],
                "lid bigint, dk string, v double, extra string",
            )
        )
        with pytest.raises(SchemaDriftError, match="rebuild"):
            down.refresh(cascade=True)
        # refuse-never-reinterpret: neither rendered/ nor the
        # downstream moved
        assert (
            sorted(
                map(
                    tuple,
                    VersionedTable(spark, outer.rendered_root())
                    .read()
                    .collect(),
                )
            )
            == before_rend
        )
        assert sorted(map(tuple, down.read().collect())) == before_down
