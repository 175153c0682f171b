"""Python UDTF surface (SURVEY.md section 2D: UDF/UDAF/UDTF) — a table
function registered and invoked from SQL with LATERAL join."""

from __future__ import annotations

import pytest


def test_udtf_chunking_lateral(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: int, chunk: string")
    class SplitWords:
        """Yield fixed-size word chunks — the UDTF form of operators.text
        chunk_text (the built-in-expression form is preferred in pipelines;
        the UDTF exists to cover the table-function API surface)."""

        def eval(self, text: str, size: int):
            if text is None:
                return
            words = text.split(" ")
            for i in range(0, len(words), size):
                yield i // size, " ".join(words[i : i + size])

    spark.udtf.register("split_words", SplitWords)
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, None)], ["id", "txt"]
    ).createOrReplaceTempView("udtf_docs")

    rows = spark.sql(
        """
        SELECT d.id, c.chunk_idx, c.chunk
        FROM udtf_docs d, LATERAL split_words(d.txt, 2) c
        ORDER BY d.id, c.chunk_idx
        """
    ).collect()
    got = [(r.id, r.chunk_idx, r.chunk) for r in rows]
    assert got == [
        (1, 0, "a b"),
        (1, 1, "c d"),
        (1, 2, "e"),
        (2, 0, "x y"),
    ]  # NULL text row yields nothing (inner lateral)
