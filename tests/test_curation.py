"""Corpus-curation operators (operators/curation.py): decontamination,
deterministic sampling, top-p cuts, sequence packing, repetition metrics."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datalakeingestionservice_spark.operators.curation import (
    decontaminate,
    hash_fraction,
    pack_sequences,
    pack_sequences_greedy,
    quality_top_p,
    repetition_metrics,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_removes_overlapping_doc(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(
        spark,
        [
            (1, "zeta eta theta iota kappa"),  # clean
            (2, "xx alpha beta gamma delta yy"),  # shares a 4-gram
            (3, "alpha beta gamma zzz delta"),  # only 3-gram overlap
        ],
    )
    kept = {
        r.doc_id
        for r in decontaminate(train, bench, "doc_id", "text", n=4).collect()
    }
    assert kept == {1, 3}


def test_decontaminate_keeps_short_docs(spark):
    # Docs shorter than the shingle width produce no shingles — never flagged.
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    train = _docs(spark, [(1, "alpha beta gamma")])
    assert decontaminate(train, bench, n=4).count() == 1


def test_hash_fraction_deterministic_and_bounded(spark):
    df = _docs(spark, [(i, f"doc number {i}") for i in range(50)])
    fr1 = df.select(hash_fraction(F.col("text")).alias("f")).collect()
    fr2 = df.select(hash_fraction(F.col("text")).alias("f")).collect()
    assert [r.f for r in fr1] == [r.f for r in fr2]
    assert all(0.0 <= r.f < 1.0 for r in fr1)


def test_stratified_sample_respects_rates(spark):
    rows = [(i, f"text {i}", "en" if i % 2 else "fr") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    kept = stratified_sample(
        df, "lang", {"en": 1.0, "fr": 0.0}, F.col("text")
    ).collect()
    langs = {r.lang for r in kept}
    assert langs == {"en"}
    assert len(kept) == 100  # rate 1.0 keeps every en row


def test_stratified_sample_default_rate(spark):
    rows = [(i, f"text {i}", "de") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    n = stratified_sample(
        df, "lang", {"en": 1.0}, F.col("text"), default_rate=0.5
    ).count()
    # Hash-uniform: expect ~50, allow generous slack; determinism is exact.
    assert 25 <= n <= 75


def test_quality_top_p_keeps_floor_fraction_per_group(spark):
    rows = [(i, "g1", float(i)) for i in range(10)] + [
        (100 + i, "g2", float(i)) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, score double")
    kept = quality_top_p(df, "grp", "score", p=0.3, id_col="doc_id").collect()
    by_grp = {}
    for r in kept:
        by_grp.setdefault(r.grp, set()).add(r.doc_id)
    # floor(0.3 * 10) = 3 highest scores; floor(0.3 * 7) = 2.
    assert by_grp["g1"] == {7, 8, 9}
    assert by_grp["g2"] == {105, 106}


def test_pack_sequences_offset_semantics(spark):
    rows = [(i, "p", 100) for i in range(1, 9)]  # 8 docs x 100 tokens
    df = spark.createDataFrame(rows, "doc_id bigint, part string, n_tok int")
    out = pack_sequences(df, "part", "doc_id", "n_tok", budget=256).collect()
    got = {r.doc_id: (r.bin_offset, r.bin_id) for r in out}
    # Offsets 0,100,...,700; bin = floor(offset/256): 0,0,0,1,1,1,2,2.
    assert got == {
        1: (0, 0), 2: (100, 0), 3: (200, 0), 4: (300, 1),
        5: (400, 1), 6: (500, 1), 7: (600, 2), 8: (700, 2),
    }


def test_pack_sequences_greedy_never_overflows(spark):
    rows = [(i, "a" if i % 2 else "b", 30 * (i % 7) + 10) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id bigint, part string, n_tok int")
    budget = 256
    out = pack_sequences_greedy(df, "part", "doc_id", "n_tok", budget).collect()
    sums = {}
    for r in out:
        sums[(r.part, r.bin_id)] = sums.get((r.part, r.bin_id), 0) + r.n_tok
    assert all(s <= budget for s in sums.values())
    # Greedy: docs stay in id order within a partition; bin ids ascend.
    for part in ("a", "b"):
        seq = sorted(
            [(r.doc_id, r.bin_id) for r in out if r.part == part]
        )
        bins = [b for _, b in seq]
        assert bins == sorted(bins)


def test_pack_sequences_greedy_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, "p", 100), (2, "p", 999), (3, "p", 100)],
        "doc_id bigint, part string, n_tok int",
    )
    out = {
        r.doc_id: r.bin_id
        for r in pack_sequences_greedy(df, "part", "doc_id", "n_tok", 256).collect()
    }
    assert out[1] != out[2] and out[2] != out[3]


def test_repetition_metrics_crafted_doc(spark):
    df = _docs(spark, [(1, "a a a b")])
    r = repetition_metrics(df).collect()[0]
    assert r.n_tokens == 4
    assert r.top_token_count == 3
    assert r.top_token_ratio == pytest.approx(0.75)
    # Bigrams: "a a", "a a", "a b" -> 2 distinct of 3.
    assert r.dup_bigram_frac == pytest.approx(1 - 2 / 3)


def test_repetition_metrics_single_token_doc(spark):
    df = _docs(spark, [(1, "solo")])
    r = repetition_metrics(df).collect()[0]
    assert r.n_tokens == 1 and r.dup_bigram_frac == 0.0


def test_scrub_pii_counts_and_replacement(spark):
    from datalakeingestionservice_spark.operators.curation import (
        scrub_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b+x@corp.example.com and 555-123-4567 ok"),
            (2, "ssn 123-45-6789 twice 999-11-2222"),
            (3, "clean text only"),
            (4, "x@y.io y@z.org 111-22-3333 444-555-6666"),
        ],
        "id bigint, text string",
    )
    got = {
        r.id: (r.n_emails, r.n_ssns, r.n_phones, r.text_scrubbed)
        for r in scrub_pii(df, "text").collect()
    }
    assert got[1] == (1, 0, 1, "mail [REDACTED] and [REDACTED] ok")
    assert got[2] == (0, 2, 0, "ssn [REDACTED] twice [REDACTED]")
    assert got[3] == (0, 0, 0, "clean text only")
    assert got[4] == (
        2,
        1,
        1,
        "[REDACTED] [REDACTED] [REDACTED] [REDACTED]",
    )


def test_scrub_pii_no_double_count_inside_email(spark):
    """A phone/SSN-shaped digit run inside an email address is consumed
    by the email redaction — counted once, replaced once."""
    from datalakeingestionservice_spark.operators.curation import (
        scrub_pii,
    )

    df = spark.createDataFrame(
        [(1, "call 555-123-4567@corp.example.com now")],
        "id bigint, text string",
    )
    (r,) = scrub_pii(df, "text").collect()
    assert (r.n_emails, r.n_ssns, r.n_phones, r.n_redactions) == (
        1,
        0,
        0,
        1,
    )
    assert r.text_scrubbed == "call [REDACTED] now"
