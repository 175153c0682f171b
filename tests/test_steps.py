"""Unit tests for transformation steps — the truth tables SURVEY.md section 5
extracts from the reference (`DataCleansingStep.cs:43-51`,
`DataValidationStep.cs:32-39`, README-documented steps)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datalakeingestionservice_spark.steps import StepError, create_step
from datalakeingestionservice_spark.steps.common import SchemaValidationError


def test_cleansing_trim_and_empty_to_null(spark):
    df = spark.createDataFrame(
        [("  a  ", 1), ("", 2), ("   ", 3), (None, 4), ("b", 5)],
        ["s", "n"],
    )
    step = create_step(
        "DataCleansing", {"trimWhitespace": True, "removeEmptyStrings": True}
    )
    rows = {r.n: r.s for r in step.apply(df).collect()}
    assert rows == {1: "a", 2: None, 3: None, 4: None, 5: "b"}


def test_cleansing_trim_only_keeps_empty(spark):
    df = spark.createDataFrame([("  a  ",), ("",)], ["s"])
    step = create_step("DataCleansing", {"trimWhitespace": True})
    values = [r.s for r in step.apply(df).collect()]
    assert values == ["a", ""]


def test_cleansing_ignores_non_string_columns(spark):
    df = spark.createDataFrame([(1, "  x ")], ["n", "s"])
    out = step_out = create_step("DataCleansing", {}).apply(df)
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint", "string"]
    assert step_out.collect()[0].n == 1


def test_validation_missing_required_column_raises(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    step = create_step("DataValidation", {"requiredColumns": ["a", "b"]})
    with pytest.raises(SchemaValidationError, match="b"):
        step.apply(df)


def test_validation_email_flag(spark):
    df = spark.createDataFrame(
        [("x@y.com", 1), ("bad", 2), (None, 3)], ["email", "n"]
    )
    step = create_step(
        "DataValidation", {"validateEmail": True, "emailColumns": ["email"]}
    )
    rows = {r.n: r.email_valid for r in step.apply(df).collect()}
    assert rows[1] is True and rows[2] is False and rows[3] is None


def test_validation_email_drop_invalid(spark):
    df = spark.createDataFrame([("x@y.com",), ("bad",)], ["email"])
    step = create_step(
        "DataValidation",
        {"validateEmail": True, "emailColumns": ["email"], "dropInvalid": True},
    )
    assert [r.email for r in step.apply(df).collect()] == ["x@y.com"]


def test_masking_modes(spark):
    df = spark.createDataFrame([("1234567890",), (None,)], ["ssn"])
    full = create_step("DataMasking", {"columns": ["ssn"], "mode": "full"})
    assert [r.ssn for r in full.apply(df).collect()] == ["***MASKED***", None]

    partial = create_step(
        "DataMasking",
        {"columns": ["ssn"], "mode": "partial", "unmaskedSuffixLength": 4},
    )
    assert [r.ssn for r in partial.apply(df).collect()] == ["******7890", None]

    hashed = create_step("DataMasking", {"columns": ["ssn"], "mode": "hash"})
    out = hashed.apply(df).collect()[0].ssn
    assert len(out) == 64 and out != "1234567890"

    with pytest.raises(StepError):
        create_step("DataMasking", {"columns": ["ssn"], "mode": "nope"}).apply(df)


def test_dateformat_step(spark):
    df = spark.createDataFrame([("2024-03-05",)], ["d"])
    step = create_step(
        "DateFormat", {"columns": ["d"], "targetFormat": "yyyy/MM/dd"}
    )
    assert step.apply(df).collect()[0].d == "2024/03/05"


def test_column_mapping_step(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    step = create_step("ColumnMapping", {"mappings": {"a": "x"}})
    assert step.apply(df).columns == ["x", "b"]
    dropping = create_step(
        "ColumnMapping", {"mappings": {"a": "x"}, "dropUnmapped": True}
    )
    assert dropping.apply(df).columns == ["x"]


def test_encryption_roundtrip(spark):
    df = spark.createDataFrame([("secret",)], ["v"])
    key = "0123456789abcdef"
    step = create_step(
        "DataEncryption", {"columns": ["v"], "key": key, "aesMode": "ECB"}
    )
    encrypted = step.apply(df)
    value = encrypted.collect()[0].v
    assert value != "secret"
    decrypted = encrypted.select(
        F.expr(f"CAST(aes_decrypt(unbase64(v), '{key}', 'ECB') AS STRING)").alias("v")
    )
    assert decrypted.collect()[0].v == "secret"


def test_lookup_join_step(spark):
    from datalakeingestionservice_spark.steps.common import LookupJoinStep

    facts = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    lookup = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "name"])
    step = LookupJoinStep({"on": "k", "how": "left"}, lookup_df=lookup)
    rows = {r.k: r.name for r in step.apply(facts).collect()}
    assert rows == {1: "X", 2: "Y", 3: None}


def test_unknown_step_raises():
    with pytest.raises(StepError, match="Unknown transformation step"):
        create_step("NotAStep", {})
