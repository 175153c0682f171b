"""Concrete transformation steps.

Coverage of SURVEY.md section 2A rows A7 (DataCleansing), A8 (DataValidation,
including the email check the reference left as TODO at
`DataValidationStep.cs:41-45`), A22 (the intended-but-empty lookup join), and
A23 (README-documented DateFormat / ColumnMapping / DataMasking /
DataEncryption). All row-wise loops from the reference become vectorized
column expressions; every step is a lazy plan fragment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from datalakeingestionservice_spark.steps import BaseStep, StepError, register_step

#: Pragmatic email shape; the reference accepted `validateEmail` config but
#: never implemented it (`DataValidationStep.cs:41-45`) — we do.
EMAIL_REGEX = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


@register_step("DataCleansing")
class DataCleansingStep(BaseStep):
    """Trim whitespace on string columns; optionally empty string -> NULL.

    Reference truth table: `DataCleansingStep.cs:43-51` — trim when
    `trimWhitespace` (default true), empty->NULL when `removeEmptyStrings`
    (default false). The reference mutates rows in a nested loop; here it is
    one `select` over `StringType` columns, whole-stage-codegen friendly.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        trim = bool(self.config.get("trimWhitespace", True))
        empty_to_null = bool(self.config.get("removeEmptyStrings", False))
        only = self.config.get("columns")  # optional restriction
        if not trim and not empty_to_null:
            return df

        string_cols = {
            f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
        }
        if only is not None:
            string_cols &= set(only)

        cols = []
        for name in df.columns:
            if name in string_cols:
                col = F.col(name)
                if trim:
                    col = F.trim(col)
                if empty_to_null:
                    col = F.when(col == "", F.lit(None)).otherwise(col)
                cols.append(col.alias(name))
            else:
                cols.append(F.col(name))
        return df.select(*cols)


class SchemaValidationError(StepError):
    """Required columns missing (reference throws `InvalidOperationException`
    at `DataValidationStep.cs:32-39`)."""


@register_step("DataValidation")
class DataValidationStep(BaseStep):
    """Assert required columns exist; optionally flag/enforce email validity.

    `requiredColumns`: missing column -> SchemaValidationError at plan time
    (cheap — checks `df.columns`, no action). `validateEmail` + `emailColumns`:
    adds `<col>_valid` boolean flags, or filters invalid rows when
    `dropInvalid` is true. Flagging keeps the step side-effect free and lazy.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        required = self.config.get("requiredColumns") or []
        # Case-insensitive like the reference (.NET DataColumnCollection
        # lookups ignore case).
        present = {c.lower() for c in df.columns}
        missing = [c for c in required if c.lower() not in present]
        if missing:
            raise SchemaValidationError(
                f"Required columns missing: {missing}; present: {df.columns}"
            )

        if self.config.get("validateEmail"):
            email_cols = self.config.get("emailColumns") or [
                c for c in df.columns if "email" in c.lower()
            ]
            for col in email_cols:
                if col not in df.columns:
                    continue
                valid = F.col(col).rlike(EMAIL_REGEX)
                if self.config.get("dropInvalid", False):
                    df = df.filter(valid | F.col(col).isNull())
                else:
                    df = df.withColumn(f"{col}_valid", valid)
        return df


@register_step("DateFormat")
class DateFormatStep(BaseStep):
    """Parse and reformat date/timestamp columns to a target string format.

    Reference worked example: `README.md:1276-1338`. Format strings use Spark's
    (Java) datetime pattern, e.g. ``yyyy/MM/dd``.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        columns = self.config.get("columns") or []
        source_fmt = self.config.get("sourceFormat")
        target_fmt = self.config.get("targetFormat", "yyyy-MM-dd")
        for col in columns:
            if col not in df.columns:
                continue
            parsed = (
                F.to_timestamp(F.col(col), source_fmt)
                if source_fmt
                else F.col(col).cast("timestamp")
            )
            df = df.withColumn(col, F.date_format(parsed, target_fmt))
        return df


@register_step("ColumnMapping")
class ColumnMappingStep(BaseStep):
    """Rename columns per a mapping dict (reference `README.md:1693-1748`)."""

    def apply(self, df: DataFrame) -> DataFrame:
        mappings: dict[str, str] = self.config.get("mappings") or {}
        renames = {old: new for old, new in mappings.items() if old in df.columns}
        if self.config.get("dropUnmapped", False):
            return df.select(
                *[F.col(old).alias(new) for old, new in renames.items()]
            )
        return df.withColumnsRenamed(renames)


@register_step("DataMasking")
class DataMaskingStep(BaseStep):
    """Mask PII columns (reference `README.md:1531-1597`).

    Modes: ``full`` -> constant mask literal; ``partial`` -> keep last N chars,
    mask the rest; ``hash`` -> sha256 hex (deterministic pseudonymization).
    """

    def apply(self, df: DataFrame) -> DataFrame:
        columns = self.config.get("columns") or []
        mode = str(self.config.get("mode", "full")).lower()
        mask_literal = self.config.get("maskValue", "***MASKED***")
        keep_last = int(self.config.get("unmaskedSuffixLength", 4))
        mask_char = str(self.config.get("maskChar", "*"))

        for col in columns:
            if col not in df.columns:
                continue
            c = F.col(col)
            if mode == "full":
                masked = F.when(c.isNull(), F.lit(None)).otherwise(
                    F.lit(mask_literal)
                )
            elif mode == "partial":
                masked = F.when(c.isNull(), F.lit(None)).otherwise(
                    F.concat(
                        F.repeat(
                            F.lit(mask_char),
                            F.greatest(F.length(c) - keep_last, F.lit(0)),
                        ),
                        F.substring(c, -keep_last, keep_last),
                    )
                )
            elif mode == "hash":
                masked = F.sha2(c.cast("string"), 256)
            else:
                raise StepError(f"Unknown masking mode: {mode!r}")
            df = df.withColumn(col, masked)
        return df


@register_step("DataEncryption")
class DataEncryptionStep(BaseStep):
    """Column encryption (reference config sketch `README.md:1466-1476`).

    Uses Spark's built-in ``aes_encrypt``. Default GCM (random IV, secure,
    non-deterministic); tests may pass ``mode: ECB`` for deterministic output.
    Key must be 16/24/32 bytes.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        columns = self.config.get("columns") or []
        key = self.config.get("key")
        if columns and not key:
            raise StepError("DataEncryption requires a 'key' in config")
        mode = self.config.get("aesMode", "GCM")
        for col in columns:
            if col not in df.columns:
                continue
            # Key/mode passed as literal parameters, never interpolated into
            # parsed SQL text: a quote in the key can't break or inject the
            # expression, and the plan string holds a parameter, not a
            # hand-spliced fragment.
            df = df.withColumn(
                col,
                F.base64(
                    F.aes_encrypt(
                        F.col(col).cast("string"), F.lit(key), F.lit(mode)
                    )
                ),
            )
        return df


@register_step("LookupJoin")
class LookupJoinStep(BaseStep):
    """Broadcast lookup-join enrichment — the step the reference intended but
    shipped empty (`DatasetSpecific/FOCA/ClientDataGPNLookup.cs`, 0 bytes).

    Config: ``lookupPath`` (parquet) or a `lookup_df` injected at build time,
    ``on`` (key or list), ``how`` (default left), ``select`` (columns to bring),
    ``broadcast`` (default true — lookup tables are small by definition; a
    broadcast hash join avoids shuffling the 100 TB fact side entirely).
    """

    def __init__(self, config: dict, lookup_df: DataFrame | None = None):
        super().__init__(config)
        self._lookup_df = lookup_df

    def apply(self, df: DataFrame) -> DataFrame:
        lookup = self._lookup_df
        if lookup is None:
            path = self.config.get("lookupPath")
            if not path:
                raise StepError("LookupJoin requires 'lookupPath' or a lookup_df")
            lookup = df.sparkSession.read.parquet(path)
        on = self.config.get("on")
        if not on:
            raise StepError("LookupJoin requires 'on' (join key(s))")
        how = self.config.get("how", "left")
        select = self.config.get("select")
        if select:
            keys = [on] if isinstance(on, str) else list(on)
            lookup = lookup.select(*dict.fromkeys(keys + list(select)))
        if self.config.get("broadcast", True):
            lookup = F.broadcast(lookup)
        return df.join(lookup, on, how)
