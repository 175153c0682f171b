"""CTL control-file sink (SURVEY.md A12), generalized to distributed output.

Reference contract (`CtlGenerationHandler.cs:43-103`, `CtlWriterService.cs:20-64`):
a CSV with header ``RecordCount,RefDate,Checksum,Timestamp,DatasetName,Source``
and one row — row count, ISO-8601 dates, lower-hex SHA256 of the Parquet
bytes, ``{datasetId}_{yyyyMMddHHmmss}`` dataset name, RFC-4180 escaping.

The reference hashes its single in-memory byte buffer. Distributed output is
many part-files, so (SURVEY.md section 4.3.1): each committed part-file is
hashed, then the combined checksum is the sha256 of the sorted
``name:hash`` lines. With exactly one part-file the checksum degrades to that
file's plain sha256 — byte-parity with the reference's single-file semantics.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from datetime import datetime, timezone


@dataclass
class CtlRecord:
    record_count: int
    ref_date: str
    checksum: str
    timestamp: str
    dataset_name: str
    source: str

    HEADER = "RecordCount,RefDate,Checksum,Timestamp,DatasetName,Source"

    def to_csv(self) -> str:
        row = ",".join(
            _escape(str(v))
            for v in (
                self.record_count,
                self.ref_date,
                self.checksum,
                self.timestamp,
                self.dataset_name,
                self.source,
            )
        )
        return f"{self.HEADER}\n{row}\n"


def _escape(field: str) -> str:
    """RFC-4180 (`CtlWriterService.cs:52-64`): quote when the field contains
    comma/quote/newline; double embedded quotes."""
    if any(ch in field for ch in (",", '"', "\n", "\r")):
        return '"' + field.replace('"', '""') + '"'
    return field


def _sha256_file(path: str, chunk: int = 1 << 20) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            block = fh.read(chunk)
            if not block:
                break
            digest.update(block)
    return digest.hexdigest()


def combined_checksum(files: list[str]) -> str:
    """Deterministic checksum over multi-part output (order-independent)."""
    if not files:
        return hashlib.sha256(b"").hexdigest()
    if len(files) == 1:
        return _sha256_file(files[0])
    lines = sorted(
        f"{os.path.basename(path)}:{_sha256_file(path)}" for path in files
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def combined_checksum_distributed(spark, files: list[str]) -> str:
    """Remote twin of `combined_checksum`: per-file sha256 computed by
    executors via the binaryFile source (file bytes never pass the driver),
    then combined exactly like the local path. One row per part-file comes
    back to the driver — KBs at any data scale."""
    if not files:
        return hashlib.sha256(b"").hexdigest()
    from pyspark.sql import functions as F

    rows = (
        spark.read.format("binaryFile")
        .load(files)
        .select("path", F.sha2("content", 256).alias("sha"))
        .collect()
    )
    if len(rows) == 1:
        return rows[0].sha
    lines = sorted(
        f"{os.path.basename(r.path)}:{r.sha}" for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


def _roundtrip(dt: datetime) -> str:
    """.NET round-trip ("o") format (`CtlGenerationHandler.cs:70-72` uses
    `DateTime.ToString("o")`): 7-digit fractional seconds, 'Z' for UTC.
    Python datetimes carry microseconds (6 digits) — padded with a trailing
    zero to the reference's 7. Naive datetimes get no designator, matching
    DateTimeKind.Unspecified."""
    base = dt.strftime("%Y-%m-%dT%H:%M:%S.%f") + "0"
    if dt.tzinfo is not None and dt.utcoffset() == timezone.utc.utcoffset(None):
        return base + "Z"
    if dt.tzinfo is not None:
        return base + dt.strftime("%z")[:3] + ":" + dt.strftime("%z")[3:]
    return base


def generate_ctl(
    dataset_id: str,
    source: str,
    record_count: int,
    files: list[str],
    ref_date: datetime | None = None,
    now: datetime | None = None,
    checksum: str | None = None,
) -> CtlRecord:
    now = now or datetime.now(timezone.utc)
    ref = ref_date or now
    return CtlRecord(
        record_count=record_count,
        ref_date=_roundtrip(ref),
        checksum=checksum if checksum is not None else combined_checksum(files),
        timestamp=_roundtrip(now),
        dataset_name=f"{dataset_id}_{now.strftime('%Y%m%d%H%M%S')}",
        source=source,
    )


def write_ctl(record: CtlRecord, path: str) -> str:
    """Write the control file (small, driver-side — no Spark job needed)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8", newline="") as fh:
        fh.write(record.to_csv())
    os.replace(tmp, path)  # atomic, like the reference's temp+move (A13)
    return path


def write_ctl_hadoop(spark, record: CtlRecord, uri: str) -> str:
    """Write the control file to any Hadoop-filesystem URI (abfss://, s3a://,
    hdfs://, file://) via the JVM FileSystem API — the remote-destination
    twin of `write_ctl`. The CTL is bytes-small, so a driver-side stream
    write is correct at any scale."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(conf)
    out = fs.create(path, True)
    try:
        out.write(bytearray(record.to_csv().encode("utf-8")))
    finally:
        out.close()
    return uri
