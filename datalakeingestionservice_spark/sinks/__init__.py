"""Sink layer: Parquet writer, CTL control file, atomic publish.

Reference counterparts: `ParquetWriterService.cs` (A11), `CtlGenerationHandler`
+ `CtlWriterService` (A12), `FileSystemUploadProvider`/`UploadHandler`
(A13/A15). The reference buffers everything in memory and uploads bytes; here
the DataFrame writes straight to a staging directory, the CTL is derived from
the committed part-files, and publish is a directory rename.
"""

from datalakeingestionservice_spark.sinks.parquet_sink import (
    WriteResult,
    write_parquet,
)
from datalakeingestionservice_spark.sinks.ctl import CtlRecord, generate_ctl, write_ctl
from datalakeingestionservice_spark.sinks.publish import publish_directory

__all__ = [
    "WriteResult",
    "write_parquet",
    "CtlRecord",
    "generate_ctl",
    "write_ctl",
    "publish_directory",
]
