from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datalakeingestionservice_spark.session import build_session

    session = build_session("dlis-tests", extra_confs={"spark.ui.enabled": "false"})
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def _ab(schema, rows):
    """Rows -> the RecordBatch iterator a DataSourceArrowWriter task
    receives from Spark (the writer is Arrow-native now)."""
    import pyarrow as pa

    from datalakeingestionservice_spark.sources.versioned_batch import (
        _arrow_type_for,
    )

    aschema = pa.schema(
        [
            pa.field(f.name, _arrow_type_for(f.dataType), f.nullable)
            for f in schema.fields
        ]
    )
    rows = list(rows)
    if not rows:
        return iter([])
    return iter(
        [
            pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        [r[i] for r in rows],
                        type=aschema.field(i).type,
                    )
                    for i in range(len(aschema))
                ],
                schema=aschema,
            )
        ]
    )
