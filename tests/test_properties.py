"""Property-based tests (hypothesis) for contract-critical pure logic:
cron schedules, CTL CSV escaping, config coercion, checksum stability."""

from __future__ import annotations

import csv
import hashlib
import io
from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from datalakeingestionservice_spark.config.coercion import coerce_value
from datalakeingestionservice_spark.pipeline.scheduler import CronSchedule
from datalakeingestionservice_spark.sinks.ctl import CtlRecord, combined_checksum

# --- cron ------------------------------------------------------------------

cron_minutes = st.integers(0, 59)
cron_hours = st.integers(0, 23)
base_times = st.datetimes(
    min_value=datetime(2020, 1, 1), max_value=datetime(2030, 1, 1)
)


@given(minute=cron_minutes, hour=cron_hours, after=base_times)
@settings(max_examples=50, deadline=None)
def test_cron_next_fire_matches_its_own_schedule(minute, hour, after):
    s = CronSchedule(f"0 {minute} {hour} * * ?")
    nxt = s.next_fire(after)
    assert nxt > after
    assert s.matches(nxt)
    assert nxt.minute == minute and nxt.hour == hour and nxt.second == 0
    # Nothing earlier fires: the same daily schedule can't fire twice in a day
    # before nxt (spot-check the day boundary).
    assert nxt - after <= timedelta(days=1, seconds=1)


@given(step=st.integers(1, 30), after=base_times)
@settings(max_examples=50, deadline=None)
def test_cron_step_schedules_fire_on_multiples(step, after):
    s = CronSchedule(f"0 */{step} * * * ?")
    nxt = s.next_fire(after)
    assert nxt.minute % step == 0
    assert s.matches(nxt)


# --- CTL CSV escaping ------------------------------------------------------

field_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=50
)


@given(dataset=field_text, source=field_text, count=st.integers(0, 10**12))
@settings(max_examples=100, deadline=None)
def test_ctl_csv_roundtrips_through_a_csv_parser(dataset, source, count):
    record = CtlRecord(
        record_count=count,
        ref_date="2026-01-01T00:00:00",
        checksum="ab" * 32,
        timestamp="2026-01-01T00:00:00",
        dataset_name=dataset,
        source=source,
    )
    rows = list(csv.reader(io.StringIO(record.to_csv())))
    assert rows[0] == CtlRecord.HEADER.split(",")
    parsed = rows[1]
    assert parsed[0] == str(count)
    # RFC-4180 escaping must round-trip arbitrary content (newlines in fields
    # are quoted, so csv.reader reassembles them):
    assert parsed[4] == dataset.replace("\r\n", "\n").replace("\r", "\n") or parsed[4] == dataset
    assert parsed[5] == source.replace("\r\n", "\n").replace("\r", "\n") or parsed[5] == source


# --- checksum --------------------------------------------------------------


@given(blobs=st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=6))
@settings(max_examples=50, deadline=None)
def test_combined_checksum_is_order_independent(tmp_path_factory, blobs):
    d = tmp_path_factory.mktemp("ck")
    paths = []
    for i, blob in enumerate(blobs):
        p = d / f"part-{i}.parquet"
        p.write_bytes(blob)
        paths.append(str(p))
    fwd = combined_checksum(paths)
    rev = combined_checksum(list(reversed(paths)))
    assert fwd == rev
    if len(paths) == 1:
        assert fwd == hashlib.sha256(blobs[0]).hexdigest()


# --- coercion --------------------------------------------------------------


@given(n=st.integers(-(10**15), 10**15))
def test_coercion_integers_roundtrip(n):
    assert coerce_value(str(n)) == n


@given(x=st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_coercion_floats_parse(x):
    out = coerce_value(repr(float(x)))
    assert isinstance(out, (int, float))


@given(s=st.text(max_size=30))
@settings(max_examples=100)
def test_coercion_never_raises(s):
    coerce_value(s)  # any string must coerce to something without raising
