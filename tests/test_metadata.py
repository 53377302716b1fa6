"""Metadata validation matrix — ported behaviors from the reference's
client/datalake/tests/test_metadata.py:9-188 and test_record.py:24-110."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from datalake_spark.metadata import (
    DAY_MS,
    InvalidDatalakeMetadata,
    Metadata,
    UnsupportedTimeRange,
    bucket_span,
    normalize_date,
    time_buckets,
)


def base(**over):
    m = {
        "version": 0,
        "start": 1420070400000,
        "end": 1420156800000,
        "what": "nginx",
        "where": "host1",
        "id": "abc123",
        "hash": "deadbeef",
        "path": "/var/log/nginx.log",
        "work_id": None,
    }
    m.update(over)
    return m


class TestNormalizeDate:
    def test_ms_passthrough(self):
        assert normalize_date(1420070400000) == 1420070400000

    def test_seconds_heuristic(self):
        # below the 1e11 cutoff -> seconds (metadata.py:26-28)
        assert normalize_date(1420070400) == 1420070400000

    def test_float_seconds(self):
        assert normalize_date(1420070400.5) == 1420070400500

    def test_datetime_aware(self):
        dt = datetime(2015, 1, 1, tzinfo=timezone.utc)
        assert normalize_date(dt) == 1420070400000

    def test_datetime_naive_is_utc(self):
        assert normalize_date(datetime(2015, 1, 1)) == 1420070400000

    def test_iso_string(self):
        assert normalize_date("2015-01-01T00:00:00Z") == 1420070400000

    def test_numeric_string(self):
        assert normalize_date("1420070400") == 1420070400000

    def test_now(self):
        import time

        assert abs(normalize_date("now") - time.time() * 1000) < 5000

    def test_garbage_raises(self):
        with pytest.raises(InvalidDatalakeMetadata):
            normalize_date("not-a-date")

    def test_none_raises(self):
        with pytest.raises(InvalidDatalakeMetadata):
            normalize_date(None)


class TestValidation:
    def test_valid(self):
        m = Metadata(**base())
        assert m["start"] == 1420070400000

    def test_wrong_version(self):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base(version=1))

    @pytest.mark.parametrize("field", ["start", "what", "where", "hash", "path"])
    def test_required_fields(self, field):
        b = base()
        b[field] = None
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**b)

    def test_missing_work_id_key(self):
        b = base()
        del b["work_id"]
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**b)

    def test_work_id_null_string_forbidden(self):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base(work_id="null"))

    @pytest.mark.parametrize("bad", ["UPPER", "has space", "ünïcode", ""])
    def test_slug_rules(self, bad):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base(what=bad))

    def test_relative_path_rejected(self):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base(path="var/log/x"))

    def test_windows_path_ok(self):
        assert Metadata(**base(path="C:\\logs\\x.log"))["path"].startswith("C:")

    def test_end_before_start(self):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base(end=1420070300000))

    def test_null_end_ok(self):
        assert Metadata(**base(end=None))["end"] is None

    def test_id_defaulted(self):
        b = base()
        b["id"] = None
        assert len(Metadata(**b)["id"]) == 32

    def test_over_30_buckets_rejected(self):
        with pytest.raises(UnsupportedTimeRange):
            Metadata(**base(end=1420070400000 + 31 * DAY_MS))


class TestBuckets:
    def test_single_bucket(self):
        assert time_buckets(100, 200) == [0]

    def test_span(self):
        # misaligned interval touching 3 buckets (record.py:184-192)
        s = int(2.5 * DAY_MS)
        e = int(4.1 * DAY_MS)
        assert time_buckets(s, e) == [2, 3, 4]

    def test_null_end_is_instant(self):
        assert time_buckets(int(1.5 * DAY_MS), None) == [1]

    def test_span_count(self):
        assert bucket_span(0, 29 * DAY_MS) == 30
