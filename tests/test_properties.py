"""Property-based tests (hypothesis) for the pure metadata semantics — the
reference's tightest spec (client/datalake/common/metadata.py:26-224,
record.py:151-192).  No SparkSession needed; these pin the driver-side rules
the distributed Column expressions must agree with."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# examples are pure-python microtests, but the suite shares a machine with a
# busy local Spark JVM — wall-clock deadlines flake under load
settings.register_profile("no_deadline", deadline=None)
settings.load_profile("no_deadline")

from datalake_spark.metadata import (
    DAY_MS,
    MAX_BUCKET_SPAN,
    MS_CUTOFF,
    InvalidDatalakeMetadata,
    Metadata,
    UnsupportedTimeRange,
    bucket_span,
    normalize_date,
    time_bucket,
    time_buckets,
)

# epoch-ms above the s/ms cutoff (~1973) up to 2100 — values below MS_CUTOFF
# are *by design* read as seconds (metadata.py:26-28), tested separately
MS = st.integers(min_value=MS_CUTOFF + 1, max_value=4_102_444_800_000)
SLUG = st.from_regex(r"[a-z0-9_-]{1,20}", fullmatch=True)


class TestNormalizeDate:
    @given(MS)
    def test_ms_roundtrip(self, ms):
        # numbers above the cutoff are already epoch-ms
        assert normalize_date(ms) == ms

    @given(st.integers(min_value=1, max_value=MS_CUTOFF // 1000))
    def test_seconds_scaled(self, s):
        assert normalize_date(s) == s * 1000

    @given(MS)
    def test_string_number_equals_number(self, ms):
        assert normalize_date(str(ms)) == normalize_date(ms)

    @given(MS)
    def test_datetime_roundtrip(self, ms):
        dt = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        assert normalize_date(dt) == ms

    @given(MS)
    def test_naive_datetime_is_utc(self, ms):
        aware = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        naive = aware.replace(tzinfo=None)
        assert normalize_date(naive) == ms

    @given(MS)
    def test_iso_string(self, ms):
        dt = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
        assert normalize_date(dt.isoformat()) == ms

    def test_rejects_none_and_garbage(self):
        for bad in (None, "not a date", object()):
            with pytest.raises(InvalidDatalakeMetadata):
                normalize_date(bad)


class TestBucketMath:
    @given(MS)
    def test_bucket_contains_its_timestamp(self, ms):
        b = time_bucket(ms)
        assert b * DAY_MS <= ms < (b + 1) * DAY_MS

    @given(MS, st.integers(min_value=0, max_value=29 * DAY_MS))
    def test_buckets_cover_interval_contiguously(self, start, dur):
        bs = time_buckets(start, start + dur)
        assert bs[0] == time_bucket(start)
        assert bs[-1] == time_bucket(start + dur)
        assert bs == list(range(bs[0], bs[-1] + 1))

    @given(MS)
    def test_null_end_is_single_bucket(self, start):
        assert time_buckets(start, None) == [time_bucket(start)]
        assert bucket_span(start, None) == 1


class TestMetadataValidation:
    @settings(max_examples=50)
    @given(MS, st.integers(min_value=0, max_value=2 * DAY_MS), SLUG, SLUG)
    def test_valid_roundtrip(self, start, dur, what, where):
        m = Metadata(
            start=start,
            end=start + dur,
            what=what,
            where=where,
            hash="abc123",
            path="/var/log/x",
            work_id=None,
        )
        assert m["start"] == start and m["end"] == start + dur
        assert m["version"] == 0 and len(m["id"]) == 32

    @given(MS, st.integers(min_value=1, max_value=DAY_MS))
    def test_end_before_start_rejected(self, start, delta):
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(
                start=start, end=start - delta, what="a", where="b",
                hash="h", path="/p", work_id=None,
            )

    @given(MS)
    def test_over_30_buckets_rejected(self, start):
        # guarantee span > 30 regardless of alignment
        end = start + (MAX_BUCKET_SPAN + 1) * DAY_MS
        with pytest.raises(UnsupportedTimeRange):
            Metadata(
                start=start, end=end, what="a", where="b",
                hash="h", path="/p", work_id=None,
            )

    def test_work_id_rules(self):
        base = dict(start=1, end=2, what="a", where="b", hash="h", path="/p")
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base)  # work_id key must exist
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base, work_id="null")  # literal "null" forbidden
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base, work_id="UPPER")  # slug rule
        assert Metadata(**base, work_id=None)["work_id"] is None

    def test_path_must_be_absolute(self):
        base = dict(start=1, end=2, what="a", where="b", hash="h", work_id=None)
        with pytest.raises(InvalidDatalakeMetadata):
            Metadata(**base, path="relative/path")
        assert Metadata(**base, path="C:\\logs\\x")["path"].startswith("C:")


class TestColumnTwins:
    """The distributed Column expressions must agree with the driver-side
    Python semantics on the same inputs."""

    def test_normalize_and_buckets_agree(self, spark):
        import random

        from pyspark.sql import functions as F

        from datalake_spark.functions.datetime_fns import (
            bucket_span_col,
            normalize_epoch_col,
            time_bucket_col,
        )

        rng = random.Random(7)
        values = (
            [rng.randint(1, MS_CUTOFF // 1000) for _ in range(50)]          # seconds
            + [rng.randint(MS_CUTOFF + 1, 4_102_444_800_000) for _ in range(50)]  # ms
        )
        df = spark.createDataFrame([(v,) for v in values], ["v"])
        got = df.select(
            "v",
            normalize_epoch_col("v").alias("ms"),
            time_bucket_col(normalize_epoch_col("v")).alias("b"),
            bucket_span_col(
                normalize_epoch_col("v"),
                normalize_epoch_col("v") + F.lit(3 * DAY_MS),
            ).alias("span"),
        ).collect()
        for r in got:
            expect_ms = normalize_date(r["v"])
            assert r["ms"] == expect_ms
            assert r["b"] == time_bucket(expect_ms)
            assert r["span"] == bucket_span(expect_ms, expect_ms + 3 * DAY_MS)

    def test_iso_rendering(self, spark):
        from datalake_spark.functions.datetime_fns import iso8601_col

        df = spark.createDataFrame([(1420070400123,), (None,)], "v: long")
        got = [r["iso"] for r in df.select(iso8601_col("v").alias("iso")).collect()]
        assert got[0] == "2015-01-01T00:00:00.123Z"
        assert got[1] is None


class TestCursorProperties:
    """The opaque page token must round-trip any keyset position and reject
    any corruption — driver-side pure functions, so hypothesis can sweep."""

    @given(
        st.integers(min_value=0, max_value=2**62),
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
            max_size=64,
        ),
    )
    def test_roundtrip(self, start, doc_id):
        from datalake_spark.query import decode_cursor, encode_cursor

        # ids flow through JSON, so any unicode string must survive
        token = encode_cursor(start, doc_id)
        assert "=" not in token and "\n" not in token
        assert decode_cursor(token) == {"last_start": start, "last_id": doc_id}

    @given(st.text(max_size=40))
    def test_garbage_never_crashes_differently(self, junk):
        from datalake_spark.query import InvalidCursor, decode_cursor

        try:
            out = decode_cursor(junk)
        except InvalidCursor:
            return
        # anything that decodes must be a well-formed cursor dict
        assert isinstance(out, dict)
        assert "last_start" in out and "last_id" in out


class TestConfParserProperties:
    """The dotenv-less config parser must read back any KEY=VALUE it could
    plausibly be given: quoting, export prefixes, comments and blank lines
    (reference config_helpers semantics)."""

    KEY = st.from_regex(r"[A-Z][A-Z0-9_]{0,15}", fullmatch=True)
    VAL = st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters="\n\r#'\"", min_codepoint=32
        ),
        max_size=30,
    ).map(str.strip)

    @given(st.lists(st.tuples(KEY, VAL), max_size=8),
           st.sampled_from(["", "export "]),
           st.sampled_from(["", "'", '"']))
    def test_roundtrip(self, pairs, prefix, quote):
        import tempfile

        from datalake_spark.conf import _parse_env_file

        with tempfile.NamedTemporaryFile("w", suffix=".env", delete=False) as fh:
            fh.write("# header comment\n\n")
            for k, v in pairs:
                fh.write(f"{prefix}{k}={quote}{v}{quote}\n")
            path = fh.name
        got = dict(_parse_env_file(path))
        want = {}
        for k, v in pairs:  # later duplicates win, like the parser's dict use
            want[k] = v
        assert {k: got[k] for k in want} == want


class TestGifCodecProperties:
    """Encode→decode identity for the stdlib GIF LZW codec over arbitrary
    frame shapes, palette sizes and pixel content (frame sizes straddle the
    126-pixel clear-code span where the off-by-one lives)."""

    @given(
        st.integers(min_value=1, max_value=17),   # h
        st.integers(min_value=1, max_value=23),   # w
        st.integers(min_value=1, max_value=128),  # palette size
        st.integers(min_value=1, max_value=3),    # frames
        st.integers(),                            # pixel seed
    )
    @settings(max_examples=30)
    def test_roundtrip_identity(self, h, w, npal, nf, seed):
        import numpy as np

        from datalake_spark.functions.imaging import gif_encode, gif_frames

        rng = np.random.RandomState(abs(seed) % 2**31)
        pal = rng.randint(0, 256, size=(npal, 3)).astype(np.uint8)
        frames = [
            rng.randint(0, npal, size=(h, w)).astype(np.uint8)
            for _ in range(nf)
        ]
        out = gif_frames(gif_encode(frames, pal, delay_ms=130))
        assert len(out) == nf
        for j, (delay, rgb) in enumerate(out):
            assert delay == 130
            assert np.array_equal(rgb, pal[frames[j]])


class TestJpegCodecProperties:
    """Hypothesis sweep of the baseline JPEG codec (functions/jpeg.py):
    arbitrary dimensions/content must survive encode→decode within the
    quantization error budget, and flat blocks must reconstruct flat."""

    @settings(max_examples=30, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        chans=st.sampled_from([1, 3]),
        subsample=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_error_budget(self, h, w, chans, subsample, seed):
        import numpy as np

        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, chans), dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(img, quality=95, subsample=subsample))
        assert out.shape == (h, w, 3)
        ref = img if chans == 3 else np.repeat(img, 3, axis=2)
        err = np.abs(out.astype(int) - ref.astype(int))
        if chans == 1 or not subsample:
            # q95 quantization: worst observed max err 19 on noise; 32 is
            # the hard budget.  (4:2:0 on noise images is excluded — 2x2
            # chroma averaging legitimately discards high-frequency color,
            # so per-pixel bounds don't apply; the luma channel is covered
            # by the Y-preservation check below.)
            assert err.max() <= 32
            assert err.mean() <= 24
        else:
            y_ref = (0.299 * ref[:, :, 0] + 0.587 * ref[:, :, 1]
                     + 0.114 * ref[:, :, 2])
            y_out = (0.299 * out[:, :, 0] + 0.587 * out[:, :, 1]
                     + 0.114 * out[:, :, 2])
            assert np.abs(y_out - y_ref).mean() <= 24

    @settings(max_examples=30, deadline=None)
    @given(
        v=st.integers(0, 255),
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        quality=st.sampled_from([50, 75, 90, 95]),
    )
    def test_flat_gray_stays_flat(self, v, h, w, quality):
        import numpy as np

        from datalake_spark.functions.jpeg import jpeg_decode, jpeg_encode

        flat = np.full((h, w, 1), v, dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(flat, quality=quality))
        assert len(np.unique(out)) == 1
        # DC quant step q00 bounds the reconstruction offset
        q00 = {50: 16, 75: 8, 90: 3, 95: 1}[quality]
        assert abs(int(out[0, 0, 0]) - v) <= q00 // 2 + 1
