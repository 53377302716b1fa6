"""Metadata validation + timestamp normalization semantics.

Reproduces (independently, in new code) the semantics of the reference's
``Metadata`` class — client/datalake/common/metadata.py:52-224 — and the
time-bucket math of client/datalake/common/record.py:151-192.  These rules are
the system's only fixed schema, so they're implemented as pure Python (used at
ingest/validation time, driver-side) plus Column-expression equivalents in
:mod:`datalake_spark.functions.datetime_fns` for distributed use.

Key semantics (SURVEY.md §1.2):
- timestamps land as int epoch-milliseconds, UTC
- numeric inputs > 1e11 are already ms, otherwise seconds (metadata.py:26-28)
- naive datetimes are assumed UTC (metadata.py:215-219)
- ``end`` may be null (instant file) but if present must be >= start
- ``what``/``where`` must match ``^[a-z0-9_-]+$``; ``work_id`` too, and the
  literal string "null" is forbidden (metadata.py:124-152)
- ``path`` must be absolute, POSIX or Windows (metadata.py:154-161)
- a file may span at most 30 one-day time buckets (record.py:162-182)
"""

from __future__ import annotations

import re
import uuid
from datetime import datetime, timezone, date
from typing import Any

DAY_MS = 24 * 60 * 60 * 1000  # record.py:151-160: bucket = 1 day of ms
MAX_BUCKET_SPAN = 30  # record.py:169
# numbers above this are epoch-ms, below are epoch-s (metadata.py:26-28)
MS_CUTOFF = 100_000_000_000

_SLUG_RE = re.compile(r"^[a-z0-9_-]+$")
_WINDOWS_PATH_RE = re.compile(r"^[A-Za-z]:\\")


class InvalidDatalakeMetadata(ValueError):
    """Raised when a metadata document fails validation."""


class UnsupportedTimeRange(InvalidDatalakeMetadata):
    """File interval spans more than MAX_BUCKET_SPAN day-buckets."""


def normalize_date(value: Any) -> int:
    """Normalize a polymorphic date input to int epoch-ms (UTC).

    Accepts datetime/date, the string "now", ISO-ish strings, and numbers
    (s-vs-ms heuristic at 1e11).
    """
    if value is None:
        raise InvalidDatalakeMetadata("date must not be None")
    if isinstance(value, datetime):
        return _datetime_to_ms(value)
    if isinstance(value, date):
        return _datetime_to_ms(datetime(value.year, value.month, value.day))
    if isinstance(value, bool):
        raise InvalidDatalakeMetadata(f"invalid date {value!r}")
    if isinstance(value, (int, float)):
        return _number_to_ms(value)
    if isinstance(value, str):
        s = value.strip()
        if s.lower() == "now":
            return int(datetime.now(timezone.utc).timestamp() * 1000)
        try:
            return _number_to_ms(float(s))
        except ValueError:
            pass
        try:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError as e:
            raise InvalidDatalakeMetadata(f"unparseable date {value!r}") from e
        return _datetime_to_ms(dt)
    raise InvalidDatalakeMetadata(f"invalid date {value!r}")


def _number_to_ms(n: float) -> int:
    # > 1e11 → already milliseconds; else seconds (metadata.py:196-203)
    if n > MS_CUTOFF:
        return int(round(n))
    return int(round(n * 1000))


def _datetime_to_ms(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)  # naive = UTC (metadata.py:215-219)
    return int(round(dt.timestamp() * 1000))


def _validate_slug(name: str, value: Any, allow_null: bool = False) -> None:
    if value is None:
        if allow_null:
            return
        raise InvalidDatalakeMetadata(f"{name} is required")
    if not isinstance(value, str) or not _SLUG_RE.match(value):
        raise InvalidDatalakeMetadata(
            f"{name}={value!r} must match {_SLUG_RE.pattern}"
        )


def _validate_path(p: Any) -> None:
    if not isinstance(p, str) or not (p.startswith("/") or _WINDOWS_PATH_RE.match(p)):
        raise InvalidDatalakeMetadata(f"path {p!r} must be absolute")


class Metadata(dict):
    """Validated, normalized metadata document (version 0)."""

    VERSION = 0

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        self.setdefault("version", self.VERSION)
        if self.get("id") is None:
            self["id"] = uuid.uuid4().hex  # metadata.py:93-95
        self._validate()

    def _validate(self) -> None:
        if self.get("version") != self.VERSION:  # metadata.py:117-122
            raise InvalidDatalakeMetadata(
                f"only version {self.VERSION} supported, got {self.get('version')!r}"
            )
        for f in ("start", "where", "what", "id", "hash", "path"):
            if self.get(f) is None:
                raise InvalidDatalakeMetadata(f"{f} is required")
        if "work_id" not in self:  # key must exist (metadata.py:142-152)
            raise InvalidDatalakeMetadata("work_id key is required (may be null)")
        _validate_slug("what", self["what"])
        _validate_slug("where", self["where"])
        wid = self["work_id"]
        if wid is not None:
            if wid == "null":  # literal "null" forbidden (metadata.py:147-150)
                raise InvalidDatalakeMetadata('work_id must not be the string "null"')
            _validate_slug("work_id", wid)
        _validate_path(self["path"])
        self["start"] = normalize_date(self["start"])
        if self.get("end") is not None:
            self["end"] = normalize_date(self["end"])
            if self["end"] < self["start"]:  # metadata.py:175-178
                raise InvalidDatalakeMetadata("end must be >= start")
        else:
            self["end"] = None
        # bucket-span bound (record.py:162-182)
        if bucket_span(self["start"], self["end"]) > MAX_BUCKET_SPAN:
            raise UnsupportedTimeRange(
                f"file spans more than {MAX_BUCKET_SPAN} day buckets"
            )


def time_bucket(ms: int) -> int:
    """Day-bucket index of an epoch-ms timestamp (record.py:151-160)."""
    return ms // DAY_MS


def time_buckets(start: int, end: int | None) -> list[int]:
    """All day buckets an interval touches, inclusive (record.py:184-192)."""
    return list(range(time_bucket(start), time_bucket(end if end is not None else start) + 1))


def bucket_span(start: int, end: int | None) -> int:
    return len(time_buckets(start, end))
