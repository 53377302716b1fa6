"""File creation time (O24) — the reference's ``crtime`` helper re-expressed.

Reference: client/datalake/crtime.py:24-61 shells out to a setuid-root
``crtime`` binary (https://github.com/planetlabs/crtime) because Linux
exposes no portable birth-time API, and keeps the facility injectable for
tests.  Here the default facility is pure stdlib, tried in order:

1. ``os.stat().st_birthtime`` — present on macOS/BSD (and some Python
   builds on filesystems that surface it);
2. the Linux ``statx(2)`` glibc wrapper via ctypes with ``STATX_BTIME`` —
   real birth time on ext4/xfs/btrfs without any setuid helper;
3. :class:`CreationTimeError` — same failure contract as the reference when
   the kernel/filesystem cannot answer.

``get_crtime`` keeps the reference's injectable ``crtime_facility``
signature and seconds-since-epoch return; the CLI's ``--start crtime``
evaluation (reference cli.py:153-158) multiplies by 1000 into epoch-ms.
"""

from __future__ import annotations

import ctypes
import os


class CreationTimeError(Exception):
    pass


def _crtime_stat(path: str) -> float:
    st = os.stat(path)
    bt = getattr(st, "st_birthtime", None)
    if bt is None:
        raise CreationTimeError(f"st_birthtime not available for {path}")
    return float(bt)


# statx(2) constants/layout (linux/stat.h) — stable kernel ABI
_AT_FDCWD = -100
_STATX_BTIME = 0x800


class _StatxTimestamp(ctypes.Structure):
    _fields_ = [
        ("tv_sec", ctypes.c_int64),
        ("tv_nsec", ctypes.c_uint32),
        ("__reserved", ctypes.c_int32),
    ]


class _Statx(ctypes.Structure):
    _fields_ = [
        ("stx_mask", ctypes.c_uint32),
        ("stx_blksize", ctypes.c_uint32),
        ("stx_attributes", ctypes.c_uint64),
        ("stx_nlink", ctypes.c_uint32),
        ("stx_uid", ctypes.c_uint32),
        ("stx_gid", ctypes.c_uint32),
        ("stx_mode", ctypes.c_uint16),
        ("__spare0", ctypes.c_uint16 * 1),
        ("stx_ino", ctypes.c_uint64),
        ("stx_size", ctypes.c_uint64),
        ("stx_blocks", ctypes.c_uint64),
        ("stx_attributes_mask", ctypes.c_uint64),
        ("stx_atime", _StatxTimestamp),
        ("stx_btime", _StatxTimestamp),
        ("stx_ctime", _StatxTimestamp),
        ("stx_mtime", _StatxTimestamp),
        ("__spare1", ctypes.c_uint64 * 16),
    ]


def _crtime_statx(path: str) -> float:
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        statx = libc.statx
    except (OSError, AttributeError) as e:  # no glibc statx wrapper
        raise CreationTimeError(f"statx unavailable: {e}")
    buf = _Statx()
    rc = statx(
        ctypes.c_int(_AT_FDCWD),
        os.fsencode(path),
        ctypes.c_int(0),
        ctypes.c_uint(_STATX_BTIME),
        ctypes.byref(buf),
    )
    if rc != 0:
        err = ctypes.get_errno()
        raise CreationTimeError(f"statx({path}) failed: {os.strerror(err)}")
    if not buf.stx_mask & _STATX_BTIME:
        raise CreationTimeError(
            f"filesystem reports no birth time for {path}"
        )
    return buf.stx_btime.tv_sec + buf.stx_btime.tv_nsec / 1e9


def _crtime_default(path: str) -> float:
    if not os.path.exists(path):
        raise IOError("No such file " + path)
    try:
        return _crtime_stat(path)
    except CreationTimeError:
        return _crtime_statx(path)


DEFAULT_CRTIME_FACILITY = _crtime_default


def get_crtime(f: str, crtime_facility=DEFAULT_CRTIME_FACILITY) -> float:
    """Creation time of ``f`` in seconds since the epoch (reference
    crtime.py:54-61 contract, injectable facility included)."""
    return crtime_facility(f)
