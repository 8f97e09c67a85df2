"""JSONL ingest: raw OTTO ``train.jsonl``/``test.jsonl`` -> EventStore.

Replaces src/utilities/dataset_writer_pickle.py (streamed pandas read_json +
pure-Python per-event explode).  The hot path is a native C++ scanner
(otto_tpu/native/jsonl_parser.cc) compiled on first use and loaded via
ctypes; a pure-Python fallback handles environments without a compiler.
"""

from __future__ import annotations

import ctypes
import json
import subprocess
from pathlib import Path

import numpy as np

from otto_tpu.data.events import EventStore
from otto_tpu.logging_utils import get_logger

log = get_logger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libotto_jsonl.so"
_TYPE_DICT = {"clicks": 0, "carts": 1, "orders": 2}
_lib = None


def _build_native() -> Path | None:
    src = _NATIVE_DIR / "jsonl_parser.cc"
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(_SO_PATH), str(src)],
            check=True,
            capture_output=True,
        )
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.warning("native jsonl parser build failed (%s); using python fallback", e)
        return None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    so = _build_native()
    if so is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(str(so))
    lib.otto_parse_file.restype = ctypes.c_void_p
    lib.otto_parse_file.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.otto_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int8),
    ]
    lib.otto_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def _parse_native(path: str) -> tuple[np.ndarray, ...] | None:
    lib = _load_native()
    if lib is False:
        return None
    n = ctypes.c_int64()
    handle = lib.otto_parse_file(str(path).encode(), ctypes.byref(n))
    if not handle or n.value < 0:
        return None
    session = np.empty(n.value, np.int64)
    aid = np.empty(n.value, np.int32)
    ts = np.empty(n.value, np.int64)
    typ = np.empty(n.value, np.int8)
    lib.otto_fill(
        handle,
        session.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        aid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        typ.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    lib.otto_free(handle)
    return session, aid, ts, typ


def _parse_python(path: str) -> tuple[np.ndarray, ...]:
    sessions, aids, tss, types = [], [], [], []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            s = row["session"]
            for ev in row["events"]:
                sessions.append(s)
                aids.append(ev["aid"])
                tss.append(ev["ts"])
                types.append(_TYPE_DICT[ev["type"]])
    return (
        np.asarray(sessions, np.int64),
        np.asarray(aids, np.int32),
        np.asarray(tss, np.int64),
        np.asarray(types, np.int8),
    )


def read_jsonl(path: str | Path, ts_unit: str = "ms") -> EventStore:
    """Parse an OTTO JSONL file into an EventStore.

    ``ts_unit='ms'`` divides millisecond timestamps down to seconds (the
    reference later does ``ts / 1000`` in several places,
    e.g. interaction_feature_engineering.py:46)."""
    parsed = _parse_native(path)
    if parsed is None:
        parsed = _parse_python(path)
    session, aid, ts, typ = parsed
    if ts_unit == "ms":
        ts = ts // 1000
    log.info("ingested %s: %d events, %d sessions", path, len(aid), len(np.unique(session)))
    return EventStore.from_flat(session, aid, ts, typ)
