"""Ingest example (replaces the reference's otto-mors-dataset ingest notebook).

Parses raw OTTO JSONL (or generates synthetic data when no path is given),
builds the columnar EventStore, and writes chunked parquet.
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import sys

from otto_tpu.data.writers import write_chunked_parquet
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.logging_utils import configure_logging

configure_logging()

if len(sys.argv) > 1:
    from otto_tpu.data.ingest import read_jsonl

    store = read_jsonl(sys.argv[1])
else:
    store = synthetic_events(n_sessions=10_000, n_aids=2_000)

print(store)
print("lengths: mean %.1f max %d" % (store.lengths.mean(), store.lengths.max()))
write_chunked_parquet(store, "/tmp/otto_chunks", chunk_sessions=2_000)
