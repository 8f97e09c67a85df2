"""JSONL ingest dress rehearsal (VERDICT r2 item 7 / missing #5).

Real OTTO data is absent from this environment, so this generates an
OTTO-format ``train.jsonl`` (>= 10M events by default) from the v2
synthetic, then round-trips it through the production ingest path:

  jsonl --native C++ parser--> EventStore --chunked parquet--> EventStore
        --> frequency stats + covisit heuristic smoke

recording events/s for the native parser, the pure-Python fallback (on a
subsample — the reference's ingest is a pure-Python explode,
src/utilities/dataset_writer_pickle.py:11-65), and the parquet round trip,
plus exact array-equality checks at each hop.  Writes INGEST_REHEARSAL.json.

Usage: python tools/ingest_rehearsal.py [--events 10000000] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

TYPE_NAMES = ("clicks", "carts", "orders")


def write_jsonl(store, path: pathlib.Path, ts_ms: bool = True) -> float:
    """Emit the reference's raw format: one session per line,
    {"session": id, "events": [{"aid","ts","type"}...]}."""
    t0 = time.time()
    mult = 1000 if ts_ms else 1
    with open(path, "w") as f:
        buf = []
        for s in range(store.n_sessions):
            lo, hi = store.offsets[s], store.offsets[s + 1]
            evs = ",".join(
                f'{{"aid":{int(a)},"ts":{int(t) * mult},"type":"{TYPE_NAMES[ty]}"}}'
                for a, t, ty in zip(store.aid[lo:hi], store.ts[lo:hi], store.type[lo:hi])
            )
            buf.append(f'{{"session":{int(store.session_ids[s])},"events":[{evs}]}}\n')
            if len(buf) >= 20_000:
                f.write("".join(buf))
                buf.clear()
        f.write("".join(buf))
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--aids", type=int, default=200_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="INGEST_REHEARSAL.json")
    ap.add_argument("--workdir", type=str, default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from otto_tpu.data.ingest import _parse_python, read_jsonl
    from otto_tpu.data.synthetic import synthetic_events_v2
    from otto_tpu.data.writers import read_chunked_parquet, write_chunked_parquet
    from otto_tpu.models.covisitation import build_covisitation
    from otto_tpu.models.frequency import FrequencyStatistics

    results: dict = {"config": vars(args)}
    workdir = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="otto_ingest_"))
    workdir.mkdir(parents=True, exist_ok=True)

    # mean session length ~13 in the v2 synthetic
    n_sessions = max(args.events // 13, 1000)
    t0 = time.time()
    store = synthetic_events_v2(n_sessions=n_sessions, n_aids=args.aids, seed=args.seed)
    results["n_events"] = int(store.n_events)
    results["n_sessions"] = int(store.n_sessions)
    print(f"# generated {store.n_events} events / {store.n_sessions} sessions "
          f"({time.time()-t0:.0f}s)", flush=True)

    jsonl = workdir / "train.jsonl"
    w_s = write_jsonl(store, jsonl)
    size_mb = jsonl.stat().st_size / 1e6
    results["jsonl_write_s"] = round(w_s, 1)
    results["jsonl_mb"] = round(size_mb, 1)
    print(f"# wrote {jsonl} ({size_mb:.0f} MB, {w_s:.0f}s)", flush=True)

    # ---- native parse (production path) ----------------------------------
    from otto_tpu.data.ingest import _parse_native

    t0 = time.time()
    parsed = _parse_native(str(jsonl))
    parse_only_s = time.time() - t0
    if parsed is not None:
        results["native_parse_only_s"] = round(parse_only_s, 2)
        results["native_parse_only_events_per_s"] = round(len(parsed[0]) / parse_only_s, 0)
    t0 = time.time()
    es = read_jsonl(jsonl, ts_unit="ms")
    native_s = time.time() - t0
    results["native_parse_s"] = round(native_s, 1)
    results["native_events_per_s"] = round(es.n_events / native_s, 0)
    print(f"# native parse+store: {native_s:.1f}s "
          f"({es.n_events / native_s / 1e6:.2f}M ev/s; parse only "
          f"{len(parsed[0]) / parse_only_s / 1e6 if parsed else 0:.2f}M ev/s)",
          flush=True)

    assert es.n_events == store.n_events, (es.n_events, store.n_events)
    np.testing.assert_array_equal(es.aid, store.aid)
    np.testing.assert_array_equal(es.type, store.type)
    np.testing.assert_array_equal(es.ts, store.ts)
    np.testing.assert_array_equal(es.session_ids, store.session_ids)
    results["native_roundtrip_exact"] = True

    # ---- python fallback on a subsample (reference-style explode) --------
    sub = workdir / "sub.jsonl"
    n_sub_lines = 40_000
    with open(jsonl) as f, open(sub, "w") as g:
        for i, line in enumerate(f):
            if i >= n_sub_lines:
                break
            g.write(line)
    t0 = time.time()
    py = _parse_python(str(sub))
    py_s = time.time() - t0
    py_events = len(py[0])
    results["python_events_per_s"] = round(py_events / py_s, 0)
    fast = results.get("native_parse_only_events_per_s",
                       results["native_events_per_s"])
    results["native_vs_python_speedup"] = round(
        fast / results["python_events_per_s"], 1
    )
    print(f"# python fallback: {py_events / py_s / 1e6:.3f}M ev/s "
          f"(native is {results['native_vs_python_speedup']}x)", flush=True)

    # ---- chunked parquet round trip --------------------------------------
    pq_dir = workdir / "parquet"
    t0 = time.time()
    write_chunked_parquet(es, pq_dir, chunk_sessions=100_000)
    pw_s = time.time() - t0
    t0 = time.time()
    es2 = read_chunked_parquet(pq_dir)
    pr_s = time.time() - t0
    np.testing.assert_array_equal(es2.aid, es.aid)
    np.testing.assert_array_equal(es2.ts, es.ts)
    np.testing.assert_array_equal(es2.session_ids, es.session_ids)
    results["parquet_write_s"] = round(pw_s, 1)
    results["parquet_read_s"] = round(pr_s, 1)
    results["parquet_roundtrip_exact"] = True
    print(f"# parquet: write {pw_s:.0f}s read {pr_s:.0f}s (exact)", flush=True)

    # ---- pipeline smoke over the ingested store --------------------------
    t0 = time.time()
    stats = FrequencyStatistics.compute(es2, n_aids=args.aids)
    results["frequency_stats_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    mats = build_covisitation(es2, args.aids)
    results["covisit_build_s"] = round(time.time() - t0, 1)
    results["covisit_build_events_per_s"] = round(es2.n_events / (time.time() - t0), 0)
    results["top_click_aid"] = int(stats.top_by_type["clicks"][0])
    results["covisit_nonempty_rows"] = int(
        (mats.tables["time_weighted"][0][:, 0] >= 0).sum()
    )
    print(f"# pipeline smoke: freq {results['frequency_stats_s']}s, "
          f"covisit {results['covisit_build_s']}s", flush=True)

    if not args.workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
