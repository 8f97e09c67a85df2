"""Large-scale covisitation-build run (VERDICT round-1 item 2).

Generates a >=50M-event v2 synthetic dataset and runs the bounded-memory
covisitation build, recording wall time, events/s, dispatch-vs-drain split,
accumulator compaction stats, and peak RSS.  Writes JSON to --out.

Usage: python tools/covisit_scale.py [--events 50e6] [--budget-rows 64e6]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=float, default=50e6)
    ap.add_argument("--aids", type=int, default=500_000)
    ap.add_argument("--budget-rows", type=float, default=64e6)
    ap.add_argument("--per-aid-cap", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="/tmp/covisit_scale.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from otto_tpu.data.synthetic import synthetic_events_v2
    from otto_tpu.models.covisitation import build_covisitation

    mean_len = 11.0
    n_sessions = int(args.events / (mean_len + 1))
    t0 = time.time()
    store = synthetic_events_v2(
        n_sessions=n_sessions, n_aids=args.aids, mean_length=mean_len, seed=args.seed
    )
    gen_s = time.time() - t0
    print(f"# data: {store} in {gen_s:.0f}s", flush=True)
    rss_after_gen = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    t0 = time.time()
    mats = build_covisitation(
        store, args.aids,
        budget_rows=int(args.budget_rows), per_aid_cap=args.per_aid_cap,
    )
    build_s = time.time() - t0
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    filled = {k: int((t[0] >= 0).sum()) for k, t in mats.tables.items()}
    result = {
        "n_events": int(store.n_events),
        "n_sessions": int(store.n_sessions),
        "n_aids": args.aids,
        "budget_rows": int(args.budget_rows),
        "per_aid_cap": args.per_aid_cap,
        "build_s": round(build_s, 1),
        "events_per_s": round(store.n_events / build_s, 0),
        "rss_after_gen_gb": round(rss_after_gen, 2),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "table_fill": filled,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
