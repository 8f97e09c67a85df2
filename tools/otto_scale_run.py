"""OTTO-scale stage runs with device-time isolation (VERDICT r2 items 3+9).

Scale anchors: ~220M events, 14.57M sessions, 1.86M aids
(/root/reference/models/matrix_factorization/config.yaml:8-9).  Three phases,
independently selectable:

  probe  (TPU)   device-compute isolation: one chunk of each covisit-build
                 width and each heuristic-route program is timed with its
                 inputs RESIDENT on device (dispatch chains with a single
                 final fetch), and host<->device transfer of the same chunk
                 is timed separately — separating "the chip is slow" from
                 "the tunnel is slow" (round-1 weakness 2).  Projects a
                 device-only events/s for the full build.
  build  (CPU or TPU)  the full >=200M-event covisitation build, wall time +
                 dispatch/drain split + events/s.
  serve  (TPU)   heuristic + candidate generation over >=1M sessions,
                 sessions/s (the reference's hot loop,
                 src/covisitation/inference.py:143-247).

Usage:
  python tools/otto_scale_run.py --phases probe,serve --events 2e8 --aids 1855604
  python tools/otto_scale_run.py --phases build --platform cpu --events 2e8
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

MEAN_LEN = 11.0


def timed_chain(fn, args0, iters):
    """Per-iteration seconds for a device program whose inputs stay resident:
    warm once, then chain ``iters`` dispatches and force one final fetch."""
    out = fn(*args0)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    t1 = time.perf_counter()
    out = fn(*args0)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    t_one = time.perf_counter() - t1
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args0)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out)
    tn = time.perf_counter() - t0
    return max((tn - t_one) / max(iters - 1, 1), (tn / iters) * 0.5, 1e-9)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", type=str, default="probe,serve")
    ap.add_argument("--events", type=float, default=2e8)
    ap.add_argument("--aids", type=int, default=1_855_604)
    ap.add_argument("--serve-sessions", type=int, default=1_000_000)
    ap.add_argument("--chunk-sessions", type=int, default=2048,
                    help="serving chunk size; smaller chunks shrink the "
                         "per-program sort widths whose remote compile "
                         "dominates first-run cost on the tunneled platform")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--budget-rows", type=float, default=96e6)
    ap.add_argument("--store-npz", type=str, default="",
                    help="cache the build-phase event store here (load if "
                         "present, else datagen + save)")
    ap.add_argument("--out", type=str, default="OTTO_SCALE.json")
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from otto_tpu import EVENT_TYPES
    from otto_tpu.config import CovisitConfig
    from otto_tpu.data.synthetic import synthetic_events_v2
    from otto_tpu.models.covisitation import build_covisitation
    from otto_tpu.ops.covisit import compact_live, pair_stream, sort_reduce_rows

    results: dict = {"config": {k: (v if not isinstance(v, float) else v)
                                for k, v in vars(args).items()},
                     "platform": jax.default_backend()}
    out_path = pathlib.Path(args.out)

    def flush():
        out_path.write_text(json.dumps(results, indent=1))

    # ---------------- probe: device compute vs link -----------------------
    if "probe" in phases:
        T = CovisitConfig().session_tail
        chunk = 2048
        rng = np.random.default_rng(args.seed)
        probe = {}
        for t in (8, 16, T):
            lens = np.minimum(
                rng.geometric(1.0 / MEAN_LEN, size=chunk), t
            ).astype(np.int32)
            a = (rng.integers(0, args.aids, size=(chunk, t))).astype(np.int32)
            mk = np.arange(t)[None, :] < lens[:, None]
            ty = rng.integers(0, 3, size=(chunk, t)).astype(np.int8)
            rt = np.sort(rng.integers(0, 3600, size=(chunk, t)), axis=1).astype(np.int32)

            # link: host->device of this chunk's arrays, then device->host
            t0 = time.perf_counter()
            da, dty, drt, dmk = (jnp.asarray(a), jnp.asarray(ty),
                                 jnp.asarray(rt), jnp.asarray(mk))
            _ = np.asarray(da[0, 0])  # force materialization
            h2d_s = time.perf_counter() - t0
            nbytes = a.nbytes + ty.nbytes + rt.nbytes + mk.nbytes

            tail = (jnp.float32(3600.0),
                    jnp.asarray([1.0, 6.0, 3.0], jnp.float32),
                    jnp.int32(24 * 60 * 60), jnp.int32(14 * 24 * 60 * 60))

            def chunk_fn(a_, ty_, rt_, mk_):
                kx, ky, w = pair_stream(a_, ty_, rt_, mk_, args.aids, *tail)
                sx, sy, totals, live = sort_reduce_rows(
                    kx.reshape(chunk, t * t), ky.reshape(chunk, t * t),
                    w.reshape(chunk, t * t, -1),
                )
                return compact_live(sx, sy, totals, live, 1 << 16)

            dt = timed_chain(chunk_fn, (da, dty, drt, dmk), iters=8)
            ev_per_chunk = int(mk.sum())
            probe[f"width_{t}"] = {
                "device_s_per_chunk": round(dt, 5),
                "device_events_per_s": round(ev_per_chunk / dt, 0),
                "h2d_s": round(h2d_s, 4),
                "h2d_mb": round(nbytes / 1e6, 2),
                "h2d_mbps": round(nbytes / 1e6 / max(h2d_s, 1e-9), 1),
            }
            print(f"# probe width {t}: device {dt*1e3:.1f} ms/chunk "
                  f"({ev_per_chunk/dt/1e3:.0f}k ev/s device-only), "
                  f"h2d {nbytes/1e6:.1f} MB in {h2d_s:.2f}s", flush=True)

        # projected device-only build rate at the event-width mix of the v2
        # synthetic (short-session majority -> width-8 bucket dominates)
        results["probe"] = probe
        flush()

    # ---------------- full-scale build ------------------------------------
    if "build" in phases:
        n_sessions = int(args.events / (MEAN_LEN + 1))
        t0 = time.time()
        if args.store_npz and os.path.exists(args.store_npz):
            from otto_tpu.data.events import EventStore

            store = EventStore.load_npz(args.store_npz)
            print(f"# store loaded from {args.store_npz}", flush=True)
        else:
            store = synthetic_events_v2(
                n_sessions=n_sessions, n_aids=args.aids, mean_length=MEAN_LEN,
                seed=args.seed,
            )
            if args.store_npz:
                store.save_npz(args.store_npz)
        results["build_datagen_s"] = round(time.time() - t0, 1)
        results["build_n_events"] = int(store.n_events)
        results["build_n_sessions"] = int(store.n_sessions)
        # ONE event basis for partial AND final rates (ADVICE r4 #1): the
        # build processes session_tail-clipped packed events, so frac_done /
        # eta / events_per_s all divide by the packed total, not the raw
        # store.n_events a geometric-tail corpus inflates by a few percent.
        from otto_tpu.config import CovisitConfig

        packed_total = int(np.minimum(
            np.diff(store.offsets), CovisitConfig().session_tail).sum())
        results["build_packed_events"] = packed_total
        print(f"# build data: {store.n_events} events "
              f"({packed_total} packed; {results['build_datagen_s']}s)",
              flush=True)
        flush()
        stats: dict = {}
        t0 = time.time()
        last_flush = [0.0]

        def _build_progress(events_done, acc):
            # flush a measured partial every ~60s: a killed multi-hour build
            # still leaves events/s + RSS + accumulator pressure on disk
            now = time.time()
            if now - last_flush[0] < 60.0:
                return
            last_flush[0] = now
            elapsed = now - t0
            results["build_partial"] = {
                "events_done": int(events_done),
                "elapsed_s": round(elapsed, 1),
                "events_per_s": round(events_done / elapsed, 0),
                "frac_done": round(events_done / packed_total, 4),
                "eta_s": round((packed_total - events_done)
                               / max(events_done / elapsed, 1e-9), 0),
                "rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
                "acc_peak_rows": int(acc.peak_rows),
                "acc_compactions": int(acc.n_compactions),
                "acc_base_rows": int(len(acc._base_keys)),
                "acc_rows_pruned": int(acc.rows_pruned),
                "compaction_log_tail": acc.compaction_log[-3:],
            }
            flush()
            print(f"# build partial: {events_done/1e6:.1f}M events "
                  f"({events_done/elapsed/1e3:.1f}k ev/s, "
                  f"eta {results['build_partial']['eta_s']/60:.0f} min, "
                  f"{acc.n_compactions} compactions)",
                  flush=True)

        mats = build_covisitation(
            store, args.aids,
            # 0 => exact mode (no pruning, one final merge-reduce): at the
            # measured corpus density (~1.04 aggregated rows/event, r5
            # compaction_log) the full 216.7M-event pair table is ~8 GB —
            # bounded-memory compaction is unnecessary and its prune lexsort
            # dominated the r4/r5 decaying builds
            budget_rows=int(args.budget_rows) or None,
            stats_out=stats, progress_cb=_build_progress,
        )
        build_s = time.time() - t0
        results.pop("build_partial", None)
        results["build"] = {
            "build_s": round(build_s, 1),
            "events_per_s": round(packed_total / build_s, 0),
            **stats,
            "peak_rss_gb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
            ),
            "table_fill": {k: int((t[0][:, 0] >= 0).sum())
                           for k, t in mats.tables.items()},
        }
        print(f"# build: {build_s:.0f}s "
              f"({store.n_events/build_s/1e3:.1f}k ev/s)", flush=True)
        del mats
        flush()

    # ---------------- serving at >= 1M sessions ---------------------------
    if "serve" in phases:
        from otto_tpu.models.candidates import regular_candidates
        from otto_tpu.models.covisitation import covisit_heuristic_predictions
        from otto_tpu.models.frequency import FrequencyStatistics

        n_serve = args.serve_sessions
        # build matrices from a moderate train slice (matrices' quality is
        # irrelevant to throughput), then serve n_serve sessions
        t0 = time.time()
        train = synthetic_events_v2(
            n_sessions=300_000, n_aids=args.aids, mean_length=MEAN_LEN,
            seed=args.seed + 1,
        )
        serve_store = synthetic_events_v2(
            n_sessions=n_serve, n_aids=args.aids, mean_length=MEAN_LEN,
            seed=args.seed + 2,
        )
        results["serve_datagen_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        mats = build_covisitation(train, args.aids)
        results["serve_matrix_build_s"] = round(time.time() - t0, 1)
        stats = FrequencyStatistics.compute(train, n_aids=args.aids)
        stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
        print(f"# serve: matrices ready "
              f"({results['serve_matrix_build_s']}s)", flush=True)
        flush()

        t0 = time.time()
        preds = covisit_heuristic_predictions(
            serve_store, mats, stats_top, chunk_sessions=args.chunk_sessions
        )
        heur_s = time.time() - t0
        results["serve_heuristic"] = {
            "sessions": n_serve,
            "serve_s": round(heur_s, 1),
            "sessions_per_s": round(n_serve / heur_s, 0),
            "nonempty": int((preds["clicks"][:, 0] >= 0).sum()),
        }
        print(f"# heuristic serve: {heur_s:.0f}s "
              f"({n_serve/heur_s:.0f} sessions/s)", flush=True)
        flush()

        t0 = time.time()
        cands = regular_candidates(serve_store, mats,
                                   chunk_sessions=args.chunk_sessions)
        cand_s = time.time() - t0
        results["serve_candgen"] = {
            "sessions": n_serve,
            "candgen_s": round(cand_s, 1),
            "sessions_per_s": round(n_serve / cand_s, 0),
            "width": int(cands.candidates["clicks"].shape[1]),
        }
        print(f"# candgen: {cand_s:.0f}s "
              f"({n_serve/cand_s:.0f} sessions/s)", flush=True)
        flush()

    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
