"""Device-isolation probe for the SERVING routes (VERDICT r3 item 4).

Does for `covisit_heuristic_predictions` / `regular_candidates` what
OTTO_SCALE_probe.json did for the covisitation build: times each route's
chunk program with its inputs RESIDENT on device at the FULL reference aid
cardinality (1,855,604-row tables — table height drives the gather/vote-sort
costs), and separately times (a) the first-call compile and (b) the
host->device link transfer of one chunk's packed inputs plus the
device->host fetch of its outputs.  The decomposition attributes the
tunneled-platform serving numbers (BENCH_r03 `serve_vs_oracle: 0.08`,
LIFT_r03 `candgen_s: 3025.9`) to (device, link, compile) — the question the
verdict asks: is the chip slow, or the tunnel?

Reference hot loop being modeled: src/covisitation/inference.py:143-247
(per-session Python recency/covisit routes) and
src/ranker/regular_candidate_generation.py:138-197 (candgen).

Usage: python tools/serve_probe.py [--aids 1855604] [--chunks 2048,512]
       [--widths 8,16,32] [--out OTTO_SCALE_serveprobe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

MEAN_LEN = 11.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--aids", type=int, default=1_855_604)
    ap.add_argument("--chunks", type=str, default="2048,512")
    ap.add_argument("--widths", type=str, default="16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--routes", type=str, default="recency,covisit,candgen")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--out", type=str, default="OTTO_SCALE_serveprobe.json")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache_probe"))

    from otto_tpu.models.candidates import _regular_chunk
    from otto_tpu.models.covisitation import _covisit_route, _recency_route

    rng = np.random.default_rng(args.seed)
    n_aids = args.aids
    results: dict = {"config": vars(args), "platform": jax.default_backend(),
                     "n_aids": n_aids}
    out_path = pathlib.Path(args.out)

    def flush():
        out_path.write_text(json.dumps(results, indent=1))

    # link bandwidth measurement at a realistic payload (one covisit table
    # shard, 64 MB) — the tunnel's small-transfer latency was measured in
    # OTTO_SCALE_probe.json; this adds the large-transfer asymptote
    probe_mb = 64
    payload = rng.integers(0, n_aids, size=(probe_mb * 1024 * 1024 // 4,)).astype(np.int32)
    t0 = time.perf_counter()
    d = jax.device_put(payload)
    jax.block_until_ready(d)
    h2d_big_s = time.perf_counter() - t0
    results["link_h2d_64mb_s"] = round(h2d_big_s, 2)
    results["link_h2d_mbps"] = round(probe_mb / h2d_big_s, 1)
    t0 = time.perf_counter()
    _ = np.asarray(d)
    d2h_big_s = time.perf_counter() - t0
    results["link_d2h_64mb_s"] = round(d2h_big_s, 2)
    results["link_d2h_mbps"] = round(probe_mb / d2h_big_s, 1)
    del d, payload
    print(f"# link: h2d {results['link_h2d_mbps']} MB/s, "
          f"d2h {results['link_d2h_mbps']} MB/s", flush=True)
    flush()

    # full-height tables, generated ON DEVICE (serving keeps them resident;
    # pushing 1.9 GB of synthetic tables through the tunnel is not part of
    # the workload being measured)
    NARROW, WIDE = 15, 50
    kinds = ["time_weighted", "click_weighted", "cart_weighted",
             "click_cart", "cart_order"]
    t0 = time.perf_counter()
    tables = {}
    for i, kind in enumerate(kinds):
        key = jax.random.PRNGKey(args.seed + i)
        k1, k2 = jax.random.split(key)
        t = jax.random.randint(k1, (n_aids, WIDE), 0, n_aids, jnp.int32)
        # ~30% padding like real tables
        t = jnp.where(jax.random.uniform(k2, (n_aids, WIDE)) < 0.3, -1, t)
        tables[kind] = t
    jax.block_until_ready(tables["cart_order"])
    results["tables_gen_s"] = round(time.perf_counter() - t0, 2)
    results["tables_mb"] = round(sum(t.nbytes for t in tables.values()) / 1e6, 1)
    narrow = {k: v[:, :NARROW] for k, v in tables.items()}
    stats_top = {t: rng.integers(0, n_aids, size=20).astype(np.int32)
                 for t in ("clicks", "carts", "orders")}
    print(f"# tables resident: {results['tables_mb']} MB generated on device "
          f"in {results['tables_gen_s']}s", flush=True)
    flush()

    def make_chunk(S, T):
        lens = np.minimum(rng.geometric(1.0 / MEAN_LEN, size=S), T).astype(np.int32)
        aids = rng.integers(0, n_aids, size=(S, T)).astype(np.int32)
        types = rng.integers(0, 3, size=(S, T)).astype(np.int8)
        return aids, types, lens

    def probe(fn, hostargs, fetch_outputs, iters):
        """(compile_s, device_s, h2d_s, d2h_s) for one route program."""
        # link: h2d of the chunk's packed inputs
        t0 = time.perf_counter()
        devargs = [jax.device_put(a) for a in hostargs]
        jax.block_until_ready(devargs)
        h2d_s = time.perf_counter() - t0
        in_mb = sum(a.nbytes for a in hostargs) / 1e6
        # compile + first exec
        t0 = time.perf_counter()
        out = fn(*devargs)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        # steady-state device-only: chained dispatches, one final sync
        t0 = time.perf_counter()
        out = fn(*devargs)
        jax.block_until_ready(out)
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*devargs)
        jax.block_until_ready(out)
        tn = time.perf_counter() - t0
        device_s = max((tn - t_one) / max(iters - 1, 1), tn / iters * 0.5, 1e-9)
        # d2h of the outputs
        t0 = time.perf_counter()
        flat = fetch_outputs(out)
        d2h_s = time.perf_counter() - t0
        out_mb = sum(a.nbytes for a in flat) / 1e6
        return {
            "compile_s": round(compile_s, 2),
            "device_s_per_chunk": round(device_s, 5),
            "h2d_s": round(h2d_s, 4), "in_mb": round(in_mb, 2),
            "d2h_s": round(d2h_s, 4), "out_mb": round(out_mb, 2),
        }

    def fetch_dict(out):
        return [np.asarray(v) for v in out.values()]

    def fetch_cands(out):
        flat = []
        for c, s in out.values():
            flat += [np.asarray(c), np.asarray(s)]
        return flat

    chunks = [int(c) for c in args.chunks.split(",")]
    widths = [int(w) for w in args.widths.split(",")]
    uniq_cap, k = 64, 20
    for S in chunks:
        for T in widths:
            a, ty, ln = make_chunk(S, T)
            key = f"chunk{S}_w{T}"
            block: dict = {}

            routes = set(args.routes.split(","))
            if "recency" in routes:
                block["recency"] = probe(
                lambda a_, t_, l_: _recency_route(
                    a_, t_, l_, narrow, uniq_cap, NARROW, k),
                    [a, ty, ln], fetch_dict, args.iters)
                block["recency"]["sessions_per_s_device"] = round(
                    S / block["recency"]["device_s_per_chunk"], 0)
                print(f"# {key} recency: {block['recency']}", flush=True)
                results[key] = block
                flush()

            if "covisit" in routes:
                block["covisit"] = probe(
                lambda a_, t_, l_: _covisit_route(
                    a_, t_, l_, narrow, stats_top, uniq_cap, NARROW, k),
                    [a, ty, ln], fetch_dict, args.iters)
                block["covisit"]["sessions_per_s_device"] = round(
                    S / block["covisit"]["device_s_per_chunk"], 0)
                print(f"# {key} covisit: {block['covisit']}", flush=True)
                results[key] = block
                flush()

            if "candgen" in routes:
                tab_tuple = tuple(tables[kd] for kd in kinds)
                block["candgen"] = probe(
                lambda a_, t_, l_: _regular_chunk(
                    a_, t_, l_, tab_tuple, None, uniq_cap, WIDE, 100, False),
                    [a, ty, ln], fetch_cands, args.iters)
                block["candgen"]["sessions_per_s_device"] = round(
                    S / block["candgen"]["device_s_per_chunk"], 0)
                print(f"# {key} candgen: {block['candgen']}", flush=True)
                results[key] = block
                flush()

            results[key] = block
            flush()

    # attribution summary at the largest chunk/width probed
    key = f"chunk{chunks[0]}_w{widths[-1]}"
    if key in results:
        b = results[key]
        summary = {}
        for route in ("recency", "covisit", "candgen"):
            if route not in b:
                continue
            r = b[route]
            dev = r["device_s_per_chunk"]
            link = r["h2d_s"] + r["d2h_s"]
            summary[route] = {
                "device_frac": round(dev / (dev + link), 3),
                "link_frac": round(link / (dev + link), 3),
                "device_only_1m_sessions_s": round(1e6 / chunks[0] * dev, 1),
                "with_link_serial_1m_sessions_s": round(
                    1e6 / chunks[0] * (dev + link), 1),
            }
        results["attribution_1m"] = summary
        print(f"# attribution: {json.dumps(summary)}", flush=True)
    flush()
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
