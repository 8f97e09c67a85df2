"""SGNS training at full OTTO table scale (VERDICT r2 item 8).

The 1,855,604 x 32 row-sharded embedding table had only ever trained at
dryrun shapes.  Two phases:

  single   train_sgns (the fastText replacement, models/fasttext/config.yaml
           semantics) for one real epoch at n_aids = 1.86M on the current
           backend (TPU chip or CPU), recording pairs/s and lookups/s
           (each pair = 2 + negatives row gathers + 2 row updates).
  sharded  make_sharded_sgns_step on a data x model mesh (8 virtual CPU
           devices by default): full 1.86M-row tables row-sharded over
           ``model``, real skip-gram pairs sharded over ``data``, one epoch
           of steps, loss trajectory + lookups/s.

Usage:
  python tools/sgns_scale_run.py --phases single --platform tpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/sgns_scale_run.py --phases sharded --platform cpu
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

N_AIDS = 1_855_604


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", type=str, default="single")
    ap.add_argument("--events", type=float, default=1.5e6)
    ap.add_argument("--aids", type=int, default=N_AIDS)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--negatives", type=int, default=8)
    ap.add_argument("--max-steps", type=int, default=0,
                    help="cap sharded-phase steps (0 = full epoch)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--store-npz", type=str, default="",
                    help="cache the event store here (load if present)")
    ap.add_argument("--out", type=str, default="SGNS_SCALE.json")
    args = ap.parse_args()
    phases = set(args.phases.split(","))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from otto_tpu.config import SGNSConfig
    from otto_tpu.data.synthetic import synthetic_events_v2
    from otto_tpu.models.embeddings import skipgram_pairs

    results: dict = {"config": vars(args), "platform": jax.default_backend(),
                     "n_devices": jax.device_count()}
    out_path = pathlib.Path(args.out)

    def flush():
        out_path.write_text(json.dumps(results, indent=1))

    n_sessions = int(args.events / 13)
    t0 = time.time()
    if args.store_npz and os.path.exists(args.store_npz):
        from otto_tpu.data.events import EventStore

        store = EventStore.load_npz(args.store_npz)
        print(f"# store loaded from {args.store_npz}", flush=True)
    else:
        store = synthetic_events_v2(n_sessions=n_sessions, n_aids=args.aids,
                                    seed=args.seed)
        if args.store_npz:
            store.save_npz(args.store_npz)
    results["n_events"] = int(store.n_events)
    print(f"# data: {store.n_events} events over {args.aids} aids "
          f"({time.time()-t0:.0f}s)", flush=True)

    if "single" in phases:
        from otto_tpu.models.embeddings import train_sgns

        cfg = SGNSConfig(epochs=args.epochs, negatives=args.negatives,
                         batch_centers=8192, steps_per_call=8)
        t0 = time.time()
        model = train_sgns(store, args.aids, cfg)
        train_s = time.time() - t0
        # pair count of one epoch (resample to measure)
        rng = np.random.default_rng(cfg.seed)
        counts = np.bincount(store.aid, minlength=args.aids).astype(np.float64)
        c, _ = skipgram_pairs(store, cfg.window, rng,
                              subsample_t=cfg.subsample_t, counts=counts)
        pairs_per_epoch = len(c)
        pairs_s = pairs_per_epoch * args.epochs / train_s
        results["single"] = {
            "table_rows": args.aids,
            "epochs": args.epochs,
            "pairs_per_epoch": int(pairs_per_epoch),
            "train_s": round(train_s, 1),
            "pairs_per_s": round(pairs_s, 0),
            "lookups_per_s": round(pairs_s * (2 + cfg.negatives), 0),
            "emb_finite": bool(np.isfinite(np.asarray(model.w_in[:1000])).all()),
        }
        print(f"# single: {train_s:.0f}s for {args.epochs} epoch(s) "
              f"({pairs_s/1e3:.1f}k pairs/s, "
              f"{pairs_s*(2+cfg.negatives)/1e6:.2f}M lookups/s)", flush=True)
        flush()

    if "probe" in phases:
        # device-isolation for the host-paired step (VERDICT r3 item 5): the
        # pair arrays are placed ON DEVICE once, then _sgns_multi_step chains
        # with no per-step host traffic — device-only pairs/s vs the
        # link-fed 49.9k pairs/s of SGNS_SCALE_single.json attributes the
        # gap to the tunnel
        from otto_tpu.models.embeddings import _sgns_multi_step

        d = 32
        B, G = 8192, 8
        rng = np.random.default_rng(args.seed)
        counts = np.bincount(store.aid, minlength=args.aids).astype(np.float64)
        p = counts**0.75
        p /= p.sum()
        neg_cdf = jnp.asarray(np.cumsum(p), jnp.float32)
        w_in = jnp.asarray(rng.uniform(-1 / d, 1 / d, (args.aids, d)).astype(np.float32))
        w_out = jnp.zeros((args.aids, d), jnp.float32)
        acc_in = jnp.zeros((args.aids, d), jnp.float32)
        acc_out = jnp.zeros((args.aids, d), jnp.float32)
        probe = {}
        for neg in (8, 40):
            gc = jnp.asarray(rng.integers(0, args.aids, (G, B)).astype(np.int32))
            gx = jnp.asarray(rng.integers(0, args.aids, (G, B)).astype(np.int32))
            lrs = jnp.full(G, 0.05, jnp.float32)
            key = jax.random.PRNGKey(0)
            # warm (compile)
            w_in, w_out, acc_in, acc_out, key, loss = _sgns_multi_step(
                w_in, w_out, acc_in, acc_out, gc, gx, neg_cdf, lrs, key, neg)
            _ = float(loss)
            t0 = time.time()
            iters = 12
            for _i in range(iters):
                w_in, w_out, acc_in, acc_out, key, loss = _sgns_multi_step(
                    w_in, w_out, acc_in, acc_out, gc, gx, neg_cdf, lrs, key, neg)
            _ = float(loss)  # force the chain
            dt = (time.time() - t0) / iters
            probe[f"neg{neg}"] = {
                "s_per_dispatch": round(dt, 4),
                "device_pairs_per_s": round(G * B / dt, 0),
                "device_lookups_per_s": round(G * B * (2 + neg) / dt, 0),
            }
            print(f"# probe neg={neg}: {G*B/dt/1e3:.0f}k pairs/s device-only",
                  flush=True)

        # the device-resident chunk program (on-device pair sampling +
        # shared-negative MXU step) at the reference neg=40
        from otto_tpu.models.embeddings import _sgns_device_chunk

        aid_dev = jnp.asarray(store.aid[: min(store.n_events, 4_000_000)]
                              .astype(np.int32))
        sidx_dev = jnp.asarray(store.session_idx[: min(store.n_events, 4_000_000)]
                               .astype(np.int32))
        m = jnp.int32(aid_dev.shape[0])
        for n_shared in (1024, 8192):
            steps = 64
            lrs = jnp.full(steps, 0.05, jnp.float32)
            key = jax.random.PRNGKey(1)
            outs = _sgns_device_chunk(
                w_in, w_out, acc_in, acc_out, aid_dev, sidx_dev, m,
                neg_cdf, lrs, key, n_steps=steps, batch=B, window=10,
                n_negatives=40, n_shared=n_shared)
            w_in, w_out, acc_in, acc_out = outs[:4]
            _ = float(outs[5])
            t0 = time.time()
            iters = 6
            for _i in range(iters):
                outs = _sgns_device_chunk(
                    w_in, w_out, acc_in, acc_out, aid_dev, sidx_dev, m,
                    neg_cdf, lrs, key, n_steps=steps, batch=B, window=10,
                    n_negatives=40, n_shared=n_shared)
                w_in, w_out, acc_in, acc_out = outs[:4]
            kept = float(outs[6])
            _ = float(outs[5])
            dt = (time.time() - t0) / iters
            probe[f"device_chunk_neg40_shared{n_shared}"] = {
                "s_per_dispatch": round(dt, 4),
                "steps_per_dispatch": steps,
                "device_draws_per_s": round(steps * B / dt, 0),
                "device_pairs_per_s": round(kept / dt, 0),
                "accept_rate": round(kept / (steps * B), 3),
            }
            print(f"# probe device-chunk shared={n_shared}: "
                  f"{kept/dt/1e3:.0f}k accepted pairs/s device-only", flush=True)
        results["probe"] = probe
        flush()

    if "device" in phases:
        # the device-resident pair sampler at the reference fastText
        # configuration (dim 32, ws 10, neg 40, models/fasttext/config.yaml)
        from otto_tpu.models.embeddings import train_sgns_device

        cfg = SGNSConfig(epochs=args.epochs, negatives=args.negatives,
                         batch_centers=8192)
        pairs_out: dict = {}
        t0 = time.time()
        model = train_sgns_device(store, args.aids, cfg,
                                  steps_per_dispatch=256,
                                  pairs_out=pairs_out,
                                  max_steps_per_epoch=args.max_steps,
                                  progress_every=4)
        results["device"] = {
            "table_rows": args.aids,
            "epochs": args.epochs,
            "negatives": args.negatives,
            **pairs_out,
            "lookups_per_s": round(
                pairs_out["pairs_per_s"] * (2 + args.negatives), 0),
            "emb_finite": bool(np.isfinite(np.asarray(model.w_in[:1000])).all()),
        }
        print(f"# device: {pairs_out['train_s']}s for {args.epochs} epoch(s) "
              f"({pairs_out['pairs_per_s']/1e3:.1f}k pairs/s)", flush=True)
        flush()

    if "sharded" in phases:
        from otto_tpu.config import MeshConfig
        from otto_tpu.parallel import make_sharded_sgns_step
        from otto_tpu.parallel.mesh import make_mesh

        n_dev = jax.device_count()
        model_size = 4 if n_dev % 4 == 0 else n_dev
        data_size = n_dev // model_size
        mesh = make_mesh(MeshConfig(data_parallel=data_size,
                                    model_parallel=model_size))
        rows = -(-args.aids // model_size) * model_size
        d = 32
        rng = np.random.default_rng(args.seed)
        w_in = jnp.asarray(rng.uniform(-1 / d, 1 / d, (rows, d)).astype(np.float32))
        w_out = jnp.zeros((rows, d), jnp.float32)
        acc_in = jnp.zeros((rows, d), jnp.float32)
        acc_out = jnp.zeros((rows, d), jnp.float32)
        step = make_sharded_sgns_step(mesh, n_negatives=args.negatives)

        counts = np.bincount(store.aid, minlength=args.aids).astype(np.float64)
        c, x = skipgram_pairs(store, 10, rng, subsample_t=1e-4, counts=counts)
        order = rng.permutation(len(c))
        c, x = c[order], x[order]
        B = 8192 * data_size
        n_steps = len(c) // B
        if args.max_steps:
            n_steps = min(n_steps, args.max_steps)
        p = counts**0.75
        p /= p.sum()
        losses = []
        t0 = time.time()
        for i in range(n_steps):
            sl = slice(i * B, (i + 1) * B)
            negs = rng.choice(args.aids, size=(B, args.negatives), p=p)
            w_in, w_out, acc_in, acc_out, loss = step(
                w_in, w_out, acc_in, acc_out,
                jnp.asarray(c[sl].astype(np.int32)),
                jnp.asarray(x[sl].astype(np.int32)),
                jnp.asarray(negs.astype(np.int32)),
                jnp.float32(0.05),
            )
            if i % 50 == 0 or i == n_steps - 1:
                losses.append(round(float(loss) / B, 4))
                print(f"# sharded step {i}/{n_steps}: loss/pair {losses[-1]}",
                      flush=True)
        train_s = time.time() - t0
        pairs_s = n_steps * B / train_s
        results["sharded"] = {
            "mesh": [data_size, model_size],
            "table_rows": int(rows),
            "steps": int(n_steps),
            "batch": int(B),
            "train_s": round(train_s, 1),
            "pairs_per_s": round(pairs_s, 0),
            "lookups_per_s": round(pairs_s * (2 + args.negatives), 0),
            "loss_trajectory": losses,
            "loss_decreased": bool(losses[-1] < losses[0]) if len(losses) > 1 else None,
        }
        print(f"# sharded: {n_steps} steps in {train_s:.0f}s "
              f"({pairs_s/1e3:.1f}k pairs/s on {n_dev} devices)", flush=True)
        flush()

    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
