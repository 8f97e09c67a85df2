"""Matrix factorization at the reference's full table shape (VERDICT r3 #6).

The 14,571,582 x 32 SESSION table is the largest single tensor anywhere in
the reference (models/matrix_factorization/config.yaml:8-9, held whole on
one GPU at torch_modules.py:28-29).  Two phases:

  single   (TPU)  one full epoch of train_mf with the complete
                  14.57M-session table resident on the chip; samples/s and
                  embedding lookups/s recorded.
  sharded  (8-virtual-device CPU mesh)  the row-sharded step
                  (parallel/sharded_embedding.make_sharded_mf_step: both
                  tables sharded over 'model', batch over 'data', sparse
                  adagrad via batch-sized all-gather exchange) over the same
                  full-height padded table; bounded step count, loss must
                  decrease.

Usage:
  python tools/mf_scale_run.py --phases single --out MF_SCALE_single.json
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/mf_scale_run.py --phases sharded --platform cpu
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", type=str, default="single")
    ap.add_argument("--sessions", type=int, default=14_571_582)
    ap.add_argument("--aids", type=int, default=1_855_604)
    ap.add_argument("--mean-length", type=float, default=3.0,
                    help="events per session for the sample stream (sets the "
                         "epoch's sample count; the tables' height is the "
                         "point of this run)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=262_144,
                    help="the reference's training batch "
                         "(models/matrix_factorization/config.yaml)")
    ap.add_argument("--sharded-steps", type=int, default=30)
    ap.add_argument("--sharded-batch", type=int, default=65_536)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--out", type=str, default="MF_SCALE.json")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from otto_tpu.config import MFConfig
    from otto_tpu.data.synthetic import synthetic_events_v2

    phases = set(args.phases.split(","))
    results: dict = {"config": vars(args), "platform": jax.default_backend(),
                     "n_devices": len(jax.devices())}
    out_path = pathlib.Path(args.out)

    def flush():
        out_path.write_text(json.dumps(results, indent=1))

    t0 = time.time()
    store = synthetic_events_v2(
        n_sessions=args.sessions, n_aids=args.aids,
        mean_length=args.mean_length, seed=args.seed)
    results["datagen_s"] = round(time.time() - t0, 1)
    results["n_events"] = int(store.n_events)
    results["n_sessions"] = int(store.n_sessions)
    print(f"# data: {store.n_events} events over {store.n_sessions} sessions "
          f"({results['datagen_s']}s)", flush=True)
    flush()

    if "single" in phases:
        from otto_tpu.models.matrix_factorization import train_mf

        cfg = MFConfig(n_sessions=store.n_sessions, n_aids=args.aids,
                       epochs=args.epochs, batch_size=args.batch,
                       early_stopping_patience=10**9)
        t0 = time.time()
        model = train_mf(store, args.aids, cfg)
        train_s = time.time() - t0
        samples = store.n_events * args.epochs
        results["single"] = {
            "session_table_rows": int(store.n_sessions),
            "aid_table_rows": int(args.aids),
            "epochs": args.epochs,
            "samples": int(samples),
            "train_s": round(train_s, 1),
            "samples_per_s": round(samples / train_s, 0),
            "lookups_per_s": round(2 * samples / train_s, 0),
            "history": model.history,
            "emb_finite": bool(np.isfinite(model.session_embeddings).all()
                               and np.isfinite(model.aid_embeddings).all()),
        }
        print(f"# single: {train_s:.0f}s ({samples/train_s:.0f} samples/s, "
              f"{2*samples/train_s:.0f} lookups/s)", flush=True)
        flush()

    if "sharded" in phases:
        from otto_tpu.config import MeshConfig
        from otto_tpu.models.matrix_factorization import mf_samples
        from otto_tpu.parallel.mesh import make_mesh, shard_rows
        from otto_tpu.parallel.sharded_embedding import make_sharded_mf_step

        n_dev = len(jax.devices())
        n_model = 4 if n_dev >= 8 else max(n_dev // 2, 1)
        n_data = max(n_dev // n_model, 1)
        mesh = make_mesh(MeshConfig(data_parallel=n_data, model_parallel=n_model))
        rng = np.random.default_rng(args.seed)
        D = 32
        t0 = time.time()
        ses_t = shard_rows(mesh, (rng.uniform(-0.05, 0.05,
                           (store.n_sessions, D))).astype(np.float32))
        aid_t = shard_rows(mesh, (rng.uniform(-0.05, 0.05,
                           (args.aids, D))).astype(np.float32))
        acc_s = shard_rows(mesh, np.zeros((store.n_sessions, D), np.float32))
        acc_a = shard_rows(mesh, np.zeros((args.aids, D), np.float32))
        results["sharded_place_s"] = round(time.time() - t0, 1)
        step = make_sharded_mf_step(mesh, loss="mse")
        si, ai, y = mf_samples(store)
        B = args.sharded_batch
        # fixed eval batch: at full table height a random step touches
        # <0.5% of rows, so per-step training loss cannot visibly move;
        # train on this batch's rows every other step so the update's
        # effect is measurable, interleaved with fresh random batches for
        # honest steady-state throughput
        eval_idx = rng.integers(0, len(si), B)
        ev = (jnp.asarray(si[eval_idx]), jnp.asarray(ai[eval_idx]),
              jnp.asarray(y[eval_idx]))
        losses = []
        t0 = time.time()
        for s in range(args.sharded_steps):
            if s % 2 == 0:
                batch = ev
            else:
                idx = rng.integers(0, len(si), B)
                batch = (jnp.asarray(si[idx]), jnp.asarray(ai[idx]),
                         jnp.asarray(y[idx]))
            out = step(ses_t, aid_t, acc_s, acc_a, *batch, jnp.float32(0.05))
            ses_t, aid_t, acc_s, acc_a = out[:4]
            if s % 2 == 0:
                losses.append(out[4])
        losses = [float(x) for x in losses]
        train_s = time.time() - t0
        samples = args.sharded_steps * B
        results["sharded"] = {
            "mesh": dict(mesh.shape),
            "session_table_rows": int(store.n_sessions),
            "steps": args.sharded_steps,
            "batch": B,
            "train_s": round(train_s, 1),
            "samples_per_s": round(samples / train_s, 0),
            "lookups_per_s": round(2 * samples / train_s, 0),
            "loss_first3": [round(x, 5) for x in losses[:3]],
            "loss_last3": [round(x, 5) for x in losses[-3:]],
            "loss_decreased": bool(np.mean(losses[-3:]) < np.mean(losses[:3])),
        }
        print(f"# sharded: {train_s:.0f}s ({samples/train_s:.0f} samples/s), "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
        flush()

    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
