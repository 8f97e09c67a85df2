"""GBDT quality at the reference's production shape (VERDICT r2 item 5).

The round-1/2 GBDT-vs-sklearn evidence was 3,200 sessions x 48 candidates x
10 features; the reference trains at ~100 candidates/session with a
52-feature list (models/lightgbm/config.yaml:5-26).  This runs the same
protocol at that shape (>= 20k sessions): the TPU histogram forest
(lambdarank and pointwise-bce) vs sklearn HistGradientBoosting on identical
uint8 bin matrices, scored with MAP@20 + recall@20 on held-out sessions —
plus the fold-averaged prediction cost over the full candidate grid
(VERDICT r2 weak #7).  LightGBM itself is not installable in this
environment; sklearn's histogram GBDT is the stand-in control with the same
binning, depth, and iteration budget.

Writes GBDT_REFSHAPE.json.
Usage: python tools/gbdt_reference_shape.py [--sessions 20000] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

C, F = 100, 52


def make_task(S: int, seed: int):
    """Nonlinear ranking task with 12 informative + 40 noise features,
    missing values, and graded relevance concentrated in the top ranks."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(S, C, F)).astype(np.float32)
    s = (
        1.6 * X[..., 0]
        + X[..., 1] * X[..., 2]
        + 1.4 * (X[..., 3] > 0.4)
        - np.abs(X[..., 4])
        + 0.6 * np.sign(X[..., 5]) * (X[..., 6] > 0)
        + 0.8 * np.tanh(X[..., 7] + X[..., 8])
        + 0.5 * (X[..., 9] * X[..., 10] > 0.5)
        - 0.4 * (np.abs(X[..., 11]) > 1.2)
        + 0.35 * rng.normal(size=(S, C))
    )
    X[rng.random(X.shape) < 0.05] = np.nan
    labels = (s >= np.sort(s, axis=1)[:, -3][:, None]).astype(np.int8)
    mask = np.ones((S, C), bool)
    return X, labels, mask


def rank_metrics(scores, labels):
    import jax.numpy as jnp

    from otto_tpu.eval.metrics import map_at_k

    m = float(map_at_k(jnp.asarray(scores), jnp.asarray(labels),
                       jnp.asarray(np.ones_like(labels, bool)), k=20))
    order = np.argsort(-scores, axis=1)[:, :20]
    hits = np.take_along_axis(labels, order, axis=1).sum()
    return round(m, 4), round(float(hits / labels.sum()), 4)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=20_000)
    ap.add_argument("--trees", type=int, default=150)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--out", type=str, default="GBDT_REFSHAPE.json")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

    from otto_tpu.config import GBDTConfig
    from otto_tpu.models.gbdt import bin_features, fit_bin_edges, fit_gbdt

    S = args.sessions
    S_train = int(S * 0.8)
    results: dict = {"config": vars(args), "shape": [S, C, F],
                     "platform": jax.default_backend()}

    t0 = time.time()
    X, labels, mask = make_task(S, args.seed)
    edges = fit_bin_edges(X[:S_train].reshape(-1, F), 255)
    binned = bin_features(X, edges)
    results["datagen_s"] = round(time.time() - t0, 1)
    print(f"# task ready: {S}x{C}x{F}, {results['datagen_s']}s", flush=True)

    tr, va = slice(0, S_train), slice(S_train, S)

    def flush():
        pathlib.Path(args.out).write_text(json.dumps(results, indent=1))

    for loss in ("lambdarank", "bce"):
        cfg = GBDTConfig(
            n_trees=args.trees, early_stopping_rounds=50, eval_every=10,
            learning_rate=0.1, max_depth=6, n_bins=255, min_data_in_leaf=40,
            subsample=1.0, colsample=1.0, loss=loss,
            hist_rows_per_chunk=1 << 16,
        )
        t0 = time.time()
        forest = fit_gbdt(
            binned[tr], labels[tr], mask[tr], mask[tr].astype(np.float32), cfg,
            val=(binned[va], labels[va], mask[va]),
        )
        fit_s = time.time() - t0
        t0 = time.time()
        scores = forest.predict_binned(binned[va].reshape(-1, F)).reshape(-1, C)
        pred_s = time.time() - t0
        # fold-averaged device-resident path (VERDICT r3 item 7): each chunk
        # crosses the link once, all folds route it while resident.  5 fold
        # forests emulated by routing the fitted forest 5x (identical cost).
        from otto_tpu.models.gbdt import GBDTRankerModel

        model5 = GBDTRankerModel([forest] * 5, edges, cfg)
        vb = binned[va].reshape(-1, F)
        model5.predict_binned_folds(vb)  # warm compile at the real shapes
        t0 = time.time()
        model5.predict_binned_folds(vb)
        pred5_s = time.time() - t0
        m, r = rank_metrics(scores, labels[va])
        results[f"tpu_gbdt_{loss}"] = {
            "map20": m, "recall20": r, "fit_s": round(fit_s, 1),
            "n_trees": int(forest.feat.shape[0]),
            "predict_rows_per_s": round((S - S_train) * C / pred_s, 0),
            "predict5fold_resident_rows_per_s": round(
                (S - S_train) * C / pred5_s, 0),
        }
        print(f"# tpu_gbdt {loss}: MAP@20 {m} recall {r} "
              f"(fit {fit_s:.0f}s, {forest.feat.shape[0]} trees)", flush=True)
        flush()

    # sklearn histogram-GBDT control (pointwise; no lambdarank in sklearn)
    from sklearn.ensemble import HistGradientBoostingClassifier

    clf = HistGradientBoostingClassifier(
        max_iter=args.trees, learning_rate=0.1, max_depth=6, max_bins=255,
        min_samples_leaf=40, early_stopping=False, random_state=0,
    )
    t0 = time.time()
    clf.fit(binned[tr].reshape(-1, F).astype(np.float32), labels[tr].reshape(-1))
    fit_s = time.time() - t0
    t0 = time.time()
    sc = clf.predict_proba(binned[va].reshape(-1, F).astype(np.float32))[:, 1]
    pred_s = time.time() - t0
    m, r = rank_metrics(sc.reshape(-1, C), labels[va])
    results["sklearn_histgb_pointwise"] = {
        "map20": m, "recall20": r, "fit_s": round(fit_s, 1),
        "predict_rows_per_s": round((S - S_train) * C / pred_s, 0),
    }
    print(f"# sklearn histgb: MAP@20 {m} recall {r} (fit {fit_s:.0f}s)", flush=True)

    results["lambdarank_vs_sklearn_map_delta"] = round(
        results["tpu_gbdt_lambdarank"]["map20"]
        - results["sklearn_histgb_pointwise"]["map20"], 4
    )
    flush()
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
