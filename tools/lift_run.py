"""Reranker-lift experiment (VERDICT round-1 item 4a).

Demonstrates that the two-stage pipeline (candidates -> features -> TPU
histogram GBDT -> prior blend) beats both the covisitation heuristic and the
candidate generator's own prior ordering on data with residual reranking
signal (the v2 synthetic: temporal drift, per-aid conversion propensities,
per-session buyer propensity, cart->order echoes — otto_tpu/data/synthetic.py).

This is the framework's measurement of the reference's entire L6
reason-to-exist: the GBDT beating candidate ordering
(src/ranker/lgb_trainer.py:156-198).

Four rows are reported (weighted recall@20 = .1/.3/.6):

  heuristic        covisit_heuristic_predictions (the L4 model)
  candidate-prior  regular_candidates in prior order, top-20
  two-stage        run_two_stage with the GBDT engine
  ceiling          candidate max-recall (upper bound for any reranker)

Usage: python tools/lift_run.py [--sessions 200000] [--aids 30000]
       [--trees 300] [--folds 5] [--out /tmp/lift.json] [--platform cpu]
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
    ap.add_argument("--sessions", type=int, default=200_000)
    ap.add_argument("--aids", type=int, default=30_000)
    ap.add_argument("--val-fraction", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trees", type=int, default=300)
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--early-stop", type=int, default=100)
    ap.add_argument("--k-covisit", type=int, default=100)
    ap.add_argument("--out", type=str, default="/tmp/lift.json")
    ap.add_argument("--epochs", type=int, default=8, help="tower engine epochs")
    ap.add_argument("--engine", type=str, default="gbdt", choices=["gbdt", "tower"],
                    help="reranker engine: the TPU histogram GBDT (reference-"
                         "faithful) or the listwise tower (fast on CPU; shown "
                         "GBDT-class on identical features, REPORT.md)")
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--train-device", type=str, default="",
                    help="jax platform for the GBDT fit + forest prediction "
                         "(e.g. 'axon': host serving routes on the CPU "
                         "default backend, forest passes on the TPU)")
    ap.add_argument("--chunk-sessions", type=int, default=2048,
                    help="serving chunk size (512 keeps the route programs' "
                         "remote compiles tractable on the tunneled TPU)")
    ap.add_argument("--recency-host-f64", action="store_true",
                    help="serve the heuristic's recency route on the host "
                         "float64 accumulator (fewer device programs; exact "
                         "reference tie-breaks)")
    ap.add_argument("--selection-seed", type=int, default=17,
                    help="seed of the selection/report session split "
                         "(vary across runs for the multi-seed protocol, "
                         "VERDICT r3 item 3)")
    ap.add_argument("--n-boot", type=int, default=1000,
                    help="paired-bootstrap resamples for the lift CI")
    ap.add_argument("--save-matrices", type=str, default="")
    ap.add_argument("--load-matrices", type=str, default="")
    ap.add_argument("--skip-heuristic", action="store_true",
                    help="restart helper: jump straight to candgen + two-stage")
    args = ap.parse_args()

    if args.platform:
        import jax

        platforms = args.platform
        if args.train_device and args.train_device not in platforms:
            platforms = f"{platforms},{args.train_device}"
        jax.config.update("jax_platforms", platforms)
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    train_device = None
    if args.train_device:
        try:
            train_device = jax.devices(args.train_device)[0]
            print(f"# GBDT fit routed to {train_device}", flush=True)
        except Exception as e:
            print(f"# train device {args.train_device} unavailable ({e}); "
                  "fit stays on the default backend", flush=True)

    from otto_tpu import EVENT_TYPES
    from otto_tpu.config import GBDTConfig, RankerConfig
    from otto_tpu.data.splits import split_by_time
    from otto_tpu.data.synthetic import synthetic_events_v2
    from otto_tpu.eval.harness import evaluate_predictions
    from otto_tpu.models.candidates import regular_candidates
    from otto_tpu.models.covisitation import (
        CovisitationMatrices,
        build_covisitation,
        covisit_heuristic_predictions,
    )
    from otto_tpu.models.frequency import FrequencyStatistics
    from otto_tpu.models.ranker import top_k_predictions
    from otto_tpu.twostage import run_two_stage

    results: dict = {"config": vars(args)}

    def _flush():
        # incremental write: a killed run still leaves a partial artifact
        pathlib.Path(args.out).write_text(json.dumps(results, indent=2))

    t0 = time.time()
    store = synthetic_events_v2(n_sessions=args.sessions, n_aids=args.aids, seed=args.seed)
    split = split_by_time(store, val_fraction=args.val_fraction, seed=args.seed)
    print(
        f"# data: {store.n_events} events, {store.n_sessions} sessions "
        f"(gen {time.time() - t0:.0f}s); val {split.val_input.n_sessions} sessions",
        flush=True,
    )

    t0 = time.time()
    if args.load_matrices:
        mats = CovisitationMatrices.load(args.load_matrices)
    else:
        mats = build_covisitation(split.train, args.aids)
        if args.save_matrices:
            mats.save(args.save_matrices)
    results["covisit_build_s"] = round(time.time() - t0, 1)
    print(f"# covisit build: {results['covisit_build_s']}s", flush=True)

    stats = FrequencyStatistics.compute(split.train, n_aids=args.aids)
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}

    def _report(tag, rep, extra=None):
        row = {
            "weighted": rep.weighted,
            "corpus_weighted": rep.corpus_weighted,
            **{t: getattr(rep, t) for t in EVENT_TYPES},
        }
        if extra:
            row.update(extra)
        results[tag] = row
        _flush()
        print(
            f"{tag:16s} weighted {rep.weighted:.6f} corpus {rep.corpus_weighted:.6f} "
            + " ".join(f"{t} {getattr(rep, t):.4f}" for t in EVENT_TYPES),
            flush=True,
        )

    # ---- row 1: the covisitation heuristic -------------------------------
    heur_preds = None
    if not args.skip_heuristic:
        t0 = time.time()
        heur_preds = covisit_heuristic_predictions(
            split.val_input, mats, stats_top,
            chunk_sessions=args.chunk_sessions,
            recency_host_f64=args.recency_host_f64,
        )
        rep = evaluate_predictions(
            split.val_labels, heur_preds["clicks"], heur_preds["carts"], heur_preds["orders"]
        )
        _report("heuristic", rep, {"serve_s": round(time.time() - t0, 1)})

    # ---- rows 2+4: candidate prior ordering + ceiling --------------------
    # IDENTICAL candgen parameters to run_two_stage's internal call (wide_k
    # from CovisitConfig.top_k_wide): with a shared candidate set, the
    # two-stage row's prior-blend at alpha=0 reproduces this row exactly, so
    # any difference is attributable to the reranker alone
    from otto_tpu.config import CovisitConfig

    wide_k = min(CovisitConfig().top_k_wide, mats.tables["time_weighted"][0].shape[1])
    t0 = time.time()
    cands = regular_candidates(
        split.val_input, mats, labels=split.val_labels, k_covisit=args.k_covisit,
        wide_k=wide_k, chunk_sessions=args.chunk_sessions,
    )
    prior_preds = {}
    for etype in EVENT_TYPES:
        c = cands.candidates[etype]
        prior = np.where(c >= 0, -np.arange(c.shape[1], dtype=np.float32)[None, :], -np.inf)
        prior_preds[etype] = top_k_predictions(c, prior, k=20)
    rep = evaluate_predictions(
        split.val_labels, prior_preds["clicks"], prior_preds["carts"], prior_preds["orders"]
    )
    _report("candidate_prior", rep, {"candgen_s": round(time.time() - t0, 1)})
    ceiling = cands.max_recall_report(split.val_labels)
    results["ceiling"] = ceiling
    print(f"{'ceiling':16s} weighted {ceiling['weighted']:.6f}", flush=True)

    # ---- row 3: two-stage with the selected reranker engine --------------
    if args.engine == "tower":
        gcfg = RankerConfig(hidden_dims=(256, 128), n_folds=args.folds,
                            epochs=args.epochs, batch_sessions=512, dropout=0.0,
                            loss="lambdarank")
    else:
        gcfg = GBDTConfig(
            n_trees=args.trees,
            n_folds=args.folds,
            early_stopping_rounds=args.early_stop,
            min_data_in_leaf=200,
        )
    t0 = time.time()
    art = run_two_stage(
        split.train,
        split.val_input,
        n_aids=args.aids,
        labels=split.val_labels,
        ranker_config=gcfg,
        matrices=mats,
        k_covisit=args.k_covisit,
        heuristic_preds=heur_preds,
        chunk_sessions=args.chunk_sessions,
        selection_seed=args.selection_seed,
        train_device=train_device,
    )
    _report("two_stage", art.report, {"train_s": round(time.time() - t0, 1)})

    if "heuristic" in results:
        results["lift_vs_heuristic"] = round(
            results["two_stage"]["weighted"] - results["heuristic"]["weighted"], 6
        )
    results["lift_vs_prior"] = round(
        results["two_stage"]["weighted"] - results["candidate_prior"]["weighted"], 6
    )

    # ---- disjoint-half protocol (VERDICT r2 weak #2): alpha / early-stop
    # were selected only on run_two_stage's selection half; score ALL rows on
    # the held-out complement so the comparison carries no selection optimism
    if art.selection_mask is not None:
        hold = np.flatnonzero(~art.selection_mask)
        lab_h = split.val_labels.take(hold)

        def _sub(preds):
            return evaluate_predictions(
                lab_h, preds["clicks"][hold], preds["carts"][hold], preds["orders"][hold]
            )

        _report("two_stage_disjoint", _sub(art.predictions),
                {"n_sessions": int(len(hold))})
        _report("candidate_prior_disjoint", _sub(prior_preds))
        if heur_preds is not None:
            _report("heuristic_disjoint", _sub(heur_preds))
            results["lift_vs_heuristic_disjoint"] = round(
                results["two_stage_disjoint"]["weighted"]
                - results["heuristic_disjoint"]["weighted"], 6
            )
        results["lift_vs_prior_disjoint"] = round(
            results["two_stage_disjoint"]["weighted"]
            - results["candidate_prior_disjoint"]["weighted"], 6
        )

        # paired per-session bootstrap CI on the disjoint-half lifts
        # (VERDICT r3 item 3: the point estimates above carry no
        # uncertainty; the paired resample is the right-variance interval)
        from otto_tpu.eval.harness import paired_bootstrap_lift

        def _hold(preds):
            return {t: preds[t][hold] for t in EVENT_TYPES}

        ts_h = _hold(art.predictions)
        if heur_preds is not None:
            results["bootstrap_vs_heuristic_disjoint"] = paired_bootstrap_lift(
                lab_h, ts_h, _hold(heur_preds), n_boot=args.n_boot,
                seed=args.selection_seed,
            )
        results["bootstrap_vs_prior_disjoint"] = paired_bootstrap_lift(
            lab_h, ts_h, _hold(prior_preds), n_boot=args.n_boot,
            seed=args.selection_seed,
        )
        for tag in ("bootstrap_vs_heuristic_disjoint", "bootstrap_vs_prior_disjoint"):
            if tag in results:
                b = results[tag]
                print(f"{tag}: lift {b['lift']:+.6f} ci95 {b['ci95']} "
                      f"p<=0 {b['p_le_0']} significant={b['significant']}",
                      flush=True)

    print(
        f"\n# lift: two-stage vs heuristic {results.get('lift_vs_heuristic', float('nan')):+.6f}, "
        f"vs candidate-prior {results['lift_vs_prior']:+.6f}; disjoint-half: "
        f"vs heuristic {results.get('lift_vs_heuristic_disjoint', float('nan')):+.6f}, "
        f"vs prior {results.get('lift_vs_prior_disjoint', float('nan')):+.6f}",
        flush=True,
    )
    _flush()
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
