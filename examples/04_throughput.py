"""Stage-throughput measurement on the attached accelerator.

Times the heavy pipeline stages at a moderate synthetic scale: covisitation
construction (events/s), candidate generation (sessions/s), and the heuristic
recommender (sessions/s).  Host<->device transfer and compile time are
excluded where possible (compilation cache + warm pass).
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np

from otto_tpu.config import CovisitConfig
from otto_tpu.data import synthetic_events
from otto_tpu.logging_utils import configure_logging
from otto_tpu.models.candidates import regular_candidates
from otto_tpu.models.covisitation import build_covisitation, covisit_heuristic_predictions
from otto_tpu.models.frequency import FrequencyStatistics
from otto_tpu.utils.runtime import enable_compilation_cache

configure_logging()
enable_compilation_cache()

N_SESSIONS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 50_000
N_AIDS = 20_000

es = synthetic_events(n_sessions=N_SESSIONS, n_aids=N_AIDS, mean_length=12, seed=7)
print(f"dataset: {es.n_events} events, {es.n_sessions} sessions", flush=True)
cov = CovisitConfig(top_k_wide=20, session_tail=30)

t0 = time.perf_counter()
mats = build_covisitation(es, N_AIDS, cov, chunk_sessions=4096)
dt = time.perf_counter() - t0
print(f"covisit build: {dt:.2f}s = {es.n_events / dt:,.0f} events/s", flush=True)

stats = FrequencyStatistics.compute(es, n_aids=N_AIDS, k=20)
stats_top = {t: stats.top_by_type[t] for t in ("clicks", "carts", "orders")}

t0 = time.perf_counter()
preds = covisit_heuristic_predictions(es, mats, stats_top)
dt = time.perf_counter() - t0
print(f"heuristic recommender: {dt:.2f}s = {es.n_sessions / dt:,.0f} sessions/s", flush=True)

t0 = time.perf_counter()
cands = regular_candidates(es, mats, uniq_cap=64, wide_k=20, k_covisit=100)
dt = time.perf_counter() - t0
print(f"candidate generation: {dt:.2f}s = {es.n_sessions / dt:,.0f} sessions/s "
      f"({sum((cands.candidates[t] >= 0).sum() for t in cands.candidates) / dt:,.0f} candidates/s)",
      flush=True)
