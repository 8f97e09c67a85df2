"""Training-throughput measurement on the attached accelerator.

Times one warm epoch/segment of each trainable model family at a moderate
synthetic scale and reports steps/s and examples/s:

- SGNS embedding trainer (the fastText/word2vec replacement)
- CF pair trainer (shared-table dot product)
- listwise ranker tower (LambdaRank loss)
- histogram GBDT (lambdarank trees/s)
- sequence recommender (SASRec-style transformer)

Run: ``python examples/07_training_throughput.py [n_sessions]``
"""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import time

import numpy as np

from otto_tpu.config import CFConfig, GBDTConfig, SequenceModelConfig, SGNSConfig
from otto_tpu.data import synthetic_events
from otto_tpu.logging_utils import configure_logging
from otto_tpu.utils.runtime import enable_compilation_cache

configure_logging()
enable_compilation_cache()

N_SESSIONS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 50_000
N_AIDS = 20_000

es = synthetic_events(n_sessions=N_SESSIONS, n_aids=N_AIDS, mean_length=12, seed=7)
print(f"dataset: {es.n_events} events, {es.n_sessions} sessions", flush=True)


def timed_epochs(fn, warm_epochs=1):
    """fn(epochs) -> runs that many epochs; returns warm seconds/epoch."""
    fn(1)  # compile + warm
    t0 = time.perf_counter()
    fn(warm_epochs)
    return (time.perf_counter() - t0) / warm_epochs


# ---- SGNS ------------------------------------------------------------------
from otto_tpu.models.embeddings import train_sgns

cfg = SGNSConfig(dim=32, window=10, negatives=40, epochs=1)
t0 = time.perf_counter()
train_sgns(es, N_AIDS, cfg)
cold = time.perf_counter() - t0
t0 = time.perf_counter()
train_sgns(es, N_AIDS, cfg)
dt = time.perf_counter() - t0
print(f"SGNS epoch (dim 32, 40 negs): {dt:.2f}s = "
      f"{es.n_events / dt:,.0f} center-events/s  [cold {cold:.0f}s]", flush=True)

# ---- CF pairs ---------------------------------------------------------------
from otto_tpu.models.matrix_factorization import train_cf

ccfg = CFConfig(epochs=1)
train_cf(es, N_AIDS, ccfg)
t0 = time.perf_counter()
model = train_cf(es, N_AIDS, ccfg)
dt = time.perf_counter() - t0
print(f"CF epoch: {dt:.2f}s", flush=True)

# ---- ranker tower -----------------------------------------------------------
import jax
import jax.numpy as jnp
import optax

from otto_tpu.models.ranker import init_tower
from otto_tpu.parallel.data_parallel import make_dp_ranker_step
from otto_tpu.parallel.mesh import make_mesh
from otto_tpu.config import MeshConfig

mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=1),
                 devices=jax.devices()[:1])
B, C, F = 512, 128, 52
params = init_tower(jax.random.PRNGKey(0), F, (256, 256, 128))
opt = optax.adamw(1e-3)
opt_state = opt.init(params)
step = make_dp_ranker_step(mesh, opt, loss_name="lambdarank", dropout=0.1)
feats = jax.random.normal(jax.random.PRNGKey(1), (B, C, F), jnp.float32)
labels = (jax.random.uniform(jax.random.PRNGKey(2), (B, C)) < 0.1).astype(jnp.int8)
mask = jnp.ones((B, C), bool)


def run_tower(n):
    global params, opt_state
    out = None
    for i in range(n):
        params, opt_state, out = step(params, opt_state, feats, labels, mask,
                                      jax.random.PRNGKey(i))
    np.asarray(out)


run_tower(1)
t0 = time.perf_counter()
run_tower(20)
dt = (time.perf_counter() - t0) / 20
print(f"tower step (B=512 sessions x 128 cands, lambdarank): {dt*1e3:.1f} ms = "
      f"{B / dt:,.0f} sessions/s = {B * C / dt:,.0f} candidates/s", flush=True)

# ---- GBDT -------------------------------------------------------------------
from otto_tpu.models.gbdt import train_gbdt_ranker
from otto_tpu.models.ranker import RankerData

rng = np.random.default_rng(0)
Sg, Cg, Fg = 2000, 100, 52
Xg = rng.normal(size=(Sg, Cg, Fg)).astype(np.float32)
yg = (rng.random((Sg, Cg)) < 0.05).astype(np.int8)
gdata = RankerData(features=Xg, labels=yg, mask=np.ones((Sg, Cg), bool),
                   session_ids=np.arange(Sg), candidates=np.zeros((Sg, Cg), np.int32))
gcfg = GBDTConfig(n_trees=30, early_stopping_rounds=1000, max_depth=7,
                  n_bins=255, min_data_in_leaf=100, n_folds=2)
t0 = time.perf_counter()
train_gbdt_ranker(gdata, gcfg)
cold = time.perf_counter() - t0
t0 = time.perf_counter()
train_gbdt_ranker(gdata, gcfg)
dt = time.perf_counter() - t0
trees = gcfg.n_trees * gcfg.n_folds
print(f"GBDT (200k rows x 52 feats, depth 7): {dt:.2f}s for {trees} trees = "
      f"{trees / dt:.1f} trees/s  [cold {cold:.0f}s]", flush=True)

# ---- sequence transformer ----------------------------------------------------
from otto_tpu.models.sequence import train_sequence_model

scfg = SequenceModelConfig(n_aids=N_AIDS, dim=64, hidden=64, architecture="transformer",
                           max_len=20, n_layers=2, n_heads=2, epochs=1)
train_sequence_model(es, scfg)
t0 = time.perf_counter()
train_sequence_model(es, scfg)
dt = time.perf_counter() - t0
print(f"SASRec epoch: {dt:.2f}s = {es.n_events / dt:,.0f} examples/s", flush=True)
