"""Matrix-factorization and collaborative-filtering embedding models.

JAX re-design of the reference's torch stack
(src/matrix_factorization/torch_modules.py:4-38, torch_trainer.py):

- **CollaborativeFiltering**: one shared aid table; score = dot(e[x1], e[x2]);
  BCE-with-logits on pair labels.  Pair datasets:
  'diff' — positives are next-aid pairs, negatives in-session shuffles
  (torch_trainer.py:229-255); 'time' — session self-join with
  label = (0 < dt <= hour_difference) aggregated per pair (:198-226).
- **MatrixFactorization**: session table x aid table; MSE regression of the
  event-type value (samples are raw (session, aid, type) rows,
  torch_trainer.py:278-289).

Training is a jitted step with dense adam (the tables' adam moments live in
HBM; per-step cost is bandwidth-bound and tiny next to the gather/matmul at
OTTO scale), early stopping on validation loss, and best-state retention —
the same protocol as the reference (epoch loop :374-433, ES patience 20).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from otto_tpu.config import CFConfig, MFConfig
from otto_tpu.data.events import EventStore
from otto_tpu.data.loader import BatchLoader
from otto_tpu.logging_utils import get_logger

log = get_logger(__name__)


# ---------------------------------------------------------------- pair data
def cf_pairs_diff(store: EventStore, rng: np.random.Generator):
    """'diff' strategy: positives (aid_i, aid_{i+1}); negatives (aid_i,
    in-session shuffled aid); both deduped; same-aid pairs dropped."""
    sidx = store.session_idx
    aid = store.aid.astype(np.int64)
    same_sess = sidx[:-1] == sidx[1:]

    x1_pos = aid[:-1][same_sess]
    x2_pos = aid[1:][same_sess]

    # in-session shuffle: a random permutation *within* each session block
    # (events are session-contiguous, so lexsort by (session, random) pairs
    # each position with a random same-session event)
    r = rng.random(store.n_events)
    order = np.lexsort((r, sidx))
    x3 = aid[order]

    keep_pos = (x1_pos != x2_pos)
    pos = np.stack([x1_pos[keep_pos], x2_pos[keep_pos]], axis=1)
    pos = np.unique(pos, axis=0)

    x1_neg = aid
    keep_neg = x1_neg != x3
    neg = np.stack([x1_neg[keep_neg], x3[keep_neg]], axis=1)
    neg = np.unique(neg, axis=0)

    x = np.concatenate([pos, neg], axis=0)
    y = np.concatenate([np.ones(len(pos), np.float32), np.zeros(len(neg), np.float32)])
    # positive label wins on duplicates (reference concatenates pos first and
    # dedups on (x1, x2))
    _, first_idx = np.unique(x, axis=0, return_index=True)
    return x[first_idx, 0].astype(np.int32), x[first_idx, 1].astype(np.int32), y[first_idx]


def cf_pairs_time(
    store: EventStore,
    rng: np.random.Generator,
    hour_difference: float = 1.0,
    sample_frac: float = 0.15,
    target_aggregation: str = "mean",
):
    """'time' strategy: sampled session self-join; pair target = mean/max of
    (0 < dt <= hour_difference) over co-occurrences."""
    keep = rng.random(store.n_events) < sample_frac
    sidx = store.session_idx[keep]
    aid = store.aid[keep].astype(np.int64)
    ts = store.ts[keep]

    # self-join per session via offsets over the kept subset
    uniq, inv, counts = np.unique(sidx, return_inverse=True, return_counts=True)
    order = np.argsort(inv, kind="stable")
    aid, ts, inv = aid[order], ts[order], inv[order]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

    xs, ys, tg = [], [], []
    # vectorized per-offset pairing (sessions are short; offsets bounded)
    max_len = counts.max() if len(counts) else 0
    for d in range(1, int(max_len)):
        valid = inv[:-d] == inv[d:]
        a_x, a_y = aid[:-d][valid], aid[d:][valid]
        dt_f = (ts[d:][valid] - ts[:-d][valid]) / 3600.0
        dt_b = -dt_f
        for ax, ay, dt in ((a_x, a_y, dt_f), (a_y, a_x, dt_b)):
            ok = ax != ay
            xs.append(ax[ok])
            ys.append(ay[ok])
            tg.append(((dt[ok] > 0) & (dt[ok] <= hour_difference)).astype(np.float32))
    if not xs:
        return (np.empty(0, np.int32),) * 2 + (np.empty(0, np.float32),)
    x1 = np.concatenate(xs)
    x2 = np.concatenate(ys)
    t = np.concatenate(tg)
    key = x1 * (store.aid.max() + 1) + x2
    order = np.argsort(key, kind="stable")
    key, x1, x2, t = key[order], x1[order], x2[order], t[order]
    head = np.concatenate([[True], key[1:] != key[:-1]])
    starts = np.flatnonzero(head)
    sums = np.add.reduceat(t, starts)
    cnts = np.diff(np.concatenate([starts, [len(t)]]))
    if target_aggregation == "mean":
        target = (sums / cnts >= 0.5).astype(np.float32)
    elif target_aggregation == "max":
        target = (sums > 0).astype(np.float32)
    else:
        raise ValueError(target_aggregation)
    return x1[starts].astype(np.int32), x2[starts].astype(np.int32), target


def mf_samples(store: EventStore):
    """(session_idx, aid, target=event type) rows (torch_trainer.py:278-289).
    Sessions are compact indices into the session table."""
    return (
        store.session_idx.astype(np.int32),
        store.aid.astype(np.int32),
        store.type.astype(np.float32),
    )


# ------------------------------------------------------------------- models
@dataclass
class EmbeddingModelState:
    params: dict
    best_params: dict | None = None
    history: list = field(default_factory=list)


def _dot_score(e1, e2):
    return jnp.sum(e1 * e2, axis=-1)


@partial(jax.jit, static_argnames=("loss",))
def _pair_forward(params, x1, x2, loss: str):
    e = params["embeddings"]
    logits = _dot_score(e[x1], e[x2])
    return logits


@partial(jax.jit, static_argnames=("loss",))
def _mf_forward(params, sessions, aids, loss: str):
    return _dot_score(params["session_embeddings"][sessions], params["aid_embeddings"][aids])


def _make_loss(loss: str) -> Callable:
    if loss == "bce":
        return lambda logits, y: jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
    if loss == "mse":
        return lambda logits, y: jnp.mean((logits - y) ** 2)
    raise ValueError(loss)


def _train_epochs(
    params,
    forward,
    loss_name: str,
    data: tuple[np.ndarray, ...],
    batch_size: int,
    epochs: int,
    patience: int,
    optimizer,
    rng: np.random.Generator,
    val_fraction: float = 0.05,
    log_prefix: str = "model",
    sparse_lookups: list[tuple[str, int]] | None = None,
    lr_schedule=None,
):
    """``sparse_lookups`` switches the step to sparse per-coordinate adagrad
    over the looked-up rows only (the reference trains these tables with
    SparseAdam for the same reason, torch_trainer.py:352): a dense optax
    optimizer reads/writes the full [N, D] tables and moments every batch —
    at OTTO scale (14.6M-session table) ~11 GB of HBM traffic per step."""
    loss_fn = _make_loss(loss_name)
    n = len(data[0])
    perm = rng.permutation(n)
    n_val = max(int(n * val_fraction), 1)
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    train = tuple(d[train_idx] for d in data)
    val = tuple(jnp.asarray(d[val_idx]) for d in data)

    if sparse_lookups is None:
        opt_state = optimizer.init(params)
    else:
        (key1, _), (key2, _) = sparse_lookups
        opt_state = {k: jnp.zeros_like(params[k]) for k in {key1, key2}}  # adagrad accs

    @jax.jit
    def step(params, opt_state, *batch):
        def f(p):
            logits = forward(p, *batch[:-1])
            return loss_fn(logits, batch[-1])

        loss, grads = jax.value_and_grad(f)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def sparse_step(params, accs, lr, *batch):
        (k1, p1), (k2, p2) = sparse_lookups
        i1, i2, y = batch[p1], batch[p2], batch[-1]
        e1 = params[k1][i1]
        e2 = params[k2][i2]
        logits = jnp.sum(e1 * e2, axis=-1)
        loss = loss_fn(logits, y)
        B = y.shape[0]
        if loss_name == "bce":
            dl = (jax.nn.sigmoid(logits) - y) / B
        else:  # mse: d mean((l-y)^2) / dl
            dl = 2.0 * (logits - y) / B
        g1 = dl[:, None] * e2
        g2 = dl[:, None] * e1
        accs = dict(accs)
        params = dict(params)
        # accumulate squared grads for BOTH lookups first (k1 may equal k2 —
        # the chained .at composes), then apply with the batch-complete acc
        accs[k1] = accs[k1].at[i1].add(g1 * g1)
        accs[k2] = accs[k2].at[i2].add(g2 * g2)
        params[k1] = params[k1].at[i1].add(-lr * g1 * jax.lax.rsqrt(accs[k1][i1] + 1e-10))
        params[k2] = params[k2].at[i2].add(-lr * g2 * jax.lax.rsqrt(accs[k2][i2] + 1e-10))
        return params, accs, loss

    @jax.jit
    def val_loss_fn(params):
        logits = forward(params, *val[:-1])
        return loss_fn(logits, val[-1]), logits

    best_val = np.inf
    best_params = params
    bad_epochs = 0
    history = []
    B = batch_size
    global_step = 0
    for epoch in range(epochs):
        order = rng.permutation(len(train[0]))
        tl = []
        # prefetching loader overlaps host->device transfer with the previous
        # step's compute (the Merlin-dataloader replacement, data/loader.py);
        # losses stay on device until epoch end so steps never synchronize
        for batch in BatchLoader(train, B, order=order):
            if sparse_lookups is None:
                params, opt_state, l = step(params, opt_state, *batch)
            else:
                lr = jnp.float32(lr_schedule(global_step)) if lr_schedule else jnp.float32(0.05)
                params, opt_state, l = sparse_step(params, opt_state, lr, *batch)
            global_step += 1
            tl.append(l)
        tl = [float(x) for x in tl]
        vl, _ = val_loss_fn(params)
        vl = float(vl)
        history.append({"epoch": epoch, "train_loss": float(np.mean(tl)), "val_loss": vl})
        log.info("%s epoch %d: train %.5f val %.5f", log_prefix, epoch, np.mean(tl), vl)
        if vl < best_val - 1e-7:
            best_val, best_params, bad_epochs = vl, params, 0
        else:
            bad_epochs += 1
            if bad_epochs >= patience:
                log.info("%s: early stopping at epoch %d (best val %.5f)", log_prefix, epoch, best_val)
                break
    return best_params, history, val


@dataclass
class CFModel:
    embeddings: np.ndarray  # [n_aids, d]
    config: CFConfig
    history: list = field(default_factory=list)

    def score_pairs(self, x1, x2):
        e = self.embeddings
        return np.sum(e[x1] * e[x2], axis=-1)

    def save(self, path):
        np.savez_compressed(path, embeddings=self.embeddings)

    @classmethod
    def load(cls, path, config=CFConfig()):
        return cls(np.load(path)["embeddings"], config)


@dataclass
class MFModel:
    session_embeddings: np.ndarray
    aid_embeddings: np.ndarray
    config: MFConfig
    history: list = field(default_factory=list)

    def save(self, path):
        np.savez_compressed(
            path, session_embeddings=self.session_embeddings, aid_embeddings=self.aid_embeddings
        )

    @classmethod
    def load(cls, path, config=MFConfig()):
        z = np.load(path)
        return cls(z["session_embeddings"], z["aid_embeddings"], config)


def train_cf(store: EventStore, n_aids: int, config: CFConfig = CFConfig()) -> CFModel:
    rng = np.random.default_rng(config.seed)
    if config.sampling_strategy == "diff":
        x1, x2, y = cf_pairs_diff(store, rng)
    elif config.sampling_strategy == "time":
        x1, x2, y = cf_pairs_time(store, rng, hour_difference=config.hour_difference)
    else:
        raise ValueError(config.sampling_strategy)
    log.info("cf pairs: %d (%.2f%% positive)", len(y), 100 * y.mean() if len(y) else 0.0)

    key = jax.random.PRNGKey(config.seed)
    params = {
        "embeddings": jax.random.normal(key, (n_aids, config.n_factors), jnp.float32) * 0.05
    }
    schedule = optax.exponential_decay(
        config.learning_rate, config.lr_decay_steps, config.lr_decay_rate, staircase=True
    )
    best, history, _ = _train_epochs(
        params,
        partial(_pair_forward, loss=config.loss),
        config.loss,
        (x1, x2, y),
        config.batch_size,
        config.epochs,
        config.early_stopping_patience,
        None,
        rng,
        log_prefix="cf",
        sparse_lookups=[("embeddings", 0), ("embeddings", 1)],
        lr_schedule=schedule,
    )
    return CFModel(np.asarray(best["embeddings"]), config, history)


def train_mf(store: EventStore, n_aids: int, config: MFConfig = MFConfig()) -> MFModel:
    rng = np.random.default_rng(config.seed)
    sessions, aids, target = mf_samples(store)
    n_sessions = store.n_sessions
    key = jax.random.PRNGKey(config.seed)
    k1, k2 = jax.random.split(key)
    params = {
        "session_embeddings": jax.random.normal(k1, (n_sessions, config.n_factors), jnp.float32)
        * 0.05,
        "aid_embeddings": jax.random.normal(k2, (n_aids, config.n_factors), jnp.float32) * 0.05,
    }
    schedule = optax.exponential_decay(
        config.learning_rate, config.lr_decay_steps, config.lr_decay_rate, staircase=True
    )
    best, history, _ = _train_epochs(
        params,
        partial(_mf_forward, loss=config.loss),
        config.loss,
        (sessions, aids, target),
        config.batch_size,
        config.epochs,
        config.early_stopping_patience,
        None,
        rng,
        log_prefix="mf",
        sparse_lookups=[("session_embeddings", 0), ("aid_embeddings", 1)],
        lr_schedule=schedule,
    )
    return MFModel(
        np.asarray(best["session_embeddings"]), np.asarray(best["aid_embeddings"]), config, history
    )
