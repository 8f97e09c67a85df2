"""Frequency statistics + the aid-frequency baseline.

Replaces src/baseline/frequency_statistics.py (global and per-event-type
top-20 most frequent aids over train/test/all, persisted as JSON keyed by aid)
and src/baseline/aid_frequency.py (predict the session's distinct aids in
first-seen order padded with the global per-type top-20).

Counting is a single on-device scatter-add over the flat aid column
(``segment_sum`` onto the ~1.86M-wide aid axis) followed by ``lax.top_k`` —
the reference's pandas groupby/sort pipeline collapses into two XLA ops.
"""

from __future__ import annotations

import json
from functools import partial
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu import EVENT_TYPES, TOP_K
from otto_tpu.data.events import EventStore, PackedSessions
from otto_tpu.ops.sessions import distinct_first_seen


@partial(jax.jit, static_argnames=("n_aids",))
def aid_counts(aids: jax.Array, n_aids: int, weights: jax.Array | None = None) -> jax.Array:
    w = jnp.ones_like(aids, dtype=jnp.float32) if weights is None else weights
    return jnp.zeros((n_aids,), jnp.float32).at[aids].add(w)


@dataclass
class FrequencyStatistics:
    """Top-k most frequent aids, globally and per event type."""

    top_all: np.ndarray  # [k] aids
    top_by_type: dict[str, np.ndarray]  # 'clicks'/'carts'/'orders' -> [k]
    counts_all: np.ndarray
    counts_by_type: dict[str, np.ndarray]

    @classmethod
    def compute(cls, store: EventStore, n_aids: int, k: int = TOP_K) -> "FrequencyStatistics":
        aids = jnp.asarray(store.aid)
        counts = aid_counts(aids, n_aids)
        top_counts, top_idx = jax.lax.top_k(counts, k)
        top_by_type, counts_by_type = {}, {}
        for t, name in enumerate(EVENT_TYPES):
            m = store.type == t
            c = aid_counts(jnp.asarray(store.aid[m]), n_aids)
            tc, ti = jax.lax.top_k(c, k)
            top_by_type[name] = np.asarray(ti)
            counts_by_type[name] = np.asarray(tc)
        return cls(
            top_all=np.asarray(top_idx),
            top_by_type=top_by_type,
            counts_all=np.asarray(top_counts),
            counts_by_type=counts_by_type,
        )

    # JSON layout mirrors the reference's aid_frequencies files:
    # {"<aid>": count, ...} ordered by descending count
    # (src/baseline/frequency_statistics.py:44-52).
    def save(self, directory: str | Path, prefix: str = "all") -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        k = len(self.top_all)
        with open(directory / f"{prefix}_{k}_most_frequent_aids.json", "w") as f:
            json.dump({str(int(a)): int(c) for a, c in zip(self.top_all, self.counts_all)}, f, indent=2)
        for name in EVENT_TYPES:
            singular = {"clicks": "click", "carts": "cart", "orders": "order"}[name]
            with open(directory / f"{prefix}_{k}_most_frequent_{singular}_aids.json", "w") as f:
                json.dump(
                    {
                        str(int(a)): int(c)
                        for a, c in zip(self.top_by_type[name], self.counts_by_type[name])
                    },
                    f,
                    indent=2,
                )

    @classmethod
    def load(cls, directory: str | Path, prefix: str = "all", k: int = TOP_K) -> "FrequencyStatistics":
        directory = Path(directory)
        with open(directory / f"{prefix}_{k}_most_frequent_aids.json") as f:
            d = json.load(f)
        top_all = np.array([int(a) for a in d], dtype=np.int32)
        counts_all = np.array(list(d.values()), dtype=np.float32)
        top_by_type, counts_by_type = {}, {}
        for name in EVENT_TYPES:
            singular = {"clicks": "click", "carts": "cart", "orders": "order"}[name]
            with open(directory / f"{prefix}_{k}_most_frequent_{singular}_aids.json") as f:
                d = json.load(f)
            top_by_type[name] = np.array([int(a) for a in d], dtype=np.int32)
            counts_by_type[name] = np.array(list(d.values()), dtype=np.float32)
        return cls(top_all, top_by_type, counts_all, counts_by_type)


@jax.jit
def _fill_with_global(session_preds: jax.Array, global_top: jax.Array) -> jax.Array:
    """Append ``global_top[: k - n_session_aids]`` after the session's own
    predictions (no dedup — reference semantics,
    src/baseline/aid_frequency.py:48-50)."""
    S, K = session_preds.shape
    n_own = jnp.sum(session_preds >= 0, axis=1)  # session preds are front-packed
    col = jnp.arange(K, dtype=jnp.int32)[None, :]
    fill_idx = jnp.clip(col - n_own[:, None], 0, K - 1)
    filler = global_top[fill_idx]
    return jnp.where(session_preds >= 0, session_preds, filler).astype(jnp.int32)


def aid_frequency_predictions(
    packed: PackedSessions, stats: FrequencyStatistics, k: int = TOP_K
) -> dict[str, np.ndarray]:
    """The aid-frequency baseline: distinct session aids (first-seen order)
    padded with the per-type global top-k."""
    aids = jnp.asarray(packed.aids)
    mask = jnp.asarray(packed.mask)
    own = distinct_first_seen(aids, mask, k=k)
    out = {}
    for name in EVENT_TYPES:
        out[name] = np.asarray(_fill_with_global(own, jnp.asarray(stats.top_by_type[name][:k])))
    return out
