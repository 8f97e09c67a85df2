"""Covisitation matrices: construction, persistence, and the heuristic
recommender (the reference's strongest non-ranker model,
src/covisitation/inference.py).

Construction (absent from the reference repo — it consumed external parquet
shards) runs the chunked device pipeline in :mod:`otto_tpu.ops.covisit`:
pair-stream -> on-device sort/segment-reduce -> host accumulator merge ->
per-aid top-k tables.  The resulting dense ``[n_aids, K]`` neighbor tables
replace the reference's dict-of-lists (covisitation_df_to_dict,
src/covisitation/inference.py:19-35) with a single device gather.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from otto_tpu.config import COVISIT_KINDS, CovisitConfig
from otto_tpu.data.events import EventStore
from otto_tpu.logging_utils import get_logger
from otto_tpu.ops.covisit import merge_sorted_chunks, pair_stream, sort_reduce, topk_per_source

log = get_logger(__name__)


@dataclass
class CovisitationMatrices:
    """Per-kind dense top-k neighbor tables.

    ``tables[kind] = (aids int32 [n_aids, K] padded -1, weights float32)``.
    The "top_15_*" (narrow) and "top_*" (wide) shard families of the reference
    are just different K slices of the same tables."""

    tables: dict[str, tuple[np.ndarray, np.ndarray]]
    n_aids: int

    def neighbors(self, kind: str, k: int | None = None) -> np.ndarray:
        aids, _ = self.tables[kind]
        return aids if k is None else aids[:, :k]

    def save(self, directory: str | Path) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        for kind, (aids, weights) in self.tables.items():
            np.savez_compressed(directory / f"covisit_{kind}.npz", aids=aids, weights=weights)

    @classmethod
    def load(cls, directory: str | Path, kinds=COVISIT_KINDS) -> "CovisitationMatrices":
        directory = Path(directory)
        tables = {}
        n_aids = 0
        for kind in kinds:
            z = np.load(directory / f"covisit_{kind}.npz")
            tables[kind] = (z["aids"], z["weights"])
            n_aids = z["aids"].shape[0]
        return cls(tables=tables, n_aids=n_aids)


def build_covisitation(
    store: EventStore,
    n_aids: int,
    config: CovisitConfig = CovisitConfig(),
    chunk_sessions: int = 4096,
) -> CovisitationMatrices:
    """Build all seven matrices in one pass over the event data."""
    T = config.session_tail
    if store.n_events == 0:
        empty = (np.full((n_aids, config.top_k_wide), -1, np.int32),
                 np.zeros((n_aids, config.top_k_wide), np.float32))
        return CovisitationMatrices({k: empty for k in config.kinds}, n_aids)
    t0 = np.int64(store.ts.min())
    t1 = np.int64(store.ts.max())
    type_mult = jnp.asarray(
        [config.click_weight, config.cart_weight, config.order_weight], jnp.float32
    )

    keys_chunks: list[np.ndarray] = []
    weights_chunks: list[np.ndarray] = []
    packed = store.pack(max_len=T, keep="last")
    rel_ts = (packed.ts - t0).astype(np.int32)  # spans weeks, fits int32
    S = packed.n_sessions
    for start in range(0, S, chunk_sessions):
        end = min(start + chunk_sessions, S)
        kx, ky, weights = pair_stream(
            jnp.asarray(packed.aids[start:end]),
            jnp.asarray(packed.types[start:end]),
            jnp.asarray(rel_ts[start:end]),
            jnp.asarray(packed.mask[start:end]),
            n_aids,
            jnp.float32(t1 - t0),
            type_mult,
            jnp.int32(config.window_seconds),
            jnp.int32(14 * 24 * 60 * 60),
        )
        sx, sy, totals, live = sort_reduce(kx, ky, weights)
        live_np = np.asarray(live)
        packed_keys = (
            np.asarray(sx)[live_np].astype(np.int64) * n_aids
            + np.asarray(sy)[live_np].astype(np.int64)
        )
        keys_chunks.append(packed_keys)
        weights_chunks.append(np.asarray(totals)[live_np])

    if not keys_chunks:
        empty = (np.full((n_aids, config.top_k_wide), -1, np.int32),
                 np.zeros((n_aids, config.top_k_wide), np.float32))
        return CovisitationMatrices({k: empty for k in config.kinds}, n_aids)

    keys, weights = merge_sorted_chunks(keys_chunks, weights_chunks)
    log.info("covisitation: %d distinct pairs aggregated", len(keys))

    aid_x = (keys // n_aids).astype(np.int64)
    aid_y = (keys % n_aids).astype(np.int32)
    tables = {}
    for i, kind in enumerate(COVISIT_KINDS):
        if kind not in config.kinds:
            continue
        tables[kind] = topk_per_source(aid_x, aid_y, weights[:, i], n_aids, config.top_k_wide)
    return CovisitationMatrices(tables=tables, n_aids=n_aids)
