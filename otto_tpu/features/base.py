"""Shared feature-engineering primitives: grouped aggregations over flat id
columns, calendar decomposition, and percentile ranks.

The reference's FE stages are pandas/polars groupby-agg chains
(src/ranker/aid_feature_engineering.py, session_feature_engineering.py,
interaction_feature_engineering.py).  Here the same statistics come from
vectorized segment reductions over id columns — bincount-style scatter adds
(the same shape the on-device `.at[ids].add` kernels take; the host numpy
path is used for one-shot offline FE, which is bandwidth- not compute-bound).
"""

from __future__ import annotations

import numpy as np

SECONDS_PER_DAY = 86400
TZ_OFFSET = 2 * 60 * 60  # the reference shifts timestamps by +2h (CET)


def calendar(ts: np.ndarray) -> dict[str, np.ndarray]:
    """hour / day_of_week / day_of_year / week_of_year from epoch seconds
    (aid_feature_engineering.py:43-47 semantics, pandas-compatible)."""
    t = ts.astype("int64") + TZ_OFFSET
    days = t // SECONDS_PER_DAY
    hour = ((t % SECONDS_PER_DAY) // 3600).astype(np.int32)
    # 1970-01-01 was a Thursday; pandas dayofweek: Monday=0
    day_of_week = ((days + 3) % 7).astype(np.int32)
    dt = days.astype("datetime64[D]")
    years = dt.astype("datetime64[Y]")
    day_of_year = (dt - years).astype(np.int64).astype(np.int32) + 1
    # ISO week of year (pandas isocalendar().week)
    dt_days = dt.astype(np.int64)
    thursday = dt_days - ((dt_days + 3) % 7) + 3  # Thursday of this ISO week
    iso_year_start = (thursday.astype("datetime64[D]").astype("datetime64[Y]")).astype("datetime64[D]").astype(np.int64)
    week = ((thursday - iso_year_start) // 7 + 1).astype(np.int32)
    return {
        "hour": hour,
        "day_of_week": day_of_week,
        "day_of_year": day_of_year,
        "week_of_year": week,
    }


def seg_sum(ids, values, n) -> np.ndarray:
    return np.bincount(ids, weights=values, minlength=n)[:n]


def seg_count(ids, n) -> np.ndarray:
    return np.bincount(ids, minlength=n)[:n].astype(np.float64)


def seg_mean(ids, values, n) -> np.ndarray:
    c = seg_count(ids, n)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(c > 0, seg_sum(ids, values, n) / c, np.nan)


def seg_std(ids, values, n) -> np.ndarray:
    """Sample std (ddof=1, pandas default); NaN for groups of size < 2."""
    c = seg_count(ids, n)
    m = seg_mean(ids, values, n)
    ss = seg_sum(ids, np.asarray(values, np.float64) ** 2, n)
    with np.errstate(invalid="ignore", divide="ignore"):
        var = (ss - c * m**2) / (c - 1)
    return np.where(c > 1, np.sqrt(np.maximum(var, 0)), np.nan)


def seg_min(ids, values, n, fill=np.nan) -> np.ndarray:
    out = np.full(n, np.inf)
    np.minimum.at(out, ids, values)
    return np.where(np.isfinite(out), out, fill)


def seg_max(ids, values, n, fill=np.nan) -> np.ndarray:
    out = np.full(n, -np.inf)
    np.maximum.at(out, ids, values)
    return np.where(np.isfinite(out), out, fill)


def seg_last(ids, values, n, fill=np.nan) -> np.ndarray:
    """Last value per group, given rows in chronological order."""
    out = np.full(n, fill, dtype=np.float64)
    out[ids] = values  # later rows overwrite earlier ones
    return out


def seg_nunique(ids, values, n) -> np.ndarray:
    """Distinct-value count per group."""
    if len(ids) == 0:
        return np.zeros(n)
    pairs = ids.astype(np.int64) * (np.int64(values.max()) + 1 if len(values) else 1) + values.astype(np.int64)
    order = np.argsort(pairs, kind="stable")
    sp = pairs[order]
    head = np.concatenate([[True], sp[1:] != sp[:-1]])
    return np.bincount(ids[order][head], minlength=n)[:n].astype(np.float64)


def rank_pct(values: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
    """pandas ``rank(pct=True)``: average rank of each value divided by the
    count of non-NaN entries."""
    v = np.asarray(values, np.float64)
    valid = ~np.isnan(v) if mask is None else (mask & ~np.isnan(v))
    n = valid.sum()
    out = np.full(len(v), np.nan)
    if n == 0:
        return out
    vv = v[valid]
    order = np.argsort(vv, kind="stable")
    sorted_v = vv[order]
    idx = np.arange(1, n + 1, dtype=np.float64)
    head = np.concatenate([[True], sorted_v[1:] != sorted_v[:-1]])
    group = np.cumsum(head) - 1
    gsum = np.bincount(group, weights=idx)
    gcnt = np.bincount(group)
    ranks = np.empty(n)
    ranks[order] = (gsum / gcnt)[group]
    out[valid] = ranks / n
    return out
