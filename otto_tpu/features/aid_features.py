"""Per-aid (item) feature family.

Reproduces src/ranker/aid_feature_engineering.py:44-231: global aggregates,
per-event-type aggregates, last-week and last-1..7-day windows, weekly
occurrence ratios and pct-change trends, and percentile ranks — all as
segment reductions keyed by aid.

Returned as a dict of [n_aids] float32 arrays named exactly like the
reference's columns, so the ranker's feature list
(models/lightgbm/config.yaml:5-26) resolves directly.
"""

from __future__ import annotations

import numpy as np

from otto_tpu.data.events import EventStore
from otto_tpu.features.base import (
    calendar,
    rank_pct,
    seg_count,
    seg_max,
    seg_mean,
    seg_min,
    seg_nunique,
    seg_std,
)

EVENT_NAMES = ("click", "cart", "order")


def _block(prefix: str, ids, n, sess, typ, ts, cal, cumnorm, is_start, is_end, type_cumsum,
           with_type: bool = True) -> dict[str, np.ndarray]:
    """One aggregate block (the repeated agg dict in the reference,
    aid_feature_engineering.py:57-72)."""
    f = {}
    count = seg_count(ids, n)
    present = count > 0
    f[f"{prefix}count"] = count
    f[f"{prefix}session_nunique"] = np.where(present, seg_nunique(ids, sess, n), np.nan)
    if with_type:
        f[f"{prefix}type_mean"] = seg_mean(ids, typ, n)
    ts_max = seg_max(ids, ts, n)
    ts_min = seg_min(ids, ts, n)
    f[f"{prefix}ts_ratio"] = ts_max / ts_min
    f[f"{prefix}hour_mean"] = seg_mean(ids, cal["hour"], n)
    f[f"{prefix}hour_std"] = seg_std(ids, cal["hour"], n)
    f[f"{prefix}day_of_week_mean"] = seg_mean(ids, cal["day_of_week"], n)
    f[f"{prefix}day_of_week_std"] = seg_std(ids, cal["day_of_week"], n)
    f[f"{prefix}day_of_year_nunique"] = np.where(
        present, seg_nunique(ids, cal["day_of_year"], n), np.nan
    )
    f[f"{prefix}session_cumcount_normalized_mean"] = seg_mean(ids, cumnorm, n)
    f[f"{prefix}is_session_start_mean"] = seg_mean(ids, is_start, n)
    f[f"{prefix}is_session_start_count"] = np.where(present, count, np.nan)
    f[f"{prefix}is_session_end_mean"] = seg_mean(ids, is_end, n)
    f[f"{prefix}is_session_end_count"] = np.where(present, count, np.nan)
    if with_type:
        f[f"{prefix}session_type+1_cumsum_mean"] = seg_mean(ids, type_cumsum, n)

    for col in ("count", "session_nunique", "day_of_year_nunique",
                "is_session_start_count", "is_session_end_count"):
        f[f"{prefix}{col}_rank_pct"] = rank_pct(
            np.where(present, f[f"{prefix}{col}"], np.nan)
        )
    # counts for absent aids are 0 in the global block but NaN-equivalents in
    # merged sub-blocks; rank_pct above excludes NaN like pandas
    return f


def compute_aid_features(store: EventStore, n_aids: int) -> dict[str, np.ndarray]:
    aid = store.aid.astype(np.int64)
    sess = store.session_idx.astype(np.int64)
    typ = store.type.astype(np.float64)
    ts = store.ts.astype(np.float64)
    cal = calendar(store.ts)

    lengths = store.lengths
    pos = store.position_in_session
    cumcount = (pos + 1).astype(np.float64)
    total = lengths[store.session_idx].astype(np.float64)
    cumnorm = cumcount / total
    is_start = (cumcount == 1).astype(np.float64)
    is_end = (cumnorm == 1.0).astype(np.float64)
    # running per-session cumulative sum of (type + 1)
    tp1 = typ + 1.0
    cs = np.cumsum(tp1)
    sess_first = store.offsets[:-1]
    type_cumsum = cs - np.repeat(cs[sess_first] - tp1[sess_first], lengths)

    out = _block("aid_", aid, n_aids, sess, typ, ts, cal, cumnorm, is_start, is_end, type_cumsum)
    # the reference's global block keeps absent-aid count at 0 via merge
    # semantics; sub-blocks below are left-joined (NaN where absent)

    for t, name in enumerate(EVENT_NAMES):
        m = store.type == t
        sub = _block(
            f"aid_{name}_",
            aid[m], n_aids, sess[m], typ[m], ts[m],
            {k: v[m] for k, v in cal.items()},
            cumnorm[m], is_start[m], is_end[m], type_cumsum[m],
            with_type=False,
        )
        # left-join semantics: absent aids get NaN (merge how='left')
        cnt = sub[f"aid_{name}_count"]
        sub[f"aid_{name}_count"] = np.where(cnt > 0, cnt, np.nan)
        out.update(sub)

    with np.errstate(invalid="ignore", divide="ignore"):
        out["aid_click_ratio"] = out["aid_click_count"] / out["aid_count"]
        out["aid_cart_ratio"] = out["aid_cart_count"] / out["aid_count"]
        out["aid_order_ratio"] = out["aid_order_count"] / out["aid_count"]

    # ---- last week window (aid_feature_engineering.py:141-170) ------------
    week = cal["week_of_year"]
    last_week = week == week.max()
    lw = last_week
    sub = _block(
        "aid_last_week_",
        aid[lw], n_aids, sess[lw], typ[lw], ts[lw],
        {k: v[lw] for k, v in cal.items()},
        cumnorm[lw], is_start[lw], is_end[lw], type_cumsum[lw],
    )
    cnt = sub["aid_last_week_count"]
    sub["aid_last_week_count"] = np.where(cnt > 0, cnt, np.nan)
    out.update(sub)

    # ---- last 1..7 day windows (:172-206) ---------------------------------
    days = np.sort(np.unique(cal["day_of_year"]))[-7:]
    for nth, day in enumerate(days):
        label = 7 - nth
        m = cal["day_of_year"] == day
        sub = _block(
            f"aid_last_{label}_day_",
            aid[m], n_aids, sess[m], typ[m], ts[m],
            {k: v[m] for k, v in cal.items()},
            cumnorm[m], is_start[m], is_end[m], type_cumsum[m],
        )
        cnt = sub[f"aid_last_{label}_day_count"]
        sub[f"aid_last_{label}_day_count"] = np.where(cnt > 0, cnt, np.nan)
        out.update(sub)

    # ---- weekly occurrence ratio + pct change (:208-222) ------------------
    weeks = np.sort(np.unique(week))
    n_weeks = len(weeks)
    week_idx = np.searchsorted(weeks, week)
    for t, name in enumerate(EVENT_NAMES):
        m = store.type == t
        key = (aid[m] * n_weeks + week_idx[m]).astype(np.int64)
        counts = np.bincount(key, minlength=n_aids * n_weeks).reshape(n_aids, n_weeks)
        totals = counts.sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(totals > 0, counts[:, -1] / totals, 0.0)
            prev = counts[:, -2] if n_weeks > 1 else np.zeros(n_aids)
            pct = np.where(prev > 0, (counts[:, -1] - prev) / prev, np.nan)
        out[f"aid_{name}_last_week_occurrence_ratio"] = ratio
        out[f"aid_{name}_last_week_occurrence_pct_change"] = pct

    return {k: v.astype(np.float32) for k, v in out.items()}
