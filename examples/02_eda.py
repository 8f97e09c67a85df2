"""EDA example (replaces the reference's EDA notebook): distributions,
session anatomy, and a worked recall@20 example for one session."""

import sys as _sys, pathlib as _pathlib
_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from otto_tpu import visualization as viz
from otto_tpu.data import splits, synthetic_events
from otto_tpu.eval.metrics import cart_order_recall_at_k, click_recall_at_k

store = synthetic_events(n_sessions=5_000, n_aids=1_000)
counts = np.bincount(store.aid, minlength=1_000).astype(float)
print("events:", store.n_events, "sessions:", store.n_sessions)
print("type mix:", np.bincount(store.type) / store.n_events)
viz.visualize_aid_frequencies(counts, "/tmp/eda_freq.png")
viz.visualize_session(store, 0, "/tmp/eda_session.png")

# worked recall example (reference EDA notebook cells 41-45)
sp = splits.split_by_fraction(store, val_fraction=0.2)
s = 0
preds = np.full((1, 20), -1, np.int32)
lo, hi = sp.val_input.offsets[s], sp.val_input.offsets[s + 1]
own = list(dict.fromkeys(sp.val_input.aid[lo:hi][::-1].tolist()))[:20]
preds[0, : len(own)] = own
click_r, _ = click_recall_at_k(preds, sp.val_labels.click[s : s + 1])
cart_r, _ = cart_order_recall_at_k(preds, sp.val_labels.padded("carts")[s : s + 1])
print(f"session {sp.val_input.session_ids[s]}: click recall {float(click_r):.0f}, "
      f"cart recall {float(cart_r):.2f}")
