"""The aid-weight (recency) baseline.

Replaces src/baseline/aid_weight.py: per-session aid scores are the sum of
log-recency weights ``logspace(0.1, 1, n, base=2) - 1`` times a per-event-type
coefficient ({click:1, cart:6, order:3} in validation mode, {1,3,6} in
submission mode — aid_weight.py:34 vs :88), ranked descending; one top-20 list
is used for all three prediction types.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from otto_tpu import EVENT_TYPES, TOP_K
from otto_tpu.data.events import PackedSessions
from otto_tpu.ops.sessions import recency_weighted_top_aids

VALIDATION_COEFFICIENTS = (1.0, 6.0, 3.0)
SUBMISSION_COEFFICIENTS = (1.0, 3.0, 6.0)


def aid_weight_predictions(
    packed: PackedSessions,
    coefficients=VALIDATION_COEFFICIENTS,
    k: int = TOP_K,
) -> dict[str, np.ndarray]:
    aids, _ = recency_weighted_top_aids(
        jnp.asarray(packed.aids),
        jnp.asarray(packed.types),
        jnp.asarray(packed.mask),
        jnp.asarray(packed.lengths),
        jnp.asarray(coefficients, dtype=jnp.float32),
        k=k,
        lo=0.1,
        hi=1.0,
    )
    preds = np.asarray(aids)
    return {name: preds for name in EVENT_TYPES}
