"""Global seeding (reference: src/matrix_factorization/torch_utils.py:7-30).

JAX PRNG keys are explicit and deterministic by construction; this helper
seeds the *host-side* generators (python, numpy) that data preparation uses,
and returns the root JAX key.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def host_rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)
