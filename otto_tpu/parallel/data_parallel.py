"""Data-parallel training for the ranking tower.

Parameters are replicated; the session batch is sharded over the ``data``
mesh axis; gradients are ``psum``-averaged over ICI.  This is the
data-parallelism the reference lacks entirely (SURVEY §2.10: no DDP)."""

from __future__ import annotations

import jax
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otto_tpu.models.ranker import LOSSES, tower_forward


def make_dp_ranker_step(mesh: Mesh, optimizer, loss_name: str = "lambdarank",
                        dropout: float = 0.0, data_axis: str = "data"):
    """Returns a jitted step(params, opt_state, x [B,C,F], y, m, key)."""
    loss_fn = LOSSES[loss_name]

    def step(params, opt_state, x, y, m, key):
        def local(params, opt_state, x, y, m, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))

            def f(p):
                scores = tower_forward(p, x, dropout_rate=dropout, key=key)
                return loss_fn(scores, y, m)

            loss, grads = jax.value_and_grad(f)(params)
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, x, y, m, key)

    return jax.jit(step, donate_argnums=(0, 1))


def make_dp_sequence_step(mesh: Mesh, optimizer, data_axis: str = "data"):
    """Data-parallel training step for the sequential recommender (GRU or
    transformer — dispatch follows the param pytree): the (seq, mask, target,
    negatives) batch shards over the ``data`` axis, parameters replicate,
    gradients pmean over ICI.  Same sampled-softmax objective as
    models.sequence.train_sequence_model."""
    import jax.numpy as jnp

    from otto_tpu.models.sequence import encode

    def step(params, opt_state, seq, mask, tgt, negs):
        def local(params, opt_state, seq, mask, tgt, negs):
            def f(p):
                h = encode(p, seq, mask)
                pos_e = p["item_emb"][tgt]
                neg_e = p["item_emb"][negs]
                pos_logit = jnp.sum(h * pos_e, axis=1)
                neg_logit = jnp.einsum("bd,bnd->bn", h, neg_e)
                logits = jnp.concatenate([pos_logit[:, None], neg_logit], axis=1)
                return -jnp.mean(jax.nn.log_softmax(logits, axis=1)[:, 0])

            loss, grads = jax.value_and_grad(f)(params)
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, seq, mask, tgt, negs)

    return jax.jit(step, donate_argnums=(0, 1))


def make_dp_gbdt_grow(mesh: Mesh, *, depth: int, n_bins: int,
                      hist_chunk: int = 1 << 18, data_axis: str = "data",
                      hist_impl: str = "matmul"):
    """Data-parallel GBDT tree growth: rows shard over ``data``; each device
    builds local histograms and one ``psum`` per level merges them over ICI
    (bytes per level = nodes * features * bins * 3 * 4, independent of row
    count); split search runs redundantly so every device grows the identical
    tree; rows route locally.  The reference's LightGBM/XGBoost engines are
    single-node OpenMP — this is the scale-out they lack.

    Returns ``grow(binned, grad, hess, weight, bag, feat_mask, reg_lambda,
    min_split_gain, min_data_in_leaf, min_child_weight, learning_rate)`` with
    the row-dimension inputs sharded over ``data`` and the tree outputs
    replicated (leaf ids stay sharded)."""
    from functools import partial

    from otto_tpu.models.gbdt import _grow_tree_impl

    fn = partial(_grow_tree_impl, depth=depth, n_bins=n_bins,
                 hist_chunk=hist_chunk, axis_name=data_axis,
                 hist_impl=hist_impl)
    D, R = P(data_axis), P()
    return jax.jit(shard_map(
        fn,
        mesh=mesh,
        in_specs=(D, D, D, D, D, R, R, R, R, R, R),
        out_specs=(R, R, R, R, D),
        check_vma=False,
    ))
