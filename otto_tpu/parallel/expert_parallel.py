"""Expert parallelism: a mixture-of-experts FFN block sharded one expert
group per ``model``-axis device.

The reference has nothing like this (SURVEY §2.10); it completes the
framework's parallelism inventory (dp / tp / sp / pp / ep).  The block is a
drop-in replacement for a transformer FFN or a ranking-tower layer: top-1
gating, fixed per-expert capacity, dense one-hot dispatch/combine matmuls
(MXU-friendly — the classic Shazeer formulation), and a single ``psum`` to
combine expert outputs.

Token layout note: activations here are replicated over the ``model`` axis
(as in the tensor-parallel encoder), so combining expert outputs is a
``psum``; when tokens are *sharded* over the expert axis the same dispatch
tensors ride ``all_to_all`` instead — the math is otherwise identical.

Dropped tokens (expert over capacity) pass through the residual path with
zero expert contribution, the standard capacity-factor behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otto_tpu.parallel.model_parallel import _on_shard0, _sampled_softmax


def init_moe(key, dim: int, hidden: int, n_experts: int):
    kg, k1, k2 = jax.random.split(key, 3)
    s = (1.0 / dim) ** 0.5
    return {
        "wg": jax.random.normal(kg, (dim, n_experts)) * s,
        "w1": jax.random.normal(k1, (n_experts, dim, hidden)) * s,
        "b1": jnp.zeros((n_experts, hidden)),
        "w2": jax.random.normal(k2, (n_experts, hidden, dim)) * (1.0 / hidden) ** 0.5,
        "b2": jnp.zeros((dim,)),
    }


def moe_param_specs(model_axis: str = "model"):
    return {"wg": P(), "w1": P(model_axis), "b1": P(model_axis),
            "w2": P(model_axis), "b2": P()}


def moe_apply(p, x, *, capacity: int, model_axis: str = "model"):
    """MoE FFN over tokens ``x`` [T, D] (replicated across ``model``); the
    local param shard holds ``E/mp`` experts.  Must run inside shard_map.

    Each local expert gathers its top-``capacity`` assigned tokens with a
    one-hot dispatch matmul, applies its FFN, and scatters back weighted by
    the gate probability; shards combine with one psum."""
    T, D = x.shape
    capacity = min(capacity, T)
    e_loc = p["w1"].shape[0]
    m = jax.lax.axis_index(model_axis)
    gate = jax.nn.softmax(x @ p["wg"], axis=1)  # [T, E] (global expert count)
    assign = jnp.argmax(gate, axis=1)
    top_p = jnp.max(gate, axis=1)
    out = jnp.zeros_like(x)
    for e in range(e_loc):
        ge = m * e_loc + e
        score = jnp.where(assign == ge, top_p, -1.0)
        val, idx = jax.lax.top_k(score, capacity)  # this expert's tokens
        w = jnp.where(val > 0, val, 0.0)  # gate weight; 0 for empty slots
        disp = jax.nn.one_hot(idx, T, dtype=x.dtype) * (w > 0)[:, None]  # [C, T]
        xe = disp @ x  # [C, D] gathered tokens (MXU dispatch)
        he = jax.nn.gelu(xe @ p["w1"][e] + p["b1"][e]) @ p["w2"][e]
        out = out + disp.T @ (he * w[:, None])  # combine
    out = jax.lax.psum(out, model_axis)
    return out + p["b2"]


def init_moe_recommender(key, n_aids: int, dim: int, hidden: int, n_experts: int):
    """Pooled-session MoE next-item scorer: mean-pooled item embeddings ->
    residual MoE FFN -> sampled-softmax against the tied item table."""
    ke, km = jax.random.split(key)
    return {
        "item_emb": jax.random.normal(ke, (n_aids + 1, dim)) * 0.05,
        "moe": init_moe(km, dim, hidden, n_experts),
    }


def moe_recommender_specs(model_axis: str = "model"):
    return {"item_emb": P(), "moe": moe_param_specs(model_axis)}


def make_ep_moe_step(mesh: Mesh, optimizer, *, capacity: int,
                     data_axis: str = "data", model_axis: str = "model"):
    """Expert-parallel training step for the pooled-session MoE recommender:
    batch shards over ``data``, experts shard over ``model``; grads flow
    through the psum-combine via the shard_map transpose (see
    parallel/model_parallel.py module docstring).

    Returns ``step(params, opt_state, seq, mask, tgt, negs)``."""
    dp = mesh.shape[data_axis]

    def step(params, opt_state, seq, mask, tgt, negs):
        specs = moe_recommender_specs(model_axis)
        specs = {"item_emb": P(), "moe": specs["moe"]}

        def local(p, seq, mask, tgt, negs):
            emb = p["item_emb"][seq] * mask[:, :, None]  # [B, L, D]
            denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
            pooled = jnp.sum(emb, axis=1) / denom  # [B, D]
            h = pooled + moe_apply(p["moe"], pooled, capacity=capacity,
                                   model_axis=model_axis)
            loss = _sampled_softmax(h, p["item_emb"], tgt, negs)
            return _on_shard0(loss, model_axis).reshape(1, 1)

        def loss_fn(p):
            out = shard_map(
                local,
                mesh=mesh,
                in_specs=(specs, P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
                out_specs=P(data_axis, model_axis),
                check_vma=False,
            )(p, seq, mask, tgt, negs)
            return jnp.sum(out) / dp

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
