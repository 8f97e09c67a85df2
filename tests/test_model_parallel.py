"""Tensor-, sequence-, pipeline-, and expert-parallel training paths on the
virtual 8-device CPU mesh, verified against single-device oracles.

The oracle for tp/sp/pp is the plain single-device ``models.sequence.encode``
+ sampled-softmax step: identical math, so losses and post-step parameters
must agree to float32 rounding.  The expert-parallel MoE is checked for
invariance across mesh shapes (1x1 vs 2x4 vs 1x8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from otto_tpu.config import MeshConfig
from otto_tpu.models.sequence import encode, init_params
from otto_tpu.parallel.mesh import make_mesh
from otto_tpu.parallel.model_parallel import (
    _sampled_softmax,
    make_pp_sequence_step,
    make_tp_sequence_step,
    pp_param_specs,
    shard_params,
    stack_pipeline_params,
    tp_param_specs,
)

V, D, L, B, NEG = 64, 16, 16, 8, 5


def _copy(tree):
    # device_put can alias host buffers; steps donate their params
    return jax.tree.map(lambda a: jnp.array(a, copy=True), tree)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    # 8 heads so every mesh shape up to model_parallel=8 divides them
    params = init_params(jax.random.PRNGKey(0), V, D, D, architecture="transformer",
                         max_len=L, n_layers=4, n_heads=8)
    seq = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))
    lens = rng.integers(2, L + 1, B)
    mask = jnp.asarray(np.arange(L)[None, :] < lens[:, None])
    tgt = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, V, (B, NEG)).astype(np.int32))
    opt = optax.sgd(0.1)

    def oracle_loss(p):
        return _sampled_softmax(encode(p, seq, mask), p["item_emb"], tgt, negs)

    oloss, ograds = jax.value_and_grad(oracle_loss)(params)
    oparams = optax.apply_updates(params, opt.update(ograds, opt.init(params), params)[0])
    return params, (seq, mask, tgt, negs), opt, float(oloss), oparams


def _max_leaf_diff(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


@pytest.mark.parametrize("dp,mp,sp", [(2, 4, False), (2, 4, True), (4, 2, False),
                                      (8, 1, False), (1, 8, True)])
def test_tp_matches_single_device(setup, dp, mp, sp):
    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))
    p = shard_params(mesh, _copy(params), tp_param_specs(params))
    step = make_tp_sequence_step(mesh, opt, sequence_parallel=sp)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, oparams) < 1e-5


@pytest.mark.parametrize("dp,mp,n_micro", [(2, 4, 2), (1, 4, 4), (2, 2, 2)])
def test_pp_matches_single_device(setup, dp, mp, n_micro):
    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp),
                     devices=jax.devices()[: dp * mp])
    stacked = stack_pipeline_params(params, mp)
    p = shard_params(mesh, _copy(stacked), pp_param_specs(stacked))
    step = make_pp_sequence_step(mesh, opt, n_micro=n_micro)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, stack_pipeline_params(oparams, mp)) < 1e-5


def test_stack_pipeline_params_roundtrip(setup):
    params, *_ = setup
    stacked = stack_pipeline_params(params, 2)
    lw = stacked["stage_layers"]["ffn_w1"]
    assert lw.shape == (2, 2, D, 4 * D)
    np.testing.assert_array_equal(np.asarray(lw[1, 0]),
                                  np.asarray(params["layers"][2]["ffn_w1"]))
    with pytest.raises(ValueError):
        stack_pipeline_params(params, 3)


def test_ep_moe_mesh_invariance():
    from otto_tpu.parallel.expert_parallel import (
        init_moe_recommender, make_ep_moe_step, moe_recommender_specs)

    rng = np.random.default_rng(1)
    E, H, Lm = 8, 32, 12
    params = init_moe_recommender(jax.random.PRNGKey(0), V, D, H, E)
    seq = jnp.asarray(rng.integers(0, V, (B, Lm)).astype(np.int32))
    lens = rng.integers(1, Lm + 1, B)
    mask = jnp.asarray(np.arange(Lm)[None, :] < lens[:, None]).astype(jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, V, (B, NEG)).astype(np.int32))
    opt = optax.sgd(0.1)

    results = {}
    for dp, mp in ((1, 1), (2, 4), (1, 8)):
        mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp),
                         devices=jax.devices()[: dp * mp])
        p = shard_params(mesh, _copy(params), moe_recommender_specs())
        step = make_ep_moe_step(mesh, opt, capacity=B)  # non-binding capacity
        p2, _, loss = step(p, opt.init(p), seq, mask, tgt, negs)
        results[(dp, mp)] = (float(loss), jax.tree.map(np.asarray, p2))

    ref_loss, ref_p = results[(1, 1)]
    assert np.isfinite(ref_loss)
    for key, (loss, p2) in results.items():
        assert abs(loss - ref_loss) < 1e-6, key
        assert _max_leaf_diff(p2, ref_p) < 1e-6, key


def test_sharded_checkpoint_roundtrip(setup, tmp_path):
    """tp-sharded params save through the checkpoint manager and restore
    *onto the mesh* (sharded template), then keep training identically."""
    from otto_tpu.utils.checkpoint import CheckpointManager

    params, batch, opt, _, _ = setup
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    specs = tp_param_specs(params)
    p = shard_params(mesh, _copy(params), specs)
    step = make_tp_sequence_step(mesh, opt)
    p1, st1, _ = step(p, opt.init(p), *batch)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(1, {"params": jax.tree.map(np.asarray, p1)})
    template = shard_params(mesh, jax.tree.map(jnp.zeros_like, params), specs)
    restored = mgr.restore(1, template={"params": template})["params"]
    mgr.close()

    assert _max_leaf_diff(restored, p1) == 0.0
    # restored arrays carry the mesh shardings and training continues
    wq = restored["layers"][0]["wq"]
    assert "model" in str(wq.sharding.spec)
    p2a, _, la = step(_copy(p1), opt.init(p1), *batch)
    p2b, _, lb = step(restored, opt.init(restored), *batch)
    assert abs(float(la) - float(lb)) < 1e-6
    assert _max_leaf_diff(p2a, p2b) < 1e-6


def test_ep_moe_capacity_drops_tokens():
    """Over-capacity tokens must pass through with zero expert contribution
    (residual only) — check the forward is finite and differs from the
    uncapped one when capacity binds."""
    from otto_tpu.parallel.expert_parallel import (
        init_moe, moe_apply, moe_param_specs)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=4),
                     devices=jax.devices()[:4])
    params = init_moe(jax.random.PRNGKey(2), D, 32, 4)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(16, D)).astype(np.float32))

    def run(cap):
        def local(p, x):
            return moe_apply(p, x, capacity=cap)
        return shard_map(
            local, mesh=mesh,
            in_specs=(moe_param_specs(), P()), out_specs=P(),
            check_vma=False,
        )(shard_params(mesh, _copy(params), moe_param_specs()), x)

    full = np.asarray(run(16))
    capped = np.asarray(run(1))
    assert np.isfinite(full).all() and np.isfinite(capped).all()
    assert np.abs(full - capped).max() > 1e-6


@pytest.mark.parametrize("dp,mp,sp", [(2, 4, False), (2, 4, True), (2, 2, False)])
def test_tp_moe_transformer_matches_single_device(dp, mp, sp):
    """Transformer with MoE FFN layers (moe_experts=8): tensor-parallel
    attention + expert-parallel FFN must match the single-device dense-MoE
    oracle."""
    rng = np.random.default_rng(2)
    params = init_params(jax.random.PRNGKey(1), V, D, D, architecture="transformer",
                         max_len=L, n_layers=2, n_heads=8, moe_experts=8)
    seq = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))
    lens = rng.integers(2, L + 1, B)
    mask = jnp.asarray(np.arange(L)[None, :] < lens[:, None])
    tgt = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, V, (B, NEG)).astype(np.int32))
    opt = optax.sgd(0.1)

    def oracle_loss(p):
        return _sampled_softmax(encode(p, seq, mask), p["item_emb"], tgt, negs)

    oloss, ograds = jax.value_and_grad(oracle_loss)(params)
    oparams = optax.apply_updates(params, opt.update(ograds, opt.init(params), params)[0])

    mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp),
                     devices=jax.devices()[: dp * mp])
    p = shard_params(mesh, _copy(params), tp_param_specs(params))
    step = make_tp_sequence_step(mesh, opt, sequence_parallel=sp)
    p2, _, loss = step(p, opt.init(p), seq, mask, tgt, negs)
    assert abs(float(loss) - float(oloss)) < 1e-5
    assert _max_leaf_diff(p2, oparams) < 1e-5


def test_pp_moe_transformer_matches_matched_groups():
    """MoE routing/capacity is defined per token group, so the pipeline's
    microbatching IS part of the math: the oracle is a 1-device, 1-stage
    pipeline with the same microbatch size (dp=2 x n_micro=2 over 8 sessions
    == 4 microbatches of 2), which must match exactly."""
    params = init_params(jax.random.PRNGKey(1), V, D, D, architecture="transformer",
                         max_len=L, n_layers=4, n_heads=4, moe_experts=4)
    rng = np.random.default_rng(3)
    seq = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))
    mask = jnp.asarray(np.arange(L)[None, :] < rng.integers(2, L + 1, B)[:, None])
    tgt = jnp.asarray(rng.integers(0, V, B).astype(np.int32))
    negs = jnp.asarray(rng.integers(0, V, (B, NEG)).astype(np.int32))
    opt = optax.sgd(0.1)
    batch = (seq, mask, tgt, negs)

    def run(dp, mp, n_micro):
        mesh = make_mesh(MeshConfig(data_parallel=dp, model_parallel=mp),
                         devices=jax.devices()[: dp * mp])
        stacked = stack_pipeline_params(params, mp)
        p = shard_params(mesh, _copy(stacked), pp_param_specs(stacked))
        step = make_pp_sequence_step(mesh, opt, n_micro=n_micro)
        p2, _, loss = step(p, opt.init(p), *batch)
        flat = {f"l{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(
            {k: v for k, v in p2.items() if k != "stage_layers"}))}
        stages = jax.tree.map(np.asarray, p2["stage_layers"])
        return float(loss), flat, stages

    loss_pp, flat_pp, stages_pp = run(2, 4, 2)   # 4 stages, mbs = 2
    loss_1, flat_1, stages_1 = run(1, 1, 4)      # 1 stage, same mbs = 2
    assert abs(loss_pp - loss_1) < 1e-5
    for k in flat_pp:
        np.testing.assert_allclose(flat_pp[k], flat_1[k], atol=1e-5)
    # stage_layers layouts differ ([4,1,...] vs [1,4,...]); compare flattened
    for a, b in zip(jax.tree.leaves(stages_pp), jax.tree.leaves(stages_1)):
        np.testing.assert_allclose(a.reshape(b.shape), b, atol=1e-5)


def test_tp_remat_matches_single_device(setup):
    """remat=True (jax.checkpoint around each block) must not change the
    math — same loss and post-step params as the stored-activation path."""
    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    p = shard_params(mesh, _copy(params), tp_param_specs(params))
    step = make_tp_sequence_step(mesh, opt, remat=True)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, oparams) < 1e-5


@pytest.mark.parametrize("dp,pp,tp,sp,n_micro", [
    (2, 2, 2, False, 2),   # the full 3D composition
    (1, 2, 4, True, 2),    # tensor+sequence parallel inside each stage
    (1, 4, 2, False, 4),   # deep pipeline, 1 layer/stage
])
def test_3d_matches_single_device(setup, dp, pp, tp, sp, n_micro):
    """data x pipeline x tensor composed in one step must reproduce the
    single-device oracle exactly (same math, f32 rounding)."""
    from otto_tpu.parallel.mesh import make_mesh3d
    from otto_tpu.parallel.model_parallel import (
        make_pp_tp_sequence_step, pp_tp_param_specs)

    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh3d(dp, pp, tp)
    stacked = stack_pipeline_params(params, pp)
    p = shard_params(mesh, _copy(stacked), pp_tp_param_specs(stacked))
    step = make_pp_tp_sequence_step(mesh, opt, n_micro=n_micro,
                                    sequence_parallel=sp)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, stack_pipeline_params(oparams, pp)) < 1e-5


def test_3d_remat_matches_single_device(setup):
    from otto_tpu.parallel.mesh import make_mesh3d
    from otto_tpu.parallel.model_parallel import (
        make_pp_tp_sequence_step, pp_tp_param_specs)

    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh3d(2, 2, 2)
    stacked = stack_pipeline_params(params, 2)
    p = shard_params(mesh, _copy(stacked), pp_tp_param_specs(stacked))
    step = make_pp_tp_sequence_step(mesh, opt, n_micro=2, remat=True)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, stack_pipeline_params(oparams, 2)) < 1e-5


def test_pp_remat_matches_single_device(setup):
    params, batch, opt, oloss, oparams = setup
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    stacked = stack_pipeline_params(params, 4)
    p = shard_params(mesh, _copy(stacked), pp_param_specs(stacked))
    step = make_pp_sequence_step(mesh, opt, n_micro=2, remat=True)
    p2, _, loss = step(p, opt.init(p), *batch)
    assert abs(float(loss) - oloss) < 1e-5
    assert _max_leaf_diff(p2, stack_pipeline_params(oparams, 4)) < 1e-5
