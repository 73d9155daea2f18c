"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from autoprog_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_batch
from autoprog_tpu.parallel.tp import (
    param_spec,
    shard_state_tp,
    validate_tp,
)


def test_param_spec_rules():
    def spec(*path, ndim=2):
        class K:  # mimic DictKey
            def __init__(self, k):
                self.key = k
        return param_spec(tuple(K(p) for p in path), ndim)

    assert spec("s1b0", "attn", "qkv", "kernel") == P(None, MODEL_AXIS)
    assert spec("s1b0", "attn", "proj", "kernel") == P(MODEL_AXIS, None)
    assert spec("s1b0", "mlp", "fc1", "kernel") == P(None, MODEL_AXIS)
    assert spec("s1b0", "mlp", "fc2", "kernel") == P(MODEL_AXIS, None)
    assert spec("s1b0", "mlp", "fc1", "bias", ndim=1) == P(MODEL_AXIS)
    assert spec("s0b0", "attn", "v", "kernel") == P(None, MODEL_AXIS)
    assert spec("post0", "attn", "kv", "kernel") == P(None, MODEL_AXIS)
    # replicated: norms, embeddings, stem, head
    assert spec("s1b0", "norm1", "scale", ndim=1) == P()
    assert spec("pos_embed", ndim=4) == P()
    assert spec("head", "kernel") == P()
    assert spec("patch_embed", "proj", "kernel", ndim=4) == P()


def test_validate_tp():
    mesh = make_mesh(model_parallel=2)
    validate_tp(mesh, (6, 12, 12, 12))
    with pytest.raises(ValueError):
        validate_tp(mesh, (5, 12))


def test_tp_train_step_matches_dp():
    """The same train step on a (4-data x 2-model) mesh with TP-sharded
    params must produce the same loss and updated params as pure DP."""
    import argparse

    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.parallel.mesh import replicate
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder

    args = argparse.Namespace(
        opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
        weight_decay=0.05, clip_grad=None, clip_mode="norm",
        token_label=False, token_label_data="", token_label_size=1,
        dense_weight=0.5, cls_weight=1.0, ground_truth=False, smoothing=0.1)
    mdef = create_model("deit_h2_l2")
    model = mdef.make(num_classes=8, img_size=32, dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    tx = create_optimizer(args, variables["params"])
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     num_classes=8, donate=False)

    rs = np.random.RandomState(0)
    batch_np = {
        "image": rs.randn(8, 32, 32, 3).astype(np.float32),
        "label": rs.randint(0, 8, 8).astype(np.int32),
    }
    rng = jax.random.PRNGKey(3)
    step = sb.train_step(r=32, splits=1)

    results = {}
    for name, mp in (("dp", 1), ("tp", 2)):
        mesh = make_mesh(model_parallel=mp)
        state = TrainState.create(
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats={}, tx=tx)
        state = replicate(mesh, state)
        if mp > 1:
            state = shard_state_tp(mesh, state)
            qkv = state.params["s0b0"]["attn"]["qkv"]["kernel"]
            assert qkv.sharding.spec == P(None, MODEL_AXIS)
        batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch_np))
        new_state, m = step(state, batch, 1e-3, rng)
        results[name] = (float(m["loss"]),
                         np.asarray(jax.tree.leaves(new_state.params)[0]))
    assert results["dp"][0] == pytest.approx(results["tp"][0], rel=1e-5)
    np.testing.assert_allclose(results["dp"][1], results["tp"][1],
                               rtol=1e-4, atol=1e-6)


def test_tp_with_progressive_growth():
    """Stage growth re-applies TP shardings to the grown state; the grown
    model trains on the dp x tp mesh."""
    from autoprog_tpu import engine
    from autoprog_tpu.config import parse_args
    from autoprog_tpu.parallel.mesh import MODEL_AXIS, shard_batch

    args, text = parse_args(
        ["synthetic://", "--model", "deit_h4_l2", "--num-classes", "8",
         "--img-size", "32", "-b", "16", "--workers", "0", "--no-bf16",
         "--drop-path", "0.0", "--model-parallel", "2"], prog=True)
    ctx = engine.setup(args, text, prog=True, initial_model="deit_h4_l2")
    engine.create_stage_model_and_state(ctx, "deit_h4_l4", dp=0.0,
                                        load="slice")
    qkv = ctx.state.params["s0b3"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, MODEL_AXIS)
    rs = np.random.RandomState(0)
    batch = shard_batch(ctx.mesh, {
        "image": jnp.asarray(rs.randn(16, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rs.randint(0, 8, 16), jnp.int32)})
    step = ctx.sb.train_step(r=32, splits=1)
    ctx.state, m = step(ctx.state, batch, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_tp_forces_fused_attn_off(monkeypatch, tmp_path):
    """The fused MHSA kernel is opaque to the SPMD partitioner for the
    head-sharded axis, so engine.setup must force the default-on flag off
    under tensor parallelism (engine.py) even if the user exported it."""
    import os

    from autoprog_tpu import engine
    from autoprog_tpu.config import parse_args

    monkeypatch.setenv("AUTOPROG_FUSED_ATTN", "1")
    args, text = parse_args([
        "synthetic://", "--model", "deit_h2_l2", "--num-classes", "8",
        "--img-size", "32", "-b", "16", "--workers", "0", "--no-bf16",
        "--model-parallel", "2", "--fake-data-size", "32"], prog=False)
    ctx = engine.setup(args, text, prog=False, output_dir=str(tmp_path))
    assert os.environ["AUTOPROG_FUSED_ATTN"] == "0"
    assert ctx.mesh.shape[MODEL_AXIS] == 2
