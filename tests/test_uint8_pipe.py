"""uint8 input pipeline tests: device normalize/erase equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autoprog_tpu.ops.erase import normalize_uint8, random_erase


def test_normalize_uint8_matches_host():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    dev = np.asarray(normalize_uint8(jnp.asarray(img), mean, std,
                                     jnp.float32))
    host = (img.astype(np.float32) / 255.0 - np.asarray(mean,
                                                        np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_random_erase_statistics():
    x = jnp.zeros((32, 24, 24, 3), jnp.float32)
    out = np.asarray(random_erase(x, jax.random.PRNGKey(0), prob=1.0))
    changed = (out != 0).any(axis=(1, 2, 3))
    assert changed.all()  # every sample erased at prob=1
    frac = (out != 0).mean()
    assert 0.01 < frac < 0.5  # area in the configured range
    out2 = np.asarray(random_erase(x, jax.random.PRNGKey(0), prob=0.0))
    np.testing.assert_array_equal(out2, 0.0)


def test_uint8_train_step_learns():
    """Train step consumes uint8 batches (normalize + erase on device)."""
    import argparse

    from autoprog_tpu.losses import build_train_loss
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
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 3)), train=False)
    tx = create_optimizer(args, v["params"])
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     num_classes=8)
    state = TrainState.create(params=v["params"], batch_stats={}, tx=tx)
    rs = np.random.RandomState(0)
    batch = {"image": jnp.asarray(rs.randint(0, 256, (8, 32, 32, 3)),
                                  jnp.uint8),
             "label": jnp.asarray(rs.randint(0, 8, 8), jnp.int32)}
    step = sb.train_step(r=32, splits=1, re_prob=0.25)
    losses = []
    for _ in range(15):
        state, m = step(state, batch, 1e-3, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # eval path accepts uint8 too
    m = sb.eval_step()(state.params, state.batch_stats, batch)
    assert float(m["count"]) == 8
