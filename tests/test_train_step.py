"""End-to-end train/eval step tests on a tiny model (SURVEY §4.4)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.losses import build_train_loss
from autoprog_tpu.registry import create_model
from autoprog_tpu.train.optim import create_optimizer, create_scheduler
from autoprog_tpu.train.state import TrainState
from autoprog_tpu.train.steps import StepBuilder


def make_args(**kw):
    d = dict(opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
             weight_decay=0.05, clip_grad=None, clip_mode="norm",
             sched="cosine", lr=1e-3, min_lr=1e-5, warmup_lr=1e-6,
             epochs=10, warmup_epochs=2, cooldown_epochs=0, decay_epochs=3,
             decay_rate=0.1, token_label=False, token_label_data="",
             token_label_size=1, dense_weight=0.5, cls_weight=1.0,
             ground_truth=False, smoothing=0.1)
    d.update(kw)
    return argparse.Namespace(**d)


def make_batch(rng, b=8, s=32, c=10):
    return {
        "image": jnp.asarray(rng.normal(size=(b, s, s, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, c, b), jnp.int32),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    args = make_args()
    mdef = create_model("deit_h2_l2")
    model = mdef.make(num_classes=10, img_size=32, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params = variables["params"]
    tx = create_optimizer(args, params)
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     ema_decays=(0.9, 0.99), num_classes=10)

    def fresh_state():
        # steps donate their input state; each test gets its own copy
        return TrainState.create(params=jax.tree.map(jnp.copy, params),
                                 batch_stats={}, tx=tx,
                                 ema_decays=(0.9, 0.99))
    return args, model, sb, fresh_state


def test_train_loss_decreases(tiny_setup):
    args, model, sb, fresh = tiny_setup
    state = fresh()
    step = sb.train_step(r=32, splits=1)
    rng = jax.random.PRNGKey(0)
    nprng = np.random.default_rng(0)
    batch = make_batch(nprng)  # overfit one batch
    losses = []
    for _ in range(30):
        state, m = step(state, batch, 1e-3, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state.step) == 30


def test_grad_accum_matches_full_batch(tiny_setup):
    """splits=2 over batch B == splits=1 over the same batch (mean loss),
    the invariant behind `--batch-splits` (`main_prog.py:852`)."""
    args, model, sb, fresh = tiny_setup
    nprng = np.random.default_rng(1)
    batch = make_batch(nprng, b=8)
    rng = jax.random.PRNGKey(7)
    s1, m1 = sb.train_step(r=32, splits=1)(fresh(), batch, 1e-3, rng)
    s2, m2 = sb.train_step(r=32, splits=2)(fresh(), batch, 1e-3, rng)
    # parameters should be close (not identical: dropout rng & loss
    # normalization differ only by micro-batch statistics in LN-free paths)
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(m1["loss"]), np.asarray(m2["loss"]),
                               rtol=2e-2)
    assert p1.shape == p2.shape


def test_eval_step_metrics(tiny_setup):
    args, model, sb, fresh = tiny_setup
    state = fresh()
    ev = sb.eval_step()
    nprng = np.random.default_rng(2)
    batch = make_batch(nprng, b=16)
    m = ev(state.params, state.batch_stats, batch)
    assert float(m["count"]) == 16
    assert 0 <= float(m["top1_sum"]) <= float(m["top5_sum"]) <= 16


def test_ema_tracks_params(tiny_setup):
    args, model, sb, fresh = tiny_setup
    state = fresh()
    step = sb.train_step(r=32, splits=1)
    rng = jax.random.PRNGKey(0)
    batch = make_batch(np.random.default_rng(3))
    # snapshot before the loop: the step donates its input buffers
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    s = state
    for _ in range(3):
        s, _ = step(s, batch, 1e-2, rng)
    p = jax.tree.leaves(s.params)[0]
    e_fast = jax.tree.leaves(s.ema_params[0])[0]   # decay 0.9
    e_slow = jax.tree.leaves(s.ema_params[1])[0]   # decay 0.99
    # fast EMA closer to current params than slow EMA
    d_fast = float(jnp.linalg.norm(e_fast - p))
    d_slow = float(jnp.linalg.norm(e_slow - p))
    assert d_fast < d_slow
    assert float(jnp.linalg.norm(e_slow - p0)) < float(jnp.linalg.norm(p - p0))


def test_scheduler_shapes():
    args = make_args(epochs=100, warmup_epochs=20, cooldown_epochs=10,
                     lr=1.6e-3)
    sched = create_scheduler(args)
    assert sched.num_epochs == 110
    assert sched.fn(0) == pytest.approx(1e-6)
    # timm 0.4.5 warmup_prefix=False: post-warmup phase is cos(pi*epoch/T)
    # with warmup epochs included, so fn(20) is already below base_lr
    import math
    assert sched.fn(20) == pytest.approx(
        1e-5 + 0.5 * (1.6e-3 - 1e-5) * (1 + math.cos(math.pi * 0.2)), rel=1e-6)
    assert sched.fn(50) == pytest.approx(
        1e-5 + 0.5 * (1.6e-3 - 1e-5), rel=1e-6)
    assert sched.fn(105) == pytest.approx(1e-5)  # cooldown tail


def test_plateau_schedule():
    args = make_args(sched="plateau", epochs=100, warmup_epochs=2,
                     cooldown_epochs=0, lr=1e-3, patience_epochs=2,
                     eval_metric="top1")
    sched = create_scheduler(args)
    assert sched.fn(0) == pytest.approx(1e-6)          # warmup start
    assert sched.fn(5) == pytest.approx(1e-3)          # base after warmup
    sched.observe(10.0)                                 # best
    for m in (9.0, 9.5, 9.9):                           # 3 bad > patience 2
        sched.observe(m)
    assert sched.fn(5) == pytest.approx(1e-4)          # decayed once
    sched.observe(11.0)                                 # new best resets
    sched.observe(10.0)
    sched.observe(10.5)
    assert sched.fn(5) == pytest.approx(1e-4)          # within patience
    # state round-trips through a checkpoint
    d = sched.state_dict()
    sched2 = create_scheduler(args)
    sched2.load_state_dict(d)
    assert sched2.fn(5) == pytest.approx(sched.fn(5))
    # LR floors at min_lr
    for _ in range(40):
        sched.observe(0.0)
    assert sched.fn(5) == pytest.approx(args.min_lr)


def test_volo_train_step_with_token_labels():
    args = make_args(token_label=True, token_label_data="x",
                     token_label_size=4)
    mdef = create_model("volo_h2_l3")
    model = mdef.make(num_classes=10, img_size=64, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mixtoken": jax.random.PRNGKey(2)}, x, train=True)
    tx = create_optimizer(args, variables["params"])
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     num_classes=10, token_label=True,
                     has_token_label_data=True)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    nprng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(nprng.normal(size=(4, 64, 64, 3)), jnp.float32),
        "label": jnp.asarray(nprng.integers(0, 10, 4), jnp.int32),
        "label_scores": jnp.asarray(
            nprng.random((4, 5, 14, 14)), jnp.float32),
        "label_inds": jnp.asarray(
            nprng.integers(0, 10, (4, 5, 14, 14)), jnp.int32),
    }
    step = sb.train_step(r=64, splits=1)
    state, m = step(state, batch, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # elastic sub-config trains too
    from autoprog_tpu.prog.depth import elastic_keep_masks
    keep = elastic_keep_masks(2, 2, 3)
    step2 = sb.train_step(r=32, keep=keep, splits=1)
    state, m2 = step2(state, batch, 1e-3, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


def test_remat_modes_preserve_training_numerics():
    """--remat (full or dots) is a memory/time trade only: one train step
    must produce the same updated params as the non-remat step (f32,
    identical rngs). Guards the jax.checkpoint wiring in models/."""
    args = make_args()
    rng = np.random.default_rng(3)
    batch = make_batch(rng, b=4, s=32, c=10)
    results = {}
    for mode in ("", "full", "dots"):
        mdef = create_model("volo_h2_l2")
        model = mdef.make(num_classes=10, img_size=32, dtype=jnp.float32,
                          remat=mode)
        variables = jax.jit(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "mixtoken": jax.random.PRNGKey(2)},
            jnp.zeros((1, 32, 32, 3)), train=True))()
        tx = create_optimizer(args, variables["params"])
        sb = StepBuilder(model=model, tx=tx,
                         train_loss=build_train_loss(args),
                         num_classes=10, donate=False)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables.get(
                                      "batch_stats", {}), tx=tx)
        step = sb.train_step(r=32, splits=1)
        new_state, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(7))
        results[mode] = (jax.device_get(new_state.params),
                         float(metrics["loss"]))

    base_params, base_loss = results[""]
    for mode in ("full", "dots"):
        p, loss = results[mode]
        assert loss == pytest.approx(base_loss, rel=1e-6)
        flat_a = jax.tree.leaves(base_params)
        flat_b = jax.tree.leaves(p)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
