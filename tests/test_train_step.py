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


def test_sr_cast_unbiased_and_adjacent():
    """stochastic_round_bf16 returns one of the two adjacent bf16 values
    and is unbiased: the mean over many dither streams recovers x."""
    from autoprog_tpu.ops.rounding import stochastic_round_bf16
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512,)) * 0.3,
                    jnp.float32)
    lo = x.astype(jnp.bfloat16)  # round-to-nearest reference
    outs = jnp.stack([
        stochastic_round_bf16(x, jax.random.PRNGKey(k)).astype(jnp.float32)
        for k in range(64)])
    # adjacency: every sample within one bf16 ulp of x
    ulp = jnp.abs(lo.astype(jnp.float32)) * 2.0 ** -7 + 1e-30
    assert float(jnp.max(jnp.abs(outs - x[None]) / ulp[None])) <= 1.0 + 1e-3
    # unbiasedness: the mean converges to x, closer than one ulp/4
    err = jnp.abs(outs.mean(0) - x)
    assert float(jnp.mean(err / ulp)) < 0.25


def test_ema_bf16_sr_no_freeze():
    """The reason SR exists: with decay d=0.999 the per-step increment
    (1-d)*(p-e) sits below bf16 ulp, so a deterministic round-to-nearest
    EMA freezes at its init forever; the stochastic-rounding EMA still
    converges to the target in expectation."""
    from autoprog_tpu.ops.rounding import stochastic_round_bf16
    d, steps = 0.999, 4000
    p = jnp.full((256,), 1.02, jnp.float32)     # target params
    e_det = jnp.ones((256,), jnp.bfloat16)      # EMA inits at 1.0
    e_sr = jnp.ones((256,), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(e_det, e_sr, key):
        def body(i, c):
            e_det, e_sr, key = c
            e_det = (e_det.astype(jnp.float32) * d
                     + p * (1 - d)).astype(jnp.bfloat16)
            key = jax.random.fold_in(key, i)
            e_sr = stochastic_round_bf16(
                e_sr.astype(jnp.float32) * d + p * (1 - d), key)
            return e_det, e_sr, key
        return jax.lax.fori_loop(0, steps, body, (e_det, e_sr, key))

    e_det, e_sr, _ = run(e_det, e_sr, key)
    # after 4000 steps of d=0.999 the true EMA is ~1.02 (within 2e-4)
    assert float(jnp.abs(e_det.astype(jnp.float32) - 1.0).max()) < 1e-6, \
        "deterministic bf16 EMA should have frozen at init"
    assert abs(float(e_sr.astype(jnp.float32).mean()) - 1.02) < 2e-3, \
        "SR bf16 EMA should track the target"


def test_ema_bf16_sr_parity(tiny_setup):
    """--model-ema-bf16 numerics gate: 30 real train steps with bf16-SR
    EMA trees stay within ~bf16 quantization of the f32 EMA reference
    (params themselves are identical — EMA never feeds back)."""
    args, model, sb, fresh = tiny_setup
    sb16 = StepBuilder(model=model, tx=sb.tx, train_loss=sb.train_loss,
                       ema_decays=(0.9, 0.99), num_classes=10,
                       ema_dtype=jnp.bfloat16)

    def fresh16():
        s = fresh()
        return s.replace(ema_params=tuple(
            jax.tree.map(lambda x: x.astype(jnp.bfloat16), e)
            for e in s.ema_params))

    rng = jax.random.PRNGKey(0)
    batch = make_batch(np.random.default_rng(5))
    s32, s16 = fresh(), fresh16()
    step32 = sb.train_step(r=32, splits=1)
    step16 = sb16.train_step(r=32, splits=1)
    for _ in range(30):
        s32, _ = step32(s32, batch, 1e-3, rng)
        s16, _ = step16(s16, batch, 1e-3, rng)
    # identical param trajectories (EMA is write-only state)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(s32.params)[0]),
                                  np.asarray(jax.tree.leaves(s16.params)[0]))
    for e32, e16 in zip(s32.ema_params, s16.ema_params):
        for a, b in zip(jax.tree.leaves(e32), jax.tree.leaves(e16)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            denom = np.linalg.norm(a) + 1e-12
            assert np.linalg.norm(a - b) / denom < 2e-2, (a.shape, denom)


def test_adam_mu_bf16_close(tiny_setup):
    """--adam-mu-bf16 numerics gate: bf16 first-moment AdamW tracks the
    f32 reference over 30 steps (b1=0.9 increments are ~10% relative —
    far above bf16 ulp, so plain round-to-nearest cannot freeze)."""
    args, model, sb, fresh = tiny_setup
    args16 = make_args(adam_mu_bf16=True)
    s0 = fresh()
    tx16 = create_optimizer(args16, s0.params)
    sb16 = StepBuilder(model=model, tx=tx16, train_loss=sb.train_loss,
                       num_classes=10)
    s16 = TrainState.create(params=jax.tree.map(jnp.copy, s0.params),
                            batch_stats={}, tx=tx16)
    rng = jax.random.PRNGKey(0)
    batch = make_batch(np.random.default_rng(6))
    step32 = sb.train_step(r=32, splits=1)
    step16 = sb16.train_step(r=32, splits=1)
    s32 = fresh()
    for _ in range(30):
        s32, m32 = step32(s32, batch, 1e-3, rng)
        s16, m16 = step16(s16, batch, 1e-3, rng)
    assert float(m16["loss"]) == pytest.approx(float(m32["loss"]), rel=5e-2)
    for a, b in zip(jax.tree.leaves(s32.params), jax.tree.leaves(s16.params)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12) < 5e-2


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


def test_scheduler_cosine_cycles():
    """timm-0.4.5 SGDR cycle semantics (`--lr-cycle-mul/limit`, wired by
    the reference via create_scheduler, `/root/reference/main_prog.py:
    148-166`): cycle i restarts the cosine with amplitude gamma =
    decay_rate**i; past cycle_limit the LR pins to min_lr; total
    scheduled epochs follow timm's get_cycle_length()."""
    args = make_args(epochs=10, warmup_epochs=0, cooldown_epochs=0,
                     lr=1e-3, min_lr=0.0, decay_rate=0.5,
                     lr_cycle_mul=1.0, lr_cycle_limit=2)
    sched = create_scheduler(args)
    assert sched.num_epochs == 20                       # 2 cycles of 10
    assert sched.fn(0) == pytest.approx(1e-3)           # cycle-0 peak
    assert sched.fn(10) == pytest.approx(0.5e-3)        # restart, gamma 0.5
    assert sched.fn(20) == pytest.approx(0.0)           # past limit: min_lr

    # cycle_mul=2 doubles each successive cycle length: 10 + 20 = 30
    args2 = make_args(epochs=10, warmup_epochs=0, cooldown_epochs=0,
                      lr=1e-3, min_lr=0.0, decay_rate=1.0,
                      lr_cycle_mul=2.0, lr_cycle_limit=2)
    s2 = create_scheduler(args2)
    assert s2.num_epochs == 30
    assert s2.fn(10) == pytest.approx(1e-3)             # cycle-1 restart
    assert s2.fn(20) == pytest.approx(0.5e-3)           # cos(pi*10/20)

    # defaults (cycle_limit=1, mul=1) keep the single-cosine + cooldown
    # behavior bit-for-bit
    a3 = make_args(epochs=100, warmup_epochs=20, cooldown_epochs=10,
                   lr=1.6e-3)
    s3 = create_scheduler(a3)
    assert s3.num_epochs == 110
    assert s3.fn(105) == pytest.approx(1e-5)

    # cycle_mul < 1: cycle lengths form a convergent series (10 + 5 = 15
    # here); past the series sum the LR pins to min_lr instead of raising
    # a math domain error (e.g. in the cooldown tail)
    a4 = make_args(epochs=10, warmup_epochs=0, cooldown_epochs=10,
                   lr=1e-3, min_lr=1e-5, decay_rate=1.0,
                   lr_cycle_mul=0.5, lr_cycle_limit=2)
    s4 = create_scheduler(a4)
    assert s4.fn(10) == pytest.approx(1e-3)          # cycle-1 restart
    for t in (15, 20, 24):                           # at/past the sum
        assert s4.fn(t) == pytest.approx(1e-5)


def test_scheduler_lr_noise():
    """`--lr-noise` perturbs the LR inside the given epoch window with
    timm-0.4.5's exact noise stream (trunc-normal via torch.Generator
    seeded seed+epoch, scheduler.py `_add_noise`)."""
    import torch

    base_kw = dict(epochs=10, warmup_epochs=0, cooldown_epochs=0, lr=1e-3)
    base = create_scheduler(make_args(**base_kw))
    sched = create_scheduler(make_args(lr_noise=[0.5], lr_noise_pct=0.67,
                                       seed=42, **base_kw))
    assert sched.fn(3) == base.fn(3)          # before the window: clean
    for t in (5, 7, 9):                       # inside: timm's exact stream
        g = torch.Generator()
        g.manual_seed(42 + t)
        while True:
            noise = torch.randn(1, generator=g).item()
            if abs(noise) < 0.67:
                break
        assert noise != 0.0
        assert sched.fn(t) == pytest.approx(base.fn(t) * (1 + noise))
        assert abs(sched.fn(t) / base.fn(t) - 1) < 0.67  # truncation bound
    assert sched.fn(5) == sched.fn(5)         # deterministic per epoch

    # two-element form bounds the window [on, off)
    s2 = create_scheduler(make_args(lr_noise=[0.3, 0.5], seed=42, **base_kw))
    assert s2.fn(4) != base.fn(4)             # inside [3, 5)
    assert s2.fn(6) == base.fn(6)             # past the window


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
