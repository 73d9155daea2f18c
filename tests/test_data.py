"""Data pipeline tests: transforms, loader, mixup, token-label targets."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from autoprog_tpu.data.dataset import FixedAugDataset, SyntheticDataset, create_dataset
from autoprog_tpu.data.loader import Loader, create_loader, crop_label_maps
from autoprog_tpu.data.mixup import Mixup, one_hot_np
from autoprog_tpu.data.token_label import build_token_label_target, smooth_one_hot
from autoprog_tpu.data.transforms import (
    CropParams,
    EvalTransform,
    RandAugment,
    TrainTransform,
)


def test_rand_augment_policy_parse():
    ra = RandAugment.from_policy("rand-m9-mstd0.5-inc1")
    assert ra.magnitude == 9 and ra.mstd == 0.5
    assert RandAugment.from_policy("") is None
    with pytest.raises(ValueError):
        RandAugment.from_policy("augmix-m3")


def test_train_transform_shapes_and_determinism():
    ds = SyntheticDataset(size=4, num_classes=10, image_size=48)
    img, label, _ = ds.load(0)
    tf = TrainTransform(size=32, rand_augment=RandAugment(magnitude=9),
                        re_prob=0.5)
    x1, cp = tf(img, np.random.default_rng(0))
    x2, _ = tf(img, np.random.default_rng(0))
    x3, _ = tf(img, np.random.default_rng(1))
    assert x1.shape == (32, 32, 3)
    np.testing.assert_array_equal(x1, x2)      # same rng -> same output
    assert not np.array_equal(x1, x3)          # different rng -> different
    assert 0 <= cp.top and cp.top + cp.height <= cp.src_h


def test_eval_transform_crop_pct():
    ds = SyntheticDataset(size=1, num_classes=10, image_size=100)
    img, _, _ = ds.load(0)
    x = EvalTransform(size=32, crop_pct=0.96)(img)
    assert x.shape == (32, 32, 3)


def test_loader_inline_epoch_determinism():
    ds = SyntheticDataset(size=32, num_classes=10, image_size=40)
    tf = TrainTransform(size=32)
    ld = Loader(ds, batch_size=8, is_training=True, transform=tf,
                num_workers=0, seed=7)
    ld.set_epoch(0)
    b0 = [b["label"].copy() for b in ld]
    ld.set_epoch(0)
    b0b = [b["label"].copy() for b in ld]
    ld.set_epoch(1)
    b1 = [b["label"].copy() for b in ld]
    assert len(b0) == 4
    np.testing.assert_array_equal(np.concatenate(b0), np.concatenate(b0b))
    assert not np.array_equal(np.concatenate(b0), np.concatenate(b1))


def test_loader_multiprocess_matches_len():
    ds = SyntheticDataset(size=20, num_classes=5, image_size=40)
    ld = Loader(ds, batch_size=4, is_training=True,
                transform=TrainTransform(size=32), num_workers=2)
    try:
        batches = list(ld)
        assert len(batches) == len(ld) == 5
        assert batches[0]["image"].shape == (4, 32, 32, 3)
    finally:
        ld.close()


def test_loader_close_mid_epoch_does_not_deadlock():
    # Regression: Pool.terminate() mid-imap can deadlock — an idle worker
    # blocks in inqueue.recv() holding the queue's shared rlock, and
    # _help_stuff_finish() blocks forever acquiring it (took down the
    # flagship rehearsal at a stage boundary for 2h). take_probe_batches'
    # pattern: consume a few batches, abandon the iterator, close().
    import time

    ds = SyntheticDataset(size=64, num_classes=5, image_size=40)
    ld = Loader(ds, batch_size=8, is_training=True,
                transform=TrainTransform(size=32), num_workers=2)
    it = iter(ld)
    next(it)  # pool spun up, imap in flight
    time.sleep(1.5)  # let workers finish every chunk and park in recv()
    done = []

    def _close():
        ld.close()
        done.append(True)

    import threading
    t = threading.Thread(target=_close, daemon=True)
    t.start()
    t.join(timeout=30)
    assert done, "Loader.close() deadlocked mid-imap"


def test_loader_process_sharding_partitions():
    ds = SyntheticDataset(size=32, num_classes=5, image_size=40)
    seen = []
    for pi in range(2):
        ld = Loader(ds, batch_size=8, is_training=True,
                    transform=TrainTransform(size=32), num_workers=0,
                    seed=3, process_index=pi, process_count=2)
        ld.set_epoch(0)
        for b in ld:
            seen.append(b["label"])
    allv = np.concatenate(seen)
    assert len(allv) == 32  # disjoint halves cover the epoch


def test_fixed_aug_dataset_stable_across_epochs():
    ds = FixedAugDataset(SyntheticDataset(size=8, num_classes=5,
                                          image_size=40))
    ld = Loader(ds, batch_size=4, is_training=False,
                transform=TrainTransform(size=32, re_prob=0.5),
                num_workers=0)
    ld.set_epoch(0)
    a = np.concatenate([b["image"] for b in ld])
    ld.set_epoch(5)
    b = np.concatenate([b["image"] for b in ld])
    np.testing.assert_array_equal(a, b)


def test_mixup_soft_targets_rows_sum_to_one():
    mx = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=10,
               label_smoothing=0.1)
    batch = {"image": np.random.default_rng(0).normal(
        size=(8, 16, 16, 3)).astype(np.float32),
        "label": np.arange(8, dtype=np.int64) % 10}
    out = mx(batch, np.random.default_rng(1))
    t = out["soft_target"]
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)


def test_cutmix_token_label_maps_follow_box():
    mx = Mixup(mixup_alpha=0.0, cutmix_alpha=1.0, num_classes=10,
               token_label=True, label_smoothing=0.0)
    B, H = 4, 32
    batch = {
        "image": np.zeros((B, H, H, 3), np.float32),
        "label": np.arange(B, dtype=np.int64),
        "label_scores": np.tile(
            np.arange(B, dtype=np.float32)[:, None, None, None], (1, 5, 8, 8)),
        "label_inds": np.zeros((B, 5, 8, 8), np.int32),
    }
    out = mx(batch, np.random.default_rng(0))
    assert "gt_soft" in out
    # every map cell still holds a value that came from some batch element
    assert set(np.unique(out["label_scores"])) <= set(range(B))


def test_crop_label_maps_alignment():
    K, Hm = 2, 8
    scores = np.zeros((K, Hm, Hm), np.float32)
    scores[:, :4, :] = 1.0  # top half labeled
    inds = np.zeros((K, Hm, Hm), np.int32)
    cp = CropParams(top=0, left=0, height=50, width=100, hflip=False,
                    vflip=False, src_h=100, src_w=100)  # crop = top half
    s, _ = crop_label_maps(scores, inds, cp, out_hw=4)
    np.testing.assert_array_equal(s, 1.0)  # crop covered only labeled rows


def test_token_label_target_layout():
    B, C, K, Hm, t = 2, 10, 3, 8, 4
    rng = np.random.default_rng(0)
    labels = jnp.asarray([1, 2])
    scores = jnp.asarray(rng.random((B, K, Hm, Hm)), jnp.float32) / K
    inds = jnp.asarray(rng.integers(0, C, (B, K, Hm, Hm)), jnp.int32)
    tgt = build_token_label_target(labels, scores, inds, num_classes=C,
                                   smoothing=0.1, label_size=t)
    assert tgt.shape == (B, C, 2 + t * t)
    # slot0 = smoothed one-hot of GT
    np.testing.assert_allclose(
        np.asarray(tgt[:, :, 0]),
        np.asarray(smooth_one_hot(labels, C, 0.1)), rtol=1e-5)
    # all slots are distributions
    np.testing.assert_allclose(np.asarray(tgt[:, :, 1].sum(-1)), 1.0,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt[:, :, 2:].sum(1)), 1.0,
                               rtol=1e-4)


def test_create_dataset_synthetic():
    ds = create_dataset("synthetic", "synthetic://", fake_size=16,
                        num_classes=7)
    assert len(ds) == 16
    img, label, _ = ds.load(3)
    assert 0 <= label < 7


def test_aug_splits_batch_layout():
    from autoprog_tpu.data.transforms import RandAugment
    ds = SyntheticDataset(size=8, num_classes=5, image_size=40)
    clean = TrainTransform(size=32)
    aug = TrainTransform(size=32, rand_augment=RandAugment(magnitude=9))
    ld = Loader(ds, batch_size=4, is_training=True, transform=aug,
                num_workers=0, aug_splits=3, clean_transform=clean)
    b = next(iter(ld))
    assert b["image"].shape == (12, 32, 32, 3)  # splits * B
    assert b["label"].shape == (4,)


def test_jsd_loss_properties():
    import jax.numpy as jnp
    from autoprog_tpu.losses import jsd_cross_entropy
    rs = np.random.default_rng(0)
    B, C = 4, 10
    logits1 = jnp.asarray(rs.normal(size=(B, C)), jnp.float32)
    labels = jnp.asarray(rs.integers(0, C, B))
    # identical splits -> zero consistency term (pure clean CE)
    same = jnp.concatenate([logits1, logits1, logits1], 0)
    l_same = float(jsd_cross_entropy(same, labels, num_splits=3))
    diff = jnp.concatenate(
        [logits1, logits1 + 3.0,
         jnp.asarray(rs.normal(size=(B, C)), jnp.float32)], 0)
    l_diff = float(jsd_cross_entropy(diff, labels, num_splits=3))
    assert l_diff > l_same


def test_mixup_elem_mode_per_sample_lambdas():
    mx = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=10,
               label_smoothing=0.0, mode="elem")
    rs = np.random.default_rng(0)
    batch = {"image": rs.normal(size=(6, 16, 16, 3)).astype(np.float32),
             "label": np.arange(6, dtype=np.int64)}
    orig = batch["image"].copy()
    out = mx(batch, np.random.default_rng(1))
    t = out["soft_target"]
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
    # per-sample lambdas differ (not one global coefficient)
    lams = [t[i, i] for i in range(6)]
    assert len(set(np.round(lams, 6))) > 1
    assert not np.array_equal(out["image"], orig)


def test_pad_eval_batch_and_masked_eval_step():
    """Remainder batches pad to the compiled shape; padded rows (label -1)
    are masked out of every eval metric sum (advisor finding: a remainder
    not divisible by the mesh data axis raised a sharding error)."""
    import jax
    import jax.numpy as jnp
    from autoprog_tpu.data.loader import pad_eval_batch
    from autoprog_tpu.train.steps import StepBuilder
    from autoprog_tpu.registry import create_model

    b = {"image": np.ones((5, 16, 16, 3), np.float32),
         "label": np.arange(5, dtype=np.int32)}
    p = pad_eval_batch(b, 8)
    assert p["image"].shape == (8, 16, 16, 3)
    assert list(p["label"][5:]) == [-1, -1, -1]
    assert pad_eval_batch(p, 8) is p  # already full -> unchanged

    mdef = create_model("deit_h2_l2")
    model = mdef.make(num_classes=7, img_size=16)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), train=False)
    sb = StepBuilder(model=model, tx=None, train_loss=None, num_classes=7)
    step = sb.eval_step()
    m_pad = step(variables["params"], {}, {k: jnp.asarray(v)
                                           for k, v in p.items()})
    m_raw = step(variables["params"], {},
                 {"image": jnp.asarray(b["image"]),
                  "label": jnp.asarray(b["label"])})
    assert float(m_pad["count"]) == 5.0
    assert float(m_pad["top1_sum"]) == float(m_raw["top1_sum"])
    assert float(m_pad["loss_sum"]) == pytest.approx(
        float(m_raw["loss_sum"]), rel=1e-5)


def test_mixup_seed_varies_by_batch_index():
    """Two batches with identical contents must draw different mixup
    randomness (seeded by batch index, not batch contents)."""
    mx = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, prob=1.0,
               num_classes=10, label_smoothing=0.0)
    ds = SyntheticDataset(size=8, image_size=16, num_classes=10, seed=0)
    ld = Loader(ds, batch_size=4, is_training=True,
                transform=TrainTransform(size=16), mixup=mx, num_workers=0)
    batches = list(ld)
    assert len(batches) == 2
    t0, t1 = batches[0]["soft_target"], batches[1]["soft_target"]
    lam0 = float(t0.max(-1)[0])
    lam1 = float(t1.max(-1)[0])
    assert lam0 != pytest.approx(lam1)


def test_procgen_dataset_contract():
    """procgen:// — deterministic per (seed, split, index), balanced
    labels, val split disjoint from train, class structure shared."""
    import numpy as np

    from autoprog_tpu.data.dataset import create_dataset
    from autoprog_tpu.data.procgen import ProcGenDataset

    ds = create_dataset("", "procgen://", num_classes=7, fake_size=21,
                        image_size=32)
    # factory wraps in nothing for eval; train path may FixedAug-wrap
    base = getattr(ds, "dataset", ds)
    assert isinstance(base, ProcGenDataset)
    assert len(ds) == 21

    img_a, lab_a, _ = base.load(3)
    img_b, lab_b, _ = base.load(3)
    assert lab_a == lab_b == 3 % 7
    assert np.array_equal(np.asarray(img_a), np.asarray(img_b))

    labels = [base.load(i)[1] for i in range(21)]
    assert all(labels.count(c) == 3 for c in range(7))  # balanced

    val = ProcGenDataset(size=21, num_classes=7, image_size=32,
                         split="validation")
    img_v, lab_v, _ = val.load(3)
    assert lab_v == lab_a  # same class at same index
    assert not np.array_equal(np.asarray(img_a), np.asarray(img_v))

    # samples are not degenerate: shapes visible over background
    arr = np.asarray(img_a, np.float32)
    assert arr.std() > 10.0


def test_cutmix_minmax_forces_cutmix_and_bounds_box():
    """timm-0.4.5: cutmix_minmax forces cutmix (alpha:=1.0), cut side
    lengths are uniform in [lo*dim, hi*dim), the box is never clipped,
    and lambda is recomputed from the ACTUAL box area."""
    H = 32
    mx = Mixup(mixup_alpha=0.0, cutmix_alpha=0.0, cutmix_minmax=(0.25, 0.5),
               num_classes=10, label_smoothing=0.0, prob=1.0)
    assert mx.active and mx.cutmix_alpha == 1.0
    rng = np.random.default_rng(0)
    for trial in range(20):
        base = np.arange(4, dtype=np.float32)[:, None, None, None]
        batch = {"image": np.tile(base, (1, H, H, 3)).copy(),
                 "label": np.arange(4, dtype=np.int64)}
        out = mx(batch, rng)
        img = out["image"]
        # mixing happened via a rectangular box cut from the flipped batch
        mixed = img[0] != 0.0
        assert mixed.any()
        ys, xs = np.where(mixed[:, :, 0])
        ch, cw = ys.max() - ys.min() + 1, xs.max() - xs.min() + 1
        # side lengths within the minmax range (unclipped by construction)
        assert H * 0.25 <= ch < H * 0.5
        assert H * 0.25 <= cw < H * 0.5
        assert ch * cw == mixed[:, :, 0].sum()  # full box inside the image
        # lambda reconstructed from the true area matches the target row
        lam = 1.0 - ch * cw / (H * H)
        t = out["soft_target"]
        np.testing.assert_allclose(t[0, 0], lam, rtol=1e-5)
        np.testing.assert_allclose(t[0, 3], 1 - lam, rtol=1e-5)


def test_mixup_pair_mode_symmetric():
    """timm 'pair' mode: samples i and B-1-i exchange content with one
    lambda and one cut box per pair; targets mirror the pixels on both
    sides (VERDICT r4: 'pair' used to silently degrade to batch mode)."""
    mx = Mixup(mixup_alpha=0.8, cutmix_alpha=0.0, num_classes=10,
               label_smoothing=0.0, mode="pair", prob=1.0)
    rng = np.random.default_rng(3)
    B, H = 6, 8
    base = np.arange(B, dtype=np.float32)[:, None, None, None]
    batch = {"image": np.tile(base, (1, H, H, 3)).copy(),
             "label": np.arange(B, dtype=np.int64)}
    out = mx(batch, rng)
    img, t = out["image"], out["soft_target"]
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
    for i in range(B // 2):
        j = B - 1 - i
        lam_i = float(t[i, i])
        # same lambda on both sides of the pair
        np.testing.assert_allclose(float(t[j, j]), lam_i, rtol=1e-5)
        # pixels consistent: constant-valued inputs => exact blend check
        np.testing.assert_allclose(
            img[i], i * lam_i + j * (1 - lam_i), rtol=1e-4)
        np.testing.assert_allclose(
            img[j], j * lam_i + i * (1 - lam_i), rtol=1e-4)


def test_mixup_pair_cutmix_same_box_both_sides():
    mx = Mixup(mixup_alpha=0.0, cutmix_alpha=1.0, num_classes=10,
               label_smoothing=0.0, mode="pair", prob=1.0)
    rng = np.random.default_rng(1)
    B, H = 4, 16
    base = np.arange(B, dtype=np.float32)[:, None, None, None]
    batch = {"image": np.tile(base, (1, H, H, 3)).copy(),
             "label": np.arange(B, dtype=np.int64)}
    out = mx(batch, rng)
    img = out["image"]
    for i in range(B // 2):
        j = B - 1 - i
        # the region holding j's value in image i is exactly the region
        # holding i's value in image j (same box, swapped contents)
        np.testing.assert_array_equal(img[i] == j, img[j] == i)


def test_mixup_unsupported_modes_hard_error():
    with pytest.raises(ValueError):
        Mixup(mixup_alpha=0.8, mode="half")
    with pytest.raises(ValueError):
        Mixup(mixup_alpha=0.8, mode="elem", token_label=True)
    with pytest.raises(ValueError):
        Mixup(mixup_alpha=0.8, mode="pair", token_label=True)
    with pytest.raises(ValueError):
        Mixup(cutmix_minmax=(0.2, 0.3, 0.4))


def test_mixup_elem_cutmix_minmax_per_sample_boxes():
    mx = Mixup(mixup_alpha=0.0, cutmix_minmax=(0.2, 0.4), num_classes=10,
               label_smoothing=0.0, mode="elem", prob=1.0)
    rng = np.random.default_rng(5)
    B, H = 4, 32
    base = np.arange(B, dtype=np.float32)[:, None, None, None]
    batch = {"image": np.tile(base, (1, H, H, 3)).copy(),
             "label": np.arange(B, dtype=np.int64)}
    out = mx(batch, rng)
    t = out["soft_target"]
    np.testing.assert_allclose(t.sum(-1), 1.0, rtol=1e-5)
    # every sample's lambda is bounded by the minmax box-area range:
    # sides in [0.2H, 0.4H) => lam = 1 - area in (1-0.16, 1-0.04]
    for i in range(B):
        lam_i = float(t[i, i])
        assert 1 - 0.2 * 0.2 >= lam_i >= 1 - 0.4 * 0.4
