"""Test-time augmentation pipeline + filename-keyed real-labels.

The reference's `--tta N` averages N adjacent loader rows
(`/root/reference/main.py:961-964`) but ships no pipeline emitting them;
this rebuild provides one (TTADataset + TTAEvalTransform) and these tests
pin its contract: adjacent variant grouping, flip-distinct views, and an
end-to-end validate.py run whose sample accounting matches the source
dataset. `_RealLabels` is checked against timm's filename-keyed semantics
(`/root/reference/validate.py:186-187`).
"""

import json
import os

import numpy as np
from PIL import Image


def _make_imagefolder(root, classes=2, per_class=3, size=40):
    rng = np.random.RandomState(0)
    for c in range(classes):
        d = os.path.join(root, "val", str(c))
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            # left-right asymmetric so the hflip variant differs
            arr = rng.randint(0, 255, (size, size, 3), np.uint8)
            arr[:, : size // 2] //= 4
            Image.fromarray(arr).save(os.path.join(d, f"{c}_{i}.png"))
    return os.path.join(root)


def test_tta_loader_emits_adjacent_variant_groups(tmp_path):
    from autoprog_tpu.data.dataset import create_dataset
    from autoprog_tpu.data.loader import create_loader

    root = _make_imagefolder(str(tmp_path))
    ds = create_dataset("", root, split="val", is_training=False,
                        num_classes=2)
    # crop_pct=1.0 -> no crop offset, so v=1 is an exact mirror of v=0
    loader = create_loader(ds, input_size=32, batch_size=4,
                           is_training=False, num_workers=0, tta=2,
                           crop_pct=1.0)
    n_src = 6
    assert len(loader.dataset) == n_src * 2
    rows = []
    for batch in loader:
        for j in range(batch["label"].shape[0]):
            rows.append((int(batch["label"][j]),
                         np.asarray(batch["image"][j])))
    assert len(rows) == n_src * 2
    for g in range(n_src):
        l0, x0 = rows[2 * g]
        l1, x1 = rows[2 * g + 1]
        assert l0 == l1                      # same source sample
        assert not np.allclose(x0, x1)       # different view (hflip)
        # v=1 is the mirror of v=0 at the same crop
        np.testing.assert_allclose(x0, x1[:, ::-1], atol=1e-5)


def test_validate_tta_end_to_end(tmp_path):
    from autoprog_tpu.validate import main

    root = _make_imagefolder(str(tmp_path))
    res = main([root, "--model", "deit_h2_l2", "--num-classes", "2",
                "--img-size", "32", "-b", "8", "--workers", "0",
                "--split", "val", "--tta", "2", "--no-bf16"])
    # 6 source samples scored once each, despite 12 loader rows
    assert res[-1]["count"] == 6


def test_validate_tta_batch_not_divisible_by_mesh(tmp_path):
    """--tta 3 with -b 64 on the 8-device mesh: naive rounding to a
    multiple of 3 gives 63, which shard_batch cannot split 8 ways. The
    batch must round to a multiple of lcm(tta, data-axis) instead."""
    from autoprog_tpu.validate import main

    root = _make_imagefolder(str(tmp_path), classes=2, per_class=4)
    res = main([root, "--model", "deit_h2_l2", "--num-classes", "2",
                "--img-size", "32", "-b", "64", "--workers", "0",
                "--split", "val", "--tta", "3", "--no-bf16"])
    assert res[-1]["count"] == 8


def test_validate_real_labels_end_to_end(tmp_path):
    """--real-labels shares the compiled forward with the metrics path
    (no separate eager apply) and scores against the JSON sets."""
    from autoprog_tpu.validate import main

    root = _make_imagefolder(str(tmp_path))
    names = sorted(f"{c}_{i}.png" for c in range(2) for i in range(3))
    real = {nm: [0, 1] for nm in names}  # every class accepted
    p = tmp_path / "real.json"
    p.write_text(json.dumps(real))
    res = main([root, "--model", "deit_h2_l2", "--num-classes", "2",
                "--img-size", "32", "-b", "8", "--workers", "0",
                "--split", "val", "--real-labels", str(p), "--no-bf16"])
    assert res[-1]["count"] == 6
    assert res[-1]["top1_real"] == 100.0  # all labels acceptable


def test_real_labels_positional_fallback_when_no_name_matches(tmp_path):
    from autoprog_tpu.validate import _RealLabels

    class _DS:
        samples = [("/x/custom_1.png", 0), ("/x/custom_2.png", 1)]

    # list-form real.json implies ILSVRC2012_val names — zero hits against
    # a custom folder must fall back to positional application
    p = tmp_path / "real.json"
    p.write_text(json.dumps([[2], [1]]))
    rl = _RealLabels(str(p), _DS())
    rl.add_preds(0, np.asarray([2, 1]))
    assert rl.total == 2 and rl.correct == 2


def test_real_labels_keyed_by_filename(tmp_path):
    from autoprog_tpu.validate import _RealLabels

    class _DS:
        samples = [("/x/img_b.JPEG", 0), ("/x/img_a.JPEG", 1),
                   ("/x/img_c.JPEG", 0)]

    # deliberately NOT in sorted order: img_b comes first in the dataset
    real_json = {"img_a.JPEG": [1], "img_b.JPEG": [2], "img_c.JPEG": []}
    p = tmp_path / "real.json"
    p.write_text(json.dumps(real_json))
    rl = _RealLabels(str(p), _DS())
    # predictions follow DATASET order: b, a, c
    rl.add(0, np.asarray([[0.1, 0.2, 0.9],    # argmax 2 -> img_b ok
                          [0.1, 0.9, 0.2],    # argmax 1 -> img_a ok
                          [0.9, 0.1, 0.2]]))  # img_c: empty set, excluded
    assert rl.total == 2 and rl.correct == 2 and rl.top1 == 100.0
    rl2 = _RealLabels(str(p), _DS())
    rl2.add(0, np.asarray([[0.9, 0.1, 0.2],
                           [0.1, 0.9, 0.2],
                           [0.9, 0.1, 0.2]]))
    assert rl2.total == 2 and rl2.correct == 1
