"""Iterable/streaming dataset paths (TFRecord, HF datasets, tfds gate).

The reference's `create_dataset` accepts timm dataset-name grammar incl.
tfds-style iterable datasets (`/root/reference/prog/dataset.py:79-94`);
ImageNet-scale input on TPU hosts normally arrives as TFRecord shards.
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from autoprog_tpu.data.dataset import create_dataset
from autoprog_tpu.data.loader import create_loader

tf = pytest.importorskip("tensorflow")


def _write_tfrecords(root, split, n_files=2, per_file=6, img_size=24,
                     num_classes=5):
    os.makedirs(root, exist_ok=True)
    from PIL import Image
    import io
    k = 0
    for f in range(n_files):
        path = os.path.join(root, f"{split}-{f:05d}-of-{n_files:05d}")
        with tf.io.TFRecordWriter(path) as w:
            for _ in range(per_file):
                rng = np.random.default_rng(k)
                arr = (rng.random((img_size, img_size, 3)) * 255
                       ).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                ex = tf.train.Example(features=tf.train.Features(feature={
                    "image/encoded": tf.train.Feature(
                        bytes_list=tf.train.BytesList(
                            value=[buf.getvalue()])),
                    "image/class/label": tf.train.Feature(
                        int64_list=tf.train.Int64List(value=[k % num_classes])),
                }))
                w.write(ex.SerializeToString())
                k += 1
    return n_files * per_file


def test_tfrecord_dataset_through_loader(tmp_path):
    root = str(tmp_path / "tfr")
    n = _write_tfrecords(root, "train")
    ds = create_dataset("tfrecord", root, split="train", is_training=True)
    assert getattr(ds, "is_iterable") is True
    assert len(ds) == n  # one-time record count

    loader = create_loader(ds, input_size=16, batch_size=4,
                           is_training=True, num_workers=0, seed=7)
    batches = list(loader)
    assert len(batches) == len(loader) == n // 4
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert b["label"].dtype == np.int32
        assert (b["label"] >= 0).all() and (b["label"] < 5).all()

    # epoch reshuffle changes the label order; same epoch reproduces it
    loader.set_epoch(0)
    l0 = np.concatenate([b["label"] for b in loader])
    loader.set_epoch(0)
    l0b = np.concatenate([b["label"] for b in loader])
    loader.set_epoch(1)
    l1 = np.concatenate([b["label"] for b in loader])
    np.testing.assert_array_equal(l0, l0b)
    assert sorted(l0.tolist()) == sorted(l1.tolist())


def test_tfrecord_multiworker_matches_inline(tmp_path):
    root = str(tmp_path / "tfr2")
    _write_tfrecords(root, "train", n_files=1, per_file=8)
    ds = create_dataset("tfrecord", root, split="train", is_training=False)
    mk = lambda w: create_loader(ds, input_size=16, batch_size=4,
                                 is_training=False, num_workers=w)
    inline = [b["label"] for b in mk(0)]
    pooled = [b["label"] for b in mk(2)]
    np.testing.assert_array_equal(np.concatenate(inline),
                                  np.concatenate(pooled))


def test_tfrecord_process_sharding_partitions(tmp_path):
    """Two hosts' shards are disjoint and cover all files."""
    root = str(tmp_path / "tfr3")
    n = _write_tfrecords(root, "train", n_files=4, per_file=4)
    ds = create_dataset("tfrecord", root, split="train", is_training=False)
    seen = []
    for pi in range(2):
        ld = create_loader(ds, input_size=16, batch_size=4,
                           is_training=False, num_workers=0,
                           process_index=pi, process_count=2)
        seen.append(np.concatenate([b["label"] for b in ld]))
    assert len(seen[0]) + len(seen[1]) == n
    # file-level sharding: both shards non-empty with 4 files over 2 hosts
    assert len(seen[0]) and len(seen[1])


def test_tfrecord_record_sharding_when_few_files(tmp_path):
    """Fewer files than shards: sharding falls back to record
    granularity in complete rounds, so every host gets EXACTLY
    floor(n/shards) records (equal per-host batch counts are what
    lockstep SPMD eval needs — near-equal still deadlocks when the
    smaller shard happens to be a batch-size multiple). The incomplete
    final round is dropped."""
    root = str(tmp_path / "tfr4")
    n = _write_tfrecords(root, "train", n_files=1, per_file=10)
    ds = create_dataset("tfrecord", root, split="train", is_training=False)
    seen = []
    for pi in range(3):
        ld = create_loader(ds, input_size=16, batch_size=2,
                           is_training=False, num_workers=0,
                           process_index=pi, process_count=3)
        seen.append(np.concatenate([b["label"] for b in ld])
                    if len(ld) else np.zeros((0,)))
    counts = [len(s) for s in seen]
    assert counts == [n // 3] * 3           # exactly equal shards
    # the three shards partition the kept records (no duplicates)
    assert sum(counts) == 3 * (n // 3)


def test_tfrecord_ragged_file_count_uses_record_sharding(tmp_path):
    """A file count that does not divide by the shard count routes to
    record-granularity sharding too: 3 files over 2 hosts would give one
    host twice the files (and batches), deadlocking lockstep SPMD."""
    root = str(tmp_path / "tfr5")
    n = _write_tfrecords(root, "train", n_files=3, per_file=5)
    ds = create_dataset("tfrecord", root, split="train", is_training=False)
    counts = []
    for pi in range(2):
        ld = create_loader(ds, input_size=16, batch_size=4,
                           is_training=False, num_workers=0,
                           process_index=pi, process_count=2)
        counts.append(sum(int(b["label"].shape[0]) for b in ld))
    assert counts == [n // 2, n // 2]


def test_hfds_wrapper_map_style(tmp_path):
    hfd = pytest.importorskip("datasets")
    from PIL import Image
    rows = {"image": [Image.fromarray(
                np.full((20, 20, 3), i * 10, np.uint8)) for i in range(10)],
            "label": list(range(10))}
    d = hfd.Dataset.from_dict(rows)
    d = d.cast_column("label", hfd.ClassLabel(num_classes=10))
    path = str(tmp_path / "hf")
    d.save_to_disk(path)

    ds = create_dataset("hfds/ignored", path, split="train")
    assert len(ds) == 10
    assert ds.num_classes == 10
    img, label, maps = ds.load(3)
    assert label == 3 and maps is None
    assert np.asarray(img.convert("RGB"))[0, 0, 0] == 30

    loader = create_loader(ds, input_size=16, batch_size=5,
                           is_training=False, num_workers=0)
    b = next(iter(loader))
    assert b["image"].shape == (5, 16, 16, 3)


def test_tfds_grammar_gated():
    try:
        import tensorflow_datasets  # noqa: F401
        pytest.skip("tfds installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="tensorflow_datasets"):
        create_dataset("tfds/imagenet2012", "", split="train")


def test_tfrecord_direct_reader_parity_and_crc(tmp_path):
    """data/tfrecord.py: framing + proto scan vs TF's own writer/parser —
    bytes and labels must match record-for-record; CRC verification must
    accept TF-written files and reject corruption."""
    from autoprog_tpu.data.tfrecord import read_records, scan_example

    root = str(tmp_path)
    _write_tfrecords(root, "train", n_files=1, per_file=5)
    path = os.path.join(root, "train-00000-of-00001")
    recs = list(read_records(path, verify_crc=True))
    assert len(recs) == 5
    for rec in recs:
        ex = tf.train.Example.FromString(rec)
        want_e = ex.features.feature["image/encoded"].bytes_list.value[0]
        want_l = ex.features.feature["image/class/label"].int64_list.value[0]
        got_e, got_l = scan_example(rec)
        assert got_e == want_e and got_l == want_l

    # corruption must be caught when verify_crc=True
    blob = bytearray(open(path, "rb").read())
    blob[40] ^= 0xFF
    bad = os.path.join(root, "bad")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises((IOError, EOFError, ValueError)):
        list(read_records(bad, verify_crc=True))


def test_tfrecord_scanner_skips_extra_features():
    """Classic ImageNet TFRecords carry height/width/colorspace/text
    features; the scanner must skip them structurally."""
    from autoprog_tpu.data.tfrecord import scan_example

    ex = tf.train.Example(features=tf.train.Features(feature={
        "image/height": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[224])),
        "image/encoded": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"jpegbytes"])),
        "image/class/text": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"tabby cat"])),
        "image/class/label": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[282])),
        "image/object/bbox/xmin": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.1, 0.2])),
    }))
    enc, lab = scan_example(ex.SerializeToString())
    assert enc == b"jpegbytes" and lab == 282
