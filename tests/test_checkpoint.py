"""Checkpoint saver/restore tests (SURVEY §5.4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.train.checkpoint import (
    CheckpointSaver,
    get_resume_epoch,
    load_checkpoint_file,
    save_checkpoint_file,
)


def payload(v=1.0):
    return {
        "arch": "deit_h2_l2",
        "stage_info": {"r": 32, "h": 2, "l": 2, "stage": 0},
        "args_text": "lr: 0.001\n",
        "state_dict": {"w": np.full((4, 4), v, np.float32)},
        "step": 7,
    }


def test_payload_roundtrip(tmp_path):
    p = str(tmp_path / "x.ckpt")
    save_checkpoint_file(p, dict(payload(), epoch=3, metric=71.5))
    ckpt = load_checkpoint_file(p)
    assert ckpt["arch"] == "deit_h2_l2"
    assert ckpt["stage_info"]["r"] == 32
    assert ckpt["epoch"] == 3 and ckpt["metric"] == 71.5
    np.testing.assert_array_equal(ckpt["state_dict"]["w"],
                                  np.full((4, 4), 1.0))
    assert get_resume_epoch(p) == 4


def test_atomicity_no_partial_file(tmp_path):
    p = str(tmp_path / "x.ckpt")
    save_checkpoint_file(p, payload())
    assert not os.path.exists(p + ".tmp")


def test_saver_retention_and_best(tmp_path):
    saver = CheckpointSaver(checkpoint_dir=str(tmp_path), max_history=3,
                            no_del_interval=10)
    metrics = [10, 30, 20, 50, 40, 5, 60]
    for epoch, m in enumerate(metrics):
        best, best_epoch = saver.save_checkpoint(payload(m), epoch, metric=m)
    assert best == 60 and best_epoch == 6
    snaps = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("checkpoint-"))
    # top-3 metrics kept: 60 (e6), 50 (e3), 40 (e4)
    assert snaps == ["checkpoint-3.ckpt", "checkpoint-4.ckpt",
                     "checkpoint-6.ckpt"]
    assert os.path.exists(tmp_path / "model_best.ckpt")
    assert os.path.exists(tmp_path / "last.ckpt")
    assert os.path.exists(tmp_path / "keep-0.ckpt")  # immortal snapshot
    best_ckpt = load_checkpoint_file(str(tmp_path / "model_best.ckpt"))
    assert best_ckpt["metric"] == 60


def test_recovery_cycle(tmp_path):
    saver = CheckpointSaver(checkpoint_dir=str(tmp_path))
    saver.save_recovery(payload(), epoch=2, batch_idx=100)
    saver.save_recovery(payload(), epoch=2, batch_idx=200)
    found = saver.find_recovery()
    assert found and found.endswith("recovery-2-200.ckpt")
    # older recovery cleaned up
    assert len([f for f in os.listdir(tmp_path)
                if f.startswith("recovery-")]) == 1
    ckpt = load_checkpoint_file(found)
    assert ckpt["batch_idx"] == 200
