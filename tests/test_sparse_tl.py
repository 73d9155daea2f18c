"""Sparse token-label targets (AUTOPROG_SPARSE_TL) must be algebraically
identical to the dense [B, C, 2+N] path — same loss, same gradients —
for every token-grid resize the progressive schedule can request.

Dense reference: data/token_label.build_token_label_target +
losses.token_label_cross_entropy on the reference tlt layout
(`loss/cross_entropy.py:112-156`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autoprog_tpu.data.token_label import (build_token_label_target,
                                           sparse_token_label_target)
from autoprog_tpu.losses import (token_label_cross_entropy,
                                 token_label_gt_cross_entropy)

B, K, H, W, C = 4, 3, 7, 7, 13


def _data(seed=0):
    rs = np.random.RandomState(seed)
    scores = jnp.asarray(rs.rand(B, K, H, W), jnp.float32)
    # distinct class inds per position (top-K semantics)
    inds = jnp.asarray(
        np.argsort(rs.rand(B, H, W, C), axis=-1)[..., :K].transpose(
            0, 3, 1, 2), jnp.int32)
    labels = jnp.asarray(rs.randint(0, C, B), jnp.int32)
    return labels, scores, inds


def _outputs(n, seed=1):
    rs = np.random.RandomState(seed)
    x_cls = jnp.asarray(rs.randn(B, C), jnp.float32)
    x_aux = jnp.asarray(rs.randn(B, n * n, C), jnp.float32)
    bbox = jnp.asarray([1, 1, 3, 4], jnp.int32)
    return x_cls, x_aux, bbox


@pytest.mark.parametrize("n", [7, 4, 10, 14])
@pytest.mark.parametrize("loss_fn", [token_label_cross_entropy,
                                     token_label_gt_cross_entropy])
def test_sparse_matches_dense_loss_and_grads(n, loss_fn):
    labels, scores, inds = _data()
    kw = dict(num_classes=C, smoothing=0.1, label_size=n)
    dense = build_token_label_target(labels, scores, inds, **kw)
    sparse = sparse_token_label_target(labels, scores, inds, **kw)
    out = _outputs(n)

    def ld(x_cls, x_aux):
        return loss_fn((x_cls, x_aux, out[2]), dense)

    def ls(x_cls, x_aux):
        return loss_fn((x_cls, x_aux, out[2]), sparse)

    np.testing.assert_allclose(ld(out[0], out[1]), ls(out[0], out[1]),
                               rtol=1e-5, atol=1e-6)
    gd = jax.grad(ld, argnums=(0, 1))(out[0], out[1])
    gs = jax.grad(ls, argnums=(0, 1))(out[0], out[1])
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_sparse_respects_gt_soft_override():
    labels, scores, inds = _data()
    gt_soft = jnp.asarray(np.random.RandomState(3).rand(B, C), jnp.float32)
    kw = dict(num_classes=C, smoothing=0.1, label_size=H, gt_soft=gt_soft)
    dense = build_token_label_target(labels, scores, inds, **kw)
    sparse = sparse_token_label_target(labels, scores, inds, **kw)
    out = _outputs(H)
    np.testing.assert_allclose(
        token_label_gt_cross_entropy((out[0], out[1], out[2]), dense),
        token_label_gt_cross_entropy((out[0], out[1], out[2]), sparse),
        rtol=1e-5, atol=1e-6)


def test_step_builder_emits_sparse_under_env(monkeypatch):
    """With the knob on, StepBuilder._build_target returns the dict form
    for sparse-capable losses and the train step produces the same loss."""
    import argparse
    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.train.steps import StepBuilder

    args = argparse.Namespace(token_label=True, token_label_size=14,
                              ground_truth=False, dense_weight=0.5,
                              cls_weight=1.0, smoothing=0.1,
                              jsd=False, aug_splits=0, num_classes=C)
    loss = build_train_loss(args)
    assert getattr(loss, "supports_sparse_tl", False)
    sb = StepBuilder(model=None, tx=None, train_loss=loss, num_classes=C,
                     token_label=True, has_token_label_data=True)
    labels, scores, inds = _data()
    batch = {"label": labels, "label_scores": scores, "label_inds": inds}
    r = H * 16
    monkeypatch.setenv("AUTOPROG_SPARSE_TL", "0")
    dense = sb._build_target(batch, r)
    monkeypatch.setenv("AUTOPROG_SPARSE_TL", "1")
    sparse = sb._build_target(batch, r)
    assert isinstance(sparse, dict) and not isinstance(dense, dict)
    out = _outputs(H)
    np.testing.assert_allclose(
        token_label_cross_entropy((out[0], out[1], out[2]), dense),
        token_label_cross_entropy((out[0], out[1], out[2]), sparse),
        rtol=1e-5, atol=1e-6)
