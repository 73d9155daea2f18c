"""Numerical parity against torch CPU for the ops the reference delegates
to torch/cuDNN (SURVEY §2.3.5): unfold/fold, bilinear input resize, the
outlook-attention core, soft-target CE and the MixToken lambda math.

These are black-box oracle checks — same inputs through torch's public ops
and through our JAX implementations must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_unfold_matches_torch():
    from autoprog_tpu.ops.unfold import unfold_nhwc
    x = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
    tu = torch.nn.Unfold(kernel_size=3, padding=1, stride=2)
    ref = tu(torch.from_numpy(x)).numpy()          # [B, C*9, L]
    B, Ck, L = ref.shape
    ref = ref.reshape(B, 3, 3, 3, L)               # [B, C, kh, kw, L]
    ours = np.asarray(unfold_nhwc(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 3, 2, 1))  # [B,h,w,k,k,C]
    h = w = 4
    ours_l = ours.reshape(B, h * w, 3, 3, 3).transpose(0, 4, 2, 3, 1)
    np.testing.assert_allclose(ours_l, ref, rtol=1e-6)


def test_fold_matches_torch():
    from autoprog_tpu.ops.unfold import fold_nhwc
    rs = np.random.RandomState(1)
    patches = rs.randn(2, 4, 4, 3, 3, 5).astype(np.float32)  # [B,h,w,k,k,C]
    ours = np.asarray(fold_nhwc(jnp.asarray(patches), (8, 8), 3, 2, 1))
    # torch F.fold wants [B, C*k*k, L] with channel-major layout
    tp = patches.reshape(2, 16, 9, 5).transpose(0, 3, 2, 1).reshape(2, 45, 16)
    ref = torch.nn.functional.fold(
        torch.from_numpy(tp), output_size=(8, 8), kernel_size=3,
        padding=1, stride=2).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=1e-5,
                               atol=1e-6)


def test_bilinear_resize_matches_torch():
    from autoprog_tpu.ops.interpolate import resize_bilinear
    x = np.random.RandomState(2).randn(2, 3, 16, 16).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(9, 9), mode="bilinear",
        align_corners=False).numpy()
    ours = np.asarray(resize_bilinear(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 9)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_outlook_attention_core_matches_torch():
    """Full outlook-attention math vs a torch transcription of the public
    formula (`models/volo.py:77-99` semantics, independent implementation)."""
    from autoprog_tpu.ops.outlook import outlook_attention
    B, H, W, C, heads, k, s, p = 2, 8, 8, 16, 4, 3, 2, 1
    rs = np.random.RandomState(3)
    v = rs.randn(B, H, W, C).astype(np.float32)
    hh, ww = H // s, W // s
    attn_logits = rs.randn(B, hh, ww, heads * k ** 4).astype(np.float32)
    scale = (C // heads) ** -0.5

    ours = np.asarray(outlook_attention(
        jnp.asarray(v), jnp.asarray(attn_logits), num_heads=heads,
        kernel_size=k, stride=s, padding=p, scale=scale))

    tv = torch.from_numpy(v.transpose(0, 3, 1, 2))          # B,C,H,W
    unf = torch.nn.Unfold(k, padding=p, stride=s)(tv)       # B,C*9,L
    vp = unf.reshape(B, heads, C // heads, k * k, hh * ww).permute(
        0, 1, 4, 3, 2)                                      # B,h,N,kk,d
    at = torch.from_numpy(attn_logits).reshape(
        B, hh * ww, heads, k * k, k * k).permute(0, 2, 1, 3, 4)
    at = (at * scale).softmax(dim=-1)
    out = (at @ vp).permute(0, 1, 4, 3, 2).reshape(B, C * k * k, hh * ww)
    ref = torch.nn.functional.fold(out, output_size=(H, W), kernel_size=k,
                                   padding=p, stride=s).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, rtol=2e-4,
                               atol=2e-5)


def test_soft_target_ce_matches_torch():
    from autoprog_tpu.losses import soft_target_cross_entropy
    rs = np.random.RandomState(4)
    logits = rs.randn(8, 10).astype(np.float32)
    target = rs.rand(8, 10).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    ref = torch.sum(
        -torch.from_numpy(target)
        * torch.nn.functional.log_softmax(torch.from_numpy(logits), dim=-1),
        dim=-1).mean().item()
    ours = float(soft_target_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(target)))
    assert abs(ours - ref) < 1e-5


def test_token_label_loss_lambda_reconstruction():
    """TokenLabel CE flips the cls target by lam = 1 - area/N
    (`loss/cross_entropy.py:149-151`) — check against a direct
    computation."""
    from autoprog_tpu.losses import token_label_cross_entropy
    rs = np.random.RandomState(5)
    B, N, C = 4, 16, 10
    x_cls = jnp.asarray(rs.randn(B, C), jnp.float32)
    x_aux = jnp.asarray(rs.randn(B, N, C), jnp.float32)
    target = rs.rand(B, C).astype(np.float32)
    target /= target.sum(-1, keepdims=True)
    bbox = jnp.asarray([1, 1, 3, 3], jnp.int32)   # area 4, lam = 1 - 4/16
    lam = 1 - 4 / 16
    mixed = lam * target + (1 - lam) * target[::-1]
    ref_cls = torch.sum(
        -torch.from_numpy(mixed)
        * torch.nn.functional.log_softmax(torch.from_numpy(
            np.asarray(x_cls)), dim=-1), -1).mean()
    aux_t = np.tile(target[:, None], (1, N, 1)).reshape(B * N, C)
    ref_aux = torch.sum(
        -torch.from_numpy(aux_t)
        * torch.nn.functional.log_softmax(torch.from_numpy(
            np.asarray(x_aux).reshape(B * N, C)), dim=-1), -1).mean()
    ref = (1.0 * ref_cls + 0.5 * ref_aux).item()
    ours = float(token_label_cross_entropy(
        (x_cls, x_aux, bbox), jnp.asarray(target), dense_weight=0.5,
        cls_weight=1.0))
    assert abs(ours - ref) < 1e-5


def test_avg_pool_matches_torch():
    from autoprog_tpu.ops.unfold import avg_pool_ceil
    x = np.random.RandomState(6).randn(2, 3, 8, 8).astype(np.float32)
    ref = torch.nn.AvgPool2d(2, 2, ceil_mode=True)(
        torch.from_numpy(x)).numpy()
    ours = np.asarray(avg_pool_ceil(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
