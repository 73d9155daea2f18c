"""Fused Pallas outlook-attention kernel vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (bit-level semantics identical
to the compiled TPU kernel); the XLA path (`ops/outlook.py`) is the oracle
(itself torch-parity tested in test_torch_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.ops.outlook import outlook_attention
from autoprog_tpu.ops.outlook_pallas import outlook_attention_fused


def make_inputs(B=2, H=8, W=8, C=16, heads=4, seed=0):
    rs = np.random.RandomState(seed)
    v = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
    attn = jnp.asarray(rs.randn(B, H // 2, W // 2, heads * 81), jnp.float32)
    scale = (C // heads) ** -0.5
    return v, attn, heads, scale


def test_fused_matches_xla_reference():
    v, attn, heads, scale = make_inputs()
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_fused(v, attn, heads, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_fused_matches_at_volo_shape():
    # the real stage-0 shape at r=128 (h=w=8) with VOLO-D1 widths
    v, attn, heads, scale = make_inputs(B=1, H=16, W=16, C=192, heads=6,
                                        seed=1)
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_fused(v, attn, heads, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_fused_gradients_match():
    v, attn, heads, scale = make_inputs(B=1, H=8, W=8, C=8, heads=2, seed=2)

    def loss_ref(v, a):
        return jnp.sum(outlook_attention(
            v, a, num_heads=heads, kernel_size=3, stride=2, padding=1,
            scale=scale) ** 2)

    def loss_fused(v, a):
        return jnp.sum(outlook_attention_fused(v, a, heads, scale, True) ** 2)

    gv_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(v, attn)
    gv_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(v, attn)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                               rtol=2e-4, atol=2e-5)


def test_hybrid2_matches_xla_reference():
    from autoprog_tpu.ops.outlook_pallas import outlook_attention_hybrid2
    v, attn, heads, scale = make_inputs(B=2, H=8, W=8, C=16, heads=4, seed=5)
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_hybrid2(v, attn, heads, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_hybrid2_matches_at_volo_shape():
    from autoprog_tpu.ops.outlook_pallas import outlook_attention_hybrid2
    v, attn, heads, scale = make_inputs(B=1, H=16, W=16, C=192, heads=6,
                                        seed=6)
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_hybrid2(v, attn, heads, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_hybrid2_gradients_match():
    from autoprog_tpu.ops.outlook_pallas import outlook_attention_hybrid2
    v, attn, heads, scale = make_inputs(B=1, H=8, W=8, C=8, heads=2, seed=7)

    def loss_ref(v, a):
        return jnp.sum(outlook_attention(
            v, a, num_heads=heads, kernel_size=3, stride=2, padding=1,
            scale=scale) ** 2)

    def loss_fused(v, a):
        return jnp.sum(
            outlook_attention_hybrid2(v, a, heads, scale, True) ** 2)

    gv_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(v, attn)
    gv_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(v, attn)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_r),
                               rtol=2e-4, atol=2e-5)


def test_blockdiag_matches_xla_reference():
    from autoprog_tpu.ops.outlook import outlook_attention_blockdiag
    # h=w=4 -> n=16 tokens; group=4 divides
    v, attn, heads, scale = make_inputs(B=2, H=8, W=8, C=16, heads=4, seed=3)
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_blockdiag(v, attn, num_heads=heads,
                                      kernel_size=3, stride=2, padding=1,
                                      scale=scale, group=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)
    # grads too (bwd runs through the same block-diag einsum)
    def loss_ref(v, a):
        return jnp.sum(outlook_attention(
            v, a, num_heads=heads, kernel_size=3, stride=2, padding=1,
            scale=scale) ** 2)

    def loss_blk(v, a):
        return jnp.sum(outlook_attention_blockdiag(
            v, a, num_heads=heads, kernel_size=3, stride=2, padding=1,
            scale=scale, group=4) ** 2)

    gv_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(v, attn)
    gv_b, ga_b = jax.grad(loss_blk, argnums=(0, 1))(v, attn)
    np.testing.assert_allclose(np.asarray(gv_b), np.asarray(gv_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga_b), np.asarray(ga_r),
                               rtol=2e-4, atol=2e-5)


def test_cvjp_variant_matches_autodiff():
    from autoprog_tpu.ops.outlook import outlook_attention_cvjp
    v, attn, heads, scale = make_inputs(B=2, H=8, W=8, C=16, heads=4, seed=8)
    kw = dict(num_heads=heads, kernel_size=3, stride=2, padding=1,
              scale=scale)
    ref = outlook_attention(v, attn, **kw)
    got = outlook_attention_cvjp(v, attn, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    def loss_ad(v, a):
        return jnp.sum(outlook_attention(v, a, **kw) ** 2)

    def loss_cv(v, a):
        return jnp.sum(outlook_attention_cvjp(v, a, **kw) ** 2)

    gv_r, ga_r = jax.grad(loss_ad, argnums=(0, 1))(v, attn)
    gv_c, ga_c = jax.grad(loss_cv, argnums=(0, 1))(v, attn)
    np.testing.assert_allclose(np.asarray(gv_c), np.asarray(gv_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ga_c), np.asarray(ga_r),
                               rtol=2e-4, atol=2e-5)


def test_blockdiag_fallback_when_group_does_not_divide():
    from autoprog_tpu.ops.outlook import outlook_attention_blockdiag
    v, attn, heads, scale = make_inputs(B=1, H=6, W=6, C=8, heads=2, seed=4)
    ref = outlook_attention(v, attn, num_heads=heads, kernel_size=3,
                            stride=2, padding=1, scale=scale)
    got = outlook_attention_blockdiag(v, attn, num_heads=heads,
                                      kernel_size=3, stride=2, padding=1,
                                      scale=scale, group=7)  # 9 % 7 != 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)
