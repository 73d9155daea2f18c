"""Fused MHSA Pallas kernel vs the XLA einsum path (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from autoprog_tpu.ops.attention_pallas import mhsa_fused, mhsa_fused_qkv


def xla_mhsa(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def make_qkv(B=2, n=12, h=3, d=8, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(B, n, h, d), jnp.float32)
    return mk(), mk(), mk(), d ** -0.5


def test_fused_mhsa_matches_xla():
    q, k, v, scale = make_qkv()
    ref = xla_mhsa(q, k, v, scale)
    got = mhsa_fused(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_mhsa_matches_at_volo_shape():
    # the real transformer-stage shape (tokens 196, head_dim 32)
    q, k, v, scale = make_qkv(B=1, n=196, h=2, d=32, seed=1)
    ref = xla_mhsa(q, k, v, scale)
    got = mhsa_fused(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_mhsa_grads_match():
    q, k, v, scale = make_qkv(B=1, n=12, h=2, d=8, seed=2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_mhsa(q, k, v, scale) ** 2)

    def loss_fused(q, k, v):
        return jnp.sum(mhsa_fused(q, k, v, scale, True) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


# -- boundary-free qkv variant ---------------------------------------------


def xla_mhsa_qkv(qkv, num_heads, scale):
    """The exact layers.py path: reshape (n, 3, h, d) + einsum chain."""
    B, n, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    q, k, v = (jnp.moveaxis(qkv.reshape(B, n, 3, num_heads, d), 2, 0)[i]
               for i in range(3))
    return xla_mhsa(q, k, v, scale).reshape(B, n, C)


def make_fused_qkv(B=2, n=12, h=3, d=8, seed=0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(B, n, 3 * h * d), jnp.float32), d ** -0.5


def test_fused_qkv_matches_xla():
    qkv, scale = make_fused_qkv()
    ref = xla_mhsa_qkv(qkv, 3, scale)
    got = mhsa_fused_qkv(qkv, 3, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_qkv_matches_at_volo_shape():
    qkv, scale = make_fused_qkv(B=1, n=196, h=2, d=32, seed=1)
    ref = xla_mhsa_qkv(qkv, 2, scale)
    got = mhsa_fused_qkv(qkv, 2, scale, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_qkv_shards_over_batch_without_gather():
    """Under data-parallel pjit the custom_partitioning rule must run the
    kernel per-shard: results match the unsharded op and the compiled
    module contains no all-gather of the activations."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    qkv, scale = make_fused_qkv(B=8, n=12, h=2, d=8, seed=3)
    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "test expects the 8-device CPU mesh"
    mesh = Mesh(devs, ("data",))
    sh = NamedSharding(mesh, P("data"))
    qkv_sharded = jax.device_put(qkv, sh)

    f = jax.jit(lambda x: mhsa_fused_qkv(x, 2, scale, True))
    ref = f(qkv)
    got = f(qkv_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    txt = f.lower(qkv_sharded).compile().as_text()
    assert not re.search(r"all-gather", txt), "partitioner gathered qkv"

    g = jax.jit(jax.grad(lambda x: jnp.sum(
        mhsa_fused_qkv(x, 2, scale, True) ** 2)))
    np.testing.assert_allclose(np.asarray(g(qkv_sharded)),
                               np.asarray(g(qkv)), rtol=2e-4, atol=2e-5)


def test_fused_qkv_grads_match():
    qkv, scale = make_fused_qkv(B=1, n=12, h=2, d=8, seed=2)

    def loss_ref(qkv):
        return jnp.sum(xla_mhsa_qkv(qkv, 2, scale) ** 2)

    def loss_fused(qkv):
        return jnp.sum(mhsa_fused_qkv(qkv, 2, scale, True) ** 2)

    gr = jax.grad(loss_ref)(qkv)
    gf = jax.grad(loss_fused)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)


# -- round-5 promoted forward: two-phase + compute-dtype scores -------------


def xla_mhsa_qkv_bf16_scores(qkv, num_heads, scale):
    """The layers.py N>=128 numerics: scores materialized at compute
    dtype, softmax accumulated f32."""
    B, n, C3 = qkv.shape
    C = C3 // 3
    d = C // num_heads
    q, k, v = (jnp.moveaxis(qkv.reshape(B, n, 3, num_heads, d), 2, 0)[i]
               for i in range(3))
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32)
    s = (s * scale).astype(qkv.dtype)
    e = jnp.exp((s - s.max(axis=-1, keepdims=True)).astype(jnp.float32))
    p = (e / e.sum(axis=-1, keepdims=True)).astype(qkv.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32).astype(qkv.dtype)
    return o.reshape(B, n, C)


def test_fused_qkv_bf16_scores_match_xla_bf16_path():
    """With bf16 inputs the kernel's compute-dtype scores must track the
    unfused XLA path's bf16-logit numerics (both deviate from the f32
    formula by at most one bf16 rounding of the logits)."""
    rs = np.random.RandomState(7)
    qkv = jnp.asarray(rs.randn(2, 196, 3 * 2 * 32), jnp.bfloat16)
    scale = 32 ** -0.5
    ref = xla_mhsa_qkv_bf16_scores(qkv, 2, scale).astype(jnp.float32)
    got = mhsa_fused_qkv(qkv, 2, scale, True).astype(jnp.float32)
    # not bit-equal (scale rides q in the kernel, the logits in XLA) but
    # both round the logits to bf16 — tolerances follow bf16 eps
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.04, atol=0.04)


def test_fused_qkv_scores_f32_env_restores_old_numerics(monkeypatch):
    """AUTOPROG_ATTN_SCORES_F32=1 must reproduce the rounds-1-4 all-f32
    scores: closer to the f32 reference than the bf16-score default."""
    from autoprog_tpu.ops import attention_pallas as ap

    rs = np.random.RandomState(8)
    qkv = jnp.asarray(rs.randn(2, 64, 3 * 2 * 32), jnp.bfloat16)
    scale = 32 ** -0.5
    ref_f32 = xla_mhsa_qkv(qkv.astype(jnp.float32), 2, scale)

    def err(out):
        return float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref_f32)))

    e_bf16 = err(ap._qkv_fwd_raw(qkv, 2, scale, True, scores_f32=False))
    e_f32 = err(ap._qkv_fwd_raw(qkv, 2, scale, True, scores_f32=True))
    monkeypatch.setenv("AUTOPROG_ATTN_SCORES_F32", "1")
    e_env = err(ap._qkv_fwd_raw(qkv, 2, scale, True))
    assert e_env == e_f32
    assert e_f32 <= e_bf16


def test_fused_qkv_twophase_fallback_bit_identical(monkeypatch):
    """The large-n fallback (scores too big to park in VMEM) reorders
    per-head work only — it must be bit-identical to the two-phase path."""
    from autoprog_tpu.ops import attention_pallas as ap

    rs = np.random.RandomState(9)
    qkv = jnp.asarray(rs.randn(2, 196, 3 * 2 * 32), jnp.bfloat16)
    scale = 32 ** -0.5
    two = ap._qkv_fwd_raw(qkv, 2, scale, True)
    monkeypatch.setattr(ap, "_TWOPHASE_VMEM_BUDGET", 0)
    one = ap._qkv_fwd_raw(qkv, 2, scale, True)
    assert bool(jnp.all(two == one))


def test_fused_qkv_bf16_grads_consistent():
    """Backward recompute at the forward's score dtype: the custom VJP of
    the bf16-score kernel must match autodiff THROUGH the bf16-score
    formula (not the f32 one)."""
    rs = np.random.RandomState(10)
    qkv = jnp.asarray(rs.randn(1, 64, 3 * 2 * 32), jnp.bfloat16)
    scale = 32 ** -0.5

    def loss_ref(x):
        return jnp.sum(
            xla_mhsa_qkv_bf16_scores(x, 2, scale).astype(jnp.float32) ** 2)

    def loss_fused(x):
        return jnp.sum(
            mhsa_fused_qkv(x, 2, scale, True).astype(jnp.float32) ** 2)

    gr = jax.grad(loss_ref)(qkv).astype(jnp.float32)
    gf = jax.grad(loss_fused)(qkv).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=0.1, atol=0.05)
