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
