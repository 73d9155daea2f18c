"""Flax layer library for VOLO / DeiT.

Parity targets (reference file:line):
  * Mlp                 models/volo.py:147-167
  * Attention (MHSA)    models/volo.py:170-201
  * OutlookAttention    models/volo.py:48-103
  * Outlooker           models/volo.py:106-144
  * TransformerBlock    models/volo.py:204-234
  * ClassAttention      models/volo.py:237-277
  * ClassBlock          models/volo.py:280-308
  * PatchEmbed          models/volo.py:342-380
  * Downsample          models/volo.py:383-396
  * DropPath            timm stochastic depth (used throughout)

Conventions (important for the growth operators in prog/growth.py):
  * fused qkv projections are a single Dense named "qkv" (kv / q for class
    attention), so width growth can reshape the out-axis as (3, dim) exactly
    as the reference does for torch Linear (prog/helpers.py:432-445);
  * compute dtype is `dtype` (bf16 by default on TPU), params are f32;
    softmax/layernorm statistics accumulate in f32.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from autoprog_tpu.ops.outlook import outlook_attention
from autoprog_tpu.ops.unfold import avg_pool_ceil

Dtype = jnp.dtype

trunc_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def _use_fused_attn(n_lead: int, attn_drop: float, deterministic: bool,
                    n_tokens: int, head_dim: int) -> bool:
    """Route MHSA through the fused Pallas kernel (ops/attention_pallas.py,
    mhsa_fused_qkv — consumes the raw [B, n, 3C] qkv projection, so there
    is NO relayout at the pallas_call boundary).

    AUTOPROG_FUSED_ATTN = 1 | 0 (default 1: measured at the model's own
    qkv-level boundary the kernel wins both directions — fwd 1.71 vs 2.23
    ms/layer, fwd+bwd 3.16 vs 4.10 at [B=128, n=196, C=384, 12 heads],
    scripts/bench_attn.py). Never used under tensor parallelism
    (pallas_call is opaque to the SPMD partitioner; the engine forces the
    flag off)."""
    import os

    import jax

    if os.environ.get("AUTOPROG_FUSED_ATTN", "1") != "1":
        return False
    if attn_drop or n_lead != 1:
        return False
    # VMEM budget: the [n, n] f32 score matrix must fit comfortably
    if n_tokens > 1024 or head_dim > 128:
        return False
    return jax.devices()[0].platform != "cpu"


def _use_fused_outlook(kernel_size: int, stride: int, padding: int,
                       H: int, W: int) -> bool:
    """Route outlook attention through the fused Pallas kernel.

    AUTOPROG_FUSED_OUTLOOK = 1 | 0 (default 0). The kernel is
    numerically verified against the XLA path; it stays opt-in until its
    compiled TPU step time beats XLA's (the XLA fusion of the strided
    slice unfold + transpose fold is already strong)."""
    import os

    mode = os.environ.get("AUTOPROG_FUSED_OUTLOOK", "0")
    supported = (kernel_size == 3 and stride == 2 and padding == 1
                 and H % 2 == 0 and W % 2 == 0)
    return mode == "1" and supported


def dense(features: int, *, use_bias: bool = True, dtype=jnp.bfloat16,
          name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=trunc_init,
                    bias_init=nn.initializers.zeros, name=name)


def remat_wrap(cls, mode, **kw):
    """Wrap a block class in jax.checkpoint according to `mode`.

    False/"" -> no remat; True/"full" -> store only block inputs and
    recompute everything in the backward pass (max HBM saving, ~1.33x
    fwd FLOPs); "dots" -> dots_with_no_batch_dims_saveable policy: matmul
    outputs stay resident, only elementwise/norm/softmax intermediates
    are recomputed (cheaper recompute, smaller traffic saving).
    """
    if not mode:
        return cls
    if mode == "dots":
        return nn.remat(
            cls,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            **kw)
    return nn.remat(cls, **kw)


class DropPath(nn.Module):
    """Per-sample stochastic depth on the residual branch."""
    rate: float
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        deterministic = nn.merge_param("deterministic", self.deterministic,
                                       deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = nn.gelu
    drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention over [..., N, C] tokens."""
    num_heads: int
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        *lead, N, C = x.shape
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5
        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        if _use_fused_attn(len(lead), self.attn_drop, deterministic, N,
                           head_dim):
            from autoprog_tpu.ops.attention_pallas import mhsa_fused_qkv
            out = mhsa_fused_qkv(qkv, self.num_heads, scale)
            out = dense(C, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop)(out,
                                              deterministic=deterministic)
        qkv = qkv.reshape(*lead, N, 3, self.num_heads, head_dim)
        q, k, v = (jnp.moveaxis(qkv, -3, 0)[i] for i in range(3))
        attn = jnp.einsum("...nhd,...mhd->...hnm", q, k,
                          preferred_element_type=jnp.float32)
        if N >= 128:
            # materialize the [.., h, n, n] logits in compute dtype (half
            # the HBM traffic of f32; the reference under apex AMP
            # materializes fp16 logits the same way); exp/sum still
            # accumulate in f32. Measured +6.2% e2e at n=196 but a small
            # loss at n=64 (the extra cast pass outweighs the traffic cut
            # when the matrices are small) — hence the gate.
            attn = (attn * scale).astype(self.dtype)
            attn = attn - attn.max(axis=-1, keepdims=True)
            e = jnp.exp(attn.astype(jnp.float32))
            attn = (e / e.sum(axis=-1, keepdims=True)).astype(self.dtype)
        else:
            attn = jax.nn.softmax(attn * scale, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("...hnm,...mhd->...nhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(*lead, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class OutlookAttention(nn.Module):
    """Outlook attention over an NHWC feature map."""
    num_heads: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, H, W, C = x.shape
        head_dim = C // self.num_heads
        v = dense(C, use_bias=self.qkv_bias, dtype=self.dtype, name="v")(x)
        pooled = avg_pool_ceil(x, self.stride)
        attn_logits = dense(self.kernel_size ** 4 * self.num_heads,
                            dtype=self.dtype, name="attn")(pooled)
        # attn dropout sits between softmax and the value matmul in the
        # reference; it defaults to 0 in every shipped config, so the fused
        # op omits it (asserted rather than silently ignored).
        if self.attn_drop:
            raise NotImplementedError("attn_drop>0 unsupported in fused outlook op")
        if _use_fused_outlook(self.kernel_size, self.stride, self.padding,
                              H, W):
            from autoprog_tpu.ops.outlook_pallas import outlook_attention_fused
            out = outlook_attention_fused(v, attn_logits, self.num_heads,
                                          head_dim ** -0.5)
        else:
            out = outlook_attention(
                v, attn_logits, num_heads=self.num_heads,
                kernel_size=self.kernel_size, stride=self.stride,
                padding=self.padding, scale=head_dim ** -0.5)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class ClassAttention(nn.Module):
    """CaiT-style class attention: only the cls token attends."""
    num_heads: int
    head_dim: Optional[int] = None
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.head_dim or C // self.num_heads
        inner = head_dim * self.num_heads
        scale = head_dim ** -0.5
        kv = dense(inner * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                   name="kv")(x)
        kv = kv.reshape(B, N, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]
        q = dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="q")(x[:, :1])
        q = q.reshape(B, 1, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bnhd->bhqn", q * scale, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        cls = jnp.einsum("bhqn,bnhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        cls = cls.reshape(B, 1, inner)
        cls = dense(C, dtype=self.dtype, name="proj")(cls)
        cls = nn.Dropout(self.proj_drop)(cls, deterministic=deterministic)
        return cls


class Outlooker(nn.Module):
    """norm -> outlook attention -> residual; norm -> MLP -> residual."""
    num_heads: int
    kernel_size: int = 3
    padding: int = 1
    stride: int = 1
    mlp_ratio: float = 3.0
    qkv_bias: bool = False
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = OutlookAttention(self.num_heads, kernel_size=self.kernel_size,
                             padding=self.padding, stride=self.stride,
                             qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
                             dtype=self.dtype, name="attn")(
                                 y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        return x


class TransformerBlock(nn.Module):
    """Standard pre-norm transformer block over token sequences."""
    num_heads: int
    mlp_ratio: float = 3.0
    qkv_bias: bool = False
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, qkv_bias=self.qkv_bias,
                      attn_drop=self.attn_drop, dtype=self.dtype,
                      name="attn")(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        return x


class ClassBlock(nn.Module):
    """Class-attention block: updates only the cls token."""
    num_heads: int
    head_dim: Optional[int] = None
    mlp_ratio: float = 3.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        dim = x.shape[-1]
        cls = x[:, :1]
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = ClassAttention(self.num_heads, head_dim=self.head_dim,
                           qkv_bias=self.qkv_bias, attn_drop=self.attn_drop,
                           proj_drop=self.drop, dtype=self.dtype,
                           name="attn")(y, deterministic=deterministic)
        cls = cls + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(cls)
        y = Mlp(int(dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
                name="mlp")(y, deterministic=deterministic)
        cls = cls + DropPath(self.drop_path)(y, deterministic=deterministic)
        return jnp.concatenate([cls, x[:, 1:]], axis=1)


class ConvBnRelu(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    sync_bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         axis_name=self.sync_bn_axis if train else None,
                         name="bn")(x)
        return nn.relu(x)


class PatchEmbed(nn.Module):
    """VOLO conv stem (3 x conv-BN-ReLU) + patchifying projection conv."""
    embed_dim: int
    patch_size: int = 8
    stem_stride: int = 2
    hidden_dim: int = 64
    stem_conv: bool = True
    dtype: Dtype = jnp.bfloat16
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5
    sync_bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.stem_conv:
            for i, (k, s) in enumerate(((7, self.stem_stride),
                                        (3, 1), (3, 1))):
                x = ConvBnRelu(self.hidden_dim, k, s, dtype=self.dtype,
                               bn_momentum=self.bn_momentum,
                               bn_eps=self.bn_eps,
                               sync_bn_axis=self.sync_bn_axis,
                               name=f"stem{i}")(x, train=train)
        ps = self.patch_size // self.stem_stride if self.stem_conv else self.patch_size
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="proj")(x)
        return x


class Downsample(nn.Module):
    """2x patch-merging conv between VOLO stages."""
    out_dim: int
    patch_size: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_dim, (self.patch_size, self.patch_size),
                       strides=(self.patch_size, self.patch_size),
                       padding="VALID", dtype=self.dtype,
                       param_dtype=jnp.float32, name="proj")(x)
