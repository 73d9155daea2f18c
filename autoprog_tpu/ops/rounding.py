"""Stochastic-rounding casts for low-precision optimizer/EMA state.

Why: EMA trees are pure HBM bandwidth in the train step (read + write of
a param-sized tree per decay, no FLOPs — the roofline's opt+EMA segment,
PERF.md). Storing them in bf16 halves that traffic, but a *deterministic*
f32->bf16 cast freezes the EMA: with decay d ~ 0.9999 the per-step
increment (1-d)*(p-e) is far below bf16's ~2^-8 relative ulp, so
round-to-nearest returns the old value forever. Stochastic rounding keeps
the update unbiased (E[sr(x)] = x), so the EMA still converges to the
same mean at bf16 storage cost — the same trick TPUs use in hardware for
bf16 training accumulators.

Dither cost: threefry2x32 runs ~10 VPU ops per uint32, so drawing an
independent stream per element per tree (4 x 26.6M u32/step on VOLO-D1)
would burn about as much time as the bandwidth it saves. Instead ONE
threefry sweep the size of the largest leaf is drawn per (tree, step)
and every leaf reads a prefix of it. Per-ELEMENT unbiasedness — the only
property SR needs — is untouched; the rounding noise is merely
correlated across leaves within one step, and the per-step `fold_in`
decorrelates steps. (XLA:CPU in this build lacks RngBitGenerator, so the
native-RBG shortcut is not portable; this is the cheap portable route.)

The reference keeps its EMA models in f32 (`timm.utils.ModelEmaV2`,
wired at `main_prog.py:507-514`); this is a TPU-first improvement gated
behind `--model-ema-bf16` and a numerics-parity test
(tests/test_train_step.py::test_ema_bf16_sr_parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sr_bf16_with_dither(x32: jax.Array, dither16: jax.Array) -> jax.Array:
    """Round f32 -> bf16 stochastically using caller-supplied uniform
    16-bit dither (uint32 values in [0, 0xFFFF])."""
    bits = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    rounded = (bits + dither16) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
        jnp.bfloat16)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """f32 -> bf16 with stochastic rounding.

    Adds uniform 16-bit dither below the bf16 mantissa boundary of the
    f32 bit pattern, then truncates: the result rounds up with probability
    equal to the truncated fraction, so E[result] == x (to f32 precision).
    Carries out of the mantissa propagate into the exponent, which is the
    correct round-up across binade boundaries. NaN/inf pass through
    (dither cannot change the exponent field of inf without the mantissa
    carrying, and NaN stays NaN under mantissa increments).
    """
    assert x.dtype == jnp.float32, x.dtype
    dither = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    return _sr_bf16_with_dither(x, dither)


def cast_tree_bf16_sr(tree, key: jax.Array):
    """Stochastically round every f32 leaf of `tree` to bf16.

    One shared dither sweep (sized to the largest leaf) serves all
    leaves — see the module docstring for why that is both sound and an
    order of magnitude cheaper than per-leaf streams."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    max_sz = max(int(x.size) for x in leaves)
    sweep = jax.random.bits(key, (max_sz,), jnp.uint32) & jnp.uint32(0xFFFF)
    out = [_sr_bf16_with_dither(
        x.astype(jnp.float32),
        jax.lax.slice(sweep, (0,), (int(x.size),)).reshape(x.shape))
        for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)
