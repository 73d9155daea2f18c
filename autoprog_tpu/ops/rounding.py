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

The reference keeps its EMA models in f32 (`timm.utils.ModelEmaV2`,
wired at `main_prog.py:507-514`); this is a TPU-first improvement gated
behind `--model-ema-bf16` and a numerics-parity test
(tests/test_train_step.py::test_ema_bf16_sr_parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    dither = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + dither) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
        jnp.bfloat16)


def cast_tree_bf16_sr(tree, key: jax.Array):
    """Stochastically round every f32 leaf of `tree` to bf16, with an
    independent dither stream per leaf (fold_in by leaf index)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = [stochastic_round_bf16(x.astype(jnp.float32),
                                 jax.random.fold_in(key, i))
           for i, x in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, out)
