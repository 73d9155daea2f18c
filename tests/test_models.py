"""Model forward-pass tests: shapes, train/eval structure, elasticity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.prog.depth import elastic_keep_masks, full_keep_masks
from autoprog_tpu.registry import create_model


def init_model(mdef, img_size=64, num_classes=10, **kw):
    model = mdef.make(num_classes=num_classes, img_size=img_size,
                      dtype=jnp.float32, **kw)
    x = jnp.zeros((2, img_size, img_size, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mixtoken": jax.random.PRNGKey(2)},
        x, train=True)
    return model, variables


def test_volo_variant_forward_shapes():
    mdef = create_model("volo_h4_l4")
    model, variables = init_model(mdef, img_size=64)
    x = jnp.ones((2, 64, 64, 3))
    # train: (x_cls, x_aux, bbox) + batch_stats mutation
    (x_cls, x_aux, bbox), mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(3),
              "mixtoken": jax.random.PRNGKey(4)},
        mutable=["batch_stats"])
    assert x_cls.shape == (2, 10)
    # tokens: 64/8/2 = 4 -> 16 aux tokens
    assert x_aux.shape == (2, 16, 10)
    assert bbox.shape == (4,)
    # eval: fused logits
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)


def test_volo_test_pool_fusion():
    """--test-pool swaps the eval fusion from max(aux) to mean(aux):
    same shape, different function, identical cls head."""
    mdef = create_model("volo_h4_l4")
    model, variables = init_model(mdef, img_size=64)
    model_tp = mdef.make(num_classes=10, img_size=64, dtype=jnp.float32,
                         aux_fusion="mean")
    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    out_max = model.apply(variables, x, train=False)
    out_mean = model_tp.apply(variables, x, train=False)
    assert out_mean.shape == out_max.shape
    assert not np.allclose(np.asarray(out_mean), np.asarray(out_max))
    # max-fusion >= mean-fusion elementwise given the same aux logits
    assert np.all(np.asarray(out_max) >= np.asarray(out_mean) - 1e-5)


def test_volo_resolution_elasticity():
    mdef = create_model("volo_h4_l4")
    model, variables = init_model(mdef, img_size=64)
    for r in (32, 64, 96):
        out = model.apply(variables, jnp.ones((1, r, r, 3)), train=False)
        assert out.shape == (1, 10)


def test_volo_elastic_depth_changes_function():
    mdef = create_model("volo_h4_l8")  # l0=2, transformers=6
    model, variables = init_model(mdef, img_size=64)
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    full = model.apply(variables, x, train=False)
    keep = elastic_keep_masks(6, min_layer_num=6, max_layer_num=8)
    sub = model.apply(variables, x, train=False, keep=keep)
    assert sub.shape == full.shape
    assert not np.allclose(np.asarray(sub), np.asarray(full))


def test_volo_keep_all_equals_default():
    mdef = create_model("volo_h4_l4")
    model, variables = init_model(mdef, img_size=64)
    x = jnp.ones((1, 64, 64, 3))
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False, keep=full_keep_masks(4))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_deit_forward():
    mdef = create_model("deit_tiny_patch16_224")
    model, variables = init_model(mdef, img_size=64)
    x = jnp.ones((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    out_t = model.apply(variables, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(0)})
    assert out_t.shape == (2, 10)


def test_deit_distilled_forward():
    mdef = create_model("deit_tiny_distilled_patch16_224")
    model, variables = init_model(mdef, img_size=64)
    x = jnp.ones((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    x_cls, x_dist = model.apply(variables, x, train=True,
                                rngs={"dropout": jax.random.PRNGKey(0)})
    assert x_cls.shape == x_dist.shape == (2, 10)


def test_deit_variant_and_depth_mask():
    mdef = create_model("deit_h2_l4")
    model, variables = init_model(mdef, img_size=32)
    x = jnp.ones((1, 32, 32, 3))
    full = model.apply(variables, x, train=False)
    sub = model.apply(variables, x, train=False,
                      keep=((True, False, True, False),))
    assert full.shape == sub.shape == (1, 10)
    assert not np.allclose(np.asarray(full), np.asarray(sub))


def test_volo_family_arch_and_param_parity():
    """All five D-variants match the reference's tables (layers/dims/heads
    from `/root/reference/models/volo.py:697-821`) and land at the paper's
    param counts (D1 27M / D2 59M / D3 86M / D4 193M / D5 296M).
    eval_shape keeps even D5 free to audit."""
    expect = {
        "volo_d1": ((4, 4, 8, 2), (192, 384, 384, 384), (6, 12, 12, 12),
                    26.6e6),
        "volo_d2": ((6, 4, 10, 4), (256, 512, 512, 512), (8, 16, 16, 16),
                    58.7e6),
        "volo_d3": ((8, 8, 16, 4), (256, 512, 512, 512), (8, 16, 16, 16),
                    86.3e6),
        "volo_d4": ((8, 8, 16, 4), (384, 768, 768, 768), (12, 16, 16, 16),
                    193e6),
        "volo_d5": ((12, 12, 20, 4), (384, 768, 768, 768), (12, 16, 16, 16),
                    296e6),
    }
    for name, (layers, dims, heads, n_expect) in expect.items():
        mdef = create_model(name)
        assert tuple(mdef.arch.layers) == layers, name
        assert tuple(mdef.arch.embed_dims) == dims, name
        assert tuple(mdef.arch.num_heads) == heads, name
        model = mdef.make(num_classes=1000, img_size=224,
                          dtype=jnp.float32)
        x = jnp.zeros((1, 224, 224, 3))
        variables = jax.eval_shape(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False))
        n = sum(np.prod(v.shape)
                for v in jax.tree.leaves(variables["params"]))
        assert abs(n - n_expect) / n_expect < 0.10, f"{name}: {n / 1e6:.1f}M"


def test_volo_d1_param_count():
    """VOLO-D1 should land at ~27M params (reference models/volo.py:700)."""
    mdef = create_model("volo_d1")
    model = mdef.make(num_classes=1000, img_size=224, dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False))
    n = sum(np.prod(v.shape) for v in
            jax.tree.leaves(variables["params"]))
    assert 25e6 < n < 30e6, f"param count {n}"


def test_d_model_aliases_are_exact_collapses():
    """volo_d2..d5 are addressable in main_prog via 2-stage collapses
    (VERDICT r4 #5): stages 1-3 of the registry models share
    dim/heads/resolution (`models/volo.py:730-821`), so collapsing them
    into one transformer stage is the IDENTICAL network — asserted here
    as an exact match of total params and the full param-shape multiset."""
    from autoprog_tpu.main_prog import _VARIANT_ALIASES

    def shape_sig(name):
        mdef = create_model(name)
        m = mdef.make(num_classes=10, img_size=32, dtype=jnp.float32)
        v = jax.eval_shape(
            lambda k: m.init({"params": k}, jnp.zeros((1, 32, 32, 3)),
                             train=False), jax.random.PRNGKey(0))
        leaves = jax.tree_util.tree_leaves(v["params"])
        total = sum(int(np.prod(l.shape)) for l in leaves)
        return total, sorted(str(l.shape) for l in leaves)

    for d_name in ("volo_d2", "volo_d3", "volo_d4", "volo_d5"):
        alias = _VARIANT_ALIASES[d_name]
        td, sd = shape_sig(d_name)
        ta, sa = shape_sig(alias)
        assert td == ta, f"{d_name} {td} != {alias} {ta}"
        assert sd == sa, f"{d_name} shape multiset differs from {alias}"


def test_fixed_width_family_rejects_width_change():
    """volod4/volod5 pin the transformer head count (head_dim 48 is
    outside the [h/2,h,h,h] grammar); a width-changing h token must be a
    hard error, not a silently different model."""
    with pytest.raises(ValueError):
        create_model("volod4_h8_l18")
    # depth-only members build fine (stage models during growth)
    assert create_model("volod4_h16_l18").arch.total_layers == 18
    assert create_model("volod5_h16_l24").arch.mlp_ratios == (4, 4, 4, 4)
