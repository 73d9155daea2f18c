"""Growth-operator invariants (SURVEY §4.2/§4.3).

The central contract: growth is *function-preserving* —
  * depth growth with the new layers masked off reproduces the source
    model exactly;
  * exact 2x width growth (channel tiling + 1/scale input compensation)
    reproduces the source logits;
  * `shrink_params` (load_super) of a supernet equals the supernet run
    with the matching elastic keep-mask (elasticity equivalence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoprog_tpu.prog.depth import elastic_keep_masks, get_new_layer_idx, volo_depth_split
from autoprog_tpu.prog.growth import grow_batch_stats, grow_params, shrink_params
from autoprog_tpu.registry import create_model


def init_params(name, img=64, classes=10, seed=0):
    mdef = create_model(name)
    model = mdef.make(num_classes=classes, img_size=img, dtype=jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(seed)},
                   jnp.zeros((1, img, img, 3)), train=False)
    return mdef, model, v


def layers_of(mdef):
    return tuple(mdef.arch.layers)


X = None


def x_input():
    global X
    if X is None:
        X = jax.random.normal(jax.random.PRNGKey(42), (2, 64, 64, 3))
    return X


def test_depth_growth_function_preserving_deit():
    _, small_model, sv = init_params("deit_h2_l2")
    mdef_b, big_model, bv = init_params("deit_h2_l4", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(4,), mode="clone")
    # mask off the "new" (cloned) layers -> identical function
    new = get_new_layer_idx(2, 4)
    keep = (tuple(i not in new for i in range(4)),)
    y_small = small_model.apply(sv, x_input(), train=False)
    y_big = big_model.apply({"params": grown}, x_input(), train=False,
                            keep=keep)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big),
                               rtol=2e-4, atol=2e-5)
    # with all layers on, the function must change (new layers active)
    y_full = big_model.apply({"params": grown}, x_input(), train=False)
    assert not np.allclose(np.asarray(y_small), np.asarray(y_full),
                           rtol=1e-3)


def test_width_growth_function_preserving_deit():
    _, small_model, sv = init_params("deit_h2_l2")
    _, big_model, bv = init_params("deit_h4_l2", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(2,), mode="clone")
    y_small = small_model.apply(sv, x_input(), train=False)
    y_big = big_model.apply({"params": grown}, x_input(), train=False)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big),
                               rtol=2e-4, atol=2e-5)


def test_width_and_depth_growth_function_preserving_volo():
    _, small_model, sv = init_params("volo_h2_l4")
    mdef_b, big_model, bv = init_params("volo_h4_l8", seed=1)
    sl, bl = (volo_depth_split(4) + (0, 0)), (volo_depth_split(8) + (0, 0))
    sl = (sl[0], sl[1], 0, 0)
    bl = (bl[0], bl[1], 0, 0)
    grown = grow_params(sv["params"], bv["params"], src_layers=sl,
                        dst_layers=bl, mode="clone")
    stats = grow_batch_stats(sv.get("batch_stats", {}),
                             bv.get("batch_stats", {}), src_layers=sl,
                             dst_layers=bl)
    keep = []
    for stage in range(2):
        new = get_new_layer_idx(sl[stage], bl[stage])
        keep.append(tuple(i not in new for i in range(bl[stage])))
    y_small = small_model.apply(sv, x_input(), train=False)
    y_big = big_model.apply({"params": grown, "batch_stats": stats},
                            x_input(), train=False, keep=tuple(keep))
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_big),
                               rtol=5e-4, atol=5e-4)


def test_clone_noise_breaks_symmetry_slightly():
    _, small_model, sv = init_params("deit_h2_l2")
    _, big_model, bv = init_params("deit_h4_l2", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(2,), mode="clone_noise",
                        rng=jax.random.PRNGKey(5))
    y_small = np.asarray(small_model.apply(sv, x_input(), train=False))
    y_big = np.asarray(big_model.apply({"params": grown}, x_input(),
                                       train=False))
    # close (momentum growth) but not identical (symmetry broken)
    assert np.abs(y_small - y_big).max() > 1e-6
    assert np.abs(y_small - y_big).max() < 2.0
    # the grown qkv kernel has the doubled width on both axes
    flat = jax.tree_util.tree_flatten_with_path(grown)[0]
    qkv = [l for p, l in flat if any(getattr(x, "key", "") == "qkv"
                                     for x in p) and l.ndim == 2][0]
    assert qkv.shape == (256, 768)
    # duplicated input halves differ thanks to the injected noise
    assert not np.allclose(np.asarray(qkv[:128]), np.asarray(qkv[128:]))


def test_clone_ema_with_identical_trees_is_clone():
    _, small_model, sv = init_params("volo_h2_l4")
    _, big_model, bv = init_params("volo_h4_l4", seed=1)
    sl = (volo_depth_split(4)[0], volo_depth_split(4)[1], 0, 0)
    emas = [sv["params"]] * 3
    grown_ema = grow_params(sv["params"], bv["params"], src_layers=sl,
                            dst_layers=sl, mode="clone_ema", ema_trees=emas)
    grown_clone = grow_params(sv["params"], bv["params"], src_layers=sl,
                              dst_layers=sl, mode="clone")
    for a, b in zip(jax.tree.leaves(grown_ema), jax.tree.leaves(grown_clone)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_zero_mode_zeroes_new_channels():
    _, _, sv = init_params("deit_h2_l2")
    _, _, bv = init_params("deit_h4_l2", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(2,), mode="zero")
    flat_s = jax.tree_util.tree_flatten_with_path(sv["params"])[0]
    flat_g = dict(jax.tree_util.tree_flatten_with_path(grown)[0])
    for path, small in flat_s:
        big = flat_g[tuple(path)]
        sl = tuple(slice(0, s) for s in small.shape)
        np.testing.assert_allclose(np.asarray(big[sl]), np.asarray(small),
                                   rtol=1e-6)
        total, kept = big.size, small.size
        if total > kept:
            mask = np.ones(big.shape, bool)
            mask[sl] = False
            np.testing.assert_allclose(np.asarray(big)[mask], 0.0)


def test_clone_rand_slices_source_keeps_fresh_init():
    """`load_slice_clone_rand` (`prog/helpers.py:183-253`): depth
    interpolation + top-left slice copy; new width channels keep the
    destination's fresh random init."""
    _, _, sv = init_params("deit_h2_l2")
    _, _, bv = init_params("deit_h4_l4", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(4,), mode="clone_rand")
    flat_s = dict(jax.tree_util.tree_flatten_with_path(sv["params"])[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(bv["params"])[0])
    flat_g = dict(jax.tree_util.tree_flatten_with_path(grown)[0])
    from autoprog_tpu.prog.depth import depth_source_index

    def src_path(path):
        # s0b{i} -> s0b{depth_source_index(i, 2, 4)}
        out = []
        for k in path:
            key = getattr(k, "key", "")
            if key.startswith("s0b"):
                i = int(key[3:])
                out.append(type(k)(f"s0b{depth_source_index(i, 2, 4)}"))
            else:
                out.append(k)
        return tuple(out)

    checked_new = 0
    for path, big in flat_g.items():
        small = flat_s[src_path(path)]
        sl = tuple(slice(0, s) for s in small.shape)
        # source channels preserved in the top-left corner
        np.testing.assert_allclose(np.asarray(big[sl]), np.asarray(small),
                                   rtol=1e-6)
        if big.size > small.size:
            mask = np.ones(big.shape, bool)
            mask[sl] = False
            new_part = np.asarray(big)[mask]
            tmpl_part = np.asarray(flat_b[path])[mask]
            # new channels are the fresh init (rand), not zeros/clones
            np.testing.assert_allclose(new_part, tmpl_part, rtol=1e-6)
            checked_new += 1
    assert checked_new > 0


def test_slice_mode_no_depth_interpolation():
    """`load_slice` (`prog/helpers.py:121-181`) matches by name only:
    depth-new layers keep their fresh init entirely."""
    _, _, sv = init_params("deit_h2_l2")
    _, _, bv = init_params("deit_h2_l4", seed=1)
    grown = grow_params(sv["params"], bv["params"], src_layers=(2,),
                        dst_layers=(4,), mode="slice")
    flat_b = dict(jax.tree_util.tree_flatten_with_path(bv["params"])[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(sv["params"])[0])
    flat_g = dict(jax.tree_util.tree_flatten_with_path(grown)[0])
    for path, big in flat_g.items():
        keys = [getattr(k, "key", "") for k in path]
        blk = next((k for k in keys if k.startswith("s0b")), None)
        if blk is not None and int(blk[3:]) >= 2:
            # layer index beyond the source depth: untouched fresh init
            np.testing.assert_allclose(np.asarray(big),
                                       np.asarray(flat_b[path]), rtol=1e-6)
        elif path in flat_s:
            small = flat_s[path]
            sl = tuple(slice(0, s) for s in small.shape)
            np.testing.assert_allclose(np.asarray(big[sl]),
                                       np.asarray(small), rtol=1e-6)


def test_super_shrink_equals_masked_supernet():
    """`load_super` contract (SURVEY §4.3): standalone model built from
    supernet weights == supernet with the matching keep-mask."""
    _, super_model, supv = init_params("volo_h2_l4")
    _, small_model, smv = init_params("volo_h2_l3", seed=1)
    sl4 = (volo_depth_split(4)[0], volo_depth_split(4)[1], 0, 0)
    sl3 = (volo_depth_split(3)[0], volo_depth_split(3)[1], 0, 0)
    shrunk = shrink_params(supv["params"], smv["params"],
                           base_layers=sl3, super_layers=sl4,
                           dst_layers=sl3, base_l=3, super_l=4, dst_l=3)
    stats = grow_batch_stats(supv.get("batch_stats", {}),
                             smv.get("batch_stats", {}), src_layers=sl4,
                             dst_layers=sl3)
    keep = elastic_keep_masks(3, 3, 4)
    y_super = super_model.apply(supv, x_input(), train=False, keep=keep)
    y_small = small_model.apply({"params": shrunk, "batch_stats": stats},
                                x_input(), train=False)
    np.testing.assert_allclose(np.asarray(y_super), np.asarray(y_small),
                               rtol=2e-4, atol=2e-5)


def test_grown_trees_never_alias_buffers():
    """Donation safety (round-5 on-chip postmortem): depth cloning maps
    several destination layers to one source and `x.astype(x.dtype)`
    returns the SAME array object, so without dedup the train step would
    donate one buffer twice -> INVALID_ARGUMENT on TPU (CPU doesn't
    enforce donation, hence this structural assert). Must hold even where
    `unsafe_buffer_pointer` is unavailable (the axon PJRT backend raises
    UNIMPLEMENTED — exactly the environment that crashed rounds 4/5)."""
    from autoprog_tpu.prog.growth import _dedupe_buffers

    mdef, _, v = init_params("deit_h2_l2")
    grown_template = init_params("deit_h2_l4")[2]["params"]
    grown = grow_params(v["params"], grown_template,
                        src_layers=(2,), dst_layers=(4,), mode="clone")
    leaves = jax.tree_util.tree_leaves(grown)
    ids = [id(x) for x in leaves]
    assert len(ids) == len(set(ids)), "grown tree has aliased leaves"

    # direct unit check of the dedupe with a pointer API that raises
    class NoPtr:
        """array stand-in whose buffer-pointer API is unimplemented"""
        def __init__(self, arr):
            self.arr = arr
            self.dtype = arr.dtype

        def unsafe_buffer_pointer(self):
            raise NotImplementedError("UNIMPLEMENTED (axon)")

        def __array__(self, dtype=None, copy=None):
            return np.asarray(self.arr, dtype=dtype)

    shared = NoPtr(jnp.ones((4,)))
    flat = {("a",): shared, ("b",): shared, ("c",): NoPtr(jnp.zeros((4,)))}
    out = _dedupe_buffers(flat)
    assert out[("b",)] is not out[("a",)]
    assert out[("c",)] is flat[("c",)]  # non-duplicates pass through
