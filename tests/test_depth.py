"""Depth-interpolation invariants (SURVEY §4.1)."""

import pytest

from autoprog_tpu.prog.depth import (
    elastic_keep_masks,
    get_new_layer_idx,
    new_idx,
    super_select_indices,
    volo_depth_split,
)


@pytest.mark.parametrize("prev_l,new_l", [(2, 4), (3, 5), (9, 18), (7, 9),
                                          (4, 4), (2, 3), (10, 15), (15, 18)])
def test_new_idx_properties(prev_l, new_l):
    src = [new_idx(i, prev_l, new_l) for i in range(new_l)]
    # monotone non-decreasing
    assert all(a <= b for a, b in zip(src, src[1:]))
    # surjective onto the prev layers
    assert sorted(set(src)) == list(range(prev_l))
    # exactly new_l - prev_l "new" (repeated-source) layers
    assert len(get_new_layer_idx(prev_l, new_l)) == new_l - prev_l


def test_volo_depth_split():
    assert volo_depth_split(18) == (4, 14)
    assert volo_depth_split(15) == (4, 11)
    assert volo_depth_split(12) == (4, 8)
    assert volo_depth_split(9) == (2, 7)
    assert volo_depth_split(2) == (1, 1)


@pytest.mark.parametrize("l", [15, 16, 17, 18])
def test_elastic_keep_mask_counts(l):
    k0, k1 = elastic_keep_masks(l, min_layer_num=15, max_layer_num=18)
    l0 = volo_depth_split(l)[0]
    l0_max, l1_max = volo_depth_split(18)
    assert len(k0) == l0_max and len(k1) == l1_max
    assert sum(k0) == l0
    assert sum(k1) == l - l0


def test_elastic_full_depth_keeps_all():
    k0, k1 = elastic_keep_masks(18, 15, 18)
    assert all(k0) and all(k1)


def test_super_select_matches_keep_mask():
    """`load_super` shrink selection == complement of the supernet's skip
    set at the same depth (elasticity-equivalence contract, SURVEY §4.3)."""
    base_l, super_l = 15, 18
    for target_l in (15, 16, 17):
        idx0, idx1 = super_select_indices(base_l, super_l, target_l)
        k0, k1 = elastic_keep_masks(target_l, base_l, super_l)
        assert idx0 == [i for i, k in enumerate(k0) if k]
        assert idx1 == [i for i, k in enumerate(k1) if k]
