"""Golden tests for the progressive schedule (SURVEY §4.1).

Expected values are hand-derived from the reference formulas
(`prog/progressive.py:4-40`) for the shipped flagship flag set
(`scripts/train_autoprog.sh`).
"""

from autoprog_tpu.prog import (
    get_divisor,
    make_divisible,
    no_repeats,
    progressive_schedule,
)


def flagship_schedule():
    return progressive_schedule(
        num_stages=4, epochs=100, r_max=224, h_max=12, l_max=18,
        r_scale=0.5, h_scale=1.0, l_scale=0.5, aa_scale=0.5,
        dp_scale=0.0, re_scale=0.0, resize_scale=(1.0, 1.0),
        aa_max="rand-m9-mstd0.5-inc1", dp_max=0.1, re_max=0.25,
        resize_max=(0.08, 1.0),
    )


def test_flagship_golden():
    s = flagship_schedule()
    assert s.grow_epochs == (0, 25, 50, 75)
    assert s.resolutions == (128, 160, 192, 224)
    assert s.heads == (12, 12, 12, 12)
    assert s.layers == (9, 12, 15, 18)
    assert s.rand_aug == ("rand-m4-mstd0.5-inc1", "rand-m6-mstd0.5-inc1",
                          "rand-m7-mstd0.5-inc1", "rand-m9-mstd0.5-inc1")
    assert [round(x, 4) for x in s.drop_path] == [0.0, 0.0333, 0.0667, 0.1]
    assert [round(x, 4) for x in s.random_erase] == [0.0, 0.0833, 0.1667, 0.25]
    assert all(r[1] == 1.0 for r in s.crop_scale)


def test_zero_aa_disables_policy():
    s = progressive_schedule(
        num_stages=4, epochs=100, aa_scale=0.0, aa_max="rand-m9-mstd0.5-inc1")
    assert s.rand_aug[0] == ""  # magnitude rounds to 0 at stage 0... m=0?
    # linspace(0,1,4)[0] * 9 = 0 -> '' (augment disabled early)


def test_stage_at_epoch():
    s = flagship_schedule()
    assert s.stage_at_epoch(0) == 0
    assert s.stage_at_epoch(24) == 0
    assert s.stage_at_epoch(25) == 1
    assert s.stage_at_epoch(99) == 3


def test_make_divisible():
    assert make_divisible(112, 32) == 128
    assert make_divisible(149.333, 32) == 160
    assert make_divisible(186.667, 32) == 192
    assert make_divisible(224, 32) == 224
    assert make_divisible(9.0, 1) == 9
    # 10% floor guard: rounding down by >10% bumps up one step
    assert make_divisible(15, 8) == 16
    assert make_divisible(4.14, 2) == 4


def test_get_divisor():
    # smallest divisor of `number` greater than number*factor
    assert get_divisor(8, 0.5) == 8
    assert get_divisor(8, 0.4) == 4
    assert get_divisor(8, 0.1) == 1
    assert get_divisor(1, 0.2) == 1
    assert get_divisor(6, 0.4) == 3


def test_no_repeats():
    assert no_repeats([128, 128, 160, 224, 160]) == [128, 160, 224]
