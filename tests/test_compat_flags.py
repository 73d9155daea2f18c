"""Compat-flag semantics: every accepted flag must act, alias, or
hard-error — never silently change nothing while looking live
(VERDICT r4 weak #7; reference CLI surface: `main_prog.py:77-314`)."""

import jax.numpy as jnp
import pytest

from autoprog_tpu.config import parse_args


def test_pretrained_hard_errors():
    # no weight zoo is reachable offline; accepting --pretrained and
    # training from scratch would silently betray the launch script
    with pytest.raises(SystemExit):
        parse_args(["synthetic://", "--pretrained"])


def test_drop_connect_aliases_drop_path():
    with pytest.warns(UserWarning, match="deprecated alias"):
        args, _ = parse_args(["synthetic://", "--drop-connect", "0.2"])
    assert args.drop_path == 0.2


def test_drop_connect_loses_to_explicit_drop_path():
    with pytest.warns(UserWarning, match="ignored"):
        args, _ = parse_args(["synthetic://", "--drop-connect", "0.2",
                              "--drop-path", "0.1"])
    assert args.drop_path == 0.1


def test_dist_bn_validates_choices():
    with pytest.raises(SystemExit):
        parse_args(["synthetic://", "--dist-bn", "bogus"])
    args, _ = parse_args(["synthetic://", "--dist-bn", "reduce"])
    assert args.dist_bn == "reduce"


def test_bn_knobs_reach_the_stem():
    """--bn-momentum (torch convention) / --bn-eps land on the VOLO stem
    BatchNorm via model_kwargs -> factory.make (flax momentum is the
    complement of torch's)."""
    from autoprog_tpu.engine import model_kwargs
    from autoprog_tpu.registry import create_model

    args, _ = parse_args(["synthetic://", "--model", "volo_h2_l2",
                          "--bn-momentum", "0.1", "--bn-eps", "1e-3"])
    kw = model_kwargs(args, 0.0, jnp.float32)
    assert kw["bn_momentum"] == pytest.approx(0.9)
    assert kw["bn_eps"] == pytest.approx(1e-3)
    model = create_model("volo_h2_l2").make(**kw)
    assert model.bn_momentum == pytest.approx(0.9)
    assert model.bn_eps == pytest.approx(1e-3)

    # unset -> model defaults, and DeiT (no BN) ignores the knobs
    args, _ = parse_args(["synthetic://"])
    kw = model_kwargs(args, 0.0, jnp.float32)
    assert "bn_momentum" not in kw and "bn_eps" not in kw
    create_model("deit_h2_l2").make(
        **model_kwargs(args, 0.0, jnp.float32))


def test_initial_checkpoint_is_consumed(tmp_path):
    """--initial-checkpoint must reach the weight loader: a missing path
    raises instead of being silently ignored (pre-fix behavior)."""
    from autoprog_tpu.main import main
    with pytest.raises(Exception):
        main(["synthetic://", "--model", "deit_h2_l2", "--num-classes",
              "4", "--img-size", "32", "-b", "8", "--epochs", "1",
              "--workers", "0", "--fake-data-size", "16", "--no-bf16",
              "--initial-checkpoint", str(tmp_path / "missing.ckpt"),
              "--output", str(tmp_path / "out")])


def test_initial_checkpoint_loads_exact_weights(tmp_path):
    """Same-shape leaves load exactly (timm load-at-create semantics)."""
    import jax
    import numpy as np
    from flax import serialization
    from autoprog_tpu.finetune import load_pretrained_weights
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.checkpoint import save_checkpoint_file

    m = create_model("deit_h2_l2").make(num_classes=4, img_size=32,
                                        dtype=jnp.float32)
    sv = m.init({"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 32, 32, 3)), train=False)["params"]
    ckpt = str(tmp_path / "init.ckpt")
    save_checkpoint_file(ckpt, {"state_dict": serialization.to_state_dict(
        jax.tree.map(np.asarray, sv))})
    dv = m.init({"params": jax.random.PRNGKey(7)},
                jnp.zeros((1, 32, 32, 3)), train=False)["params"]
    out = load_pretrained_weights(dv, ckpt, num_classes=4)
    np.testing.assert_allclose(
        np.asarray(out["head"]["kernel"]), np.asarray(sv["head"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(out["s0b0"]["attn"]["qkv"]["kernel"]),
        np.asarray(sv["s0b0"]["attn"]["qkv"]["kernel"]))
