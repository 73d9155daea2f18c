"""A/B the flagship full train step with and without rematerialization.

The round-3 roofline (scripts/bench_roofline.py) showed the volo_h12_l18
b=128 @224 step runs at ~1.1x its HBM-bandwidth floor while its FLOP
floor is 4x lower — i.e. recompute is nearly free, stored-activation
traffic is not. jax.checkpoint on the blocks trades exactly that way.
This measures the trade empirically on the chip for three modes:

  off   - store everything (round-2 default)
  dots  - dots_with_no_batch_dims_saveable: matmul outputs resident,
          elementwise/norm/softmax recomputed
  full  - store only block inputs, recompute the whole block

Usage:  python scripts/bench_remat.py            # on the chip
        JAX_PLATFORMS=cpu python scripts/bench_remat.py --batch 8 --img 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="volo_h12_l18")
    p.add_argument("--batch", type=int, default=0,
                   help="0 = 128 on TPU / 8 on CPU")
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--iters", type=int, default=0)
    p.add_argument("--modes", nargs="+", default=["off", "dots", "full"])
    args = p.parse_args()

    from autoprog_tpu.platform import apply_platform_env
    apply_platform_env()

    import jax
    import jax.numpy as jnp

    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder
    from bench import time_step

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = args.batch or (128 if on_tpu else 8)
    iters = args.iters or (20 if on_tpu else 2)
    img = args.img

    largs = argparse.Namespace(
        opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
        weight_decay=0.05, clip_grad=None, clip_mode="norm",
        token_label=True, token_label_data="synthetic", token_label_size=14,
        dense_weight=0.5, cls_weight=1.0, ground_truth=False, smoothing=0.1)

    mdef = create_model(args.model)
    ema_decays = (0.998, 0.9986, 0.999, 0.9996)

    rs = np.random.RandomState(0)
    tls = max(img // 16, 1)
    data = {
        "image": jnp.asarray(rs.randn(batch, img, img, 3), jnp.bfloat16),
        "label": jnp.asarray(rs.randint(0, 1000, batch), jnp.int32),
        "label_scores": jnp.asarray(rs.rand(batch, 5, tls, tls), jnp.float32),
        "label_inds": jnp.asarray(rs.randint(0, 1000, (batch, 5, tls, tls)),
                                  jnp.int32),
    }
    rng = jax.random.PRNGKey(0)

    results = {}
    state0 = None
    for mode in args.modes:
        model = mdef.make(num_classes=1000, img_size=img,
                          dtype=jnp.bfloat16,
                          remat="" if mode == "off" else mode)
        if state0 is None:
            variables = jax.jit(lambda m=model: m.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1),
                 "mixtoken": jax.random.PRNGKey(2)},
                jnp.zeros((1, img, img, 3)), train=True))()
            tx = create_optimizer(largs, variables["params"])
            state0 = TrainState.create(
                params=variables["params"],
                batch_stats=variables["batch_stats"], tx=tx,
                ema_decays=ema_decays)
        sb = StepBuilder(model=model, tx=tx,
                         train_loss=build_train_loss(largs),
                         ema_decays=ema_decays, num_classes=1000,
                         token_label=True, has_token_label_data=True)
        step = sb.train_step(r=img, splits=1)
        # chain the (donated) state through the modes — params/opt shapes
        # are identical, and keeping a second live copy would add ~750 MB
        t, state0 = time_step(step, state0, data, 1.6e-3, rng, iters=iters)
        results[mode] = t
        print(f"remat={mode:<5s} {t * 1e3:8.2f} ms/step  "
              f"{batch / t:7.1f} img/s", flush=True)

    if "off" in results:
        base = results["off"]
        for mode, t in results.items():
            if mode != "off":
                print(f"{mode} vs off: {base / t:.3f}x")


if __name__ == "__main__":
    main()
