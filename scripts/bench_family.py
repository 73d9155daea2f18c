#!/usr/bin/env python
"""Single-chip train-step bench across the VOLO family (D3/D4/D5).

Capability proof for the big variants: the full AutoProg train step
(fwd+bwd+AdamW+EMA, token-label loss) compiles and runs on ONE v5e chip,
with `--remat` (jax.checkpoint on blocks) buying the D4/D5 fit.
Measured round 2: D3 b=64 368 img/s; D4 b=32 remat 171 img/s;
D5 b=8 remat 94 img/s (295M params; b=16 exceeds the 16 GB HBM —
multi-chip DP/TP is the scale-out path, parallel/).
Reference variants: `/root/reference/models/volo.py:753-821`.
"""
import sys, time
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def run():
    import argparse
    import jax, jax.numpy as jnp
    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder
    from bench import time_step

    args = argparse.Namespace(
        opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
        weight_decay=0.05, clip_grad=None, clip_mode="norm",
        token_label=True, token_label_data="synthetic", token_label_size=14,
        dense_weight=0.5, cls_weight=1.0, ground_truth=False, smoothing=0.1)
    for name, batch, remat in (("volo_d4", 32, True), ("volo_d5", 8, True)):
      try:
        mdef = create_model(name)
        model = mdef.make(num_classes=1000, img_size=224,
                          dtype=jnp.bfloat16, remat=remat)
        variables = jax.jit(lambda m=model: m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "mixtoken": jax.random.PRNGKey(2)},
            jnp.zeros((1, 224, 224, 3)), train=True))()
        nparam = sum(int(np.prod(p.shape))
                     for p in jax.tree.leaves(variables["params"]))
        ema_decays = (0.998,)
        tx = create_optimizer(args, variables["params"])
        sb = StepBuilder(model=model, tx=tx,
                         train_loss=build_train_loss(args),
                         ema_decays=ema_decays, num_classes=1000,
                         token_label=True, has_token_label_data=True)
        state = TrainState.create(params=variables["params"],
                                  batch_stats=variables["batch_stats"],
                                  tx=tx, ema_decays=ema_decays)
        rs = np.random.RandomState(0)
        data = {
            "image": jnp.asarray(rs.randn(batch, 224, 224, 3), jnp.bfloat16),
            "label": jnp.asarray(rs.randint(0, 1000, batch), jnp.int32),
            "label_scores": jnp.asarray(rs.rand(batch, 5, 14, 14),
                                        jnp.float32),
            "label_inds": jnp.asarray(
                rs.randint(0, 1000, (batch, 5, 14, 14)), jnp.int32),
        }
        try:
            step = sb.train_step(r=224, splits=1)
            t, state = time_step(step, state, data, 1.6e-3,
                                 jax.random.PRNGKey(0), iters=10)
            print(f"{name} b={batch} remat={remat} ({nparam/1e6:.0f}M): "
                  f"{t*1e3:.1f} ms/step  {batch/t:.0f} img/s", flush=True)
        except Exception as e:
            print(f"{name} b={batch}: FAILED {type(e).__name__} "
                  f"{str(e)[:800]}", flush=True)
        del state, sb, tx, variables, model
      except Exception as e:
        print(f"{name} b={batch}: FAILED(outer) {type(e).__name__} "
              f"{str(e)[:800]}", flush=True)

run()
