#!/usr/bin/env python
"""Component-level timing of the volo_d1 train step (perf tool).

Decomposes the full fused train step (fwd+bwd+AdamW+4xEMA) by elastic
keep-mask ablation and by phase (fwd-only vs fwd+bwd vs optimizer-only),
using the same fori_loop+D2H timing as bench.py (see PERF.md for why).

Usage: python scripts/bench_parts.py [batch]
Prints a table to stderr; safe to run on the tunneled chip (single
process, never killed mid-run).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import time_step

    from autoprog_tpu.losses import build_train_loss
    from autoprog_tpu.registry import create_model
    from autoprog_tpu.train.optim import create_optimizer, apply_lr
    from autoprog_tpu.train.state import TrainState
    from autoprog_tpu.train.steps import StepBuilder

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (128 if on_tpu else 8)
    iters = 20 if on_tpu else 2
    args = argparse.Namespace(
        opt="adamw", opt_eps=None, opt_betas=None, momentum=0.9,
        weight_decay=0.05, clip_grad=None, clip_mode="norm",
        token_label=True, token_label_data="synthetic", token_label_size=14,
        dense_weight=0.5, cls_weight=1.0, ground_truth=False, smoothing=0.1)

    mdef = create_model("volo_h12_l18")
    model = mdef.make(num_classes=1000, img_size=224, dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mixtoken": jax.random.PRNGKey(2)},
        jnp.zeros((1, 224, 224, 3)), train=True))()
    ema_decays = (0.998, 0.9986, 0.999, 0.9996)
    tx = create_optimizer(args, variables["params"])
    sb = StepBuilder(model=model, tx=tx, train_loss=build_train_loss(args),
                     ema_decays=ema_decays, num_classes=1000,
                     token_label=True, has_token_label_data=True)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx,
                              ema_decays=ema_decays)
    rs = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(rs.randn(batch, 224, 224, 3), jnp.bfloat16),
        "label": jnp.asarray(rs.randint(0, 1000, batch), jnp.int32),
        "label_scores": jnp.asarray(rs.rand(batch, 5, 14, 14), jnp.float32),
        "label_inds": jnp.asarray(rs.randint(0, 1000, (batch, 5, 14, 14)),
                                  jnp.int32),
    }
    rng = jax.random.PRNGKey(0)
    L0, L1 = model.layers[0], model.layers[1]

    def report(name, t):
        print(f"{name:<34s} {t * 1e3:8.2f} ms  {batch / t:7.0f} img/s",
              file=sys.stderr)

    rows = {}

    def run_train(name, keep):
        nonlocal state
        step = sb.train_step(r=224, keep=keep, splits=1)
        t, state = time_step(step, state, data, 1.6e-3, rng, iters=iters)
        rows[name] = t
        report(name, t)

    run_train("full step", None)
    run_train("no outlookers", (tuple([False] * L0), tuple([True] * L1)))
    run_train("no transformers", (tuple([True] * L0), tuple([False] * L1)))
    run_train("stem+post+heads+opt only",
              (tuple([False] * L0), tuple([False] * L1)))

    if "--loss-bisect" in sys.argv:
        # how much of the stem+post block is the dense token-label loss?
        args_cls = argparse.Namespace(**{**vars(args), "token_label": False})
        model_cls = mdef.make(num_classes=1000, img_size=224,
                              dtype=jnp.bfloat16, return_dense=False,
                              mix_token=False)
        vars_cls = jax.jit(lambda: model_cls.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 224, 224, 3)), train=True))()
        tx_cls = create_optimizer(args_cls, vars_cls["params"])
        sb_cls = StepBuilder(model=model_cls, tx=tx_cls,
                             train_loss=build_train_loss(args_cls),
                             ema_decays=ema_decays, num_classes=1000,
                             token_label=False, has_token_label_data=False)
        state_cls = TrainState.create(
            params=vars_cls["params"],
            batch_stats=vars_cls["batch_stats"], tx=tx_cls,
            ema_decays=ema_decays)
        for name, keep in (
                ("cls-only full step", None),
                ("cls-only stem+post+heads+opt",
                 (tuple([False] * L0), tuple([False] * L1)))):
            step = sb_cls.train_step(r=224, keep=keep, splits=1)
            t, state_cls = time_step(step, state_cls, data, 1.6e-3, rng,
                                     iters=iters)
            report(name, t)

    # optimizer + EMA, isolated: update with grads == params
    @jax.jit
    def opt_only(state, lr):
        grads = state.params
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = __import__("optax").apply_updates(
            state.params, apply_lr(updates, lr))
        ema = tuple(
            jax.tree.map(lambda e, p, d=d: e * d + p.astype(e.dtype) * (1 - d),
                         et, params)
            for d, et in zip(ema_decays, state.ema_params))
        return state.replace(params=params, opt_state=opt_state,
                             ema_params=ema)

    @jax.jit
    def opt_loop(state, lr):
        return jax.lax.fori_loop(0, iters, lambda i, s: opt_only(s, lr), state)

    s2 = opt_loop(state, 1.6e-3)
    float(jax.tree.leaves(s2.params)[0].sum())
    t0 = time.perf_counter()
    s2 = opt_loop(state, 1.6e-3)
    float(jax.tree.leaves(s2.params)[0].sum())
    t_opt = (time.perf_counter() - t0) / iters
    rows["optimizer+4xEMA only"] = t_opt
    report("optimizer+4xEMA only", t_opt)

    # fwd-only (eval-mode) full model
    ev = sb.eval_step()

    def perturb(batch, acc):
        # thread acc into the input so the loop body can't be hoisted out
        # as loop-invariant (XLA LICM would time a single eval); cast to
        # the image dtype so the perturbation doesn't promote the whole
        # model input to f32
        img = batch["image"]
        return dict(batch, image=img + (acc * 1e-30).astype(img.dtype))

    @jax.jit
    def ev_loop(params, stats, batch):
        def body(i, acc):
            return ev(params, stats, perturb(batch, acc))["loss_sum"]
        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = ev_loop(state.params, state.batch_stats, data)
    float(r)
    t0 = time.perf_counter()
    float(ev_loop(state.params, state.batch_stats, data))
    t_ev = (time.perf_counter() - t0) / iters
    rows["eval fwd (full)"] = t_ev
    report("eval fwd (full)", t_ev)

    # model fwd only, no metrics (isolates the top_k / metric cost)
    @jax.jit
    def fwd_loop(params, stats, batch):
        def body(i, acc):
            b = perturb(batch, acc)
            logits = model.apply(
                {"params": params, "batch_stats": stats}, b["image"],
                train=False)
            return jnp.sum(logits.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(fwd_loop(state.params, state.batch_stats, data))
    t0 = time.perf_counter()
    float(fwd_loop(state.params, state.batch_stats, data))
    t_fwd = (time.perf_counter() - t0) / iters
    rows["model fwd only"] = t_fwd
    report("model fwd only", t_fwd)

    full = rows["full step"]
    print("\nderived:", file=sys.stderr)
    print(f"  outlooker stage (fwd+bwd): "
          f"{(full - rows['no outlookers']) * 1e3:.2f} ms", file=sys.stderr)
    print(f"  transformer stage (fwd+bwd): "
          f"{(full - rows['no transformers']) * 1e3:.2f} ms", file=sys.stderr)
    print(f"  stem/post/heads/loss + opt: "
          f"{rows['stem+post+heads+opt only'] * 1e3:.2f} ms "
          f"(opt+EMA alone {t_opt * 1e3:.2f} ms)", file=sys.stderr)


if __name__ == "__main__":
    main()
