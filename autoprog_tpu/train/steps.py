"""Jitted train / eval / probe steps.

The hot loop (reference `train_one_epoch`, `main_prog.py:933-1095`)
becomes a single donated, jitted SPMD step per static configuration
(resolution r, elastic keep-mask, grad-accum splits):

  * on-device bilinear resize of the input batch to the stage resolution
    (replaces the per-batch `F.interpolate` at `main_prog.py:973`);
  * soft/token-label target construction on device
    (`create_token_label_target`, SURVEY §2.2);
  * gradient accumulation as a `lax.scan` over micro-batches inside the
    step (replaces the `batch_splits` Python loop + `update=` flag at
    `main_prog.py:971,1019-1030`) — one optimizer update per call;
  * EMA updates for every decay fused into the same program
    (`main_prog.py:1030-1033`);
  * the gradient all-reduce over the data axis is emitted by XLA from the
    batch sharding — no DDP, no explicit collectives.

Each distinct (r, keep, splits) is its own XLA program, cached here; the
candidate space is tiny (SURVEY §7.3.1) and programs are compiled lazily
(or ahead-of-time via `warmup`).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from autoprog_tpu.ops.erase import normalize_uint8, random_erase
from autoprog_tpu.ops.interpolate import resize_bilinear
from autoprog_tpu.train.optim import apply_lr
from autoprog_tpu.train.state import TrainState
from autoprog_tpu.data.token_label import build_token_label_target, smooth_one_hot


def _sync_compiled(fn, tag: str):
    """Multi-process wrapper: AOT-compile on first call, rendezvous all
    processes (compile_barrier) before the first dispatch, then reuse
    the Compiled executable. Absorbs cross-process compile skew that
    otherwise trips XLA:CPU Gloo's ~30 s context-init timeout on the
    program's first collective (see parallel/mesh.py:compile_barrier).
    Single-process: returns `fn` unchanged."""
    if jax.process_count() <= 1:
        return fn
    import hashlib

    from autoprog_tpu.parallel.mesh import compile_barrier
    compiled: Dict = {}    # aval signature -> Compiled executable
    last: Dict = {}        # fast path: the most recently used signature

    def _sig(args):
        leaves = jax.tree_util.tree_leaves(args)
        return tuple((tuple(getattr(x, "shape", ())),
                      str(getattr(x, "dtype", type(x).__name__)))
                     for x in leaves)

    def _compile_for(args, sig):
        # every new signature compiles + rendezvouses BEFORE dispatch —
        # dispatching an uncompiled program in multi-process mode
        # re-exposes the Gloo ~30 s context-init skew deadlock the
        # barrier exists to prevent. The barrier id must be identical
        # across processes: derive it from the (lockstep) signature with
        # a stable digest, not hash() (randomized per process).
        digest = hashlib.sha1(repr(sig).encode()).hexdigest()[:12]
        compiled[sig] = fn.lower(*args).compile()
        compile_barrier(f"{tag}:{digest}")
        return compiled[sig]

    def warmup(args):
        sig = _sig(args)
        if sig not in compiled:
            last["sig"] = sig
            _compile_for(args, sig)

    def wrapper(*args):
        sig = last.get("sig")
        if sig is not None:
            try:
                return compiled[sig](*args)
            except (TypeError, ValueError):
                pass  # signature changed: recheck below
        sig = _sig(args)
        last["sig"] = sig
        if sig not in compiled:
            _compile_for(args, sig)
        return compiled[sig](*args)

    wrapper.warmup = warmup
    return wrapper


def _ce_logits_int(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def metrics_from_logits(logits, labels):
    """loss/top1/top5 sums over a batch; label < 0 marks padding rows
    (pad_eval_batch) and masks out of every reduction."""
    valid = labels >= 0
    loss = _ce_logits_int(logits, jnp.maximum(labels, 0))
    top1 = (jnp.argmax(logits, -1) == labels) & valid
    k5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))[1]
    top5 = jnp.any(k5 == labels[:, None], axis=-1) & valid
    return {"loss_sum": jnp.where(valid, loss, 0.0).sum(),
            "top1_sum": top1.sum().astype(jnp.float32),
            "top5_sum": top5.sum().astype(jnp.float32),
            "count": valid.sum().astype(jnp.float32)}


class StepBuilder:
    """Factory + cache of compiled steps for one model/optimizer pairing."""

    def __init__(self, *, model, tx: optax.GradientTransformation,
                 train_loss: Callable, ema_decays: Tuple[float, ...] = (),
                 num_classes: int = 1000, smoothing: float = 0.1,
                 token_label: bool = False, has_token_label_data: bool = False,
                 mesh=None, donate: bool = True,
                 norm_mean=(0.485, 0.456, 0.406),
                 norm_std=(0.229, 0.224, 0.225), re_count: int = 1,
                 ema_dtype=None):
        self.model = model
        self.tx = tx
        self.train_loss = train_loss
        self.ema_decays = tuple(ema_decays)
        self.num_classes = num_classes
        self.smoothing = smoothing
        self.token_label = token_label
        self.has_token_label_data = has_token_label_data
        self.mesh = mesh
        self.donate = donate
        self.norm_mean = tuple(norm_mean)
        self.norm_std = tuple(norm_std)
        self.re_count = re_count
        self.ema_dtype = ema_dtype
        self._train_cache: Dict = {}
        self._eval_cache: Dict = {}
        self._logits_eval_cache: Dict = {}
        self._probe_cache: Dict = {}
        self._tput_cache: Dict = {}
        self._tput_chain_cache: Dict = {}

    # ---------------- target construction (in-jit) ----------------------

    def _build_target(self, batch, r: int):
        """Device-side target prep, mirroring `main_prog.py:976-1004`."""
        if getattr(self.train_loss, "wants_int_labels", False):
            return batch["label"]
        if "soft_target" in batch:
            return batch["soft_target"]
        if self.token_label and self.has_token_label_data and "label_scores" in batch:
            import os
            if os.environ.get("AUTOPROG_SPARSE_TL", "0") == "1" and \
                    getattr(self.train_loss, "supports_sparse_tl", False):
                # sparse top-K targets: the token-label losses gather K'
                # log-probs per token instead of contracting a dense
                # [B, C, 2+N] map (data/token_label.py; A/B knob, PERF r5)
                from autoprog_tpu.data.token_label import \
                    sparse_token_label_target
                return sparse_token_label_target(
                    batch["label"], batch["label_scores"],
                    batch["label_inds"], num_classes=self.num_classes,
                    smoothing=self.smoothing, label_size=r // 16,
                    gt_soft=batch.get("gt_soft"))
            return build_token_label_target(
                batch["label"], batch["label_scores"], batch["label_inds"],
                num_classes=self.num_classes, smoothing=self.smoothing,
                label_size=r // 16, gt_soft=batch.get("gt_soft"))
        return smooth_one_hot(batch["label"], self.num_classes, self.smoothing)

    def _prep_images(self, images, rng=None, re_prob: float = 0.0):
        """uint8 batches normalize (+ random-erase when training) on
        device — the uint8 pipeline moves 4x less data to the chip."""
        if images.dtype == jnp.uint8:
            images = normalize_uint8(images, self.norm_mean, self.norm_std,
                                     jnp.float32)
            if rng is not None and re_prob > 0:
                images = random_erase(images, jax.random.fold_in(rng, 3),
                                      prob=re_prob, count=self.re_count)
        return images

    def _apply_train(self, params, batch_stats, images, rng, keep):
        rngs = {"dropout": jax.random.fold_in(rng, 1),
                "mixtoken": jax.random.fold_in(rng, 2)}
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out = self.model.apply(variables, images, train=True,
                               keep=keep, rngs=rngs, mutable=mutable)
        if mutable:
            out, mutated = out
            return out, mutated["batch_stats"]
        return out, batch_stats

    # ---------------- train ---------------------------------------------

    def train_step(self, *, r: int, keep=None, splits: int = 1,
                   re_prob: float = 0.0):
        key = (r, keep, splits, re_prob)
        if key not in self._train_cache:
            self._train_cache[key] = _sync_compiled(
                self._make_train_step(r, keep, splits, re_prob),
                f"train:{key}")
        return self._train_cache[key]

    def warmup_train_step(self, *, r: int, keep=None, splits: int = 1,
                          re_prob: float = 0.0, example):
        """AOT-compile the step for `example` args without executing it.

        `jit.lower(...).compile()` consumes no donated buffers and builds
        no throwaway states, so precompiling every search candidate at
        supernet-epoch start costs zero extra device memory (the executing
        warmup needed a full TrainState copy per candidate — 2x state
        memory with the largest model live). The compiled handle replaces
        the cache entry; later `train_step` calls return it directly."""
        key = (r, keep, splits, re_prob)
        fn = self.train_step(r=r, keep=keep, splits=splits, re_prob=re_prob)
        if hasattr(fn, "warmup"):  # multi-process sync wrapper
            fn.warmup(example)
        elif hasattr(fn, "lower"):  # still the traceable jit, not Compiled
            self._train_cache[key] = fn.lower(*example).compile()
        return self._train_cache[key]

    def _make_train_step(self, r: int, keep, splits: int,
                         re_prob: float = 0.0):
        def micro_loss(params, batch_stats, images, target, rng):
            images = self._prep_images(images, rng, re_prob)
            images = resize_bilinear(images, r)
            out, new_stats = self._apply_train(params, batch_stats, images, rng, keep)
            loss = self.train_loss(out, target)
            return loss, new_stats

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def step(state: TrainState, batch, lr, rng):
            rng = jax.random.fold_in(rng, state.step)
            images, target = batch["image"], self._build_target(batch, r)

            if splits == 1:
                (loss, new_stats), grads = grad_fn(
                    state.params, state.batch_stats, images, target, rng)
            else:
                def re(x):
                    return x.reshape(splits, x.shape[0] // splits, *x.shape[1:])
                mb = (re(images), jax.tree.map(re, target))

                def body(carry, xs):
                    g_acc, stats, loss_acc, i = carry
                    im, tg = xs
                    (l, stats), g = grad_fn(state.params, stats, im, tg,
                                            jax.random.fold_in(rng, i))
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                    return (g_acc, stats, loss_acc + l, i + 1), None

                g0 = jax.tree.map(jnp.zeros_like, state.params)
                (grads, new_stats, loss_sum, _), _ = jax.lax.scan(
                    body, (g0, state.batch_stats, 0.0, 0), mb)
                grads = jax.tree.map(lambda g: g / splits, grads)
                loss = loss_sum / splits

            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, apply_lr(updates, lr))
            if self.ema_dtype == jnp.bfloat16:
                # bf16-stored EMA: accumulate in f32, store back with
                # stochastic rounding — deterministic round-to-nearest
                # freezes the EMA because (1-d)*(p-e) is below bf16 ulp
                # (ops/rounding.py). Halves the EMA sweeps' HBM traffic.
                from autoprog_tpu.ops.rounding import cast_tree_bf16_sr
                ema = tuple(
                    cast_tree_bf16_sr(
                        jax.tree.map(
                            lambda e, p, d=d: e.astype(jnp.float32) * d
                            + p.astype(jnp.float32) * (1 - d),
                            et, params),
                        jax.random.fold_in(rng, 100 + j))
                    for j, (d, et) in enumerate(
                        zip(self.ema_decays, state.ema_params)))
            else:
                ema = tuple(
                    jax.tree.map(
                        lambda e, p, d=d: e * d + p.astype(e.dtype) * (1 - d),
                        et, params)
                    for d, et in zip(self.ema_decays, state.ema_params))
            new_state = state.replace(step=state.step + 1, params=params,
                                      batch_stats=new_stats,
                                      opt_state=opt_state, ema_params=ema)
            return new_state, {"loss": loss}

        donate = (0,) if self.donate else ()
        return jax.jit(step, donate_argnums=donate)

    # ---------------- eval ----------------------------------------------

    def eval_step(self, *, keep=None):
        if keep not in self._eval_cache:
            self._eval_cache[keep] = _sync_compiled(
                self._make_eval_step(keep), f"eval:{keep}")
        return self._eval_cache[keep]

    def _make_eval_step(self, keep):
        def step(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            images = self._prep_images(batch["image"])
            logits = self.model.apply(variables, images, train=False,
                                      keep=keep)
            if isinstance(logits, tuple):
                logits = logits[0]
            return metrics_from_logits(logits, batch["label"])
        return jax.jit(step)

    def logits_eval_step(self, *, tta: int = 1, keep=None):
        """Compiled eval step that also yields per-(group-)sample argmax
        predictions — the single forward shared by metrics, `--tta`
        group-averaging and `--real-labels` prediction (the reference's
        `validate.py:228-238` does all three from one `model(input)`).

        With tta > 1 the batch holds `tta` adjacent views per sample
        (TTADataset): logits are group-mean-reduced before metrics.
        Padding rows (label -1, always trailing) mask out of every
        reduction; with tta > 1 the pad boundary aligns with a group
        boundary because the loader keeps batches a multiple of tta.
        Returns (metrics_dict, preds[int32 per group])."""
        key = (tta, keep)
        if key not in self._logits_eval_cache:
            def step(params, batch_stats, batch):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                images = self._prep_images(batch["image"])
                out = self.model.apply(variables, images, train=False,
                                       keep=keep)
                logits = out[0] if isinstance(out, tuple) else out
                logits = logits.astype(jnp.float32)
                labels = batch["label"]
                if tta > 1:
                    logits = logits.reshape(
                        -1, tta, logits.shape[-1]).mean(axis=1)
                    labels = labels[::tta]
                return metrics_from_logits(logits, labels), \
                    jnp.argmax(logits, -1).astype(jnp.int32)
            self._logits_eval_cache[key] = _sync_compiled(
                jax.jit(step), f"logits_eval:{key}")
        return self._logits_eval_cache[key]

    # ---------------- search probes --------------------------------------

    def loss_probe_step(self, *, r: int, keep=None):
        """Train-mode forward, hard-label CE on the cls logits — the search
        loss probe (`validate_trainset`, `main_prog.py:1175-1243`)."""
        key = (r, keep)
        if key not in self._probe_cache:
            def step(params, batch_stats, batch, rng):
                images = self._prep_images(batch["image"])
                images = resize_bilinear(images, r)
                out, _ = self._apply_train(params, batch_stats, images, rng, keep)
                logits = out[0] if isinstance(out, tuple) else out
                loss = _ce_logits_int(logits, batch["label"])
                return loss.mean()
            self._probe_cache[key] = _sync_compiled(jax.jit(step),
                                                    f"probe:{key}")
        return self._probe_cache[key]

    def throughput_probe_step(self, *, r: int, keep=None):
        """Forward+backward without an optimizer update — the per-candidate
        step-time probe feeding the grow criterion
        (`main_prog.py:1245-1298`, SURVEY §5.1). Time it post-warmup with
        block_until_ready so compile time never skews the criterion
        (SURVEY §7.3.6)."""
        key = (r, keep)
        if key not in self._tput_cache:
            def micro(params, batch_stats, images, target, rng):
                images = self._prep_images(images)
                images = resize_bilinear(images, r)
                out, _ = self._apply_train(params, batch_stats, images, rng, keep)
                return self.train_loss(out, target)

            g = jax.grad(micro)

            def step(params, batch_stats, batch, rng):
                target = self._build_target(batch, r)
                grads = g(params, batch_stats, batch["image"], target, rng)
                # reduce to a tiny output so timing includes the full bwd
                return jax.tree.reduce(
                    jnp.add, jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), grads))
            self._tput_cache[key] = _sync_compiled(jax.jit(step),
                                                   f"tput:{key}")
        return self._tput_cache[key]

    def chained_throughput_probe(self, *, r: int, keep=None, iters: int = 10):
        """`iters` fwd+bwd probe steps chained in ONE jitted fori_loop.

        Per-dispatch host/tunnel latency (3-7 ms on the axon backend) is a
        constant offset on a single timed dispatch — it skews the grow
        criterion's `time^w` against small candidates whose true step is
        the same order as the offset. Chaining amortizes it to noise
        (exactly `bench.py:time_step`'s discipline). The per-iteration
        rng fold-in keeps the body loop-variant so XLA cannot hoist it."""
        key = (r, keep, iters)
        if key not in self._tput_chain_cache:
            def micro(params, batch_stats, images, target, rng):
                images = self._prep_images(images)
                images = resize_bilinear(images, r)
                out, _ = self._apply_train(params, batch_stats, images, rng,
                                           keep)
                return self.train_loss(out, target)

            g = jax.grad(micro)

            def multi(params, batch_stats, batch, rng):
                target = self._build_target(batch, r)

                def body(i, acc):
                    grads = g(params, batch_stats, batch["image"], target,
                              jax.random.fold_in(rng, i))
                    return acc + jax.tree.reduce(
                        jnp.add,
                        jax.tree.map(lambda x: jnp.sum(jnp.abs(x)), grads))

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
            self._tput_chain_cache[key] = _sync_compiled(
                jax.jit(multi), f"tput_chain:{key}")
        return self._tput_chain_cache[key]
