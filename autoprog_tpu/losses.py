"""Loss functions (parity with reference `loss/cross_entropy.py`).

All losses are pure functions of (model outputs, targets); token-label
losses consume the VOLO training triple (x_cls, x_aux, bbox) and
reconstruct the MixToken lambda from the bbox exactly as the reference does
(`loss/cross_entropy.py:149-151`). Cross-entropy accumulates in f32
regardless of the compute dtype.

Target formats:
  * soft targets: [B, C] probability rows;
  * token-label maps: [B, C_slots, N] where slot 0 is the ground-truth row,
    slot 1 the cls soft target and slots 2: the dense per-token targets
    (the tlt layout the reference indexes at `loss/cross_entropy.py:72-79`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _soft_ce(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Mean over batch of sum(-target * log_softmax(logits))
    (`loss/cross_entropy.py:21-36`), with target batch-repeat broadcast."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if target.shape[0] != logits.shape[0]:
        reps = logits.shape[0] // target.shape[0]
        target = jnp.tile(target, (reps, 1))
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-target * logp, axis=-1))


def soft_target_cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    return _soft_ce(logits, target)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Hard-label CE (the reference's validate loss, `main_prog.py:734`)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def _mix_cls_target(target_cls: jax.Array, bbox: jax.Array,
                    num_tokens: int) -> jax.Array:
    """Flip-mix the cls target by the lambda reconstructed from the MixToken
    bbox (`loss/cross_entropy.py:149-151`); identity when the box is empty."""
    area = ((bbox[2] - bbox[0]) * (bbox[3] - bbox[1])).astype(jnp.float32)
    lam = 1.0 - area / float(num_tokens)
    return lam * target_cls + (1.0 - lam) * jnp.flip(target_cls, axis=0)


def _sparse_aux_ce(x_aux: jax.Array, st: dict) -> jax.Array:
    """Aux-token soft CE against the sparse target dict from
    `data/token_label.sparse_token_label_target` — algebraically equal to
    `_soft_ce(x_aux.reshape(-1, C), dense_target)`:

      sum_c -t[c]*logp[c] = -(sum_k vals_k*logp[inds_k] + u*sum_c logp[c])

    Gathers K' log-probs per token instead of materializing the [B*N, C]
    dense target (and its two full-C resize passes) — the HBM cut behind
    AUTOPROG_SPARSE_TL (PERF.md r5)."""
    B, N, C = x_aux.shape
    x = x_aux.reshape(B * N, C).astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    sum_logp = x.sum(-1) - C * lse
    v = st["vals"].reshape(B * N, -1)
    g = jnp.take_along_axis(x, st["inds"].reshape(B * N, -1), axis=-1) \
        - lse[:, None]
    row = (v * g).sum(-1) + st["u"].reshape(B * N) * sum_logp
    return -jnp.mean(row)


def token_label_cross_entropy(outputs, target, *, dense_weight: float = 0.5,
                              cls_weight: float = 1.0) -> jax.Array:
    """TokenLabelCrossEntropy (`loss/cross_entropy.py:112-156`)."""
    x_cls, x_aux, bbox = outputs
    B, N, C = x_aux.shape
    if isinstance(target, dict):
        target_cls = _mix_cls_target(target["cls"], bbox, N)
        return (cls_weight * _soft_ce(x_cls, target_cls)
                + dense_weight * _sparse_aux_ce(x_aux, target))
    if target.ndim == 2:
        target_cls = target
        target_aux = jnp.tile(target[:, None, :], (1, N, 1)).reshape(B * N, C)
    else:
        target_cls = target[:, :, 1]
        target_aux = jnp.swapaxes(target[:, :, 2:], 1, 2).reshape(-1, C)
    target_cls = _mix_cls_target(target_cls, bbox, N)
    loss_cls = _soft_ce(x_cls, target_cls)
    loss_aux = _soft_ce(x_aux.reshape(-1, C), target_aux)
    return cls_weight * loss_cls + dense_weight * loss_aux


def token_label_gt_cross_entropy(outputs, target, *, dense_weight: float = 0.5,
                                 cls_weight: float = 1.0) -> jax.Array:
    """TokenLabelGTCrossEntropy (`loss/cross_entropy.py:39-89`): blends the
    soft cls target with the ground-truth row at 0.9/0.5 confidence
    depending on whether their argmaxes agree."""
    x_cls, x_aux, bbox = outputs
    B, N, C = x_aux.shape
    if isinstance(target, dict):
        ground_truth, target_cls = target["gt"], target["cls"]
        agree = (jnp.argmax(ground_truth, -1) == jnp.argmax(target_cls, -1))
        ratio = (0.9 - 0.4 * agree.astype(jnp.float32))[:, None]
        target_cls = target_cls * ratio + ground_truth * (1.0 - ratio)
        target_cls = _mix_cls_target(target_cls, bbox, N)
        return (cls_weight * _soft_ce(x_cls, target_cls)
                + dense_weight * _sparse_aux_ce(x_aux, target))
    if target.ndim == 2:
        target_cls = target
        target_aux = jnp.tile(target[:, None, :], (1, N, 1)).reshape(B * N, C)
    else:
        ground_truth = target[:, :, 0]
        target_cls = target[:, :, 1]
        agree = (jnp.argmax(ground_truth, -1) == jnp.argmax(target_cls, -1))
        ratio = (0.9 - 0.4 * agree.astype(jnp.float32))[:, None]
        target_cls = target_cls * ratio + ground_truth * (1.0 - ratio)
        target_aux = jnp.swapaxes(target[:, :, 2:], 1, 2).reshape(-1, C)
    target_cls = _mix_cls_target(target_cls, bbox, N)
    loss_cls = _soft_ce(x_cls, target_cls)
    loss_aux = _soft_ce(x_aux.reshape(-1, C), target_aux)
    return cls_weight * loss_cls + dense_weight * loss_aux


def token_label_soft_target_cross_entropy(logits, target) -> jax.Array:
    """TokenLabelSoftTargetCrossEntropy (`loss/cross_entropy.py:92-109`):
    plain soft CE that accepts relabel-style [B, N, 2] targets."""
    if target.ndim == 3 and target.shape[-1] == 2:
        target = target[:, :, 1]
    return _soft_ce(logits, target)


def jsd_cross_entropy(logits, labels, *, num_splits: int = 3,
                      alpha: float = 12.0, smoothing: float = 0.1,
                      num_classes: int | None = None) -> jax.Array:
    """JSD consistency loss for AugMix-style aug splits (timm
    JsdCrossEntropy, used via `--jsd` + `--aug-splits` at
    `main.py:760-765` in the reference): hard CE on the clean split +
    alpha * mean KL(p_i || M) with M the mean softmax across splits."""
    logits = logits.astype(jnp.float32)
    C = num_classes or logits.shape[-1]
    chunks = jnp.split(logits, num_splits, axis=0)
    off = smoothing / C
    on = 1.0 - smoothing + off
    target = jax.nn.one_hot(labels, C) * (on - off) + off
    clean_ce = jnp.mean(jnp.sum(-target * jax.nn.log_softmax(chunks[0]), -1))
    probs = [jax.nn.softmax(c, -1) for c in chunks]
    mixture = jnp.clip(sum(probs) / num_splits, 1e-7, 1.0)
    log_m = jnp.log(mixture)
    kl = sum(jnp.sum(p * (jnp.log(jnp.clip(p, 1e-7, 1.0)) - log_m), -1)
             for p in probs) / num_splits
    return clean_ce + alpha * jnp.mean(kl)


def build_train_loss(args):
    """Pick the training loss from flags (`main_prog.py:712-733`;
    JSD branch from `main.py` aug-splits support)."""
    if getattr(args, "jsd", False) and getattr(args, "aug_splits", 0) > 1:
        ns = args.aug_splits
        sm = args.smoothing
        nc = args.num_classes

        def jsd_loss(out, batch_or_labels):
            logits = out[0] if isinstance(out, tuple) else out
            return jsd_cross_entropy(logits, batch_or_labels,
                                     num_splits=ns, smoothing=sm,
                                     num_classes=nc)
        jsd_loss.wants_int_labels = True
        return jsd_loss
    if args.token_label:
        if args.token_label_size == 1:
            return lambda out, tgt: token_label_soft_target_cross_entropy(
                out[0] if isinstance(out, tuple) else out, tgt)
        fn = token_label_gt_cross_entropy if args.ground_truth else token_label_cross_entropy
        dw, cw = args.dense_weight, args.cls_weight
        wrapped = lambda out, tgt: fn(out, tgt, dense_weight=dw,
                                      cls_weight=cw)
        wrapped.supports_sparse_tl = True
        return wrapped
    return lambda out, tgt: soft_target_cross_entropy(
        out[0] if isinstance(out, tuple) else out, tgt)
