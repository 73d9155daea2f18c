"""Checkpoint saver / loader.

Parity with `prog/checkpoint_saver.py` + `prog/helpers.py:19-118`
(SURVEY §5.4), rebuilt on flax msgpack serialization:

  * atomic write via tmp + os.replace (:70-75);
  * `last.ckpt` always current; immortal hardlinked snapshot every
    `no_del_interval` epochs (:77-80);
  * top-`max_history` retention ranked by metric with cleanup (:82-106)
    and a `model_best.ckpt` hardlink;
  * batch-level `save_recovery` / `find_recovery` (:146-164);
  * payload carries epoch, the *full architecture record* (model name +
    stage (r, h, l) — fixing the reference's hardcoded progressive resume,
    `main_prog.py:526-527` / SURVEY §7.4), params, optimizer state, one
    EMA tree per decay, resolved args YAML and the metric.

Multi-host: only process 0 writes (the `local_rank == 0` gate,
`main_prog.py:740`); restore is read-by-all.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_logger = logging.getLogger(__name__)

CKPT_EXT = ".ckpt"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


_MAGIC = b"APTC0001"
# JSON-serializable metadata keys kept out of the tensor blob (flax msgpack
# does not round-trip Python strings)
_META_KEYS = ("arch", "stage_info", "args_text", "epoch", "metric",
              "version", "batch_idx", "step")


def save_checkpoint_file(path: str, payload: Dict[str, Any]) -> None:
    """Atomic write (tmp + rename): JSON metadata header + msgpack tensors."""
    import json
    meta = {k: payload[k] for k in _META_KEYS if k in payload}
    tensors = {k: v for k, v in payload.items() if k not in _META_KEYS}
    blob = serialization.msgpack_serialize(_to_host(tensors))
    hdr = json.dumps(meta).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    import json
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(_MAGIC):
        return serialization.msgpack_restore(data)  # legacy blob-only file
    n = int.from_bytes(data[8:16], "little")
    meta = json.loads(data[16:16 + n].decode())
    out = dict(serialization.msgpack_restore(data[16 + n:]))
    out.update(meta)
    return out


def get_resume_epoch(path: str) -> Optional[int]:
    """Epoch to resume at (checkpoint stores the *completed* epoch;
    resume starts at the next one, `prog/helpers.py:107-118`)."""
    ckpt = load_checkpoint_file(path)
    if "epoch" in ckpt:
        return int(ckpt["epoch"]) + 1
    return None


class CheckpointSaver:
    def __init__(self, *, checkpoint_dir: str, recovery_dir: str = "",
                 decreasing: bool = False, max_history: int = 10,
                 no_del_interval: int = 10, enabled: bool = True):
        self.checkpoint_dir = checkpoint_dir
        self.recovery_dir = recovery_dir or checkpoint_dir
        self.decreasing = decreasing
        self.max_history = max(1, max_history)
        self.no_del_interval = no_del_interval
        self.enabled = enabled
        # [(path, metric)] best-first
        self.checkpoint_files: List[Tuple[str, float]] = []
        self.best_metric: Optional[float] = None
        self.best_epoch: Optional[int] = None
        if enabled:
            os.makedirs(checkpoint_dir, exist_ok=True)
            os.makedirs(self.recovery_dir, exist_ok=True)

    def _cmp(self, a: float, b: float) -> bool:
        return a < b if self.decreasing else a > b

    def save_checkpoint(self, payload: Dict[str, Any], epoch: int,
                        metric: Optional[float] = None, prefix: str = ""
                        ) -> Tuple[Optional[float], Optional[int]]:
        """Write last + ranked snapshot; returns (best_metric, best_epoch)."""
        if not self.enabled:
            return self.best_metric, self.best_epoch
        payload = dict(payload, epoch=epoch, metric=metric, version=2)
        last = os.path.join(self.checkpoint_dir, f"last{prefix}{CKPT_EXT}")
        save_checkpoint_file(last, payload)

        if epoch % self.no_del_interval == 0:
            keep = os.path.join(self.checkpoint_dir,
                                f"keep-{epoch}{prefix}{CKPT_EXT}")
            self._link(last, keep)

        worse_than_all = (len(self.checkpoint_files) >= self.max_history
                          and metric is not None
                          and not self._cmp(metric,
                                            self.checkpoint_files[-1][1]))
        if not worse_than_all:
            snap = os.path.join(self.checkpoint_dir,
                                f"checkpoint-{epoch}{prefix}{CKPT_EXT}")
            self._link(last, snap)
            self.checkpoint_files.append((snap, metric if metric is not None
                                          else float("-inf")))
            self.checkpoint_files.sort(
                key=lambda t: t[1], reverse=not self.decreasing)
            while len(self.checkpoint_files) > self.max_history:
                path, _ = self.checkpoint_files.pop()
                try:
                    os.remove(path)
                except OSError:
                    pass
        if metric is not None and (self.best_metric is None
                                   or self._cmp(metric, self.best_metric)):
            self.best_metric, self.best_epoch = metric, epoch
            self._link(last, os.path.join(self.checkpoint_dir,
                                          f"model_best{CKPT_EXT}"))
        return self.best_metric, self.best_epoch

    def save_recovery(self, payload: Dict[str, Any], epoch: int,
                      batch_idx: int) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.recovery_dir,
                            f"recovery-{epoch}-{batch_idx}{CKPT_EXT}")
        save_checkpoint_file(path, dict(payload, epoch=epoch,
                                        batch_idx=batch_idx, version=2))
        for old in glob.glob(os.path.join(self.recovery_dir,
                                          f"recovery-*{CKPT_EXT}")):
            if old != path:
                try:
                    os.remove(old)
                except OSError:
                    pass

    def find_recovery(self) -> Optional[str]:
        files = sorted(glob.glob(os.path.join(
            self.recovery_dir, f"recovery-*{CKPT_EXT}")))
        return files[-1] if files else None

    @staticmethod
    def _link(src: str, dst: str) -> None:
        try:
            if os.path.exists(dst):
                os.remove(dst)
            os.link(src, dst)
        except OSError:
            import shutil
            shutil.copy2(src, dst)


def build_payload(*, state, args_text: str, arch_name: str,
                  stage_info: Dict[str, Any],
                  ema_decays: Tuple[float, ...]) -> Dict[str, Any]:
    """Checkpoint payload mirroring `prog/checkpoint_saver.py:110-130`,
    plus the architecture/stage record needed for faithful progressive
    resume."""
    p: Dict[str, Any] = {
        "arch": arch_name,
        "stage_info": dict(stage_info),
        "state_dict": serialization.to_state_dict(_to_host(state.params)),
        "batch_stats": serialization.to_state_dict(
            _to_host(state.batch_stats)),
        "optimizer": serialization.to_state_dict(_to_host(state.opt_state)),
        "step": int(state.step),
        "args_text": args_text,
    }
    for i, d in enumerate(ema_decays):
        p[f"state_dict_ema_{i}"] = serialization.to_state_dict(
            _to_host(state.ema_params[i]))
    return p


def restore_state(ckpt: Dict[str, Any], state, *, restore_opt: bool = True):
    """Rebuild a TrainState from a payload against a template `state`
    (shapes must match — the arch record says which model to build first).
    `--no-resume-opt` maps to restore_opt=False (`main_prog.py:93-94`)."""
    import jax.numpy as jnp
    params = serialization.from_state_dict(state.params, ckpt["state_dict"])
    batch_stats = serialization.from_state_dict(
        state.batch_stats, ckpt.get("batch_stats", state.batch_stats))
    opt_state = state.opt_state
    if restore_opt and "optimizer" in ckpt:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  ckpt["optimizer"])
    ema = []
    for i in range(len(state.ema_params)):
        key = f"state_dict_ema_{i}"
        if key in ckpt:
            restored = serialization.from_state_dict(state.ema_params[i],
                                                     ckpt[key])
        else:
            restored = jax.tree.map(jnp.copy, params)
        # from_state_dict keeps the STORED dtype — cast to the template's
        # so an f32 checkpoint resumes cleanly into a bf16-EMA run
        # (--model-ema-bf16) and vice versa
        ema.append(jax.tree.map(
            lambda t, r: r.astype(t.dtype) if r.dtype != t.dtype else r,
            state.ema_params[i], restored))
    return state.replace(step=jnp.asarray(ckpt.get("step", 0), jnp.int32),
                         params=params, batch_stats=batch_stats,
                         opt_state=opt_state, ema_params=tuple(ema))
