"""AutoProg sub-network search ("auto grow").

Reference: `auto_grow` / `train_one_epoch_super` / `sample_configs` /
the convergence-speed scoring (`main_prog.py:1558-2054`). At a stage
boundary the engine grows a weight-shared elastic supernet to the largest
candidate, trains it for `search_epochs` while sampling a random
(layer-count, resolution) sub-network per batch, probes each candidate's
training loss (on EMA[0]) and per-step wall time, and picks the candidate
minimizing `mean_loss * step_time^w` with `w` fitted on the fly by a
power-law `curve_fit` (host-side scipy — SURVEY §2.2).

TPU-native notes:
  * each candidate (r, l) is a pre-compiled XLA program (keep-mask +
    resolution static); sampling picks which program to call — the
    reference's per-batch `set_sample_config` mutation disappears;
  * sampling uses `np.random.RandomState(epoch)`, identical on every host
    (the reference's `random.seed(epoch)` at `main_prog.py:1861` — the
    load-bearing determinism for synced grow decisions, SURVEY §5.2);
  * step time is measured on the *compiled* step post-warmup with
    block_until_ready, so compilation never skews the criterion
    (SURVEY §7.3.6);
  * on multi-host, the chosen (r, l) is additionally broadcast from
    process 0 (belt-and-suspenders, SURVEY §5.8).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autoprog_tpu.parallel.mesh import shard_batch
from autoprog_tpu.prog.depth import elastic_keep_masks
from autoprog_tpu.prog.schedule import no_repeats
from autoprog_tpu.utils.meters import AverageMeter, SmoothMeter

_logger = logging.getLogger("autoprog_tpu.autogrow")


# ------------------------- candidate windowing ----------------------------


def candidate_window(r_list, h_list, l_list, current_r, current_h, current_l,
                     stage: int) -> Tuple[List[int], List[int], List[int]]:
    """Search window at a stage boundary (`main_prog.py:792-803`):
    stage 0 searches {min, mid, max} of r and l; later stages search a
    sliding window of <=2 resolutions x <=3 depths above the current
    config."""
    r_u, h_u, l_u = no_repeats(r_list), no_repeats(h_list), no_repeats(l_list)
    if stage > 0:
        r_s, h_s, l_s = r_u.index(current_r), h_u.index(current_h), \
            l_u.index(current_l)
        if l_s < len(l_u) - 1:
            l_s += 1
        r_e = min(r_s + 2, len(r_u))
        h_e = min(h_s + 3, len(h_u))
        l_e = min(l_s + 3, len(l_u))
        return r_u[r_s:r_e], h_u[h_s:h_e], l_u[l_s:l_e]
    return ([r_u[0], r_u[len(r_u) // 2], r_u[-1]], h_u,
            [l_u[0], l_u[len(l_u) // 2], l_u[-1]])


# ------------------------- scoring ----------------------------------------


def fit_time_exponent(times: Sequence[float], losses: Sequence[float]
                      ) -> float:
    """Fit loss ~ a2 * time^a1 and return w = max(-a1, 0)
    (`main_prog.py:1741-1747`)."""
    from scipy.optimize import curve_fit

    def _curve(x, a1, a2):
        return a2 * np.power(x, a1)

    try:
        para, _ = curve_fit(_curve, np.asarray(times, float),
                            np.asarray(losses, float), maxfev=10000)
        return float(max(-para[0], 0.0))
    except Exception as e:  # singular fits on degenerate inputs
        _logger.warning("curve_fit failed (%s); using w=0", e)
        return 0.0


def score_candidates(search_metrics: List[Dict[str, Dict[str, float]]],
                     cfg_strs: Sequence[str], stage: int
                     ) -> Tuple[str, Dict[str, float]]:
    """Convergence-speed criterion (`main_prog.py:1698-1819`).

    search_metrics: one dict per probe round, cfg -> {'loss', 'time'}
    ('time' present in round 0 only). Returns (best_cfg, table).
    """
    n = len(search_metrics)
    taylor0, time_d = {}, {}
    extras: Dict[str, Dict[str, float]] = {}
    for cfg in cfg_strs:
        losses = [search_metrics[i][cfg]["loss"] for i in range(n)]
        taylor0[cfg] = sum(losses) / len(losses)
        time_d[cfg] = search_metrics[0][cfg]["time"]
        if n > 3:
            t = 1.0 / n
            delta = losses[-1] - losses[0]
            delta2 = ((losses[-1] - losses[-2]) -
                      (losses[1] - losses[0])) / ((n - 1) * t)
            delta3 = (((losses[-1] - losses[-2]) - (losses[-2] - losses[-3]))
                      / t - ((losses[2] - losses[1]) -
                             (losses[1] - losses[0])) / t) / ((n - 2) * t)
            extras[cfg] = dict(
                delta=delta, delta2=delta2, delta3=delta3,
                taylor1=taylor0[cfg] + delta * 18,
                taylor2=taylor0[cfg] + delta * 18 + delta2 * 18 ** 2 / 2,
            )
    if extras:
        # log the taylor extrapolation diagnostics as the reference does
        # (`main_prog.py:1698-1730`); they inform log readers, not the
        # argmin (parity: the reference's criterion also uses taylor0)
        for name in ("delta", "delta2", "delta3", "taylor1", "taylor2"):
            _logger.info("search %s: %s", name,
                         "; ".join(f"{c}: {extras[c][name]:.4f}"
                                   for c in cfg_strs))
    w = fit_time_exponent([time_d[c] for c in cfg_strs],
                          [taylor0[c] for c in cfg_strs])
    converge = {c: taylor0[c] * time_d[c] ** w for c in cfg_strs}
    # The reference multiplies a *constant* repetition regularizer
    # (18/15)^0.3 into every candidate for stage>0 (`main_prog.py:1760-1766`)
    # — it cannot change the argmin; kept for log parity only.
    reg = (18 / 15) ** 0.3 if stage > 0 else 1.0
    table = {c: converge[c] * reg for c in cfg_strs}
    best = min(cfg_strs, key=lambda c: table[c])
    _logger.info("search w=%.4f  converge-speed: %s", w,
                 "; ".join(f"{c}: {table[c]:.4f}" for c in
                           sorted(cfg_strs, key=lambda c: table[c])))
    return best, table


def parse_cfg(cfg: str) -> Tuple[int, int]:
    r, l = cfg.split("_")
    return int(r.lstrip("r")), int(l.lstrip("l"))


# ------------------------- probes ------------------------------------------


def take_probe_batches(ctx, loader_search, total_steps: int) -> List:
    """Materialize `total_steps` fixed-aug probe batches ONCE per search
    epoch, pre-sharded onto the mesh, then shut the loader's worker pool
    down.

    Two reasons this is a list and not a live loader:
      * comparability — every candidate (and every probe round) scores
        against the IDENTICAL batches, which is what the reference's
        fixed-aug `StoredImageDataset` was *meant* to do (its cache is
        inert as shipped, `prog/dataset.py:33-54`, SURVEY §7.4);
      * cost — an abandoned mid-epoch loader iterator keeps its
        multiprocessing pool grinding the WHOLE epoch in the background
        (Pool.imap has no consumer backpressure); 18+ probe calls per
        search epoch were pushing tens of GB of wasted worker traffic.
    Device residency: total_steps x one batch (e.g. 20 x 19 MB uint8 at
    224) — small next to the model + optimizer state."""
    loader_search.set_epoch(0)
    batches = []
    it = iter(loader_search)
    while len(batches) < total_steps:
        try:
            batches.append(shard_batch(ctx.mesh, next(it)))
        except StopIteration:
            if not batches:
                break  # search split is empty — caller raises below
            # search split shorter than the probe budget: wrap around so
            # every probe still sees `total_steps` (fixed-aug) batches
            it = iter(loader_search)
    close = getattr(loader_search, "close", None)
    if close is not None:
        close()  # stop the pool from finishing the abandoned epoch
    if not batches:
        raise RuntimeError(
            "search loader yielded no probe batches — the search split is "
            "empty (dataset smaller than one batch?); cannot score "
            "candidates")
    return batches


def probe_candidate(ctx, batches: Sequence, *, r: int, keep, params,
                    batch_stats, with_time: bool = False
                    ) -> Dict[str, float]:
    """Loss (and optionally step-time) probe over the fixed probe batches
    (`validate_trainset`, `main_prog.py:1175-1298`)."""
    # compile-progress breadcrumb: a cold probe program can take tens of
    # minutes to compile on a remote-compile backend (observed 60+ min for
    # the first boundary-1 candidate through the TPU tunnel) — without
    # these lines the search phase is indistinguishable from a hang
    _logger.info("probe r%d keep=%s: loss probe (first dispatch compiles)",
                 r, "full" if keep is None else sum(sum(k) for k in keep))
    loss_step = ctx.sb.loss_probe_step(r=r, keep=keep)
    rng = jax.random.fold_in(ctx.rng, 4242)
    first_batch = None
    # device-side accumulation: every loss_step dispatch is async and the
    # running sum stays on device — ONE host readback per probe, not one
    # per step (a per-step float() pays the 3-7 ms tunnel sync 50 times
    # per candidate; engine.train_one_epoch's discipline applied here)
    # AUTOPROG_SYNC_SEARCH=1 restores the legacy per-step float() sync —
    # kept ONLY so the de-sync win stays measurable on hardware
    # (scripts/ab_search_sync.sh, PERF.md "search loop de-synced")
    sync_legacy = os.environ.get("AUTOPROG_SYNC_SEARCH") == "1"
    if not batches:
        raise ValueError("probe_candidate called with no probe batches")
    loss_sum = None
    n = 0
    for i, batch in enumerate(batches):
        if not isinstance(batch["image"], jax.Array):
            batch = shard_batch(ctx.mesh, batch)
        if first_batch is None:
            first_batch = batch
        l = loss_step(params, batch_stats, batch,
                      jax.random.fold_in(rng, i))
        if sync_legacy:
            l = float(l)
        # sample-weight by batch size so a short final batch doesn't skew
        # the average (loss_step returns the per-batch mean)
        bs = int(batch["image"].shape[0])
        loss_sum = l * bs if loss_sum is None else loss_sum + l * bs
        n += bs
    out = {"loss": float(loss_sum) / n}
    if with_time and first_batch is not None:
        # the criterion consumes these times (`main_prog.py:1721`): chain
        # K fwd+bwd steps in ONE jitted fori_loop and sync with a D2H
        # readback (bench.py:time_step discipline) — a single timed
        # dispatch carries a constant 3-7 ms tunnel offset that skews
        # time^w against small candidates
        iters = int(getattr(ctx.args, "search_time_iters", 10))
        multi = ctx.sb.chained_throughput_probe(r=r, keep=keep, iters=iters)
        t_rng = jax.random.fold_in(rng, 10_000)
        _logger.info("probe r%d: chained time probe (compile+warm)", r)
        float(multi(params, batch_stats, first_batch, t_rng))  # compile+warm
        t0 = time.perf_counter()
        float(multi(params, batch_stats, first_batch,
                    jax.random.fold_in(t_rng, 1)))
        out["time"] = (time.perf_counter() - t0) / iters
    return out


# ------------------------- supernet epoch ----------------------------------


def train_one_epoch_super(ctx, epoch: int, loader, loader_search, *,
                          r_list: Sequence[int], l_list: Sequence[int],
                          cfg_strs: Sequence[str], splits: int,
                          eval_times: int,
                          epoch_time_m: Optional[AverageMeter] = None,
                          re_prob: float = 0.0):
    """One supernet epoch with random sub-network sampling
    (`train_one_epoch_super`, `main_prog.py:1839-2054`). Returns
    (train_metrics, search_metrics_rounds, loss_0, loss_last)."""
    args = ctx.args
    sampler = np.random.RandomState(epoch)  # identical on every host
    l_min, l_max = l_list[0], l_list[-1]
    fam = getattr(ctx.mdef.arch, "family", "volo")
    keep_of = {l: elastic_keep_masks(l, l_min, l_max, fam) for l in l_list}
    lr = ctx.schedule.fn(epoch)
    loader.set_epoch(epoch)
    losses_m = [[SmoothMeter() for _ in l_list] for _ in r_list]
    batch_time = AverageMeter()

    def ema_probe_source():
        if ctx.state.ema_params:
            return ctx.state.ema_params[0], ctx.state.batch_stats
        return ctx.state.params, ctx.state.batch_stats

    # fixed probe batches, materialized once and reused by every
    # candidate and every probe round (see take_probe_batches)
    probe_batches = take_probe_batches(
        ctx, loader_search, getattr(args, "search_probe_steps", 50))
    _logger.info("search: %d probe batches materialized; round-0 probes "
                 "for %s", len(probe_batches), list(cfg_strs))

    # round 0: per-candidate loss + step-time probe (the timing that feeds
    # the grow criterion)
    search_rounds: List[Dict[str, Dict[str, float]]] = []
    probe_params, probe_stats = ema_probe_source()
    round0 = {}
    for cfg in cfg_strs:
        r, l = parse_cfg(cfg)
        round0[cfg] = probe_candidate(
            ctx, probe_batches, r=r, keep=keep_of[l], params=probe_params,
            batch_stats=probe_stats, with_time=True)
    search_rounds.append(round0)

    nb = len(loader)
    eval_steps = [nb // eval_times * i for i in range(1, eval_times)] + \
        [nb - 1] if eval_times else []
    loss_0, loss_last = {}, {}
    state = ctx.state
    end = time.time()
    device_re = re_prob if getattr(ctx.args, "uint8_pipe", False) else 0.0
    warmed_steps = False

    # per-batch losses stay on device; (cell, device-scalar) pairs are
    # drained into the SmoothMeters as ONE stacked transfer per log
    # interval — a per-batch float() host-syncs the 3-7 ms tunnel every
    # step, which can exceed a small candidate's compute (the main train
    # loop was already built this way, engine.py; this is the search-epoch
    # counterpart)
    pending: List[Tuple[int, int, jax.Array]] = []

    def drain():
        if not pending:
            return
        vals = np.asarray(jnp.stack([v for _, _, v in pending]))
        for (i_r, i_l, _), v in zip(pending, vals):
            losses_m[i_r][i_l].update(float(v))
        pending.clear()

    for batch_idx, batch in enumerate(loader):
        l = int(sampler.choice(l_list))
        r = int(sampler.choice(r_list))
        l_idx, r_idx = l_list.index(l), r_list.index(r)
        batch = shard_batch(ctx.mesh, batch)
        if not warmed_steps:
            # AOT-compile every candidate program (lower().compile(): no
            # execution, no throwaway state copies) so the random sampling
            # loop never stalls on a mid-epoch compile (SURVEY §7.3.1)
            for r_c in r_list:
                for l_c in l_list:
                    _logger.info("AOT warmup: train step r%d l%d", r_c, l_c)
                    ctx.sb.warmup_train_step(
                        r=r_c, keep=keep_of[l_c], splits=splits,
                        re_prob=device_re,
                        example=(state, batch, lr, ctx.rng))
            warmed_steps = True
        step = ctx.sb.train_step(r=r, keep=keep_of[l], splits=splits,
                                 re_prob=device_re)
        state, metrics = step(state, batch, lr, ctx.rng)
        pending.append((r_idx, l_idx, metrics["loss"]))
        if os.environ.get("AUTOPROG_SYNC_SEARCH") == "1":
            drain()  # legacy per-step host sync, for the A/B only
        batch_time.update(time.time() - end)

        if batch_idx % args.log_interval == 0 or batch_idx == nb - 1 or \
                batch_idx == 49 or batch_idx in eval_steps:
            drain()
        if batch_idx % args.log_interval == 0 or batch_idx == nb - 1:
            if ctx.is_primary:
                grid = "; ".join(
                    f"r{i}_l{j}: {losses_m[i][j].avg:.4f}"
                    for j in range(len(l_list)) for i in range(len(r_list)))
                _logger.info("TrainSuper: %d [%4d/%d] sampled r%d l%d  "
                             "All Loss: %s", epoch, batch_idx, nb, r, l, grid)
        if batch_idx == 49:
            loss_0 = {f"r{i}_l{j}": round(losses_m[i][j].avg, 4)
                      for j in range(len(l_list)) for i in range(len(r_list))}
        if batch_idx == nb - 1:
            loss_last = {f"r{i}_l{j}": round(losses_m[i][j].avg, 4)
                         for j in range(len(l_list))
                         for i in range(len(r_list))}
        if batch_idx in eval_steps:
            ctx.state = state
            probe_params, probe_stats = ema_probe_source()
            rnd = {}
            for cfg in cfg_strs:
                r_c, l_c = parse_cfg(cfg)
                rnd[cfg] = probe_candidate(
                    ctx, probe_batches, r=r_c, keep=keep_of[l_c],
                    params=probe_params, batch_stats=probe_stats)
            search_rounds.append(rnd)
        end = time.time()
    drain()
    ctx.state = state
    if epoch_time_m is not None:
        epoch_time_m.update(batch_time.sum)
    train_metrics = {"loss": losses_m[0][0].avg,
                     "step_time": batch_time.avg}
    return train_metrics, search_rounds, loss_0, loss_last


# ------------------------- top-level search --------------------------------


def sync_decision(best_r: int, best_l: int) -> Tuple[int, int]:
    """Broadcast the grow decision from process 0 on multi-host meshes."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        arr = multihost_utils.broadcast_one_to_all(
            np.asarray([best_r, best_l], np.int32))
        return int(arr[0]), int(arr[1])
    return best_r, best_l
