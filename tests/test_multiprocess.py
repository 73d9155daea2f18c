"""Multi-process determinism of the synchronized decision paths.

SURVEY §2.4 calls the cross-host agreement of the grow decision, the
loader shards, and the supernet sampling "load-bearing": a divergence
deadlocks or silently corrupts multi-host training. The reference gets
this from torch DDP (`/root/reference/main_prog.py:330-360` launch +
same-seed samplers); the rebuild uses `jax.distributed` + strided
index sharding. This test runs the REAL thing: two separate JAX
processes joined over localhost (CPU backend), asserting

  * `sync_decision` adopts process 0's proposal on every process,
  * loader shards are deterministic, disjoint strides of one global
    permutation (drop_last truncation applied per shard),
  * the epoch-seeded candidate sampler draws identically everywhere.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

NPROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(coord: str, pid: int, script: str = "mp_worker.py",
            extra=()) -> subprocess.Popen:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the workers must not inherit the test session's 8-device fake mesh:
    # each process contributes exactly one CPU device to the global view
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), script)
    return subprocess.Popen(
        [sys.executable, worker, coord, str(NPROC), str(pid), *extra],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)


def test_two_process_decision_and_shards(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_launch(coord, pid) for pid in range(NPROC)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in worker output:\n{out}\n{err[-2000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))

    outs.sort(key=lambda d: d["pid"])
    assert all(d["nproc"] == NPROC for d in outs)

    # broadcast: all processes adopt process 0's (different) proposal
    assert outs[0]["synced"] == [128, 9]
    assert all(d["synced"] == [128, 9] for d in outs)

    # loader shards: deterministic, and exactly the strided split of the
    # one global permutation every host derives from (seed, epoch)
    order = np.random.default_rng(7 + 3).permutation(103)
    for d in outs:
        mine = order[d["pid"]::NPROC]
        mine = mine[: (len(mine) // 4) * 4]  # drop_last, batch_size=4
        assert d["shard"] == mine.tolist()
        assert d["shard_again"] == d["shard"]
    assert not set(outs[0]["shard"]) & set(outs[1]["shard"])

    # supernet sampling: identical epoch-seeded draws on every host
    assert outs[0]["cfgs"] == outs[1]["cfgs"]


def test_two_process_trainer_through_grow_boundary(tmp_path):
    """The whole `main_prog.main` (tiny auto-grow config) across 2 real
    JAX processes: both must traverse the same stage sequence, make the
    same grow decision, and end with bit-identical replicated params —
    the level at which multi-host divergence would actually bite
    (VERDICT r2: primitives were covered, the trainer was not)."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_launch(coord, pid, "mp_trainer_worker.py",
                     extra=(str(tmp_path / f"out{pid}"),))
             for pid in range(NPROC)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-6000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line:\n{out}\n{err[-3000:]}"
        outs.append(json.loads(line[-1][len("RESULT "):]))

    outs.sort(key=lambda d: d["pid"])
    assert all(d["nproc"] == NPROC for d in outs)
    # same final architecture and identical traversed stage history
    assert outs[0]["arch"] == outs[1]["arch"]
    assert outs[0]["history"] == outs[1]["history"]
    assert len(outs[0]["history"]) >= 2  # at least one grow happened
    # replicated params identical across processes
    assert outs[0]["checksum"] == outs[1]["checksum"]
