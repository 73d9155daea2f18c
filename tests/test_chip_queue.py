"""Queue-runner marker semantics (VERDICT r4 weak #1).

Evidence markers must be unforgeable by accident: a failing job lands a
`.fail` marker (never `.done`), is retried on the next runner pass with
the attempt count visible on disk, and stops being retried once the
budget is exhausted. Seeding must dedup renumbered jobs by their
prefix-free name (ADVICE r4) so completed on-chip measurements are not
re-run after a job renumbering.

These tests drive the real runner functions against a temp QDIR; no TPU
or subprocess-level bash is needed except one tiny `true`/`false` job.
"""

import importlib.util
import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def queue(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "chip_queue", os.path.join(ROOT, "scripts", "chip_queue.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qdir = tmp_path / "chip_jobs"
    seed = tmp_path / "seed_jobs"
    qdir.mkdir()
    seed.mkdir()
    monkeypatch.setattr(mod, "QDIR", str(qdir))
    monkeypatch.setattr(mod, "SEED_DIR", str(seed))
    return mod, qdir, seed


def run_one(mod, qdir, name):
    """Execute one queued job the way the runner's main loop does."""
    path = qdir / name
    stem = str(path)[:-3]
    with open(stem + ".log", "a") as lf:
        rc = subprocess.call(["bash", str(path)], stdout=lf,
                             stderr=subprocess.STDOUT)
    if rc == 0:
        mark = ".done"
    else:
        n = len(mod._fail_markers(os.path.basename(stem)))
        mark = ".fail" if n == 0 else f".fail{n + 1}"
    os.rename(str(path), stem + mark)
    return mark


def test_failing_job_lands_fail_and_is_retried(queue):
    mod, qdir, _ = queue
    (qdir / "10_boom.sh").write_text("#!/bin/bash\nexit 3\n")

    mark = run_one(mod, qdir, "10_boom.sh")
    assert mark == ".fail"
    assert not (qdir / "10_boom.done").exists()

    # next runner pass requeues it, keeping the fail marker as evidence
    assert mod.retry_failed(max_attempts=2) == 1
    assert (qdir / "10_boom.sh").exists()
    assert (qdir / "10_boom.fail").exists()

    mark = run_one(mod, qdir, "10_boom.sh")
    assert mark == ".fail2"

    # attempt budget exhausted -> failure is final, no infinite loop
    assert mod.retry_failed(max_attempts=2) == 0
    assert not (qdir / "10_boom.sh").exists()


def test_succeeding_retry_lands_done_next_to_fail(queue):
    mod, qdir, _ = queue
    flag = qdir / "once"
    (qdir / "10_flaky.sh").write_text(
        f"#!/bin/bash\nif [ -e {flag} ]; then exit 0; fi\n"
        f"touch {flag}\nexit 1\n")
    assert run_one(mod, qdir, "10_flaky.sh") == ".fail"
    assert mod.retry_failed(max_attempts=2) == 1
    assert run_one(mod, qdir, "10_flaky.sh") == ".done"
    # done marker suppresses any further retry of the kept fail evidence
    assert mod.retry_failed(max_attempts=5) == 0


def test_seed_dedups_renumbered_jobs(queue):
    mod, qdir, seed = queue
    # old queue ran 10_bench to completion; the committed seed renumbered
    # it to 20_bench — seeding must NOT re-run the measurement
    (qdir / "10_bench.done").write_text("old marker")
    (seed / "20_bench.sh").write_text("#!/bin/bash\ntrue\n")
    (seed / "30_new.sh").write_text("#!/bin/bash\ntrue\n")
    mod.seed_jobs()
    assert not (qdir / "20_bench.sh").exists()
    assert (qdir / "30_new.sh").exists()


def test_seed_skips_failed_jobs(queue):
    mod, qdir, seed = queue
    (qdir / "10_x.fail").write_text("#!/bin/bash\nexit 1\n")
    (seed / "10_x.sh").write_text("#!/bin/bash\nexit 1\n")
    mod.seed_jobs()
    # retry path owns failed jobs; seeding must not double-queue them
    assert not (qdir / "10_x.sh").exists()
