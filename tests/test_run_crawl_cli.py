"""R10 — the spark-submit entry point (run_crawl.py), exercised as a real
subprocess: fresh run + resume on the same workdir (VERDICT r1 #8)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(workdir, epochs, *extra):
    # SPARK_GRAFT_CODEGEN=off: the subprocess crawls a KB-sized synthetic
    # site in a FRESH JVM — Janino compilation (seconds per novel plan
    # shape + the sandbox's ~25-50 s per-JVM codegen cold start) would
    # multiply across the ~40 plan shapes per epoch and time the test
    # out. Interpreted evaluation is strictly faster at this scale; the
    # production default (codegen on) is untouched.
    env = dict(os.environ, SPARK_GRAFT_CODEGEN="off")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "run_crawl.py"),
         "--workdir", workdir, "--epochs", str(epochs), "--cores", "4", *extra],
        capture_output=True, text=True, timeout=540, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_run_crawl_cli_and_resume(tmp_path):
    work = str(tmp_path / "cli")
    first = _run(work, 2)
    assert first["resumed_from_epoch"] == 0
    assert first["epochs_committed"] == [0, 1]
    assert first["urls_seen"] > 0

    second = _run(work, 4)  # same workdir → resumes at epoch 2
    assert second["resumed_from_epoch"] == 2
    assert second["epochs_committed"] == [0, 1, 2, 3]
    assert second["urls_seen"] >= first["urls_seen"]


def test_run_crawl_cli_mode_flags(tmp_path):
    """--politeness-mode/--filter-kind/--compact-seen-every reach the
    CrawlConfig: the run checkpoints sched_state, a cuckoo filter blob,
    and a compacted seen generation."""
    work = str(tmp_path / "cli_flags")
    out = _run(work, 2, "--politeness-mode", "continuous",
               "--filter-kind", "cuckoo", "--compact-seen-every", "1")
    assert out["epochs_committed"] == [0, 1]
    assert os.path.isdir(f"{work}/sched_state")
    assert os.path.isdir(f"{work}/seen__compacted")
