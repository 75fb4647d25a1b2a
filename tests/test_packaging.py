"""Packaging parity with the reference (an installable library).

The reference ships as a pip package (/root/reference/pyproject.toml); this
engine must too, or a user cannot `pip install` it onto a cluster's driver /
ship it as a wheel. This container has no `wheel` package and no network, so
the build step is tools/build_wheel.py (offline PEP 427 writer); the install
step is real pip. Importing from a clean interpreter whose cwd/path exclude
the repo proves the installed artifact — not the working tree — is complete.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("dist"))
    target = str(tmp_path_factory.mktemp("piptarget"))
    sys.path.insert(0, REPO)
    from tools.build_wheel import build

    whl = build(out_dir)
    assert os.path.basename(whl).endswith("-py3-none-any.whl")
    res = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--target", target, whl],
        capture_output=True, text=True, cwd=REPO,
    )
    if res.returncode != 0:
        pytest.fail(f"pip install failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
    return target


def _probe(target: str, code: str) -> str:
    env = dict(os.environ, PYTHONPATH=target)
    env.pop("PYTHONHOME", None)
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=target, env=env,
    )
    assert res.returncode == 0, f"probe failed:\n{res.stderr[-2000:]}"
    return res.stdout.strip()


def test_installed_package_imports_and_is_complete(installed):
    out = _probe(installed, (
        "import tstore_spark, os\n"
        "from tstore_spark import api, session, datagen\n"
        "from tstore_spark.operators import rollup, dedup, similarity\n"
        "from tstore_spark.sources import archive, tstore_layout\n"
        "from tstore_spark.streaming import stream_rollup\n"
        "print(os.path.dirname(tstore_spark.__file__))\n"
    ))
    assert out.startswith(installed), f"imported from {out}, not the install target"


def test_console_entry_points_resolve(installed):
    # the three job mains must be importable from the installed artifact and
    # the dist-info must declare them as console scripts (pip materializes
    # bin/ shims from exactly this metadata on a normal install)
    _probe(installed, (
        "from tstore_spark.jobs.rollup_job import main as a\n"
        "from tstore_spark.jobs.corpus_job import main as b\n"
        "from tstore_spark.jobs.maintenance_job import main as c\n"
        "assert all(callable(f) for f in (a, b, c))\n"
    ))
    dist_info = [d for d in os.listdir(installed) if d.endswith(".dist-info")]
    assert dist_info, "no dist-info written by pip"
    ep_path = os.path.join(installed, dist_info[0], "entry_points.txt")
    assert os.path.exists(ep_path)
    eps = open(ep_path).read()
    for script in ("tstore-rollup", "tstore-corpus", "tstore-maintenance"):
        assert script in eps, f"{script} missing from entry_points.txt"


def test_wheel_is_reproducible(tmp_path):
    # identical inputs -> byte-identical artifact (fixed zip timestamps);
    # the determinism discipline extends to the deployment artifact
    from tools.build_wheel import build

    a = build(str(tmp_path / "a"))
    b = build(str(tmp_path / "b"))
    assert open(a, "rb").read() == open(b, "rb").read()


def test_root_job_shims_still_launchable():
    # spark-submit jobs/rollup_job.py must keep working after the move
    for shim in ("rollup_job.py", "corpus_job.py", "maintenance_job.py"):
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", shim), "--help"],
            capture_output=True, text=True, cwd=REPO,
        )
        assert res.returncode == 0, f"{shim} --help failed:\n{res.stderr[-1000:]}"
