"""The spark-submit --py-files packaging contract (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Pins that the crawl engine runs OUT of a zipped package in a fresh
spark-submit JVM — catching module-level assumptions the in-process suite
can't see (repo-relative file reads, import-time SparkSession use, UDFs
capturing unpicklable state) — and that a second submit resumes from the
committed snapshot instead of restarting, with the final seen set equal
to the pure-Python oracle's.
"""

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _zip_package(tmp: Path) -> Path:
    zpath = tmp / "crawler_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as z:
        for p in sorted((REPO / "crawler_spark").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return zpath


def _submit(zpath: Path, state: Path, *extra: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", str(zpath),
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            str(REPO / "scripts" / "run_crawl.py"),
            "--synthetic",
            "--state", str(state),
            *extra,
        ],
        capture_output=True,
        text=True,
        timeout=560,
        cwd=str(tmp_neutral(state)),
    )


def tmp_neutral(state: Path) -> Path:
    # run from OUTSIDE the repo so only the zip can satisfy imports
    return state.parent


def test_submit_kill_resume_matches_oracle(spark, tmp_path):
    zpath = _zip_package(tmp_path)
    state = tmp_path / "state"

    first = _submit(zpath, state, "--max-rounds", "2")
    assert first.returncode == 0, first.stderr[-2000:]
    # spark-submit's launcher can fold the child's stderr into stdout
    assert "initialized round-0 snapshot" in first.stdout + first.stderr

    second = _submit(zpath, state)
    assert second.returncode == 0, second.stderr[-2000:]
    assert "resuming from round" in second.stdout + second.stderr
    final_lines = [
        l for l in second.stdout.splitlines() if l.startswith('{"final_round"')
    ]
    final = json.loads(final_lines[-1])
    assert final["done"] is True

    from crawler_spark.fixtures import make_fixture
    from crawler_spark.oracle import run_oracle
    from crawler_spark.state import SnapshotStore

    fx = make_fixture()
    o = run_oracle(fx.seeds, fx.web_graph, fx.tasks, fx.rules, fx.robots, fx.round_s)
    st = SnapshotStore(spark, str(state / "engine"))
    seen = {r["key"] for r in st.read_through("seen", st.latest_round()).collect()}
    assert seen == o.seen
