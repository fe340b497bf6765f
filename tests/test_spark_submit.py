"""Deployment-path smoke: the engine ships as a --py-files zip and one
crawl round runs end-to-end under ``spark-submit`` (SURVEY §7.1 step 8 /
north rule "launches via spark-submit --py-files"). The subprocess runs
from a temp cwd with a COPY of the entry script, so ``see_spark`` is
importable only through the shipped zip — this is the packaging test no
in-process pytest can perform."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)
def test_crawl_round_via_spark_submit_zip():
    tmp = tempfile.mkdtemp(prefix="see_submit_")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "see_spark"), "zip", REPO, "see_spark"
    )
    script = os.path.join(tmp, "submit_crawl.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_crawl.py"), script)
    warehouse = os.path.join(tmp, "warehouse")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import route
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            script,
            "--warehouse", warehouse,
            "--synthetic-frontier", "2000",
            "--rounds", "1",
            "--host-budget", "4",
        ],
        cwd=tmp,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # last stdout line is the JSON metrics history
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("[")][-1]
    history = json.loads(line)
    assert len(history) == 1
    assert history[0]["checked_out"] > 0
    assert history[0]["discovered"] > 0
    # the run committed real tables into the warehouse
    assert os.path.isdir(warehouse)
    assert any("frontier" in d for d in os.listdir(warehouse))
    shutil.rmtree(tmp, ignore_errors=True)
