"""End-to-end spark-submit --py-files run (north_rule: "runs end-to-end
via spark-submit --py-files"): package the engine into a zip, submit the
shorelines job from OUTSIDE the repo (so the engine can only come from
--py-files), then resume it and check completed cells are skipped."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path / "engine.zip"))
    job = tmp_path / "run_shorelines.py"
    shutil.copy(os.path.join(REPO, "jobs", "run_shorelines.py"), job)

    def submit(extra):
        cmd = [
            SPARK_SUBMIT, "--master", "local[4]",
            "--py-files", zip_path, str(job),
            "--tiles-table", str(tmp_path / "tiles"),
            "--output", str(tmp_path / "shorelines"),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ] + extra
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=str(tmp_path),
            env=env, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    first = submit(["--synth", "3,2,2000,2001,3", "--tile-px", "64",
                    "--halo-px", "4"])
    assert first["n_tiles"] == 3 * 2 * 2 * 3
    assert first["n_shorelines"] > 0
    assert first["resumed_keys"] == 0

    second = submit([])
    assert second["resumed_keys"] > 0  # lineage resume kicked in
    assert second["n_shorelines"] == first["n_shorelines"]
