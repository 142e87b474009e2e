"""End-to-end ``spark-submit --py-files`` smoke — the north rule's drive
mode ("driven by spark-submit --py-files on multi-executor clusters").

Packages validify_spark into a zip, submits ``job.py`` with
``--py-files`` against a generated turns table in a scratch dir, and
asserts the JSON summary line + checkpoint resumability: a second
submit over the same audit dir validates ZERO new partitions.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_package(tmp_path):
    zpath = str(tmp_path / "validify_spark.zip")
    pkg = os.path.join(REPO, "validify_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath, out_dir, run_id, extra=()):
    os.makedirs(out_dir, exist_ok=True)
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--conf", "spark.ui.enabled=false",
           "--py-files", zpath,
           os.path.join(REPO, "validify_spark", "job.py"),
           "--out", out_dir, "--run-id", run_id,
           "--buckets", "8", *extra]
    res = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=420, env=env, cwd=str(out_dir))
    assert res.returncode == 0, res.stderr[-3000:]
    # the summary is the last JSON object line on stdout
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(tmp_path):
    zpath = _zip_package(tmp_path)
    out = str(tmp_path / "audit_out")

    s1 = _submit(zpath, out, "submit-smoke", ["--gen-rows", "20000"])
    assert s1["partitions_validated_this_run"] == 8
    assert s1["partitions_total"] == 8
    assert s1["rows"] == 20000
    assert s1["violations"] > 0          # the generator plants failures
    assert s1["groups"] == 8
    assert s1["dup_keys"] > 0            # generator plants dup keys
    assert s1["role_self_psi"] == 0.0    # self-drift is exactly zero

    # resumability: same audit dir + run id => all partitions already
    # checkpointed, zero re-validated, totals unchanged
    s2 = _submit(zpath, out, "submit-smoke",
                 ["--input", f"{out}/input_turns_20000", "--checks",
                  "none"])
    assert s2["partitions_validated_this_run"] == 0
    assert s2["partitions_total"] == 8
    assert s2["rows"] == s1["rows"]
    assert s2["violations"] == s1["violations"]
