"""M25 — packaged spark-submit --py-files run (north-rule clause).

The north rule says the job "runs via spark-submit --py-files on a
multi-executor cluster".  This drives exactly that, for real: the
package is zipped, a driver script is copied OUTSIDE the repo (so
``import yadex_spark`` can only resolve from the ``--py-files`` zip),
and ``spark-submit`` drains a generated feed end-to-end; the committed
lake state is then compared against the pandas replay oracle.

One spark-submit JVM (~40 s) — the one test that proves the
deployment packaging, not just the library import path.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from yadex_spark.oracle import replay, state_to_pdf
from yadex_spark.sources.genlog import gen_oplog, write_oplog_chunks

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "yadex_spark.zip")
    pkg = os.path.join(REPO, "yadex_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, names in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for n in names:
                if not n.endswith(".py"):
                    continue
                full = os.path.join(root, n)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    work = str(tmp_path)
    feed = os.path.join(work, "feed")
    oplog = gen_oplog(spark, 3_000, 600, seed=55)
    write_oplog_chunks(oplog, feed, n_chunks=2)
    pdf = oplog.toPandas()  # oracle input, before the subprocess runs

    zpath = _zip_package(work)
    driver = os.path.join(work, "driver.py")
    shutil.copy(os.path.join(REPO, "yadex_spark", "main.py"), driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import source
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    lake, ckpt = os.path.join(work, "lake"), os.path.join(work, "ckpt")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            driver,
            "--oplog", feed, "--lake", lake, "--checkpoint", ckpt,
            "--cpus", "4", "--max-files-per-trigger", "64",
            "--compact-every", "0", "--drain",
        ],
        capture_output=True, text=True, timeout=420, cwd=work, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # the committed state (read back in THIS session) == replay oracle
    from yadex_spark.lake.table import LakeTable

    got = {
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in LakeTable(spark, os.path.join(lake, "seqs")).read().collect()
    }
    want_pdf = state_to_pdf(replay(pdf), "seqs")
    want = {
        (r.doc_id, tuple(r.tokens), r.n_tok, r.source)
        for r in want_pdf.itertuples()
    }
    assert got == want and len(got) > 0
    # lineage rows committed by the packaged run
    lin_dir = os.path.join(lake, "_lineage")
    assert os.path.isdir(lin_dir) and len(os.listdir(lin_dir)) > 0
