"""North-rule deployment surface: the engine must run via
``spark-submit --py-files``.  This drives the REAL thing end-to-end —
package engine.zip, spark-submit the build entrypoint on a tiny synthetic
corpus, spark-submit the query entrypoint against the built index — in
fresh JVMs with the package resolved ONLY from the zip (cwd is moved away
from the repo so a stray sys.path can't mask a packaging bug)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run(cmd, cwd, env):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_build_and_query(tmp_path):
    # package the engine
    _run(["bash", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
         cwd=REPO, env=os.environ.copy())
    zip_path = os.path.join(REPO, "engine.zip")
    assert os.path.exists(zip_path)

    # tiny corpus (pages schema) written with plain pyarrow — no Spark here
    import pandas as pd

    sys.path.insert(0, REPO)
    try:
        from elasticsearch_data_import_handler_spark.sources.corpus import (
            synth_pages_pdf)
        pdf = synth_pages_pdf(300, seed=42)
    finally:
        sys.path.remove(REPO)
    pages = tmp_path / "pages"
    pages.mkdir()
    pdf.to_parquet(pages / "part-000.parquet", index=False,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    idx = tmp_path / "index"
    env = os.environ.copy()
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    work = tmp_path / "cwd"   # NOT the repo: engine must come from the zip
    work.mkdir()

    build = _run([SPARK_SUBMIT, "--master", "local[4]",
                  "--py-files", zip_path,
                  os.path.join(REPO, "scripts", "build_index.py"),
                  "--pages", str(pages), "--index", str(idx),
                  "--tau", "200", "--buckets", "4"],
                 cwd=str(work), env=env)
    report = json.loads(build.stdout.strip().splitlines()[-1])
    assert report["n_docs"] > 0 and report["batch_id"] == 0

    query = _run([SPARK_SUBMIT, "--master", "local[4]",
                  "--py-files", zip_path,
                  os.path.join(REPO, "scripts", "query_index.py"),
                  "--index", str(idx), "--query", "spark index", "--k", "5"],
                 cwd=str(work), env=env)
    hits = [json.loads(x) for x in query.stdout.strip().splitlines()
            if x.startswith("{")]
    assert 0 < len(hits) <= 5
    assert [h["rank"] for h in hits] == list(range(1, len(hits) + 1))
    assert all(h["score"] > 0 and h["url"] for h in hits)
