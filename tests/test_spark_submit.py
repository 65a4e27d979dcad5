"""Packaging gate: the engine ships via ``spark-submit --py-files``.

The north rule requires the build job to run via
``spark-submit --py-files`` on a cluster (BASELINE.json). This test is
the evidence: it zips ``dbsyncer_spark`` exactly as README.md documents,
then drives ``tools/build_job.py`` through a REAL spark-submit
subprocess — build, one tiered maintenance pass, then serve a BM25
query. The subprocess runs from an empty scratch cwd with PYTHONPATH
scrubbed, so the only way the driver and the Python UDF workers can
import the engine is the ``--py-files`` zip (exactly a cluster's
situation; reference deploy analog: dbsyncer's packaged web app,
``/root/reference/README.md`` install section).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _zip_package(dest: str) -> str:
    """zip -r dbsyncer_spark.zip dbsyncer_spark (README.md deploy step)."""
    zpath = os.path.join(dest, "dbsyncer_spark.zip")
    src = os.path.join(REPO, "dbsyncer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from dbsyncer_spark.fixtures.corpus import gen_corpus_pdf

    pdf = gen_corpus_pdf(n_docs=120, seed=7)
    corpus_pq = str(tmp_path / "corpus")
    spark.createDataFrame(
        pdf, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(corpus_pq)

    scratch = tmp_path / "scratch"  # empty cwd: no repo checkout to leak in
    scratch.mkdir()
    zpath = _zip_package(str(tmp_path))
    index_dir = str(tmp_path / "idx")

    env = os.environ.copy()
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be sufficient

    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "build_job.py"),
            "--corpus", corpus_pq,
            "--index", index_dir,
            "--num-shards", "4",
            "--maintain",
            "--query", "parse buffer offset",
            "--k", "5",
        ],
        cwd=str(scratch),
        env=env,
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}"

    events = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.startswith("{")]
    built = [e for e in events if "built" in e]
    assert built, f"no build meta line in stdout:\n{proc.stdout[-2000:]}"
    assert any("maintenance" in e for e in events)

    hits = [e for e in events if "doc_id" in e]
    assert len(hits) == 5, f"expected 5 query rows, got {len(hits)}:\n{proc.stdout[-2000:]}"
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)

    # per-row invariant from BASELINE.json input_hint: sha256(content) equality
    want = {
        (r.repo, r.path): hashlib.sha256(r.content.encode()).hexdigest()
        for r in pdf.itertuples()
    }
    for h in hits:
        assert h["sha256"] == want[(h["repo"], h["path"])]
