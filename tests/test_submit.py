"""Executable evidence for the north rule's `spark-submit --py-files`
requirement: package grokspark as the README's zip, launch a REAL
spark-submit subprocess whose working directory is OUTSIDE the repo
(so every import must resolve from the zip — including the vendored
`.pattern` data files), run the flagship parse+route job, and compare
its per-(route, matched) counts to the pure-Python reference."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path


REPO = Path(__file__).resolve().parent.parent

JOB = """
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
# imports must come from the --py-files zip: fail loudly if the repo
# leaked onto the path instead
import grokspark
assert ".zip" in grokspark.__file__, grokspark.__file__
from grokspark.pipeline import route_match_counts

rows = route_match_counts(spark, spark.read.parquet(sys.argv[1])).collect()
out = {f"{r['route']}|{int(r['matched'])}": r["n"] for r in rows}
with open(sys.argv[2], "w") as f:
    json.dump(out, f)
spark.stop()
"""


def _build_zip(path: Path) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = REPO / "grokspark"
        for p in sorted(pkg.rglob("*")):
            if p.is_dir() or "__pycache__" in p.parts:
                continue
            z.write(p, p.relative_to(REPO))


def test_spark_submit_py_files_round_trip(spark, tmp_path):
    # input: a small deterministic sequences table written by the
    # session fixture (datagen is part of the shipped package too)
    from grokspark.datagen import iter_rows, sequences_df

    n = 2000
    inp = str(tmp_path / "seq")
    sequences_df(spark, n).write.parquet(inp)

    zip_path = tmp_path / "grokspark.zip"
    _build_zip(zip_path)
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
    assert any(name.endswith(".pattern") for name in names), (
        "vendored pattern data files must ship in the zip"
    )

    job = tmp_path / "job.py"
    job.write_text(JOB)
    result = tmp_path / "counts.json"

    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(job), inp, str(result),
        ],
        cwd=str(tmp_path),  # NOT the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    got = json.loads(result.read_text())

    # pure-Python reference: same datagen rows, same routing + match
    from grokspark import GrokRegistry
    from grokspark.datagen import SOURCES

    reg = GrokRegistry.with_default_patterns()
    compiled = {
        s: reg.compile(expr, with_alias_only=True)
        for s, (_w, route, expr) in SOURCES.items()
        if route is not None
    }
    want: dict[str, int] = {}
    for r in iter_rows(n):
        src = r["source"]
        route = SOURCES[src][1]
        if route is None:
            continue  # unroutable rows are filtered before parse
        line = bytes(r["tokens"]).decode("utf-8")
        matched = compiled[src].match_against(line) is not None
        key = f"{route}|{int(matched)}"
        want[key] = want.get(key, 0) + 1
    assert got == want
