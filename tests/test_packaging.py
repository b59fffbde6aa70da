"""Packaging + spark-submit smoke: the north rule requires the encode
job to ship as ``spark-submit --py-files`` — prove the zip is importable
standalone and the job entry point runs end-to-end from it."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import package as packager  # noqa: E402


def test_zip_contains_package(tmp_path):
    out = packager.build(str(tmp_path / "pkg.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "duckdb_raquet_spark/__init__.py" in names
    assert "duckdb_raquet_spark/codecs/registry.py" in names
    assert not any("__pycache__" in n for n in names)


def test_zip_imports_standalone(tmp_path):
    """The zip alone (no repo checkout) must provide the package —
    what each executor sees with --py-files."""
    out = packager.build(str(tmp_path / "pkg.zip"))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import duckdb_raquet_spark as d; "
        "from duckdb_raquet_spark import blockkey, selector, encode, scan; "
        "print(d.__version__)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        check=True,
    )
    assert r.stdout.strip()


@pytest.mark.slow
def test_spark_submit_encode_job(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    zip_path = packager.build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "enc")
    r = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zip_path,
            os.path.join(REPO, "jobs", "encode_job.py"),
            "--synth-rows",
            "400",
            "--output",
            out_dir,
            "--target-rows-per-block",
            "64",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-4000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["num_rows"] == 400
    assert summary["enc_bytes"] < summary["raw_bytes"]
    assert os.path.exists(os.path.join(out_dir, "_raquet_manifest.json"))


def test_dist_zip_not_stale():
    """dist/duckdb_raquet_spark.zip ships with the repo (spark-submit
    --py-files); its contents must match the source tree byte-for-byte —
    a stale zip silently deploys old code."""
    dist = os.path.join(REPO, "dist", f"{packager.PKG}.zip")
    assert os.path.exists(dist), "dist zip missing — run tools/package.py"
    src_root = os.path.join(REPO, packager.PKG)
    want = {}
    for root, _dirs, files in os.walk(src_root):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, fn)
            with open(full, "rb") as f:
                want[os.path.relpath(full, REPO)] = f.read()
    with zipfile.ZipFile(dist) as zf:
        got = {n: zf.read(n) for n in zf.namelist() if not n.endswith("/")}
    assert set(got) == set(want), (
        f"zip drift: only-in-zip={sorted(set(got)-set(want))} "
        f"only-in-src={sorted(set(want)-set(got))}"
    )
    stale = [n for n in want if got[n] != want[n]]
    assert not stale, f"zip content differs from source for {stale}"
