"""spark-submit --py-files deployment shape: the package must be fully
importable from the zip tools/package.sh builds (no filesystem-relative
assumptions inside the package)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_importable(tmp_path):
    subprocess.run(["bash", os.path.join(REPO, "tools", "package.sh")],
                   check=True, cwd=REPO, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "database_delta_plugins_spark.zip")
    assert os.path.exists(zip_path)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]);\n"
        "import database_delta_plugins_spark.streaming.pipeline as p\n"
        "import database_delta_plugins_spark.lake.table as t\n"
        "import database_delta_plugins_spark.operators.dedup as d\n"
        "import database_delta_plugins_spark.functions.udfs as u\n"
        "print('ZIP_IMPORT_OK', p.CDCPipeline.__name__, t.LakeTable.__name__)\n"
    )
    # clean interpreter, repo NOT on the path — only the zip
    r = subprocess.run([sys.executable, "-c", probe, zip_path],
                       capture_output=True, text=True, cwd=str(tmp_path))
    assert "ZIP_IMPORT_OK CDCPipeline LakeTable" in r.stdout, r.stderr[-2000:]


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north rule's launch mode, actually exercised: spark-submit
    --py-files <zip> runs a complete CDC apply in a fresh JVM, with the
    package imported only from the zip (cwd is an empty dir)."""
    import shutil

    subprocess.run(["bash", os.path.join(REPO, "tools", "package.sh")],
                   check=True, cwd=REPO, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "database_delta_plugins_spark.zip")
    submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    r = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         "/root/testdata/sf0.001", str(tmp_path / "work")],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
    )
    ok = [ln for ln in r.stdout.splitlines() if ln.startswith("SUBMIT_OK")]
    assert ok, (r.stdout[-2000:], r.stderr[-3000:])
    fields = dict(kv.split("=") for kv in ok[0].split()[1:])
    assert int(fields["events"]) > 0
    assert int(fields["rows"]) > 0
    assert int(fields["applied"]) >= int(fields["rows"])
