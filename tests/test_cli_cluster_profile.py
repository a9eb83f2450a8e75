"""End-to-end smoke of `main.py --profile cluster` (round-4 verdict #7): the
profile is unit-tested in test_session_profile.py, but this drives the real
spark-submit entry point over a tiny change log in a FRESH subprocess (the
profile conf must land at session build — an in-process getOrCreate would
silently reuse the test session without zstd) and asserts the lake's parquet
data files actually came out zstd-compressed.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys, json
sys.path.insert(0, {repo!r})
from change_data_capturer_ms_spark.session import get_spark
from change_data_capturer_ms_spark.sources import gen_changelog, write_changelog

# 1) generate a tiny changelog with a throwaway session, then stop it so the
#    CLI's get_spark(profile='cluster') builds a FRESH session with zstd conf
spark = get_spark(master="local[4]", shuffle_partitions=4,
                  extra_conf={{"spark.ui.enabled": "false"}})
write_changelog(gen_changelog(spark, 800, seed=51), {log!r})
spark.stop()

# 2) the real CLI path
import main as cli
rc = cli.main(["--log", {log!r}, "--table", {tbl!r}, "--checkpoint", {ckpt!r},
               "--master", "local[4]", "--profile", "cluster"])
assert rc == 0
"""


@pytest.mark.slow
def test_main_profile_cluster_writes_zstd_lake(tmp_path):
    log = str(tmp_path / "log")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    script = DRIVER.format(repo=REPO, log=log, tbl=tbl, ckpt=ckpt)
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-c", script], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # the CLI printed the committed lease
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["status"] == "OK"
    assert status["lease"]["metrics"]["rows"] == 800
    assert status["lease"]["lease"] == "799"  # resume token = last seq

    # every lake data file is parquet with zstd column chunks
    import pyarrow.parquet as pq

    data_files = [p for p in glob.glob(os.path.join(tbl, "**", "*.parquet"),
                                       recursive=True)]
    assert data_files, f"no parquet data files under {tbl}"
    for p in data_files:
        md = pq.ParquetFile(p).metadata
        codecs = {md.row_group(g).column(c).compression
                  for g in range(md.num_row_groups)
                  for c in range(md.num_columns)}
        assert codecs == {"ZSTD"}, (p, codecs)
