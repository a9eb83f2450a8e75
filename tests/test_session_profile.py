"""get_spark conf-profile resolution (session.py PROFILES).

No JVM needed: the unknown-profile error fires before getOrCreate, and the
known-profile assertions only inspect the PROFILES table. The knobs' values
are pinned here so a drive-by edit can't silently change what
profile="cluster" deploys (each is tied to A/B evidence — see session.py).
"""

import pytest

from change_data_capturer_ms_spark.session import PROFILES, build_conf, get_spark


def test_unknown_profile_raises():
    with pytest.raises(ValueError, match="unknown profile 'nope'"):
        get_spark(profile="nope")


def test_cluster_profile_pins_zstd_lake_and_shuffle():
    assert PROFILES["cluster"] == {
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.io.compression.codec": "zstd",
    }


def test_extra_conf_overrides_profile():
    # precedence contract: defaults < profile < extra_conf, asserted on the
    # conf get_spark ACTUALLY builds (build_conf is the helper it applies)
    merged = build_conf(
        profile="cluster",
        extra_conf={"spark.sql.parquet.compression.codec": "snappy"},
    )
    assert merged["spark.sql.parquet.compression.codec"] == "snappy"
    assert merged["spark.io.compression.codec"] == "zstd"
    # and the profile really overrides an engine default it shadows
    assert build_conf(profile="cluster")[
        "spark.sql.parquet.compression.codec"] == "zstd"
    # engine defaults survive the merge
    assert merged["spark.sql.adaptive.enabled"] == "true"
    assert merged["spark.sql.execution.arrow.maxRecordsPerBatch"] == "65536"


def test_cli_profile_flag_parses():
    import main as cli
    a = cli.parse_args(["--log", "/l", "--table", "/t", "--checkpoint", "/c",
                        "--profile", "cluster"])
    assert a.profile == "cluster"
    assert cli.parse_args(["--log", "/l", "--table", "/t",
                           "--checkpoint", "/c"]).profile is None
