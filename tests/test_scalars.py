"""Scalar parity helpers — exact assertion values from the reference's
unit suite (test_telegram2elastic.py:6-53), reimplemented independently."""

import pytest

from telegram2elastic_spark.functions import scalars as sc


def test_file_size_parse_reference_values():
    assert sc.parse_file_size("1.5MB") == 1572864
    assert sc.parse_file_size("1KB") == 1024
    assert sc.parse_file_size("1k") == 1024
    assert sc.parse_file_size("512B") == 512
    assert sc.parse_file_size("512") == 512
    assert sc.parse_file_size("1GB") == 1024**3
    assert sc.parse_file_size("2TB") == 2 * 1024**4
    assert sc.parse_file_size("1PB") == 1024**5


def test_file_size_roundtrip():
    assert sc.format_file_size(1572864) == "1.5MB"
    assert sc.format_file_size(512) == "512.0B"
    assert sc.parse_file_size(sc.format_file_size(10 * 1024**2)) == 10 * 1024**2


def test_file_size_invalid():
    with pytest.raises(ValueError):
        sc.parse_file_size("abc")


def test_interval_parse_and_unit_order_independence():
    assert sc.parse_interval_seconds("1d12h") == 129600
    assert sc.parse_interval_seconds("2m1mo") == sc.parse_interval_seconds("1mo2m")
    assert sc.parse_interval_seconds("1y") == 365 * 86400
    assert sc.parse_interval_seconds("1mo") == 30 * 86400
    assert sc.parse_interval_seconds("1w, 2d") == 9 * 86400
    assert sc.parse_interval_seconds("90S") == 90


def test_interval_format():
    assert sc.format_interval(129600) == "1 day, 12 hours"
    assert sc.format_interval(61) == "1 minute, 1 second"
    assert sc.format_interval(0) == "0 seconds"


def test_interval_invalid():
    with pytest.raises(ValueError):
        sc.parse_interval_seconds("5 parsecs")


def test_prepare_chat_ref():
    assert sc.prepare_chat_ref("@somechannel") == "somechannel"
    assert sc.prepare_chat_ref("12345") == 12345
    assert sc.prepare_chat_ref("plainname") == "plainname"


def test_human_size_col(spark):
    df = spark.createDataFrame([(1572864,), (512,), (1024,)], "n long")
    vals = {
        r["n"]: r["h"]
        for r in df.select("n", sc.human_size_col(__import__("pyspark.sql.functions", fromlist=["col"]).col("n")).alias("h")).collect()
    }
    assert vals[1572864] == "1.5MB"
    assert vals[512] == "512.0B"
    assert vals[1024] == "1.0KB"
