"""Unit tests for the scale-derived session config (round 5)."""

from __future__ import annotations

import os

from etl_pdf_pipepline_spark.session import _BYTES_PER_PARTITION, derive_shuffle_partitions


def test_derived_partitions_floor_and_growth(tmp_path):
    """Empty/small dirs keep the small-regime floor of 8 (r11: paired
    with AQE off below _AQE_MIN_BYTES); partitions grow as the next
    power of two of bytes/64MB and honor the cap."""
    assert derive_shuffle_partitions(str(tmp_path)) == 8
    # fake a "4.5 GB" dir without writing 4.5 GB: sparse file
    big = tmp_path / "lineitem.parquet"
    with open(big, "wb") as f:
        f.seek(70 * _BYTES_PER_PARTITION - 1)
        f.write(b"\0")
    assert derive_shuffle_partitions(str(tmp_path)) == 128  # 70 -> next pow2
    with open(big, "wb") as f:
        f.seek(10_000 * _BYTES_PER_PARTITION - 1)
        f.write(b"\0")
    assert derive_shuffle_partitions(str(tmp_path)) == 2048  # cap


def test_derived_partitions_known_dirs():
    """The measured mapping must hold for the real test-data dirs (small
    regime → 8; the ≥sf10 points keep their r6-matrix winning values)."""
    assert derive_shuffle_partitions("/root/testdata/sf0.01") == 8
    assert derive_shuffle_partitions("/root/testdata/sf0.1") == 8
    if os.path.isdir("/root/repo/.scale/sf100"):
        assert derive_shuffle_partitions("/root/repo/.scale/sf100") == 256


def test_derive_aqe_enabled_threshold(tmp_path):
    """AQE off below 8×64 MB compressed input (the floor partition count
    fits one task wave — nothing to re-plan), on at/above it."""
    from etl_pdf_pipepline_spark.session import _AQE_MIN_BYTES, derive_aqe_enabled

    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert derive_aqe_enabled(str(small)) is False
    assert derive_aqe_enabled("/root/testdata/sf0.1") is False

    big = tmp_path / "big"
    big.mkdir()
    with open(big / "t.parquet", "wb") as fh:
        fh.seek(_AQE_MIN_BYTES - 1)
        fh.write(b"\0")
    assert derive_aqe_enabled(str(big)) is True


def test_derive_scan_conf_thresholds(tmp_path):
    """Scan-split sizing: defaults (empty dict) below 2 GiB input; above,
    maxPartitionBytes targets ~3 waves per large scan, clamped to
    [16 MB, 128 MB], with openCost dropped to 1 MB."""
    from etl_pdf_pipepline_spark.session import derive_scan_conf

    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    assert derive_scan_conf(str(small)) == {}

    # A sparse file keeps the disk usage tiny but os.path.getsize large.
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "t.parquet", "wb") as fh:
        fh.seek(16 * 1024**3 - 1)
        fh.write(b"\0")
    conf = derive_scan_conf(str(big))
    mpb = int(conf["spark.sql.files.maxPartitionBytes"])
    # 16 GiB / (3 * 256 shuffle partitions) = ~21.3 MB
    assert 16 * 1024**2 <= mpb <= 128 * 1024**2
    assert mpb == 16 * 1024**3 // (3 * 256)
    assert conf["spark.sql.files.openCostInBytes"] == str(1024**2)


def test_reused_session_resets_scan_conf_below_threshold(spark, tmp_path):
    """ADVICE r9: re-entering get_spark with a below-threshold data_dir
    on a REUSED session must reset the scan-split knobs to Spark's
    defaults, not keep the previous large corpus's finer splits — the
    byte-identical-below-threshold contract. An extra_conf pin wins."""
    from etl_pdf_pipepline_spark.session import _SCAN_CONF_DEFAULTS, get_spark

    small = tmp_path / "small"
    small.mkdir()
    (small / "t.parquet").write_bytes(b"x" * 1024)
    big = tmp_path / "big"
    big.mkdir()
    with open(big / "t.parquet", "wb") as fh:
        fh.seek(16 * 1024**3 - 1)
        fh.write(b"\0")

    mpb_key = "spark.sql.files.maxPartitionBytes"
    oc_key = "spark.sql.files.openCostInBytes"
    aqe_key = "spark.sql.adaptive.enabled"
    shuf_key = "spark.sql.shuffle.partitions"
    before = {k: spark.conf.get(k) for k in (mpb_key, oc_key, aqe_key, shuf_key)}
    try:
        s = get_spark(data_dir=str(big))  # reused session, tuned knobs
        assert s is spark
        assert s.conf.get(mpb_key) == str(16 * 1024**3 // (3 * 256))
        # large regime: AQE on, derived partition count (r11 runtime apply)
        assert s.conf.get(aqe_key) == "true"
        assert s.conf.get(shuf_key) == "256"
        # below-threshold re-entry → stock defaults restored
        get_spark(data_dir=str(small))
        assert spark.conf.get(mpb_key) == _SCAN_CONF_DEFAULTS[mpb_key]
        assert spark.conf.get(oc_key) == _SCAN_CONF_DEFAULTS[oc_key]
        # small regime: AQE off, floor partitions
        assert spark.conf.get(aqe_key) == "false"
        assert spark.conf.get(shuf_key) == "8"
        # an explicit extra_conf pin survives the reset
        get_spark(data_dir=str(small), extra_conf={mpb_key: "33554432"})
        assert spark.conf.get(mpb_key) == "33554432"
        # data_dir=None leaves whatever is set alone
        get_spark()
        assert spark.conf.get(mpb_key) == "33554432"
    finally:
        for k, v in before.items():
            spark.conf.set(k, v)
