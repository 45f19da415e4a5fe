"""Unit tests for the scale-derived session config (round 5)."""

from __future__ import annotations

import os

from etl_pdf_pipepline_spark.session import _BYTES_PER_PARTITION, derive_shuffle_partitions


def test_derived_partitions_floor_and_growth(tmp_path):
    """Empty/small dirs keep the gate-tuned floor of 32; partitions grow
    as the next power of two of bytes/64MB and honor the cap."""
    assert derive_shuffle_partitions(str(tmp_path)) == 32
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
    """The measured mapping from SCALING.md r5 must hold for the real
    test-data dirs (the gate keeps 32)."""
    assert derive_shuffle_partitions("/root/testdata/sf0.01") == 32
    assert derive_shuffle_partitions("/root/testdata/sf0.1") == 32
    if os.path.isdir("/root/repo/.scale/sf100"):
        assert derive_shuffle_partitions("/root/repo/.scale/sf100") == 256
