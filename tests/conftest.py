"""Shared fixtures: one local SparkSession for the whole test run.

Small parallelism (local[4], 4 shuffle partitions) keeps per-test latency
low; the engine code itself never hard-codes partition counts, so the same
plans scale out unchanged.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark
