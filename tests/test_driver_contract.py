"""The driver's view of this repo, exercised the way the driver does it.

The external driver imports `__spark_entry__.py` from its file path into a
FRESH interpreter and hands `entry()`/`queries()` a plain SparkSession it
built itself — none of `session.get_spark`'s configs are set. Everything the
engine needs (UTC timezone, nanosAsLong for events.parquet) must therefore
be pinned at the data-access layer, lazily, against an arbitrary session.

This runs in a subprocess because an in-process test cannot be clean: any
previously created local SparkSession's builder configs leak into
`getOrCreate()`, silently re-creating the tuned session the driver does NOT
have. Regression anchor: `spark.conf.get(key, "")` on an UNSET conf makes
Spark 4 parse-and-validate the empty default (INVALID_CONF_VALUE) — every
test in the suite passed while the driver contract was broken.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import importlib.util
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("entry_mod", "@ENTRY_PATH@")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

spark = SparkSession.builder.master("local[2]").getOrCreate()  # plain: no engine confs

rows = m.entry(spark).collect()
assert len(rows) > 0, "entry() returned 0 rows"

q, o = m.queries(), m.oracle_sql()
assert set(o) <= set(q), "oracle_sql() names not a subset of queries()"
assert len(q) >= 60, f"registry shrank: {len(q)} queries"

# One events-table query: exercises the nanosAsLong + timezone pinning
# that only matters on a session the engine did not build.
n = q["events_hourly_rollup"](spark, "/root/testdata/sf0.001").count()
assert n > 0, "events query returned 0 rows on a plain session"
print("CONTRACT_OK", len(rows), len(q), n)
"""


def test_driver_contract_on_plain_session():
    script = _SCRIPT.replace("@ENTRY_PATH@", str(REPO / "__spark_entry__.py"))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, f"driver contract failed:\n{proc.stderr[-3000:]}"
    assert "CONTRACT_OK" in proc.stdout
