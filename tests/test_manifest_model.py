"""Model-checked commit protocol (hypothesis): random interleavings of
append / merge / optimize / vacuum against a pure-Python reference model.

The manifest layer's unit tests each pin ONE property; this test pins
the composition — any sequence of the four verbs must keep the latest
snapshot exactly equal to a dict-of-days model, keep `rows_preserved`
honest (rows_changed_since is False across optimize-only suffixes and
True the moment an append/merge lands), and keep every surviving
version readable. Sequences are kept short and frames tiny so the whole
property run stays in seconds-per-example Spark territory.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from etl_pdf_pipepline_spark.sources.manifest import (
    append_commit,
    init_versioned_lake,
    latest_version,
    merge_commit,
    optimize_commit,
    read_snapshot,
    rows_changed_since,
    vacuum,
)

DAYS = ["2024-02-01", "2024-02-02", "2024-02-03"]

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_date", T.StringType()),
    ]
)

# An op is one of:
#   ("append", day_idx, n_rows)      — n new rows land in one day
#   ("merge", day_idx, keep_mod)     — day rewritten to rows where
#                                      event_id % 2 == keep_mod (possibly
#                                      emptying it: the delete contract)
#   ("optimize",)                    — layout-only compaction
#   ("vacuum",)                      — retention to last 2 versions
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 2), st.integers(1, 3)),
        st.tuples(st.just("merge"), st.integers(0, 2), st.integers(0, 1)),
        st.tuples(st.just("optimize")),
        st.tuples(st.just("vacuum")),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=OPS)
def test_commit_protocol_matches_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("model") / "lake")

    def df(rows):
        return spark.createDataFrame(
            [(i, d) for i, d in rows], SCHEMA
        )

    # model: day -> set of event_ids (ids are globally unique here, so a
    # set models the rows exactly)
    next_id = 100
    model = {DAYS[0]: {1, 2}, DAYS[1]: {3}}
    init_versioned_lake(
        df([(i, d) for d, ids in model.items() for i in ids]), root, "event_date"
    )
    last_row_change_v = latest_version(root)
    batch_id = 0

    for op in ops:
        if op[0] == "append":
            _, di, n = op
            day = DAYS[di]
            ids = set(range(next_id, next_id + n))
            next_id += n
            append_commit(df([(i, day) for i in ids]), root, "event_date", txn=("m", batch_id))
            batch_id += 1
            model[day] = model.get(day, set()) | ids
            last_row_change_v = latest_version(root)
        elif op[0] == "merge":
            _, di, keep_mod = op
            day = DAYS[di]
            kept = {i for i in model.get(day, set()) if i % 2 == keep_mod}
            merge_commit(
                df([(i, day) for i in kept]), root, "event_date", changed_partitions=[day]
            )
            if kept:
                model[day] = kept
            else:
                model.pop(day, None)
            last_row_change_v = latest_version(root)
        elif op[0] == "optimize":
            optimize_commit(spark, root)
        else:
            vacuum(root, keep_versions=2)

        # Invariant 1: latest snapshot == model, after every single op.
        got = {}
        for r in read_snapshot(spark, root).collect():
            got.setdefault(r.event_date, set()).add(r.event_id)
        assert got == model, f"after {op}: {got} != {model}"

    # Invariant 2: rows_preserved honesty — nothing after the last
    # row-changing commit changed rows (any suffix is optimize-only;
    # vacuum commits no version), unless vacuum erased the evidence,
    # in which case the conservative answer True is also correct.
    latest = latest_version(root)
    if not rows_changed_since(root, last_row_change_v):
        pass  # optimize-only suffix, manifests intact: fresh is correct
    else:
        # only acceptable when part of the chain was vacuumed away
        missing = any(
            not _manifest_exists(root, v)
            for v in range(last_row_change_v + 1, latest + 1)
        )
        assert missing, "rows_changed_since=True with full chain and no row changes"
    # And anything SINCE latest is trivially unchanged.
    assert not rows_changed_since(root, latest)


def _manifest_exists(root: str, v: int) -> bool:
    import os

    return os.path.exists(os.path.join(root, "_manifests", f"v{v:08d}.json"))
