"""Manifest-committed snapshots (sources/manifest.py): the properties the
gate row can't see — time travel (v1 readable and bit-equal after a v2
MERGE), cross-partition commit atomicity via one manifest file,
compare-and-swap on concurrent commits, and vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.plans.partitioned import TARGET_DAY, _merge_cdc_batch
from etl_pdf_pipepline_spark.sources.catalog import load_table
from etl_pdf_pipepline_spark.sources.manifest import (
    _commit_manifest,
    init_versioned_lake,
    latest_version,
    merge_commit,
    read_snapshot,
    vacuum,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def lake(spark, tmp_path):
    root = str(tmp_path / "lake")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    assert init_versioned_lake(ev, root, "event_date") == 1
    return root, ev


def _apply_merge(spark, root, ev) -> int:
    upserts, inserts, deletes = _merge_cdc_batch(ev)
    lake = read_snapshot(spark, root)
    days = [
        r[0]
        for r in upserts.select("event_date")
        .unionByName(inserts.select("event_date"))
        .unionByName(deletes.select("event_date"))
        .distinct()
        .collect()
    ]
    slice_ = lake.filter(F.col("event_date").isin(days))
    dead = upserts.select("event_id").unionByName(deletes.select("event_id")).distinct()
    merged = (
        slice_.join(dead, "event_id", "left_anti")
        .unionByName(upserts.join(deletes.select("event_id"), "event_id", "left_anti"))
        .unionByName(inserts)
    )
    return merge_commit(merged, root, "event_date")


def test_time_travel_preserves_v1(spark, lake):
    root, ev = lake
    before = sorted(tuple(r) for r in read_snapshot(spark, root, 1).collect())
    assert _apply_merge(spark, root, ev) == 2

    # v1 re-read AFTER the merge: bit-equal to the pre-merge snapshot
    v1_again = sorted(tuple(r) for r in read_snapshot(spark, root, 1).collect())
    assert v1_again == before

    # v2 differs where the CDC says it must
    v2 = read_snapshot(spark, root)  # latest
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    del_ids = [
        r[0]
        for r in ev.filter(day & (F.col("user_id") % 13 == 0)).select("event_id").collect()
    ]
    assert v2.filter(F.col("event_id").isin(del_ids)).count() == 0
    assert read_snapshot(spark, root, 1).filter(F.col("event_id").isin(del_ids)).count() == len(
        del_ids
    )


def test_merge_writes_only_new_files(spark, lake):
    root, ev = lake

    def all_files():
        out = {}
        for entry in sorted(os.listdir(root)):
            p = os.path.join(root, entry)
            if entry.startswith("event_date=") and os.path.isdir(p):
                for f in os.listdir(p):
                    st = os.stat(os.path.join(p, f))
                    out[os.path.join(entry, f)] = (st.st_size, st.st_mtime_ns, st.st_ino)
        return out

    before = all_files()
    _apply_merge(spark, root, ev)
    after = all_files()
    # immutability: every pre-merge file still present and untouched
    for rel, ident in before.items():
        assert after.get(rel) == ident, f"{rel} was mutated or removed"
    # and the new version added files only in the touched partitions
    new = {rel for rel in after if rel not in before}
    assert new, "merge added no files"
    touched = {f"event_date={TARGET_DAY}", "event_date=2024-01-16"}
    assert {rel.split(os.sep)[0] for rel in new} == touched


def test_commit_is_compare_and_swap(lake):
    root, _ = lake
    v = latest_version(root)
    # a racing writer claims v+1 first
    _commit_manifest(root, {"partition_col": "event_date", "files": {}})
    # replaying a commit AT the claimed version must fail, not clobber
    import json

    tmp = os.path.join(root, "_manifests", f"v{v + 1:08d}.json")
    with open(tmp) as fh:
        claimed = json.load(fh)
    assert claimed["files"] == {}
    with pytest.raises(FileExistsError):
        os.link(tmp, tmp)  # the exact primitive _commit_manifest relies on


def test_commit_pins_base_version(lake):
    """ADVICE r7 lost-update: a writer that read table state at version B
    must publish at exactly B+1; if another commit landed in between,
    the publish raises ConcurrentCommitError instead of silently
    committing on top of (and hiding) the interleaved changes."""
    from etl_pdf_pipepline_spark.sources.manifest import ConcurrentCommitError

    root, _ = lake
    base = latest_version(root)  # writer A reads state here
    # writer B commits in between
    _commit_manifest(root, {"partition_col": "event_date", "files": {}})
    # writer A publishes against its stale base → loud failure
    with pytest.raises(ConcurrentCommitError):
        _commit_manifest(
            root,
            {"partition_col": "event_date", "files": {}},
            base_version=base,
        )


def test_merge_commit_drops_fully_deleted_partition(spark, lake):
    """A versioned MERGE whose batch deletes EVERY row of a partition
    must drop that partition's manifest entry (no staging output exists
    to overwrite it) — while the prior snapshot still reads the
    pre-delete rows (time travel)."""
    root, _ = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    v1 = read_snapshot(spark, root, 1)
    n_day_v1 = v1.filter(day).count()
    assert n_day_v1 > 0

    import datetime

    kill_day = datetime.date.fromisoformat(TARGET_DAY)
    # merged slice: the other touched day unchanged, kill_day fully deleted
    other = datetime.date(2024, 1, 16)
    merged = v1.filter(F.col("event_date") == F.lit(other))
    assert merge_commit(
        merged, root, "event_date", changed_partitions=[kill_day, other]
    ) == 2

    v2 = read_snapshot(spark, root, 2)
    assert v2.filter(day).count() == 0
    # time travel: v1 still sees the deleted day
    assert read_snapshot(spark, root, 1).filter(day).count() == n_day_v1
    # and the manifest entry is gone, not pointing at empty dirs
    from etl_pdf_pipepline_spark.sources.manifest import _read_manifest

    assert f"event_date={kill_day}" not in _read_manifest(root, 2)["files"]


def test_update_meta_accumulates_under_real_races(tmp_path):
    """update_meta is the accumulator-safe RMW: N threads each adding
    their delta concurrently must ALL land (the r8 review's BM25-scalar
    finding — last-writer-wins commit_meta would drop deltas)."""
    import threading

    from etl_pdf_pipepline_spark.sources.manifest import read_meta, update_meta

    root = str(tmp_path / "acc")
    update_meta(root, lambda cur: {"n": 0})
    n_threads, n_iters = 8, 20
    errors = []

    def worker():
        try:
            for _ in range(n_iters):
                update_meta(root, lambda cur: {"n": int(cur["n"]) + 1})
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert read_meta(root) == {"n": n_threads * n_iters}


def test_commit_meta_retention(tmp_path):
    """Meta commits keep only the last META_KEEP_VERSIONS records —
    they reference no data files, so older ones are pure history."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        META_KEEP_VERSIONS,
        commit_meta,
        read_meta,
    )

    root = str(tmp_path / "artifact")
    n = META_KEEP_VERSIONS + 5
    for i in range(n):
        assert commit_meta(root, {"build": i}) == i + 1
    assert read_meta(root) == {"build": n - 1}
    kept = sorted(os.listdir(os.path.join(root, "_manifests")))
    assert len(kept) == META_KEEP_VERSIONS
    assert kept[0] == f"v{n - META_KEEP_VERSIONS + 1:08d}.json"


def test_disjoint_concurrent_merges_both_succeed(lake):
    """Optimistic concurrency: two merges touching DIFFERENT partitions
    that race on the version slot must BOTH land — the loser rebases its
    partition entries onto the winner's head instead of failing or
    clobbering. Simulated at the _publish_merge seam: writer A reads at
    v1; writer B commits v2 changing day-16 while A is staging; A then
    publishes a day-15 change against its stale base."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _publish_merge,
        _read_manifest,
    )

    root, _ = lake
    base = _read_manifest(root, 1)
    day15 = f"event_date={TARGET_DAY}"
    day16 = "event_date=2024-01-16"
    assert day15 in base["files"] and day16 in base["files"]

    # writer B lands first: day-16 rewritten
    b_files = dict(base["files"])
    b_files[day16] = [os.path.join(day16, "v00000002-b.parquet")]
    _commit_manifest(root, {"partition_col": "event_date", "files": b_files})

    # writer A publishes its day-15 change against stale base_v=1 → rebases
    a_entry = [os.path.join(day15, "v00000002-a.parquet")]
    v = _publish_merge(
        root, "event_date", 1, base, {day15: a_entry}, set(), max_retries=3
    )
    assert v == 3
    head = _read_manifest(root, 3)
    # both changes present: B's day-16 AND A's day-15
    assert head["files"][day16] == b_files[day16]
    assert head["files"][day15] == a_entry


def test_overlapping_concurrent_merges_conflict(lake):
    """If the interleaved commit touched one of THIS merge's partitions,
    the merged slice is stale — rebasing would drop the other writer's
    rows, so the publish must raise MergeConflictError."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        MergeConflictError,
        _publish_merge,
        _read_manifest,
    )

    root, _ = lake
    base = _read_manifest(root, 1)
    day15 = f"event_date={TARGET_DAY}"

    b_files = dict(base["files"])
    b_files[day15] = [os.path.join(day15, "v00000002-b.parquet")]
    _commit_manifest(root, {"partition_col": "event_date", "files": b_files})

    with pytest.raises(MergeConflictError):
        _publish_merge(
            root,
            "event_date",
            1,
            base,
            {day15: [os.path.join(day15, "v00000002-a.parquet")]},
            set(),
            max_retries=3,
        )


def test_vacuum_retention(spark, lake):
    root, ev = lake
    _apply_merge(spark, root, ev)  # v2
    v2_rows = read_snapshot(spark, root, 2).count()

    deleted = vacuum(root, keep_versions=1)  # expire v1
    assert deleted, "vacuum deleted nothing despite an expired snapshot"
    # v2 still fully readable
    assert read_snapshot(spark, root, 2).count() == v2_rows
    # v1 manifest gone
    assert not os.path.exists(os.path.join(root, "_manifests", "v00000001.json"))
    # deleted files are exactly v1-only data (touched partitions' originals)
    touched = {f"event_date={TARGET_DAY}", "event_date=2024-01-16"}
    assert {rel.split(os.sep)[0] for rel in deleted} == touched


def test_file_stats_pruning_mechanics(spark, tmp_path):
    """The data-skipping property the gate row can't see: a clustered
    stats lake's manifest prunes partition entries by directory value
    and files by committed user_id min/max — and pruning is a safe
    superset (pruned read ≡ full read under the same exact filter)."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _read_manifest,
        snapshot_files,
    )

    root = str(tmp_path / "stats_lake")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    n_days = ev.select("event_date").distinct().count()
    assert (
        init_versioned_lake(
            ev,
            root,
            "event_date",
            stats_cols=("user_id",),
            cluster_col="user_id",
            cluster_files=n_days * 4,
        )
        == 1
    )
    m = _read_manifest(root, 1)
    all_files = snapshot_files(m)
    assert len(all_files) > n_days  # within-partition splits exist
    assert set(m.get("stats", {})) == set(all_files)  # every file has stats

    # Partition-value pruning: a 3-day window keeps only those entries.
    window = ("2024-01-05", "2024-01-07")
    day_files = snapshot_files(m, {"event_date": window})
    kept_days = {f.split("/")[0] for f in day_files}
    assert kept_days == {
        e for e in m["files"] if window[0] <= e.split("=")[1] <= window[1]
    }

    # File-stat pruning: a bottom-decile user bound drops files whose
    # committed [min,max] misses it — strictly fewer than the window's.
    u_hi = int(ev.agg(F.max("user_id")).collect()[0][0] * 0.1)
    both = snapshot_files(m, {"event_date": window, "user_id": (None, u_hi)})
    assert len(both) < len(day_files)
    # Safe superset: pruned read + exact filter ≡ full read + exact filter.
    pred = (
        (F.col("event_date") >= F.lit(window[0]).cast("date"))
        & (F.col("event_date") <= F.lit(window[1]).cast("date"))
        & (F.col("user_id") <= u_hi)
    )
    full = read_snapshot(spark, root).filter(pred)
    pruned = read_snapshot(
        spark, root, bounds={"event_date": window, "user_id": (None, u_hi)}
    ).filter(pred)
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, full.collect()))


def test_snapshot_files_keeps_unstatted_files():
    """Files or columns without committed stats are never pruned —
    conservative by construction."""
    from etl_pdf_pipepline_spark.sources.manifest import snapshot_files

    m = {
        "partition_col": "d",
        "files": {"d=a": ["d=a/f1.parquet", "d=a/f2.parquet"]},
        "stats": {"d=a/f1.parquet": {"x": [100, 200]}},
    }
    # f1 pruned by its stats; f2 (no stats) survives any bound on x.
    assert snapshot_files(m, {"x": (0, 50)}) == ["d=a/f2.parquet"]
    # bound on a column with no stats anywhere: nothing pruned
    assert snapshot_files(m, {"y": (0, 1)}) == sorted(m["files"]["d=a"])


def test_partition_pruning_bare_int_values():
    """Bare-int partition values ('9' > '10' lexicographically) prune
    NUMERICALLY — a string-domain compare would silently drop live
    partitions, the r8 review's safe-superset violation."""
    from etl_pdf_pipepline_spark.sources.manifest import snapshot_files

    m = {
        "partition_col": "h",
        "files": {f"h={v}": [f"h={v}/f.parquet"] for v in (2, 9, 10, 11)},
    }
    kept = snapshot_files(m, {"h": (9, 10)})
    assert sorted(kept) == ["h=10/f.parquet", "h=9/f.parquet"]
    # unbounded-low / unbounded-high halves behave numerically too
    assert len(snapshot_files(m, {"h": (10, None)})) == 2
    assert len(snapshot_files(m, {"h": (None, 9)})) == 2


def test_partition_pruning_mixed_width_strings_degrade_to_full_read():
    """A string partition domain whose widths don't match the bound is
    NOT order-safe — pruning must keep every entry (full read), never
    guess lexicographic order."""
    from etl_pdf_pipepline_spark.sources.manifest import snapshot_files

    m = {
        "partition_col": "k",
        "files": {f"k={v}": [f"k={v}/f.parquet"] for v in ("ab", "abc", "b")},
    }
    # 'b' > 'abc' lexicographically but the domain has mixed widths:
    # every entry whose width mismatches a bound is kept.
    assert len(snapshot_files(m, {"k": ("abc", "abc")})) >= 1
    assert "k=abc/f.parquet" in snapshot_files(m, {"k": ("abc", "abc")})
    # same-width string domain (ISO dates) still prunes exactly
    m2 = {
        "partition_col": "d",
        "files": {f"d={v}": [f"d={v}/f.parquet"] for v in ("2024-01-01", "2024-01-05")},
    }
    assert snapshot_files(m2, {"d": ("2024-01-02", None)}) == ["d=2024-01-05/f.parquet"]


def test_datetime_bounds_normalized_to_stat_domain():
    """Timestamp/date column stats are committed as ISO strings; a
    caller passing datetime/date bounds must get pruning, not a
    plan-time TypeError."""
    import datetime

    from etl_pdf_pipepline_spark.sources.manifest import snapshot_files

    m = {
        "partition_col": "d",
        "files": {"d=a": ["d=a/f1.parquet", "d=a/f2.parquet"]},
        "stats": {
            "d=a/f1.parquet": {"ts": ["2024-01-01T00:00:00", "2024-01-02T00:00:00"]},
            "d=a/f2.parquet": {"ts": ["2024-03-01T00:00:00", "2024-03-05T00:00:00"]},
        },
    }
    lo = datetime.datetime(2024, 2, 1)
    assert snapshot_files(m, {"ts": (lo, None)}) == ["d=a/f2.parquet"]
    # cross-type garbage (int bound vs string stats) keeps both files
    assert len(snapshot_files(m, {"ts": (5, None)})) == 2


def test_version_parse_is_width_independent(tmp_path):
    """f\"v{N:08d}\" widens past 8 digits; latest_version/vacuum/meta
    pruning must parse the whole number, not a fixed [1:9] slice."""
    import json

    from etl_pdf_pipepline_spark.sources.manifest import latest_version

    root = str(tmp_path / "wide")
    d = os.path.join(root, "_manifests")
    os.makedirs(d)
    for v in (1, 99999999, 100000000, 100000001):
        with open(os.path.join(d, f"v{v:08d}.json"), "w") as fh:
            json.dump({"payload": {"v": v}}, fh)
    assert latest_version(root) == 100000001


def test_merge_commit_propagates_file_stats(spark, lake):
    """A stats-carrying lake keeps its data-skipping property across a
    MERGE: new files gain footer stats, carried entries keep theirs,
    dropped files lose theirs."""
    from etl_pdf_pipepline_spark.sources.manifest import _read_manifest

    root, ev = lake
    # rebuild the fixture lake WITH stats so v1 carries them
    assert (
        init_versioned_lake(ev, root, "event_date", stats_cols=("user_id",)) == 1
    )
    v1 = _read_manifest(root, 1)
    assert v1.get("stats")

    upserts, inserts, deletes = _merge_cdc_batch(ev)
    lake_df = read_snapshot(spark, root)
    days = [
        r[0]
        for r in upserts.select("event_date")
        .unionByName(inserts.select("event_date"))
        .unionByName(deletes.select("event_date"))
        .distinct()
        .collect()
    ]
    slice_ = lake_df.filter(F.col("event_date").isin(days))
    dead = upserts.select("event_id").unionByName(deletes.select("event_id")).distinct()
    merged = (
        slice_.join(dead, "event_id", "left_anti")
        .unionByName(upserts.join(deletes.select("event_id"), "event_id", "left_anti"))
        .unionByName(inserts)
    )
    assert (
        merge_commit(
            merged, root, "event_date", changed_partitions=days,
            stats_cols=("user_id",),
        )
        == 2
    )
    v2 = _read_manifest(root, 2)
    live = {rel for rels in v2["files"].values() for rel in rels}
    # every live file has stats, and no dead file leaks a stats entry
    assert set(v2["stats"]) == live
    # carried (untouched) entries kept their v1 stats verbatim
    touched_entries = {f"event_date={d}" for d in days}
    for entry, rels in v2["files"].items():
        if entry not in touched_entries:
            for rel in rels:
                assert v2["stats"][rel] == v1["stats"][rel]


def test_schema_evolution_add_column(spark, lake):
    """Add-column evolution: one partition rewritten with the new
    column, untouched partitions project null through the committed
    schema, and time travel reads v1 at its OLD width."""
    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    evolved = (
        read_snapshot(spark, root)
        .filter(day)
        .withColumn("channel", F.lit("app"))
    )
    assert (
        merge_commit(evolved, root, "event_date", changed_partitions=[TARGET_DAY]) == 2
    )

    snap = read_snapshot(spark, root)
    assert "channel" in snap.columns
    # evolved day: real values; untouched days: null-projected
    assert snap.filter(day & F.col("channel").isNull()).count() == 0
    assert snap.filter(~day & F.col("channel").isNotNull()).count() == 0
    assert snap.filter(~day).count() > 0  # untouched rows actually read
    # time travel: v1 has no channel column at all
    assert "channel" not in read_snapshot(spark, root, 1).columns


def test_schema_evolution_rejects_drop_and_retype(spark, lake):
    """Drops and retypes are not in-place evolutions: both raise before
    any staging I/O and commit nothing."""
    from etl_pdf_pipepline_spark.sources.manifest import SchemaEvolutionError

    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    v_before = latest_version(root)

    with pytest.raises(SchemaEvolutionError, match="missing"):
        merge_commit(
            read_snapshot(spark, root).filter(day).drop("value"),
            root,
            "event_date",
            changed_partitions=[TARGET_DAY],
        )
    with pytest.raises(SchemaEvolutionError, match="retyped"):
        merge_commit(
            read_snapshot(spark, root)
            .filter(day)
            .withColumn("value", F.col("value").cast("string")),
            root,
            "event_date",
            changed_partitions=[TARGET_DAY],
        )
    assert latest_version(root) == v_before  # nothing committed


def test_optimize_compacts_atomically(spark, tmp_path):
    """OPTIMIZE: >1 file per partition before, ==1 after, rows
    bit-identical, the fragmented layout still readable at the old
    version, and per-file stats recomputed for the compacted files."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _read_manifest,
        optimize_commit,
    )

    root = str(tmp_path / "opt_lake")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    nd = ev.select("event_date").distinct().count()
    init_versioned_lake(
        ev, root, "event_date", stats_cols=("user_id",),
        cluster_col="user_id", cluster_files=nd * 4,
    )
    v1 = _read_manifest(root, 1)
    assert any(len(rels) > 1 for rels in v1["files"].values())  # fragmented
    before = sorted(tuple(r) for r in read_snapshot(spark, root).collect())

    assert optimize_commit(spark, root, stats_cols=("user_id",)) == 2
    v2 = _read_manifest(root, 2)
    assert all(len(rels) == 1 for rels in v2["files"].values())  # compacted
    assert sorted(tuple(r) for r in read_snapshot(spark, root).collect()) == before
    # the old fragmented snapshot still reads (time travel)
    assert sorted(tuple(r) for r in read_snapshot(spark, root, 1).collect()) == before
    # stats follow the rewrite: exactly the live files, none stale
    live = {rel for rels in v2["files"].values() for rel in rels}
    assert set(v2["stats"]) == live


def test_append_commit_extends_and_replay_is_noop(spark, lake):
    """append_commit: touched entries EXTENDED (old files carried),
    the (app, batch_id) ledger makes a replayed batch a no-op, and a
    LATER batch from the same app lands."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _read_manifest,
        append_commit,
    )

    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    batch = ev.filter(day & (F.col("user_id") % 5 == 0))
    n_batch = batch.count()
    n_before = read_snapshot(spark, root).count()
    v1_files = _read_manifest(root, 1)["files"]

    assert append_commit(batch, root, "event_date", txn=("app", 0)) == 2
    v2 = _read_manifest(root, 2)
    entry = f"event_date={TARGET_DAY}"
    assert set(v1_files[entry]) < set(v2["files"][entry])  # extended, not replaced
    assert read_snapshot(spark, root).count() == n_before + n_batch
    assert v2["txn"] == {"app": 0}

    # replay of batch 0: version unchanged, no duplicate rows
    assert append_commit(batch, root, "event_date", txn=("app", 0)) == 2
    assert read_snapshot(spark, root).count() == n_before + n_batch
    # batch 1 lands
    assert append_commit(batch, root, "event_date", txn=("app", 1)) == 3
    assert read_snapshot(spark, root).count() == n_before + 2 * n_batch


def test_append_commit_bootstraps_empty_lake(spark, tmp_path):
    """The first streamed batch creates the lake: no init required."""
    from etl_pdf_pipepline_spark.sources.manifest import append_commit

    root = str(tmp_path / "boot_lake")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    first = ev.filter(F.col("event_date") == F.lit(TARGET_DAY).cast("date"))
    assert append_commit(first, root, "event_date", txn=("boot", 0)) == 1
    assert read_snapshot(spark, root).count() == first.count()


def test_concurrent_appends_both_land(spark, lake):
    """Appends commute: two writers appending to the SAME partition
    concurrently must both commit (the loser of the version-slot CAS
    rebases — there is no conflict class for appends), and the final
    snapshot carries both batches exactly once."""
    import threading

    from etl_pdf_pipepline_spark.sources.manifest import append_commit

    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    n_before = read_snapshot(spark, root).count()
    batches = [
        ev.filter(day & (F.col("user_id") % 5 == k)) for k in (0, 1)
    ]
    counts = [b.count() for b in batches]
    errors = []

    def worker(k):
        try:
            append_commit(batches[k], root, "event_date", txn=(f"w{k}", 0))
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert latest_version(root) == 3  # base + two commits
    assert read_snapshot(spark, root).count() == n_before + sum(counts)


def test_merge_preserves_txn_ledger(spark, lake):
    """A CDC MERGE landing between a streaming batch and its
    crash-replay must carry the (app_id, batch_id) ledger forward —
    otherwise the replay double-appends (the exactly-once contract
    would silently hold only until the first merge)."""
    from etl_pdf_pipepline_spark.sources.manifest import append_commit

    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    batch = ev.filter(day & (F.col("user_id") % 7 == 0)).withColumn(
        "event_id", F.col("event_id") + 33_000_000_000
    )
    append_commit(batch, root, "event_date", txn=("ingest", 5))

    _apply_merge(spark, root, ev)  # row-changing merge on top

    # Crash-replay of the already-committed batch: must be a no-op —
    # no new version, and the batch's rows appear exactly once.
    v_before = latest_version(root)
    assert append_commit(batch, root, "event_date", txn=("ingest", 5)) == v_before
    assert latest_version(root) == v_before
    replay_ids = [r[0] for r in batch.select("event_id").collect()]
    snap = read_snapshot(spark, root)
    dupes = (
        snap.filter(F.col("event_id").isin(replay_ids))
        .groupBy("event_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dupes == 0



def test_rows_changed_since_and_optimize_tag(spark, lake):
    """rows_changed_since: False across an OPTIMIZE-only chain (tagged
    rows_preserved), True as soon as a row-changing commit appears, and
    conservatively True when the chain is vacuumed past."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        optimize_commit,
        rows_changed_since,
    )

    root, ev = lake
    assert not rows_changed_since(root, 1)  # nothing after v1
    optimize_commit(spark, root)  # v2: layout-only
    assert latest_version(root) == 2
    assert not rows_changed_since(root, 1)
    _apply_merge(spark, root, ev)  # v3: rows change
    assert rows_changed_since(root, 1)
    assert rows_changed_since(root, 2)
    assert not rows_changed_since(root, 3)
    # Vacuumed-past chains refuse to claim freshness.
    optimize_commit(spark, root)  # v4
    vacuum(root, keep_versions=1)  # only v4's manifest survives
    assert rows_changed_since(root, 2)


def test_partition_pruning_safe_superset_property():
    """Property (randomized domains): snapshot_files with a partition
    bound NEVER drops an entry whose value is logically inside the
    bound — across bare ints, ISO dates, and mixed-width strings (where
    the contract degrades to keep-everything)."""
    import random

    from etl_pdf_pipepline_spark.sources.manifest import snapshot_files

    rng = random.Random(424)
    domains = [
        [str(v) for v in rng.sample(range(0, 500), 12)],                 # bare ints
        [f"2024-{m:02d}-{d:02d}" for m, d in zip(rng.sample(range(1, 13), 6), rng.sample(range(1, 28), 6))],  # ISO dates
        ["a", "ab", "abc", "b", "zz", "y"],                               # mixed widths
    ]
    for dom in domains:
        m = {"partition_col": "k", "files": {f"k={v}": [f"k={v}/f.parquet"] for v in dom}}
        for _ in range(20):
            lo, hi = sorted(rng.sample(dom, 2))
            kept = set(snapshot_files(m, {"k": (lo, hi)}))
            # logical containment: numeric if all parse as ints, else string
            try:
                inside = {v for v in dom if int(lo) <= int(v) <= int(hi)}
            except ValueError:
                inside = {v for v in dom if lo <= v <= hi}
            must_keep = {f"k={v}/f.parquet" for v in inside}
            assert must_keep <= kept, (dom, lo, hi, must_keep - kept)


def test_maintain_lake_policy_and_mechanics(spark, tmp_path):
    """The autopilot's file-level contracts the gate row can't see:
    only fragmented partitions are rewritten (untouched ones stay
    inode-identical), the pass is a no-op commit-wise when nothing is
    fragmented, stats columns auto-carry, and vacuum reclaims the
    pre-compaction files past retention."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _read_manifest,
        append_commit,
        fragmented_partitions,
        maintain_lake,
    )

    root = str(tmp_path / "auto")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    assert init_versioned_lake(ev, root, "event_date", stats_cols=("user_id",)) == 1

    # fragment exactly one day with two appends
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    slice1 = ev.filter(day & (F.col("user_id") % 2 == 0)).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    slice2 = ev.filter(day & (F.col("user_id") % 2 == 1)).withColumn(
        "event_id", F.col("event_id") + 20_000_000
    )
    append_commit(slice1, root, "event_date", txn=("ap", 1), stats_cols=("user_id",))
    append_commit(slice2, root, "event_date", txn=("ap", 2), stats_cols=("user_id",))
    assert fragmented_partitions(root, 1) == [TARGET_DAY]

    def files(entry_prefix=None):
        out = {}
        for entry in sorted(os.listdir(root)):
            p = os.path.join(root, entry)
            if entry.startswith("event_date=") and os.path.isdir(p):
                if entry_prefix and not entry.startswith(entry_prefix):
                    continue
                for f in sorted(os.listdir(p)):
                    if f.endswith(".parquet"):
                        st = os.stat(os.path.join(p, f))
                        out[os.path.join(entry, f)] = (st.st_ino, st.st_size)
        return out

    untouched_before = {
        k: v for k, v in files().items() if not k.startswith(f"event_date={TARGET_DAY}")
    }
    n_rows_before = read_snapshot(spark, root).count()

    report = maintain_lake(spark, root, max_files_per_partition=1, vacuum_keep=1)
    assert report["optimized_partitions"] == [TARGET_DAY]
    assert report["optimize_version"] == 4
    # retention 1 keeps only the optimize snapshot, so the fragmented
    # day's pre-compaction files are unreferenced and reclaimed (the
    # default keep=2 would rightly hold them for v3's readers)
    assert report["vacuumed_files"] > 0

    # untouched partitions: inode-identical (nothing rewritten)
    untouched_after = {
        k: v for k, v in files().items() if not k.startswith(f"event_date={TARGET_DAY}")
    }
    assert untouched_after == untouched_before
    # the fragmented day is now one file, rows preserved everywhere
    m = _read_manifest(root, 4)
    assert len(m["files"][f"event_date={TARGET_DAY}"]) == 1
    assert read_snapshot(spark, root).count() == n_rows_before
    # stats auto-carried onto the compacted file without re-declaring
    compacted = m["files"][f"event_date={TARGET_DAY}"][0]
    assert "user_id" in m.get("stats", {}).get(compacted, {})

    # idempotence: nothing fragmented now -> no new commit
    report2 = maintain_lake(spark, root, max_files_per_partition=1, vacuum_keep=1)
    assert report2["optimize_version"] is None
    assert report2["optimized_partitions"] == []


def test_maintain_lake_keeps_rollup_view_fresh(spark, tmp_path):
    """The autopilot's OPTIMIZE is rows_preserved: a rollup view built
    before the pass still serves after it — maintenance must never
    stampede derived aggregates back to fact scans."""
    from etl_pdf_pipepline_spark.plans.matview import (
        build_rollup_view,
        rollup_view_fresh,
    )
    from etl_pdf_pipepline_spark.sources.manifest import append_commit, maintain_lake

    root = str(tmp_path / "autoview")
    view_root = str(tmp_path / "autoview_view")
    meta_root = str(tmp_path / "autoview_meta")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    append_commit(
        ev.filter(day).withColumn("event_id", F.col("event_id") + 10_000_000),
        root,
        "event_date",
        txn=("v", 1),
    )
    build_rollup_view(spark, root, SF, view_root=view_root, meta_root=meta_root)
    assert rollup_view_fresh(root, SF, meta_root=meta_root)
    maintain_lake(spark, root, max_files_per_partition=1)
    assert rollup_view_fresh(root, SF, meta_root=meta_root)  # rows_preserved honored


def test_autopilot_races_concurrent_ingest(spark, lake):
    """True-thread race (r10, the hazard VERDICT r9 named): maintain_lake
    running WHILE an ingest thread appends. Contract under every
    interleaving — no row is ever lost or compacted away:

    - append to a day the autopilot is NOT compacting → both land
      (optimistic rebase, the disjoint-partition path);
    - append into the day being compacted → either orders cleanly
      (both land) or the autopilot's scoped OPTIMIZE raises
      MergeConflictError (compacting a stale slice would drop the
      fresh rows — refusing is the correct outcome; the caller's next
      scheduled pass retries).

    The assertion is outcome-insensitive: every appended row is in the
    final snapshot, total row count is exact, and the lake stays
    readable. Run a few rounds so the threads actually interleave."""
    import threading

    from etl_pdf_pipepline_spark.sources.manifest import (
        MergeConflictError,
        append_commit,
        maintain_lake,
    )

    root, ev = lake
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    expected = read_snapshot(spark, root).count()
    batch_src = ev.filter(day).limit(40).select("*").cache()
    batch_src.count()

    maint_errors: list[Exception] = []
    for rnd in range(3):
        # fragment TARGET_DAY so the autopilot has real work
        frag = batch_src.filter(F.col("user_id") % 7 == rnd)
        n_frag = frag.count()
        append_commit(frag, root, "event_date", txn=("frag", rnd))
        expected += n_frag

        racing = batch_src.filter(F.col("user_id") % 7 == rnd + 3)
        n_race = racing.count()

        def ingest():
            append_commit(racing, root, "event_date", txn=("race", rnd))

        def maintain():
            try:
                maintain_lake(spark, root, max_files_per_partition=1)
            except MergeConflictError as e:
                maint_errors.append(e)  # legal loser outcome, not a bug

        t1 = threading.Thread(target=ingest)
        t2 = threading.Thread(target=maintain)
        t1.start(); t2.start()
        t1.join(); t2.join()
        expected += n_race
        assert read_snapshot(spark, root).count() == expected

    batch_src.unpersist()
    # whatever mix of outcomes occurred, a final quiesced pass converges
    maintain_lake(spark, root, max_files_per_partition=1)
    assert read_snapshot(spark, root).count() == expected
    # and after it, nothing is fragmented above the policy threshold
    from etl_pdf_pipepline_spark.sources.manifest import fragmented_partitions

    assert fragmented_partitions(root, 1) == []


def test_changed_files_touches_only_rewritten_partitions(spark, lake):
    """The CDF planning core: the v1→v2 file delta names files ONLY
    under the partitions the merge rewrote (TARGET_DAY and the
    insert-shifted day after); every other day's files appear in
    neither list — the O(changed partitions) I/O bound the reader
    depends on."""
    import datetime

    from etl_pdf_pipepline_spark.sources.manifest import changed_files

    root, ev = lake
    assert _apply_merge(spark, root, ev) == 2
    added, removed = changed_files(root, 1, 2)
    assert added and removed
    d0 = datetime.date.fromisoformat(TARGET_DAY)
    allowed = {f"event_date={d0}", f"event_date={d0 + datetime.timedelta(days=1)}"}
    for rel in added + removed:
        assert rel.split(os.sep)[0] in allowed, rel
    # the delta is disjoint: a file is added xor removed, never both
    assert not set(added) & set(removed)


def test_read_file_list_partition_values_and_empty_side(spark, lake):
    """read_file_list keeps partition-directory values (basePath read)
    and an empty list yields an empty frame in the version's committed
    schema — the shape a one-sided partition diff needs."""
    from etl_pdf_pipepline_spark.sources.manifest import changed_files, read_file_list

    root, ev = lake
    _apply_merge(spark, root, ev)
    added, removed = changed_files(root, 1, 2)
    post = read_file_list(spark, root, added, 2)
    assert "event_date" in post.columns and post.count() > 0
    empty = read_file_list(spark, root, [], 1)
    assert empty.count() == 0
    assert empty.columns == post.columns


# --- Merge-on-read deletion vectors -------------------------------------


def _dv_keys(ev):
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    return ev.filter(day & (F.col("user_id") % 13 == 0)).select("event_id", "event_date")


def test_delete_commit_rewrites_nothing_and_masks_reads(spark, lake):
    """A DV delete commits without touching any data file (empty
    changed_files delta), masks the keys in the new snapshot, and leaves
    the prior version time-travel-readable with the rows present."""
    from etl_pdf_pipepline_spark.sources.manifest import changed_files, delete_commit

    root, ev = lake
    keys = {r[0] for r in _dv_keys(ev).collect()}
    assert keys
    v2 = delete_commit(spark, root, _dv_keys(ev), "event_id")
    assert v2 == 2
    assert changed_files(root, 1, 2) == ([], [])
    now = {r[0] for r in read_snapshot(spark, root).select("event_id").collect()}
    before = {r[0] for r in read_snapshot(spark, root, 1).select("event_id").collect()}
    assert keys <= before
    assert not keys & now
    assert before - keys == now


def test_delete_commit_idempotent_on_no_hits(spark, lake):
    """Keys matching no live row commit nothing (replay-safe)."""
    from etl_pdf_pipepline_spark.sources.manifest import delete_commit

    root, ev = lake
    ghost = ev.select((F.col("event_id") + 10**15).alias("event_id"), "event_date")
    assert delete_commit(spark, root, ghost, "event_id") == 1
    # and a replay of a real delete after it landed is also a no-op
    from etl_pdf_pipepline_spark.sources.manifest import latest_version

    assert delete_commit(spark, root, _dv_keys(ev), "event_id") == 2
    assert delete_commit(spark, root, _dv_keys(ev), "event_id") == 2
    assert latest_version(root) == 2


def test_purge_materializes_and_is_rows_preserved(spark, lake):
    """purge_deletes rewrites only the masked partitions, clears
    delete_files, keeps rows identical to the masked read, and is
    rows_preserved — downstream freshness survives like an OPTIMIZE."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _read_manifest,
        changed_files,
        delete_commit,
        latest_version,
        purge_deletes,
        rows_changed_since,
    )

    root, ev = lake
    v2 = delete_commit(spark, root, _dv_keys(ev), "event_id")
    masked = sorted(tuple(r) for r in read_snapshot(spark, root, v2).collect())
    assert purge_deletes(spark, root) == [TARGET_DAY]
    v3 = latest_version(root)
    assert v3 == v2 + 1
    assert "delete_files" not in _read_manifest(root, v3)
    assert not rows_changed_since(root, v2)
    after = sorted(tuple(r) for r in read_snapshot(spark, root, v3).collect())
    assert masked == after
    added, removed = changed_files(root, v2, v3)
    assert {rel.split(os.sep)[0] for rel in added + removed} == {
        f"event_date={TARGET_DAY}"
    }
    # nothing left to purge
    assert purge_deletes(spark, root) == []


def test_dv_is_file_scoped_reinsert_visible_after_rewrite(spark, lake):
    """The mask binds to the file, not the key: after a rewrite of the
    masked partition re-inserts a deleted key, the key is visible again
    (its new file is one the DV never names) — no tombstone leakage."""
    from etl_pdf_pipepline_spark.sources.manifest import delete_commit, merge_commit

    root, ev = lake
    victim = _dv_keys(ev).limit(1).collect()[0]
    one_key = spark.createDataFrame(
        [(victim["event_id"], victim["event_date"])], ["event_id", "event_date"]
    )
    v2 = delete_commit(spark, root, one_key, "event_id")
    snap = read_snapshot(spark, root, v2)
    assert snap.filter(F.col("event_id") == victim["event_id"]).count() == 0
    # rewrite the partition from the masked read, re-inserting the row
    reinserted = ev.filter(F.col("event_id") == victim["event_id"])
    part = snap.filter(F.col("event_date") == victim["event_date"]).unionByName(
        reinserted
    )
    merge_commit(
        part, root, "event_date",
        changed_partitions=[str(victim["event_date"])], base_version=v2,
    )
    now = read_snapshot(spark, root)
    assert now.filter(F.col("event_id") == victim["event_id"]).count() == 1


def test_append_carries_deletion_vectors(spark, lake):
    """An append after a DV delete must keep the mask (appends rewrite
    nothing, so dropping the vectors would resurrect the rows)."""
    from etl_pdf_pipepline_spark.sources.manifest import append_commit, delete_commit

    root, ev = lake
    keys = {r[0] for r in _dv_keys(ev).collect()}
    delete_commit(spark, root, _dv_keys(ev), "event_id")
    extra = ev.limit(50).withColumn("event_id", F.col("event_id") + 10**12)
    append_commit(extra, root, "event_date")
    now = {r[0] for r in read_snapshot(spark, root).select("event_id").collect()}
    assert not keys & now
    assert {r[0] + 10**12 for r in ev.limit(50).select("event_id").collect()} <= now


def test_vacuum_reclaims_orphaned_dv_files(spark, lake):
    """After purge + retention expiry, the DV parquet is referenced by
    no kept manifest and vacuum removes it with the dead data files."""
    from etl_pdf_pipepline_spark.sources.manifest import delete_commit, purge_deletes

    root, ev = lake
    delete_commit(spark, root, _dv_keys(ev), "event_id")
    purge_deletes(spark, root)
    dv_dir = os.path.join(root, "_deletes")
    assert os.listdir(dv_dir)
    deleted = vacuum(root, keep_versions=1)
    assert any(rel.startswith("_deletes") for rel in deleted)
    assert not os.listdir(dv_dir)
    # the purged snapshot still reads clean
    assert read_snapshot(spark, root).count() > 0


def test_changed_partitions_between_recovers_touched_days(spark, lake):
    """The decoupled-refresher hand-off: from versions alone, the
    manifest diff names exactly the merge's touched days; an OPTIMIZE
    also shows (its partitions changed files) — callers gate on
    rows_changed_since for aggregate freshness, not on this list."""
    import datetime

    from etl_pdf_pipepline_spark.sources.manifest import (
        changed_partitions_between,
        optimize_commit,
    )

    root, ev = lake
    assert _apply_merge(spark, root, ev) == 2
    d0 = datetime.date.fromisoformat(TARGET_DAY)
    assert changed_partitions_between(root, 1, 2) == sorted(
        [str(d0), str(d0 + datetime.timedelta(days=1))]
    )
    v3 = optimize_commit(spark, root, partition_values=[str(d0)])
    assert changed_partitions_between(root, 2, v3) == [str(d0)]
    # spanning diff covers both commits
    assert str(d0 + datetime.timedelta(days=1)) in changed_partitions_between(root, 1, v3)


def test_dv_scoped_by_partition_relative_path_not_basename(spark, tmp_path):
    """partitionBy writes the SAME part-file basename into every
    partition directory of a write job, so a DV keyed by bare file name
    would mask rows in sibling partitions. Regression: the same key
    value lives in two partitions (written in one job → colliding
    basenames); deleting it scoped to ONE partition must leave the
    other partition's row visible."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        delete_commit,
        init_versioned_lake,
    )

    root = str(tmp_path / "twinlake")
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y"), (2, "a", "z")],
        "k long, part string, payload string",
    ).coalesce(1)
    init_versioned_lake(df, root, "part")
    keys = spark.createDataFrame([(1, "a")], "k long, part string")
    v2 = delete_commit(spark, root, keys, "k")
    assert v2 == 2
    got = {
        (r.k, r.part) for r in read_snapshot(spark, root).select("k", "part").collect()
    }
    assert got == {(1, "b"), (2, "a")}


def test_delete_commit_rebases_over_interleaved_append(spark, lake, monkeypatch):
    """A DV commutes with an append: when another writer claims the
    version slot between the delete's snapshot pin and its publish, the
    delete rebases onto the new head and lands — both commits survive,
    masked keys stay masked, appended rows stay visible."""
    import etl_pdf_pipepline_spark.sources.manifest as M

    root, ev = lake
    keys = {r[0] for r in _dv_keys(ev).collect()}
    extra = ev.limit(10).withColumn("event_id", F.col("event_id") + 10**12)
    real = M._commit_manifest
    state = {"fired": False}

    def racy(root_, manifest, base_version=None):
        if not state["fired"]:
            state["fired"] = True
            M.append_commit(extra, root_, "event_date")
        return real(root_, manifest, base_version=base_version)

    monkeypatch.setattr(M, "_commit_manifest", racy)
    v = M.delete_commit(spark, root, _dv_keys(ev), "event_id")
    assert v == M.latest_version(root) == 3  # append took v2, delete rebased to v3
    now = {r[0] for r in read_snapshot(spark, root).select("event_id").collect()}
    assert not keys & now
    assert {r[0] + 10**12 for r in ev.limit(10).select("event_id").collect()} <= now


def test_delete_commit_conflicts_when_masked_file_rewritten(spark, lake, monkeypatch):
    """When the interleaved commit REWRITES a file the vector masks, the
    delete's row locations are stale — it must raise MergeConflictError
    (re-running after a re-read is cheap and idempotent), never publish
    a mask over a file the snapshot no longer references."""
    import pytest as _pytest

    import etl_pdf_pipepline_spark.sources.manifest as M

    root, ev = lake
    real = M._commit_manifest
    state = {"fired": False}

    def racy(root_, manifest, base_version=None):
        if not state["fired"]:
            state["fired"] = True
            _apply_merge(spark, root_, ev)  # rewrites TARGET_DAY's files
        return real(root_, manifest, base_version=base_version)

    monkeypatch.setattr(M, "_commit_manifest", racy)
    with _pytest.raises(M.MergeConflictError):
        M.delete_commit(spark, root, _dv_keys(ev), "event_id")


def test_merge_conflicts_with_interleaved_dv(spark, lake, monkeypatch):
    """The reverse of the previous race (ADVICE r10, high): a
    delete_commit lands BETWEEN a merge's read and its publish. Files
    are unchanged by the DV, so the file-level disjointness check alone
    would rebase — but the merge slice was read pre-delete, and its
    rewrite of the masked partition would re-materialize the deleted
    rows while the carry rule drops the vector (its file is no longer
    live). The publish must raise MergeConflictError, never silently
    lose a committed delete."""
    import pytest as _pytest

    import etl_pdf_pipepline_spark.sources.manifest as M

    root, ev = lake
    real = M._commit_manifest
    state = {"fired": False}

    def racy(root_, manifest, base_version=None):
        # fire the interleaved DV only on the MERGE's publish attempt
        # (the delete_commit inside recurses through this patch)
        if not state["fired"] and "delete_files" not in manifest:
            state["fired"] = True
            M.delete_commit(spark, root_, _dv_keys(ev), "event_id")
        return real(root_, manifest, base_version=base_version)

    monkeypatch.setattr(M, "_commit_manifest", racy)
    with _pytest.raises(M.MergeConflictError):
        _apply_merge(spark, root, ev)  # rewrites TARGET_DAY, which the DV masks
    # the committed delete survived: masked keys absent from the head
    keys = {r[0] for r in _dv_keys(ev).collect()}
    now = {r[0] for r in read_snapshot(spark, root).select("event_id").collect()}
    assert not keys & now


def test_merge_rebases_over_disjoint_dv(lake):
    """A DV masking only OTHER partitions commutes with the merge: the
    publish rebases, lands, and carries the vector forward — raising
    here would serialize every delete against every merge."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        _publish_merge,
        _read_manifest,
    )

    root, _ = lake
    base = _read_manifest(root, 1)
    day15 = f"event_date={TARGET_DAY}"
    day16 = "event_date=2024-01-16"
    masked_rel = base["files"][day16][0]

    # interleaved delete_commit-shaped manifest: files unchanged, one
    # vector over a day-16 file
    _commit_manifest(
        root,
        {
            "partition_col": "event_date",
            "files": dict(base["files"]),
            "delete_files": [{"path": "_deletes/dv-test", "files": [masked_rel]}],
            "delete_key": "event_id",
        },
    )

    a_entry = [os.path.join(day15, "v00000002-a.parquet")]
    v = _publish_merge(
        root, "event_date", 1, base, {day15: a_entry}, set(), max_retries=3
    )
    assert v == 3
    head = _read_manifest(root, 3)
    assert head["files"][day15] == a_entry
    assert head["delete_files"] == [
        {"path": "_deletes/dv-test", "files": [masked_rel]}
    ]


def test_dv_metadata_counts_with_non_unique_key(spark, tmp_path):
    """ADVICE r10 (low): the masked read's anti-join removes EVERY row
    matching a (file, key) pair, so with a non-unique key the
    metadata-served counts must subtract the pair's matched-row count
    (recorded in the DV parquet at delete time), not 1."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        delete_commit,
        init_versioned_lake,
        partition_row_counts,
    )

    root = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "d1"), (1, "d1"), (1, "d1"), (2, "d1"), (3, "d2")],
        "event_id long, event_date string",
    ).coalesce(1)
    assert init_versioned_lake(df, root, "event_date") == 1
    keys = spark.createDataFrame([(1, "d1")], "event_id long, event_date string")
    assert delete_commit(spark, root, keys, "event_id") == 2

    masked = read_snapshot(spark, root)
    got = {
        r["event_date"]: r["n"]
        for r in masked.groupBy("event_date").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"d1": 1, "d2": 1}
    assert partition_row_counts(spark, root) == got


def test_changed_partitions_between_sees_dv_deletes(spark, lake):
    """r11: a delete_commit leaves the file lists untouched, so a
    file-only diff reported [] across it — a decoupled daemon would then
    refresh nothing, advance its freshness record, and serve the deleted
    rows from its aggregate. The DV-aware diff reports the masked
    partitions; purge's rewrite shows up via the file diff as before."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        changed_partitions_between,
        delete_commit,
        purge_deletes,
    )

    root, ev = lake
    v2 = delete_commit(spark, root, _dv_keys(ev), "event_id")
    assert v2 == 2
    assert changed_partitions_between(root, 1, 2) == [TARGET_DAY]
    purged = purge_deletes(spark, root)
    assert purged == [TARGET_DAY]
    # vector dropped + file rewritten: still exactly that day, once
    assert changed_partitions_between(root, 2, 3) == [TARGET_DAY]
    # spanning diff stable
    assert changed_partitions_between(root, 1, 3) == [TARGET_DAY]


def test_optimize_between_cdf_read_and_masked_serve(spark, lake):
    """VERDICT r10 #8: OPTIMIZE lands between a CDF consumer's change
    discovery and its DV-masked serve. The consumer pinned (v1 -> v2=DV)
    and computed its day list; OPTIMIZE then materializes the masks it
    rewrites (v3). The serve at latest must show the delete exactly once
    (no resurrection, no double-subtraction), the pinned CDF diff must
    still answer from the retained manifests, and the metadata-served
    counts must agree with the masked read at every version."""
    from etl_pdf_pipepline_spark.sources.manifest import (
        changed_partitions_between,
        delete_commit,
        optimize_commit,
        partition_row_counts,
    )

    root, ev = lake
    before = read_snapshot(spark, root).count()
    dead = {r[0] for r in _dv_keys(ev).collect()}
    assert dead
    assert delete_commit(spark, root, _dv_keys(ev), "event_id") == 2

    # consumer discovers its work list at the pinned versions
    days = changed_partitions_between(root, 1, 2)
    assert days == [TARGET_DAY]

    # OPTIMIZE interleaves: materializes the masks in the files it rewrites
    v3 = optimize_commit(spark, root)
    assert v3 == 3

    # serve at latest: delete visible exactly once
    now = read_snapshot(spark, root)
    ids = {r[0] for r in now.select("event_id").collect()}
    assert not (dead & ids)
    assert now.count() == before - len(dead)

    # pinned CDF diff still answers; spanning diff still names the day
    assert changed_partitions_between(root, 1, 2) == [TARGET_DAY]
    assert TARGET_DAY in changed_partitions_between(root, 1, 3)

    # metadata counts agree with the masked read at v2 AND at v3
    for v in (2, 3):
        served = partition_row_counts(spark, root, v)
        got = {
            str(r["event_date"]): r["n"]
            for r in read_snapshot(spark, root, v)
            .groupBy("event_date")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert served == got, f"v{v}: {served} != {got}"
