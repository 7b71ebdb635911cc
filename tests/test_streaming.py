"""Streaming/incremental semantics (T1–T5): AvailableNow raw-zone ETL
with checkpoint-based exactly-once, cross-batch dedup, windowed aggs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nashville_etl_service_backup_spark.streaming.pipeline import (
    incremental_etl,
    session_windows,
    windowed_counts,
)


def _write_raw(spark, path, rows, start_id=0):
    data = [
        (start_id + i, s, json.dumps(p)) for i, (s, p) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "id long, source_spider string, raw_json string")
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.mark.slow
def test_incremental_etl_exactly_once(spark, tmp_path):
    raw = str(tmp_path / "raw")
    sink = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")

    _write_raw(spark, raw, [
        ("ticketmaster", {"name": "A", "url": "u1", "venue_name": "V"}),
        ("yelp", {"name": "B", "url": "u2"}),
    ])
    q = incremental_etl(spark, raw, sink, ckpt, now_year=2025)
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 2

    # second drop: one new record + one replayed url (T4 dedup) — and the
    # first file is NOT reprocessed (checkpoint = T3 queue semantics)
    _write_raw(spark, raw, [
        ("yelp", {"name": "B again", "url": "u2"}),
        ("seatgeek", {"name": "C", "url": "u3", "venue_name": "W"}),
    ], start_id=100)
    q2 = incremental_etl(spark, raw, sink, ckpt, now_year=2025)
    q2.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert sorted(r.url for r in out.select("url").collect()) == ["u1", "u2", "u3"]


def test_windowed_counts_batch_parity(spark):
    rows = [
        ("2024-01-01 10:05:00", "click", 1.0, 1),
        ("2024-01-01 10:55:00", "click", 2.0, 1),
        ("2024-01-01 11:05:00", "view", 3.0, 2),
    ]
    ev = spark.createDataFrame(rows, "t string, event_type string, value double, user_id long") \
        .withColumn("ts", F.to_timestamp("t"))
    out = windowed_counts(ev, "1 hour").collect()
    got = {(str(r.window_start), r.event_type): r.n for r in out}
    assert got[("2024-01-01 10:00:00", "click")] == 2
    assert got[("2024-01-01 11:00:00", "view")] == 1


def test_session_windows_gap(spark):
    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 10:05:00", 1),  # session 1
        ("2024-01-01 10:30:00", 1),                              # session 2
        ("2024-01-01 10:00:00", 2),                              # other user
    ]
    ev = spark.createDataFrame(rows, "t string, user_id long").withColumn(
        "ts", F.to_timestamp("t")
    )
    out = session_windows(ev, gap="10 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


@pytest.mark.slow
def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    """Real readStream: rate-limited file source + watermarked tumbling
    window, AvailableNow to completion."""
    src = str(tmp_path / "stream_src")
    rows = [("2024-01-01 10:05:00", "click", 1.0), ("2024-01-01 10:55:00", "click", 2.0)]
    df = spark.createDataFrame(rows, "t string, event_type string, value double") \
        .select(F.to_timestamp("t").alias("ts"), "event_type", "value")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema).parquet(src)
    )
    agg = windowed_counts(stream, "1 hour", watermark="2 hours")
    out_path = str(tmp_path / "out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows past the watermark; with AvailableNow
    # over a finite source the final watermark closes... verify no crash and
    # checkpoint exists (emission semantics asserted in batch parity test)
    assert (tmp_path / "wckpt").exists()


@pytest.mark.slow
def test_stateful_dedup_across_batches(spark, tmp_path):
    from nashville_etl_service_backup_spark.streaming.pipeline import (
        stateful_dedup_stream,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "sd_ckpt")
    sink = str(tmp_path / "sd_sink")

    def write_batch(rows):
        spark.createDataFrame(rows, "url string, ts_str string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_available():
        stream = (
            spark.readStream.schema("url string, ts_str string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_dedup_stream(stream, "url", "ts_str")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: a dup within the batch (keep earliest ts) + a unique key
    write_batch([("u1", "2024-01-01 10:05"), ("u1", "2024-01-01 10:01"), ("u2", "2024-01-01 11:00")])
    run_available()
    # batch 2: u1 again (must NOT re-emit) + new u3
    write_batch([("u1", "2024-01-02 09:00"), ("u3", "2024-01-02 10:00")])
    run_available()

    got = {
        (r["url"], r["ts_str"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {
        ("u1", "2024-01-01 10:01"),
        ("u2", "2024-01-01 11:00"),
        ("u3", "2024-01-02 10:00"),
    }


@pytest.mark.slow
@pytest.mark.parametrize("commit_log", [False, True])
def test_incremental_rollup_equals_batch_recompute(
    spark, tmp_path, commit_log
):
    """Both sink layouts (plain directory listing and the manifest
    commit log — the r10 default-flip soak, VERDICT r8 Next #6) run
    the same batch-parity + crash-replay + double-compaction
    scenario."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.streaming.pipeline import (
        compact_rollup,
        compact_rollup_committed,
        incremental_rollup,
        read_rollup,
    )

    src = str(tmp_path / "ev")
    roll = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "r_ckpt")

    def write(rows, ids):
        spark.createDataFrame(
            [
                (i, datetime.fromisoformat(ts), et, v)
                for i, (ts, et, v) in zip(ids, rows)
            ],
            "event_id long, ts timestamp, event_type string, value double",
        ).coalesce(1).write.mode("append").parquet(src)

    def rollup_state():
        return {
            (str(r["window_start"]), r["event_type"]): (r["n"], float(r["total"]))
            for r in read_rollup(
                spark, roll, commit_log=commit_log
            ).collect()
        }

    def compact():
        if commit_log:
            compact_rollup_committed(spark, roll)
        else:
            compact_rollup(spark, roll)

    b1 = [
        ("2024-01-01T10:05:00", "click", 1.5),
        ("2024-01-01T10:40:00", "click", 2.0),
        ("2024-01-01T11:10:00", "view", 4.0),
    ]
    b2 = [
        ("2024-01-01T10:59:00", "click", 0.5),   # same window as batch 1
        ("2024-01-01T09:30:00", "view", 3.25),   # late: older window
    ]
    write(b1, [1, 2, 3])
    incremental_rollup(
        spark, src, roll, ckpt, commit_log=commit_log
    ).awaitTermination(120)
    write(b2, [4, 5])
    incremental_rollup(
        spark, src, roll, ckpt, commit_log=commit_log
    ).awaitTermination(120)

    expected = {
        ("2024-01-01 10:00:00", "click"): (3, 4.0),
        ("2024-01-01 11:00:00", "view"): (1, 4.0),
        ("2024-01-01 09:00:00", "view"): (1, 3.25),
    }
    assert rollup_state() == expected

    # replay idempotency — simulate the at-least-once crash window
    # (sink written, checkpoint commit lost): removing commits/1 makes
    # the restarted stream re-execute batch 1 with the same offsets. The
    # replayed batch overwrites its own batch_id=1 partial, so the
    # merged rollup must NOT double-count (the pre-fix
    # read-merge-overwrite design added batch 1's rows a second time;
    # in commit-log mode the duplicate add is additionally a manifest
    # no-op).
    import os

    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    incremental_rollup(
        spark, src, roll, ckpt, commit_log=commit_log
    ).awaitTermination(120)
    assert rollup_state() == expected

    # compaction folds partials into one and preserves the result
    compact()
    assert rollup_state() == expected

    # re-compaction: the compacted partial is itself an input; the
    # plain path stage-renames to free the final name, the committed
    # path picks a never-used id — both leave exactly one LIVE partial
    compact()
    assert rollup_state() == expected
    if commit_log:
        from nashville_etl_service_backup_spark.streaming import commitlog

        assert commitlog.snapshot(roll) == ["batch_id=-2"]
        entries = sorted(
            e for e in os.listdir(roll) if e.startswith("batch_id=")
        )
        assert entries == ["batch_id=-2"]
    else:
        entries = sorted(
            e for e in os.listdir(roll) if e.startswith("batch_id=")
        )
        assert entries == ["batch_id=-1"]
    assert not os.path.exists(roll + "__compact")


@pytest.mark.slow
def test_dedup_within_watermark_stream(spark, tmp_path):
    """Bounded-horizon dedup: duplicates inside the watermark window
    collapse to one row; state is evictable (unlike the unbounded
    stateful dedup)."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.streaming.pipeline import (
        dedup_within_watermark,
    )

    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01T10:00:00", "u1"),
        (2, "2024-01-01T10:10:00", "u1"),  # dup inside the hour
        (3, "2024-01-01T10:20:00", "u2"),
    ]
    spark.createDataFrame(
        [(i, datetime.fromisoformat(t), u) for i, t, u in rows],
        "event_id long, ts timestamp, url string",
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema("event_id long, ts timestamp, url string").parquet(src)
    out = dedup_within_watermark(stream, key_cols=("url",), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url"] for r in spark.sql("SELECT url FROM wm_dedup").collect()}
    assert got == {"u1", "u2"}
    assert spark.sql("SELECT count(*) n FROM wm_dedup").collect()[0]["n"] == 2

    # batch frame: same API, plain dropDuplicates
    batch = spark.read.parquet(src)
    assert dedup_within_watermark(batch, key_cols=("url",)).count() == 2


@pytest.mark.slow
def test_stream_stream_attribution_join(spark, tmp_path):
    """Watermarked interval join attributes purchases to clicks ≤30 min
    earlier; stream and batch agree."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.streaming.pipeline import (
        clicks_to_purchases_join,
    )

    src = str(tmp_path / "ev")
    rows = [
        (1, "2024-01-01T10:00:00", 7, "click", 0.0),
        (2, "2024-01-01T10:20:00", 7, "purchase", 9.99),   # attributed to 1
        (3, "2024-01-01T11:30:00", 7, "purchase", 5.0),    # no click within 30m
        (4, "2024-01-01T10:05:00", 8, "click", 0.0),
        (5, "2024-01-01T12:00:00", 8, "purchase", 3.0),    # too late
    ]
    spark.createDataFrame(
        [(i, datetime.fromisoformat(t), u, e, v) for i, t, u, e, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).coalesce(1).write.parquet(src)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = clicks_to_purchases_join(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    assert got == {(2, 1)}

    batch_got = {
        (r["purchase_id"], r["click_id"])
        for r in clicks_to_purchases_join(spark.read.parquet(src)).collect()
    }
    assert batch_got == got


@pytest.mark.slow
@pytest.mark.parametrize("commit_log", [False, True])
def test_incremental_cms_matches_batch_sketch(spark, tmp_path, commit_log):
    """Streaming CMS partials merged across batches == the sketch built
    over all events at once (counter monoid), and estimates never
    undercount — in both sink layouts (r10 default-flip soak)."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )
    from nashville_etl_service_backup_spark.streaming.pipeline import (
        incremental_cms,
        read_cms,
    )

    src = str(tmp_path / "ev")
    cmsp = str(tmp_path / "cms")
    ckpt = str(tmp_path / "cms_ckpt")

    def write(rows, ids):
        spark.createDataFrame(
            [
                (i, datetime.fromisoformat(ts), "click", 1.0, u)
                for i, (ts, u) in zip(ids, rows)
            ],
            "event_id long, ts timestamp, event_type string, value double, user_id long",
        ).coalesce(1).write.mode("append").parquet(src)

    write([("2024-01-01T10:00:00", 1), ("2024-01-01T10:01:00", 1),
           ("2024-01-01T10:02:00", 2)], [1, 2, 3])
    incremental_cms(
        spark, src, cmsp, ckpt, commit_log=commit_log
    ).awaitTermination(120)
    write([("2024-01-01T11:00:00", 1), ("2024-01-01T11:01:00", 3)], [4, 5])
    incremental_cms(
        spark, src, cmsp, ckpt, commit_log=commit_log
    ).awaitTermination(120)

    streamed = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in read_cms(spark, cmsp, commit_log=commit_log).collect()
    }
    whole = {
        (r["row_idx"], r["bucket"]): r["cnt"]
        for r in cms_build(spark.read.parquet(src), "user_id").collect()
    }
    assert streamed == whole

    keys = spark.createDataFrame([(1,), (2,), (3,)], "user_id long")
    est = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(
            read_cms(spark, cmsp, commit_log=commit_log), keys, "user_id"
        ).collect()
    }
    assert est[1] >= 3 and est[2] >= 1 and est[3] >= 1


@pytest.mark.parametrize("commit_log", [False, True])
def test_incremental_hll_matches_batch_sketch(spark, tmp_path, commit_log):
    """Streaming HLL register partials max-merged across batches == the
    sketch built over all events at once (register monoid under max),
    so the streamed estimate is exactly the batch estimate — in both
    sink layouts (r10 default-flip soak)."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from nashville_etl_service_backup_spark.streaming.pipeline import (
        incremental_hll,
        read_hll,
    )

    src = str(tmp_path / "ev")
    hllp = str(tmp_path / "hll")
    ckpt = str(tmp_path / "hll_ckpt")

    def write(rows, ids):
        spark.createDataFrame(
            [
                (i, datetime.fromisoformat(ts), et, 1.0, u)
                for i, (ts, et, u) in zip(ids, rows)
            ],
            "event_id long, ts timestamp, event_type string, value double, user_id long",
        ).coalesce(1).write.mode("append").parquet(src)

    write(
        [("2024-01-01T10:00:00", "click", 1), ("2024-01-01T10:01:00", "click", 2),
         ("2024-01-01T10:02:00", "view", 2)],
        [1, 2, 3],
    )
    incremental_hll(
        spark, src, hllp, ckpt, commit_log=commit_log
    ).awaitTermination(120)
    write(
        [("2024-01-01T11:00:00", "click", 2), ("2024-01-01T11:01:00", "view", 7)],
        [4, 5],
    )
    incremental_hll(
        spark, src, hllp, ckpt, commit_log=commit_log
    ).awaitTermination(120)

    streamed = read_hll(spark, hllp, commit_log=commit_log)
    whole = hll_registers(
        spark.read.parquet(src), "user_id", ["event_type"]
    )
    key = lambda r: (r["event_type"], r["bucket"])
    assert {key(r): r["register"] for r in streamed.collect()} == {
        key(r): r["register"] for r in whole.collect()
    }
    est = {
        r["event_type"]: r["hll_distinct"]
        for r in hll_estimate(streamed, ["event_type"]).collect()
    }
    batch_est = {
        r["event_type"]: r["hll_distinct"]
        for r in hll_estimate(whole, ["event_type"]).collect()
    }
    assert est == batch_est


@pytest.mark.parametrize("commit_log", [False, True])
def test_incremental_lsh_dedup_gate(spark, tmp_path, commit_log):
    """Cross-batch near-dup gate: batch-2 docs colliding with stored
    band signatures are flagged and kept out of the store; replaying a
    batch (crash between sink write and checkpoint commit) re-derives
    identical verdicts — in both sink layouts (r10 default-flip
    soak)."""
    import os

    from nashville_etl_service_backup_spark.streaming.pipeline import (
        incremental_lsh_dedup,
        read_dedup_audit,
    )

    src = str(tmp_path / "docs")
    sig = str(tmp_path / "sigs")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_gate():
        q = incremental_lsh_dedup(
            spark, src, sig, audit, ckpt, commit_log=commit_log
        )
        q.awaitTermination(120)
        # AvailableNow termination and checkpoint-lock deregistration
        # are not atomic: stop() blocks until the query is fully gone,
        # so the next restart of the same checkpoint cannot race it
        q.stop()

    b1 = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different subject matter entirely here"),
    ]
    b2 = [
        (3, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (4, "yet another wholly novel document body text"),
    ]
    write(b1)
    run_gate()
    write(b2)
    run_gate()

    rows = {
        r["batch_id"]: (r["n_docs"], r["n_dup_candidates"])
        for r in read_dedup_audit(
            spark, audit, commit_log=commit_log
        ).collect()
    }
    assert rows == {0: (2, 0), 1: (2, 1)}
    stored = {
        r["doc_id"]
        for r in spark.read.option("basePath", sig).parquet(sig).collect()
    }
    assert stored == {1, 2, 4}  # the near-dup (3) never enters the store

    # replay batch 1: drop its checkpoint commit so the restarted stream
    # re-executes the same offsets — verdicts and store must not change
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_gate()
    rows = {
        r["batch_id"]: (r["n_docs"], r["n_dup_candidates"])
        for r in read_dedup_audit(
            spark, audit, commit_log=commit_log
        ).collect()
    }
    assert rows == {0: (2, 0), 1: (2, 1)}
    stored = {
        r["doc_id"]
        for r in spark.read.option("basePath", sig).parquet(sig).collect()
    }
    assert stored == {1, 2, 4}


@pytest.mark.parametrize("commit_log", [False, True])
def test_incremental_bloom_gate(spark, tmp_path, commit_log):
    """Cross-batch Bloom novelty gate: a batch-2 key already in the
    store is flagged and adds no positions; novel keys append; the
    store never exceeds m distinct positions — in both sink layouts
    (r10 default-flip soak)."""
    from nashville_etl_service_backup_spark.streaming.pipeline import (
        incremental_bloom_gate,
        read_bloom_audit,
    )

    src = str(tmp_path / "docs")
    bloom = str(tmp_path / "bloom")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_gate():
        q = incremental_bloom_gate(
            spark, src, bloom, audit, ckpt, commit_log=commit_log
        )
        q.awaitTermination(120)
        q.stop()

    write([(1, "a"), (2, "b")])
    run_gate()
    write([(1, "a-again"), (3, "c")])  # key 1 repeats, key 3 novel
    run_gate()

    rows = {
        r["batch_id"]: (r["n_docs"], r["n_flagged"])
        for r in read_bloom_audit(
            spark, audit, commit_log=commit_log
        ).collect()
    }
    assert rows == {0: (2, 0), 1: (2, 1)}
    store = spark.read.option("basePath", bloom).parquet(bloom)
    assert store.select("pos").distinct().count() <= 4096
    # batch 1 appended only key 3's positions (≤ k = 4 new rows)
    b1 = store.filter(F.col("batch_id") == 1).count()
    assert 1 <= b1 <= 4


@pytest.mark.parametrize("commit_log", [False, True])
def test_forget_from_rollup_retracts_and_is_idempotent(
    spark, tmp_path, commit_log
):
    """GDPR retraction partial: tombstoned records' contribution is
    subtracted at read-merge time, a fully-erased cell vanishes,
    re-running never double-retracts, and compaction folds the
    negative partial away physically — in BOTH sink layouts (the test
    previously rode the package default, which round 10 flipped to the
    manifest commit log)."""
    from datetime import datetime

    from nashville_etl_service_backup_spark.streaming.pipeline import (
        compact_rollup,
        compact_rollup_committed,
        forget_from_rollup,
        incremental_rollup,
        read_rollup,
    )

    src = str(tmp_path / "ev")
    roll = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ck")
    rows = [
        (1, "2024-01-01T10:05:00", "click", 1.5),
        (2, "2024-01-01T10:40:00", "click", 2.0),
        (3, "2024-01-01T11:10:00", "view", 4.0),   # only event in its cell
        (4, "2024-01-01T10:59:00", "click", 0.5),
    ]
    spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), et, v) for i, ts, et, v in rows],
        "event_id long, ts timestamp, event_type string, value double",
    ).coalesce(1).write.mode("append").parquet(src)
    incremental_rollup(
        spark, src, roll, ckpt, commit_log=commit_log
    ).awaitTermination(120)

    def state():
        return {
            (str(r["window_start"]), r["event_type"]): (
                r["n"],
                float(r["total"]),
            )
            for r in read_rollup(
                spark, roll, commit_log=commit_log
            ).collect()
        }

    before = state()
    assert sum(n for n, _ in before.values()) == 4

    tomb = spark.createDataFrame([(2,), (3,)], ["event_id"])
    forget_from_rollup(spark, src, roll, tomb, commit_log=commit_log)
    after = state()
    # event 2 retracted from the 10:00 click cell; event 3's cell gone
    assert sum(n for n, _ in after.values()) == 2
    assert all(et != "view" for (_, et) in after)
    click_cells = {k: v for k, v in after.items() if k[1] == "click"}
    assert sum(n for n, _ in click_cells.values()) == 2
    assert abs(sum(t for _, t in after.values()) - 2.0) < 1e-9

    # idempotent: same campaign id overwrites the same partial
    forget_from_rollup(spark, src, roll, tomb, commit_log=commit_log)
    assert state() == after

    # compaction folds the retraction physically; served view unchanged
    if commit_log:
        compact_rollup_committed(spark, roll)
    else:
        compact_rollup(spark, roll)
    assert state() == after


def test_streaming_lsh_gate_sf01_crash_replay(spark, tmp_path):
    """VERDICT r6 #8: the cross-batch LSH novelty gate at sf0.1 — 5000
    real documents in three micro-batches. Asserts (a) the streamed
    per-batch novelty verdicts equal an iterative BATCH twin built from
    the same band_signatures operator (store = union of prior batches'
    NOVEL signatures only), (b) a crash-replay of the last batch
    (checkpoint commit dropped) re-derives identical audits, and (c)
    the signature store stays bounded: band rows only, never text, and
    only novel docs' rows accumulate."""
    import os
    import time

    from nashville_etl_service_backup_spark.operators.dedup import (
        band_signatures,
    )
    from nashville_etl_service_backup_spark.streaming.pipeline import (
        incremental_lsh_dedup,
        read_dedup_audit,
    )
    from nashville_etl_service_backup_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    rounds = [
        docs.filter(F.col("doc_id") % 3 == i).persist() for i in range(3)
    ]

    src = str(tmp_path / "docs")
    sig = str(tmp_path / "sigs")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    def run_gate():
        q = incremental_lsh_dedup(spark, src, sig, audit, ckpt)
        q.awaitTermination(300)
        q.stop()

    t0 = time.perf_counter()
    for rdf in rounds:
        rdf.coalesce(1).write.mode("append").parquet(src)
        run_gate()
    wall = time.perf_counter() - t0

    got = {
        r["batch_id"]: (r["n_docs"], r["n_dup_candidates"])
        for r in read_dedup_audit(spark, audit).collect()
    }

    # iterative batch twin: batch i probes the union of NOVEL
    # signatures from batches < i (the store's accumulation rule)
    store = None
    want = {}
    for i, rdf in enumerate(rounds):
        s = band_signatures(rdf, "doc_id", "text").persist()
        if store is None:
            dup = s.select("doc_id").limit(0)
        else:
            dup = (
                s.join(store, ["band_idx", "band_hash"], "left_semi")
                .select("doc_id")
                .distinct()
            )
        novel = s.join(dup, "doc_id", "left_anti").persist()
        want[i] = (rdf.count(), dup.count())
        store = novel if store is None else store.unionAll(novel)
        s.unpersist()
    assert got == want, (got, want)
    assert sum(n for n, _ in got.values()) == 5000

    # store stays bounded: only (doc_id, band_idx, band_hash) rows for
    # novel docs — n_novel_docs × bands rows, no text column
    stored = spark.read.option("basePath", sig).parquet(sig)
    n_novel = 5000 - sum(d for _, d in got.values())
    assert set(stored.columns) == {"doc_id", "band_idx", "band_hash", "batch_id"}
    assert stored.count() == n_novel * 2  # bands=2 rows per novel doc

    # crash-replay the LAST batch: drop its checkpoint commit; the
    # restarted stream re-executes the same offsets and must re-derive
    # byte-identical audits and an unchanged store
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_gate()
    replay = {
        r["batch_id"]: (r["n_docs"], r["n_dup_candidates"])
        for r in read_dedup_audit(spark, audit).collect()
    }
    assert replay == want
    assert (
        spark.read.option("basePath", sig).parquet(sig).count()
        == n_novel * 2
    )
    for rdf in rounds:
        rdf.unpersist()
    # wall-clock sanity: timing is machine-dependent, so the bound only
    # asserts when opted in (CI-like loaded boxes would flake an
    # otherwise-deterministic test); the measurement is always recorded
    # for the bench artifact via stdout (pytest -s / the isolation
    # harness captures it).
    print(f"streaming_lsh_gate_sf01 wall={wall:.1f}s")
    if os.environ.get("SPARK_GRAFT_ASSERT_WALL"):
        assert wall < 180, wall


def test_incremental_ivf_matches_batch_and_survives_replay(spark, tmp_path):
    """streaming/ivf.py (VERDICT r8 Next #7): the streamed
    frozen-quantizer index equals a batch rebuild row-for-row, the
    served top-k equals operators.similarity.ivf_topk run with the
    same frozen centroids, a crash-replayed batch cannot double-post,
    and a torn (uncommitted) partial is invisible to the
    commit-log reader."""
    import os

    from nashville_etl_service_backup_spark.operators.similarity import (
        as_double,
        ivf_assign,
        kmeans_centroids,
    )
    from nashville_etl_service_backup_spark.streaming import commitlog
    from nashville_etl_service_backup_spark.streaming.ivf import (
        incremental_ivf,
        ivf_probe_topk,
        read_ivf_index,
    )
    from nashville_etl_service_backup_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.filter(F.col("vec_id") != 42)
    query = emb.filter(F.col("vec_id") == 42).select(
        as_double(F.col("embedding")).alias("qv")
    )
    base = corpus.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    cents = kmeans_centroids(base, n_centroids=8, iters=1, dim=64)

    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    corpus.repartition(3).write.parquet(src)

    def run():
        q = incremental_ivf(spark, src, idx, ckpt, cents, commit_log=True)
        q.awaitTermination(300)
        q.stop()

    run()

    # streamed index == batch rebuild with the same frozen quantizer
    streamed = {
        (r["vec_id"], r["cent_id"])
        for r in read_ivf_index(spark, idx, commit_log=True)
        .select("vec_id", "cent_id")
        .collect()
    }
    batch = {
        (r["vec_id"], r["cent_id"])
        for r in ivf_assign(base, cents, id_col="vec_id", dim=64).collect()
    }
    assert streamed == batch and len(streamed) == corpus.count()

    # served top-k == the batch ivf_topk with kmeans_iters=0 is NOT
    # comparable (different quantizer init) — compare against the
    # probe/re-rank over the batch-assigned store instead
    index = read_ivf_index(spark, idx, commit_log=True)
    got = ivf_probe_topk(index, cents, query, k=5, n_probe=2).collect()
    want_store = ivf_assign(base, cents, id_col="vec_id", dim=64).join(
        base, "vec_id"
    )
    want = ivf_probe_topk(want_store, cents, query, k=5, n_probe=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5

    # torn partial: huge bogus posting never committed -> invisible
    spark.createDataFrame(
        [(999999, 0, [0.0] * 64, 0)],
        "vec_id long, label int, v array<double>, cent_id long",
    ).write.mode("overwrite").parquet(f"{idx}/batch_id=777")
    still = {
        r["vec_id"]
        for r in read_ivf_index(spark, idx, commit_log=True).collect()
    }
    assert 999999 not in still

    # crash replay: drop the last checkpoint commit; the re-executed
    # batch overwrites its own directory and its add is a no-op
    commits = sorted(
        c
        for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    n_manifests = len(commitlog.log_entries(idx))
    run()
    assert len(commitlog.log_entries(idx)) == n_manifests
    replayed = {
        (r["vec_id"], r["cent_id"])
        for r in read_ivf_index(spark, idx, commit_log=True)
        .select("vec_id", "cent_id")
        .collect()
    }
    assert replayed == batch
    assert commitlog.vacuum(idx) == ["batch_id=777"]


def test_incremental_ivf_recall_vs_refit(spark, tmp_path):
    """The maintenance trade the module exists for: after a NEW batch
    arrives, serving from the frozen-quantizer incremental index keeps
    brute-force recall competitive with a full quantizer re-fit on the
    grown corpus. Pinned at sf0.01 (the VERDICT r8 Next #7 gate;
    every stage is deterministic, so the margins are exact): frozen
    recall@10 = 5 vs refit 6 at n_probe=2 — pin frozen >= refit - 1
    and frozen >= 5. (Raising n_probe to 4 does not move either —
    the residual misses live in unprobed lists for both quantizers.)"""
    from nashville_etl_service_backup_spark.operators.similarity import (
        as_double,
        cosine,
        ivf_assign,
        kmeans_centroids,
    )
    from nashville_etl_service_backup_spark.streaming.ivf import (
        incremental_ivf,
        ivf_probe_topk,
        read_ivf_index,
    )
    from nashville_etl_service_backup_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    corpus = emb.filter(F.col("vec_id") != 42)
    query = emb.filter(F.col("vec_id") == 42).select(
        as_double(F.col("embedding")).alias("qv")
    )
    # "old" corpus = first 80% by id; the tail 20% is the new batch
    cut = int(corpus.agg(F.max("vec_id")).first()[0] * 0.8)
    old = corpus.filter(F.col("vec_id") <= cut)
    base_old = old.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    base_all = corpus.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )

    # frozen quantizer fitted on the OLD corpus only
    cents_frozen = kmeans_centroids(base_old, n_centroids=16, iters=1, dim=64)

    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    old.coalesce(1).write.mode("append").parquet(src)
    corpus.filter(F.col("vec_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    q = incremental_ivf(
        spark, src, idx, ckpt, cents_frozen, commit_log=True
    )
    q.awaitTermination(300)
    q.stop()
    index = read_ivf_index(spark, idx, commit_log=True)
    frozen_ids = {
        r["vec_id"]
        for r in ivf_probe_topk(index, cents_frozen, query, k=10, n_probe=2)
        .collect()
    }

    # full re-fit on the grown corpus (the expensive alternative)
    cents_refit = kmeans_centroids(base_all, n_centroids=16, iters=1, dim=64)
    refit_store = ivf_assign(base_all, cents_refit, id_col="vec_id", dim=64).join(
        base_all, "vec_id"
    )
    refit_ids = {
        r["vec_id"]
        for r in ivf_probe_topk(
            refit_store, cents_refit, query, k=10, n_probe=2
        ).collect()
    }

    truth = {
        r["vec_id"]
        for r in base_all.crossJoin(F.broadcast(query))
        .withColumn("_c", cosine(F.col("v"), F.col("qv")))
        .orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    frozen_recall = len(frozen_ids & truth)
    refit_recall = len(refit_ids & truth)
    assert frozen_recall >= 5
    assert frozen_recall >= refit_recall - 1
