"""Structured-streaming pipeline tests: batch parity and late-data policy
(SURVEY §2.B late_data_policy; build plan M3)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from datacooker_dist_spark.streaming.pipeline import (
    file_stream,
    run_available_now,
    windowed_counts,
)


def _write_batch(spark, path, rows):
    # numSlices=1, not coalesce(1): see stream_late_data — coalescing a
    # locally-parallelized frame serializes N Python-worker round-trips
    # into one task.
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "k string, ts timestamp"
    ).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row arriving in a later micro-batch, older than the watermark, is
    dropped from an append-mode windowed aggregate — the late-data policy."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    # Batch 1: two on-time events at 10:00-11:00 and a 13:00 event that
    # advances the watermark (wm = 13:00 - 10min = 12:50 > window end 11:00).
    _write_batch(spark, src, [("a", t0), ("a", t0.replace(minute=30)),
                              ("a", dt.datetime(2024, 1, 1, 13, 0))])

    def drain():
        stream = file_stream(spark, src, "k string, ts timestamp")
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "k", "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # Batch 2: a LATE event for the already-closed 10:00 window.
    _write_batch(spark, src, [("a", t0.replace(minute=45))])
    drain()

    out = spark.read.parquet(sink).filter(F.col("ws") == t0)
    counts = [r.n for r in out.collect()]
    # The 10:00 window was finalized with 2 events; the late 10:45 row must
    # NOT produce a second emission for that window.
    assert counts == [2], f"late row leaked into closed window: {counts}"


def test_stateful_counts_carry_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    two files → two batches (maxFilesPerTrigger=1) → second emission must
    include the first batch's counts."""
    from datacooker_dist_spark.streaming.stateful import running_counts

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    _write_batch(spark, src, [("a", t0), ("a", t0), ("b", t0)])      # file 1
    _write_batch(spark, src, [("a", t0), ("b", t0), ("b", t0)])      # file 2
    stream = file_stream(spark, src, "k string, ts timestamp")
    emitted = run_available_now(running_counts(stream, "k"), spark, "update")
    final = {
        r.k: r.n_events
        for r in emitted.groupBy("k").agg(F.max("n_events").alias("n_events")).collect()
    }
    assert final == {"a": 3, "b": 3}
    # and the per-batch emissions show the running (not per-batch) counts
    a_emissions = sorted(r.n_events for r in emitted.filter(F.col("k") == "a").collect())
    assert a_emissions[-1] == 3 and len(a_emissions) == 2


def test_stream_batch_parity(spark, tmp_path):
    """availableNow drain of a windowed count equals the batch answer."""
    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [("u", t0 + dt.timedelta(minutes=7 * i)) for i in range(40)]
    _write_batch(spark, src, rows)
    stream = file_stream(spark, src, "k string, ts timestamp")
    res = run_available_now(
        windowed_counts(stream, "ts", "1 hour", ["k"], watermark="1 hour"), spark
    )
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "k", "n_events")
    )
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, batch.collect()))


def test_restart_from_checkpoint_processes_only_new_files(spark, tmp_path):
    """Exactly-once resume: a second availableNow run against the same
    checkpoint must process only files that arrived after the first run —
    no reprocessing, no duplicates in the append sink."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "k string, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        q = (
            spark.readStream.schema("k string, v long")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([("a", 1), ("b", 2)])
    drain()
    assert spark.read.parquet(sink).count() == 2
    write([("c", 3), ("d", 4), ("e", 5)])
    drain()
    out = spark.read.parquet(sink)
    assert out.count() == 5
    assert sorted(r["k"] for r in out.collect()) == ["a", "b", "c", "d", "e"]


def test_transform_with_state_requires_protobuf_or_runs(spark):
    """Spark 4 transformWithStateInPandas operator: runs end-to-end where
    protobuf is available; raises the documented gate error where not
    (this container lacks google.protobuf — the operator's plumbing is
    still exercised up to the gate)."""
    import pytest as _pytest

    from conftest import SF_SMALL
    from datacooker_dist_spark.streaming.pipeline import run_available_now
    from datacooker_dist_spark.streaming.stateful import running_value_stats
    from datacooker_dist_spark.suite.streaming import events_stream

    stream = events_stream(spark, SF_SMALL)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError, match="protobuf"):
            running_value_stats(stream)
        return
    out = run_available_now(
        running_value_stats(stream), spark, output_mode="update"
    )
    batch = (
        spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id").count()
    )
    assert out.select("user_id").distinct().count() == batch.count()


def test_streaming_ema_carries_state_across_batches(spark, tmp_path):
    """The streaming EMA's state must seed the next batch's recurrence:
    with α=1/2, values 100 then (new batch) 200 must give 100 then 150 —
    and equal the batch-engine recurrence over the concatenated input."""
    from datacooker_dist_spark.streaming.stateful import running_ema

    src = str(tmp_path / "src")

    def write(rows):
        spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            "user_id long, event_id long, cents long",
        ).write.mode("append").parquet(src)

    write([(1, 1, 100), (1, 2, 200)])   # file/batch 1
    write([(1, 3, 200), (2, 4, 80)])    # file/batch 2
    stream = file_stream(
        spark, src, "user_id long, event_id long, cents long"
    )
    emitted = run_available_now(
        running_ema(stream, "user_id", "event_id", "cents",
                    alpha_num=1, alpha_den=2),
        spark,
        "update",
    )
    got = {r.event_id: r.ema_cents for r in emitted.collect()}
    # batch 1: 100; (200+100)//2=150. batch 2 (state carries 150):
    # (200+150)//2=175. user 2 starts fresh: 80.
    assert got == {1: 100, 2: 150, 3: 175, 4: 80}


def test_rate_source_drives_stateful_counts(spark, tmp_path):
    """Trigger-path generality beyond file sources (VERDICT r04 missing
    #3): a rate-micro-batch source — a real continuously-triggering
    message-bus-shaped source with its own offsets, not availableNow
    file drains — drives the applyInPandasWithState running-count
    operator across several micro-batches. Deterministic payload: batch
    k carries values [50k, 50k+50), so after B batches each of the 5
    residue keys must have counted exactly B*10 events — proving state
    carries across genuinely trigger-scheduled batches."""
    import time

    from datacooker_dist_spark.streaming.stateful import running_counts

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 50)
        .option("numPartitions", 2)
        .load()
        .select((F.col("value") % 5).alias("k"))
    )
    counts = running_counts(stream, key_col="k")

    def dump(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        counts.writeStream.foreachBatch(dump)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 3 and os.path.exists(sink):
                break
            time.sleep(0.5)
        else:
            raise AssertionError("rate source never produced 4 batches")
    finally:
        q.stop()
        q.awaitTermination()

    out = spark.read.parquet(sink)
    # monotone per-key counts: the LAST emission per key is its max
    last = out.groupBy("k").agg(F.max("n_events").alias("n"))
    rows = {r["k"]: r["n"] for r in last.collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # every batch contributes exactly 10 per key; all keys saw the same
    # number of completed batches
    ns = set(rows.values())
    assert len(ns) == 1
    n = ns.pop()
    assert n >= 40 and n % 10 == 0


def test_socket_source_drives_stateful_counts(spark, tmp_path):
    """Socket source smoke (VERDICT r05 task 6, the offline-closable half
    of message-bus parity): a real TCP text socket — a push source with
    live offsets, the closest in-sandbox stand-in for a Kafka-shaped
    bus — drives the applyInPandasWithState running-count operator.
    The server paces its 100 lines in two bursts so the micro-batch
    scheduler forms multiple batches; after the drain each of the 5
    residue keys must have counted exactly 20 events, proving the
    stateful operator is source-agnostic (file availableNow, rate
    trigger, and socket push all feed the identical plan)."""
    import socket
    import threading
    import time

    from datacooker_dist_spark.streaming.stateful import running_counts

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def serve():
        conn, _ = srv.accept()
        with conn:
            for burst in (range(0, 50), range(50, 100)):
                conn.sendall(
                    "".join(f"{i % 5}\n" for i in burst).encode()
                )
                time.sleep(1.0)
            # Keep the connection open until the reader is stopped — the
            # socket source treats EOF as a stream error.
            done.wait(timeout=120)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
        .select(F.col("value").cast("long").alias("k"))
    )
    counts = running_counts(stream, key_col="k")

    def dump(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (
        counts.writeStream.foreachBatch(dump)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(sink):
                try:
                    last = (
                        spark.read.parquet(sink)
                        .groupBy("k")
                        .agg(F.max("n_events").alias("n"))
                    )
                    rows = {r["k"]: r["n"] for r in last.collect()}
                except Exception:
                    rows = {}
                if set(rows) == {0, 1, 2, 3, 4} and all(
                    n == 20 for n in rows.values()
                ):
                    break
            time.sleep(0.5)
        else:
            raise AssertionError("socket stream never drained 100 lines")
    finally:
        done.set()
        q.stop()
        q.awaitTermination()
        srv.close()

    last = (
        spark.read.parquet(sink)
        .groupBy("k")
        .agg(F.max("n_events").alias("n"))
    )
    rows = {r["k"]: r["n"] for r in last.collect()}
    assert rows == {0: 20, 1: 20, 2: 20, 3: 20, 4: 20}


def test_quarantine_routing_exactly_once_across_restart(spark, tmp_path):
    """The streaming quarantine's per-``gate/b<batch_id>`` overwrite
    discipline survives a RESTART: a second availableNow run against
    the same checkpoint routes only the files that arrived in between,
    and the union of both gates holds every row exactly once — no
    reprocessing duplicates, no row lost or double-routed across the
    clean/quarantine boundary."""
    src = str(tmp_path / "src")
    target = str(tmp_path / "routed")
    ckpt = str(tmp_path / "ckpt")
    ok = F.col("v") <= 100

    def write(rows):
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        def route(batch_df, batch_id):
            routed = batch_df.select(
                "k", "v",
                F.when(ok, "clean").otherwise("quarantine").alias("gate"),
            ).persist()
            try:
                for gate in ("clean", "quarantine"):
                    routed.filter(F.col("gate") == gate).write.mode(
                        "overwrite"
                    ).parquet(f"{target}/{gate}/b{batch_id}")
            finally:
                routed.unpersist()

        q = (
            spark.readStream.schema("k long, v long")
            .parquet(src)
            .writeStream.foreachBatch(route)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([(1, 50), (2, 500)])
    drain()
    write([(3, 60), (4, 600), (5, 70)])
    drain()
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("k long, v long, gate string")
        .parquet(target)
    )
    rows = {(r["k"], r["gate"]) for r in back.collect()}
    assert back.count() == 5  # exactly once, across both runs
    assert rows == {
        (1, "clean"), (3, "clean"), (5, "clean"),
        (2, "quarantine"), (4, "quarantine"),
    }


def test_stream_append_retrain_matches_batch_loop(spark):
    """The streaming retrain twin's DRAINED decision and shipped index
    must equal the batch control loop's (r07): same stale build seeds,
    same read-back-appended assignment, same measure/decide machinery
    — so (recall_appended, recall_retrained, drift, retrain_triggered)
    and the full active (vec_id, cell, index_source) row set match
    exactly at sf0.01."""
    from datacooker_dist_spark.suite import QUERIES

    sf = "/root/testdata/sf0.01"
    stream_out = QUERIES["stream_append_retrain"](spark, sf)
    batch_out = QUERIES["similarity_append_retrain_loop"](spark, sf)

    def decision(df):
        rows = df.select(
            "recall_appended", "recall_retrained", "drift",
            "retrain_triggered",
        ).distinct().collect()
        assert len(rows) == 1
        return tuple(rows[0])

    assert decision(stream_out) == decision(batch_out)
    s_rows = sorted(
        (r.vec_id, r.cell, r.index_source)
        for r in stream_out.select("vec_id", "cell", "index_source").collect()
    )
    b_rows = sorted(
        (r.vec_id, r.cell, r.index_source)
        for r in batch_out.select("vec_id", "cell", "index_source").collect()
    )
    assert s_rows == b_rows and len(s_rows) > 0


def test_retrain_loop_from_artifacts_retrain_branch(spark, tmp_path):
    """The RETRAIN branch through the streaming artifact path (r07):
    a doctored between-clusters batch is assigned against the standing
    stale centroids, written as per-batch parquet artifacts (the
    foreachBatch shape), COLD-READ back, and fed to the loop via
    ``appended=``/``stale=`` — the decision must still trigger retrain
    and ship the retrained index, proving the artifact round-trip
    carries everything the decision needs."""
    import numpy as np

    from datacooker_dist_spark.operators.similarity import (
        ivf_assign,
        ivf_cells,
        ivf_append_retrain_loop,
    )

    rng = np.random.default_rng(7)
    dim = 8

    def frame(vectors, start_id):
        return spark.createDataFrame(
            [
                (int(start_id + i), [float(x) for x in v])
                for i, v in enumerate(vectors)
            ],
            "vec_id long, embedding array<double>",
        )

    a = rng.normal(0, 0.05, (120, dim)) + np.eye(dim)[0]
    b = rng.normal(0, 0.05, (120, dim)) + np.eye(dim)[1]
    base = frame(np.vstack([a, b]), 0)
    mid = (np.eye(dim)[0] + np.eye(dim)[1]) / np.sqrt(2)
    newf = frame(rng.normal(0, 0.15, (120, dim)) + mid, 2000)

    stale_c, stale_a = ivf_cells(base, 4, refine_iters=3)
    stale_c, stale_a = stale_c.localCheckpoint(), stale_a.localCheckpoint()
    # Simulate two micro-batches landing idempotent artifacts.
    for bid, half in ((0, "vec_id < 2060"), (1, "vec_id >= 2060")):
        ivf_assign(newf.filter(half), stale_c).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/b{bid}")
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .schema("vec_id bigint, cell bigint, vector array<double>")
        .parquet(str(tmp_path))
    )
    out = ivf_append_retrain_loop(
        base, newf, newf.filter("vec_id < 2006"),
        k=3, n_cells=4, nprobe=1, refine_iters=3, tolerance=0.05,
        stale=(stale_c, stale_a),
        appended=stale_a.unionByName(back),
    )
    rows = out.select(
        "index_source", "retrain_triggered", "drift"
    ).distinct().collect()
    assert len(rows) == 1
    assert rows[0]["retrain_triggered"] is True
    assert rows[0]["index_source"] == "retrained"
    assert out.count() == 360


def _land_batch(spark, target, bid, rows):
    spark.createDataFrame(rows, "k bigint, v string").write.mode(
        "overwrite"
    ).parquet(f"{target}/b{bid}")


def test_vacuum_folds_across_advancing_watermarks(spark, tmp_path):
    """ADVICE r10 (medium): a batch replayed after being compacted under
    an OLDER watermark must fold into the new store without duplicating —
    every existing compacted_w* store is merged, not just the
    same-watermark one, and the superseded store is removed."""
    from datacooker_dist_spark.streaming.pipeline import (
        read_batch_artifacts,
        vacuum_batch_artifacts,
    )

    target = str(tmp_path / "art")
    for bid in range(4):
        _land_batch(spark, target, bid, [(bid * 10 + i, "x") for i in range(3)])
    assert read_batch_artifacts(spark, target).count() == 12

    vacuum_batch_artifacts(spark, target, watermark=1)  # b0,b1 → w1
    assert read_batch_artifacts(spark, target).count() == 12
    # Replay b1 (idempotent sink rewrites identical content), then vacuum
    # under an ADVANCED watermark: w1's store must fold into w3.
    _land_batch(spark, target, 1, [(10 + i, "x") for i in range(3)])
    vacuum_batch_artifacts(spark, target, watermark=3)
    assert read_batch_artifacts(spark, target).count() == 12
    assert not os.path.isdir(f"{target}/compacted_w1")
    assert os.path.isdir(f"{target}/compacted_w3")
    # Idempotent re-run under the advanced watermark.
    vacuum_batch_artifacts(spark, target, watermark=3)
    assert read_batch_artifacts(spark, target).count() == 12


def test_vacuum_swap_crash_leaves_readable_copy(spark, tmp_path):
    """ADVICE r10 (low): a crash mid-swap must never lose previously
    compacted rows — __old backups stay readable (read path) and are
    repaired by the next vacuum; __tmp leftovers are ignored/cleared."""
    import shutil

    from datacooker_dist_spark.streaming.pipeline import (
        read_batch_artifacts,
        vacuum_batch_artifacts,
    )

    target = str(tmp_path / "art")
    for bid in range(2):
        _land_batch(spark, target, bid, [(bid * 10 + i, "x") for i in range(3)])
    vacuum_batch_artifacts(spark, target, watermark=1)
    comp = f"{target}/compacted_w1"
    # Simulate the crash window: old store renamed aside, replacement
    # not yet in place, plus a half-written __tmp.
    os.rename(comp, comp + "__old")
    os.makedirs(comp + "__tmp", exist_ok=True)
    assert read_batch_artifacts(spark, target).count() == 6  # __old read
    _land_batch(spark, target, 2, [(20 + i, "x") for i in range(3)])
    vacuum_batch_artifacts(spark, target, watermark=2)  # repairs + folds
    assert read_batch_artifacts(spark, target).count() == 9
    assert not os.path.isdir(comp + "__old")
    assert not os.path.isdir(comp + "__tmp")
    shutil.rmtree(target)


def test_read_batch_artifacts_empty_target_raises(spark, tmp_path):
    """ADVICE r10 (low): an empty/never-landed target raises a clear
    error instead of TypeError (the schema is unknowable)."""
    import pytest

    from datacooker_dist_spark.streaming.pipeline import read_batch_artifacts

    empty = str(tmp_path / "nothing")
    os.makedirs(empty, exist_ok=True)
    with pytest.raises(FileNotFoundError, match="no batch artifacts"):
        read_batch_artifacts(spark, empty)


def test_read_dedupes_replayed_batch_against_compacted(spark, tmp_path):
    """The drained VIEW is replay-safe even before the next vacuum: a
    batch dir rewritten after its content was compacted contributes no
    duplicate rows (tagged-row dedupe in read_batch_artifacts)."""
    from datacooker_dist_spark.streaming.pipeline import (
        read_batch_artifacts,
        vacuum_batch_artifacts,
    )

    target = str(tmp_path / "art")
    for bid in range(3):
        _land_batch(spark, target, bid, [(bid * 10 + i, "x") for i in range(3)])
    vacuum_batch_artifacts(spark, target, watermark=2)
    _land_batch(spark, target, 1, [(10 + i, "x") for i in range(3)])  # replay
    assert read_batch_artifacts(spark, target).count() == 9
