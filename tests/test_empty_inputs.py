"""Empty-input hardening: operators must return an EMPTY, correctly-typed
result — not crash, not emit garbage rows — when a filter leaves zero
rows. At 100 TB, empty partitions and empty date slices are routine
(fresh tenants, pre-launch date ranges, all-filtered sources); an
operator that throws on empty input takes down the whole pipeline run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL
from datacooker_dist_spark.operators import dedup as D
from datacooker_dist_spark.operators import relational as R
from datacooker_dist_spark.operators.graph import pagerank
from datacooker_dist_spark.operators.similarity import cosine_topk


def _empty_docs(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    return docs.filter(F.lit(False))


def test_shingles_on_empty_corpus(spark):
    sh = D.shingle_rows(_empty_docs(spark))
    assert sh.count() == 0
    assert set(sh.columns) >= {"doc_id", "_sh"}


def test_connected_components_on_empty_edges(spark):
    pairs = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), "id_a long, id_b long"
    )
    out = D.connected_components(pairs)
    assert out.count() == 0


def test_pagerank_on_single_edge(spark):
    edges = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, 2), (2, 1)], 1),
        "src long, dst long",
    )
    out = pagerank(edges, iterations=2).collect()
    # Two symmetric nodes split the mass equally: 1e9 // 2 each, exactly.
    assert sorted((r["node"], r["rank_ppb"]) for r in out) == [
        (1, 500000000), (2, 500000000)
    ]


def test_cosine_topk_on_empty_queries(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = cosine_topk(emb, emb.filter(F.lit(False)), k=3)
    assert out.count() == 0


def test_salted_join_on_empty_left(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").filter(F.lit(False))
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    assert R.salted_join(li, o, on="l_orderkey").count() == 0


def test_suite_aggregate_on_empty_slice(spark):
    """A grouped aggregate over zero rows yields zero groups (not a
    null-group row) and keeps its schema."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").filter(
        F.col("l_shipdate") < F.lit("1990-01-01").cast("timestamp_ntz")
    )
    out = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,2)")).cast("double")
        .alias("s")
    )
    assert out.columns == ["l_returnflag", "s"]
    assert out.count() == 0


def test_grid_radius_join_empty_sides(spark):
    from datacooker_dist_spark.operators.spatial import grid_radius_join

    pts = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("x"),
        (F.col("id") * 3).alias("y"),
    )
    none = pts.filter(F.lit(False))
    assert grid_radius_join(none, pts, radius=5.0).count() == 0
    assert grid_radius_join(pts, none, radius=5.0).count() == 0
    assert grid_radius_join(none, none, radius=5.0).count() == 0


def test_pattern_match_no_events(spark):
    """events_pattern_match's aggregate shape on a zero-row slice."""
    from datacooker_dist_spark.suite import QUERIES

    df = QUERIES["events_pattern_match"](spark, SF_SMALL)
    empty = df.filter(F.lit(False))
    assert empty.count() == 0
    assert empty.columns == [
        "user_id", "n_events", "n_view_then_buy", "reaches_purchase"
    ]


def test_blocked_fuzzy_join_empty_sides(spark):
    from datacooker_dist_spark.operators.dedup import blocked_fuzzy_join

    pts = spark.createDataFrame(
        [(1, "alpha beta", "a"), (2, "alpha bets", "a")],
        "id int, nm string, blk string",
    )
    none = pts.filter(F.lit(False))
    assert blocked_fuzzy_join(none, pts, "nm", ["blk"], 0.5, "id").count() == 0
    assert blocked_fuzzy_join(pts, none, "nm", ["blk"], 0.5, "id").count() == 0
    out = blocked_fuzzy_join(none, none, "nm", ["blk"], 0.5, "id")
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "jaccard"}


def test_time_weighted_avg_empty_and_single(spark):
    from datacooker_dist_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [(1, 10.0, 1.0, 1)], "k int, tsec double, v double, eid int"
    ).selectExpr("k", "timestamp_seconds(tsec) AS ts", "v", "eid")
    # single observation → zero span → excluded, not a crash
    assert time_weighted_avg(df, "ts", "v", ["k"], ["eid"]).count() == 0
    none = df.filter(F.lit(False))
    out = time_weighted_avg(none, "ts", "v", ["k"], ["eid"])
    assert out.count() == 0
    assert set(out.columns) == {"k", "span_us", "twap"}


def test_cosine_candidate_pairs_empty(spark):
    from datacooker_dist_spark.operators.similarity import cosine_candidate_pairs

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").filter(
        F.lit(False)
    )
    out = cosine_candidate_pairs(emb, 0.45, dim=64, planes=2, tables=4)
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "cosine"}


def test_asof_join_tolerance_empty_right(spark):
    from datacooker_dist_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, 5.0, 10)], "k int, tsec double, lv int"
    ).selectExpr("k", "timestamp_seconds(tsec) AS ts", "lv")
    right = spark.createDataFrame(
        [], "k int, rts timestamp, rv int"
    )
    out = asof_join(
        left, right, "k", "k", "ts", "rts", ["rv"],
        how="inner", tolerance="10 SECONDS",
    )
    assert out.count() == 0


def test_bloom_on_empty_key_set(spark):
    """An empty key set means the filter contains nothing: every probe
    must be rejected (and nothing may crash on the empty word table)."""
    from datacooker_dist_spark.operators.bloom import bloom_build, bloom_prefilter

    keys = spark.range(0).withColumnRenamed("id", "k")
    words = bloom_build(keys, "k", num_bits=1 << 10, k=3)
    probe = spark.range(100).withColumnRenamed("id", "k")
    assert bloom_prefilter(probe, "k", words, num_bits=1 << 10, k=3).count() == 0


def test_triangles_on_empty_edges(spark):
    from datacooker_dist_spark.operators.graph import triangle_participation

    edges = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), "src long, dst long"
    )
    assert triangle_participation(edges).count() == 0


def test_bfs_on_empty_seed_set(spark):
    from datacooker_dist_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, 2), (2, 3)], 1), "src long, dst long"
    )
    seeds = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), "node long"
    )
    assert bfs_hops(edges, seeds, max_hops=3).count() == 0


def test_containment_on_empty_corpus(spark):
    out = D.containment_pairs(_empty_docs(spark))
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "containment"]


def test_ema_on_empty_series(spark):
    from datacooker_dist_spark.operators.timeseries import ema_fixedpoint

    df = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), "pri string, day date, cents long"
    )
    out = ema_fixedpoint(df, keys=["pri"], order_col="day", value_col="cents")
    assert out.count() == 0
    assert out.columns == ["pri", "day", "cents", "ema"]


def test_global_rank_and_prefix_sum_on_empty(spark):
    from datacooker_dist_spark.operators.relational import (
        global_prefix_sum,
        global_rank,
    )

    df = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1), "v double, uid int"
    )
    assert global_rank(df, ["v", "uid"], rank_col="r").count() == 0
    out = global_prefix_sum(df, ["v", "uid"], "v", out_col="s")
    assert out.count() == 0
    assert "s" in out.columns


def test_kcore_on_empty_edges(spark):
    from datacooker_dist_spark.operators.graph import k_core

    edges = spark.createDataFrame([], "src long, dst long")
    assert k_core(edges, k=2).collect() == []


def test_substring_ops_on_empty_corpus(spark):
    from datacooker_dist_spark.operators.dedup import (
        duplicated_window_fraction,
        incremental_substring_spans,
        substring_span_pairs,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert substring_span_pairs(docs, k=10).collect() == []
    assert duplicated_window_fraction(docs, k=10).collect() == []
    some = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(12)))], "doc_id long, text string"
    )
    # empty base: nothing to probe; empty new: nothing probes
    assert incremental_substring_spans(docs, some, k=10).collect() == []
    assert incremental_substring_spans(some, docs, k=10).collect() == []


def test_pareto_front_2d_on_empty_input(spark):
    """Skyline on zero rows: empty result, schema preserved, and the
    broadcast prefix/dominance stages tolerate an empty grid."""
    pts = spark.createDataFrame(
        spark.sparkContext.parallelize([], 1),
        "id long, price double, size int",
    )
    out = R.pareto_front_2d(pts, "price", "size", lo=0, hi=100, buckets=8)
    assert out.columns == ["id", "price", "size"]
    assert out.count() == 0


def test_sorted_neighborhood_on_empty_corpus(spark):
    out = D.sorted_neighborhood_pairs(_empty_docs(spark))
    assert out.count() == 0
    assert set(out.columns) == {"id_a", "id_b", "jaccard"}


def test_kgram_rows_on_empty_corpus(spark):
    g = D.kgram_occurrence_rows(_empty_docs(spark))
    assert g.count() == 0
    assert set(g.columns) == {"doc_id", "_pos", "_gh"}


def test_residual_index_on_empty_batch_append(spark):
    """The residual append path (standing centroids + codebooks) must
    yield an EMPTY index for an empty ingest batch — the routine
    no-new-data trigger at 100 TB — with the full schema intact."""
    from datacooker_dist_spark.operators.similarity import (
        ivf_assign,
        ivf_cells,
        ivfpq_residual_index,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cells = ivf_cells(emb, 4, refine_iters=1)
    cells = (cells[0].localCheckpoint(), cells[1].localCheckpoint())
    _, cb, _ = ivfpq_residual_index(emb, 64, 8, 8, cells=cells)
    empty = emb.filter(F.lit(False))
    _, _, idx = ivfpq_residual_index(
        empty, 64, 8, 8,
        cells=(cells[0], ivf_assign(empty, cells[0])),
        codebooks=cb.localCheckpoint(),
    )
    assert idx.count() == 0
    assert set(idx.columns) == {"vec_id", "cell", "_tnorm", "codes"}


def test_retrain_loop_on_empty_batch(spark):
    """An empty ingest batch must flow through the control loop: the
    appended index equals the stale one, recalls match the retrained
    index's by construction-or-better, and the shipped index is the
    cheap appended one (drift cannot exceed tolerance when nothing
    changed and both variants share the same training sample)."""
    from datacooker_dist_spark.operators.similarity import (
        ivf_append_retrain_loop,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").filter(
        "vec_id < 60"
    )
    out = ivf_append_retrain_loop(
        emb, emb.filter(F.lit(False)), emb.filter("vec_id < 3"),
        k=3, n_cells=4, nprobe=2, refine_iters=1, tolerance=0.05,
    )
    rows = out.select("index_source", "retrain_triggered").distinct().collect()
    assert len(rows) == 1
    # base == corpus → stale build ≡ retrained build (same sample, same
    # data) → drift is exactly 0 → keep.
    assert rows[0]["retrain_triggered"] is False
    assert rows[0]["index_source"] == "appended"
    assert out.count() == 60


def test_semantic_dedup_incremental_empty_batch(spark):
    """Empty ingest batch (and empty base) → zero pairs with the right
    schema — the operator's rectangle stage must tolerate one-sided
    empty cells."""
    from datacooker_dist_spark.operators.similarity import (
        hyperplane_cells,
        semantic_dedup_incremental,
    )

    base = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0], 1)],
        "vec_id bigint, embedding array<double>, label int",
    )
    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>, label int"
    )
    out = semantic_dedup_incremental(
        base, empty,
        hyperplane_cells(base, dim=4, planes=2),
        hyperplane_cells(empty, dim=4, planes=2),
        threshold=0.4, dim=4,
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "id_new", "id_base", "cosine",
    ]
    rev = semantic_dedup_incremental(
        empty, base,
        hyperplane_cells(empty, dim=4, planes=2),
        hyperplane_cells(base, dim=4, planes=2),
        threshold=0.4, dim=4,
    )
    assert rev.count() == 0


def test_unigram_em_on_empty_corpus(spark):
    from datacooker_dist_spark.operators.text import unigram_em_vocab

    assert unigram_em_vocab(_empty_docs(spark), "text") == []
