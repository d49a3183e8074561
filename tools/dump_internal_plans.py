"""Dump explain("formatted") for INTERNAL suite frames whose plans the
returned query dataframes hide behind localCheckpoint/persist — the
before/after evidence for optimization-round changes that live inside
memoized builders (fan-out exchanges, featurization shapes).

Usage: python tools/dump_internal_plans.py --plans-dir plans/r11 \
           --suffix before [--sf /root/testdata/sf0.1]

Runs against the tree the script lives in (sys.path pinned to its own
repo root), so the same command in a HEAD worktree captures the before
state.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from datacooker_dist_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", required=True)
    ap.add_argument("--suffix", required=True)
    args = ap.parse_args()

    spark = build_session(app_name="dds-internal-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from datacooker_dist_spark.suite import llm, llm_quality, embml
    from datacooker_dist_spark.suite import shared_shingles

    def _nndescent_round_frame():
        # One NN-descent local-join round over the seed graph — the
        # per-round plan the build's localCheckpoints hide (wave-4
        # shuffle-layout evidence).
        import pyspark.sql.functions as F

        from datacooker_dist_spark.operators import similarity as S
        from datacooker_dist_spark.operators.similarity import (
            _knn_vectors, nndescent_round)
        from datacooker_dist_spark.session import fan_out

        emb = fan_out(spark.read.parquet(f"{args.sf}/embeddings.parquet"))
        g0 = S.knn_graph_build(emb, k=10, rounds=0, n_cells=16).select(
            F.col("vec_id").alias("src"),
            F.col("neighbor_id").alias("dst"), "cosine",
        ).localCheckpoint()
        return nndescent_round(
            g0, _knn_vectors(emb, "vec_id", "embedding").localCheckpoint(),
            10,
        )

    def _pq_encode_frame():
        # The encode leg the index builds hide behind their
        # localCheckpoints (VERDICT r11 "what's wrong" #3 — the
        # committed query-level ANN plans were post-checkpoint dumps,
        # so the MapInArrow/zero-exchange claims were not checkable).
        from datacooker_dist_spark.operators import similarity as S
        from datacooker_dist_spark.session import fan_out

        emb = fan_out(spark.read.parquet(f"{args.sf}/embeddings.parquet"))
        cb = S.pq_codebooks(emb, dim=64, m=32, k=32).localCheckpoint()
        return S.pq_encode(emb, cb, dim=64, m=32)

    def _ivf_assign_frame():
        from datacooker_dist_spark.operators import similarity as S
        from datacooker_dist_spark.session import fan_out

        emb = fan_out(spark.read.parquet(f"{args.sf}/embeddings.parquet"))
        cents, _ = S.ivf_cells(emb, n_cells=16)
        return S.ivf_assign(
            emb, cents.localCheckpoint(), assign_spill=2)

    def _ivf_probe_frame():
        # cosine_topk_ivf probe path (round 12: literal probe-cell
        # selector + broadcast of the bounded probe list — the
        # assignment must never be shuffled by a probe).
        import pyspark.sql.functions as F

        from datacooker_dist_spark.operators import similarity as S
        from datacooker_dist_spark.session import fan_out

        emb = fan_out(spark.read.parquet(f"{args.sf}/embeddings.parquet"))
        cents, assigned = S.ivf_cells(emb, n_cells=16, assign_spill=2)
        cells = (cents.localCheckpoint(), assigned.localCheckpoint())
        return S.cosine_topk_ivf(
            emb, emb.filter(F.col("vec_id") < 10), k=5, nprobe=4,
            cells=cells, spilled=True)

    frames = {
        "internal_qcls_features": lambda: llm_quality._qcls_features(
            spark, args.sf),
        "internal_er_pairs": lambda: embml._er_pairs(spark, args.sf),
        "internal_shingle_rows": lambda: shared_shingles(spark, args.sf),
        "internal_kgram_rows": lambda: llm.shared_kgram_rows(
            spark, args.sf),
        "internal_nndescent_round": _nndescent_round_frame,
        "internal_pq_encode": _pq_encode_frame,
        "internal_ivf_assign": _ivf_assign_frame,
        "internal_ivf_probe": _ivf_probe_frame,
    }
    os.makedirs(args.plans_dir, exist_ok=True)
    for name, fn in frames.items():
        try:
            df = fn()
        except Exception as e:  # tree may predate a helper
            print(f"skip {name}: {e}")
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(
            args.plans_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
