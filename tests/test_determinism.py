"""Rows-only queries promise determinism in lieu of an oracle: their
docstrings claim results are a pure function of the input under fixed
seeds (LSH hash families, samplers, sketch parameters). This suite holds
them to it — two evaluations in one session must return identical rows.
(Streaming rows-only entries are exercised by tests/test_streaming.py's
parity/restart tests instead — draining twice re-runs the whole
micro-batch harness.)
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL
from datacooker_dist_spark.suite import ORACLES, QUERIES

# every non-streaming rows-only query
ROWS_ONLY = sorted(
    name
    for name in QUERIES
    if name not in ORACLES and not name.startswith("stream_")
)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, name):
    first = sorted(map(tuple, QUERIES[name](spark, SF_SMALL).collect()))
    second = sorted(map(tuple, QUERIES[name](spark, SF_SMALL).collect()))
    assert len(first) > 0, f"{name}: empty result"
    assert first == second, f"{name}: two evaluations differ"


def test_unigram_em_vocab_partition_invariant(spark):
    """Unigram-LM EM must produce the identical vocabulary table on any
    partitioning: usage counts are exact integers (Σ over partitions),
    probs derive from them by one division, and Viterbi ties break
    structurally (fewer pieces, earlier split) — no float accumulation
    order anywhere."""
    from datacooker_dist_spark.operators.text import unigram_em_vocab

    rows = [(i, "the table scan joins a row group " * (2 + i % 3),)
            for i in range(40)]
    df1 = spark.createDataFrame(rows, "id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "id long, text string").repartition(8)
    t1 = unigram_em_vocab(df1, "text", vocab_size=24, iters=2)
    t8 = unigram_em_vocab(df8, "text", vocab_size=24, iters=2)
    assert t1 == t8
    assert len(t1) >= 24
    assert all(p == round(p, 6) for _, _, p, _ in t1)
