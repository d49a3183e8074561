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
