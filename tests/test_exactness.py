"""Property-based check of the engine's cross-engine exactness keystone:
decimal-accumulated double sums equal the true decimal sum for any input
and any partitioning (hypothesis-generated)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from datacooker_dist_spark.functions.scalars import dsum

money = st.decimals(
    min_value=Decimal("-9999999.99"),
    max_value=Decimal("9999999.99"),
    places=2,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(money, min_size=1, max_size=50), st.integers(1, 7))
def test_dsum_is_exact_and_partition_invariant(spark, values, parts):
    df = spark.createDataFrame(
        [(float(v),) for v in values], "x double"
    ).repartition(parts)
    got = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    want = float(sum(values))  # exact decimal sum, then one rounding to double
    assert got == want
