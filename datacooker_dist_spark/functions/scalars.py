"""Scalar expression helpers shared by operators and the query surface.

Cross-engine exactness notes (the DuckDB oracle hashes values exactly):

- ``dsum``/``davg``: double addition is not associative, so a plain
  ``SUM(double)`` differs bitwise between engines (and between Spark runs
  with different partitionings). Monetary/quantity columns in the synthetic
  tables carry ≤2 decimal places, so summing them as ``DECIMAL(25,2)`` is
  exact and deterministic; the final cast back to double is then bit-stable
  on every engine. This also makes aggregate results invariant to partition
  count — a property the pytest suite asserts (SURVEY §5.2 item 4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for 1e9 rows of 1e13-scaled values, exact at 2 decimals.
_DEC = "decimal(25,2)"


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Deterministic double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Deterministic double mean: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double")
        / F.count(c)
    )


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


def exact_comoments(df, cols, scale: int = 4):
    """One-pass EXACT co-moment sums for fixed-decimal measure columns —
    the fast path behind the correlation/regression/PCA queries.

    Contract: every column's values carry at most ``scale/2`` decimal
    places (monetary/quantity columns are 2dp), so pairwise products lie
    EXACTLY on the 10^-scale grid. Each partition reduces its rows to
    integer partials on that grid via one Arrow-batched numpy pass —
    row-chunked int64 vector math rolled up into arbitrary-precision
    Python ints, so no chunk or partition total can overflow — and the
    partials ship as DECIMAL(38,0) (k + k(k+1)/2 + 1 values per
    partition, nothing else) for an exact cross-partition merge.
    Measured ~10× over per-row decimal-cast SUMs at sf0.1 (decimal
    aggregation is BigDecimal-per-row; this is vectorized int64), with a
    STRONGER exactness story: the grid integers are the true decimal
    values, free of the double-product ulp noise a
    ``CAST(x*y AS DECIMAL(38,12))`` would keep, so a DuckDB oracle
    casting products to DECIMAL(38,``scale``) reproduces every sum
    bit-for-bit.

    Returns a 1-row DataFrame: ``n`` (double), ``s_{i}`` (double, the
    sum of column i) and ``s_{i}_{j}`` for i ≤ j (double, the sum of
    products) — all exact-decimal-merged before one final cast.
    Columns must be non-null (measure columns; NaN would poison the
    grid).
    """
    import numpy as np
    import pyarrow as pa

    from pyspark.sql import functions as F

    k = len(cols)
    iu, ju = np.triu_indices(k)
    mult = float(10 ** scale)
    pair_names = [f"s_{i}_{j}" for i, j in zip(iu, ju)]
    out_names = ["n"] + [f"s_{i}" for i in range(k)] + pair_names
    # Partials ship PRE-SCALED as DECIMAL(38,scale): the merge is then a
    # plain decimal SUM with no post-division, and the final
    # cast-to-double happens on the exact decimal total — matching the
    # oracle's CAST(SUM(CAST(... AS DECIMAL(38,scale))) AS DOUBLE)
    # bit-for-bit.
    schema = "n decimal(38,0), " + ", ".join(
        f"{nm} decimal(38,{scale})" for nm in out_names[1:]
    )

    _CAP = float(2 ** 62)

    def grid_sums(M):
        """Column sums of rint(M) as exact Python ints. Fast path: int64
        vector sum, taken only when max|element| · rows provably fits in
        2^62 (so no chunk can overflow at ANY input magnitude — the
        ceiling scales with the data, it is not assumed). Slow path for
        huge-magnitude chunks: per-element Python-int accumulation
        (arbitrary precision); rint noise there is inherent to the
        double representation of the product itself, not the sum."""
        G = np.rint(M)
        if G.size == 0:
            return [0] * M.shape[1]
        mx = float(np.max(np.abs(G)))
        if mx * len(G) < _CAP:
            v = G.astype(np.int64).sum(axis=0)
            return [int(x) for x in v]
        return [sum(int(x) for x in G[:, j]) for j in range(G.shape[1])]

    def partials(batches):
        n = 0
        s = [0] * k
        sp = [0] * len(iu)
        seen = False
        for b in batches:
            tbl = pa.Table.from_batches([b])
            V = np.column_stack(
                [tbl.column(c).to_numpy(zero_copy_only=False) for c in cols]
            ).astype(np.float64)
            for lo in range(0, len(V), 4096):
                C = V[lo:lo + 4096]
                n += len(C)
                sv = grid_sums(C * mult)
                pv = grid_sums(C[:, iu] * C[:, ju] * mult)
                for i in range(k):
                    s[i] += sv[i]
                for t in range(len(iu)):
                    sp[t] += pv[t]
            seen = True
        if seen:
            import decimal

            arrays = [
                pa.array([decimal.Decimal(n)], type=pa.decimal128(38, 0))
            ]
            for v in s + sp:
                arrays.append(
                    pa.array(
                        [decimal.Decimal(v).scaleb(-scale)],
                        type=pa.decimal128(38, scale),
                    )
                )
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    parts = df.select(*cols).mapInArrow(partials, schema)
    aggs = [F.sum("n").cast("double").alias("n")]
    for nm in out_names[1:]:
        aggs.append(F.sum(nm).cast("double").alias(nm))
    return parts.agg(*aggs)


def triangle_moment_partials(
    vec_col: str, dim: int, include_sums: bool = False,
    one_based: bool = False, grid: float = 1e12, chunk: int = 1024,
):
    """mapInArrow generator for the UPPER-TRIANGLE second-moment sums of
    a ``dim``-vector column on an exact integer grid — the shared core
    behind ``embedding_pca_loadings`` and ``opq_rotation`` (review r07
    factored the two near-identical copies here; the copy had also
    dropped the overflow guard on its first-moment path). Each
    partition reduces to d(d+1)/2 pair partials (+ d first-moment
    partials and a count row when ``include_sums``), every path
    guarded by the :func:`exact_comoments` overflow discipline
    (per-chunk int64 fast path only when max|element|·rows provably
    fits 2^62, else exact Python-int fallback) and shipped as
    DECIMAL(38,0) so no cross-partition merge can overflow.

    Output rows (schema ``i int, j int, pl decimal(38,0)``):
    pair sums at (i, j) over the triangle (``one_based`` shifts both
    by +1 for SQL-oracle joins); with ``include_sums``, first-moment
    sums at (i, -1) and the row count at (0, -2)."""
    import decimal

    import numpy as np
    import pyarrow as pa

    iu, ju = np.triu_indices(dim)
    _CAP = float(2 ** 62)
    off = 1 if one_based else 0

    def _guarded_sums(P, acc):
        mx = float(np.max(np.abs(P))) if P.size else 0.0
        if mx * len(P) < _CAP:
            v = P.astype(np.int64).sum(axis=0)
            for t in range(P.shape[1]):
                acc[t] += int(v[t])
        else:
            for t in range(P.shape[1]):
                acc[t] += sum(int(x) for x in P[:, t])

    def moment_partials(batches):
        acc = [0] * len(iu)
        sacc = [0] * dim
        cnt = 0
        for b in batches:
            V = np.asarray(
                pa.Table.from_batches([b]).column(vec_col).to_pylist(),
                dtype=np.float64,
            )
            if V.size == 0:
                continue
            cnt += len(V)
            for lo in range(0, len(V), chunk):
                C = V[lo:lo + chunk]
                if include_sums:
                    _guarded_sums(np.rint(C * grid), sacc)
                _guarded_sums(np.rint(C[:, iu] * C[:, ju] * grid), acc)
        if cnt:
            i_idx = [int(x) + off for x in iu]
            j_idx = [int(x) + off for x in ju]
            vals = [decimal.Decimal(a) for a in acc]
            if include_sums:
                i_idx += list(range(dim)) + [0]
                j_idx += [-1] * dim + [-2]
                vals += [decimal.Decimal(a) for a in sacc] + [
                    decimal.Decimal(cnt)
                ]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(i_idx, type=pa.int32()),
                    pa.array(j_idx, type=pa.int32()),
                    pa.array(vals, type=pa.decimal128(38, 0)),
                ],
                names=["i", "j", "pl"],
            )

    return moment_partials
