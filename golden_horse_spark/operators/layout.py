"""Multi-dimensional data layout: Z-order (Morton) clustering for
min/max data skipping.

The 100 TB mechanic this module exists for: readers prune parquet row
groups and files by column min/max statistics. Range-partitioning the
write by ONE column bounds only that column's span per file — a
predicate on any OTHER column still touches every file. Interleaving
the bits of k rank-encoded columns (Morton 1966; Orenstein & Merrett
1984 for the database use) and range-partitioning by the interleaved
key bounds EVERY clustered dimension's span per file at roughly
(1/P)^(1/k) of its range, so single-column predicates on ANY of the k
columns skip most files. This is the same design as Delta/Iceberg's
``OPTIMIZE ZORDER BY`` (rank/range-id encode, interleave, range-sort),
re-expressed as plain DataFrame ops.

Shapes, in Spark terms:

* ``rank_codes`` — per-column rank encoding into ``[0, 2^bits)``.
  Rank (not min/max scaling) is the skew-proof normalization: equal-
  population cells regardless of the value distribution, which is what
  keeps output files equal-sized under Zipfian keys. Exact path:
  one global ``ntile`` window per column (single-task sort — the
  test/oracle path, and fine to ~10^7 rows). Scale path
  (``exact=False``): ``percentile_approx`` boundaries (one aggregate,
  driver holds 2^bits scalars per column) baked into the plan as a
  literal array; assignment is a JVM-side ``filter``/``cardinality``
  over ≤ 255 comparisons per row, no shuffle, no window.
* ``zorder_key`` — pure long arithmetic (shift/and/or via sum), exactly
  replayable in any SQL engine; bit b of column j lands at b·k + j.
* ``layout_by_zorder`` — ``repartitionByRange(n_files, zkey)`` +
  ``sortWithinPartitions(zkey)``: contiguous z-ranges per file, so each
  file covers a compact hyper-rectangle of the code space and its
  min/max stats are tight in every clustered dimension. One exchange
  (range), one local sort — identical cost shape to the single-column
  sort-write it replaces.

Determinism contract: the exact path's ``ntile`` needs a total order —
pass ``order_by`` tie-break columns (e.g. the table's key); otherwise
ties make codes partition-order-dependent, which would break replay
verification (and any incremental re-layout diff).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_codes(
    df: DataFrame,
    cols: Sequence[str],
    order_by: Sequence[str] = (),
    bits: int = 8,
    exact: bool = True,
    prefix: str = "_code_",
) -> DataFrame:
    """Add ``{prefix}{col}`` rank-code columns in ``[0, 2^bits)`` for
    each of ``cols``. See module docstring for exact-vs-approx paths.

    NULL values land in the lowest cells on both paths (exact: Spark's
    NULLS FIRST ordering; approx: a NULL comparison filters to code 0)
    — they cluster together, which is what a min/max reader wants, but
    filter upstream if NULL rows should not share a file with the
    smallest keys."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    n_cells = 1 << bits
    if exact:
        for c in cols:
            w = Window.orderBy(F.col(c), *[F.col(o) for o in order_by])
            df = df.withColumn(prefix + c, F.ntile(n_cells).over(w) - 1)
        return df
    # scale path: approx-quantile boundaries as a plan literal; code =
    # number of boundaries <= x (<= 255 JVM comparisons/row, no shuffle)
    for c in cols:
        cuts = df.select(
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(i / n_cells) for i in range(1, n_cells)]),
                10_000,
            ).alias("b")
        ).collect()[0]["b"]
        if not cuts:
            # all-NULL column or empty frame: percentile_approx returns
            # NULL — every row lands in cell 0, same as the exact
            # path's NULLS FIRST behavior (round-5 review fix: the
            # literal-array build crashed on NoneType)
            df = df.withColumn(prefix + c, F.lit(0).cast("int"))
            continue
        arr = F.array(*[F.lit(float(b)) for b in cuts])
        df = df.withColumn(
            prefix + c,
            F.size(
                F.filter(arr, lambda b: b <= F.col(c).cast("double"))
            ).cast("int"),
        )
    return df


def zorder_key(code_cols: Sequence[str], bits: int = 8) -> Column:
    """Morton-interleave rank codes into one long: bit ``b`` of column
    ``j`` lands at position ``b·k + j``. Plain shift/and/sum arithmetic
    — exactly replayable in SQL on any engine (no engine hash)."""
    k = len(code_cols)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 columns")
    if k * bits > 62:
        raise ValueError("k*bits must fit a signed long (<= 62)")
    terms = []
    for j, c in enumerate(code_cols):
        x = F.col(c).cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), b * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def layout_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int,
    order_by: Sequence[str] = (),
    bits: int = 8,
    exact: bool = True,
) -> DataFrame:
    """Re-layout ``df`` so each of ``n_files`` output partitions covers
    a compact hyper-rectangle of the ``cols`` space (write the result
    partition-per-file to get skip-friendly parquet stats). The z-key
    column is dropped — it is a layout mechanism, not data."""
    coded = rank_codes(df, cols, order_by=order_by, bits=bits, exact=exact)
    zk = zorder_key([f"_code_{c}" for c in cols], bits=bits)
    return (
        coded.withColumn("_zkey", zk)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *[f"_code_{c}" for c in cols])
    )
