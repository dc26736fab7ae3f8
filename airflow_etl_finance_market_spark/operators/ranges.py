"""Range (point-in-interval) join — the second time-series operator Spark
lacks natively, next to the as-of join (operators/asof.py).

``points ⋈ intervals ON p BETWEEN lo AND hi`` has no equi-key, so Catalyst
plans it as BroadcastNestedLoopJoin (fine only while one side broadcasts)
or a cartesian product (never fine). The standard scale rewrite is BINNING:
quantize the range dimension into fixed-width bins, replicate every
interval into each bin it overlaps (bounded fan-out when interval width is
bounded — pick ``bin_size`` near the typical width so the blow-up is ~2x),
send every point to its single bin, equi-join on (key?, bin), then apply
the exact BETWEEN predicate. The cartesian becomes one hash/sort-merge
shuffle keyed (by, bin) — skew-safe under AQE, bucketable, and the same
plan DuckDB/BigQuery reach with their native range-join optimizations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: str | None = None,
    bin_size: int,
    inclusive_hi: bool = True,
) -> DataFrame:
    """Inner-join every point row to every interval row whose
    ``[lo, hi]`` (or ``[lo, hi)``) contains it, optionally also matching an
    equality key ``by``. Output = point columns + interval columns.

    ``point_col``/``lo_col``/``hi_col`` must be numeric (cast dates to
    epoch days / timestamps to epoch seconds first — a LONG bin key keeps
    the replication arithmetic exact). ``bin_size`` is the quantization
    width in those units; intervals replicate into ``(hi-lo)/bin_size + 1``
    bins, so choose it at or above the typical interval width.

    Columns must not collide between the two inputs (alias first).
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    dup = set(points.columns) & set(intervals.columns) - ({by} if by else set())
    if dup:
        raise ValueError(f"column collision between sides: {sorted(dup)}")

    def _bin(col: str) -> Column:
        # Exact long floor-division: truncating `div` adjusted by pmod so
        # negative values still quantize to the FLOOR bin. Double `/` +
        # floor() is only exact below 2^53 — epoch-nano values pass that,
        # and a point and an interval endpoint rounding to different bins
        # would silently miss matches.
        b = int(bin_size)
        c = f"`{col}`"
        return F.expr(f"(({c} - pmod({c}, {b})) div {b})").cast("long")

    ivals = intervals.withColumn(
        "_bin",
        F.explode(F.sequence(_bin(lo_col), _bin(hi_col))),
    )
    pts = points.withColumn("_bin", _bin(point_col))
    keys = ["_bin"] if by is None else [by, "_bin"]
    cmp_hi = (
        F.col(point_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        pts.join(ivals, keys)
        .filter((F.col(point_col) >= F.col(lo_col)) & cmp_hi)
        .drop("_bin")
    )
