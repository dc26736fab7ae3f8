"""Skew mitigation: salted join (SURVEY.md §4.2 skew row; build-rule
"salting for skew").

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in the
engine session) handles most skew at runtime by splitting oversized
partitions — but it only applies to sort-merge joins and only when the
skewed side can be split without duplicating the other side's partition.
Manual salting remains the tool when one JOIN KEY's row count alone
overwhelms a task (the classic hot-key): explode the small side into
`salt_factor` replicas and scatter the big side's hot rows across them, so
one key's rows land on `salt_factor` tasks instead of one.

Cost model: small side grows x salt_factor (it must still broadcast or
shuffle cheaply); big side gets one extra deterministic column. Use ONLY
for demonstrated hot keys — for uniform keys it just multiplies work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_factor: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, scattering each hot key of `big`
    across `salt_factor` tasks.

    The big side's salt is a deterministic hash of `salt_by` (default: the
    whole row via monotonically varying columns is NOT deterministic across
    retries, so callers pass a stable column — e.g. the fact's surrogate
    id); the small side is exploded into every salt value so every salted
    big row still finds its match. Result rows are identical to the
    unsalted join (verified in tests).
    """
    salt_src = F.col(salt_by) if salt_by else F.spark_partition_id()
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salt_factor)))
    small_s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<bigint>")),
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
