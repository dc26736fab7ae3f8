"""SCD2 (slowly-changing dimension) maintenance without MERGE.

The reference's dims are SCD0 — ``ON CONFLICT DO NOTHING`` keeps the first
version forever (reference: dags/financial_pipeline.py:148-161). Real
warehouse consumers of its star schema need history: SCD2 closes the old
version and opens a new one per change. Parquet has no MERGE INTO, so this
is the emulation tier (anti-join + union + window recompute), swappable
for a Delta/Iceberg MERGE without touching callers.

Design: instead of surgically updating closed-out rows (point updates are
the thing parquet can't do), keep ONE invariant — validity is a pure
function of each key's version timeline:

    valid_from = the version's change timestamp
    valid_to   = LEAD(valid_from) over (key ORDER BY valid_from), NULL=open
    is_current = valid_to IS NULL

Union current history with the (change-filtered) updates and recompute the
window. Idempotent by construction (re-applying the same batch changes
nothing), one shuffle on the key, and the full-history rewrite is the
standard cost of file-format SCD2 — at 100 TB you bound it by partitioning
history on the key's hash bucket and rewriting only buckets with changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame | None,
    updates: DataFrame,
    *,
    key: str,
    ts: str,
    attrs: list[str],
) -> DataFrame:
    """Fold an update batch into an SCD2 history table.

    `updates` rows carry (key, ts, attrs) — the observation that the key
    had these attribute values from `ts` on. No-op updates (attrs equal to
    the key's latest version) are dropped. Returns the NEW full history:
    (key, attrs..., valid_from, valid_to, is_current).
    """
    new_versions = updates.select(
        F.col(key), *[F.col(a) for a in attrs], F.col(ts).alias("valid_from")
    ).dropDuplicates([key, "valid_from"])

    if history is not None:
        versions = history.select(key, *attrs, "valid_from").unionByName(
            new_versions
        )
        # drop exact re-deliveries of an already-known version
        versions = versions.dropDuplicates([key, "valid_from"])
    else:
        versions = new_versions

    w = Window.partitionBy(key).orderBy("valid_from")
    # change-filter: a version whose attrs equal its predecessor's is a
    # no-op delivery, not a new SCD2 version
    attr_struct = F.struct(*[F.col(a) for a in attrs])
    chained = versions.withColumn("_prev_attrs", F.lag(attr_struct).over(w))
    real = chained.filter(
        F.col("_prev_attrs").isNull() | (attr_struct != F.col("_prev_attrs"))
    ).drop("_prev_attrs")

    return real.select(
        key,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
