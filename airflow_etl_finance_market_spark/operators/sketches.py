"""Two-pass heavy hitters (frequent items) over a token stream.

The exact global term top-k needs a full (term)-keyed shuffle of every
occurrence — at 100 TB that shuffle IS the job. The classic fix is the
two-pass sketch-then-verify shape:

  pass 1  per-partition Misra-Gries summaries in bounded memory — a
          map-only Arrow stage emitting at most ``capacity`` candidate
          terms per partition, NO shuffle of the stream;
  pass 2  exact counts for the candidate set only — the occurrence
          stream is pruned by a broadcast semi-join before the one
          (small) aggregate, the same semi-join-reduction economics as
          the Bloom pre-gate.

Correctness rests on the averaging argument: an item with global count
> N/capacity must exceed n_p/capacity in at least one partition p
(otherwise summing the per-partition bounds contradicts the global
count), so the UNION of per-partition MG candidate sets contains every
global heavy hitter. The exact second pass then makes the final top-k
EXACT — provided the k-th item clears the N/capacity floor, which the
caller controls by sizing ``capacity`` (the guarantee is pinned by an
adversarial test; the driver gate sizes capacity far above the fixture's
vocabulary so the bound holds trivially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..util import fan_out


def _mg_candidates_stage(capacity: int):
    """Factory-nested Misra-Gries kernel (ships by value to bare
    workers — the house pickle rule): one bounded summary per Arrow
    batch stream, emitting the summary's keys when the partition ends.

    Vectorized as a SUMMARY MERGE (Agarwal et al. 2012, "Mergeable
    Summaries"): each batch's exact ``value_counts()`` (C speed) is
    itself a trivially-valid MG summary, so merging is add-counts then
    — when the union exceeds ``capacity`` — subtract the
    (capacity+1)-th largest count from every entry and drop the
    non-positive ones. Each subtraction of ``s`` removes ``s`` weight
    from >= capacity+1 distinct entries at once, so total decrement per
    surviving term is <= n_p/(capacity+1) — the SAME averaging-argument
    bound as the per-token Misra-Gries decrement step, at
    per-distinct-term cost instead of per-occurrence Python (the r07
    review's fix: pass 1 touches every token at 100 TB)."""

    def stage(batches):
        import pandas as pd

        summary = None
        for pdf in batches:
            vc = pdf["term"].value_counts()
            summary = (
                vc.astype("int64")
                if summary is None
                else summary.add(vc, fill_value=0).astype("int64")
            )
            if len(summary) > capacity:
                # (capacity+1)-th largest; strictly-greater entries
                # number <= capacity, so the summary stays bounded
                sub = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary[summary > sub] - sub
        terms = [] if summary is None else list(summary.index)
        yield pd.DataFrame({"term": pd.Series(terms, dtype="object")})

    return stage


def heavy_hitters(
    docs: DataFrame,
    *,
    k: int = 20,
    capacity: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """(term, n) — the exact top-``k`` corpus terms by occurrence count,
    computed with the two-pass sketch-then-verify plan. Ties break on
    term ascending (deterministic cross-engine)."""
    # occ feeds both passes and is deliberately NOT localCheckpointed
    # (the bloom.py/dsir double-scan posture): the token stream is
    # corpus-scale, so materializing it for reuse writes more than the
    # second tokenize+explode costs — and pass 2 prunes it map-side
    # with the broadcast semi-join before anything shuffles anyway.
    occ = (
        fan_out(docs, id_col)
        .select(F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") >= min_len)
    )
    candidates = (
        occ.mapInPandas(_mg_candidates_stage(capacity), "term string")
        .distinct()
    )
    exact = (
        occ.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # (n desc, term asc) is a total order, so orderBy+limit is
    # deterministic and plans as TakeOrderedAndProject — no global sort.
    return exact.orderBy(F.desc("n"), F.asc("term")).limit(k)
