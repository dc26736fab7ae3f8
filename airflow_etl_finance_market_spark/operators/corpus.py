"""Corpus-level term statistics (training-data tier, SURVEY.md §7.5).

Global vocabulary statistics — collection frequency, document frequency,
and their ratio shapes (IDF) — are the backbone of corpus analysis and of
classic quality filters (rare-token ratio, boilerplate detection).

Physical shape: tokenize map-side (codegen), ``explode`` to one row per
token occurrence, then a single hash-aggregate keyed on the term. Document
frequency rides the same shuffle as a two-level aggregate (first
(term, doc) distinct via the group key, then term) instead of a separate
``countDistinct`` pass. At 100 TB this is the canonical word-count shape:
partial aggregation collapses each partition's occurrences before the
exchange, so shuffle bytes are bounded by |vocab| per partition, not by
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..util import fan_out


def term_frequencies(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """(term, tf, df) for every term: collection frequency (total
    occurrences) and document frequency (docs containing it).

    One explode + one two-level hash-aggregate. ``tf`` sums per-doc counts,
    so both stats come out of the same (term, doc) pre-aggregate — one
    shuffle keyed on term carries everything.
    """
    # fan out keyed on doc_id: all of a doc's occurrences stay co-located,
    # so hash-partitioning(doc_id) already satisfies the (term, doc_id)
    # grouping's clustering requirement and the per-doc aggregate runs
    # exchange-free — only the final term-keyed shuffle moves data.
    occurrences = (
        fan_out(docs, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") >= min_len)
    )
    per_doc = occurrences.groupBy("term", id_col).agg(
        F.count("*").alias("n_in_doc")
    )
    return per_doc.groupBy("term").agg(
        F.sum("n_in_doc").alias("tf"),
        F.count("*").alias("df"),
    )
