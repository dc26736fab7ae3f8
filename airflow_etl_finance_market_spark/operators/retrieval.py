"""BM25 top-k retrieval — keyword search over the document corpus.

The reference has no search tier (its analytics stop at SQL aggregates,
reference: analysis/análise_exploratória.ipynb); a training-data platform
needs one — "find the documents about X" is how curation decisions get
audited, and BM25 is the standard lexical ranking every search engine
(Lucene/Elasticsearch) defaults to.

Scale shape: ONE explode of the corpus tokens, filtered to the query's
terms BEFORE the shuffle (the filter sits map-side under the generator, so
the (doc, term) aggregate only ever sees rows whose term is in the query —
a handful per document, not the whole corpus vocabulary). Document
frequencies and the corpus stats (N, average length) are tiny frames that
broadcast; the final ranking is a TakeOrderedAndProject, never a full
sort. Nothing here is per-query-corpus-scan: at 100 TB the same plan
serves from a pre-materialized (doc, term, tf) posting table bucketed by
term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..util import fan_out


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, bm25) — the ``k`` highest-scoring documents for a bag of
    query ``terms`` under BM25 (Lucene's non-negative idf variant:
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

    Documents containing none of the terms score 0 and never enter the
    ranking. Scores round at the presentation edge (6 places) and ties
    break on ``doc_id``, so the top-k is deterministic and
    oracle-comparable.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens(text_col)
    occ = docs.select(
        id_col,
        F.size(toks).alias("doc_len"),
        F.explode(toks).alias("term"),
    ).filter(F.col("term").isin(terms))
    tf = occ.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("doc_len").alias("doc_len")
    )
    # corpus stats (1 row) and per-term document frequency (≤|terms| rows)
    # both broadcast into the scoring join
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avg_len"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("doc_len") / F.col("avg_len"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(w), 6).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), id_col).limit(k)


def inverted_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """(term, df, postings) — the posting-list build behind
    :func:`bm25_topk`: for every term with ``df >= min_df``, the sorted,
    comma-joined list of documents containing it.

    This is the materialization step a 100 TB deployment runs ONCE so
    per-query BM25 never rescans the corpus: written bucketed by term
    (sources/sinks.write_bucketed_table), a query's term lookups prune to
    their buckets. Postings serialize as a canonical ascending string so
    the result is deterministic and engine-comparable; at scale the same
    aggregate keeps the array form instead.

    Physical shape: one explode of per-doc DISTINCT terms (map-side
    array_distinct bounds rows by per-doc vocabulary), then ONE term-keyed
    hash-aggregate producing df and the posting list together; min_df
    filters after aggregation (HAVING).
    """
    occ = fan_out(docs, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    ).filter(F.length("term") >= 1)
    return (
        occ.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(id_col)),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )
