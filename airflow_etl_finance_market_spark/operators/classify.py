"""Aggregation-only document classification (training-data tier).

Corpus pipelines gate and rebalance documents with a cheap linear
classifier — the fastText-style quality/domain scorer of the published
LLM-data recipes (CCNet, GPT-3's WebText-vs-CommonCrawl filter, Llama's
Wikipedia-reference classifier). The multinomial Naive Bayes form is the
aggregation-expressible member of that family: training IS a word count
(one groupBy per class), scoring IS a sparse dot product (one join and
one sum) — no gradient loop, no model file, fully mirrorable in SQL, and
every stage is a bounded hash-aggregate at 100 TB.

Physical shape: ONE tokenize+explode feeds both training and scoring.
The model is two frames bounded by |vocab| x |classes| (broadcastable
with a vocab cap) and |classes| rows of priors/denominators (broadcast
always). Scoring fans each doc's distinct terms out x |classes| (small
constant), joins term-keyed against the class-conditional counts, and
reduces per (doc, class) — shuffle bytes ride the doc key, never the
corpus size. The argmax is a per-doc window over |classes| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..util import fan_out


def nb_label_classifier(
    docs: DataFrame,
    *,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 1,
) -> DataFrame:
    """Train-and-score a multinomial Naive Bayes classifier over the
    corpus's own labels (Laplace alpha=1 smoothing).

    Returns (id, label, predicted_<label>, nb_score, correct): the
    argmax class per document under

        score(d, s) = ln P(s) + sum_t n_dt * ln( (c_st + 1) / (c_s + V) )

    with c_st the class-conditional term count, c_s the class token
    total, V the vocabulary size, and P(s) the document-frequency prior.
    Ties break on class name ascending (deterministic cross-engine).
    Documents with NO qualifying token (empty/whitespace text, or every
    token shorter than ``min_len``) are EXCLUDED from the output — an
    empty document has no likelihood under any class, and emitting a
    prior-only guess would report the classifier's class balance as if
    it were evidence; route empties to a quality gate, not a label. A
    NULL label scores normally and reads as ``correct = 0``.
    In-corpus self-classification is the resubstitution-accuracy QA check
    (label/content consistency audit); at 100 TB the same plan trains on
    a labeled sample and the two model frames broadcast to score the
    full corpus.
    """
    labels = docs.select(id_col, label_col)
    occ = (
        fan_out(docs, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") >= min_len)
    )
    # Per-document sparse term vector — tokenization happens ONCE and the
    # result is materialized (house derived-frame-reuse rule): both the
    # model side and the scoring side read dw, so without the checkpoint
    # the corpus-wide explode would re-run per consumer. dw is the
    # smallest faithful form (distinct terms per doc, not occurrences).
    dw = (
        occ.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    # The "model": class-conditional term counts + per-class constants,
    # all derived from dw (sum of per-doc counts == occurrence counts).
    cw = (
        dw.join(labels, id_col)
        .groupBy(label_col, "term")
        .agg(F.sum("n").alias("n_ws"))
    )
    ct = cw.groupBy(label_col).agg(F.sum("n_ws").alias("n_s"))
    vocab = dw.agg(F.countDistinct("term").alias("_vocab"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("_n_docs"))
    priors = docs.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_l"))
    classes = (
        priors.join(ct, label_col)
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(label_col).alias("_cand"),
            (F.log("n_l") - F.log("_n_docs")).alias("_log_prior"),
            F.log(F.col("n_s") + F.col("_vocab")).alias("_log_denom"),
        )
    )
    # Score: fan terms out x |classes|; ln((c+1)/(c_s+V)) folds into
    # sum(n*ln(c+1)) - log_denom * sum(n), keeping the float math a
    # per-group pair of sums (associative-safe, oracle-mirrorable).
    scored = (
        dw.crossJoin(F.broadcast(classes))
        .join(
            cw.select(
                F.col(label_col).alias("_cand"), "term", "n_ws"
            ),
            ["_cand", "term"],
            "left",
        )
        .groupBy(id_col, "_cand", "_log_prior", "_log_denom")
        .agg(
            F.sum(F.col("n") * F.log(F.coalesce(F.col("n_ws"), F.lit(0)) + 1)).alias("_num"),
            F.sum("n").alias("_toks"),
        )
        .select(
            id_col,
            "_cand",
            (F.col("_log_prior") + F.col("_num") - F.col("_log_denom") * F.col("_toks")).alias("_score"),
        )
    )
    # Rank on the ROUNDED score (r07 advice): the emitted nb_score is
    # rounded to 6dp, and double-sum ordering differs between engines —
    # a near-tie (<1e-6) between two classes could otherwise flip
    # predicted_* cross-engine while both nb_scores hash identically.
    # Rounding first makes the tie-break contract match the rounding
    # contract: equal-at-6dp classes break on label ascending.
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round("_score", 6)), F.asc("_cand")
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("_cand").alias(f"predicted_{label_col}"),
            F.round("_score", 6).alias("nb_score"),
        )
    )
    return (
        labels
        .join(best, id_col)
        .select(
            id_col,
            label_col,
            f"predicted_{label_col}",
            "nb_score",
            # coalesce: a NULL label must read as incorrect (0), matching
            # the SQL oracle's CASE WHEN — NULL == x is NULL in Spark and
            # would silently diverge cross-engine otherwise.
            F.coalesce(
                (F.col(label_col) == F.col(f"predicted_{label_col}")).cast(
                    "int"
                ),
                F.lit(0),
            ).alias("correct"),
        )
    )
