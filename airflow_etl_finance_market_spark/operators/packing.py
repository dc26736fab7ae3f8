"""Sequence packing — documents → fixed-token-budget training sequences.

The last mile of an LLM data pipeline: tokenized documents are concatenated
shard-by-shard and split into fixed-size training sequences ("concat and
chunk"). The operator assigns every document its (shard, sequence, offset)
coordinate deterministically, so the packed dataset is a pure function of
the corpus — re-runnable, resumable, engine-portable.

Physical shape: shard assignment is the map-side salted-md5 bucket
(operators/sampling.hash_bucket — engine-portable, no RNG); within a shard
documents order by id and a single cumulative-sum window assigns the
sequence id. One shuffle total (by shard, for the window sort). Shards are
the scale knob: 100 TB packs as thousands of independent shards, each
window sort bounded by corpus_size/shards, and the output is naturally
written PARTITIONED BY shard. A doc whose tokens straddle a boundary
belongs to the sequence its FIRST token lands in (seq = prev_cumsum div
budget), which is exactly the greedy concat-then-split rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .sampling import hash_bucket


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    shards: int = 8,
    seed: str = "seed42",
) -> DataFrame:
    """(doc_id, shard, seq_id, n_tokens, seq_offset) for every document.

    ``seq_id`` numbers sequences within a shard; ``seq_offset`` is where
    the document's first token lands inside its sequence. Deterministic:
    shard is a salted md5 bucket of the id, order within shard is id-asc.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            hash_bucket(id_col, seed=seed, buckets=shards).alias("shard"),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .select(
            id_col,
            "shard",
            # integer div, not float `/`: double division is only exact
            # below 2^53 and a shard's cumulative token count at full
            # corpus scale can pass that.
            F.expr(f"_cum div {int(budget)}").alias("seq_id"),
            "n_tokens",
            (F.col("_cum") % budget).alias("seq_offset"),
        )
    )
