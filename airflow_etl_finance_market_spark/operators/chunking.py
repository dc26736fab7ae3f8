"""Document chunking for training-data pipelines (SURVEY.md §7.5 tier).

Splits each document into fixed-size token windows with overlap — the
standard pre-tokenization step for LLM training corpora (context-length
packing, RAG indexing). Pure Catalyst expressions: tokenize once, derive
window starts with ``sequence``, ``posexplode`` to one row per chunk, and
slice the shared token array per chunk. No Python, no shuffle — chunking
is embarrassingly parallel map-side work, so at 100 TB it scales with
input bytes and the output lands partitioned exactly like the input.

Chunk contract (mirrored 1:1 by the DuckDB oracle):

- tokens = whitespace tokens of the normalized text (functions.text.tokens)
- stride = chunk_tokens − overlap (must be > 0)
- window k starts at token 1 + k·stride (1-based), for every start
  ≤ max(n_tokens − overlap, 1) — so a final window shorter than
  ``overlap`` tokens is never emitted, every token is covered, and a
  document shorter than one chunk yields exactly one chunk.
- chunk_n_tokens = min(chunk_tokens, n_tokens − start + 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..util import fan_out


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, chunk_n_tokens) — one row per token
    window. ``chunk_idx`` is the 0-based window ordinal within the doc."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    base = fan_out(docs, id_col).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    sized = base.select(
        F.col(id_col), "_toks", F.size("_toks").alias("_n")
    )
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("_n") - F.lit(overlap), F.lit(1)),
        F.lit(stride),
    )
    exploded = sized.select(
        F.col(id_col),
        "_toks",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    return exploded.select(
        F.col(id_col),
        "chunk_idx",
        F.concat_ws(
            " ", F.slice("_toks", F.col("_start"), F.lit(chunk_tokens))
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("_start") + F.lit(1)
        ).alias("chunk_n_tokens"),
    )
