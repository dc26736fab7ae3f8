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


def spfhp_strategies(
    histogram: dict[int, int],
    *,
    budget: int,
    max_per_pack: int | None = None,
) -> list[tuple[tuple[int, ...], int]]:
    """Shortest-Pack-First Histogram-Packing solver (Krell et al. 2021,
    "Efficient Sequence Packing Without Cross-contamination" — the
    published packer for LLM training): given ``{length: count}``,
    return ``[(composition, n_packs), ...]`` — how many packs of each
    exact length-composition to build.

    SPFHP walks lengths LONGEST-FIRST; each length's whole count is
    placed in bulk into the open-pack GROUP with the smallest
    remaining space that still fits (splitting the group), opening new
    packs when nothing fits. Operating on the histogram keeps state
    bounded by the number of distinct (composition, remaining) groups
    — O(budget)-ish, never corpus-sized — which is why the driver can
    solve it: the solve consumes the ≤ ``budget``-row histogram, not
    the documents. Compositions come out sorted DESCENDING by
    construction (packs only ever receive non-increasing lengths),
    which the assignment arithmetic in :func:`pack_sequences_spfhp`
    relies on. Deterministic: group choice ties break on group
    creation order; no RNG anywhere.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    for length in histogram:
        if length < 1 or length > budget:
            raise ValueError(
                f"histogram length {length} outside [1, budget={budget}]"
            )
    # open groups: [composition tuple, remaining, multiplicity,
    # first_seq]. The loop is the one-sequence-at-a-time SPFHP made
    # BULK, each jump justified sequentially: (a) once a pack receives
    # one copy of the current length its remaining drops strictly below
    # every other eligible group's, so it stays the shortest-pack-first
    # choice until it can take no more (room copies) — whole packs fill
    # in one arithmetic step; (b) a pack's AGE is its ORIGINAL opening
    # seq (filling never re-ages it — the tie-break the sequential
    # reference implies), and since a group's packs are always a
    # contiguous seq run consumed oldest-first (splits take a prefix,
    # groups never merge), one first_seq per group tracks every
    # pack-level age exactly.
    open_groups: list[list] = []
    closed: dict[tuple[int, ...], int] = {}
    seq = 0
    for length in sorted(histogram, reverse=True):
        c = int(histogram[length])
        while c > 0:
            fits = [
                g
                for g in open_groups
                if g[1] >= length
                and (max_per_pack is None or len(g[0]) < max_per_pack)
            ]
            if fits:
                # shortest-pack-first: smallest remaining, then oldest
                g = min(fits, key=lambda x: (x[1], x[3]))
                room = g[1] // length
                if max_per_pack is not None:
                    room = min(room, max_per_pack - len(g[0]))
                n_full = min(g[2], c // room)
                if n_full > 0:
                    # the group's n_full OLDEST packs each fill with
                    # `room` consecutive copies before the next starts
                    open_groups.append(
                        [
                            g[0] + (length,) * room,
                            g[1] - room * length,
                            n_full,
                            g[3],
                        ]
                    )
                    g[2] -= n_full
                    g[3] += n_full
                    c -= n_full * room
                else:
                    # fewer copies left than one pack absorbs: the last
                    # (partial) fill ends this length
                    open_groups.append(
                        [
                            g[0] + (length,) * c,
                            g[1] - c * length,
                            1,
                            g[3],
                        ]
                    )
                    g[2] -= 1
                    g[3] += 1
                    c = 0
                if g[2] == 0:
                    open_groups.remove(g)
            else:
                # nothing fits: packs open one at a time (consecutive
                # seqs), each filling with q copies before the next opens
                q = budget // length
                if max_per_pack is not None:
                    q = min(q, max_per_pack)
                n_full, leftover = divmod(c, q)
                if n_full > 0:
                    open_groups.append(
                        [
                            (length,) * q,
                            budget - q * length,
                            n_full,
                            seq,
                        ]
                    )
                    seq += n_full
                if leftover > 0:
                    open_groups.append(
                        [
                            (length,) * leftover,
                            budget - leftover * length,
                            1,
                            seq,
                        ]
                    )
                    seq += 1
                c = 0
        # drop exactly-full (or capped) groups to the closed set early:
        # nothing else can ever join them
        still_open = []
        for g in open_groups:
            if g[1] == 0 or (
                max_per_pack is not None and len(g[0]) >= max_per_pack
            ):
                closed[g[0]] = closed.get(g[0], 0) + g[2]
            else:
                still_open.append(g)
        open_groups = still_open
    for g in open_groups:
        closed[g[0]] = closed.get(g[0], 0) + g[2]
    # deterministic output order: longest-lead compositions first, the
    # order the assignment arithmetic enumerates pack ids in
    return sorted(closed.items(), key=lambda kv: kv[0], reverse=True)


def pack_sequences_spfhp(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    max_per_pack: int | None = None,
    oversize: str = "error",
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, pack_offset, pack_fill) — WHOLE-
    document packing by Shortest-Pack-First Histogram-Packing: unlike
    :func:`pack_sequences`' concat-and-chunk (documents straddle
    sequence boundaries), SPFHP places each document INTACT in exactly
    one pack, the contract attention masking needs to avoid
    cross-document contamination (the title problem of Krell et al.
    2021), at ~minimal pad waste (``pack_fill`` is the pack's used
    tokens, so ``budget - pack_fill`` is its padding).

    Three stages, each at its cheapest legal place (the 100 TB bill):

    1. HISTOGRAM (one hash-aggregate): ``{n_tokens: count}`` — at most
       ``budget + 2`` rows collected (every oversize length folds into
       one sentinel bucket at the aggregation), the parameter-bounded-
       collect contract (never documents); the SAME collect answers
       the oversize policy driver-side, so no separate count job scans
       the corpus.
    2. SOLVE (driver, :func:`spfhp_strategies`): pure integer
       function of the histogram; cost independent of corpus size.
    3. ASSIGN (one window + one broadcast range join): docs rank
       within their LENGTH class by id (``row_number`` over the
       length partition — one doc-level shuffle); the solver's
       strategies unroll into per-(strategy, length) SEGMENT rows
       (rank interval → pack arithmetic), and each doc's
       (pack_id, pack_offset) comes out of integer arithmetic against
       its segment: strategies consume each length class in strategy
       order, packs within a strategy in rank order, a pack's k
       copies of one length contiguously. The segment table is tiny
       (total composition entries), broadcast; every cut is integer,
       so the full assignment is engine-replayable.

    ``oversize``: documents longer than ``budget`` cannot pack whole —
    ``"error"`` raises (the default: silent truncation would corrupt
    training data), ``"drop"`` excludes them (quarantine upstream).
    NULL-text documents count 0 tokens and are EXCLUDED under both
    policies (nothing to pack, no offset to assign) — an explicit rule,
    not a NULL-comparison accident; an empty STRING tokenizes to one
    empty token under this package's tokenizer convention
    (``split('') = ['']``, the same count every other operator sees)
    and packs as a 1-token document. Deterministic end to end:
    histogram → strategies → rank arithmetic, no RNG, no float
    anywhere.
    """
    if oversize not in ("error", "drop"):
        raise ValueError("oversize must be 'error' or 'drop'")
    # NULL text counts as 0 tokens (coalesce — under NULL comparison
    # semantics a NULL count would silently fail BOTH the oversize and
    # the packable filter and the document would vanish by ACCIDENT;
    # r15 review). Zero-token documents are then EXCLUDED deliberately:
    # they contribute nothing to a pack and have no offset to assign —
    # quarantine NULLs upstream if they must be accounted for. (An
    # empty STRING is 1 token — split('') = [''] — per the package
    # tokenizer convention, and packs normally.)
    sized = docs.select(
        F.col(id_col),
        F.coalesce(
            F.size(tokens(text_col)).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    # ONE histogram pass serves the oversize check AND the solve; the
    # collect stays PARAMETER-BOUNDED (<= budget + 2 rows) because all
    # oversize lengths fold into one sentinel bucket (budget + 1) at
    # the aggregation — a heavy-tailed corpus can have millions of
    # distinct oversize lengths, and the solve never needs them, only
    # their total count (r15 review; no dedicated count() scan either,
    # the unicode-split double-scan lesson).
    hist_all = {
        int(r["_len"]): int(r["cnt"])
        for r in sized.groupBy(
            F.least(F.col("n_tokens"), F.lit(budget + 1)).alias("_len")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    n_over = hist_all.get(budget + 1, 0)
    if n_over and oversize == "error":
        raise ValueError(
            f"{n_over} document(s) exceed budget={budget}; "
            "pass oversize='drop' or split/truncate upstream"
        )
    sized = sized.filter(
        (F.col("n_tokens") <= budget) & (F.col("n_tokens") >= 1)
    )
    hist = {
        length: c
        for length, c in hist_all.items()
        if 1 <= length <= budget
    }
    strategies = spfhp_strategies(
        hist, budget=budget, max_per_pack=max_per_pack
    )
    # unroll strategies into per-(strategy, length) rank segments
    seg_rows = []
    pack_base = 0
    consumed: dict[int, int] = {}
    for comp, m in strategies:
        fill = sum(comp)
        # contiguous run of each distinct length inside the (descending)
        # composition: k copies starting at integer offset off0
        i = 0
        while i < len(comp):
            length = comp[i]
            j = i
            while j < len(comp) and comp[j] == length:
                j += 1
            k = j - i
            off0 = sum(comp[:i])
            lo = consumed.get(length, 0)
            seg_rows.append(
                (length, lo, lo + k * m, k, pack_base, off0, fill)
            )
            consumed[length] = lo + k * m
            i = j
        pack_base += m
    spark = docs.sparkSession
    segs = spark.createDataFrame(
        seg_rows,
        "n_tokens long, seg_lo long, seg_hi long, k long, "
        "pack_base long, off0 long, pack_fill long",
    )
    ranked = sized.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy("n_tokens").orderBy(id_col)
        )
        - 1,
    )
    return (
        ranked.join(
            F.broadcast(segs),
            ["n_tokens"],
        )
        .filter((F.col("_r") >= F.col("seg_lo")) & (F.col("_r") < F.col("seg_hi")))
        .select(
            id_col,
            "n_tokens",
            (
                F.col("pack_base")
                + F.expr("(_r - seg_lo) div k")
            ).alias("pack_id"),
            (
                F.col("off0")
                + (
                    F.col("_r") - F.col("seg_lo")
                ) % F.col("k") * F.col("n_tokens")
            ).alias("pack_offset"),
            "pack_fill",
        )
    )
