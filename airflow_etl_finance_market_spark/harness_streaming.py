"""Streaming-dedup + late-pipeline gate tier: BPE train/apply,
domain blocklist, KMV/histogram rollups, streaming media dedup
(keyed, signature, windowed-signature), corpus-prep pipeline,
file roundtrips, and the r12 gates (token budget, image row-CDC,
mirror-canonical, gain-robust audio CDC).

One CONTIGUOUS slice of the registry in REGISTRATION ORDER —
the driver-ledger contract: ``harness.py`` imports the tier
modules in sequence, so ``queries()``/``oracles()`` keep the
exact pre-split ordering (the 50-slot window membership is
pinned by tests/test_harness_window.py). Slices are cut at
registration boundaries, so a handful of entries sit with
their chronological neighbors rather than their thematic kin
— ordering is the contract, theming is the map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .harness import (  # noqa: F401  (shared gate surface)
    _bounded_stream_shuffle,
    _next_stream_seq,
    fan_out,
    load_fixture,
    register,
)
from .harness_corpus import (  # noqa: F401
    _GRAMS_SQL,
    _TOKS_SQL,
)
from .harness_media import (  # noqa: F401
    _family_media_builder,
    _family_pair_outcome,
)


def _bpe_merge_replay_oracle(num_merges: int) -> str:
    """Unrolled merge-round replay oracle for ``bpe_merges`` — the
    ``part_supplier_pagerank`` precedent (r05) applied to BPE: the
    iterative loop IS SQL-expressible for a bounded round count, so the
    driver gets a real DuckDB twin instead of a rows-only row (the one
    red r07 ledger row).

    Each round is three chained MATERIALIZED CTEs over the word-type
    table (MATERIALIZED is load-bearing: seg_r feeds both pairs_r and
    seg_{r+1}, and DuckDB inlines multiply-referenced CTEs by default —
    an inlined chain re-evaluates 2^rounds times):

    - ``pairs_r``: adjacent-pair counts off the space-joined symbol
      string (split + positional unnest), weighted by type count;
    - ``best_r``: the 1-row argmax with the pinned (count DESC, left,
      right) tie-break — the same total order the Spark loop collects;
    - ``seg_{r+1}``: the merge applied via the SPACE-DOUBLING replace:
      after ``replace(seg, ' ', '  ')`` every symbol gap is exactly two
      spaces, so the pattern ``' left  right '`` consumes one boundary
      space per neighbor and SQL's left-to-right non-overlapping
      replace() reproduces the reference greedy merge exactly
      (``'a a a a'`` → ``'aa aa'``, not ``'aa a a'``); a final
      double→single collapse + trim restores the representation.

    Symbols can never contain spaces (terms are whitespace tokens), so
    the representation is unambiguous at every round.
    """
    union = "\nUNION ALL\n".join(
        f'SELECT CAST(rnk AS INTEGER) AS "rank", lft AS "left", rgt AS "right",'
        f" CAST(pc AS BIGINT) AS pair_count FROM best{r}"
        for r in range(num_merges)
    )
    return _bpe_replay_ctes(num_merges) + "\n" + union


def _bpe_replay_ctes(num_merges: int) -> str:
    """The shared WITH-chain of the BPE replay (types → seg0 → {pairs_r,
    best_r, seg_{r+1}} x rounds), ``term`` carried through every seg so
    consumers can read either the merge table (``best_r``) or the final
    segmentation (``seg{num_merges}``)."""
    parts = [
        f"""
WITH types AS MATERIALIZED (
    SELECT term, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
    WHERE length(term) >= 1
    GROUP BY term
),
seg0 AS MATERIALIZED (
    SELECT term, cnt,
           array_to_string(string_split(term, ''), ' ') || ' </w>' AS seg
    FROM types
)"""
    ]
    for r in range(num_merges):
        parts.append(
            f""",
pairs{r} AS MATERIALIZED (
    SELECT toks[i] AS lft, toks[i + 1] AS rgt, SUM(cnt) AS pc
    FROM (
        SELECT toks, cnt, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM (SELECT string_split(seg, ' ') AS toks, cnt FROM seg{r})
    )
    GROUP BY 1, 2
),
best{r} AS MATERIALIZED (
    SELECT {r} AS rnk, lft, rgt, pc
    FROM pairs{r}
    ORDER BY pc DESC, lft ASC, rgt ASC
    LIMIT 1
),
seg{r + 1} AS MATERIALIZED (
    SELECT term, cnt,
           trim(replace(
               replace(' ' || replace(seg, ' ', '  ') || ' ',
                       ' ' || b.lft || '  ' || b.rgt || ' ',
                       ' ' || b.lft || b.rgt || ' '),
               '  ', ' ')) AS seg
    FROM seg{r}, best{r} b
)"""
        )
    return "".join(parts)


def _bpe_token_stats_oracle(num_merges: int) -> str:
    """Oracle for ``bpe_token_counts``: replay the merge chain to the
    FINAL segmentation table (``seg{num_merges}``), then mirror
    ``bpe_token_stats``'s apply — a vocab-keyed join of the occurrence
    stream to per-type subword counts, one doc-keyed aggregate (unseen
    types fall back to characters+marker, same COALESCE)."""
    return (
        _bpe_replay_ctes(num_merges)
        + f""",
seg_len AS MATERIALIZED (
    SELECT term, len(string_split(seg, ' ')) AS n_subwords
    FROM seg{num_merges}
),
occ AS (
    SELECT doc_id, u.term
    FROM documents, unnest({_TOKS_SQL}) AS u(term)
    WHERE length(u.term) >= 1
)
SELECT occ.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(COALESCE(s.n_subwords, length(occ.term) + 1)) AS BIGINT)
           AS n_bpe_tokens
FROM occ LEFT JOIN seg_len s USING (term)
GROUP BY occ.doc_id
"""
    )


@register(
    "bpe_pipeline",
    f"""
SELECT 'merge' AS kind,
       CAST("rank" AS VARCHAR) AS k1,
       "left" AS k2,
       "right" AS k3,
       CAST(pair_count AS VARCHAR) AS k4
FROM ({_bpe_merge_replay_oracle(30)}) AS m
UNION ALL
SELECT 'doc',
       CAST(doc_id AS VARCHAR),
       CAST(n_words AS VARCHAR),
       CAST(n_bpe_tokens AS VARCHAR),
       CAST(NULL AS VARCHAR)
FROM ({_bpe_token_stats_oracle(30)}) AS d
""",
)
def q_bpe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE train + apply in ONE multi-variant gate — round-11 merge of
    `bpe_merges` + `bpe_token_counts` (growth paired with retirement).
    RETIREMENT RATIONALE: both gates started from the same
    ``bpe_train`` call (the apply gate TRAINED AGAIN to get the
    segmentation table), so the registry paid the 30-round training
    loop twice per verification for one code path; the union pins the
    merge table AND the corpus tokenization off a single training run
    (a drift in either half flips the hash), projected to a common
    VARCHAR schema with a `kind` discriminator. The pure-Python
    reference differential (tests/test_corpus_ops.py::TestBpe) is
    untouched.

    Training (Sennrich et al. 2016): one corpus pass builds the
    word-type histogram, then every merge round runs on the
    vocab-bounded table — pair explode + hash-agg + a 1-row argmax
    collect — with the segmentation frame localCheckpoint-ed per
    round. Apply: the learned segmentation is a vocab-bounded
    broadcast, so tokenizing the corpus is ONE explode + one broadcast
    join + one doc-keyed aggregate — no per-token merge replay
    anywhere (the distributed half a 100 TB tokenizer job actually
    needs; see the honest-ceiling note in operators/bpe.py)."""
    from .operators.bpe import bpe_token_stats, bpe_train

    docs = load_fixture(spark, sf_dir, "documents")
    merges, segments = bpe_train(docs, num_merges=30)
    m = merges.select(
        F.lit("merge").alias("kind"),
        F.col("rank").cast("string").alias("k1"),
        F.col("left").alias("k2"),
        F.col("right").alias("k3"),
        F.col("pair_count").cast("string").alias("k4"),
    )
    t = bpe_token_stats(docs, segments).select(
        F.lit("doc").alias("kind"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("n_words").cast("string").alias("k2"),
        F.col("n_bpe_tokens").cast("string").alias("k3"),
        F.lit(None).cast("string").alias("k4"),
    )
    return m.unionAll(t)


@register(
    "domain_blocklist_filter",
    """
WITH sel AS (
    SELECT doc_id, ((doc_id - 3) // 7) % 4 AS cat
    FROM documents WHERE doc_id % 7 = 3
)
SELECT doc_id,
       CASE WHEN cat = 0 THEN 'ok' || doc_id || '.com'
            ELSE 'nottracker' || doc_id || '.net' END AS host
FROM sel WHERE cat IN (0, 3)
""",
)
def q_domain_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist URL hygiene HARD GATE
    (operators/corpus.domain_blocklist_filter) — the third leg of the
    r11 provenance tier (canonicalize → url-dedup → blocklist): every
    7th document gets a host by category (k = (doc_id-3)//7, cat=k%4):
    cat 0 `ok{id}.com` (clean), cat 1 `bad{id}.com` (blocked EXACTLY),
    cat 2 `ads.tracker{id}.net` (blocked via the PARENT-DOMAIN entry
    `tracker{id}.net` — the suffix-walk the operator exists for),
    cat 3 `nottracker{id}.net` (its blocklist sibling `tracker{id}.net`
    is present but must NOT match — label-boundary semantics; a
    substring matcher fails exactly here). The blocklist itself is
    derived from the same id arithmetic, so the oracle PREDICTS the
    survivor rows (ids and hosts) from the construction alone — over-
    blocking (cat 0/3 missing) and under-blocking (cat 1/2 present)
    both break the hash. Host extraction is map-side codegen; the
    suffix explode carries (host, suffix) rows only; the blocklist
    broadcasts."""
    sel = load_fixture(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 3
    )
    cat = (((F.col("doc_id") - 3) / 7).cast("long") % 4).alias("cat")
    i = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("cat") == 0,
               F.concat(F.lit("https://ok"), i, F.lit(".com/x")))
        .when(F.col("cat") == 1,
              F.concat(F.lit("https://bad"), i, F.lit(".com/x")))
        .when(F.col("cat") == 2,
              F.concat(F.lit("https://ads.tracker"), i, F.lit(".net/x")))
        .otherwise(
            F.concat(F.lit("https://nottracker"), i, F.lit(".net/x")))
    )
    pages = fan_out(
        sel.select("doc_id", cat), "doc_id"
    ).withColumn("url", url)
    blocklist = pages.select(
        F.when(
            F.col("cat") == 1,
            F.concat(F.lit("bad"), i, F.lit(".com")),
        )
        .when(
            F.col("cat").isin(2, 3),
            F.concat(F.lit("tracker"), i, F.lit(".net")),
        )
        .alias("domain")
    ).filter(F.col("domain").isNotNull())
    from .operators.corpus import domain_blocklist_filter

    return domain_blocklist_filter(pages, blocklist).select(
        "doc_id", "host"
    )


@register(
    "weekly_user_kmv_rollup",
    """
WITH h AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
    FROM events
), daily AS (
    SELECT d, list_sort(list(h)) AS kmv FROM (
        SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn
        FROM h
    ) WHERE rn <= 64 GROUP BY d
), wkh AS (
    SELECT DISTINCT CAST(date_trunc('week', d) AS DATE) AS week, u.h
    FROM daily, unnest(kmv) AS u(h)
), wk AS (
    SELECT week, list_sort(list(h)) AS kmv FROM (
        SELECT week, h,
               ROW_NUMBER() OVER (PARTITION BY week ORDER BY h) AS rn
        FROM wkh
    ) WHERE rn <= 64 GROUP BY week
), paired AS (
    SELECT week, kmv, LAG(kmv) OVER (ORDER BY week) AS prev FROM wk
), combined AS (
    SELECT week, kmv, prev,
           CASE WHEN prev IS NOT NULL THEN
               list_sort(list_distinct(list_concat(kmv, prev)))[1:64]
           END AS comb
    FROM paired
)
SELECT week,
       len(kmv) AS kmv_size,
       ROUND(CASE WHEN len(kmv) < 64 THEN CAST(len(kmv) AS DOUBLE)
                  ELSE (63.0 * 1152921504606846976.0)
                       / CAST(kmv[64] AS DOUBLE) END, 4) AS est_users,
       ROUND(len(list_intersect(comb, list_intersect(kmv, prev)))
             / len(comb), 6) AS prev_jaccard_est,
       ROUND((len(list_intersect(comb, list_intersect(kmv, prev)))
              / len(comb))
             * CASE WHEN len(comb) < 64 THEN CAST(len(comb) AS DOUBLE)
                    ELSE (63.0 * 1152921504606846976.0)
                         / CAST(comb[64] AS DOUBLE) END, 4)
           AS prev_common_users_est
FROM combined
""",
)
def q_weekly_user_kmv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k theta) distinct sketch rollup with SET OPERATIONS
    (plans/analytics.kmv_daily_user_sketches ∘ kmv_rollup_estimates) —
    the third stored-sketch family member: HLL answers distinct,
    histograms answer quantiles, KMV answers INTERSECTIONS. Daily
    bottom-64 sketches of the portable 60-bit md5 user hash store once;
    weekly merges read the distinct-user estimate AND the
    Jaccard/common-users estimates vs the previous week (retained
    audience) off <= 64-element arrays — never rescanning events. Every
    estimate is exact-integer inputs + one double division, so the
    oracle mirrors it to the bit."""
    from .plans.analytics import kmv_daily_user_sketches, kmv_rollup_estimates

    daily = kmv_daily_user_sketches(load_fixture(spark, sf_dir, "events"))
    return kmv_rollup_estimates(daily)


@register(
    "streaming_dedup_ingest",
    """
SELECT user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY user_id
""",
)
def q_streaming_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup-on-ingest HARD GATE: at-least-once delivery is
    simulated by planting a FULL-ROW duplicate of every 7th event into
    3 ts-ranged file micro-batches, then ``dedup_events`` (streaming
    branch: watermark + dropDuplicatesWithinWatermark — per-key state
    EVICTED at the watermark horizon, the property that lets ingest
    dedup run unbounded at 100 TB where a plain dropDuplicates would
    OOM on all-time key state) replays them as a REAL availableNow
    streaming query. The returned frame is per-user count + value sums
    over the DEDUPED stream, and the oracle aggregates the events table
    DIRECTLY — equality means every planted duplicate was dropped (a
    missed one inflates a count/sum) and no original was over-dropped
    (deflates). Cross-batch correctness rides the same gate: duplicates
    share their original's timestamp, so batch boundaries sit between
    duplicate groups only by ts-range construction."""
    import os
    import shutil
    import tempfile

    from .streaming import dedup_events, read_events_stream, run_available_now
    from .streaming.io import EVENTS_STREAM_SCHEMA

    seq = _next_stream_seq()

    tmp = tempfile.mkdtemp(prefix="finmarket_dedup_gate_")
    try:
        raw = spark.read.schema(EVENTS_STREAM_SCHEMA).parquet(
            f"{sf_dir}/events.parquet"
        )
        planted = raw.unionAll(raw.filter(F.col("event_id") % 7 == 0))
        lo, hi = planted.selectExpr("min(ts)", "max(ts)").first()
        span = (hi - lo) // 3 + 1
        for i in range(3):
            pdir = f"{tmp}/in/b{i}"
            planted.filter(
                (planted.ts >= lo + i * span)
                & (planted.ts < lo + (i + 1) * span)
            ).coalesce(1).write.mode("overwrite").parquet(pdir)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)
        with _bounded_stream_shuffle(spark):
            deduped = run_available_now(
                dedup_events(
                    read_events_stream(
                        spark, f"{tmp}/in/b*", max_files_per_trigger=1
                    )
                ),
                f"_gate_dedup_{seq}",
                output_mode="append",
            )
            out = (
                deduped.groupBy("user_id")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.round(F.sum("value"), 6).alias("sum_value"),
                )
                .localCheckpoint()  # materialize before tmp cleanup
            )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "streaming_media_dedup_ingest",
    """
SELECT COUNT(*) AS n_unique_clips,
       true AS one_survivor_per_family
FROM documents
WHERE doc_id % 10 = 7
""",
)
def q_streaming_media_dedup_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming MEDIA dedup-on-ingest HARD GATE — the multimodal twin
    of streaming_dedup_ingest: the key is not a delivery id but the
    audio FINGERPRINT, so byte-different re-encodes of the same content
    collapse at the stream edge. Every 10th document seeds the audio
    tier's 3-member re-encode family (mono PCM16 / stereo channel-dup /
    8-bit-lattice PCM8 — identical fingerprints BY ARITHMETIC), each
    family sharing one ingest timestamp; families land whole in one of
    3 file micro-batches and replay as a REAL availableNow streaming
    query: mapInPandas fingerprint stage (event-time column passed
    THROUGH the stage — a watermark dies with any projection that drops
    its column) → watermark → dropDuplicatesWithinWatermark on the
    signature (state bounded by the watermark horizon x unique-content
    rate — the property that lets ingest dedup run unbounded at 100 TB).
    The oracle PREDICTS the outcome: exactly ONE survivor per family
    (n docs → n clips out of 3n in), checked per-family so an
    over-dedup (signature collision) or under-dedup (missed re-encode)
    both flip the boolean."""
    import os
    import shutil
    import tempfile

    from .fixtures import wav_family_members
    from .multimodal.audio import audio_fingerprints
    from .streaming import dedup_by_signature, run_available_now

    _members = wav_family_members()

    seq = _next_stream_seq()

    def _build(batches):
        import pandas as pd

        for pdf in batches:
            ids, tss, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # one ingest timestamp per family (micros); re-encodes
                # of one upload arrive together
                fam_ts = 1_700_000_000_000_000 + int(doc_id) * 1_000_000
                for k, payload in enumerate(_members(text)):
                    ids.append(doc_id * 10 + k)
                    tss.append(fam_ts)
                    payloads.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ts": pd.Series(tss, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 == 7
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _build, "doc_id long, ts long, payload binary"
    )
    tmp = tempfile.mkdtemp(prefix="finmarket_media_dedup_gate_")
    try:
        # 3 ts-ordered file micro-batches; every family lands whole in
        # one batch (partitioned on CONTIGUOUS family-id ranges), so
        # duplicate groups never straddle a batch boundary AND event
        # time is monotone non-decreasing across batches — the r09
        # advice: the old fam % 3 assignment interleaved timestamps
        # across batches, so correctness silently depended on the
        # fixture's id span staying inside the 1-hour watermark; range
        # batches stay valid at any fixture size.
        fam = (F.col("doc_id") / 10).cast("long")
        f_lo, f_hi = media.select(
            F.min(fam).alias("lo"), F.max(fam).alias("hi")
        ).first()
        f_span = (f_hi - f_lo) // 3 + 1
        for i in range(3):
            pdir = f"{tmp}/in/b{i}"
            media.filter(
                (fam >= f_lo + i * f_span) & (fam < f_lo + (i + 1) * f_span)
            ).coalesce(1).write.mode("overwrite").parquet(pdir)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)
        stream = (
            spark.readStream.schema("doc_id long, ts long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/b*")
            # event-time watermarks require TIMESTAMP (LTZ); the output
            # carries no timestamp so no TZ rendering can leak
            .withColumn("ts", F.expr("timestamp_micros(ts)"))
        )
        fps = audio_fingerprints(stream, passthrough=("ts",))
        with _bounded_stream_shuffle(spark):
            survivors = run_available_now(
                dedup_by_signature(fps, sig_col="afp", ts="ts"),
                f"_gate_media_dedup_{seq}",
                output_mode="append",
            )
            per_fam = (
                survivors.select(
                    (F.col("doc_id") / 10).cast("long").alias("fam")
                )
                .groupBy("fam")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            row = per_fam.agg(
                F.count(F.lit(1)).alias("n_fams"),
                F.min(F.col("cnt") == 1).alias("all_single"),
                F.sum("cnt").alias("n_unique"),
            ).first()
        ok = row["n_fams"] == n_docs and row["all_single"] is True
        return spark.createDataFrame(
            [(row["n_unique"], ok)],
            "n_unique_clips long, one_survivor_per_family boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)



@register(
    "streaming_windowed_media_dedup",
    """
SELECT COUNT(*) * 3 AS n_clips,
       COUNT(*) AS n_survivors,
       COUNT(*) * 2 AS n_duplicates,
       true AS survivors_are_originals,
       true AS dups_attributed_within_family
FROM documents
WHERE doc_id % 12 = 5
""",
)
def q_streaming_windowed_media_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming WINDOWED-signature media dedup HARD GATE — closes the
    r10 composition gap (#6): ``dedup_by_signature`` collapses only
    whole-content signatures at the ingest edge, so the trim/crop-robust
    tiers (window/tile/frame subfingerprints matched as SETS) were
    batch-only. ``windowed_signature_ownership`` moves them to the
    stream: per-window subfingerprints explode into max_hamming+1
    pigeonhole blocks, ``applyInPandasWithState`` keeps a per-block
    registry of hashes seen within the retention horizon (state bounded
    by horizon x unique-window rate — evicted at last_seen + retain),
    rows buffer until the watermark passes them (the
    pct_change_reordered discipline, so ownership is a pure function of
    EVENT time), and ``windowed_dedup_verdicts`` reduces ownership rows
    to per-clip duplicate verdicts.

    Fixture: every 12th document seeds the trim tier's 3-member family
    (full 4-window lattice clip / its WINDOW-ALIGNED trim — surviving
    windows byte-identical BY ARITHMETIC / a stereo channel-dup of the
    trim), planted across 3 ts-ordered file micro-batches BY MEMBER:
    all fulls land at ts B in batch 0, all trims at B+600s in batch 1,
    all stereo dups at B+1200s in batch 2 — so every duplicate's
    matching state entry was REGISTERED IN AN EARLIER MICRO-BATCH (the
    cross-batch carry is the point of the gate), and a later-stamped
    sentinel clip (batch 3) pushes the final watermark past every real
    row (append-mode: unfinalized = unemitted). The oracle PREDICTS the
    outcome: 3n verdict rows (a quarantine or an unflushed buffer
    shrinks the count), the n survivors are EXACTLY the fulls, and all
    2n duplicates attribute to their own family's full (trim overlap =
    3/min(4,3) = 1.0 >= 0.8 on the smaller side; a cross-family
    single-window collision is absorbed by the fraction threshold)."""
    import os
    import shutil
    import tempfile

    from .fixtures import wav_trim_family_members
    from .multimodal.audio import audio_window_fingerprints
    from .streaming import (
        run_available_now,
        windowed_dedup_verdicts,
        windowed_signature_ownership,
    )

    _members = wav_trim_family_members()

    seq = _next_stream_seq()

    base_us = 1_700_000_000_000_000

    def _build(batches):
        import pandas as pd

        for pdf in batches:
            ids, tss, payloads = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for k, payload in enumerate(_members(text)):
                    ids.append(doc_id * 10 + k)
                    # member k of EVERY family shares one ingest time:
                    # the duplicate always lands in a later micro-batch
                    # than its original, never alongside it
                    tss.append(base_us + k * 600_000_000)
                    payloads.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ts": pd.Series(tss, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 12 == 5
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _build, "doc_id long, ts long, payload binary"
    )
    tmp = tempfile.mkdtemp(prefix="finmarket_wsd_gate_")
    try:
        # batch k = member k of every family (ts monotone across
        # batches by construction); batch 3 = the sentinel clip whose
        # timestamp drags the final watermark past every real row
        for i in range(3):
            pdir = f"{tmp}/in/b{i}"
            media.filter(F.col("doc_id") % 10 == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(pdir)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    os.utime(f"{pdir}/{f}", (1_700_000_000 + i,) * 2)
        sentinel = spark.createDataFrame(
            [(-1, base_us + 10_800_000_000,
              bytearray(_members("wsd sentinel")[0]))],
            "doc_id long, ts long, payload binary",
        )
        pdir = f"{tmp}/in/b3"
        sentinel.coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                os.utime(f"{pdir}/{f}", (1_700_000_003,) * 2)
        stream = (
            spark.readStream.schema("doc_id long, ts long, payload binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/b*")
            .withColumn("ts", F.expr("timestamp_micros(ts)"))
        )
        fps = audio_window_fingerprints(stream, passthrough=("ts",))
        own = windowed_signature_ownership(
            fps, delay="5 minutes", retain="1 hour", max_hamming=4
        )
        with _bounded_stream_shuffle(spark):
            own_tbl = run_available_now(
                own, f"_gate_wsd_{seq}", output_mode="append"
            )
            v = windowed_dedup_verdicts(
                own_tbl.filter(F.col("doc_id") >= 0), min_match_frac=0.8
            )
            fam = (F.col("doc_id") / 10).cast("long") * 10
            row = v.agg(
                F.count(F.lit(1)).alias("n_clips"),
                F.sum(
                    F.when(~F.col("is_duplicate"), 1).otherwise(0)
                ).alias("n_survivors"),
                F.sum(
                    F.when(F.col("is_duplicate"), 1).otherwise(0)
                ).alias("n_duplicates"),
                F.min(
                    F.when(
                        ~F.col("is_duplicate"),
                        F.col("doc_id") % 10 == 0,
                    )
                ).alias("survivors_ok"),
                F.min(
                    F.when(
                        F.col("is_duplicate"), F.col("dup_of") == fam
                    )
                ).alias("dups_ok"),
            ).first()
        return spark.createDataFrame(
            [(
                row["n_clips"],
                row["n_survivors"],
                row["n_duplicates"],
                bool(row["survivors_ok"])
                and row["n_survivors"] == n_docs,
                bool(row["dups_ok"]),
            )],
            "n_clips long, n_survivors long, n_duplicates long, "
            "survivors_are_originals boolean, "
            "dups_attributed_within_family boolean",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "cross_doc_ngram_overlap",
    f"""
WITH occ AS (
    SELECT doc_id, g.gram
    FROM documents,
         unnest(list_distinct(list_transform(
             generate_series(1, greatest(len({_TOKS_SQL}) - 4, 1)),
             i -> array_to_string(({_TOKS_SQL})[i:i+4], ' ')))) AS g(gram)
), dfreq AS (
    SELECT gram, COUNT(*) AS df FROM occ GROUP BY gram
)
SELECT o.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared,
       ROUND(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) / COUNT(*), 6)
           AS shared_frac
FROM occ o JOIN dfreq d USING (gram)
GROUP BY o.doc_id
""",
)
def q_cross_doc_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus-internal duplication score: fraction of the
    doc's distinct 5-grams appearing in >= 1 other document
    (operators/corpus.cross_doc_ngram_overlap) — the Dolma/RefinedWeb
    boilerplate signal, pair-free (explode + two keyed aggregates)."""
    from .operators.corpus import cross_doc_ngram_overlap

    return cross_doc_ngram_overlap(
        load_fixture(spark, sf_dir, "documents")
    )


@register(
    "doc_nb_lang_classifier",
    f"""
WITH occ AS (
    SELECT doc_id, lang, u.term
    FROM documents, unnest({_TOKS_SQL}) AS u(term)
    WHERE length(u.term) >= 1
), dw AS (
    SELECT doc_id, term, COUNT(*) AS n FROM occ GROUP BY doc_id, term
), cw AS (
    SELECT lang, term, COUNT(*) AS n_ws FROM occ GROUP BY lang, term
), ct AS (
    SELECT lang, SUM(n_ws) AS n_s FROM cw GROUP BY lang
), v AS (
    SELECT COUNT(DISTINCT term) AS vocab FROM occ
), nd AS (
    SELECT COUNT(*) AS n_docs FROM documents
), classes AS (
    SELECT p.lang AS cand,
           ln(p.n_l) - ln(nd.n_docs) AS log_prior,
           ln(ct.n_s + v.vocab) AS log_denom
    FROM (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang) p
    JOIN ct USING (lang) CROSS JOIN v CROSS JOIN nd
), scored AS (
    SELECT dw.doc_id, c.cand,
           c.log_prior
               + SUM(dw.n * ln(COALESCE(cw.n_ws, 0) + 1))
               - c.log_denom * SUM(dw.n) AS score
    FROM dw CROSS JOIN classes c
    LEFT JOIN cw ON cw.term = dw.term AND cw.lang = c.cand
    GROUP BY dw.doc_id, c.cand, c.log_prior, c.log_denom
), ranked AS (
    SELECT doc_id, cand, score,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY ROUND(score, 6) DESC, cand ASC
           ) AS rn
    FROM scored
)
SELECT d.doc_id, d.lang, r.cand AS predicted_lang,
       ROUND(r.score, 6) AS nb_score,
       CAST(CASE WHEN r.cand = d.lang THEN 1 ELSE 0 END AS INT) AS correct
FROM documents d JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
""",
)
def q_doc_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-analog domain/quality classifier (operators/classify.py):
    multinomial Naive Bayes trained on the corpus's own lang labels and
    applied back (resubstitution QA — the label/content consistency audit
    of the CCNet/GPT-3-filter recipe class). Training is two hash
    aggregates, scoring one term-keyed join + per-doc window over
    |classes| rows — every stage bounded by vocab or doc count."""
    from .operators.classify import nb_label_classifier

    return nb_label_classifier(load_fixture(spark, sf_dir, "documents"))


@register(
    "corpus_prep_pipeline",
    """
WITH base AS (
    SELECT doc_id, lang, text, text AS _raw,
           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS _toks,
           string_split(text, chr(10)) AS _lines
    FROM documents
), flags AS (
    SELECT doc_id,
           (len(_toks) >= 50 AND len(_toks) <= 100000
            AND list_sum(list_transform(_toks, w -> length(w))) >= 3 * len(_toks)
            AND list_sum(list_transform(_toks, w -> length(w))) <= 10 * len(_toks)
            AND ((length(_raw) - length(replace(_raw, '#', '')))
                 + (length(_raw) - length(replace(_raw, '...', ''))) / 3) * 10
                <= greatest(len(_toks), 1)
            AND len(list_filter(_lines, l -> starts_with(l, '•') OR starts_with(l, '- '))) * 10
                < greatest(len(_lines), 1) * 9
            AND len(list_filter(_lines, l -> ends_with(l, '...'))) * 10
                < greatest(len(_lines), 1) * 3
            AND len(list_filter(_toks, w -> regexp_matches(w, '[a-z]'))) * 10
                >= greatest(len(_toks), 1) * 8
            AND len(list_filter(_toks, w -> w IN
                ('the','be','to','of','and','that','have','with'))) >= 2
           ) AS keep
    FROM base
), kept AS (
    SELECT b.doc_id, b.lang, b.text, b._toks
    FROM base b JOIN flags f ON b.doc_id = f.doc_id AND f.keep
), dedup AS (
    SELECT k.* FROM kept k JOIN (
        SELECT MIN(doc_id) AS keep_id
        FROM kept
        GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ) s ON k.doc_id = s.keep_id
), counts AS (
    SELECT lang, COUNT(*) AS cnt FROM dedup GROUP BY lang
), m AS (
    SELECT MIN(cnt) AS mn FROM counts
), thr AS (
    SELECT lang, CAST(GREATEST(1, (mn * 10000) // cnt) AS BIGINT) AS t
    FROM counts, m
), balanced AS (
    SELECT d.* FROM dedup d JOIN thr USING (lang)
    WHERE CAST(('0x' || substr(md5('rebalance42:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 10000 < thr.t
), assigned AS (
    SELECT lang, _toks,
           CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM (
        SELECT lang, _toks,
               CAST(('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS b
        FROM balanced
    )
)
SELECT lang, split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(_toks)) AS BIGINT) AS total_words
FROM assigned
GROUP BY lang, split
""",
)
def q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data prep chain as ONE driver-verified
    surface (the composition precedent of weekly_activity_panel,
    applied to the corpus tier): Gopher quality gate → exact dedup
    (min-id survivor per normalized-text fingerprint) → language
    rebalance (corpus-derived integer keep thresholds) → deterministic
    train/valid/test split → the resulting DATA CARD (docs + whitespace
    tokens per (lang, split)). Every stage is an already-oracle-checked
    operator; the composed oracle re-derives the WHOLE funnel —
    including the rebalance thresholds, which here come from the
    POST-filter POST-dedup corpus, not the raw table — so a drift in
    any stage (or in how stages hand off) flips the hash. Stages use
    DISTINCT hash seeds ('rebalance42:', 'split42:'): composing two
    salted-hash stages with the SAME seed correlates them (a rebalance
    threshold below 80% of the bucket space would otherwise push every
    surviving document into 'train'). Scale shape: the corpus flows
    map-side through flags → one fp aggregate + semi-join → broadcast
    thresholds → projection split → one final aggregate; nothing
    pairwise, one doc-keyed shuffle for the dedup."""
    from .functions.text import token_count
    from .operators.corpus import gopher_quality_flags
    from .operators.dedup import dedup_exact
    from .operators.sampling import assign_split, rebalance_sample

    docs = load_fixture(spark, sf_dir, "documents")
    kept = docs.join(
        gopher_quality_flags(docs).filter("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    deduped = dedup_exact(kept)
    balanced = rebalance_sample(
        deduped, strata_col="lang", id_col="doc_id", seed="rebalance42"
    )
    assigned = assign_split(balanced, "doc_id", seed="split42")
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_words"),
    )


@register(
    "file_roundtrip_ingest",
    """
SELECT 'jsonl' AS fmt, lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len
FROM documents
GROUP BY lang, source
UNION ALL
SELECT 'orc' AS fmt, lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(length(text)) AS BIGINT) AS total_text_len
FROM documents
GROUP BY lang, source
""",
)
def q_file_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interchange-format roundtrip through BOTH sinks in ONE gate —
    the r10 verdict's registry-headroom merge of
    ``orc_roundtrip_ingest`` (r07) + ``jsonl_roundtrip_ingest`` (r08);
    every assertion of both retired gates survives as one format row
    set here, now with the stronger of the two aggregates (the JSONL
    gate's ``total_text_len``) applied to BOTH formats.

    Format 'orc' (sources/readers.read_orc/write_orc): the documents
    table is written to a lang-PARTITIONED ORC layout (the Hive/Trino
    estate format) and read back; stripe splits parallelize the
    re-read the way parquet row groups do. Format 'jsonl'
    (read_jsonl_corpus/write_jsonl_corpus, schema-first FAILFAST): the
    wire format text corpora actually ship in (The Pile / Dolma / CC
    derivatives); newline-split files parallelize the re-read without
    fan_out. The oracle aggregates the parquet source directly, so
    equality proves each sink+source pair preserves rows, types, the
    partition column, AND the text payload byte length end-to-end (a
    lost escape or mangled unicode shifts total_text_len)."""
    import shutil
    import tempfile

    from .sources.readers import (
        read_jsonl_corpus,
        read_orc,
        write_jsonl_corpus,
        write_orc,
    )

    docs = load_fixture(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="finmarket_fmt_rt_")

    def _agg(back: DataFrame, fmt: str) -> DataFrame:
        return (
            back.groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
                F.sum(F.length("text")).alias("total_text_len"),
            )
            .select(F.lit(fmt).alias("fmt"), "*")
        )

    try:
        write_orc(docs, f"{tmp}/documents_orc", partition_by=("lang",))
        write_jsonl_corpus(docs, f"{tmp}/documents_jsonl")
        out = _agg(read_orc(spark, f"{tmp}/documents_orc"), "orc").unionByName(
            _agg(
                read_jsonl_corpus(
                    spark, f"{tmp}/documents_jsonl", docs.schema
                ),
                "jsonl",
            )
        )
        return out.localCheckpoint()  # materialize before tmp cleanup
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "embedding_contrastive_negatives",
    """
WITH cands AS (
    SELECT CAST(('0x' || substr(md5('negs:b:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS bkt,
           vec_id AS neg_id, label AS neg_label
    FROM embeddings
), anchors AS (
    SELECT vec_id AS anchor_id, label AS anchor_label,
           CAST(('0x' || substr(md5('negs:p:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS bkt
    FROM embeddings
), pairs AS (
    SELECT a.anchor_id, a.anchor_label, c.neg_id, c.neg_label,
           ROW_NUMBER() OVER (
               PARTITION BY a.anchor_id
               ORDER BY CAST(('0x' || substr(md5(
                   'negs:r:' || CAST(a.anchor_id AS VARCHAR) || ':'
                             || CAST(c.neg_id AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
                        c.neg_id ASC
           ) AS rnk
    FROM anchors a JOIN cands c USING (bkt)
    WHERE a.anchor_label != c.neg_label
)
SELECT anchor_id, anchor_label, neg_id, neg_label,
       CAST(rnk AS INT) AS neg_rank
FROM pairs WHERE rnk <= 3
""",
)
def q_embedding_contrastive_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic contrastive negative sampling
    (operators/sampling.contrastive_negatives): per anchor vector, 3
    cross-label negatives from ONE salted-hash candidate bucket — the
    auditable, reproducible negative draw an embedding-training pipeline
    needs, with pair fan-out bounded by N/buckets per anchor (buckets
    scales with the table; never N^2). All randomness is the sampling
    module's one md5 kernel, mirrored verbatim by the oracle."""
    from .operators.sampling import contrastive_negatives

    return contrastive_negatives(
        load_fixture(spark, sf_dir, "embeddings"), k=3, buckets=32
    )


@register(
    "term_heavy_hitters",
    f"""
SELECT term, n FROM (
    SELECT u.term AS term, COUNT(*) AS n
    FROM documents, unnest({_TOKS_SQL}) AS u(term)
    WHERE length(u.term) >= 1
    GROUP BY u.term
) ORDER BY n DESC, term ASC LIMIT 20
""",
)
def q_term_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters (operators/sketches.heavy_hitters): pass 1
    runs bounded-memory Misra-Gries summaries per partition (map-only
    Arrow, NO shuffle of the occurrence stream), whose union contains
    every term with count > N/capacity by the averaging argument; pass 2
    exact-counts ONLY the candidate set behind a broadcast semi-join.
    The oracle is the plain exact top-20 — equality proves the sketch
    pass lost nothing. capacity=4096 >> fixture vocab, so the guarantee
    holds with margin; the adversarial bound is pinned in pytest."""
    from .operators.sketches import heavy_hitters

    return heavy_hitters(
        load_fixture(spark, sf_dir, "documents"), k=20, capacity=4096
    )


@register(
    "weekly_value_quantile_rollup",
    """
WITH binned AS (
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
           LEAST(255, GREATEST(0, CAST(FLOOR(value / 4.0) AS INT))) AS b,
           COUNT(*) AS c
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), cum AS (
    SELECT week, b, c,
           SUM(c) OVER (PARTITION BY week ORDER BY b) AS cumc,
           SUM(c) OVER (PARTITION BY week) AS n
    FROM binned
)
SELECT week,
       CAST(MAX(n) AS BIGINT) AS n_values,
       MIN(CASE WHEN cumc >= FLOOR((50 * n + 99) / 100.0)
                THEN b * 4.0 END) AS p50_est,
       MIN(CASE WHEN cumc >= FLOOR((95 * n + 99) / 100.0)
                THEN b * 4.0 END) AS p95_est
FROM cum GROUP BY week
""",
)
def q_weekly_value_quantile_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-histogram quantile rollup (plans/analytics.py
    value_histogram_daily_sketches ∘ histogram_rollup_quantiles): the
    order-statistics sibling of the HLL rollup — exact quantiles do not
    pre-aggregate, fixed-bin counts DO, so weekly p50/p95 estimates read
    off merged <=256-row daily histograms instead of rescanning raw
    events (one-bin-width error bound, pinned vs exact percentiles in
    pytest). Bin and rank arithmetic are engine-exact (power-of-two bin
    width; integer-derived ceil ranks), so the oracle mirrors the
    estimates to the bit."""
    from .plans.analytics import (
        histogram_rollup_quantiles,
        value_histogram_daily_sketches,
    )

    daily = value_histogram_daily_sketches(
        load_fixture(spark, sf_dir, "events")
    )
    return histogram_rollup_quantiles(daily)


@register(
    "token_budget_corpus_select",
    """
WITH scored AS (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 3 THEN NULL
                ELSE CAST(doc_id % 7 AS DOUBLE) END AS score,
           10 + doc_id % 23 AS n_tokens
    FROM documents
), ranked AS (
    SELECT doc_id,
           SUM(n_tokens) OVER (
               ORDER BY score DESC NULLS LAST, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM scored
), mid AS (
    SELECT CAST(SUM(n_tokens) * 2 / 5 AS BIGINT) + 7 AS b FROM scored
)
SELECT 'mid' AS variant, doc_id FROM ranked WHERE cum <= (SELECT b FROM mid)
UNION ALL
SELECT 'all' AS variant, doc_id FROM ranked
""",
)
def q_token_budget_corpus_select(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOKEN-BUDGET corpus selection HARD GATE
    (operators/corpus.token_budget_select) — the step every published
    data-mixing recipe ends with once quality scores exist ("take the
    best docs until N tokens"), the last corpus operator whose
    correctness rested only on a pytest differential (r11 verdict #2).
    Scores and token counts are planted from doc_id arithmetic: score
    = doc_id % 7 (large tie groups, so bucket boundaries MUST respect
    ties and the boundary cut MUST tie-break on id), score = NULL on
    every doc_id % 11 = 3 (the r11 ADVICE case: NULLs must sort LAST,
    not first), n_tokens = 10 + doc_id % 23. Three budgets run through
    the ONE operator: 0 (selects nothing), a mid budget at 40% of
    total + 7 (derived by the same arithmetic on both sides — lands
    INSIDE a tie group, forcing the id-tiebreak boundary cut), and
    over-total (selects everything, short-circuit path). Output is the
    full per-doc membership (variant, doc_id), so the driver hash pins
    the EXACT selected set of each variant — any greedy-order drift
    (tie handling, NULL placement, boundary doc inclusion) flips it.
    The oracle is the naive corpus-wide running-sum window — exactly
    the single-partition plan the operator's bucketed design avoids;
    auto-sized n_buckets (max_bucket_rows=500 here) keeps the
    engine-side boundary sort a bounded task at any corpus size."""
    from .operators.corpus import token_budget_select

    docs = load_fixture(spark, sf_dir, "documents").select("doc_id")
    scored = fan_out(docs, "doc_id").select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 3, F.lit(None).cast("double"))
        .otherwise((F.col("doc_id") % 7).cast("double"))
        .alias("score"),
        (F.lit(10) + F.col("doc_id") % 23).alias("n_tokens"),
    )
    total = scored.agg(F.sum("n_tokens")).first()[0]
    budgets = [("mid", int(total) * 2 // 5 + 7), ("all", int(total) + 1)]
    picked = None
    for label, b in [("zero", 0)] + budgets:
        sel = token_budget_select(
            scored, budget=b, max_bucket_rows=500
        ).select(F.lit(label).alias("variant"), "doc_id")
        picked = sel if picked is None else picked.unionAll(sel)
    return picked


def q_image_cdc_crop_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[Retired r15 as a standalone gate — runs VERBATIM as the 'image'
    variant row of media_cdc_crop_near_dups below.]
    ARBITRARY-OFFSET image crop near-dup via per-row CONTENT-DEFINED
    segmentation (multimodal/phash.py image_row_cdc_hashes ∘ the shared
    tile set-overlap machinery at max_hamming=0) — closes the r11
    coverage gap (What's missing #2): the tile tiers recover only crops
    congruent to 0 or tile/2 (mod 32), and this fixture's crop offset
    (17, 23) is deliberately OFF both phases in BOTH axes — exactly the
    case the phase-grid gate pins as honest degradation (the closing
    pytest re-pins it on these members), while row-CDC boundaries are
    chosen by a Gear rolling hash of each ROW's content, so every crop
    row (a contiguous substring of an original row) re-synchronizes at
    its first full-context anchor and its interior segments hash
    identically. Every 16th document seeds a 3-member family: (a) a
    128x128 grayscale PNG of md5(text)-stream pixels, (b) a PNG of its
    96x96 crop at offset (17, 23), (c) a GIF palette re-encode of the
    same crop (identical luma → identical segments BY ARITHMETIC).
    Measured overlap across 40 lattice seeds: worst 0.80 crop↔full,
    1.0 crop↔crop, 0.0 cross-family — the 0.5 gate threshold sits far
    from both sides. The oracle PREDICTS the outcome: 3n images with
    >= 1 segment (a quarantine shrinks the count), exactly 3
    within-family pairs per family, none cross-family. The signature
    stage is map-only Arrow; the pair stage is the ONE shared
    block-bounded equi-join."""
    from .fixtures import tile_crop_family_members
    from .multimodal.phash import (
        image_row_cdc_hashes,
        image_tile_near_dup_pairs,
    )

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 16 == 7
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _family_media_builder(tile_crop_family_members(17, 23)),
        "doc_id long, payload binary",
    )
    # the segment frame feeds the count AND the overlap self-join:
    # eager checkpoint so decode + ~1.6k md5s per image run exactly once
    sigs = image_row_cdc_hashes(media).localCheckpoint()
    n_images = sigs.select("doc_id").distinct().count()
    fam = image_tile_near_dup_pairs(
        sigs, sig_col="sig", max_hamming=0, min_match_frac=0.5
    ).select(
        (F.col("id_a") / 10).cast("long").alias("fam_a"),
        (F.col("id_b") / 10).cast("long").alias("fam_b"),
    )
    per_fam = fam.groupBy("fam_a").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
    )
    row = per_fam.agg(
        F.sum("cnt").alias("n_pairs"),
        F.min("within").alias("pairs_within_family"),
        (
            F.min((F.col("cnt") == 3) & F.col("within"))
            & (F.count(F.lit(1)) == F.lit(n_docs))
        ).alias("families_fully_paired"),
    ).first()
    return spark.createDataFrame(
        [(n_images, row["n_pairs"], row["pairs_within_family"],
          row["families_fully_paired"])],
        "n_images long, n_pairs long, pairs_within_family boolean, "
        "families_fully_paired boolean",
    )


@register(
    "image_mirror_canonical_near_dups",
    """
SELECT 'canonical' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 18 = 4
UNION ALL
SELECT 'plain' AS variant,
       COUNT(*) * 3 AS n_images,
       COUNT(*) AS n_pairs,
       true AS pairs_within_family,
       false AS families_fully_paired
FROM documents
WHERE doc_id % 18 = 4
""",
)
def q_image_mirror_canonical_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MIRROR-canonical image signatures HARD GATE
    (multimodal/phash.py _mirror_canonical_kernel via
    image_dhash(mirror_canonical=True)) — promotes the r11
    pytest-only tier to the driver ledger (r11 verdict #4). Every
    18th document seeds a 3-member family (fixtures.
    mirror_family_members): (a) a 32x32 grayscale PNG of
    md5(text)-stream pixels, (b) a PNG of its LEFT-RIGHT mirror, (c) a
    GIF palette re-encode of the mirror (identical flipped luma). Both
    variants run the SAME families through the SAME max_hamming=0
    exact pair machinery (the full-width-block path of the pigeonhole
    join): variant 'canonical' hashes with mirror_canonical=True —
    min(hash, flipped-hash) collapses all three members BY ARITHMETIC
    (flip of flip is the original buffer), 3 pairs per family, fully
    paired; variant 'plain' hashes with the default kernel and finds
    ONLY the (b)↔(c) identical-luma pair — 1 per family, fully_paired
    FALSE — pinning the exact gap the option closes in the ledger
    itself (the closing-test pattern, driver-run). DIHEDRAL residual,
    decided (r11 verdict #4): vertical flips and 90° rotations stay
    PERMANENTLY out of scope of this tier — rotations change the
    aspect ratio and the 8-transform canonical min would 8x the hash
    bill for a transform far rarer in crawl data than the mirror;
    tests/test_phash.py pins vertical-flip divergence as the honest
    boundary. Near-radius instability of min() is documented in the
    kernel docstring and pinned in tests — canonical signatures are
    an exact-match tier by contract."""
    from .fixtures import mirror_family_members
    from .multimodal.phash import image_dhash

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 18 == 4
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _family_media_builder(mirror_family_members()),
        "doc_id long, payload binary",
    )
    rows = []
    for variant, canonical in (("canonical", True), ("plain", False)):
        # the hash frame feeds the count AND the exact self-join:
        # eager checkpoint so decode + (2x) dhash runs exactly once
        fps = image_dhash(
            media, mirror_canonical=canonical
        ).localCheckpoint()
        rows.append(
            (variant,)
            + _family_pair_outcome(
                fps, sig_col="dhash", n_docs=n_docs, max_hamming=0
            )
        )
    return spark.createDataFrame(
        rows,
        "variant string, n_images long, n_pairs long, "
        "pairs_within_family boolean, families_fully_paired boolean",
    )


@register(
    "audio_cdc_gain_near_dups",
    """
SELECT COUNT(*) * 3 AS n_clips,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 17 = 12
""",
)
def q_audio_cdc_gain_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GAIN-ROBUST arbitrary-offset audio near-dup via SIGN-ANCHORED
    content-defined segmentation (multimodal/audio.py
    audio_cdc_fingerprints(anchor="sign") ∘ the shared set-overlap
    pair machinery) — closes the last cell of the audio robustness
    matrix (r11 verdict #6): the amplitude-anchored CDC tier is exact
    for trims but loses every anchor to a gain change (its own
    docstring's honesty note), while the whole-clip kernel is
    gain-invariant but not trim-robust. Sign anchoring gets both: a
    positive gain preserves every downmixed sample's SIGN, so the
    Gear stream — and hence every boundary — is identical on the
    scaled copy, and the per-segment band-energy-sign fingerprint is
    gain-invariant BY ARITHMETIC (energies scale by c^2, the double-
    difference sign survives), so shared segments match at Hamming 0
    with no tolerance. Every 17th document seeds a 3-member family
    (fixtures.wav_cdc_gain_family_members): (a) a 2 s / 8 kHz lattice
    clip, (b) its GAIN-DOUBLED arbitrary-offset trim (1234 front /
    777 back — off the fixed-window grid), (c) a stereo channel-dup
    of the gain-trim. Measured overlap across 40 lattice seeds: worst
    0.90 trim↔full, 1.0 trim↔stereo, 0.0 cross-family — far from the
    0.5 threshold on both sides; the closing pytest pins the
    amplitude-anchored tier finding NOTHING on the same members. The
    oracle PREDICTS the outcome: 3n clips with >= 1 segment, exactly
    3 within-family pairs per family, none cross-family."""
    from .fixtures import wav_cdc_gain_family_members
    from .multimodal.audio import (
        audio_cdc_fingerprints,
        audio_window_near_dup_pairs,
    )

    media = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 17 == 12
        ),
        "doc_id",
    ).select("doc_id", "text")
    n_docs = media.count()
    media = media.mapInPandas(
        _family_media_builder(wav_cdc_gain_family_members()),
        "doc_id long, payload binary",
    )
    # the segment frame feeds the count AND the overlap self-join:
    # eager checkpoint so decode + per-segment FFTs run exactly once
    sigs = audio_cdc_fingerprints(media, anchor="sign").localCheckpoint()
    n_clips = sigs.select("doc_id").distinct().count()
    fam = audio_window_near_dup_pairs(
        sigs, max_hamming=4, min_match_frac=0.5
    ).select(
        (F.col("id_a") / 10).cast("long").alias("fam_a"),
        (F.col("id_b") / 10).cast("long").alias("fam_b"),
    )
    per_fam = fam.groupBy("fam_a").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
    )
    row = per_fam.agg(
        F.sum("cnt").alias("n_pairs"),
        F.min("within").alias("pairs_within_family"),
        (
            F.min((F.col("cnt") == 3) & F.col("within"))
            & (F.count(F.lit(1)) == F.lit(n_docs))
        ).alias("families_fully_paired"),
    ).first()
    return spark.createDataFrame(
        [(n_clips, row["n_pairs"], row["pairs_within_family"],
          row["families_fully_paired"])],
        "n_clips long, n_pairs long, pairs_within_family boolean, "
        "families_fully_paired boolean",
    )


@register(
    "doc_duplicate_span_removal",
    """
WITH pages AS (
    SELECT doc_id,
           'subscribe to the newsletter for updates every single week '
           || text
           || ' copyright twenty four all rights reserved worldwide forever'
               AS page
    FROM documents WHERE doc_id % 9 = 3
), t AS (
    SELECT doc_id,
           string_split(
               trim(regexp_replace(lower(page), '\\s+', ' ', 'g')), ' '
           ) AS toks
    FROM pages
), s AS (
    SELECT doc_id, len(toks) AS n, u.p AS p,
           array_to_string(toks[u.p:u.p + 7], ' ') AS span,
           least(u.p + 7, len(toks)) AS e
    FROM t, UNNEST(generate_series(1, greatest(len(toks) - 7, 1))) AS u(p)
), d AS (
    SELECT span FROM s GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
), o AS (
    SELECT s.doc_id, s.p, s.e,
           ROW_NUMBER() OVER (
               PARTITION BY s.span ORDER BY s.doc_id, s.p
           ) = 1 AS is_surv
    FROM s JOIN d USING (span)
), cov AS (
    SELECT doc_id, u.t AS t,
           bool_or(is_surv) AS sv, bool_or(NOT is_surv) AS nsv
    FROM o, UNNEST(generate_series(o.p, o.e)) AS u(t)
    GROUP BY doc_id, u.t
), rem AS (
    SELECT doc_id, t FROM cov WHERE nsv AND NOT sv
), tok AS (
    SELECT doc_id, u.t AS t, toks[u.t] AS tok
    FROM t, UNNEST(generate_series(1, len(toks))) AS u(t)
)
SELECT tok.doc_id,
       coalesce(string_agg(
           CASE WHEN rem.t IS NULL THEN tok.tok END, ' ' ORDER BY tok.t
       ), '') AS text,
       COUNT(CASE WHEN rem.t IS NULL THEN 1 END) AS n_tokens_kept,
       COUNT(rem.t) AS n_tokens_removed
FROM tok LEFT JOIN rem USING (doc_id, t)
GROUP BY tok.doc_id
""",
)
def q_doc_duplicate_span_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-span REMOVAL gate (operators/dedup.duplicate_span_removal
    — the r12 verdict's What's-missing #1): `duplicate_span_stats` only
    REPORTS the Lee-et-al. exact-substring signal; the published
    pipeline's point is cutting the duplicated stretch out of every copy
    but one while keeping the document. Every 9th-plus-3 document becomes
    a synthetic page — a shared 9-token subscribe header, the document
    body, a shared 9-token copyright footer — and the operator must (a)
    keep the globally FIRST page fully intact (its header/footer
    occurrences are the survivors), (b) cut exactly the boilerplate
    stretch from every later page, (c) also cut cross-doc BODY spans
    where the fixture's planted exact-duplicate texts collide (real
    collisions, not just the banners), and (d) empty — but not drop —
    any page whose every token is non-surviving boilerplate. The oracle
    replays the whole contract independently (tokenize / slide / rank /
    cover / subtract / reassemble in SQL), so a wrong survivor, an
    off-by-one in span coverage, a dropped empty document, or survivor
    protection failing under overlap all hash-mismatch. Plan: the span
    stream shuffles ONCE on the md5 hash (three windows share the
    exchange), coverage explodes only duplicated occurrences, and
    reassembly is one id-keyed join + array filter — the Lee recipe at
    100 TB without a suffix array."""
    from .operators.dedup import duplicate_span_removal

    pages = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 9 == 3
        ),
        "doc_id",
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            F.lit("subscribe to the newsletter for updates every single week"),
            F.col("text"),
            F.lit(
                "copyright twenty four all rights reserved worldwide forever"
            ),
        ).alias("text"),
    )
    return duplicate_span_removal(pages, span_tokens=8, min_docs=2)


def q_video_cdc_crop_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[Retired r15 as a standalone gate — runs VERBATIM as the 'video'
    variant row of media_cdc_crop_near_dups below.]
    CROP-ROBUST video near-dup via per-frame row-CDC
    (multimodal/phash.py video_frame_row_cdc ∘ video_near_dup_pairs at
    max_hamming=0) — closes the r12 verdict's What's-missing #2: the
    whole-frame tier (video_near_dups gate) collapses trims and
    re-encodes, but a CROPPED video shares no whole-frame hash (every
    frame's dHash moves — the closing pytest re-pins that miss on
    these exact members), while each crop frame's interior row
    segments are byte-identical, so the set-overlap gate recovers the
    pair. Every 19th document seeds a 2-member family
    (fixtures.mjpeg_cdc_crop_family_members): (a) a 3-frame 96x64
    MJPEG/AVI whose every 8x8 block is a q90 roundtrip FIXED POINT
    (md5-noise iterated through encode∘decode — JPEG is per-MCU, so
    the full frame decodes to exactly its own pixels), (b) the same
    footage cropped to 80x32 at offset (8, 24) — OFF both 32-px tile
    phases in both axes, ON the MCU grid, hence pixel-exact by
    construction. Measured across 12 seeds: worst within-family
    overlap 0.78, cross-family 0.0 (threshold 0.5). Off-MCU crops of
    lossy video are DECIDED out of scope (quantization divergence is
    an information boundary of the codec — rationale pinned in
    video_cdc_crop_near_dup_pairs). The oracle PREDICTS the outcome:
    2n videos with >= 1 segment, exactly the n planted pairs, all
    within family."""
    from .fixtures import mjpeg_cdc_crop_family_members
    from .multimodal.phash import (
        video_frame_row_cdc,
        video_near_dup_pairs,
    )

    docs = fan_out(
        load_fixture(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 19 == 8
        ),
        "doc_id",
    )
    n_docs = docs.count()
    media = docs.select("doc_id", "text").mapInPandas(
        _family_media_builder(mjpeg_cdc_crop_family_members()),
        "doc_id long, payload binary",
    )
    # the segment frame feeds the count AND the overlap self-join:
    # eager checkpoint so walk + decode + per-row CDC runs exactly once
    sigs = video_frame_row_cdc(media).localCheckpoint()
    n_videos = sigs.select("video_id").distinct().count()
    fam = video_near_dup_pairs(
        sigs, sig_col="sig", max_hamming=0, min_match_frac=0.5
    ).select(
        (F.col("video_a") / 10).cast("long").alias("fam_a"),
        (F.col("video_b") / 10).cast("long").alias("fam_b"),
    )
    per_fam = fam.groupBy("fam_a").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.col("fam_a") == F.col("fam_b")).alias("within"),
    )
    row = per_fam.agg(
        F.sum("cnt").alias("n_pairs"),
        F.min("within").alias("pairs_within_family"),
        (
            F.min((F.col("cnt") == 1) & F.col("within"))
            & (F.count(F.lit(1)) == F.lit(n_docs))
        ).alias("families_fully_paired"),
    ).first()
    return spark.createDataFrame(
        [(n_videos, row["n_pairs"], row["pairs_within_family"],
          row["families_fully_paired"])],
        "n_videos long, n_pairs long, pairs_within_family boolean, "
        "families_fully_paired boolean",
    )


@register(
    "media_cdc_crop_near_dups",
    """
SELECT 'image' AS variant,
       COUNT(*) * 3 AS n_media,
       COUNT(*) * 3 AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 16 = 7
UNION ALL
SELECT 'video' AS variant,
       COUNT(*) * 2 AS n_media,
       COUNT(*) AS n_pairs,
       true AS pairs_within_family,
       true AS families_fully_paired
FROM documents
WHERE doc_id % 19 = 8
""",
)
def q_media_cdc_crop_near_dups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOTH content-defined-chunking crop near-dup tiers in ONE
    multi-variant gate — round-15 merge of `image_cdc_crop_near_dups`
    (r12 cohort) + `video_cdc_crop_near_dups` (r13 cohort), the
    pre-committed r15 rotation merge (the registry headroom rule:
    growth paired with retirements; the streaming_pct_change_multi /
    multimodal_corpus_prep_multi precedents). RETIREMENT RATIONALE:
    the two gates exercised the SAME per-row Gear-hash CDC kernel
    (multimodal/phash.py `_row_cdc_kernel`, reached via
    image_row_cdc_hashes and video_frame_row_cdc) composed with the
    SAME block-bounded set-overlap pair machinery at max_hamming=0 /
    min_match_frac=0.5, over fixtures built by the same
    family-builder plumbing; they were always green together (r11–r14
    pytests, r12/r13 driver rows). Each retained audit is UNCHANGED —
    the retired builders run VERBATIM as this gate's variant rows
    (q_image_cdc_crop_near_dups / q_video_cdc_crop_near_dups above,
    fixtures and per-variant oracles verbatim in the UNION), so a
    drift in either pipeline still flips the hash: variant 'image'
    pins arbitrary-offset PNG/GIF crop recovery at the (17, 23)
    off-phase offset, variant 'video' pins MCU-aligned MJPEG crop
    recovery at (8, 24) with its 2-member families. Audit columns
    ride a common (variant, n_media, n_pairs, pairs_within_family,
    families_fully_paired) projection. Their pytest coverage
    (test_phash.py, test_video.py) is untouched."""
    img = q_image_cdc_crop_near_dups(spark, sf_dir).select(
        F.lit("image").alias("variant"),
        F.col("n_images").alias("n_media"),
        "n_pairs",
        "pairs_within_family",
        "families_fully_paired",
    )
    vid = q_video_cdc_crop_near_dups(spark, sf_dir).select(
        F.lit("video").alias("variant"),
        F.col("n_videos").alias("n_media"),
        "n_pairs",
        "pairs_within_family",
        "families_fully_paired",
    )
    return img.unionByName(vid)


@register(
    "streaming_pct_change_multi",
    """
WITH b AS (
    SELECT epoch_us(min(ts)) AS lo_us, epoch_us(max(ts)) AS hi_us FROM events
), p AS (
    SELECT hi_us,
           ((hi_us - lo_us) // 3 + 1) // 1000000 + 3600 AS delay_s
    FROM b
)
SELECT 'vol' AS variant,
       (SELECT COUNT(*) FROM events) AS n_rows,
       true AS pct_matches_batch, true AS aud_a, true AS aud_b
UNION ALL
SELECT 'reordered' AS variant,
       COUNT(*) AS n_rows,
       true AS pct_matches_batch, true AS aud_a,
       CAST(NULL AS BOOLEAN) AS aud_b
FROM events, p
WHERE epoch_us(ts) <= (p.hi_us // 1000) * 1000 - p.delay_s * 1000000
""",
)
def q_streaming_pct_change_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOTH stateful-streaming pct-change flagships in ONE multi-variant
    gate — round-13 merge of `streaming_pct_change_vol` +
    `streaming_pct_change_reordered` (the registry headroom rule: growth
    paired with retirements; the dim_snapshots / tile-multi-crop
    precedents). RETIREMENT RATIONALE: the two gates exercised the same
    stateful operator family (streaming/stateful.py — one
    applyInPandasWithState pct-change kernel, in in-order and
    reorder-buffer form) over the same 3-micro-batch file replay
    harness, always green together since r07; each retained audit is
    UNCHANGED (the retired builders run verbatim as this gate's variant
    rows — harness_events.q_streaming_pct_change_vol /
    q_streaming_pct_change_reordered), so a drift in either pipeline
    still flips the hash: variant 'vol' pins cross-batch state exactness
    (n_rows vs COUNT(*), streamed pct == batch LAG, windowed vol subset
    + values), variant 'reordered' pins the late-arrival buffer (the
    emitted set is exactly the watermark-finalized prefix despite every
    7th event arriving one batch late). Audit columns ride a common
    (variant, n_rows, pct_matches_batch, aud_a, aud_b) projection —
    aud_b is NULL for the 3-audit reordered variant. Their pytest
    coverage (test_streaming.py) is untouched."""
    from .harness_events import (
        q_streaming_pct_change_reordered,
        q_streaming_pct_change_vol,
    )

    vol = q_streaming_pct_change_vol(spark, sf_dir).select(
        F.lit("vol").alias("variant"),
        "n_rows",
        "pct_matches_batch",
        F.col("vol_windows_subset").alias("aud_a"),
        F.col("vol_values_match").alias("aud_b"),
    )
    reo = q_streaming_pct_change_reordered(spark, sf_dir).select(
        F.lit("reordered").alias("variant"),
        "n_rows",
        "pct_matches_batch",
        F.col("emitted_set_exact").alias("aud_a"),
        F.lit(None).cast("boolean").alias("aud_b"),
    )
    return vol.unionByName(reo)


@register(
    "multimodal_corpus_prep_multi",
    """
WITH sel8 AS (
    SELECT doc_id, lang FROM documents WHERE doc_id % 8 = 3
), keep8 AS (
    SELECT MIN(doc_id) AS doc_id FROM sel8 GROUP BY doc_id // 32
), sel4 AS (
    SELECT doc_id, lang FROM documents WHERE doc_id % 4 = 1
), img AS (
    SELECT MIN(doc_id) AS doc_id FROM sel4 GROUP BY doc_id // 32
), aud AS (
    SELECT MIN(doc_id) AS doc_id FROM sel4 GROUP BY doc_id // 16
), vid AS (
    SELECT MIN(doc_id) AS doc_id FROM sel4 GROUP BY doc_id // 8
)
SELECT 'image_only' AS variant, s.lang, COUNT(*) AS n_docs,
       CAST(NULL AS BIGINT) AS n_img_survivors,
       CAST(NULL AS BIGINT) AS n_audio_survivors,
       CAST(NULL AS BIGINT) AS n_video_survivors
FROM sel8 s JOIN keep8 k USING (doc_id)
GROUP BY s.lang
UNION ALL
SELECT 'full' AS variant, s.lang, COUNT(*) AS n_docs,
       (SELECT COUNT(*) FROM img) AS n_img_survivors,
       (SELECT COUNT(*) FROM aud) AS n_audio_survivors,
       (SELECT COUNT(*) FROM vid) AS n_video_survivors
FROM sel4 s
JOIN img USING (doc_id)
JOIN aud USING (doc_id)
JOIN vid USING (doc_id)
GROUP BY s.lang
""",
)
def q_multimodal_corpus_prep_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOTH cross-modal corpus-prep funnels in ONE multi-variant gate —
    round-13 merge of `multimodal_corpus_prep` +
    `multimodal_corpus_prep_full` (the registry headroom rule: growth
    paired with retirements). RETIREMENT RATIONALE: the 3-modality gate
    SUBSUMES the 1-modality construction — same image encodings
    (fixtures.image_encoding_variants), same min-id-per-block
    survivorship, same broadcast-semi-join funnel shape — and the two
    were always green together since r10; keeping the 1-modality rows
    as this gate's 'image_only' variant preserves its independent
    fixture (doc_id % 8 = 3, 32-id pixel blocks with FOUR byte
    encodings per block — the 'full' variant's image tier reuses the
    same encoder but a different selection), so a drift in either
    funnel still flips the hash. Variant rows ride a common (variant,
    lang, n_docs, n_img_survivors, n_audio_survivors,
    n_video_survivors) projection — the survivor counts are NULL for
    the image_only variant. Both retained builders run verbatim
    (harness_media.q_multimodal_corpus_prep / _full); both oracles
    re-derive survivorship purely from id arithmetic, unchanged."""
    from .harness_media import (
        q_multimodal_corpus_prep,
        q_multimodal_corpus_prep_full,
    )

    nulls = F.lit(None).cast("long")
    img_only = q_multimodal_corpus_prep(spark, sf_dir).select(
        F.lit("image_only").alias("variant"),
        "lang",
        "n_docs",
        nulls.alias("n_img_survivors"),
        nulls.alias("n_audio_survivors"),
        nulls.alias("n_video_survivors"),
    )
    full = q_multimodal_corpus_prep_full(spark, sf_dir).select(
        F.lit("full").alias("variant"),
        "lang",
        "n_docs",
        "n_img_survivors",
        "n_audio_survivors",
        "n_video_survivors",
    )
    return img_only.unionByName(full)


@register(
    "unicode_fold_dedup",
    """
WITH g AS (
    SELECT doc_id,
           ((doc_id - 3) // 8) // 5 AS fam
    FROM documents WHERE doc_id % 8 = 3
)
SELECT fam,
       'café finance résumé no' || fam || ' ok' AS text,
       COUNT(*) AS n_in,
       MIN(doc_id) AS survivor_id
FROM g
GROUP BY fam
""",
)
def q_unicode_fold_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization HARD GATE (r14, r13 verdict What's-missing
    #1: operators/corpus.unicode_normalize_docs in front of the exact
    fingerprint tier). Every selected document QUINT (consecutive docs
    with doc_id % 8 = 3, grouped 5-by-5) carries five byte-DIFFERENT
    encodings of ONE text built JVM-side from doc_id arithmetic:
    (a) the clean NFC form, (b) the NFD form (combining acute accents
    U+0301 after bare letters), (c) a FULL-WIDTH variant (the word
    'finance' on the U+FF01 plane plus an ideographic space U+3000),
    (d) a ZERO-WIDTH injection (BOM prefix, ZWSP inside a word, a soft
    hyphen U+00AD inside another), (e) a LIGATURE variant (U+FB01 fi).
    None of the five shares raw-byte md5 with any other, so WITHOUT
    the normalization stage the exact tier sees five distinct
    fingerprints; WITH it every variant folds to the identical NFC
    byte string and the quint collapses to ONE survivor (the smallest
    doc_id) with n_in = 5. The gate runs the REAL operator chain —
    unicode_normalize_docs (ASCII-detector split + Arrow kernel; the
    kernel's pickle-by-value self-containment is exactly what the
    driver's bare workers exercise) feeding exact_dedup_stats'
    fingerprint group — and emits the FOLDED TEXT itself, so a drift
    in any fold rule (composition, compat plane, zw strip) breaks the
    text hash, and an over/under-merge breaks n_in/survivor_id. The
    oracle derives everything from the CONSTRUCTION (fam arithmetic +
    NFC string concat — the r10 independent-formulation rule; DuckDB
    never normalizes anything). Incomplete trailing families at small
    SF still match: the canonical text depends only on fam, so n_in =
    COUNT(*) and survivor = MIN(doc_id) hold for any member subset."""
    from .operators.corpus import unicode_normalize_docs
    from .operators.dedup import exact_dedup_stats

    sel = load_fixture(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 8 == 3
    )
    k = ((F.col("doc_id") - 3) / 8).cast("long")
    fam = (k / 5).cast("long")
    variant = k % 5
    f = fam.cast("string")
    nfc = F.concat(
        F.lit("caf\u00e9 finance r\u00e9sum\u00e9 no"), f, F.lit(" ok")
    )
    nfd = F.concat(
        F.lit("cafe\u0301 finance re\u0301sume\u0301 no"), f, F.lit(" ok")
    )
    fullwidth = F.concat(
        F.lit(
            "caf\u00e9 \uff46\uff49\uff4e\uff41\uff4e\uff43\uff45"
            " r\u00e9sum\u00e9\u3000no"
        ),
        f,
        F.lit(" ok"),
    )
    zero_width = F.concat(
        F.lit(
            "\ufeffcaf\u00e9 fin\u200bance r\u00e9\u00adsum\u00e9 no"
        ),
        f,
        F.lit(" ok"),
    )
    ligature = F.concat(
        F.lit("caf\u00e9 \ufb01nance r\u00e9sum\u00e9 no"), f, F.lit(" ok")
    )
    pages = sel.select(
        "doc_id",
        F.when(variant == 0, nfc)
        .when(variant == 1, nfd)
        .when(variant == 2, fullwidth)
        .when(variant == 3, zero_width)
        .otherwise(ligature)
        .alias("text"),
    )
    folded = unicode_normalize_docs(fan_out(pages, "doc_id"))
    stats = exact_dedup_stats(folded)
    return stats.join(
        folded.select(F.col("doc_id").alias("keep_id"), "text"), "keep_id"
    ).select(
        (((F.col("keep_id") - 3) / 8) / 5).cast("long").alias("fam"),
        "text",
        F.col("n_copies").alias("n_in"),
        F.col("keep_id").alias("survivor_id"),
    )


# --- unigram-LM tokenizer gate (r14) ---------------------------------------

#: Gate-side training params — small enough that the unrolled oracle
#: stays tractable (the DP unrolls max_word_len levels per round), big
#: enough that round 2 re-segments under a genuinely pruned/re-weighted
#: vocab (EM movement, not a fixed point of the seed).
_UNI_L = 3  # max piece length
_UNI_W = 10  # max word length (words longer fall back at apply)
_UNI_SEED = 64  # seed multi-char pieces
_UNI_KEEP = 32  # multi-char pieces kept per round
_UNI_ROUNDS = 2


def _unigram_subgrid_sql(L: int) -> str:
    """(term, cnt, s, l, piece): every substring occurrence of length
    1..L of every training word type (1-based start s)."""
    return f"""
    SELECT term, cnt, s, l, substr(term, s, l) AS piece
    FROM (
        SELECT term, cnt, l,
               unnest(generate_series(1, length(term) - l + 1)) AS s
        FROM (
            SELECT term, cnt, unnest(generate_series(1, {L})) AS l
            FROM types
        ) WHERE l <= length(term)
    )"""


def _unigram_dp_ctes(tag: str, vocab: str, L: int, W: int) -> str:
    """The Viterbi DP, unrolled over positions 1..W against ``vocab`` —
    b{tag}_j holds each word's best (np, sc, winning-piece-length l)
    cover of its first j characters under (np ASC, sc DESC, l DESC),
    the integer-exact objective pinned in operators/unigram.py."""
    parts = [
        f""",
occ{tag} AS MATERIALIZED (
    SELECT g.term, g.cnt, g.s, g.l, v.w
    FROM subgrid g JOIN {vocab} v ON g.piece = v.piece
),
b{tag}_0 AS MATERIALIZED (
    SELECT term, cnt, 0 AS np, CAST(0 AS BIGINT) AS sc, 0 AS l FROM types
)"""
    ]
    for j in range(1, W + 1):
        cands = "\n            UNION ALL\n".join(
            f"""            SELECT p.term, p.cnt, p.np + 1 AS np,
                   p.sc + o.w AS sc, {l} AS l
            FROM b{tag}_{j - l} p
            JOIN occ{tag} o ON o.term = p.term
                AND o.s = {j - l + 1} AND o.l = {l}"""
            for l in range(1, min(L, j) + 1)
        )
        parts.append(
            f""",
b{tag}_{j} AS MATERIALIZED (
    SELECT term, cnt, np, sc, l FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY term ORDER BY np ASC, sc DESC, l DESC) AS rn
        FROM (
{cands}
        )
    ) WHERE rn = 1
)"""
        )
    return "".join(parts)


def _unigram_round_ctes(r: int, L: int, W: int, keep: int) -> str:
    """One hard-EM round: DP under vocab{r-1}, backtrace the unique
    best path (pos walks down by the stored winning length), count
    used pieces weighted by type count, prune to vocab{r}."""
    tag = str(r)
    ball_union = "\n    UNION ALL\n".join(
        f"    SELECT term, cnt, l, {j} AS pos FROM b{tag}_{j}"
        for j in range(1, W + 1)
    )
    bt_parts = [
        f""",
ball{tag} AS MATERIALIZED (
{ball_union}
),
bt{tag}_0 AS MATERIALIZED (
    SELECT term, cnt, l, pos FROM ball{tag} WHERE pos = length(term)
)"""
    ]
    for k in range(1, W):
        bt_parts.append(
            f""",
bt{tag}_{k} AS MATERIALIZED (
    SELECT b.term, b.cnt, b.l, b.pos
    FROM bt{tag}_{k - 1} t JOIN ball{tag} b
      ON b.term = t.term AND b.pos = t.pos - t.l
    WHERE t.pos - t.l > 0
)"""
        )
    bt_union = "\n    UNION ALL\n".join(
        f"    SELECT term, cnt, l, pos FROM bt{tag}_{k}" for k in range(W)
    )
    return (
        _unigram_dp_ctes(tag, f"vocab{r - 1}", L, W)
        + "".join(bt_parts)
        + f""",
used{tag} AS MATERIALIZED (
    SELECT substr(term, pos - l + 1, l) AS piece,
           CAST(SUM(cnt) AS BIGINT) AS w
    FROM (
{bt_union}
    )
    GROUP BY 1
),
vocab{r} AS MATERIALIZED (
    SELECT c.piece, COALESCE(u.w, 0) AS w
    FROM chars c LEFT JOIN used{tag} u ON u.piece = c.piece
    UNION ALL
    SELECT piece, w FROM (
        SELECT piece, w FROM used{tag} WHERE length(piece) > 1
        ORDER BY w DESC, piece ASC LIMIT {keep}
    )
)"""
    )


def _unigram_oracle(rounds: int, L: int, W: int, seed: int, keep: int) -> str:
    """Full unrolled replay of the unigram hard-EM trainer + apply —
    the bpe_pipeline oracle pattern scaled up: seed CTEs, ``rounds``
    EM rounds (DP + backtrace + recount + prune, every argmax an
    integer ROW_NUMBER), one final DP for the apply's piece counts,
    then the doc-keyed aggregate with the character fallback."""
    seg_union = "\n    UNION ALL\n".join(
        f"    SELECT term, np FROM bA_{j} WHERE length(term) = {j}"
        for j in range(1, W + 1)
    )
    return (
        f"""
WITH types AS MATERIALIZED (
    SELECT term, COUNT(*) AS cnt
    FROM (SELECT unnest({_TOKS_SQL}) AS term FROM documents)
    WHERE length(term) BETWEEN 1 AND {W}
    GROUP BY term
),
subgrid AS MATERIALIZED (
{_unigram_subgrid_sql(L)}
),
sub AS MATERIALIZED (
    SELECT piece, CAST(SUM(cnt) AS BIGINT) AS w FROM subgrid GROUP BY 1
),
chars AS MATERIALIZED (
    SELECT piece FROM sub WHERE length(piece) = 1
),
vocab0 AS MATERIALIZED (
    SELECT piece, w FROM sub WHERE length(piece) = 1
    UNION ALL
    SELECT piece, w FROM (
        SELECT piece, w FROM sub WHERE length(piece) > 1
        ORDER BY w DESC, piece ASC LIMIT {seed}
    )
)"""
        + "".join(
            _unigram_round_ctes(r, L, W, keep) for r in range(1, rounds + 1)
        )
        + _unigram_dp_ctes("A", f"vocab{rounds}", L, W)
        + f""",
seg AS MATERIALIZED (
{seg_union}
),
occ_docs AS MATERIALIZED (
    SELECT doc_id, u.term
    FROM documents, unnest({_TOKS_SQL}) AS u(term)
    WHERE length(u.term) >= 1
),
docstats AS (
    SELECT occ_docs.doc_id, COUNT(*) AS n_words,
           CAST(SUM(COALESCE(s.np, length(occ_docs.term))) AS BIGINT)
               AS n_unigram_tokens
    FROM occ_docs LEFT JOIN seg s USING (term)
    GROUP BY 1
)
SELECT 'piece' AS kind, piece AS k1, CAST(w AS VARCHAR) AS k2,
       CAST(length(piece) AS VARCHAR) AS k3, CAST(NULL AS VARCHAR) AS k4
FROM vocab{rounds}
UNION ALL
SELECT 'doc', CAST(doc_id AS VARCHAR), CAST(n_words AS VARCHAR),
       CAST(n_unigram_tokens AS VARCHAR), CAST(NULL AS VARCHAR)
FROM docstats
"""
    )


@register(
    "unigram_lm_tokenizer",
    _unigram_oracle(_UNI_ROUNDS, _UNI_L, _UNI_W, _UNI_SEED, _UNI_KEEP),
)
def q_unigram_lm_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer trainer + apply HARD GATE (r14, r13 verdict
    What's-missing #2: the SentencePiece-default tokenizer family
    beyond bpe_pipeline's BPE). Trains operators/unigram.unigram_train
    on the documents table — seed substring vocabulary, then
    _UNI_ROUNDS hard-EM rounds of Viterbi re-segmentation under the
    integer-exact objective (fewest pieces, then max weight-sum, then
    longest-final-piece; every interior argmax is integer, the
    determinism contract pinned in the operator docstring) with
    recount + prune-to-_UNI_KEEP between rounds — and applies the
    final vocabulary to the corpus via unigram_token_stats' broadcast
    join. Output = the final (piece, weight) vocabulary rows PLUS the
    per-document (n_words, n_unigram_tokens) apply rows, projected to
    the bpe_pipeline VARCHAR multi-variant schema; a drift in ANY
    round's segmentation, count, or prune order changes the final
    vocab (and usually every doc count), and a drift in the apply join
    or its >max_word_len character fallback changes the doc rows. The
    oracle replays the ENTIRE trainer as one unrolled CTE chain —
    _UNI_ROUNDS x (position-unrolled Viterbi DP + backtrace walk +
    recount + prune) + one apply DP — the bpe_pipeline 30-round
    precedent; it shares only SQL with the Spark side (the kernel is
    Python, the oracle is pure DuckDB — independent formulations of
    the pinned contract)."""
    from .operators.unigram import unigram_token_stats, unigram_train

    docs = load_fixture(spark, sf_dir, "documents")
    vocab, segments = unigram_train(
        docs,
        rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_L,
        max_word_len=_UNI_W,
        seed_multi=_UNI_SEED,
        keep_multi=_UNI_KEEP,
    )
    p = vocab.select(
        F.lit("piece").alias("kind"),
        F.col("piece").alias("k1"),
        F.col("weight").cast("string").alias("k2"),
        F.col("piece_len").cast("string").alias("k3"),
        F.lit(None).cast("string").alias("k4"),
    )
    d = unigram_token_stats(docs, segments).select(
        F.lit("doc").alias("kind"),
        F.col("doc_id").cast("string").alias("k1"),
        F.col("n_words").cast("string").alias("k2"),
        F.col("n_unigram_tokens").cast("string").alias("k3"),
        F.lit(None).cast("string").alias("k4"),
    )
    return p.unionAll(d)


@register(
    "kn_bigram_logprob",
    f"""
WITH occ2 AS MATERIALIZED (
    SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2,
           toks[i] || ' ' || toks[i + 1] AS big
    FROM (SELECT doc_id, toks,
                 unnest(generate_series(1, len(toks) - 1)) AS i
          FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
          WHERE len(toks) >= 2)
), bc AS MATERIALIZED (
    SELECT big, COUNT(*) AS cb FROM occ2 GROUP BY 1
), ctx AS MATERIALIZED (
    SELECT w1, COUNT(*) AS cctx, COUNT(DISTINCT w2) AS n1p_fwd
    FROM occ2 GROUP BY 1
), cont AS MATERIALIZED (
    SELECT w2, COUNT(*) AS n1p_bwd
    FROM (SELECT DISTINCT w1, w2 FROM occ2) GROUP BY 1
), tot AS (
    SELECT COUNT(*) AS n1p_all FROM (SELECT DISTINCT big FROM occ2)
)
SELECT occ2.doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(LN((GREATEST(bc.cb - 0.75, 0.0)
            + 0.75 * ctx.n1p_fwd * (cont.n1p_bwd
                / CAST(tot.n1p_all AS DOUBLE))) / ctx.cctx)), 6)
           AS avg_logprob
FROM occ2 JOIN bc USING (big) JOIN ctx USING (w1)
     JOIN cont USING (w2), tot
GROUP BY occ2.doc_id
""",
)
def q_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated KNESER-NEY bigram LM quality score HARD GATE
    (operators/corpus.kn_bigram_logprob) — the r14-built, r15
    pre-committed gate (rotation docstring, harness.py): the smoothing
    the published perplexity filters actually use (CCNet filters on
    KenLM; KenLM's default estimator is interpolated modified KN),
    one rung above doc_bigram_logprob's add-one on the quality
    ladder. The oracle is a DIRECT SQL replay of the four count
    aggregates (bigram token counts, context totals + forward
    type-diversity N1+(w1 .), continuation diversity N1+(. w2), and
    the scalar N1+(. .)) joined back through the Chen & Goodman
    eq. 4.25 interpolated formula at D = 0.75 — float-safe despite
    the divisions because the scorer has NO interior argmax (the
    r14 integer rule is about interior BRANCHING); ROUND 6 only at
    the presentation-edge mean, the F6 contract every gate follows.
    Same one-positional-expansion physical shape as the add-one
    sibling: four vocab-bounded aggregates, term-keyed joins with
    Zipf-small build sides, one broadcast 1-row crossJoin for the
    N1+(. .) scalar."""
    from .operators.corpus import kn_bigram_logprob

    return kn_bigram_logprob(
        load_fixture(spark, sf_dir, "documents"), discount=0.75
    )


def _decontam_oracle_sql(num_hashes: int, bands: int, threshold: float) -> str:
    """DuckDB twin of the FULL portable-mode cross-frame decontamination
    pipeline: planted corpus/benchmark construction -> per-side shingle
    hash -> per-side affine minhash signature -> per-side band keys ->
    CROSS-side band bucket join (never corpus-corpus) -> exact-Jaccard
    verify on the UNROUNDED value (the r14 ADVICE contract the operator
    pins). Generated from the same _minhash_params constants the Spark
    operator uses, so signatures match bit-for-bit — the
    _minhash_oracle_sql template (harness_corpus) with two sig/band CTE
    chains and the threshold cut in WHERE (QUALIFY needs a window fn)."""
    from .operators.dedup import _MERSENNE_P, _minhash_params

    p = _MERSENNE_P
    params = _minhash_params(num_hashes)
    rpb = num_hashes // bands

    def mins() -> str:
        return ",\n        ".join(
            f"MIN(({a} * h + {b}) % {p}) AS m{i}"
            for i, (a, b) in enumerate(params)
        )

    def band_rows(sig_cte: str, id_col: str) -> str:
        return "\n    UNION ALL\n    ".join(
            f"SELECT {id_col}, {b} AS band_idx, "
            + " || ',' || ".join(
                f"CAST(m{b * rpb + j} AS VARCHAR)" for j in range(rpb)
            )
            + f" AS band_key FROM {sig_cte}"
            for b in range(bands)
        )

    return f"""
WITH corpus AS MATERIALIZED (
    SELECT doc_id,
           CASE doc_id % 25
             WHEN 8 THEN 'eval item ' || (doc_id - 1) || ' alpha ' ||
                  (doc_id - 1) || ' beta ' || (doc_id - 1) || ' gamma ' ||
                  (doc_id - 1) || ' delta ' || (doc_id - 1) || ' epsilon ' ||
                  (doc_id - 1)
             WHEN 9 THEN 'eval item ' || (doc_id - 2) || ' alpha ' ||
                  (doc_id - 2) || ' beta ' || (doc_id - 2) || ' gamma ' ||
                  (doc_id - 2) || ' delta ' || (doc_id - 2) || ' omega ' ||
                  (doc_id - 2)
             WHEN 12 THEN 'eval item ' || (doc_id - 5) || ' alpha ' ||
                  (doc_id - 5) || ' one two three four five six'
             ELSE text END AS text
    FROM documents WHERE doc_id % 25 != 7
), bench AS MATERIALIZED (
    SELECT doc_id AS bench_id,
           'eval item ' || doc_id || ' alpha ' || doc_id || ' beta ' ||
           doc_id || ' gamma ' || doc_id || ' delta ' || doc_id ||
           ' epsilon ' || doc_id AS text
    FROM documents WHERE doc_id % 25 = 7
), gd AS MATERIALIZED (
    SELECT doc_id, {{grams}} AS grams FROM corpus
), gb AS MATERIALIZED (
    SELECT bench_id, {{grams}} AS grams FROM bench
), shd AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substr(md5(u.g), 1, 15)) AS BIGINT) % {p} AS h
    FROM gd, unnest(grams) AS u(g)
), shb AS (
    SELECT DISTINCT bench_id,
           CAST(('0x' || substr(md5(u.g), 1, 15)) AS BIGINT) % {p} AS h
    FROM gb, unnest(grams) AS u(g)
), sigd AS MATERIALIZED (
    SELECT doc_id,
        {mins()}
    FROM shd GROUP BY doc_id
), sigb AS MATERIALIZED (
    SELECT bench_id,
        {mins()}
    FROM shb GROUP BY bench_id
), bandsd AS (
    {band_rows("sigd", "doc_id")}
), bandsb AS (
    {band_rows("sigb", "bench_id")}
), cand AS (
    SELECT DISTINCT d.doc_id, b.bench_id
    FROM bandsd d
    JOIN bandsb b ON d.band_idx = b.band_idx AND d.band_key = b.band_key
)
SELECT c.doc_id, c.bench_id,
       ROUND(len(list_intersect(gd.grams, gb.grams))::DOUBLE
             / (len(gd.grams) + len(gb.grams)
                - len(list_intersect(gd.grams, gb.grams))), 6) AS jaccard_sim
FROM cand c
JOIN gd ON gd.doc_id = c.doc_id
JOIN gb ON gb.bench_id = c.bench_id
WHERE len(list_intersect(gd.grams, gb.grams))::DOUBLE
      / (len(gd.grams) + len(gb.grams)
         - len(list_intersect(gd.grams, gb.grams))) >= {threshold}
"""


@register(
    "near_dup_decontamination",
    _decontam_oracle_sql(32, 8, 0.5).replace("{grams}", _GRAMS_SQL),
)
def q_near_dup_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-frame NEAR-dup decontamination HARD GATE
    (operators/dedup.near_dup_decontamination, portable hash mode) —
    the r14-built, r15 pre-committed gate: the GPT-3/PaLM pipeline
    stage above exact n-gram collision (doc_contamination_dual's
    tier) — training documents near-duplicating EVAL documents are
    flagged with their benchmark match and the exact word-3-gram
    Jaccard. Planted families from doc_id arithmetic (the natural
    %50 split was scratch-measured to yield ONE pair at sf0.01 — a
    1-row accident, not a recall pin): every 25th document seeds a
    BENCHMARK doc (doc_id % 25 = 7) whose text interleaves its own
    id between every tail word ('eval item k alpha k beta k ...'),
    so every trigram contains k and DISTINCT benchmark docs share
    ZERO shingles (no cross-family smearing); the corpus side
    (everything else, real text as background) plants (a) an EXACT
    copy at doc_id % 25 = 8 of bench doc_id-1 — identical gram set,
    so every band collides BY CONSTRUCTION and the pair is flagged
    at jaccard 1.0 deterministically; (b) a light PARAPHRASE at
    % 25 = 9 of bench doc_id-2 (one tail word swapped: 2 of 11
    trigrams move, J = 9/13 ~ 0.692 >= 0.5) — the case exact n-gram
    collision decontamination misses; (c) a NEAR-MISS at % 25 = 12
    of bench doc_id-5 (tail replaced wholesale, J = 3/17 ~ 0.176 <
    0.5) that must NOT be flagged even when a band happens to
    collide — pinning the exact-verify cut, on the UNROUNDED value
    per the r14 ADVICE fix. The oracle replays the ENTIRE pipeline
    (construction, per-side md5 shingle hashes, affine signatures,
    band keys, the CROSS-side-only bucket join, unrounded verify) so
    both engines agree on every candidate, flagged or killed; the
    within-corpus duplicates that real background text contains must
    never appear (no corpus-corpus pairs — the cross-frame
    contract)."""
    from .operators.dedup import near_dup_decontamination

    docs = load_fixture(spark, sf_dir, "documents")

    def bench_text(k):
        ks = k.cast("string")
        return F.concat(
            F.lit("eval item "), ks, F.lit(" alpha "), ks,
            F.lit(" beta "), ks, F.lit(" gamma "), ks,
            F.lit(" delta "), ks, F.lit(" epsilon "), ks,
        )

    def para_text(k):
        ks = k.cast("string")
        return F.concat(
            F.lit("eval item "), ks, F.lit(" alpha "), ks,
            F.lit(" beta "), ks, F.lit(" gamma "), ks,
            F.lit(" delta "), ks, F.lit(" omega "), ks,
        )

    def miss_text(k):
        ks = k.cast("string")
        return F.concat(
            F.lit("eval item "), ks, F.lit(" alpha "), ks,
            F.lit(" one two three four five six"),
        )

    v = F.col("doc_id") % 25
    corpus = docs.filter(v != 7).select(
        "doc_id",
        F.when(v == 8, bench_text(F.col("doc_id") - 1))
        .when(v == 9, para_text(F.col("doc_id") - 2))
        .when(v == 12, miss_text(F.col("doc_id") - 5))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bench = docs.filter(v == 7).select(
        F.col("doc_id").alias("bench_id"),
        bench_text(F.col("doc_id")).alias("text"),
    )
    return near_dup_decontamination(
        fan_out(corpus, "doc_id"),
        bench,
        num_hashes=32,
        bands=8,
        threshold=0.5,
        hash_mode="portable",
    )


@register(
    "ccnet_perplexity_buckets",
    f"""
WITH occ2 AS MATERIALIZED (
    SELECT doc_id, lang, toks[i] AS w1, toks[i + 1] AS w2,
           toks[i] || ' ' || toks[i + 1] AS big
    FROM (SELECT doc_id, lang, toks,
                 unnest(generate_series(1, len(toks) - 1)) AS i
          FROM (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
          WHERE len(toks) >= 2)
), bc AS MATERIALIZED (
    SELECT lang, big, COUNT(*) AS cb FROM occ2 GROUP BY 1, 2
), ctx AS MATERIALIZED (
    SELECT lang, w1, COUNT(*) AS cctx, COUNT(DISTINCT w2) AS n1p_fwd
    FROM occ2 GROUP BY 1, 2
), cont AS MATERIALIZED (
    SELECT lang, w2, COUNT(*) AS n1p_bwd
    FROM (SELECT DISTINCT lang, w1, w2 FROM occ2) GROUP BY 1, 2
), tot AS MATERIALIZED (
    SELECT lang, COUNT(*) AS n1p_all
    FROM (SELECT DISTINCT lang, big FROM occ2) GROUP BY 1
), per_doc AS MATERIALIZED (
    SELECT occ2.doc_id, occ2.lang, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN((GREATEST(bc.cb - 0.75, 0.0)
                + 0.75 * ctx.n1p_fwd * (cont.n1p_bwd
                    / CAST(tot.n1p_all AS DOUBLE))) / ctx.cctx)), 6)
               AS avg_logprob
    FROM occ2 JOIN bc USING (lang, big) JOIN ctx USING (lang, w1)
         JOIN cont USING (lang, w2) JOIN tot USING (lang)
    GROUP BY 1, 2
), ranked AS (
    SELECT doc_id, lang, n_bigrams, avg_logprob,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY avg_logprob DESC, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
    FROM per_doc
)
SELECT doc_id, lang, n_bigrams, avg_logprob,
       CASE ((rn - 1) * 3) // n
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
       END AS ppl_bucket
FROM ranked
""",
)
def q_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing HARD GATE
    (operators/corpus.ccnet_perplexity_buckets) — the published stage
    the KN scorer exists to feed (Wenzek et al. 2020): every document
    scored under its OWN language's interpolated-KN bigram LM (every
    count aggregate keyed by lang — a global LM would rank every
    low-resource language as perplexing English; the per-language
    isolation property is pinned in pytest), then each language's
    docs split into equal-count head/middle/tail by the ROUND-6
    presentation-edge score with doc_id as the total-order tiebreak
    and bucket = ((rank-1)*3) div lang_count — integer-exact after
    the one rounding both engines share (the r14 rule: interior
    orderings never compare raw floats), so the floor-split boundary
    doc is decided by the pinned total order, never a float race.
    The oracle replays the per-lang count CTEs + the KN formula +
    the same ROW_NUMBER arithmetic. Output is the full per-doc
    (lang, n_bigrams, avg_logprob, ppl_bucket) frame: any drift in a
    language's LM, the rounding edge, the rank order, or the split
    arithmetic flips the hash."""
    from .operators.corpus import ccnet_perplexity_buckets

    return ccnet_perplexity_buckets(
        load_fixture(spark, sf_dir, "documents"), discount=0.75
    )
