"""Corpus gate tier I: text dedup (exact/minhash/simhash), language
ID, embedding ANN, window analytics, and the curation funnel.

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
    _CHANGES_CTE,
    _SERIES_TIEBREAK,
    _lineitem_changes,
    _lineitem_series,
    fan_out,
    load_fixture,
    register,
)


# ---------------------------------------------------------------------------
# Extension tier: training-data pipeline operators (SURVEY.md §7.5)
# ---------------------------------------------------------------------------

#: Canonical normalized-text expression, mirrored verbatim in DuckDB SQL.
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"
_GRAMS_SQL = f"""
list_distinct(list_transform(
    generate_series(1, greatest(len({_TOKS_SQL}) - 2, 1)),
    i -> array_to_string(({_TOKS_SQL})[i:i+2], ' ')))
"""
_EN_SET = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"


@register(
    "doc_exact_dedup",
    f"""
SELECT
    md5({_NORM_SQL}) AS fp,
    MIN(doc_id) AS keep_id,
    COUNT(*) AS n_copies
FROM documents
GROUP BY 1
""",
)
def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text MD5 fingerprint (§7.5)."""
    from .operators.dedup import exact_dedup_stats

    return exact_dedup_stats(load_fixture(spark, sf_dir, "documents"))


@register(
    "doc_token_stats",
    f"""
WITH t AS (
    SELECT
        doc_id,
        {_NORM_SQL} AS norm,
        {_TOKS_SQL} AS toks
    FROM documents
)
SELECT
    doc_id,
    len(toks) AS n_tokens,
    CAST(list_sum(list_transform(toks,
        w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
    ROUND(len(list_filter(toks, tk -> tk IN {_EN_SET}))
          / greatest(len(toks), 1), 6) AS stop_ratio,
    ROUND((length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')))
          / greatest(length(norm), 1), 6) AS punct_ratio,
    ROUND(0.4 * (len(list_filter(toks, tk -> tk IN {_EN_SET}))
                 / greatest(len(toks), 1))
        + 0.3 * least(len(toks) / 100.0, 1.0)
        + 0.3 * (1.0 - (length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')))
                 / greatest(length(norm), 1)), 6) AS quality_score,
    md5(norm) AS fp
FROM t
""",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring + fingerprint per document (§7.5)."""
    from .functions import text as T

    docs = fan_out(load_fixture(spark, sf_dir, "documents"))
    # normalize + tokenize ONCE; the stats project reads the shared columns
    # (project-collapse keeps non-cheap exprs in their own projection)
    base = docs.select(
        "doc_id",
        T.normalize_text("text").alias("norm"),
        T.tokens("text").alias("toks"),
    )
    return base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        T.bpe_token_estimate_from("toks").alias("bpe_tokens"),
        F.round(T.stopword_ratio_from("toks", T.LANG_STOPWORDS["en"]), 6).alias("stop_ratio"),
        F.round(T.punct_ratio_from("norm"), 6).alias("punct_ratio"),
        F.round(T.quality_score_from("norm", "toks"), 6).alias("quality_score"),
        T.fingerprint_from("norm").alias("fp"),
    )


def _lang_hits_sql(lang_set: str) -> str:
    return f"len(list_filter({_TOKS_SQL}, tk -> tk IN {lang_set}))"


_LANG_SETS_SQL = {
    "en": _EN_SET,
    "pt": "('de', 'da', 'do', 'que', 'e', 'o', 'um')",
    "es": "('el', 'la', 'de', 'los', 'que', 'y', 'un')",
    "fr": "('le', 'la', 'les', 'des', 'et', 'un', 'une')",
    "de": "('der', 'die', 'das', 'und', 'ein', 'zu', 'ist')",
}

_LANG_CASE_SQL = """
CASE
    WHEN en_hits > 0 AND en_hits >= pt_hits AND en_hits >= es_hits
         AND en_hits >= fr_hits AND en_hits >= de_hits THEN 'en'
    WHEN pt_hits > 0 AND pt_hits > en_hits AND pt_hits >= es_hits
         AND pt_hits >= fr_hits AND pt_hits >= de_hits THEN 'pt'
    WHEN es_hits > 0 AND es_hits > en_hits AND es_hits > pt_hits
         AND es_hits >= fr_hits AND es_hits >= de_hits THEN 'es'
    WHEN fr_hits > 0 AND fr_hits > en_hits AND fr_hits > pt_hits
         AND fr_hits > es_hits AND fr_hits >= de_hits THEN 'fr'
    WHEN de_hits > 0 AND de_hits > en_hits AND de_hits > pt_hits
         AND de_hits > es_hits AND de_hits > fr_hits THEN 'de'
    ELSE 'und'
END
"""


@register(
    "doc_lang_id",
    f"""
WITH h AS (
    SELECT
        doc_id,
        lang AS claimed_lang,
        {_lang_hits_sql(_LANG_SETS_SQL["en"])} AS en_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["pt"])} AS pt_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["es"])} AS es_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["fr"])} AS fr_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["de"])} AS de_hits
    FROM documents
)
SELECT doc_id, claimed_lang, {_LANG_CASE_SQL} AS predicted_lang
FROM h
""",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the fixture's claimed lang (§7.5)."""
    from .functions.text import LANG_STOPWORDS, lang_from_hits, stopword_hits_from, tokens

    docs = fan_out(load_fixture(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        F.col("lang").alias("claimed_lang"),
        tokens("text").alias("toks"),
    )
    # hit counts in their own projection: the argmax chain then reads plain
    # ints instead of re-evaluating the array filters per reference
    hits = base.select(
        "doc_id",
        "claimed_lang",
        *[
            stopword_hits_from("toks", sw).alias(f"h_{lang}")
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    return hits.select(
        "doc_id",
        "claimed_lang",
        lang_from_hits(
            {lang: F.col(f"h_{lang}") for lang in LANG_STOPWORDS}
        ).alias("predicted_lang"),
    )


@register(
    "doc_jaccard_near_dups",
    f"""
WITH g AS (
    SELECT doc_id, lang, {_GRAMS_SQL} AS grams
    FROM documents
)
SELECT
    a.doc_id AS id_a,
    b.doc_id AS id_b,
    ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
          / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard_sim
FROM g a
JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.1
""",
)
def q_doc_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs, lang-blocked (§7.5)."""
    from .operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load_fixture(spark, sf_dir, "documents"),
        block_col="lang",
        n=3,
        threshold=0.1,
    )


_COS_SQL = """
list_reduce(list_transform(generate_series(1, 64), i -> {a}[i] * {b}[i]),
            (x, y) -> x + y)
/ NULLIF(sqrt(list_reduce(list_transform(generate_series(1, 64), i -> {a}[i] * {a}[i]),
              (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(generate_series(1, 64), i -> {b}[i] * {b}[i]),
              (x, y) -> x + y)), 0)
"""


@register(
    "embedding_topk",
    f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), scored AS (
    SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        ROUND({_COS_SQL.format(a="q.e", b="c.e")}, 6) AS cosine_sim
    FROM v q
    JOIN v c ON c.vec_id != q.vec_id
    WHERE q.vec_id IN (0, 1, 2, 3, 4)
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5
""",
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 cosine neighbors for 5 query vectors (§7.5)."""
    from .operators.similarity import cosine_topk_bruteforce

    return cosine_topk_bruteforce(
        load_fixture(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5
    )


@register(
    "embedding_near_dups",
    f"""
WITH v AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), pairs AS (
    SELECT
        a.vec_id AS id_a,
        b.vec_id AS id_b,
        ROUND({_COS_SQL.format(a="a.e", b="b.e")}, 6) AS cosine_sim
    FROM v a
    JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs WHERE cosine_sim >= 0.35
""",
)
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within label blocks (§7.5)."""
    from .operators.similarity import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        load_fixture(spark, sf_dir, "embeddings"), threshold=0.35
    )


@register(
    "multimodal_features",
    f"""
SELECT
    doc_id,
    octet_length(encode(text)) AS n_bytes,
    substr(sha256(text), 1, 16) AS sha16,
    CAST(octet_length(encode(text)) % 64 + 16 AS INT) AS width,
    CAST((octet_length(encode(text)) * 7) % 64 + 16 AS INT) AS height,
    'image/fake' AS mime
FROM documents
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: Arrow mapInPandas with the stub codec
    (§7.5 multimodal). Oracle mirrors the deterministic fake formula."""
    from .multimodal.binary import attach_fake_payload, extract_binary_features

    media = attach_fake_payload(load_fixture(spark, sf_dir, "documents"))
    return extract_binary_features(media, use_fake_codec=True)


#: ONE SQL text, two engines: runs verbatim via spark.sql over temp views
#: AND as its own DuckDB oracle — the §3 entry-point-2 parity proof (the
#: reference's ad-hoc analytical SQL surface, reference: README.md:88-97).
_SQL_API_TEXT = """
WITH nation_rev AS (
    SELECT
        r_name AS region,
        n_name AS nation,
        ROUND(SUM(o_totalprice), 2) AS total_price,
        COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
)
SELECT region, nation, total_price, n_orders,
       CAST(RANK() OVER (PARTITION BY region
                         ORDER BY total_price DESC, nation) AS INT)
           AS rank_in_region
FROM nation_rev
"""


@register("sql_api_nation_rank", _SQL_API_TEXT)
def q_sql_api_nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql() entry point: same Catalyst plan surface as the DataFrame
    API — the oracle runs the IDENTICAL SQL text."""
    for t in ("orders", "customer", "nation", "region"):
        load_fixture(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_API_TEXT)


@register(
    "purchase_attribution",
    """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
       v.ts AS view_ts, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's most recent
    prior-or-same-instant view (operators.asof — window composition)."""
    from .operators.asof import asof_join

    ev = load_fixture(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    views = ev.filter(F.col("event_type") == "view")
    return asof_join(
        purchases,
        views,
        by="user_id",
        ts="purchase_ts",
        right_ts="ts",
        right_vals={"ts": "view_ts", "value": "view_value"},
    )


@register(
    "rolling_close_avg",
    """
SELECT
    l_partkey AS ticker,
    l_shipdate AS ts,
    l_orderkey,
    l_linenumber,
    l_extendedprice AS close,
    ROUND(AVG(l_extendedprice) OVER (
        PARTITION BY l_partkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
FROM lineitem
""",
)
def q_rolling_close_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row trailing SMA per instrument (frame-spec window, §2.5 class)."""
    from .plans.volatility import rolling_mean

    out = rolling_mean(
        _lineitem_series(spark, sf_dir),
        key="ticker",
        ts="ts",
        value="close",
        n=7,
        order_tiebreak=_SERIES_TIEBREAK,
        out="ma7",
    )
    return out.withColumn("ma7", F.round("ma7", 6))


@register(
    "qty_rollup",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def q_qty_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals + grand total (grouping sets)."""
    from .plans.analytics import qty_rollup

    return qty_rollup(load_fixture(spark, sf_dir, "lineitem"))


@register(
    "customer_set_ops",
    """
WITH hi_bal AS (
    SELECT c_custkey FROM customer WHERE c_acctbal > 7000.0
), big_ord AS (
    SELECT DISTINCT o_custkey AS c_custkey FROM orders
    WHERE o_totalprice > 300000.0
)
SELECT 'both' AS tag, c_custkey
FROM (SELECT c_custkey FROM hi_bal INTERSECT SELECT c_custkey FROM big_ord)
UNION ALL
SELECT 'balance_only' AS tag, c_custkey
FROM (SELECT c_custkey FROM hi_bal EXCEPT SELECT c_custkey FROM big_ord)
UNION ALL
SELECT 'orders_only' AS tag, c_custkey
FROM (SELECT c_custkey FROM big_ord EXCEPT SELECT c_custkey FROM hi_bal)
""",
)
def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION with set semantics (§2.7)."""
    from .plans.analytics import customer_set_ops

    return customer_set_ops(
        load_fixture(spark, sf_dir, "customer"),
        load_fixture(spark, sf_dir, "orders"),
    )


@register(
    "price_percentiles",
    """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles per group (PERCENTILE_CONT semantics)."""
    from .plans.analytics import price_percentiles

    return price_percentiles(load_fixture(spark, sf_dir, "lineitem"))


@register(
    "status_flag_pivot",
    """
SELECT l_linestatus,
       ROUND(AVG(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 6) AS avg_qty_a,
       ROUND(AVG(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 6) AS avg_qty_n,
       ROUND(AVG(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 6) AS avg_qty_r
FROM lineitem
GROUP BY l_linestatus
""",
)
def q_status_flag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with pinned values (one aggregation pass, no discovery job)."""
    from .plans.analytics import status_flag_pivot

    return status_flag_pivot(load_fixture(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# Streaming-tier functions, batch mode (SURVEY.md §2.9): the same bodies run
# incrementally under readStream (tests/test_streaming.py); here the batch
# form is oracle-checked so the streaming tier's semantics are pinned too.
# ---------------------------------------------------------------------------


@register(
    "windowed_event_kpis",
    """
SELECT
    time_bucket(INTERVAL '1 day', ts) AS window_start,
    time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
    event_type,
    COUNT(*) AS n_events,
    ROUND(AVG(value), 6) AS avg_value,
    ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_windowed_event_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time KPIs — F.window in batch mode (§2.9)."""
    from .streaming import windowed_event_kpis

    return windowed_event_kpis(load_fixture(spark, sf_dir, "events"))


@register(
    "sliding_window_kpis",
    """
SELECT ws AS window_start,
       ws + INTERVAL '2 days' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(SUM(value), 2) AS total_value
FROM (
    SELECT unnest([time_bucket(INTERVAL '1 day', ts),
                   time_bucket(INTERVAL '1 day', ts) - INTERVAL '1 day']) AS ws,
           event_type, value
    FROM events
)
GROUP BY 1, 2, 3
""",
)
def q_sliding_window_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (2-day window, 1-day slide) — the
    window type that completes the set next to the tumbling
    (windowed_event_kpis) and session (user_sessions) entries: each
    event lands in window/slide = 2 overlapping windows, the hopping
    aggregation a freshness-weighted KPI panel runs. Same
    streaming/windows.windowed_event_kpis body (slide param), so the
    identical code runs under Structured Streaming with a watermark;
    the oracle REPLICATES each event into its two epoch-aligned window
    starts (time_bucket d and d−1) — alignment identical to F.window's
    epoch-anchored slide arithmetic on TIMESTAMP_NTZ, pinned by the
    hash. Scale: one hash-aggregate at 2x the event rows, no shuffle
    beyond the aggregation's own — slide fan-out happens map-side."""
    from .streaming import windowed_event_kpis

    return windowed_event_kpis(
        load_fixture(spark, sf_dir, "events"),
        window="2 days",
        slide="1 day",
    )


@register(
    "user_sessions",
    """
WITH o AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_ts IS NULL
                     OR ts >= prev_ts + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM o
), sess AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM sess
GROUP BY user_id, sid
""",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window gap sessionization; oracle is the lag/cumsum
    gaps-and-islands rewrite (sessions end at last event + gap)."""
    from .streaming import session_stats

    return session_stats(
        load_fixture(spark, sf_dir, "events"), gap="30 minutes"
    )


# -- rows-only entries (non-SQL-expressible scale paths) ---------------------


def _minhash_oracle_sql(num_hashes: int, bands: int, threshold: float) -> str:
    """DuckDB twin of the FULL portable-mode MinHash+LSH pipeline: shingle
    hash → affine minhash signature → band keys → bucket self-join →
    exact-Jaccard verify. Generated from the same _minhash_params constants
    the Spark operator uses, so signatures match bit-for-bit."""
    from .operators.dedup import _MERSENNE_P, _minhash_params

    p = _MERSENNE_P
    params = _minhash_params(num_hashes)
    mins = ",\n        ".join(
        f"MIN(({a} * h + {b}) % {p}) AS m{i}" for i, (a, b) in enumerate(params)
    )
    rpb = num_hashes // bands
    band_rows = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        + " || ',' || ".join(f"CAST(m{b * rpb + j} AS VARCHAR)" for j in range(rpb))
        + " AS band_key FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
    SELECT DISTINCT doc_id,
           CAST(('0x' || substr(md5(u.g), 1, 15)) AS BIGINT) % {p} AS h
    FROM documents, unnest({_GRAMS_SQL}) AS u(g)
), sig AS (
    SELECT doc_id,
        {mins}
    FROM sh GROUP BY doc_id
), bands AS (
    {band_rows}
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
), g AS (
    SELECT doc_id, {_GRAMS_SQL} AS grams FROM documents
), scored AS (
    SELECT c.id_a, c.id_b,
           ROUND(len(list_intersect(ga.grams, gb.grams))::DOUBLE
                 / len(list_distinct(list_concat(ga.grams, gb.grams))), 6)
               AS jaccard_sim
    FROM cand c
    JOIN g ga ON ga.doc_id = c.id_a
    JOIN g gb ON gb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard_sim FROM scored WHERE jaccard_sim >= {threshold}
"""


@register("minhash_lsh_near_dups", _minhash_oracle_sql(32, 8, 0.1))
def q_minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline (bands → candidates → exact verify),
    run in engine-portable hash mode so the ENTIRE pipeline — signatures,
    banding, candidate join, verify — is oracle-checked against DuckDB.
    The xxhash64 fast path is the code default; tests pin that both modes
    share a plan shape and recall the planted duplicates."""
    from .operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        load_fixture(spark, sf_dir, "documents"),
        num_hashes=32,
        bands=8,
        threshold=0.1,
        hash_mode="portable",
    )


def _simhash_oracle_sql(max_hamming: int) -> str:
    """DuckDB twin of the portable-mode SimHash pipeline: 60-bit md5 token
    hash → per-bit votes → signature → 4x15-bit block LSH → Hamming verify.
    Bit extraction is spelled arithmetically ((h // 2^i) % 2) so it is
    engine-neutral; signatures reassemble as a sum of disjoint powers."""
    n_bits, width = 60, 15
    votes = ",\n        ".join(
        f"SUM(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(n_bits)
    )
    sig_expr = "\n        + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(n_bits)
    )
    blocks = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, {j} AS block_idx, "
        f"(sig // {1 << (width * j)}) % {1 << width} AS block_val FROM sig"
        for j in range(4)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, CAST(('0x' || substr(md5(u.t), 1, 15)) AS BIGINT) AS h
    FROM documents, unnest({_TOKS_SQL}) AS u(t)
), votes AS (
    SELECT doc_id,
        {votes}
    FROM tok GROUP BY doc_id
), sig AS (
    SELECT doc_id,
        {sig_expr} AS sig
    FROM votes
), blocks AS (
    {blocks}
), cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM blocks a
    JOIN blocks b ON a.block_idx = b.block_idx AND a.block_val = b.block_val
                AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sig, sb.sig)) AS INTEGER) AS hamming
FROM cand c
JOIN sig sa ON sa.doc_id = c.id_a
JOIN sig sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.sig, sb.sig)) <= {max_hamming}
"""


@register("simhash_near_dups", _simhash_oracle_sql(8))
def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (block LSH + Hamming verify), run in
    engine-portable 60-bit md5 mode so signatures, blocking and the Hamming
    verify are all oracle-checked in DuckDB; xxhash64/64-bit stays the code
    default (tests cover both modes)."""
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        load_fixture(spark, sf_dir, "documents"),
        max_hamming=8,
        hash_mode="portable",
    )


def _lsh_ann_oracle_sql(
    query_ids: list[int],
    k: int,
    *,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB twin of the FULL hyperplane-LSH ANN pipeline. The hyperplanes
    are seeded constants (numpy default_rng), embedded as list literals in
    both engines; the signature dot products fold left-to-right over the
    same doubles on both sides, so sign bits — and therefore buckets,
    candidates and the re-ranked top-k — match bit-for-bit."""
    from .operators.similarity import _hyperplanes

    tables = [_hyperplanes(dim, n_planes, seed=7 + t) for t in range(n_tables)]

    def dot_lit(plane) -> str:
        lit = "[" + ", ".join(repr(float(w)) for w in plane) + "]"
        return (
            f"list_reduce(list_transform(generate_series(1, {dim}), "
            f"i -> e[i] * ({lit})[i]), (x, y) -> x + y)"
        )

    sig_cols = ",\n        ".join(
        "("
        + "\n         + ".join(
            f"(CASE WHEN {dot_lit(tables[t][j])} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes)
        )
        + f") AS sig{t}"
        for t in range(n_tables)
    )
    corpus = "\n    UNION ALL\n    ".join(
        f"SELECT vec_id AS neighbor_id, {t} AS table_idx, sig{t} AS bucket FROM sigs"
        for t in range(n_tables)
    )
    probe_arms = []
    for t in range(n_tables):
        probe_arms.append(f"SELECT vec_id AS query_id, {t} AS table_idx, sig{t} AS bucket FROM qsigs")
        probe_arms += [
            f"SELECT vec_id AS query_id, {t} AS table_idx, "
            f"xor(sig{t}, {1 << j}) AS bucket FROM qsigs"
            for j in range(n_planes)
        ]
    probes = "\n    UNION ALL\n    ".join(probe_arms)
    ids = ", ".join(str(q) for q in query_ids)
    return f"""
WITH v AS (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), sigs AS (
    SELECT vec_id, e,
        sqrt(list_reduce(list_transform(generate_series(1, {dim}),
             i -> e[i] * e[i]), (x, y) -> x + y)) AS nrm,
        {sig_cols}
    FROM v
), qsigs AS (
    SELECT * FROM sigs WHERE vec_id IN ({ids})
), corpus AS (
    {corpus}
), probes AS (
    {probes}
), cand AS (
    SELECT DISTINCT p.query_id, c.neighbor_id
    FROM probes p
    JOIN corpus c ON c.table_idx = p.table_idx AND c.bucket = p.bucket
    WHERE c.neighbor_id != p.query_id
), scored AS (
    SELECT cand.query_id, cand.neighbor_id,
        ROUND(list_reduce(list_transform(generate_series(1, {dim}),
                  i -> q.e[i] * n.e[i]), (x, y) -> x + y)
              / NULLIF(q.nrm * n.nrm, 0), 6) AS cosine_sim
    FROM cand
    JOIN sigs q ON q.vec_id = cand.query_id
    JOIN sigs n ON n.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, cosine_sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_sim DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


@register("embedding_topk_lsh", _lsh_ann_oracle_sql([0, 1, 2, 3, 4], 5))
def q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-k (multiprobe) — the ANN scale path.
    The hyperplanes are seeded constants, so the WHOLE pipeline (sign-bit
    signatures, multi-table buckets, multiprobe, cosine re-rank) is
    deterministic and oracle-checked end-to-end in DuckDB; recall vs brute
    force additionally asserted in tests/test_similarity.py."""
    from .operators.similarity import cosine_topk_lsh

    return cosine_topk_lsh(
        load_fixture(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5
    )


@register(
    "embedding_topk_ivf",
    """
SELECT CAST(5 AS BIGINT) AS n_queries,
       CAST(25 AS BIGINT) AS n_exact_pairs,
       true AS recall_ok,
       true AS scores_exact
""",
)
def q_embedding_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) approximate top-k — the data-adaptive
    ANN tier; nprobe/nlist of the corpus scanned per query.

    The iterative k-means training is not SQL-expressible, so the entry is
    a HARD GATE instead of rows-only: it runs the full IVF pipeline AND the
    exact brute-force twin, and returns one audit row the oracle pins as
    constants — every query answered, recall ≥ 0.3 vs brute force (the
    floor tests/test_similarity.py enforces), and every overlapping pair's
    cosine bit-equal to the exact kernel. A silent recall collapse or score
    drift flips the hash red in CORRECTNESS_r{N}.json.
    """
    from .operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        ivf_index,
    )

    emb = load_fixture(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    # Build the index ONCE and persist the assigned frame: the probe reads
    # it twice (corpus side + query side), and this audit consumes the IVF
    # result in two branches (hits join + n_queries agg) — without the
    # persist the corpus-scale assignment aggregate re-runs ~4x. At 100 TB
    # the same role is played by the _cell-partitioned index table
    # (ivf_index docstring); persist() is the single-session twin. The two
    # ≤25-row result frames are cached for the same two-branch reason.
    centroids, assigned = ivf_index(emb)
    assigned.persist()
    ivf = cosine_topk_ivf(emb, qids, k=5, index=(centroids, assigned)).select(
        "query_id", "neighbor_id", "cosine_sim"
    ).cache()
    bf = cosine_topk_bruteforce(emb, qids, k=5).select(
        "query_id", "neighbor_id", F.col("cosine_sim").alias("bf_sim")
    ).cache()
    try:
        hits = ivf.join(bf, ["query_id", "neighbor_id"])
        row = (
            bf.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
            .crossJoin(ivf.agg(F.countDistinct("query_id").alias("n_queries")))
            .crossJoin(
                hits.agg(
                    F.count(F.lit(1)).alias("n_hits"),
                    F.max(
                        F.abs(F.col("cosine_sim") - F.col("bf_sim"))
                    ).alias("max_diff"),
                )
            )
            .select(
                "n_queries",
                "n_exact_pairs",
                (
                    F.col("n_hits") >= F.lit(0.3) * F.col("n_exact_pairs")
                ).alias("recall_ok"),
                (
                    F.coalesce(F.col("max_diff"), F.lit(0.0)) < F.lit(1e-9)
                ).alias("scores_exact"),
            )
            .first()
        )
    finally:
        # the audit scalars are computed — drop the cached frames so a
        # long-lived session (the driver runs 50 queries on one session,
        # bench runs everything twice) doesn't accumulate dead cache
        for f in (ivf, bf, assigned):
            f.unpersist()
    return spark.createDataFrame(
        [tuple(row)],
        "n_queries long, n_exact_pairs long, "
        "recall_ok boolean, scores_exact boolean",
    )


@register(
    "approx_event_stats",
    """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_users,
       true AS users_ok,
       true AS median_ok
FROM events
GROUP BY event_type
""",
)
def q_approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + approximate median per event type, as a HARD GATE:
    the sketch values are engine-specific by design, so the entry returns
    the exact aggregates (oracle-checkable) plus error-bound booleans the
    oracle pins to true — HLL++ within 3·rsd (15%) of exact COUNT DISTINCT,
    approx median inside the exact p40–p60 band. Sketch drift flips the row
    red rather than leaving it grey. (At 100 TB only the sketch side runs;
    the exact twin here is the correctness fixture.)"""
    from .plans.analytics import approx_event_stats

    events = load_fixture(spark, sf_dir, "events")
    sk = approx_event_stats(events)
    exact = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events_exact"),
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.4)").alias("_p40"),
        F.expr("percentile(value, 0.6)").alias("_p60"),
    )
    return sk.join(exact, "event_type").select(
        "event_type",
        F.col("n_events").alias("n_events"),
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(0.15) * F.col("exact_users")
        ).alias("users_ok"),
        F.col("approx_median_value").between(F.col("_p40"), F.col("_p60")).alias(
            "median_ok"
        ),
    )


_CORR_SUBQ_TEXT = """
SELECT p.p_partkey, p.p_brand, p.p_retailprice
FROM part p
WHERE p.p_retailprice > 1.03 * (
    SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


@register("pricey_parts_vs_brand_avg", _CORR_SUBQ_TEXT)
def q_pricey_parts_vs_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join — SURVEY §4.2 'subquery decorrelation' row). Same SQL
    text on both engines."""
    load_fixture(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_CORR_SUBQ_TEXT)


@register(
    "customer_order_coverage",
    """
WITH per_cust AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_spent
    FROM orders GROUP BY o_custkey
)
SELECT
    COALESCE(c.c_custkey, p.o_custkey) AS custkey,
    c.c_mktsegment,
    p.n_orders,
    p.total_spent
FROM customer c
FULL OUTER JOIN per_cust p ON c.c_custkey = p.o_custkey
""",
)
def q_customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: customers with no orders keep NULL order stats,
    order keys with no customer row (referential gaps) keep NULL segment."""
    customer = load_fixture(spark, sf_dir, "customer")
    per_cust = (
        load_fixture(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )
    return (
        customer.join(
            per_cust, customer.c_custkey == per_cust.o_custkey, "full_outer"
        )
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_mktsegment",
            "n_orders",
            "total_spent",
        )
    )


@register(
    "top_performers",
    _CHANGES_CTE
    + """
SELECT ticker,
       ROUND(AVG(variacao_diaria), 6) AS avg_return,
       COUNT(*) AS n_obs
FROM changes
WHERE variacao_diaria IS NOT NULL
GROUP BY ticker
ORDER BY avg_return DESC, ticker ASC
LIMIT 5
""",
)
def q_top_performers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notebook top-5 by mean daily return (reference:
    analysis/análise_exploratória.ipynb → cell ac5a4914, A5 + O1)."""
    from .operators.topk import top_k

    changes = _lineitem_changes(spark, sf_dir)
    perf = (
        changes.filter(F.col("variacao_diaria").isNotNull())
        .groupBy("ticker")
        .agg(
            F.round(F.avg("variacao_diaria"), 6).alias("avg_return"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    return top_k(perf, [F.desc("avg_return"), F.asc("ticker")], 5)


_QUALITY_SQL = f"""
ROUND(0.4 * (len(list_filter({_TOKS_SQL}, tk -> tk IN {_EN_SET}))
             / greatest(len({_TOKS_SQL}), 1))
    + 0.3 * least(len({_TOKS_SQL}) / 100.0, 1.0)
    + 0.3 * (1.0 - (length({_NORM_SQL}) - length(regexp_replace({_NORM_SQL}, '[^a-z0-9 ]', '', 'g')))
             / greatest(length({_NORM_SQL}), 1)), 6)
"""


@register(
    "curated_corpus",
    f"""
WITH h AS (
    SELECT
        doc_id, text,
        {_QUALITY_SQL} AS quality,
        md5({_NORM_SQL}) AS fp,
        {_lang_hits_sql(_LANG_SETS_SQL["en"])} AS en_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["pt"])} AS pt_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["es"])} AS es_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["fr"])} AS fr_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["de"])} AS de_hits
    FROM documents
), kept AS (
    SELECT doc_id, text, quality, {_LANG_CASE_SQL} AS lang_pred, fp
    FROM h
    WHERE quality >= 0.5 AND {_LANG_CASE_SQL} IN ('en')
)
SELECT doc_id, text, quality, lang_pred, fp
FROM kept
QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
""",
)
def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pipeline: quality filter +
    language filter + exact dedup in one chain (operators.dedup
    .curate_corpus) — the end-to-end shape the extension tier serves."""
    from .operators.dedup import curate_corpus

    return curate_corpus(
        load_fixture(spark, sf_dir, "documents"), min_quality=0.5, langs=("en",)
    )


@register(
    "train_test_split",
    """
SELECT
    doc_id,
    CASE WHEN b < 80 THEN 'train'
         WHEN b < 90 THEN 'valid'
         ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           CAST(('0x' || substr(md5('seed42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS b
    FROM documents
)
""",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted-md5 train/valid/test assignment (80/10/10) —
    engine-portable, shuffle-free, re-derivable per row (operators.sampling)."""
    from .operators.sampling import assign_split

    docs = load_fixture(spark, sf_dir, "documents")
    return assign_split(docs, "doc_id").select("doc_id", "split")


@register(
    "top_docs_per_lang",
    f"""
WITH h AS (
    SELECT
        doc_id,
        {_QUALITY_SQL} AS quality,
        {_lang_hits_sql(_LANG_SETS_SQL["en"])} AS en_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["pt"])} AS pt_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["es"])} AS es_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["fr"])} AS fr_hits,
        {_lang_hits_sql(_LANG_SETS_SQL["de"])} AS de_hits
    FROM documents
), scored AS (
    SELECT doc_id, quality, {_LANG_CASE_SQL} AS lang_pred FROM h
)
SELECT lang_pred, doc_id, quality
FROM scored
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY lang_pred ORDER BY quality DESC, doc_id
) <= 3
""",
)
def q_top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-3 documents per predicted language by quality score — the
    grouped top-k (operators.topk.top_k_per_group): one ranking-window
    shuffle on the group key, rows beyond k never leave the executor."""
    from .functions.text import (
        LANG_STOPWORDS,
        lang_from_hits,
        normalize_text,
        quality_score_from,
        stopword_hits_from,
        tokens_from,
    )
    from .operators.topk import top_k_per_group

    docs = fan_out(load_fixture(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        normalize_text("text").alias("_norm"),
        tokens_from(normalize_text("text")).alias("_toks"),
    )
    hits = base.select(
        "doc_id",
        "_norm",
        "_toks",
        *[
            stopword_hits_from("_toks", sw).alias(f"_h_{lang}")
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    scored = hits.select(
        "doc_id",
        F.round(quality_score_from("_norm", "_toks"), 6).alias("quality"),
        lang_from_hits(
            {lang: F.col(f"_h_{lang}") for lang in LANG_STOPWORDS}
        ).alias("lang_pred"),
    )
    best = top_k_per_group(
        scored, ["lang_pred"], [F.desc("quality"), F.asc("doc_id")], 3
    )
    return best.select("lang_pred", "doc_id", "quality")


@register(
    "term_frequencies",
    f"""
WITH occ AS (
    SELECT doc_id, u.term
    FROM documents, unnest({_TOKS_SQL}) AS u(term)
    WHERE length(u.term) >= 1
), per_doc AS (
    SELECT term, doc_id, COUNT(*) AS n_in_doc
    FROM occ GROUP BY term, doc_id
)
SELECT term, CAST(SUM(n_in_doc) AS BIGINT) AS tf, COUNT(*) AS df
FROM per_doc
GROUP BY term
ORDER BY tf DESC, term
LIMIT 20
""",
)
def q_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary stats: top-20 terms by collection frequency with
    document frequency riding the same shuffle (operators.corpus)."""
    from .operators.corpus import term_frequencies
    from .operators.topk import top_k

    tf = term_frequencies(load_fixture(spark, sf_dir, "documents"))
    return top_k(tf, [F.desc("tf"), F.asc("term")], 20)


@register(
    "doc_chunks",
    f"""
WITH t AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
), s AS (
    SELECT doc_id, toks, len(toks) AS n FROM t
), st AS (
    SELECT doc_id, toks, n,
           unnest(generate_series(1, greatest(n - 8, 1), 24)) AS start
    FROM s
)
SELECT doc_id,
       CAST((start - 1) // 24 AS INT) AS chunk_idx,
       array_to_string(toks[start:least(start + 31, n)], ' ') AS chunk_text,
       CAST(least(32, n - start + 1) AS INT) AS chunk_n_tokens
FROM st
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap (32/8) — the
    context-length packing step of a training-data pipeline
    (operators.chunking; map-side only, no shuffle)."""
    from .operators.chunking import chunk_documents

    return chunk_documents(
        load_fixture(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register(
    "doc_repetition_stats",
    f"""
WITH t AS (
    SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
), units AS (
    SELECT doc_id, 1 AS n, unnest(toks) AS gram FROM t
    UNION ALL
    SELECT doc_id, 2 AS n,
           unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 1)),
               i -> array_to_string(toks[i:i+1], ' '))) AS gram
    FROM t
    UNION ALL
    SELECT doc_id, 3 AS n,
           unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 1)),
               i -> array_to_string(toks[i:i+2], ' '))) AS gram
    FROM t
), counts AS (
    SELECT doc_id, n, gram, COUNT(*) AS c FROM units GROUP BY doc_id, n, gram
), per_size AS (
    SELECT doc_id, n, MAX(c) AS top_c, SUM(c) AS total,
           COUNT(*) AS n_distinct
    FROM counts GROUP BY doc_id, n
)
SELECT doc_id,
    ROUND(MAX(CASE WHEN n = 1 THEN top_c / total END), 6) AS top_token_frac,
    ROUND(MAX(CASE WHEN n = 2 THEN top_c / total END), 6) AS top_bigram_frac,
    ROUND(MAX(CASE WHEN n = 3 THEN 1 - n_distinct / total END), 6)
        AS dup_trigram_frac
FROM per_size GROUP BY doc_id
""",
)
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document — top
    token/bigram fraction and duplicate-trigram fraction, all three gram
    sizes riding one explode (operators.corpus.repetition_stats)."""
    from .operators.corpus import repetition_stats

    return repetition_stats(load_fixture(spark, sf_dir, "documents"))


_CONTAM_GRAMS_SQL = f"""
list_distinct(list_transform(
    generate_series(1, greatest(len({_TOKS_SQL}) - 2, 1)),
    i -> array_to_string(({_TOKS_SQL})[i:i+2], ' ')))
"""


#: Shared by doc_contamination AND doc_contamination_bloom: the Bloom
#: pre-gate only prunes (no false negatives) and the exact verify join
#: removes its false positives, so the SAME exact oracle pins both paths.
_CONTAM_ORACLE_SQL = f"""
WITH bg AS (
    SELECT DISTINCT unnest({_CONTAM_GRAMS_SQL}) AS gram
    FROM documents WHERE doc_id % 50 = 0
), dg AS (
    SELECT doc_id, unnest({_CONTAM_GRAMS_SQL}) AS gram
    FROM documents WHERE doc_id % 50 != 0
), ov AS (
    SELECT dg.doc_id, COUNT(*) AS n_ov
    FROM dg JOIN bg USING (gram) GROUP BY dg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ov.n_ov, 0) AS BIGINT) AS n_overlap_grams,
       COALESCE(ov.n_ov, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov ON d.doc_id = ov.doc_id
WHERE d.doc_id % 50 != 0
"""


@register(
    "doc_contamination_dual",
    f"""
SELECT 'bloom' AS path, * FROM ({_CONTAM_ORACLE_SQL})
UNION ALL
SELECT 'exact' AS path, * FROM ({_CONTAM_ORACLE_SQL})
""",
)
def q_doc_contamination_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through BOTH physical paths in ONE
    gate — the r10 verdict's registry-headroom merge of
    ``doc_contamination`` + ``doc_contamination_bloom``, which always
    shared one oracle: every 50th doc plays the held-out eval set;
    corpus docs are flagged on any shared word trigram.

    Path 'exact' broadcasts the benchmark gram set and verifies
    directly (operators.corpus.contamination_flags); path 'bloom'
    pre-gates the corpus gram stream MAP-SIDE with an m-bit xxhash64
    bitmap (operators/bloom.py — the runtime-filter / semi-join-
    reduction pattern by hand) before the same exact verify join.
    Bloom has no false negatives and the verify join drops its false
    positives, so both paths' outputs — and therefore both oracle
    branches — are identical by construction; the union asserts that
    identity on every driver run. At real benchmark sizes the bloom
    broadcast shrinks from the gram string set to m/8 bytes (8 KB)."""
    from .operators.bloom import bloom_pregated_contamination
    from .operators.corpus import contamination_flags

    docs = load_fixture(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    exact = contamination_flags(corpus, bench, n=3).select(
        F.lit("exact").alias("path"), "*"
    )
    bloom = bloom_pregated_contamination(corpus, bench, n=3).select(
        F.lit("bloom").alias("path"), "*"
    )
    return exact.unionByName(bloom)


@register(
    "embedding_centroids",
    """
SELECT
    label,
    CAST(i - 1 AS INT) AS pos,
    ROUND(AVG(embedding[i]), 6) AS component,
    COUNT(*) AS n_vectors
FROM embeddings CROSS JOIN generate_series(1, 64) AS s(i)
GROUP BY label, i
""",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototype): posexplode + one
    (label, pos)-keyed hash-aggregate, exploded back for comparison
    (operators.similarity.group_centroids)."""
    from .operators.similarity import group_centroids

    cents = group_centroids(
        load_fixture(spark, sf_dir, "embeddings"),
        vec_col="embedding",
        group_col="label",
    )
    return cents.select(
        "label",
        F.posexplode("centroid").alias("pos", "component"),
        "n_vectors",
    ).select(
        "label", "pos", F.round("component", 6).alias("component"), "n_vectors"
    )


@register(
    "split_balance",
    f"""
WITH assigned AS (
    SELECT
        doc_id, n_chars,
        {_QUALITY_SQL} AS quality,
        CASE WHEN CAST(('0x' || substr(md5('seed42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 < 80 THEN 'train'
             WHEN CAST(('0x' || substr(md5('seed42:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 < 90 THEN 'valid'
             ELSE 'test' END AS split
    FROM documents
)
SELECT
    split,
    COUNT(*) AS n_docs,
    ROUND(AVG(quality), 6) AS avg_quality,
    ROUND(AVG(n_chars), 4) AS avg_chars
FROM assigned
GROUP BY split
""",
)
def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratification audit of the hash split: per-split doc count, mean
    quality, mean length. A biased split (metric drift between train and
    test) shows up here; a salted-hash split should be statistically flat.
    Map-side assignment + one 3-key aggregate."""
    from .functions.text import normalize_text, quality_score_from, tokens_from
    from .operators.sampling import assign_split

    docs = fan_out(load_fixture(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "n_chars",
        normalize_text("text").alias("_norm"),
        tokens_from(normalize_text("text")).alias("_toks"),
    )
    scored = base.select(
        "doc_id",
        "n_chars",
        F.round(quality_score_from("_norm", "_toks"), 6).alias("quality"),
    )
    assigned = assign_split(scored, "doc_id")
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
