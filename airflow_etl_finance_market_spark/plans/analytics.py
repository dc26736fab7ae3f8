"""Analytical query surface (SURVEY.md §2.4-§2.6, §2.3, §3 entry point 2).

These are the README metric queries, the notebook analytics, and the
star-schema consumption joins, generalized over input DataFrames. Each
function documents its reference twin and its physical shape at scale.

All expressions are native Catalyst — zero Python UDFs on this path, so every
plan below is fully inside WholeStageCodegen between exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.scoring import minmax_scale, weighted_score


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """Multi-aggregate in one pass (A11 + A1/A5/A6): one shuffle, 8 measures.

    Reference shape: the README per-ticker multi-aggregate metric
    (reference: README.md:89-97) — phrased over lineitem's natural grouping
    keys. Sums round to 2 (money edge), means to 6 (F6 presentation-edge
    rounding so cross-engine summation-order noise can't flip a value hash).
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(charge), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def ticker_metrics(changes: DataFrame, *, key: str = "ticker",
                   change: str = "variacao_diaria") -> DataFrame:
    """Per-instrument risk metrics: STDDEV/AVG/MAX/MIN in one grouping
    (A4-A7, A11, F6; reference: README.md:89-97)."""
    return (
        changes.filter(F.col(change).isNotNull())
        .groupBy(F.col(key).alias("ticker"))
        .agg(
            F.round(F.stddev_samp(change), 6).alias("volatilidade"),
            F.round(F.avg(change), 6).alias("variacao_media"),
            F.round(F.max(change), 6).alias("maior_alta"),
            F.round(F.min(change), 6).alias("maior_queda"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def volume_leaders(lineitem: DataFrame, k: int = 5) -> DataFrame:
    """Top-k total volume (A6 + O1; reference: README.md:108-115).

    Plans as partial-agg → exchange → final-agg → TakeOrderedAndProject;
    the k-row heap merge means no global sort at any scale.
    """
    return (
        lineitem.groupBy(F.col("l_partkey").alias("ticker"))
        .agg(
            F.sum("l_quantity").alias("total_volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .orderBy(F.desc("total_volume"), F.asc("ticker"))
        .limit(k)
    )


def segment_balance(customer: DataFrame) -> DataFrame:
    """AVG/SUM per segment (A5/A6 over the customer fixture)."""
    return customer.groupBy("c_mktsegment").agg(
        F.round(F.avg("c_acctbal"), 6).alias("avg_balance"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        F.count(F.lit(1)).alias("n_customers"),
    )


def distinct_counts(events: DataFrame) -> DataFrame:
    """Exact COUNT DISTINCT (A9; notebook nunique). At 100 TB prefer
    approx_count_distinct — exact distinct is a full shuffle of the keys;
    both are exposed, the oracle-checked one is exact."""
    return events.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


def recent_extract(events: DataFrame, limit: int = 100) -> DataFrame:
    """Projection + full sort + LIMIT (P1/P2, O2, O3) — the notebook's fact
    extract (reference: análise_exploratória.ipynb → cell 5d2d2b85).
    event_id makes the ordering total, so LIMIT is deterministic."""
    return (
        events.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            F.col("value").alias("close"),
        )
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(limit)
    )


def star_revenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                 nation: DataFrame, region: DataFrame) -> DataFrame:
    """Star-schema consumption join (J1/J2; reference: README.md:134).

    nation/region/customer are broadcast (dims: ≤ thousands of rows even at
    100 TB fact scale); lineitem⋈orders is the one genuine shuffle join —
    both sides hash-partition on orderkey, and AQE converts to broadcast
    when orders fits under the threshold at small SF.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def customers_without_big_orders(customer: DataFrame, orders: DataFrame,
                                 threshold: float = 400000.0) -> DataFrame:
    """Left-anti join (J3 — the ON CONFLICT DO NOTHING shape,
    reference: dags/financial_pipeline.py:148-150). Filter pushes below the
    join so the anti side shrinks before shuffling."""
    big = orders.filter(F.col("o_totalprice") > threshold).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def customers_with_big_orders(customer: DataFrame, orders: DataFrame,
                              threshold: float = 400000.0) -> DataFrame:
    """Left-semi twin of the above (EXISTS)."""
    big = orders.filter(F.col("o_totalprice") > threshold).select("o_custkey")
    return (
        customer.join(big, customer.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def brand_scores(part: DataFrame, k: int = 3) -> DataFrame:
    """Min-max scoring pipeline (A10 + F11 + O1;
    reference: análise_exploratória.ipynb → cell f927e059).

    groupBy → tiny aggregate (one row per brand) → un-partitioned window
    min/max (fine: input is already post-aggregation bytes) → weighted score
    → top-k. The weights mirror the notebook's fixed-profile weighting.
    """
    stats = part.groupBy(F.col("p_brand").alias("brand")).agg(
        F.avg("p_retailprice").alias("avg_price"),
        F.avg("p_size").alias("avg_size"),
    )
    scaled = stats.select(
        "brand",
        "avg_price",
        "avg_size",
        minmax_scale("avg_price", out="price_scaled"),
        minmax_scale("avg_size", out="size_scaled"),
    )
    scored = scaled.select(
        "brand",
        F.round("avg_price", 6).alias("avg_price"),
        F.round("avg_size", 6).alias("avg_size"),
        F.round("price_scaled", 6).alias("price_scaled"),
        F.round("size_scaled", 6).alias("size_scaled"),
        F.round(
            weighted_score({"price_scaled": 0.6, "size_scaled": 0.4}), 6
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("brand")).limit(k)


def returnflag_correlation(lineitem: DataFrame) -> DataFrame:
    """Pearson correlation per group (SURVEY.md §7.3-11: the reference README
    claims ticker correlation but never implements it;
    reference: README.md:21,163). Native F.corr — distributed co-moments."""
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.count(F.lit(1)).alias("n"),
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Dedup-by-latest: row_number window, rank 1 per key (top_k_per_group
    shape). One shuffle on user_id; ties broken by event_id."""
    from ..operators.topk import top_k_per_group

    ranked = top_k_per_group(
        events,
        group_by=["user_id"],
        order_by=[F.desc("ts"), F.desc("event_id")],
        k=1,
    )
    return ranked.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


def events_json_kpi(events: DataFrame) -> DataFrame:
    """JSON extraction + aggregate (extension surface for events.props;
    SURVEY.md §7.5). get_json_object is a native expression — no UDF."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )

def qty_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total (§2.4
    extension — the reference has no grouping sets, Spark gives them free).

    Physically a single hash-aggregate pass with an Expand node (one row per
    grouping set), so the cost is ~|grouping sets| x one aggregation — no
    repeated scans.
    """
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def customer_set_ops(customer: DataFrame, orders: DataFrame,
                     *, bal_floor: float = 7000.0,
                     price_floor: float = 300000.0) -> DataFrame:
    """INTERSECT / EXCEPT / UNION surface (§2.7 — absent in the reference,
    built-in in Spark): high-balance customers vs big-order customers,
    tagged by which set they fall in.

    Set (DISTINCT) semantics on both engines: .intersect / .subtract are
    INTERSECT / EXCEPT DISTINCT. Each branch is a shuffle on c_custkey; AQE
    converts the small distinct sides to broadcast where profitable.
    """
    hi_bal = customer.filter(F.col("c_acctbal") > bal_floor).select("c_custkey")
    big_ord = (
        orders.filter(F.col("o_totalprice") > price_floor)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = hi_bal.intersect(big_ord).select(F.lit("both").alias("tag"), "c_custkey")
    bal_only = hi_bal.subtract(big_ord).select(
        F.lit("balance_only").alias("tag"), "c_custkey"
    )
    ord_only = big_ord.subtract(hi_bal).select(
        F.lit("orders_only").alias("tag"), "c_custkey"
    )
    return both.unionByName(bal_only).unionByName(ord_only)


def price_percentiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per group (F.percentile ≡ SQL
    PERCENTILE_CONT ≡ DuckDB quantile_cont).

    Exact percentile sorts each group's values in the aggregation buffer —
    fine per (returnflag) group; at 100 TB with huge groups switch the call
    site to approx_percentile (t-digest, mergeable sketches).
    """
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        lineitem.groupBy("l_returnflag")
        .agg(pcts.alias("_p"))
        .select(
            "l_returnflag",
            F.round(F.col("_p")[0], 6).alias("p25"),
            F.round(F.col("_p")[1], 6).alias("p50"),
            F.round(F.col("_p")[2], 6).alias("p75"),
        )
    )


def status_flag_pivot(lineitem: DataFrame) -> DataFrame:
    """Pivot: avg quantity per linestatus row x returnflag column (§2.6-ish
    reshaping; the notebook's matplotlib tables are the closest reference).

    The pivot values are pinned explicitly — with them, one aggregation
    pass; without, Spark runs an extra distinct job to discover columns
    (never let it at scale).
    """
    return (
        lineitem.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.avg("l_quantity"), 6))
        .select(
            "l_linestatus",
            F.col("A").alias("avg_qty_a"),
            F.col("N").alias("avg_qty_n"),
            F.col("R").alias("avg_qty_r"),
        )
    )


def approx_event_stats(events: DataFrame) -> DataFrame:
    """Sketch aggregates for 100 TB interactive use: HyperLogLog++ distinct
    users and t-digest-style median per event type.

    approx_count_distinct and approx_percentile are mergeable fixed-size
    sketches — partial aggregation works, memory is O(precision) per group
    regardless of cardinality, unlike exact COUNT(DISTINCT)'s expand +
    re-shuffle or exact percentile's full value buffer. Accuracy bounds are
    asserted against the exact forms in tests (rows-only in the driver:
    sketch internals are engine-specific by design).
    """
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n_events"),
    )

def qty_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): every grouping-set combination —
    the cross-dimensional twin of :func:`qty_rollup`, plus GROUPING() ids
    so a consumer can tell a real NULL group from a subtotal row.

    Same physical shape as ROLLUP: one Expand (4 grouping sets here) into
    a single hash aggregate — no repeated scans; at scale the Expand's row
    multiplication is folded by map-side partial aggregation exactly like
    any other aggregate.
    """
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        )
    )


def hll_daily_user_sketches(
    events: DataFrame, *, key: str = "user_id", ts: str = "ts", lgk: int = 12
) -> DataFrame:
    """(d, sketch, users_est) — one Apache DataSketches HLL per day: the
    STORED mergeable intermediate of the distinct-count rollup pattern.
    approx_count_distinct gives a one-shot estimate; this materializes
    the sketch itself (a ≤ 2^lgk-byte binary), so a 100 TB event history
    aggregates to one tiny sketch row per (day) ONCE, and every coarser
    rollup — weekly, monthly, all-time, any ad-hoc slice union — merges
    stored sketches via :func:`hll_rollup_estimate` WITHOUT rescanning
    raw events. lgK=12 ⇒ relative standard error ~1.6%.
    """
    return (
        events.groupBy(F.col(ts).cast("date").alias("d"))
        .agg(F.hll_sketch_agg(key, F.lit(lgk)).alias("sketch"))
        .withColumn("users_est", F.hll_sketch_estimate("sketch"))
    )


def hll_rollup_estimate(
    sketches: DataFrame, *, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Merge stored HLL sketches to any coarser grain — the rollup that
    never touches raw data. Union of sketches = sketch of the union
    (the algebraic property that makes pre-aggregation sound for
    DISTINCT, which plain counts famously lack)."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("users_est")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def price_rank_distribution(orders: DataFrame) -> DataFrame:
    """Relative standing of every order's price within its priority class:
    percent_rank ((rank-1)/(n-1) — identical closed form in every
    engine) and cume_dist, deterministic under the (price, orderkey)
    tiebreak, rounded at the presentation edge. One window shuffle on
    the priority key; both functions ride the SAME sort."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def value_histogram_daily_sketches(
    events: DataFrame,
    *,
    value_col: str = "value",
    ts: str = "ts",
    lo: float = 0.0,
    width: float = 4.0,
    nbins: int = 256,
) -> DataFrame:
    """(d, b, c) — fixed-bin long-form histogram per day: the STORED
    mergeable intermediate of the QUANTILE rollup pattern, the order-
    statistics sibling of :func:`hll_daily_user_sketches`. Exact
    quantiles famously do not pre-aggregate (the median of medians is
    not the median); fixed-bin counts DO (bin counts sum), so a 100 TB
    event history stores <= ``nbins`` tiny rows per day ONCE and every
    coarser rollup reads quantile estimates off merged bins — with a
    one-bin-width error bound — without rescanning raw events.

    Bin arithmetic is engine-exact by construction: ``width`` should be
    a power of two (binary-FP division by it is exact), values clamp
    into [0, nbins-1], and the whole map is one hash-aggregate.

    NULL values are EXCLUDED up front (r07 advice): Spark's
    ``greatest`` skips NULLs, so a NULL value would otherwise clamp
    into bin 0 here while a SQL twin computing ``FLOOR(NULL/w)`` bins
    it as NULL — and either way it would inflate the rollup's rank
    denominator with a value that has no order statistic. Quantiles
    are defined over non-NULL values in every engine; the filter pins
    that contract.
    """
    b = F.least(
        F.lit(nbins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    return (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(ts).cast("date").alias("d"), b.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_rollup_quantiles(
    daily: DataFrame,
    *,
    lo: float = 0.0,
    width: float = 4.0,
    quantiles: tuple[tuple[int, int], ...] = ((50, 100), (95, 100)),
) -> DataFrame:
    """Merge stored daily histograms to Monday weeks and read quantile
    ESTIMATES off the merged bins — never touching raw events.

    Rank arithmetic is integer-derived: ``r_q = ceil(qn*n/qd)`` spelled
    ``floor((qn*n + qd - 1)/qd)`` so both engines compute the identical
    double; the estimate is the LOWER EDGE of the first bin whose
    cumulative count reaches ``r_q`` (true quantile lies within one bin
    width above — the documented error bound of the pattern).
    """
    from ..functions.datetime import week_start

    wk = daily.groupBy(week_start("d").alias("week"), "b").agg(
        F.sum("c").alias("c")
    )
    cum = wk.withColumn(
        "_cum", F.sum("c").over(Window.partitionBy("week").orderBy("b"))
    ).withColumn("_n", F.sum("c").over(Window.partitionBy("week")))
    aggs = [F.max("_n").alias("n_values")]
    for qn, qd in quantiles:
        rank = F.floor(
            (F.lit(qn) * F.col("_n") + F.lit(qd - 1)) / F.lit(qd)
        )
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") >= rank,
                    F.lit(lo) + F.col("b") * F.lit(width),
                )
            ).alias(f"p{qn}_est")
        )
    return cum.groupBy("week").agg(*aggs)


def kmv_daily_user_sketches(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts: str = "ts",
    k: int = 64,
) -> DataFrame:
    """(d, kmv) — the ``k`` MINIMUM distinct 60-bit md5 hash values of
    the day's users: the STORED mergeable intermediate of the KMV
    (k-minimum-values / bottom-k theta) distinct sketch, third member
    of the stored-sketch family next to the HLL and histogram rollups.
    What KMV adds over HLL is SET OPERATIONS: bottom-k sketches of two
    sets compose into an unbiased Jaccard/intersection estimator
    (Beyer et al. 2007; the Theta-sketch idiom), so "how many users did
    weeks A and B share" reads off two stored 512-byte rows — a
    question HLL sketches cannot answer and raw rescans pay a full
    shuffle for.

    The hash is the house portable salted-md5 kernel (mirrors verbatim
    in DuckDB), so the sketch — and every estimate derived from it —
    is bit-identical cross-engine. Per-day top-k runs as the standard
    grouped-top-k window (shuffle keyed by day; state bounded by
    distinct users/day, output <= k rows x 8 bytes per day).
    """
    h = F.conv(
        F.substring(F.md5(F.col(user_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    daily = events.select(
        F.col(ts).cast("date").alias("d"), h.alias("h")
    ).distinct()
    w = Window.partitionBy("d").orderBy("h")
    return (
        daily.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("d")
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )


def kmv_rollup_estimates(
    daily: DataFrame,
    *,
    k: int = 64,
) -> DataFrame:
    """Merge stored daily KMV sketches to Monday weeks and read off
    (a) the weekly distinct-user ESTIMATE and (b) the Jaccard and
    common-user estimates vs the PREVIOUS week — retained-audience
    numbers computed entirely from sketches, never rescanning events.

    Estimator arithmetic (exact-int inputs, one double division —
    engine-exact, mirrored in the oracle): a merged sketch with fewer
    than ``k`` values IS the exact distinct hash set (estimate =
    size); at ``k`` values the estimate is ``(k-1) * 2^60 / h_k``.
    For adjacent weeks, the combined bottom-k of the union gives
    ``J = |comb ∩ A ∩ B| / |comb|`` and ``|A ∩ B| ~= J x est(comb)``.
    All merge/intersection work is Catalyst array expressions over
    <= k-element arrays; the LAG window runs over the tiny
    weeks-cardinality frame (single partition by construction — the
    frame is O(weeks), not O(events)).
    """
    from ..functions.datetime import week_start

    wk_h = daily.select(
        week_start("d").alias("week"), F.explode("kmv").alias("h")
    ).distinct()
    w = Window.partitionBy("week").orderBy("h")
    wk = (
        wk_h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("week")
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )

    m_scale = float(1 << 60)

    def est_of(kmv_col):
        return F.when(
            F.size(kmv_col) < k, F.size(kmv_col).cast("double")
        ).otherwise(
            F.lit(float(k - 1))
            * F.lit(m_scale)
            / F.element_at(kmv_col, k).cast("double")
        )

    prev = F.lag("kmv").over(Window.orderBy("week"))
    comb = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("kmv"), F.col("_prev")))),
        1,
        k,
    )
    both = F.size(
        F.array_intersect(
            F.col("_comb"), F.array_intersect(F.col("kmv"), F.col("_prev"))
        )
    )
    jac = F.col("_both") / F.size("_comb")
    return (
        wk.withColumn("_prev", prev)
        .withColumn(
            "_comb", F.when(F.col("_prev").isNotNull(), comb)
        )
        .withColumn(
            "_both", F.when(F.col("_prev").isNotNull(), both)
        )
        .select(
            "week",
            F.size("kmv").alias("kmv_size"),
            F.round(est_of(F.col("kmv")), 4).alias("est_users"),
            F.round(jac, 6).alias("prev_jaccard_est"),
            F.round(jac * est_of(F.col("_comb")), 4).alias(
                "prev_common_users_est"
            ),
        )
    )
