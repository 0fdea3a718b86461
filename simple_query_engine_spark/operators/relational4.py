"""Scalar-function completion: conditional expressions, bitwise operators,
regexp counting, and value-picking window functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from simple_query_engine_spark.operators.text import _NORM
from simple_query_engine_spark.sources.catalog import table


def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREATEST / LEAST / NULLIF / IFNULL over order amounts."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.round(F.greatest(F.col("o_totalprice"), F.lit(100_000.0)), 2).alias(
            "price_floor_100k"
        ),
        F.round(F.least(F.col("o_totalprice"), F.lit(100_000.0)), 2).alias(
            "price_cap_100k"
        ),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_unless_open"),
        F.ifnull(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
    )


def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift over integer keys (hash-partitioning and
    bucket math building blocks)."""
    lineitem = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    key = F.col("l_orderkey")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        key.bitwiseAND(F.lit(255)).alias("key_and_255"),
        key.bitwiseOR(F.lit(1)).alias("key_or_1"),
        key.bitwiseXOR(F.col("l_linenumber").cast("long")).alias("key_xor_line"),
        F.shiftleft(key, 2).alias("key_shl_2"),
        F.shiftright(key, 1).alias("key_shr_1"),
    )


def q_regexp_count_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE filtering + per-row regexp match counting."""
    documents = table(spark, sf_dir, "documents")
    return documents.filter(F.col("text").rlike("join")).select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("join")).alias("join_mentions"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]{2}")).alias("vowel_pairs"),
    )


def q_window_value_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over full-partition frames."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column operations: per-document word-count map built with
    ``map_from_entries`` over grouped counts, then ``element_at`` lookup and
    ``map_keys`` cardinality.  The map stays an intermediate (engines render
    map values differently); the projected lookups are engine-portable.
    The DuckDB oracle computes the same answers WITHOUT a map type — a
    deliberately different formulation."""
    from simple_query_engine_spark.operators.text import _normalized

    documents = table(spark, sf_dir, "documents")
    words = documents.select(
        "doc_id",
        F.explode(F.split(_normalized(F.col("text")), " ")).alias("word"),
    )
    counts = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    wc_map = counts.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("word", "cnt"))).alias("wc")
    )
    return wc_map.select(
        "doc_id",
        F.coalesce(F.element_at(F.col("wc"), "the"), F.lit(0)).alias("the_count"),
        F.size(F.map_keys(F.col("wc"))).alias("distinct_words"),
    )


def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT round-trip (Spark 4 type).

    Builds a nested JSON envelope from events columns (embedding the raw
    ``props`` JSON as a sub-document), parses it to a VARIANT with
    ``parse_json``, then pulls typed values back out with ``variant_get``
    path extraction — including a predicate on an extracted field.  The
    oracle aggregates the ORIGINAL columns directly, so a green row
    proves construct → parse → extract is lossless.  VARIANT is the
    100 TB answer to ragged semi-structured columns: one binary-encoded
    column, no schema evolution on ingest, per-path extraction at query
    time instead of a brittle wide schema.
    """
    events = table(spark, sf_dir, "events")
    enveloped = events.select(
        F.concat(
            F.lit('{"evt": {"type": "'),
            F.col("event_type"),
            F.lit('", "uid": '),
            F.col("user_id").cast("string"),
            F.lit('}, "payload": '),
            F.col("props"),
            F.lit("}"),
        ).alias("doc")
    )
    extracted = enveloped.select(F.parse_json("doc").alias("v")).select(
        F.variant_get("v", "$.evt.type", "string").alias("etype"),
        F.variant_get("v", "$.evt.uid", "long").alias("uid"),
        F.variant_get("v", "$.payload.k", "long").alias("k"),
    )
    return (
        extracted.filter(F.col("k") > 50)
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("uid").alias("n_users"),
            F.sum("k").alias("k_sum"),
        )
    )


def q_agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE / MEDIAN / exact interpolated percentile per order priority.

    Exact percentiles are a full-sort-per-group cost the approx/sketch
    variants (relational2) avoid at 100 TB; this is the exact-answer tier
    for grouped cardinalities that fit (here: 5 priority groups).
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        # deterministic=True pins mode ties to the LOWEST value — without
        # it Spark's tie pick is arbitrary and DuckDB's is scan-order, so
        # a group whose top two statuses tie would flip engines randomly
        # (the oracle mirrors with MIN over the argmax-count set).
        F.mode("o_orderstatus", deterministic=True).alias("status_mode"),
        F.round(F.median("o_totalprice"), 2).alias("price_median"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("price_p90"),
    )


def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED (lower) median per group: the smallest price whose
    cumulative quantity weight reaches half the group's total — "the
    price at which half the UNITS trade", the inventory/market-structure
    statistic the unweighted median (one vote per line item) misstates
    whenever quantity and price correlate.  ``agg_mode_median`` is the
    per-row exact tier; this is its per-unit twin.

    Exactness: prices enter as integer cents, weights as integral
    quantities (BIGINT) — the half test is ``2·cum >= total`` in pure
    integer arithmetic, no division at all; equal prices merge BEFORE
    the cumulative scan so the pick is total-ordered.

    Shape at 100 TB: the (group, cents) pre-aggregation collapses
    map-side (bounded by the price domain per group); the cumulative
    window and the pick run over that reduced table, partitioned by
    group — never a full-sort of line items.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    base = (
        lineitem.select(
            "l_returnflag",
            "l_linestatus",
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
            # floor() explicitly: a bare cast-to-long TRUNCATES in Spark
            # but CAST(x AS BIGINT) ROUNDS in DuckDB — identical only
            # while l_quantity stays integral; pin the same op both sides.
            F.floor(F.col("l_quantity")).cast("long").alias("w"),
        )
        .groupBy("l_returnflag", "l_linestatus", "cents")
        .agg(F.sum("w").alias("w"))
    )
    grp = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = base.select(
        "l_returnflag",
        "l_linestatus",
        "cents",
        F.sum("w")
        .over(grp.orderBy("cents").rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("w").over(grp).alias("total_w"),
    )
    picked = cum.filter(2 * F.col("cum") >= F.col("total_w")).withColumn(
        "rn",
        F.row_number().over(grp.orderBy("cents")),
    )
    return picked.filter(F.col("rn") == 1).select(
        "l_returnflag",
        "l_linestatus",
        F.col("cents").alias("weighted_median_cents"),
        F.col("total_w").alias("total_units"),
    )


_WEIGHTED_MEDIAN_SQL = """
    WITH base AS (
        SELECT l_returnflag, l_linestatus,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2, 3
    ), cum AS (
        SELECT l_returnflag, l_linestatus, cents,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
                                 ORDER BY cents ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus)
                    AS BIGINT) AS total_w
        FROM base
    )
    SELECT l_returnflag, l_linestatus,
           cents AS weighted_median_cents, total_w AS total_units
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                     ORDER BY cents) AS rn
        FROM cum WHERE 2 * cum >= total_w
    ) WHERE rn = 1
"""


# Equi-width histogram spec (declared fixed bounds: TPC-H order totals
# land in [~850, ~560k]; out-of-range values clamp to the edge buckets).
HIST_LO = 0
HIST_HI = 600_000
HIST_BINS = 20


def q_agg_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width HISTOGRAM of order totals — the distribution profile
    behind every numeric-column data-card (and the fixed-memory
    alternative to collecting raw values: |bins| rows whatever the
    table).  Buckets are declared fixed-width (lo/hi/bins constants, not
    data-dependent min/max — a second scan and a moving target at
    ingest); edge values clamp.  Bucket mass, share in exact ppm, and
    in-bucket min/max (the "effective" bucket range) per row.

    Shape: one map-side-combined aggregate to ≤ {HIST_BINS} rows; the
    share windows over those rows only."""
    orders = table(spark, sf_dir, "orders")
    width = (HIST_HI - HIST_LO) // HIST_BINS
    # ONE cents derivation: bucket is computed FROM the projected cents
    # column, so an edit to the rounding can never desynchronize bucket
    # assignment from the emitted min/max_cents within the same query.
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    projected = orders.select(cents.alias("cents"))
    bucket = F.least(
        F.greatest(F.expr(f"cents div {width * 100}"), F.lit(0)),
        F.lit(HIST_BINS - 1),
    )
    hist = (
        projected.select(bucket.alias("bucket"), "cents")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return hist.select(
        "bucket",
        (F.col("bucket") * width).alias("bucket_lo"),
        ((F.col("bucket") + 1) * width).alias("bucket_hi"),
        "n_orders",
        "min_cents",
        "max_cents",
        F.expr(
            f"n_orders * 1000000 div sum(n_orders) over ()"
        ).alias("share_ppm"),
    )


_HISTOGRAM_SQL = f"""
    WITH h AS (
        SELECT LEAST(GREATEST(CAST(round(o_totalprice * 100) AS BIGINT)
                              // {(HIST_HI - HIST_LO) // HIST_BINS * 100}, 0),
                     {HIST_BINS - 1}) AS bucket,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), g AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(cents) AS BIGINT) AS min_cents,
               CAST(MAX(cents) AS BIGINT) AS max_cents
        FROM h GROUP BY bucket
    )
    SELECT bucket, bucket * {(HIST_HI - HIST_LO) // HIST_BINS} AS bucket_lo,
           (bucket + 1) * {(HIST_HI - HIST_LO) // HIST_BINS} AS bucket_hi,
           n_orders, min_cents, max_cents,
           n_orders * 1000000 // CAST(SUM(n_orders) OVER () AS BIGINT)
               AS share_ppm
    FROM g
"""


_UNPIVOT_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape (``unpivot``/``melt``) then per-metric profile.

    Unpivot is a narrow map-side explode (rows × metrics, no shuffle);
    the only shuffle is the 4-group aggregate after it.  The oracle uses
    a deliberately different formulation (UNION ALL of per-column
    aggregates) so the reshape itself is what's being checked.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    long = lineitem.unpivot(
        ids=["l_orderkey"],
        values=_UNPIVOT_METRICS,
        variableColumnName="metric",
        valueColumnName="amount",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.round(F.sum("amount"), 2).alias("amount_sum"),
        F.round(F.avg("amount"), 6).alias("amount_avg"),
    )


def q_join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's two most expensive
    orders.  Catalyst decorrelates this into a ranked window join — the
    declarative per-group top-k (same physical shape as
    window_topn_per_group, arrived at from SQL instead of the DataFrame
    API).  Restricted to a key slice so the checked result stays small.
    """
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_custkey <= 100
        """
    )


def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Apache DataSketches HLL: per-priority partial sketches of
    the customer key, unioned into one global estimate.

    This two-level shape is THE 100 TB distinct-count pattern: each
    partition/group builds a fixed-size sketch, sketches (not values)
    move in the shuffle, and union is associative so re-aggregation at
    any level is free.  Raw estimates are engine-specific, so — like the
    relational2 sketches — the checked output is tolerance-banded: the
    exact distinct count plus a flag that the unioned estimate landed
    within ±5% (default lgConfigK=12 ⇒ ~1.6% typical error).
    """
    orders = table(spark, sf_dir, "orders")
    partial = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    unioned = partial.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_customers"))
    return exact.crossJoin(unioned).select(
        "exact_customers",
        (
            F.abs(F.col("est").cast("double") - F.col("exact_customers").cast("double"))
            <= 0.05 * F.col("exact_customers").cast("double")
        ).alias("hll_union_within_5pct"),
    )


def q_agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped EXACT continuous percentiles (the deterministic complement
    of agg_quantile_sketch's Greenwald-Khanna approximation): per return
    flag, the interpolated p25/p50/p75 of extended price.

    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    standard definition (index = p·(n−1), linear interpolation between
    neighbors).  Exact percentiles need the full group sorted — the right
    tool at dashboard cardinalities; at 100 TB per-key streams the sketch
    variant is the scale path, which is why both are in the catalog.

    Rounding: 4 decimals, NOT 2 — quartile interpolation of 2-decimal
    prices produces values with up to 4 decimals (quarters of a cent),
    which sit exactly ON the 2-dp rounding boundary, so a last-ulp
    difference in the engines' interpolation arithmetic would flip a
    2-dp round (observed: 52724.245 → .24 vs .25).  Every such value is
    ≥ 5e-5 from the nearest 4-dp boundary, so 4-dp rounding is ulp-safe.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.expr("percentile(l_extendedprice, 0.25D)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5D)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75D)"), 4).alias("p75"),
    )


# Columns profiled by stats_column_profile: one of each storage kind whose
# to-string rendering is byte-identical across engines (bigint, int,
# double-with-small-magnitude, varchar, timestamp).
_PROFILE_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_quantity",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
]


def q_stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style column profiling: per column, row count, null
    count, EXACT distinct count, and min/max (rendered as strings so one
    result schema covers every column type) — the statistics a cost-based
    optimizer or a data-quality monitor collects per table.

    Shape at 100 TB: ONE scan — the multi-column COUNT(DISTINCT) compiles
    to a single Expand-based aggregate (rows multiply by |columns| inside
    the stage, map-side partial aggregation collapses them before the
    shuffle), and min/max/count are plain partial aggregates riding the
    same pass; the stack() unpivot reshapes the single wide row at the
    end.  Exact NDV is the audit path — the cheap production path is
    approx_count_distinct (``agg_approx_distinct``); both belong in the
    catalog for the same reason exact and sketch percentiles both do.

    Latency note: ~3 s of the local wall time is DRIVER-side planning
    (the multi-distinct rewrite + codegen of the 25-aggregate plan) —
    measured constant and data-size-independent (re-collecting the same
    DataFrame runs in 0.1 s at sf0.1); at 100 TB it is noise against
    the scan.
    """
    # CONDITIONAL repartition before the Expand-based aggregate: the local
    # single-split file would otherwise pin the ×|columns| row expansion
    # and the distinct hashing to ONE task (measured 8.3 s → ~3 s at
    # sf0.1 on 32 cores).  Unlike text._documents (whose downstream work
    # keeps per-row outputs), this plan's very next operator is a partial
    # aggregate that collapses rows map-side, so an UNCONDITIONAL
    # repartition would add a full-width corpus exchange LARGER than the
    # aggregate's own shuffle at scale — the repartition fires only when
    # the scan actually under-splits (a local-file artifact; a 100 TB
    # input arrives with thousands of splits and skips it).
    lineitem = table(spark, sf_dir, "lineitem").select(*_PROFILE_COLS)
    parallelism = spark.sparkContext.defaultParallelism
    if lineitem.rdd.getNumPartitions() < parallelism // 2:
        lineitem = lineitem.repartition(parallelism)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = lineitem.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_notnull, n_distinct, min_val, max_val)"
        ),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_notnull")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` / standard ``IS NOT DISTINCT
    FROM``): NULL keys MATCH each other instead of silently dropping — the
    semantic a plain inner join gets wrong when a dimension key is
    legitimately absent.

    The nullable key is derived deterministically (BUILDING customers get
    NULL), the per-key stats side is aggregated from the same table, and
    the null-safe join must route every customer — including the NULL-key
    group — to its stats row; ``n_customers == stats_n`` on every output
    row (pinned in tests) is exactly the property a plain ``=`` join
    breaks.  Shape: the stats side is |segments| rows → broadcast; the
    probe side streams.  (Spark hash-partitions NULL like any other key
    under ``<=>``, so the join stays a hash join, not a cartesian
    fallback.)
    """
    customer = table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    cust = customer.select(seg.alias("seg"), "c_acctbal")
    stats = (
        cust.groupBy(F.col("seg").alias("stats_seg"))
        .agg(F.count(F.lit(1)).alias("stats_n"))
    )
    joined = cust.join(
        F.broadcast(stats), cust["seg"].eqNullSafe(stats["stats_seg"])
    )
    return joined.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.max("stats_n").alias("stats_n"),
    )


FUZZY_MAX_EDITS = 2  # classic typo distance for the modifier match


def q_join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (entity resolution) with BLOCKING — the fuzzy-join
    discipline a training-data pipeline needs for source/author/entity
    canonicalization: never compare all pairs.  Candidate pairs are
    generated ONLY inside a blocking key (the part name's head noun), so
    pair volume is Σ_b |block_b|² over DISTINCT names — and the distinct
    name vocabulary is bounded by the name generator (adjective × noun),
    independent of row count, so the match stays tiny at every SF while
    the support counts scale with the data.  Within a block, modifiers
    match when ``levenshtein ≤ {FUZZY_MAX_EDITS}`` ("cold"/"old",
    "new"/"red") — the edit-distance definition is the classic
    Levenshtein in both engines, so distances are engine-identical.

    Shape at 100 TB: dedup-to-distinct first (one map-side-combined
    aggregate — linkage runs on the entity vocabulary, not the corpus),
    equi-join on the block key (hash join, no cross product anywhere),
    per-pair edit distance only inside blocks.  A skewed block (every
    name sharing one noun) is the known failure mode; the fix is a
    second-level blocking key (first char, length band) — not needed at
    this vocabulary.
    """
    parts = table(spark, sf_dir, "part")
    names = parts.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    split = F.split(F.col("p_name"), " ")
    tokens = names.select(
        "p_name",
        "n_parts",
        F.element_at(split, 1).alias("modifier"),
        F.element_at(split, -1).alias("block"),
    )
    a, b = tokens.alias("a"), tokens.alias("b")
    dist = F.levenshtein(F.col("a.modifier"), F.col("b.modifier"))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= FUZZY_MAX_EDITS)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("edit_distance"),
            (F.col("a.n_parts") + F.col("b.n_parts")).alias("support"),
        )
    )


QUERIES = {
    "conditional_funcs": q_conditional_funcs,
    "join_fuzzy_blocked": q_join_fuzzy_blocked,
    "join_null_safe": q_join_null_safe,
    "agg_percentiles_exact": q_agg_percentiles_exact,
    "bitwise_funcs": q_bitwise_funcs,
    "regexp_count_funcs": q_regexp_count_funcs,
    "window_value_picks": q_window_value_picks,
    "map_funcs": q_map_funcs,
    "variant_funcs": q_variant_funcs,
    "agg_mode_median": q_agg_mode_median,
    "agg_weighted_median": q_agg_weighted_median,
    "agg_histogram_numeric": q_agg_histogram_numeric,
    "unpivot_metrics": q_unpivot_metrics,
    "join_lateral_topn": q_join_lateral_topn,
    "agg_hll_union": q_agg_hll_union,
    "stats_column_profile": q_stats_column_profile,
}


def _profile_oracle_sql() -> str:
    """DuckDB twin of q_stats_column_profile: one wide aggregate CTE, one
    UNION ALL branch per profiled column."""
    wide = ["COUNT(*) AS n_rows"]
    for c in _PROFILE_COLS:
        wide += [
            f"COUNT({c}) AS {c}__nn",
            f"COUNT(DISTINCT {c}) AS {c}__nd",
            f"CAST(MIN({c}) AS VARCHAR) AS {c}__min",
            f"CAST(MAX({c}) AS VARCHAR) AS {c}__max",
        ]
    branches = "\n        UNION ALL ".join(
        f"SELECT '{c}' AS column_name, n_rows, n_rows - {c}__nn AS n_nulls, "
        f"{c}__nd AS n_distinct, {c}__min AS min_val, {c}__max AS max_val FROM a"
        for c in _PROFILE_COLS
    )
    return f"""
        WITH a AS (SELECT {", ".join(wide)} FROM lineitem)
        {branches}
    """


ORACLES = {
    "stats_column_profile": _profile_oracle_sql(),
    # Same blocked linkage: distinct names, head-noun block, Levenshtein
    # on the modifier — classic edit distance in both engines.
    "join_fuzzy_blocked": f"""
        WITH names AS (
            SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
        ), t AS (
            SELECT p_name, n_parts,
                   split_part(p_name, ' ', 1) AS modifier,
                   split_part(p_name, ' ', -1) AS block
            FROM names
        )
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.modifier, b.modifier) AS INT)
                   AS edit_distance,
               CAST(a.n_parts + b.n_parts AS BIGINT) AS support
        FROM t a JOIN t b ON a.block = b.block AND a.p_name < b.p_name
        WHERE levenshtein(a.modifier, b.modifier) <= {FUZZY_MAX_EDITS}
    """,
    "join_null_safe": """
        WITH cust AS (
            SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
            FROM customer
        ), stats AS (
            SELECT seg AS stats_seg, COUNT(*) AS stats_n
            FROM cust GROUP BY 1
        )
        SELECT c.seg,
               COUNT(*) AS n_customers,
               MAX(s.stats_n) AS stats_n
        FROM cust c JOIN stats s ON c.seg IS NOT DISTINCT FROM s.stats_seg
        GROUP BY c.seg
    """,
    "agg_percentiles_exact": """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    "conditional_funcs": """
        SELECT o_orderkey,
               ROUND(greatest(o_totalprice, 100000.0), 2) AS price_floor_100k,
               ROUND(least(o_totalprice, 100000.0), 2) AS price_cap_100k,
               nullif(o_orderstatus, 'O') AS status_unless_open,
               ifnull(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
        FROM orders
    """,
    "bitwise_funcs": """
        SELECT l_orderkey, l_linenumber,
               l_orderkey & 255 AS key_and_255,
               l_orderkey | 1 AS key_or_1,
               xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor_line,
               l_orderkey << 2 AS key_shl_2,
               l_orderkey >> 1 AS key_shr_1
        FROM lineitem WHERE l_orderkey <= 200
    """,
    "regexp_count_funcs": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, 'join')) AS INT) AS join_mentions,
               CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS INT) AS vowel_pairs
        FROM documents WHERE regexp_matches(text, 'join')
    """,
    "window_value_picks": """
        SELECT o_custkey, o_orderkey,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey) OVER w AS last_order,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "map_funcs": f"""
        WITH words AS (
            SELECT doc_id,
                   unnest(string_split({_NORM}, ' ')) AS word
            FROM documents
        )
        SELECT doc_id,
               CAST(COALESCE(SUM(CASE WHEN word = 'the' THEN 1 END), 0) AS BIGINT) AS the_count,
               CAST(COUNT(DISTINCT word) AS INT) AS distinct_words
        FROM words GROUP BY doc_id
    """,
    # Deliberately formulated over the ORIGINAL columns (no JSON at all):
    # the Spark side must reconstruct exactly these values through its
    # envelope → VARIANT → variant_get round-trip.
    "variant_funcs": """
        SELECT event_type AS etype,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum
        FROM events
        WHERE CAST(props->>'$.k' AS BIGINT) > 50
        GROUP BY 1
    """,
    "agg_weighted_median": _WEIGHTED_MEDIAN_SQL,
    "agg_histogram_numeric": _HISTOGRAM_SQL,
    "agg_mode_median": """
        WITH counts AS (
            SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
            FROM orders GROUP BY 1, 2
        ), modes AS (
            -- lowest value among the max-count statuses: the same
            -- tie-break Spark's mode(col, deterministic=true) applies
            SELECT o_orderpriority, MIN(o_orderstatus) AS status_mode
            FROM (
                SELECT o_orderpriority, o_orderstatus, c,
                       MAX(c) OVER (PARTITION BY o_orderpriority) AS mc
                FROM counts
            )
            WHERE c = mc
            GROUP BY 1
        )
        SELECT o.o_orderpriority,
               m.status_mode,
               ROUND(median(o.o_totalprice), 2) AS price_median,
               ROUND(quantile_cont(o.o_totalprice, 0.9), 2) AS price_p90
        FROM orders o JOIN modes m USING (o_orderpriority)
        GROUP BY o.o_orderpriority, m.status_mode
    """,
    # Deliberately NOT an UNPIVOT: per-column aggregates unioned, so the
    # Spark-side reshape is what the comparison exercises.
    "unpivot_metrics": """
        SELECT 'l_quantity' AS metric, COUNT(*) AS n_values,
               ROUND(SUM(l_quantity), 2) AS amount_sum,
               ROUND(AVG(l_quantity), 6) AS amount_avg FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*),
               ROUND(SUM(l_extendedprice), 2), ROUND(AVG(l_extendedprice), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*),
               ROUND(SUM(l_discount), 2), ROUND(AVG(l_discount), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', COUNT(*),
               ROUND(SUM(l_tax), 2), ROUND(AVG(l_tax), 6)
        FROM lineitem
    """,
    "join_lateral_topn": """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t ON TRUE
        WHERE c.c_custkey <= 100
    """,
    # The estimate itself is engine-specific (DataSketches HLL); the
    # oracle checks the exact count and asserts the tolerance flag.
    "agg_hll_union": """
        SELECT COUNT(DISTINCT o_custkey) AS exact_customers,
               TRUE AS hll_union_within_5pct
        FROM orders
    """,
}
