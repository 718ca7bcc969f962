package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Second tranche of the delegated relational surface (SURVEY.md §2.2):
  * grouping sets beyond rollup, UNION ALL, HAVING, scalar subqueries,
  * multi-way joins, math/string scalar functions, null handling, and the
  * batch twin of the streaming hourly aggregation (shared body with
  * graft.streaming.EventStream — batch/stream parity by construction).
  */
object MoreQueries {

  /** CUBE grouping sets over order status x priority. */
  def qCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** UNION ALL (bag semantics, vs the distinct set ops in CoreQueries). */
  def qUnionAll(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(lit("customer").as("src"), col("c_custkey").as("key"))
    val o = orders(s, d).filter(col("o_orderkey") < 1000)
      .select(lit("order").as("src"), col("o_orderkey").as("key"))
    c.unionAll(o).groupBy(col("src")).agg(count(lit(1)).as("n"), sum(col("key")).as("key_sum"))
  }

  /** GROUP BY ... HAVING. */
  def qHaving(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 20)

  /** Uncorrelated scalar subquery (exact aggregate, so cross-engine safe),
    * expressed as a plan-level broadcast of the 1-row aggregate — one job,
    * no driver round-trip between the subquery and the outer filter. */
  def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val maxSupp = supplier(s, d).agg(max(col("s_acctbal")).as("max_supp"))
    customer(s, d)
      .crossJoin(broadcast(maxSupp))
      .filter(col("c_acctbal") > col("max_supp"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
  }

  /** Four-way broadcast-chained join: region -> nation -> supplier -> counts. */
  def qJoinFourWay(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("bal"))

  /** Math scalar functions (only exactly-defined ones: no cross-engine
    * rounding-mode roulette). */
  def qMathFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        abs(col("p_retailprice") * -1).as("abs_price"),
        floor(col("p_retailprice")).as("floor_price"),
        ceil(col("p_retailprice")).as("ceil_price"),
        sqrt(col("p_size").cast(DoubleType)).as("sqrt_size"),
        (col("p_partkey") % 7).as("key_mod7"),
        pow(lit(2.0), col("p_size") % 10).as("pow2"))

  /** More string functions: trim/pad/replace/reverse/position. */
  def qStringFuncs2(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        reverse(col("p_brand")).as("brand_rev"),
        instr(col("p_type"), "a").as("a_pos"))

  /** NULL handling: nullif/coalesce/null-safe grouping. */
  def qNullHandling(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"))
      .groupBy(col("status_x"))
      .agg(count(lit(1)).as("n"))

  /** The watermarked hourly window aggregation run as a REAL file-stream
    * query (upgraded in round 13 from the batch-body stand-in): staged
    * event-time slices drain one micro-batch each, windows finalize in
    * append mode as the sentinel-advanced watermark passes them, and the
    * result equals the batch body exactly — the DuckDB oracle is
    * unchanged, so the gate now checks REAL stream/batch parity. */
  def qStreamHourlyParity(s: SparkSession, d: String): DataFrame = {
    val work = graft.ops.Scratch.dir("graft_stream_hourly")
    graft.streaming.EventStream.runHourlyFileStream(s, events(s, d), work)
      .select(date_format(col("window_start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Batch twin of the streaming exact-dedup stage
    * (graft.streaming.EventStream.dedupEvents): an at-least-once delivery
    * feed — every 97th event re-delivered, the duplicate injection both
    * engines replay identically — collapsed back to exactly-once by keying
    * on event_id. The streaming face bounds its state with
    * dropDuplicatesWithinWatermark (ids age out past the lateness bound);
    * the batch face is the same logical dedup as one hash aggregate. Output
    * audits both sides of the collapse: delivered vs unique counts per
    * event type (EventStreamSpec proves the stream/batch row parity). */
  def qStreamDedupParity(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val feed = ev.unionAll(ev.filter(col("event_id") % 97 === 0))
    val feedCounts = feed.groupBy(col("event_type")).agg(count(lit(1)).as("n_feed"))
    // The exactly-once collapse runs as a REAL file-stream query (round 13
    // upgrade from the batch-body stand-in): the duplicated feed is staged
    // into micro-batches and dropDuplicatesWithinWatermark survives only
    // each event_id's first arrival — equal to the batch dropDuplicates on
    // the same feed, so the oracle is unchanged and the gate now checks
    // REAL stream/batch parity.
    val work = graft.ops.Scratch.dir("graft_stream_dedup_p")
    val uniq = graft.streaming.EventStream.runDedupFileStream(s, feed, work)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("total_value"))
    feedCounts.join(uniq, "event_type")
  }

  /** Batch sessionization via window functions — the same 30-minute-gap
    * semantics as graft.streaming.EventStream.sessionize, expressed as a
    * lag/cumulative-sum window query (the classic batch formulation). Gap
    * math on exact epoch-millis longs; ordering on (ms, event_id) so both
    * engines sort identically regardless of sub-ms timestamp precision. */
  def qSessionizeBatch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tms = unix_millis(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(tms, col("event_id"))
    val gap = tms - lag(tms, 1).over(w)
    val cum = Window.partitionBy(col("user_id")).orderBy(tms, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("tms", tms)
      .withColumn("new_s", when(gap.isNull || gap > 30 * 60 * 1000L, 1).otherwise(0))
      .withColumn("sess_idx", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tms")) - min(col("tms"))).as("duration_ms"))
  }

  /** The REAL streaming face of sessionization — the flatMapGroupsWithState
    * operator run as an actual Structured Streaming query (file source, one
    * micro-batch per contiguous event-time slice, event-time timeouts flushed
    * by a sentinel watermark advance), not the batch twin above. Sessions
    * come back as (user, first_ms, last_ms, n_events); `sess_idx` is
    * reconstructed as the per-user rank of the session's start, which is
    * exactly the batch formulation's cumulative-sum numbering — so the
    * DuckDB oracle is the SAME SQL as `q_sessionize_batch`: the oracle
    * checks stream/batch parity, not just the rows. Ordering note: two
    * sessions of one user can never share a start (they are separated by
    * >30 min by construction), so the rank is total. */
  def qStreamSessionizeParity(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val work = graft.ops.Scratch.dir("graft_stream_sessionize")
    val sessions = graft.streaming.EventStream.runSessionizeFileStream(s, events(s, d), work)
    val w = Window.partitionBy(col("user_id")).orderBy(col("first_ms"))
    sessions.select(
      col("user_id"),
      row_number().over(w).cast("long").as("sess_idx"),
      col("n_events"),
      (col("last_ms") - col("first_ms")).as("duration_ms"))
  }

  /** Pivot (wide aggregation): returnflag counts as columns per linestatus.
    * Explicit value list keeps the output schema static — at scale an
    * unconstrained pivot needs a distinct-values job first. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(count(lit(1)))

  /** Custom typed Aggregator (UDAF surface): one-pass per-group range stats,
    * exact so the oracle verifies the whole partial/merge/finish cycle. */
  def qCustomUdaf(s: SparkSession, d: String): DataFrame = {
    val rangeStats = udaf(graft.functions.RangeStatsAggregator)
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(rangeStats(col("o_totalprice")).as("rs"))
      .select(col("o_orderstatus"),
        col("rs.mn").as("min_price"), col("rs.mx").as("max_price"), col("rs.n").as("n_orders"))
  }

  /** Set ops: INTERSECT distinct (EXCEPT/UNION live in CoreQueries). */
  def qSetIntersect(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").cast("int").as("nk")).distinct()
      .intersect(supplier(s, d).select(col("s_nationkey").cast("int").as("nk")).distinct())

  /** Banded range join — the scalable shape for interval predicates: bucket
    * both sides by a coarse band (here: the minute), join each row to its
    * own and neighboring bands only, then apply the exact range filter. A
    * naive theta-join is O(n^2); banding reduces candidates to
    * O(n * rows-per-band) with one equi-shuffle on the band key — the
    * "compose built-ins" answer to range joins before reaching for a custom
    * SparkStrategy. Here: pairs of events from different users within 30s
    * of each other, counted per event_type pair. */
  def qRangeJoinBanded(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).filter(col("event_id") < 2000)
      .select(col("event_id"), col("user_id"), col("event_type"), unix_millis(col("ts")).as("tms"))
    val banded = e.withColumn("band", explode(array(
      (col("tms") / 60000L).cast("long") - 1,
      (col("tms") / 60000L).cast("long"))))
    // left side joins at its own band; right side contributed itself to its
    // band and band+1 via the explode, so every pair within 60s of each
    // other shares a band exactly once for tms_a <= tms_b ordering
    val a = e.as("a")
    val b = banded.as("b")
    // time-ordered pairs (a before b), event_id as the equal-timestamp
    // tiebreak, so each unordered pair is counted exactly once
    a.join(b,
        ((col("a.tms") / 60000L).cast("long") === col("b.band")) &&
          (col("b.tms") > col("a.tms") ||
            (col("b.tms") === col("a.tms") && col("a.event_id") < col("b.event_id"))) &&
          (col("b.tms") - col("a.tms") <= 30000L) &&
          (col("a.user_id") =!= col("b.user_id")))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** JSON scalar functions: extract a field from the events props payload
    * and aggregate over it. */
  def qJsonFuncs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))

  /** Array functions: per-order sorted line-number list, emitted as a string
    * (collect_list alone is partition-order-nondeterministic; sort_array
    * makes it canonical — the same discipline DuckDB needs with list_sort). */
  def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 500)
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",", sort_array(collect_list(col("l_linenumber")))).as("lns"),
        size(collect_list(col("l_linenumber"))).as("n_lines"))

  /** Ordered funnel (view → click → purchase), the classic event-analytics
    * operator: per user, the first view, the first click strictly AFTER
    * that view, the first purchase strictly after that click; reported as
    * users surviving each step. All three stage timestamps are windowed
    * minima over the SAME user partitioning — one shuffle; the per-user
    * rollup then rides that partitioning (no second exchange) and the
    * final count is three non-null tallies stacked into rows. Strict `>`
    * comparisons are engine-portable because every event timestamp is
    * microsecond-aligned (nanos % 1000 == 0 — verified on the fixtures),
    * so Spark's micros and the oracle's nanos order identically. */
  def qFunnelSteps(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val staged = events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts") > col("t1"),
        col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
        col("ts"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"), max(col("t3")).as("t3"))
      .agg(count(col("t1")).as("s1"), count(col("t2")).as("s2"), count(col("t3")).as("s3"))
      .selectExpr("stack(3, 1, 'view', s1, 2, 'click', s2, 3, 'purchase', s3)" +
        " as (step, event_type, n_users)")
  }

  /** Day-N retention by first-seen cohort: users bucketed by their first
    * active day, counted once per (cohort, day-offset ≤ 7). The cohort
    * day is a windowed minimum over the user partitioning (one shuffle —
    * no join back against a per-user aggregate); the distinct+count pair
    * is two hash aggregates with map-side partials. */
  def qRetentionCohort(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort_day", min(col("day")).over(w))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      .select(col("cohort_day"), col("day_offset"), col("user_id")).distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event transition matrix (first-order Markov counts): for each user's
    * time-ordered stream, count `event_type → next event_type` pairs —
    * the behavioral-analytics primitive behind path analysis. One `lead`
    * window over the user partitioning (a single shuffle); the aggregate
    * is at most |event types|² rows. Timestamp order is total per user
    * (microsecond-distinct event ids break no ties on the fixtures, but
    * the window orders by (ts, event_id) anyway so the plan is
    * deterministic under ANY data). */
  def qEventTransitions(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Last-touch attribution: each purchase credited to the user's most
    * recent PRIOR view or click ('none' if the purchase leads the
    * stream). The running last-marketing-touch is one ignore-nulls
    * `last` over a frame ending at the previous row — a single user
    * shuffle, no self-join against the purchase set (the naive
    * formulation joins every purchase back against its history; the
    * frame-bounded window is the co-partitioned, scan-once plan). */
  def qAttributionLastTouch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("touch", last(
        when(col("event_type").isin("view", "click"), col("event_type")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  /** The REAL streaming face of the funnel: [[qFunnelSteps]]'s ordered
    * matcher run as an actual flatMapGroupsWithState query over the staged
    * file stream (graft.streaming.EventStream.runFunnelFileStream), each
    * user's stage timestamps flushed exactly once by a fixed end-of-stream
    * event-time timeout. The per-user outputs collapse to the same
    * (step, event_type, n_users) rows, and the DuckDB oracle is the SAME
    * SQL as the batch entry — the oracle checks stream/batch parity. */
  def qStreamFunnelParity(s: SparkSession, d: String): DataFrame = {
    val work = graft.ops.Scratch.dir("graft_stream_funnel")
    val stages = graft.streaming.EventStream.runFunnelFileStream(s, events(s, d), work)
    stages.agg(
      count(when(col("t1") >= 0, 1)).as("s1"),
      count(when(col("t2") >= 0, 1)).as("s2"),
      count(when(col("t3") >= 0, 1)).as("s3"))
      .selectExpr("stack(3, 1, 'view', s1, 2, 'click', s2, 3, 'purchase', s3)" +
        " as (step, event_type, n_users)")
  }

  /** Streaming face of the transition matrix: incremental per-event
    * emission against one stored previous-type per user
    * (graft.streaming.EventStream.transitionStream — no timeout, nothing
    * withheld), rolled up to the same (event_type, next_type, n) rows;
    * the oracle is the SAME SQL as the batch entry. */
  def qStreamTransitionsParity(s: SparkSession, d: String): DataFrame = {
    val work = graft.ops.Scratch.dir("graft_stream_trans")
    graft.streaming.EventStream.runTransitionFileStream(s, events(s, d), work)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The DEPLOYMENT transition stream — the idle-TTL variant — through the
    * same staged file stream, gated by the same batch lead-window oracle:
    * with a horizon wider than any gap the fixture holds (one year vs an
    * hours-scale event table), every pair is in-horizon, so TTL output ==
    * untimed output == the batch matrix — which is exactly the
    * "emissions unchanged inside the horizon" guarantee run through the
    * driver's hash gate rather than only the spec. The state-bounding half
    * of the contract (eviction past the horizon) is TransitionTtlSpec's,
    * where gaps are synthetic and controllable. */
  def qStreamTransitionsTtl(s: SparkSession, d: String): DataFrame = {
    val work = graft.ops.Scratch.dir("graft_stream_trans_ttl")
    graft.streaming.EventStream.runTransitionFileStream(s, events(s, d), work,
        idleTtlMs = Some(365L * 24 * 3600 * 1000))
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The stream-stream interval join run as a REAL file-stream query —
    * the last streaming-surface shape that had only a MemoryStream spec,
    * now through the driver's hash gate: both sides of
    * [[graft.streaming.EventStream.purchaseClickJoinStream]] read the
    * staged event-time slices, so click/purchase pairs genuinely cross
    * micro-batch boundaries through the symmetric join state. Inner-join
    * emission is watermark-independent and eviction can never outrun the
    * interval bound (argument in the runner's scaladoc), so the result
    * equals [[qIntervalJoin]]'s batch body exactly and the DuckDB oracle
    * is the SAME SQL — the oracle checks stream/batch parity. */
  def qStreamJoinParity(s: SparkSession, d: String): DataFrame = {
    val work = graft.ops.Scratch.dir("graft_stream_join")
    graft.streaming.EventStream.runJoinFileStream(s, events(s, d), work)
  }

  /** Stream-STATIC broadcast enrichment run as a REAL file-stream catalog
    * entry — the zero-state streaming shape (the static side is re-planned
    * and broadcast inside every micro-batch; no watermark, no state store).
    * The dimension is derived deterministically from the event-type
    * domain (weight = length/10), so the DuckDB oracle replays it inline.
    * Enrichment is a per-row map ⟹ stream rows == batch rows for any
    * slicing; both roll up to per-type aggregates with the §8.4 class-A
    * discipline (per-row double quantized to DECIMAL before the exact
    * sum, ONE terminal cast). */
  def qStreamEnrichParity(s: SparkSession, d: String): DataFrame = {
    val dim = events(s, d).select(col("event_type")).distinct()
      .withColumn("weight", length(col("event_type")).cast(DoubleType) / lit(10.0))
    val work = graft.ops.Scratch.dir("graft_stream_enrich")
    graft.streaming.EventStream.runEnrichFileStream(s, events(s, d), dim, work)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("weighted_value").cast(DecimalType(28, 12)))
          .cast(DoubleType).as("total_weighted"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_enrich_parity" -> (qStreamEnrichParity _),
    "q_stream_join_parity" -> (qStreamJoinParity _),
    "q_stream_transitions_parity" -> (qStreamTransitionsParity _),
    "q_stream_transitions_ttl" -> (qStreamTransitionsTtl _),
    "q_stream_funnel_parity" -> (qStreamFunnelParity _),
    "q_attribution_last_touch" -> (qAttributionLastTouch _),
    "q_event_transitions" -> (qEventTransitions _),
    "q_funnel_steps" -> (qFunnelSteps _),
    "q_retention_cohort" -> (qRetentionCohort _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_set_intersect" -> (qSetIntersect _),
    "q_range_join_banded" -> (qRangeJoinBanded _),
    "q_custom_udaf" -> (qCustomUdaf _),
    "q_pivot" -> (qPivot _),
    "q_sessionize_batch" -> (qSessionizeBatch _),
    "q_cube" -> (qCube _),
    "q_union_all" -> (qUnionAll _),
    "q_having" -> (qHaving _),
    "q_scalar_subquery" -> (qScalarSubquery _),
    "q_join_four_way" -> (qJoinFourWay _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_string_funcs2" -> (qStringFuncs2 _),
    "q_null_handling" -> (qNullHandling _),
    "q_stream_hourly_parity" -> (qStreamHourlyParity _),
    "q_stream_dedup_parity" -> (qStreamDedupParity _),
    "q_stream_sessionize_parity" -> (qStreamSessionizeParity _)
  )

  /** Shared by the batch sessionizer and its streaming twin: the stream's
    * output is proven (SessionizeStreamSpec) to equal this window-function
    * formulation row-for-row, so both queries check against the SAME SQL. */
  private val sessionizeOracleSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS tms,
      |         CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (
      |  SELECT user_id, tms,
      |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
      |  FROM g)
      |SELECT user_id, sess_idx, count(*) AS n_events,
      |       max(tms) - min(tms) AS duration_ms
      |FROM s GROUP BY user_id, sess_idx""".stripMargin

  private val funnelOracleSql: String =
    """WITH b AS (SELECT user_id, event_type, ts FROM events),
      |u AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t1
      |      FROM b GROUP BY user_id),
      |c AS (SELECT b.user_id, min(b.ts) AS t2 FROM b JOIN u USING (user_id)
      |      WHERE b.event_type = 'click' AND u.t1 IS NOT NULL AND b.ts > u.t1
      |      GROUP BY b.user_id),
      |p AS (SELECT b.user_id, min(b.ts) AS t3 FROM b JOIN c USING (user_id)
      |      WHERE b.event_type = 'purchase' AND b.ts > c.t2
      |      GROUP BY b.user_id)
      |SELECT CAST(step AS INTEGER) AS step, event_type, n_users FROM (
      |  SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM u WHERE t1 IS NOT NULL
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p)""".stripMargin

  private val transitionsOracleSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS next_type
      |  FROM events)
      |SELECT event_type, next_type, count(*) AS n
      |FROM o WHERE next_type IS NOT NULL
      |GROUP BY event_type, next_type""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // The stream-stream join's oracle is the batch interval join's SQL
    // verbatim (ExtraQueries.q_interval_join) — stream/batch parity is
    // what the gate checks.
    "q_stream_join_parity" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND epoch_ms(c.ts) <= epoch_ms(p.ts)
        | AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 600000""".stripMargin,
    // Stream-static enrichment parity: the dimension (weight =
    // length(event_type)/10) is replayed inline; per-row double product
    // quantized to DECIMAL before the exact sum, one terminal cast.
    "q_stream_enrich_parity" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(value * (CAST(length(event_type) AS DOUBLE) / 10.0)
        |                     AS DECIMAL(28,12))) AS DOUBLE) AS total_weighted
        |FROM events GROUP BY event_type""".stripMargin,
    "q_attribution_last_touch" ->
      """WITH o AS (
        |  SELECT event_type,
        |         last_value(CASE WHEN event_type IN ('view', 'click')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT COALESCE(touch, 'none') AS touch_type, count(*) AS n_purchases
        |FROM o WHERE event_type = 'purchase' GROUP BY touch_type""".stripMargin,
    "q_event_transitions" -> transitionsOracleSql,
    "q_stream_transitions_parity" -> transitionsOracleSql,
    "q_stream_transitions_ttl" -> transitionsOracleSql,
    // Sequenced CTE formulation (first view -> first later click -> first
    // later purchase) — deliberately different from the windowed staging
    // the Spark side plans. The streaming twin shares the SAME oracle:
    // the gate checks stream/batch parity, not just the rows.
    "q_funnel_steps" -> funnelOracleSql,
    "q_stream_funnel_parity" -> funnelOracleSql,
    "q_retention_cohort" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
        |j AS (SELECT DISTINCT f.cohort_day,
        |        CAST(date_diff('day', f.cohort_day, e.day) AS INTEGER) AS day_offset,
        |        e.user_id
        |      FROM e JOIN f USING (user_id)
        |      WHERE date_diff('day', f.cohort_day, e.day) <= 7)
        |SELECT cohort_day, day_offset, count(*) AS n_users
        |FROM j GROUP BY cohort_day, day_offset""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        |       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_min,
        |       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
        |FROM events GROUP BY event_type""".stripMargin,
    "q_array_funcs" ->
      """SELECT l_orderkey,
        |       array_to_string(list_sort(list(l_linenumber)), ',') AS lns,
        |       CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines
        |FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nk FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INTEGER) AS nk FROM supplier""".stripMargin,
    "q_range_join_banded" ->
      """SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pairs
        |FROM events a, events b
        |WHERE a.event_id < 2000 AND b.event_id < 2000
        |  AND a.user_id <> b.user_id
        |  AND (epoch_ms(b.ts) > epoch_ms(a.ts)
        |       OR (epoch_ms(b.ts) = epoch_ms(a.ts) AND a.event_id < b.event_id))
        |  AND epoch_ms(b.ts) - epoch_ms(a.ts) <= 30000
        |GROUP BY 1, 2""".stripMargin,
    "q_custom_udaf" ->
      """SELECT o_orderstatus, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_pivot" ->
      "PIVOT lineitem ON l_returnflag IN ('A', 'N', 'R') USING count(*) GROUP BY l_linestatus",
    "q_sessionize_batch" -> sessionizeOracleSql,
    // The streaming run must reproduce the batch formulation exactly
    // (parity theorem on EventStream.runSessionizeFileStream) — same oracle.
    "q_stream_sessionize_parity" -> sessionizeOracleSql,
    "q_cube" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",
    "q_union_all" ->
      """SELECT src, count(*) AS n, CAST(SUM(key) AS BIGINT) AS key_sum FROM (
        |  SELECT 'customer' AS src, c_custkey AS key FROM customer
        |  UNION ALL
        |  SELECT 'order' AS src, o_orderkey AS key FROM orders WHERE o_orderkey < 1000
        |) GROUP BY src""".stripMargin,
    "q_having" ->
      "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) >= 20",
    "q_scalar_subquery" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_acctbal > (SELECT max(s_acctbal) FROM supplier)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_join_four_way" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_math_funcs" ->
      """SELECT p_partkey,
        |       abs(p_retailprice * -1) AS abs_price,
        |       CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        |       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        |       sqrt(CAST(p_size AS DOUBLE)) AS sqrt_size,
        |       CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
        |       pow(2.0, p_size % 10) AS pow2
        |FROM part WHERE p_partkey <= 300""".stripMargin,
    "q_string_funcs2" ->
      """SELECT p_partkey,
        |       trim(p_name) AS name_trim,
        |       lpad(p_brand, 12, '*') AS brand_pad,
        |       replace(p_type, ' ', '_') AS type_us,
        |       reverse(p_brand) AS brand_rev,
        |       CAST(strpos(p_type, 'a') AS INTEGER) AS a_pos
        |FROM part WHERE p_partkey <= 300""".stripMargin,
    "q_null_handling" ->
      """SELECT coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x, count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "q_stream_hourly_parity" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // Duplicated rows are byte-identical, so DISTINCT * is the exact dedup.
    "q_stream_dedup_parity" ->
      """WITH feed AS (
        |  SELECT * FROM events
        |  UNION ALL SELECT * FROM events WHERE event_id % 97 = 0),
        |ded AS (SELECT DISTINCT * FROM feed)
        |SELECT event_type, f.n_feed, u.n_unique, u.total_value
        |FROM (SELECT event_type, count(*) AS n_feed FROM feed GROUP BY 1) f
        |JOIN (SELECT event_type, count(*) AS n_unique,
        |             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |      FROM ded GROUP BY 1) u USING (event_type)""".stripMargin
  )
}
