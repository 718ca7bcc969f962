package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** Third tranche of the delegated relational surface: correlated scalar
  * subqueries, exact percentiles via window arithmetic, regex scalar
  * functions, conditional aggregation, lag/lead window frames, a
  * self-verifying approximate-distinct audit, and the batch twin of the
  * stream-stream interval join.
  *
  * Determinism discipline matches CoreQueries: decimal-exact sums before
  * any double cast, identical division formulations in both engines,
  * unique window tiebreaks.
  */
object ExtraQueries {

  /** Correlated scalar subquery shape: customers above their own nation's
    * mean balance. Decorrelated by hand into a per-nation aggregate +
    * equi-join — exactly what Catalyst's subquery decorrelation produces,
    * and the only shape that scales (the naive per-row subquery is O(n)
    * queries). Mean = exact decimal sum cast to double THEN divided, so
    * both engines compare against bit-identical thresholds. */
  def qCorrelatedScalar(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val nationAvg = c.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType) /
        count(lit(1))).as("avg_bal"))
    c.join(broadcast(nationAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_above"))
  }

  /** Exact discrete median per group via window arithmetic (row_number +
    * count over the partition): deterministic by the unique tiebreak, no
    * engine-specific percentile semantics involved — both engines run the
    * same formulation. */
  def qMedianDisc(s: SparkSession, d: String): DataFrame =
    // Two-phase exact selection (ops/ExactSelection) — the per-group
    // single-window rank sorts each group in one task; here only the
    // median's bucket is sorted. floor((n+1)/2) over the long-typed size
    // == `(cnt + 1) div 2` (the /2 is a power-of-two double division,
    // exact for any realistic group size).
    ExactSelection.rankedCandidates(
        orders(s, d).select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey")),
        "o_orderstatus", "o_totalprice", Seq(col("o_orderkey")))(
        n => array(floor((n + lit(1)) / lit(2))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("o_orderstatus"), col("o_totalprice").as("median_price"))

  /** Regex scalar functions: extract / match-test / match-count. Patterns
    * kept to the POSIX-safe subset both regex engines (Java / RE2-style)
    * treat identically. */
  def qRegexFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        col("p_type").rlike("[A-Z]{2,}").as("has_caps_run"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("n_vowels"))

  /** Conditional aggregation (FILTER / CASE-inside-agg). */
  def qConditionalAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        sum(when(col("l_quantity") > 25, col("l_quantity")).otherwise(lit(0))
          .cast(DecimalType(18, 2))).cast(DoubleType).as("qty_big"),
        max(when(col("l_linenumber") === 1, col("l_extendedprice"))).as("max_first_price"))

  /** Lag/lead window functions with a date-gap derivation. */
  def qLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") <= 100)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)))
      .select(col("o_custkey"), col("o_orderkey"),
        col("prev_price"), col("next_price"), col("gap_days"))
  }

  /** Approximate-distinct (HLL++) audited against the exact count: the
    * oracle pins the exact value and `approx_ok = true`; if Spark's sketch
    * ever drifts past the 5% bound the query emits false and the hash
    * check fails. This is how non-replicable sketches stay inside an exact
    * verification harness. */
  def qApproxDistinctAudit(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .agg(
        countDistinct(col("l_orderkey")).as("exact_keys"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_keys"))
      .select(
        col("exact_keys"),
        (abs(col("approx_keys") - col("exact_keys")).cast(DoubleType) /
          col("exact_keys") <= 0.05).as("approx_ok"))

  /** approx_percentile (t-digest-style sketch) audited against the exact
    * discrete median: the oracle pins the exact value and `approx_ok =
    * true`; sketch drift past the bound flips the boolean and fails the
    * hash check — the same harness pattern as q_approx_distinct_audit. */
  def qApproxPercentileAudit(s: SparkSession, d: String): DataFrame = {
    val exact = qMedianDisc(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(max(col("median_price")).as("exact_median"))
    val approx = orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("apx"))
    exact.join(approx, "o_orderstatus")
      .select(col("o_orderstatus"), col("exact_median"),
        (abs(col("apx") - col("exact_median")) / col("exact_median") <= 0.05).as("approx_ok"))
  }

  /** Built-in session_window sessionization — the "let Catalyst do it"
    * counterpart to the hand-rolled flatMapGroupsWithState operator and
    * the lag/cumsum batch formulation (q_sessionize_batch): same 30-minute
    * gap semantics, one groupBy. Output: per-user session count and total
    * evented time, verified against the window-function formulation. */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("duration_ms")).as("total_duration_ms"))

  /** Batch twin of the stream-stream interval join (purchases to the same
    * user's clicks in the preceding 10 minutes) — the identical join body
    * runs under two watermarked readStreams in graft.streaming. */
  def qIntervalJoin(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStream.purchaseClickJoinBatch(events(s, d))

  /** AS-OF join — each purchase matched to the same user's LATEST view at
    * or before it. Spark has no asof operator; the scalable composition is
    * union-both-sides + one window pass: tag rows, sort within user by
    * (ts, side, event_id) — views sort before purchases at equal ts so
    * `<=` semantics hold, latest view id wins ties — and carry the last
    * non-null view id forward. ONE shuffle on user_id, no banding, no
    * theta-join, state O(1) per row: this beats both the O(n^2) theta join
    * and a custom physical operator (nothing here the built-ins can't
    * express, per the escalation ladder). DuckDB's native ASOF JOIN agrees
    * modulo its unspecified equal-ts tiebreak, so the oracle uses the same
    * deterministic window formulation. */
  def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), lit(0).as("side"),
        col("event_id"), col("event_id").as("view_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("ms"), lit(1).as("side"),
        col("event_id"), lit(null).cast(LongType).as("view_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionAll(purchases)
      .withColumn("matched_view", last(col("view_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id").as("purchase_id"), col("matched_view"))
  }

  /** Per-group top-2 via the bounded-heap [[graft.functions.TopKAggregator]]
    * — identical rows to q_window_topn (same oracle SQL), but the plan
    * shuffles only k rows per group per partition instead of sorting every
    * row of every group. The scale answer to per-group top-n. */
  def qTopnAgg(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(2))
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
      .select(col("o_custkey"), posexplode(col("tk")))
      .select(col("o_custkey"), col("col.id").as("o_orderkey"),
        (col("pos") + 1).cast(IntegerType).as("rn"))
  }

  /** Map-type scalar functions: per-order line->quantity map built from
    * entries, then size/lookup. The ORACLE verifies the extracted VALUES
    * (map semantics), not the container encoding — DuckDB's MAP parquet
    * representation differs from Spark's, so the query emits flat columns. */
  def qMapFuncs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_orderkey") <= 300)
      // line numbers repeat in this data: aggregate per key first (map
      // keys must be unique), summing quantities decimal-exactly
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("qty"))
      .groupBy(col("l_orderkey"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("l_linenumber"), col("qty"))))).as("m"))
      .select(
        col("l_orderkey"),
        size(col("m")).as("n_lines"),
        element_at(col("m"), 1).as("qty_line1"),
        array_contains(map_keys(col("m")), 3).as("has_line3"))

  /** RANGE window frame — value-based, not row-based: each event sums the
    * VALUE of all same-user events in the trailing hour of EVENT TIME,
    * however many rows that is (a ROWS frame cannot express this). Frame
    * bounds on exact epoch-second longs; sum decimal-exact. */
  def qWindowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-3600L, 0L)
    events(s, d)
      .filter(col("user_id") <= 50)
      .select(col("user_id"), col("event_id"),
        expr("unix_millis(ts) div 1000").as("tsec"), // integer div: Column./ is double division
        col("value"))
      .withColumn("hour_sum",
        sum(col("value").cast(DecimalType(18, 4))).over(w).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("hour_sum"))
  }

  /** UNPIVOT (melt) — the inverse of q_pivot: wide per-status counts back
    * to (status, flag, n) long form. Spark's unpivot == ANSI/DuckDB
    * UNPIVOT; values kept exact by unpivoting the counts. */
  def qUnpivot(s: SparkSession, d: String): DataFrame = {
    val wide = lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("A"),
        sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("N"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("R"))
    wide.unpivot(
      ids = Array(col("l_linestatus")),
      values = Array(col("A"), col("N"), col("R")),
      variableColumnName = "flag",
      valueColumnName = "n")
  }

  /** unionByName with allowMissingColumns: schema-evolution-tolerant
    * append — the newer slice carries an extra column the older lacks,
    * which nulls in. The everyday operation when a 100 TB table's schema
    * grew mid-history. */
  def qUnionByName(s: SparkSession, d: String): DataFrame = {
    val old = orders(s, d).filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"), col("o_totalprice"))
    val newer = orders(s, d).filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    // columns in different order on purpose: unionByName matches by NAME
    old.unionByName(newer, allowMissingColumns = true)
      .groupBy(coalesce(col("o_orderstatus"), lit("legacy")).as("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
  }

  /** Keyset-stable pagination: ORDER BY + OFFSET + LIMIT (total order with
    * unique tiebreak, or pages are nondeterministic). */
  def qOffsetPage(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"))
      .offset(10)
      .limit(10)

  /** Explicit GROUPING SETS with grouping_id — finer than ROLLUP/CUBE:
    * exactly the (status), (priority), and () aggregates, nothing else. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n
        |FROM g_orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  /** Raw SQL-text surface: the reference's users write SQL strings (stmt
    * mode); this entry runs a multi-table SELECT through spark.sql over
    * registered views — parser, analyzer, and catalog resolution
    * end-to-end (runSql covers the DML side). */
  def qSqlText(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("g_orders")
    customer(s, d).createOrReplaceTempView("g_customer")
    s.sql(
      """SELECT c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM g_orders JOIN g_customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY c_mktsegment""".stripMargin)
  }

  /** The SQL-registered native expressions (GraftExtensions) inside the
    * verified catalog: graft_dot and graft_token_count called from SQL
    * TEXT, oracled against DuckDB's list_dot_product / token idiom. Only
    * runs in sessions built with the extensions (Verify/Bench are). */
  def qNativeFuncSql(s: SparkSession, d: String): DataFrame = {
    embeddings(s, d).createOrReplaceTempView("g_emb")
    documents(s, d).createOrReplaceTempView("g_docs")
    s.sql(
      """SELECT e.vec_id,
        |       graft_dot(CAST(e.embedding AS ARRAY<DOUBLE>), CAST(e.embedding AS ARRAY<DOUBLE>)) AS nrm2,
        |       graft_token_count(d.text) AS n_tokens
        |FROM g_emb e JOIN g_docs d ON d.doc_id = e.vec_id
        |WHERE e.vec_id < 100""".stripMargin)
  }

  /** The CUSTOM as-of physical operator (AsOfJoinPlan/AsOfJoinExec via the
    * injected planner strategy) producing the same rows as [[qAsofJoin]] —
    * both run under the same DuckDB oracle, so the custom operator's
    * output is hash-verified, not just spec-compared. */
  def qAsofCustom(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("p_ms"), col("event_id").as("purchase_id"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")).as("v_ms"), col("event_id").as("view_id"))
    org.apache.spark.sql.graftbridge.AsOf
      .join(purchases, views, "user_id", "p_ms", "v_ms", "view_id")
      .toDF("u1", "p_ms", "purchase_id", "u2", "v_ms", "matched_view")
      .select(col("purchase_id"), col("matched_view"))
  }

  /** Time-series resample with gap-fill: the dense (hour × event_type)
    * grid over the table's own time span, missing cells filled with 0 —
    * the standard pipeline shape for training-data rate series. The hour
    * axis is generated from ONE aggregate row (control-plane `sequence`
    * explode, tiny at any scale); at 100 TB the same plan partitions by
    * entity and the grid join stays narrow because the sparse side is
    * pre-aggregated. */
  def qGapfillHours(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val hourly = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = ev.agg(
      date_trunc("hour", min(col("ts"))).as("mn"),
      date_trunc("hour", max(col("ts"))).as("mx"))
    val hours = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    hours.crossJoin(types)
      .join(hourly, Seq("h", "event_type"), "left")
      .select(
        date_format(col("h"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Exact INTERPOLATED percentile (PERCENTILE_CONT shape) with the
    * interpolation arithmetic spelled out identically in both engines —
    * built-in quantile functions differ in interpolation formulations, so
    * the formula itself is the cross-engine contract: k = (n-1)·p,
    * p95 = v_lo·(1-frac) + v_hi·frac over the sorted partition. One
    * window sort per group; rank arithmetic is exact integers. Scale
    * note: exact per-group percentile parallelizes only across groups
    * (here 3 return flags ⇒ 3 sort tasks however large the table) — at
    * 100 TB this entry is the exact VERIFIER run on samples/strata, and
    * `q_approx_percentile_audit` (t-digest with pinned bounds) is the
    * full-data path. */
  def qPercentileCont(s: SparkSession, d: String): DataFrame = {
    // Distributed EXACT selection (see ops/ExactSelection): a single
    // window partitioned by the 3-value group column sorts each group in
    // ONE task — 31 s at the 50x scale point; the two-phase operator
    // ranks only the buckets straddling the lo/hi order statistics (~8x
    // there). The wanted-rank expressions are the SAME column arithmetic
    // as the lo/hi filter below, so the selected ranks agree exactly.
    val base = lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ranked = ExactSelection.rankedCandidates(
      base, "l_returnflag", "l_extendedprice",
      Seq(col("l_orderkey"), col("l_linenumber"))) { n =>
      val loRank = floor((n - lit(1)) * lit(0.95)) + lit(1)
      array(loRank, least(loRank + lit(1), n))
    }
    val k = (col("n") - 1) * lit(0.95)
    val lo = floor(k) + 1
    val hi = least(floor(k) + 2, col("n"))
    val frac = k - floor(k)
    ranked
      .filter(col("rn") === lo || col("rn") === hi)
      .groupBy(col("l_returnflag"), col("n"))
      .agg(
        min(when(col("rn") === lo, col("l_extendedprice"))).as("vlo"),
        min(when(col("rn") === hi, col("l_extendedprice"))).as("vhi"))
      .select(col("l_returnflag"),
        (col("vlo") * (lit(1.0) - frac) + col("vhi") * frac).as("p95"))
  }

  /** Z-order (Morton) clustering — the multi-dimensional data-layout
    * operator behind Delta/Iceberg `ZORDER BY`: interleaving the bits of
    * two keys gives a 1-D sort order in which any contiguous bucket is
    * BOUNDED IN BOTH dimensions, so per-file min/max stats prune scans on
    * either key. The audit groups rows by their z-bucket (top bits of the
    * z-value — the "file" a range-partitioned write would land them in)
    * and emits both dimensions' min/max spans per bucket: narrow spans in
    * BOTH columns at once are the data-skipping property itself, which a
    * plain sort by one key cannot deliver. Pure integer bit arithmetic —
    * identical in any engine. */
  def qZorderLayout(s: SparkSession, d: String): DataFrame = {
    // interleave the low 24 bits of each key (covers keyspaces to 16.7M —
    // sf5's 7.5M orderkeys included): z = Σ bit_i(a)<<2i | bit_i(b)<<2i+1
    val z = (0 until 24).map { i =>
      (shiftright(col("l_orderkey"), i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(col("l_partkey"), i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .withColumn("zbucket", shiftright(z, 24))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        (max(col("l_orderkey")) - min(col("l_orderkey"))).as("okey_span"),
        (max(col("l_partkey")) - min(col("l_partkey"))).as("pkey_span"))
  }

  /** Stream-static dimension enrichment, batch twin: the exact join body
    * `streaming/EventStream.enrichWithDim` runs inside every micro-batch
    * (broadcast the static dim, left join, weight the value; missing dim
    * rows coalesce to 0) applied to the events table as a batch frame —
    * the unified-Dataset-API parity the EventStreamSpec asserts, now
    * hash-oracled. The dim is a literal weight table with one event_type
    * the stream never produces ('refund') and one the dim doesn't cover
    * ('error' -> weight 0 path); per-row double multiply is
    * IEEE-identical cross-engine. */
  def qEnrichDim(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Seq(("click", 1.5), ("view", 0.25), ("purchase", 10.0),
      ("signup", 4.0), ("refund", -5.0)).toDF("event_type", "weight")
    graft.streaming.EventStream.enrichWithDim(
      events(s, d).select(col("event_id"), col("event_type"), col("value")), dim)
  }

  /** SCD type-2 dimension-history build — the islands problem: collapse each
    * customer's date-ordered priority sequence into [valid_from, valid_to)
    * intervals, open-ended for the current run. The standard CDC/warehouse
    * shape (gaps-and-islands via lag + cumulative run counter + run
    * aggregate + lead), all windows over the same (customer, date, orderkey)
    * ordering so Spark plans ONE shuffle on o_custkey and sorts once per
    * window family. Unique tiebreak (o_orderkey) makes every run boundary —
    * and therefore every interval — deterministic cross-engine. */
  def qScd2Intervals(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_custkey") < 500)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val prev = lag(col("o_orderpriority"), 1).over(w)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = o
      .withColumn("new_run", when(prev.isNull || prev =!= col("o_orderpriority"), 1).otherwise(0))
      .withColumn("run_id", sum(col("new_run")).over(cum))
      .groupBy(col("o_custkey"), col("run_id"), col("o_orderpriority"))
      .agg(min(col("o_orderdate")).as("valid_from"), count(lit(1)).as("n_orders"))
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(col("o_custkey"), col("o_orderpriority").as("priority"),
        col("valid_from"), col("valid_to"), col("n_orders"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): walk a 10-ary hierarchy
    * derived from the customer keyspace (parent = key div 10, rooted at 1)
    * and audit each depth level — the BOM-explosion / org-chart shape that
    * needed iterative driver loops before recursive CTEs landed. The walk
    * is depth-bounded by construction (log10 of the keyspace) and each
    * iteration is an ordinary equi-join the optimizer plans like any
    * other, so the recursion adds rounds, not state. */
  def qRecursiveCte(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("g_rc_customer")
    s.sql(
      """WITH RECURSIVE org(key, depth) AS (
        |  SELECT c_custkey, 0 FROM g_rc_customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, o.depth + 1
        |  FROM g_rc_customer c JOIN org o
        |    ON c.c_custkey DIV 10 = o.key AND c.c_custkey > o.key)
        |SELECT depth, count(*) AS n_nodes, CAST(SUM(key) AS BIGINT) AS key_sum
        |FROM org GROUP BY depth""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_recursive_cte" -> (qRecursiveCte _),
    "q_scd2_intervals" -> (qScd2Intervals _),
    "q_enrich_dim" -> (qEnrichDim _),
    "q_zorder_layout" -> (qZorderLayout _),
    "q_gapfill_hours" -> (qGapfillHours _),
    "q_percentile_cont" -> (qPercentileCont _),
    "q_asof_custom" -> (qAsofCustom _),
    "q_native_func_sql" -> (qNativeFuncSql _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_sql_text" -> (qSqlText _),
    "q_offset_page" -> (qOffsetPage _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_unpivot" -> (qUnpivot _),
    "q_union_by_name" -> (qUnionByName _),
    "q_window_range_frame" -> (qWindowRangeFrame _),
    "q_topn_agg" -> (qTopnAgg _),
    "q_correlated_scalar" -> (qCorrelatedScalar _),
    "q_median_disc" -> (qMedianDisc _),
    "q_regex_funcs" -> (qRegexFuncs _),
    "q_conditional_agg" -> (qConditionalAgg _),
    "q_lag_lead" -> (qLagLead _),
    "q_approx_distinct_audit" -> (qApproxDistinctAudit _),
    "q_approx_percentile_audit" -> (qApproxPercentileAudit _),
    "q_session_window" -> (qSessionWindow _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_asof_join" -> (qAsofJoin _)
  )

  /** The same 24-bit interleave as [[qZorderLayout]], rendered as SQL. */
  private def zorderSql: String = {
    val terms = (0 until 24).map { i =>
      s"((l_orderkey >> $i) & 1) * ${1L << (2 * i)} + ((l_partkey >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("\n       + ")
    s"""WITH z AS (
       |  SELECT l_orderkey, l_partkey,
       |       $terms AS zv
       |  FROM lineitem)
       |SELECT zv >> 24 AS zbucket, count(*) AS n_rows,
       |       max(l_orderkey) - min(l_orderkey) AS okey_span,
       |       max(l_partkey) - min(l_partkey) AS pkey_span
       |FROM z GROUP BY zbucket""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // DuckDB spells integer division // where Spark SQL says DIV.
    "q_recursive_cte" ->
      """WITH RECURSIVE org(key, depth) AS (
        |  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, o.depth + 1
        |  FROM customer c JOIN org o
        |    ON c.c_custkey // 10 = o.key AND c.c_custkey > o.key)
        |SELECT depth, count(*) AS n_nodes, CAST(SUM(key) AS BIGINT) AS key_sum
        |FROM org GROUP BY depth""".stripMargin,
    "q_scd2_intervals" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_custkey < 500),
        |g AS (
        |  SELECT *,
        |         CASE WHEN lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
        |                OR lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) <> o_orderpriority
        |              THEN 1 ELSE 0 END AS new_run
        |  FROM o),
        |r AS (
        |  SELECT *, CAST(SUM(new_run) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
        |  FROM g),
        |runs AS (
        |  SELECT o_custkey, run_id, o_orderpriority,
        |         min(o_orderdate) AS valid_from, count(*) AS n_orders
        |  FROM r GROUP BY o_custkey, run_id, o_orderpriority)
        |SELECT o_custkey, o_orderpriority AS priority, valid_from,
        |       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) AS valid_to,
        |       n_orders,
        |       CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id) IS NULL
        |                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
        |FROM runs""".stripMargin,
    "q_enrich_dim" ->
      """SELECT e.event_id, e.event_type,
        |       e.value * COALESCE(dim.weight, 0.0) AS weighted_value
        |FROM events e
        |LEFT JOIN (VALUES ('click', 1.5), ('view', 0.25), ('purchase', 10.0),
        |                  ('signup', 4.0), ('refund', -5.0)) AS dim(event_type, weight)
        |  ON e.event_type = dim.event_type""".stripMargin,
    "q_zorder_layout" -> zorderSql,
    "q_gapfill_hours" ->
      """WITH hourly AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS mn,
        |         CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS mx
        |  FROM events),
        |hours AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events)
        |SELECT strftime(hours.h, '%Y-%m-%d %H') AS hour, types.event_type,
        |       COALESCE(hourly.n, 0) AS n
        |FROM hours CROSS JOIN types
        |LEFT JOIN hourly ON hourly.h = hours.h AND hourly.event_type = types.event_type""".stripMargin,
    "q_percentile_cont" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |       MIN(CASE WHEN rn = floor((n-1) * CAST(0.95 AS DOUBLE)) + 1 THEN l_extendedprice END)
        |         * (1.0 - ((n-1) * CAST(0.95 AS DOUBLE) - floor((n-1) * CAST(0.95 AS DOUBLE))))
        |     + MIN(CASE WHEN rn = least(floor((n-1) * CAST(0.95 AS DOUBLE)) + 2, n) THEN l_extendedprice END)
        |         * ((n-1) * CAST(0.95 AS DOUBLE) - floor((n-1) * CAST(0.95 AS DOUBLE))) AS p95
        |FROM r
        |WHERE rn = floor((n-1) * CAST(0.95 AS DOUBLE)) + 1
        |   OR rn = least(floor((n-1) * CAST(0.95 AS DOUBLE)) + 2, n)
        |GROUP BY l_returnflag, n""".stripMargin,
    "q_map_funcs" ->
      """WITH per_line AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_orderkey <= 300
        |  GROUP BY l_orderkey, l_linenumber)
        |SELECT l_orderkey,
        |       CAST(count(*) AS INTEGER) AS n_lines,
        |       max(CASE WHEN l_linenumber = 1 THEN qty END) AS qty_line1,
        |       bool_or(l_linenumber = 3) AS has_line3
        |FROM per_line GROUP BY l_orderkey""".stripMargin,
    "q_native_func_sql" ->
      """SELECT e.vec_id,
        |       list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS nrm2,
        |       CAST(len(regexp_extract_all(d.text, '\S+')) AS INTEGER) AS n_tokens
        |FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |WHERE e.vec_id < 100""".stripMargin,
    "q_window_range_frame" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |         PARTITION BY user_id ORDER BY epoch_ms(ts) // 1000
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events WHERE user_id <= 50""".stripMargin,
    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_linestatus,
        |         CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS A,
        |         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS N,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS R
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT l_linestatus, flag, n FROM wide
        |UNPIVOT (n FOR flag IN (A, N, R))""".stripMargin,
    "q_union_by_name" ->
      """SELECT coalesce(o_orderstatus, 'legacy') AS status, count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
        |  FROM orders WHERE o_orderkey < 1000
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000)
        |GROUP BY 1""".stripMargin,
    "q_offset_page" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 10""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_sql_text" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY c_mktsegment""".stripMargin,
    "q_topn_agg" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders
        |) WHERE rn <= 2""".stripMargin,
    "q_correlated_scalar" ->
      """WITH a AS (
        |  SELECT c_nationkey AS nk,
        |         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
        |  FROM customer GROUP BY 1)
        |SELECT c_nationkey, count(*) AS n_above
        |FROM customer JOIN a ON c_nationkey = nk
        |WHERE c_acctbal > avg_bal
        |GROUP BY c_nationkey""".stripMargin,
    "q_median_disc" ->
      """SELECT o_orderstatus, o_totalprice AS median_price FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,
    "q_regex_funcs" ->
      """SELECT p_partkey,
        |       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |       regexp_matches(p_type, '[A-Z]{2,}') AS has_caps_run,
        |       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INTEGER) AS n_vowels
        |FROM part WHERE p_partkey <= 300""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_linestatus,
        |       count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
        |       CAST(SUM(CAST(CASE WHEN l_quantity > 25 THEN l_quantity ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS qty_big,
        |       max(CASE WHEN l_linenumber = 1 THEN l_extendedprice END) AS max_first_price
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE), CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_approx_distinct_audit" ->
      "SELECT count(DISTINCT l_orderkey) AS exact_keys, true AS approx_ok FROM lineitem",
    "q_approx_percentile_audit" ->
      """SELECT o_orderstatus, o_totalprice AS exact_median, true AS approx_ok FROM (
        |  SELECT o_orderstatus, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS rn,
        |         count(*) OVER (PARTITION BY o_orderstatus) AS cnt
        |  FROM orders)
        |WHERE rn = (cnt + 1) // 2""".stripMargin,
    "q_session_window" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS tms,
        |         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |s AS (
        |  SELECT user_id, tms,
        |         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
        |  FROM g),
        |per_sess AS (
        |  SELECT user_id, sess_idx, count(*) AS n_events,
        |         max(tms) - min(tms) AS duration_ms
        |  FROM s GROUP BY user_id, sess_idx)
        |SELECT user_id, count(*) AS n_sessions,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
        |FROM per_sess GROUP BY user_id""".stripMargin,
    "q_asof_custom" ->
      """WITH u AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, 0 AS side, event_id, event_id AS view_id
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts), 1, event_id, NULL
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id AS purchase_id, matched_view FROM (
        |  SELECT side, event_id,
        |         last_value(view_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ms, side, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view
        |  FROM u)
        |WHERE side = 1""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, 0 AS side, event_id, event_id AS view_id
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, epoch_ms(ts), 1, event_id, NULL
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id AS purchase_id, matched_view FROM (
        |  SELECT side, event_id,
        |         last_value(view_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ms, side, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_view
        |  FROM u)
        |WHERE side = 1""".stripMargin,
    "q_interval_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND epoch_ms(c.ts) <= epoch_ms(p.ts)
        | AND epoch_ms(c.ts) >= epoch_ms(p.ts) - 600000""".stripMargin
  )
}
