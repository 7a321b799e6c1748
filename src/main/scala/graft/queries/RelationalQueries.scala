package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Lineage.LineageSyntax
import graft.sources.Tables

/** Relational operator coverage from SURVEY.md §2 expressed over the
  * driver's TPC-H-ish test tables, each with a DuckDB-oracle SQL twin.
  *
  * Conventions for oracle hash-parity:
  *   - every computed column aliased identically in Spark and SQL;
  *   - money aggregates quantize PER ROW to integer cents/e4 units before
  *     summing (fixed-precision inputs make each term exact; integer sums
  *     are order-independent), so no engine or partition order can flip a
  *     rounding boundary — `round(sum(...))` on big float sums is banned;
  *   - ratio outputs (avg of tiny sums) round to 4dp — error ~1e-12 vs a
  *     5e-5 boundary;
  *   - deterministic ORDER BY (with a unique-key tiebreak) on both sides;
  *   - DuckDB `TRY_CAST` mirrors Spark's non-ANSI `cast` (NULL on bad data,
  *     the Trino-tolerant semantics chosen in SURVEY.md §2.7-F4);
  *   - integer aggregates cast to BIGINT in DuckDB (whose sum(int) widens
  *     to HUGEINT) to match Spark's LongType.
  *
  * Scale notes are per-query scaladoc: the shapes here are the ones that
  * survive 100 TB — partial aggregation before a single key-shuffle,
  * broadcast of dimension tables, anti/semi joins instead of NOT IN
  * subplans, window functions partitioned by high-cardinality keys.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- scans+agg

  /** TPC-H Q1-style pricing summary (SURVEY §2.5): partial agg (map-side
    * combine) then one shuffle of ~6 rows per map task — scale-safe by
    * construction. Filter is pushed to the parquet scan. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        // money: per-row integer quantization BEFORE the sum — fixed-
        // precision inputs make each term exact, and integer sums are
        // order-independent, so no engine can flip a rounding boundary
        sum(floor($"l_extendedprice" * 100.0 + 0.5)).as("sum_base_price_cents"),
        sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5))
          .as("sum_disc_price_e4"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + predicate (SURVEY §2.3 P1-P4): both reach the parquet
    * scan (PushedFilters / ReadSchema) — no full-width read. Per-row
    * arithmetic is deterministic, no shuffle besides the final sort. */
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
      .select(
        $"l_orderkey", $"l_linenumber",
        // integer cents via floor(x*100+0.5): pure IEEE ops, bit-identical
        // in any engine — immune to HALF_UP-vs-C-round boundary skew
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")
          * 100.0 + 0.5).as("charge_cents"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  // ------------------------------------------------------------------- joins

  /** LEFT OUTER equi-join (SURVEY §2.4 J1 — the curated_provider join
    * shape). customer is the smaller side; at scale both sides shuffle on
    * custkey unless customer fits the broadcast threshold — AQE decides. */
  def q3LeftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey", "left")
      .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey")
  }

  /** Multi-way join + agg (TPC-H Q5 shape): revenue per nation. nation and
    * region are broadcast explicitly — at 100 TB the fact-side shuffle on
    * the join keys is the only exchange; dims never shuffle. */
  def q4JoinMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val nat = broadcast(t(s, dir, "nation"))
    val reg = broadcast(t(s, dir, "region"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(nat, $"s_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5))
        .as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Anti-join (SURVEY §2.4 J2 / §2.8 T3 `relationships` semantics):
    * customers with no orders. left_anti instead of NOT IN — null-safe and
    * plans as a single shuffle-or-broadcast hash join at scale. */
  def q5AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Semi-join: customers with at least one high-value order (EXISTS). */
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = t(s, dir, "orders").filter($"o_totalprice" > 200000.0)
    t(s, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  // ------------------------------------------------- dedup / distinct / union

  /** Exact dedup (SURVEY §2.5 A2) — DISTINCT over a projection. Map-side
    * partial dedup before the shuffle keeps exchange volume ~|distinct|. */
  def q7Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  /** Latest-per-key (SURVEY §2.9 ST4 — the CDC merge primitive): one row
    * per user_id, newest by (ts, event_id). Window row_number over a
    * key-partitioned sort; at scale this is one shuffle on user_id and the
    * sort is per-partition. Tiebreak on event_id keeps it deterministic. */
  def q8LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        $"event_type", round($"value", 4).as("value"))
      .orderBy($"user_id")
  }

  /** UNION dedup (SURVEY §2.6): nation keys present in either table. */
  def q9Union(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
      .union(t(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
      .distinct()
      .orderBy($"nationkey")
  }

  /** Native set operators (q165): INTERSECT and EXCEPT on the distinct
    * customers active in adjacent years, tagged and unioned into one
    * result. Catalyst plans both as hash SEMI/ANTI joins over the
    * deduplicated key sets — never a sort-based set difference — so the
    * shape is two key-partitioned shuffles, the same as q5/q6's
    * explicit join forms; this gates the OPERATOR surface (a user
    * writing `INTERSECT` must get the same plan quality as one writing
    * the semi-join by hand). */
  def q165SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def active(y: Int) = t(s, dir, "orders")
      .where(year($"o_orderdate") === y)
      .select($"o_custkey").distinct()
    val y95 = active(1995)
    val y96 = active(1996)
    y95.intersect(y96).select(lit("both").as("tag"), $"o_custkey")
      .unionByName(
        y95.except(y96).select(lit("only_1995").as("tag"), $"o_custkey"))
      .orderBy($"tag", $"o_custkey")
  }

  // ------------------------------------------ scalar functions (SURVEY §2.7)

  /** JSON extraction (F1): `get_json_object` ≡ DuckDB json_extract_string.
    * At scale: single-pass codegen'd JsonPath — no UDF. */
  def q10JsonGet(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast(LongType))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** Quote-strip regex (F5) — the reference's exact `'^"|"$'` cleaning
    * regex applied to a deliberately quoted value. */
  def q11RegexClean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        regexp_replace(concat(lit("\""), $"event_type", lit("\"")), "^\"|\"$", "")
          .as("event_type_clean"))
      .orderBy($"event_id")
  }

  /** Tolerant cast (F4): non-ANSI cast → NULL on malformed input, the
    * Trino-tolerated semantics. Oracle uses TRY_CAST. */
  def q12CastTolerant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .select($"event_id",
        when($"event_type" === "error", lit("not-a-number"))
          .otherwise($"event_id".cast(StringType)).cast(LongType).as("id_int"))
      .orderBy($"event_id")
  }

  /** date_format partition-key derivation (F2 — `ingestion_cdc_date`):
    * daily buckets of orders. This is the partition column a 100 TB raw
    * layer is laid out by. */
  def q13DateFormat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .withColumn("d", date_format($"o_orderdate", "yyyy-MM-dd"))
      .groupBy($"d")
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100.0 + 0.5)).as("total_cents"))
      .orderBy($"d")
  }

  // ------------------------------------------------- sort / top-k / window

  /** Top-K (SURVEY §2.6 L1 + ORDER BY): top 10 customers by revenue.
    * Rounded before ranking so the k-boundary is engine-stable; Spark
    * plans this as TakeOrderedAndProject — no global sort materialized. */
  def q14TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(floor($"o_totalprice" * 100.0 + 0.5)).as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy($"revenue_cents".desc, $"o_custkey")
      .limit(10)
  }

  /** Windowed running total per customer (SURVEY §2.6 — the CDC
    * latest-per-key machinery generalized). Deterministic frame order via
    * (o_orderdate, o_orderkey). */
  def q15WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        // cast to long: DuckDB row_number() is BIGINT, Spark's is INT
        row_number().over(w).cast(LongType).as("order_seq"),
        round(sum($"o_totalprice").over(w), 2).as("running_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Exact COUNT(DISTINCT) per group (SURVEY §2.5): expands to a two-phase
    * aggregate in Spark — scale-safe; approx_count_distinct is the 100 TB
    * variant (not oracle-comparable, kept in ops). */
  def q16CountDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(countDistinct($"c_nationkey").as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Conditional aggregation (CASE WHEN inside agg — the DQ metric shape). */
  def q17ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        round(sum(when($"event_type" === "purchase", $"value").otherwise(lit(0.0))), 4)
          .as("purchase_value"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  // --------------------------------------------- DQ checks (SURVEY §2.8)

  /** T1 `unique` violations on a key expected non-unique — returns the
    * duplicate (user_id, event_type) pairs with counts. */
  def q18CheckUniqueViolations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
      .orderBy($"user_id", $"event_type")
  }

  /** T1+T2 as a one-row metrics summary (unique on PK + null counts) —
    * the Elementary-style per-run metric collection (SURVEY §2.8 T4). */
  def q19CheckMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
    val dups = ord.groupBy($"o_orderkey").agg(count(lit(1)).as("n")).filter($"n" > 1)
    ord.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count($"o_custkey")).as("null_custkey"),
      (count(lit(1)) - count($"o_orderdate")).as("null_orderdate"))
      .crossJoin(dups.agg(count(lit(1)).as("pk_dup_groups")))
  }

  /** T3 `relationships` violations: lineitems whose orderkey has no parent
    * order (expected empty — shape matters, result proves referential
    * integrity). Distinct violating keys, anti-join plan. */
  def q20CheckRelationships(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").select($"l_orderkey")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey", "left_anti")
      .distinct()
      .orderBy($"l_orderkey")
  }

  /** Maintained data-quality monitors (q197): the dbt tests the
    * reference re-runs as full scans per pipeline run (`unique`,
    * `not_null`, `relationships`), kept current as ONE maintained view
    * under signed CDC waves — customers load, a customer delete wave
    * orphans its orders, an order update wave nulls FKs, a replayed
    * delete straddles a compaction, a duplicate-customer wave lands —
    * and the three violation counts are served from key-multiset state,
    * never a table scan. Oracle = the same counts over net tables. */
  def q197IncChecks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.checks.IncrementalChecks
    val st = IncrementalChecks.stores(s,
      java.nio.file.Files.createTempDirectory("q197checks").toString)
    val cust = t(s, dir, "customer").select($"c_custkey".as("k"))
    val ords = t(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    IncrementalChecks.appendParent(st, cust, "k", 0L)
    IncrementalChecks.appendChild(st,
      ords.select($"o_custkey".as("k")), "k", 1L)
    // customer takedown wave: their orders become orphans
    val pdel = cust.filter($"k" % 7 === 3).withColumn("__delta", lit(-1L))
    IncrementalChecks.appendParent(st, pdel, "k", 2L, Some("__delta"))
    IncrementalChecks.compact(st)
    // post-compaction replayed takedown: manifest no-op
    IncrementalChecks.appendParent(st, pdel, "k", 2L, Some("__delta"))
    // order update wave: %13=6 orders null their FK (−old +null)
    val upd = ords.filter($"o_orderkey" % 13 === 6)
    IncrementalChecks.appendChild(st,
      upd.select($"o_custkey".as("k"), lit(-1L).as("__delta"))
        .unionByName(upd.select(lit(null).cast("long").as("k"),
          lit(1L).as("__delta"))),
      "k", 3L, Some("__delta"))
    // duplicate-pk wave: %11=5 surviving customers insert AGAIN
    IncrementalChecks.appendParent(st,
      cust.filter($"k" % 11 === 5 && $"k" % 7 =!= 3), "k", 4L)
    IncrementalChecks.current(st)
      .select($"n_orphans", $"n_null_fk", $"n_dup_pk")
  }

  /** Gap-based sessionization (batch form of the streaming session window):
    * a new session starts after >30 min of user inactivity. Two stacked
    * windows over ONE shuffle on user_id (lag → flag → running sum), then
    * the session aggregate reuses the same partitioning — Catalyst plans a
    * single exchange for all three. */
  def q32Sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000000
    t(s, dir, "events")
      .withColumn("ts_us", unix_micros($"ts"))
      .withColumn("new_sess",
        when(($"ts_us" - lag($"ts_us", 1).over(w)) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"ts_us").as("session_start_us"),
        max($"ts_us").as("session_end_us"),
        round(sum($"value"), 4).as("session_value"))
      .orderBy($"user_id", $"session_seq")
  }

  /** ROLLUP hierarchy totals (region → nation → grand total): Spark plans
    * grouping sets as one expand + one partial-agg shuffle — no N-pass
    * re-aggregation. NULL grouping slots labeled 'ALL' for oracle parity. */
  def q33Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val nat = broadcast(t(s, dir, "nation"))
    val reg = broadcast(t(s, dir, "region"))
    cust.join(nat, $"c_nationkey" === $"n_nationkey")
      .join(reg, $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), round(sum($"c_acctbal"), 2).as("total_bal"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"n_customers", $"total_bal")
      .orderBy($"region", $"nation")
  }

  /** Pivot (long→wide): per user-bucket event-type counts. The pivot
    * values are passed EXPLICITLY — without them Spark runs an extra
    * distinct-collect job over the full input to discover the columns,
    * which at corpus scale is a full scan before the real one; with them
    * the pivot compiles to one hash aggregate with a fixed projection. */
  def q61Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("bucket", $"user_id" % 10)
      .groupBy($"bucket")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      // absent (bucket, type) combos pivot to NULL; the conditional-agg
      // twin yields 0 — normalize so both engines agree
      .select($"bucket" +: Seq("click", "error", "purchase", "signup", "view")
        .map(c => coalesce(col(c), lit(0L)).as(s"n_$c")): _*)
      .orderBy($"bucket")
  }

  /** GROUPING SETS: region totals, nation totals, and the grand total in
    * ONE pass (Expand + single hash aggregate — vs three scans + union).
    * The NULL slots from non-grouped columns are sentineled 'ALL' so the
    * three stratum shapes stay distinguishable and hash-comparable. */
  def q62GroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
    joined
      .groupingSets(Seq(Seq($"r_name"), Seq($"n_name"), Seq()),
        $"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(floor($"c_acctbal" * 100.0 + 0.5)).cast("long").as("total_bal_cents"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
        coalesce($"n_name", lit("ALL")).as("nation"),
        $"n_customers", $"total_bal_cents")
      .orderBy($"region", $"nation")
  }

  /** Full CUBE over (status, priority): all four grouping combinations
    * in ONE expand + one partial-agg'd shuffle (completing the
    * grouping-set family next to q33 ROLLUP and q62 GROUPING SETS). NULL
    * slots labeled 'ALL' for oracle parity. */
  def q113Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor($"o_totalprice" * 100.0 + 0.5)).cast("long")
          .as("total_cents"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"total_cents")
      .orderBy($"status", $"priority")
  }

  /** CUBE with GROUPING() disambiguation (q156): all four
    * (returnflag × linestatus) granularities of the revenue aggregate
    * from ONE Expand-based pass — the naive UNION-of-four-GROUP-BYs form
    * scans the fact table 4×. Unlike q113's 'ALL' labels, this keeps the
    * `grouping()` flags as first-class output columns — the portable way
    * to tell a subtotal row from a genuinely NULL key (the coalesce
    * trick is ambiguous the day a key column admits NULLs). Cents
    * quantization keeps the sum exact across engines. */
  def q156Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_extendedprice" * 100.0 + 0.5)).cast("long")
          .as("rev_cents"),
        grouping($"l_returnflag").cast("int").as("g_flag"),
        grouping($"l_linestatus").cast("int").as("g_status"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"g_flag", $"g_status", $"n", $"rev_cents")
      .orderBy($"g_flag", $"g_status", $"flag", $"status")
  }

  /** Salted fact↔dim join (SkewOps.saltedBroadcastJoin): the skew-robust
    * formulation — dimension exploded salts×, fact salted — must produce
    * EXACTLY the plain join's rows; the oracle is the unsalted SQL join.
    * Aggregated per nation so the gate is deterministic. */
  def q67SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_suppkey".as("s_suppkey"), $"l_extendedprice")
    val sup = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    graft.ops.SkewOps.saltedBroadcastJoin(li, sup, "s_suppkey", salts = 8)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(floor($"l_extendedprice" * 100.0 + 0.5)).cast("long").as("rev_cents"))
      .orderBy($"s_nationkey")
  }

  /** Two-phase salted aggregation (SkewOps.saltedAgg): hot grouping keys
    * partial-aggregate across `salts` shards, then a tiny merge — result
    * must equal the plain GROUP BY (algebraic aggregates re-aggregate
    * exactly; cents quantized per row first, so integer sums are exact in
    * any combine order). */
  def q68SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ops.SkewOps.saltedAgg(
        t(s, dir, "lineitem").select($"l_returnflag",
          floor($"l_extendedprice" * 100.0 + 0.5).as("cents")),
        keys = Seq("l_returnflag"), salts = 16,
        partialAggs = Seq(count(lit(1)).as("pn"), sum($"cents").as("ps")),
        mergeAggs = Seq(sum($"pn").cast("long").as("n"),
          sum($"ps").cast("long").as("rev_cents")))
      .orderBy($"l_returnflag")
  }

  /** LATERAL correlated subquery through the SQL surface: top-2 customers
    * per nation — the per-row-subquery idiom; Catalyst decorrelates the
    * ORDER BY+LIMIT lateral into a ranked window join rather than
    * re-executing per outer row. Oracle runs the identical LATERAL SQL. */
  def q69Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT n.n_name AS nation, t.c_name, t.bal_cents
        |FROM nation n,
        | LATERAL (SELECT c_name,
        |            CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |          FROM customer
        |          WHERE c_nationkey = n.n_nationkey
        |          ORDER BY c_acctbal DESC, c_name
        |          LIMIT 2) t
        |ORDER BY nation, bal_cents DESC, c_name""".stripMargin)
  }

  /** Per-key top-k via the bounded-heap aggregate (RankOps.topKPerKey):
    * top-3 orders per customer by price with an orderkey tie-break. The
    * oracle is the window row_number() formulation — results must match
    * exactly while the engine plan contains NO sort and NO window
    * (gated in RankOpsSpec): partial heaps shuffle O(k) rows per key. */
  def q75TopKPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders").select($"o_custkey",
      floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("price_cents"),
      $"o_orderkey")
    graft.ops.RankOps.topKPerKey(o, Seq("o_custkey"),
        Seq($"price_cents", $"o_orderkey"), k = 3, largest = true)
      .orderBy($"o_custkey", $"rank")
  }

  /** Bloom-pruned fact×selective-dimension join (BloomOps.prunedEquiJoin):
    * lineitem rows are rejected by a codegen'd `might_contain` over the
    * hot-order keys BEFORE the join exchange, so at scale the fact-side
    * shuffle carries only ~selectivity of the table; the exact join then
    * kills bloom false positives, making the result — and the oracle —
    * identical to the plain join. Plan-gated in BloomOpsSpec. */
  def q76BloomPrune(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val hot = t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey", $"o_orderpriority")
    graft.ops.BloomOps.prunedEquiJoin(li, hot, $"l_orderkey", $"o_orderkey",
        expectedItems = 200000L)
      .groupBy($"o_orderpriority")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5))
          .cast("long").as("rev_e4"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  /** Cohort retention matrix over the event stream: users grouped by
    * first-seen day, distinct-user counts per (cohort, day-offset) cell.
    * Two aggregations + one join, all keyed on user_id/cohort — the
    * standard product-analytics query at any scale (the first-seen
    * aggregate is |users| rows; the activity set shuffles once). */
  def q83CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", to_date($"ts").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("cohort_d"))
    ev.distinct()
      .join(first, Seq("user_id"))
      .groupBy(date_format($"cohort_d", "yyyy-MM-dd").as("cohort_day"),
        datediff($"d", $"cohort_d").cast("long").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_day", $"day_offset")
  }

  /** Ordered funnel (signup → view → purchase, strictly later steps):
    * stage k's timestamp is the first qualifying event AFTER stage k-1.
    * Three user-keyed aggregates chained by broadcast-small joins — per
    * stage one pass over the (pruned) event scan, no window over the
    * full stream. */
  def q84Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", $"ts", $"event_type")
    val s1 = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = ev.filter($"event_type" === "view")
      .join(s1, Seq("user_id")).filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = ev.filter($"event_type" === "purchase")
      .join(s2, Seq("user_id")).filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    val rows = Seq(
      ("1_signup", s1), ("2_view_after_signup", s2), ("3_purchase_after_view", s3))
    rows.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), $"n_users")
    }.reduce(_.unionByName(_)).orderBy($"stage")
  }

  /** Iterative graph analytics (q89): 3-iteration PageRank over the
    * symmetrized customer↔supplier trade graph (an edge per distinct
    * (customer, supplier) pair that ever traded; node ids disambiguated
    * by parity). Integer nano-rank arithmetic makes every per-node sum
    * order-independent, so the distributed result hash-matches the
    * oracle's sequential replay exactly — see
    * [[graft.ops.GraphOps.pageRankQuantized]]. Top-100 hubs returned. */
  def q89PageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cut AFTER the distinct: the op evaluates its edge input twice (the
    // degree agg and the degree join), and the symmetrizing union doubles
    // that — without the cut the orders⋈lineitem+distinct plan runs 4×.
    // The materialized distinct edge list is join-output-sized, so the
    // one-time copy is far cheaper than three recomputes.
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
      .cutLineage()
    val bi = edges.unionByName(
      edges.select($"dst".as("src"), $"src".as("dst")))
    graft.ops.GraphOps.pageRankQuantized(bi, iters = 3)
      .orderBy($"r".desc, $"node")
      .limit(100)
  }

  /** Correlated-aggregate equality subquery (TPC-H Q2 shape, q91): the
    * cheapest supplier per part — rows surviving only when their cost
    * EQUALS their group's minimum. Planned as one partial-agg'd min per
    * partkey joined back (no decorrelation blowup, no window over the
    * whole join); ties keep all witnesses, so no arbitrary row pick. */
  def q91CorrelatedMin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey",
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("cost_cents"))
    val minCost = li.groupBy($"l_partkey")
      .agg(min($"cost_cents").as("min_cost_cents"))
    li.join(minCost, Seq("l_partkey"))
      .filter($"cost_cents" === $"min_cost_cents")
      .select($"l_partkey", $"l_suppkey", $"cost_cents")
      .orderBy($"l_partkey", $"l_suppkey")
  }

  /** Deterministic grouped string aggregation (q92 — LISTAGG/STRING_AGG):
    * the classic reporting op made engine-portable by sorting the
    * distinct elements BEFORE joining (an unordered string_agg is
    * nondeterministic under parallelism — banned). collect_set shuffles
    * each distinct element once; the sort is per-group over tiny sets. */
  def q92StringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_mktsegment")
      .agg(array_join(array_sort(collect_set($"n_name")), ",").as("nations"),
        count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Correlated scalar subquery (TPC-H Q17 shape) through the SQL surface:
    * small-order lineitems per part. Catalyst decorrelates the per-part
    * average into an aggregate + join — verify with explain that no
    * per-row re-execution survives. l_quantity is integer-valued so the
    * avg boundary is engine-exact (integer sums in double are exact). */
  def q39ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    Tables.load(s, dir, "part").createOrReplaceTempView("part")
    s.sql(
      """SELECT p_brand,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Order-count histogram (TPC-H Q13 shape): LEFT join so zero-order
    * customers count, two stacked aggregations — both partial-agg'd, the
    * second one tiny (distinct counts ≤ max orders per customer). */
  def q40OrderHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count")) // count(col): NULLs don't count
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Supplier diversity per part attribute (TPC-H Q16 shape): distinct
    * suppliers per (brand, size) for non-promo parts, excluding suppliers
    * with negative balance via NOT IN (planned as null-aware anti join). */
  def q41SupplierDiversity(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type NOT LIKE 'PROMO%'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin)
  }

  /** Dormant rich customers (TPC-H Q22 shape): above-average balance with
    * no orders — scalar subquery + anti join in one statement. */
  def q42DormantCustomers(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_mktsegment, count(*) AS numcust,
        | CAST(sum(floor(c_acctbal * 100.0 + 0.5)) AS BIGINT) AS totacctbal_cents
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** Bilateral shipping volume by year (TPC-H Q7 shape): fact-fact join
    * plus two broadcast dimension legs and a year extraction — the
    * canonical multi-join with time bucketing. */
  def q43VolumeByYear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val ord = t(s, dir, "orders")
    val supp = t(s, dir, "supplier")
    val cust = t(s, dir, "customer")
    val n1 = broadcast(t(s, dir, "nation").select($"n_nationkey".as("s_nk"), $"n_name".as("supp_nation")))
    val n2 = broadcast(t(s, dir, "nation").select($"n_nationkey".as("c_nk"), $"n_name".as("cust_nation")))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(supp, $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(n1, $"s_nationkey" === $"s_nk")
      .join(n2, $"c_nationkey" === $"c_nk")
      .filter($"supp_nation" < $"cust_nation")
      .withColumn("l_year", year($"l_shipdate").cast("long"))
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5))
        .as("revenue_e4"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** accepted_values check shape (SURVEY §2.8): stray categorical values
    * per column, one fused scan. Expected zero rows of violations —
    * returned as counts so the result is non-empty either way. */
  def q56CheckAccepted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").agg(
      sum(when(!$"event_type".isin("click", "view", "purchase", "signup", "error"), 1L)
        .otherwise(0L)).as("bad_event_types"),
      count(lit(1)).as("n_rows"))
  }

  /** Disjunctive OR-of-ANDs predicate (TPC-H Q19 shape): Catalyst must
    * push the common conjuncts and keep the disjunction semantically
    * intact — the classic filter-simplification stress. */
  def q57DisjunctivePredicate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").join(t(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#1" && $"l_quantity".between(1, 11) && $"p_size".between(1, 5)) ||
        ($"p_brand" === "Brand#2" && $"l_quantity".between(10, 20) && $"p_size".between(1, 10)) ||
        ($"p_brand" === "Brand#3" && $"l_quantity".between(20, 30) && $"p_size".between(1, 15)))
      .agg(sum(floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5))
        .as("revenue_e4"),
        count(lit(1)).as("n"))
  }

  /** Multiple DISTINCT aggregates in one GROUP BY — Spark plans this via
    * Expand (one pass, grouping-id multiplexing), not N scans. */
  def q58MultiDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_orderkey").as("d_orders"),
        countDistinct($"l_partkey").as("d_parts"),
        countDistinct($"l_suppkey").as("d_supps"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // ------------------------------------------------------------- inventory

  /** One SQL text, two engines: the recursive closure is the acceptance
    * test for Spark 4's WITH RECURSIVE — results must match DuckDB's
    * evaluation of the identical statement. Each nation chains to the
    * NEXT key in its region (≤1 outgoing edge per node → the UNION ALL
    * walk generates each (node, reach) exactly once and terminates at
    * the chain tail), so no recursive dedup is needed on either engine. */
  private val recursiveClosureSql =
    """WITH RECURSIVE edges AS (
      |  SELECT a.n_nationkey AS src, min(b.n_nationkey) AS dst
      |  FROM nation a JOIN nation b
      |    ON a.n_regionkey = b.n_regionkey AND b.n_nationkey > a.n_nationkey
      |  GROUP BY a.n_nationkey),
      |walk(node, reach) AS (
      |  SELECT n_nationkey, n_nationkey FROM nation
      |  UNION ALL
      |  SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src),
      |agg AS (
      |  SELECT node, count(*) AS n_reachable, max(reach) AS chain_tail
      |  FROM walk GROUP BY node)
      |SELECT node AS n_nationkey, n_reachable, chain_tail
      |FROM agg ORDER BY n_nationkey""".stripMargin

  /** Recursive CTE (transitive closure along per-region nation chains)
    * executed by Spark's native WITH RECURSIVE. */
  def q133RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "nation").createOrReplaceTempView("nation")
    s.sql(recursiveClosureSql)
  }

  val queries: Map[String, Q] = Map(
    "q133_recursive_cte" -> (q133RecursiveCte _),
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_left_join" -> (q3LeftJoin _),
    "q4_join_multi" -> (q4JoinMulti _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_semi_join" -> (q6SemiJoin _),
    "q7_distinct" -> (q7Distinct _),
    "q8_latest_per_key" -> (q8LatestPerKey _),
    "q9_union" -> (q9Union _),
    "q10_json_get" -> (q10JsonGet _),
    "q11_regex_clean" -> (q11RegexClean _),
    "q12_cast_tolerant" -> (q12CastTolerant _),
    "q13_date_format" -> (q13DateFormat _),
    "q14_topk" -> (q14TopK _),
    "q15_window_running" -> (q15WindowRunning _),
    "q16_count_distinct" -> (q16CountDistinct _),
    "q17_conditional_agg" -> (q17ConditionalAgg _),
    "q18_check_unique" -> (q18CheckUniqueViolations _),
    "q19_check_metrics" -> (q19CheckMetrics _),
    "q20_check_relationships" -> (q20CheckRelationships _),
    "q197_inc_checks" -> (q197IncChecks _),
    "q32_sessionize" -> (q32Sessionize _),
    "q33_rollup" -> (q33Rollup _),
    "q39_scalar_subquery" -> (q39ScalarSubquery _),
    "q40_order_histogram" -> (q40OrderHistogram _),
    "q41_supplier_diversity" -> (q41SupplierDiversity _),
    "q42_dormant_customers" -> (q42DormantCustomers _),
    "q43_volume_by_year" -> (q43VolumeByYear _),
    "q56_check_accepted" -> (q56CheckAccepted _),
    "q57_disjunctive_predicate" -> (q57DisjunctivePredicate _),
    "q58_multi_distinct" -> (q58MultiDistinct _),
    "q61_pivot" -> (q61Pivot _),
    "q62_grouping_sets" -> (q62GroupingSets _),
    "q113_cube" -> (q113Cube _),
    "q156_cube" -> (q156Cube _),
    "q165_set_ops" -> (q165SetOps _),
    "q67_salted_join" -> (q67SaltedJoin _),
    "q68_salted_agg" -> (q68SaltedAgg _),
    "q69_lateral" -> (q69Lateral _),
    "q75_topk_per_key" -> (q75TopKPerKey _),
    "q76_bloom_prune" -> (q76BloomPrune _),
    "q83_cohort_retention" -> (q83CohortRetention _),
    "q84_funnel" -> (q84Funnel _),
    "q89_pagerank" -> (q89PageRank _),
    "q91_correlated_min" -> (q91CorrelatedMin _),
    "q92_string_agg" -> (q92StringAgg _)
  )

  val oracles: Map[String, String] = Map(
    "q133_recursive_cte" -> recursiveClosureSql,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT)
        |   AS sum_base_price_cents,
        | CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5))
        |      AS BIGINT) AS sum_disc_price_e4,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
        |            * 100.0 + 0.5) AS BIGINT) AS charge_cents
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_left_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q4_join_multi" ->
      """SELECT r_name, n_name,
        | CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5))
        |      AS BIGINT) AS revenue_e4,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q6_semi_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q7_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q8_latest_per_key" ->
      """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        | event_type, round(value, 4) AS value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q9_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q10_json_get" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q11_regex_clean" ->
      """SELECT event_id,
        | regexp_replace(concat('"', event_type, '"'), '^"|"$', '', 'g')
        |   AS event_type_clean
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q12_cast_tolerant" ->
      """SELECT event_id,
        | TRY_CAST(CASE WHEN event_type = 'error' THEN 'not-a-number'
        |               ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS id_int
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q13_date_format" ->
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
        | count(*) AS n_orders,
        | CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY d
        |ORDER BY d""".stripMargin,
    "q14_topk" ->
      """SELECT o_custkey,
        | CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY revenue_cents DESC, o_custkey
        |LIMIT 10""".stripMargin,
    "q15_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        | row_number() OVER w AS order_seq,
        | round(sum(o_totalprice) OVER w, 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q16_count_distinct" ->
      """SELECT c_mktsegment,
        | count(DISTINCT c_nationkey) AS n_nations,
        | count(*) AS n_customers
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q17_conditional_agg" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4)
        |   AS purchase_value,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_errors,
        | count(*) AS n_events
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q18_check_unique" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events
        |GROUP BY user_id, event_type
        |HAVING count(*) > 1
        |ORDER BY user_id, event_type""".stripMargin,
    "q19_check_metrics" ->
      """SELECT count(*) AS n_rows,
        | count(*) - count(o_custkey) AS null_custkey,
        | count(*) - count(o_orderdate) AS null_orderdate,
        | (SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |    GROUP BY o_orderkey HAVING count(*) > 1)) AS pk_dup_groups
        |FROM orders""".stripMargin,
    // q197: the three maintained test counts over net tables — customers
    // %7=3 deleted, %11=5 survivors doubled; orders %13=6 FK-nulled
    "q197_inc_checks" ->
      """WITH child AS (
        |  SELECT CASE WHEN o_orderkey % 13 = 6 THEN NULL
        |              ELSE o_custkey END AS k
        |  FROM orders),
        |parent AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 11 = 5 THEN 2 ELSE 1 END AS n
        |  FROM customer WHERE c_custkey % 7 <> 3)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM child
        |   WHERE k IS NOT NULL
        |     AND NOT EXISTS (SELECT 1 FROM parent p WHERE p.k = child.k))
        |    AS n_orphans,
        |  (SELECT CAST(count(*) AS BIGINT) FROM child WHERE k IS NULL)
        |    AS n_null_fk,
        |  (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) FROM parent
        |   WHERE n > 1) AS n_dup_pk""".stripMargin,
    "q20_check_relationships" ->
      """SELECT DISTINCT l_orderkey
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |ORDER BY l_orderkey""".stripMargin,
    "q32_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sessioned AS (
        |  SELECT *, CAST(sum(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id
        |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq,
        |  count(*) AS n_events,
        |  min(ts_us) AS session_start_us,
        |  max(ts_us) AS session_end_us,
        |  round(sum(value), 4) AS session_value
        |FROM sessioned
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q33_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,
    "q39_scalar_subquery" ->
      """SELECT p_brand,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS revenue_cents,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q40_order_histogram" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q41_supplier_diversity" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type NOT LIKE 'PROMO%'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q42_dormant_customers" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        | CAST(sum(floor(c_acctbal * 100.0 + 0.5)) AS BIGINT) AS totacctbal_cents
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q43_volume_by_year" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5))
        |      AS BIGINT) AS revenue_e4
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name < n2.n_name
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q56_check_accepted" ->
      """SELECT
        | CAST(sum(CASE WHEN event_type NOT IN
        |   ('click', 'view', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END)
        |   AS BIGINT) AS bad_event_types,
        | count(*) AS n_rows
        |FROM events""".stripMargin,
    "q57_disjunctive_predicate" ->
      """SELECT
        | CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5))
        |      AS BIGINT) AS revenue_e4,
        | count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q58_multi_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_orderkey) AS d_orders,
        | count(DISTINCT l_partkey) AS d_parts,
        | count(DISTINCT l_suppkey) AS d_supps,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q61_pivot" ->
      """SELECT user_id % 10 AS bucket,
        | count(*) FILTER (WHERE event_type = 'click') AS n_click,
        | count(*) FILTER (WHERE event_type = 'error') AS n_error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        | count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events
        |GROUP BY user_id % 10
        |ORDER BY bucket""".stripMargin,
    "q62_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
        | coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_customers,
        | CAST(sum(floor(c_acctbal * 100.0 + 0.5)) AS BIGINT) AS total_bal_cents
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY region, nation""".stripMargin,
    "q113_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n,
        | CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q156_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        | coalesce(l_linestatus, 'ALL') AS status,
        | CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
        | CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
        | count(*) AS n,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT)
        |   AS rev_cents
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, flag, status""".stripMargin,
    "q165_set_ops" ->
      """WITH y95 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1995),
        |y96 AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996)
        |SELECT 'both' AS tag, o_custkey FROM
        |  (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
        |UNION ALL
        |SELECT 'only_1995' AS tag, o_custkey FROM
        |  (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q67_salted_join" ->
      """SELECT s_nationkey, count(*) AS n,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS rev_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin,
    "q68_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT) AS rev_cents
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q69_lateral" ->
      """SELECT n.n_name AS nation, t.c_name, t.bal_cents
        |FROM nation n,
        | LATERAL (SELECT c_name,
        |            CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
        |          FROM customer
        |          WHERE c_nationkey = n.n_nationkey
        |          ORDER BY c_acctbal DESC, c_name
        |          LIMIT 2) t
        |ORDER BY nation, bal_cents DESC, c_name""".stripMargin,
    "q75_topk_per_key" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rank, price_cents, o_orderkey
        |FROM (SELECT o_custkey,
        |        CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
        |        o_orderkey,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY floor(o_totalprice * 100.0 + 0.5) DESC,
        |                   o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rank""".stripMargin,
    "q76_bloom_prune" ->
      """SELECT o_orderpriority,
        | CAST(sum(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5))
        |      AS BIGINT) AS rev_e4,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000.0
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q83_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_d
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT strftime(f.cohort_d, '%Y-%m-%d') AS cohort_day,
        |  CAST(act.d - f.cohort_d AS BIGINT) AS day_offset,
        |  count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN f ON act.user_id = f.user_id
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "q84_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
        |UNION ALL
        |SELECT '2_view_after_signup', count(*) FROM s2
        |UNION ALL
        |SELECT '3_purchase_after_view', count(*) FROM s3
        |ORDER BY stage""".stripMargin,
    "q89_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |bi AS (
        |  SELECT src, dst FROM e
        |  UNION ALL
        |  SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
        |nodes AS (
        |  SELECT DISTINCT node FROM
        |    (SELECT src AS node FROM bi UNION ALL SELECT dst FROM bi)),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r0 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r1 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r1 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r2 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r2 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r3 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, r FROM r3
        |ORDER BY r DESC, node
        |LIMIT 100""".stripMargin,
    "q91_correlated_min" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cost_cents
        |  FROM lineitem)
        |SELECT l_partkey, l_suppkey, cost_cents
        |FROM li a
        |WHERE cost_cents = (SELECT min(cost_cents) FROM li b
        |                    WHERE b.l_partkey = a.l_partkey)
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q92_string_agg" ->
      """SELECT c_mktsegment,
        |  list_aggregate(list_sort(list_distinct(list(n_name))), 'string_agg', ',')
        |    AS nations,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin
  )
}
