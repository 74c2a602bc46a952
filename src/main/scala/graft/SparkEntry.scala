package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Driver contract — every operator from SURVEY.md §2 exposed as a named
  * query over the driver testdata, with a DuckDB-oracle SQL twin.
  *
  * Determinism ground rules (so Spark and DuckDB hash-match):
  *   - money sums go through DECIMAL(18,2) then cast to DOUBLE (exact,
  *     order-independent); raw double sums are order-dependent.
  *   - never `round()` a computed double: Spark rounds the shortest
  *     decimal repr (BigDecimal.valueOf), DuckDB rounds the binary value —
  *     they disagree near ties. Plain IEEE `* / + -` is bit-identical.
  *   - every window order fully pins ties with a unique trailing key.
  *   - event timestamps are nanos in parquet; both engines are normalized
  *     to microseconds (Spark: nanosAsLong + timestamp_micros; DuckDB:
  *     implicit TIMESTAMP_NS → TIMESTAMP truncation).
  */
object SparkEntry {

  /** events.parquet carries TIMESTAMP(NANOS) which Spark cannot read
    * natively; read nanos as long and truncate to micros (matches
    * DuckDB's implicit ns→us truncation).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Integral division: ts/1000 as double loses precision on epoch nanos
    // (1.7e18 exceeds double's 53-bit mantissa).
    Tables.events(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  private def decSum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(18, 2))).cast(DoubleType)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_top_parts_per_flag")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1-A5: grouped agg with conditional count, distinct count, max
    // (reference: gold.py:33-48, bronze.py:153-158)
    "q01_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          decSum("l_extendedprice").as("sum_base_price"),
          count(lit(1)).as("cnt"),
          countDistinct(col("l_partkey")).as("n_parts"),
          Aggregates.conditionalCount(col("l_discount") > 0.05).as("high_disc"),
          max(col("l_shipdate")).as("max_ship"))
    }),

    // W2+O3+J3+A10 flagship: top-10 per group with share of total
    // (reference: gold.py:32-73)
    "q02_top_parts_per_flag" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val counts = Aggregates.groupCounts(Seq("l_returnflag", "l_linestatus", "l_partkey"))(li)
      val ranked = Rankings.topNPerGroup(
        Seq("l_returnflag", "l_linestatus"),
        Seq(col("cnt").desc, col("l_partkey").asc), 10)(counts)
      val totals = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("total_cnt"))
      ranked.join(totals, Seq("l_returnflag", "l_linestatus"))
        .withColumn("share_pct", lit(100.0) * col("cnt") / col("total_cnt"))
        .select("l_returnflag", "l_linestatus", "l_partkey", "cnt", "rnk", "share_pct")
    }),

    // W3+W4: RANK + windowed-sum share (reference: gold.py:88-136)
    "q03_rank_share" -> ((s, dir) => {
      val counts = Aggregates.groupCounts(Seq("o_orderpriority", "o_orderstatus"))(
        Tables.orders(s, dir))
      Rankings.rankAndShare(
        Seq("o_orderpriority"), "cnt",
        Seq(col("cnt").desc, col("o_orderstatus").asc))(counts)
        .select("o_orderpriority", "o_orderstatus", "cnt", "rnk", "share_pct")
    }),

    // W5: LAG year-over-year deltas (reference: gold.py:117-135)
    "q04_yoy_orders" -> ((s, dir) => {
      val byYear = Tables.orders(s, dir)
        .withColumn("order_year", year(col("o_orderdate")))
        .groupBy(col("o_orderpriority"), col("order_year"))
        .agg(count(lit(1)).as("cnt"))
      Rankings.lagDelta(Seq("o_orderpriority"), "order_year", "cnt",
        "prev_cnt", "yoy_diff")(byYear)
    }),

    // A8: manual pivot of top-3 ranks to columns (reference: gold.py:196-201)
    "q05_pivot_top3_events" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("bucket", col("user_id") % 10)
      val counts = Aggregates.groupCounts(Seq("bucket", "event_type"))(ev)
      val ranked = Rankings.topNPerGroup(Seq("bucket"),
        Seq(col("cnt").desc, col("event_type").asc), 3)(counts)
      Rankings.pivotTopK(Seq("bucket"), "rnk", "event_type", 3)(ranked)
    }),

    // W1: dedup keep-newest-per-key (reference: silver.py:81-85)
    "q06_latest_event_per_user" -> ((s, dir) => {
      Dedup.latestPerKey(Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))(events(s, dir))
        .select("user_id", "event_id", "event_type", "value", "ts")
    }),

    // J1: insert-only anti-join idempotency core (reference: bronze.py:111-112)
    "q07_incremental_antijoin" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val cutoff = to_timestamp(lit("2000-01-01"))
      val batch = li.filter(col("l_shipdate") >= cutoff)
      val existing = li.filter(col("l_shipdate") < cutoff)
      Idempotency.newKeysOnly(batch, existing, Seq("l_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // J2: broadcast dim enrichment with mapped-flag + fallback
    // (reference: silver.py:53-68)
    "q08_enrich_parts" -> ((s, dir) => {
      val facts = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_returnflag"))
        .withColumn("fallback_name", lit("UNKNOWN"))
      val dim = Tables.part(s, dir).filter(col("p_size") <= 25)
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      Enrich.fromDim(facts, dim, "l_partkey", "p_name",
        "resolved_name", "fallback_name", "name_mapped")
        .drop("fallback_name")
    }),

    // P1-P9 + §2.8 scalars: standardize / validate / null-out
    // (reference: bronze.py:84-95, silver.py:38-49)
    "q09_standardize_text" -> ((s, dir) => {
      Tables.customer(s, dir).select(
        col("c_custkey"),
        upper(trim(col("c_mktsegment"))).as("segment_std"),
        Standardize.normalizedKey(col("c_name")).as("name_key"),
        (col("c_name").isNotNull && col("c_name").rlike("^Customer#[0-9]{9}$")).as("name_valid"),
        when(col("c_acctbal") >= 0, col("c_acctbal")).as("acctbal_nonneg"),
        substring(col("c_name"), 10, 4).as("name_suffix"),
        length(col("c_name")).cast(IntegerType).as("name_len"))
    }),

    // S11: MERGE upsert emulation (reference: breed_mapping.py:596-603)
    "q10_merge_upsert" -> ((s, dir) => {
      val target = Tables.part(s, dir)
      val changed = target.filter(col("p_partkey") % 7 === 0)
        .withColumn("p_name", concat(col("p_name"), lit(" v2")))
        .withColumn("p_retailprice", col("p_retailprice") + 50.0)
      val inserts = changed.withColumn("p_partkey", col("p_partkey") + 1000000L)
      Merge.upsert(target, changed.unionByName(inserts), Seq("p_partkey"))
    }),

    // A3+A10: grouped quality metrics with null-guarded ratio
    // (reference: gold.py:289-309)
    "q11_quality_grouped" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("rows_cnt"),
          Aggregates.conditionalCount(col("l_discount") > 0.05).as("high_disc"),
          countDistinct(col("l_partkey")).as("n_parts"),
          max(col("l_shipdate")).as("max_ship"))
        .withColumn("pct_high_disc",
          when(col("rows_cnt") === 0, lit(null).cast(DoubleType))
            .otherwise(lit(100.0) * col("high_disc") / col("rows_cnt")))
    }),

    // A2: global health aggregate (reference: bronze.py:153-158)
    "q12_global_health" -> ((s, dir) => {
      Tables.orders(s, dir).agg(
        count(lit(1)).as("total_rows"),
        countDistinct(col("o_custkey")).as("n_customers"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        Aggregates.conditionalCount(col("o_orderstatus") === "F").as("finished_cnt"))
        .withColumn("pct_finished", lit(100.0) * col("finished_cnt") / col("total_rows"))
    }),

    // §2.8 date/string scalars: date_format, substring, length guard
    // (reference: gold.py:224-227,325; bronze.py:33-38)
    "q13_date_scalars" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(length(col("o_orderpriority")) >= 5)
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("prio_class", substring(col("o_orderpriority"), 1, 1))
        .groupBy(col("order_month"), col("prio_class"))
        .agg(count(lit(1)).as("cnt"), decSum("o_totalprice").as("sum_price"))
    }),

    // J4: 1x1 cross-join scalar combine (reference: breed_mapping.py:636-648)
    "q14_coverage_crossjoin" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val dimKeys = Tables.part(s, dir).filter(col("p_size") <= 25)
        .select(col("p_partkey").as("l_partkey"))
      val total = li.agg(count(lit(1)).as("total_rows"))
      val unmatched = li.join(dimKeys, Seq("l_partkey"), "left_anti")
        .agg(count(lit(1)).as("unmatched_rows"))
      total.crossJoin(unmatched)
        .withColumn("pct_unmatched", lit(100.0) * col("unmatched_rows") / col("total_rows"))
    }),

    // §2.7: set operations (union / intersect / except)
    "q15_set_ops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val fOnly = f.except(op).withColumn("category", lit("F_ONLY"))
      val oOnly = op.except(f).withColumn("category", lit("O_ONLY"))
      val both = f.intersect(op).withColumn("category", lit("BOTH"))
      fOnly.union(oOnly).union(both)
        .groupBy(col("category")).agg(count(lit(1)).as("cnt"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(l_quantity) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | COUNT(*) AS cnt,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_disc,
        | MAX(l_shipdate) AS max_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_parts_per_flag" ->
      """WITH counts AS (
        |  SELECT l_returnflag, l_linestatus, l_partkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1,2,3),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
        |    ORDER BY cnt DESC, l_partkey ASC) AS rnk FROM counts),
        |totals AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS total_cnt
        |  FROM lineitem GROUP BY 1,2)
        |SELECT r.l_returnflag, r.l_linestatus, r.l_partkey, r.cnt, r.rnk,
        |  100.0 * r.cnt / t.total_cnt AS share_pct
        |FROM ranked r JOIN totals t
        |  ON r.l_returnflag = t.l_returnflag AND r.l_linestatus = t.l_linestatus
        |WHERE r.rnk <= 10""".stripMargin,

    "q03_rank_share" ->
      """WITH counts AS (
        |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1,2)
        |SELECT o_orderpriority, o_orderstatus, cnt,
        |  RANK() OVER (PARTITION BY o_orderpriority ORDER BY cnt DESC, o_orderstatus ASC) AS rnk,
        |  100.0 * cnt / SUM(cnt) OVER (PARTITION BY o_orderpriority) AS share_pct
        |FROM counts""".stripMargin,

    "q04_yoy_orders" ->
      """WITH by_year AS (
        |  SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INT) AS order_year, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1,2)
        |SELECT o_orderpriority, order_year, cnt,
        |  LAG(cnt, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year) AS prev_cnt,
        |  cnt - LAG(cnt, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year) AS yoy_diff
        |FROM by_year""".stripMargin,

    "q05_pivot_top3_events" ->
      """WITH counts AS (
        |  SELECT user_id % 10 AS bucket, event_type, COUNT(*) AS cnt
        |  FROM events GROUP BY 1,2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
        |    ORDER BY cnt DESC, event_type ASC) AS rnk FROM counts)
        |SELECT bucket,
        |  MAX(CASE WHEN rnk = 1 THEN event_type END) AS event_type_1,
        |  MAX(CASE WHEN rnk = 2 THEN event_type END) AS event_type_2,
        |  MAX(CASE WHEN rnk = 3 THEN event_type END) AS event_type_3
        |FROM ranked WHERE rnk <= 3 GROUP BY bucket""".stripMargin,

    "q06_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, value, ts FROM (
        |  SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,

    "q07_incremental_antijoin" ->
      """SELECT l_returnflag, COUNT(*) AS cnt, COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem b
        |WHERE b.l_shipdate >= TIMESTAMP '2000-01-01' AND NOT EXISTS (
        |  SELECT 1 FROM lineitem e
        |  WHERE e.l_shipdate < TIMESTAMP '2000-01-01' AND e.l_orderkey = b.l_orderkey)
        |GROUP BY l_returnflag""".stripMargin,

    "q08_enrich_parts" ->
      """SELECT b.l_orderkey, b.l_linenumber, b.l_partkey, b.l_returnflag,
        |  p.p_name IS NOT NULL AS name_mapped,
        |  COALESCE(p.p_name, 'UNKNOWN') AS resolved_name
        |FROM lineitem b LEFT JOIN
        |  (SELECT p_partkey, p_name FROM part WHERE p_size <= 25) p
        |  ON b.l_partkey = p.p_partkey""".stripMargin,

    "q09_standardize_text" ->
      """SELECT c_custkey,
        |  UPPER(TRIM(c_mktsegment)) AS segment_std,
        |  REGEXP_REPLACE(UPPER(TRIM(c_name)), '[^A-Z0-9]', '', 'g') AS name_key,
        |  c_name IS NOT NULL AND REGEXP_MATCHES(c_name, '^Customer#[0-9]{9}$') AS name_valid,
        |  CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS acctbal_nonneg,
        |  SUBSTRING(c_name, 10, 4) AS name_suffix,
        |  CAST(LENGTH(c_name) AS INT) AS name_len
        |FROM customer""".stripMargin,

    "q10_merge_upsert" ->
      """WITH u AS (
        |  SELECT p_partkey, p_name || ' v2' AS p_name, p_brand, p_type, p_size,
        |    p_retailprice + 50.0 AS p_retailprice
        |  FROM part WHERE p_partkey % 7 = 0
        |  UNION ALL
        |  SELECT p_partkey + 1000000, p_name || ' v2', p_brand, p_type, p_size,
        |    p_retailprice + 50.0
        |  FROM part WHERE p_partkey % 7 = 0)
        |SELECT COALESCE(u.p_partkey, t.p_partkey) AS p_partkey,
        |  CASE WHEN u.p_partkey IS NOT NULL THEN u.p_name ELSE t.p_name END AS p_name,
        |  CASE WHEN u.p_partkey IS NOT NULL THEN u.p_brand ELSE t.p_brand END AS p_brand,
        |  CASE WHEN u.p_partkey IS NOT NULL THEN u.p_type ELSE t.p_type END AS p_type,
        |  CASE WHEN u.p_partkey IS NOT NULL THEN u.p_size ELSE t.p_size END AS p_size,
        |  CASE WHEN u.p_partkey IS NOT NULL THEN u.p_retailprice ELSE t.p_retailprice END AS p_retailprice
        |FROM part t FULL OUTER JOIN u ON t.p_partkey = u.p_partkey""".stripMargin,

    "q11_quality_grouped" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS rows_cnt,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_disc,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  MAX(l_shipdate) AS max_ship,
        |  CASE WHEN COUNT(*) = 0 THEN NULL
        |    ELSE 100.0 * SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / COUNT(*) END AS pct_high_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q12_global_health" ->
      """SELECT COUNT(*) AS total_rows,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  MIN(o_orderdate) AS first_order,
        |  MAX(o_orderdate) AS last_order,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
        |  100.0 * SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) / COUNT(*) AS pct_finished
        |FROM orders""".stripMargin,

    "q13_date_scalars" ->
      """SELECT STRFTIME(o_orderdate, '%Y-%m') AS order_month,
        |  SUBSTRING(o_orderpriority, 1, 1) AS prio_class,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE LENGTH(o_orderpriority) >= 5
        |GROUP BY 1, 2""".stripMargin,

    "q14_coverage_crossjoin" ->
      """WITH total AS (SELECT COUNT(*) AS total_rows FROM lineitem),
        |unmatched AS (
        |  SELECT COUNT(*) AS unmatched_rows FROM lineitem b
        |  WHERE NOT EXISTS (SELECT 1 FROM part p
        |    WHERE p.p_size <= 25 AND p.p_partkey = b.l_partkey))
        |SELECT t.total_rows, u.unmatched_rows,
        |  100.0 * u.unmatched_rows / t.total_rows AS pct_unmatched
        |FROM total t CROSS JOIN unmatched u""".stripMargin,

    "q15_set_ops" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |cats AS (
        |  SELECT o_custkey, 'F_ONLY' AS category FROM (SELECT * FROM f EXCEPT SELECT * FROM o)
        |  UNION ALL
        |  SELECT o_custkey, 'O_ONLY' AS category FROM (SELECT * FROM o EXCEPT SELECT * FROM f)
        |  UNION ALL
        |  SELECT o_custkey, 'BOTH' AS category FROM (SELECT * FROM f INTERSECT SELECT * FROM o))
        |SELECT category, COUNT(*) AS cnt FROM cats GROUP BY category""".stripMargin
  )
}
