package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** As-of (point-in-time) join: each left row picks up the value columns
  * of the temporally closest right row for the same key — the temporal
  * join behind feature lookups and snapshot enrichment that Spark has no
  * native operator for.
  *
  * Directions (pandas `merge_asof` / DuckDB ASOF semantics):
  *   - `backward` (default): latest right row with `right.ts <= left.ts`
  *   - `forward`:  earliest right row with `right.ts >= left.ts`
  *   - `nearest`:  whichever of the two is closer in time (ties →
  *     backward, the conventional pick)
  * `tolerance` (seconds) nulls the match when the matched row is further
  * than that from the left timestamp — max-staleness for feature
  * pipelines. `allowExactMatches = false` makes the comparison strict
  * (`<` / `>`, pandas `allow_exact_matches=False`) — the equal-timestamp
  * right row no longer matches.
  *
  * Spark-first formulation (composition beats a custom SparkPlan here):
  * tag and union both sides, then a single `last(struct, ignoreNulls)`
  * window over (key) ordered by (ts, side) carries the most recent right
  * ROW forward into each left row — the struct is non-null exactly for
  * right rows, so a right row whose value column is null still matches
  * (its null is carried, not skipped). `forward` is the same carry with
  * the ordering reversed; `nearest` evaluates both windows over the SAME
  * key partitioning, so the plan still has ONE shuffle (two in-partition
  * sorts). No range-condition join (which Spark plans as a
  * broadcast-nested-loop) and no pair explosion, regardless of how many
  * right rows precede a left row.
  *
  * Right rows should be unique per (keys, rightTs) — pre-dedup with
  * `Dedup.latestPerKey` otherwise; ties at identical ts make "the"
  * latest row ambiguous in ANY as-of semantics.
  */
object AsOf {

  /** Left rows + `valueCols` from the as-of-matched right row (null when
    * nothing matches within direction/tolerance). `leftTs`/`rightTs`
    * name each side's event time; output keeps all left columns plus one
    * `asof_<c>` per value column.
    *
    * PRECONDITION: right rows must be unique per (keys, rightTs). With
    * duplicate right timestamps the ROW-frame carry picks an arbitrary
    * one of the tied rows — pre-dedup with `Dedup.latestPerKeyAgg` (as
    * q43 does) when the contract isn't guaranteed upstream.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Double] = None,
      allowExactMatches: Boolean = true): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    tolerance.foreach(t => require(t >= 0, "tolerance must be >= 0 seconds"))
    val reserved = Seq("__ts", "__side", "__back", "__fwd", "__pick") ++
      valueCols.map(c => s"__v_$c")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"asOfJoin reserves columns ${reserved.mkString(", ")}")
    require(!valueCols.contains("__mts"),
      "asOfJoin reserves the __mts struct field for the matched timestamp")
    val leftCols = left.columns.toSeq
    // right side: only keys + ts + values, tagged side=0 so it sorts
    // adjacent-BEFORE left rows at an identical timestamp in both
    // orderings (<= / >= inclusive semantics). Null keys or timestamps
    // never compare true in a join condition, so such right rows are
    // unmatchable — drop them up front (a null ts would otherwise sort to
    // the partition start and be carried into every row, and null keys
    // would pair with null-key left rows).
    val r = right
      .filter((keys :+ rightTs).map(col(_).isNotNull).reduce(_ && _))
      .select(
        (keys.map(col) :+ col(rightTs).as("__ts")) ++
          valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__side", lit(0))
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // the matched right ROW, with its own timestamp riding along so
    // tolerance/nearest can measure the distance
    val rightRow = when(col("__side") === 0,
      struct((col("__ts").as("__mts") +:
        valueCols.map(c => col(s"__v_$c").as(c))): _*))
    def carry(order: Seq[Column]): Column =
      last(rightRow, ignoreNulls = true).over(
        Window.partitionBy(keys.map(col): _*)
          .orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // inclusive (<= / >=): right sorts BEFORE left at an identical ts so
    // the equal-ts row is carried into the left row; strict (< / >,
    // pandas allow_exact_matches=False): right sorts AFTER, so it isn't
    val side = if (allowExactMatches) col("__side").asc else col("__side").desc
    val back = carry(Seq(col("__ts").asc, side))
    val fwd = carry(Seq(col("__ts").desc, side))

    // distances: timestamps subtract in exact integer MICROSECONDS
    // (casting each operand to double seconds first rounds at ~2.4e-7 s
    // near current epochs — enough to flip a match sitting exactly at
    // the tolerance boundary, or an exact nearest tie, vs an engine
    // doing interval arithmetic). Differences stay < 2^53 so the
    // long-vs-tolerance*1e6 compare below is exact. Plain numeric ts
    // columns keep the double-seconds path.
    val tsType = left.schema(leftTs).dataType
    val exactMicros = tsType == TimestampType || tsType == TimestampNTZType
    // the NTZ->instant cast applies the SESSION timezone; across a DST
    // transition wall-clock differences then map nonlinearly to instant
    // differences (a 100-min wall gap can become 40 min), so NTZ inputs
    // demand a DST-free zone — require the unambiguous one
    if (tsType == TimestampNTZType)
      require(left.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "asOfJoin on TIMESTAMP_NTZ requires spark.sql.session.timeZone=UTC " +
          "(DST transitions would distort tolerance/nearest distances)")
    def dist(m: Column): Column =
      if (exactMicros)
        abs(unix_micros(col("__ts").cast(TimestampType)) -
          unix_micros(m.getField("__mts").cast(TimestampType)))
      else abs(col("__ts").cast("double") - m.getField("__mts").cast("double"))
    val tolBound = tolerance.map(t => if (exactMicros) lit(t * 1e6) else lit(t))
    // a null left timestamp matches nothing in any direction (SQL
    // comparison semantics). Backward gets this for free (asc = NULLS
    // FIRST puts the row before every right row), but desc = NULLS LAST
    // would hand the forward carry the minimum-ts right row — guard
    // explicitly rather than rely on sort-order accidents.
    def withinTol(m: Column): Column = tolBound match {
      case Some(b) => col("__ts").isNotNull && m.isNotNull && dist(m) <= b
      case None => col("__ts").isNotNull && m.isNotNull
    }

    val picked = direction match {
      case "backward" =>
        unioned.withColumn("__back", back)
          .withColumn("__pick", when(withinTol(col("__back")), col("__back")))
      case "forward" =>
        unioned.withColumn("__fwd", fwd)
          .withColumn("__pick", when(withinTol(col("__fwd")), col("__fwd")))
      case "nearest" =>
        unioned.withColumn("__back", back).withColumn("__fwd", fwd)
          .withColumn("__pick", {
            val b = when(withinTol(col("__back")), col("__back"))
            val f = when(withinTol(col("__fwd")), col("__fwd"))
            // both valid → closer wins, backward on ties; else whichever exists
            when(b.isNotNull && f.isNotNull,
              when(dist(col("__back")) <= dist(col("__fwd")), b).otherwise(f))
              .otherwise(coalesce(b, f))
          })
    }
    picked
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__pick.$c").as(s"asof_$c")): _*)
  }
}
