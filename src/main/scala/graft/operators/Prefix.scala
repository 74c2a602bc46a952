package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed EXACT grouped prefix sum — the scale-out backing for the
  * corpus sequencing operators ([[graft.pipeline.CorpusPipeline]]'s
  * `tokenBudget` / `packSequences`), whose natural Spark expression —
  * `sum(value) OVER (PARTITION BY group ORDER BY ... ROWS UNBOUNDED
  * PRECEDING)` — runs each group in ONE window task. A training-data
  * pipeline groups by dataset/source, so at 100 TB a handful of tasks
  * would serially cumsum billions of rows, and WindowExec cannot be
  * split by AQE. Reference scope: the cumulative budgeting/packing
  * semantics themselves are the reference's (SURVEY §2 corpus ops);
  * this is the Spark-native parallel decomposition.
  *
  * The classic two-phase prefix sum:
  *
  *  1. range-repartition by `(group, order...)`: Spark's distributed
  *     sort makes each group a CONTIGUOUS run of partitions;
  *  2. job 1 streams each partition once, emitting only its FIRST and
  *     LAST group's totals (interior groups cannot cross a partition
  *     boundary, so two tiny tuples per partition suffice);
  *  3. the driver folds those edge totals into one offset per
  *     partition (the amount its first group accumulated in earlier
  *     partitions) and broadcasts the map;
  *  4. job 2 re-streams the same shuffle output (the exchange is
  *     reused — the sort is NOT recomputed) adding running sums plus
  *     the offset while inside the partition's first group.
  *
  * Long arithmetic throughout, so the result is bit-identical to the
  * window cumsum under ANY partitioning — PrefixSpec proves equality
  * property-style and the q44/q54 DuckDB oracles gate the swapped-in
  * callers. Contracts shared with the window form: ties in `orderCols`
  * must be pinned with a unique id (row order is then total, and the
  * range partitioner only cuts between ordered rows); null `valueCol`
  * counts as 0 (callers feed non-null token counts).
  *
  * Appends `outCol` = inclusive running sum of `valueCol` (cast to
  * long) within `groupCol` in `orderCols` order.
  *
  * Laziness/liveness contract (the [[graft.dedup.LineDedup]]
  * convention): the edge-totals job and its driver fold run AT CALL
  * TIME — building the result executes Spark jobs. Later actions on
  * the result re-stream only pass 4 against the already-materialized
  * shuffle; the offsets ride a broadcast.
  */
object Prefix {

  def groupedCumsum(df: DataFrame, groupCol: String, valueCol: String,
      orderCols: Seq[Column], outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains(outCol), s"$outCol already exists")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sortKeys = col(groupCol).asc +: orderCols
    // Materialize the input ONCE before the range exchange:
    // RangePartitioner's reservoir-sampling pass evaluates the full
    // child plan, so an un-materialized child runs twice — for the
    // q44/q54 callers that means re-tokenizing the whole corpus just to
    // sample the shuffle key. groupedCumsum is already eager (job 1
    // collects at call time — see the laziness contract above), so the
    // checkpoint changes no semantics; it pins the (typically narrow,
    // caller-projected) annotated rows and both the sampler and the
    // shuffle writer stream them back instead of recomputing upstream.
    val sorted = df
      .withColumn(outCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
      .localCheckpoint()
      .repartitionByRange(parts, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val schema = sorted.schema
    val gIdx = schema.fieldIndex(groupCol)
    val vIdx = schema.fieldIndex(outCol)
    val gType = schema(gIdx).dataType

    // ONE rdd object: both jobs below hang off the same shuffle
    // dependency, so the range exchange + sort executes once
    val rdd = sorted.queryExecution.toRdd

    def sameGroup(a: Any, b: Any): Boolean =
      if (a == null) b == null else a == b
    // group values read off a reused UnsafeRow buffer must be copied
    // before they outlive the row
    def copyOf(v: Any): Any = InternalRow.copyValue(v)

    // job 1: per-partition edge totals, one streaming pass, O(1) state
    // tuple: (pid, nonEmpty, firstGroup, firstTotal, lastGroup, lastTotal)
    val edges = rdd.mapPartitionsWithIndex { (pid, it) =>
      var any = false
      var firstG: Any = null
      var firstT = 0L
      var firstClosed = false
      var curG: Any = null
      var run = 0L
      while (it.hasNext) {
        val r = it.next()
        val g = r.get(gIdx, gType)
        if (!any) { any = true; curG = copyOf(g); firstG = curG }
        else if (!sameGroup(curG, g)) {
          if (!firstClosed) { firstT = run; firstClosed = true }
          curG = copyOf(g)
          run = 0L
        }
        run += r.getLong(vIdx)
      }
      if (any && !firstClosed) firstT = run
      Iterator.single((pid, any, firstG, firstT, curG, run))
    }.collect().sortBy(_._1)

    // driver fold (≤ parts tuples): partition p's first group may reach
    // back through any number of earlier partitions that END with the
    // same group; whole-group partitions and empty partitions pass
    // through, any other composition terminates the walk
    val offsets = Map.newBuilder[Int, Long]
    for (p <- edges; if p._2) {
      val (pid, _, fg, _, _, _) = p
      var acc = 0L
      var q = pid - 1
      var walking = true
      while (q >= 0 && walking) {
        val e = edges(q)
        if (!e._2) q -= 1 // empty partition: keep looking left
        else if (sameGroup(e._5, fg)) {
          acc += e._6
          if (sameGroup(e._3, fg) && sameGroup(e._3, e._5)) q -= 1
          else walking = false
        } else walking = false
      }
      if (acc != 0L) offsets += pid -> acc
    }
    val bcast = spark.sparkContext.broadcast(offsets.result())

    // job 2: same shuffle output, streaming running sums + edge offset
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bcast.value.getOrElse(pid, 0L)
      var any = false
      var inFirst = true
      var curG: Any = null
      var run = 0L
      it.map { r =>
        val g = r.get(gIdx, gType)
        if (!any) { any = true; curG = copyOf(g) }
        else if (!sameGroup(curG, g)) {
          curG = copyOf(g)
          run = 0L
          inFirst = false
        }
        run += r.getLong(vIdx)
        r.setLong(vIdx, if (inFirst) run + off else run)
        r
      }
    }
    org.apache.spark.sql.graft.GraftInternal.ofRows(spark, summed, schema)
  }
}
