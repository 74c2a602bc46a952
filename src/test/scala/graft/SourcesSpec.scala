package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(): String =
    Files.createTempDirectory("graft-sources").toString

  test("exportCsv writes one headered CSV per view under export_date") {
    val out = tempDir()
    val v1 = Seq((2024, "DOG", 10L), (2024, "CAT", 7L)).toDF("Year", "ANIMAL_TYPE", "total")
    val v2 = Seq(("GOLDEN RETRIEVER", 5L)).toDF("breed", "cnt")
    Sources.exportCsv(Map("v_totals" -> v1, "v_breeds" -> v2), out, "2025-06-01")

    val back = spark.read.option("header", "true")
      .csv(s"$out/export_date=2025-06-01/v_totals")
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("Year", "ANIMAL_TYPE", "total"))
    // single part file per view
    val parts = new java.io.File(s"$out/export_date=2025-06-01/v_totals")
      .listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1)
  }

  test("compact rewrites many small files into few, preserving data and partitions") {
    val dir = tempDir() + "/table"
    val df = (1 to 1000).map(i => (i, i % 3, s"val_$i")).toDF("id", "bucket", "v")
    // write fragmented: many tiny files per partition
    df.repartition(20).write.partitionBy("bucket").parquet(dir)
    val filesBefore = Files.walk(java.nio.file.Paths.get(dir)).iterator()
    val nBefore = {
      import scala.jdk.CollectionConverters._
      filesBefore.asScala.count(_.toString.endsWith(".parquet"))
    }
    assert(nBefore >= 20)

    Sources.compact(spark, dir, Seq("bucket"))

    import scala.jdk.CollectionConverters._
    val nAfter = Files.walk(java.nio.file.Paths.get(dir)).iterator()
      .asScala.count(_.toString.endsWith(".parquet"))
    assert(nAfter < nBefore)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select(sum("id")).first().getLong(0) == (1 to 1000).sum.toLong)
    assert(back.select("bucket").distinct().count() == 3)
  }

  test("catalog DDL: CREATE TABLE ... PARTITIONED BY ... LOCATION round-trips with pruning") {
    import org.apache.spark.sql.types._
    val loc = tempDir() + "/pets_bronze"
    // partition column last, matching the reference DDL layout
    // (notebooks/bronze.py:132-146 declares data cols then partition cols)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("v", StringType),
      StructField("part", StringType)))
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    Sources.createPartitionedTable(spark, "graft_ddl_t", schema, Seq("part"), loc)

    // S9 through the real catalog path: SQL INSERT INTO VALUES
    spark.sql("INSERT INTO graft_ddl_t VALUES (1, 'x', 'a'), (2, 'y', 'b')")
    // and the DataFrame path (positional, INSERT INTO semantics)
    Sources.insertAppend(Seq((3, "z", "a")).toDF("id", "v", "part"), "graft_ddl_t")
    assert(spark.table("graft_ddl_t").count() == 3)

    // partition pruning flows through the catalog table
    val pruned = spark.table("graft_ddl_t").filter(col("part") === "a")
    assert(pruned.count() == 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part"),
      s"catalog scan must prune on the partition column:\n$plan")
    // the data filter must NOT appear as a post-scan Filter on part
    assert(new java.io.File(s"$loc/part=a").exists(),
      "partition directories must use the declared layout")

    // external-table semantics: DROP keeps the data; re-register + MSCK
    // recovers the partitions from disk
    spark.sql("DROP TABLE graft_ddl_t")
    assert(new java.io.File(s"$loc/part=a").exists(), "DROP must not delete external data")
    Sources.createPartitionedTable(spark, "graft_ddl_t", schema, Seq("part"), loc)
    Sources.recoverPartitions(spark, "graft_ddl_t")
    assert(spark.table("graft_ddl_t").count() == 3)
    assert(spark.table("graft_ddl_t").filter(col("part") === "b").count() == 1)
    spark.sql("DROP TABLE graft_ddl_t")
  }

  test("registerExternalPartitioned re-points an existing name, never a stale no-op") {
    val locA = tempDir() + "/a"
    val locB = tempDir() + "/b"
    Seq((1, "a")).toDF("id", "part").write.partitionBy("part").parquet(locA)
    Seq((2, "b"), (3, "b")).toDF("id", "part").write.partitionBy("part").parquet(locB)
    spark.sql("DROP TABLE IF EXISTS graft_repoint_t")
    Sources.registerExternalPartitioned(spark, "graft_repoint_t", locA, Seq("part"))
    assert(spark.table("graft_repoint_t").count() == 1)
    // re-register the SAME name at a new location: must read the new data
    Sources.registerExternalPartitioned(spark, "graft_repoint_t", locB, Seq("part"))
    assert(spark.table("graft_repoint_t").count() == 2,
      "re-registration must replace the prior table, not silently keep it")
    spark.sql("DROP TABLE graft_repoint_t")
  }

  test("overwritePartitions restates only the partitions present in the batch") {
    val dir = tempDir() + "/table"
    Seq((1, "a", "orig"), (2, "a", "orig"), (3, "b", "orig"), (4, "c", "orig"))
      .toDF("id", "part", "v").write.partitionBy("part").parquet(dir)
    // restate partition 'a' only (fewer rows, new values)
    Sources.overwritePartitions(
      Seq((10, "a", "restated")).toDF("id", "part", "v"), dir, Seq("part"))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("part") === "a").select("v").as[String].collect().toSeq
      == Seq("restated"), "named partition must be fully replaced")
    assert(back.filter(col("part") =!= "a").count() == 2,
      "partitions absent from the batch must survive untouched")
    // static mode would have truncated them; prove the b/c data is original
    assert(back.filter(col("part") === "b").select("id").as[Int].collect().toSeq == Seq(3))
  }

  test("DDL helpers quote identifiers and escape locations") {
    import org.apache.spark.sql.types._
    // a reserved-keyword table name (parse error unless backquoted; the
    // catalog itself only allows [A-Za-z0-9_] names so a keyword is the
    // quoting-sensitive case that can actually exist) and a location
    // containing a single quote (malformed string literal unescaped)
    val loc = tempDir() + "/it's data"
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("part", StringType)))
    spark.sql("DROP TABLE IF EXISTS `table`")
    // the SAME raw name string flows through every helper — quoting is
    // internal, no caller pre-quotes
    Sources.createPartitionedTable(spark, "table", schema, Seq("part"), loc)
    Sources.insertAppend(Seq((1, "a")).toDF("id", "part"), "table")
    Sources.recoverPartitions(spark, "table")
    assert(spark.table("`table`").count() == 1)
    // replace path exercises the quoted DROP
    Sources.createPartitionedTable(spark, "table", schema, Seq("part"),
      loc, replace = true)
    spark.sql("DROP TABLE `table`")
  }

  test("readCsv applies the explicit schema without inference") {
    val dir = tempDir()
    val f = new java.io.PrintWriter(s"$dir/data.csv")
    f.println("id,name"); f.println("1,alpha"); f.println("2,beta"); f.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType)))
    val df = Sources.readCsv(spark, s"$dir/data.csv", schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
  }

  test("zorder kernels: range bucket binary search and Morton interleave") {
    import org.apache.spark.sql.graft.GraftExpressions
    val b = Array(10.0, 20.0, 30.0)
    val vals = Seq(5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0)
    val got = vals.map(Tuple1(_)).toDF("v")
      .select(GraftExpressions.rangeBucket(col("v"), b).as("b"))
      .as[Int].collect().toSeq
    assert(got === Seq(0, 0, 1, 1, 2, 2, 3), "first-boundary->=v bucketing")
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(GraftExpressions.interleaveBits(col("x"), col("y"), 2).as("z"))
      .as[Long].head()
    // x=0b11 -> bits 0,2 ; y=0b01 -> bit 1  =>  0b111 = 7
    assert(z === 7L)
  }

  test("zorderWrite bounds BOTH dimensions per file; linear sort bounds only one") {
    // deterministic pseudo-random 2-D scatter over [0,1000)^2
    val df = spark.range(4096).select(
      ((col("id") * 7919) % 1000).cast("double").as("x"),
      ((col("id") * 104729) % 1000).cast("double").as("y"))
    val zDir = tempDir() + "/z"
    val linDir = tempDir() + "/lin"
    Sources.zorderWrite(df, zDir, ("x", "y"), targetFiles = 8)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.parquet(linDir)

    def fileStats(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .collect()

    val zs = fileStats(zDir)
    val ls = fileStats(linDir)
    assert(zs.length == 8 && ls.length == 8)

    def avgSpan(rows: Array[org.apache.spark.sql.Row], lo: Int, hi: Int) =
      rows.map(r => r.getDouble(hi) - r.getDouble(lo)).sum / rows.length
    // linear layout: x tightly bounded, y spans ~the full range everywhere
    assert(avgSpan(ls, 1, 2) < 300, "linear sort should bound its own column")
    assert(avgSpan(ls, 3, 4) > 900, "linear sort cannot bound the second column")
    // z-order: BOTH dimensions bounded
    assert(avgSpan(zs, 1, 2) < 700, "zorder must bound x")
    assert(avgSpan(zs, 3, 4) < 700, "zorder must bound y")

    // file-stats pruning for a y-only predicate (y < 100): every linear
    // file overlaps; z-order skips most
    def hit(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(r => r.getDouble(3) < 100.0)
    assert(hit(ls) == 8, "every linearly-sorted file matches y<100")
    assert(hit(zs) <= 4, s"zorder should prune most files for y<100, hit ${hit(zs)}")

    // layout never changes the data
    val back = spark.read.parquet(zDir)
    assert(back.count() === 4096)
    assert(back.agg(sum("x"), sum("y")).head ===
      df.agg(sum("x"), sum("y")).head)
  }

  test("bijectivePids mirrors Spark's hash partitioner exactly") {
    // the driver-side murmur mirror must agree with what a real hash
    // repartition does, or zArrange's routing silently skews — pin it
    // against spark_partition_id() for several partition counts
    for (n <- Seq(1, 2, 3, 8, 16, 100)) {
      val pids = Sources.bijectivePids(n)
      assert(pids.distinct.length == n)
      val placed = pids.zipWithIndex.toSeq.toDF("pid", "slot")
        .repartition(n, col("pid"))
        .select(col("slot"), spark_partition_id().as("actual"))
        .collect()
      placed.foreach(r => assert(r.getInt(0) == r.getInt(1),
        s"n=$n: slot ${r.getInt(0)} landed in partition ${r.getInt(1)}"))
    }
  }

  test("zArrange's histogram pass prunes the scan to the clustering columns") {
    // the point of the exact-histogram routing: the only full-payload
    // pass is the shuffle+write itself. The histogram aggregation must
    // push column pruning into the parquet scan — if the payload column
    // appears in the hist scan's ReadSchema, the double-scan is back
    val dir = tempDir() + "/wide"
    spark.range(2000).select(
      col("id").cast("double").as("x"),
      (col("id") % 97).cast("double").as("y"),
      concat(lit("payload_"), col("id")).as("wide"))
      .write.parquet(dir)
    val df = spark.read.parquet(dir)
    import org.apache.spark.sql.graft.GraftExpressions
    val probes = (1 until 16).map(_.toDouble / 16).toArray
    val Array(bx, by) = df.stat.approxQuantile(Array("x", "y"), probes, 0.001)
    val hist = df.withColumn("__z", GraftExpressions.interleaveBits(
        GraftExpressions.rangeBucket(col("x").cast("double"), bx).cast("long"),
        GraftExpressions.rangeBucket(col("y").cast("double"), by).cast("long"),
        4))
      .groupBy(col("__z")).agg(count(lit(1)))
    val scans = hist.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = scans.find(_.contains("ReadSchema")).getOrElse(
      fail(s"no parquet scan leaf found in: ${scans.mkString("\n")}"))
    assert(scan.contains("x") && scan.contains("y"))
    assert(!scan.substring(scan.indexOf("ReadSchema")).contains("wide"),
      s"histogram scan must not read the payload column:\n$scan")
  }

  test("zArrange balances rows exactly and survives a hot z-bucket") {
    // minExactBytes = 0 forces the exact-histogram route (these tiny
    // in-memory inputs would otherwise take the sampled small-input
    // route the gate reserves for them)
    // uniform scatter: every slot within one bucket-count of the ideal
    val uni = spark.range(8000).select(
      ((col("id") * 7919) % 1000).cast("double").as("x"),
      ((col("id") * 104729) % 1000).cast("double").as("y"))
    val sizes = Sources.zArrange(uni, ("x", "y"), 8, 256, minExactBytes = 0L)
      .groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 8, s"expected 8 non-empty slots, got ${sizes.length}")
    assert(sizes.max <= 1250 && sizes.min >= 750,
      s"exact-histogram split should balance 8000/8=1000 ±25%: ${sizes.toSeq}")

    // hot bucket: half the rows share one (x, y) point — its slot takes
    // the overflow (equal z-keys cannot split) but no rows are lost and
    // the remaining slots still divide the rest
    val hot = spark.range(8000).select(
      when(col("id") < 4000, lit(500.0))
        .otherwise((col("id") * 7919) % 1000).cast("double").as("x"),
      when(col("id") < 4000, lit(500.0))
        .otherwise((col("id") * 104729) % 1000).cast("double").as("y"))
    val arranged = Sources.zArrange(hot, ("x", "y"), 8, 256, minExactBytes = 0L)
    assert(arranged.count() == 8000)
    val hotSizes = arranged.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1)).sorted
    assert(hotSizes.sum == 8000)
    assert(hotSizes.max >= 4000, "the hot bucket stays whole in one slot")
    // nulls route (z = -1) instead of crashing the histogram fold
    val withNulls = spark.range(100).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id"))
        .cast("double").as("x"),
      col("id").cast("double").as("y"))
    assert(Sources.zArrange(withNulls, ("x", "y"), 4, 16,
      minExactBytes = 0L).count() == 100)
  }

  test("zArrange small-input gate takes the sampled route; exact route " +
      "joins LEFT so recompute drift cannot drop rows") {
    val df = spark.range(4000).select(
      ((col("id") * 7919) % 1000).cast("double").as("x"),
      ((col("id") * 104729) % 1000).cast("double").as("y"))
    // default gate: a few-KB input routes through repartitionByRange —
    // the exchange is RANGE partitioning and no join appears
    val sampled = Sources.zArrange(df, ("x", "y"), 4, 64)
    val sampledPlan = sampled.queryExecution.executedPlan.toString
    assert(sampledPlan.contains("rangepartitioning"),
      s"small input should take the sampled route:\n$sampledPlan")
    assert(!sampledPlan.contains("BroadcastHashJoin"))
    assert(sampled.count() == 4000)
    // results agree across routes on everything layout-independent
    val exact = Sources.zArrange(df, ("x", "y"), 4, 64, minExactBytes = 0L)
    assert(exact.agg(sum("x"), sum("y")).head ===
      sampled.agg(sum("x"), sum("y")).head)
    // the exact route's bucket→pid join must be LEFT outer: an inner
    // join would silently DROP rows whose recomputed __z is absent
    // from the histogram-pass route map (nondeterministic columns,
    // source mutated between passes) — a write-path data-loss class
    val joins = exact.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.nonEmpty, "exact route should contain the route join")
    assert(joins.forall(_ == org.apache.spark.sql.catalyst.plans.LeftOuter),
      s"route join must be LeftOuter, got: $joins")
  }

  test("zArrange routes an unknown-stats child through the EXACT path") {
    // an RDD-backed child has no statistics: its leaf reports the
    // spark.sql.defaultSizeInBytes sentinel (Long.MaxValue), which the
    // byte gate must treat as "potentially huge" — the exact route's
    // worst case is bounded histogram overhead, while mis-routing a
    // truly large child through repartitionByRange would evaluate the
    // full plan twice. This pins the conservative default the zArrange
    // scaladoc promises.
    val rdd = spark.sparkContext.parallelize(
      (0 until 500).map(i => org.apache.spark.sql.Row(
        (i * 7919 % 100).toDouble, (i * 104729 % 100).toDouble)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.DoubleType)))
    val noStats = spark.createDataFrame(rdd, schema)
    val est = noStats.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est >= BigInt(Sources.DefaultZExactMinBytes),
      s"precondition: RDD-backed child must report the unknown-stats " +
        s"sentinel, got $est")
    val arranged = Sources.zArrange(noStats, ("x", "y"), 4, 64)
    val joins = arranged.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.nonEmpty,
      "unknown-stats child must take the exact-histogram route " +
        "(route join present), not the sampled route")
    assert(arranged.count() == 500)
  }
}
