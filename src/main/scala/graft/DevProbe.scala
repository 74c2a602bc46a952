package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling harness for the q94 restructure — not part of the
  * shipped surface; deleted after the measurements land.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("PARTS", "240")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
    val b1 = if (sys.env.contains("NO_INITIAL_PARTS")) b0
      else b0.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", parts)
    val b2 = if (sys.env.contains("SKEWJOIN")) b1
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
      else b1
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = 8
    val gh = TextFunctions.ngramHashes(
      TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))), n)
    val base = docs.select(col("doc_id"), gh.as("__g"))
    val pos = base.select(col("doc_id"), posexplode(col("__g")))
      .toDF("doc_id", "__i", "__gram")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    which match {
      case "scan" =>
        time("scan+tokenize+explode count")(println(pos.count()))
      case "rollup" =>
        time("rollup exchange only") {
          pos.groupBy(col("__gram"), col("doc_id"))
            .agg(collect_list(col("__i")).as("__is"))
            .write.format("noop").mode("overwrite").save()
        }
      case "distinct" =>
        time("distinct (gram,doc) only") {
          pos.select(col("__gram"), col("doc_id")).distinct()
            .write.format("noop").mode("overwrite").save()
        }
      case "h3" =>
        time("H3 shuffle-hash full") {
          val nd = pos.select(col("__gram"), col("doc_id")).distinct()
            .groupBy(col("__gram")).agg(count(lit(1)).as("__nd"))
            .filter(col("__nd") > 1).select(col("__gram"))
          val dup = pos.join(nd.hint("shuffle_hash"), Seq("__gram"))
          val w = Window.partitionBy(col("doc_id")).orderBy(col("__i"))
          dup.withColumn("__grp", col("__i") - row_number().over(w))
            .groupBy(col("doc_id"), col("__grp"))
            .agg(count(lit(1)).as("__run"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("__nspans"), max(col("__run")).as("__maxrun"))
            .write.format("noop").mode("overwrite").save()
        }
      case "q30" =>
        time("registry q30") {
          SparkEntry.queries("q30_knn_ivf")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      case "q30c" =>
        time("registry q30 coalesce(1) parquet") {
          SparkEntry.queries("q30_knn_ivf")(spark, sfDir)
            .coalesce(1).write.mode("overwrite")
            .parquet("/tmp/devprobe_q30")
        }
      case "ivfgate" =>
        // reproduce q30's failing standalone shape, piecewise
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val probes = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .filter(col("vec_id") < 5)
        val variant = if (args.length > 2) args(2) else "full"
        val ann = graft.similarity.Knn.ivf(e, probes, "vec_id", "embedding",
          k = 10, nlist = 16, nprobe = 8)
        variant match {
          case "annonly" =>
            time("annonly")(ann.write.format("noop").mode("overwrite").save())
          case "exactjoin" =>
            val exact = graft.similarity.Knn
              .bruteForce(e, probes, "vec_id", "embedding", 10).localCheckpoint()
            time("exactjoin") {
              ann.join(exact.select(col("query_id"), col("neighbor_id"),
                lit(true).as("__in_exact")),
                Seq("query_id", "neighbor_id"), "left")
                .write.format("noop").mode("overwrite").save()
            }
          case "corpusjoin" =>
            val corpusIds = e.select(col("vec_id").as("neighbor_id"),
              lit(true).as("__in_corpus"))
            time("corpusjoin") {
              ann.join(broadcast(corpusIds), Seq("neighbor_id"), "left")
                .write.format("noop").mode("overwrite").save()
            }
          case "statsfull" =>
            val exact = graft.similarity.Knn
              .bruteForce(e, probes, "vec_id", "embedding", 10).localCheckpoint()
            val corpusIds = e.select(col("vec_id").as("neighbor_id"),
              lit(true).as("__in_corpus"))
            time("statsfull") {
              ann.join(exact.select(col("query_id"), col("neighbor_id"),
                  lit(true).as("__in_exact")),
                  Seq("query_id", "neighbor_id"), "left")
                .join(broadcast(corpusIds), Seq("neighbor_id"), "left")
                .groupBy(col("query_id"))
                .agg(count(lit(1)).as("n_ann_results"),
                  countDistinct(col("neighbor_id")).as("__ndist"),
                  sum(when(col("__in_exact"), 1L).otherwise(0L)).as("__hits"),
                  max(when(col("neighbor_id") === col("query_id"), 1L)
                    .otherwise(0L)).as("__self"),
                  min(when(col("__in_corpus"), 1L).otherwise(0L))
                    .as("__all_corpus"))
                .localCheckpoint()
                .write.format("noop").mode("overwrite").save()
            }
          case "groupby" =>
            time("groupby") {
              ann.groupBy(col("query_id"))
                .agg(count(lit(1)).as("n"),
                  countDistinct(col("neighbor_id")).as("nd"))
                .write.format("noop").mode("overwrite").save()
            }
        }
      case "ivf" =>
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val probes = e.filter(col("vec_id") < 5)
        val exact = graft.similarity.Knn
          .bruteForce(e, probes, "vec_id", "embedding", 10)
          .localCheckpoint()
        val te = exact.count().toDouble
        for (np <- Seq(2, 3, 4, 6, 8, 12, 16)) {
          val t0 = System.nanoTime()
          val ann = graft.similarity.Knn.ivf(e, probes, "vec_id", "embedding",
            k = 10, nlist = 16, nprobe = np)
          val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
            .count().toDouble
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[probe] ivf nprobe=$np%2d recall=${hits / te}%.3f time=$dt%.2f s")
        }
      case "w2" =>
        time("W2 min/max gram-window full") {
          val wg = Window.partitionBy(col("__gram"))
          val dup = pos
            .withColumn("__xdoc",
              min(col("doc_id")).over(wg) =!= max(col("doc_id")).over(wg))
            .filter(col("__xdoc"))
            .select(col("doc_id"), col("__i"))
          val w = Window.partitionBy(col("doc_id")).orderBy(col("__i"))
          dup.withColumn("__grp", col("__i") - row_number().over(w))
            .groupBy(col("doc_id"), col("__grp"))
            .agg(count(lit(1)).as("__run"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("__nspans"), max(col("__run")).as("__maxrun"))
            .write.format("noop").mode("overwrite").save()
        }
      case "w" =>
        time("W window-rollup full") {
          val wg = Window.partitionBy(col("__gram"))
          val dup = pos.groupBy(col("__gram"), col("doc_id"))
            .agg(collect_list(col("__i")).as("__is"))
            .withColumn("__nd", count(lit(1)).over(wg))
            .filter(col("__nd") > 1)
            .select(col("doc_id"), explode(col("__is")).as("__i"))
          val w = Window.partitionBy(col("doc_id")).orderBy(col("__i"))
          dup.withColumn("__grp", col("__i") - row_number().over(w))
            .groupBy(col("doc_id"), col("__grp"))
            .agg(count(lit(1)).as("__run"))
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("__nspans"), max(col("__run")).as("__maxrun"))
            .write.format("noop").mode("overwrite").save()
        }
    }
    spark.stop()
  }
}
