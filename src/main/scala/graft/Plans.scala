package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the named
  * queries (default: a representative set) so scan pruning, pushed
  * filters, join strategies, and codegen spans can be eyeballed per
  * change. Usage: runMain graft.Plans [sfDir] [q1 q2 ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q02_top_parts_per_flag",
        "q07_incremental_antijoin", "q08_enrich_parts", "q22_knn_brute",
        "q60_bm25", "q62_substring_dup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
