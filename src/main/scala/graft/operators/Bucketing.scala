package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the shuffle-elimination path for the
  * recurring big equi-join at 100 TB (SURVEY.md §4: the reference relies
  * on Delta/Databricks clustering for this; plain Spark's equivalent is
  * `bucketBy` table layout).
  *
  * Write both join sides bucketed (and optionally sorted) by the join
  * key ONCE; every later equi-join on that key reads the sides already
  * co-partitioned: no Exchange on either side, and with `sortBy` no Sort
  * either — the dominant shuffle of the pipeline is paid at write time,
  * amortized over every downstream join/aggregation on the key. The
  * same layout also makes groupBy(key) exchange-free.
  */
object Bucketing {

  /** Write `df` as a bucketed parquet table (registered in the session
    * catalog; pass `path` for an external location). `sortCols` adds
    * in-bucket ordering so sort-merge joins skip their sorts too.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil,
      path: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog —
    * reading the parquet path directly would lose it).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
