package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared hot-bucket guard for the LSH candidate generators: drop every
  * row whose bucket key holds more than `cap` rows. Hot keys are FEW by
  * construction (only buckets above the cap), so a partial-combined
  * count + broadcast left-anti join beats a window guard, which would
  * sort the entire banded relation on each join side. One definition so
  * MinHash bands, SimHash blocks, and embedding tables can't drift.
  */
private[dedup] object LshGuards {
  def dropHotKeys(df: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    if (cap <= 0) df
    else {
      val hot = df.select(keys.map(col): _*)
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
        .drop("__n")
      df.join(broadcast(hot), keys, "left_anti")
    }
}
