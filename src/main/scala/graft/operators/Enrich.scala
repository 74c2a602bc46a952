package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension enrichment (reference: notebooks/silver.py:53-68 — left join
  * the ~560-row breed_mapping dim, flag mapped rows, fall back to the raw
  * value when unmapped).
  *
  * Scale notes: the dim side is explicitly `broadcast()` — at 100 TB the
  * fact side never shuffles for this join; each executor hash-probes a
  * local copy of the dim. Only use for dims that fit in executor memory
  * (the reference's dim is ~560 rows; anything under the low-GB range is
  * fine). For large dims drop the hint and let AQE pick shuffled hash.
  */
object Enrich {

  /** Left-join `dim` on `key`; adds `flagCol` = matched, and replaces
    * `valueCol` with `coalesce(dim value, fallback)`.
    */
  def fromDim(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      dimValue: String,
      outValue: String,
      fallback: String,
      flagCol: String): DataFrame = {
    val tmp = "__dim_" + dimValue
    val d = dim.select(col(key), col(dimValue).as(tmp))
    facts
      .join(broadcast(d), Seq(key), "left")
      .withColumn(flagCol, col(tmp).isNotNull)
      .withColumn(outValue, coalesce(col(tmp), col(fallback)))
      .drop(tmp)
  }
}
