package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE upsert emulation (reference: sql/breed_mapping.py:596-618 uses
  * Delta `MERGE INTO`; no Delta jars ship here, so the same semantics are
  * expressed as a full-outer join + coalesce — correct under the
  * reference's single-writer pipeline assumption, SURVEY.md §7.3-§7.4).
  *
  * Semantics preserved exactly: matched target rows take the update's
  * values; unmatched target rows pass through untouched; unmatched update
  * rows are inserted.
  *
  * Scale notes: one shuffle of both sides on the key. When updates are
  * small relative to the target this degenerates nicely (AQE broadcasts
  * the update side of the outer join). The result must be rewritten to
  * storage by the caller — at 100 TB pair this with partition-level
  * overwrite so only touched partitions rewrite.
  */
object Merge {

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sameElements(updates.columns),
      s"upsert requires identical schemas: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val valueCols = target.columns.filterNot(keys.contains)
    val t = target.as("t")
    // Presence flag, not coalesce-per-column: MERGE takes the update row's
    // value even when it is NULL.
    val u = updates.withColumn("__u_present", lit(true)).as("u")
    val joined = t.join(u, keys, "full_outer")
    val merged = valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"__m_$c",
        when(col("__u_present").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")))
    }
    merged.select(keys.map(col) ++ valueCols.map(c => col(s"__m_$c").as(c)): _*)
  }

  /** WHEN MATCHED THEN UPDATE only (no insert) — the reference's silver
    * backfill (sql/breed_mapping.py:609-618): re-map already-written rows
    * from a refreshed dim, leaving non-matching rows untouched.
    */
  def updateMatched(target: DataFrame, updates: DataFrame, keys: Seq[String],
      setCols: Seq[String]): DataFrame = {
    val u = updates.select((keys ++ setCols).map(c => col(c).as(s"__u_$c")): _*)
    val cond = keys.map(k => col(k) === col(s"__u_$k")).reduce(_ && _)
    val joined = target.join(u, cond, "left")
    val updated = setCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__u_$c"), col(c)))
    }
    updated.drop((keys ++ setCols).map(c => s"__u_$c"): _*)
  }
}
