package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the versioned form of the
  * reference's dim upsert (sql/breed_mapping.py:596-618 keeps only the
  * latest mapping; Type 2 keeps the full history with validity intervals,
  * the standard warehouse shape when downstream queries need "the dim as
  * of the fact's date", e.g. the as-of join family in `AsOf`).
  *
  * The versioned dim carries `valid_from` / `valid_to` (timestamps,
  * `valid_to IS NULL` = open) and `is_current` (boolean). One batch of
  * updates (at most one row per key — enforce upstream with
  * `Dedup.latestPerKey`) is applied as:
  *
  *   - matched current row, any tracked column changed (null-safe):
  *     the old row CLOSES (`valid_to = effTs`, `is_current = false`) and a
  *     new open version is inserted with `valid_from = effTs`;
  *   - matched current row, all tracked columns equal: no-op (the open
  *     row passes through untouched — re-delivering a batch is safe);
  *   - unmatched update key: a brand-new open version is inserted;
  *   - closed history rows and current rows with no update: untouched.
  *
  * Scale: ONE shuffle — the current slice full-outer-joins the batch on
  * the key (AQE broadcasts a small batch); history rows never shuffle
  * (plain union). At 100 TB pair the rewrite with
  * `Sources.overwritePartitions` so only touched partitions restate.
  */
object Scd {

  /** @param dim      versioned dimension with `keys ++ tracked ++
    *                 Seq(valid_from, valid_to, is_current)` columns
    * @param updates  batch with `keys ++ tracked` columns, one row per key
    * @param effTs    the batch's effective timestamp (closes old versions
    *                 and opens new ones)
    */
  def applyType2(dim: DataFrame, updates: DataFrame, keys: Seq[String],
      tracked: Seq[String], effTs: Column): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(dim.columns.contains),
      s"dim must carry ${meta.mkString(", ")}; has ${dim.columns.mkString(", ")}")
    require((keys ++ tracked).forall(updates.columns.contains),
      s"updates must carry ${(keys ++ tracked).mkString(", ")}")

    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))

    val u = updates
      .select((keys ++ tracked).map(col): _*)
      .withColumn("__u_present", lit(true))
      .select(keys.map(col) ++
        tracked.map(c => col(c).as(s"__u_$c")) :+ col("__u_present"): _*)

    val joined = current.join(u, keys, "full_outer")
    val matched = col("__u_present").isNotNull && col("valid_from").isNotNull
    // null-safe "any tracked column differs"
    val changed = tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val dimCols = dim.columns.toSeq

    // old version closes when its tracked values were superseded
    val closed = joined.filter(matched && changed)
      .withColumn("valid_to", effTs)
      .withColumn("is_current", lit(false))
      .select(dimCols.map(col): _*)

    // unchanged-current + no-update-current pass through as-is
    val carried = joined.filter(col("valid_from").isNotNull && !(matched && changed))
      .select(dimCols.map(col): _*)

    // new open versions: superseding values and brand-new keys
    val opened = joined.filter(col("__u_present").isNotNull &&
        (col("valid_from").isNull || changed))
      .withColumn("valid_from", effTs)
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
      .select(keys.map(col) ++ tracked.map(c => col(s"__u_$c").as(c)) ++
        meta.map(col): _*)
      .select(dimCols.map(col): _*)

    history.unionByName(closed).unionByName(carried).unionByName(opened)
  }

  /** Point-in-time lookup against a Type 2 dim: the version whose
    * `[valid_from, valid_to)` interval contains `asOf`. Composes with
    * `applyType2` for "join facts to the dim as of the fact date"
    * (`RangeJoin.pointInInterval` is the fact-side bulk form).
    */
  def snapshotAt(dim: DataFrame, asOf: Column): DataFrame =
    dim.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
