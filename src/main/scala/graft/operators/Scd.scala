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
    val current = dim.filter(col("is_current")).withColumn("__t_present", lit(true))

    val u = updates
      .select((keys ++ tracked).map(col): _*)
      .withColumn("__u_present", lit(true))
      .select(keys.map(col) ++
        tracked.map(c => col(c).as(s"__u_$c")) :+ col("__u_present"): _*)

    val joined = current.join(u, keys, "full_outer")
    val tPresent = col("__t_present").isNotNull
    val uPresent = col("__u_present").isNotNull
    // null-safe "any tracked column differs"
    val changed = tracked.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val dimCols = dim.columns.toSeq
    def asStruct(fields: Seq[(String, Column)]): Column =
      struct(fields.map { case (n, c) => c.as(n) }: _*)
    val oldFields = dimCols.map(c => c -> col(c))
    val closedS = asStruct(dimCols.map {
      case "valid_to"   => "valid_to" -> effTs.cast("timestamp")
      case "is_current" => "is_current" -> lit(false)
      case c            => c -> col(c)
    })
    val openedS = asStruct(dimCols.map {
      case "valid_from" => "valid_from" -> effTs.cast("timestamp")
      case "valid_to"   => "valid_to" -> lit(null).cast("timestamp")
      case "is_current" => "is_current" -> lit(true)
      case c if tracked.contains(c) => c -> col(s"__u_$c")
      case c            => c -> col(c) // key columns (coalesced by the join)
    })

    // Each joined row emits 1-2 output rows through ONE explode — never a
    // union of filtered copies of the join, which Catalyst would rewrite
    // into three separate joins, each rescanning both sides (observed;
    // PlansSpec pins the single-join shape).
    val emitted = joined
      .select(explode(array(
        // superseded current version closes at effTs
        when(tPresent && uPresent && changed, closedS),
        // unchanged-current and no-update-current pass through as-is
        when(tPresent && !(uPresent && changed), asStruct(oldFields)),
        // superseding values and brand-new keys open at effTs
        when(uPresent && (!tPresent || changed), openedS))).as("__row"))
      .filter(col("__row").isNotNull)
      .select(dimCols.map(c => col(s"__row.$c").as(c)): _*)

    history.unionByName(emitted)
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
