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

  /** Snapshot diff (CDC classify): compare two snapshots of a table on a
    * key and emit one row per differing key with `change_type` in
    * {'insert','delete','update'} plus the changed column names
    * (comma-joined, schema order) — the batch form of change-data-capture
    * that the reference's incremental loads assume upstream
    * (notebooks/bronze.py:111-112 anti-joins new files; this computes the
    * full add/drop/change delta between two table states).
    *
    * Unchanged keys are omitted. Comparison is null-safe per column.
    *
    * Scale: one shuffle — a single full-outer join on the key; the
    * per-column comparison is a codegen'd projection. The output is the
    * delta, typically orders of magnitude smaller than the snapshots.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"snapshotDiff requires identical schemas: " +
        s"${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    val valueCols = oldSnap.columns.filterNot(keys.contains).toSeq
    val o = oldSnap.withColumn("__o_present", lit(true))
      .select(keys.map(col) ++
        valueCols.map(c => col(c).as(s"__o_$c")) :+ col("__o_present"): _*)
    val n = newSnap.withColumn("__n_present", lit(true))
      .select(keys.map(col) ++
        valueCols.map(c => col(c).as(s"__n_$c")) :+ col("__n_present"): _*)
    val joined = o.join(n, keys, "full_outer")
    val changedNames = array(valueCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*)
    joined
      .withColumn("change_type",
        when(col("__o_present").isNull, lit("insert"))
          .when(col("__n_present").isNull, lit("delete"))
          .otherwise(lit("update")))
      .withColumn("changed_cols",
        when(col("change_type") === "update",
          array_join(filter(changedNames, _.isNotNull), ","))
          .otherwise(lit("")))
      .filter(col("change_type") =!= "update" || col("changed_cols") =!= "")
      .select(keys.map(col) :+ col("change_type") :+ col("changed_cols"): _*)
  }

  /** WHEN MATCHED THEN UPDATE only (no insert) — the reference's silver
    * backfill (sql/breed_mapping.py:609-618): re-map already-written rows
    * from a refreshed dim, leaving non-matching rows untouched.
    *
    * SQL MERGE WHEN MATCHED semantics, like [[upsert]]: a matched row
    * takes the update's value EVEN WHEN IT IS NULL (presence flag, not
    * per-column coalesce — coalesce would silently keep the old value
    * for null updates). MERGE also requires at most one update row per
    * target key ("cannot update the same row twice"); duplicate update
    * keys would silently fan target rows out through the join, so the
    * plan carries an in-plan guard (a per-key count on the update side +
    * `assert_true` on every matched value) that fails the job the moment
    * a fanned-out match would be produced — WITHOUT turning this lazy
    * transformation into a driver-side action or evaluating the updates
    * lineage twice. Duplicate keys among UNMATCHED update rows are
    * harmless by construction (a left join emits no row for them).
    */
  def updateMatched(target: DataFrame, updates: DataFrame, keys: Seq[String],
      setCols: Seq[String]): DataFrame = {
    val dupW = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(k => col(s"__u_$k")): _*)
    val u = updates
      .select((keys ++ setCols).map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__u_present", lit(true))
      .withColumn("__u_dupn", count(lit(1)).over(dupW))
    val cond = keys.map(k => col(k) === col(s"__u_$k")).reduce(_ && _)
    val joined = target.join(u, cond, "left")
    val guardOk = assert_true(col("__u_dupn") <= 1,
      lit("updateMatched requires one update row per key (SQL MERGE " +
        "rule): duplicate update keys would fan target rows out")).isNull
    val updated = setCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c,
        when(col("__u_present").isNotNull && guardOk, col(s"__u_$c"))
          .otherwise(col(c)))
    }
    updated.drop((keys ++ setCols).map(c => s"__u_$c")
      ++ Seq("__u_present", "__u_dupn"): _*)
  }
}
