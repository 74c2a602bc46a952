package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Rankings}

/** Gold analytic view layer (reference: notebooks/gold.py — 8 views over
  * one source view). Each view is a plain `DataFrame => DataFrame`
  * function (SURVEY.md §1.3: testable, no catalog dependency); use
  * `registerAll` for a temp-view façade when SQL access is wanted.
  *
  * Scale notes: every view groups/windows on low-cardinality keys
  * (Year × ANIMAL_TYPE × breed/FSA) — partial aggregation collapses the
  * fact rows map-side, so the shuffles move only group cardinality, not
  * data volume. The source view's filters push down through the whole DAG
  * into the silver parquet scan (partition pruning on Year).
  */
object Gold {

  /** Source view (gold.py:12-25): valid-year, whitelisted type,
    * non-null standard breed.
    */
  def src(silver: DataFrame): DataFrame =
    silver
      .filter(col("Year").isNotNull &&
        col("ANIMAL_TYPE").isin(Model.AnimalTypes: _*) &&
        col("breed_standard").isNotNull)
      .select("_id", "Year", "ANIMAL_TYPE", "FSA", "breed_standard",
        "breed_mapped", "ingestion_ts", "processed_ts")

  /** v_totals_by_year_type (gold.py:32-73): top-10 breeds per Year × type
    * with share of the group total.
    */
  def totalsByYearType(src: DataFrame): DataFrame = {
    val totals = src.groupBy(col("Year"), col("ANIMAL_TYPE"))
      .agg(count(lit(1)).as("total_count"))
    val breedCounts = src.groupBy(col("Year"), col("ANIMAL_TYPE"), col("breed_standard"))
      .agg(count(lit(1)).as("breed_count"))
    val ranked = Rankings.topNPerGroup(
      Seq("ANIMAL_TYPE", "Year"),
      Seq(col("breed_count").desc, col("breed_standard").asc), 10,
      rankName = "popularity")(breedCounts)
    totals.join(ranked, Seq("Year", "ANIMAL_TYPE"))
      .select(col("Year"), col("ANIMAL_TYPE"), col("total_count"),
        col("popularity"), col("breed_standard").as("Top_Breeds"),
        col("breed_count").as("Breed_Count"),
        round(lit(100.0) * col("breed_count") / col("total_count"), 2).as("top_breed_pct"))
  }

  /** v_breed_stats (gold.py:88-136): share + rank + LAG year-over-year
    * deltas on count and share.
    */
  def breedStats(src: DataFrame): DataFrame = {
    val base = src.groupBy(col("Year"), col("ANIMAL_TYPE"),
      col("breed_standard").as("breed"))
      .agg(count(lit(1)).as("cnt"))
    val group = Window.partitionBy("Year", "ANIMAL_TYPE")
    val series = Window.partitionBy("ANIMAL_TYPE", "breed").orderBy("Year")
    val withShare = base
      .withColumn("total_in_group", sum("cnt").over(group))
      .withColumn("rnk", rank().over(group.orderBy(col("cnt").desc, col("breed").asc)))
      .withColumn("share", round(col("cnt") / col("total_in_group"), 4))
    withShare
      .withColumn("prev_cnt", lag("cnt", 1).over(series))
      .withColumn("prev_share", lag("share", 1).over(series))
      .select(
        col("Year"), col("ANIMAL_TYPE").as("Animal_Type"), col("breed"),
        col("cnt"), col("total_in_group").as("total"), col("share"),
        col("rnk").as("rank_in_year_type"), col("prev_cnt"),
        (col("cnt") - col("prev_cnt")).as("yoy_cnt_diff"),
        when(col("prev_cnt") > 0,
          round((col("cnt") - col("prev_cnt")) / col("prev_cnt"), 4))
          .as("yoy_cnt_pct_change"),
        col("prev_share"),
        round(col("share") - col("prev_share"), 4).as("yoy_share_point_diff"),
        when(col("prev_share") > 0,
          round((col("share") - col("prev_share")) / col("prev_share"), 4))
          .as("yoy_share_pct_change"))
  }

  /** Shared shape of v_fsa_top3_breeds / v_fsa2_top3_breeds
    * (gold.py:149-208, 219-278): per-area top-3 pivoted to columns.
    */
  private def top3Pivot(src: DataFrame, areaCol: String): DataFrame = {
    val keys = Seq("Year", "ANIMAL_TYPE", areaCol)
    val totals = src.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("total"))
    val byBreed = src.groupBy(col("Year"), col("ANIMAL_TYPE"), col(areaCol), col("breed"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = Rankings.topNPerGroup(keys,
      Seq(col("cnt").desc, col("breed").asc), 3)(byBreed)
    val pivoted = ranked.groupBy(col("Year"), col("ANIMAL_TYPE"), col(areaCol))
      .agg(
        max(when(col("rnk") === 1, col("breed"))).as("top1_breed"),
        max(when(col("rnk") === 1, col("cnt"))).as("top1_cnt"),
        max(when(col("rnk") === 2, col("breed"))).as("top2_breed"),
        max(when(col("rnk") === 2, col("cnt"))).as("top2_cnt"),
        max(when(col("rnk") === 3, col("breed"))).as("top3_breed"),
        max(when(col("rnk") === 3, col("cnt"))).as("top3_cnt"))
    pivoted.join(totals, Seq("Year", "ANIMAL_TYPE", areaCol))
      .select(col("Year"), col("ANIMAL_TYPE").as("Animal_Type"), col(areaCol),
        col("total"), col("top1_breed"), col("top1_cnt"),
        col("top2_breed"), col("top2_cnt"), col("top3_breed"), col("top3_cnt"))
  }

  /** v_fsa_top3_breeds (gold.py:149-208). */
  def fsaTop3Breeds(src: DataFrame): DataFrame =
    top3Pivot(
      src.filter(col("FSA").isNotNull)
        .select(col("Year"), col("ANIMAL_TYPE"), col("FSA"),
          col("breed_standard").as("breed")),
      "FSA")

  /** v_fsa2_top3_breeds (gold.py:219-278): 2-char FSA prefix variant. */
  def fsa2Top3Breeds(src: DataFrame): DataFrame =
    top3Pivot(
      src.filter(col("FSA").isNotNull && length(col("FSA")) >= 2)
        .select(col("Year"), col("ANIMAL_TYPE"),
          substring(col("FSA"), 1, 2).as("FSA2"),
          col("breed_standard").as("breed")),
      "FSA2")

  /** licensed_pets_gold_quality (gold.py:289-309) — reads silver directly. */
  def quality(silver: DataFrame): DataFrame =
    silver.groupBy(col("Year"), col("ANIMAL_TYPE"))
      .agg(
        count(lit(1)).as("rows"),
        Aggregates.conditionalCount(col("breed_mapped")).as("mapped_rows"),
        Aggregates.conditionalCount(col("FSA").isNull).as("null_fsa_rows"),
        max(col("processed_ts")).as("last_processed_ts"))
      .select(col("Year"), col("ANIMAL_TYPE"), col("rows"), col("mapped_rows"),
        when(col("rows") === 0, lit(null).cast("double"))
          .otherwise(col("mapped_rows").cast("double") / col("rows")).as("pct_mapped"),
        col("null_fsa_rows"), col("last_processed_ts"))

  /** v_daily_totals (gold.py:323-329). */
  def dailyTotals(src: DataFrame): DataFrame =
    src.groupBy(to_date(col("ingestion_ts")).as("day"), col("ANIMAL_TYPE"))
      .agg(count(lit(1)).as("total"))
      .orderBy("day")

  /** v_breed_share_citywide (gold.py:341-353): second-level re-aggregation
    * of breed counts.
    */
  def breedShareCitywide(src: DataFrame): DataFrame = {
    val c = src.groupBy(col("Year"), col("ANIMAL_TYPE"),
      col("breed_standard").as("breed"))
      .agg(count(lit(1)).as("cnt"))
    val t = c.groupBy(col("Year"), col("ANIMAL_TYPE"))
      .agg(sum("cnt").as("tot"))
    c.join(t, Seq("Year", "ANIMAL_TYPE"))
      .select(col("Year"), col("ANIMAL_TYPE"), col("breed"), col("cnt"),
        round(col("cnt") / col("tot"), 4).as("share"))
  }

  /** v_breed_rank_citywide (gold.py:364-373). */
  def breedRankCitywide(src: DataFrame): DataFrame = {
    val c = src.groupBy(col("Year"), col("ANIMAL_TYPE"),
      col("breed_standard").as("breed"))
      .agg(count(lit(1)).as("cnt"))
    c.withColumn("rnk", row_number().over(
      Window.partitionBy("Year", "ANIMAL_TYPE")
        .orderBy(col("cnt").desc, col("breed").asc)))
  }

  /** Optional SQL façade: register silver + every view as temp views. */
  def registerAll(silver: DataFrame): Unit = {
    val s = src(silver)
    silver.createOrReplaceTempView("licensed_pets_silver")
    s.createOrReplaceTempView("licensed_pets_gold_src")
    totalsByYearType(s).createOrReplaceTempView("v_totals_by_year_type")
    breedStats(s).createOrReplaceTempView("v_breed_stats")
    fsaTop3Breeds(s).createOrReplaceTempView("v_fsa_top3_breeds")
    fsa2Top3Breeds(s).createOrReplaceTempView("v_fsa2_top3_breeds")
    quality(silver).createOrReplaceTempView("licensed_pets_gold_quality")
    dailyTotals(s).createOrReplaceTempView("v_daily_totals")
    breedShareCitywide(s).createOrReplaceTempView("v_breed_share_citywide")
    breedRankCitywide(s).createOrReplaceTempView("v_breed_rank_citywide")
  }
}
