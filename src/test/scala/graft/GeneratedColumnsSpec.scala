package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConstraintViolationException, VersionedTable}

/** Generated columns (Delta's GENERATED ALWAYS AS) on the versioned
  * table: declared at create, computed when a batch omits them,
  * validated (null-safe) when a batch supplies them, recomputed through
  * UPDATE/MERGE when sources change, forbidden as direct SET targets,
  * rename/drop interplay (the rule follows its column, sources are
  * protected), restore carry, and the 100-TB payoff: skipping stats on
  * a generated column prune derived predicates that raw-column min/max
  * cannot serve.
  */
class GeneratedColumnsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-gencol").toString

  private def buckets(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("bucket").as[Long].collect().toSet

  test("create computes an omitted generated column and records the rule; appends compute it too") {
    val dir = tmp()
    val s = VersionedTable.create(
      Seq((10L, "a"), (25L, "b")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    assert(s.generatedCols === Map("bucket" -> "id % 10"))
    assert(s.schema.get.fieldNames.toSeq === Seq("id", "v", "bucket"))
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 5L))
    VersionedTable.append(Seq((37L, "c")).toDF("id", "v"), dir)
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 5L, 7L))
  }

  test("a batch supplying the generated column is validated: agreeing passes, contradicting rejects atomically") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    VersionedTable.append(
      Seq((21L, "b", 1L)).toDF("id", "v", "bucket"), dir)
    val e = intercept[ConstraintViolationException] {
      VersionedTable.append(
        Seq((32L, "c", 9L)).toDF("id", "v", "bucket"), dir)
    }
    assert(e.getMessage.contains("bucket"))
    assert(VersionedTable.latest(spark, dir).get.version === 2L)
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 1L))
  }

  test("create validations: unknown source, generated-from-generated, reserved name, no-column expr") {
    val dir = tmp()
    intercept[IllegalArgumentException] {
      VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), tmp(),
        generatedCols = Map("g" -> "nope % 10"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), tmp(),
        generatedCols = Map("g" -> "id % 10", "h" -> "g + 1"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), tmp(),
        generatedCols = Map("__vt_g" -> "id % 10"))
    }
    intercept[IllegalArgumentException] {
      VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), tmp(),
        generatedCols = Map("g" -> "42"))
    }
    VersionedTable.create(Seq((1L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("g" -> "id % 10"))
    assert(VersionedTable.read(spark, dir).columns.contains("g"))
  }

  test("UPDATE recomputes generated columns when sources change (CoW and DV paths); SET of a generated column fails fast") {
    for (dv <- Seq(false, true)) {
      val dir = tmp()
      VersionedTable.create(
        (1L to 40L).map(i => (i, "x")).toDF("id", "v"), dir,
        statsCols = Seq("id"),
        generatedCols = Map("bucket" -> "id % 10"))
      val upd = Map("id" -> (col("id") + lit(100L)).cast("bigint"))
      if (dv)
        VersionedTable.updateWithDv(spark, dir, col("id") === 3L, upd,
          densityThreshold = 0.9)
      else
        VersionedTable.update(spark, dir, col("id") === 3L, upd)
      val got = VersionedTable.read(spark, dir)
        .filter(col("id") === 103L).select("bucket").as[Long].collect()
      assert(got.toSeq === Seq(3L),
        s"dv=$dv: bucket must recompute from the NEW id (103 % 10)")
      val e = intercept[IllegalArgumentException] {
        if (dv)
          VersionedTable.updateWithDv(spark, dir, col("id") === 1L,
            Map("bucket" -> lit(9L)), densityThreshold = 0.9)
        else
          VersionedTable.update(spark, dir, col("id") === 1L,
            Map("bucket" -> lit(9L)))
      }
      assert(e.getMessage.contains("GENERATED ALWAYS"))
    }
  }

  test("MERGE completes update rows' generated columns on both the CoW and DV paths, matched and insert lanes") {
    for (dv <- Seq(false, true)) {
      val dir = tmp()
      VersionedTable.create(
        (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "price"), dir,
        statsCols = Seq("id"),
        generatedCols = Map("bucket" -> "id % 10"))
      val updates = Seq((5L, 500.0), (105L, 1.0)).toDF("id", "price")
      if (dv)
        VersionedTable.mergeWithDv(updates, dir, keys = Seq("id"),
          densityThreshold = 0.9)
      else
        VersionedTable.merge(updates, dir, keys = Seq("id"))
      val got = VersionedTable.read(spark, dir)
        .select("id", "bucket").as[(Long, Long)].collect().toMap
      assert(got(5L) === 5L && got(105L) === 5L, s"dv=$dv")
      assert(got.size === 21)
    }
  }

  test("overwrite keeps the rules, computes omitted columns, and refuses to drop a source column") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    VersionedTable.overwrite(Seq((42L, "z")).toDF("id", "v"), dir)
    assert(buckets(VersionedTable.read(spark, dir)) === Set(2L))
    assert(VersionedTable.latest(spark, dir).get.generatedCols.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.overwrite(Seq(("only")).toDF("v"), dir)
    }
    assert(e.getMessage.contains("bucket"))
  }

  test("rename/drop: the rule follows its own column; source columns are protected until the generated column drops") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, dir, "id", "key")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, dir, "id")
    }
    // renaming the generated column itself remaps the rule key
    VersionedTable.renameColumn(spark, dir, "bucket", "b10")
    assert(VersionedTable.latest(spark, dir).get.generatedCols ===
      Map("b10" -> "id % 10"))
    // hmm: the EXPRESSION still names id; a batch omitting b10 computes
    VersionedTable.append(Seq((25L, "b")).toDF("id", "v"), dir)
    assert(VersionedTable.read(spark, dir)
      .filter(col("id") === 25L).select("b10").as[Long].head() === 5L)
    // dropping the generated column takes the rule with it
    VersionedTable.dropColumn(spark, dir, "b10")
    assert(VersionedTable.latest(spark, dir).get.generatedCols === Map.empty)
    VersionedTable.renameColumn(spark, dir, "id", "key") // now legal
    assert(VersionedTable.read(spark, dir).columns.toSeq ===
      Seq("key", "v"))
  }

  test("restore carries the target version's rules") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10")) // v1
    VersionedTable.dropColumn(spark, dir, "bucket") // v2: rule gone
    VersionedTable.append(Seq((20L, "b")).toDF("id", "v"), dir) // v3
    assert(VersionedTable.latest(spark, dir).get.generatedCols === Map.empty)
    VersionedTable.restore(spark, dir, 1L) // v4: rule returns
    assert(VersionedTable.latest(spark, dir).get.generatedCols ===
      Map("bucket" -> "id % 10"))
    VersionedTable.append(Seq((37L, "c")).toDF("id", "v"), dir)
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 7L))
  }

  test("the 100-TB payoff: stats on a generated column prune derived predicates raw min/max cannot serve") {
    val dir = tmp()
    // ids interleave mod 10 across the range, so id-min/max is useless
    // for `bucket = 7`; the generated column's OWN stats are exact
    // because each range-partition file happens to hold few buckets —
    // plant bucket-clustered data to make the point sharply
    val df = (0L until 400L).map(i => (i / 25 * 100 + i % 25, "x"))
      .toDF("id", "v") // 16 clusters of 25 consecutive ids
    VersionedTable.create(
      df.repartitionByRange(16, col("id")), dir,
      statsCols = Seq("id", "bucket"),
      generatedCols = Map("bucket" -> "CAST(id % 100 AS BIGINT)"))
    val (kept, pruned) = VersionedTable.pruneInfo(spark, dir,
      col("bucket") === 77L)
    assert(kept + pruned === 16)
    assert(pruned >= 8,
      s"bucket stats must prune most files (kept=$kept pruned=$pruned)")
    val rows = VersionedTable.readWhere(spark, dir, col("bucket") === 7L)
      .count()
    assert(rows === 16L) // one id ≡ 7 (mod 100) per 25-run... sanity
  }

  test("constraints compose: a CHECK over a generated column enforces after generation") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    VersionedTable.addCheckConstraint(spark, dir, "small_bucket",
      "bucket < 8")
    VersionedTable.append(Seq((23L, "b")).toDF("id", "v"), dir)
    intercept[ConstraintViolationException] {
      VersionedTable.append(Seq((29L, "c")).toDF("id", "v"), dir)
    }
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 3L))
  }

  test("streaming-tagged appends complete generated columns (the sink funnel)") {
    val dir = tmp()
    VersionedTable.create(Seq((10L, "a")).toDF("id", "v"), dir,
      generatedCols = Map("bucket" -> "id % 10"))
    VersionedTable.appendTagged(Seq((24L, "b")).toDF("id", "v"), dir,
      "append#0")
    assert(buckets(VersionedTable.read(spark, dir)) === Set(0L, 4L))
  }
}
