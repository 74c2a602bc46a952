package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * All scans go through here so scale-oriented read settings live in one
  * place. At 100 TB the same call pattern holds: a parquet (or Iceberg)
  * table scan whose partition pruning / predicate pushdown is driven by
  * the downstream plan, never by eager materialization here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Encoding-adaptive column normalization: the physical parquet types
    * of driver testdata drops are not under our control (a pyarrow
    * re-encode has shipped int32 ids, binary-not-utf8 strings, and
    * float64 embedding lists at different times — the events.ts swap
    * zeroed a whole query family in round 7). Columns named in `canon`
    * are cast to their canonical Spark type when the physical type
    * drifted; everything else passes through. Cast-only (no renames, no
    * reorder), so column pruning and parquet predicate pushdown are
    * unaffected for untouched columns.
    */
  // nullability differences are not drift (a pyarrow writer may mark
  // list elements non-nullable) — only shape/width changes trigger a cast
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: ArrayType, y: ArrayType) => sameShape(x.elementType, y.elementType)
    case _ => a == b
  }

  private def normalize(df: DataFrame, canon: Map[String, DataType]): DataFrame = {
    val needs = df.schema.fields.exists(f =>
      canon.get(f.name).exists(t => !sameShape(f.dataType, t)))
    if (!needs) df
    else df.select(df.schema.fields.map { f =>
      canon.get(f.name) match {
        case Some(t) if !sameShape(f.dataType, t) => col(f.name).cast(t).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  private val documentsCanon: Map[String, DataType] = Map(
    "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
    "source" -> StringType, "n_chars" -> LongType)

  private val embeddingsCanon: Map[String, DataType] = Map(
    "vec_id" -> LongType,
    "embedding" -> ArrayType(FloatType),
    "label" -> IntegerType)

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    normalize(load(spark, sfDir, "documents"), documentsCanon)
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    normalize(load(spark, sfDir, "embeddings"), embeddingsCanon)
}
