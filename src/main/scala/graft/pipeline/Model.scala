package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Data model of the license-record pipeline (reference SURVEY.md §1):
  * fixed declared schemas, never inferred (reference: notebooks/bronze.py:13-19).
  */
object Model {

  /** Raw CSV drop schema (reference: notebooks/bronze.py:13-19). */
  val rawSchema: StructType = StructType(Seq(
    StructField("_id", IntegerType, nullable = false),
    StructField("Year", IntegerType),
    StructField("FSA", StringType),
    StructField("ANIMAL_TYPE", StringType),
    StructField("PRIMARY_BREED", StringType)))

  /** FSA shape (reference: notebooks/bronze.py:83). */
  val FsaPattern = "^[A-Z][0-9][A-Z]$"

  /** Hard-assert whitelist (reference: notebooks/bronze.py:104-107). */
  val AnimalTypes = Seq("DOG", "CAT")

  /** Partition layout for bronze and silver (reference: bronze.py:143). */
  val PartitionCols = Seq("Year", "ANIMAL_TYPE")

  /** Run configuration. `now` is injected (not current_timestamp()) so
    * dedup tie-breaks are reproducible in tests — SURVEY.md §7.4.
    */
  case class PipelineConfig(
      rawDir: String,
      bronzeDir: String,
      silverDir: String,
      controlDir: String,
      ingestionDate: String,
      now: Timestamp)
}
