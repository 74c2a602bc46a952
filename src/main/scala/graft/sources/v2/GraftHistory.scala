package graft.sources.v2

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.VersionedTable

/** `SELECT * FROM gvt.t$history` — a versioned table's commit log as a
  * queryable relation, the SQL twin of Delta's `DESCRIBE HISTORY` and
  * Iceberg's metadata tables (reference consumption mode:
  * `docs/runbook.md` inspects table history before reprocessing).
  *
  * One row per commit. Driver-materialized via [[LocalScan]] on
  * purpose: the history IS driver-resident metadata — the same
  * snapshots listing the format already loads to resolve ANY read — so
  * a distributed scan would manufacture parallelism for data that
  * arrives in one manifest listing. Commit counts grow with writes,
  * not data volume: a 100 TB table with years of hourly commits is
  * ~10^4 rows, and vacuumed history shrinks it further.
  *
  * `live_rows` prices the snapshot from manifest metadata alone (per-
  * file stats rowCount minus DV cardinality — the same arithmetic the
  * DML pricing job and DvRace's metadata check use); NULL when any
  * file of that version predates stats collection, never a guess.
  */
private[v2] class GraftHistoryTable(val dir: String)
    extends Table with SupportsRead {

  override def name(): String = s"graft.`$dir`$$history"
  override def schema(): StructType = GraftHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = GraftHistoryTable.Schema
        override def rows(): Array[InternalRow] = {
          val snaps = VersionedTable.snapshots(SparkSession.active, dir)
          require(snaps.nonEmpty, s"no graft versioned table at $dir")
          snaps.map { s =>
            val live: Any =
              if (s.files.forall(f => s.stats.contains(f)))
                s.files.map(f => s.stats(f).rowCount).sum -
                  s.dvn.values.sum
              else null
            InternalRow(
              s.version,
              s.timestampMs,
              UTF8String.fromString(s.operation),
              s.files.size.toLong,
              s.dvFiles.size.toLong,
              s.dvn.values.sum,
              live)
          }.toArray
        }
      }
    }
}

private[v2] object GraftHistoryTable {
  /** The name suffix that routes a catalog load to the history
    * relation, Iceberg-style (`SELECT * FROM cat.ns.t$history`).
    */
  val Suffix = "$history"

  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_dv_files", LongType, nullable = false),
    StructField("n_deleted_rows", LongType, nullable = false),
    StructField("live_rows", LongType, nullable = true)))
}
