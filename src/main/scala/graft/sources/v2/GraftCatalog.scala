package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** A [[TableCatalog]] over a directory of versioned tables — the piece
  * that turns the reference's primary consumption mode (SQL text over
  * catalog tables, `notebooks/gold.py:12`) into a first-class surface
  * for this engine's own table format, INCLUDING SQL time travel:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.gvt",
  *     "graft.sources.v2.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.gvt.warehouse", "/data/tables")
  *   spark.sql("SELECT * FROM gvt.orders VERSION AS OF 3")
  *   spark.sql("SELECT * FROM gvt.orders TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * Identifiers map to `warehouse/<ns...>/<name>` directories; a table
  * exists iff its directory holds a `_manifests` commit. Loads pin a
  * snapshot immediately (schema and scan always agree); the scans they
  * produce are [[GraftScan]]s — data-skipping pushdown and DV row
  * filtering apply to SQL text exactly as to the Scala API.
  *
  * CREATE TABLE materializes an empty v1 with the declared schema
  * (writes then flow through [[GraftWriteBuilder]] or the
  * `VersionedTable.*` API); DROP TABLE removes the directory;
  * ALTER TABLE ADD/RENAME/DROP COLUMN land as the format's
  * metadata-only evolution commits (see [[alterTable]]). RENAME TABLE
  * is rejected — shallow clones may borrow files by absolute path.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(throw
      new IllegalArgumentException(
        s"graft catalog $name requires option 'warehouse' " +
          s"(set spark.sql.catalog.$name.warehouse)"))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def dirOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq :+ ident.name()).mkString("/")
  private def isTable(dir: String): Boolean =
    VersionedTable.latest(spark, dir).isDefined

  override def tableExists(ident: Identifier): Boolean = isTable(dirOf(ident))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = (warehouse +: namespace.toSeq).mkString("/")
    val p = new Path(nsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => isTable(s"$nsDir/$n"))
      .map(n => Identifier.of(namespace, n))
  }

  private def load(ident: Identifier,
      version: Option[Long], tsMs: Option[Long]): Table = {
    // `t$history` (backquoted in SQL) routes to the commit-log
    // relation; time travel does not compose with it — the history IS
    // every version
    if (ident.name.endsWith(GraftHistoryTable.Suffix) &&
        ident.name.length > GraftHistoryTable.Suffix.length) {
      require(version.isEmpty && tsMs.isEmpty,
        "time travel over a $history relation is meaningless — it " +
          "already lists every version")
      val base = Identifier.of(ident.namespace,
        ident.name.dropRight(GraftHistoryTable.Suffix.length))
      val baseDir = dirOf(base)
      if (!isTable(baseDir)) throw new NoSuchTableException(base)
      return new GraftHistoryTable(baseDir)
    }
    val dir = dirOf(ident)
    val all = VersionedTable.snapshots(spark, dir)
    if (all.isEmpty) throw new NoSuchTableException(ident)
    val snap = (version, tsMs) match {
      case (Some(v), _) => all.find(_.version == v).getOrElse(sys.error(
        s"table $catalogName.${ident.name} has no version $v"))
      case (_, Some(ms)) =>
        val eligible = all.filter(_.timestampMs <= ms)
        require(eligible.nonEmpty,
          s"table $catalogName.${ident.name} has no version at or before $ms")
        eligible.last
      case _ => all.last
    }
    new GraftTable(dir, snap, pinned = version.isDefined || tsMs.isDefined)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None, None)
  /** SQL `VERSION AS OF v`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLong), None)
  /** SQL `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, None, Some(Math.floorDiv(timestampMicros, 1000L)))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft catalog tables lay out data via cluster()/z-order commits, " +
        "not directory partitioning; CREATE TABLE takes no PARTITIONED BY")
    val dir = dirOf(ident)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    VersionedTable.create(empty, dir)
    loadTable(ident)
  }

  /** `ALTER TABLE` text → the format's own metadata-only evolution
    * commits — each change is one atomic manifest commit and not one
    * byte of data moves:
    *
    * {{{
    *   ALTER TABLE gvt.t ADD COLUMNS (bonus DECIMAL(18,2))
    *   ALTER TABLE gvt.t RENAME COLUMN price TO base_price
    *   ALTER TABLE gvt.t DROP COLUMN legacy
    * }}}
    *
    * RENAME engages column mapping (stable field ids + physical names,
    * stats/blooms remap with the logical name); DROP remembers the
    * physical name so a later re-ADD of it fails fast instead of
    * resurrecting dropped data; ADD joins at the end, nullable. Shapes
    * the format cannot honor metadata-only (type changes, nested
    * fields, column positioning, NOT NULL adds) are refused loudly.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    def single(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        "graft ALTER TABLE supports top-level columns only; got nested " +
          fieldNames.mkString("."))
      fieldNames.head
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.position() == null,
          "graft ADD COLUMN appends at the end; FIRST/AFTER positioning " +
            "is not supported (column order is logical-schema order)")
        VersionedTable.addColumn(spark, dir,
          org.apache.spark.sql.types.StructField(
            single(a.fieldNames()), a.dataType(), a.isNullable))
      case r: TableChange.RenameColumn =>
        VersionedTable.renameColumn(spark, dir,
          single(r.fieldNames()), r.newName())
      case d: TableChange.DeleteColumn =>
        VersionedTable.dropColumn(spark, dir, single(d.fieldNames()))
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE does not support ${other.getClass.getSimpleName}" +
          "; supported: ADD COLUMN (nullable, top-level), RENAME COLUMN, " +
          "DROP COLUMN. Type changes need a rewrite — use the " +
          "VersionedTable API overwrite path")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) return false
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException(
      "renameTable is not supported (shallow clones may borrow this " +
        "table's files by absolute path; a move would strand them)")

  // ------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val p = new Path(warehouse)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Array.empty
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => isTable(s"$warehouse/$n"))
      .map(n => Array(n))
  }

  override def listNamespaces(namespace: Array[String]):
      Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }

  override def loadNamespaceMetadata(namespace: Array[String]):
      JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("alterNamespace not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(namespace.nonEmpty, "cannot drop the root namespace")
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")}" +
        " is not empty; use CASCADE")
    fs.delete(p, true)
  }
}
