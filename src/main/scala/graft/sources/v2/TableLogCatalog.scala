package graft.sources.v2

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.SupportsDelete
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.TableLog

/** S24 — the versioned table log ([[TableLog]]) surfaced as a full
  * Spark `TableCatalog` plugin, so the WHOLE SQL warehouse surface works
  * against graft's own table format:
  *
  * {{{
  *   spark.sql.catalog.graftsql      = graft.sources.v2.TableLogCatalog
  *   spark.sql.catalog.graftsql.root = /lake/root
  *
  *   CREATE TABLE graftsql.ns.t (k BIGINT, v STRING)
  *   INSERT INTO graftsql.ns.t VALUES ...
  *   INSERT OVERWRITE graftsql.ns.t SELECT ...
  *   SELECT * FROM graftsql.ns.t WHERE k = 5
  *   SELECT * FROM graftsql.ns.t VERSION AS OF 1   -- time travel
  * }}}
  *
  * Design: reads and writes BRIDGE to the engine's native parquet path
  * rather than re-implementing it — the read is a `V1Scan` whose
  * relation builds the snapshot DataFrame ([[TableLog.readVersion]]:
  * manifest-planned multi-dir scan, DV subtraction), with pushed
  * filters and pruned columns applied INSIDE that plan so they reach
  * the parquet scan (asserted in TableLogCatalogSpec); the write is a
  * `V1Write`/`InsertableRelation` delegating to [[TableLog.append]] /
  * [[TableLog.overwrite]], so every INSERT is one atomic manifest
  * commit with the OCC race semantics of the native API (racing SQL
  * writers get loud [[TableLog.ConcurrentCommitException]]s, never a
  * silent lost commit). This is the same architecture production
  * lakehouse formats shipped first (a thin catalog over the native
  * commit protocol + the engine's own columnar IO) — writing a custom
  * `DataWriter` would re-implement parquet encoding for no semantic
  * gain; the from-scratch writer contract is demonstrated by S20.
  *
  * Deliberately unsupported (loud errors, never silent drift):
  * partitioned CREATE (the log clusters via OPTIMIZE ZORDER instead),
  * ALTER TABLE (schema evolution goes through the gated
  * [[TableLog.evolveAppend]]), RENAME (a metadata move of live data
  * dirs is not atomic on object stores).
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine exposes
  * vendor catalogs through a registry (DistributedQueryEngine.diff,
  * RDBMSDatabase.scala hunk); this is the same move for graft's own
  * table format on the V2 catalog API.
  */
class TableLogCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  private def spark = SparkSession.active
  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.root")
  }

  override def name(): String = catalogName

  private def dirFor(ident: Identifier): String =
    (root +: ident.namespace.toSeq :+ ident.name).mkString("/")
  private def nsPath(ns: Array[String]) =
    new org.apache.hadoop.fs.Path((root +: ns.toSeq).mkString("/"))

  private def isTableDir(p: org.apache.hadoop.fs.Path): Boolean =
    fs(p).exists(new org.apache.hadoop.fs.Path(p, "_log"))

  // ------------------------------------------------------------ tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!fs(p).exists(p)) throw new NoSuchNamespaceException(namespace)
    fs(p).listStatus(p).filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    TableLog.latestVersion(spark, dir) match {
      case Some(v) => new GraftLogTable(dir, v)
      case None => throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    }
  }

  /** `VERSION AS OF <v>` time travel — the SQL face of
    * [[TableLog.readVersion]]. The loaded table is read-only in
    * practice: Spark plans writes only against the plain-loaded table. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$catalogName: VERSION AS OF wants the numeric commit version, got '$version'")
    }
    if (!TableLog.versions(spark, dir).contains(v))
      throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    new GraftLogTable(dir, v)
  }

  /** `TIMESTAMP AS OF <t>` — the latest version whose manifest was
    * PUBLISHED at or before `t` (Spark hands micros). Commit time is the
    * manifest file's modification time — the same clock Delta/Iceberg
    * time travel reads; a table created entirely after `t` is a loud
    * "no such version", not an empty frame. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirFor(ident)
    val cutoffMs = timestampMicros / 1000L
    val vs = TableLog.versions(spark, dir)
    if (vs.isEmpty) throw new NoSuchTableException(ident.namespace.toSeq :+ ident.name)
    val eligible = vs.filter(v =>
      TableLog.manifestModTime(spark, dir, v) <= cutoffMs)
    require(eligible.nonEmpty,
      s"$catalogName: table $dir has no commit at or before timestamp " +
        s"${cutoffMs}ms — earliest version is ${vs.min}")
    new GraftLogTable(dir, eligible.max)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      s"$catalogName: PARTITIONED BY is not supported — the table log " +
        "clusters with OPTIMIZE ZORDER (TableLog.compactZorder) instead")
    val dir = dirFor(ident)
    if (TableLog.latestVersion(spark, dir).isDefined)
      throw new TableAlreadyExistsException(ident.namespace.toSeq :+ ident.name)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    TableLog.create(spark, empty, dir)
    new GraftLogTable(dir, 0L)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName: ALTER TABLE is not supported — evolve schemas through " +
        "the gated TableLog.evolveAppend (additive drift only, loud refusal otherwise)")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (TableLog.latestVersion(spark, dir).isEmpty) false
    else { fs(p).delete(p, true); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName: RENAME is not supported — moving live data dirs is not " +
        "atomic on object stores; copy via CTAS and drop instead")

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val p = nsPath(Array.empty)
    if (!fs(p).exists(p)) Array.empty
    else fs(p).listStatus(p)
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = nsPath(namespace)
      fs(p).exists(p) && !isTableDir(p)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] =
    if (namespaceExists(namespace)) Map.empty[String, String].asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    fs(nsPath(namespace)).mkdirs(nsPath(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(s"$catalogName: ALTER NAMESPACE unsupported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!namespaceExists(namespace)) false
    else {
      require(cascade || fs(p).listStatus(p).isEmpty,
        s"namespace ${namespace.mkString(".")} is not empty")
      fs(p).delete(p, true)
    }
  }
}

/** One versioned-log table as seen by the V2 catalog: BATCH_READ via the
  * V1Scan bridge (pushdown/pruning applied inside the snapshot plan),
  * V1_BATCH_WRITE + TRUNCATE via [[TableLog.append]]/[[TableLog.overwrite]]. */
private[v2] class GraftLogTable(dir: String, version: Long)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {
  // NOT SupportsRowLevelOperations: SQL UPDATE / MERGE INTO ride the
  // group-based rewrite framework, whose ReplaceData plan requires a
  // NATIVE V2 Batch scan (BatchScanExec calls Scan.toBatch — verified
  // empirically; the V1Scan bridge is not honored there). Providing one
  // would mean re-implementing parquet reading + DV subtraction inside
  // a connector scan for no semantic gain — and wiring the interface
  // anyway would silently BREAK the SupportsDelete fast path (the
  // rewrite is preferred over it when both exist). SQL UPDATE is served
  // instead by an injected analysis rule ([[ResolveGraftUpdate]], r6)
  // that routes the statement to TableLog.update's copy-on-write
  // commit; MERGE stays on the native API (TableLog.merge).

  private def spark = SparkSession.active
  private lazy val manifest = TableLog.readManifest(spark, dir, version)

  /** The log directory — [[ResolveGraftUpdate]] routes SQL UPDATE here. */
  private[v2] def tableDir: String = dir

  override def name(): String = s"graftlog:$dir@v$version"
  override def schema(): StructType =
    DataType.fromJson(manifest.schemaJson).asInstanceOf[StructType]
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  /** SQL `DELETE FROM … WHERE …` → [[TableLog.delete]] (a copy-on-write
    * commit; history stays readable until vacuum — the documented
    * erasure boundary). Only fully-translatable predicates are accepted
    * (`canDeleteWhere`), so a shape the bridge can't express fails the
    * STATEMENT loudly instead of deleting the wrong rows. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(FilterTranslation.toColumn(_).isDefined)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters.flatMap(FilterTranslation.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    TableLog.delete(spark, dir, pred)
    ()
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(dir, version, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new LogWriteBuilder(dir)
}

/** Filter pushdown + column pruning for the SQL read path. Handled
  * filters are re-applied INSIDE the snapshot DataFrame (so they reach
  * the parquet scan as PushedFilters); unhandled shapes are returned to
  * Spark as residuals — pushdown here can narrow IO but never change
  * answers. */
private[v2] object FilterTranslation {
  /** v1 `Filter` → `Column`, for the shapes the bridge handles; `None`
    * means the caller must treat the filter as a residual. */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None // EqualNullSafe, string contains, … — residual
  }
}

private[v2] class LogScanBuilder(dir: String, version: Long, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  import FilterTranslation.toColumn

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition(toColumn(_).isDefined)
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = required
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val outer = this
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = required
        override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
          val snap = TableLog.readVersion(context.sparkSession, dir, version)
          val filtered = pushed.flatMap(toColumn)
            .foldLeft(snap)((d, c) => d.filter(c))
          filtered.select(required.fieldNames.toIndexedSeq.map(col): _*).rdd
        }
        override def toString: String = outer.toString
      }.asInstanceOf[T]
    }
    override def toString: String =
      s"GraftLogScan(dir=$dir, v=$version, pushed=${pushed.mkString(",")})"
  }
}

/** INSERT INTO → [[TableLog.append]] (one atomic manifest commit);
  * INSERT OVERWRITE → truncate() → [[TableLog.overwrite]]. The incoming
  * frame is aligned to the table schema with `Dataset.to` (SQL inserts
  * arrive with non-nullable literals; the manifest schema is the
  * contract). */
private[v2] class LogWriteBuilder(dir: String)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteArg: Boolean): Unit = {
          val spark = data.sparkSession
          val v = TableLog.latestVersion(spark, dir)
            .getOrElse(sys.error(s"table $dir does not exist"))
          val schema = DataType
            .fromJson(TableLog.readManifest(spark, dir, v).schemaJson)
            .asInstanceOf[StructType]
          val aligned = data.to(schema)
          if (overwrite || overwriteArg) TableLog.overwrite(spark, aligned, dir)
          else TableLog.append(spark, aligned, dir)
          ()
        }
      }
  }
}
