package graft.sources.v2

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSource V2 connector (S20): a deterministic
  * synthetic sequence table `(id bigint, val bigint, tag string)` with
  * `val = id·37 mod 101`, `tag = "t" + id mod 5`, demonstrating the full
  * connector contract the built-in sources implement:
  *
  *  - `TableProvider` → `Table` → `ScanBuilder` → `Scan`/`Batch` →
  *    `PartitionReaderFactory` → per-partition `PartitionReader`;
  *  - REAL filter pushdown (`SupportsPushDownFilters`): range predicates
  *    on `id` NARROW the generated range — pushed rows are never
  *    produced, not produced-then-dropped; non-range filters are
  *    returned to Spark as residuals and evaluated post-scan;
  *  - column pruning (`SupportsPushDownRequiredColumns`): only requested
  *    fields are materialized per row;
  *  - explicit parallelism: `partitions` option → that many
  *    `InputPartition` row ranges.
  *
  * Usage: `spark.read.format("graft.sources.v2.SeqDataSource")
  * .option("rows", n).option("partitions", p).load()`. The catalog entry
  * `src1_dsv2_seq` hash-matches it against DuckDB's `range()` — an
  * engine-independent check that pushdown never changes answers.
  */
class SeqDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("partitions", "4").toInt)
}

object SeqDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def valOf(id: Long): Long = id * 37 % 101
  def tagOf(id: Long): UTF8String = UTF8String.fromString("t" + (id % 5))

  // S20's oracle-checked face: the custom connector + a pushed id-range
  // + a residual aggregate, hash-matched against DuckDB generating the
  // same sequence from range() — connector pushdown provably never
  // changes answers. (Takes no table dir: the source IS the data.)
  val catalog: Seq[graft.Q] = Seq(
    graft.Q(
      "src1_dsv2_seq",
      """SELECT 't' || CAST(i % 5 AS VARCHAR) AS tag, count(*) AS n,
        |  CAST(sum((i*37) % 101) AS BIGINT) AS sum_val
        |FROM range(1000, 4000) t(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, _) =>
      import org.apache.spark.sql.functions._
      s.read.format("graft.sources.v2.SeqDataSource")
        .option("rows", "5000").option("partitions", "8").load()
        .filter(col("id") >= 1000 && col("id") < 4000)
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), sum("val").as("sum_val"))
        .orderBy("tag")
    })
}

private class SeqTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, partitions)
}

private class SeqScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqDataSource.schema

  /** Range predicates on `id` tighten [lo, hi); everything else is a
    * residual Spark evaluates after the scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    handled.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(lo, math.max(lo, hi), required, partitions)
}

private case class SeqRange(start: Long, end: Long) extends InputPartition

private class SeqScan(lo: Long, hi: Long, required: StructType, partitions: Int)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, partitions)
    val span = math.max(0L, hi - lo)
    val step = math.max(1L, (span + n - 1) / n)
    (0 until n).iterator
      .map(i => SeqRange(lo + i * step, math.min(hi, lo + (i + 1) * step)))
      .filter(r => r.end > r.start)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

private class SeqReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SeqRange(start, end) = partition.asInstanceOf[SeqRange]
    // resolved ONCE per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map {
          case "id"  => id
          case "val" => SeqDataSource.valOf(id)
          case "tag" => SeqDataSource.tagOf(id)
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
