package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, StructType}

/** Structured-streaming SOURCE over a [[TableLog]] table (T35) — the
  * read half of the lakehouse loop whose write half is
  * [[TableLog.streamSink]]: stream OUT of the versioned table the same
  * way CDC consumers stream out of Delta/Iceberg.
  *
  *  - **Offsets are commit versions.** `getOffset` = the latest
  *    manifest version (an O(1) directory listing, no data reads);
  *    batch (a, b] = the data dirs manifest b references that manifest
  *    a does not — the same O(manifest) dir diff as
  *    [[TableLog.changesBetween]], so planning cost is independent of
  *    table size, and a micro-batch is exactly the commits it covers.
  *  - **Exactly-once composition.** Offsets live in the engine's
  *    checkpoint; getBatch is a pure function of two manifests, so a
  *    post-crash replay re-reads precisely the same dirs. Chained into
  *    [[TableLog.streamSink]] downstream (whose batchId replay guard
  *    dedups the sink side) the table→stream→table pipeline is
  *    end-to-end exactly-once.
  *  - **Append-only discipline, loudly enforced.** A rewrite commit
  *    (compact/overwrite/merge/delete/zorder) inside a batch range
  *    means existing rows changed visibility — a dir diff cannot
  *    represent that as pure addition, so getBatch REFUSES with the
  *    same contract as changesBetween instead of silently re-emitting
  *    or dropping rows; restart the stream from a fresh snapshot.
  *    Deletion-vector commits refuse too unless `ignoreDeletes=true`
  *    (the Delta option's semantics: the stream keeps emitting
  *    appends and simply never retracts).
  *  - **Schema is frozen at stream start** (the manifest schema of the
  *    starting snapshot). An [[TableLog.evolveAppend]] mid-stream keeps
  *    working: new dirs are read through the frozen schema (extra
  *    columns ignored, parquet missing-column NULL semantics for the
  *    rest) — restart the stream to pick up the wider schema.
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[TableLogStreamProvider].getName)
  *     .option("path", tableDir)
  *     .option("startingVersion", "0")     // default: 0 = full history
  *     .option("ignoreDeletes", "false")   // default
  *     .load()
  * }}}
  * `startingVersion=latest` starts past the snapshot at stream start
  * (new commits only).
  */
class TableLogStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-tablelog"

  private def tableDir(params: Map[String, String]): String =
    params.getOrElse("path",
      sys.error("graft-tablelog source: .option(\"path\", <table dir>) is required"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            params: Map[String, String]): (String, StructType) = {
    val dir = tableDir(params)
    val spark = ctx.sparkSession
    val v = TableLog.latestVersion(spark, dir)
      .getOrElse(sys.error(s"graft-tablelog source: $dir does not exist yet"))
    val m = TableLog.readManifest(spark, dir, v)
    (shortName(),
      DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            params: Map[String, String]): Source = {
    val dir = tableDir(params)
    val starting = params.getOrElse("startingVersion", "0")
    val ignoreDeletes = params.getOrElse("ignoreDeletes", "false").toBoolean
    new TableLogSource(ctx.sparkSession, dir,
      schema.getOrElse(sourceSchema(ctx, schema, providerName, params)._2),
      starting, ignoreDeletes)
  }
}

private[sources] class TableLogSource(spark: SparkSession, dir: String,
                                      streamSchema: StructType,
                                      starting: String,
                                      ignoreDeletes: Boolean) extends Source {

  /** First version the stream emits; resolved ONCE at source creation
    * ("latest" must not move as commits land). */
  private val startVersion: Long = starting match {
    case "latest" => TableLog.latestVersion(spark, dir).map(_ + 1).getOrElse(0L)
    case s => s.toLong
  }

  override def schema: StructType = streamSchema

  private def versionOf(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[V1Offset] =
    TableLog.latestVersion(spark, dir)
      .filter(_ >= startVersion)
      .map(LongOffset(_))

  /** Rows the commits in (start, end] appended, read through the frozen
    * stream schema. Pure function of the two manifests — replays are
    * bit-identical, which is what makes the checkpoint contract hold. */
  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    val fromV = start.map(versionOf).getOrElse(startVersion - 1)
    val df =
      if (fromV < 0) {
        // initial snapshot: the table AS OF endV — deletion vectors
        // APPLY here (readVersion's scan), exactly like a batch read;
        // the DV refusal below only concerns deletes that happen
        // mid-stream, where emitting-without-retracting would lie
        TableLog.readVersion(spark, dir, endV)
      } else {
        val to = TableLog.readManifest(spark, dir, endV)
        val from = TableLog.readManifest(spark, dir, fromV)
        val removed = from.dirs.toSet -- to.dirs.toSet
        require(removed.isEmpty,
          s"graft-tablelog stream on $dir: versions ${fromV + 1}..$endV " +
            "rewrite existing data (overwrite/compact/merge/delete) — not " +
            "an append range; restart the stream from a fresh snapshot")
        require(ignoreDeletes || from.dvs == to.dvs,
          s"graft-tablelog stream on $dir: versions ${fromV + 1}..$endV " +
            "contain a deletion-vector commit; the stream cannot retract " +
            "rows — set ignoreDeletes=true to keep streaming appends only")
        val added = to.dirs.filterNot(from.dirs.toSet)
        // frozen schema: evolve-append dirs' extra columns are ignored,
        // missing columns surface as NULL (parquet standard semantics)
        if (added.isEmpty)
          spark.read.schema(streamSchema).parquet(to.dirs: _*).limit(0)
        else spark.read.schema(streamSchema).parquet(added: _*)
      }
    org.apache.spark.sql.graft.StreamingDataFrame.asStreaming(
      df.select(streamSchema.fieldNames.map(col).toIndexedSeq: _*))
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}
