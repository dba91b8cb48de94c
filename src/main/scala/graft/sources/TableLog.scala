package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal versioned table format: a transaction log over parquet (S22).
  *
  * The reference engine queries mutable warehouse tables through their
  * vendor's transactionality (reference: DistributedQueryEngine.diff,
  * PostgresqlDatabase/ApacheHiveDatabase hunks); a lake-native engine
  * needs the equivalent on raw object storage. This is the standard
  * log-structured design (Delta/Iceberg shape, re-derived minimally):
  *
  *   <table>/data/v<N>-<uid>/   parquet written by a normal Spark job
  *   <table>/_log/<N>.manifest  snapshot manifest: the FULL list of
  *                              data dirs live at version N
  *
  * The INVARIANT that buys ACID-on-a-lake: data files are invisible
  * until a manifest references them, and manifest publication is a
  * single atomic create-if-absent. So:
  *
  *  - Readers see a consistent snapshot (the manifest's dir list) —
  *    never a half-written commit; a crash mid-commit leaves orphan
  *    data dirs that no reader resolves and [[vacuum]] later deletes.
  *  - Writers race on the SAME next version number and exactly one
  *    wins ([[ConcurrentCommitException]] for the loser — optimistic
  *    concurrency, rebase-and-retry). Locally the claim is Hadoop
  *    `FileSystem.rename`, which fails when the destination exists;
  *    on an object store the same slot would be a conditional put.
  *  - Time travel is free: old manifests pin old snapshots until
  *    [[vacuum]] ages them out.
  *  - Incremental consumption ([[changesBetween]]) is the set-diff of
  *    two manifests' dir lists — O(manifest), never a data diff.
  *
  * Scale notes: manifests hold DIRECTORY names, one per commit, so log
  * replay is O(commits) tiny-file reads on the driver — data volume
  * never enters the control path; snapshot reads hand Spark the full
  * dir list in ONE `parquet(dirs*)` call so scan parallelism, pushdown
  * and partition pruning are unchanged; [[compact]] bounds small-file
  * growth by folding history into one dir inside one ordinary commit.
  * Appends require an identical schema signature (loud error — the
  * additive-drift gate lives in [[SchemaDrift]], not here).
  */
object TableLog {

  final class ConcurrentCommitException(v: Long, dir: String)
    extends RuntimeException(
      s"version $v of $dir was committed by another writer — rebase and retry")

  /** `stats`: commit-level zone maps — (dataDir, column, min, max) for
    * LONG-typed columns, carried in the manifest so planning can skip
    * whole commits without touching data (Delta-style file skipping at
    * commit granularity; see [[readRange]]). Dirs without stats for a
    * column are always read — skipping is an optimization, never a
    * correctness dependency. */
  final case class Manifest(version: Long, op: String, schemaJson: String,
                            dirs: Seq[String],
                            stats: Seq[(String, String, Long, Long)] = Seq.empty,
                            dvs: Seq[Dv] = Seq.empty,
                            blooms: Seq[(String, String, String)] = Seq.empty,
                            constraints: Seq[(String, String)] = Seq.empty)

  /** One deletion vector: `dataDir` holds the deleted KEYS (`keyCols`
    * projection), and it applies to exactly the first `coversDirs`
    * entries of the manifest's dir list — the dirs that existed when
    * the delete committed. The dir list is append-ordered (appends do
    * `prev.dirs :+ d`), so that prefix IS the delete-time snapshot:
    * rows appended later with a deleted key are NOT affected, matching
    * positional-DV semantics (Delta/Iceberg) without file/row-position
    * bookkeeping. Any rewrite commit (compact/merge/delete/overwrite/
    * zorder) materializes and drops DVs. */
  final case class Dv(dataDir: String, keyCols: Seq[String], coversDirs: Int)

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logPath(dir: String) = new Path(dir, "_log")
  private def manifestPath(dir: String, v: Long) =
    new Path(logPath(dir), f"$v%020d.manifest")

  /** Publication time (epoch millis) of `v`'s manifest — the commit
    * clock `TIMESTAMP AS OF` time travel reads (the V2 catalog's
    * loadTable-by-timestamp); same semantics as Delta/Iceberg's
    * commit-file mtime. */
  def manifestModTime(spark: SparkSession, dir: String, v: Long): Long = {
    val p = manifestPath(dir, v)
    fsFor(spark, p).getFileStatus(p).getModificationTime
  }

  /** All committed versions, ascending; empty for a fresh path. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val lp = logPath(dir)
    val fs = fsFor(spark, lp)
    if (!fs.exists(lp)) Seq.empty
    else fs.listStatus(lp).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong).sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** Line-oriented manifest body — no JSON parser in the control path
    * (schema json is opaque pass-through; dirs are one per line). */
  private def render(m: Manifest): String =
    (Seq(s"version=${m.version}", s"op=${m.op}", s"schema=${m.schemaJson}") ++
      m.dirs.map(d => s"dir=$d") ++
      m.stats.map { case (d, c, lo, hi) => s"stats=$d;$c;$lo;$hi" } ++
      m.dvs.map(v => s"dv=${v.dataDir};${v.keyCols.mkString(",")};${v.coversDirs}") ++
      m.blooms.map { case (d, c, b64) => s"bloom=$d;$c;$b64" } ++
      // expression base64'd: constraint SQL may contain ';' or newlines
      m.constraints.map { case (n, e) => s"check=$n;" +
        java.util.Base64.getEncoder.encodeToString(e.getBytes("UTF-8")) })
      .mkString("", "\n", "\n")

  def readManifest(spark: SparkSession, dir: String, v: Long): Manifest = {
    val p = manifestPath(dir, v)
    val fs = fsFor(spark, p)
    require(fs.exists(p), s"table $dir has no version $v")
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = body.linesIterator.toSeq
    def field(k: String): String = lines.find(_.startsWith(k + "="))
      .getOrElse(sys.error(s"corrupt manifest $p: missing $k"))
      .drop(k.length + 1)
    Manifest(field("version").toLong, field("op"), field("schema"),
      lines.filter(_.startsWith("dir=")).map(_.drop(4)),
      lines.filter(_.startsWith("stats=")).map { l =>
        val Array(d, c, lo, hi) = l.drop(6).split(";")
        (d, c, lo.toLong, hi.toLong)
      },
      lines.filter(_.startsWith("dv=")).map { l =>
        val Array(d, ks, n) = l.drop(3).split(";")
        Dv(d, ks.split(",").toSeq, n.toInt)
      },
      lines.filter(_.startsWith("bloom=")).map { l =>
        val Array(d, c, b64) = l.drop(6).split(";")
        (d, c, b64)
      },
      lines.filter(_.startsWith("check=")).map { l =>
        val Array(n, b64) = l.drop(6).split(";", 2)
        (n, new String(java.util.Base64.getDecoder.decode(b64), "UTF-8"))
      })
  }

  /** Publish `m` as the one committed manifest for its version: write a
    * hidden temp file, then CLAIM the version slot atomically so of two
    * racing writers exactly one wins; the loser's temp file is removed
    * and the race surfaces as [[ConcurrentCommitException]] — never a
    * silent overwrite of someone else's commit.
    *
    * The claim primitive matters: on HDFS, rename-to-existing returns
    * false, but POSIX rename(2) — what RawLocalFileSystem does —
    * REPLACES an existing destination, and an `exists` pre-check only
    * narrows the window (two same-slot publishers can both pass it and
    * the second rename silently swallows the first commit; the
    * concurrent-appender spec caught exactly this). Locally the claim
    * is therefore `link(2)` (hard-link tmp into the slot), which POSIX
    * guarantees fails with EEXIST atomically; on an object store the
    * same slot would be a conditional put (If-None-Match). */
  private def publish(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val dst = manifestPath(dir, m.version)
    val fs = fsFor(spark, dst)
    fs.mkdirs(logPath(dir))
    val tmp = new Path(logPath(dir),
      s".tmp-${m.version}-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(render(m).getBytes("UTF-8")) finally out.close()
    val claimed =
      if (fs.getScheme == "file") {
        // atomic create-exclusive via hard link; tmp (and its checksum
        // sidecar) cleaned up either way
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else !fs.exists(dst) && fs.rename(tmp, dst)
    if (fs.getScheme == "file" || !claimed) fs.delete(tmp, false)
    if (!claimed) throw new ConcurrentCommitException(m.version, dir)
  }

  /** Write `df` as a new data dir for version `v` — data is INVISIBLE
    * until the manifest referencing the dir publishes. */
  private def writeData(df: DataFrame, dir: String, v: Long): String = {
    val d = s"$dir/data/v$v-${java.util.UUID.randomUUID()}"
    df.write.parquet(d)
    d
  }

  private def requireSameSchema(df: DataFrame, prev: Manifest, dir: String): Unit = {
    val table = org.apache.spark.sql.types.DataType.fromJson(prev.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // nullability NARROWING is always sound: a non-nullable batch column
    // (SQL literals, aggregates) writes into a nullable table column
    // without any reader-visible change — the manifest schema stays the
    // contract. Everything else (names, order, types, nullable table
    // column asked to accept a wider batch) stays a loud refusal.
    val ok = df.schema.length == table.length &&
      df.schema.fields.zip(table.fields).forall { case (b, t) =>
        b.name == t.name && b.dataType == t.dataType &&
          (b.nullable == t.nullable || (!b.nullable && t.nullable))
      }
    require(ok,
      s"append to $dir: schema mismatch vs version ${prev.version} — " +
        s"table has ${prev.schemaJson}, batch has ${df.schema.json}; evolve " +
        "explicitly (SchemaDrift gates additive drift), never by silent union")
  }

  /** Commit-level zone map for the WRITTEN dir: min/max of each LONG
    * stats column, read back from the new files (the footer-stats pass
    * a production format gets for free from the writer). */
  private def statsFor(spark: SparkSession, d: String,
                       statsCols: Seq[String]): Seq[(String, String, Long, Long)] =
    if (statsCols.isEmpty) Seq.empty
    else {
      // one agg computing min+max per column
      val aggs = statsCols.flatMap(c =>
        Seq(min(col(c)).cast("long").as(s"__lo_$c"), max(col(c)).cast("long").as(s"__hi_$c")))
      val r = spark.read.parquet(d).agg(aggs.head, aggs.tail: _*).head()
      statsCols.zipWithIndex.flatMap { case (c, i) =>
        if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) None // empty/all-null batch
        else Some((d, c, r.getLong(2 * i), r.getLong(2 * i + 1)))
      }
    }

  /** Commit-level Bloom membership sketch for the WRITTEN dir: one
    * fixed-size (`numBits`) filter per column over `xxhash64(col)`,
    * base64 in the manifest. Works for ANY column type (zone maps need
    * ordered longs; blooms answer equality on strings/ids), O(numBits)
    * per commit regardless of row count. False positives only — a
    * commit the bloom can't rule out is read and the residual filter
    * decides, so skipping never changes answers. */
  private def bloomsFor(spark: SparkSession, d: String,
                        bloomCols: Seq[String],
                        numBits: Long = 8192L): Seq[(String, String, String)] =
    bloomCols.map { c =>
      val bytes = spark.read.parquet(d)
        .agg(expr(s"bloom_agg(xxhash64($c), ${numBits / 8}L, ${numBits}L)"))
        .head().getAs[Array[Byte]](0)
      (d, c, java.util.Base64.getEncoder.encodeToString(bytes))
    }

  /** `xxhash64(lit(value))` folded on the driver — same seed (42) and
    * type semantics as the executor-side expression the blooms hashed. */
  private def hashLiteral(value: Any): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(value)), 42L)
      .eval(null).asInstanceOf[Long]

  /** Enforce every table CHECK constraint on `df` BEFORE anything is
    * written — ONE aggregate pass counting violations per constraint
    * (SQL-standard semantics: a row violates only when the expression
    * is explicitly FALSE; NULL passes). A violation names the
    * constraint and its count — the batch never lands. */
  private def requireConstraints(df: DataFrame,
                                 constraints: Seq[(String, String)],
                                 dir: String, context: String): Unit =
    if (constraints.nonEmpty) {
      // coalesce: sum() over an EMPTY batch is NULL — an empty append/
      // micro-batch/snapshot violates nothing and must pass, not NPE
      val counts = df.agg(
        count(lit(1)).as("__n"),
        constraints.map { case (n, e) =>
          coalesce(sum(when(!coalesce(expr(e), lit(true)), 1L).otherwise(0L)),
            lit(0L)).as(n)
        }: _*).head
      val bad = constraints.zipWithIndex
        .map { case ((n, e), i) => (n, e, counts.getLong(i + 1)) }
        .filter(_._3 > 0)
      require(bad.isEmpty,
        s"$context to $dir violates CHECK constraint(s): " +
          bad.map { case (n, e, c) => s"$n [$e] on $c row(s)" }.mkString("; "))
    }

  /** Register a named CHECK constraint: the CURRENT snapshot must
    * already satisfy it (full validation scan — the same contract as
    * Delta's ALTER TABLE ADD CONSTRAINT), then it rides in the manifest
    * and every subsequent append/merge/overwrite batch is gated by it. */
  def addConstraint(spark: SparkSession, dir: String,
                    name: String, sqlExpr: String): Long = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"addConstraint: '$name' — names must match [A-Za-z0-9_]+ (anything " +
        "else, e.g. a newline, would corrupt the line-oriented manifest)")
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    require(!prev.constraints.exists(_._1 == name),
      s"constraint $name already exists on $dir")
    requireConstraints(readVersion(spark, dir, prevV), Seq(name -> sqlExpr),
      dir, "addConstraint: existing snapshot")
    val v = prevV + 1
    publish(spark, dir, prev.copy(version = v, op = s"add-check:$name",
      constraints = prev.constraints :+ (name -> sqlExpr)))
    v
  }

  /** Drop a named constraint (loud if absent — a typo'd drop that
    * silently "succeeds" would leave the gate everyone assumes gone). */
  def dropConstraint(spark: SparkSession, dir: String, name: String): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    require(prev.constraints.exists(_._1 == name),
      s"constraint $name does not exist on $dir")
    val v = prevV + 1
    publish(spark, dir, prev.copy(version = v, op = s"drop-check:$name",
      constraints = prev.constraints.filterNot(_._1 == name)))
    v
  }

  /** Create the table at `dir` as version 0. Fails loudly if any
    * version already exists. `statsCols` (LONG columns) adds commit
    * zone maps for [[readRange]] skipping. */
  def create(spark: SparkSession, df: DataFrame, dir: String,
             statsCols: Seq[String] = Seq.empty,
             bloomCols: Seq[String] = Seq.empty): Long = {
    require(latestVersion(spark, dir).isEmpty,
      s"table $dir already exists — use append/overwrite")
    val d = writeData(df, dir, 0L)
    publish(spark, dir, Manifest(0L, "create", df.schema.json, Seq(d),
      statsFor(spark, d, statsCols),
      blooms = bloomsFor(spark, d, bloomCols)))
    0L
  }

  /** Append `df` as the next version (previous dirs stay live); prior
    * commits' zone maps carry forward untouched. */
  def append(spark: SparkSession, df: DataFrame, dir: String,
             statsCols: Seq[String] = Seq.empty,
             bloomCols: Seq[String] = Seq.empty): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist — create first"))
    val prev = readManifest(spark, dir, prevV)
    requireSameSchema(df, prev, dir)
    requireConstraints(df, prev.constraints, dir, "append")
    val v = prevV + 1
    val d = writeData(df, dir, v)
    publish(spark, dir, Manifest(v, "append", prev.schemaJson, prev.dirs :+ d,
      prev.stats ++ statsFor(spark, d, statsCols), prev.dvs,
      prev.blooms ++ bloomsFor(spark, d, bloomCols), prev.constraints))
    v
  }

  /** Append `df` as the next version, EVOLVING the table schema when
    * the batch is an additive superset (new nullable columns only —
    * [[SchemaDrift.gateAdditive]] is the gate, so drops and retypes
    * still fail the batch loudly before anything lands). Old data dirs
    * are untouched: the evolved manifest schema makes every reader see
    * the new columns as NULL on pre-evolution rows ([[readVersion]]),
    * which is exactly Delta/Iceberg `mergeSchema` semantics at
    * commit-metadata cost — no data rewrite, O(manifest) planning.
    * A batch with the REGISTERED schema (no drift) is an ordinary
    * append through the same call. */
  def evolveAppend(spark: SparkSession, df: DataFrame, dir: String,
                   statsCols: Seq[String] = Seq.empty): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist — create first"))
    val prev = readManifest(spark, dir, prevV)
    val registered = org.apache.spark.sql.types.DataType
      .fromJson(prev.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val evolved = SchemaDrift.gateAdditive(registered, df.schema)
    requireConstraints(df, prev.constraints, dir, "evolve-append")
    val v = prevV + 1
    // write in the evolved column ORDER so all post-evolution dirs share
    // one layout (readers match by name; this is for humans + scanners)
    val d = writeData(df.select(evolved.fieldNames.map(col).toSeq: _*), dir, v)
    publish(spark, dir, Manifest(v, "evolve-append", evolved.json,
      prev.dirs :+ d, prev.stats ++ statsFor(spark, d, statsCols), prev.dvs,
      prev.blooms, prev.constraints))
    v
  }

  /** Range scan with commit-granularity data skipping: only data dirs
    * whose zone map intersects [lo, hi] enter the Spark scan — the
    * others are pruned at PLANNING time from the manifest alone, the
    * log-metadata analogue of partition pruning (and exactly how a
    * time-range query over an append-mostly table avoids touching
    * years of history). Dirs lacking stats for `column` are read
    * (skipping never changes answers); the residual filter stays in
    * the plan and reaches the parquet scan as PushedFilters. */
  def readRange(spark: SparkSession, dir: String, column: String,
                lo: Long, hi: Long): DataFrame = {
    val m = readManifest(spark, dir,
      latestVersion(spark, dir).getOrElse(sys.error(s"table $dir does not exist")))
    val byDir = m.stats.filter(_._2 == column).map(s => s._1 -> (s._3, s._4)).toMap
    val keep = m.dirs.filter(d => byDir.get(d).forall { case (mn, mx) =>
      mx >= lo && mn <= hi
    })
    val pred = col(column) >= lo && col(column) <= hi
    // DV-deleted rows can only SHRINK a commit's true min/max, so the
    // stored zone maps over-include, never skip a live row — the
    // anti-join inside the DV scan stays correct under skipping
    if (keep.isEmpty) scanWithDvs(spark, m, m.dirs, _.filter(pred)).limit(0)
    else scanWithDvs(spark, m, keep, _.filter(pred))
  }

  /** Point lookup with Bloom commit skipping: only data dirs whose
    * membership sketch MIGHT contain `value` enter the scan — the
    * equality sibling of [[readRange]]'s zone maps, and the one that
    * works for strings and other unordered keys ("find this doc_id /
    * user hash in years of commits"). False positives cost a read that
    * the residual pushed filter then empties; false negatives are
    * impossible (the bloom hashed every row the commit wrote), so
    * skipping never changes answers; bloom-less dirs are always read.
    * DV subtraction stays correct: DVs only remove rows, so a sketch
    * built at write time can only over-include. */
  def readPoint(spark: SparkSession, dir: String, column: String,
                value: Any): DataFrame = {
    val m = readManifest(spark, dir,
      latestVersion(spark, dir).getOrElse(sys.error(s"table $dir does not exist")))
    val byDir = m.blooms.filter(_._2 == column).map(b => b._1 -> b._3).toMap
    val h = hashLiteral(value)
    val keep = m.dirs.filter(d => byDir.get(d).forall { b64 =>
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(
          java.util.Base64.getDecoder.decode(b64)))
        .mightContainLong(h)
    })
    val pred = col(column) === lit(value)
    if (keep.isEmpty) scanWithDvs(spark, m, m.dirs, _.filter(pred)).limit(0)
    else scanWithDvs(spark, m, keep, _.filter(pred))
  }

  /** Replace the table contents as the next version; older snapshots
    * remain readable until vacuumed. The new schema WINS (overwrite is
    * the sanctioned full-rewrite evolution path). */
  def overwrite(spark: SparkSession, df: DataFrame, dir: String): Long = {
    val prevOpt = latestVersion(spark, dir)
    // an overwrite replaces DATA, not table identity: registered
    // constraints survive and gate the replacement rows too
    val cons = prevOpt.map(readManifest(spark, dir, _).constraints)
      .getOrElse(Seq.empty)
    requireConstraints(df, cons, dir, "overwrite")
    val v = prevOpt.map(_ + 1).getOrElse(0L)
    val d = writeData(df, dir, v)
    publish(spark, dir, Manifest(v, "overwrite", df.schema.json, Seq(d),
      constraints = cons))
    v
  }

  /** Snapshot read at `version` (time travel) — ONE multi-dir parquet
    * scan, so pushdown/pruning/parallelism are ordinary Spark. The
    * MANIFEST's schema is authoritative (passed explicitly to the
    * reader): after an [[evolveAppend]] the pre-evolution dirs simply
    * lack the new columns and surface them as NULL, parquet's standard
    * missing-column semantics — no footer-merging (`mergeSchema`) scan
    * over every file, which at 100 TB is a planning-time full-lake
    * metadata pass. Time travel to a pre-evolution version reads with
    * THAT version's narrower schema, as committed. */
  def readVersion(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val m = readManifest(spark, dir, version)
    scanWithDvs(spark, m, m.dirs, identity)
  }

  /** Snapshot scan with deletion vectors: dirs are grouped by WHICH DVs
    * cover them (dir at append-position i is covered by DVs with
    * coversDirs > i — a handful of prefix groups, never per-dir scans),
    * each group scanned once under the manifest's authoritative schema,
    * anti-joined against the union of its covering DV key frames per
    * distinct key-column set, then unioned. `shape` is applied to each
    * group scan BEFORE the anti-join so pushed filters/pruning reach
    * parquet ([[readRange]]); the DV side is deleted-KEYS only — at
    * scale it broadcasts, the standard merge-on-read probe cost until
    * [[compact]]/[[merge]] materializes. */
  private def scanWithDvs(spark: SparkSession, m: Manifest,
                          dirs: Seq[String],
                          shape: DataFrame => DataFrame): DataFrame = {
    val schema = org.apache.spark.sql.types.DataType.fromJson(m.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def scan(ds: Seq[String]) = shape(spark.read.schema(schema).parquet(ds: _*))
    if (m.dvs.isEmpty) scan(dirs)
    else {
      val pos = m.dirs.zipWithIndex.toMap
      dirs.groupBy(d => m.dvs.filter(_.coversDirs > pos(d))).toSeq
        .map { case (covering, group) =>
          covering.groupBy(_.keyCols).foldLeft(scan(group)) {
            case (acc, (keyCols, dvGroup)) =>
              acc.join(spark.read.parquet(dvGroup.map(_.dataDir): _*)
                .distinct(), keyCols, "left_anti")
          }
        }.reduce(_.unionByName(_))
    }
  }

  /** Latest snapshot read. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir,
      latestVersion(spark, dir)
        .getOrElse(sys.error(s"table $dir does not exist")))

  /** Snapshot row count WITHOUT scanning data: parquet footers carry
    * exact per-file record counts, so COUNT(*) is an O(files)
    * metadata read (executed as a tiny distributed job over the file
    * list — at lake scale footer reads parallelize like any scan, but
    * move no row data). Tables with pending deletion vectors fall back
    * to the real snapshot count (the DV subtraction is an anti-join —
    * a metadata count would overcount deleted rows); the fast path
    * resumes after any rewrite commit materializes the DVs. A
    * production format caches these counts in the manifest at commit
    * time; reading footers keeps every PRE-EXISTING table eligible
    * with zero manifest migration. */
  def fastCount(spark: SparkSession, dir: String): Long = {
    val v = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val m = readManifest(spark, dir, v)
    if (m.dvs.nonEmpty) readVersion(spark, dir, v).count()
    else {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      val files = m.dirs.flatMap { d =>
        val p = new Path(d)
        val fs = fsFor(spark, p)
        // loud like the scan path: a manifest-listed dir missing on disk
        // is corruption — silently counting 0 would hide data loss
        require(fs.exists(p), s"fastCount: data dir $d of $dir is missing")
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).map(_.toString)
      }
      if (files.isEmpty) 0L
      else spark.sparkContext.parallelize(files, math.min(files.size, 32))
        .map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf.value)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum().toLong
    }
  }

  /** Rows added between `fromVersion` (exclusive) and `toVersion`
    * (inclusive): the set-diff of the two manifests' dir lists, read as
    * one scan. O(manifest) planning — the CDC feed for downstream
    * incremental consumers (the L2b/L39 ingest pattern). Fails loudly
    * if a dir visible at `fromVersion` is gone at `toVersion` (an
    * intervening overwrite/compact rewrote history — a dir diff would
    * silently misreport it as pure addition). */
  def changesBetween(spark: SparkSession, dir: String,
                     fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"changesBetween: $fromVersion > $toVersion")
    val from = readManifest(spark, dir, fromVersion)
    val to = readManifest(spark, dir, toVersion)
    val removed = from.dirs.toSet -- to.dirs.toSet
    require(removed.isEmpty,
      s"changesBetween($fromVersion, $toVersion) on $dir: versions " +
        s"${fromVersion + 1}..$toVersion rewrite existing data " +
        s"(overwrite/compact) — not a pure append range")
    require(from.dvs == to.dvs,
      s"changesBetween($fromVersion, $toVersion) on $dir: the range " +
        "contains a deletion-vector commit — visibility of EXISTING rows " +
        "changed, which a dir diff cannot represent as pure addition")
    val added = to.dirs.filterNot(from.dirs.toSet)
    val toSchema = org.apache.spark.sql.types.DataType.fromJson(to.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    if (added.isEmpty) spark.read.schema(toSchema).parquet(to.dirs: _*).limit(0)
    else spark.read.schema(toSchema).parquet(added: _*)
  }

  /** Fold the current snapshot into ONE data dir as the next version —
    * the small-file compaction every log-structured table needs; an
    * ordinary commit, so readers never block and old versions stay
    * readable until vacuumed. `parts` bounds the output layout. */
  def compact(spark: SparkSession, dir: String, parts: Int = 8): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    val v = prevV + 1
    val d = s"$dir/data/v$v-${java.util.UUID.randomUUID()}"
    // snapshot read (DVs applied) → the rewrite MATERIALIZES pending
    // deletes; the new manifest carries no deletion vectors
    readVersion(spark, dir, prevV).repartition(parts).write.parquet(d)
    publish(spark, dir, Manifest(v, "compact", prev.schemaJson, Seq(d),
      constraints = prev.constraints))
    v
  }

  /** OPTIMIZE ZORDER as an ordinary commit: rewrite the snapshot
    * clustered on `cols` via the Morton curve ([[graft.operators.Layout
    * .zvalue]] — equal-frequency buckets, bit-interleave, ONE range
    * shuffle + in-partition sort), published like [[compact]] so
    * readers never block and a crash leaves the previous version live.
    * Rows are untouched — only bytes-on-disk order changes — but every
    * output file now covers a small hyper-rectangle of the clustered
    * columns, so parquet row-group min-max pruning (and the commit
    * zone maps, recorded for `cols`) turn selective on EVERY clustered
    * column, not just a lead sort key. This is the nightly layout job
    * a 100 TB append-mostly table runs after ingest: appends land fast
    * and unclustered, the zorder commit restores scan selectivity. */
  def compactZorder(spark: SparkSession, dir: String, cols: Seq[String],
                    parts: Int = 8, bits: Int = 6): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    val v = prevV + 1
    val d = s"$dir/data/v$v-${java.util.UUID.randomUUID()}"
    val snap = readVersion(spark, dir, prevV)
    val statCols = cols.filter(c => snap.schema(c).dataType ==
      org.apache.spark.sql.types.LongType)
    snap.withColumn("__z", graft.operators.Layout.zvalue(snap, cols, bits))
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(d)
    publish(spark, dir, Manifest(v, "zorder", prev.schemaJson, Seq(d),
      statsFor(spark, d, statCols), constraints = prev.constraints))
    v
  }

  // ------------------------------------------------- mutations (CoW)

  /** MERGE (upsert) by key: target rows whose key matches an update row
    * are replaced, unmatched update rows are inserted — published as
    * one copy-on-write commit. The rewrite is an anti-join + union (two
    * fixed-width-key shuffles; with the table and updates bucketed on
    * the key both would co-locate); history stays readable, so a failed
    * merge leaves the table exactly at the previous version. At 100 TB
    * the refinement is partition-scoped rewrites (only partitions
    * holding matched keys re-written) or deletion vectors — the commit
    * protocol here is unchanged by either. */
  def merge(spark: SparkSession, updates: DataFrame, dir: String,
            keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge: at least one key column")
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    requireSameSchema(updates, prev, dir)
    requireConstraints(updates, prev.constraints, dir, "merge")
    val next = readVersion(spark, dir, prevV)
      .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)
    val v = prevV + 1
    val d = writeData(next, dir, v)
    publish(spark, dir, Manifest(v, "merge", prev.schemaJson, Seq(d),
      constraints = prev.constraints))
    v
  }

  /** Copy-on-write DELETE: rows matching `predicate` are dropped in one
    * rewrite commit (the GDPR/right-to-erasure shape — the old versions
    * still hold the rows until [[vacuum]], which is the actual erasure
    * boundary and must be part of any compliance story). */
  def delete(spark: SparkSession, dir: String, predicate: org.apache.spark.sql.Column): Long = {
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    val next = readVersion(spark, dir, prevV).filter(!predicate)
    val v = prevV + 1
    val d = writeData(next, dir, v)
    publish(spark, dir, Manifest(v, "delete", prev.schemaJson, Seq(d),
      constraints = prev.constraints))
    v
  }

  /** Copy-on-write UPDATE: SET assignments applied where `predicate`
    * holds, in one rewrite commit — the row-level sibling of [[delete]]
    * (same erasure boundary: old versions keep the pre-update rows
    * until [[vacuum]]). Assignment values are cast to the manifest
    * column types (the schema is the contract, exactly as the SQL
    * insert path aligns with `Dataset.to`); CHECK constraints are
    * re-verified on the REWRITTEN frame, so an UPDATE cannot smuggle a
    * constraint violation past the gate the append path enforces. */
  def update(spark: SparkSession, dir: String,
             predicate: org.apache.spark.sql.Column,
             assignments: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    require(assignments.nonEmpty, "update: at least one SET assignment")
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    val schema = org.apache.spark.sql.types.DataType.fromJson(prev.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val assignMap = assignments.toMap
    assignments.foreach { case (k, _) =>
      require(schema.fieldNames.contains(k), s"update: $k is not a column of $dir")
    }
    val next = readVersion(spark, dir, prevV).select(
      schema.fields.toIndexedSeq.map { f =>
        assignMap.get(f.name) match {
          case Some(v) =>
            when(predicate, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    requireConstraints(next, prev.constraints, dir, "update")
    val v = prevV + 1
    val d = writeData(next, dir, v)
    publish(spark, dir, Manifest(v, "update", prev.schemaJson, Seq(d),
      constraints = prev.constraints))
    v
  }

  /** Merge-on-read DELETE via a deletion vector: the commit writes only
    * the DELETED KEYS (O(Δ), never O(table) — the fast path [[delete]]'s
    * copy-on-write doc comment promises at 100 TB) and every subsequent
    * read subtracts them with one anti-join ([[applyDvs]]). Time travel
    * still works: older manifests carry fewer DVs, so pre-delete
    * versions show the rows. NOT an erasure path — the bytes stay in
    * the data files until [[compact]]/[[merge]]/[[delete]] materializes
    * the deletes and [[vacuum]] destroys the old dirs; compliance
    * stories must still end in copy-on-write + vacuum. */
  def deleteByKey(spark: SparkSession, keys: DataFrame, dir: String,
                  keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "deleteByKey: at least one key column")
    val prevV = latestVersion(spark, dir)
      .getOrElse(sys.error(s"table $dir does not exist"))
    val prev = readManifest(spark, dir, prevV)
    val tableSchema = org.apache.spark.sql.types.DataType
      .fromJson(prev.schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    keyCols.foreach(k => require(tableSchema.fieldNames.contains(k),
      s"deleteByKey: $k is not a column of $dir"))
    val v = prevV + 1
    val d = s"$dir/data/v$v-dv-${java.util.UUID.randomUUID()}"
    keys.select(keyCols.map(col): _*).distinct().write.parquet(d)
    publish(spark, dir, Manifest(v, "delete-dv", prev.schemaJson, prev.dirs,
      prev.stats, prev.dvs :+ Dv(d, keyCols, prev.dirs.size),
      constraints = prev.constraints))
    v
  }

  // --------------------------------------- exactly-once streaming sink

  private def batchIdOf(op: String): Option[Long] =
    if (op.startsWith("append:batch=")) Some(op.drop("append:batch=".length).toLong)
    else None

  /** Batch ids already committed — read from the manifest ops, so the
    * replay guard costs O(commits) manifest reads and ZERO data reads. */
  def committedBatchIds(spark: SparkSession, dir: String): Set[Long] =
    versions(spark, dir)
      .flatMap(v => batchIdOf(readManifest(spark, dir, v).op)).toSet

  /** Exactly-once micro-batch append: the epoch's batchId rides in the
    * manifest op, so a replayed epoch (post-crash re-delivery — Spark's
    * foreachBatch contract is at-least-once) is detected from the log
    * alone and commits NOTHING. With the single-writer guarantee of a
    * restarted streaming query this yields exactly-once table contents;
    * a genuinely concurrent duplicate writer loses the version-slot
    * race in [[publish]] and surfaces loudly. */
  def appendBatch(spark: SparkSession, df: DataFrame, dir: String,
                  batchId: Long): Option[Long] = {
    if (committedBatchIds(spark, dir).contains(batchId)) None
    else {
      val prevOpt = latestVersion(spark, dir)
      val v = prevOpt.map(_ + 1).getOrElse(0L)
      val prevM = prevOpt.map(readManifest(spark, dir, _))
      prevM.foreach(m => requireSameSchema(df, m, dir))
      prevM.foreach(m =>
        requireConstraints(df, m.constraints, dir, s"append:batch=$batchId"))
      val prevDirs = prevM.map(_.dirs).getOrElse(Seq.empty)
      val d = writeData(df, dir, v)
      publish(spark, dir,
        Manifest(v, s"append:batch=$batchId", df.schema.json, prevDirs :+ d,
          prevM.map(_.stats).getOrElse(Seq.empty),
          prevM.map(_.dvs).getOrElse(Seq.empty),
          constraints = prevM.map(_.constraints).getOrElse(Seq.empty)))
      Some(v)
    }
  }

  /** `writeStream.foreachBatch(TableLog.streamSink(dir))` — the
    * streaming entry point over [[appendBatch]]. */
  def streamSink(dir: String): (DataFrame, Long) => Unit =
    (df, batchId) => { appendBatch(df.sparkSession, df, dir, batchId); () }

  /** Rebase-and-retry around the optimistic version-slot race: run
    * `attempt` (any single commit op — append/merge/delete/...), and on
    * [[ConcurrentCommitException]] re-run it against the newly-current
    * snapshot, up to `maxRetries` times. This is the standard OCC write
    * loop every log-structured format ships: append-shaped commits
    * always rebase cleanly (the loser re-reads the new tip and re-lands
    * on the next slot); semantic conflicts are the CALLER's attempt
    * function re-deriving its batch from the current state. Fails loudly
    * when contention outlasts the budget — never a silent drop. */
  def commitWithRetry(attempt: () => Long, maxRetries: Int = 5): Long = {
    var tries = 0
    while (true) {
      try return attempt()
      catch { case e: ConcurrentCommitException =>
        tries += 1
        if (tries > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Streaming READ of the table — commits become micro-batches, offsets
    * are manifest versions (see [[graft.sources.TableLogStreamProvider]]
    * for the contract: append-only ranges, frozen schema, exactly-once
    * under checkpointing). */
  def readStream(spark: SparkSession, dir: String,
                 startingVersion: String = "0",
                 ignoreDeletes: Boolean = false): DataFrame =
    spark.readStream
      .format(classOf[TableLogStreamProvider].getName)
      .option("path", dir)
      .option("startingVersion", startingVersion)
      .option("ignoreDeletes", ignoreDeletes.toString)
      .load()

  /** S22 catalog proof: orders lands in three append commits, the query
    * TIME-TRAVELS to version 1 (the first two batches) and aggregates —
    * the DuckDB oracle recomputes the same snapshot from the mod-3
    * batch rule directly, so the hash match certifies that the log
    * replays to exactly the right snapshot (not just "some rows"). */
  private val sqlCatSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  val catalog: Seq[graft.Q] = Seq(
    // S24 proof: the ENTIRE flow runs through the V2 catalog plugin's
    // SQL surface (graft.sources.v2.TableLogCatalog) — CREATE NAMESPACE,
    // CTAS (create + append commit), INSERT INTO (append commit), then
    // the aggregate SELECT with a pushed filter — and the oracle
    // recomputes the same slices from the base table, so a lost commit,
    // misaligned schema, or broken pushdown all hash-mismatch. Each
    // invocation registers a FRESH catalog name: Spark caches catalog
    // plugins per name at first use, so a reused name would pin the
    // first run's temp root.
    graft.Q(
      "src6_sql_catalog",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 3 <= 1 AND o_orderkey >= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cat = s"graftsql_src6_${sqlCatSeq.incrementAndGet()}"
      val root = java.nio.file.Files.createTempDirectory("sqlcat").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.TableLogCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("src6_orders")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      s.sql(s"""CREATE TABLE $cat.ns.orders AS
               |SELECT * FROM src6_orders WHERE o_orderkey % 3 = 0""".stripMargin)
      s.sql(s"""INSERT INTO $cat.ns.orders
               |SELECT * FROM src6_orders WHERE o_orderkey % 3 = 1""".stripMargin)
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
               |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               |    AS cents
               |FROM $cat.ns.orders WHERE o_orderkey >= 10
               |GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // S24b (r6): SQL `UPDATE … SET … WHERE …` over the versioned table,
    // routed through the injected ResolveGraftUpdate analysis rule into
    // ONE copy-on-write [[update]] commit. The oracle recomputes the
    // post-update snapshot from the base table with a CASE, so a lost
    // update, wrong-rows update, or double-apply all hash-mismatch.
    graft.Q(
      "src10_sql_update",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round((CASE WHEN o_orderkey % 3 = 1 THEN o_totalprice * 2
        |    ELSE o_totalprice END) * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cat = s"graftsql_src10_${sqlCatSeq.incrementAndGet()}"
      val root = java.nio.file.Files.createTempDirectory("sqlupd").toString
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.TableLogCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .createOrReplaceTempView("src10_orders")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
      s.sql(s"CREATE TABLE $cat.ns.orders AS SELECT * FROM src10_orders")
      s.sql(s"UPDATE $cat.ns.orders SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey % 3 = 1")
      s.sql(s"""SELECT o_orderpriority, count(*) AS n_orders,
               |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
               |    AS cents
               |FROM $cat.ns.orders GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    graft.Q(
      "src2_timetravel",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 3 <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("txlog").toString + "/orders"
      val orders = graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      create(s, orders.filter(col("o_orderkey") % 3 === 0), dir)
      append(s, orders.filter(col("o_orderkey") % 3 === 1), dir)
      append(s, orders.filter(col("o_orderkey") % 3 === 2), dir)
      readVersion(s, dir, 1L)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
    },

    // S22b proof: MERGE semantics hash-checked end to end — the table
    // starts as the mod-3 ∈ {0,1} slice, the update batch re-prices
    // mod-3 ∈ {1,2} at 2×, so after the merge: 0 untouched, 1 UPDATED
    // (replaced, not duplicated), 2 INSERTED. The oracle recomputes
    // that exact three-way outcome from the base table, so a duplicate
    // key, lost update, or dropped insert all hash-mismatch.
    graft.Q(
      "src3_merge",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round((CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice
        |    ELSE o_totalprice * 2 END) * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("txmerge").toString + "/orders"
      val orders = graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      create(s, orders.filter(col("o_orderkey") % 3 <= 1), dir)
      merge(s, orders.filter(col("o_orderkey") % 3 >= 1)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        dir, Seq("o_orderkey"))
      read(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
    },

    // S22d proof: SCHEMA EVOLUTION hash-checked end to end — the table
    // starts with 3 columns (mod-3 = 0 rows), then an evolve-append
    // lands the mod-3 ∈ {1,2} rows WITH a new `o_custkey` column: no
    // data rewrite, old rows read as NULL in the new column. The oracle
    // recomputes the post-evolution snapshot from the base table (null
    // custkey on the old slice), so a dropped legacy row, a misfiled
    // new column, or non-null garbage on pre-evolution rows all
    // hash-mismatch. n_legacy pins the NULL-backfill semantics
    // specifically.
    graft.Q(
      "src4_schema_evolution",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_legacy,
        |  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END)
        |    AS BIGINT) AS custkey_sum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("txevo").toString + "/orders"
      val orders = graft.Tables.orders(s, d)
      create(s, orders.filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice"), dir)
      evolveAppend(s, orders.filter(col("o_orderkey") % 3 =!= 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_custkey"), dir)
      read(s, dir)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(col("o_custkey")).as("custkey_sum"))
        .orderBy("o_orderpriority")
    },

    // T35 proof: the full lakehouse streaming LOOP hash-checked end to
    // end — orders lands in a source table over four commits (two of
    // them WHILE the stream runs), a streaming query reads the log
    // incrementally ([[TableLogStreamProvider]]), filters high-value
    // orders row-level in flight, and lands in a second table through
    // the exactly-once sink; the query aggregates the SINK table. The
    // oracle recomputes the filtered aggregate from the base table, so
    // a dropped commit, a double-delivered batch, or a stream that
    // missed mid-flight appends all hash-mismatch.
    graft.Q(
      "src5_stream_pipeline",
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders WHERE o_totalprice > 250000
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val root = java.nio.file.Files.createTempDirectory("txstream").toString
      val src = s"$root/orders"
      val out = s"$root/high_value"
      val orders = graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      def slice(k: Int) = orders.filter(col("o_orderkey") % 4 === k)
      create(s, slice(0), src)
      append(s, slice(1), src)
      val q = readStream(s, src)
        .filter(col("o_totalprice") > 250000)
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch(streamSink(out))
        .start()
      try {
        q.processAllAvailable()
        append(s, slice(2), src) // mid-stream commits must flow through
        append(s, slice(3), src)
        q.processAllAvailable()
      } finally q.stop() // never leak a polling stream into the session
      read(s, out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
    }
  )

  /** Delete data dirs unreferenced by the `retainLast` newest manifests
    * (crashed-commit orphans included) and drop the aged-out manifests;
    * returns the deleted data dirs. Time travel keeps working for
    * retained versions — vacuum is the ONLY operation that destroys
    * history, and it never touches a dir the retained window references. */
  /** S27 — zero-copy shallow clone: a NEW table whose v0 manifest
    * references the SOURCE's data dirs verbatim — no bytes move, the
    * clone materializes in O(manifest). Snapshot state (schema, stats,
    * blooms, DVs, constraints) carries over, so the clone reads exactly
    * the source's current snapshot; from then on the two logs diverge
    * independently (every mutation writes under its OWN `data/` root).
    *
    * The shared-file contract is Delta's shallow-clone contract:
    * `vacuum` is TABLE-LOCAL (it only ever deletes dirs under its own
    * `data/` root, so vacuuming a CLONE can never touch source bytes),
    * but vacuuming the SOURCE after it rewrites away from the shared
    * dirs CAN delete files a clone still references — the clone then
    * fails LOUDLY at scan time (file-not-found), never silently wrong.
    * Production lineage between clones needs a shared file refcount or
    * catalog-level lease, out of scope here and spec-documented.
    */
  def shallowClone(spark: SparkSession, srcDir: String, dstDir: String): Long = {
    require(latestVersion(spark, dstDir).isEmpty,
      s"clone target $dstDir already exists")
    val srcV = latestVersion(spark, srcDir)
      .getOrElse(sys.error(s"table $srcDir does not exist"))
    val m = readManifest(spark, srcDir, srcV)
    publish(spark, dstDir,
      m.copy(version = 0L, op = s"clone src=$srcDir v=$srcV"))
    0L
  }

  def vacuum(spark: SparkSession, dir: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "vacuum: must retain at least the latest version")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"table $dir does not exist")
    val (aged, kept) = vs.splitAt(math.max(0, vs.length - retainLast))
    val live = kept.flatMap { v =>
      val m = readManifest(spark, dir, v)
      m.dirs ++ m.dvs.map(_.dataDir) // DV dirs are as load-bearing as data dirs
    }.toSet
    val dataRoot = new Path(s"$dir/data")
    val fs = fsFor(spark, dataRoot)
    val onDisk =
      if (fs.exists(dataRoot))
        fs.listStatus(dataRoot).toSeq.filter(_.isDirectory)
          .map(_.getPath.toUri.getPath)
      else Seq.empty
    // compare by path suffix: manifests may store scheme-less paths
    val dead = onDisk.filterNot(p => live.exists(l =>
      p.endsWith(new Path(l).toUri.getPath)))
    // manifests FIRST: a crash mid-vacuum then leaves orphan data dirs
    // (invisible, cleaned by the next vacuum) — the other order leaves
    // live-looking manifests referencing deleted data, which would turn
    // a time-travel read into a scan-time file-not-found
    aged.foreach(v => fs.delete(manifestPath(dir, v), false))
    dead.foreach(p => fs.delete(new Path(p), true))
    dead
  }
}
