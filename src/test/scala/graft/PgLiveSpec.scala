package graft

import java.net.Socket
import java.util.Properties

import graft.sources.pgwire.{PgWireClient, PgWireDriver}
import org.apache.spark.sql.functions._

/** LIVE PostgreSQL federation — the one reference surface
  * (RDBMSDatabase.scala's PostgresqlDatabase, the primary vendor) that
  * was an environmental gap through r4: no pgjdbc ships offline, so the
  * round trip runs over the repo's own wire-protocol JDBC shim
  * ([[PgWireDriver]]) against a throwaway trust-auth cluster the spec
  * manages itself under /tmp (the sandbox ships a real PostgreSQL 15
  * server binary). Every test `assume`s the cluster: on a machine
  * without the server (or without root to su postgres) the suite
  * CANCELS rather than fails — environmental honesty, not a silent
  * skip of a red test.
  */
object PgLive {
  val Port = 54329
  private val Bin = "/usr/lib/postgresql/15/bin"
  private val Dir = "/tmp/graftpg"

  private def up: Boolean =
    try { new Socket("127.0.0.1", Port).close(); true }
    catch { case _: java.io.IOException => false }

  private def sh(cmd: String): Int =
    new ProcessBuilder("bash", "-c", cmd)
      .redirectErrorStream(true).start().waitFor()

  /** Idempotently ensure the throwaway cluster accepts connections. */
  lazy val available: Boolean = up || {
    if (!new java.io.File(s"$Bin/pg_ctl").exists()) false
    else {
      sh(s"mkdir -p $Dir && chown postgres $Dir 2>/dev/null")
      sh(s"""su postgres -c "test -d $Dir/data || $Bin/initdb -D $Dir/data --auth=trust -U graft" """)
      sh(s"""su postgres -c "$Bin/pg_ctl -D $Dir/data -l $Dir/pg.log -o '-p $Port -k $Dir' start" """)
      (1 to 20).exists { _ => Thread.sleep(250); up }
    }
  }

  val Url = s"jdbc:postgresql://127.0.0.1:$Port/postgres"

  def client(): PgWireClient = new PgWireClient("127.0.0.1", Port, "postgres", "graft")
}

class PgLiveSpec extends SparkSpecBase {

  private def withPg[A](f: PgWireClient => A): A = {
    val c = PgLive.client()
    try f(c) finally c.close()
  }

  test("wire client: DDL, typed inserts, and a typed SELECT round trip") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    withPg { c =>
      c.query("DROP TABLE IF EXISTS graft_probe")
      c.query("""CREATE TABLE graft_probe (
        id bigint, name text, score double precision, amount numeric(10,2),
        flag boolean, ts timestamp, d date, payload bytea)""")
      c.query("""INSERT INTO graft_probe VALUES
        (1, 'it''s quoted', 1.5, 12.34, true,
         TIMESTAMP '2026-08-14 12:00:00.123', DATE '2026-08-14', '\x0102ff'),
        (2, NULL, NULL, NULL, false, NULL, NULL, NULL)""")
      val r = c.query("SELECT * FROM graft_probe ORDER BY id")
      assert(r.rows.length === 2)
      assert(r.cols.map(_.name).toSeq ===
        Seq("id", "name", "score", "amount", "flag", "ts", "d", "payload"))
      assert(r.rows(0)(1) === "it's quoted")
      assert(r.rows(1)(1) === null)
      assert(r.tags.last.startsWith("SELECT"))
    }
  }

  test("spark reads a live Postgres table through the shim, with pushdown") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    withPg { c =>
      c.query("DROP TABLE IF EXISTS graft_orders")
      c.query("CREATE TABLE graft_orders (okey bigint, prio text, cents bigint)")
      val values = (0 until 500)
        .map(i => s"($i, 'P${i % 5}', ${i * 100})").mkString(",")
      c.query(s"INSERT INTO graft_orders VALUES $values")
    }
    val df = spark.read.format("jdbc")
      .option("url", PgLive.Url)
      .option("dbtable", "graft_orders")
      .option("driver", "graft.sources.pgwire.PgWireDriver")
      .option("user", "graft")
      .load()
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)).toSet ===
      Set(("okey", "bigint"), ("prio", "string"), ("cents", "bigint")))
    // predicate + projection push into the remote scan: only the
    // filtered rows cross the wire
    val filtered = df.filter(col("prio") === "P3").select("okey", "cents")
    assert(filtered.count() === 100)
    val agg = filtered.agg(sum("cents")).head().getLong(0)
    assert(agg === (0 until 500).filter(_ % 5 == 3).map(_ * 100L).sum)
  }

  test("spark reads partitioned (4 parallel wire connections)") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    val df = spark.read.format("jdbc")
      .option("url", PgLive.Url)
      .option("dbtable", "graft_orders")
      .option("driver", "graft.sources.pgwire.PgWireDriver")
      .option("user", "graft")
      .option("partitionColumn", "okey")
      .option("lowerBound", "0").option("upperBound", "500")
      .option("numPartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 500)
    assert(df.agg(sum("cents")).head().getLong(0) ===
      (0 until 500).map(_ * 100L).sum)
  }

  test("spark writes a DataFrame to Postgres (typed, batched, transactional) and reads it back") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    import spark.implicits._
    withPg(_.query("DROP TABLE IF EXISTS graft_docs"))
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars")
      .withColumn("score", col("n_chars").cast("double") / 7)
    docs.write.format("jdbc")
      .option("url", PgLive.Url)
      .option("dbtable", "graft_docs")
      .option("driver", "graft.sources.pgwire.PgWireDriver")
      .option("user", "graft")
      .option("batchsize", "100")
      .mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", PgLive.Url)
      .option("dbtable", "graft_docs")
      .option("driver", "graft.sources.pgwire.PgWireDriver")
      .option("user", "graft")
      .load()
    assert(back.count() === docs.count())
    // exact content round trip (long + string + double)
    val a = docs.orderBy("doc_id").as[(Long, String, Long, Double)].collect()
    val b = back.orderBy("doc_id").as[(Long, String, Long, Double)].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("the repo's PostgresDialect SQL executes live (quoting is load-bearing)") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    // the dialect's double-quoted identifiers must be REAL pg syntax:
    // round-trip a mixed-case, keyword-colliding column name
    withPg { c =>
      c.query("DROP TABLE IF EXISTS graft_quoted")
      c.query("""CREATE TABLE graft_quoted ("Select" bigint, "order" text)""")
      c.query("""INSERT INTO graft_quoted VALUES (42, 'x')""")
      val quoted = graft.sources.PostgresDialect.quote("Select")
      val r = c.query(s"""SELECT $quoted FROM graft_quoted WHERE ${
        graft.sources.PostgresDialect.quote("order")} = 'x'""")
      assert(r.rows.map(_.toSeq) === Vector(Seq("42")))
    }
  }

  test("jdbc shim standalone: DriverManager-independent connect honors the JDBC contract Spark uses") {
    assume(PgLive.available, "no local PostgreSQL server — environmental")
    val conn = new PgWireDriver().connect(PgLive.Url, {
      val p = new Properties(); p.setProperty("user", "graft"); p
    })
    try {
      assert(conn.getMetaData.supportsTransactions())
      val ps = conn.prepareStatement("SELECT ? + okey AS v FROM graft_orders WHERE okey < ? ORDER BY okey")
      ps.setLong(1, 1000L); ps.setInt(2, 3)
      val rs = ps.executeQuery()
      val got = Iterator.continually(rs).takeWhile(_.next()).map(_.getLong(1)).toSeq
      assert(got === Seq(1000L, 1001L, 1002L))
      // transactional write path: rollback really rolls back
      conn.setAutoCommit(false)
      conn.createStatement().executeUpdate("DELETE FROM graft_orders WHERE okey = 0")
      conn.rollback()
      conn.setAutoCommit(true)
      val rs2 = conn.createStatement()
        .executeQuery("SELECT count(*) FROM graft_orders WHERE okey = 0")
      rs2.next()
      assert(rs2.getLong(1) === 1L)
    } finally conn.close()
  }
}
