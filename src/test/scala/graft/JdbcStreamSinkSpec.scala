package graft

import graft.streaming.EventStream
import java.sql.DriverManager
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T15: streaming upsert into a transactional JDBC sink — the
  * serving-database pattern composing S10 (live Derby JDBC) with T7's
  * idempotence. Proves: values land, later batches overwrite the same
  * keys, a replayed batch id is a no-op, and a batch re-run WITHOUT its
  * commit marker (the crash-between-data-and-marker window) converges to
  * the same state instead of duplicating.
  */
class JdbcStreamSinkSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql); () } finally c.close()
  }

  private def state(table: String): Seq[(Long, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(s"SELECT k, v FROM $table ORDER BY k")
      Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getLong(1), r.getDouble(2)))
        .toList
    } finally c.close()
  }

  test("T15 streaming JDBC upsert sink: upsert, replay no-op, marker-less re-run converges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    exec("CREATE TABLE scores (k BIGINT NOT NULL PRIMARY KEY, v DOUBLE)")
    exec("CREATE TABLE scores_commits (batch_id BIGINT NOT NULL PRIMARY KEY)")

    val in = MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("user_id", "score").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
        EventStream.jdbcUpsertSink(b, id, url, "scores", "user_id", "score"))
      .start()
    in.addData((1L, 10.0), (2L, 20.0))
    q.processAllAvailable()
    assert(state("scores") === Seq((1L, 10.0), (2L, 20.0)))

    // second batch overwrites key 1, inserts key 3
    in.addData((1L, 11.0), (3L, 30.0))
    q.processAllAvailable()
    q.stop()
    assert(state("scores") === Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))

    // replay of an already-committed batch id: data deliberately WRONG —
    // the commit marker must short-circuit before any write happens
    val poison = Seq((1L, 999.0)).toDF("user_id", "score")
    EventStream.jdbcUpsertSink(poison, 1L, url, "scores", "user_id", "score")
    assert(state("scores") === Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))

    // crash window: batch 1's data applied but marker lost — re-running
    // the SAME batch (at-least-once redelivery) must converge, not dup
    exec("DELETE FROM scores_commits WHERE batch_id = 1")
    val redelivered = Seq((1L, 11.0), (3L, 30.0)).toDF("user_id", "score")
    EventStream.jdbcUpsertSink(redelivered, 1L, url, "scores", "user_id", "score")
    assert(state("scores") === Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)))
  }
}
