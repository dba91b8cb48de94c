package graft

/** Pins T38 (ev30 forward fill) against a sequential LOCF walk. */
class TemporalFillSpec extends SparkSpecBase {

  test("ev30: forward fill equals the sequential carry-forward, nulls before first obs") {
    import spark.implicits._
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", $"value",
        org.apache.spark.sql.functions.expr("unix_micros(ts)").as("tsl"))
      .as[(Long, Long, String, Double, Long)].collect()
    val ref: Map[Long, Option[Double]] = ev.groupBy(_._2).iterator.flatMap {
      case (_, es) =>
        var carry: Option[Double] = None
        es.sortBy(e => (e._5, e._1)).map { e =>
          if (e._3 == "purchase") carry = Some(e._4)
          e._1 -> carry
        }
    }.toMap
    val got = Temporal.run(spark, sf0001)
    assert(got.size === ref.size)
    for ((id, v) <- got) assert(v === ref(id), s"event $id")
  }

  private object Temporal {
    def run(s: org.apache.spark.sql.SparkSession, d: String): Map[Long, Option[Double]] =
      graft.operators.Temporal.catalog.find(_.name == "ev30_forward_fill").get
        .run(s, d).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
  }
}
