package graft

import org.apache.spark.sql.functions._

/** Property pins for the text operators whose oracle check alone can't
  * express the invariant (SURVEY.md §2 L38): chunking must cover every
  * token, overlap by exactly `overlap` tokens, and degenerate to the
  * identity on short docs.
  */
class TextOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val chunks: Map[Long, Seq[(Long, Array[String])]] =
    SparkEntry.queries("tx18_chunk_overlap")(spark, sf0001)
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(r => (r._2, r._3.split("\\s+"))).toSeq
      }

  private lazy val docs: Map[Long, Array[String]] =
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), trim(col("text")).as("t"))
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+") }.toMap

  test("chunks reconstruct each document exactly (first chunk + tails)") {
    assert(chunks.keySet === docs.keySet)
    chunks.foreach { case (id, cs) =>
      val rebuilt = cs.head._2 ++ cs.tail.flatMap(_._2.drop(5))
      assert(rebuilt.sameElements(docs(id)),
        s"doc $id: rebuilt ${rebuilt.length} tokens vs ${docs(id).length}")
    }
  }

  test("consecutive chunks share exactly the overlap window") {
    chunks.values.foreach { cs =>
      cs.sliding(2).foreach {
        case Seq((_, prev), (_, next)) if prev.length == 20 =>
          assert(prev.takeRight(5).sameElements(next.take(5)))
        case _ => () // a short (final) chunk has no successor
      }
    }
  }

  test("docs at or under one window yield themselves as the single chunk") {
    val short = docs.filter(_._2.length <= 20)
    assert(short.nonEmpty, "sf0.001 should contain short docs")
    short.foreach { case (id, toks) =>
      assert(chunks(id).length === 1)
      assert(chunks(id).head._2.sameElements(toks))
    }
  }
}
