package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate: keeps the k best (score DESC, id
  * ASC) pairs in a size-k heap per group, merged map-side.
  *
  * This is the scalable form of "top-k per group": the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`, q08/q23)
  * must shuffle and SORT every row of every group; this aggregate ships
  * at most k pairs per group per map task through the shuffle and never
  * materializes a full sort — the difference between O(n log n) per
  * partition and O(n log k) map-side at 100 TB.
  *
  * Registered by [[graft.GraftExtensions]] as `topk_pairs(score, id, k)`
  * → `array<struct<score double, id bigint>>` sorted best-first.
  */
case class TopKPairs(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs.Buffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"topk_pairs k must be an int literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType != DoubleType || idExpr.dataType != LongType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "topk_pairs requires (score double, id bigint, k int literal)")
    else if (kExpr.dataType != IntegerType && kExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs k must be an integer literal, got ${kExpr.dataType.sql}")
    else kExpr.eval(InternalRow.empty) match {
      // validated here (not via the lazy `k`) so a bad literal surfaces as
      // an analysis-time TypeCheckFailure, never a thrown exception
      case null =>
        TypeCheckResult.TypeCheckFailure("topk_pairs k must not be null")
      case i: Int if i >= 1 => TypeCheckResult.TypeCheckSuccess
      case l: Long if l >= 1L && l <= Int.MaxValue => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"topk_pairs k must be >= 1, got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKPairs.Buffer = new TopKPairs.Buffer(k)

  override def update(buf: TopKPairs.Buffer, input: InternalRow): TopKPairs.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairs.Buffer, other: TopKPairs.Buffer): TopKPairs.Buffer = {
    other.foreach((s, i) => buf.add(s, i))
    buf
  }

  override def eval(buf: TopKPairs.Buffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }: Array[InternalRow])
  }

  override def serialize(buf: TopKPairs.Buffer): Array[Byte] = {
    val entries = buf.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairs.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKPairs.Buffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = c(0), idExpr = c(1), kExpr = c(2))
}

object TopKPairs {
  /** Size-bounded heap; the WORST entry (lowest score, then highest id)
    * sits at the top for O(log k) eviction.
    *
    * Scores compare under `java.lang.Double.compare` — the TOTAL order
    * Spark's own SortOrder uses, where NaN ranks ABOVE every double and
    * NaNs compare equal to each other. This matches
    * `row_number() OVER (ORDER BY s DESC, id)` exactly (NaN rows first,
    * then the id tiebreak), which is what lets [[graft.plans.RewriteWindowTopK]]
    * substitute this aggregate for the window form on ANY double input;
    * IEEE `>`/`==` would both mis-rank NaN and freeze the heap (NaN
    * comparisons are all false). Callers that consider NaN scores
    * garbage (the ANN rerankers — a zero-norm vector yields a NaN
    * cosine) must filter them out explicitly before aggregating.
    */
  final class Buffer(k: Int) {
    // THE comparator, single-sourced (heap order, eviction test, and the
    // final sort must agree or the heap's contents and its output
    // diverge): scores under Spark's SQL ordering — IEEE == first, so
    // -0.0 ties 0.0 exactly as SQLOrderingUtil.compareDoubles does
    // (bare Double.compare would rank -0.0 below 0.0 and silently
    // disagree with the window form), then Double.compare for the
    // NaN-greatest total order; score ties break to the LOWER id.
    // Returns > 0 when a is BETTER than b.
    private def cmp(aScore: Double, aId: Long, bScore: Double, bId: Long): Int = {
      val c = if (aScore == bScore) 0 else java.lang.Double.compare(aScore, bScore)
      if (c != 0) c else java.lang.Long.compare(bId, aId)
    }

    // worst-first heap: max element = the entry every other entry beats
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.comparatorToOrdering[(Double, Long)] { (a, b) =>
        cmp(b._1, b._2, a._1, a._2)
      })

    def add(score: Double, id: Long): Unit = {
      if (heap.size < k) heap.enqueue((score, id))
      else if (cmp(score, id, heap.head._1, heap.head._2) > 0) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = heap.foreach(t => f(t._1, t._2))

    /** Best-first: score DESC (SQL order, NaN first), id ASC. */
    def sortedBestFirst: Array[(Double, Long)] =
      heap.toArray.sortWith((a, b) => cmp(a._1, a._2, b._1, b._2) > 0)
  }
}
