package graft.sources

import org.apache.spark.sql.types.{DataType, StructType}

/** Landing-zone schema drift detection (SURVEY.md §2 S18): schema-on-read
  * sources (S2/S3/S13/S17) re-infer on every batch, which is exactly how
  * an upstream producer's silent change walks into a 100 TB table. The
  * drift report classifies an incoming batch's schema against the
  * registered one — ADDED / DROPPED / RETYPED, nested fields compared by
  * dotted path — and the additive gate encodes the standard lake policy:
  * new nullable columns evolve the schema (parquet S12 semantics
  * downstream), anything else fails the batch BEFORE it lands, not after
  * a reader trips on it. Mirrors the reference's per-source inference
  * step being a first-class, checkable artifact (reference:
  * DistributedQueryEngine.diff, RDBMSInferrer hunk).
  */
object SchemaDrift {

  final case class Drift(added: Seq[(String, String)],
                         dropped: Seq[(String, String)],
                         retyped: Seq[(String, String, String)]) {
    def isAdditive: Boolean = dropped.isEmpty && retyped.isEmpty
    def isEmpty: Boolean = isAdditive && added.isEmpty
    def describe: String =
      (added.map { case (n, t) => s"+ $n: $t" } ++
        dropped.map { case (n, t) => s"- $n: $t" } ++
        retyped.map { case (n, o, i) => s"~ $n: $o -> $i" }).mkString("; ")
  }

  /** Leaf fields of a schema as (dotted path, type) — nested structs
    * compared field by field, not as opaque blobs. */
  private[graft] def leaves(st: StructType, prefix: String = ""): Seq[(String, DataType)] =
    st.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => leaves(s, name)
        case dt            => Seq(name -> dt)
      }
    }

  /** Nullability-normalized type: containsNull/valueContainsNull (and
    * nested field nullability) forced permissive, so a batch differing
    * ONLY in nullability flags — JSON inference always infers
    * containsNull=true where Avro may carry false — is not a "retype"
    * (simpleString renders both sides identically, which would make the
    * refusal unreadable; nullability widening is additive-compatible,
    * the reader just sees more nulls allowed). */
  private def normalized(dt: DataType): DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map(f =>
        f.copy(dataType = normalized(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = normalized(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = normalized(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Classify the incoming batch schema against the registered one. */
  def diff(registered: StructType, incoming: StructType): Drift = {
    val regLeaves = leaves(registered)
    val incLeaves = leaves(incoming)
    val reg = regLeaves.toMap
    val inc = incLeaves.toMap
    Drift(
      added = incLeaves.map(_._1).filterNot(reg.contains)
        .map(n => n -> inc(n).simpleString),
      dropped = regLeaves.map(_._1).filterNot(inc.contains)
        .map(n => n -> reg(n).simpleString),
      retyped = regLeaves.map(_._1)
        .filter(n => inc.contains(n) && normalized(inc(n)) != normalized(reg(n)))
        .map(n => (n, reg(n).simpleString, inc(n).simpleString)))
  }

  /** The additive-evolution gate: returns the evolved registered schema
    * when the batch only ADDS fields; throws (with the full drift
    * report) on drops or retypes, so the bad batch fails at the landing
    * zone instead of corrupting the table. */
  def gateAdditive(registered: StructType, incoming: StructType): StructType = {
    val d = diff(registered, incoming)
    require(d.isAdditive,
      s"schema drift is not additive: ${d.describe}")
    merge(registered, incoming).asInstanceOf[StructType]
  }

  /** Recursive additive merge: registered field types win (diff already
    * proved none were retyped), new fields append at each nesting level
    * as NULLABLE (absent in history → must read as null there). */
  private def merge(reg: DataType, inc: DataType): DataType = (reg, inc) match {
    case (r: StructType, i: StructType) =>
      val rNames = r.fieldNames.toSet
      StructType(r.fields.map { f =>
        i.fields.find(_.name == f.name) match {
          case Some(g) => f.copy(dataType = merge(f.dataType, g.dataType))
          case None    => f
        }
      } ++ i.fields.filterNot(f => rNames.contains(f.name)).map(_.copy(nullable = true)))
    case (r, _) => r
  }
}
