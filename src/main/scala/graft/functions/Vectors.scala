package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for embedding math over `array<float|double>` columns.
  *
  * Dot products fold left-to-right (`aggregate` is a sequential fold per
  * row), so the double result is bit-deterministic — the same fold DuckDB's
  * `list_dot_product` performs, which is what lets cosine queries hash-match
  * the oracle. All math is done in double: the float→double widening of the
  * stored vectors is exact.
  */
object Vectors {
  /** Elementwise product then ordered fold. Inputs must be array<double>.
    * HOF reference form — see [[dotNative]] for the codegen'd hot path. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Native Catalyst dot product ([[DotProductExpr]], whole-stage codegen;
    * requires [[graft.GraftExtensions]] on the session). Identical
    * left-to-right fold → bit-identical to [[dot]] and the oracle. */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normNative(a: Column): Column = sqrt(dotNative(a, a))

  /** Cosine with precomputed norms (avoid per-pair norm recompute). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  def cosineNative(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotNative(a, b) / (normA * normB)

  /** Sign-projection LSH bucket from `nBits` probe dimensions spaced
    * `stride` apart starting at `offset` (1-based element_at). Cheap
    * random-hyperplane stand-in: the natural basis is as good as random
    * for synthetic embeddings, and identical buckets are reproducible in
    * ANSI SQL for the oracle. Distinct offsets give the independent hash
    * tables of multi-table LSH.
    */
  def signBucket(v: Column, nBits: Int, stride: Int, offset: Int = 0): Column =
    (0 until nBits).map { i =>
      when(element_at(v, offset + i * stride + 1) >= 0, lit(1 << (nBits - 1 - i))).otherwise(lit(0))
    }.reduce(_ + _).cast("int")
}
