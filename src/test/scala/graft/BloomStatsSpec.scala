package graft

import graft.operators.{Dedup, Olap}
import org.apache.spark.sql.functions._

/** Round-4 additions: the Bloom membership primitives behind dd11, the
  * Spearman helper behind q73, and tx19's quantized entropy/KL terms.
  * The catalog entries themselves are oracle-checked by the driver; these
  * tests pin the properties the oracle can't see — no false negatives,
  * real pruning, tie handling, and the exact quantization values.
  */
class BloomStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("bloom_agg/bloom_contains admit every inserted key (no false negatives)") {
    val keys = (0L until 1000L).toDF("k")
    val bin = keys.agg(call_function("bloom_agg", xxhash64(col("k")),
      lit(1000L), lit(8192L))).head().getAs[Array[Byte]](0)
    val missed = keys
      .filter(!call_function("bloom_contains", lit(bin), xxhash64(col("k"))))
      .count()
    assert(missed === 0L, s"$missed inserted keys reported absent")
  }

  test("bloom_contains rejects most non-members at the sized fpp") {
    val keys = (0L until 1000L).toDF("k")
    val bin = keys.agg(call_function("bloom_agg", xxhash64(col("k")),
      lit(1000L), lit(16384L))).head().getAs[Array[Byte]](0)
    val falsePos = (100000L until 110000L).toDF("k")
      .filter(call_function("bloom_contains", lit(bin), xxhash64(col("k"))))
      .count()
    // 16384 bits / 1000 items ≈ 16 bits/key → fpp well under 1%; allow 5%
    assert(falsePos < 500L, s"$falsePos/10000 false positives — filter is not pruning")
  }

  test("dd11 bloom-prefiltered contamination equals the exact-join result") {
    val exact = {
      val sh = Tables.documents(spark, sf0001)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), array_distinct(Dedup.shingles(col("text"))).as("sg"))
      val ex = sh.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), explode(col("sg")).as("s"))
      val cx = sh.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("corpus_id"), explode(col("sg")).as("s"))
      cx.join(ex, Seq("s")).groupBy("eval_id", "corpus_id")
        .agg(count(lit(1)).as("n_shared")).filter(col("n_shared") >= 2)
        .as[(Long, Long, Long)].collect().toSet
    }
    val bloomed = Dedup.bloomContamination(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloomed === exact,
      "bloom prefilter changed the answer — verify join is not restoring exactness")
    assert(exact.nonEmpty, "degenerate fixture: no contaminated pairs at sf0.001")
  }

  test("an undersized bloom filter still yields the exact answer (only wasted candidates)") {
    // ~1 bit per shingle → fpp near 1; correctness must hold regardless.
    val tiny = Dedup.bloomContamination(spark, sf0001, bitsPerKey = 1L)
      .as[(Long, Long, Long)].collect().toSet
    val sized = Dedup.bloomContamination(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    assert(tiny === sized)
  }

  test("spearman is exactly ±1 on monotone data and handles ties as average ranks") {
    val mono = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0), ("g", 2.0, 20.0),
      ("g", 3.0, 40.0)).toDF("grp", "a", "b")
    val up = Olap.spearman(mono, "grp", "a", "b").select("rho").as[Double].head()
    assert(up === 1.0, s"tied monotone data should give rho exactly 1, got $up")
    val anti = Seq(("g", 1.0, 40.0), ("g", 2.0, 20.0), ("g", 2.0, 20.0),
      ("g", 3.0, 10.0)).toDF("grp", "a", "b")
    val down = Olap.spearman(anti, "grp", "a", "b").select("rho").as[Double].head()
    assert(down === -1.0, s"anti-monotone data should give rho exactly -1, got $down")
  }

  test("spearman matches the hand-computed tie-corrected value") {
    // x = [1,2,2,3], y = [10,40,20,20]
    // 2·avg ranks: x → [2,5,5,8]; y → [2,8,5,5]
    // n=4 sa=sb=20 saa=sbb=118 sab=(2·2+5·8+5·5+8·5)=109
    // rho = (109-100)/(118-100) = 0.5
    val df = Seq(("g", 1.0, 10.0), ("g", 2.0, 40.0), ("g", 2.0, 20.0),
      ("g", 3.0, 20.0)).toDF("grp", "a", "b")
    val rho = Olap.spearman(df, "grp", "a", "b").select("rho").as[Double].head()
    assert(rho === 0.5, s"expected exactly 0.5, got $rho")
  }

  test("tx19 entropy/KL on a constructed mixture gives the closed-form values") {
    val dir = java.nio.file.Files.createTempDirectory("tx19spec").toString
    val docs =
      (0 until 100).map(i => (i.toLong, s"doc a $i", s"l${i % 4}", "A")) ++
        (100 until 200).map(i => (i.toLong, s"doc b $i", "l0", "B"))
    docs.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tx19_source_entropy")(spark, dir)
      .select("source", "n_docs", "entropy_bits", "kl_bits")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val Array(a, b) = out
    // A: uniform over 4 langs → entropy exactly 2 bits (log2(4) is exact
    // in binary floating point, so quantization is lossless here)
    assert(a._2 === 100L && a._3 === 2.0, s"source A: $a")
    // B: single lang → entropy exactly 0; KL = log2((100/100)/(125/200))
    assert(b._2 === 100L && b._4 === math.round(1e6 * math.log(200.0 / 125.0) / math.log(2.0)) / 1e6,
      s"source B: $b")
    // A's KL: 3 langs at p=.25 vs corpus .125 (term .25) + l0 .25 vs .625
    val expectedKlA =
      (3 * math.round(1e6 * 0.25 * math.log(2.0) / math.log(2.0))
        + math.round(1e6 * 0.25 * math.log(0.25 / 0.625) / math.log(2.0))) / 1e6
    assert(math.abs(a._4 - expectedKlA) < 2e-6, s"source A KL: ${a._4} vs $expectedKlA")
  }
}
