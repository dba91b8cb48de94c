package graft
import org.apache.spark.sql.SparkSession

/** Workload-replay benchmark (r9, r10-seed-3 delivered early): the
  * isolated-median headline answers "how fast is each query alone";
  * a BI fleet instead interleaves DIFFERENT queries on one warm
  * session, where plan-cache churn, JIT retiering, and storage-block
  * turnover shape the tail. This main replays the 10 headline queries
  * in a deterministically shuffled interleave × `rounds` and reports
  * per-query p50/p95 plus fleet-level percentiles — the tail-latency
  * readout the isolated numbers can't show.
  *
  * Shuffle order is a fixed LCG permutation per round (no RNG state
  * outside the loop — replays are bit-reproducible), and one untimed
  * warmup pass absorbs first-plan codegen like Bench's harness.
  *
  * Usage: runMain graft.BenchReplay [rounds]   (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS). Prints one REPLAY_JSON line for PLANS.md.
  */
object BenchReplay {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark: SparkSession = Bench.mkSession(cpus)
    Bench.warmup(spark, sfDir)
    val names = Bench.headline.toSeq.sorted
    names.foreach(Bench.timeOne(spark, sfDir, _)) // untimed codegen pass

    // deterministic per-round permutation: LCG-ranked keys
    def order(round: Int): Seq[String] =
      names.sortBy(n => (n.hashCode * 2654435761L + round * 40503L) & 0x7fffffffL)

    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val t0 = System.nanoTime()
    for (r <- 1 to rounds; n <- order(r)) {
      val s = Bench.timeOne(spark, sfDir, n)
      if (s >= 0) samples(n) = samples(n) :+ s
    }
    val wall = (System.nanoTime() - t0) / 1e9

    def pct(xs: Seq[Double], p: Double): Double =
      if (xs.isEmpty) -1.0
      else Bench.r3(xs.sorted.apply(
        math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1).max(0)))
    val all = names.flatMap(samples(_))
    val perQ = names.map { n =>
      val xs = samples(n)
      s""""$n":[${pct(xs, 0.5)},${pct(xs, 0.95)}]"""
    }.mkString("{", ",", "}")
    println(
      s"""REPLAY_JSON {"rounds":$rounds,"sf":"$sfDir","executions":${all.size},""" +
      s""""fleet_p50":${pct(all, 0.5)},"fleet_p95":${pct(all, 0.95)},""" +
      s""""fleet_max":${pct(all, 1.0)},"wall_sec":${Bench.r3(wall)},""" +
      s""""per_query_p50_p95":$perQ}""")
    spark.stop()
  }
}
