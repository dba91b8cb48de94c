package graft

import org.apache.spark.sql.SparkSession

/** Warm repeated timing of ONE catalog entry: runs it `n` times in a
  * single JVM and prints every pass, so pass-2+ numbers exclude the
  * JIT/codegen fixed cost that makes one-shot isolated runs
  * incomparable (the r7 dd22 persist-vs-checkpoint A/B needed this —
  * single shots spread 49-63 s on identical plans).
  * Usage: runMain graft.WarmBench <entry> [n]
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
    Tables.documents(spark, sfDir).count()
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"WARM $name pass=$i ${(System.nanoTime() - t0) / 1e9}%.1f s")
      System.gc()
    }
    spark.stop()
  }
}
