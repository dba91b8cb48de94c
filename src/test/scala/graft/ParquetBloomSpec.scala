package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** S26 — parquet Bloom filters on the write path (point-lookup data
  * skipping for HIGH-CARDINALITY keys, where dictionary pages give up
  * and min/max stats are too wide to help): the writer embeds a
  * fixed-size membership sketch per row group; a reader probing for an
  * absent key skips the whole row group without touching data pages.
  * The spec isolates the bloom level by (a) querying a key INSIDE the
  * min/max range (stats can't prune) with (b) dictionary encoding
  * disabled (dictionary can't prune) — so a zero filtered-record count
  * is attributable to the Bloom filter alone; the no-bloom control
  * writes the same data and must NOT skip. Read-side correctness under
  * Spark (present keys still found through the bloom-bearing file) is
  * asserted on top.
  */
class ParquetBloomSpec extends SparkSpecBase {
  import spark.implicits._

  // even keys only: any odd probe is absent but inside [min, max]
  private def writeData(dir: String, bloom: Boolean): Unit = {
    val w = (0 until 20000).map(i => (i * 2L, s"v$i")).toDF("k", "v")
      .coalesce(1).write
      .option("parquet.enable.dictionary", "false")
    (if (bloom)
       w.option("parquet.bloom.filter.enabled#k", "true")
         .option("parquet.bloom.filter.expected.ndv#k", "20000")
     else w)
      .parquet(dir)
  }

  private def filteredCount(dir: String, probe: Long): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val file = new Path(dir).getFileSystem(conf).globStatus(
      new Path(s"$dir/part-*.parquet")).head.getPath
    val pred = FilterApi.eq(FilterApi.longColumn("k"), java.lang.Long.valueOf(probe))
    val opts = HadoopReadOptions.builder(conf, file)
      .withRecordFilter(FilterCompat.get(pred))
      .useBloomFilter(true).useDictionaryFilter(true).useStatsFilter(true)
      .build()
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf), opts)
    try reader.getFilteredRecordCount finally reader.close()
  }

  test("the bloom-bearing file skips the whole row group for an absent key; " +
    "the no-bloom control cannot") {
    val root = java.nio.file.Files.createTempDirectory("bloomfile").toString
    writeData(s"$root/with", bloom = true)
    writeData(s"$root/without", bloom = false)
    val absentOdd = 1001L // inside [0, 39998], never written
    assert(filteredCount(s"$root/with", absentOdd) === 0L,
      "bloom filter must prune the row group for an in-range absent key")
    assert(filteredCount(s"$root/without", absentOdd) > 0L,
      "without a bloom filter the row group must survive (stats can't prune in-range)")
    // out-of-range probes prune via STATS on both files — the baseline level
    assert(filteredCount(s"$root/without", 1000000L) === 0L)
  }

  test("present keys read back correctly through the bloom-bearing file") {
    val root = java.nio.file.Files.createTempDirectory("bloomread").toString
    writeData(s"$root/t", bloom = true)
    val hit = spark.read.parquet(s"$root/t").filter($"k" === 2468L)
      .as[(Long, String)].collect().toSeq
    assert(hit === Seq((2468L, "v1234")))
    assert(spark.read.parquet(s"$root/t").filter($"k" === 1001L).count() === 0L)
  }
}
