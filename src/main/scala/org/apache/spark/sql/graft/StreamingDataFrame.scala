package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** The ONE private[sql] bridge a v1 streaming `Source` needs: micro-batch
  * execution asserts every `getBatch` result has `isStreaming = true`,
  * and the only way to mark a batch-planned DataFrame so is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * exactly how Spark's own `FileStreamSource` (and Delta's pre-DSv2
  * source) produce their batches. Kept to this single call, in a
  * dedicated package object, so the internal-API surface is one line.
  */
object StreamingDataFrame {
  /** Re-wrap `df`'s physical plan as a streaming-tagged DataFrame.
    * Planning happens here (filters/pruning already folded into `df`);
    * execution stays lazy until the micro-batch runs. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[ClassicDataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
