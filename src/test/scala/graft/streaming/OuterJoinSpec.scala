package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Left-outer stream-stream correlate semantics: matched rows emit
  * eagerly; unmatched left rows emit a null pad once BOTH sides'
  * watermarks prove no right row can still arrive. The pad requires two
  * watermark-advancing batches past the horizon — the first advances the
  * watermark, the second executes with it and evicts (the same mechanics
  * the q_stream_outer_join gate drives with its sentinel file + trailing
  * no-data batch). */
class OuterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("left-outer stream-stream correlate emits null pads after watermark passes") {
    implicit val sc = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val l = ls.toDF.toDF("user_id", "p_ts", "purchase_id")
    val r = rs.toDF.toDF("u2", "c_ts", "click_id")
      .withColumnRenamed("u2", "user_id")
    val joined = Streams.streamStreamCorrelate(
      l, r, "user_id", "p_ts", "c_ts", "1 hour", "10 minutes", "left_outer")
    val q = joined.writeStream.format("memory").queryName("oj_spec")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    ls.addData((1L, ts(1000), 10L), (2L, ts(1000), 20L))
    rs.addData((1L, ts(990), 100L))
    q.processAllAvailable()
    // two horizon-advancing batches: advance, then evict with the
    // advanced watermark
    ls.addData((9L, ts(100000), 90L))
    rs.addData((9L, ts(100000), 900L))
    q.processAllAvailable()
    ls.addData((9L, ts(200000), 91L))
    rs.addData((9L, ts(200000), 901L))
    q.processAllAvailable()
    val out = spark.sql("select user_id, purchase_id, click_id from oj_spec")
      .collect().map(_.toSeq).toSeq
    q.stop()
    assert(out.contains(Seq(1L, 10L, 100L)), s"matched pair missing in $out")
    assert(out.contains(Seq(2L, 20L, null)), s"null pad missing in $out")
  }
}
