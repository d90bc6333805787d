package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.MemoryStream
import org.apache.spark.sql.functions._

class OuterJoinScratchSpec extends SparkSpec {
  import spark.implicits._

  test("scratch: left-outer stream-stream null pads emit") {
    implicit val sc = spark.sqlContext
    val ls = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val l = ls.toDF.toDF("user_id", "p_ts", "purchase_id")
    val r = rs.toDF.toDF("u2", "c_ts", "click_id")
      .withColumnRenamed("u2", "user_id")
    val joined = Streams.streamStreamCorrelate(
      l, r, "user_id", "p_ts", "c_ts", "1 hour", "10 minutes", "left_outer")
    val q = joined.writeStream.format("memory").queryName("oj_scratch")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    ls.addData((1L, ts(1000), 10L), (2L, ts(1000), 20L))
    rs.addData((1L, ts(990), 100L))
    q.processAllAvailable()
    // advance both watermarks far past 1000 + 1h
    ls.addData((9L, ts(100000), 90L))
    rs.addData((9L, ts(100000), 900L))
    q.processAllAvailable()
    ls.addData((9L, ts(200000), 91L))
    rs.addData((9L, ts(200000), 901L))
    q.processAllAvailable()
    val out = spark.sql("select user_id, purchase_id, click_id from oj_scratch")
      .collect().map(_.toSeq).toSeq
    q.stop()
    println(s"SCRATCH OUT: $out")
    assert(out.contains(Seq(1L, 10L, 100L)))
    assert(out.contains(Seq(2L, 20L, null)), s"no null pad in $out")
  }
}
