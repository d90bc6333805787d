package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: the write pre-shuffles by key, so
  * the join plan must contain no shuffle exchange — the pay-once ingest
  * strategy for repeated 100 TB joins. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two bucketed tables runs without a shuffle exchange") {
    val li = graft.Tables.lineitem(spark, sf())
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.orders(spark, sf())
      .select("o_orderkey", "o_totalprice")
    Relational.bucketedWrite(li, "li_bkt", Seq("l_orderkey"), 4)
    Relational.bucketedWrite(o, "o_bkt", Seq("o_orderkey"), 4)
    try {
      // disable broadcast so the join would normally shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(j.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
