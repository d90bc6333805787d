package graft.operators

import graft.SparkSpec
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._

/** Empty-input behavior across the operator surface — mirrors the
  * reference's explicit empty-side tests (hash_join_test.cc:430-466
  * EmptyLhsSkipsRhs/EmptyRhsSkipsLhs, aggregate_scalar empty-group rules).
  */
class EmptyInputsSpec extends SparkSpec {
  import spark.implicits._

  private def empty = Seq.empty[(Int, String)].toDF("k", "v")
  private def some = Seq((1, "a"), (2, "b")).toDF("k2", "v2")

  test("hashJoin: empty lhs or rhs yields empty inner result; outer keeps the other side") {
    assert(Relational.hashJoin(empty, some, col("k") === col("k2")).count() == 0)
    assert(Relational.hashJoin(some.toDF("k", "v"), empty.toDF("k2", "v2"),
      col("k") === col("k2")).count() == 0)
    assert(Relational.hashJoin(empty, some, col("k") === col("k2"), "right_outer").count() == 2)
    assert(Relational.hashJoin(some.toDF("k", "v"), empty.toDF("k2", "v2"),
      col("k") === col("k2"), "full_outer").count() == 2)
  }

  test("asOfJoin: empty right carries NULLs; empty left yields empty") {
    val left = Seq((1, 10L)).toDF("k", "t")
    val emptyRight = Seq.empty[(Int, Long, Double)].toDF("k", "t2", "px")
      .select(col("k"), col("t2").as("rt"), col("px"))
    val out = Relational.asOfJoin(left, emptyRight, Seq("k"), "t", "rt", Seq("px"))
    assert(rows(out.select("px")) == Seq(Seq(null)))
    val emptyLeft = Seq.empty[(Int, Long)].toDF("k", "t")
    assert(Relational.asOfJoin(emptyLeft, emptyRight, Seq("k"), "t", "rt", Seq("px")).count() == 0)
  }

  test("rangeJoin: empty intervals or points yield empty") {
    val pts = Seq((1, 5L)).toDF("pid", "t")
    val noIv = Seq.empty[(Int, Long, Long)].toDF("iid", "s", "e")
    assert(Relational.rangeJoin(pts, noIv, Nil, col("t"), col("s"), col("e"), 10L).count() == 0)
    val noPts = Seq.empty[(Int, Long)].toDF("pid", "t")
    val iv = Seq((9, 0L, 9L)).toDF("iid", "s", "e")
    assert(Relational.rangeJoin(noPts, iv, Nil, col("t"), col("s"), col("e"), 10L).count() == 0)
  }

  test("chooseRangeBucketWidth: empty or all-degenerate intervals give width 1") {
    val noIv = Seq.empty[(Int, Long, Long)].toDF("iid", "s", "e")
    assert(Relational.chooseRangeBucketWidth(noIv, col("s"), col("e")) == 1L)
    // degenerate (e < s) intervals are excluded from the length sample
    val deg = Seq((1, 10L, 5L)).toDF("iid", "s", "e")
    assert(Relational.chooseRangeBucketWidth(deg, col("s"), col("e")) == 1L)
    // zero-length intervals are valid and give the minimum width
    val zero = Seq((1, 5L, 5L)).toDF("iid", "s", "e")
    assert(Relational.chooseRangeBucketWidth(zero, col("s"), col("e")) == 1L)
  }

  test("media encoders: NULL parameter columns yield NULL payloads, not crashes") {
    import graft.pipeline.Multimodal
    val df = Seq((1L, Some(2), Some(8000), Some(4), Some("x")),
                 (2L, None, Some(8000), Some(4), Some("x")))
      .toDF("id", "ch", "rate", "ns", "t")
      .withColumn("seed", col("t").cast("binary"))
    val wav = Multimodal.encodeWavCol(df, "ch", "rate", "ns", "seed", "p")
    assert(rows(wav.select(col("p").isNull).orderBy("id")).flatten ==
      Seq(false, true))
    // decode of the NULL payload row yields NULL metadata
    val meta = Multimodal.decodeAudioMeta(wav, "p")
      .select("id", "media_format", "n_samples")
    assert(rows(meta.orderBy("id")) ==
      Seq(Seq(1L, "audio/wav", 4L), Seq(2L, null, null)))
    val mp4in = Seq((1L, Some(600), Some(42L), Some(3), Some("x")),
                    (2L, Some(600), None, Some(3), Some("x")))
      .toDF("id", "tsc", "dur", "len", "t")
      .withColumn("seed", col("t").cast("binary"))
    val mp4 = Multimodal.encodeMp4Col(mp4in, "tsc", "dur", "len", "seed", "p")
    val vmeta = Multimodal.decodeVideoMeta(mp4, "p")
      .select("id", "media_format", "duration_ms")
    assert(rows(vmeta.orderBy("id")) ==
      Seq(Seq(1L, "video/mp4", 42L * 1000 / 600), Seq(2L, null, null)))
  }

  test("aggregation: group agg of empty input is 0 rows; scalar agg is 1 row") {
    val e = Seq.empty[(String, Int)].toDF("g", "x")
    assert(Aggregates.groupAggregate(Seq("g"), Seq(Agg(COUNT, None, "n")))(e).count() == 0)
    assert(rows(Aggregates.scalarAggregate(Seq(
      Agg(COUNT, None, "n"), Agg(SUM, Some("x"), "s"), Agg(MIN, Some("x"), "mn")))(e)) ==
      Seq(Seq(0L, null, null)))
    // group-with-limit on empty input: no kept keys, no overflow row
    assert(Aggregates.groupAggregateWithLimit("g", Seq(Agg(COUNT, None, "n")), 3)(e).count() == 0)
  }

  test("sort / limit / set ops on empty inputs") {
    val e = Seq.empty[(Int, String)].toDF("k", "v")
    assert(Relational.sort(col("k"))(e).count() == 0)
    assert(Relational.limitOffset(5, 2)(e).count() == 0)
    assert(Relational.extendedSort(Seq(col("k")), Some(3))(e).count() == 0)
    assert(Relational.intersect(e, some.toDF("k", "v")).count() == 0)
    assert(Relational.except(some.toDF("k", "v"), e).count() == 2)
    assert(Relational.mergeUnionAll(Seq(e, e), Seq(col("k"))).count() == 0)
  }

  test("dedup / sketches on empty inputs") {
    val e = Seq.empty[(Long, String)].toDF("id", "text")
    assert(graft.pipeline.Dedup.exactGroups(e, "text", "id").count() == 0)
    val en = Seq.empty[(String, Long)].toDF("g", "v")
    assert(Sketches.approxDistinctWithCheck(en, Seq("g"), "v").count() == 0)
    assert(Sketches.topKFrequencyWithCheck(en, "v", k = 3).count() == 0)
  }

  test("round-3 pipeline ops on empty inputs") {
    import graft.pipeline.{Contamination, Profile, Sampling, Scoring}
    val e = Seq.empty[(Long, String)].toDF("id", "text")
    val en = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(Sampling.bernoulli(en, Seq("k"), 0.5).count() == 0)
    assert(Sampling.exactPerStratum(e, "text", 3, Seq("id")).count() == 0)
    assert(Scoring.tfidfBm25(e, "id", "text").count() == 0)
    assert(Contamination.ngramContamination(e, e, "id", "text", 3).count() == 0)
    // profile of an empty frame still reports one row per column (zeros/NULLs)
    assert(rows(Profile.profileColumns(en, Seq("k", "v")).orderBy("col_name")) == Seq(
      Seq("k", 0L, 0L, 0L, null, null, null),
      Seq("v", 0L, 0L, 0L, null, null, null)))
    // winsorize of empty input: no rows, no NPE from NULL bounds
    assert(Profile.winsorize(en, "v").count() == 0)
  }

  test("round-4 ops on empty inputs") {
    import graft.pipeline.{Multimodal, Packing}
    val e = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Packing.packGreedy(e, "id", "text", budget = 8, buckets = 4).count() == 0)
    assert(Aggregates.saltedCollectSorted(Seq("id"), "text", "vals")(e).count() == 0)
    // decodeMeta on an empty frame and on a NULL payload row
    val nullPayload = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("payload")
    assert(rows(Multimodal.decodeMeta(nullPayload, "payload")
      .select("media_format", "width", "n_bytes")) == Seq(Seq(null, null, null)))
    val eb = Seq.empty[Tuple1[Array[Byte]]].toDF("payload")
    assert(Multimodal.decodeMeta(eb, "payload").count() == 0)
    // the stream-gate transforms run on empty batch frames
    val ev = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.streaming.Streams.windowedStats(ev).count() == 0)
  }
}
