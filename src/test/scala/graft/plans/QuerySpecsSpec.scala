package graft.plans

import graft.SparkSpec
import graft.operators.Aggregates
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._

/** §3.3 serialization parity: specs survive a JSON round-trip and the
  * reconstituted spec produces the same result as the in-process DSL
  * (reference ships these as protos —
  * serialization/build_expression_from_proto.h:31-33). */
class QuerySpecsSpec extends SparkSpec {
  import QuerySpecs._
  import spark.implicits._

  private def sales = Seq(
    ("eng", "alice", 100), ("eng", "bob", 80),
    ("sales", "carl", 50), ("sales", "dora", 120), ("eng", "eve", 90)
  ).toDF("dept", "who", "amt")

  test("AggSpec JSON round-trip is lossless") {
    val spec = AggSpec(List("dept"), List(
      AggFieldSpec("SUM", Some("amt"), "total"),
      AggFieldSpec("COUNT", None, "n"),
      AggFieldSpec("CONCAT", Some("who"), "names",
        orderBy = Some(SortKeySpec("who")), sep = "|"),
      AggFieldSpec("MIN", Some("amt"), "lo", outType = Some("BIGINT"))))
    val json = writeAggSpec(spec)
    assert(readAggSpec(json) == spec)
    // the wire format is plain JSON another process can produce
    assert(json.contains("\"fn\":\"SUM\""))
  }

  test("buildAggregate(readAggSpec(json)) matches the in-process DSL") {
    val json = writeAggSpec(AggSpec(List("dept"), List(
      AggFieldSpec("SUM", Some("amt"), "total"),
      AggFieldSpec("COUNT", None, "n"),
      AggFieldSpec("CONCAT", Some("who"), "names", orderBy = Some(SortKeySpec("who"))))))
    val viaJson = buildAggregate(readAggSpec(json))(sales).orderBy("dept")
    val direct = Aggregates.groupAggregate(Seq("dept"), Seq(
      Agg(SUM, Some("amt"), "total"),
      Agg(COUNT, None, "n"),
      Agg(CONCAT, Some("who"), "names", order = Some(col("who")))))(sales).orderBy("dept")
    assert(rows(viaJson) == rows(direct))
  }

  test("empty groupBy reconstitutes as ScalarAggregate (1 row on empty input)") {
    val spec = readAggSpec(writeAggSpec(AggSpec(Nil, List(
      AggFieldSpec("COUNT", None, "n"), AggFieldSpec("SUM", Some("amt"), "s")))))
    val out = buildAggregate(spec)(sales.where(col("amt") < 0))
    assert(rows(out) == Seq(Seq(0L, null)))
  }

  test("SortSpec round-trips and builds a case-insensitive top-k sort") {
    val spec = SortSpec(List(SortKeySpec("who", ascending = false, caseInsensitive = true)),
      limit = Some(2))
    assert(readSortSpec(writeSortSpec(spec)) == spec)
    val df = Seq("alice", "Eve", "BOB").toDF("who")
    assert(rows(buildSort(spec)(df)).flatten == Seq("Eve", "BOB"))
  }

  test("SampleSpec round-trips and rebuilds the exact same sample") {
    import graft.pipeline.Sampling
    val rows10k = (0L until 5000L).toDF("k")
    val bSpec = SampleSpec("bernoulli", List("k"), rate = Some(0.3))
    assert(readSampleSpec(writeSampleSpec(bSpec)) == bSpec)
    assert(rows(buildSample(readSampleSpec(writeSampleSpec(bSpec)))(rows10k).orderBy("k")) ==
      rows(Sampling.bernoulli(rows10k, Seq("k"), 0.3).orderBy("k")))
    val sSpec = SampleSpec("split", List("k"),
      splits = Some(List(SplitFraction("train", 0.8), SplitFraction("test", 0.2))))
    assert(readSampleSpec(writeSampleSpec(sSpec)) == sSpec)
    assert(rows(buildSample(sSpec)(rows10k).orderBy("k")) ==
      rows(Sampling.assignSplit(rows10k, Seq("k"),
        Seq("train" -> 0.8, "test" -> 0.2)).orderBy("k")))
    intercept[IllegalArgumentException] {
      buildSample(SampleSpec("nope", List("k")))(rows10k)
    }
    intercept[IllegalArgumentException] { // kind/field mismatch fails fast
      buildSample(SampleSpec("bernoulli", List("k")))(rows10k)
    }
  }

  test("unknown aggregate fn fails fast") {
    intercept[IllegalArgumentException] {
      toAgg(AggFieldSpec("MEDIAN", Some("amt"), "m"))
    }
  }

  test("FilterSpec expression tree round-trips and matches the Column DSL") {
    import ExprSpec._
    // every node kind in one predicate: and/or/not/isnull/comparison,
    // typed literal, column ref
    val spec = FilterSpec(
      and(gt(colRef("amt"), literal("60", "INT")),
        not(or(ExprSpec.eq(colRef("dept"), literal("sales", "STRING")),
          isNull(colRef("dept"))))))
    val json = writeFilterSpec(spec)
    assert(readFilterSpec(json) == spec)
    // the wire format is plain JSON another process can produce
    assert(json.contains("\"op\":\"and\"") && json.contains("\"valueType\":\"INT\""))
    val viaJson = buildFilter(readFilterSpec(json))(sales).orderBy("who")
    val direct = sales.where(col("amt") > 60 &&
      !(col("dept") === "sales" || col("dept").isNull)).orderBy("who")
    assert(rows(viaJson) == rows(direct))
    assert(rows(viaJson).map(_(1)) == Seq("alice", "bob", "eve"))
  }

  test("ProjectSpec round-trips; rename and computed columns rebuild") {
    import ExprSpec._
    val spec = ProjectSpec(List(
      ProjectField(colRef("who")),
      ProjectField(mul(colRef("amt"), literal("2", "INT")), as = Some("amt2")),
      ProjectField(add(sub(colRef("amt"), literal("1", "INT")),
        literal("1", "INT")), as = Some("amt_again")),
      ProjectField(colRef("dept"), as = Some("team"))))
    assert(readProjectSpec(writeProjectSpec(spec)) == spec)
    val out = buildProject(readProjectSpec(writeProjectSpec(spec)))(sales).orderBy("who")
    assert(out.columns.toSeq == Seq("who", "amt2", "amt_again", "team"))
    assert(rows(out).head == Seq("alice", 200, 100, "eng"))
  }

  test("ARG_MAX/ARG_MIN rebuild from the wire form and match the DSL") {
    val json = writeAggSpec(AggSpec(List("dept"), List(
      AggFieldSpec("ARG_MAX", Some("who"), "top_earner",
        orderBy = Some(SortKeySpec("amt"))),
      AggFieldSpec("ARG_MIN", Some("who"), "low_earner",
        orderBy = Some(SortKeySpec("amt"))))))
    val out = buildAggregate(readAggSpec(json))(sales).orderBy("dept")
    assert(rows(out) == Seq(Seq("eng", "alice", "bob"),
      Seq("sales", "dora", "carl")))
    val direct = Aggregates.groupAggregate(Seq("dept"), Seq(
      Agg(ARG_MAX, Some("who"), "top_earner", order = Some(col("amt"))),
      Agg(ARG_MIN, Some("who"), "low_earner", order = Some(col("amt")))))(
      sales).orderBy("dept")
    assert(rows(out) == rows(direct))
  }

  test("div/mod/concat/substr/lower/upper/case/in rebuild from the wire form") {
    import ExprSpec._
    // arithmetic: amt/4 (div), amt%3 (mod)
    val arith = ProjectSpec(List(
      ProjectField(colRef("who")),
      ProjectField(ExprSpec.div(colRef("amt"), literal("4.0", "DOUBLE")),
        as = Some("q")),
      ProjectField(ExprSpec.mod(colRef("amt"), literal("3", "INT")),
        as = Some("m"))))
    assert(readProjectSpec(writeProjectSpec(arith)) == arith)
    val a = buildProject(readProjectSpec(writeProjectSpec(arith)))(sales).orderBy("who")
    assert(rows(a).head == Seq("alice", 25.0, 1)) // 100/4.0, 100%3
    // strings: upper(dept) || '_' || substr(who, 1, 2), lower round-trip
    val str = ProjectSpec(List(
      ProjectField(ExprSpec.concat(upper(colRef("dept")), literal("_", "STRING"),
        substr(colRef("who"), literal("1", "INT"), literal("2", "INT"))),
        as = Some("tag")),
      ProjectField(lower(upper(colRef("who"))), as = Some("lo"))))
    assert(readProjectSpec(writeProjectSpec(str)) == str)
    val sOut = buildProject(readProjectSpec(writeProjectSpec(str)))(sales).orderBy("lo")
    assert(rows(sOut).head == Seq("ENG_al", "alice"))
    // CASE over IN, with and without ELSE (no else -> NULL, as in SQL)
    val cased = ProjectSpec(List(
      ProjectField(colRef("who")),
      ProjectField(caseWhen(
        Seq(in(colRef("dept"), literal("eng", "STRING"),
          literal("ops", "STRING")) -> literal("tech", "STRING")),
        otherwise = Some(literal("biz", "STRING"))), as = Some("k")),
      ProjectField(caseWhen(
        Seq(gt(colRef("amt"), literal("100", "INT")) ->
          literal("big", "STRING"))), as = Some("noelse"))))
    assert(readProjectSpec(writeProjectSpec(cased)) == cased)
    val c = buildProject(readProjectSpec(writeProjectSpec(cased)))(sales)
    assert(rows(c.orderBy("who")) == Seq(
      Seq("alice", "tech", null), Seq("bob", "tech", null),
      Seq("carl", "biz", null), Seq("dora", "biz", "big"),
      Seq("eve", "tech", null)))
    // IN keeps SQL 3-valued semantics through the wire form: NULL needle
    // drops the row in a filter
    val f = FilterSpec(in(colRef("dept"), literal("eng", "STRING")))
    val withNull = sales.union(Seq((null.asInstanceOf[String], "zed", 10)).toDF)
    assert(buildFilter(readFilterSpec(writeFilterSpec(f)))(withNull).count() == 3)
  }

  test("property: random ExprSpec trees survive the JSON round-trip losslessly") {
    import ExprSpec._
    val rng = new scala.util.Random(20260812L)
    val leaves = Vector(
      () => colRef("amt"), () => colRef("dept"), () => colRef("who"),
      () => literal(rng.nextInt(200).toString, "INT"),
      () => literal(s"s${rng.nextInt(10)}", "STRING"))
    def tree(depth: Int): ExprSpec =
      if (depth == 0) leaves(rng.nextInt(leaves.length))()
      else rng.nextInt(11) match {
        case 0 => and(tree(depth - 1), tree(depth - 1))
        case 1 => or(tree(depth - 1), tree(depth - 1))
        case 2 => not(tree(depth - 1))
        case 3 => isNull(tree(depth - 1))
        case 4 => ExprSpec.eq(tree(depth - 1), tree(depth - 1))
        case 5 => lt(add(tree(depth - 1), tree(depth - 1)), tree(depth - 1))
        case 6 => ge(mul(tree(depth - 1), tree(depth - 1)), sub(tree(depth - 1), tree(depth - 1)))
        case 7 => neq(ExprSpec.div(tree(depth - 1), tree(depth - 1)),
          ExprSpec.mod(tree(depth - 1), tree(depth - 1)))
        case 8 => ExprSpec.eq(ExprSpec.concat(lower(tree(depth - 1)),
          upper(tree(depth - 1))), tree(depth - 1))
        case 9 => in(tree(depth - 1), tree(depth - 1), tree(depth - 1))
        case 10 => ExprSpec.eq(caseWhen(
          Seq(isNull(tree(depth - 1)) -> tree(depth - 1)),
          otherwise = Some(tree(depth - 1))), tree(depth - 1))
      }
    (1 to 200).foreach { i =>
      val t = FilterSpec(tree(1 + rng.nextInt(4)))
      assert(readFilterSpec(writeFilterSpec(t)) == t, s"tree #$i")
      // the rebuilt Column must be constructible (no op lost in transit)
      toColumn(readFilterSpec(writeFilterSpec(t)).predicate)
    }
  }

  test("malformed expression nodes fail fast, not silently") {
    intercept[IllegalArgumentException] { toColumn(ExprSpec("frobnicate")) }
    intercept[IllegalArgumentException] { toColumn(ExprSpec("eq")) } // no children
    intercept[IllegalArgumentException] { toColumn(ExprSpec("col")) } // no column
  }
}
