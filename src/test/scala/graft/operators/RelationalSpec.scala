package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Per-operator specs mirroring the reference's unit tests (filter_test.cc,
  * hash_join_test.cc, sort_test.cc, …) with NULL-bearing hand-built inputs.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def employees = Seq(
    // name, age, salary, department (FIXTURES.md A3-style, with NULLs)
    ("Alice", 30, Some(100), "eng"),
    ("Bob", 40, Some(80), "eng"),
    ("Carl", 25, None, "sales"),
    ("Dora", 35, Some(120), "sales"),
    ("Eve", 28, Some(90), "eng")
  ).toDF("name", "age", "salary", "department")

  test("project reorders/renames/drops") {
    val out = Relational.project(col("age").as("years"), col("name"))(employees)
    assert(out.columns.toSeq == Seq("years", "name"))
    assert(out.count() == 5)
  }

  test("compute evaluates expressions per row") {
    val out = Relational.compute(col("name"), (col("age") * 2).as("dbl"))(employees)
    assert(rows(out.orderBy("name")).map(_(1)) == Seq(60, 80, 50, 70, 56))
  }

  test("filter with projection compacts matching rows") {
    withPartitionings(employees) { df =>
      val out = Relational.filter(col("age") > 28, Seq(col("name")))(df)
      assert(rows(out.orderBy("name")).flatten == Seq("Alice", "Bob", "Dora"))
    }
  }

  test("hash join inner drops non-matching and NULL keys never match") {
    val l = Seq((Some(1), "a"), (Some(2), "b"), (None, "c")).toDF("k", "lv")
    val r = Seq((Some(1), "x"), (None, "y")).toDF("k", "rv")
    val out = Relational.hashJoin(l, r, l("k") <=> r("k") && l("k").isNotNull, "inner")
    // explicit equi-join via === : NULL keys never match
    val out2 = Relational.hashJoin(l, r, l("k") === r("k"), "inner")
    assert(out2.count() == 1)
    assert(rows(out2.select("lv", "rv")).head == Seq("a", "x"))
    assert(out.count() == 1)
  }

  test("hash join left_outer keeps unmatched lhs with NULL rhs") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((1, "x")).toDF("j", "rv")
    val out = Relational.hashJoin(l, r, col("k") === col("j"), "left_outer")
      .orderBy("k")
    assert(rows(out.select("lv", "rv")) == Seq(Seq("a", "x"), Seq("b", null)))
  }

  test("rowidMergeJoin joins key against rhs row-id and checks integrity") {
    val rhs = Seq(("r0", 10), ("r1", 11), ("r2", 12)).toDF("tag", "ord")
    val lhs = Seq(0L, 1L, 1L, 2L).toDF("rid")
    val out = Relational.rowidMergeJoin(lhs, "rid", rhs, Seq(col("ord")),
      checkIntegrity = true)
    assert(rows(out.orderBy("rid").select("tag")).flatten == Seq("r0", "r1", "r1", "r2"))
    val bad = Seq(0L, 5L).toDF("rid")
    intercept[IllegalArgumentException] {
      Relational.rowidMergeJoin(bad, "rid", rhs, Seq(col("ord")), checkIntegrity = true)
    }
  }

  test("foreignFilter semi-joins and rewrites fk to filter row-id") {
    val input = Seq((10L, "x"), (20L, "y"), (30L, "z"), (20L, "w")).toDF("fk", "v")
    val filter = Seq(20L, 30L).toDF("key")
    val out = Relational.foreignFilter(input, "fk", filter, "key")
    // key 20 -> rowid 0, key 30 -> rowid 1; fk 10 dropped
    assert(rows(out.orderBy("v").select("fk", "v")) ==
      Seq(Seq(0L, "w"), Seq(0L, "y"), Seq(1L, "z")))
  }

  test("coalesceColumns zips columns side-by-side and rejects dup names") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "s")
    val left = base.select(col("id"))
    val right = base.select(col("s").as("t"))
    val out = Relational.coalesceColumns(Seq(left, right))
    assert(rows(out.orderBy("id")) == Seq(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
    intercept[IllegalArgumentException] {
      Relational.coalesceColumns(Seq(left, left))
    }
  }

  test("sort: nulls sort first ascending (reference nulls-smallest)") {
    val df = Seq(Some(3), None, Some(1)).toDF("x")
    assert(rows(Relational.sort(col("x").asc)(df)).flatten == Seq(null, 1, 3))
  }

  test("extendedSort: case-insensitive key + top-k") {
    val df = Seq("b", "A", "C", "a").toDF("s")
    val out = Relational.extendedSort(
      Seq(Relational.caseInsensitive(col("s")), col("s")), Some(3))(df)
    assert(rows(out).flatten == Seq("A", "a", "b"))
  }

  test("limitOffset skips then takes") {
    val df = spark.range(10).toDF("i")
    val out = Relational.limitOffset(3, 4)(Relational.sort(col("i"))(df))
    assert(rows(out).flatten == Seq(3L, 4L, 5L, 6L))
  }

  test("mergeUnionAll merges same-schema sorted inputs deterministically") {
    val a = Seq(1, 3, 5).toDF("x")
    val b = Seq(2, 3, 6).toDF("x")
    val out = Relational.mergeUnionAll(Seq(a, b), Seq(col("x")))
    assert(rows(out).flatten == Seq(1, 2, 3, 3, 5, 6))
  }

  test("generate produces n rows with a contiguous sequence") {
    val out = Relational.generate(spark, 5)
    assert(rows(out.orderBy("seq")).flatten == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("withRowid assigns contiguous 0-based ids across partitions") {
    withPartitionings(spark.range(100).toDF("i")) { df =>
      val out = Relational.withRowid(df)
      val ids = rows(out.select("rowid")).flatten.map(_.asInstanceOf[Long]).sorted
      assert(ids == (0L until 100L))
    }
  }

  test("table builds a DataFrame from rows + schema") {
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val out = Relational.table(spark, schema, Seq(Row(1, "x"), Row(2, null)))
    assert(rows(out.orderBy("a")) == Seq(Seq(1, "x"), Seq(2, null)))
  }

  test("set ops: intersect and except are distinct set semantics") {
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(2, 4).toDF("x")
    assert(rows(Relational.intersect(a, b)).flatten == Seq(2))
    assert(rows(Relational.except(a, b).orderBy("x")).flatten == Seq(1, 3))
    // the empty case, moved out of q_set_except (a zero-row gate cannot
    // catch duplicate-semantics drift): equal value sets difference to zero
    // rows even when multiplicities differ
    assert(rows(Relational.except(a, Seq(3, 2, 1).toDF("x"))).isEmpty)
  }

  test("asOfJoin attaches latest right value at-or-before left time, per key") {
    val trades = Seq(("a", 10, 1), ("a", 25, 2), ("b", 5, 3)).toDF("k", "t", "id")
    val quotes = Seq(("a", 8, 100.0), ("a", 20, 110.0), ("a", 30, 120.0), ("c", 1, 999.0))
      .toDF("k", "t", "px")
    val out = Relational.asOfJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"))
      .orderBy("id").select("id", "px")
    // trade(a,10)→quote(a,8)=100; trade(a,25)→quote(a,20)=110; trade(b,5)→none
    assert(rows(out) == Seq(Seq(1, 100.0), Seq(2, 110.0), Seq(3, null)))
    // equal-instant: right row at the same time IS visible (<= semantics)
    val eq = Relational.asOfJoin(
      Seq(("a", 20, 9)).toDF("k", "t", "id"), quotes, Seq("k"), "t", "t", Seq("px"))
    assert(rows(eq.select("px")).head.head == 110.0)
  }

  test("asOfJoin: matched right row with NULL value yields NULL, not an older value") {
    val trades = Seq(("a", 25, 1)).toDF("k", "t", "id")
    val quotes = Seq(("a", 8, Some(100.0)), ("a", 20, None: Option[Double]))
      .toDF("k", "t", "px")
    // the latest right row at-or-before t=25 is (a,20,NULL): the struct
    // carry must surface that NULL instead of falling back to (a,8,100)
    val out = Relational.asOfJoin(trades, quotes, Seq("k"), "t", "t", Seq("px"))
    assert(rows(out.select("px")) == Seq(Seq(null)))
  }

  test("hashJoin RIGHT_OUTER and FULL_OUTER supersets") {
    val l = Seq((1, "a"), (2, "b")).toDF("lk", "lv")
    val r = Seq((2, "x"), (3, "y")).toDF("rk", "rv")
    val right = Relational.hashJoin(l, r, col("lk") === col("rk"), "right_outer")
    assert(rows(right.orderBy("rk").select("lv", "rv")) ==
      Seq(Seq("b", "x"), Seq(null, "y")))
    val full = Relational.hashJoin(l, r, col("lk") === col("rk"), "full_outer")
    assert(rows(full.orderBy(coalesce(col("lk"), col("rk"))).select("lv", "rv")) ==
      Seq(Seq("a", null), Seq("b", "x"), Seq(null, "y")))
    intercept[IllegalArgumentException] {
      Relational.hashJoin(l, r, col("lk") === col("rk"), "cross_apply")
    }
  }

  test("hashJoin KeyUniqueness=UNIQUE asserts the build-side contract") {
    val l = Seq((1, "a")).toDF("lk", "lv")
    val unique = Seq((1, "x"), (2, "y")).toDF("rk", "rv")
    val dup = Seq((1, "x"), (1, "y")).toDF("rk", "rv")
    assert(Relational.hashJoin(l, unique, col("lk") === col("rk"),
      rhsUniqueness = Relational.UniqueKey, rhsKeyCols = Seq("rk")).count() == 1)
    intercept[IllegalArgumentException] {
      Relational.hashJoin(l, dup, col("lk") === col("rk"),
        rhsUniqueness = Relational.UniqueKey, rhsKeyCols = Seq("rk")).count()
    }
  }

  test("rangeJoin: containment incl. boundaries, multi-bucket intervals, no BNL plan") {
    val pts = Seq((1, 5L), (2, 10L), (3, 25L), (4, 99L)).toDF("pid", "t")
    val ivs = Seq((100, 5L, 10L), (200, 8L, 31L), (300, 40L, 41L)).toDF("iid", "s", "e")
    val out = Relational.rangeJoin(pts, ivs, Nil, col("t"), col("s"), col("e"),
      bucketWidth = 10L)
    // boundaries inclusive (t=5 and t=10 in [5,10]); interval 200 spans
    // buckets 0..3 yet each pair appears once; t=99 matches nothing
    assert(rows(out.select("pid", "iid").orderBy("pid", "iid")) ==
      Seq(Seq(1, 100), Seq(2, 100), Seq(2, 200), Seq(3, 200)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), s"range join fell back to BNL:\n$plan")
    // degenerate interval (e < s) drops instead of exploding backwards
    val deg = Relational.rangeJoin(pts, Seq((9, 10L, 5L)).toDF("iid", "s", "e"),
      Nil, col("t"), col("s"), col("e"), 10L)
    assert(deg.count() == 0)
    // with an equi key, only same-key intervals match
    val kp = Seq(("a", 1, 5L), ("b", 2, 5L)).toDF("k", "pid", "t")
    val ki = Seq(("a", 100, 0L, 9L)).toDF("k", "iid", "s", "e")
    assert(rows(Relational.rangeJoin(kp, ki, Seq("k"), col("t"), col("s"), col("e"), 10L)
      .select("pid")).flatten == Seq(1))
  }

  test("rangeJoin keyless path salts the shuffle key (parallelism at scale)") {
    val pts = Seq((1, 5L), (2, 10L), (3, 25L), (4, 99L)).toDF("pid", "t")
    val ivs = Seq((100, 5L, 10L), (200, 8L, 31L), (300, 40L, 41L)).toDF("iid", "s", "e")
    val unsalted = Relational.rangeJoin(pts, ivs, Nil, col("t"), col("s"), col("e"),
      bucketWidth = 10L, saltBuckets = 1)
    val salted = Relational.rangeJoin(pts, ivs, Nil, col("t"), col("s"), col("e"),
      bucketWidth = 10L, saltBuckets = 8)
    // identical results: a point meets an interval in exactly one
    // (bucket, salt) pair, intervals are replicated across all salts
    assert(rows(salted.select("pid", "iid").orderBy("pid", "iid")) ==
      rows(unsalted.select("pid", "iid").orderBy("pid", "iid")))
    // the exchange hashes (__b, __salt): partitioning cardinality is no
    // longer capped at the raw bucket count (the named 100 TB scale-killer)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(__b") && plan.contains("__salt"),
      s"keyless range join must salt its exchange:\n$plan")
    // keys empty + default saltBuckets=0 auto-salts too
    val auto = Relational.rangeJoin(pts, ivs, Nil, col("t"), col("s"), col("e"), 10L)
    assert(auto.queryExecution.executedPlan.toString.contains("__salt"))
    // with equi keys the shuffle key is already high-cardinality — no salt
    val kp = Seq(("a", 1, 5L)).toDF("k", "pid", "t")
    val ki = Seq(("a", 100, 0L, 9L)).toDF("k", "iid", "s", "e")
    val keyed = Relational.rangeJoin(kp, ki, Seq("k"), col("t"), col("s"), col("e"), 10L)
    assert(!keyed.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("rangeJoin auto-salt survives a non-numeric shuffle.partitions conf") {
    // stock Spark type-checks the conf (spark.conf.set("...", "auto")
    // throws INVALID_CONF_VALUE here), but vendor distros accept sentinels
    // like "auto" — the salt heuristic parses the STRING value, so it must
    // degrade to the cap, not throw inside the planner
    assert(Relational.autoSaltFromConf("auto") == 64)
    assert(Relational.autoSaltFromConf("") == 64)
    assert(Relational.autoSaltFromConf("16") == 16)
    assert(Relational.autoSaltFromConf("2000") == 64, "cap at 64")
    assert(Relational.autoSaltFromConf("0") == 1, "floor at 1")
    // and the conf-wired path still auto-salts under the session default
    val pts = Seq((1, 5L), (2, 10L)).toDF("pid", "t")
    val ivs = Seq((100, 5L, 10L)).toDF("iid", "s", "e")
    val out = Relational.rangeJoin(pts, ivs, Nil, col("t"), col("s"), col("e"), 10L)
    assert(rows(out.select("pid", "iid").orderBy("pid")) ==
      Seq(Seq(1, 100), Seq(2, 100)))
    assert(out.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("coalesceColumns same-parent projections take the zero-job select path") {
    val base = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)).toDF("id", "s", "v")
    val left = base.select(col("id"), (col("v") * 2).as("v2"))
    val right = base.select(col("s").as("t"))
    val out = Relational.coalesceColumns(Seq(left, right))
    assert(out.columns.toSeq == Seq("id", "v2", "t"))
    assert(rows(out.orderBy("id")) ==
      Seq(Seq(1, 3.0, "a"), Seq(2, 5.0, "b"), Seq(3, 7.0, "c")))
    // fast path: ONE merged Project over the shared parent — no
    // zipWithIndex job, which would surface as an ExistingRDD scan
    import org.apache.spark.sql.catalyst.plans.logical.Project
    assert(out.queryExecution.analyzed.isInstanceOf[Project],
      "same-parent coalesce must splice into a single Project")
    assert(!out.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "fast path must not plan the rowid zip")
    // a nondeterministic projection must NOT collapse to a shared select
    // (rand() would change from N independent draws to one)
    val nd = base.select(col("id"), rand(7).as("r"))
    val fb = Relational.coalesceColumns(Seq(nd, right))
    assert(fb.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "nondeterministic projection must use the rowid-zip fallback")
    assert(fb.count() == 3)
    // unrelated lineage still zips positionally via the fallback
    val other = Seq("x", "y", "z").toDF("u")
    val fb2 = Relational.coalesceColumns(Seq(base.select(col("id")), other))
    assert(fb2.queryExecution.executedPlan.toString.contains("ExistingRDD"))
    assert(rows(fb2.orderBy("id")) == Seq(Seq(1, "x"), Seq(2, "y"), Seq(3, "z")))
  }

  test("chooseRangeBucketWidth bounds interval duplication on mixed lengths") {
    // 95 short intervals (len 10) and 5 long tails (len 1000): a naive
    // hand-picked width of 1 would explode them into ~6000 copies
    val ivs = ((1 to 95).map(i => (i, i * 2000L, i * 2000L + 10L)) ++
      (96 to 100).map(i => (i, i * 2000L, i * 2000L + 1000L))).toDF("iid", "s", "e")
    val w = Relational.chooseRangeBucketWidth(ivs, col("s"), col("e"))
    assert(w >= 10L && w <= 1001L, s"width $w outside the length domain")
    // the p90 width keeps the BULK at <= 2 bucket copies each; only the
    // 5% tail explodes proportionally to its own length
    val perIv = ivs.select(
      (floor(col("e") / w) - floor(col("s") / w) + 1).as("copies"))
    assert(perIv.where(col("copies") <= 2).count() >= 90)
    // total duplication obeys the closed-form bound n + sum(len)/w
    val total = perIv.agg(sum("copies")).head.getLong(0)
    val sumLen = ivs.select(sum(col("e") - col("s"))).head.getLong(0)
    assert(total <= 100 + sumLen / w + 1,
      s"total copies $total exceed the n + sum(len)/w bound")
  }

  test("upsert: updates replace same-key rows, new keys append, schema checked") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val updates = Seq((2, "B"), (4, "D")).toDF("k", "v")
    assert(rows(Relational.upsert(base, updates, Seq("k")).orderBy("k")) ==
      Seq(Seq(1, "a"), Seq(2, "B"), Seq(3, "c"), Seq(4, "D")))
    // empty updates = identity; empty base = updates
    val none = base.where(lit(false))
    assert(rows(Relational.upsert(base, none, Seq("k")).orderBy("k")) ==
      rows(base.orderBy("k")))
    assert(rows(Relational.upsert(none, updates, Seq("k")).orderBy("k")) ==
      rows(updates.orderBy("k")))
    // schema mismatch fails fast, not silently
    intercept[IllegalArgumentException] {
      Relational.upsert(base, updates.toDF("k", "w"), Seq("k"))
    }
    // NULL keys are latest-wins too (null-safe anti join), not duplicated
    val nb = Seq((Some(1), "a"), (None, "x")).toDF("k", "v")
    val nu = Seq((Option.empty[Int], "X")).toDF("k", "v")
    assert(rows(Relational.upsert(nb, nu, Seq("k")).orderBy("k")) ==
      Seq(Seq(null, "X"), Seq(1, "a")))
  }

  test("applyChangeLog: highest seq per key wins across I/U/D, untouched rows survive") {
    val base = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
    val changes = Seq(
      (2, "B1", 1L, "U"), (2, "B2", 5L, "U"),   // two updates: seq 5 wins
      (3, "dead", 1L, "U"), (3, "dead", 2L, "D"), // update then delete: D wins
      (4, "revived", 2L, "I"), (4, "x", 1L, "D"), // delete then insert: I wins
      (9, "new", 1L, "I")
    ).toDF("k", "v", "seq", "op")
    withPartitionings(changes) { ch =>
      val out = Relational.applyChangeLog(base, ch, Seq("k"), "seq", "op")
      assert(rows(out.orderBy("k")) == Seq(
        Seq(1, "a"), Seq(2, "B2"), Seq(4, "revived"), Seq(9, "new")))
    }
    // payload schema must equal base schema
    intercept[IllegalArgumentException] {
      Relational.applyChangeLog(base,
        changes.withColumnRenamed("v", "w"), Seq("k"), "seq", "op")
    }
  }

  test("scd2History: D closes without a row, re-insert opens a fresh version") {
    val log = Seq(
      (1, "v1", 1L, "I"), (1, "v2", 3L, "U"),          // two open-then-closed versions
      (2, "x1", 1L, "I"), (2, null, 2L, "D"),          // deleted: version closed, none open
      (2, "x2", 5L, "I"),                               // revived: fresh current version
      (3, "only", 1L, "I")                              // never touched again: open
    ).toDF("k", "v", "seq", "op")
    withPartitionings(log) { lg =>
      val out = rows(Relational.scd2History(lg, Seq("k"), "seq", "op")
        .orderBy("k", "valid_from"))
      assert(out == Seq(
        Seq(1, "v1", 1L, 3L, false), Seq(1, "v2", 3L, null, true),
        Seq(2, "x1", 1L, 2L, false), Seq(2, "x2", 5L, null, true),
        Seq(3, "only", 1L, null, true)))
    }
    // exactly one current version per surviving key; deleted-only keys none
    val cur = Relational.scd2History(log.toDF("k", "v", "seq", "op"),
      Seq("k"), "seq", "op").where(col("is_current"))
    assert(rows(cur.select("k").orderBy("k")) == Seq(Seq(1), Seq(2), Seq(3)))
  }

  test("fileOutputPartitioned writes partition dirs with bounded file counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fop").toString
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("k", "par")
    Relational.fileOutputPartitioned(df, dir, Seq("par"), targetRowsPerFile = 25L)
    val back = Relational.scanParquet(spark, dir)
    assert(back.count() == 100)
    assert(rows(back.groupBy("par").count().orderBy("par")) ==
      Seq(Seq("even", 50L), Seq("odd", 50L)))
    // directory-partitioned layout exists for both values
    assert(new java.io.File(s"$dir/par=even").isDirectory)
    assert(new java.io.File(s"$dir/par=odd").isDirectory)
    // size targeting: 50 rows per value at target 25 ⇒ each directory is
    // SPLIT (≥ 2 files — never one giant file per partition value) and no
    // single file exceeds the row target (the salt splits ~evenly; the
    // writer's maxRecordsPerFile enforces the hard cap)
    for (sub <- Seq("par=even", "par=odd")) {
      val files = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(files.length >= 2, s"$sub should be split into multiple files")
      for (f <- files)
        assert(spark.read.parquet(f.getAbsolutePath).count() <= 25L,
          s"${f.getName} exceeds targetRowsPerFile")
    }
  }

  test("fileOutputPartitioned enforces the low-cardinality partition contract") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fop_guard").toString
    val df = (1 to 50).map(i => (i, s"val$i")).toDF("k", "par") // 50 distinct values
    val e = intercept[IllegalArgumentException] {
      Relational.fileOutputPartitioned(df, dir, Seq("par"),
        targetRowsPerFile = 10L, maxPartitionValues = 10)
    }
    assert(e.getMessage.contains("low-cardinality"))
    // raising the cap lets the same write through
    Relational.fileOutputPartitioned(df, dir, Seq("par"),
      targetRowsPerFile = 10L, maxPartitionValues = 64)
    assert(Relational.scanParquet(spark, dir).count() == 50)
  }

  test("avro round-trip preserves types, NULLs, binary and nested values") {
    val df = Seq(
      (1L, Some("a"), Some(1.5), Some(Array[Byte](0, 1, -1)), Seq(1, 2, 3)),
      (2L, None, None, None, Seq.empty[Int]),
      (3L, Some("ζ→utf8"), Some(-0.25), Some(Array.emptyByteArray), Seq(7)))
      .toDF("k", "s", "v", "b", "xs")
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    Relational.avroOutput(df, dir)
    val back = Relational.avroInput(spark, dir)
    // names and types survive; nullability widens to true (Avro encodes
    // nullable unions — the standard read-side contract)
    assert(back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    assert(rows(back.orderBy("k").select("k", "s", "v", "xs")) ==
      rows(df.orderBy("k").select("k", "s", "v", "xs")))
    // binary column round-trips byte-exact (Row equality on Array is by ref)
    val bs = back.orderBy("k").select("b").collect()
      .map(r => Option(r.getAs[Array[Byte]](0)).map(_.toSeq))
    assert(bs.toSeq === Seq(Some(Seq[Byte](0, 1, -1)), None, Some(Seq.empty[Byte])))
    // column pruning reaches the Avro scan (row format: no predicate
    // pushdown, so pruning is the scan-side contract worth pinning)
    val pruned = Relational.avroInput(spark, dir).select("k")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema") && scan.contains("k") &&
      !scan.contains("\"s\""), s"avro scan should read only k:\n$scan")
  }

  test("fileOutput codec control: zstd round-trips and measurably shrinks") {
    // compressible payload: DISTINCT per-row strings (so dictionary
    // encoding cannot collapse them) with heavy shared structure
    val df = (1 to 5000).map(i => (i.toLong, s"category_${i % 7}",
      s"doc $i: " + "the quick brown fox jumps over the lazy dog " * 3 +
        s"tail ${i * 2654435761L}")).toDF("k", "cat", "txt")
    val snappyDir = java.nio.file.Files.createTempDirectory("graft_snappy").toString
    val zstdDir = java.nio.file.Files.createTempDirectory("graft_zstd").toString
    Relational.fileOutput(df.coalesce(1), snappyDir) // default snappy
    Relational.fileOutput(df.coalesce(1), zstdDir, codec = "zstd")
    assert(rows(Relational.scanParquet(spark, zstdDir).orderBy("k")) ==
      rows(Relational.scanParquet(spark, snappyDir).orderBy("k")))
    // measured, not asserted: footer metadata says the zstd column chunks
    // are smaller on this compressible payload
    val sB = Relational.parquetColumnBytes(spark, snappyDir, "txt")
    val zB = Relational.parquetColumnBytes(spark, zstdDir, "txt")
    assert(zB > 0 && zB < sB, s"zstd txt bytes $zB should be < snappy $sB")
  }

  test("xml round-trip preserves values; escaping and NULLs survive") {
    val df = Seq(
      (1L, Some("a <b> & \"c\""), Some(1.5)),
      (2L, Some("plain"), None),
      (3L, None, Some(-0.25))).toDF("k", "s", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    Relational.xmlOutput(df, dir, rowTag = "doc")
    val back = Relational.xmlInput(spark, dir, df.schema, rowTag = "doc")
    assert(rows(back.orderBy("k")) == rows(df.orderBy("k")))
    // the dump shape: repeated <doc> records; markup inside values is
    // entity-escaped on disk
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    assert(parts.nonEmpty)
    val text = parts.map(f => new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")).mkString("\n")
    // only < and & MUST be entity-escaped in content; > may pass through
    assert(text.contains("<doc>") && text.contains("&lt;b>") &&
      text.contains("&amp;"),
      s"xml text should contain escaped markup:\n${text.take(300)}")
  }

  test("text line round-trip: bytes survive, one-column contract, gzip codec") {
    // the raw-crawl shape: one document/log line per row, no quoting —
    // commas, tabs, quotes and unicode must come back byte-identical
    val lines = Seq("plain line", "has,commas\tand\ttabs",
      "\"quoted\" and 'single'", "ζ→utf8 payload", "")
    val df = lines.toDF("value")
    val dir = java.nio.file.Files.createTempDirectory("graft_text").toString
    Relational.textOutput(df, dir)
    assert(Relational.textInput(spark, dir).collect().map(_.getString(0))
      .sorted.toSeq == lines.sorted)
    // sink contract: exactly one string column
    val e = intercept[IllegalArgumentException] {
      Relational.textOutput(Seq((1L, "x")).toDF("k", "v"), dir)
    }
    assert(e.getMessage.contains("one string column"))
    // the two documented line-format caveats, pinned as behavior: a
    // NULL value writes an empty line (reads back as "", not NULL),
    // and a bare \r inside a value splits the row on read
    val caveatDir = java.nio.file.Files.createTempDirectory("graft_text_cv").toString
    Relational.textOutput(Seq(Some("a"), None, Some("b\rc")).toDF("value"), caveatDir)
    assert(Relational.textInput(spark, caveatDir).collect().map(_.getString(0))
      .sorted.toSeq == Seq("", "a", "b", "c"))
    // gzip codec round-trips (unsplittable — the scaladoc's many-files
    // contract; here just the codec path)
    val gzDir = java.nio.file.Files.createTempDirectory("graft_text_gz").toString
    Relational.textOutput(df, gzDir, codec = Some("gzip"))
    assert(new java.io.File(gzDir).listFiles()
      .exists(_.getName.endsWith(".txt.gz")), "expected .gz parts")
    assert(Relational.textInput(spark, gzDir).collect().map(_.getString(0))
      .sorted.toSeq == lines.sorted)
  }

  test("csv/json round-trips preserve quoting, commas, and NULLs") {
    val df = Seq(
      (1L, Some("a,b \"quoted\" c"), Some(1.5)),
      (2L, Some("plain"), None),
      (3L, None, Some(-0.25))).toDF("k", "s", "v")
    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Relational.csvOutput(df, csvDir)
    assert(rows(Relational.csvInput(spark, csvDir, df.schema).orderBy("k")) ==
      rows(df.orderBy("k")))
    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Relational.jsonOutput(df, jsonDir)
    assert(rows(Relational.jsonInput(spark, jsonDir, df.schema).orderBy("k")) ==
      rows(df.orderBy("k")))
  }

  test("zorderValue interleaves bits; zorderWrite tightens per-file ranges") {
    // hand-checked interleavings: x bits even positions, y bits odd
    val vals = rows(Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L)).toDF("x", "y")
      .select(Relational.zorderValue(col("x"), col("y")))).flatten
    assert(vals == Seq(1L, 2L, 15L, 6L)) // z(2,1)=x bit1->pos2(4) + y bit0->pos1(2)
    // layout: a 64x64 grid written along the curve has per-file x AND y
    // spans far below the global span (a plain single-column sort keeps
    // the full span of the OTHER column in every file)
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    Relational.zorderWrite(grid, dir, col("x"), col("y"), numFiles = 16)
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length >= 8)
    val spans = files.map { f =>
      val r = rows(spark.read.parquet(f.getAbsolutePath)
        .agg(max("x") - min("x"), max("y") - min("y"))).head
      (r(0).asInstanceOf[Int], r(1).asInstanceOf[Int])
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    // global span is 63 in both dimensions; curve segments stay local
    assert(avgX < 32 && avgY < 32, s"avg spans ($avgX, $avgY) not local")
    assert(spark.read.parquet(dir).count() == 64 * 64)
  }

  test("zorderValueN interleaves k dims round-robin; 3-D write localizes all spans") {
    // hand-checked 3-D interleavings (bit j of key i -> position 3j+i):
    // z(1,0,0)=1, z(0,1,0)=2, z(0,0,1)=4, z(1,1,1)=7,
    // z(2,0,0)=bit1 of x -> pos 3 = 8, z(3,3,3)=0b111111=63
    val vals = rows(Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L),
      (2L, 0L, 0L), (3L, 3L, 3L)).toDF("x", "y", "w")
      .select(Relational.zorderValueN(Seq(col("x"), col("y"), col("w"))))).flatten
    assert(vals == Seq(1L, 2L, 4L, 7L, 8L, 63L))
    // 2-D face delegates to the same arithmetic (regression pin)
    assert(rows(Seq((2L, 1L)).toDF("x", "y")
      .select(Relational.zorderValue(col("x"), col("y")))).flatten == Seq(6L))
    // width guard: 4 keys at default 15 bits fit; 4 keys at 16 overflow
    intercept[IllegalArgumentException] {
      Relational.zorderValueN(Seq(col("a"), col("b"), col("c"), col("d")), bits = 16)
    }
    // layout: a 16x16x16 cube written along the 3-D curve keeps per-file
    // spans of ALL THREE dims below the global span (a plain sort keeps
    // the full span of the two non-leading columns in every file)
    val cube = (for (x <- 0 until 16; y <- 0 until 16; w <- 0 until 16)
      yield (x, y, w)).toDF("x", "y", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder3").toString
    Relational.zorderWriteN(cube, dir, Seq(col("x"), col("y"), col("w")), numFiles = 16)
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length >= 8)
    val spans = files.map { f =>
      val r = rows(spark.read.parquet(f.getAbsolutePath)
        .agg(max("x") - min("x"), max("y") - min("y"), max("w") - min("w"))).head
      (r(0).asInstanceOf[Int], r(1).asInstanceOf[Int], r(2).asInstanceOf[Int])
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    val avgW = spans.map(_._3).sum.toDouble / spans.length
    // global span is 15 in every dimension; curve segments stay local
    assert(avgX < 8 && avgY < 8 && avgW < 8,
      s"avg spans ($avgX, $avgY, $avgW) not local on all three dims")
    assert(spark.read.parquet(dir).count() == 16 * 16 * 16)
  }

  test("lookup is a broadcast multi-lookup join") {
    val queries = Seq(1, 2, 2, 9).toDF("k")
    val index = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val out = Relational.lookup(queries, index, Seq("k"))
    assert(rows(out.orderBy("k", "v")) == Seq(Seq(1, "a"), Seq(2, "b"), Seq(2, "b")))
  }

  test("manifestPrunedScan reads only range-overlapping files, result equals full filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val data = spark.range(0, 1000).toDF("k").withColumn("v", col("k") * 2)
    data.repartitionByRange(10, col("k")).write.mode("overwrite").parquet(dir)
    val mf = Relational.fileStatsManifest(spark, dir, "k").cache()
    assert(mf.count() == 10)
    val pruned = Relational.manifestPrunedScan(spark, mf, "k", lit(150L), lit(249L))
    // correctness: equals the full-scan filter
    val full = spark.read.parquet(dir).where(col("k").between(150, 249))
    assert(pruned.count() == 100 &&
      pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    // skipping: the pruned plan touches a strict subset of the files
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched <= 2, s"expected <=2 of 10 files read, got $touched")
    // empty range: zero rows, schema intact, no crash
    val none = Relational.manifestPrunedScan(spark, mf, "k", lit(5000L), lit(6000L))
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
    mf.unpersist()
  }

  test("compactionPlan: cumulative binning is deterministic and target-bounded") {
    val mf = Seq(("f0", 60L), ("f1", 60L), ("f2", 60L), ("f3", 200L), ("f4", 10L))
      .toDF("file", "bytes")
    val plan = Relational.compactionPlan(mf, "file", "bytes", targetBytes = 100L)
    // cum-before: 0, 60, 120, 180, 380 → bins 0, 0, 1, 1, 3
    assert(rows(plan.orderBy("file")) == Seq(
      Seq("f0", 60L, 0L), Seq("f1", 60L, 0L), Seq("f2", 60L, 1L),
      Seq("f3", 200L, 1L), Seq("f4", 10L, 3L)))
  }

  test("compactParquetDir rewrites a small-file mess into few files, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_cmp_out").toString
    val data = spark.range(0, 10000).toDF("k").withColumn("v", col("k") % 97)
    data.repartition(16).write.mode("overwrite").parquet(dir) // 16 small files
    val (before, after) = Relational.compactParquetDir(spark, dir, out,
      targetBytes = 256 * 1024)
    assert(before == 16 && after < before, s"$before -> $after files")
    val back = spark.read.parquet(out)
    assert(back.count() == 10000)
    assert(rows(back.agg(sum("v"), sum("k"))) == rows(data.agg(sum("v"), sum("k"))))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
                 (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val v2 = Seq((1L, "a", 10.0),                       // unchanged
                 (2L, "B", 20.0),                       // changed (s)
                 (4L, "d", 40.0),                       // changed (null -> d, NULL-safe)
                 (5L, "e", 50.0)).toDF("k", "s", "v")   // added; 3 removed
    withPartitionings(v1) { d1 =>
      val out = rows(Relational.snapshotDiff(d1, v2, Seq("k"), Seq("s", "v"))
        .orderBy("k"))
      assert(out == Seq(Seq(2L, "changed"), Seq(3L, "removed"),
        Seq(4L, "changed"), Seq(5L, "added")))
    }
  }

  test("joinCardinality predicts the exact inner-join row count without joining") {
    import spark.implicits._
    val l = Seq(Some(1L), Some(1L), Some(2L), Some(2L), Some(2L), Some(3L), None)
      .toDF("k")
    val r = Seq(1L, 2L, 2L, 9L).toDF("k")
    val out = rows(Relational.joinCardinality(l, r, "k", "k")).head
    // matched keys {1, 2}; rows = 2·1 + 3·2 = 8; null key never matches
    assert(out == Seq(7L, 4L, 2L, 8L))
    val actual = l.where(col("k").isNotNull)
      .join(r.withColumnRenamed("k", "rk"), col("k") === col("rk")).count()
    assert(actual == 8L)
  }

  test("joinCardinality on disjoint keys reports zero join rows") {
    import spark.implicits._
    val l = Seq(1L, 2L).toDF("k")
    val r = Seq(3L).toDF("k")
    assert(rows(Relational.joinCardinality(l, r, "k", "k")) ==
      Seq(Seq(2L, 1L, 0L, 0L)))
  }

  test("readCsvQuarantine splits parseable rows from corrupt lines with raw text preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quar_spec")
    java.nio.file.Files.write(dir.resolve("feed.csv"),
      java.util.Arrays.asList("1,10.5", "2,20.25", "oops,nope", "3,bad"),
      java.nio.charset.StandardCharsets.UTF_8)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val (good, bad) = Relational.readCsvQuarantine(spark, dir.toString, schema)
    assert(rows(good.orderBy("k")) == Seq(Seq(1L, 10.5), Seq(2L, 20.25)))
    assert(rows(bad.orderBy("raw_line")).flatten == Seq("3,bad", "oops,nope"))
  }

  test("skewHybridJoin equals the plain join and broadcasts the hot leg") {
    import spark.implicits._
    // key 1 is hot (6 rows), keys 2..4 cold (1 row each)
    val l = (Seq.fill(6)((1L, "h")) ++ Seq((2L, "a"), (3L, "b"), (4L, "c")))
      .toDF("k", "payload")
    val r = Seq((1L, "X"), (2L, "Y"), (5L, "Z")).toDF("rk", "name")
    val hybrid = Relational.skewHybridJoin(l, r, "k", "rk", hotThreshold = 3L)
    val plain = l.join(r, col("k") === col("rk"))
    assert(rows(hybrid.orderBy("k", "payload")) == rows(plain.orderBy("k", "payload")))
    val plan = hybrid.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "hot leg must broadcast")
    // explosion guard: 1 hot key but maxHotKeys 0 -> loud failure
    intercept[IllegalArgumentException] {
      Relational.skewHybridJoin(l, r, "k", "rk", hotThreshold = 3L, maxHotKeys = 0)
    }
    // no hot keys: falls back to the single plain join
    assert(rows(Relational.skewHybridJoin(l, r, "k", "rk", hotThreshold = 100L)
      .orderBy("k", "payload")) == rows(plain.orderBy("k", "payload")))
  }
}
