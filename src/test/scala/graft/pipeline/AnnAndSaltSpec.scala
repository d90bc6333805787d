package graft.pipeline

import graft.SparkSpec
import graft.operators.Aggregates
import graft.operators.Aggregates._
import org.apache.spark.sql.functions._

class AnnAndSaltSpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k achieves high recall vs brute force on the embeddings table") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("qid", "vec_id")).map(r => (r(0), r(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qv", 5))
    val ivf = pairs(Similarity.ivfTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, nCells = 8, nprobe = 4))
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low (nprobe=4 of 8 cells)")
    assert(ivf.size <= brute.size)
    // trained-centroid sibling (q_ann_ivf_trained constants: 2 Lloyd
    // rounds, nprobe 2 of 8) — this spec owns its QUALITY contract; the
    // gate owns the exact replay. All-probe must be exact top-k.
    val ivfT = pairs(Similarity.ivfTopKQuantized(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 5, nCells = 8, nprobe = 2, iters = 2))
    val recallT = brute.intersect(ivfT).size.toDouble / brute.size
    assert(recallT >= 0.3, s"trained-IVF recall $recallT too low (nprobe=2 of 8 trained cells)")
    val ivfTAll = pairs(Similarity.ivfTopKQuantized(emb, "vec_id", "embedding",
      q, "qid", "qv", k = 5, nCells = 8, nprobe = 8, iters = 2))
    assert(ivfTAll == brute, "all-probe trained IVF must equal exact top-k")
  }

  test("graph ANN: NN-descent graph + beam search recall vs brute force; " +
    "graph invariants hold") {
    // Same constants as the q_ann_graph gate (k=8, 3 rounds, beam 16×6,
    // 4 entry seeds) — this spec owns the QUALITY contract the
    // replay-oracle gate cannot express.
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val g = Similarity.nnDescentGraph(emb, "vec_id", "embedding",
      k = 8, rounds = 3, reverseCap = 8)
    // bounded degree, correct ranks, no self-edges
    val perNode = g.groupBy("id").agg(count(lit(1)).as("deg"),
      max(col("rank")).as("mx")).collect()
    assert(perNode.forall(r => r.getLong(1) <= 8 && r.getLong(1) == r.getInt(2)))
    assert(g.where(col("id") === col("nbr")).count() == 0)
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("qid", "vec_id")).map(r => (r(0), r(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qv", 5))
    val nav = Similarity.navigableGraph(emb, "vec_id", "embedding",
      k = 8, rounds = 3, reverseCap = 8)
    val beam = pairs(Similarity.beamSearchTopK(nav, emb, "vec_id", "embedding",
      q, "qid", "qv", k = 5, beamWidth = 16, hops = 6, entries = 4))
    val recall = brute.intersect(beam).size.toDouble / brute.size
    assert(recall >= 0.6, s"graph-ANN recall $recall too low (k=8, 3 rounds, beam 16x6, 4 entries)")
    // refinement rounds strictly improve the graph: mean neighbor cosine
    // of the refined graph beats the scattered init
    val g0 = Similarity.nnDescentGraph(emb, "vec_id", "embedding",
      k = 8, rounds = 1, reverseCap = 8)
    val m2 = g.agg(avg("cosine")).head().getDouble(0)
    val m1 = g0.agg(avg("cosine")).head().getDouble(0)
    assert(m2 >= m1, s"round 2 did not improve mean neighbor cosine ($m1 -> $m2)")
  }

  test("PQ ANN: trained codebooks hit the ADC recall contract; codes are " +
    "bounded; training improves quantization error") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("qid", "vec_id")).map(r => (r(0), r(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qv", 5))
    // quality contract at the TRAINED production operating point —
    // 80-bit codes + exact re-rank of the ADC shortlist (the gate replays
    // iters=0/rerank=0 exactly; this spec owns approximation quality).
    // Deterministic end to end, so the measured recall (0.72) is stable.
    val pq = pairs(Similarity.pqTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, m = 16, ksub = 32, iters = 2, rerank = 20))
    val recall = brute.intersect(pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall too low (m=16, ksub=32, iters=2, rerank=20)")
    // code table: one row per vector, m codes each in [0, ksub)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    assert(books.length == 8 && books.forall(_.length == 16)
      && books.forall(_.forall(_.length == 8)))
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    assert(codes.count() == emb.count())
    assert(codes.where(size(col("codes")) =!= 8
      || exists(col("codes"), c => c < 0 || c >= 16)).count() == 0)
    // Lloyd training strictly improves ADC fidelity: mean |adc - exact dot|
    // over the query-corpus pairs shrinks vs the untrained seed codebooks
    def adcErr(iters: Int): Double = {
      val top = Similarity.pqTopK(emb, "vec_id", "embedding", q, "qid", "qv",
        k = 5, m = 8, ksub = 16, iters = iters)
      val ev = emb.select(col("vec_id"), Similarity.asDoubleVec(col("embedding")).as("cv"))
      val qv = q.select(col("qid"), Similarity.asDoubleVec(col("qv")).as("qvv"))
      top.join(ev, "vec_id").join(qv, "qid")
        .select(abs(col("adc") - Similarity.dot(col("qvv"), col("cv"))).as("e"))
        .agg(avg("e")).head().getDouble(0)
    }
    val (e0, e2) = (adcErr(0), adcErr(2))
    assert(e2 < e0, s"training did not reduce ADC error ($e0 -> $e2)")
  }

  test("IVFADC composition: all-probe IVF-PQ equals the plain PQ scan; " +
    "pruned probe keeps the recall contract with re-rank") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      rows(df.select("qid", "vec_id")).map(r => (r(0), r(1))).toSet
    // probing ALL cells makes the composition a pure refactoring of the
    // flat ADC scan — the results must be identical, row for row
    val flat = rows(Similarity.pqTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, m = 8, ksub = 16, iters = 0).orderBy("qid", "rank"))
    val allProbe = rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, nCells = 8, nprobe = 8, m = 8, ksub = 16, iters = 0)
      .orderBy("qid", "rank"))
    assert(flat == allProbe)
    // the production point: 4-of-8 cells probed, trained codebooks,
    // exact re-rank of the ADC shortlist — deterministic, so stable
    val brute = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "qid", "qv", 5))
    val ivfpq = pairs(Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, "qid", "qv",
      k = 5, nCells = 8, nprobe = 4, m = 16, ksub = 32, iters = 2, rerank = 20))
    val recall = brute.intersect(ivfpq).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVFADC recall $recall too low (nprobe=4/8, m=16, ksub=32, rerank=20)")
  }

  test("saltedGroupAggregate matches plain groupAggregate for SUM/MIN/MAX/COUNT") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "hot", i)).toDF("k", "v")
    withPartitionings(df) { d =>
      val salted = rows(Aggregates.saltedGroupAggregate(Seq("k"), Seq(
        Agg(SUM, Some("v"), "s"), Agg(MIN, Some("v"), "mn"),
        Agg(MAX, Some("v"), "mx"), Agg(COUNT, None, "n")), saltBuckets = 8)(d)
        .orderBy("k"))
      val plain = rows(Aggregates.groupAggregate(Seq("k"), Seq(
        Agg(SUM, Some("v"), "s"), Agg(MIN, Some("v"), "mn"),
        Agg(MAX, Some("v"), "mx"), Agg(COUNT, None, "n")))(d).orderBy("k"))
      assert(salted == plain)
    }
    intercept[IllegalArgumentException] {
      Aggregates.saltedGroupAggregate(Seq("k"), Seq(
        Agg(COUNT, Some("v"), "n", distinct = true)))(df)
    }
  }

  test("saltedCollectSorted equals sort_array(collect_list) per key") {
    val df = (1 to 500).map(i => (if (i % 10 == 0) "cold" + i else "hot", i % 37))
      .toDF("k", "v")
    withPartitionings(df) { d =>
      val salted = rows(Aggregates.saltedCollectSorted(Seq("k"), "v", "vals",
        saltBuckets = 8)(d).orderBy("k"))
      val plain = rows(d.groupBy("k")
        .agg(sort_array(collect_list(col("v"))).as("vals")).orderBy("k"))
      assert(salted == plain)
    }
  }

  test("semanticDedup: planted near-dups collapse to the min-id canonical, " +
    "distinct vectors survive") {
    import graft.pipeline.Similarity
    // two orthogonal base directions + near-copies (tiny perturbation in a
    // third dimension keeps cosine ≈ 0.999) — ids chosen so canonicals are
    // the small ids
    def vec(x: Double, y: Double, z: Double) = Array(x, y, z)
    val data = Seq(
      (0L, vec(1, 0, 0)), (10L, vec(1, 0, 0.01)), (20L, vec(1, 0, -0.01)),
      (1L, vec(0, 1, 0)), (11L, vec(0, 1, 0.01)),
      (2L, vec(0.7, 0.7, 0)) // distinct: cosine vs both groups ≈ 0.7
    ).toDF("id", "v")
    val cents = Array(vec(1, 0, 0), vec(0, 1, 0))
    withPartitionings(data) { d =>
      val out = Similarity.semanticDedup(d, "id", "v", cents, tau = 0.99)
        .orderBy("id")
      assert(rows(out) == Seq(
        Seq(0L, 0L, true), Seq(1L, 1L, true), Seq(2L, 2L, true),
        Seq(10L, 0L, false), Seq(11L, 1L, false), Seq(20L, 0L, false)))
    }
  }

  test("semanticDedup: over-cap cell splits recursively; identical groups " +
    "stay together and collapse to min-id canonicals") {
    import graft.pipeline.Similarity
    // ONE level-0 cell of 120 rows (single centroid), cap 10: round 1
    // re-quantizes to the 4 distinct member vectors -> 4 sub-cells of 30;
    // each is over cap but has a single distinct vector, so it cannot
    // split further (renamed harmlessly until the round budget) — all 30
    // members stay together and collapse to the group's min id.
    def vec(x: Double, y: Double, z: Double, w: Double) = Array(x, y, z, w)
    val groups = Seq(vec(1, 0, 0, 0), vec(0, 1, 0, 0), vec(0, 0, 1, 0), vec(0, 0, 0, 1))
    val data = (0 until 120).map(i => (i.toLong, groups(i % 4))).toDF("id", "v")
    val cents = Array(vec(1, 1, 1, 1))
    withPartitionings(data) { d =>
      val out = Similarity.semanticDedup(d, "id", "v", cents, tau = 0.9,
        maxCellSize = 10, splitK = 8, maxSplitRounds = 4)
      val canon = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until 120).foreach { i =>
        assert(canon(i.toLong) == (i % 4).toLong, s"id $i -> ${canon(i.toLong)}")
      }
      assert(out.where(col("kept")).count() == 4)
    }
  }

  test("semanticDedup: colinear duplicates survive splitting together " +
    "(cosine tie -> higher sub-index)") {
    import graft.pipeline.Similarity
    // v and 2v are distinct vectors with cosine exactly 1: when both
    // become sub-centroids, every member ties at cos=1 and the HIGHER
    // sub-index wins for all, so the cell stabilizes unsplittable — and
    // its members are mutual duplicates at any tau, i.e. output-bound.
    val data = (0 until 30).map(i =>
      (i.toLong, Array(1.0 * (1 + i % 2), 2.0 * (1 + i % 2), 0.0))).toDF("id", "v")
    val cents = Array(Array(1.0, 2.0, 0.0))
    val out = Similarity.semanticDedup(data, "id", "v", cents, tau = 0.99,
      maxCellSize = 5, splitK = 4, maxSplitRounds = 3)
    assert(out.where(col("kept")).count() == 1)
    assert(out.where(col("canonical") === 0L).count() == 30)
  }

  test("semanticDedup: splitting can separate near-dups across sub-cells " +
    "(documented SemDeDup trade-off, same as level-0 cell blocking)") {
    import graft.pipeline.Similarity
    // 12 near-identical-but-distinct vectors in one over-cap cell: each
    // distinct vector is nearest to ITSELF among the sub-centroids
    // (cos=1), so the split isolates them and the τ=0.9 pairs are never
    // verified — the cap trades recall inside pathological cells for a
    // bounded quadratic, exactly like level-0 cell blocking does.
    val data = (0 until 12).map(i =>
      (i.toLong, Array(1.0, 0.001 * i, 0.0))).toDF("id", "v")
    val cents = Array(Array(1.0, 0.0, 0.0))
    val out = Similarity.semanticDedup(data, "id", "v", cents, tau = 0.9,
      maxCellSize = 4, splitK = 12, maxSplitRounds = 2)
    assert(out.where(col("kept")).count() == 12)
  }

  test("semanticDedup: cross-cell near-dups are NOT paired (documented cell blocking)") {
    import graft.pipeline.Similarity
    // one vector per cell, nearly identical — lands in different cells, so
    // the within-cell verify never sees the pair: the SemDeDup trade-off
    val data = Seq((0L, Array(1.0, 0.004, 0.0)), (1L, Array(1.0, -0.004, 0.0)))
      .toDF("id", "v")
    val cents = Array(Array(1.0, 0.005, 0.0), Array(1.0, -0.005, 0.0))
    val out = Similarity.semanticDedup(data, "id", "v", cents, tau = 0.9)
    assert(out.where(col("kept")).count() == 2)
  }

  test("GraftExtensions registers vec_dot and simhash64 for SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS r")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    val sh = spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS h")
      .collect().head.getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS h")
      .collect().head.getLong(0)
    assert(sh == sh2)
  }

  test("kmeansQuantized: hand-traced 2-cluster convergence, bit-identical under partitionings") {
    val d = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 1.0f)),
                (2L, Seq(10.0f, 10.0f)), (3L, Seq(11.0f, 11.0f))).toDF("id", "v")
    withPartitionings(d) { dd =>
      val out = rows(Similarity.kmeansQuantized(dd, "id", "v", k = 2, iters = 2,
        scale = 1).orderBy("cid", "dim"))
      // iter1: c0={p0}->(0,0); c1={p1,p2,p3}->(7,7); iter2 reassigns p1 to
      // c0: c0=floor(1/2)=(0,0), c1=(10,10)
      assert(out == Seq(Seq(0, 0, 0L), Seq(0, 1, 0L), Seq(1, 0, 10L), Seq(1, 1, 10L)))
    }
  }

  test("kmeansQuantized: negative sums floor-divide (not truncate); equidistant ties to smaller cid") {
    val neg = Seq((0L, Seq(-1.0f, -1.0f)), (1L, Seq(-2.0f, -2.0f))).toDF("id", "v")
    // one cluster: sum -3 over 2 members -> floorDiv = -2 per dim
    assert(rows(Similarity.kmeansQuantized(neg, "id", "v", k = 1, iters = 1, scale = 1)
      .orderBy("dim")) == Seq(Seq(0, 0, -2L), Seq(0, 1, -2L)))
    // p2 at (1,0) is equidistant from c0 (0,0) and c1 (2,0): tie -> c0, so
    // c0 becomes floor((0+1)/2)=(0,0) and c1 stays (2,0)
    val tie = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)),
                  (2L, Seq(1.0f, 0.0f))).toDF("id", "v")
    assert(rows(Similarity.kmeansQuantized(tie, "id", "v", k = 2, iters = 1, scale = 1)
      .orderBy("cid", "dim")) ==
      Seq(Seq(0, 0, 0L), Seq(0, 1, 0L), Seq(1, 0, 2L), Seq(1, 1, 0L)))
  }

  test("l2QuantizeInt8: known norms quantize exactly; zero vector maps to zero") {
    val d = Seq((1L, Seq(3.0f, 4.0f)),      // norm 5: q = floor(127·(3/5)), floor(127·(4/5))
                (2L, Seq(0.0f, 0.0f)),      // zero vector
                (3L, Seq(-1.0f, 0.0f))).toDF("id", "v") // unit negative: q = -127
    withPartitionings(d) { dd =>
      val out = rows(Similarity.l2QuantizeInt8(dd, "id", "v").orderBy("id", "dim"))
      assert(out == Seq(
        Seq(1L, 0, 76, 5.0), Seq(1L, 1, 101, 5.0),  // 76.2 -> 76, 101.6 -> 101
        Seq(2L, 0, 0, 0.0), Seq(2L, 1, 0, 0.0),
        Seq(3L, 0, -127, 1.0), Seq(3L, 1, 0, 1.0)))
    }
  }

  test("randomProjection: unit vector reads out the sign column; values exact and stable") {
    def sign(i: Int, j: Int): Long =
      if (((i + 1) * 2654435761L + (j + 1) * 2246822519L) % 2147483648L % 2 == 0) 1L else -1L
    val d = Seq((7L, Seq(2.0f))).toDF("id", "v") // dim=1: rp_j = 2·sign(0, j)
    val out = rows(Similarity.randomProjection(d, "id", "v", dim = 1, outDims = 4,
      scale = 1).orderBy("rp_dim"))
    assert(out == (0 until 4).map(j => Seq(7L, j, 2L * sign(0, j))))
    // multi-dim: exact integer sum of signed quantized coords
    val d2 = Seq((1L, Seq(0.5f, -1.5f, 2.0f))).toDF("id", "v")
    val out2 = rows(Similarity.randomProjection(d2, "id", "v", dim = 3, outDims = 2,
      scale = 10).orderBy("rp_dim"))
    val q = Seq(5L, -15L, 20L) // floor(x*10)
    assert(out2 == (0 until 2).map(j =>
      Seq(1L, j, (0 until 3).map(i => q(i) * sign(i, j)).sum)))
  }
}
