package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank pinned by hand arithmetic: scaled-long ranks, integer
  * division, order-independent sums — the same numbers under any
  * partitioning.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a(1) -> b(2), b -> a, a -> c(3); outdeg a=2, b=1; c dangling.
  private def edges = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")

  test("pageRank: hand-computed two iterations on a 3-node graph") {
    // S = 1e12, teleport = 0.15*S = 150e9
    // iter1: a <- b/1 = 1e12        -> 150e9 + 85e10*... = 150e9 + 850e9 = 1e12
    //        b <- a div 2 = 5e11    -> 150e9 + 425e9 = 575e9;  c same
    // iter2: a <- b = 575e9         -> 150e9 + (85*575e9) div 100 = 638750000000
    //        b <- a div 2 = 5e11    -> 575e9;  c same
    withPartitionings(edges) { e =>
      val out = Graph.pageRank(e, "src", "dst", iters = 2).orderBy("id")
      assert(rows(out) == Seq(
        Seq(1L, 638750000000L), Seq(2L, 575000000000L), Seq(3L, 575000000000L)))
    }
  }

  test("pageRank: total mass never exceeds teleport + damped input mass") {
    val out = Graph.pageRank(edges, "src", "dst", iters = 5).collect()
    val total = out.map(_.getLong(1)).sum
    // 3 nodes: ceiling = 3*0.15*S + 0.85*(previous total) <= 3*S always
    assert(total <= 3L * Graph.Scale && total > 0)
  }

  test("pageRank: dangling nodes receive rank but leak their own mass (documented)") {
    val out = Graph.pageRank(edges, "src", "dst", iters = 1)
      .where(col("id") === 3L).collect()
    assert(out.head.getLong(1) == 575000000000L) // fed by a, feeds nobody
  }

  test("pageRank rejects bad parameters") {
    intercept[IllegalArgumentException] { Graph.pageRank(edges, "src", "dst", 0) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", 1, dampNum = 100, dampDen = 100)
    }
  }

  test("kCore: pendant peels off, cascade empties a path, dense survives") {
    import spark.implicits._
    val triPlus = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("s", "d")
    // k=2: pendant 4 peels, triangle survives with in-core degrees 2
    assert(rows(Graph.kCore(triPlus, "s", "d", k = 2).orderBy("node")) ==
      Seq(Seq(1L, 2L), Seq(2L, 2L), Seq(3L, 2L)))
    // path graph: peeling CASCADES to empty (ends peel, middles become ends)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(rows(Graph.kCore(path, "s", "d", k = 2)).isEmpty)
    // round budget is loud
    intercept[IllegalArgumentException] {
      Graph.kCore(path, "s", "d", k = 2, maxRounds = 1)
    }
  }

  test("clusteringCoefficient: triangle plus pendant") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 1L))
      .toDF("s", "d") // duplicate/reversed edge must not inflate degrees
    val out = rows(Graph.clusteringCoefficient(e, "s", "d").orderBy("node"))
    assert(out == Seq(
      Seq(1L, 3L, 1L, 0.333333),
      Seq(2L, 2L, 1L, 1.0),
      Seq(3L, 2L, 1L, 1.0),
      Seq(4L, 1L, 0L, null)))
  }

  test("bfsHops: min hop distance on a branching graph with a cycle") {
    import spark.implicits._
    // 1→2→3→4→2 (cycle), 1→5, 5→4 — node 4 reachable in 2 (via 5) and 3
    // (via 2,3); cycle must not loop forever or relabel settled nodes.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (1L, 5L), (5L, 4L))
      .toDF("s", "d")
    val src = Seq(1L).toDF("id")
    val out = rows(Graph.bfsHops(e, "s", "d", src, "id", maxHops = 10)
      .orderBy("id"))
    assert(out == Seq(Seq(1L, 0L), Seq(2L, 1L), Seq(3L, 2L),
      Seq(4L, 2L), Seq(5L, 1L)))
  }

  test("bfsHops: maxHops truncates; multi-source takes the nearer source") {
    import spark.implicits._
    val chain = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("s", "d")
    val out1 = rows(Graph.bfsHops(chain, "s", "d", Seq(1L).toDF("id"), "id",
      maxHops = 3).orderBy("id"))
    assert(out1 == Seq(Seq(1L, 0L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 3L)))
    // sources 1 and 6: node 7 is 1 hop from 6, not 6 hops from 1
    val out2 = rows(Graph.bfsHops(chain, "s", "d", Seq(1L, 6L).toDF("id"),
      "id", maxHops = 2).orderBy("id"))
    assert(out2.contains(Seq(7L, 1L)) && out2.contains(Seq(3L, 2L)))
  }

  test("ssspHops: cheaper long path beats expensive direct edge") {
    import spark.implicits._
    // 1→4 direct costs 10; 1→2→3→4 costs 3. Within 3 hops the engine
    // must find the cheap chain; within 1 hop only the direct edge.
    val e = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("s", "d", "w")
    val src = Seq(1L).toDF("id")
    val out3 = rows(Graph.ssspHops(e, "s", "d", "w", src, "id", maxHops = 3)
      .orderBy("id"))
    assert(out3 == Seq(Seq(1L, 0L), Seq(2L, 1L), Seq(3L, 2L), Seq(4L, 3L)))
    val out1 = rows(Graph.ssspHops(e, "s", "d", "w", src, "id", maxHops = 1)
      .orderBy("id"))
    assert(out1 == Seq(Seq(1L, 0L), Seq(2L, 1L), Seq(4L, 10L)))
  }

  test("ssspHops: multi-edge takes the min weight; cycles terminate") {
    import spark.implicits._
    val e = Seq((1L, 2L, 5L), (1L, 2L, 2L), (2L, 1L, 1L), (2L, 2L, 1L))
      .toDF("s", "d", "w")
    val out = rows(Graph.ssspHops(e, "s", "d", "w", Seq(1L).toDF("id"),
      "id", maxHops = 8).orderBy("id"))
    assert(out == Seq(Seq(1L, 0L), Seq(2L, 2L)))
  }

  test("ssspHops: multi-source min over sources; unreachable absent") {
    import spark.implicits._
    val e = Seq((1L, 3L, 4L), (2L, 3L, 1L), (9L, 10L, 1L)).toDF("s", "d", "w")
    val out = rows(Graph.ssspHops(e, "s", "d", "w",
      Seq(1L, 2L).toDF("id"), "id", maxHops = 4).orderBy("id"))
    assert(out == Seq(Seq(1L, 0L), Seq(2L, 0L), Seq(3L, 1L)))
  }

  test("topoLayers: diamond takes the longer arm; cycle fails loudly") {
    import spark.implicits._
    // 1→2→3→5 and 1→4→5: layer(5) = 3 via the long arm
    val dag = Seq((1L, 2L), (2L, 3L), (3L, 5L), (1L, 4L), (4L, 5L))
      .toDF("s", "d")
    val out = rows(Graph.topoLayers(dag, "s", "d").orderBy("id"))
    assert(out == Seq(Seq(1L, 0L), Seq(2L, 1L), Seq(3L, 2L),
      Seq(4L, 1L), Seq(5L, 3L)))
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val ex = intercept[IllegalArgumentException] {
      Graph.topoLayers(cyc, "s", "d", maxRounds = 6).collect()
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("ancestorClosure: all proper ancestors; subtreeRollup sums inclusive") {
    import spark.implicits._
    // forest: 1 root of {2,3}; 3 parent of {4}; 4 parent of {5}; 9 lone
    val nd = Seq((1L, None, 10), (2L, Some(1L), 1), (3L, Some(1L), 2),
      (4L, Some(3L), 3), (5L, Some(4L), 4), (9L, None, 7))
      .toDF("id", "parent", "v")
    withPartitionings(nd) { d =>
      val anc = rows(Graph.ancestorClosure(d, "id", "parent")
        .orderBy("id", "anc"))
      assert(anc == Seq(Seq(2L, 1L), Seq(3L, 1L), Seq(4L, 1L), Seq(4L, 3L),
        Seq(5L, 1L), Seq(5L, 3L), Seq(5L, 4L)))
      val roll = rows(Graph.subtreeRollup(d, "id", "parent", "v")
        .orderBy("id"))
      assert(roll == Seq(Seq(1L, 4L, 20.0), Seq(2L, 0L, 1.0),
        Seq(3L, 2L, 9.0), Seq(4L, 1L, 7.0), Seq(5L, 0L, 4.0),
        Seq(9L, 0L, 7.0)))
    }
  }

  test("graphSummary: reciprocity, density and degrees on a hand graph") {
    import spark.implicits._
    // edges: 1->2, 2->1 (reciprocated pair), 1->3, 3->3 (self loop),
    // duplicate 1->2
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 3L), (1L, 2L)).toDF("s", "d")
    val r = rows(Graph.graphSummary(e, "s", "d")).head
    // n_nodes=3, n_directed=3 (dedup, no self), n_und=2, recip=2, loops=1
    assert(r(0) == 3L && r(1) == 3L && r(2) == 2L && r(3) == 2L && r(4) == 1L)
    assert(r(5) == 2L) // node 1 touches 2 und edges
    assert(math.abs(r(6).asInstanceOf[Double] - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r(7).asInstanceOf[Double] - 2.0 * 2.0 / (3.0 * 2.0)) < 1e-12)
    assert(math.abs(r(8).asInstanceOf[Double] - 4.0 / 3.0) < 1e-12)
  }
}
