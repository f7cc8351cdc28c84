package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pageRank: one hand-computed power-method round") {
    // A -> B, A -> C, B -> C, C -> A; out(A)=2, out(B)=out(C)=1, N=3
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
      ("A", "B"), // duplicate edge collapses
      (null.asInstanceOf[String], "A") // NULL endpoint drops
    ).toDF("u", "v")
    val pr = GraphOps.pageRank(e, "u", "v", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // contrib: B <- 1/3 / 2; C <- 1/3/2 + 1/3; A <- 1/3
    assert(pr == Map(
      "A" -> r6(0.15 / 3 + 0.85 * (1.0 / 3)),
      "B" -> r6(0.15 / 3 + 0.85 * (1.0 / 6)),
      "C" -> r6(0.15 / 3 + 0.85 * (0.5))), pr.toString)
  }

  test("pageRank: three rounds match an independent in-memory reference") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"),
      ("A", "C"), ("B", "D"), ("E", "A"), ("C", "E"))
    val got = GraphOps.pageRank(edges.toDF("u", "v"), "u", "v", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // plain-Scala power method, same fixed form
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var prm = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map(e => prm(e._1) / out(e._1)).sum).toMap
      prm = nodes.map(v =>
        v -> ((1.0 - 0.85) / nodes.size + 0.85 * in.getOrElse(v, 0.0)))
        .toMap
    }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == prm.map { case (k, v) => k -> r6(v) }, s"$got vs $prm")
  }

  test("pageRank: dangling mass leaks (documented), topK ranks") {
    val e = Seq(("A", "B")).toDF("u", "v") // B has no out-edges
    val pr = GraphOps.pageRank(e, "u", "v", iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("A") == 0.075 && pr("B") == 0.5, pr.toString)
    assert(pr.values.sum < 1.0) // the leak, not renormalized
    val top = GraphOps.pageRankTopK(e, "u", "v", k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("B"))
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, "u", "v", iters = 0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(e, "u", "v", iters = 3, damping = 1.0)
    }
    intercept[IllegalArgumentException] {
      GraphOps.pageRankTopK(e, "u", "v", k = 0)
    }
  }

  test("pageRankWithDeltas: ranks unchanged, L1 deltas observable") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"),
      ("A", "C"), ("B", "D"), ("E", "A"), ("C", "E")).toDF("u", "v")
    val plain = GraphOps.pageRank(edges, "u", "v", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (ranks, deltas) =
      GraphOps.pageRankWithDeltas(edges, "u", "v", iters = 5)
    val traced = ranks.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(traced == plain, s"$traced vs $plain")
    assert(deltas.length == 5)
    assert(deltas.forall(_ >= 0.0), deltas.toString)
    // power-method geometric decay: the last move is well below the
    // first on this strongly-connected graph
    assert(deltas.last < deltas.head, deltas.toString)
  }

  test("checkpointEvery bounds the plan; results unchanged at iters=20") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"),
      ("A", "C"), ("B", "D"), ("E", "A"), ("C", "E")).toDF("u", "v")
    val straight = GraphOps.pageRank(edges, "u", "v", iters = 20)
    val chk = GraphOps.pageRank(edges, "u", "v", iters = 20,
      checkpointEvery = 4)
    val sGot = straight.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val cGot = chk.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sGot == cGot, s"$sGot vs $cGot")
    // the checkpointed plan is bounded by checkpointEvery rounds (the
    // lineage behind the last materialization), not 20
    val sLen = straight.queryExecution.optimizedPlan.treeString.length
    val cLen = chk.queryExecution.optimizedPlan.treeString.length
    assert(cLen * 3 < sLen, s"checkpointed plan $cLen vs straight $sLen")
    // without checkpointing the straight-line cap holds; with it (or
    // with delta tracking) longer runs are allowed
    intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, "u", "v", iters = 21)
    }
    val long = GraphOps.pageRank(edges, "u", "v", iters = 25,
      checkpointEvery = 5).collect()
    assert(long.nonEmpty)
  }
}
