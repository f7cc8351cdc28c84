package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph operators over edge-list DataFrames — the crawl-side
  * companions to the URL family ([[CorpusOps.canonicalUrl]] /
  * `urlDedup` / the streaming frontier): a crawler that dedups and
  * filters URLs still needs to decide what to fetch NEXT, and host-graph
  * centrality is the standard prioritizer.
  *
  * Reference semantics: classic PageRank (Brin & Page 1998), the
  * fixed-iteration power method — deliberately NOT run-to-convergence,
  * so the result is a closed form of the inputs and differentially
  * gateable against a SQL oracle with the iterations unrolled as CTEs.
  */
object GraphOps {

  /** Fixed-iteration PageRank over a directed edge list. Duplicate
    * edges and NULL endpoints are dropped first (distinct simple
    * edges); the node set is every distinct endpoint; ranks start
    * uniform at 1/N and iterate
    * `pr'(v) = (1-damping)/N + damping * sum_{u->v} pr(u) / out(u)`
    * `iters` times. Returns (`node`, `pagerank` rounded 6). Dangling
    * nodes (no out-edges) leak their mass rather than redistributing
    * it — the simple formulation most engines ship; ranks then sum to
    * < 1 and remain a valid PRIORITY ordering, which is what a crawl
    * frontier consumes (document the choice, don't renormalize
    * silently).
    *
    * Scale shape per iteration: one shuffle keying edges+ranks on
    * `src` (out-degrees join there too, precomputed once) and one hash
    * aggregation keyed on `dst` — the canonical 2-exchange PageRank
    * step; the node table and 1-row count ride broadcasts. The rank
    * relation is node-sized, never edge-sized. Lineage grows linearly
    * with the round count, so long runs pass `checkpointEvery > 0`:
    * every that-many rounds the (node-sized) rank relation is
    * materialized through [[Materialize]] (localCheckpoint, or a
    * reliable checkpoint under `spark.graft.reliableCheckpoint`),
    * truncating the plan so its size is bounded by `checkpointEvery`
    * rounds rather than `iters` — the boundedness is spec-pinned at
    * iters = 20 (GraphOpsSpec). At 3-5 iterations (a frontier refresh)
    * the straight-line plan is the faster choice, so the default stays
    * 0 (off); without checkpointing, `iters` is capped at 20 (the
    * straight-line-plan sanity bound), with it at 200. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               checkpointEvery: Int = 0): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iters, damping, checkpointEvery,
      trackDeltas = false)._1

  /** [[pageRank]] plus the per-round L1 rank delta
    * `sum_v |pr_i(v) - pr_{i-1}(v)|` — the convergence observable a
    * production loop watches to decide when fixed iterations are
    * enough (the power method's geometric decay makes the delta the
    * standard stopping statistic). Returns (ranks, deltas) where
    * `deltas(i)` is round i+1's L1 move; ranks are IDENTICAL to
    * [[pageRank]] at the same dials (spec-pinned).
    *
    * Observability costs one extra node-sized aggregation job per
    * round (the delta is an action), so each round's ranks are
    * materialized eagerly every round — plans stay one-round-sized
    * and nothing recomputes. There is therefore no `checkpointEvery`
    * dial on this form: the per-round delta action forces the
    * materialization cadence. */
  def pageRankWithDeltas(edges: DataFrame, srcCol: String,
                         dstCol: String, iters: Int = 3,
                         damping: Double = 0.85)
      : (DataFrame, Seq[Double]) =
    pageRankCore(edges, srcCol, dstCol, iters, damping,
      checkpointEvery = 0, trackDeltas = true)

  private def pageRankCore(edges: DataFrame, srcCol: String,
                           dstCol: String, iters: Int, damping: Double,
                           checkpointEvery: Int, trackDeltas: Boolean)
      : (DataFrame, Seq[Double]) = {
    val cap = if (checkpointEvery > 0 || trackDeltas) 200 else 20
    require(iters >= 1 && iters <= cap,
      s"iters out of range (1..$cap" +
        (if (cap == 20) ", fixed-iteration form; pass checkpointEvery " +
          "> 0 for longer runs)" else ")") + s": $iters")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1): $damping")
    require(checkpointEvery >= 0,
      s"checkpointEvery must be >= 0 (0 = off): $checkpointEvery")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__out"))
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    def withN(df: DataFrame): DataFrame = df.crossJoin(broadcast(nRow))
    var ranks = withN(nodes)
      .select(col("node"), (lit(1.0d) / col("__n")).as("pr"))
    val deltas = Seq.newBuilder[Double]
    var i = 0
    while (i < iters) {
      val prev = ranks
      val contrib = e
        .join(outDeg, Seq("src"))
        .join(ranks.select(col("node").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") / col("__out").cast("double")).as("__m"))
      ranks = withN(nodes)
        .join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          ((lit(1.0d) - lit(damping)) / col("__n")
            + lit(damping) * coalesce(col("__m"), lit(0.0d))).as("pr"))
      i += 1
      if (trackDeltas) {
        // materialize BEFORE the delta action so the join below reads
        // this round's blocks rather than recomputing the whole chain,
        // and the next round starts from a one-round plan
        ranks = Materialize(ranks, eager = true)
        deltas += ranks.as("__new")
          .join(prev.select(col("node"), col("pr").as("__pp")),
            Seq("node"))
          .agg(coalesce(sum(abs(col("pr") - col("__pp"))),
            lit(0.0d)).as("__d"))
          .collect()(0).getDouble(0)
      } else if (checkpointEvery > 0 && i % checkpointEvery == 0 &&
        i < iters) {
        ranks = Materialize(ranks, eager = true)
      }
    }
    (ranks.select(col("node"),
      (round(col("pr"), 6) + lit(0.0d)).as("pagerank")), deltas.result())
  }

  /** Top-`k` crawl-frontier priorities: [[pageRank]] ranked descending
    * (id tie-break on the rounded rank — the engine-portable rule),
    * compiled to a global TakeOrderedAndProject. */
  def pageRankTopK(edges: DataFrame, srcCol: String, dstCol: String,
                   k: Int, iters: Int = 3,
                   damping: Double = 0.85): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    pageRank(edges, srcCol, dstCol, iters, damping)
      .orderBy(col("pagerank").desc, col("node"))
      .limit(k)
  }
}
