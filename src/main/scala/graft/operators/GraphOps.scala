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
    * with `iters` (capped at 20 here); a long-running production loop
    * would `localCheckpoint` every few rounds to keep plans bounded —
    * at 3-5 iterations (a frontier refresh) the straight-line plan is
    * the faster choice. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"iters out of range (1..20, fixed-iteration form): $iters")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1): $damping")
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
    var i = 0
    while (i < iters) {
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
    }
    ranks.select(col("node"),
      (round(col("pr"), 6) + lit(0.0d)).as("pagerank"))
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
