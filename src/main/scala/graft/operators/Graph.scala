package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain `(src, dst[, weight])` edge lists —
  * the entity-importance / label-spreading layer a crawl-curation pipeline
  * runs over its link or co-occurrence graphs (site authority as a quality
  * prior, propagating sparse human labels to unlabeled hosts). The reference
  * has no graph capability at all (CQL cannot join, let alone iterate); this
  * extends the engine the same way the dedup layer's connected components do
  * ([[Dedup.resolveClustersStar]]), and reuses its iteration discipline:
  * fixed round count, every round `localCheckpoint`ed so the plan stays
  * shallow and no subtree ever evaluates twice.
  *
  * 100 TB shape, both operators: the EDGE LIST is the big table and it is
  * never mutated — only the per-node state (rank / label, 16 bytes a row)
  * moves between rounds. Each round is one equi-join of edges against the
  * node-state table on `src` plus ONE map-side-combined shuffle of `(dst,
  * partial)` — the canonical distributed power-iteration dataflow. A
  * deployment pre-partitions edges by `src` (`Lake.writeBucketed`) so the
  * per-round join never re-exchanges the edges; the node-state exchange is
  * `O(|V|)`, not `O(|E|)`. Tested behavior, not just a claim: PlanSpec's
  * "bucketed edges" gate runs pageRank over the same edge data plain and
  * bucketed and pins ≥ 1 exchange saved per round (measured 38 → 23 at
  * iters = 2 when pinned). */
object Graph {

  /** PageRank by `iters` power iterations from the uniform vector.
    * Returns `(node, rank)` for every node appearing as an endpoint.
    *
    * Semantics (deterministic, engine-reproducible):
    *   - rank₀(v) = 1/N;
    *   - rankₜ₊₁(v) = (1−d)/N + d·(Σ_{u→v} rankₜ(u)·w(u,v)/outw(u) + Dₜ/N)
    *     where outw(u) = Σ_w over u's out-edges and Dₜ = Σ rankₜ(u) over
    *     DANGLING nodes (no out-edges) — dangling mass redistributes
    *     uniformly, so Σ rank = 1 is invariant at every round (PropertySpec);
    *   - `weightCol` empty → every edge weight 1.
    *
    * Fixed-`iters` power iteration (not run-to-convergence) keeps the result
    * a pure function of the input — hash-oracled in DuckDB by unrolling the
    * same rounds as chained CTEs ([[graft.SparkEntry]] `q_pagerank`). Rounds
    * are cheap to add: convergence to 1e-6 on the bipartite entry graph takes
    * ~30; the entry pins 5 for oracle size. */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
               weightCol: String = "", checkpoint: Boolean = true): DataFrame = {
    var toFree: List[DataFrame] = Nil
    def ckpt(df: DataFrame): DataFrame =
      if (!checkpoint) df // plan inspection only — an unevaluated round tree
      else { val c = df.localCheckpoint(); toFree ::= c; c }
    // Setup frames that per-round joins/aggregations key on are materialized
    // with their PARTITIONING RECORDED (r16): under AQE, `localCheckpoint`
    // captures `UnknownPartitioning` (the AdaptiveSparkPlanExec wrapper hides
    // the final plan's partitioning), so every round re-exchanged the edge
    // table; planning just these setup checkpoints statically records
    // hashpartitioning(src|node, np) in the LogicalRDD and EnsureRequirements
    // then elides the per-round edge/node-side exchanges outright — the local
    // realization of the "deployment pre-partitions edges by src" story in
    // the object doc. Rounds themselves keep AQE (its runtime broadcast of
    // the O(|V|) rank table is exactly right there).
    def ckptStatic(df: DataFrame): DataFrame =
      if (!checkpoint) df
      else {
        val sess = df.sparkSession
        val prev = sess.conf.get("spark.sql.adaptive.enabled")
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        try ckpt(df)
        finally sess.conf.set("spark.sql.adaptive.enabled", prev)
      }
    val np = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e0 = ckpt(
      (if (weightCol.isEmpty) edges.select(col("src"), col("dst"), lit(1.0).as("w"))
       else edges.select(col("src"), col("dst"), col(weightCol).cast("double").as("w")))
        .filter(col("src").isNotNull && col("dst").isNotNull))
    val nodes = ckptStatic(e0.select(col("src").as("node"))
      .unionAll(e0.select(col("dst").as("node"))).distinct())
    // one scalar to the driver (graph order), not data
    val n = nodes.count().toDouble
    // out-weight is LOOP-INVARIANT: attach it to the edges ONCE, so each
    // round's contribution pass is a single (edges ⋈ ranks) join instead of
    // re-joining the out-weight table every round (r16: one join and its
    // build dropped from every round; the summed expression is unchanged —
    // still sum(rank * w / outw) grouped by dst)
    val outw = ckptStatic(e0.groupBy(col("src")).agg(sum(col("w")).as("outw")))
    val e = ckptStatic(e0.repartition(np, col("src")).join(outw, Seq("src")))
    // dangling set (nodes with no out-edges) is invariant across rounds —
    // computed once (against the |V|-row out-weight keys, not the edge
    // table), so each round's mass term is one semi-join + one single-row
    // aggregate instead of a per-round distinct + anti-join
    val dangNodes = ckpt(nodes.join(
      outw.select(col("src").as("node")), Seq("node"), "left_anti"))
    // a graph with NO dangling nodes (e.g. any symmetrized edge list) has a
    // dangling term that is identically 0.0 every round — skip the per-round
    // single-row-aggregate job outright (r16; bit-identical: d·(c + 0/n) =
    // d·c). Only probed when checkpointing: an un-checkpointed tree is for
    // plan inspection and must not execute jobs, so it keeps the general
    // dangling-broadcast shape.
    val hasDangling = !checkpoint || !dangNodes.isEmpty
    var ranks = ckpt(nodes.select(col("node"), lit(1.0 / n).as("rank")))
    var round = 0
    while (round < iters) {
      // Σ over in-neighbors: edges join the 2-column rank table (never the
      // reverse), partial-aggregated on dst before the exchange
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("w") / col("outw")).as("contrib"))
      val base = nodes.join(contribs, Seq("node"), "left")
      ranks = ckpt(
        if (hasDangling) {
          // dangling mass: single-row aggregate, broadcast into the update
          val dang = ranks.join(dangNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dang"))
          base.crossJoin(broadcast(dang))
            .select(col("node"),
              (lit((1.0 - damping) / n) + lit(damping) *
                (coalesce(col("contrib"), lit(0.0)) + col("dang") / n)).as("rank"))
        } else base.select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            coalesce(col("contrib"), lit(0.0))).as("rank")))
      round += 1
    }
    toFree.drop(1).foreach(df => try df.unpersist() catch { case _: Throwable => () })
    ranks
  }

  /** Per-node triangle counts over an undirected edge list — the clustering-
    * coefficient numerator, the graph-quality signal (link farms score high,
    * organic link graphs low) a crawl pipeline reads next to PageRank.
    * Returns `(node, n_triangles)` for nodes in ≥1 triangle.
    *
    * Degree-ordered orientation (Schank & Wagner 2005): every edge points
    * from its lower-(degree, node) endpoint, making the graph acyclic and
    * every triangle counted exactly ONCE (its three edges orient x→y→z,
    * x→z); out-degrees are bounded by O(√m), so the wedge join — the only
    * quadratic-risk step — generates Σ outdeg² = O(m^1.5) candidates
    * worst-case instead of Σ deg² (a hot hub's star explodes un-oriented).
    * Dataflow: dedup + degree agg + two equi-joins on 8-byte endpoints; no
    * adjacency list ever materializes per node. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val lower = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val o = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(when(lower, col("a")).otherwise(col("b")).as("u"),
        when(lower, col("b")).otherwise(col("a")).as("v"))
    val wedges = o.as("e1").join(o.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tris = wedges.join(o.as("e3"),
      col("x") === col("e3.u") && col("z") === col("e3.v"))
      .select("x", "y", "z")
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Seeded (semi-supervised) label propagation: spread sparse integer labels
    * across the graph for `iters` synchronous rounds. Returns `(node, label)`
    * for every node that acquired a label.
    *
    * Per round each UNSEEDED node takes the most frequent label among its
    * in-neighbors' current labels (ties → smallest label); seed labels are
    * clamped and never change. Unlabeled nodes cast no vote and stay absent
    * until a labeled in-neighbor appears. The per-node argmax is ONE
    * skew-immune hash aggregation ([[graft.functions.ArgMaxAgg]] on
    * `struct(cnt, -label)` — map-side partial, no per-node window sort), the
    * same shape as [[Ops.latestPerKeyAgg]]. Deterministic: integer votes,
    * total tie-break. */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
                     checkpoint: Boolean = true): DataFrame = {
    var toFree: List[DataFrame] = Nil
    def ckpt(df: DataFrame): DataFrame =
      if (!checkpoint) df // plan inspection only — an unevaluated round tree
      else { val c = df.localCheckpoint(); toFree ::= c; c }
    // edges materialize PARTITIONED BY src with the partitioning recorded
    // (static plan — see pageRank's ckptStatic note; the AQE toggle wraps the
    // eager localCheckpoint itself, which is when planning happens): every
    // round's edges ⋈ labels join then streams the edge table, no exchange
    val eBase = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val e =
      if (!checkpoint) eBase
      else {
        val sess = edges.sparkSession
        val np = sess.sessionState.conf.numShufflePartitions
        val prev = sess.conf.get("spark.sql.adaptive.enabled")
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        try ckpt(eBase.repartition(np, col("src")))
        finally sess.conf.set("spark.sql.adaptive.enabled", prev)
      }
    val s = ckpt(seeds.select(col("node"), col("label").cast("long").as("label")))
    var labels = s
    var round = 0
    while (round < iters) {
      val voted = e
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(graft.functions.ArgMaxAgg.argMax(
          struct(col("cnt"), -col("label")), col("label")).as("label"))
      labels = ckpt(s.unionByName(voted.join(s, Seq("node"), "left_anti")))
      round += 1
    }
    toFree.filter(_ ne labels).foreach(df => try df.unpersist() catch { case _: Throwable => () })
    labels
  }
}
