package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small graph toolkit for the dedup pipeline: near-duplicate PAIRS
  * (from [[Dedup]]/[[Ann]]) are only half the job — to keep one
  * representative per duplicate GROUP you need the transitive closure,
  * i.e. connected components over the pair graph. The reference
  * deduplicates by exact content only (INSERT OR IGNORE,
  * server.js:198), so this is beyond-reference capability every
  * training-data pipeline needs.
  */
object Graph {

  /** Connected components by iterative min-label propagation: every
    * node starts labeled with itself; each round a node adopts the
    * minimum label among itself and its neighbors; at fixpoint the
    * label IS the component id (the smallest node id in the component).
    *
    * Convergence takes O(component diameter) rounds — near-dup
    * clusters are shallow (stars/cliques around a popular document),
    * so the loop is short in practice; `maxIter` bounds adversarial
    * chains and the result is still a valid partition refinement if
    * truncated (only over-segmented, never wrongly merged). Each round
    * is one equi-join + one min-aggregate, both shuffled on node id —
    * the alternating-star optimization (Kiveris et al., "Connected
    * Components in MapReduce") drops in here if diameters ever matter.
    *
    * Iterative-by-nature: runs Spark actions per round (an eager
    * localCheckpoint + the convergence count), like MLlib's iterative
    * fitters. The returned frame is locally checkpointed; its blocks
    * are released by Spark's context cleaner once unreferenced.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    // materialize the caller's edge frame once: the undirected union
    // reads it twice, and near-dup pair inputs (t16) are expensive —
    // without this the pair join would run once per branch
    val edgesP = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist()
    edgesP.count()
    val und = edgesP.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(edgesP.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist()
    // eager for the same reason: both init branches and every loop
    // round scan it
    und.count()
    edgesP.unpersist()
    // localCheckpoint (eager), NOT persist: each round's plan references
    // the previous round's labels twice (join + union), so lineage
    // doubles per round — persist truncates recompute but not the
    // logical plan, and 15 rounds of doubling OOMs the planner.
    // Checkpointing cuts the lineage at every round.
    //
    // Init fuses round one: with identity labels the first neighbor
    // join would just deliver each node's neighbor ids, so start from
    // min(self, neighbors) directly — one aggregate instead of a full
    // join round (size-≤3 components, the common near-dup shape,
    // then converge in a single checking round).
    var labels = und.select(col("src").as("node"), col("dst").as("label"))
      .unionByName(und.select(col("src").as("node"),
        col("src").as("label")))
      .groupBy("node")
      .agg(min("label").as("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborLabels = und
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .select(col("src").as("node"), col("label"))
      val updated = labels.unionByName(neighborLabels)
        .groupBy("node")
        .agg(min("label").as("label"))
        .localCheckpoint()
      changed = updated
        .join(labels.select(col("node"), col("label").as("old")), "node")
        .filter(col("label") < col("old"))
        .count()
      labels = updated
      iter += 1
    }
    und.unpersist()
    labels
  }

  /** PageRank (Page et al. 1999) over an UNDIRECTED edge list — the
    * hub score of the dedup toolkit: on a near-dup pair graph the
    * high-rank nodes are the template/boilerplate documents that many
    * others partially copy, exactly what a curation run wants a human
    * to look at (components say WHICH docs cluster; rank says which
    * doc anchors the cluster).
    *
    * Fixed `iters` power iterations, deterministic by construction —
    * a convergence test would make row content depend on fp tolerance;
    * bounded iteration keeps the result oracle-checkable and the work
    * predictable (each round: one equi-join shuffled on node id + one
    * sum-aggregate, both combining map-side). The symmetric edge list
    * has no dangling nodes, so the total-mass invariant Σrank = 1
    * holds without a redistribution term. Lineage is localCheckpointed
    * per round ([[connectedComponents]]'s rationale). Returns
    * (node, deg, rank); isolated documents (no near-dup pair) are not
    * graph nodes.
    */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    val und = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(
        edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
    // src → (dst, deg): the join payload every round re-reads
    val outE = und
      .join(und.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist()
    val n = outE.select("src").distinct().count()
    val teleport = (1.0 - damping) / n
    var ranks = outE.select("src", "deg").distinct()
      .select(col("src").as("node"), col("deg"),
        lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = outE
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
      ranks = contribs.groupBy("dst")
        .agg((lit(teleport) + lit(damping) * sum(col("c")))
          .as("rank"))
        .join(outE.select("src", "deg").distinct()
          .select(col("src").as("dst"), col("deg")), "dst")
        .select(col("dst").as("node"), col("deg"), col("rank"))
        .localCheckpoint()
    }
    outE.unpersist()
    ranks
  }

  /** Triangle count + global clustering coefficient over an
    * undirected edge list, with DEGREE-ORDERED edge orientation
    * (Suri & Vassilvitskii 2011; Schank & Wagner 2005 — public): each
    * edge orients from its lower-(degree, id) endpoint to the higher,
    * so every wedge is generated at its lowest-ranked vertex and the
    * wedge join's fan-out is Σ d_out² with d_out = O(√m) — the bound
    * that keeps the join finite on power-law graphs, where the naive
    * formulation explodes at hub nodes (a boilerplate template with a
    * million near-dups contributes its wedges at the SPOKES, not the
    * hub). Each triangle is counted exactly once at its
    * minimum-ranked vertex. Emits one row: nodes, edges, wedges
    * (Σ C(deg,2) over undirected degrees), triangles, and the global
    * clustering coefficient 3·triangles/wedges — the graph-shape
    * diagnostic that distinguishes clique-ish near-dup neighborhoods
    * (templates) from chain-ish ones (revisions).
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val und = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
    val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("u"), col("deg").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), "v")
      .filter(struct(col("du"), col("u")) < struct(col("dv"), col("v")))
      .select("u", "v")
      .persist()
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    val canon = und.filter(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    val tri = wedges.join(canon, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val edgeStats = canon.agg(count(lit(1)).as("n_edges"))
    nodeStats.crossJoin(edgeStats).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("clustering_coeff"))
  }
}
