package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists the pipeline already produces
  * (the k-NN graph, the near-dup pair graph): ranking and structure
  * measures computed as bounded rounds of relational joins — the
  * Pregel-free formulation that needs nothing beyond equi-joins and
  * hash-aggregates, so it runs wherever the rest of the engine runs.
  */
object Graph {

  /** PageRank (Brin & Page, WWW 1998) in exact integer fixed point:
    * rank mass is scaled to `scale` (default 10¹²) and every step —
    * the per-edge share `pr div outdeg`, the damped update
    * `base + (85 · Σ shares) div 100` — is truncating BIGINT
    * arithmetic, so the final ranks are bit-exact across engines and
    * partitionings (the float formulation is neither: its sums
    * reorder). Dangling mass (nodes with no out-edges) and truncation
    * dust leak a little total mass per iteration; that is the
    * standard "lazy" variant and affects every node's denominator
    * equally — the RANKING, which is what centrality is for, is
    * unaffected.
    *
    * Dataflow per iteration: ranks equi-join the out-degree-annotated
    * edge list on `src` (one shuffle keyed by src), shares
    * hash-aggregate onto `dst` (one shuffle, map-side partials), and
    * a left join back onto the node set keeps isolated nodes at the
    * teleport floor. The edge list and node set are materialized once
    * (`localCheckpoint`); each iteration's output is nodes-sized and
    * checkpointed so the loop's lineage stays flat. `iterations` is a
    * small driver-bounded constant — per-round cost is independent of
    * the driver, and three rounds already separate hubs from leaves
    * on a k-NN graph (k fixed out-degree ⇒ convergence is fast).
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iterations: Int = 3,
               scale: Long = 1000000000000L,
               dampNumer: Long = 85L, dampDenom: Long = 100L,
               srcCol: String = "src", dstCol: String = "dst",
               nodeCol: String = "node"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampDenom > 0 && dampNumer >= 0 && dampNumer <= dampDenom,
      "damping must be a proper fraction")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outd = e.groupBy("src").agg(count(lit(1)).as("outd"))
    // the loop's constant input: out-degree-annotated edges
    val ew = e.join(outd, Seq("src")).localCheckpoint()
    val n = nodes.select(col(nodeCol).as("node")).distinct().localCheckpoint()
    val nN = n.count()
    require(nN > 0, "node set is empty")
    val base = scale * (dampDenom - dampNumer) / dampDenom / nN
    var r = n.withColumn("pr", lit(scale / nN))
    for (_ <- 1 to iterations) {
      val contrib = ew
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("pr div outd").as("share"))
        .groupBy("node").agg(sum(col("share")).as("c"))
      r = n.join(contrib, Seq("node"), "left")
        .withColumn("pr",
          expr(s"${base}L + ($dampNumer * coalesce(c, 0L)) div $dampDenom"))
        .select("node", "pr")
        .localCheckpoint()
    }
    r
  }

  /** Personalized PageRank / TrustRank (Gyöngyi, Garcia-Molina &
    * Pedersen, VLDB 2004; Haveliwala, WWW 2002): [[pageRank]] with the
    * teleport vector concentrated on a SEED set — the quality/trust
    * propagation a training-data pipeline runs when it holds a small
    * audited high-quality subset and wants "how reachable from trust"
    * scores for everything else (seed-expanded quality curation à la
    * educational-seed corpus filters). Same exact-integer fixed point:
    * the base (teleport) mass `scale·(1−d) div |S|` lands ONLY on
    * seeds, so a non-seed node's rank is pure propagated mass and the
    * whole trajectory stays bit-exact across engines. Seeds outside
    * the node set are ignored; an empty effective seed set fails
    * loudly (rank against nothing is a caller error, not a zero
    * table).
    *
    * Dataflow identical to [[pageRank]] (two shuffles per round,
    * nodes-sized state) plus a one-column seed flag carried on the
    * node frame.
    */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame,
                           seeds: DataFrame, iterations: Int = 3,
                           scale: Long = 1000000000000L,
                           dampNumer: Long = 85L, dampDenom: Long = 100L,
                           srcCol: String = "src", dstCol: String = "dst",
                           nodeCol: String = "node"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampDenom > 0 && dampNumer >= 0 && dampNumer <= dampDenom,
      "damping must be a proper fraction")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val outd = e.groupBy("src").agg(count(lit(1)).as("outd"))
    val ew = e.join(outd, Seq("src")).localCheckpoint()
    val sd = seeds.select(col(nodeCol).as("node")).distinct()
    val n = nodes.select(col(nodeCol).as("node")).distinct()
      .join(sd.withColumn("_s", lit(1L)), Seq("node"), "left")
      .na.fill(0L, Seq("_s"))
      .localCheckpoint()
    val nS = n.agg(coalesce(sum(col("_s")), lit(0L))).head().getLong(0)
    require(nS > 0, "seed set is empty or disjoint from the node set")
    val baseS = scale * (dampDenom - dampNumer) / dampDenom / nS
    var r = n.withColumn("pr", col("_s") * lit(scale / nS))
      .select("node", "pr")
    for (_ <- 1 to iterations) {
      val contrib = ew
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("pr div outd").as("share"))
        .groupBy("node").agg(sum(col("share")).as("c"))
      r = n.join(contrib, Seq("node"), "left")
        .withColumn("pr",
          expr(s"_s * ${baseS}L + ($dampNumer * coalesce(c, 0L)) div $dampDenom"))
        .select("node", "pr")
        .localCheckpoint()
    }
    r
  }

  /** Triangle census + global clustering coefficient — the standard
    * graph-cohesion summary (Watts & Strogatz 1998's transitivity;
    * the compact-forward a<b<c join enumeration of Latapy 2008):
    * count each triangle exactly once by orienting every undirected
    * edge low→high and joining edge (a,b) with (b,c) and (a,c).
    * Wedges (length-2 paths) come from the degree table as
    * Σ deg·(deg−1)/2; transitivity = 3·triangles·10⁶ div wedges,
    * exact. On a k-NN graph this is the neighborhood-coherence
    * number: high transitivity = tight local clusters (dedup/
    * community structure will be clean), low = hub-dominated mush.
    *
    * Dataflow: undirected-dedup (one distinct), a degree hash-agg,
    * and two equi-joins over the oriented edge list — the join fans
    * out per shared endpoint, which is exactly the compact-forward
    * bound O(Σ deg(v)²) and fine for bounded-degree graphs like k-NN
    * (degree ≤ 2k). One-row output.
    */
  def triangleCensus(edges: DataFrame,
                     srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint() // degree agg + three join legs
    val deg = und.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val w = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    val ec = und.agg(count(lit(1)).as("n_edges"))
    val tri = und
      .join(und.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(und.select(col("a").as("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    w.join(broadcast(ec)).join(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3 * n_triangles * 1000000 div nullif(n_wedges, 0)")
          .as("transitivity_ppm"))
  }

  /** Bounded k-core peeling (Seidman 1983's cores; the standard
    * iterative peel): repeatedly drop nodes whose degree among the
    * SURVIVORS falls below `k`. Each round is one degree hash-agg
    * over the surviving edge list + a semi-join filter; `rounds` is
    * driver-bounded, and after R rounds the surviving set is a
    * superset of the true k-core that equals it once peeling has
    * converged (on bounded-degree graphs like k-NN, cascades are
    * short — document the bound, don't iterate to fixpoint on a
    * cluster's dime). Emits every node with its survival flag and
    * final surviving-degree: the core/periphery split that separates
    * densely-embedded documents from hangers-on.
    */
  def kCore(edges: DataFrame, nodes: DataFrame, k: Int = 3,
            rounds: Int = 3,
            srcCol: String = "src", dstCol: String = "dst",
            nodeCol: String = "node"): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = dir
      .unionByName(dir.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // re-filtered every round
    val n = nodes.select(col(nodeCol).as("node")).distinct().localCheckpoint()
    var alive = n
    var lastDeg = n.withColumn("deg", lit(0L))
    for (_ <- 1 to rounds) {
      val e = und
        .join(alive.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("node").as("b")), Seq("b"), "left_semi")
      lastDeg = e.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("deg"))
      alive = lastDeg.filter(col("deg") >= k).select("node")
        .localCheckpoint()
    }
    n.join(lastDeg.filter(col("deg") >= k), Seq("node"), "left")
      .select(col("node"),
        col("deg").isNotNull.as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_deg"))
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan,
    * Albert & Kumara, Phys. Rev. E 2007): every node starts in its
    * own community (label = node id) and each round adopts the most
    * frequent label among its neighbors — ties break to the LOWEST
    * label, and all nodes update from the same previous-round
    * snapshot, which together make the result deterministic (the
    * paper's asynchronous random-order variant is not; determinism is
    * what lets an iterative community structure sit under a hash
    * gate). Edges are treated as undirected (the union with the
    * reversed list, deduplicated) so a k-NN edge pulls both ends
    * together regardless of which side ranked the other.
    *
    * Dataflow per round: the undirected edge list (built and
    * checkpointed once) equi-joins the previous labels on the
    * neighbor end, label votes hash-aggregate per (node, label) with
    * map-side partials, and the per-node argmax is `min_by` over
    * (-count, label) structs — an aggregate, never a per-node sort
    * window. Isolated nodes keep their own label via the left join.
    * `iterations` is driver-bounded; on a k-NN graph 2–3 rounds
    * already merge tight neighborhoods while distant clusters keep
    * distinct labels (full convergence can swallow everything — a
    * known LPA failure mode; a bounded round count is the standard
    * guard).
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       iterations: Int = 2,
                       srcCol: String = "src", dstCol: String = "dst",
                       nodeCol: String = "node"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = dir
      .unionByName(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    val n = nodes.select(col(nodeCol).as("node")).distinct().localCheckpoint()
    var lab = n.withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      val votes = und
        .join(lab.select(col("node").as("b"), col("label")), Seq("b"))
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val best = votes.groupBy("node")
        .agg(min_by(col("label"),
          struct((-col("c")).as("nc"), col("label"))).as("winner"))
      lab = n.join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("winner"), col("node")).as("label"))
        .localCheckpoint()
    }
    lab
  }
}
