package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over plain (src, dst) edge frames.
  *
  * The training-data angle: link-derived authority scores are standard
  * web-corpus quality signals (Common Crawl curation ranks hosts by
  * centrality before sampling), and the iterate-join-aggregate shape here
  * is the template every such measure (PageRank, degree centrality, label
  * propagation — see [[Dedup.connectedComponents]]) runs on at 100 TB:
  * per iteration one shuffle of the edge frame joined against the |V|-row
  * rank frame, one map-side-combined aggregation back to |V| rows, and a
  * `localCheckpoint` so plan depth stays constant across rounds.
  */
object Graph {

  /** Fixed-iteration PageRank in exact integer micro-units.
    *
    * Floating PageRank cannot sit behind a hash-comparing oracle (the
    * reduction order of Σ contrib perturbs low bits); this one is
    * integer end to end, so any engine replays it bit-exactly:
    *
    *   rank_0(v)   = 1_000_000                    (per-node 1.0, micro)
    *   contrib(e)  = rank(src) div outdeg(src)    (floor div)
    *   rank_i+1(v) = (1000 − d)·1000
    *               + (d · Σ_{e into v} contrib(e)) div 1000
    *
    * with d = `dampingMilli` (850 = the classic 0.85). The floor
    * divisions lose ≤ outdeg(v) + 1 micro per node per round — bounded,
    * deterministic, identical in any replay. Mass from dangling nodes
    * (no out-edges) is dropped, the standard simplification; nodes with
    * no in-edges settle at the teleport floor (1000 − d)·1000.
    *
    * Scale shape: each iteration is one join of the edge frame with the
    * |V|-row rank frame (shuffle keyed on src — co-partitioned with
    * `outdeg` from the same key, so AQE reuses the exchange), one
    * aggregation to |V| rows, and a left join back onto the node set.
    * Edges/nodes/degrees are checkpointed once and reused every round;
    * the per-round rank frame is checkpointed so lineage never grows.
    * Nothing is ever collected to the driver.
    */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               dampingMilli: Int = 850): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    require(dampingMilli >= 0 && dampingMilli <= 1000,
      s"dampingMilli in [0,1000], got $dampingMilli")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val teleport = (1000L - dampingMilli) * 1000L
    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iterations) {
      val inbound = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("s"))
      rank = nodes.join(inbound, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingMilli * coalesce(s, CAST(0 AS BIGINT))) div 1000"))
            .cast("long").as("rank"))
        .localCheckpoint(false)
    }
    rank
  }

  /** Per-node triangle participation counts over an undirected edge
    * frame — the clustering-coefficient numerator (community-density
    * quality signal for link-graph curation, and the classic test of a
    * multi-way distributed self-join).
    *
    * Algorithm: degree orientation. Edges are canonicalized
    * (least, greatest, distinct), each node's degree computed, and every
    * edge oriented from its (deg, node)-smaller endpoint to its larger
    * one — a total order, so each triangle {u, v, w} is discovered
    * EXACTLY once as a wedge u→v, u→w (key(v) < key(w)) closed by the
    * oriented edge v→w. Orientation is what makes this scale: a node's
    * out-degree is O(√m) regardless of its raw degree (a celebrity node
    * with 10^6 followers contributes wedges only through its few
    * higher-key neighbors), so the wedge join is bounded Σ outdeg² ≤
    * m^1.5 instead of Σ deg² (quadratic in the hottest node). Every step
    * is an equi-join shuffle on a key — wedges on the pivot u, closure
    * on (v, w) — never a cross product; counts are integer-exact, so an
    * oracle replays the same orientation bit-for-bit.
    *
    * Returns (node, n_tri) for nodes in ≥ 1 triangle. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(false)
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by key(x) = (deg(x), x): u -> v iff key(u) < key(v); the
    // edge carries key(v) so the wedge can order out-neighbors by key
    val keyed = canon
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = keyed.select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(false)
    // wedges u→x, u→y with key(x) < key(y): an equi self-join on the
    // pivot u (the key inequality is a post-join filter, not a join
    // condition — the plan stays a hash/sort-merge join on u)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("u"), col("e1.v").as("x"), col("e2.v").as("y"))
    // closure: key(x) < key(y) means the third edge, if present, is
    // oriented exactly x→y — ONE equi join on (x, y), no disjunction
    val tri = wedges.join(
        oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
      .select(col("u"), col("x"), col("y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** Fixed-iteration synchronous label propagation (Raghavan et al. 2007,
    * the standard community detector for link-graph curation) made fully
    * deterministic: label_0(v) = v, and each round every node takes the
    * MOST FREQUENT label among its neighbors, ties broken by the LOWEST
    * label — so any engine replays the same labels bit-for-bit (the
    * classic formulation's random tie-break cannot sit behind a hash
    * oracle). Isolated nodes and nodes whose neighbors vanish keep their
    * previous label. Fixed rounds rather than convergence: synchronous
    * LPA can 2-cycle on bipartite structure, so a fixed-round result is
    * the only replayable contract.
    *
    * Scale shape: per round ONE shuffle join of the undirected edge frame
    * against the |V|-row label frame plus two map-side-combined
    * aggregations — the neighbor-label count, then a max(struct(count,
    * −label)) argmax that avoids any window over the node set. Edges are
    * checkpointed once; the per-round label frame is checkpointed so plan
    * depth stays constant. Nothing is collected. */
  def labelPropagation(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations in [1,50], got $iterations")
    val und = edges
      .select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"))
      .union(edges.select(col("dst").cast("long").as("a"),
        col("src").cast("long").as("b"))
        .where(col("a") =!= col("b")))
      .distinct()
      .localCheckpoint(false)
    val nodes = und.select(col("a").as("node")).distinct().localCheckpoint(false)
    var lbl = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      val pick = und
        .join(lbl.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("new_label"))
      lbl = lbl.join(pick, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(false)
    }
    lbl
  }
}
