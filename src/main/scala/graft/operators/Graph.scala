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
}
