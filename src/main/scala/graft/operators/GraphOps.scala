package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph operators needed by dedup pipelines: near-dup PAIRS are
  * only half the job — survivors come from connected COMPONENTS of the
  * pair graph (a,b and b,c must collapse into one cluster even when
  * (a,c) was never emitted as a pair).
  */
object GraphOps {

  /** Connected components by min-label propagation WITH pointer jumping:
    * each iteration every node adopts the smallest label among itself
    * and its neighbors, then shortcuts to its label's label (path
    * halving). The unique fixpoint labels each component with its
    * minimum node id (deterministic regardless of execution order).
    *
    * Scale: two equi-joins + a hash agg per iteration, and the jumping
    * step makes the iteration count O(log diameter) — a million-node
    * chain converges in ~20 rounds where plain propagation would need a
    * million. Lineage is cut with an eager localCheckpoint per
    * iteration, the standard guard for iterative DataFrame algorithms.
    * The convergence flag is computed inside the same projection, so
    * detecting the fixpoint is a filter on checkpointed data, not an
    * extra join.
    *
    * Input: one row per undirected edge (a, b). Output: (node,
    * cluster_id) for every node that appears in an edge.
    */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 40): DataFrame = {
    val edges = pairs.select(col(a).as("s"), col(b).as("t"))
      .unionByName(pairs.select(col(b).as("s"), col(a).as("t")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("s").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("node").as("t"), col("lbl").as("tlbl")), Seq("t"))
        .groupBy(col("s").as("node"))
        .agg(min(col("tlbl")).as("nlbl"))
      val adopted = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // pointer jump: follow my label's label (path halving)
      val next = adopted
        .join(labels.select(col("node").as("lbl"), col("lbl").as("ll")), Seq("lbl"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("ll"), col("lbl"))).as("lbl"),
          (least(col("lbl"), coalesce(col("ll"), col("lbl"))) =!= col("old")).as("changed"))
        .localCheckpoint()
      converged = next.filter(col("changed")).isEmpty
      // plain projection over the ALREADY-checkpointed `next`: lineage
      // stays cut and re-checkpointing it would cost one more
      // materialization job per iteration
      labels = next.select(col("node"), col("lbl"))
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }
}
