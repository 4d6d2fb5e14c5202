package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph operators needed by dedup pipelines: near-dup PAIRS are
  * only half the job — survivors come from connected COMPONENTS of the
  * pair graph (a,b and b,c must collapse into one cluster even when
  * (a,c) was never emitted as a pair).
  */
object GraphOps {

  /** Connected components by iterative min-label propagation: every node
    * repeatedly adopts the smallest label among itself and its
    * neighbors; the unique fixpoint labels each component with its
    * minimum node id (deterministic regardless of execution order).
    *
    * Scale: each iteration is one equi-join + hash agg; iterations =
    * graph diameter (near-dup clusters are tiny — single digits).
    * Lineage is cut with an eager localCheckpoint per iteration, the
    * standard guard for iterative DataFrame algorithms. (Billion-edge
    * general graphs would want the alternating large-star/small-star
    * algorithm; dedup graphs do not.)
    *
    * Input: one row per undirected edge (a, b). Output: (node,
    * cluster_id) for every node that appears in an edge.
    */
  def connectedComponents(pairs: DataFrame, a: String, b: String,
                          maxIter: Int = 20): DataFrame = {
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
      val next = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("lbl", "old"), Seq("node"))
        .filter(col("lbl") =!= col("old"))
        .isEmpty
      labels = next
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter iterations")
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }
}
