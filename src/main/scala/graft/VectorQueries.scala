package graft

/** Similarity-search extension queries over `embeddings` (SURVEY.md
  * §2.11 E3). Populated in the extensions milestone. */
object VectorQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
