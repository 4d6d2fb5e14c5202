package graft

/** Text-analysis + dedup extension queries over `documents` (SURVEY.md
  * §2.11 E1/E2/E4). Populated in the extensions milestone. */
object TextQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
