package graft

/** Event-time window / sessionization / JSON-props extension queries over
  * `events` (SURVEY.md §2.11 E5/E6). Populated in the extensions
  * milestone. */
object EventQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
