package graft.entry

import QueryHelpers._

/** Training-data pipeline queries (dedup / similarity / text / multimodal) —
  * filled in alongside graft.operators.{DedupOps, SimilarityOps, TextOps}. */
object DQueries {
  val queries: Map[String, Q] = Map()
  val oracle: Map[String, String] = Map()
}
