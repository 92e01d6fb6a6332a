package graft.queries

import graft.Q

object IngestQueries {
  val qs: Seq[Q] = Seq()
}
