package graft.queries

import graft.Q

object VectorQueries {
  val qs: Seq[Q] = Seq()
}
