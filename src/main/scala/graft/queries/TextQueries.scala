package graft.queries

import graft.Q

object TextQueries {
  val qs: Seq[Q] = Seq()
}
