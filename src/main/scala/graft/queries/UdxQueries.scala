package graft.queries

import graft.Q

object UdxQueries {
  val qs: Seq[Q] = Seq()
}
