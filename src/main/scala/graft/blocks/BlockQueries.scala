package graft.blocks

import graft.Q

/** Block-document (reference-shaped) ingest/flatten queries — populated
  * in later milestones.
  */
object BlockQueries {
  def queries: Seq[Q] = Seq.empty
}
