package graft.queries

import graft.Q

/** Text-analysis queries (chunking, tokens, lang-id, quality,
  * fingerprinting) — filled in the text-analysis build phase. */
object TextQueries {
  def all: Seq[Q] = Seq()
}
