package graft.queries

import graft.Q

/** Similarity / dedup-at-scale queries (MinHash-LSH, SimHash, Jaccard,
  * kNN, cosine near-dup) — filled in the similarity build phase. */
object SimilarityQueries {
  def all: Seq[Q] = Seq()
}
