package graft.llm

import graft.Q

/** LLM-training-data pipeline operators (dedup, similarity, text
  * analysis, multimodal) — populated in later milestones.
  */
object LlmQueries {
  def queries: Seq[Q] = Seq.empty
}
