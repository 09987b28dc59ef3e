package graft.llm

import graft.QueryDef

/** SURVEY §2 B.10 — the LLM-data-pipeline operator family, one registry
  * entry point for dedup, similarity search, and text analysis.
  */
object LlmOps {
  val defs: Seq[QueryDef] =
    Dedup.defs ++ Similarity.defs ++ TextOps.defs ++ Multimodal.defs ++ Sketches.defs
}
