package graft

/** Training-data-pipeline queries (dedup, similarity, text analysis,
  * multimodal) over `documents` / `embeddings`, each with a DuckDB
  * oracle that mirrors the exact deterministic arithmetic (md5
  * hashing, integer dot products / set sizes, single final IEEE
  * division — see [[graft.operators.TextOps]] and
  * [[graft.operators.EmbeddingOps]]). The registry is split into
  * per-family files that concatenate here, so the name arithmetic
  * (registry vs correctness artifact) stays auditable per family:
  * [[SuiteMLDedup]], [[SuiteMLSim]], [[SuiteMLText]], [[SuiteMLMm]],
  * with shared fixtures and oracle CTEs in [[SuiteMLShared]].
  */
object SuiteML {
  val all: Seq[Q] = SuiteMLDedup.rows ++ SuiteMLSim.rows ++
    SuiteMLText.rows ++ SuiteMLMm.rows
}
