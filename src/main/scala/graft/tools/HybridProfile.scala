package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiling main for the sim_hybrid_rrf breakdown (round-15
  * ADVICE item): times each stage of the hybrid serve separately at
  * the bench scale. Not part of the library surface. */
object HybridProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{EmbeddingOps, Hybrid, TextOps}
    val docs = graft.Tables(spark, d).documents.toDF()
    val emb = graft.Tables(spark, d).embeddings.toDF()
    val bmIdx = java.nio.file.Files
      .createTempDirectory("graft_prof_bm").resolve("ix").toString
    val pqIdx = java.nio.file.Files
      .createTempDirectory("graft_prof_pq").resolve("ix").toString
    TextOps.bm25IndexWrite(docs, bmIdx)
    EmbeddingOps.ivfpqIndexWrite(emb, pqIdx)
    def queries() = docs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        explode(slice(split(col("text"), " "), 1, 8)).as("word"))
      .distinct()
    def vq() = emb.where(col("vec_id") < 5)
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        val e = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); e
      }
      println(f"PROFILE $tag%-28s median=${runs.sorted.apply(1)}%.3f " +
        s"runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }
    // warm-up
    Hybrid.hybridTopKIndexed(spark, bmIdx, pqIdx, queries(), vq())
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    time("query_batch_build") {
      queries().write.format("noop").mode("overwrite").save()
    }
    time("lex_arm_batch") {
      TextOps.bm25TopKIndexedBatch(spark, bmIdx, queries())
        .write.format("noop").mode("overwrite").save()
    }
    time("dense_arm_ivfpq") {
      EmbeddingOps.ivfpqTopKIndexed(spark, pqIdx, vq(), 2, 10)
        .write.format("noop").mode("overwrite").save()
    }
    time("fuse_tail_precomputed") {
      val lex = TextOps.bm25TopKIndexedBatch(spark, bmIdx, queries())
        .select(col("query_id"), col("doc_id").as("cand_id"), col("rk"))
        .localCheckpoint()
      val den = EmbeddingOps.ivfpqTopKIndexed(spark, pqIdx, vq(), 2, 10)
        .select(col("query_id"), col("vec_id").as("cand_id"), col("rk"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      Hybrid.rrfFuse(lex, den).write.format("noop").mode("overwrite").save()
      println(f"PROFILE fuse_only_inner            ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    time("hybrid_full") {
      Hybrid.hybridTopKIndexed(spark, bmIdx, pqIdx, queries(), vq())
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
