package graft.tools
import org.apache.spark.sql.functions.col
object BmCompactProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create("32")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, "/root/testdata/sf0.1").documents
    (1 to 3).foreach { i =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_bmprobe").resolve("idx").toString
      graft.operators.TextOps.bm25IndexWrite(
        docs.where(col("doc_id") % 2 === 0), root)
      graft.operators.TextOps.bm25IndexAppend(
        docs.where(col("doc_id") % 2 =!= 0), root)
      graft.operators.EmbeddingOps.indexDelete(spark, root,
        docs.where(col("doc_id") % 7 === 0).select(col("doc_id")),
        keyCol = "doc_id")
      val t0 = System.nanoTime()
      graft.operators.TextOps.bm25IndexCompact(spark, root)
      println(f"PROBE compact$i ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
