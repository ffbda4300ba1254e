package graft

import org.apache.spark.sql.functions._

/** Throwaway per-stage timing for the curation chain (dev tool, not
  * part of the driver contract). */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("32")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables(spark, sfDir).documents
    val fx = docs.select(col("doc_id"), col("source"), col("lang"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), col("lang"),
        concat(
          lit("<html><head><title>doc</title><style>body { margin: 0; }</style>" +
            "</head><body><nav>home about</nav><script>var a = 1 < 2;</script>"),
          expr("concat_ws('', transform(" +
            "sequence(0, CAST(ceil(size(w) / 10.0) AS INT) - 1), " +
            "i -> concat('<p>', concat_ws(' ', slice(w, i * 10 + 1, 10)), " +
            "' &amp; more</p>')))"),
          lit("<ul><li>ad</li><li>buy now</li></ul><div>tiny</div></body></html>"))
          .as("html"))
      .localCheckpoint()
    // warm-up
    graft.operators.TextOps.curate(fx, 8, 3950L, 100000L, 512L, 200L)
      .write.format("noop").mode("overwrite").save()
    var last = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"STAGE $tag%-14s ${(now - last) / 1e9}%.3f s")
      last = now
    }
    val stages = graft.operators.TextOps.curateChain(fx, 8, 3950L,
      100000L, pin = { df =>
        val p = df.localCheckpoint()
        p
      })
    stages.foreach { case (n, _) => () }
    lap("chain-pins")
    // per-stage: rebuild with instrumented pin
    var i = 0
    val names = Seq("extract", "dedup_exact", "langid", "quality",
      "span_excise", "lm_gate", "mix")
    last = System.nanoTime()
    graft.operators.TextOps.curateChain(fx, 8, 3950L, 100000L,
      pin = { df =>
        val p = df.localCheckpoint()
        lap(if (i < names.length) names(i) else s"stage$i")
        i += 1
        p
      })
    val d7 = graft.operators.TextOps.curate(fx, 8, 3950L, 100000L, 512L, 200L)
    last = System.nanoTime()
    d7.write.format("noop").mode("overwrite").save()
    lap("full-rerun")
    spark.stop()
  }
}
