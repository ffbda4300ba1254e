package graft

import graft.model.Event

class TypedApiSpec extends SparkSpec {

  test("typed Dataset views expose the tables with case-class encoders") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val evs = t.typed.events
    assert(evs.count() > 0)
    // compile-time column access through the case class
    val firstUser: Long = evs.head().user_id
    assert(firstUser >= 0)
    val docs = t.typed.documents
    assert(docs.filter(_.lang == "en").count() > 0)
    val emb = t.typed.embeddings
    assert(emb.head().embedding.length == 64)
  }

  test("typed events flow into the DataFrame operators") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val viaTyped = graft.operators.StarSchema.clean(t.typed.events.toDF())
    assert(viaTyped.count() == t.events.count())
    // a typed filter composes with untyped transforms
    val played = t.typed.events.filter((e: Event) => e.value > 50.0).toDF()
    assert(graft.operators.StarSchema.clean(played).count() ==
      played.count())
  }
}
