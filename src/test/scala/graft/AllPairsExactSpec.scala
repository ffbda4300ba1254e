package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.TextOps

/** The exact all-pairs join's completeness and precision against
  * brute force — the property the prefix filter must never lose. */
class AllPairsExactSpec extends SparkSpec {

  private def brute(docs: DataFrame, threshold: Double): Seq[String] = {
    val ds = TextOps.shingles(docs)
      .select(col("doc_id"), col("s")).distinct()
    val sz = ds.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val inter = ds.as("a").join(ds.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_common"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("doc_b"))
      .where(col("n_common") /
        (col("na") + col("nb") - col("n_common")).cast("double")
        >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(_.toString).sorted.toSeq
  }

  private def exact(docs: DataFrame, threshold: Double): Seq[String] =
    TextOps.allPairsExact(docs, threshold)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(_.toString).sorted.toSeq

  test("the prefix-filtered join equals brute force on the testdata corpus at several thresholds") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    Seq(0.5, 0.7, 0.9).foreach { t =>
      assert(exact(docs, t) == brute(docs, t),
        s"completeness/precision must hold at t=$t")
    }
    assert(exact(docs, 0.7).nonEmpty,
      "the fixture corpus contains qualifying pairs")
  }

  test("boundary pairs survive: exactly-at-threshold kept, just-below dropped, and the fixed-k heuristic's documented miss class is covered") {
    // two 12-shingle docs sharing 9 (j = 9/15 = 0.6) and two sharing
    // 11 of 12/13 (j = 11/14 ~ 0.785): at t = 0.6 both qualify, at
    // t = 0.7 only the second — and the 0.6 boundary is EXACT
    val docs = docsDf(Seq(
      (1L, "a b c d e f g h i j k l m n", "en", "x"),
      (2L, "a b c d e f g h i j k zz yy xx", "en", "x"),
      (3L, "p q r s t u v w aa bb cc dd ee ff g", "en", "x"),
      (4L, "p q r s t u v w aa bb cc dd ee hh", "en", "x")))
    val at06 = exact(docs, 0.6)
    assert(at06.exists(_.startsWith("[1,2,")) &&
      at06.exists(_.startsWith("[3,4,")))
    assert(exact(docs, 0.6) == brute(docs, 0.6))
    val at07 = exact(docs, 0.7)
    assert(at07 == brute(docs, 0.7))

    // a high-Jaccard pair is found regardless of WHICH shingles
    // differ (the fixed-k route can miss when the k smallest hashes
    // disagree; the exact route cannot miss by construction)
    assert(exact(docs, 0.75).exists(_.startsWith("[3,4,")) ||
      brute(docs, 0.75).forall(!_.startsWith("[3,4,")))
  }

  test("containment finds the subset-duplicate symmetric Jaccard misses, and equals its brute force") {
    // doc 2 is doc 1 plus 3x the content: containment(1 in 2) = 1.0
    // while Jaccard sits near 1/4 — the quoted-inclusion class
    val inner = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = docsDf(Seq(
      (1L, inner, "en", "x"),
      (2L, inner + " one two three four five six seven eight nine " +
        "ten eleven twelve thirteen fourteen fifteen sixteen", "en", "x"),
      (3L, "unrelated words entirely different from both others yes",
        "en", "x")))
    val got = TextOps.containmentPairs(docs, 0.9)
      .select(col("doc_a"), col("doc_b")).collect().map(_.toString)
    assert(got.sameElements(Array("[1,2]")),
      s"only (contained=1, container=2) qualifies, got ${got.toSeq}")
    assert(exact(docs, 0.5).isEmpty,
      "symmetric Jaccard misses the inclusion at 0.5")

    // brute parity on the testdata corpus
    val corpus = Tables(spark, "/root/testdata/sf0.001").documents
    val ds = TextOps.shingles(corpus)
      .select(col("doc_id"), col("s")).distinct()
    val sz = ds.groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val brutePairs = ds.as("a").join(ds.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_common"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")),
        Seq("doc_a"))
      .where(col("n_common") / col("na").cast("double") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(_.toString).sorted.toSeq
    val fast = TextOps.containmentPairs(corpus, 0.9)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(_.toString).sorted.toSeq
    assert(fast == brutePairs)
  }

  test("the cross-corpus join equals brute force at several thresholds") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val left = docs.where(col("doc_id") % 5 === 0)
    val right = docs.where(col("doc_id") % 5 =!= 0)
    def bruteCross(t: Double): Seq[String] = {
      val da = TextOps.shingles(left).select(col("doc_id"), col("s"))
      val db = TextOps.shingles(right).select(col("doc_id"), col("s"))
      val sza = da.groupBy(col("doc_id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("na"))
      val szb = db.groupBy(col("doc_id"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("nb"))
      da.as("a").join(db.as("b"), col("a.s") === col("b.s"))
        .groupBy(col("a.doc_id").as("doc_a"),
          col("b.doc_id").as("doc_b"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_common"))
        .join(sza.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
        .join(szb.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
        .where(col("n_common") /
          (col("na") + col("nb") - col("n_common")).cast("double") >= t)
        .select(col("doc_a"), col("doc_b"), col("n_common"))
        .collect().map(_.toString).sorted.toSeq
    }
    Seq(0.5, 0.7).foreach { t =>
      val got = TextOps.allPairsJoin(left, right, t)
        .select(col("doc_a"), col("doc_b"), col("n_common"))
        .collect().map(_.toString).sorted.toSeq
      assert(got == bruteCross(t), s"cross completeness at t=$t")
    }
    assert(TextOps.allPairsJoin(left, right, 0.7).count() > 0)
  }

  test("dropContained keeps the container, keeps one survivor under mutual containment, and keeps the chain's maximal element") {
    val inner = "alpha beta gamma delta epsilon zeta eta theta"
    val mid = inner + " one two three four"
    val docs = docsDf(Seq(
      (1L, inner, "en", "x"),                       // contained in 2
      (2L, mid + " five six seven eight nine ten " +
        "eleven twelve thirteen", "en", "x"),       // the container
      (5L, "totally different content here words", "en", "x"),
      (7L, inner, "en", "x"),                       // mutual with 1
      (9L, mid, "en", "x")))                        // chain: 1⊆9⊆2
    val kept = TextOps.dropContained(docs, 0.9)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    // 1 drops (contained in 2/9; also mutual with 7 but 7 > 1 so the
    // mutual pair alone would keep 1 — the larger containers decide);
    // 7 drops (mutual with 1: same size, smaller id 1 wins; also
    // contained in 2/9); 9 drops (contained in 2); 2 and 5 survive
    assert(kept.sameElements(Array(2L, 5L)), s"got ${kept.toSeq}")
  }
}
