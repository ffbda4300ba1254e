package graft

import org.apache.spark.sql.functions.{col, count, lit, round, size}

import graft.operators.{EmbeddingOps, Multimodal, TextOps}

/** Training-data-pipeline queries (dedup, similarity, text analysis)
  * over `documents` / `embeddings`, each with a DuckDB oracle that
  * mirrors the exact deterministic arithmetic (md5 hashing, integer
  * dot products / set sizes, single final IEEE division — see
  * [[graft.operators.TextOps]] and [[graft.operators.EmbeddingOps]]).
  */
object SuiteML {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d).documents
  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d).embeddings

  /** Build-once cache for the persisted-index rows: sim_*_persisted
    * measure SERVING (the online half of the offline-build/online-serve
    * split), so the index is built once per (kind, dataset) into a
    * managed scratch dir — removed at JVM exit — instead of rebuilt
    * into a leaked temp dir on every invocation. */
  private val idxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedIndex(kind: String, d: String,
      build: String => Unit): String =
    idxCache.computeIfAbsent(s"$kind:$d", _ => {
      val dir =
        java.nio.file.Files.createTempDirectory(s"graft_${kind}_idx")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(dir.toFile)
      }))
      build(dir.toString)
      dir.toString
    })

  /** Synthetic-markup fixture for the HTML-extraction row, derived
    * deterministically from `documents` on BOTH sides: each 10-token
    * run wraps in `<p>.. &amp; more</p>` between title/style/nav/
    * script/list chrome — so extraction must strip script BEFORE tags
    * (the `1 < 2` script body), decode entities, and density-filter
    * the short chrome lines. The head/tail constants are spliced into
    * the oracle SQL so the two fixtures cannot drift (single-quote-free
    * by construction). */
  private val HtmlFixtureHead =
    "<html><head><title>doc</title><style>body { margin: 0; }</style>" +
      "</head><body><nav>home about</nav><script>var a = 1 < 2;</script>"
  private val HtmlFixtureTail =
    "<ul><li>ad</li><li>buy now</li></ul><div>tiny</div></body></html>"

  private def htmlFixture(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("source"), col("lang"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"), col("lang"),
        org.apache.spark.sql.functions.concat(
        lit(HtmlFixtureHead),
        org.apache.spark.sql.functions.expr(
          "concat_ws('', transform(" +
            "sequence(0, CAST(ceil(size(w) / 10.0) AS INT) - 1), " +
            "i -> concat('<p>', concat_ws(' ', slice(w, i * 10 + 1, 10)), " +
            "' &amp; more</p>')))"),
        lit(HtmlFixtureTail)).as("html"))

  /** Unigram-LM trainer parameters, shared between the Spark queries
    * and the generated oracle so they cannot drift. */
  private val UnigramV = 32
  private val UnigramRounds = 2



  /** The unigram-LM Viterbi-EM trainer as generated DuckDB CTEs —
    * the [[bpeCtes]] discipline applied to the harder loop: seed
    * substring counts -> per-round (edge join, unrolled min-cost DP
    * over word positions, canonical smallest-l backtrace, usage
    * counts, prune + re-cost). Every CTE is MATERIALIZED: the DP
    * chain references each frame from up to `maxPieceLen` successors,
    * and DuckDB's default inlining would expand the chain
    * exponentially. Leaves c0..cR (piece, c, cost) and, with
    * `finalSeg`, the extra segmentation block for encoding. */
  private def unigramCtes(rounds: Int, finalSeg: Boolean): String = {
    val L = TextOps.UnigramMaxPieceLen
    val cap = TextOps.UnigramMaxWordLen
    val parts = Seq.newBuilder[String]
    parts += s"""wf AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  GROUP BY 1),
      |wfs AS MATERIALIZED (SELECT * FROM wf WHERE len(word) <= $cap),
      |wfl AS MATERIALIZED (SELECT * FROM wf WHERE len(word) > $cap),
      |sub AS MATERIALIZED (SELECT piece, CAST(SUM(n) AS BIGINT) AS c FROM (
      |  SELECT substr(word, i - l + 1, l) AS piece, n FROM (
      |    SELECT word, n, i, unnest(generate_series(1, least($L, i))) AS l
      |    FROM (SELECT word, n, unnest(generate_series(1, CAST(len(word) AS INT))) AS i
      |          FROM wf))) GROUP BY 1),
      |sg AS MATERIALIZED (SELECT piece FROM sub WHERE len(piece) = 1),
      |v0 AS MATERIALIZED (SELECT piece, c FROM sub WHERE len(piece) = 1
      |       UNION ALL
      |       SELECT piece, c FROM (SELECT piece, c FROM sub WHERE len(piece) >= 2
      |                             ORDER BY c DESC, piece LIMIT $UnigramV)),
      |t0 AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM v0),
      |c0 AS MATERIALIZED (SELECT piece, c,
      |  CAST(length(bin(tot // c)) - 1 AS BIGINT) AS cost FROM v0, t0)"""
      .stripMargin
    val nSeg = rounds + (if (finalSeg) 1 else 0)
    for (r <- 1 to nSeg) {
      parts += s"""e$r AS MATERIALIZED (
        |  SELECT t.word, t.i, t.l, v.cost FROM (
        |    SELECT word, i, unnest(generate_series(1, least($L, i))) AS l
        |    FROM (SELECT word, unnest(generate_series(1, CAST(len(word) AS INT))) AS i FROM wfs)) t
        |  JOIN c${r - 1} v ON v.piece = substr(t.word, t.i - t.l + 1, t.l)),
        |d${r}_0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS cost FROM wfs)"""
        .stripMargin
      for (i <- 1 to cap) {
        val prevs = (math.max(0, i - L) until i)
          .map(j => s"SELECT word, $j AS i, cost FROM d${r}_$j")
          .mkString(" UNION ALL ")
        parts += s"""d${r}_$i AS MATERIALIZED (
          |  SELECT e.word, MIN(p.cost + e.cost) AS cost
          |  FROM e$r e JOIN ($prevs) p ON p.word = e.word AND p.i = $i - e.l
          |  WHERE e.i = $i GROUP BY 1)""".stripMargin
      }
      val dall = (0 to cap)
        .map(i => s"SELECT word, $i AS i, cost FROM d${r}_$i")
        .mkString(" UNION ALL ")
      parts += s"da$r AS MATERIALIZED ($dall)"
      parts += s"""ch$r AS MATERIALIZED (
        |  SELECT e.word, e.i, MIN(e.l) AS l FROM e$r e
        |  JOIN da$r p ON p.word = e.word AND p.i = e.i - e.l
        |  JOIN da$r q ON q.word = e.word AND q.i = e.i
        |  WHERE p.cost + e.cost = q.cost GROUP BY 1, 2),
        |b${r}_0 AS MATERIALIZED (SELECT word, CAST(len(word) AS INT) AS pos FROM wfs)"""
        .stripMargin
      for (k <- 1 to cap) {
        parts += s"""b${r}_$k AS MATERIALIZED (
          |  SELECT b.word, substr(b.word, b.pos - c.l + 1, c.l) AS piece, b.pos - c.l AS pos
          |  FROM b${r}_${k - 1} b JOIN ch$r c ON c.word = b.word AND c.i = b.pos
          |  WHERE b.pos > 0)""".stripMargin
      }
      val pall = (1 to cap)
        .map(k => s"SELECT word, piece FROM b${r}_$k")
        .mkString(" UNION ALL ")
      parts += s"pc$r AS MATERIALIZED ($pall)"
      if (r <= rounds)
        parts += s"""u$r AS MATERIALIZED (
          |  SELECT piece, CAST(SUM(n) AS BIGINT) AS u FROM (
          |    SELECT word, piece FROM pc$r
          |    UNION ALL
          |    SELECT word, unnest(string_split(word, '')) AS piece FROM wfl) x
          |  JOIN wf USING (word) GROUP BY 1),
          |v$r AS MATERIALIZED (SELECT sg.piece, CAST(COALESCE(u.u, 0) + 1 AS BIGINT) AS c
          |         FROM sg LEFT JOIN u$r u USING (piece)
          |         UNION ALL
          |         SELECT piece, CAST(u + 1 AS BIGINT) AS c FROM (
          |           SELECT piece, u FROM u$r WHERE len(piece) >= 2 AND u >= 1
          |           ORDER BY u DESC, piece LIMIT $UnigramV)),
          |t$r AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM v$r),
          |c$r AS MATERIALIZED (SELECT piece, c,
          |  CAST(length(bin(tot // c)) - 1 AS BIGINT) AS cost FROM v$r, t$r)"""
          .stripMargin
    }
    "WITH " + parts.result().mkString(",\n")
  }

  /** DuckDB rendering of [[graft.operators.TextOps]]' saltBucket
    * arithmetic (first 4 hex nibbles of md5(key) as an integer, mod
    * `mod`) over a caller-supplied key EXPRESSION — the group-keyed
    * split oracles hash a group id where the older inline copies hash
    * doc_id. */
  private def saltBucketSql(keyExpr: String, mod: Long): String =
    s"""CAST(((strpos('0123456789abcdef', substr(md5($keyExpr), 1, 1)) - 1) * 4096
       |    + (strpos('0123456789abcdef', substr(md5($keyExpr), 2, 1)) - 1) * 256
       |    + (strpos('0123456789abcdef', substr(md5($keyExpr), 3, 1)) - 1) * 16
       |    + (strpos('0123456789abcdef', substr(md5($keyExpr), 4, 1)) - 1)) % $mod AS BIGINT)"""
      .stripMargin

  /** 8/1/1 bucket-to-name CASE shared by the split oracles. */
  private def splitCaseSql(bucketExpr: String): String =
    s"CASE WHEN $bucketExpr <= 7 THEN 'train' " +
      s"WHEN $bucketExpr = 8 THEN 'val' ELSE 'test' END"

  /** Merge rounds for the iterated BPE trainer — shared between the
    * Spark queries and their unrolled-CTE oracles so they cannot
    * drift. */
  private val BpeRounds = 5

  /** DSIR target slice + hashed-feature bucket count, shared between
    * the Spark query and its oracle so they cannot drift. 1024 divides
    * 65536, keeping the 16-bit md5-prefix bucket exactly uniform. */
  private val DsirTarget = "src0"
  private val DsirBuckets = TextOps.DsirDefaultBuckets

  /** The raw-side slice of the CROSS-corpus DSIR row's training
    * subset: the distribution is trained on {target, this} only, so
    * docs from every other source hit buckets the model never
    * observed and exercise dsirScored's LEFT-join coalesce-to-zero
    * arm (403 unseen-bucket hits at sf0.01, 27 at sf0.1 — measured,
    * nonzero at both driver scales). */
  private val DsirCrossRaw = "src1"

  /** Frequency floor for the convergence-stop BPE query: between the
    * sf0.01 corpus' round-3 (2747) and round-4 (2696) winners, so the
    * trainer provably STOPS mid-budget there. Shared with the oracle,
    * which replays all rounds and keeps those at or above the floor —
    * equivalent because round winners are monotone non-increasing
    * (the spec-pinned law in TextOpsSpec). */
  private val BpeMinCount = 2700L

  /** The BPE trainer as unrolled DuckDB CTEs (word-frequency table,
    * wrapped-symbol sequences, one (pairs, top-1, merge) round per
    * iteration), shared by the merge-table and encode oracles —
    * generated from one loop so the round structure cannot drift from
    * the Spark trainer's. Leaves seq0..seqN / t1..tN in scope. */
  private def bpeCtes(rounds: Int): String = {
    val head = """WITH wf AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE len(word) >= 2 AND strpos(word, chr(31)) = 0
      |  GROUP BY 1),
      |seq0 AS (
      |  SELECT word, array_to_string(list_transform(string_split(word, ''),
      |           c -> chr(31) || c || chr(31)), '') AS seq, n
      |  FROM wf)""".stripMargin
    val per = (1 to rounds).map { r =>
      s"""
      |p$r AS (
      |  SELECT cs[2*i] AS lhs, cs[2*i+2] AS rhs, CAST(sum(n) AS BIGINT) AS n_pairs
      |  FROM (SELECT cs, n, unnest(generate_series(1, (len(cs)-1)//2 - 1)) AS i
      |        FROM (SELECT string_split(seq, chr(31)) AS cs, n FROM seq${r - 1})
      |        WHERE len(cs) >= 5)
      |  GROUP BY 1, 2),
      |t$r AS (SELECT lhs, rhs, n_pairs FROM p$r ORDER BY n_pairs DESC, lhs, rhs LIMIT 1),
      |seq$r AS (
      |  -- LEFT JOIN + COALESCE, not a cross join: when a round has no
      |  -- pairs left (t empty) the segmentations pass through
      |  -- UNCHANGED, mirroring the Spark trainer's early stop (a
      |  -- cross join would empty the table and zero every later count)
      |  SELECT word,
      |         COALESCE(replace(seq, chr(31)||lhs||chr(31)||chr(31)||rhs||chr(31),
      |                  chr(31)||lhs||rhs||chr(31)), seq) AS seq, n
      |  FROM seq${r - 1} LEFT JOIN t$r ON TRUE)""".stripMargin
    }.mkString(",")
    head + "," + per
  }

  /** Shared oracle CTEs: tokens with position, and distinct 3-gram
    * shingle sets built per-row from the token list (mirrors the
    * windowless TextOps.shingles). */
  private val TokCte =
    """tok AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS word,
      |         generate_subscripts(string_split(text,' '), 1) AS pos
      |  FROM documents),
      |ds AS (
      |  SELECT DISTINCT doc_id, s FROM (
      |    SELECT doc_id,
      |           unnest(list_transform(range(1, len(ls) - 1),
      |             i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS s
      |    FROM (SELECT doc_id, string_split(text, ' ') AS ls
      |          FROM documents WHERE len(string_split(text, ' ')) >= 3)))""".stripMargin

  /** BM25 query constants — ONE literal feeding both the Spark call
    * and the oracle's IN-list / fraction-clearing products. */
  private val Bm25Terms: Seq[String] = Seq("join", "vector", "filter")
  private val Bm25TermsSql: String =
    Bm25Terms.map(t => s"'$t'").mkString(", ")
  private val Bm25K1: Long = 1200L
  private val Bm25B: Long = 750L

  /** Blocklist phrases — ONE literal feeding both engines; mixed
    * lengths exercise the per-length gram streams. */
  private val BlockPhrases: Seq[String] =
    Seq("join hash", "slow scan", "row batch scan")
  private def blockSql(len: Int): String =
    BlockPhrases.filter(_.split(" ").length == len)
      .map(p => s"'$p'").mkString(", ")

  /** Template-spam fixture body for the capped near-dup row — ONE
    * single-quote-free literal feeding both engines; 10 tokens, so
    * with the per-class suffix token every class instance is an
    * 11-token doc sharing all 9 shingles with its classmates. */
  private val TemplateSpamText =
    "spam template page click here to win a free prize"

  /** Stratified-sampling keep rates (permille) — ONE literal feeding
    * both the Spark call and the oracle's VALUES clause. */
  private val StratRates: Seq[(String, Long)] = Seq(("en", 250L))
  private val StratRatesSql: String = StratRates
    .map { case (l, p) => s"('$l', CAST($p AS BIGINT))" }.mkString(", ")

  /** Mixture-rebalance target token shares (permille) — src0 gets a
    * share far above its natural mass (cap arm: keep_permille = 1000),
    * src1..15 sit below natural (trim arm), src16..19 are unlisted
    * (drop arm). ONE literal feeds Spark and the oracle VALUES. */
  private val MixShares: Seq[(String, Long)] =
    ("src0", 200L) +: (1 until 16).map(i => (s"src$i", 30L))
  private val MixSharesSql: String = MixShares
    .map { case (s, p) => s"('$s', CAST($p AS BIGINT))" }.mkString(", ")

  /** Sequence-packing constants shared by the Spark call and the
    * oracle's recursive CTE: token budget per pack, docs per shard. */
  private val PackBudget = 512L
  private val PackShard = 200L

  /** The NB classifier's scoring pipeline as CTEs ending in
    * `nbs(doc_id, n_tokens, score_p, score_n, pred, margin)` — shared
    * by text_nb_filter and text_nb_calibration so the scoring
    * arithmetic cannot drift between the filter and its calibration
    * card. */
  private def NbScoreSql: String =
    s"""tr AS (SELECT source, unnest(string_split(text, ' ')) AS word
      |      FROM documents WHERE source IN ('$DsirTarget', '$DsirCrossRaw')),
      |m AS (SELECT word,
      |        CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS c_p,
      |        CAST(sum(CASE WHEN source = '$DsirCrossRaw' THEN 1 ELSE 0 END) AS BIGINT) AS c_n
      |      FROM tr GROUP BY 1),
      |qm AS (SELECT word, CAST(length(bin(c_p + 1)) - 1 AS BIGINT) AS ql_p,
      |              CAST(length(bin(c_n + 1)) - 1 AS BIGINT) AS ql_n FROM m),
      |st AS (SELECT
      |        CAST(length(bin(CAST(sum(c_p) + count(*) AS BIGINT))) - 1 AS BIGINT) AS qd_p,
      |        CAST(length(bin(CAST(sum(c_n) + count(*) AS BIGINT))) - 1 AS BIGINT) AS qd_n
      |       FROM m),
      |pr AS (SELECT
      |        CAST((length(bin(CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) + 1 AS BIGINT))) - 1)
      |          - (length(bin(count(*) + 2)) - 1) AS BIGINT) AS qp_p,
      |        CAST((length(bin(CAST(sum(CASE WHEN source = '$DsirCrossRaw' THEN 1 ELSE 0 END) + 1 AS BIGINT))) - 1)
      |          - (length(bin(count(*) + 2)) - 1) AS BIGINT) AS qp_n
      |       FROM documents WHERE source IN ('$DsirTarget', '$DsirCrossRaw')),
      |dk AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS k FROM (
      |        SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents WHERE source NOT IN ('$DsirTarget', '$DsirCrossRaw'))
      |       GROUP BY 1, 2),
      |ds AS (SELECT doc_id,
      |        CAST(sum(k * COALESCE(ql_p, 0)) AS BIGINT) AS s_p,
      |        CAST(sum(k * COALESCE(ql_n, 0)) AS BIGINT) AS s_n,
      |        CAST(sum(k) AS BIGINT) AS n_tokens
      |       FROM dk LEFT JOIN qm USING (word) GROUP BY 1),
      |nbs AS (SELECT doc_id, n_tokens,
      |        qp_p + s_p - n_tokens * qd_p AS score_p,
      |        qp_n + s_n - n_tokens * qd_n AS score_n,
      |        CASE WHEN qp_p + s_p - n_tokens * qd_p >= qp_n + s_n - n_tokens * qd_n
      |             THEN 'keep' ELSE 'drop' END AS pred,
      |        CAST((qp_p + s_p - n_tokens * qd_p) - (qp_n + s_n - n_tokens * qd_n)
      |          AS DOUBLE) / n_tokens AS margin
      |       FROM ds, st, pr)""".stripMargin

  /** The greedy per-shard packing recurrence as CTEs ending in
    * `rec(lang, shard, doc_id, n_tokens, rn, pack_id, pack_fill)` —
    * shared by text_seq_pack and text_pack_report so the assignment
    * cannot drift between the packing and its efficiency card. */
  private def SeqPackCte: String =
    s"""toks AS (
      |  SELECT doc_id, lang, doc_id // $PackShard AS shard,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |ord AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, shard
      |    ORDER BY doc_id) AS rn
      |  FROM toks),
      |rec AS (
      |  SELECT lang, shard, doc_id, n_tokens, rn,
      |         CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_fill
      |  FROM ord WHERE rn = 1
      |  UNION ALL
      |  SELECT o.lang, o.shard, o.doc_id, o.n_tokens, o.rn,
      |         CASE WHEN r.pack_fill + o.n_tokens > $PackBudget
      |              THEN r.pack_id + 1 ELSE r.pack_id END,
      |         CASE WHEN r.pack_fill + o.n_tokens > $PackBudget
      |              THEN o.n_tokens ELSE r.pack_fill + o.n_tokens END
      |  FROM rec r JOIN ord o
      |    ON o.lang = r.lang AND o.shard = r.shard AND o.rn = r.rn + 1)"""
      .stripMargin

  /** Chunking constants (window/stride) — small enough that the
    * ~130-token test docs split into several overlapping chunks. */
  private val ChunkMax = 32
  private val ChunkStride = 16

  /** Quality-filter length cap and decontamination split modulus,
    * shared by the Spark calls and their oracles. */
  private val QfMaxChars = 100000L

  /** Curation-pipeline parameters (text_curate_e2e), shared between
    * the Spark chain and its oracle. The span window is wider than
    * dedup_span_removal's so the fixture's per-chunk "& more" seams
    * don't excise the whole corpus; the LM gate sits just above the
    * corpus median NLL (3930/4000 per mille at sf0.01/0.1), keeping
    * both filter arms non-vacuous at both driver scales. */
  private val CurateSpanK = 8
  private val CurateLmMilli = 3950L

  /** The curation chain as shared DuckDB CTEs (fixture -> extract ->
    * dedup -> langid -> quality -> spans -> LM gate -> mix), ending at
    * the survivor frame d7 — spliced into both the e2e row (which
    * appends the packing recurrence) and the funnel-report row so the
    * two replays cannot drift. MATERIALIZED throughout: the d-frames
    * are multiply referenced and DuckDB default-inlines CTEs. */
  private val CurateCtes = s"""WITH RECURSIVE
    |w0 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    |h AS (SELECT doc_id,
    |  '$HtmlFixtureHead'
    |  || array_to_string(list_transform(range(0, CAST(ceil(len(w) / 10.0) AS INT)),
    |       i -> '<p>' || array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ')
    |        || ' &amp; more</p>'), '')
    |  || '$HtmlFixtureTail' AS html FROM w0),
    |e1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM h),
    |e2 AS (SELECT doc_id, regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM e1),
    |e3 AS (SELECT doc_id, regexp_replace(x, '(?i)<(br|/p|/div|/li|/ul|/nav|/title|/h[1-6]|/tr)[^>]*>', chr(10), 'g') AS x FROM e2),
    |e4 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'g') AS x FROM e3),
    |e5 AS (SELECT doc_id, replace(replace(replace(replace(replace(x,
    |         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '), '&amp;', '&') AS x FROM e4),
    |lns AS (SELECT doc_id, list_filter(list_transform(string_split(x, chr(10)),
    |         l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))), l -> l <> '') AS lines FROM e5),
    |d1 AS MATERIALIZED (
    |  SELECT m.doc_id, m.source, m.lang,
    |         array_to_string(list_filter(lines, l -> len(string_split(l, ' ')) >= 4), ' ') AS text
    |  FROM lns JOIN documents m USING (doc_id)),
    |keep2 AS (SELECT MIN(doc_id) AS doc_id FROM d1 GROUP BY md5(text)),
    |d2 AS MATERIALIZED (SELECT d1.* FROM d1 JOIN keep2 USING (doc_id)),
    |tok1 AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM d2),
    |tokl AS (SELECT t.doc_id, t.word, d.lang FROM tok1 t JOIN d2 d USING (doc_id)),
    |prof AS (SELECT lang AS cand_lang, word, count(*) AS n_lw FROM tokl GROUP BY 1, 2),
    |lsize AS (SELECT lang AS cand_lang, count(*) AS n_l FROM tokl GROUP BY 1),
    |dwc AS (SELECT doc_id, word, count(*) AS c_dw FROM tok1 GROUP BY 1, 2),
    |sc AS (SELECT doc_id, cand_lang, SUM(c_dw * n_lw) AS dot FROM dwc JOIN prof USING (word) GROUP BY 1, 2),
    |sc2 AS (SELECT s.doc_id, s.cand_lang, CAST(dot AS DOUBLE) / n_l AS score FROM sc s JOIN lsize USING (cand_lang)),
    |pred AS (SELECT doc_id, cand_lang AS pred_lang FROM (
    |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn FROM sc2) WHERE rn = 1),
    |d3 AS MATERIALIZED (SELECT d2.* FROM d2 JOIN pred USING (doc_id) WHERE pred.pred_lang = d2.lang),
    |qst AS (SELECT doc_id,
    |          CAST(length(text) AS BIGINT) AS n_chars,
    |          CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
    |          CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
    |          CAST(len(list_filter(string_split(text,' '), x -> x IN ('the','a'))) AS BIGINT) AS n_stopwords,
    |          CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
    |          CAST(len(regexp_extract_all(text, '[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_digit_runs
    |        FROM d3),
    |d4 AS MATERIALIZED (
    |  SELECT d3.* FROM d3 JOIN qst USING (doc_id)
    |  WHERE NOT (n_tokens < 20 OR n_stopwords * 4 > n_tokens OR n_distinct * 5 < n_tokens)
    |    AND n_emails + n_digit_runs = 0 AND n_chars <= $QfMaxChars),
    |w4 AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM d4),
    |occ AS MATERIALIZED (
    |  SELECT doc_id, i AS pos,
    |         md5(array_to_string(list_slice(w, i + 1, i + $CurateSpanK), ' ')) AS sh
    |  FROM (SELECT doc_id, w, unnest(range(0, len(w) - $CurateSpanK + 1)) AS i
    |        FROM w4 WHERE len(w) >= $CurateSpanK)),
    |stats AS (SELECT sh, count(DISTINCT doc_id) AS df, MIN(doc_id) AS min_doc FROM occ GROUP BY 1),
    |covered AS (SELECT DISTINCT o.doc_id, o.pos + u.k AS pos
    |            FROM occ o JOIN stats s USING (sh), (SELECT unnest(range(0, $CurateSpanK)) AS k) u
    |            WHERE s.df >= 2 AND o.doc_id <> s.min_doc),
    |toks4 AS (SELECT doc_id, i - 1 AS pos, w[i] AS tok
    |          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM w4)),
    |kept5 AS (SELECT t.doc_id, t.pos, t.tok FROM toks4 t
    |          LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
    |          WHERE c.doc_id IS NULL),
    |reb AS (SELECT doc_id, array_to_string(list_transform(
    |          list_sort(list(struct_pack(pos := pos, tok := tok))), r -> r.tok), ' ') AS text_clean
    |        FROM kept5 GROUP BY doc_id),
    |d5 AS MATERIALIZED (
    |  SELECT d4.doc_id, d4.source, d4.lang, r.text_clean AS text
    |  FROM d4 JOIN reb r USING (doc_id) WHERE r.text_clean <> ''),
    |bg AS MATERIALIZED (
    |  SELECT doc_id, lhs, rhs, count(*) AS k FROM (
    |    SELECT doc_id, w[i] AS lhs, w[i+1] AS rhs
    |    FROM (SELECT doc_id, string_split(text,' ') AS w FROM d5),
    |         LATERAL (SELECT unnest(range(1, len(w))) AS i)
    |  ) GROUP BY 1, 2, 3),
    |lm AS (SELECT lhs, rhs, CAST(SUM(k) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2),
    |ctx AS (SELECT lhs, CAST(SUM(c_ab) AS BIGINT) AS c_lhs FROM lm GROUP BY 1),
    |lmsc AS (SELECT b.doc_id,
    |           CAST(SUM(b.k * (length(bin(c_lhs // c_ab)) - 1)) AS BIGINT) AS nll_sum,
    |           CAST(SUM(b.k) AS BIGINT) AS n_bigrams
    |         FROM bg b JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs) GROUP BY 1),
    |d6 AS MATERIALIZED (
    |  SELECT d5.* FROM d5 JOIN lmsc USING (doc_id)
    |  WHERE nll_sum * 1000 <= n_bigrams * $CurateLmMilli),
    |t6 AS (SELECT doc_id, source, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens FROM d6),
    |bs AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS source_tokens FROM t6 GROUP BY 1),
    |rt AS (SELECT source, source_tokens,
    |         list_max(list_filter([g - 2, g - 1, g, g + 1, g + 2],
    |           x -> x >= 1 AND CAST(x AS HUGEINT) * x <= source_tokens)) AS t_s
    |       FROM (SELECT source, source_tokens,
    |               CAST(POWER(CAST(source_tokens AS DOUBLE), 0.5) AS BIGINT) AS g FROM bs)),
    |tt AS (SELECT CAST(sum(t_s) AS BIGINT) AS tot_t FROM rt),
    |bb AS (SELECT MIN(CAST(CAST(source_tokens AS HUGEINT) * tot_t // t_s AS BIGINT)) AS budget FROM rt, tt),
    |rr AS (SELECT source, LEAST(CAST(1000 AS BIGINT),
    |         CAST(CAST(budget AS HUGEINT) * t_s * 1000
    |           // (CAST(tot_t AS HUGEINT) * source_tokens) AS BIGINT)) AS keep_permille
    |       FROM rt, tt, bb),
    |mk AS (SELECT t6.*, rr.keep_permille,
    |         CAST(((strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
    |             + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
    |             + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
    |             + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 1000 AS BIGINT) AS bucket
    |       FROM t6 JOIN rr USING (source)),
    |d7 AS MATERIALIZED (
    |  SELECT d6.doc_id, d6.lang, d6.text FROM d6 JOIN mk USING (doc_id)
    |  WHERE mk.bucket < mk.keep_permille)"""
    .stripMargin
  private val DecontMod = 20L

  /** Quantized-embedding oracle CTEs: q = round(x*1000) bigints,
    * nn = exact squared norm. */
  private val EmbCte =
    """e AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS q
      |  FROM embeddings),
      |u AS (SELECT vec_id, unnest(q) AS v FROM e),
      |n AS (SELECT vec_id, SUM(v*v) AS nn FROM u GROUP BY 1)""".stripMargin

  private val MinhashSigSql: String = {
    val mins = (0 until 16)
      .map(k => s"min(md5(s||':$k')) AS m$k").mkString(", ")
    val bands = (0 until 4).map { b =>
      val parts = (b * 4 until b * 4 + 4).map(i => s"m$i").mkString("||'|'||")
      s"SELECT doc_id, $b AS band_idx, md5($parts) AS band_hash FROM sig"
    }.mkString(" UNION ALL ")
    s"""sig AS (SELECT doc_id, $mins FROM ds GROUP BY doc_id),
       |bands AS ($bands)""".stripMargin
  }

  /** Full minhash near-dup pipeline as CTEs ending in `ndup(doc_a,
    * doc_b, n_common, na, nb, jaccard)` — shared by the pair query and
    * the connected-components grouping so the two oracles cannot
    * drift. */
  private val MinhashPairsCte: String =
    s"""$TokCte,
      |$MinhashSigSql,
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM bands a JOIN bands b USING (band_idx, band_hash)
      |         WHERE a.doc_id < b.doc_id),
      |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
      |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
      |          FROM cand c
      |          JOIN ds a ON a.doc_id = c.doc_a
      |          JOIN ds b ON b.doc_id = c.doc_b AND b.s = a.s
      |          GROUP BY 1, 2),
      |ndup AS (
      |  SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
      |         i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
      |  FROM inter i
      |  JOIN sz sa ON sa.doc_id = i.doc_a
      |  JOIN sz sb ON sb.doc_id = i.doc_b
      |  WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.7)""".stripMargin

  /** Connected-components closure over `ndup` pairs ending in
    * `grp(doc_id, group_id)` — shared by dedup_groups and
    * dedup_survivors so the two oracles cannot drift on what a
    * component (and hence a survivor) is. Requires WITH RECURSIVE. */
  /** Multi-line fixture for the line-dedup row, derived
    * deterministically from `documents` on BOTH sides: each doc's
    * 10-token runs become lines, wrapped by boilerplate head/tail
    * lines SHARED across every document — so cross-document line
    * dedup must strip exactly the chrome and keep the content
    * (single-quote-free constants, spliced into the oracle SQL). */
  private val LineFixtureHead = "subscribe to our newsletter today"
  private val LineFixtureTail = "all rights reserved worldwide"

  private def lineFixture(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.concat_ws("\n",
          lit(LineFixtureHead),
          org.apache.spark.sql.functions.expr(
            "array_join(transform(" +
              "sequence(0, CAST(ceil(size(w) / 10.0) AS INT) - 1), " +
              "i -> concat_ws(' ', slice(w, i * 10 + 1, 10))), chr(10))"),
          lit(LineFixtureTail)).as("text"))

  /** Messy-URL fixture for the canonicalization rows, derived
    * deterministically from `documents` on BOTH sides: scheme case,
    * optional WWW, mixed host case, the https default port, a
    * doc_id-mod path (so canonical collisions genuinely occur inside
    * a source), optional trailing slash, tracking params around a
    * real one, and a fragment — every canonicalization rule is
    * exercised by construction. */
  private val UrlFixtureSql: String =
    """uf AS (SELECT doc_id,
      |  'HTTPS://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END ||
      |  'Blog.' || source || '-site.COM' ||
      |  CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END ||
      |  '/articles/' || CAST(doc_id % 13 AS VARCHAR) ||
      |  CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
      |  '?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR) ||
      |  '&ref=tw' ||
      |  CASE WHEN doc_id % 5 = 0 THEN '&lang=en' ELSE '' END ||
      |  '#frag' || CAST(doc_id AS VARCHAR) AS url
      | FROM documents)""".stripMargin

  private def urlFixture(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"),
      org.apache.spark.sql.functions.concat(
        lit("HTTPS://"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.pmod(col("doc_id"), lit(3)) === 0,
          lit("WWW.")).otherwise(lit("")),
        lit("Blog."), col("source"), lit("-site.COM"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.pmod(col("doc_id"), lit(2)) === 0,
          lit(":443")).otherwise(lit("")),
        lit("/articles/"),
        org.apache.spark.sql.functions.pmod(col("doc_id"), lit(13))
          .cast("string"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.pmod(col("doc_id"), lit(4)) === 0,
          lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&id="),
        org.apache.spark.sql.functions.pmod(col("doc_id"), lit(13))
          .cast("string"),
        lit("&ref=tw"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.pmod(col("doc_id"), lit(5)) === 0,
          lit("&lang=en")).otherwise(lit("")),
        lit("#frag"), col("doc_id").cast("string")).as("url"))

  /** Canonicalization CTE over `uf` mirroring
    * [[graft.operators.TextOps.canonicalizeUrl]], ending in
    * `canon(doc_id, url, canonical_url, domain)` — shared by the
    * canonical row and the dedup/cap row so the rules cannot drift. */
  private val UrlCanonCte: String =
    s"""$UrlFixtureSql,
      |u1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$$', '') AS nf FROM uf),
      |u2 AS (SELECT doc_id, url, nf,
      |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |  regexp_replace(regexp_replace(
      |    lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)', 1)),
      |    ':(80|443)$$', ''), '^www\\.', '') AS host,
      |  regexp_replace(regexp_extract(nf,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)', 1), '/+$$', '') AS path,
      |  array_to_string(list_sort(list_filter(
      |    string_split(regexp_extract(nf, '\\?(.*)$$', 1), '&'),
      |    p -> NOT (p[1:4] IN ('utm_', 'ref=') OR p = ''))), '&') AS q
      |  FROM u1),
      |canon AS (SELECT doc_id, url,
      |  scheme || '://' || host ||
      |  CASE WHEN path = '' THEN '/' ELSE path END ||
      |  CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url,
      |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain
      |  FROM u2)""".stripMargin

  /** Per-slice minhash signature + band CTEs over a sliced shingle
    * source `src(doc_id, s)` — the serve oracle builds the indexed and
    * batch sides separately, with the SAME 16-hash/4-band arithmetic
    * as [[MinhashSigSql]] (kept in its structure so the construction
    * cannot drift between the one-corpus and the index/serve routes). */
  private def minhashSigSliceSql(src: String, tag: String): String = {
    val mins = (0 until 16)
      .map(k => s"min(md5(s||':$k')) AS m$k").mkString(", ")
    val bands = (0 until 4).map { b =>
      val parts = (b * 4 until b * 4 + 4).map(i => s"m$i").mkString("||'|'||")
      s"SELECT doc_id, $b AS band_idx, md5($parts) AS band_hash FROM sig_$tag"
    }.mkString(" UNION ALL ")
    s"""sig_$tag AS (SELECT doc_id, $mins FROM $src GROUP BY doc_id),
       |bands_$tag AS ($bands)""".stripMargin
  }

  private val ClosureCte: String =
    """edges AS (SELECT doc_a AS a, doc_b AS b FROM ndup
      |          UNION ALL SELECT doc_b, doc_a FROM ndup),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |reach AS (SELECT id, id AS grp FROM nodes
      |          UNION
      |          SELECT e.b AS id, r.grp FROM reach r JOIN edges e ON e.a = r.id),
      |grp AS (SELECT id AS doc_id, MIN(grp) AS group_id FROM reach GROUP BY id)""".stripMargin

  /** Winnowing fingerprint sets (k=8, w=4) ending in `fp(doc_id, fp)`
    * — shared by text_winnowing and dedup_winnowing so the fingerprint
    * definition cannot drift between the two oracles. */
  private val WinnowCte: String =
    """cs AS (
      |  SELECT doc_id, string_split(text, '') AS cs FROM documents
      |  WHERE len(string_split(text, '')) >= 11),
      |kh AS (
      |  SELECT doc_id,
      |    list_transform(range(1, len(cs) - 7 + 1), i ->
      |      list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(cs[i:i+7], c -> CAST(ascii(c) AS BIGINT))),
      |        (acc, c) -> (acc * 131 + c) % 2147483647)) AS kh
      |  FROM cs),
      |fp AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(kh) - 3 + 1), j ->
      |      list_aggregate(kh[j:j+3], 'min'))) AS fp
      |  FROM kh)""".stripMargin

  /** LSH bucket assignment (`nPlanes` hyperplanes over the quantized
    * vectors) ending in `bk(vec_id, bucket)` / `eb(vec_id, q, bucket)`
    * — shared by sim_lsh_nn, sim_lsh_multiprobe, and
    * dedup_embedding_lsh so the bucket definition cannot drift between
    * the oracles. */
  private def lshBucketCte(nPlanes: Int): String =
    s"""pl AS (SELECT j AS plane, md5('p'||j||'a') || md5('p'||j||'b') AS hex
      |       FROM (SELECT unnest(range($nPlanes)) AS j)),
      |plc AS (SELECT plane, c,
      |               (strpos('0123456789abcdef', substr(hex, c+1, 1)) - 1) * 2 - 15 AS coef
      |        FROM pl, (SELECT unnest(range(64)) AS c)),
      |comp AS (SELECT vec_id, unnest(q) AS qc,
      |                generate_subscripts(q, 1) - 1 AS c FROM e),
      |pd AS (SELECT vec_id, plane, SUM(qc * coef) AS pdot
      |       FROM comp JOIN plc USING (c) GROUP BY 1, 2),
      |bk AS (SELECT vec_id,
      |              CAST(SUM(CASE WHEN pdot > 0 THEN CAST(pow(2, plane) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
      |       FROM pd GROUP BY 1),
      |eb AS (SELECT e.vec_id, e.q, bk.bucket FROM e JOIN bk USING (vec_id))""".stripMargin

  /** The 8-plane instance the sim_lsh_* rows use. */
  private val LshBucketCte: String = lshBucketCte(8)

  /** PQ sub-slices + seed codebooks: `sub(vec_id, s, sq)` and
    * `cb(s, code, cq)` — 4 subspaces of 16, codebooks = slices of the
    * first 16 vectors. The shared head of every PQ oracle. */
  private val PqSubCte: String =
    """sub AS (SELECT vec_id, s, q[s*16+1 : s*16+16] AS sq
      |        FROM e, (SELECT unnest(range(4)) AS s)),
      |cb AS (SELECT s, vec_id AS code, sq AS cq FROM sub WHERE vec_id < 16)""".stripMargin

  /** L2 encode against codebook CTE `cbCte`, CTE names prefixed `p`:
    * norms, dots, argmin (ties -> smallest code) — ends in
    * `${p}enc(vec_id, s, code)`. The ONE generator behind every PQ
    * assignment (scoring AND each training round), so the encode rule
    * cannot drift between them. */
  private def pqEncodeCte(cbCte: String, p: String): String =
    s"""${p}cbn AS (SELECT s, code, SUM(v*v) AS cn FROM (
      |    SELECT s, code, unnest(cq) AS v FROM $cbCte) GROUP BY 1, 2),
      |${p}encd AS (SELECT vec_id, s, code, SUM(a*b) AS dot FROM (
      |    SELECT sub.vec_id, sub.s, c.code,
      |           unnest(sub.sq) AS a, unnest(c.cq) AS b
      |    FROM sub JOIN $cbCte c USING (s)) GROUP BY 1, 2, 3),
      |${p}enc AS (SELECT vec_id, s, code FROM (
      |    SELECT d.vec_id, d.s, d.code,
      |           ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.s
      |             ORDER BY n.cn - 2*d.dot, d.code) AS rk
      |    FROM ${p}encd d JOIN ${p}cbn n ON n.s = d.s AND n.code = d.code)
      |    WHERE rk = 1)""".stripMargin

  /** PQ scoring tail against codebook CTE `cbCte`, CTE names prefixed
    * `p`: [[pqEncodeCte]] + query LUT + ADC scores — ends in
    * `${p}sc(query_id, vec_id, adot)`. Serves the seed (sim_pq_topk /
    * sim_pq_recall) and trained (sim_pq_trained_recall) oracles. */
  private def pqScoreAgainst(cbCte: String, p: String): String =
    s"""${pqEncodeCte(cbCte, p)},
      |${p}lutd AS (SELECT query_id, s, code, SUM(a*b) AS pdot FROM (
      |    SELECT q.vec_id AS query_id, q.s, c.code,
      |           unnest(q.sq) AS a, unnest(c.cq) AS b
      |    FROM sub q JOIN $cbCte c USING (s) WHERE q.vec_id < 5) GROUP BY 1, 2, 3),
      |${p}sc AS (SELECT l.query_id, en.vec_id, CAST(SUM(l.pdot) AS BIGINT) AS adot
      |       FROM ${p}enc en JOIN ${p}lutd l ON l.s = en.s AND l.code = en.code
      |       WHERE en.vec_id <> l.query_id GROUP BY 1, 2)""".stripMargin

  /** Seed-codebook PQ pipeline ending in `sc(query_id, vec_id, adot)`. */
  private val PqScoreCte: String =
    s"$PqSubCte,\n${pqScoreAgainst("cb", "")}"

  /** Per-subspace Lloyd rounds over the PQ codebooks, mirroring
    * [[graft.operators.EmbeddingOps.pqTrainCodebooks]]: L2 assignment
    * with the encoder's tie-break, per-(sub, code, component) means
    * re-quantized with round-half-away. Produces `pcb1..pcb$iters`
    * from `pcb0`. */
  /** Lloyd round count for the trained-PQ oracle — lives in ONE place
    * (rounds generator + final-codebook name) and mirrors
    * [[graft.operators.EmbeddingOps.pqTrainCodebooks]]'s default. */
  private val PqTrainIters = 2

  private def pqTrainRounds(iters: Int): String =
    (1 to iters).map { i =>
      s"""${pqEncodeCte(s"pcb${i - 1}", s"r$i")},
        |pcb$i AS (SELECT s, code, list(mq ORDER BY c) AS cq FROM (
        |    SELECT a.s, a.code, u.c,
        |           CAST(round(CAST(SUM(u.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
        |    FROM r${i}enc a JOIN (
        |      SELECT vec_id, s, unnest(sq) AS v,
        |             generate_subscripts(sq, 1) AS c FROM sub) u
        |      ON u.vec_id = a.vec_id AND u.s = a.s
        |    GROUP BY 1, 2, 3) GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")

  /** IVF-PQ (IVFADC) pipeline as CTEs ending in
    * `xsc(query_id, vec_id, adot)`: coarse assignment (cosine-ranked
    * seed centroids, the sim_ivf_topk CTEs), EXACT integer residuals
    * per coarse cell, residual PQ codebooks + L2 encode (via
    * [[pqEncodeCte]] over the residual `sub`), query LUT on RAW query
    * sub-slices, and the decomposed inner-product score
    * dot(q, centroid) + sum of M ADC lookups. Shared by the live,
    * persisted, and recall oracles so the replay cannot drift. */
  private val IvfPqScoreCte: String =
    s"""cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
      |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
      |scored AS (SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
      |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
      |    FROM e eq, cents c) GROUP BY 1, 2),
      |rankedc AS (
      |  SELECT s.vec_id, s.cent_id,
      |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
      |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
      |           s.cent_id) AS crk
      |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
      |                JOIN cents c ON c.cent_id = s.cent_id),
      |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc WHERE crk = 1),
      |probes AS (SELECT vec_id AS query_id, cent_id AS cell
      |           FROM rankedc WHERE vec_id < 5 AND crk <= 2),
      |ecomp AS (SELECT vec_id, generate_subscripts(q, 1) AS i, unnest(q) AS v FROM e),
      |ccomp AS (SELECT cent_id, generate_subscripts(cq, 1) AS i, unnest(cq) AS cv FROM cents),
      |sub AS (SELECT ec.vec_id, (ec.i - 1) // 16 AS s,
      |               list(ec.v - cc.cv ORDER BY ec.i) AS sq
      |        FROM cells cl
      |        JOIN ecomp ec ON ec.vec_id = cl.vec_id
      |        JOIN ccomp cc ON cc.cent_id = cl.cell AND cc.i = ec.i
      |        GROUP BY 1, 2),
      |rcb AS (SELECT s, vec_id AS code, sq AS cq FROM sub WHERE vec_id < 16),
      |${pqEncodeCte("rcb", "x")},
      |qsub AS (SELECT vec_id, s, q[s*16+1 : s*16+16] AS sq
      |         FROM e, (SELECT unnest(range(4)) AS s) WHERE vec_id < 5),
      |xlutd AS (SELECT query_id, s, code, SUM(a*b) AS pdot FROM (
      |    SELECT q.vec_id AS query_id, q.s, c.code,
      |           unnest(q.sq) AS a, unnest(c.cq) AS b
      |    FROM qsub q JOIN rcb c USING (s)) GROUP BY 1, 2, 3),
      |cd0 AS (SELECT query_id, cell, SUM(a*b) AS cdot FROM (
      |    SELECT p.query_id, p.cell, unnest(eq.q) AS a, unnest(c.cq) AS b
      |    FROM probes p JOIN e eq ON eq.vec_id = p.query_id
      |                  JOIN cents c ON c.cent_id = p.cell) GROUP BY 1, 2),
      |xsc AS (SELECT ca.query_id, ca.vec_id,
      |               CAST(MIN(cd.cdot) + SUM(l.pdot) AS BIGINT) AS adot
      |        FROM (SELECT p.query_id, p.cell, cl.vec_id
      |              FROM probes p JOIN cells cl ON cl.cell = p.cell
      |              WHERE cl.vec_id <> p.query_id) ca
      |        JOIN xenc en ON en.vec_id = ca.vec_id
      |        JOIN xlutd l ON l.query_id = ca.query_id
      |                    AND l.s = en.s AND l.code = en.code
      |        JOIN cd0 cd ON cd.query_id = ca.query_id AND cd.cell = ca.cell
      |        GROUP BY 1, 2)""".stripMargin

  /** Exact re-scoring of the top-30 ADC candidates over `xsc`,
    * ending in `rsc(query_id, vec_id, cos)` — shared by the rerank
    * serving row and the rerank-recall row so the candidate budget
    * and the exact-cosine arithmetic cannot drift between them. */
  private val RerankCte: String =
    """cnd AS (SELECT query_id, vec_id FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
      |  FROM xsc) WHERE rk <= 30),
      |rp AS (SELECT c.query_id, c.vec_id, unnest(qe.q) AS a, unnest(ce.q) AS b
      |       FROM cnd c JOIN e qe ON qe.vec_id = c.query_id
      |                  JOIN e ce ON ce.vec_id = c.vec_id),
      |rdots AS (SELECT query_id, vec_id, SUM(a*b) AS dot FROM rp GROUP BY 1, 2),
      |rsc AS (SELECT rdots.query_id, rdots.vec_id,
      |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
      |        FROM rdots JOIN n nq ON nq.vec_id = rdots.query_id
      |                   JOIN n nv ON nv.vec_id = rdots.vec_id)""".stripMargin

  /** Shared ranking tail over `xsc` for the two IVF-PQ top-k rows. */
  private val IvfPqTopKTail: String =
    """SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id, adot FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
      |  FROM xsc) WHERE rk <= 10""".stripMargin

  /** Exact brute-force top-10 per query ending in
    * `brute(query_id, vid)` — shared by the recall oracles. */
  private val BruteTop10Cte: String =
    """bp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
      |              unnest(qe.q) AS a, unnest(ce.q) AS b
      |       FROM e qe, e ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
      |bdots AS (SELECT query_id, vid, SUM(a*b) AS dot FROM bp GROUP BY 1, 2),
      |bsc AS (SELECT query_id, vid,
      |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
      |        FROM bdots JOIN n nq ON nq.vec_id = query_id
      |                   JOIN n nv ON nv.vec_id = vid),
      |brute AS (SELECT query_id, vid FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
      |  FROM bsc) WHERE rk <= 10)""".stripMargin

  /** SQ8 scalar-quantization CTEs over `e(vec_id, label, q)`: per-dim
    * [mn, mx] ranges, byte codes c = (q-mn)*255 // (mx-mn), exact
    * reconstruction r = mn*255 + c*(mx-mn), ending in
    * `rc(vec_id, label, r)` + `rn(vec_id, nn)` — shared by
    * sim_sq8_topk and sim_sq8_recall so the code arithmetic cannot
    * drift between the ranking and its measurement. The numerator is
    * >= 0 by construction (mn is the per-dim minimum), so DuckDB's
    * flooring `//` agrees with Spark's truncating `div`. */
  private val SqCte: String =
    """ei AS (SELECT vec_id, q,
      |              unnest(generate_series(1, CAST(len(q) AS INT))) AS i
      |       FROM e),
      |st AS (SELECT i, MIN(q[i]) AS mn, MAX(q[i]) AS mx FROM ei GROUP BY 1),
      |stl AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM st),
      |rc AS (SELECT vec_id, label,
      |         list_transform(generate_series(1, len(q)), i ->
      |           CASE WHEN mxs[i] = mns[i] THEN mns[i] * 255
      |                ELSE mns[i] * 255
      |                   + ((q[i] - mns[i]) * 255 // (mxs[i] - mns[i]))
      |                     * (mxs[i] - mns[i]) END) AS r
      |       FROM e, stl),
      |rn AS (SELECT vec_id, SUM(v*v) AS nn
      |       FROM (SELECT vec_id, unnest(r) AS v FROM rc) GROUP BY 1)"""
      .stripMargin

  /** Overlap-vs-brute tail over an approximate top-k CTE
    * `approxCte(query_id, vec_id)`. */
  private def recallTail(approxCte: String): String =
    s"""hits AS (SELECT b.query_id, COUNT(*) AS nh
      |         FROM brute b JOIN $approxCte p ON p.query_id = b.query_id AND p.vec_id = b.vid
      |         GROUP BY 1)
      |SELECT q.query_id, CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_overlap,
      |       CAST(COALESCE(h.nh, 0) AS DOUBLE) / 10 AS recall_at_k
      |FROM (SELECT DISTINCT query_id FROM brute) q
      |LEFT JOIN hits h ON h.query_id = q.query_id""".stripMargin

  /** Shared scoring tail over a candidate-pair CTE `pp(vid, nn_id, x,
    * y)`: exact dot, cosine, top-1 per vector, null-neighbor left
    * join. */
  private val LshScoreTail: String =
    """pdots AS (SELECT vid, nn_id, SUM(x*y) AS dot FROM pp GROUP BY 1, 2),
      |psc AS (SELECT vid, nn_id,
      |               CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
      |        FROM pdots JOIN n na ON na.vec_id = vid
      |                   JOIN n nb ON nb.vec_id = nn_id),
      |best AS (SELECT vid, nn_id, cos FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cos DESC, nn_id) AS rk
      |  FROM psc) WHERE rk = 1)
      |SELECT bk.vec_id, bk.bucket, best.nn_id, best.cos
      |FROM bk LEFT JOIN best ON best.vid = bk.vec_id""".stripMargin

  private val SimhashSql: String = {
    val votes = (0 until 32).map(j =>
      s"SUM(CASE WHEN strpos('0123456789abcdef', substr(h,${j + 1},1))-1 >= 8 THEN cnt ELSE -cnt END) AS v$j")
      .mkString(", ")
    val bits = (0 until 32).map(j =>
      s"(CASE WHEN v$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""wc AS (SELECT doc_id, word, count(*) AS cnt, md5(word) AS h
       |       FROM tok GROUP BY doc_id, word),
       |v AS (SELECT doc_id, $votes FROM wc GROUP BY doc_id),
       |shh AS (SELECT doc_id, $bits AS simhash FROM v)""".stripMargin
  }

  /** Lloyd-trained coarse-quantizer assignment as CTEs — `iters`
    * rounds of (assign by exact-integer cosine, re-quantize means
    * with round-half-away — mirrors
    * [[graft.operators.EmbeddingOps.kmeansCentroids]]), ending in
    * `cells(vec_id, cell)` with `eq`, `cents$iters`, and `frk` still
    * in scope. Shared by the IVF-recall and semantic-dedup oracles so
    * the training+assignment pipeline lives in ONE generator. */
  private def kmeansCellsCte(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val p = s"cents${i - 1}"
      s"""scored$i AS (SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
         |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
         |    FROM eq, $p c) GROUP BY 1, 2),
         |rk$i AS (SELECT s.vec_id, s.cent_id,
         |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
         |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
         |           s.cent_id) AS crk
         |  FROM scored$i s JOIN n nv ON nv.vec_id = s.vec_id
         |                  JOIN $p c ON c.cent_id = s.cent_id),
         |asn$i AS (SELECT vec_id, cent_id AS cell FROM rk$i WHERE crk = 1),
         |cm$i AS (SELECT a.cell, CAST(generate_subscripts(e.q, 1) - 1 AS INTEGER) AS c,
         |                unnest(e.q) AS v
         |         FROM asn$i a JOIN e ON e.vec_id = a.vec_id),
         |mean$i AS (SELECT cell, c, CAST(round(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mq
         |           FROM cm$i GROUP BY 1, 2),
         |cents$i AS (SELECT cell AS cent_id, list(mq ORDER BY c) AS cq,
         |                   CAST(SUM(mq*mq) AS BIGINT) AS cn
         |            FROM mean$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
       |cents0 AS (SELECT vec_id AS cent_id, q AS cq, CAST(nn AS BIGINT) AS cn
       |           FROM e JOIN n USING (vec_id) WHERE vec_id < ${EmbeddingOps.KmSeeds}),
       |$rounds,
       |fscored AS (SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
       |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
       |    FROM eq, cents$iters c) GROUP BY 1, 2),
       |frk AS (SELECT s.vec_id, s.cent_id,
       |        ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
       |          CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
       |          s.cent_id) AS crk
       | FROM fscored s JOIN n nv ON nv.vec_id = s.vec_id
       |                JOIN cents$iters c ON c.cent_id = s.cent_id),
       |cells AS (SELECT vec_id, cent_id AS cell FROM frk WHERE crk = 1)""".stripMargin
  }

  /** Full trained-IVF recall pipeline as one oracle:
    * [[kmeansCellsCte]] (2 Lloyd rounds), then the nProbe=4 IVF probe
    * with the trained centroids, then recall@10 against the
    * brute-force top-10. */
  private val IvfRecallSql: String = {
    s"""${kmeansCellsCte(EmbeddingOps.KmIters)},
       |probes AS (SELECT vec_id AS query_id, cent_id AS cell
       |           FROM frk WHERE vec_id < 5 AND crk <= 4),
       |cand AS (SELECT p.query_id, cl.vec_id
       |         FROM probes p JOIN cells cl USING (cell)
       |         WHERE cl.vec_id <> p.query_id),
       |cd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM (
       |    SELECT ca.query_id, ca.vec_id AS vid,
       |           unnest(eq1.q) AS a, unnest(eq2.q) AS b
       |    FROM cand ca
       |    JOIN eq eq1 ON eq1.vec_id = ca.query_id
       |    JOIN eq eq2 ON eq2.vec_id = ca.vec_id) GROUP BY 1, 2),
       |isc AS (SELECT query_id, vid,
       |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
       |        FROM cd JOIN n nq ON nq.vec_id = query_id
       |                JOIN n nv ON nv.vec_id = vid),
       |ivf AS (SELECT query_id, vid FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
       |  FROM isc) WHERE rk <= 10),
       |bp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
       |              unnest(qe.q) AS a, unnest(ce.q) AS b
       |       FROM e qe, e ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
       |bdots AS (SELECT query_id, vid, SUM(a*b) AS dot FROM bp GROUP BY 1, 2),
       |bsc AS (SELECT query_id, vid,
       |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
       |        FROM bdots JOIN n nq ON nq.vec_id = query_id
       |                   JOIN n nv ON nv.vec_id = vid),
       |brute AS (SELECT query_id, vid FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
       |  FROM bsc) WHERE rk <= 10),
       |hits AS (SELECT b.query_id, COUNT(*) AS nh
       |         FROM brute b JOIN ivf i ON i.query_id = b.query_id AND i.vid = b.vid
       |         GROUP BY 1)
       |SELECT q.query_id, CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_overlap,
       |       CAST(COALESCE(h.nh, 0) AS DOUBLE) / 10 AS recall_at_k
       |FROM (SELECT DISTINCT query_id FROM brute) q
       |LEFT JOIN hits h ON h.query_id = q.query_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    // ---- dedup: exact hash-groupBy --------------------------------------
    Q("dedup_exact",
      (s, d) => TextOps.dedupExact(docs(s, d)),
      Some("""SELECT md5(text) AS content_hash, MIN(doc_id) AS kept_doc_id,
        |       COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin)),

    // ---- dedup: MinHash + LSH banding + exact Jaccard verify ------------
    Q("dedup_minhash_lsh",
      (s, d) => TextOps.nearDupMinhash(docs(s, d)),
      Some(s"""WITH $MinhashPairsCte
        |SELECT doc_a, doc_b, n_common, na, nb, jaccard FROM ndup""".stripMargin),
      bench = true),

    // ---- dedup: signature-estimate vs exact-Jaccard quality row ---------
    // (per verified pair: the matching-component fraction the banding
    // is built on, exact permille of 16 — the measurement that
    // justifies the signature width)
    Q("dedup_minhash_estimate",
      (s, d) => TextOps.minhashEstimate(docs(s, d)),
      Some(s"""WITH $MinhashPairsCte
        |SELECT nd.doc_a, nd.doc_b, nd.jaccard,
        |  CAST(${(0 until 16).map(k =>
             s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)")
             .mkString(" + ")} AS BIGINT) AS n_match,
        |  CAST((${(0 until 16).map(k =>
             s"(CASE WHEN a.m$k = b.m$k THEN 1 ELSE 0 END)")
             .mkString(" + ")}) * 1000 // 16 AS BIGINT) AS est_permille
        |FROM ndup nd JOIN sig a ON a.doc_id = nd.doc_a
        |             JOIN sig b ON b.doc_id = nd.doc_b""".stripMargin)),

    // ---- dedup: band-bucket volume accounting card ----------------------
    // (the loud-overflow half of the capped-candidate contract: per
    // band position, how many buckets exceed the cap, the member mass
    // inside them, and the exact pair volume star routing avoids.
    // cap=2 here so the card is non-vacuous at oracle scale — the
    // production default TextOps.BucketCap=64 reports all-zero on
    // these corpora, which is exactly why the uncapped minhash
    // oracles above stay bit-identical)
    Q("dedup_band_volume",
      (s, d) => TextOps.bandVolumeReport(docs(s, d), bucketCap = 2),
      Some(s"""WITH $TokCte,
        |$MinhashSigSql,
        |bstat AS (SELECT band_idx, band_hash, COUNT(*) AS bn
        |          FROM bands GROUP BY 1, 2)
        |SELECT band_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |       CAST(MAX(bn) AS BIGINT) AS max_bucket,
        |       CAST(SUM(CASE WHEN bn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |       CAST(SUM(CASE WHEN bn > 2 THEN bn ELSE 0 END) AS BIGINT) AS overflow_docs,
        |       CAST(SUM(CASE WHEN bn > 2 THEN bn * (bn - 1) // 2 - (bn - 1) ELSE 0 END) AS BIGINT) AS pairs_avoided
        |FROM bstat GROUP BY 1""".stripMargin)),

    // ---- dedup: capped near-dup route under template spam ---------------
    // (the 100 TB scenario the cap exists for, reproduced at oracle
    // scale: even doc_ids collapse onto 23 near-identical template
    // classes — mega-buckets in every band — while odd doc_ids keep
    // their real text in small buckets. cap=3 makes both arms live:
    // template classes exceed it at every sf and route to hub stars,
    // real-text buckets (max 3 at sf0.01) keep exact all-pairs. The
    // oracle mirrors the hub-star routing with one windowed count)
    Q("dedup_minhash_capped",
      (s, d) => {
        val fx = docs(s, d).select(col("doc_id"),
          org.apache.spark.sql.functions.when(col("doc_id") % 2 === 0,
            org.apache.spark.sql.functions.concat(
              lit(TemplateSpamText + " t"),
              (col("doc_id") % 23).cast("string")))
            .otherwise(col("text")).as("text"))
        TextOps.nearDupMinhash(fx, threshold = 0.7, bucketCap = 3)
      },
      Some(s"""WITH fx AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN '$TemplateSpamText t' || CAST(doc_id % 23 AS VARCHAR)
        |       ELSE text END AS text
        |  FROM documents),
        |ds AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(range(1, len(ls) - 1),
        |             i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS s
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ls
        |          FROM fx WHERE len(string_split(text, ' ')) >= 3))),
        |$MinhashSigSql,
        |bstat AS (SELECT band_idx, band_hash, COUNT(*) AS bn,
        |                 MIN(doc_id) AS hub
        |          FROM bands GROUP BY 1, 2),
        |bx AS (SELECT b.doc_id, b.band_idx, b.band_hash, s.bn, s.hub
        |       FROM bands b JOIN bstat s USING (band_idx, band_hash)),
        |cand AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bx a JOIN bx b USING (band_idx, band_hash)
        |  WHERE a.bn <= 3 AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT hub AS doc_a, doc_id AS doc_b FROM bx
        |  WHERE bn > 3 AND doc_id <> hub)),
        |sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |          FROM cand c
        |          JOIN ds a ON a.doc_id = c.doc_a
        |          JOIN ds b ON b.doc_id = c.doc_b AND b.s = a.s
        |          GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
        |       i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
        |FROM inter i
        |JOIN sz sa ON sa.doc_id = i.doc_a
        |JOIN sz sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.7""".stripMargin)),

    // ---- dedup: persisted-index near-dup SERVING ------------------------
    // (the incremental half of minhash dedup: the corpus slice
    // doc_id % 5 != 0 is indexed once, the % 5 == 0 slice arrives as
    // an ingest batch and asks for its near-dups among the indexed
    // docs — 11/14 pairs at sf0.001/0.01, non-vacuous at both gates)
    Q("dedup_minhash_serve",
      (s, d) => {
        val all = docs(s, d)
        val dir = cachedIndex("mh", d, p => TextOps.minhashIndexWrite(
          all.where(col("doc_id") % 5 =!= 0), p))
        TextOps.nearDupServe(s, dir, all.where(col("doc_id") % 5 === 0))
      },
      Some(s"""WITH $TokCte,
        |dsa AS (SELECT * FROM ds WHERE doc_id % 5 <> 0),
        |dsb AS (SELECT * FROM ds WHERE doc_id % 5 = 0),
        |${minhashSigSliceSql("dsa", "a")},
        |${minhashSigSliceSql("dsb", "b")},
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands_a a JOIN bands_b b
        |           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash),
        |sza AS (SELECT doc_id, count(*) AS n FROM dsa GROUP BY 1),
        |szb AS (SELECT doc_id, count(*) AS n FROM dsb GROUP BY 1),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |          FROM cand c
        |          JOIN dsa x ON x.doc_id = c.doc_a
        |          JOIN dsb y ON y.doc_id = c.doc_b AND y.s = x.s
        |          GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
        |       i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
        |FROM inter i
        |JOIN sza sa ON sa.doc_id = i.doc_a
        |JOIN szb sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.7""".stripMargin)),

    // ---- dedup: index serving with committed tombstones -----------------
    // (the % 7 slice of the indexed docs is deleted after the build;
    // served pairs whose indexed side is tombstoned disappear — 2/3
    // pairs masked at sf0.001/0.01, so the arm is non-vacuous)
    Q("dedup_minhash_deleted",
      (s, d) => {
        val all = docs(s, d)
        val dir = cachedIndex("mhdel", d, p => {
          TextOps.minhashIndexWrite(all.where(col("doc_id") % 5 =!= 0), p)
          TextOps.minhashIndexDelete(s, p,
            all.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0)
              .select(col("doc_id")))
        })
        TextOps.nearDupServe(s, dir, all.where(col("doc_id") % 5 === 0))
      },
      Some(s"""WITH $TokCte,
        |dsa AS (SELECT * FROM ds WHERE doc_id % 5 <> 0),
        |dsb AS (SELECT * FROM ds WHERE doc_id % 5 = 0),
        |${minhashSigSliceSql("dsa", "a")},
        |${minhashSigSliceSql("dsb", "b")},
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bands_a a JOIN bands_b b
        |           ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash),
        |sza AS (SELECT doc_id, count(*) AS n FROM dsa GROUP BY 1),
        |szb AS (SELECT doc_id, count(*) AS n FROM dsb GROUP BY 1),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |          FROM cand c
        |          JOIN dsa x ON x.doc_id = c.doc_a
        |          JOIN dsb y ON y.doc_id = c.doc_b AND y.s = x.s
        |          GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
        |       i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
        |FROM inter i
        |JOIN sza sa ON sa.doc_id = i.doc_a
        |JOIN szb sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.7
        |  AND i.doc_a % 7 <> 0""".stripMargin)),

    // ---- dedup: pairs -> duplicate GROUPS (connected components) --------
    Q("dedup_groups",
      (s, d) => TextOps.dupGroups(
        TextOps.nearDupMinhash(docs(s, d)).select(col("doc_a"), col("doc_b"))),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte
        |SELECT doc_id, group_id FROM grp""".stripMargin)),

    // ---- dedup: standalone n-gram Jaccard with prefix blocking ----------
    Q("dedup_ngram_jaccard",
      (s, d) => TextOps.nearDupNgramJaccard(docs(s, d)),
      Some(s"""WITH $TokCte,
        |dh AS (SELECT DISTINCT doc_id, md5(s) AS h FROM ds),
        |pref AS (SELECT doc_id, h FROM (
        |  SELECT doc_id, h,
        |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rn
        |  FROM dh) WHERE rn <= 2),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM pref a JOIN pref b USING (h)
        |         WHERE a.doc_id < b.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM dh GROUP BY 1),
        |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_common
        |          FROM cand c
        |          JOIN dh a ON a.doc_id = c.doc_a
        |          JOIN dh b ON b.doc_id = c.doc_b AND b.h = a.h
        |          GROUP BY 1, 2)
        |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
        |       i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
        |FROM inter i
        |JOIN sz sa ON sa.doc_id = i.doc_a
        |JOIN sz sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.5""".stripMargin)),

    // ---- dedup: the surviving corpus after group resolution -------------
    Q("dedup_survivors",
      (s, d) => TextOps.dedupSurvivors(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |losers AS (SELECT doc_id FROM grp WHERE doc_id <> group_id)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin)),

    // ---- dedup: cluster-size histogram (the dedup data card) ------------
    Q("dedup_cluster_stats",
      (s, d) => TextOps.dupClusterStats(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |gs AS (SELECT group_id, count(*) AS cluster_size
        |       FROM grp GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters
        |FROM gs GROUP BY 1""".stripMargin)),

    // ---- dedup: per-source funnel report — the data-card companion
    // of the survivor rows (what dedup REMOVED per source) -----------
    Q("dedup_report",
      (s, d) => TextOps.dedupReport(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |losers AS (SELECT doc_id FROM grp WHERE doc_id <> group_id),
        |dt AS (SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         (doc_id IN (SELECT doc_id FROM losers)) AS dropped
        |       FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dropped,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN dropped THEN n_tok ELSE 0 END) AS BIGINT)
        |         AS tokens_dropped,
        |       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS DOUBLE)
        |         / count(*) AS drop_rate
        |FROM dt GROUP BY source""".stripMargin)),

    // ---- dedup: QUALITY-AWARE survivor choice — keep each group's
    // LONGEST member (ties -> smallest doc_id), the policy curation
    // pipelines prefer over first-seen (near-dup clusters typically
    // hold one full doc + truncated scrapes of it) ------------------
    Q("dedup_survivors_best",
      (s, d) => TextOps.dedupSurvivorsBest(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |nt AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM documents),
        |ranked AS (SELECT g.doc_id,
        |             ROW_NUMBER() OVER (PARTITION BY g.group_id
        |               ORDER BY nt.n_tokens DESC, g.doc_id) AS rk
        |           FROM grp g JOIN nt USING (doc_id)),
        |losers AS (SELECT doc_id FROM ranked WHERE rk > 1)
        |SELECT d.doc_id, d.lang, d.source FROM documents d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin)),

    // ---- dedup: cross-document LINE removal (CCNet §3.1 — the
    // boilerplate stage that strips shared chrome lines before any
    // document-level dedup): a line in >= minDf distinct docs leaves
    // ALL of them; survivors reassemble in original order. The
    // fixture wraps every doc's 10-token-run lines in boilerplate
    // head/tail lines shared corpus-wide, so exactly those must go --
    Q("text_dedup_lines",
      (s, d) => TextOps.dedupLines(lineFixture(docs(s, d))),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |fx AS (SELECT doc_id,
        |  '$LineFixtureHead' || chr(10)
        |  || array_to_string(list_transform(
        |       range(0, CAST(ceil(len(w) / 10.0) AS INT)),
        |       i -> array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ')),
        |       chr(10))
        |  || chr(10) || '$LineFixtureTail' AS text
        |  FROM w),
        |ln AS (SELECT doc_id,
        |         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_no,
        |         unnest(string_split(text, chr(10))) AS line
        |       FROM fx),
        |ldf AS (SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM ln GROUP BY 1)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CASE WHEN df < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_lines_kept,
        |       COALESCE(string_agg(CASE WHEN df < 2 THEN line END, chr(10)
        |         ORDER BY line_no), '') AS text_deduped
        |FROM ln JOIN ldf USING (line)
        |GROUP BY doc_id""".stripMargin)),

    // ---- curation: URL canonicalization — the crawl front door
    // (RefinedWeb runs URL dedup BEFORE any text dedup): scheme/host
    // case, www, default ports, trailing slashes, tracking params,
    // fragments all collapse; params sort; domain = last two labels -
    Q("text_url_canonical",
      (s, d) => TextOps.canonicalizeUrl(urlFixture(docs(s, d)))
        .select(col("doc_id"), col("url"), col("canonical_url"),
          col("domain")),
      Some(s"""WITH $UrlCanonCte
        |SELECT doc_id, url, canonical_url, domain FROM canon""".stripMargin)),

    // ---- curation: canonical-URL dedup + per-domain cap — exact
    // page dedup on the canonical key (min doc_id survives), then at
    // most 10 docs per domain (the anti-over-representation cap) ----
    Q("text_domain_cap",
      (s, d) => TextOps.capPerDomain(TextOps.urlDedup(
          TextOps.canonicalizeUrl(urlFixture(docs(s, d)))), 10)
        .select(col("doc_id"), col("canonical_url"), col("domain")),
      Some(s"""WITH $UrlCanonCte,
        |ud AS (SELECT doc_id, canonical_url, domain FROM (
        |        SELECT doc_id, canonical_url, domain,
        |               ROW_NUMBER() OVER (PARTITION BY canonical_url
        |                 ORDER BY doc_id) AS rk
        |        FROM canon) WHERE rk = 1)
        |SELECT doc_id, canonical_url, domain FROM (
        |  SELECT doc_id, canonical_url, domain,
        |         ROW_NUMBER() OVER (PARTITION BY domain
        |           ORDER BY doc_id) AS rk2
        |  FROM ud) WHERE rk2 <= 10""".stripMargin)),

    // ---- dedup: SimHash + byte-banding under the bucket cap -------------
    // (a byte band has 256 values, so its buckets fill linearly with
    // the corpus — the cap is ACTIVE on real data here, unlike the
    // minhash rows: the oracle mirrors the hub-star routing for
    // buckets over TextOps.BucketCap with one windowed count)
    Q("dedup_simhash",
      (s, d) => TextOps.nearDupSimhash(docs(s, d)),
      Some(s"""WITH $TokCte,
        |$SimhashSql,
        |bands AS (
        |  SELECT doc_id,
        |         CAST(b AS VARCHAR) || ':' || CAST((simhash // CAST(pow(256, b) AS BIGINT)) % 256 AS VARCHAR) AS band
        |  FROM shh, (SELECT unnest([0,1,2,3]) AS b)),
        |bstat AS (SELECT band, COUNT(*) AS bn, MIN(doc_id) AS hub
        |          FROM bands GROUP BY 1),
        |bx AS (SELECT b.doc_id, b.band, s.bn, s.hub
        |       FROM bands b JOIN bstat s USING (band)),
        |cand AS (SELECT DISTINCT doc_a, doc_b FROM (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bx a JOIN bx b USING (band)
        |  WHERE a.bn <= ${TextOps.BucketCap} AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT hub AS doc_a, doc_id AS doc_b FROM bx
        |  WHERE bn > ${TextOps.BucketCap} AND doc_id <> hub))
        |SELECT c.doc_a, c.doc_b, sa.simhash AS sim_a, sb.simhash AS sim_b,
        |       CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming
        |FROM cand c
        |JOIN shh sa ON sa.doc_id = c.doc_a
        |JOIN shh sb ON sb.doc_id = c.doc_b
        |WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3""".stripMargin)),

    // ---- text analysis: corpus-trained language ID ----------------------
    Q("text_langid",
      (s, d) => TextOps.langId(docs(s, d)),
      Some(s"""WITH $TokCte,
        |tokl AS (SELECT t.doc_id, t.word, dd.lang
        |         FROM tok t JOIN documents dd USING (doc_id)),
        |prof AS (SELECT lang AS cand_lang, word, count(*) AS n_lw
        |         FROM tokl GROUP BY 1, 2),
        |lsize AS (SELECT lang AS cand_lang, count(*) AS n_l
        |          FROM tokl GROUP BY 1),
        |dwc AS (SELECT doc_id, word, count(*) AS c_dw FROM tok GROUP BY 1, 2),
        |sc AS (SELECT doc_id, cand_lang, SUM(c_dw * n_lw) AS dot
        |       FROM dwc JOIN prof USING (word) GROUP BY 1, 2),
        |sc2 AS (SELECT s.doc_id, s.cand_lang, CAST(dot AS DOUBLE) / n_l AS score
        |        FROM sc s JOIN lsize USING (cand_lang)),
        |pred AS (SELECT doc_id, cand_lang AS pred_lang FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn
        |  FROM sc2) WHERE rn = 1)
        |SELECT p.doc_id, dd.lang, p.pred_lang, p.pred_lang = dd.lang AS correct
        |FROM pred p JOIN documents dd USING (doc_id)""".stripMargin),
      bench = true),

    // ---- text analysis: character-n-gram language ID --------------------
    Q("text_langid_ngram",
      (s, d) => TextOps.langIdNgram(docs(s, d)),
      Some("""WITH cs AS (
        |  SELECT doc_id, string_split(text, '') AS cs FROM documents
        |  WHERE len(string_split(text, '')) >= 3),
        |grams AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(cs) - 1),
        |           i -> cs[i] || cs[i+1] || cs[i+2])) AS g
        |  FROM cs),
        |labeled AS (SELECT gr.doc_id, gr.g, dd.lang
        |            FROM grams gr JOIN documents dd USING (doc_id)),
        |prof AS (SELECT lang AS cand_lang, g, count(*) AS n_lg
        |         FROM labeled GROUP BY 1, 2),
        |lsize AS (SELECT lang AS cand_lang, count(*) AS n_l
        |          FROM labeled GROUP BY 1),
        |dgc AS (SELECT doc_id, g, count(*) AS c_dg FROM grams GROUP BY 1, 2),
        |sc AS (SELECT doc_id, cand_lang, SUM(c_dg * n_lg) AS dot
        |       FROM dgc JOIN prof USING (g) GROUP BY 1, 2),
        |sc2 AS (SELECT s.doc_id, s.cand_lang, CAST(dot AS DOUBLE) / n_l AS score
        |        FROM sc s JOIN lsize USING (cand_lang)),
        |pred AS (SELECT doc_id, cand_lang AS pred_lang FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn
        |  FROM sc2) WHERE rn = 1)
        |SELECT p.doc_id, dd.lang, p.pred_lang, p.pred_lang = dd.lang AS correct
        |FROM pred p JOIN documents dd USING (doc_id)""".stripMargin)),

    // ---- text analysis: quality scoring ---------------------------------
    Q("text_quality",
      (s, d) => TextOps.quality(docs(s, d)),
      Some("""SELECT doc_id, lang, n_chars, n_tokens, n_distinct, n_stopwords,
        |  CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_token_len,
        |  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
        |  CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio,
        |  CASE WHEN n_tokens < 20 THEN 'too_short'
        |       WHEN n_stopwords * 4 > n_tokens THEN 'boilerplate'
        |       WHEN n_distinct * 5 < n_tokens THEN 'repetitive'
        |       ELSE 'ok' END AS quality_tier
        |FROM (SELECT doc_id, lang,
        |        CAST(length(text) AS BIGINT) AS n_chars,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |        CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |        CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS n_stopwords
        |      FROM documents)""".stripMargin)),

    // ---- curation: composed keep/drop quality gate ----------------------
    Q("text_quality_filter",
      (s, d) => TextOps.qualityFilter(docs(s, d), QfMaxChars),
      Some(s"""SELECT doc_id, lang, quality_tier, n_pii, n_chars,
        |       reasons = '' AS keep, reasons
        |FROM (
        |  SELECT doc_id, lang, quality_tier, n_pii, n_chars,
        |         concat_ws(',',
        |           CASE WHEN quality_tier <> 'ok' THEN quality_tier END,
        |           CASE WHEN n_pii > 0 THEN 'pii' END,
        |           CASE WHEN n_chars > $QfMaxChars THEN 'too_long' END) AS reasons
        |  FROM (
        |    SELECT doc_id, lang, n_chars,
        |           CASE WHEN n_tokens < 20 THEN 'too_short'
        |                WHEN n_stopwords * 4 > n_tokens THEN 'boilerplate'
        |                WHEN n_distinct * 5 < n_tokens THEN 'repetitive'
        |                ELSE 'ok' END AS quality_tier,
        |           n_emails + n_digit_runs AS n_pii
        |    FROM (SELECT doc_id, lang,
        |            CAST(length(text) AS BIGINT) AS n_chars,
        |            CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |            CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
        |            CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS n_stopwords,
        |            CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |            CAST(len(regexp_extract_all(text, '[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_digit_runs
        |          FROM documents)))""".stripMargin)),

    // ---- curation: Gopher word-statistics rules (Rae et al. A1.1) -------
    // (bounds tuned so EVERY rule is non-vacuous on the synthetic
    // corpus: at sf0.01, 43 docs fail each word-count bound, 6 fail
    // the mean-word-length bound, 276 fail the stop-word rule)
    Q("text_gopher_rules",
      (s, d) => TextOps.gopherRules(docs(s, d)),
      Some("""WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_wchars,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','be','to','of','and','that','have','with'))) AS BIGINT) AS n_stops
        |  FROM documents)
        |SELECT doc_id, n_words, n_wchars, n_stops,
        |  n_words >= 20 AS r_min_words,
        |  n_words <= 90 AS r_max_words,
        |  (n_wchars >= 4 * n_words AND n_wchars <= 10 * n_words) AS r_mean_wlen,
        |  n_stops >= 2 AS r_stops,
        |  (n_words >= 20 AND n_words <= 90
        |   AND n_wchars >= 4 * n_words AND n_wchars <= 10 * n_words
        |   AND n_stops >= 2) AS keep
        |FROM d""".stripMargin)),

    // ---- curation: benchmark decontamination (set containment) ----------
    // (the benchmark is the doc_id % DecontMod == 0 slice; containment
    // >= 8/10 of a corpus doc's distinct shingles marks contamination —
    // threshold probed non-vacuous at sf0.001/0.01/0.1: 5/2/29 docs)
    Q("dedup_decontaminate",
      (s, d) => TextOps.decontaminate(
        docs(s, d).where(col("doc_id") % DecontMod =!= 0),
        docs(s, d).where(col("doc_id") % DecontMod === 0)),
      Some(s"""WITH $TokCte,
        |bset AS (SELECT DISTINCT s FROM ds WHERE doc_id % $DecontMod = 0),
        |cs AS (SELECT doc_id, s FROM ds WHERE doc_id % $DecontMod <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1),
        |sh AS (SELECT cs.doc_id, count(*) AS n_shared
        |       FROM cs JOIN bset USING (s) GROUP BY 1)
        |SELECT z.doc_id, z.n_shingles,
        |       COALESCE(sh.n_shared, CAST(0 AS BIGINT)) AS n_shared,
        |       COALESCE(sh.n_shared, 0) * 10 >= z.n_shingles * 8 AS contaminated
        |FROM sz z LEFT JOIN sh USING (doc_id)""".stripMargin)),

    // ---- text analysis: most distinctive term (tf/df argmax) ------------
    Q("text_top_term",
      (s, d) => TextOps.topTerm(docs(s, d)),
      Some(s"""WITH $TokCte,
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, word, tf, df,
        |              CAST(tf AS DOUBLE) / df AS score
        |       FROM tf JOIN dfq USING (word))
        |SELECT doc_id, word AS top_term, tf, df, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn
        |  FROM sc) WHERE rn = 1""".stripMargin)),

    // ---- text analysis: token counting ----------------------------------
    Q("text_tokens",
      (s, d) => TextOps.tokenCounts(docs(s, d)),
      Some("""SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS word_tokens,
        |  (CAST(length(text) AS BIGINT) + 3) // 4 AS bpe_est_tokens
        |FROM documents""".stripMargin)),

    // ---- curation: PII scan + redaction ---------------------------------
    Q("text_pii_scan",
      (s, d) => TextOps.piiScan(docs(s, d)),
      Some("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_digit_runs,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9][0-9 -]{6,}[0-9]', '<NUMBER>', 'g')) AS redacted_hash
        |FROM documents""".stripMargin)),

    // ---- curation: deterministic hash-bucket train/val/test split -------
    Q("text_train_split",
      (s, d) => TextOps.trainValTestSplit(docs(s, d)),
      Some("""WITH b AS (
        |  SELECT doc_id,
        |         CAST((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS BIGINT) % 10 AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket <= 7 THEN 'train'
        |            WHEN bucket = 8 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b""".stripMargin)),

    // ---- curation: leakage-safe (dedup-group-keyed) split ---------------
    // (the assignment hash keys the near-dup group, so duplicate
    // clusters never straddle the train/eval fence; docs outside any
    // group key by their own id)
    Q("text_group_split",
      (s, d) => TextOps.groupSplit(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |keyed AS (SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS group_id
        |          FROM documents d LEFT JOIN grp g USING (doc_id)),
        |b AS (SELECT doc_id, group_id,
        |  ${saltBucketSql("'gsp:' || CAST(group_id AS VARCHAR)", 10)} AS bucket
        |  FROM keyed)
        |SELECT doc_id, group_id, bucket,
        |       ${splitCaseSql("bucket")} AS split
        |FROM b""".stripMargin)),

    // ---- curation: split-leakage audit (naive vs group-keyed) -----------
    Q("dedup_split_leakage",
      (s, d) => TextOps.splitLeakage(docs(s, d)),
      Some(s"""WITH RECURSIVE $MinhashPairsCte,
        |$ClosureCte,
        |m AS (SELECT doc_id, group_id,
        |  ${splitCaseSql(
             saltBucketSql("CAST(doc_id AS VARCHAR)", 10))} AS naive_split,
        |  ${splitCaseSql(
             saltBucketSql("'gsp:' || CAST(group_id AS VARCHAR)", 10))} AS group_split
        |  FROM grp),
        |g AS (SELECT group_id, count(*) AS n_docs,
        |        count(DISTINCT naive_split) AS nns,
        |        count(DISTINCT group_split) AS ngs
        |      FROM m GROUP BY 1)
        |SELECT count(*) AS n_groups,
        |       CAST(SUM(n_docs) AS BIGINT) AS n_docs_in_groups,
        |       CAST(SUM(CASE WHEN nns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_naive,
        |       CAST(SUM(CASE WHEN ngs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_grouped
        |FROM g""".stripMargin)),

    // ---- curation: deterministic stratified downsampling ----------------
    // (cap the dominant language at 250 permille, keep the rest; the
    // rates literal below feeds BOTH the Spark call and the oracle's
    // VALUES so the two cannot drift)
    Q("text_sample_stratified",
      (s, d) => TextOps.sampleStratified(docs(s, d), StratRates),
      Some(s"""WITH rates(lang, keep_permille) AS (VALUES $StratRatesSql),
        |h AS (
        |  SELECT doc_id, lang,
        |         CAST(((strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |             + (strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |             + (strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |             + (strpos('0123456789abcdef', substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 1000 AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT h.doc_id, h.lang, h.bucket,
        |       COALESCE(r.keep_permille, CAST(1000 AS BIGINT)) AS keep_permille
        |FROM h LEFT JOIN rates r USING (lang)
        |WHERE h.bucket < COALESCE(r.keep_permille, CAST(1000 AS BIGINT))""".stripMargin)),

    // ---- text analysis: top tf-idf term (quantized integer idf) ---------
    Q("text_tfidf_top",
      (s, d) => TextOps.tfidfTopTerm(docs(s, d)),
      Some(s"""WITH $TokCte,
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT doc_id, word, tf, df,
        |              CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf_q,
        |              tf * CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS score
        |       FROM tf JOIN dfq USING (word), nd)
        |SELECT doc_id, word AS top_term, tf, df, idf_q, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn
        |  FROM sc) WHERE rn = 1""".stripMargin)),

    // ---- curation: long-document chunking with overlap ------------------
    Q("text_chunk",
      (s, d) => TextOps.chunk(docs(s, d), ChunkMax, ChunkStride),
      Some(s"""WITH w AS (
        |  SELECT doc_id, string_split(text,' ') AS ls,
        |         CAST(len(string_split(text,' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, ls, n,
        |        1 + (CASE WHEN n > $ChunkMax
        |             THEN (n - $ChunkMax + $ChunkStride - 1) // $ChunkStride
        |             ELSE 0 END) AS n_chunks
        |      FROM w),
        |ch AS (SELECT doc_id, n, ls, unnest(range(n_chunks)) AS chunk_id FROM c)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |       chunk_id * $ChunkStride AS start_tok,
        |       LEAST(CAST($ChunkMax AS BIGINT), n - chunk_id * $ChunkStride)
        |         AS n_chunk_tokens,
        |       md5(array_to_string(
        |         ls[chunk_id*$ChunkStride + 1 :
        |            chunk_id*$ChunkStride + LEAST($ChunkMax, n - chunk_id*$ChunkStride)], ' '))
        |         AS chunk_hash
        |FROM ch""".stripMargin)),

    // ---- curation: greedy contiguous sequence packing -------------------
    // (the oracle replays the per-shard sequential recurrence with a
    // recursive CTE; budget/shard constants are shared via PackBudget /
    // PackShard so the two sides cannot drift)
    Q("text_seq_pack",
      (s, d) => TextOps.seqPack(docs(s, d), PackBudget, PackShard),
      Some(s"""WITH RECURSIVE $SeqPackCte
        |SELECT doc_id, lang, shard, n_tokens, pack_id, pack_fill
        |FROM rec""".stripMargin)),

    // ---- curation: packing-efficiency data card -------------------------
    // (what the chosen token budget costs: packs per language, exact
    // fill permille, oversized-doc count; shares SeqPackCte with
    // text_seq_pack so the pack assignment cannot drift)
    Q("text_pack_report",
      (s, d) => TextOps.packReport(docs(s, d), PackBudget, PackShard),
      Some(s"""WITH RECURSIVE $SeqPackCte,
        |ps AS (SELECT lang, shard, MAX(pack_id) + 1 AS n_packs,
        |              count(*) AS n_docs,
        |              CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |              CAST(SUM(CASE WHEN n_tokens > $PackBudget THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize
        |       FROM rec GROUP BY 1, 2),
        |pl AS (SELECT lang,
        |              CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        |              CAST(SUM(n_packs) AS BIGINT) AS n_packs,
        |              CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |              CAST(SUM(n_oversize) AS BIGINT) AS n_oversize
        |       FROM ps GROUP BY 1)
        |SELECT lang, n_docs, n_packs, total_tokens, n_oversize,
        |       n_packs * $PackBudget AS capacity,
        |       total_tokens * 1000 // (n_packs * $PackBudget) AS fill_permille
        |FROM pl""".stripMargin)),

    // ---- text analysis: exact rank-selection length quantiles -----------
    Q("text_length_quantiles",
      (s, d) => TextOps.lengthQuantiles(docs(s, d)),
      Some("""WITH r AS (
        |  SELECT lang, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY lang
        |           ORDER BY n_chars, doc_id) AS rn
        |  FROM documents),
        |c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT r.lang, c.n_docs,
        |  MAX(CASE WHEN rn = (n_docs + 1) // 2 THEN n_chars END) AS p50_chars,
        |  MAX(CASE WHEN rn = (9 * n_docs + 9) // 10 THEN n_chars END) AS p90_chars,
        |  MAX(CASE WHEN rn = (99 * n_docs + 99) // 100 THEN n_chars END) AS p99_chars
        |FROM r JOIN c USING (lang) GROUP BY 1, 2""".stripMargin)),

    // ---- text analysis: sketch length quantiles — the production
    // default at scale; the driver-checked contract is the rank error
    // bound (the an_approx_distinct pattern), since the estimate itself
    // is engine-specific --------------------------------------------------
    Q("text_length_quantiles_approx",
      (s, d) => TextOps.lengthQuantilesApprox(docs(s, d)),
      Some("""SELECT lang, CAST(p.pct AS DOUBLE) AS pct,
        |       COUNT(*) AS n_docs, TRUE AS within_bound
        |FROM documents, (SELECT unnest([0.5, 0.9, 0.99]) AS pct) p
        |GROUP BY lang, p.pct""".stripMargin)),

    // ---- text analysis: vocabulary heavy hitters — frequent-items
    // sketch with the deterministic containment half as the contract
    // (every exact heavy hitter must be in the sketch set) ----------------
    Q("text_heavy_hitters",
      (s, d) => TextOps.heavyHitters(docs(s, d)),
      Some("""WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |tot AS (SELECT COUNT(*) AS n_tokens FROM tok),
        |hh AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY 1
        |       HAVING COUNT(*) > 0.01 * (SELECT n_tokens FROM tot))
        |SELECT (SELECT n_tokens FROM tot) AS n_tokens,
        |       (SELECT COUNT(*) FROM hh) AS n_true_hh,
        |       TRUE AS all_found""".stripMargin)),

    // ---- curation: Gopher repetition signals ----------------------------
    // (token-level: the corpus has no line structure, so the per-line
    // members of the Gopher family would be vacuous here)
    Q("text_repetition",
      (s, d) => TextOps.repetition(docs(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 3),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ls)),
        |         i -> ls[i] || ' ' || ls[i+1])) AS b FROM w),
        |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(ls)-1),
        |         i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS t FROM w),
        |bgc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
        |bga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |               CAST(max(c) AS BIGINT) AS top_bigram_c
        |        FROM bgc GROUP BY 1),
        |tgc AS (SELECT doc_id, t, count(*) AS c FROM tg GROUP BY 1, 2),
        |tga AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
        |               CAST(count(*) AS BIGINT) AS n_distinct_trigrams
        |        FROM tgc GROUP BY 1)
        |SELECT b.doc_id, b.n_bigrams, b.top_bigram_c,
        |       CAST(b.top_bigram_c AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
        |       t.n_trigrams, t.n_distinct_trigrams,
        |       CAST(t.n_trigrams - t.n_distinct_trigrams AS DOUBLE) / t.n_trigrams
        |         AS dup_trigram_frac
        |FROM bga b JOIN tga t USING (doc_id)""".stripMargin)),

    // ---- curation: bigram-LM cross-entropy (CCNet perplexity filter) ----
    // (self-trained corpus bigram model; -log2 P(rhs|lhs) quantized to
    // the integer bit length of c_lhs div c_ab — exact in both engines)
    Q("text_lm_score",
      (s, d) => TextOps.lmScore(docs(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM bs GROUP BY 1, 2, 3),
        |lm AS (SELECT lhs, rhs, CAST(sum(k) AS BIGINT) AS c_ab
        |       FROM db GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1)
        |SELECT doc_id, CAST(sum(k * q) AS BIGINT) AS nll_sum,
        |       CAST(sum(k) AS BIGINT) AS n_bigrams,
        |       CAST(sum(k * q) AS DOUBLE) / sum(k) AS avg_nll
        |FROM (SELECT doc_id, k,
        |        CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |      FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |GROUP BY 1""".stripMargin)),

    // ---- curation: cross-corpus LM scoring (serving half) ---------------
    // (model trained on the trusted slice only, raw docs scored under
    // it — the CCNet deployment shape; inner-join semantics: bigrams
    // the model never observed contribute nothing, n_bigrams counts
    // SCORED occurrences)
    Q("text_lm_cross",
      (s, d) => {
        val all = docs(s, d)
        TextOps.lmScoreWith(
          all.where(col("source") =!= DsirTarget),
          TextOps.lmModel(all.where(col("source") === DsirTarget)))
      },
      Some(s"""WITH wt AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents
        |       WHERE source = '$DsirTarget'
        |         AND len(string_split(text,' ')) >= 2),
        |bt AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM wt),
        |lm AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM (SELECT ls[i] AS lhs, ls[i+1] AS rhs FROM bt)
        |       GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |wr AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents
        |       WHERE source <> '$DsirTarget'
        |         AND len(string_split(text,' ')) >= 2),
        |br AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM wr),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM br GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(sum(k * q) AS BIGINT) AS nll_sum,
        |       CAST(sum(k) AS BIGINT) AS n_bigrams,
        |       CAST(sum(k * q) AS DOUBLE) / sum(k) AS avg_nll
        |FROM (SELECT doc_id, k,
        |        CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |      FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |GROUP BY 1""".stripMargin)),

    // ---- curation: cross-corpus LM scoring with STUPID BACKOFF ----------
    // (Brants et al. 2007: unseen bigrams pay alpha * unigram cost,
    // alpha = 0.4 rendered exactly as 5/2 — EVERY >= 2-token doc of
    // the raw slice scores, with its backed-off mass reported, where
    // text_lm_cross's inner join silently drops unseen transitions)
    Q("text_lm_backoff",
      (s, d) => {
        val all = docs(s, d)
        TextOps.lmScoreBackoff(
          all.where(col("source") =!= DsirTarget),
          TextOps.lmModel(all.where(col("source") === DsirTarget)))
      },
      Some(s"""WITH wt AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents
        |       WHERE source = '$DsirTarget'
        |         AND len(string_split(text,' ')) >= 2),
        |bt AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM wt),
        |lm AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM (SELECT ls[i] AS lhs, ls[i+1] AS rhs FROM bt)
        |       GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |uni AS (SELECT rhs, CAST(sum(c_ab) AS BIGINT) AS c_rhs
        |        FROM lm GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_total FROM lm),
        |wr AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents
        |       WHERE source <> '$DsirTarget'
        |         AND len(string_split(text,' ')) >= 2),
        |br AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM wr),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM br GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(sum(k * q) AS BIGINT) AS nll_sum,
        |       CAST(sum(k) AS BIGINT) AS n_bigrams,
        |       CAST(sum(bk) AS BIGINT) AS n_backoff,
        |       CAST(sum(k * q) AS DOUBLE) / sum(k) AS avg_nll
        |FROM (SELECT d.doc_id, d.k,
        |        CASE WHEN l.c_ab IS NOT NULL
        |             THEN CAST(length(bin(c.c_lhs // l.c_ab)) - 1 AS BIGINT)
        |             ELSE CAST(length(bin((t.n_total * 5) // ((COALESCE(u.c_rhs, 0) + 1) * 2))) - 1 AS BIGINT) END AS q,
        |        CASE WHEN l.c_ab IS NULL THEN d.k ELSE CAST(0 AS BIGINT) END AS bk
        |      FROM db d
        |      LEFT JOIN lm l ON l.lhs = d.lhs AND l.rhs = d.rhs
        |      LEFT JOIN ctx c ON c.lhs = d.lhs
        |      LEFT JOIN uni u ON u.rhs = d.rhs
        |      CROSS JOIN tot t)
        |GROUP BY 1""".stripMargin)),

    // ---- curation: CCNet perplexity buckets (head/middle/tail) ---------
    // every scored doc's EXACT global perplexity rank (distributed:
    // order-aligned score-floor shards + in-shard windows + tiny
    // offset frame — no single-partition corpus window) and the
    // explicit as-even-as-possible bucket floor((rank-1)*3/N)+1; the
    // oracle replays rank and formula over the same LM scores -------
    Q("text_ppl_buckets",
      (s, d) => TextOps.pplBuckets(docs(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM bs GROUP BY 1, 2, 3),
        |lm AS (SELECT lhs, rhs, CAST(sum(k) AS BIGINT) AS c_ab
        |       FROM db GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |sc AS (SELECT doc_id,
        |         CAST(sum(k * q) AS DOUBLE) / sum(k) AS avg_nll
        |       FROM (SELECT doc_id, k,
        |               CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |             FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |       GROUP BY 1),
        |r AS (SELECT doc_id, avg_nll,
        |        ROW_NUMBER() OVER (ORDER BY avg_nll, doc_id) AS ppl_rank,
        |        COUNT(*) OVER () AS n
        |      FROM sc)
        |SELECT doc_id, avg_nll, CAST(ppl_rank AS BIGINT) AS ppl_rank,
        |       CAST((ppl_rank - 1) * 3 // n + 1 AS INTEGER) AS bucket
        |FROM r""".stripMargin)),

    // ---- curation: DSIR hashed-ngram importance weights -----------------
    // (target side = source 'src0', the trusted slice; raw docs scored
    // by quantized log p_t(f) - log p_r(f) over 1024 hashed buckets)
    Q("text_dsir_weight",
      (s, d) => TextOps.dsirWeight(docs(s, d), DsirTarget, DsirBuckets),
      Some(s"""WITH w AS (SELECT doc_id, source, string_split(text,' ') AS ls
        |       FROM documents),
        |f AS (SELECT doc_id, source, unnest(list_concat(
        |        list_transform(ls, t -> 'u:' || t),
        |        list_transform(range(1, len(ls)),
        |          i -> 'b:' || ls[i] || ' ' || ls[i+1]))) AS f
        |      FROM w),
        |pd AS (SELECT doc_id, source,
        |         CAST(((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 4096
        |             + (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1) * 256
        |             + (strpos('0123456789abcdef', substr(md5(f), 3, 1)) - 1) * 16
        |             + (strpos('0123456789abcdef', substr(md5(f), 4, 1)) - 1))
        |           % $DsirBuckets AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS k
        |       FROM f GROUP BY 1, 2, 3),
        |dist AS (SELECT bucket,
        |           CAST(length(bin(CAST(sum(CASE WHEN source = '$DsirTarget'
        |             THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_t,
        |           CAST(length(bin(CAST(sum(CASE WHEN source <> '$DsirTarget'
        |             THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_r
        |         FROM pd GROUP BY 1)
        |SELECT doc_id, CAST(sum(k * (qlog_t - qlog_r)) AS BIGINT) AS w_sum,
        |       CAST(sum(k) AS BIGINT) AS n_feats,
        |       CAST(sum(k * (qlog_t - qlog_r)) AS DOUBLE) / sum(k) AS avg_weight
        |FROM pd JOIN dist USING (bucket)
        |WHERE source <> '$DsirTarget'
        |GROUP BY 1""".stripMargin)),

    // ---- curation: cross-corpus DSIR scoring (serving half) -------------
    // (distribution trained on the {src0, src1} subset only, every
    // other source scored under it — the deployment shape where the
    // model predates the corpus. Unlike the LM's inner join, unseen
    // buckets score 0 via the LEFT-join coalesce arm: both sides
    // smooth to count 1, so the doc keeps its row and n_feats counts
    // ALL its occurrences, scored or not)
    Q("text_dsir_cross",
      (s, d) => {
        val all = docs(s, d)
        TextOps.dsirWeightWith(
          all.where(!col("source").isin(DsirTarget, DsirCrossRaw)),
          TextOps.dsirDist(
            all.where(col("source").isin(DsirTarget, DsirCrossRaw)),
            DsirTarget, DsirBuckets),
          DsirTarget, DsirBuckets)
      },
      Some(s"""WITH w AS (SELECT doc_id, source, string_split(text,' ') AS ls
        |       FROM documents),
        |f AS (SELECT doc_id, source, unnest(list_concat(
        |        list_transform(ls, t -> 'u:' || t),
        |        list_transform(range(1, len(ls)),
        |          i -> 'b:' || ls[i] || ' ' || ls[i+1]))) AS f
        |      FROM w),
        |pd AS (SELECT doc_id, source,
        |         CAST(((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 4096
        |             + (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1) * 256
        |             + (strpos('0123456789abcdef', substr(md5(f), 3, 1)) - 1) * 16
        |             + (strpos('0123456789abcdef', substr(md5(f), 4, 1)) - 1))
        |           % $DsirBuckets AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS k
        |       FROM f GROUP BY 1, 2, 3),
        |dist AS (SELECT bucket,
        |           CAST(length(bin(CAST(sum(CASE WHEN source = '$DsirTarget'
        |             THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_t,
        |           CAST(length(bin(CAST(sum(CASE WHEN source = '$DsirCrossRaw'
        |             THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_r
        |         FROM pd WHERE source IN ('$DsirTarget', '$DsirCrossRaw')
        |         GROUP BY 1)
        |SELECT doc_id,
        |       CAST(sum(k * (COALESCE(qlog_t, 0) - COALESCE(qlog_r, 0)))
        |         AS BIGINT) AS w_sum,
        |       CAST(sum(k) AS BIGINT) AS n_feats,
        |       CAST(sum(k * (COALESCE(qlog_t, 0) - COALESCE(qlog_r, 0)))
        |         AS DOUBLE) / sum(k) AS avg_weight
        |FROM pd LEFT JOIN dist USING (bucket)
        |WHERE source NOT IN ('$DsirTarget', '$DsirCrossRaw')
        |GROUP BY 1""".stripMargin)),

    // ---- curation: supervised NB quality classifier — the
    // DISCRIMINATIVE selector next to the generative ones (LM
    // perplexity, DSIR): train on a labeled positive slice vs a
    // labeled negative slice (the GPT-3 "Wikipedia-referenced vs
    // random crawl" recipe), argmax-classify every OTHER source.
    // Laplace smoothing + bit-length-quantized logs keep both class
    // scores exact BIGINTs; unseen words smooth to qlog2(1) = 0 —
    // the LEFT-join coalesce IS the smoothing, not a special case ---
    Q("text_nb_filter",
      (s, d) => TextOps.nbClassify(docs(s, d), DsirTarget,
        DsirCrossRaw),
      Some(s"""WITH $NbScoreSql
        |SELECT doc_id, n_tokens, score_p, score_n, pred, margin
        |FROM nbs""".stripMargin)),

    // ---- curation: classifier calibration card --------------------------
    // (margin-concentration histogram: how decisive the NB classifier
    // is, per predicted class, bucketed by the sign-split bit length
    // of the integer score difference — the data card read before
    // choosing a keep threshold; shares NbScoreSql with the filter
    // row so the scoring cannot drift)
    Q("text_nb_calibration",
      (s, d) => TextOps.nbCalibration(docs(s, d), DsirTarget,
        DsirCrossRaw),
      Some(s"""WITH $NbScoreSql
        |SELECT pred,
        |  CAST(CASE WHEN score_p - score_n = 0 THEN 0
        |       ELSE (CASE WHEN score_p > score_n THEN 1 ELSE -1 END)
        |            * (length(bin(abs(score_p - score_n))) - 1) END
        |    AS BIGINT) AS qband,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM nbs GROUP BY 1, 2""".stripMargin)),

    // ---- dedup: cross-document duplicated-span fraction -----------------
    // (the substring-level signal whole-doc near-dup misses: a trigram
    // occurrence is duplicated iff its shingle appears in >= 2 docs)
    Q("dedup_ngram_spans",
      (s, d) => TextOps.dupNgramSpans(docs(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 3),
        |raw AS (SELECT doc_id, unnest(list_transform(range(1, len(ls)-1),
        |          i -> ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2])) AS s FROM w),
        |occ AS (SELECT doc_id, s, count(*) AS c FROM raw GROUP BY 1, 2),
        |dfq AS (SELECT s, CAST(count(*) AS BIGINT) AS nd FROM occ GROUP BY 1),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams
        |        FROM occ GROUP BY 1),
        |dup AS (SELECT o.doc_id, CAST(sum(o.c) AS BIGINT) AS n_dup_grams
        |        FROM occ o JOIN dfq USING (s) WHERE nd >= 2 GROUP BY 1)
        |SELECT t.doc_id, t.n_grams,
        |       COALESCE(d.n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
        |       CAST(COALESCE(d.n_dup_grams, 0) AS DOUBLE) / t.n_grams AS dup_frac
        |FROM tot t LEFT JOIN dup d USING (doc_id)""".stripMargin)),

    // ---- dedup: exact duplicated-substring REMOVAL (Lee et al. 2022) ----
    // (the excising twin of dedup_ngram_spans: every token covered by
    // a cross-doc duplicated 3-token run is removed, the smallest
    // doc_id containing the shingle keeping its copies; positions are
    // 0-based in Spark and 1-based in the CTE — internal only, the
    // compared columns are counts and the rebuilt text)
    Q("dedup_span_removal",
      (s, d) => TextOps.dedupSpans(docs(s, d), minTokens = 3),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents),
        |ws AS (SELECT doc_id, ls, unnest(range(1, len(ls) - 1)) AS i
        |       FROM w WHERE len(ls) >= 3),
        |occ AS (SELECT doc_id, i AS pos,
        |          ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2] AS s
        |        FROM ws),
        |stats AS (SELECT s, count(DISTINCT doc_id) AS df,
        |            min(doc_id) AS min_doc
        |          FROM occ GROUP BY 1),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |          SELECT o.doc_id, unnest(range(o.pos, o.pos + 3)) AS pos
        |          FROM occ o JOIN stats USING (s)
        |          WHERE df >= 2 AND o.doc_id <> min_doc)),
        |ts AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        |       FROM w),
        |toks AS (SELECT doc_id, i AS pos, ls[i] AS tok FROM ts),
        |kept AS (SELECT t.doc_id, t.pos, t.tok
        |         FROM toks t LEFT JOIN cov c USING (doc_id, pos)
        |         WHERE c.pos IS NULL),
        |seg AS (SELECT doc_id, CASE WHEN pos - lag(pos) OVER
        |            (PARTITION BY doc_id ORDER BY pos) > 1
        |          THEN 1 ELSE 0 END AS brk
        |        FROM kept),
        |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(tok, ' ' ORDER BY pos) AS text_clean
        |        FROM kept GROUP BY 1),
        |segc AS (SELECT doc_id, CAST(1 + sum(brk) AS BIGINT) AS n_segments
        |         FROM seg GROUP BY 1)
        |SELECT w.doc_id, CAST(len(ls) AS BIGINT) AS n_tokens,
        |       CAST(len(ls) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
        |       COALESCE(n_segments, CAST(0 AS BIGINT)) AS n_segments,
        |       COALESCE(text_clean, '') AS text_clean,
        |       CAST(len(ls) - COALESCE(n_kept, 0) AS DOUBLE) / len(ls)
        |         AS removed_frac
        |FROM w LEFT JOIN reb USING (doc_id) LEFT JOIN segc USING (doc_id)"""
        .stripMargin)),

    // ---- curation: WITHIN-doc repeated-span removal (Gopher cleanup) ----
    // (the excising twin of text_repetition's measured signals: a
    // 3-token run a document repeats internally keeps its FIRST
    // occurrence — min start position — and every later occurrence's
    // cover excises; same output contract as dedup_span_removal)
    Q("text_clean_repetition",
      (s, d) => TextOps.cleanRepetition(docs(s, d), minTokens = 3),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents),
        |ws AS (SELECT doc_id, ls, unnest(range(1, len(ls) - 1)) AS i
        |       FROM w WHERE len(ls) >= 3),
        |occ AS (SELECT doc_id, i AS pos,
        |          ls[i] || ' ' || ls[i+1] || ' ' || ls[i+2] AS s
        |        FROM ws),
        |stats AS (SELECT doc_id, s, count(*) AS c, min(pos) AS min_pos
        |          FROM occ GROUP BY 1, 2),
        |cov AS (SELECT DISTINCT doc_id, pos FROM (
        |          SELECT o.doc_id, unnest(range(o.pos, o.pos + 3)) AS pos
        |          FROM occ o JOIN stats USING (doc_id, s)
        |          WHERE c >= 2 AND o.pos <> min_pos)),
        |ts AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        |       FROM w),
        |toks AS (SELECT doc_id, i AS pos, ls[i] AS tok FROM ts),
        |kept AS (SELECT t.doc_id, t.pos, t.tok
        |         FROM toks t LEFT JOIN cov c USING (doc_id, pos)
        |         WHERE c.pos IS NULL),
        |seg AS (SELECT doc_id, CASE WHEN pos - lag(pos) OVER
        |            (PARTITION BY doc_id ORDER BY pos) > 1
        |          THEN 1 ELSE 0 END AS brk
        |        FROM kept),
        |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(tok, ' ' ORDER BY pos) AS text_clean
        |        FROM kept GROUP BY 1),
        |segc AS (SELECT doc_id, CAST(1 + sum(brk) AS BIGINT) AS n_segments
        |         FROM seg GROUP BY 1)
        |SELECT w.doc_id, CAST(len(ls) AS BIGINT) AS n_tokens,
        |       CAST(len(ls) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
        |       COALESCE(n_segments, CAST(0 AS BIGINT)) AS n_segments,
        |       COALESCE(text_clean, '') AS text_clean,
        |       CAST(len(ls) - COALESCE(n_kept, 0) AS DOUBLE) / len(ls)
        |         AS removed_frac
        |FROM w LEFT JOIN reb USING (doc_id) LEFT JOIN segc USING (doc_id)"""
        .stripMargin)),

    // ---- curation: deterministic sharded corpus shuffle -----------------
    // (the pre-training randomization: global order = (shard,
    // pos_in_shard); no single global row_number at 100 TB)
    Q("text_global_shuffle",
      (s, d) => TextOps.globalShuffle(docs(s, d)),
      Some("""WITH h AS (SELECT doc_id,
        |         md5('shuf:' || CAST(doc_id AS VARCHAR)) AS salt
        |       FROM documents),
        |s AS (SELECT doc_id, salt,
        |  CAST(((strpos('0123456789abcdef', substr(salt,1,1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(salt,2,1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(salt,3,1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(salt,4,1)) - 1)) % 64 AS BIGINT)
        |    AS shard
        |  FROM h)
        |SELECT doc_id, salt, shard,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |         ORDER BY salt, doc_id) AS BIGINT) AS pos_in_shard
        |FROM s""".stripMargin)),

    // ---- curation: data-driven source-mixture rebalance -----------------
    // (rates DERIVED from measured token mass vs target shares; the
    // share literal places src0 above natural mass -> capped at 1000,
    // src1..15 below -> trimmed, src16..19 unlisted -> dropped)
    Q("text_mix_rebalance",
      (s, d) => TextOps.mixRebalance(docs(s, d), MixShares),
      Some(s"""WITH sh(source, share_permille) AS (VALUES $MixSharesSql),
        |t AS (SELECT doc_id, source,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |bs AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS source_tokens
        |       FROM t GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM t),
        |r AS (SELECT bs.source,
        |        LEAST(CAST(1000 AS BIGINT),
        |          CAST((CAST(total_tokens AS HUGEINT) * share_permille // 1000)
        |            * 1000 // source_tokens AS BIGINT))
        |          AS keep_permille
        |      FROM bs JOIN sh USING (source), tt),
        |b AS (SELECT t.*, r.keep_permille,
        |        CAST(((strpos('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 1000 AS BIGINT) AS bucket
        |      FROM t JOIN r USING (source))
        |SELECT doc_id, source, n_tokens, bucket, keep_permille
        |FROM b WHERE bucket < keep_permille""".stripMargin)),

    // ---- corpus data card: the per-source release artifact --------------
    Q("text_corpus_report",
      (s, d) => TextOps.corpusReport(docs(s, d)),
      Some("""WITH t AS (SELECT source, lang,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |        CAST(length(text) AS BIGINT) AS n_chars
        |      FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(n_tokens) AS BIGINT) AS min_tokens,
        |  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
        |  CAST(sum(CASE WHEN n_tokens < 5 THEN 1 ELSE 0 END) * 1000
        |    // count(*) AS BIGINT) AS short_permille
        |FROM t GROUP BY source""".stripMargin)),

    // ---- curation front door: HTML/boilerplate extraction ---------------
    // The markup fixture is DERIVED deterministically from documents
    // on BOTH sides (wrap each 10-token run in <p>..&amp; more</p>
    // between nav/script/style/list chrome), so the oracle replays
    // fixture generation AND the whole strip->break->decode->density
    // chain in DuckDB string functions.
    Q("text_extract_html",
      (s, d) => TextOps.extractHtml(htmlFixture(docs(s, d))),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  '$HtmlFixtureHead'
        |  || array_to_string(list_transform(
        |       range(0, CAST(ceil(len(w) / 10.0) AS INT)),
        |       i -> '<p>' || array_to_string(list_slice(w, i*10 + 1, i*10 + 10), ' ')
        |            || ' &amp; more</p>'), '')
        |  || '$HtmlFixtureTail' AS html
        |  FROM w),
        |e1 AS (SELECT doc_id, regexp_replace(html,
        |         '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM h),
        |e2 AS (SELECT doc_id, regexp_replace(x,
        |         '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM e1),
        |e3 AS (SELECT doc_id, regexp_replace(x,
        |         '(?i)<(br|/p|/div|/li|/ul|/nav|/title|/h[1-6]|/tr)[^>]*>',
        |         chr(10), 'g') AS x FROM e2),
        |e4 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'g') AS x
        |       FROM e3),
        |e5 AS (SELECT doc_id, replace(replace(replace(replace(replace(x,
        |         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |         '&nbsp;', ' '), '&amp;', '&') AS x FROM e4),
        |ln AS (SELECT doc_id,
        |  list_filter(list_transform(string_split(x, chr(10)),
        |    l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))),
        |    l -> l <> '') AS lines FROM e5),
        |kp AS (SELECT doc_id, lines,
        |  list_filter(lines, l -> len(string_split(l, ' ')) >= 4) AS kept
        |  FROM ln)
        |SELECT doc_id,
        |  array_to_string(kept, chr(10)) AS text_extracted,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS n_chars
        |FROM kp""".stripMargin)),

    // ---- THE unified curation pipeline: extract -> dedup -> langid ->
    // quality -> span excision -> LM gate -> temperature mix -> pack,
    // composed from the individually-oracle-checked operators with
    // every stage's survivors pinned once (corpus read once). The
    // oracle replays the ENTIRE chain; every selection stage is
    // non-vacuous at sf0.01 AND sf0.1 (measured: 500->499->176->172->
    // 172(2 docs excised)->112->66 and 5000->4966->1019->950->949(one
    // doc fully excised)->236->187). ---------------------------------------
    Q("text_curate_e2e",
      (s, d) => TextOps.curate(htmlFixture(docs(s, d)),
        spanK = CurateSpanK, lmKeepMilli = CurateLmMilli,
        maxChars = QfMaxChars, packBudget = PackBudget,
        packShard = PackShard),
      Some(CurateCtes + s""",
        |ptoks AS (SELECT doc_id, lang, doc_id // $PackShard AS shard,
        |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM d7),
        |ord AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn FROM ptoks),
        |rec AS (
        |  SELECT lang, shard, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS pack_id, n_tokens AS pack_fill
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.lang, o.shard, o.doc_id, o.n_tokens, o.rn,
        |         CASE WHEN r.pack_fill + o.n_tokens > $PackBudget THEN r.pack_id + 1 ELSE r.pack_id END,
        |         CASE WHEN r.pack_fill + o.n_tokens > $PackBudget THEN o.n_tokens ELSE r.pack_fill + o.n_tokens END
        |  FROM rec r JOIN ord o ON o.lang = r.lang AND o.shard = r.shard AND o.rn = r.rn + 1)
        |SELECT doc_id, lang, shard, n_tokens, pack_id, pack_fill
        |FROM rec""".stripMargin)),

    // ---- curation funnel report: per-stage doc count + token mass -------
    Q("text_curate_report",
      (s, d) => TextOps.curateReport(htmlFixture(docs(s, d)),
        spanK = CurateSpanK, lmKeepMilli = CurateLmMilli,
        maxChars = QfMaxChars),
      Some(CurateCtes + """
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_id, 'extract' AS stage,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) AS n_tokens FROM d1
        |  UNION ALL SELECT 2, 'dedup_exact', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d2
        |  UNION ALL SELECT 3, 'langid', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d3
        |  UNION ALL SELECT 4, 'quality', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d4
        |  UNION ALL SELECT 5, 'span_excise', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d5
        |  UNION ALL SELECT 6, 'lm_gate', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d6
        |  UNION ALL SELECT 7, 'mix', CAST(count(*) AS BIGINT),
        |    CAST(COALESCE(SUM(len(string_split(text,' '))), 0) AS BIGINT) FROM d7
        |)""".stripMargin)),

    // ---- temperature mixing: p_s ~ n_s^(1/2) (mT5/XLM-R, tau = 2) -------
    // The integer square root is candidate-corrected on BOTH sides:
    // the IEEE POWER seed can land either side of the true root and
    // the engines disagree on double->bigint rounding (Spark
    // truncates, DuckDB rounds), so each picks the largest t in
    // [g-2, g+2] with t*t <= n_s — bit-identical despite the seed.
    Q("text_mix_temperature",
      (s, d) => TextOps.mixTemperature(docs(s, d), q = 2),
      Some("""WITH t AS (SELECT doc_id, source,
        |        CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |bs AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS source_tokens
        |       FROM t GROUP BY 1),
        |rt AS (SELECT source, source_tokens,
        |         list_max(list_filter([g - 2, g - 1, g, g + 1, g + 2],
        |           x -> x >= 1 AND CAST(x AS HUGEINT) * x <= source_tokens)) AS t_s
        |       FROM (SELECT source, source_tokens,
        |               CAST(POWER(CAST(source_tokens AS DOUBLE), 0.5) AS BIGINT) AS g
        |             FROM bs)),
        |tt AS (SELECT CAST(sum(t_s) AS BIGINT) AS tot_t FROM rt),
        |bb AS (SELECT MIN(CAST(CAST(source_tokens AS HUGEINT) * tot_t // t_s
        |         AS BIGINT)) AS budget FROM rt, tt),
        |r AS (SELECT source,
        |        LEAST(CAST(1000 AS BIGINT),
        |          CAST(CAST(budget AS HUGEINT) * t_s * 1000
        |            // (CAST(tot_t AS HUGEINT) * source_tokens) AS BIGINT))
        |          AS keep_permille
        |      FROM rt, tt, bb),
        |b AS (SELECT t.*, r.keep_permille,
        |        CAST(((strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        |            + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        |            + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5('mixt:' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 1000 AS BIGINT) AS bucket
        |      FROM t JOIN r USING (source))
        |SELECT doc_id, source, n_tokens, bucket, keep_permille
        |FROM b WHERE bucket < keep_permille""".stripMargin)),

    // ---- tokenizer training: df-pruned vocabulary build -----------------
    // (max-df 39/50 = 78% sits inside this corpus' df cluster, so the
    // ceiling genuinely prunes ~half the vocabulary at the test SFs;
    // the min-df floor is exercised in TextOpsSpec — no hapax exists
    // in the synthetic corpus)
    Q("text_vocab",
      (s, d) => TextOps.vocabBuild(docs(s, d),
        minDf = 2, maxDfNum = 39, maxDfDen = 50),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
        |dw AS (SELECT doc_id, word, count(*) AS c_dw FROM tok GROUP BY 1, 2),
        |ws AS (SELECT word, CAST(sum(c_dw) AS BIGINT) AS tf,
        |              CAST(count(*) AS BIGINT) AS df
        |       FROM dw GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |pruned AS (SELECT word, tf, df FROM ws, nd
        |           WHERE df >= 2 AND df * 50 <= n_docs * 39)
        |SELECT * FROM (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, word) AS BIGINT)
        |           AS "rank", word, tf, df
        |  FROM pruned) WHERE "rank" <= 1000""".stripMargin)),

    // ---- curation export: vocabulary id-encoding ------------------------
    // (the terminal export step: tokens map to their df-pruned vocab
    // rank, OOV -> 0; the per-doc id SEQUENCE is pinned by an md5 of
    // the comma-joined ids — order-sensitive, so a scrambled or
    // misaligned encode cannot hash-match)
    Q("text_vocab_encode",
      (s, d) => TextOps.vocabEncode(docs(s, d),
        minDf = 2, maxDfNum = 39, maxDfDen = 50),
      Some("""WITH tokp AS (
        |  SELECT doc_id, i AS pos, ls[i] AS word
        |  FROM (SELECT doc_id, string_split(text,' ') AS ls,
        |          unnest(range(1, len(string_split(text,' ')) + 1)) AS i
        |        FROM documents)),
        |dw AS (SELECT doc_id, word, count(*) AS c_dw FROM tokp GROUP BY 1, 2),
        |ws AS (SELECT word, CAST(sum(c_dw) AS BIGINT) AS tf,
        |              CAST(count(*) AS BIGINT) AS df
        |       FROM dw GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |pruned AS (SELECT word, tf, df FROM ws, nd
        |           WHERE df >= 2 AND df * 50 <= n_docs * 39),
        |ids AS (SELECT word, CAST(ROW_NUMBER() OVER
        |          (ORDER BY tf DESC, word) AS BIGINT) AS id
        |        FROM pruned QUALIFY id <= 1000)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN ids.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       md5(string_agg(CAST(COALESCE(ids.id, 0) AS VARCHAR), ','
        |         ORDER BY pos)) AS ids_hash
        |FROM tokp LEFT JOIN ids USING (word)
        |GROUP BY doc_id""".stripMargin)),

    // ---- text analysis: collocation detection by quantized PMI ----
    // (the word2vec phrase-merging signal; c_ab*N runs in
    // DECIMAL(38,0)/HUGEINT — ~1e26 at corpus scale; sub-1 ratios
    // collapse to pmi_q = -1) ---------------------------------------
    Q("text_phrase_pmi",
      (s, d) => TextOps.phrasePmi(docs(s, d)),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |lm AS (SELECT ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS c_ab
        |       FROM bs GROUP BY 1, 2),
        |uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c_u FROM (
        |        SELECT unnest(string_split(text,' ')) AS word
        |        FROM documents) GROUP BY 1),
        |n AS (SELECT CAST(sum(c_u) AS BIGINT) AS n_tokens FROM uni),
        |sc AS (SELECT lhs, rhs, c_ab,
        |         CAST(CAST(c_ab AS HUGEINT) * n_tokens
        |           // (CAST(ua.c_u AS HUGEINT) * ub.c_u) AS BIGINT) AS ratio
        |       FROM lm JOIN uni ua ON ua.word = lm.lhs
        |               JOIN uni ub ON ub.word = lm.rhs, n
        |       WHERE c_ab >= 3),
        |q AS (SELECT lhs, rhs, c_ab,
        |        CAST(CASE WHEN ratio >= 1 THEN length(bin(ratio)) - 1
        |             ELSE -1 END AS BIGINT) AS pmi_q
        |      FROM sc)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi_q DESC, c_ab DESC,
        |         lhs, rhs) AS BIGINT) AS rank,
        |       lhs, rhs, c_ab, pmi_q
        |FROM q QUALIFY rank <= 50""".stripMargin)),

    // ---- tokenizer export: detokenization round trip — decode the
    // ID SEQUENCE alone back to words (OOV id 0 -> '<unk>'); both
    // vocabulary joins are <= topK rows by construction ---------------
    Q("text_vocab_decode",
      (s, d) => TextOps.vocabDecode(docs(s, d),
        minDf = 2, maxDfNum = 39, maxDfDen = 50),
      Some("""WITH tokp AS (
        |  SELECT doc_id, i AS pos, ls[i] AS word
        |  FROM (SELECT doc_id, string_split(text,' ') AS ls,
        |          unnest(range(1, len(string_split(text,' ')) + 1)) AS i
        |        FROM documents)),
        |dw AS (SELECT doc_id, word, count(*) AS c_dw FROM tokp GROUP BY 1, 2),
        |ws AS (SELECT word, CAST(sum(c_dw) AS BIGINT) AS tf,
        |              CAST(count(*) AS BIGINT) AS df
        |       FROM dw GROUP BY 1),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |pruned AS (SELECT word, tf, df FROM ws, nd
        |           WHERE df >= 2 AND df * 50 <= n_docs * 39),
        |ids AS (SELECT word, CAST(ROW_NUMBER() OVER
        |          (ORDER BY tf DESC, word) AS BIGINT) AS id
        |        FROM pruned QUALIFY id <= 1000),
        |enc AS (SELECT doc_id, pos, COALESCE(ids.id, 0) AS id
        |        FROM tokp LEFT JOIN ids USING (word)),
        |dec AS (SELECT e.doc_id, e.pos, e.id,
        |               COALESCE(i2.word, '<unk>') AS w
        |        FROM enc e LEFT JOIN ids i2 ON i2.id = e.id)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       string_agg(w, ' ' ORDER BY pos) AS text_decoded,
        |       (SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) = 0) AS lossless
        |FROM dec GROUP BY doc_id""".stripMargin)),

    // ---- tokenizer training: unigram-LM (SentencePiece-style) ----------
    // Deterministic Viterbi-EM in exact bit-length-quantized integer
    // arithmetic; the oracle replays the ENTIRE training loop — seed
    // substring counts, per-round min-cost DP segmentation (unrolled
    // over word positions), canonical smallest-l backtrace, usage
    // prune, re-cost — via generated MATERIALIZED CTEs (unigramCtes).
    Q("text_unigram_vocab",
      (s, d) => TextOps.unigramVocab(docs(s, d),
        vocabSize = UnigramV, rounds = UnigramRounds),
      Some(unigramCtes(UnigramRounds, finalSeg = false) + s"""
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS BIGINT) AS "rank",
        |       piece, c, cost AS cost_q FROM c$UnigramRounds"""
        .stripMargin)),
    Q("text_unigram_encode",
      (s, d) => TextOps.unigramEncode(docs(s, d),
        vocabSize = UnigramV, rounds = UnigramRounds),
      Some(unigramCtes(UnigramRounds, finalSeg = true) + s""",
        |bw AS (SELECT d.word, d.cost FROM da${UnigramRounds + 1} d JOIN wfs w
        |       ON w.word = d.word AND d.i = CAST(len(w.word) AS INT)),
        |np AS (SELECT word, CAST(count(*) AS BIGINT) AS np
        |       FROM pc${UnigramRounds + 1} GROUP BY 1),
        |pw AS (SELECT b.word, np.np, b.cost FROM bw b JOIN np USING (word)
        |       UNION ALL
        |       SELECT x.word, CAST(len(x.word) AS BIGINT) AS np,
        |              CAST(SUM(v.cost) AS BIGINT) AS cost FROM (
        |         SELECT word, unnest(string_split(word, '')) AS piece FROM wfl) x
        |       JOIN c$UnigramRounds v USING (piece) GROUP BY 1),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |SELECT doc_id, CAST(SUM(np) AS BIGINT) AS n_pieces,
        |       CAST(SUM(cost) AS BIGINT) AS nll_sum,
        |       CAST(SUM(cost) AS DOUBLE) / SUM(np) AS avg_nll
        |FROM tok JOIN pw USING (word) GROUP BY 1""".stripMargin)),

    // ---- tokenizer training: BPE pair-count round -----------------------
    Q("text_bpe_pairs",
      (s, d) => TextOps.bpePairStats(docs(s, d)),
      Some("""WITH tok AS (
        |  SELECT unnest(string_split(text,' ')) AS word FROM documents),
        |csl AS (SELECT string_split(word,'') AS cs FROM tok
        |        WHERE len(string_split(word,'')) >= 2),
        |p AS (SELECT unnest(list_transform(range(1, len(cs)),
        |        i -> cs[i] || cs[i+1])) AS pair FROM csl),
        |c AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_pairs DESC, pair) AS BIGINT)
        |           AS "rank", pair, n_pairs
        |  FROM c) WHERE "rank" <= 20""".stripMargin)),

    // ---- tokenizer training: ITERATED BPE merge loop --------------------
    // The closed trainer (count -> top pair -> merge everywhere ->
    // recount, N rounds). The oracle unrolls the same N rounds as
    // chained CTEs — each round's top-1 via the identical (count desc,
    // lhs, rhs) total order, each merge via the identical wrapped-
    // symbol replace — generated from one Scala loop so the round
    // structure cannot drift from the Spark trainer's.
    Q("text_bpe_merges",
      (s, d) => TextOps.bpeMerges(docs(s, d), rounds = BpeRounds),
      Some {
        val union = (1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs, " +
            s"lhs || rhs AS merged, n_pairs FROM t$r")
          .mkString("\nUNION ALL\n")
        bpeCtes(BpeRounds) + "\n" + union
      }),

    // ---- tokenizer training: CONVERGENCE-STOP variant -------------------
    // Same trainer under a frequency floor: training stops at the
    // first round whose winner falls below BpeMinCount (a real
    // trainer's min-frequency threshold). The oracle replays the full
    // round budget and keeps rounds at or above the floor — exactly
    // the stopped prefix, because round winners are monotone
    // non-increasing (merging the max pair only creates pairs bounded
    // by its count).
    Q("text_bpe_converged",
      (s, d) => TextOps.bpeMerges(docs(s, d), rounds = BpeRounds,
        minCount = BpeMinCount),
      Some {
        val union = (1 to BpeRounds).map(r =>
          s"SELECT CAST($r AS BIGINT) AS merge_round, lhs, rhs, " +
            s"lhs || rhs AS merged, n_pairs FROM t$r")
          .mkString("\nUNION ALL\n")
        bpeCtes(BpeRounds) +
          s"\nSELECT * FROM (\n$union\n) WHERE n_pairs >= $BpeMinCount"
      }),

    // ---- tokenizer training: ENCODE with the trained merges -------------
    // The consumer side of the trainer: per-document token counts
    // after the learned merges are applied — what sequence packing
    // and training-cost budgeting consume. Same unrolled CTEs, final
    // per-word segmentations joined back to the corpus.
    Q("text_bpe_encode",
      (s, d) => TextOps.bpeEncode(docs(s, d), rounds = BpeRounds),
      Some(s"""${bpeCtes(BpeRounds)},
        |enc AS (SELECT word,
        |          CAST((len(string_split(seq, chr(31))) - 1) // 2 AS BIGINT) AS n_tok
        |        FROM seq$BpeRounds),
        |tokd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |SELECT doc_id,
        |  CAST(COALESCE(SUM(CASE
        |    WHEN len(word) >= 2 AND strpos(word, chr(31)) = 0 THEN enc.n_tok
        |    WHEN len(word) = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bpe_tokens
        |FROM tokd LEFT JOIN enc USING (word)
        |GROUP BY doc_id""".stripMargin)),

    // ---- tokenizer: per-source fertility card ---------------------------
    // (tokens per 1000 words and chars per 1000 tokens under the
    // trained BPE — the measurement that prices a multilingual mix
    // before fixing sampling temperatures; shares the merge CTEs
    // with text_bpe_encode)
    Q("text_fertility",
      (s, d) => TextOps.tokenizerFertility(docs(s, d), BpeRounds),
      Some(s"""${bpeCtes(BpeRounds)},
        |enc AS (SELECT word,
        |          CAST((len(string_split(seq, chr(31))) - 1) // 2 AS BIGINT) AS n_tok
        |        FROM seq$BpeRounds),
        |tokd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |db AS (SELECT doc_id,
        |  CAST(COALESCE(SUM(CASE
        |    WHEN len(word) >= 2 AND strpos(word, chr(31)) = 0 THEN enc.n_tok
        |    WHEN len(word) = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_bpe_tokens
        |       FROM tokd LEFT JOIN enc USING (word)
        |       GROUP BY doc_id),
        |dm AS (SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(len(replace(text, ' ', '')) AS BIGINT) AS n_wchars
        |       FROM documents)
        |SELECT dm.source,
        |       CAST(SUM(dm.n_words) AS BIGINT) AS total_words,
        |       CAST(SUM(dm.n_wchars) AS BIGINT) AS total_wchars,
        |       CAST(SUM(db.n_bpe_tokens) AS BIGINT) AS total_tokens,
        |       CAST(SUM(db.n_bpe_tokens) * 1000 // SUM(dm.n_words) AS BIGINT) AS fertility_permille,
        |       CAST(SUM(dm.n_wchars) * 1000 // SUM(db.n_bpe_tokens) AS BIGINT) AS chars_per_token_permille
        |FROM dm JOIN db USING (doc_id)
        |GROUP BY 1""".stripMargin)),

    // ---- text analysis: fingerprinting ----------------------------------
    Q("text_fingerprint",
      (s, d) => TextOps.fingerprint(docs(s, d)),
      Some(s"""WITH $TokCte,
        |ms AS (SELECT doc_id, min(md5(s)) AS min_shingle_hash FROM ds GROUP BY 1)
        |SELECT d.doc_id, md5(d.text) AS content_hash,
        |       md5(substr(d.text, 1, 64)) AS head_hash,
        |       md5(reverse(substr(reverse(d.text), 1, 64))) AS tail_hash,
        |       ms.min_shingle_hash
        |FROM documents d LEFT JOIN ms ON ms.doc_id = d.doc_id""".stripMargin)),

    // ---- text analysis: Rabin-Karp rolling-hash fingerprint -------------
    Q("text_rolling_hash",
      (s, d) => TextOps.rollingHash(docs(s, d)),
      Some("""SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 131 + c) % 2147483647) AS rolling_hash,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents""".stripMargin)),

    // ---- text analysis: winnowing fingerprint sets ----------------------
    Q("text_winnowing",
      (s, d) => TextOps.winnowing(docs(s, d)),
      Some(s"""WITH $WinnowCte
        |SELECT doc_id, unnest(fp) AS fingerprint FROM fp""".stripMargin)),

    // ---- dedup: winnowing-fingerprint overlap (third near-dup route) ----
    // Candidates share >= 3 fingerprints (after dropping df>50
    // boilerplate fingerprints — the stop-word analog that keeps hot
    // buckets from going quadratic), verified by exact Jaccard over
    // the capped fingerprint sets.
    Q("dedup_winnowing",
      (s, d) => TextOps.nearDupWinnowing(docs(s, d)),
      Some(s"""WITH $WinnowCte,
        |fpe AS (SELECT doc_id, unnest(fp) AS f FROM fp),
        |dfc AS (SELECT f, COUNT(*) AS df FROM fpe GROUP BY 1),
        |fpk AS (SELECT doc_id, f FROM fpe JOIN dfc USING (f) WHERE df <= 50),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM fpk GROUP BY 1),
        |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM fpk a JOIN fpk b ON a.f = b.f AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT i.doc_a, i.doc_b, i.n_common, sa.n AS na, sb.n AS nb,
        |       i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) AS jaccard
        |FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
        |             JOIN sz sb ON sb.doc_id = i.doc_b
        |WHERE i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE) >= 0.5""".stripMargin)),

    // ---- similarity: brute-force cosine top-k ---------------------------
    Q("sim_ann_topk",
      (s, d) => EmbeddingOps.annTopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |p AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid, ce.label,
        |             unnest(qe.q) AS a, unnest(ce.q) AS b
        |      FROM e qe, e ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |dots AS (SELECT query_id, vid, label, SUM(a*b) AS dot FROM p GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, vid, label,
        |              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM dots JOIN n nq ON nq.vec_id = query_id
        |                 JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, label, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin),
      bench = true),

    // ---- similarity: embedding-cosine near-dup pairs (brute force) -------
    Q("dedup_embedding_cos",
      (s, d) => EmbeddingOps.nearDupCosineBrute(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |p AS (SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b,
        |             unnest(ea.q) AS a, unnest(eb.q) AS b
        |      FROM e ea, e eb WHERE ea.vec_id < eb.vec_id),
        |dots AS (SELECT vec_a, vec_b, SUM(a*b) AS dot FROM p GROUP BY 1, 2)
        |SELECT vec_a, vec_b,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |FROM dots JOIN n na ON na.vec_id = vec_a
        |          JOIN n nb ON nb.vec_id = vec_b
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45""".stripMargin)),

    // ---- similarity: LSH-bucketed near-dup pairs — the scale twin of
    // dedup_embedding_cos (candidates per bucket, no |corpus|^2). 4
    // planes, not the sim_* rows' 8: a dedup candidate generator wants
    // recall, and the corpus' true pairs sit at cos 0.45-0.60 where
    // 8-plane single-probe collision is ~4% (an empty, vacuous row at
    // the test SFs); 16 coarser buckets keep the row populated at all
    // three SFs while the per-bucket-pairs plan shape is unchanged ------
    Q("dedup_embedding_lsh",
      (s, d) => EmbeddingOps.nearDupCosineLsh(emb(s, d), nPlanes = 4),
      Some(s"""WITH $EmbCte,
        |${lshBucketCte(4)},
        |pp AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |              unnest(a.q) AS x, unnest(b.q) AS y
        |       FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
        |dots AS (SELECT vec_a, vec_b, SUM(x*y) AS dot FROM pp GROUP BY 1, 2)
        |SELECT vec_a, vec_b,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |FROM dots JOIN n na ON na.vec_id = vec_a
        |          JOIN n nb ON nb.vec_id = vec_b
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45""".stripMargin)),

    // ---- dedup: the streaming-state registry primitive ------------------
    // The quantized-milli-unit content hash Streams.embeddingSink's
    // refuse-on-mutation contract rests on, pinned against a DuckDB
    // replay (embedding arrays surface as their length — the hash
    // already covers every element exactly).
    Q("sim_registry",
      (s, d) => EmbeddingOps.embeddingRegistry(emb(s, d))
        .select(col("vec_id"), col("content_hash"),
          size(col("embedding")).cast("long").as("n_dims"),
          col("label")),
      Some("""SELECT vec_id,
        |  md5(concat(array_to_string(
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)), ','),
        |    '|', COALESCE(CAST(label AS VARCHAR), ''))) AS content_hash,
        |  CAST(len(embedding) AS BIGINT) AS n_dims, label
        |FROM embeddings""".stripMargin)),

    // ---- dedup: SemDeDup-style cluster-then-prune — the THIRD
    // embedding near-dup route: candidates bounded by the TRAINED
    // k-means cells instead of random hyperplanes (Abbas et al. 2023).
    // Oracle reuses the IVF pipeline's Lloyd-round generator, so the
    // training+assignment arithmetic cannot drift between routes -----
    Q("dedup_semantic",
      (s, d) => EmbeddingOps.semanticDedup(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |${kmeansCellsCte(EmbeddingOps.KmIters)},
        |pp2 AS (SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b
        |        FROM cells a JOIN cells b ON a.cell = b.cell
        |                                 AND a.vec_id < b.vec_id),
        |ppx AS (SELECT pp2.cell, pp2.vec_a, pp2.vec_b,
        |               unnest(ea.q) AS x, unnest(eb.q) AS y
        |        FROM pp2 JOIN e ea ON ea.vec_id = pp2.vec_a
        |                 JOIN e eb ON eb.vec_id = pp2.vec_b),
        |sdots AS (SELECT cell, vec_a, vec_b, SUM(x*y) AS dot
        |          FROM ppx GROUP BY 1, 2, 3)
        |SELECT cell, vec_a, vec_b,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) AS cos
        |FROM sdots JOIN n na ON na.vec_id = vec_a
        |           JOIN n nb ON nb.vec_id = vec_b
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))) >= 0.45""".stripMargin)),

    // ---- similarity: LSH-bucketed nearest neighbor (the scale path) -----
    Q("sim_lsh_nn",
      (s, d) => EmbeddingOps.lshNearestNeighbor(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$LshBucketCte,
        |pp AS (SELECT a.vec_id AS vid, b.vec_id AS nn_id,
        |              unnest(a.q) AS x, unnest(b.q) AS y
        |       FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |$LshScoreTail""".stripMargin),
      bench = true),

    // ---- similarity: multi-probe LSH (Hamming-1 probe set) — the way
    // to raise nPlanes at scale without losing neighbors ------------------
    Q("sim_lsh_multiprobe",
      (s, d) => EmbeddingOps.lshNearestNeighborMultiprobe(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$LshBucketCte,
        |pb AS (SELECT vec_id,
        |              unnest(list_append(list_transform(range(8),
        |                j -> xor(bucket, CAST(pow(2, j) AS BIGINT))), bucket)) AS pbk
        |       FROM bk),
        |pp AS (SELECT p.vec_id AS vid, c.vec_id AS nn_id,
        |              unnest(ea.q) AS x, unnest(c.q) AS y
        |       FROM pb p
        |       JOIN eb c ON c.bucket = p.pbk AND c.vec_id <> p.vec_id
        |       JOIN e ea ON ea.vec_id = p.vec_id),
        |$LshScoreTail""".stripMargin)),

    // ---- similarity: IVF coarse-quantizer probe (the other scale path) --
    Q("sim_ivf_topk",
      (s, d) => EmbeddingOps.ivfTopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
        |scored AS (
        |  SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc WHERE crk = 1),
        |probes AS (SELECT vec_id AS query_id, cent_id AS cell
        |           FROM rankedc WHERE vec_id < 5 AND crk <= 2),
        |cand AS (SELECT p.query_id, cl.vec_id
        |         FROM probes p JOIN cells cl USING (cell)
        |         WHERE cl.vec_id <> p.query_id),
        |cd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM (
        |    SELECT ca.query_id, ca.vec_id AS vid,
        |           unnest(eq1.q) AS a, unnest(eq2.q) AS b
        |    FROM cand ca
        |    JOIN eq eq1 ON eq1.vec_id = ca.query_id
        |    JOIN eq eq2 ON eq2.vec_id = ca.vec_id) GROUP BY 1, 2),
        |sc AS (SELECT query_id, vid,
        |              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM cd JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: PERSISTED-index IVF serving — the offline-build /
    // online-serve split: the index (centroids + cell-partitioned
    // inverted lists) is written to parquet and serving reads ONLY the
    // probed cells (static partition pruning; EmbeddingOpsSpec pins
    // the PartitionFilters). Same construction as sim_ivf_topk, so the
    // oracle is the same replay — equality proves the persisted round
    // trip loses nothing ------------------------------------------------
    Q("sim_ivf_persisted",
      (s, d) => {
        val idx = cachedIndex("ivf", d,
          p => EmbeddingOps.ivfIndexWrite(emb(s, d), p))
        EmbeddingOps.ivfTopKIndexed(s, idx,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
        |scored AS (
        |  SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc WHERE crk = 1),
        |probes AS (SELECT vec_id AS query_id, cent_id AS cell
        |           FROM rankedc WHERE vec_id < 5 AND crk <= 2),
        |cand AS (SELECT p.query_id, cl.vec_id
        |         FROM probes p JOIN cells cl USING (cell)
        |         WHERE cl.vec_id <> p.query_id),
        |cd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM (
        |    SELECT ca.query_id, ca.vec_id AS vid,
        |           unnest(eq1.q) AS a, unnest(eq2.q) AS b
        |    FROM cand ca
        |    JOIN eq eq1 ON eq1.vec_id = ca.query_id
        |    JOIN eq eq2 ON eq2.vec_id = ca.vec_id) GROUP BY 1, 2),
        |sc AS (SELECT query_id, vid,
        |              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM cd JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: FILTERED persisted-index serving -------------------
    // (metadata predicate label = 1 pushed into the pruned lists scan;
    // top-k per query AMONG matching vectors — the per-tenant /
    // per-class search mode; same coarse-probe replay, candidates
    // filtered by label before ranking)
    Q("sim_ivf_filtered",
      (s, d) => {
        val idx = cachedIndex("ivf", d,
          p => EmbeddingOps.ivfIndexWrite(emb(s, d), p))
        EmbeddingOps.ivfTopKIndexedWhere(s, idx,
          emb(s, d).where(col("vec_id") < 5), col("label") === 1)
      },
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
        |scored AS (
        |  SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc WHERE crk = 1),
        |probes AS (SELECT vec_id AS query_id, cent_id AS cell
        |           FROM rankedc WHERE vec_id < 5 AND crk <= 2),
        |cand AS (SELECT p.query_id, cl.vec_id, el.label
        |         FROM probes p JOIN cells cl USING (cell)
        |         JOIN e el ON el.vec_id = cl.vec_id
        |         WHERE cl.vec_id <> p.query_id AND el.label = 1),
        |cd AS (SELECT query_id, vid, label, SUM(a*b) AS dot FROM (
        |    SELECT ca.query_id, ca.vec_id AS vid, ca.label,
        |           unnest(eq1.q) AS a, unnest(eq2.q) AS b
        |    FROM cand ca
        |    JOIN eq eq1 ON eq1.vec_id = ca.query_id
        |    JOIN eq eq2 ON eq2.vec_id = ca.vec_id) GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, vid, label,
        |              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM cd JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, label, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: inverted-list balance report — the operational
    // monitoring artifact (a probe costs its largest probed cell):
    // per-cell entry counts with min/max/total context, replayed from
    // the same coarse assignment the index was built with -----------
    Q("sim_index_stats",
      (s, d) => {
        val idx = cachedIndex("ivf", d,
          p => EmbeddingOps.ivfIndexWrite(emb(s, d), p))
        EmbeddingOps.indexCellStats(s, idx)
      },
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |scored AS (SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM e eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, CAST(cent_id AS INTEGER) AS cell
        |          FROM rankedc WHERE crk = 1),
        |pc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_entries
        |       FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_entries) AS BIGINT) AS n_total,
        |               CAST(min(n_entries) AS BIGINT) AS min_entries,
        |               CAST(max(n_entries) AS BIGINT) AS max_entries,
        |               CAST(count(*) AS BIGINT) AS n_cells FROM pc)
        |SELECT cell, n_entries, n_total, min_entries, max_entries,
        |       n_cells,
        |       CAST(n_entries AS DOUBLE) * n_cells / n_total
        |         AS balance_ratio
        |FROM pc, tot""".stripMargin)),

    // ---- similarity: PERSISTED-index serving WITH TOMBSTONES — the
    // retraction path: vec_ids 20..29 deleted via indexDelete land as
    // a tombstone segment, serving anti-joins them out; the oracle is
    // the same IVF replay with those candidates excluded — equality
    // proves a delete serves exactly like an index built without the
    // victims ------------------------------------------------------
    Q("sim_ivf_deleted",
      (s, d) => {
        val idx = cachedIndex("ivfdel", d, p => {
          EmbeddingOps.ivfIndexWrite(emb(s, d), p)
          EmbeddingOps.indexDelete(s, p,
            emb(s, d).where(col("vec_id") >= 20 && col("vec_id") < 30)
              .select(col("vec_id")))
        })
        EmbeddingOps.ivfTopKIndexed(s, idx,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
        |scored AS (
        |  SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc
        |          WHERE crk = 1 AND NOT (vec_id >= 20 AND vec_id < 30)),
        |probes AS (SELECT vec_id AS query_id, cent_id AS cell
        |           FROM rankedc WHERE vec_id < 5 AND crk <= 2),
        |cand AS (SELECT p.query_id, cl.vec_id
        |         FROM probes p JOIN cells cl USING (cell)
        |         WHERE cl.vec_id <> p.query_id),
        |cd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM (
        |    SELECT ca.query_id, ca.vec_id AS vid,
        |           unnest(eq1.q) AS a, unnest(eq2.q) AS b
        |    FROM cand ca
        |    JOIN eq eq1 ON eq1.vec_id = ca.query_id
        |    JOIN eq eq2 ON eq2.vec_id = ca.vec_id) GROUP BY 1, 2),
        |sc AS (SELECT query_id, vid,
        |              CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM cd JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: product-quantization ADC top-k — the compressed
    // scale path: queries score corpus CODES (M table lookups), never
    // corpus vectors; all-integer, so the oracle replays the whole
    // pipeline (slice -> encode -> LUT -> sum) ----------------------------
    Q("sim_pq_topk",
      (s, d) => EmbeddingOps.pqTopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$PqScoreCte
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id, adot FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: PERSISTED PQ index — codes-only serving: the
    // stored index is (sub, code) smallints per vector plus the
    // broadcast codebooks; the ADC scoring join never reads a corpus
    // vector. Same construction as sim_pq_topk, same replay —
    // equality proves the compressed round trip loses nothing --------
    Q("sim_pq_persisted",
      (s, d) => {
        val idx = cachedIndex("pq", d,
          p => EmbeddingOps.pqIndexWrite(emb(s, d), p))
        EmbeddingOps.pqTopKIndexed(s, idx,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |$PqScoreCte
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id, adot FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM sc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: IVF-PQ composite (IVFADC — the faiss IVFPQ
    // structure): coarse cells bound WHICH candidates are touched,
    // residual PQ codes bound BYTES PER CANDIDATE; the inner-product
    // score decomposes exactly as dot(q, centroid) + M ADC lookups,
    // so the whole composite stays integer-exact and replayable ------
    Q("sim_ivfpq_topk",
      (s, d) => EmbeddingOps.ivfpqTopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$IvfPqScoreCte
        |$IvfPqTopKTail""".stripMargin)),

    // ---- similarity: PERSISTED IVF-PQ index — codes partitioned by
    // coarse cell, so serving prunes BOTH statically (committed
    // segments x probed cells) and reads M small ints per candidate,
    // never a corpus vector. Same construction as sim_ivfpq_topk,
    // same replay — equality proves the round trip loses nothing ----
    Q("sim_ivfpq_persisted",
      (s, d) => {
        val idx = cachedIndex("ivfpq", d,
          p => EmbeddingOps.ivfpqIndexWrite(emb(s, d), p))
        EmbeddingOps.ivfpqTopKIndexed(s, idx,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |$IvfPqScoreCte
        |$IvfPqTopKTail""".stripMargin)),

    // ---- similarity: IVF-PQ recall@10 — the composite's recall row,
    // measuring coarse-pruning misses AND residual-quantization
    // ranking error against the exact brute top-10 ------------------
    Q("sim_ivfpq_recall",
      (s, d) => EmbeddingOps.ivfpqRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$IvfPqScoreCte,
        |xk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM xsc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("xk")}""".stripMargin)),

    // ---- similarity: two-stage IVF-PQ serving — ADC top-30 from the
    // persisted IVF-PQ index, re-scored EXACTLY against the vectors
    // stored in the persisted IVF index's lists (both built from the
    // same corpus, so the vec_id -> vector mapping is shared), top-10
    // by exact cosine: the faiss IndexRefine pattern ---------------------
    Q("sim_ivfpq_rerank",
      (s, d) => {
        val pq = cachedIndex("ivfpq", d,
          p => EmbeddingOps.ivfpqIndexWrite(emb(s, d), p))
        val iv = cachedIndex("ivf", d,
          p => EmbeddingOps.ivfIndexWrite(emb(s, d), p))
        EmbeddingOps.ivfpqTopKRerank(s, pq, iv,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |$IvfPqScoreCte,
        |$RerankCte
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vec_id, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM rsc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: the re-rank stage's recall lift at equal R —
    // both arms read the SAME top-30 ADC candidates; one keeps ADC
    // order, the other re-scores exactly. The lift is the residual
    // quantization's ranking error, measured per query ---------------------
    Q("sim_ivfpq_rerank_recall",
      (s, d) => EmbeddingOps.ivfpqRerankRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$IvfPqScoreCte,
        |xk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM xsc) WHERE rk <= 10),
        |$RerankCte,
        |rrk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM rsc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |ha AS (SELECT b.query_id, COUNT(*) AS nh FROM brute b
        |       JOIN xk p ON p.query_id = b.query_id AND p.vec_id = b.vid
        |       GROUP BY 1),
        |hr AS (SELECT b.query_id, COUNT(*) AS nh FROM brute b
        |       JOIN rrk p ON p.query_id = b.query_id AND p.vec_id = b.vid
        |       GROUP BY 1)
        |SELECT q.query_id,
        |       CAST(COALESCE(ha.nh, 0) AS BIGINT) AS n_adc,
        |       CAST(COALESCE(ha.nh, 0) AS DOUBLE) / 10 AS recall_adc,
        |       CAST(COALESCE(hr.nh, 0) AS BIGINT) AS n_rerank,
        |       CAST(COALESCE(hr.nh, 0) AS DOUBLE) / 10 AS recall_rerank
        |FROM (SELECT DISTINCT query_id FROM brute) q
        |LEFT JOIN ha ON ha.query_id = q.query_id
        |LEFT JOIN hr ON hr.query_id = q.query_id""".stripMargin)),

    // ---- similarity: PQ recall@10 vs the exact brute top-10 — every
    // approximate route ships with its recall measurement -----------------
    Q("sim_pq_recall",
      (s, d) => EmbeddingOps.pqRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$PqScoreCte,
        |pqk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM sc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("pqk")}""".stripMargin)),

    // ---- similarity: trained-PQ recall@10 — the per-subspace Lloyd
    // loop composed with the ADC probe, next to the seed-codebook row --
    Q("sim_pq_trained_recall",
      (s, d) => EmbeddingOps.pqRecallTrained(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$PqSubCte,
        |pcb0 AS (SELECT s, code, cq FROM cb),
        |${pqTrainRounds(PqTrainIters)},
        |${pqScoreAgainst(s"pcb$PqTrainIters", "f")},
        |pqk AS (SELECT query_id, vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adot DESC, vec_id) AS rk
        |  FROM fsc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("pqk")}""".stripMargin)),

    // ---- similarity: truncated-dimension (Matryoshka) recall@10 ----------
    // (the fourth approximate route next to LSH/IVF/PQ: first 16 of 64
    // dims; recall 0.1-0.3 at the test SFs — the row MEASURES the
    // truncation cost, like the other recall rows)
    Q("sim_trunc_recall",
      (s, d) => EmbeddingOps.truncRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |te AS (SELECT vec_id, q[1:16] AS q FROM e),
        |tn AS (SELECT vec_id, CAST(SUM(v*v) AS BIGINT) AS nn
        |       FROM (SELECT vec_id, unnest(q) AS v FROM te) GROUP BY 1),
        |tp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
        |              unnest(qe.q) AS a, unnest(ce.q) AS b
        |       FROM te qe, te ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |td AS (SELECT query_id, vid, SUM(a*b) AS dot FROM tp GROUP BY 1, 2),
        |tsc AS (SELECT query_id, vid,
        |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM td JOIN tn nq ON nq.vec_id = query_id
        |                 JOIN tn nv ON nv.vec_id = vid),
        |tk AS (SELECT query_id, vid AS vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM tsc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("tk")}""".stripMargin)),

    // ---- similarity: SQ8 scalar-quantized top-k + its recall row --------
    // (per-dim [mn,mx] ranges -> byte codes -> exact-integer
    // reconstruction ranking; the SqCte constant feeds both rows so the
    // code/reconstruction arithmetic cannot drift between them)
    Q("sim_sq8_topk",
      (s, d) => EmbeddingOps.sq8TopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$SqCte,
        |sp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid, ce.label,
        |              unnest(qe.r) AS a, unnest(ce.r) AS b
        |       FROM rc qe, rc ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |sd AS (SELECT query_id, vid, label, SUM(a*b) AS dot FROM sp GROUP BY 1, 2, 3),
        |ssc AS (SELECT query_id, vid, label,
        |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM sd JOIN rn nq ON nq.vec_id = query_id
        |                JOIN rn nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, label, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM ssc) WHERE rk <= 10""".stripMargin)),

    Q("sim_sq8_recall",
      (s, d) => EmbeddingOps.sq8Recall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$SqCte,
        |sp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
        |              unnest(qe.r) AS a, unnest(ce.r) AS b
        |       FROM rc qe, rc ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |sd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM sp GROUP BY 1, 2),
        |ssc AS (SELECT query_id, vid,
        |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM sd JOIN rn nq ON nq.vec_id = query_id
        |                JOIN rn nv ON nv.vec_id = vid),
        |sk AS (SELECT query_id, vid AS vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM ssc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("sk")}""".stripMargin)),

    // ---- similarity: single-probe LSH recall row ------------------------
    // (the recall measurement the LSH route was missing: same-bucket
    // candidates only, exact-cosine ranked — what single-probe misses
    // is what sim_lsh_multiprobe buys back)
    Q("sim_lsh_recall",
      (s, d) => EmbeddingOps.lshRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$LshBucketCte,
        |lq AS (SELECT vec_id AS query_id, q, bucket FROM eb WHERE vec_id < 5),
        |lp AS (SELECT lq.query_id, ce.vec_id AS vid, unnest(lq.q) AS a, unnest(ce.q) AS b
        |       FROM lq JOIN eb ce ON ce.bucket = lq.bucket AND ce.vec_id <> lq.query_id),
        |ld AS (SELECT query_id, vid, SUM(a*b) AS dot FROM lp GROUP BY 1, 2),
        |lsc AS (SELECT query_id, vid,
        |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM ld JOIN n nq ON nq.vec_id = query_id
        |                JOIN n nv ON nv.vec_id = vid),
        |lk AS (SELECT query_id, vid AS vec_id FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM lsc) WHERE rk <= 10),
        |$BruteTop10Cte,
        |${recallTail("lk")}""".stripMargin)),

    // ---- similarity: PERSISTED SQ8 index serving (codes-only) -----------
    // (build once into the managed scratch dir, serve the corpus
    // queries from stored int16 codes + the Dim-row ranges table —
    // byte-identical to the live sim_sq8_topk ranking, same oracle)
    Q("sim_sq8_persisted",
      (s, d) => {
        val dir = cachedIndex("sq8", d,
          p => EmbeddingOps.sq8IndexWrite(emb(s, d), p))
        EmbeddingOps.sq8TopKIndexed(s, dir,
          emb(s, d).where(col("vec_id") < 5))
      },
      Some(s"""WITH $EmbCte,
        |$SqCte,
        |sp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid, ce.label,
        |              unnest(qe.r) AS a, unnest(ce.r) AS b
        |       FROM rc qe, rc ce WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |sd AS (SELECT query_id, vid, label, SUM(a*b) AS dot FROM sp GROUP BY 1, 2, 3),
        |ssc AS (SELECT query_id, vid, label,
        |               CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM sd JOIN rn nq ON nq.vec_id = query_id
        |                JOIN rn nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, label, cos FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vid) AS rk
        |  FROM ssc) WHERE rk <= 10""".stripMargin)),

    // ---- similarity: per-label embedding mass card ----------------------
    Q("sim_embedding_stats",
      (s, d) => EmbeddingOps.embeddingStats(emb(s, d)),
      Some(s"""WITH $EmbCte
        |SELECT e.label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(n.nn) AS BIGINT) AS sum_nn,
        |       CAST(MIN(n.nn) AS BIGINT) AS min_nn,
        |       CAST(MAX(n.nn) AS BIGINT) AS max_nn
        |FROM e JOIN n USING (vec_id)
        |GROUP BY 1""".stripMargin)),

    // ---- similarity: quantizer-training drift diagnostics ---------------
    // (per centroid: exact squared L2 seed->trained movement + the
    // seed-vs-trained cosine — the retrain-monitoring row; oracle
    // reuses the Lloyd-round CTE generator, so the training
    // arithmetic cannot drift from the IVF routes)
    Q("sim_centroid_drift",
      (s, d) => EmbeddingOps.centroidDrift(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |${kmeansCellsCte(EmbeddingOps.KmIters)},
        |dp AS (SELECT s.cent_id, s.cn AS sn, t.cn AS tn,
        |              unnest(s.cq) AS a, unnest(t.cq) AS b
        |       FROM cents0 s JOIN cents${EmbeddingOps.KmIters} t USING (cent_id)),
        |g AS (SELECT cent_id, sn, tn,
        |             CAST(SUM((a - b) * (a - b)) AS BIGINT) AS drift_sq,
        |             SUM(a * b) AS dot
        |      FROM dp GROUP BY 1, 2, 3)
        |SELECT CAST(cent_id AS BIGINT) AS cent_id, drift_sq,
        |       CAST(dot AS DOUBLE) / (sqrt(CAST(sn AS DOUBLE)) * sqrt(CAST(tn AS DOUBLE))) AS cos
        |FROM g""".stripMargin)),

    // ---- similarity: the IVF trainer — one exact Lloyd update step ------
    Q("sim_kmeans_step",
      (s, d) => EmbeddingOps.kmeansStep(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |cents AS (SELECT vec_id AS cent_id, q AS cq, nn AS cn
        |          FROM e JOIN n USING (vec_id) WHERE vec_id < 16),
        |eq AS (SELECT e.vec_id, e.q, n.nn FROM e JOIN n USING (vec_id)),
        |scored AS (
        |  SELECT vec_id, cent_id, SUM(a*b) AS dot FROM (
        |    SELECT eq.vec_id, c.cent_id, unnest(eq.q) AS a, unnest(c.cq) AS b
        |    FROM eq, cents c) GROUP BY 1, 2),
        |rankedc AS (
        |  SELECT s.vec_id, s.cent_id,
        |         ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
        |           CAST(s.dot AS DOUBLE) / (sqrt(CAST(nv.nn AS DOUBLE)) * sqrt(CAST(c.cn AS DOUBLE))) DESC,
        |           s.cent_id) AS crk
        |  FROM scored s JOIN n nv ON nv.vec_id = s.vec_id
        |                JOIN cents c ON c.cent_id = s.cent_id),
        |cells AS (SELECT vec_id, cent_id AS cell FROM rankedc WHERE crk = 1),
        |comp AS (SELECT cl.cell,
        |                CAST(generate_subscripts(e.q, 1) - 1 AS INTEGER) AS c,
        |                unnest(e.q) AS v
        |         FROM cells cl JOIN e ON e.vec_id = cl.vec_id)
        |SELECT cell, c, COUNT(*) AS n_members,
        |       CAST(SUM(v) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS mean_v
        |FROM comp GROUP BY 1, 2""".stripMargin)),

    // ---- similarity: the closed loop — trained-IVF recall@10 vs brute ---
    // 2 Lloyd rounds -> trained centroids -> nProbe=4 probe -> exact
    // per-query overlap with the true top-10. Every stage is exact
    // integer/deterministic, so the recall itself is oracle-checked.
    Q("sim_ivf_recall",
      (s, d) => EmbeddingOps.ivfRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |$IvfRecallSql""".stripMargin)),

    // ---- multimodal plumbing: binary payloads + stubbed decode ----------
    // The decode is a stub (no codecs in this environment) but it is
    // DETERMINISTIC integer arithmetic — acc[i%8] += byte; (acc%1000)
    // /1000f — so even the stub path gets a full hash-checked oracle:
    // the query surfaces each feature as its exact-integer millis
    // (round(f*1000) round-trips k/1000f exactly for k in [0,1000)),
    // because a float32 column would never bit-match the oracle's
    // float64 arithmetic. The oracle re-folds the payload bytes in SQL
    // via hex() (2 hex chars per byte, decoded with strpos — DuckDB
    // has no byte-extraction on BLOB). Array form stays the
    // extractFeatures API; float fidelity is pinned by MultimodalSpec.
    Q("mm_features",
      (s, d) => {
        val feats =
          Multimodal.extractFeatures(Multimodal.toMedia(docs(s, d)))
        val mcols = (0 until Multimodal.FeatureDim).map(i =>
          round(col("feature").getItem(i).cast("double") * 1000)
            .cast("long").as(s"m$i"))
        feats.select(col("doc_id") +: col("n_bytes") +: mcols: _*)
      },
      Some {
        val dim = Multimodal.FeatureDim
        val mcols = (0 until dim).map(i =>
          s"CAST(COALESCE(SUM(CASE WHEN (p-1) % $dim = $i THEN v END), 0)" +
            s" % 1000 AS BIGINT) AS m$i").mkString(",\n        |       ")
        s"""WITH b AS (
        |  SELECT doc_id, hex(encode(COALESCE(text, ''))) AS h,
        |         CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, h, n, unnest(generate_series(1, n)) AS p FROM b),
        |vals AS (
        |  SELECT doc_id, p,
        |         (strpos('0123456789ABCDEF', substr(h, CAST(2*p-1 AS INT), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substr(h, CAST(2*p AS INT), 1)) - 1) AS v
        |  FROM pos)
        |SELECT b.doc_id, b.n AS n_bytes,
        |       $mcols
        |FROM b LEFT JOIN vals USING (doc_id)
        |GROUP BY b.doc_id, b.n""".stripMargin
      }),

    // ---- multimodal: REAL JDK-codec decode (BMP + WAV + stub arm) -------
    // The payloads are real files (BMP with bottom-up padded rows, WAV
    // with RIFF/fmt/data chunks) built from pure integer formulas of
    // (doc_id, position), decoded by the PLATFORM codecs
    // (javax.imageio / javax.sound.sampled), and reduced to decoded
    // pixel/sample statistics. The oracle replays the statistics from
    // the generation formulas without a codec — the match fails on any
    // misparse (row order, padding, channel order, endianness), which
    // is what makes the decode real rather than declared. s2 is
    // position-weighted on both sides: a flipped or misaligned decode
    // preserves plain sums but not it.
    Q("mm_decode",
      (s, d) => Multimodal.decodeFeatures(
        Multimodal.syntheticMedia(docs(s, d))),
      Some {
        val dim = Multimodal.FeatureDim
        s"""WITH img AS (SELECT doc_id, 4 + doc_id % 5 AS w,
        |         3 + doc_id % 4 AS h
        |       FROM documents WHERE doc_id % 3 = 0),
        |pxx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM pxx),
        |imgs AS (SELECT doc_id, 'image' AS kind,
        |           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |           CAST(w * h AS BIGINT) AS n_units,
        |           CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS BIGINT) AS s0,
        |           CAST(sum((doc_id*17 + x*11 + y*5) % 256) AS BIGINT) AS s1,
        |           CAST(sum((y*w + x + 1) * ((doc_id*23 + x*3 + y*19) % 256))
        |             AS BIGINT) AS s2
        |         FROM px GROUP BY doc_id, w, h),
        |aud AS (SELECT doc_id, 40 + doc_id % 25 AS n
        |        FROM documents WHERE doc_id % 3 = 1),
        |smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM aud),
        |sval AS (SELECT doc_id, n, i,
        |           (doc_id*7919 + i*104729) % 65536 - 32768 AS v FROM smp),
        |auds AS (SELECT doc_id, 'audio' AS kind,
        |           CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
        |           CAST(n AS BIGINT) AS n_units,
        |           CAST(sum(v) AS BIGINT) AS s0,
        |           CAST(sum(abs(v)) AS BIGINT) AS s1,
        |           CAST(sum((i + 1) * v) AS BIGINT) AS s2
        |         FROM sval GROUP BY doc_id, n),
        |st0 AS (SELECT doc_id, hex(encode(COALESCE(text, ''))) AS hx,
        |          CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS n
        |        FROM documents WHERE doc_id % 3 = 2),
        |spos AS (SELECT doc_id, hx, n, unnest(generate_series(1, n)) AS p
        |         FROM st0 WHERE n > 0),
        |sv AS (SELECT doc_id, p,
        |         (strpos('0123456789ABCDEF', substr(hx, CAST(2*p-1 AS INT), 1)) - 1) * 16
        |         + (strpos('0123456789ABCDEF', substr(hx, CAST(2*p AS INT), 1)) - 1) AS v
        |       FROM spos),
        |stubs AS (SELECT s.doc_id, 'stub' AS kind,
        |            CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
        |            s.n AS n_units,
        |            CAST(COALESCE(SUM(CASE WHEN (p-1) % $dim = 0 THEN v END), 0) % 1000 AS BIGINT) AS s0,
        |            CAST(COALESCE(SUM(CASE WHEN (p-1) % $dim = 1 THEN v END), 0) % 1000 AS BIGINT) AS s1,
        |            CAST(COALESCE(SUM(CASE WHEN (p-1) % $dim = 2 THEN v END), 0) % 1000 AS BIGINT) AS s2
        |          FROM st0 s JOIN sv USING (doc_id) WHERE s.n > 0
        |          GROUP BY s.doc_id, s.n),
        |empt AS (SELECT doc_id, 'empty' AS kind,
        |           CAST(NULL AS BIGINT) AS width, CAST(NULL AS BIGINT) AS height,
        |           CAST(0 AS BIGINT) AS n_units, CAST(0 AS BIGINT) AS s0,
        |           CAST(0 AS BIGINT) AS s1, CAST(0 AS BIGINT) AS s2
        |         FROM st0 WHERE n = 0)
        |SELECT * FROM imgs UNION ALL SELECT * FROM auds
        |UNION ALL SELECT * FROM stubs UNION ALL SELECT * FROM empt"""
          .stripMargin
      }),

    // ---- multimodal: PNG decode arm — the other JDK image codec ---------
    // Payloads are real PNGs (zlib-compressed IDAT) ENCODED by the JDK
    // writer from formula pixels and decoded back by javax.imageio;
    // the oracle replays the pixel statistics codec-free, so the match
    // verifies the full round trip through real compression.
    Q("mm_decode_png",
      (s, d) => Multimodal.decodeFeatures(
        Multimodal.syntheticPngMedia(docs(s, d))),
      Some("""WITH img AS (SELECT doc_id, 3 + doc_id % 6 AS w,
        |         2 + doc_id % 5 AS h FROM documents),
        |pxx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM img),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM pxx)
        |SELECT doc_id, 'image' AS kind,
        |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |       CAST(w * h AS BIGINT) AS n_units,
        |       CAST(sum((doc_id*29 + x*5 + y*17) % 256) AS BIGINT) AS s0,
        |       CAST(sum((doc_id*13 + x*19 + y*7) % 256) AS BIGINT) AS s1,
        |       CAST(sum((y*w + x + 1) * ((doc_id*37 + x*2 + y*11) % 256))
        |         AS BIGINT) AS s2
        |FROM px GROUP BY doc_id, w, h""".stripMargin)),

    // ---- multimodal: REAL nearest-neighbor resize — decode -> fixed
    // 8x8 raster via the integer mapping (x*w div 8, y*h div 8); the
    // oracle replays the RESIZED pixel statistics codec-free, with a
    // target-raster position weight pinning the mapping itself ------
    Q("mm_resize",
      (s, d) => Multimodal.resizeImages(
        Multimodal.syntheticPngMedia(docs(s, d))),
      Some("""WITH ids AS (SELECT doc_id, 3 + doc_id % 6 AS w,
        |         2 + doc_id % 5 AS h FROM documents),
        |pxx AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS x FROM ids),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, 8)) AS y FROM pxx),
        |src AS (SELECT doc_id, x, y,
        |          (x * w) // 8 AS sx, (y * h) // 8 AS sy FROM px)
        |SELECT doc_id, 'image' AS kind,
        |       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |       CAST(64 AS BIGINT) AS n_units,
        |       CAST(sum((doc_id*29 + sx*5 + sy*17) % 256) AS BIGINT) AS s0,
        |       CAST(sum((doc_id*13 + sx*19 + sy*7) % 256) AS BIGINT) AS s1,
        |       CAST(sum((y*8 + x + 1) * ((doc_id*37 + sx*2 + sy*11) % 256))
        |         AS BIGINT) AS s2
        |FROM src GROUP BY doc_id""".stripMargin)),

    // ---- multimodal: perceptual average-hash (aHash) of every image ----
    // (the image-modality dedup key: 8x8 nearest-neighbor gray raster,
    // bit j set when gray > integer mean, surfaced as four 16-bit
    // bands — the oracle replays hashes from the payload formulas
    // with zero codec code)
    Q("mm_image_hash",
      (s, d) => Multimodal.imageHash(
        Multimodal.syntheticPngMedia(docs(s, d))),
      Some(s"""WITH ids AS (SELECT doc_id, 3 + doc_id % 6 AS w,
        |         2 + doc_id % 5 AS h FROM documents),
        |pxx AS (SELECT doc_id, w, h, unnest(range(0, 8)) AS x FROM ids),
        |px AS (SELECT doc_id, w, h, x, unnest(range(0, 8)) AS y FROM pxx),
        |g AS (SELECT doc_id, y*8 + x AS j,
        |        (((doc_id*29 + ((x*w)//8)*5 + ((y*h)//8)*17) % 256)
        |       + ((doc_id*13 + ((x*w)//8)*19 + ((y*h)//8)*7) % 256)
        |       + ((doc_id*37 + ((x*w)//8)*2 + ((y*h)//8)*11) % 256)) // 3 AS gv
        |      FROM px),
        |m AS (SELECT doc_id, SUM(gv) // 64 AS mean FROM g GROUP BY 1),
        |bits AS (SELECT g.doc_id, g.j,
        |           CASE WHEN g.gv > m.mean THEN 1 ELSE 0 END AS b
        |         FROM g JOIN m ON m.doc_id = g.doc_id)
        |SELECT doc_id, 'image' AS kind,
        |${(0 to 3).map(bi =>
             s"  CAST(SUM(CASE WHEN j // 16 = $bi THEN b * (1 << (j % 16)) ELSE 0 END) AS BIGINT) AS b$bi,")
             .mkString("\n")}
        |  CAST(SUM(b) AS BIGINT) AS n_set
        |FROM bits GROUP BY 1""".stripMargin)),

    // ---- multimodal: REAL decoded-domain frame sampling — every 4th
    // PCM sample of the audio arm kept, stats weighted by the KEPT
    // ordinal (pins selection and order, not just the multiset) ------
    Q("mm_frame_sample",
      (s, d) => Multimodal.sampleAudioFrames(
        Multimodal.syntheticMedia(docs(s, d))),
      Some("""WITH au AS (SELECT doc_id, 40 + doc_id % 25 AS n
        |        FROM documents WHERE doc_id % 3 = 1),
        |smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM au),
        |kept AS (SELECT doc_id, i,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS j,
        |           (doc_id*7919 + i*104729) % 65536 - 32768 AS v
        |         FROM smp WHERE i % 4 = 0)
        |SELECT doc_id, 'audio' AS kind,
        |       CAST(count(*) AS BIGINT) AS n_units,
        |       CAST(sum(v) AS BIGINT) AS s0,
        |       CAST(sum(abs(v)) AS BIGINT) AS s1,
        |       CAST(sum(j * v) AS BIGINT) AS s2
        |FROM kept GROUP BY doc_id""".stripMargin)),

    // ---- multimodal: segment-energy audio fingerprint ------------------
    // (the audio-modality dedup key: 16 contiguous PCM segments, bit
    // set when segment energy exceeds the cross-multiplied mean —
    // replayed from the WAV formulas with zero codec code)
    Q("mm_audio_hash",
      (s, d) => Multimodal.audioHash(
        Multimodal.syntheticMedia(docs(s, d))),
      Some("""WITH au AS (SELECT doc_id, 40 + doc_id % 25 AS n
        |        FROM documents WHERE doc_id % 3 = 1),
        |smp AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM au),
        |sv AS (SELECT doc_id, (i*16) // n AS seg,
        |         abs((doc_id*7919 + i*104729) % 65536 - 32768) AS a
        |       FROM smp),
        |se AS (SELECT doc_id, seg, CAST(SUM(a) AS BIGINT) AS e
        |       FROM sv GROUP BY 1, 2),
        |st AS (SELECT doc_id, CAST(SUM(e) AS BIGINT) AS total
        |       FROM se GROUP BY 1)
        |SELECT se.doc_id, 'audio' AS kind,
        |       CAST(SUM(CASE WHEN se.e * 16 > st.total
        |                     THEN 1 << seg ELSE 0 END) AS BIGINT) AS h,
        |       CAST(SUM(CASE WHEN se.e * 16 > st.total
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_set
        |FROM se JOIN st ON st.doc_id = se.doc_id
        |GROUP BY 1""".stripMargin)),

    // ---- multimodal data-model contract: typed metadata columns ----------
    Q("mm_media_meta",
      (s, d) => Multimodal.toMedia(docs(s, d))
        .select(col("doc_id"), col("media_type"),
          col("meta.source").as("source"), col("meta.lang").as("lang"),
          col("meta.n_bytes").as("n_bytes")),
      Some("""SELECT doc_id, 'text/plain' AS media_type, source, lang,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin)),

    Q("mm_frame_counts",
      (s, d) => Multimodal.sampleFrames(Multimodal.toMedia(docs(s, d)))
        .groupBy("doc_id").agg(count(lit(1)).as("n_frames")),
      // octet_length(encode(...)) counts UTF-8 BYTES like the binary
      // payload does (length(text) counts characters and diverges on
      // any multibyte text)
      Some("""SELECT doc_id,
        |       (CAST(octet_length(encode(text)) AS BIGINT) - 1) // 128 + 1 AS n_frames
        |FROM documents
        |WHERE octet_length(encode(text)) > 0""".stripMargin)),

    // ---- retrieval: BM25 top-k for a literal query -----------------------
    // Constants spliced from Bm25Terms/Bm25K1/Bm25B so the two engines
    // cannot drift; all fraction-clearing products run HUGEINT in the
    // oracle (DECIMAL(38,0) in Spark).
    Q("text_bm25_topk",
      (s, d) => TextOps.bm25TopK(docs(s, d), Bm25Terms,
        k1Permille = Bm25K1, bPermille = Bm25B),
      Some(s"""WITH dl AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |       FROM documents),
        |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_tok,
        |               CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents)
        |       WHERE word IN ($Bm25TermsSql) GROUP BY 1, 2),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, dl,
        |         CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf_q,
        |         CAST(CAST(tf AS HUGEINT) * ${Bm25K1 + 1000L} * 1000 * t_tok * 1000
        |              // (CAST(tf AS HUGEINT) * 1000000 * t_tok
        |                  + CAST(${Bm25K1 * (1000L - Bm25B)} AS HUGEINT) * t_tok
        |                  + CAST(${Bm25K1 * Bm25B} AS HUGEINT) * dl * n_docs)
        |           AS BIGINT) AS sat
        |       FROM tf JOIN dfq USING (word) JOIN dl USING (doc_id), tot)
        |SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        |       CAST(SUM(idf_q * sat) AS BIGINT) AS score_q
        |FROM sc GROUP BY 1
        |ORDER BY score_q DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- retrieval: BM25 served from the PERSISTED inverted index --------
    // Build-once via cachedIndex; serving reads only the query terms'
    // tb= buckets of committed segments. Pruning cannot change the
    // answer, so the oracle is text_bm25_topk's SQL verbatim.
    Q("text_bm25_indexed",
      (s, d) => {
        val idx = cachedIndex("bm25", d,
          p => TextOps.bm25IndexWrite(docs(s, d), p))
        TextOps.bm25TopKIndexed(s, idx, Bm25Terms)
      },
      Some(s"""WITH dl AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |       FROM documents),
        |tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS t_tok,
        |               CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents)
        |       WHERE word IN ($Bm25TermsSql) GROUP BY 1, 2),
        |dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, dl,
        |         CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf_q,
        |         CAST(CAST(tf AS HUGEINT) * ${Bm25K1 + 1000L} * 1000 * t_tok * 1000
        |              // (CAST(tf AS HUGEINT) * 1000000 * t_tok
        |                  + CAST(${Bm25K1 * (1000L - Bm25B)} AS HUGEINT) * t_tok
        |                  + CAST(${Bm25K1 * Bm25B} AS HUGEINT) * dl * n_docs)
        |           AS BIGINT) AS sat
        |       FROM tf JOIN dfq USING (word) JOIN dl USING (doc_id), tot)
        |SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        |       CAST(SUM(idf_q * sat) AS BIGINT) AS score_q
        |FROM sc GROUP BY 1
        |ORDER BY score_q DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- retrieval: cross-corpus BM25 serving from prebuilt stats --------
    // Collection statistics (df, N, T) come from every source EXCEPT
    // src0; the src0 documents are the fresh batch being ranked — the
    // offline-build/online-serve split, replayed batch-side. Terms
    // unseen in the stats corpus drop via the inner df join.
    Q("text_bm25_cross",
      (s, d) => {
        val all = docs(s, d)
        TextOps.bm25TopKWith(
          all.where(col("source") === "src0"),
          TextOps.bm25Stats(all.where(col("source") =!= "src0")),
          Bm25Terms)
      },
      Some(s"""WITH corp AS (SELECT * FROM documents WHERE source <> 'src0'),
        |bat AS (SELECT * FROM documents WHERE source = 'src0'),
        |dl AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM bat),
        |tot AS (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_tok,
        |               CAST(count(*) AS BIGINT) AS n_docs FROM corp),
        |dfq AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |              FROM corp)
        |        WHERE word IN ($Bm25TermsSql) GROUP BY 1),
        |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM bat)
        |       WHERE word IN ($Bm25TermsSql) GROUP BY 1, 2),
        |sc AS (SELECT doc_id, dl,
        |         CAST(length(bin(n_docs // df)) - 1 AS BIGINT) AS idf_q,
        |         CAST(CAST(tf AS HUGEINT) * ${Bm25K1 + 1000L} * 1000 * t_tok * 1000
        |              // (CAST(tf AS HUGEINT) * 1000000 * t_tok
        |                  + CAST(${Bm25K1 * (1000L - Bm25B)} AS HUGEINT) * t_tok
        |                  + CAST(${Bm25K1 * Bm25B} AS HUGEINT) * dl * n_docs)
        |           AS BIGINT) AS sat
        |       FROM tf JOIN dfq USING (word) JOIN dl USING (doc_id), tot)
        |SELECT doc_id, max(dl) AS dl, count(*) AS n_terms,
        |       CAST(SUM(idf_q * sat) AS BIGINT) AS score_q
        |FROM sc GROUP BY 1
        |ORDER BY score_q DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- curation: fixed-n per-stratum deterministic carve ---------------
    Q("text_sample_topn",
      (s, d) => TextOps.sampleTopN(docs(s, d), n = 5),
      Some("""SELECT source, doc_id, lang, CAST(pick_rank AS INTEGER) AS pick_rank
        |FROM (SELECT source, doc_id, lang,
        |        ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR) || ':topn'), doc_id) AS pick_rank
        |      FROM documents)
        |WHERE pick_rank <= 5""".stripMargin)),

    // ---- similarity: margin-based mutual-best pair mining ----------------
    // Even/odd vec_id halves stand in for the two sides of a bitext
    // corpus; cosines quantize to micro-units BEFORE the neighborhood
    // sums so every comparison downstream is exact BIGINT.
    Q("sim_margin_mine",
      (s, d) => EmbeddingOps.marginMine(emb(s, d), kNn = 4),
      Some(s"""WITH $EmbCte,
        |p AS (SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b,
        |             unnest(ea.q) AS x, unnest(eb.q) AS y
        |      FROM e ea, e eb
        |      WHERE ea.vec_id % 2 = 0 AND eb.vec_id % 2 = 1),
        |dots AS (SELECT vec_a, vec_b, SUM(x*y) AS dot FROM p GROUP BY 1, 2),
        |cqs AS (SELECT vec_a, vec_b,
        |          CAST(floor(CAST(dot AS DOUBLE)
        |            / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
        |            * 1000000) AS BIGINT) AS cq
        |        FROM dots JOIN n na ON na.vec_id = vec_a
        |                  JOIN n nb ON nb.vec_id = vec_b),
        |sa AS (SELECT vec_a, CAST(SUM(cq) AS BIGINT) AS sum_a FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
        |           ORDER BY cq DESC, vec_b) AS rk FROM cqs)
        |       WHERE rk <= 4 GROUP BY 1),
        |sb AS (SELECT vec_b, CAST(SUM(cq) AS BIGINT) AS sum_b FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_b
        |           ORDER BY cq DESC, vec_a) AS rk FROM cqs)
        |       WHERE rk <= 4 GROUP BY 1),
        |m AS (SELECT vec_a, vec_b, cq, cq * 8 * 1000 // (sum_a + sum_b) AS margin_q
        |      FROM cqs JOIN sa USING (vec_a) JOIN sb USING (vec_b)
        |      WHERE cq > 0 AND sum_a + sum_b > 0),
        |fwd AS (SELECT vec_a, vec_b, cq, margin_q FROM (
        |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
        |            ORDER BY margin_q DESC, vec_b) AS rk FROM m)
        |        WHERE rk = 1),
        |bwd AS (SELECT vec_a, vec_b FROM (
        |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_b
        |            ORDER BY margin_q DESC, vec_a) AS rk FROM m)
        |        WHERE rk = 1)
        |SELECT fwd.vec_a, fwd.vec_b, fwd.cq, fwd.margin_q
        |FROM fwd JOIN bwd USING (vec_a, vec_b)""".stripMargin)),

    // ---- similarity: margin mining, LSH-candidate scale twin -------------
    // Same margin pipeline over co-bucketed candidates only (4 planes,
    // the dedup_embedding_lsh candidate generator) — neighborhood sums
    // run over what each side actually retrieves, the standard
    // ANN-approximated margin.
    Q("sim_margin_lsh",
      (s, d) => EmbeddingOps.marginMineLsh(emb(s, d), kNn = 4, nPlanes = 4),
      Some(s"""WITH $EmbCte,
        |${lshBucketCte(4)},
        |pp AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |              unnest(a.q) AS x, unnest(b.q) AS y
        |       FROM eb a JOIN eb b ON a.bucket = b.bucket
        |       WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1),
        |dots AS (SELECT vec_a, vec_b, SUM(x*y) AS dot FROM pp GROUP BY 1, 2),
        |cqs AS (SELECT vec_a, vec_b,
        |          CAST(floor(CAST(dot AS DOUBLE)
        |            / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE)))
        |            * 1000000) AS BIGINT) AS cq
        |        FROM dots JOIN n na ON na.vec_id = vec_a
        |                  JOIN n nb ON nb.vec_id = vec_b),
        |sa AS (SELECT vec_a, CAST(SUM(cq) AS BIGINT) AS sum_a FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
        |           ORDER BY cq DESC, vec_b) AS rk FROM cqs)
        |       WHERE rk <= 4 GROUP BY 1),
        |sb AS (SELECT vec_b, CAST(SUM(cq) AS BIGINT) AS sum_b FROM (
        |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_b
        |           ORDER BY cq DESC, vec_a) AS rk FROM cqs)
        |       WHERE rk <= 4 GROUP BY 1),
        |m AS (SELECT vec_a, vec_b, cq, cq * 8 * 1000 // (sum_a + sum_b) AS margin_q
        |      FROM cqs JOIN sa USING (vec_a) JOIN sb USING (vec_b)
        |      WHERE cq > 0 AND sum_a + sum_b > 0),
        |fwd AS (SELECT vec_a, vec_b, cq, margin_q FROM (
        |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
        |            ORDER BY margin_q DESC, vec_b) AS rk FROM m)
        |        WHERE rk = 1),
        |bwd AS (SELECT vec_a, vec_b FROM (
        |          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_b
        |            ORDER BY margin_q DESC, vec_a) AS rk FROM m)
        |        WHERE rk = 1)
        |SELECT fwd.vec_a, fwd.vec_b, fwd.cq, fwd.margin_q
        |FROM fwd JOIN bwd USING (vec_a, vec_b)""".stripMargin)),

    // ---- similarity: JL signed-projection sketch top-k + recall ----------
    // The pd CTE of the shared LSH block IS the projection (per-plane
    // exact integer dots, kept unsigned); 16 planes fold 64 dims.
    Q("sim_proj_topk",
      (s, d) => EmbeddingOps.projTopK(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |${lshBucketCte(16)},
        |pv AS (SELECT vec_id, list_transform(
        |         list_sort(list(struct_pack(plane := plane,
        |           pc := CAST(pdot AS BIGINT)))), r -> r.pc) AS p
        |       FROM pd GROUP BY 1),
        |pu AS (SELECT vec_id, unnest(p) AS v FROM pv),
        |pnn AS (SELECT vec_id, SUM(v*v) AS nn FROM pu GROUP BY 1),
        |pp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
        |              unnest(qe.p) AS a, unnest(ce.p) AS b
        |       FROM pv qe, pv ce
        |       WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |pd2 AS (SELECT query_id, vid, SUM(a*b) AS dot FROM pp GROUP BY 1, 2),
        |psc AS (SELECT query_id, vid,
        |          CAST(dot AS DOUBLE)
        |            / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |        FROM pd2 JOIN pnn nq ON nq.vec_id = query_id
        |                  JOIN pnn nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id,
        |       e.label, cos
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, vid) AS rk FROM psc) t
        |JOIN e ON e.vec_id = t.vid
        |WHERE rk <= 10""".stripMargin)),

    Q("sim_proj_recall",
      (s, d) => EmbeddingOps.projRecall(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |${lshBucketCte(16)},
        |pv AS (SELECT vec_id, list_transform(
        |         list_sort(list(struct_pack(plane := plane,
        |           pc := CAST(pdot AS BIGINT)))), r -> r.pc) AS p
        |       FROM pd GROUP BY 1),
        |pu AS (SELECT vec_id, unnest(p) AS v FROM pv),
        |pnn AS (SELECT vec_id, SUM(v*v) AS nn FROM pu GROUP BY 1),
        |pp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
        |              unnest(qe.p) AS a, unnest(ce.p) AS b
        |       FROM pv qe, pv ce
        |       WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |pd2 AS (SELECT query_id, vid, SUM(a*b) AS dot FROM pp GROUP BY 1, 2),
        |pt AS (SELECT query_id, vid FROM (
        |         SELECT query_id, vid, ROW_NUMBER() OVER (
        |           PARTITION BY query_id ORDER BY
        |             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE))
        |               * sqrt(CAST(nv.nn AS DOUBLE))) DESC, vid) AS rk
        |         FROM pd2 JOIN pnn nq ON nq.vec_id = query_id
        |                   JOIN pnn nv ON nv.vec_id = vid)
        |       WHERE rk <= 10),
        |bp AS (SELECT qe.vec_id AS query_id, ce.vec_id AS vid,
        |              unnest(qe.q) AS a, unnest(ce.q) AS b
        |       FROM e qe, e ce
        |       WHERE qe.vec_id < 5 AND ce.vec_id <> qe.vec_id),
        |bd AS (SELECT query_id, vid, SUM(a*b) AS dot FROM bp GROUP BY 1, 2),
        |bt AS (SELECT query_id, vid FROM (
        |         SELECT query_id, vid, ROW_NUMBER() OVER (
        |           PARTITION BY query_id ORDER BY
        |             CAST(dot AS DOUBLE) / (sqrt(CAST(nq.nn AS DOUBLE))
        |               * sqrt(CAST(nv.nn AS DOUBLE))) DESC, vid) AS rk
        |         FROM bd JOIN n nq ON nq.vec_id = query_id
        |                 JOIN n nv ON nv.vec_id = vid)
        |       WHERE rk <= 10)
        |SELECT b.query_id,
        |       CAST(count(p.vid) AS BIGINT) AS n_overlap,
        |       CAST(count(p.vid) AS DOUBLE) / 10 AS recall_at_k
        |FROM bt b LEFT JOIN pt p ON p.query_id = b.query_id
        |                        AND p.vid = b.vid
        |GROUP BY 1""".stripMargin)),

    // ---- analysis: SimHash hamming top-k document retrieval --------------
    Q("sim_simhash_topk",
      (s, d) => TextOps.simhashTopK(docs(s, d)),
      Some(s"""WITH $TokCte,
        |$SimhashSql,
        |q AS (SELECT doc_id AS query_id, simhash AS qh FROM shh
        |      WHERE doc_id < 5),
        |sc AS (SELECT query_id, doc_id,
        |         CAST(bit_count(xor(qh, simhash)) AS INTEGER) AS hamming
        |       FROM shh, q WHERE doc_id <> query_id)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, doc_id, hamming
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY hamming, doc_id) AS rk FROM sc)
        |WHERE rk <= 10""".stripMargin)),

    // ---- curation: intra-doc worst-quality span localization -------------
    Q("text_worst_span",
      (s, d) => TextOps.worstSpan(docs(s, d)),
      Some("""WITH tokp AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        |bg AS (SELECT doc_id, pos, word AS lhs,
        |         LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS rhs
        |       FROM tokp),
        |bgx AS (SELECT * FROM bg WHERE rhs IS NOT NULL),
        |lm AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM bgx GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |sc AS (SELECT doc_id, pos,
        |         CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |       FROM bgx JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs)),
        |sp AS (SELECT doc_id, pos,
        |         CAST(SUM(q) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS BIGINT)
        |           AS span_nll,
        |         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
        |           ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS span_len
        |       FROM sc)
        |SELECT doc_id, CAST(span_start AS INTEGER) AS span_start, span_nll
        |FROM (SELECT doc_id, pos AS span_start, span_nll,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id
        |          ORDER BY span_nll DESC, pos) AS rk
        |      FROM sp WHERE span_len = 10)
        |WHERE rk = 1""".stripMargin)),

    // ---- curation: contamination attribution per source ------------------
    Q("text_contamination_by_source",
      (s, d) => {
        val all = docs(s, d)
        TextOps.contaminationBySource(
          all.where(col("doc_id") % DecontMod =!= 0),
          all.where(col("doc_id") % DecontMod === 0))
      },
      Some(s"""WITH $TokCte,
        |bset AS (SELECT DISTINCT s FROM ds WHERE doc_id % $DecontMod = 0),
        |cs AS (SELECT doc_id, s FROM ds WHERE doc_id % $DecontMod <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1),
        |sh AS (SELECT cs.doc_id, count(*) AS n_shared
        |       FROM cs JOIN bset USING (s) GROUP BY 1),
        |pd AS (SELECT z.doc_id, z.n_shingles,
        |         COALESCE(sh.n_shared, CAST(0 AS BIGINT)) AS n_shared,
        |         COALESCE(sh.n_shared, 0) * 10 >= z.n_shingles * 8 AS contaminated
        |       FROM sz z LEFT JOIN sh USING (doc_id))
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_contaminated,
        |       CAST(SUM(n_shared) AS BIGINT) AS sum_shared,
        |       CAST(SUM(n_shingles) AS BIGINT) AS sum_shingles,
        |       CAST(SUM(n_shared) AS BIGINT) * 1000
        |         // CAST(SUM(n_shingles) AS BIGINT) AS shared_permille
        |FROM pd JOIN documents d USING (doc_id)
        |GROUP BY 1""".stripMargin)),

    // ---- analysis: LM branching-factor card ------------------------------
    Q("text_branching_card",
      (s, d) => TextOps.branchingCard(docs(s, d)),
      Some("""WITH wt AS (SELECT string_split(text, ' ') AS ls
        |       FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |b2 AS (SELECT ls[i] AS lhs, ls[i+1] AS rhs
        |       FROM (SELECT ls, unnest(range(1, len(ls))) AS i FROM wt)),
        |lm AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM b2 GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(SUM(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |rkd AS (SELECT lm.lhs, c_ab, rhs, c_lhs,
        |          SUM(c_ab) OVER (PARTITION BY lm.lhs
        |            ORDER BY c_ab DESC, rhs) AS cum,
        |          ROW_NUMBER() OVER (PARTITION BY lm.lhs
        |            ORDER BY c_ab DESC, rhs) AS rk
        |        FROM lm JOIN ctx ON ctx.lhs = lm.lhs),
        |nd AS (SELECT lhs, CAST(MIN(rk) AS INTEGER) AS n_needed
        |       FROM rkd WHERE cum * 1000 >= c_lhs * 900 GROUP BY 1)
        |SELECT n_needed, CAST(count(*) AS BIGINT) AS n_contexts
        |FROM nd GROUP BY 1""".stripMargin)),

    // ---- curation: trigram LM with laddered stupid backoff ---------------
    // Models train on every source EXCEPT src0; src0 scores under
    // them — unseen trigrams ladder down to the bigram rung, unseen
    // bigrams to add-one unigrams, and the per-rung mass is reported.
    Q("text_lm_trigram_cross",
      (s, d) => {
        val all = docs(s, d)
        val corp = all.where(col("source") =!= "src0")
        TextOps.lmScoreTrigramWith(all.where(col("source") === "src0"),
          TextOps.lmTrigramModel(corp), TextOps.lmModel(corp))
      },
      Some("""WITH wt AS (SELECT doc_id, string_split(text, ' ') AS ls
        |       FROM documents WHERE source <> 'src0'),
        |t3 AS (SELECT ls[i] AS w1, ls[i+1] AS w2, ls[i+2] AS w3
        |       FROM (SELECT ls, unnest(range(1, len(ls) - 1)) AS i
        |             FROM wt WHERE len(ls) >= 3)),
        |tri AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c_abc
        |        FROM t3 GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(SUM(c_abc) AS BIGINT) AS c_12
        |        FROM tri GROUP BY 1, 2),
        |b2 AS (SELECT ls[i] AS lhs, ls[i+1] AS rhs
        |       FROM (SELECT ls, unnest(range(1, len(ls))) AS i
        |             FROM wt WHERE len(ls) >= 2)),
        |bi AS (SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
        |       FROM b2 GROUP BY 1, 2),
        |c2 AS (SELECT lhs, CAST(SUM(c_ab) AS BIGINT) AS c_2
        |       FROM bi GROUP BY 1),
        |u3 AS (SELECT rhs, CAST(SUM(c_ab) AS BIGINT) AS c_3
        |       FROM bi GROUP BY 1),
        |nt AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_total FROM bi),
        |wb AS (SELECT doc_id, string_split(text, ' ') AS ls
        |       FROM documents WHERE source = 'src0'),
        |bt AS (SELECT doc_id, ls[i] AS w1, ls[i+1] AS w2, ls[i+2] AS w3,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM (SELECT doc_id, ls, unnest(range(1, len(ls) - 1)) AS i
        |             FROM wb WHERE len(ls) >= 3)
        |       GROUP BY 1, 2, 3, 4),
        |sc AS (SELECT bt.doc_id, bt.k, tri.c_abc, bi.c_ab AS c_23,
        |         CAST(CASE
        |           WHEN tri.c_abc IS NOT NULL
        |             THEN length(bin(c12.c_12 // tri.c_abc)) - 1
        |           WHEN bi.c_ab IS NOT NULL
        |             THEN length(bin((c2.c_2 * 5) // (bi.c_ab * 2))) - 1
        |           ELSE length(bin((nt.n_total * 25)
        |             // ((coalesce(u3.c_3, 0) + 1) * 4))) - 1
        |         END AS BIGINT) AS nll_q
        |       FROM bt
        |       LEFT JOIN tri ON tri.w1 = bt.w1 AND tri.w2 = bt.w2
        |                    AND tri.w3 = bt.w3
        |       LEFT JOIN c12 ON c12.w1 = bt.w1 AND c12.w2 = bt.w2
        |       LEFT JOIN bi ON bi.lhs = bt.w2 AND bi.rhs = bt.w3
        |       LEFT JOIN c2 ON c2.lhs = bt.w2
        |       LEFT JOIN u3 ON u3.rhs = bt.w3, nt)
        |SELECT doc_id, CAST(SUM(k * nll_q) AS BIGINT) AS nll_sum,
        |       CAST(SUM(k) AS BIGINT) AS n_trigrams,
        |       CAST(SUM(CASE WHEN c_abc IS NULL AND c_23 IS NOT NULL
        |                THEN k ELSE 0 END) AS BIGINT) AS n_bo_bigram,
        |       CAST(SUM(CASE WHEN c_abc IS NULL AND c_23 IS NULL
        |                THEN k ELSE 0 END) AS BIGINT) AS n_bo_unigram,
        |       CAST(SUM(k * nll_q) AS DOUBLE) / SUM(k) AS avg_nll
        |FROM sc GROUP BY 1""".stripMargin)),

    // ---- curation: per-source percentile normalization -------------------
    // LM score calibrated WITHIN each source — the comparable-across-
    // feeds form a global quality cut actually wants.
    Q("text_score_percentile",
      (s, d) => {
        val d0 = docs(s, d)
        TextOps.scorePercentile(
          TextOps.lmScore(d0)
            .select(col("doc_id"), col("avg_nll").as("score"))
            .join(d0.select(col("doc_id"), col("source")), Seq("doc_id")))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM bs GROUP BY 1, 2, 3),
        |lm AS (SELECT lhs, rhs, CAST(sum(k) AS BIGINT) AS c_ab
        |       FROM db GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |lmsc AS (SELECT doc_id,
        |           CAST(sum(k * q) AS DOUBLE) / sum(k) AS score
        |         FROM (SELECT doc_id, k,
        |                 CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |               FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |         GROUP BY 1),
        |j AS (SELECT l.doc_id, d.source, l.score
        |      FROM lmsc l JOIN documents d ON d.doc_id = l.doc_id),
        |r AS (SELECT doc_id, source, score,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY score, doc_id) AS BIGINT) AS src_rank,
        |        CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |      FROM j)
        |SELECT doc_id, source, score, src_rank, n_src,
        |       (src_rank - 1) * 1000 // greatest(n_src - 1, 1) AS pct_permille
        |FROM r""".stripMargin)),

    // ---- curation: Borda rank fusion of LM + DSIR quality signals --------
    Q("text_rank_fusion",
      (s, d) => TextOps.rankFusion(docs(s, d), DsirTarget, DsirBuckets),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM bs GROUP BY 1, 2, 3),
        |lm AS (SELECT lhs, rhs, CAST(sum(k) AS BIGINT) AS c_ab
        |       FROM db GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |lmsc AS (SELECT doc_id,
        |           CAST(sum(k * q) AS DOUBLE) / sum(k) AS avg_nll
        |         FROM (SELECT doc_id, k,
        |                 CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |               FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |         GROUP BY 1),
        |wd AS (SELECT doc_id, source, string_split(text,' ') AS ls
        |       FROM documents),
        |fd AS (SELECT doc_id, source, unnest(list_concat(
        |         list_transform(ls, t -> 'u:' || t),
        |         list_transform(range(1, len(ls)),
        |           i -> 'b:' || ls[i] || ' ' || ls[i+1]))) AS f
        |       FROM wd),
        |pdd AS (SELECT doc_id, source,
        |          CAST(((strpos('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 4096
        |              + (strpos('0123456789abcdef', substr(md5(f), 2, 1)) - 1) * 256
        |              + (strpos('0123456789abcdef', substr(md5(f), 3, 1)) - 1) * 16
        |              + (strpos('0123456789abcdef', substr(md5(f), 4, 1)) - 1))
        |            % $DsirBuckets AS BIGINT) AS bucket,
        |          CAST(count(*) AS BIGINT) AS k
        |        FROM fd GROUP BY 1, 2, 3),
        |distd AS (SELECT bucket,
        |            CAST(length(bin(CAST(sum(CASE WHEN source = '$DsirTarget'
        |              THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_t,
        |            CAST(length(bin(CAST(sum(CASE WHEN source <> '$DsirTarget'
        |              THEN k ELSE 0 END) + 1 AS BIGINT))) - 1 AS BIGINT) AS qlog_r
        |          FROM pdd GROUP BY 1),
        |dsirsc AS (SELECT doc_id,
        |             CAST(sum(k * (qlog_t - qlog_r)) AS DOUBLE) / sum(k)
        |               AS avg_weight
        |           FROM pdd JOIN distd USING (bucket)
        |           WHERE source <> '$DsirTarget'
        |           GROUP BY 1),
        |j AS (SELECT doc_id, avg_nll, avg_weight
        |      FROM lmsc JOIN dsirsc USING (doc_id)),
        |rk AS (SELECT *,
        |         CAST(ROW_NUMBER() OVER (ORDER BY avg_nll, doc_id)
        |           AS BIGINT) AS ppl_rank,
        |         CAST(ROW_NUMBER() OVER (ORDER BY avg_weight DESC, doc_id)
        |           AS BIGINT) AS dsir_rank
        |       FROM j)
        |SELECT doc_id, avg_nll, avg_weight, ppl_rank, dsir_rank,
        |       ppl_rank + dsir_rank AS borda
        |FROM rk ORDER BY borda, doc_id LIMIT 100""".stripMargin)),

    // ---- curation: UL2 mixture-of-denoisers accounting -------------------
    Q("text_denoiser_mix",
      (s, d) => TextOps.denoiserMix(docs(s, d)),
      Some("""WITH asg AS (SELECT doc_id, text,
        |         ((strpos('0123456789abcdef',
        |             substr(md5(doc_id || ':denoiser'), 1, 1)) - 1) * 4096
        |          + (strpos('0123456789abcdef',
        |             substr(md5(doc_id || ':denoiser'), 2, 1)) - 1) * 256
        |          + (strpos('0123456789abcdef',
        |             substr(md5(doc_id || ':denoiser'), 3, 1)) - 1) * 16
        |          + (strpos('0123456789abcdef',
        |             substr(md5(doc_id || ':denoiser'), 4, 1)) - 1)) % 3
        |           AS arm_i
        |       FROM documents),
        |tk AS (SELECT doc_id, arm_i,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |       FROM (SELECT doc_id, arm_i,
        |               unnest(string_split(text, ' ')) AS w0, text
        |             FROM asg)),
        |gr AS (SELECT DISTINCT doc_id, arm_i, pos // 3 AS g FROM tk
        |       WHERE arm_i IN (0, 2)
        |       UNION ALL
        |       SELECT DISTINCT doc_id, arm_i, pos // 8 AS g FROM tk
        |       WHERE arm_i = 1),
        |mk AS (SELECT doc_id, arm_i, g,
        |         (strpos('0123456789abcdef',
        |            substr(md5(doc_id || ':' || g || ':corrupt'), 1, 1)) - 1)
        |           < CASE WHEN arm_i = 2 THEN 8 ELSE 3 END AS masked
        |       FROM gr),
        |card AS (SELECT CASE arm_i WHEN 0 THEN 'r' WHEN 1 THEN 's'
        |                ELSE 'x' END AS arm,
        |           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |           CAST(count(*) AS BIGINT) AS n_windows,
        |           CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
        |             AS n_masked
        |         FROM mk GROUP BY 1)
        |SELECT arm, n_docs, n_windows, n_masked,
        |       n_masked * 1000 // n_windows AS masked_permille
        |FROM card""".stripMargin)),

    // ---- similarity: per-dimension robust statistics ---------------------
    Q("sim_dim_stats",
      (s, d) => EmbeddingOps.dimStats(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |u2 AS (SELECT generate_subscripts(q, 1) - 1 AS c, unnest(q) AS v
        |       FROM e),
        |vc AS (SELECT c, v, CAST(count(*) AS BIGINT) AS cnt
        |       FROM u2 GROUP BY 1, 2),
        |nn2 AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS n,
        |               MIN(v) AS min_q, MAX(v) AS max_q
        |        FROM vc GROUP BY 1),
        |cum AS (SELECT c, v, SUM(cnt) OVER (PARTITION BY c ORDER BY v)
        |          AS cum
        |        FROM vc),
        |md AS (SELECT cum.c, MIN(v) AS median_q
        |       FROM cum JOIN nn2 ON nn2.c = cum.c
        |       WHERE cum >= (n + 1) // 2 GROUP BY 1)
        |SELECT CAST(nn2.c AS INTEGER) AS c, min_q, max_q, median_q
        |FROM nn2 JOIN md ON md.c = nn2.c""".stripMargin)),

    // ---- curation: word2vec negative-sampling table ----------------------
    Q("text_neg_sampling",
      (s, d) => TextOps.negSamplingTable(docs(s, d)),
      Some("""WITH wc AS (SELECT word, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT unnest(string_split(text, ' ')) AS word
        |             FROM documents) GROUP BY 1),
        |gr AS (SELECT word, c,
        |         CAST(POWER(CAST(c AS DOUBLE), 0.75) AS BIGINT) AS g
        |       FROM wc),
        |w4 AS (SELECT word, c,
        |         CAST(list_max(list_filter(
        |           [g - 2, g - 1, g, g + 1, g + 2],
        |           t -> t >= 1 AND CAST(t AS HUGEINT) * t * t * t
        |                <= CAST(c AS HUGEINT) * c * c)) AS BIGINT) AS w34
        |       FROM gr),
        |tot AS (SELECT CAST(SUM(w34) AS BIGINT) AS tot FROM w4)
        |SELECT word, c, w34,
        |       CAST(w34 * 1000000 // tot AS BIGINT) AS ppm
        |FROM w4, tot ORDER BY c DESC, word LIMIT 50""".stripMargin)),

    // ---- curation: inverse-cloze-task pair mining ------------------------
    Q("text_ict_pairs",
      (s, d) => TextOps.ictPairs(docs(s, d)),
      Some("""WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t
        |       FROM documents WHERE len(string_split(text, ' ')) >= 9),
        |st AS (SELECT doc_id, t,
        |         CAST(((strpos('0123456789abcdef',
        |                 substr(md5(doc_id || ':ict'), 1, 1)) - 1) * 4096
        |             + (strpos('0123456789abcdef',
        |                 substr(md5(doc_id || ':ict'), 2, 1)) - 1) * 256
        |             + (strpos('0123456789abcdef',
        |                 substr(md5(doc_id || ':ict'), 3, 1)) - 1) * 16
        |             + (strpos('0123456789abcdef',
        |                 substr(md5(doc_id || ':ict'), 4, 1)) - 1))
        |           % (len(t) - 7) AS BIGINT) AS start
        |       FROM t0)
        |SELECT doc_id, CAST(start AS INTEGER) AS start_pos,
        |       array_to_string(list_slice(t, start + 1, start + 8), ' ')
        |         AS query_text,
        |       array_to_string(list_concat(list_slice(t, 1, start),
        |         list_slice(t, start + 9, len(t))), ' ') AS context_text
        |FROM st""".stripMargin)),

    // ---- curation: SFT pair assembly -------------------------------------
    Q("text_sft_pack",
      (s, d) => TextOps.sftPack(docs(s, d)),
      Some("""WITH p AS (SELECT doc_id // 2 AS pair_id, doc_id AS prompt_id,
        |              text AS prompt
        |       FROM documents WHERE doc_id % 2 = 0),
        |r AS (SELECT doc_id // 2 AS pair_id, doc_id AS response_id,
        |             text AS response
        |      FROM documents WHERE doc_id % 2 = 1),
        |j AS (SELECT pair_id, prompt_id, response_id,
        |        '<|user|> ' || prompt || ' <|assistant|> ' || response
        |          || ' <|end|>' AS seq
        |      FROM p JOIN r USING (pair_id))
        |SELECT pair_id, prompt_id, response_id, seq,
        |       CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tokens,
        |       len(string_split(seq, ' ')) <= 300 AS kept
        |FROM j""".stripMargin)),

    // ---- similarity: contrastive hard-negative mining --------------------
    Q("sim_hard_negatives",
      (s, d) => EmbeddingOps.hardNegatives(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |p AS (SELECT qe.vec_id AS query_id, qe.label AS qlabel,
        |             ce.vec_id AS vid, ce.label,
        |             unnest(qe.q) AS a, unnest(ce.q) AS b
        |      FROM e qe, e ce
        |      WHERE qe.vec_id < 5 AND ce.label <> qe.label),
        |dots AS (SELECT query_id, vid, label, SUM(a*b) AS dot
        |         FROM p GROUP BY 1, 2, 3),
        |sc AS (SELECT query_id, vid, label,
        |              CAST(dot AS DOUBLE)
        |                / (sqrt(CAST(nq.nn AS DOUBLE)) * sqrt(CAST(nv.nn AS DOUBLE))) AS cos
        |       FROM dots JOIN n nq ON nq.vec_id = query_id
        |                 JOIN n nv ON nv.vec_id = vid)
        |SELECT query_id, CAST(rk AS INTEGER) AS rk, vid AS vec_id, label, cos
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, vid) AS rk FROM sc)
        |WHERE rk <= 10""".stripMargin)),

    // ---- augmentation: T5-style span corruption --------------------------
    // Fixed-width windows of 3 tokens; window g of doc d masks iff the
    // first md5 nibble of d:g:corrupt is < 3; each masked window gets
    // its own <extra_id_k> sentinel, numbered left to right.
    Q("text_span_corrupt",
      (s, d) => TextOps.spanCorrupt(docs(s, d)),
      Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents),
        |win AS (SELECT doc_id, pos // 3 AS g,
        |          array_to_string(list_transform(
        |            list_sort(list(struct_pack(pos := pos, tok := word))),
        |            r -> r.tok), ' ') AS wtext
        |        FROM tok GROUP BY 1, 2),
        |mk AS (SELECT *,
        |         (strpos('0123456789abcdef',
        |            substr(md5(doc_id || ':' || g || ':corrupt'), 1, 1)) - 1) < 3
        |           AS masked
        |       FROM win),
        |rk AS (SELECT *,
        |         SUM(CASE WHEN masked THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY g) AS k
        |       FROM mk),
        |sn AS (SELECT *,
        |         '<extra_id_' || CAST(k - 1 AS BIGINT) || '>' AS sentinel
        |       FROM rk)
        |SELECT doc_id,
        |  array_to_string(list_transform(list_sort(list(struct_pack(
        |    g := g, t := CASE WHEN masked THEN sentinel ELSE wtext END))),
        |    r -> r.t), ' ') AS input_text,
        |  coalesce(array_to_string(list_transform(list_sort(list_filter(
        |    list(CASE WHEN masked
        |         THEN struct_pack(g := g, t := sentinel || ' ' || wtext) END),
        |    x -> x IS NOT NULL)), r -> r.t), ' '), '') AS target_text,
        |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
        |FROM sn GROUP BY 1""".stripMargin)),

    // ---- curation: length-bucketed padding-efficiency card ---------------
    Q("text_length_buckets",
      (s, d) => TextOps.lengthBuckets(docs(s, d)),
      Some("""WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM documents),
        |b AS (SELECT CASE WHEN n_tokens <= 1 THEN 1
        |               ELSE (CAST(1 AS BIGINT) << length(bin(n_tokens - 1))) END
        |               AS bucket,
        |             n_tokens FROM n),
        |agg AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        |        FROM b GROUP BY 1)
        |SELECT bucket, n_docs, sum_tokens,
        |       bucket * n_docs - sum_tokens AS padding_waste,
        |       (bucket * n_docs - sum_tokens) * 1000 // (bucket * n_docs)
        |         AS waste_permille
        |FROM agg""".stripMargin)),

    // ---- curation: token-budget greedy selection -------------------------
    // Order docs by LM quality (avg_nll asc, doc_id), keep while the
    // corpus-wide running token total stays within 20000 — the exact
    // global prefix sum runs shard-offset style, no single-partition
    // window.
    Q("text_budget_select",
      (s, d) => {
        val d0 = docs(s, d)
        TextOps.budgetSelect(
          TextOps.lmScore(d0)
            .select(col("doc_id"), col("avg_nll").as("score"))
            .join(d0.select(col("doc_id"),
              org.apache.spark.sql.functions.expr(
                "cast(size(split(text, ' ')) as long)").as("n_tokens")),
              Seq("doc_id")),
          budget = 20000L)
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ls
        |       FROM documents WHERE len(string_split(text,' ')) >= 2),
        |bs AS (SELECT doc_id, ls, unnest(range(1, len(ls))) AS i FROM w),
        |db AS (SELECT doc_id, ls[i] AS lhs, ls[i+1] AS rhs,
        |              CAST(count(*) AS BIGINT) AS k
        |       FROM bs GROUP BY 1, 2, 3),
        |lm AS (SELECT lhs, rhs, CAST(sum(k) AS BIGINT) AS c_ab
        |       FROM db GROUP BY 1, 2),
        |ctx AS (SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_lhs
        |        FROM lm GROUP BY 1),
        |scd AS (SELECT doc_id,
        |          CAST(sum(k * q) AS DOUBLE) / sum(k) AS score
        |        FROM (SELECT doc_id, k,
        |                CAST(length(bin(c_lhs // c_ab)) - 1 AS BIGINT) AS q
        |              FROM db JOIN lm USING (lhs, rhs) JOIN ctx USING (lhs))
        |        GROUP BY 1),
        |nt AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM documents),
        |sel AS (SELECT doc_id, score, n_tokens,
        |          CAST(SUM(n_tokens) OVER (ORDER BY score, doc_id)
        |            AS BIGINT) AS cum_tokens
        |        FROM scd JOIN nt USING (doc_id))
        |SELECT doc_id, score, n_tokens, cum_tokens,
        |       cum_tokens <= 20000 AS kept
        |FROM sel""".stripMargin)),

    // ---- dedup: LSH threshold-tuning band sweep --------------------------
    Q("dedup_band_sweep",
      (s, d) => TextOps.minhashBandSweep(docs(s, d)),
      Some(s"""WITH $MinhashPairsCte
        |SELECT i.n_common * 20 // (sa.n + sb.n - i.n_common) AS band,
        |       CAST(count(*) AS BIGINT) AS n_pairs
        |FROM inter i
        |JOIN sz sa ON sa.doc_id = i.doc_a
        |JOIN sz sb ON sb.doc_id = i.doc_b
        |GROUP BY 1""".stripMargin)),

    // ---- curation: text normalization over a noisy fixture ---------------
    // Noise derives deterministically from documents on BOTH sides
    // (case/punctuation keyed by doc_id + token length), so the
    // normalizer must lowercase, strip punctuation, and collapse
    // whitespace back to the EXACT original text — `restored` pins the
    // round trip per doc.
    Q("text_normalize",
      (s, d) => {
        val d0 = docs(s, d)
        val noisy = d0.select(col("doc_id"),
          org.apache.spark.sql.functions.expr(
            "concat_ws(' ', transform(split(text, ' '), w -> " +
              "CASE WHEN (doc_id + length(w)) % 3 = 0 THEN concat(upper(w), ',') " +
              "WHEN (doc_id + length(w)) % 5 = 0 THEN concat('\"', w, '!') " +
              "ELSE w END))").as("text"))
        TextOps.normalizeText(noisy)
          .join(d0.select(col("doc_id"), col("text")), Seq("doc_id"))
          .select(col("doc_id"), col("text_norm"), col("n_tokens_raw"),
            col("n_tokens_norm"),
            (col("text_norm") === col("text")).as("restored"))
      },
      Some("""WITH noisy AS (SELECT doc_id,
        |  array_to_string(list_transform(string_split(text, ' '), w ->
        |    CASE WHEN (doc_id + len(w)) % 3 = 0 THEN upper(w) || ','
        |         WHEN (doc_id + len(w)) % 5 = 0 THEN '"' || w || '!'
        |         ELSE w END), ' ') AS text FROM documents),
        |nn AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_raw,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |       ' +', ' ', 'g')) AS text_norm
        |  FROM noisy)
        |SELECT nn.doc_id, text_norm, n_tokens_raw,
        |  CAST(len(string_split(text_norm, ' ')) AS BIGINT) AS n_tokens_norm,
        |  text_norm = d.text AS restored
        |FROM nn JOIN documents d ON d.doc_id = nn.doc_id""".stripMargin)),

    // ---- analysis: vocabulary-growth (Heaps-law) card --------------------
    // 500 slices = per-doc granularity on this corpus: the synthetic
    // vocabulary saturates within the first few documents, so coarse
    // deciles would collapse the curve to one point.
    Q("text_vocab_growth",
      (s, d) => TextOps.vocabGrowth(docs(s, d), nSlices = 500),
      Some("""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |fs AS (SELECT word,
        |         CAST(MIN(least(doc_id * 500 // n_docs, 499)) AS BIGINT) AS slice
        |       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |             FROM documents), nd GROUP BY 1),
        |ns AS (SELECT slice, CAST(count(*) AS BIGINT) AS n_new_words
        |       FROM fs GROUP BY 1)
        |SELECT slice, n_new_words,
        |       CAST(SUM(n_new_words) OVER (ORDER BY slice
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS vocab_size
        |FROM ns""".stripMargin)),

    // ---- curation: bloom-pruned decontamination (scale path) -------------
    // Bloom filters have no false negatives and the set join removes
    // the false positives, so the pruned route's output IS the exact
    // route's — the oracle is dedup_decontaminate's SQL verbatim.
    Q("dedup_decontaminate_bloom",
      (s, d) => TextOps.decontaminateBloom(
        docs(s, d).where(col("doc_id") % DecontMod =!= 0),
        docs(s, d).where(col("doc_id") % DecontMod === 0)),
      Some(s"""WITH $TokCte,
        |bset AS (SELECT DISTINCT s FROM ds WHERE doc_id % $DecontMod = 0),
        |cs AS (SELECT doc_id, s FROM ds WHERE doc_id % $DecontMod <> 0),
        |sz AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1),
        |sh AS (SELECT cs.doc_id, count(*) AS n_shared
        |       FROM cs JOIN bset USING (s) GROUP BY 1)
        |SELECT z.doc_id, z.n_shingles,
        |       COALESCE(sh.n_shared, CAST(0 AS BIGINT)) AS n_shared,
        |       COALESCE(sh.n_shared, 0) * 10 >= z.n_shingles * 8 AS contaminated
        |FROM sz z LEFT JOIN sh USING (doc_id)""".stripMargin)),

    // ---- curation: multi-phrase blocklist screening ----------------------
    Q("text_blocklist",
      (s, d) => TextOps.blocklistScreen(docs(s, d), BlockPhrases),
      Some(s"""WITH w2 AS (SELECT doc_id, string_split(text, ' ') AS w
        |       FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 1),
        |         i -> array_to_string(list_slice(w, i + 1, i + 2), ' '))) AS g
        |       FROM w2 WHERE len(w) >= 2),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(0, len(w) - 2),
        |         i -> array_to_string(list_slice(w, i + 1, i + 3), ' '))) AS g
        |       FROM w2 WHERE len(w) >= 3),
        |h AS (SELECT doc_id, g FROM g2 WHERE g IN (${blockSql(2)})
        |      UNION ALL
        |      SELECT doc_id, g FROM g3 WHERE g IN (${blockSql(3)})),
        |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |             CAST(count(DISTINCT g) AS BIGINT) AS n_phrases
        |      FROM h GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_hits, 0) AS n_hits,
        |       coalesce(a.n_phrases, 0) AS n_phrases,
        |       coalesce(a.n_hits, 0) > 0 AS blocked
        |FROM documents d LEFT JOIN a USING (doc_id)""".stripMargin)),

    // ---- analysis: distinctive-vocabulary card per source ----------------
    Q("text_distinctive_terms",
      (s, d) => TextOps.distinctiveTerms(docs(s, d)),
      Some("""WITH sw AS (SELECT source, unnest(string_split(text, ' ')) AS word
        |       FROM documents),
        |cs AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c_s
        |       FROM sw GROUP BY 1, 2),
        |cw AS (SELECT word, CAST(SUM(c_s) AS BIGINT) AS c_w FROM cs GROUP BY 1),
        |ts AS (SELECT source, CAST(SUM(c_s) AS BIGINT) AS t_s FROM cs GROUP BY 1),
        |ta AS (SELECT CAST(SUM(c_s) AS BIGINT) AS t_all FROM cs),
        |sc AS (SELECT source, word, c_s, c_w - c_s AS c_r, t_s,
        |              t_all - t_s AS t_r
        |       FROM cs JOIN cw USING (word) JOIN ts USING (source), ta),
        |q AS (SELECT source, word, c_s, c_r,
        |        CAST(length(bin(CAST(CAST(c_s AS HUGEINT) * t_r
        |          // (CAST(c_r + 1 AS HUGEINT) * t_s) AS BIGINT))) - 1
        |          AS BIGINT) AS score_q
        |      FROM sc
        |      WHERE CAST(c_s AS HUGEINT) * t_r >= CAST(c_r + 1 AS HUGEINT) * t_s)
        |SELECT source, CAST(rk AS INTEGER) AS rk, word, c_s, c_r, score_q
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY score_q DESC, c_s DESC, word) AS rk FROM q)
        |WHERE rk <= 5""".stripMargin)),

    // ---- analysis: cluster-topic labeling (embeddings x text) ------------
    // The SemDeDup cell partition joined to the document table by id,
    // each cell labeled by its distinctive vocabulary.
    Q("sim_cluster_topics",
      (s, d) => TextOps.clusterTopics(docs(s, d), emb(s, d)),
      Some(s"""WITH $EmbCte,
        |${kmeansCellsCte(EmbeddingOps.KmIters)},
        |sw AS (SELECT 'c' || CAST(cl.cell AS VARCHAR) AS source,
        |              unnest(string_split(d.text, ' ')) AS word
        |       FROM documents d JOIN cells cl ON cl.vec_id = d.doc_id),
        |cs AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c_s
        |       FROM sw GROUP BY 1, 2),
        |cw AS (SELECT word, CAST(SUM(c_s) AS BIGINT) AS c_w FROM cs GROUP BY 1),
        |ts AS (SELECT source, CAST(SUM(c_s) AS BIGINT) AS t_s FROM cs GROUP BY 1),
        |ta AS (SELECT CAST(SUM(c_s) AS BIGINT) AS t_all FROM cs),
        |sc2 AS (SELECT source, word, c_s, c_w - c_s AS c_r, t_s,
        |               t_all - t_s AS t_r
        |        FROM cs JOIN cw USING (word) JOIN ts USING (source), ta),
        |qx AS (SELECT source, word, c_s, c_r,
        |         CAST(length(bin(CAST(CAST(c_s AS HUGEINT) * t_r
        |           // (CAST(c_r + 1 AS HUGEINT) * t_s) AS BIGINT))) - 1
        |           AS BIGINT) AS score_q
        |       FROM sc2
        |       WHERE CAST(c_s AS HUGEINT) * t_r >= CAST(c_r + 1 AS HUGEINT) * t_s)
        |SELECT source AS cell, CAST(rk AS INTEGER) AS rk, word, c_s, c_r,
        |       score_q
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY score_q DESC, c_s DESC, word) AS rk FROM qx)
        |WHERE rk <= 5""".stripMargin)),

    // ---- dedup: MinHash banding recall vs the exact baseline -------------
    Q("dedup_band_recall",
      (s, d) => TextOps.minhashBandRecall(docs(s, d)),
      Some(s"""WITH $MinhashPairsCte,
        |tp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |              count(*) AS nc
        |       FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |tj AS (SELECT doc_a, doc_b FROM tp
        |       JOIN sz sa ON sa.doc_id = doc_a
        |       JOIN sz sb ON sb.doc_id = doc_b
        |       WHERE nc / CAST(sa.n + sb.n - nc AS DOUBLE) >= 0.5),
        |ct AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tj),
        |cc AS (SELECT CAST(count(*) AS BIGINT) AS n_caught
        |       FROM tj JOIN cand USING (doc_a, doc_b))
        |SELECT n_true, n_caught,
        |       CAST(CASE WHEN n_true = 0 THEN 0
        |            ELSE n_caught * 1000 // n_true END AS BIGINT)
        |         AS recall_permille
        |FROM ct, cc""".stripMargin)),

    // ---- similarity: nearest-centroid classification audit ---------------
    Q("sim_centroid_classify",
      (s, d) => EmbeddingOps.centroidClassify(emb(s, d)),
      Some(s"""WITH $EmbCte,
        |cm AS (SELECT label, c, CAST(SUM(v) AS BIGINT) // count(*) AS m
        |       FROM (SELECT label, unnest(q) AS v,
        |               generate_subscripts(q, 1) AS c FROM e)
        |       GROUP BY 1, 2),
        |cv AS (SELECT label AS pred, list_transform(
        |         list_sort(list(struct_pack(c := c, m := m))),
        |         r -> r.m) AS cq
        |       FROM cm GROUP BY 1),
        |cn AS (SELECT pred, CAST(SUM(v*v) AS BIGINT) AS cn
        |       FROM (SELECT pred, unnest(cq) AS v FROM cv) GROUP BY 1),
        |sc AS (SELECT e.vec_id, e.label, cv.pred,
        |         CAST(dot AS DOUBLE)
        |           / (sqrt(CAST(n.nn AS DOUBLE)) * sqrt(CAST(cn.cn AS DOUBLE))) AS cos
        |       FROM (SELECT vec_id, pred, SUM(a*b) AS dot FROM (
        |               SELECT e2.vec_id, cv2.pred,
        |                      unnest(e2.q) AS a, unnest(cv2.cq) AS b
        |               FROM e e2, cv cv2) GROUP BY 1, 2) dd
        |       JOIN e ON e.vec_id = dd.vec_id
        |       JOIN cv ON cv.pred = dd.pred
        |       JOIN n ON n.vec_id = dd.vec_id
        |       JOIN cn ON cn.pred = dd.pred),
        |best AS (SELECT vec_id, label, pred FROM (
        |           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |             ORDER BY cos DESC, pred) AS rk FROM sc)
        |         WHERE rk = 1)
        |SELECT label, pred, CAST(count(*) AS BIGINT) AS n_vecs
        |FROM best GROUP BY 1, 2""".stripMargin)),

    // ---- dedup: cheap-to-expensive cascade funnel ------------------------
    // Survivor-subset pair filtering in the oracle: per-doc signatures
    // and co-banding are independent of other docs, so minhash pairs
    // over the FULL corpus restricted to bow-survivor endpoints equal
    // pairs recomputed on the survivor subset (what the engine runs).
    Q("dedup_cascade_report",
      (s, d) => TextOps.dedupCascadeReport(docs(s, d)),
      Some(s"""WITH $MinhashPairsCte,
        |e1 AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |d1 AS (SELECT dd.* FROM documents dd JOIN e1 USING (doc_id)),
        |e2 AS (SELECT MIN(doc_id) AS doc_id FROM d1
        |       GROUP BY md5(array_to_string(list_sort(string_split(text, ' ')), ' '))),
        |drop3 AS (SELECT DISTINCT n.doc_b AS doc_id FROM ndup n
        |          JOIN e2 a ON a.doc_id = n.doc_a
        |          JOIN e2 b ON b.doc_id = n.doc_b),
        |u AS (
        |  SELECT 0 AS stage_idx, 'raw' AS stage,
        |         CAST(count(*) AS BIGINT) AS n_docs FROM documents
        |  UNION ALL
        |  SELECT 1, 'exact', CAST(count(*) AS BIGINT) FROM e1
        |  UNION ALL
        |  SELECT 2, 'bow', CAST(count(*) AS BIGINT) FROM e2
        |  UNION ALL
        |  SELECT 3, 'near_dup',
        |         (SELECT CAST(count(*) AS BIGINT) FROM e2)
        |           - (SELECT CAST(count(*) AS BIGINT) FROM drop3))
        |SELECT stage_idx, stage, n_docs,
        |       CAST(coalesce(lag(n_docs) OVER (ORDER BY stage_idx) - n_docs, 0)
        |         AS BIGINT) AS n_removed
        |FROM u""".stripMargin)),

    // ---- dedup: order-insensitive bag-of-words hash ----------------------
    Q("dedup_bow",
      (s, d) => TextOps.dedupBagOfWords(docs(s, d)),
      Some("""SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS bow_hash,
        |       MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin))
  )
}
