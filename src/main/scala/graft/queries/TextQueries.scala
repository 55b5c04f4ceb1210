package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.text.TextAnalysis

/** I1-I4 — text analysis over the documents table. */
object TextQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** I1 `text_tokens` — whitespace + BPE-ish token counts. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    // long, not int: exact pandas-dtype parity with DuckDB's len()
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("bpeish_tokens"))

  /** I2 `text_langid` — stopword-list language guess. The words array
    * is projected once and shared by all five language scores
    * (CollapseProject keeps the hoist: the alias is non-cheap and
    * referenced five times). SQL-oracled: the argmax is array_max over
    * (score, lang) structs, i.e. ties break toward the LARGEST lang
    * string — the oracle's row_number twin orders score DESC, lang
    * DESC to state the identical tie-break.
    */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        TextAnalysis.langIdWords(col("text")).as("_words"))
      // the argmax struct is projected once too: langIdFromWords inline
      // would evaluate all five intersects twice (CASE branch duplication)
      .select(col("doc_id"), col("labeled_lang"),
        TextAnalysis.langIdBest(col("_words")).as("_best"))
      .select(col("doc_id"), col("labeled_lang"),
        when(col("_best").getField("score") > 0, col("_best").getField("lang"))
          .otherwise(lit("und")).as("predicted_lang"))

  /** I3 `text_quality` — length/punct/stopword quality features. All
    * exact integer-derived arithmetic: no rounding needed.
    */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val feats = TextAnalysis.qualityFeatures(col("text"))
    docs(s, dir).select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
  }

  /** I4 `text_fingerprint` — min-of-md5 over 5-word shingles as ONE
    * row-local codegen expression: a pure projection over the scan, no
    * shingle explode, no groupBy shuffle (same structural shift as the
    * MinHash/SimHash signature expressions).
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    // isNotNull keeps the explode formulation's (and the oracle's)
    // shape: null-text docs produced no shingle rows, hence no output
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions
          .minShingleMd5(col("text"), 5).as("fingerprint"))

  /** I+ `text_topterms` — corpus vocabulary statistics: top-20 terms by
    * document frequency (ties by term), with collection frequency. The
    * building block of stopword-list induction and vocab pruning at
    * corpus scale: one explode + two aggregations, top-k via
    * TakeOrdered.
    */
  def textTopTerms(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("coll_freq"))
      .orderBy(col("doc_freq").desc, col("term"))
      .limit(20)

  /** I+ `text_vocab` — Zipf coverage report: the top-20 terms by
    * collection frequency with each term's corpus share and the
    * cumulative coverage share — the stopword-induction / vocab-pruning
    * companion of text_topterms (which ranks by document frequency and
    * carries no coverage). Scale shape: one map-side-combining term
    * count, top-k via TakeOrdered, and the rank/cumsum windows run over
    * the 20 SURVIVING rows only (never the vocabulary); the corpus
    * total rides in as a 1-row cross-joined scalar (the tfidf
    * convention — construction stays lazy). Shares are exact-integer
    * divisions r6-rounded on both sides.
    */
  def textVocab(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("coll_freq"))
    val total = counts.agg(sum(col("coll_freq")).cast("double").as("_tot"))
    val byFreq = Window.orderBy(col("coll_freq").desc, col("term"))
    counts.orderBy(col("coll_freq").desc, col("term")).limit(20)
      .crossJoin(total)
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .withColumn("cum", sum(col("coll_freq"))
        .over(byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("term"), col("coll_freq"),
        r6(col("coll_freq") / col("_tot")).as("share"),
        r6(col("cum") / col("_tot")).as("cum_share"))
  }

  /** I+ `text_normalize` — whitespace/case canonicalization (the pass
    * before hashing/dedup) plus the post-normalization token count. The
    * normalized column is projected once and shared by the count.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextAnalysis.normalizeWs(col("text")).as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        TextAnalysis.wsTokenCount(col("norm_text")).cast("long").as("n_tokens"))

  /** I+ `text_redact` — the PII scrub pass (emails → digit runs →
    * phone shapes, in that order). The rules are RE2-portable by
    * design, so the oracle pins the exact same regexes in DuckDB —
    * scrub semantics are cross-engine-verified the same way the
    * normalization pass is.
    */
  def textRedact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("redacted"))

  /** I+ `text_pii` — the per-source PII incidence audit shipped next
    * to a scrubbed corpus: per redactPii pattern, the exact number of
    * substitutions the scrub makes (counted on the same email → num →
    * phone cascade), plus how many docs it touches.
    *
    * The synthetic corpus is PII-free (no digits, no '@' at any scale
    * factor), so reporting on the raw text would make the oracle
    * VACUOUS — all-zero counts on both engines prove nothing about
    * the regex cascade. The contract query therefore PLANTS
    * deterministic PII derived from doc_id (an email, a 10-digit run,
    * and a phone shape on every third doc) identically on both sides,
    * so the hash compare genuinely exercises email matching inside
    * prose, the num-before-phone masking order, and the phone shape —
    * cross-engine. The library operator ([[TextAnalysis.piiReport]])
    * stays a report over whatever text column it is given.
    */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val planted = docs(s, dir).withColumn("text",
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555"),
        lpad(col("doc_id").cast("string"), 7, "0"),
        when(col("doc_id") % 3 === 0, lit(" call +1 212 555 0199"))
          .otherwise(lit(""))))
    TextAnalysis.piiReport(planted, "source", "text")
  }

  /** I5 `text_repetition` — Gopher-style within-document duplication
    * fractions (dup-line chars, dup-2-gram instances): the standard
    * repetition quality gate of pre-training pipelines. Exact
    * integer-count fractions, fully oracled.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("dup_line_frac"), col("dup_2gram_frac"))

  /** I+ `text_curate` — the end-to-end curation composite (the text
    * family's hydro_wlb_pipeline): normalize → PII-redact → token
    * floor → exact dedup keep-one over the REDACTED content. One scan,
    * row-local codegen projections, and a single hash-shuffle groupBy
    * on the content — the whole ingestion gate as one plan.
    */
  def textCurate(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextAnalysis.normalizeWs(col("text")).as("norm"))
      .withColumn("redacted", TextAnalysis.redactPii(col("norm")))
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col("norm")).cast("long"))
      .filter(col("n_tokens") >= 5)
      .groupBy(col("redacted"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"),
        max(col("n_tokens")).as("n_tokens"))
      .select(col("keep_id"), col("redacted"), col("n_dups"), col("n_tokens"))

  /** I8 `text_tfidf` — per-document top-3 keywords by tf x (N/df). The
    * score is an exact integer product and one IEEE division (no log —
    * see TextAnalysis.tfidfTopTerms), so it is emitted UNROUNDED and
    * still hash-matches the oracle bit-for-bit. Tie-break (score DESC,
    * term ASC) stated identically on both sides.
    */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", topK = 3)

  /** I3+ `text_entropy` — Shannon entropy (bits/char) over each doc's
    * codepoint histogram, a row-local codegen expression (the standard
    * gibberish / degenerate-repetition quality signal). r6-rounded on
    * both sides: the histogram counts are exact integers in both
    * engines, but the Σ c·log2(c) accumulation order (and each
    * engine's log2) can differ in the last ulp.
    */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        r6(org.apache.spark.sql.graft.TextExpressions
          .charEntropy(col("text"))).as("entropy"))

  /** I11 `text_lm_score` — bigram LM quality score
    * ([[TextAnalysis.lmScore]]): every doc's average negative
    * log-likelihood and perplexity under the add-one-smoothed bigram
    * model fit on the corpus itself (the CCNet-style "reads like the
    * corpus" gate). Fully oracled: counts are exact integers, each
    * gram's logp is the same two float ops on both engines, and only
    * the per-doc SUM of ~n_tokens logps is accumulation-order
    * exposed — r6 on the two float outputs (the ds_drift /
    * emb_centroids precedent).
    */
  def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScore(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        r6(col("avg_nll")).as("avg_nll"), r6(col("ppl")).as("ppl"))

  /** I12 `text_c4_filter` — the C4/Gopher heuristic cleaning cascade
    * ([[TextAnalysis.c4QualityFilter]]) over synthesized 10-token
    * lines (the text_lines_dedup convention — the corpus texts are
    * single-line token streams): line rule = >= 5 tokens and no
    * blocklist token (`slow` stands in for the bad-word list), doc
    * rule = >= 3 surviving lines. Non-vacuous at sf0.01: 349 kept /
    * 151 rejected, with both rules firing. One row-local projection,
    * zero shuffle; fully oracled including the exact surviving text.
    */
  def textC4Filter(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val nLines = ceil(size(ws) / lit(10.0)).cast("int")
    val lined = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat_ws("\n", transform(sequence(lit(0), nLines - 1),
          i => concat_ws(" ", slice(ws, i * 10 + 1, lit(10))))).as("text"))
    TextAnalysis.c4QualityFilter(lined, "doc_id", "text",
      badWords = Seq("slow"), minLineTokens = 5, minLinesKept = 3)
  }

  /** I13 `text_bm25` — Okapi BM25 top-20 against the fixed query bag
    * {spark, vector, stream} ([[TextAnalysis.bm25TopK]]). Selection is
    * stated on the r6-rounded score grid with doc-id tie-breaks (the
    * ds_select convention), so both engines produce the identical
    * ranked set despite libm-ulp `ln` differences.
    */
  def textBm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
      queryTerms = Seq("spark", "vector", "stream"), topK = 20)

  /** I14 `text_hybrid` — hybrid retrieval cascade (retrieve-then-
    * rerank, the standard RAG shape): BM25 top-50 on the lexical leg
    * (the text_bm25 query bag), then exact embedding-cosine rerank of
    * ONLY those candidates against the vec_id-0 query vector (docs and
    * embeddings align 1:1 on id), top-10 by rounded cosine. The
    * expensive leg (vector math) runs on 50 rows, not the corpus —
    * the cascade's entire point at 100 TB. Both selections are stated
    * on the r6 grid with id tie-breaks, so the full two-stage pipeline
    * is SQL-oracled end-to-end.
    */
  def textHybrid(s: SparkSession, dir: String): DataFrame = {
    val bm = TextAnalysis.bm25TopK(
      docs(s, dir).filter(col("doc_id") =!= 0), "doc_id", "text",
      queryTerms = Seq("spark", "vector", "stream"), topK = 50)
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("_qv"))
    bm.join(emb.select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("score").as("bm25"),
        graft.functions.cosineSimilarity(
          col("embedding").cast("array<double>"), col("_qv")).as("_cos"))
      .orderBy(r6(col("_cos")).desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("bm25"), r6(col("_cos")).as("cosine"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_hybrid" -> textHybrid,
    "text_c4_filter" -> textC4Filter,
    "text_bm25" -> textBm25,
    "text_lm_score" -> textLmScore,
    "text_entropy" -> textEntropy,
    "text_tfidf" -> textTfidf,
    "text_curate" -> textCurate,
    "text_repetition" -> textRepetition,
    "text_redact" -> textRedact,
    "text_pii" -> textPii,
    "text_normalize" -> textNormalize,
    "text_topterms" -> textTopTerms,
    "text_vocab" -> textVocab,
    "text_tokens" -> textTokens,
    "text_langid" -> textLangId,
    "text_quality" -> textQuality,
    "text_fingerprint" -> textFingerprint)

  val oracles: Map[String, String] = Map(
    // the synthesized 10-token lines (text_lines_dedup convention),
    // then the same line-rule filter and >=3-surviving-lines doc gate
    "text_c4_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id,
        |    list_transform(range(1, CAST(ceil(len(ws) / 10.0) AS BIGINT) + 1),
        |      i -> array_to_string(ws[(i-1)*10+1 : (i-1)*10+10], ' ')) AS lines
        |  FROM t),
        |k AS (SELECT doc_id, lines,
        |    list_filter(lines, l -> len(string_split(l, ' ')) >= 5
        |      AND NOT list_has_any(string_split(l, ' '), ['slow'])) AS kept
        |  FROM d)
        |SELECT doc_id, len(kept) >= 3 AS kept,
        |  CASE WHEN len(kept) >= 3 THEN array_to_string(kept, chr(10))
        |       ELSE '' END AS clean_text,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(len(lines) - len(kept) AS BIGINT) AS n_lines_cut
        |FROM k""".stripMargin,
    // the text_bm25 chain (stats over doc_id <> 0) cut at 50 on the
    // rounded grid, then the ann_brute cosine twin over the candidates
    "text_hybrid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL AND doc_id <> 0),
        |f AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
        |    CAST(len(list_filter(ws, w -> w = 'spark')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(ws, w -> w = 'vector')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(ws, w -> w = 'stream')) AS BIGINT) AS tf2
        |  FROM t),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) AS BIGINT) AS sdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM f),
        |sc AS (SELECT doc_id,
        |    ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
        |        / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    + ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |        / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    + ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |        / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    AS score
        |  FROM f, s),
        |bm AS (SELECT doc_id,
        |    floor(score * 1000000 + 0.5001) / 1000000 AS bm25
        |  FROM sc ORDER BY floor(score * 1000000 + 0.5001) / 1000000 DESC,
        |    doc_id LIMIT 50),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT bm.doc_id AS doc_id, bm.bm25 AS bm25,
        |    list_dot_product(CAST(e.embedding AS DOUBLE[]), qv) /
        |      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                             CAST(e.embedding AS DOUBLE[]))) *
        |       sqrt(list_dot_product(qv, qv))) AS cosine
        |  FROM bm JOIN embeddings e ON bm.doc_id = e.vec_id, q)
        |SELECT doc_id, bm25,
        |  floor(cosine * 1000000 + 0.5001) / 1000000 AS cosine
        |FROM c ORDER BY floor(cosine * 1000000 + 0.5001) / 1000000 DESC,
        |  doc_id LIMIT 10""".stripMargin,
    // identical parenthesization term by term; ranking on the rounded
    // grid + doc_id so libm-ulp ln differences cannot reorder the set
    "text_bm25" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
        |    CAST(len(list_filter(ws, w -> w = 'spark')) AS BIGINT) AS tf0,
        |    CAST(len(list_filter(ws, w -> w = 'vector')) AS BIGINT) AS tf1,
        |    CAST(len(list_filter(ws, w -> w = 'stream')) AS BIGINT) AS tf2
        |  FROM t),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(dl) AS BIGINT) AS sdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM f),
        |sc AS (SELECT doc_id, dl,
        |    ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5)
        |        / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf0 AS DOUBLE) * 2.2) / (CAST(tf0 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    + ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5)
        |        / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf1 AS DOUBLE) * 2.2) / (CAST(tf1 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    + ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5)
        |        / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
        |      * ((CAST(tf2 AS DOUBLE) * 2.2) / (CAST(tf2 AS DOUBLE)
        |        + 1.2 * (0.25 + 0.75 * ((CAST(dl AS DOUBLE) * CAST(n AS DOUBLE))
        |          / CAST(sdl AS DOUBLE)))))
        |    AS score
        |  FROM f, s)
        |SELECT doc_id, dl AS n_tokens,
        |  floor(score * 1000000 + 0.5001) / 1000000 AS score
        |FROM sc ORDER BY floor(score * 1000000 + 0.5001) / 1000000 DESC, doc_id
        |LIMIT 20""".stripMargin,
    // same token split, same gram enumeration, same (c2+1)/(c1+V)
    // arithmetic and single ln per gram; r6 on the float outputs
    "text_lm_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents
        |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
        |grams AS (SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
        |    i -> {'w1': w[i], 'w2': w[i + 1]})) AS g FROM toks)),
        |uni AS (SELECT w1, count(*) AS c1
        |  FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY w1),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |big AS (SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY w1, w2),
        |scored AS (SELECT g.doc_id AS doc_id,
        |    ln((b.c2 + 1.0) / (u.c1 + vocab.v)) AS logp
        |  FROM grams g
        |  JOIN big b ON g.w1 = b.w1 AND g.w2 = b.w2
        |  JOIN uni u ON g.w1 = u.w1, vocab)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor(-sum(logp) / count(*) * 1000000 + 0.5001) / 1000000
        |    AS avg_nll,
        |  floor(exp(-sum(logp) / count(*)) * 1000000 + 0.5001) / 1000000
        |    AS ppl
        |FROM scored GROUP BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, ch, count(*) AS c FROM c GROUP BY doc_id, ch),
        |e AS (SELECT doc_id, sum(c) AS n, sum(c * log2(c)) AS s
        |  FROM h GROUP BY doc_id)
        |SELECT doc_id,
        |  floor((log2(n) - s / n) * 1000000 + 0.5001) / 1000000 AS entropy
        |FROM e""".stripMargin,
    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, term, CAST(tf * n AS DOUBLE) / df AS score
        |  FROM tf JOIN df USING (term), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rank FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
        |FROM r WHERE rank <= 3""".stripMargin,
    "text_langid" ->
      """WITH w AS (SELECT doc_id, lang AS labeled_lang,
        |    regexp_split_to_array(lower(text), '\s+') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id, labeled_lang, 'en' AS cand,
        |    len(list_intersect(ws, ['the','and','of','to','a','in','is'])) AS score FROM w
        |  UNION ALL SELECT doc_id, labeled_lang, 'fr',
        |    len(list_intersect(ws, ['le','la','et','les','des','un','une'])) FROM w
        |  UNION ALL SELECT doc_id, labeled_lang, 'es',
        |    len(list_intersect(ws, ['el','de','los','y','que','en','una'])) FROM w
        |  UNION ALL SELECT doc_id, labeled_lang, 'de',
        |    len(list_intersect(ws, ['der','die','und','das','ist','ein','nicht'])) FROM w
        |  UNION ALL SELECT doc_id, labeled_lang, 'zh',
        |    len(list_intersect(ws, ['de','shi','le','zai','he','you'])) FROM w),
        |b AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, cand DESC) AS rn FROM s)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN score > 0 THEN cand ELSE 'und' END AS predicted_lang
        |FROM b WHERE rn = 1""".stripMargin,
    "text_curate" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |r AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(norm,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g'),
        |      '\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ]?[0-9]{3,4}[-. ]?[0-9]{3,4}',
        |      '<PHONE>', 'g') AS redacted,
        |    CAST(len(string_split_regex(trim(norm), '\s+')) AS BIGINT) AS n_tokens
        |  FROM n)
        |SELECT min(doc_id) AS keep_id, redacted,
        |  count(*) AS n_dups, max(n_tokens) AS n_tokens
        |FROM r WHERE n_tokens >= 5
        |GROUP BY redacted""".stripMargin,
    "text_repetition" ->
      """WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        |  FROM documents),
        |lc AS (SELECT doc_id, line, count(*) AS n,
        |    CAST(length(line) AS BIGINT) AS len
        |  FROM l GROUP BY doc_id, line),
        |lf AS (SELECT doc_id,
        |    sum(CASE WHEN n > 1 THEN n * len ELSE 0 END) / sum(n * len)
        |      AS dup_line_frac
        |  FROM lc GROUP BY doc_id),
        |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws)),
        |      i -> ws[i] || ' ' || ws[i + 1])) AS gram
        |  FROM w WHERE len(ws) >= 2),
        |gc AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram),
        |gf AS (SELECT doc_id,
        |    sum(CASE WHEN n > 1 THEN n ELSE 0 END) / sum(n) AS dup_2gram_frac
        |  FROM gc GROUP BY doc_id)
        |SELECT d.doc_id, lf.dup_line_frac, gf.dup_2gram_frac
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN lf ON d.doc_id = lf.doc_id
        |LEFT JOIN gf ON d.doc_id = gf.doc_id""".stripMargin,
    "text_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g'),
        |    '\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ]?[0-9]{3,4}[-. ]?[0-9]{3,4}',
        |    '<PHONE>', 'g') AS redacted
        |FROM documents""".stripMargin,
    // the text_redact cascade, counted: emails on raw text, digit
    // runs on the email-masked text, phone shapes on the num-masked.
    // PII is PLANTED from doc_id (see textPii scaladoc) — the corpus
    // itself is PII-free, so raw-text counts would be vacuously zero
    "text_pii" ->
      """WITH a AS (SELECT source,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or 555' || lpad(CAST(doc_id AS VARCHAR), 7, '0')
        |      || CASE WHEN doc_id % 3 = 0 THEN ' call +1 212 555 0199'
        |              ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT source,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |    len(regexp_extract_all(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{7,}')) AS n,
        |    len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{7,}', '<NUM>', 'g'),
        |      '\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ]?[0-9]{3,4}[-. ]?[0-9]{3,4}')) AS p
        |  FROM a)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(e) AS BIGINT) AS n_email,
        |  CAST(sum(n) AS BIGINT) AS n_num,
        |  CAST(sum(p) AS BIGINT) AS n_phone,
        |  CAST(sum(CASE WHEN e + n + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged
        |FROM c GROUP BY source""".stripMargin,
    "text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id, norm_text,
        |  CAST(len(string_split_regex(trim(norm_text), '\s+')) AS BIGINT) AS n_tokens
        |FROM n""".stripMargin,
    "text_topterms" ->
      """SELECT term, count(DISTINCT doc_id) AS doc_freq, count(*) AS coll_freq
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) t
        |GROUP BY term
        |ORDER BY doc_freq DESC, term
        |LIMIT 20""".stripMargin,
    "text_vocab" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (SELECT term, count(*) AS coll_freq FROM t GROUP BY term),
        |tot AS (SELECT CAST(sum(coll_freq) AS DOUBLE) AS tot FROM c),
        |top AS (SELECT term, coll_freq,
        |    row_number() OVER (ORDER BY coll_freq DESC, term) AS rank
        |  FROM c ORDER BY coll_freq DESC, term LIMIT 20)
        |SELECT CAST(rank AS BIGINT) AS rank, term, coll_freq,
        |  floor(coll_freq / tot * 1000000 + 0.5001) / 1000000 AS share,
        |  floor(sum(coll_freq) OVER (ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot
        |    * 1000000 + 0.5001) / 1000000 AS cum_share
        |FROM top, tot""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpeish_tokens
        |FROM documents""".stripMargin,
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    CAST(length(text) AS DOUBLE) AS len,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS nw
        |  FROM documents)
        |SELECT doc_id,
        |  len AS n_chars,
        |  nw AS n_words,
        |  (len - (nw - 1)) / nw AS mean_word_len,
        |  (len - CAST(length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)) / len AS punct_ratio,
        |  (len - CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)) / len AS digit_ratio,
        |  CAST(len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
        |    ['the','and','of','to','a','in','is'])) AS DOUBLE) / nw AS stopword_ratio
        |FROM t""".stripMargin,
    "text_fingerprint" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(words) - 4, 1) + 1),
        |      i -> md5(array_to_string(words[i:i+4], ' ')))) AS h
        |  FROM w)
        |SELECT doc_id, min(h) AS fingerprint FROM sh GROUP BY doc_id""".stripMargin)
}
