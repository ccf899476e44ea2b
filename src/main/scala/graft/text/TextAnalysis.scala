package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface (BASELINE.json
  * north star): language id, quality scoring, token counting, document
  * fingerprinting. All column-expression based (whole-stage codegen, no
  * UDFs), and every formula is mirrored exactly in the DuckDB oracles —
  * hence the stopword-arithmetic style (replace/length) rather than
  * engine-specific NLP primitives.
  *
  * Scale note: each operator is a narrow per-row projection over the
  * documents table — no shuffle at all; at 100 TB these run at scan speed
  * and column-prune to `(doc_id, text)`.
  */
object TextAnalysis {

  /** Whitespace-normalized lowercase form (shared by fingerprints/tokens). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Occurrences of `needle` in `padded` via length arithmetic (exact, and
    * expressible identically in any SQL dialect).
    */
  def countOccurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (crude GPT-style pre-tokenizer).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Count of CJK (Han) characters — the zh signal for language id. */
  def hanCount(text: Column): Column =
    length(regexp_replace(text, "[^一-鿿]", "")).cast("long")

  /** Per-language stopword hit counts over the space-padded lowercase text. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " is "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " que "),
    "de" -> Seq(" der ", " und ", " die "))

  def langScore(text: Column, lang: String): Column =
    stopwords(lang).map(countOccurrences(text, _)).reduce(_ + _)

  /** Language id by stopword/Han scoring with a fixed tie-break chain
    * (zh → en → fr → es → de). The DuckDB oracle reproduces the chain
    * verbatim, so the gate checks the classifier's exact decision surface.
    */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    docs
      .withColumn("s_zh", hanCount(col(textCol)))
      .withColumn("s_en", langScore(padded, "en"))
      .withColumn("s_fr", langScore(padded, "fr"))
      .withColumn("s_es", langScore(padded, "es"))
      .withColumn("s_de", langScore(padded, "de"))
      .withColumn("pred_lang",
        when(col("s_zh") > 0, "zh")
          .when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_es") &&
            col("s_en") >= col("s_de"), "en")
          .when(col("s_fr") >= col("s_es") && col("s_fr") >= col("s_de"), "fr")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
  }

  /** Quality features + composite score in [0,1]:
    * alphabetic density, punctuation ratio, stopword density, length norm.
    * Pure double arithmetic, identical expression tree in the oracle.
    */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val padded = concat(lit(" "), lower(t), lit(" "))
    val anyStop = (stopwords.keys.toSeq.sorted.flatMap(stopwords) // det. order
      .map(countOccurrences(padded, _)): Seq[Column]).reduce(_ + _)
    docs
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(t, "[^A-Za-z]", "")).cast("long"))
      .withColumn("n_punct", length(regexp_replace(t, "[^.,;:!?'\"()-]", "")).cast("long"))
      .withColumn("n_tokens", wsTokenCount(t))
      .withColumn("n_stop", anyStop)
      .withColumn("alpha_ratio", col("n_alpha") / col("n_chars_m"))
      .withColumn("punct_ratio", col("n_punct") / col("n_chars_m"))
      .withColumn("stop_density",
        least(col("n_stop") * lit(10.0) / col("n_tokens"), lit(1.0)))
      .withColumn("len_norm", least(col("n_chars_m") / lit(500.0), lit(1.0)))
      .withColumn("quality",
        col("alpha_ratio") * lit(0.4) + col("stop_density") * lit(0.3) +
          (lit(1.0) - col("punct_ratio")) * lit(0.2) + col("len_norm") * lit(0.1))
  }

  /** Document fingerprints: whole-document md5 plus the minimum 5-token
    * shingle hash (rolling-fingerprint/winnowing representative) — short
    * docs fall back to the whole-doc hash.
    */
  /** Salient-term extraction — the exact-integer core of tf-idf: each
    * doc's top-k terms ranked by term frequency, document frequency
    * ascending as the tie-break (rarer term = more salient), term text
    * last. `tf`, `df`, and the corpus size `n_docs` ride along so any
    * downstream weighting (idf, BM25 saturation) is one local expression —
    * the RANKING itself stays in integer space, bit-reproducible on any
    * engine/cluster (a float tf·idf rank would hinge on last-ulp ln()
    * differences across libm implementations).
    *
    * Scale shape: tf is one explode→partial-agg on (doc, term); df
    * re-aggregates the tf table by term (hot terms absorbed map-side);
    * the df join back is term-co-partitioned; the per-doc rank filter is
    * row_number()<=k, lowered onto TopKPerKey under GraftExtensions (no
    * per-doc sort at scale). n_docs is a 1-row broadcast cross join, not
    * a collect.
    */
  def topTermsPerDoc(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(normalized(col(textCol)), " ")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.select(
      countDistinct(col(idCol).cast("long")).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .crossJoin(broadcast(nDocs))
      // cast AFTER the rank<=k filter so RewriteWindowTopK still sees the
      // bare row_number() pattern; BIGINT matches the oracle's row_number
      .select(col("doc_id"), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("n_docs"))
  }

  /** One-pass JVM kernel for the min 5-token shingle md5. The composed
    * spelling — `array_min(transform(sequence(...), i =>
    * md5(array_join(slice(tokens, i, 5)))))` — re-evaluates the free
    * `tokens` reference (a regex normalize + split) inside the lambda for
    * every shingle position: O(tokens²) regex work per doc, measured 6 s
    * for 5k docs at sf0.1 vs 0.5 s for this kernel (the same
    * interpreted-HOF trap the dedup substring enumeration hit). Values
    * are identical: lowercase-hex md5 of the space-joined window,
    * lexicographic min — exactly what both the old spelling and the
    * DuckDB oracle compute.
    */
  private val minShingleMd5Udf = udf { (ntext: String) =>
    if (ntext == null) null
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(s: String): String = {
        md.reset()
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val sb = new java.lang.StringBuilder(32)
        var i = 0
        while (i < d.length) {
          sb.append(Character.forDigit((d(i) >> 4) & 0xF, 16))
          sb.append(Character.forDigit(d(i) & 0xF, 16))
          i += 1
        }
        sb.toString
      }
      val toks = ntext.split(" ")
      if (toks.length < 5) h(ntext)
      else {
        var best: String = null
        var i = 0
        while (i + 5 <= toks.length) {
          val sh = h(toks.slice(i, i + 5).mkString(" "))
          if (best == null || sh < best) best = sh
          i += 1
        }
        best
      }
    }
  }

  def withFingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp_md5", md5(normalized(col(textCol))))
      .withColumn("fp_shingle_min", minShingleMd5Udf(normalized(col(textCol))))
}
