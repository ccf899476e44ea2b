package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between "raw documents" and "training shards": benchmark decontamination,
  * deterministic stratified sampling, sequence packing, vocabulary top-k,
  * and leakage-safe train/test splitting.
  *
  * Everything here is deterministic by construction (hash-threshold
  * sampling, fixed tie-breaks, order-free aggregates) so a re-run on a
  * different cluster/partitioning reproduces the exact corpus — which is a
  * hard requirement for reproducible training runs, and is what lets every
  * operator be value-checked against a DuckDB oracle.
  */
object Pipeline {

  /** Knuth multiplicative hash of a BIGINT id into [0, denom). Pure integer
    * arithmetic (floorMod(floorMod(id, 2^31-1) * 2^32/phi, denom)) so any
    * engine computes the identical bucket — unlike rand(), the sample is
    * stable across runs, partitionings, and engines. The inner fold keeps
    * the product under 2^62, so negative and 64-bit snowflake-style ids
    * hash without overflow (Spark ANSI mode traps Long wrap) and the
    * formula stays bit-portable to any BIGINT engine; ids below 2^31-1
    * hash identically to the plain Knuth form.
    */
  def hashBucket(id: Column, denom: Int): Column =
    pmod(pmod(id.cast("long"), lit(2147483647L)) * lit(2654435761L),
      lit(denom.toLong))

  /** Decontamination (the GPT-3-style n-gram overlap check): flag every
    * training doc sharing at least one word n-gram shingle with the held-out
    * eval set, with the count of distinct shared shingles as evidence.
    *
    * Scale shape: the eval side is benchmark-sized (thousands of docs, not
    * billions), so its distinct shingle set is broadcast — the 100 TB train
    * side is scanned once, shingled map-side, and hash-joined locally with
    * NO shuffle of train data; the one shuffle is the per-doc count
    * aggregation over the (rare) contaminated hits.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    def shingles(d: DataFrame) = d.select(col(idCol).as("doc_id"),
      explode(Dedup.distinctNgramsUdf(n)(
        TextAnalysis.normalized(col(textCol)))).as("gram"))
    val evalGrams = shingles(eval).select("gram").distinct()
    shingles(train)
      .join(broadcast(evalGrams), Seq("gram"))
      // shingles are distinct per doc, so a plain count is the distinct
      // shared-shingle count
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The end product: the training corpus with contaminated docs removed.
    * Left-anti against the flagged set (tiny relative to train, broadcast).
    */
  def decontaminatedCorpus(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    // join on the RAW id column: flagged doc_ids come from the same column,
    // so the types always match — a cast here would null out non-integral
    // ids (string/url/hash ids are common) and silently skip the removal
    val flagged = decontaminate(train, eval, idCol, textCol, n)
      .select(col("doc_id").as("__flagged_id"))
    train.join(broadcast(flagged),
      train(idCol) === col("__flagged_id"), "left_anti")
  }

  /** Deterministic stratified sampling: keep a row iff its id's hash bucket
    * falls under its stratum's per-mille rate. A pure narrow filter — no
    * shuffle, runs at scan speed at any corpus size, and the kept set is
    * independent of partitioning (same ids survive on 1 or 1000 executors).
    * Strata missing from `ratesPerMille` are dropped (rate 0).
    */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
      ratesPerMille: Map[String, Int]): DataFrame = {
    val rate = ratesPerMille.toSeq.sortBy(_._1) // deterministic chain order
      .foldLeft(lit(0)) { case (acc, (stratum, r)) =>
        when(col(strataCol) === stratum, lit(r)).otherwise(acc)
      }
    docs.withColumn("bucket", hashBucket(col(idCol), 1000))
      .filter(col("bucket") < rate)
  }

  /** Per-source document cap — the "domain capping" step of public
    * pretraining recipes (RefinedWeb/Dolma bound any one domain's share of
    * the corpus so a single crawl-heavy site cannot dominate training):
    * keep at most `cap` documents per source, survivors chosen by the same
    * deterministic id-hash priority as [[stratifiedSample]] (id tie-break),
    * so the kept set is stable across runs, partitionings, and engines —
    * a re-crawl keeps the same documents. Appends the 1-based `rank`.
    *
    * Scale shape: lowered onto the [[graft.plans.TopKPerKey]] physical
    * operator — each map partition retains ≤cap rows per source BEFORE the
    * exchange, so a skewed 100 TB crawl ships cap·partitions rows per
    * domain instead of the domain's full contents (the skew this operator
    * exists to remove is exactly the skew a groupBy would die on).
    */
  def capPerSource(docs: DataFrame, idCol: String, sourceCol: String,
      cap: Int): DataFrame = {
    val prioritized = docs
      .select(col(idCol), col(sourceCol))
      .withColumn("priority", hashBucket(col(idCol), 1000000))
    graft.plans.TopKPerKey.topK(prioritized, Seq(sourceCol),
      Seq(("priority", true), (idCol, true)), cap)
  }

  /** Deterministic global training-order shuffle: every doc gets an exact
    * global position (`shuffle_pos`, 0-based) under a seeded portable hash
    * of its id — the order you stream 100 TB of training data in, fully
    * reproducible across runs, partitionings, and engines (md5 string
    * arithmetic on both sides of the oracle). Changing the seed is a fresh
    * epoch-level reshuffle.
    *
    * Scale shape: a distributed ORDER BY on the hash key (range partition +
    * partition-local sort) with positions assigned by the prefix-sum
    * machinery of [[graft.analytics.Ranking.globalRowNumber]] — no
    * single-partition window anywhere; the driver only ever sees the
    * partition-count vector.
    */
  def shuffleCorpus(docs: DataFrame, idCol: String, seed: String): DataFrame =
    graft.analytics.Ranking.globalRowNumber(
      docs.withColumn("__shufkey",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string")))),
      Seq(col("__shufkey"), col(idCol)))
      .withColumn("shuffle_pos", col("rn") - 1)
      .drop("__shufkey", "rn")

  /** Sequence packing (concatenate-and-chunk): assign each document its
    * token span in fixed-size context windows, the way LLM training shards
    * pack text. Docs are sharded by id, laid out in id order within the
    * shard, and chunked into `windowTokens`-sized windows; a doc whose span
    * crosses a boundary simply spans multiple windows (GPT-style packing —
    * no padding, no discarded tokens).
    *
    * Scale shape: one shuffle on the shard key; the running offset is a
    * window function local to each shard partition. `shards` is the
    * write-parallelism knob — at 100 TB you set it to O(output files), and
    * each shard's layout is independent of every other's.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 256, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.wsTokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_window", expr(s"`offset` div $windowTokens"))
      .withColumn("n_windows",
        expr(s"(`offset` + n_tokens - 1) div $windowTokens") -
          col("first_window") + lit(1L))
      .select("doc_id", "shard", "n_tokens", "offset", "first_window", "n_windows")
  }

  /** RAG-style fixed-window chunking with overlap: token windows of
    * `chunkTokens` starting every `stride` tokens (overlap = chunkTokens -
    * stride). Chunk starts are `i*stride` for `i ∈ [0, extra]` with
    * `extra = ceil((n - chunkTokens)/stride)` (0 for short docs), so the
    * final window always reaches the last token and no window starts past
    * the end. Emits `(doc_id, chunk_id, n_tokens, chunk_md5)` — the md5 is
    * over the space-joined window, the retrieval-index key shape.
    *
    * Scale shape: a narrow per-row explode — no shuffle at all; output row
    * count is ~n_tokens/stride per doc. At 100 TB this runs at scan speed
    * and the chunks land partitioned exactly as the input docs.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 40, stride: Int = 30): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got stride=$stride chunk=$chunkTokens")
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.normalized(col(textCol)).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(col("doc_id"), split(col("ntext"), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("extra", when(col("n_tok") > chunkTokens,
        expr(s"(n_tok - $chunkTokens + $stride - 1) div $stride"))
        .otherwise(lit(0L)))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("extra"))).as("chunk_id"))
      .withColumn("ctoks",
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkTokens)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_md5"))
  }

  /** Vocabulary building: the k most frequent word n-grams per key (e.g.
    * per language), ties broken lexicographically. Expressed as the
    * row_number()<=k rank-filter so `RewriteWindowTopK` lowers it onto the
    * TopKPerKey physical operator (bounded heaps around the exchange, no
    * per-key sort) in sessions with GraftExtensions installed.
    */
  def topNgramsPerKey(docs: DataFrame, keyCol: String, textCol: String,
      n: Int = 2, k: Int = 10): DataFrame = {
    val counts = docs
      .select(col(keyCol).as("key"),
        explode(Dedup.ngramsUdf(n)(
          TextAnalysis.normalized(col(textCol)))).as("gram"))
      .groupBy("key", "gram")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("key").orderBy(col("n").desc, col("gram").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // cast AFTER the filter (RewriteWindowTopK pattern); oracle is int64
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Leakage-safe train/test split: near-duplicate clusters (from
    * [[Dedup.nearDupSurvivors]]) are assigned to a split as a UNIT — the
    * split decision hashes the cluster's canonical survivor id, so two
    * near-duplicate documents can never straddle train/test (the classic
    * eval-contamination failure of row-wise random splits).
    * `trainPerMille` of the hash space goes to train, the rest to test.
    */
  def leakproofSplit(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, trainPerMille: Int = 800): DataFrame =
    splitBySurvivor(
      Dedup.nearDupSurvivors(docs, idCol, textCol, threshold), trainPerMille)

  /** [[leakproofSplit]] over a precomputed `(doc_id, survivor_id)` table —
    * the split itself is a narrow projection, so pipelines that already
    * materialized the survivor fixpoint (the expensive part) reuse it.
    */
  def splitBySurvivor(survivors: DataFrame, trainPerMille: Int = 800): DataFrame =
    survivors.withColumn("split",
      when(hashBucket(col("survivor_id"), 1000) < trainPerMille, "train")
        .otherwise("test"))

  /** PII categories scrubbed from training text, in application order:
    * (name, pattern, replacement token). The patterns are deliberately
    * RE2-safe (character classes and bounded repetition only — no
    * lookarounds, no backreferences) so Java regex, RE2-family engines, and
    * the DuckDB oracle all match byte-identically.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** PII redaction: every [[PiiPatterns]] category is counted on the
    * ORIGINAL text (per-category evidence survives even where categories
    * would overlap) and then replaced in sequence with its token. A pure
    * narrow projection — at 100 TB this runs at scan speed, column-prunes
    * to `(id, text)`, and shuffles nothing.
    */
  /** The [[PiiPatterns]] replacement chain as a column expression. */
  def redactText(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, p, tok)) =>
      regexp_replace(c, lit(p), lit(tok))
    }

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (name, p, _) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0)))
        .cast("long").as(s"n_$name")
    }
    docs.select(col(idCol).cast("long").as("doc_id") +:
      redactText(col(textCol)).as("redacted") +: counts: _*)
  }

  /** Gopher-style per-document repetition metrics over normalized tokens:
    * token/distinct counts, distinct-token ratio, and the mass fraction of
    * the single most frequent token and bigram. High single-token or
    * single-bigram mass is the classic boilerplate/spam signature that
    * repetition filters (Gopher §A1.1-style rules) cut on.
    *
    * Scale shape: two explode→two-level-aggregate chains keyed on doc_id —
    * partial aggregation absorbs the explode fan-out map-side, and the
    * final join is co-partitioned on doc_id. All ratios are plain
    * long/long→double divisions, structurally mirrored in the oracle.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.normalized(col(textCol)).as("ntext"))
    val tokStats = base
      .select(col("doc_id"), explode(split(col("ntext"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max("n").as("max_tok"))
    val biStats = base
      .select(col("doc_id"), explode(Dedup.ngramsUdf(2)(col("ntext"))).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_bigrams"), max("n").as("max_bigram"))
    tokStats.join(biStats, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct") / col("n_tokens")).as("distinct_ratio"),
        (col("max_tok") / col("n_tokens")).as("top_token_frac"),
        (col("max_bigram") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** The filter a pipeline actually applies: keep a doc iff its repetition
    * metrics clear the thresholds (both strictly `<` / `>=` so the decision
    * surface is exact and oracle-checkable).
    */
  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String,
      minDistinctRatio: Double = 0.35, maxTopBigramFrac: Double = 0.08): DataFrame =
    repetitionMetrics(docs, idCol, textCol)
      .withColumn("keep",
        col("distinct_ratio") >= minDistinctRatio &&
          col("top_bigram_frac") < maxTopBigramFrac)

  /** The corpus-audit report a data team reads before a training run: one
    * row per stratum (source/domain) with volume, token counts, corpus-level
    * alpha ratio, the repetition-filter keep fraction, and the majority
    * PREDICTED language (mode of the language-id classifier, lexicographic
    * tie-break). Every ratio divides two exact LONG sums — never a mean of
    * per-doc doubles, whose summation order would make the report
    * run-dependent — so the report is bit-reproducible on any cluster.
    *
    * Scale shape: the per-doc feature passes are narrow projections plus
    * the repetition explode chains (partial-agg absorbed); everything then
    * aggregates to O(strata) rows. The majority-language rank-filter is a
    * row_number()<=1 window over per-stratum language counts — metadata
    * volume, and lowered onto TopKPerKey under GraftExtensions.
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, minDistinctRatio: Double = 0.35,
      maxTopBigramFrac: Double = 0.08): DataFrame = {
    val quality = TextAnalysis.withQuality(docs, textCol)
      .select(col(idCol).cast("long").as("doc_id"), col(strataCol),
        col("n_chars_m"), col("n_alpha"), col("n_tokens"))
    val rep = repetitionFilter(docs, idCol, textCol,
      minDistinctRatio, maxTopBigramFrac)
      .select(col("doc_id"), col("keep"))
    val lang = TextAnalysis.withLangId(docs, textCol)
      .select(col(idCol).cast("long").as("doc_id"), col("pred_lang"))
    val base = quality.join(rep, Seq("doc_id")).join(lang, Seq("doc_id"))
    val agg = base.groupBy(col(strataCol)).agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_alpha").as("__alpha"), sum("n_chars_m").as("__chars"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("__kept"))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens") / col("n_docs")).as("tokens_per_doc"),
        (col("__alpha") / col("__chars")).as("alpha_ratio"),
        (col("__kept") / col("n_docs")).as("kept_frac"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("n").desc, col("pred_lang").asc)
    val topLang = base.groupBy(col(strataCol), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col(strataCol), col("pred_lang").as("top_lang"),
        col("n").as("top_lang_n"))
    agg.join(topLang, Seq(strataCol))
  }

  /** Mixture sampling: downsample each stratum so the kept corpus matches a
    * target mixture (relative weights, e.g. source/domain weights of a
    * training run). The bottleneck stratum pins the scale: `m_units` =
    * min over strata of `n_s div w_s` is the largest number of "weight
    * units" every stratum can fill, each stratum's target is
    * `m_units · w_s` rows, and the keep decision is the same deterministic
    * per-mille hash threshold as [[stratifiedSample]] — so the selection
    * stays a narrow scan-speed filter, independent of partitioning, with
    * NO per-stratum window (a rank-exact variant would shuffle the full
    * corpus into per-stratum sorted partitions; at 100 TB a single hot
    * stratum would serialize into one task). All arithmetic is integer
    * (floor-div), mirrored exactly by the oracle.
    *
    * Strata missing from `weights` are dropped — same contract as
    * [[stratifiedSample]].
    */
  /** The end-to-end corpus preparation a training run executes, composed
    * from the individual operators in the order that matters:
    *
    *   1. PII scrub (sensitive spans never reach any later stage or shard),
    *   2. repetition/boilerplate filter,
    *   3. benchmark decontamination against the held-out eval set,
    *   4. near-dup dedup (each cluster collapsed to its canonical survivor),
    *   5. optional mixture sampling to target stratum weights,
    *   6. train/test split — hashing the surviving doc's OWN id is
    *      leakproof here BY CONSTRUCTION: step 4 left exactly one document
    *      per near-dup cluster, so no near-duplicate pair exists to
    *      straddle the split.
    *
    * Every stage is deterministic, so the whole pipeline is reproducible
    * end-to-end: same input → byte-identical corpus on any partitioning.
    * Stages 1-2 are narrow scans; 3 broadcasts only eval shingles; 4 is the
    * banded LSH pipeline; 5 is a narrow hash filter — nothing here breaks
    * at 100 TB.
    */
  def prepareCorpus(docs: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, strataCol: String, threshold: Double = 0.5,
      weights: Map[String, Int] = Map.empty, trainPerMille: Int = 800,
      minDistinctRatio: Double = 0.35,
      maxTopBigramFrac: Double = 0.08): DataFrame = {
    val scrubbed = docs.withColumn(textCol, redactText(col(textCol)))
    val kept = repetitionFilter(scrubbed, idCol, textCol,
        minDistinctRatio, maxTopBigramFrac)
      .filter(col("keep")).select(col("doc_id").as("__keep_id"))
    val filtered = scrubbed.join(kept,
      scrubbed(idCol).cast("long") === col("__keep_id"), "left_semi")
    val decontaminated = decontaminatedCorpus(filtered, eval, idCol, textCol)
    val deduped = Dedup.dedupedCorpus(decontaminated, idCol, textCol, threshold)
    val mixed =
      if (weights.isEmpty) deduped
      else mixtureSample(deduped, idCol, strataCol, weights).drop("bucket", "rate")
    mixed.withColumn("split",
      when(hashBucket(col(idCol), 1000) < trainPerMille, "train")
        .otherwise("test"))
  }

  /** Exactly-n-per-stratum deterministic sample (eval-set construction,
    * per-source spot-check corpora): rank each stratum's docs by the id's
    * multiplicative hash (id as tie-break) and keep the first n — a
    * pseudo-random but reproducible choice, independent of partitioning.
    * Unlike [[stratifiedSample]]'s rate filter this guarantees the exact
    * count. The rank filter is `row_number() <= n`, so `RewriteWindowTopK`
    * lowers it onto the TopKPerKey physical operator in GraftExtensions
    * sessions — bounded heaps around the exchange, never a full per-stratum
    * sort of a 100 TB stratum.
    */
  def samplePerStratum(docs: DataFrame, idCol: String, strataCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(col("hkey"), col(idCol).cast("long"))
    docs.withColumn("hkey", hashBucket(col(idCol), 1 << 20))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Expected chunk length (tokens) for content-defined chunking: a token
    * CLOSES a chunk iff its md5-derived 48-bit value ≡ 0 (mod this), so
    * chunks average `CdcBoundaryMod` tokens and boundaries depend only on
    * content, never position.
    */
  val CdcBoundaryMod = 4

  /** Content-defined chunking of each doc's token stream (the rsync/LBFS
    * boundary trick): chunk breaks fall AFTER any token whose hash hits the
    * boundary condition, so the same word sequence chunks identically no
    * matter where it sits inside a document. Fixed-offset chunking (pos div
    * k) misses a boilerplate span shifted by one token; content-defined
    * boundaries re-synchronize immediately — that is the property corpus
    * span-dedup needs.
    *
    * Returns one row per (doc_id, chunk_no, chunk-text). Scale shape: one
    * shuffle on doc_id (the position window + in-doc reassembly share it —
    * hash partitioning on doc_id satisfies the (doc_id, chunk_no) grouping
    * so Catalyst inserts no second exchange); the boundary hash is the
    * codegen'd md5/conv chain, no UDF.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(TextAnalysis.normalized(col(textCol)), " "))
          .as(Seq("pos", "tok")))
      .withColumn("is_boundary",
        when(expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)")
          % CdcBoundaryMod === 0, 1L).otherwise(0L))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk_no", coalesce(sum("is_boundary").over(w), lit(0L)))
      .groupBy("doc_id", "chunk_no")
      .agg(collect_list(struct(col("pos"), col("tok"))).as("pt"))
      .select(col("doc_id"), col("chunk_no"),
        array_join(expr("transform(array_sort(pt), x -> x.tok)"), " ")
          .as("chunk"))
  }

  /** Corpus-wide span dedup (the C4-style move, offset-robust): every
    * repeated content-defined chunk keeps only its FIRST occurrence — min
    * (doc_id, chunk_no) over the whole corpus — and each document is
    * rebuilt from its surviving chunks. Boilerplate repeated across
    * millions of pages (nav text, license banners, subscribe footers)
    * disappears from every doc but the first, wherever it sits in the page.
    *
    * Output: (doc_id, n_chunks, n_kept, text) — one row per input doc;
    * a fully-duplicate doc survives with n_kept = 0 and empty text, so the
    * caller can drop or keep empties by policy.
    *
    * Scale shape: first-occurrence selection is groupBy(min) on the chunk
    * FINGERPRINT (md5 — 32 bytes shuffle-wide, not the chunk text), so
    * map-side partial aggregation absorbs hot boilerplate chunks; the
    * verdict join back is a plain equi-join on the fingerprint (AQE
    * skew-splits a mega-hot key). Nothing is quadratic and no stage ships
    * a hot chunk's text more than once per partition.
    */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chunks = cdcChunks(docs, idCol, textCol)
      .withColumn("fp", md5(col("chunk")))
    val firsts = chunks.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("chunk_no"))).as("first"))
    val kept = chunks.join(firsts, Seq("fp"))
      .filter(struct(col("doc_id"), col("chunk_no")) === col("first"))
    val totals = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        collect_list(struct(col("chunk_no"), col("chunk"))).as("cc"))
      .select(col("doc_id"), col("n_kept"),
        array_join(expr("transform(array_sort(cc), x -> x.chunk)"), " ")
          .as("text"))
    totals.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** k-anonymity / l-diversity audit — the governance check next to
    * [[redactPii]]: group the table by its quasi-identifier columns and
    * report each equivalence class's size (k-anonymity: every class ≥ k
    * means no record is identifiable within fewer than k peers) and the
    * number of distinct sensitive values in the class (l-diversity: a
    * class whose sensitive attribute is constant leaks it even at large
    * k). One partial-agg groupBy over the quasi columns — count +
    * count-distinct-by-two-level-agg, no Expand: the sensitive distinct
    * count aggregates (quasi..., sensitive) first, then per class.
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int = 2): DataFrame = {
    val qs = quasiCols.map(col)
    val perValue = df.groupBy(qs :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("n_rows"))
    perValue.groupBy(qs: _*)
      .agg(sum(col("n_rows")).as("class_size"),
        count(lit(1)).as("l_distinct"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("l_distinct") < l)
  }

  /** Systematic probability-proportional-to-size sampling: lay documents
    * on a line in id order, each occupying an interval of its own weight
    * (e.g. characters or tokens), and pick every document whose interval
    * contains a multiple of `stride`. Inclusion probability = w/stride
    * (for w < stride) with zero variance in the achieved total weight —
    * the classic systematic PPS design, here fully deterministic (fixed
    * phase, id order) so any two runs on any partitioning agree row-for-
    * row. All integer arithmetic: a document at cumulative weight c with
    * weight w is selected iff ⌊c/stride⌋ > ⌊(c−w)/stride⌋.
    *
    * Scale shape: the cumulative weight comes from
    * [[graft.analytics.Ranking.globalPrefixSum]] (range partition + local
    * sort + metadata-sized offset collect) — no single-partition window,
    * no driver-side data rows. Zero-weight documents are never selected
    * (their interval is empty).
    */
  def ppsSample(docs: DataFrame, idCol: String, weightCol: String,
      stride: Long): DataFrame =
    graft.analytics.Ranking.globalPrefixSum(
        docs.select(col(idCol), col(weightCol).cast("long").as("w")),
        Seq(col(idCol)), col("w"))
      .filter(expr(s"cumw div $stride > (cumw - w) div $stride"))
      .select(col(idCol), col("w"), col("cumw"))

  def mixtureSample(docs: DataFrame, idCol: String, strataCol: String,
      weights: Map[String, Int]): DataFrame = {
    val wexpr = weights.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (stratum, w)) =>
        when(col(strataCol) === stratum, lit(w.toLong)).otherwise(acc)
      }
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", wexpr)
      .filter(col("w_s") > 0)
    // one global scalar (the bottleneck stratum's unit count) — a 1-row
    // DataFrame cross-joined back in, never a driver-side collect
    val units = counts.agg(min(expr("n_s div w_s")).as("m_units"))
    val rates = counts.crossJoin(broadcast(units))
      .select(col(strataCol),
        expr("least(1000L, (m_units * w_s * 1000) div n_s)").as("rate"))
    docs.withColumn("bucket", hashBucket(col(idCol), 1000))
      .join(broadcast(rates), Seq(strataCol))
      .filter(col("bucket") < col("rate"))
  }
}
