package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-facing dedup bundle. The testdata ships with no duplicates (every
  * normalized text and embedding is unique), so each query runs over a
  * deterministically *augmented* corpus — exact copies of every 10th doc,
  * tail-perturbed copies of every doc ending in 5, scaled copies of every
  * 10th embedding — derived identically here and in the DuckDB CTEs, so the
  * dedup operators have real positives to find and the oracle checks they
  * find exactly those.
  */
object DedupSurface {

  /** Synthetic-id band width: the augmented copies live at id + k·band.
    * At least the legacy 100000 (so every existing sf output and the specs
    * pinned to those ids are unchanged); once real ids reach 100000 — the
    * ≥20× replica probes — the band derives from the corpus max, so
    * synthetic ids can NEVER collide with genuine ones (a collision makes
    * corpus ids non-unique and silently diverges every per-doc-grouped
    * oracle; caught by the 30× probe in round 12).
    */
  // memoized per dataset CONTENT, not just path — without the cache every
  // gate build (and every bench rep) pays an extra driver job for a value
  // that rarely changes, but a path-only key would serve a stale band after
  // a dataset is regenerated in place (the probe harness does exactly that)
  // while the SQL oracle twins recompute MAX(doc_id)+1 live. The key folds
  // in each parquet file's name/size/mtime; a non-local path (no local
  // file) keys on path alone, preserving the old behavior there.
  private val bandCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), Long]

  private def contentStamp(d: String, table: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName)
          .foldLeft(f.getName.hashCode.toLong)((a, c) => a * 1000003L ^ walk(c))
      else f.getName.hashCode.toLong * 31 + f.length() * 1000003L + f.lastModified()
    val f = new java.io.File(d, s"$table.parquet")
    if (f.exists()) walk(f) else 0L
  }

  def docBand(s: SparkSession, d: String): Long =
    bandCache.getOrElseUpdate(("documents", d, contentStamp(d, "documents")),
      math.max(100000L,
        Tables.documents(s, d).agg(max(col("doc_id"))).head().getLong(0) + 1))

  def vecBand(s: SparkSession, d: String): Long =
    bandCache.getOrElseUpdate(("embeddings", d, contentStamp(d, "embeddings")),
      math.max(100000L,
        Tables.embeddings(s, d).agg(max(col("vec_id"))).head().getLong(0) + 1))

  /** SQL twins of the band (uncorrelated scalar subqueries — DuckDB
    * evaluates them once).
    */
  val docBandSql = "GREATEST(100000, (SELECT MAX(doc_id) + 1 FROM documents))"
  val vecBandSql = "GREATEST(100000, (SELECT MAX(vec_id) + 1 FROM embeddings))"

  /** documents ∪ exact copies (id+band) ∪ near copies (id+2·band). */
  def corpus(s: SparkSession, d: String): DataFrame = {
    val off = docBand(s, d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text"), col("lang")))
      .unionByName(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2 * off).as("doc_id"),
          concat(col("text"), lit(" duplicated tail marker")).as("text"), col("lang")))
  }

  val corpusCte: String =
    s"""corpus AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + $docBandSql, text, lang FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2 * $docBandSql, text || ' duplicated tail marker', lang
      |  FROM documents WHERE doc_id % 10 = 5
      |)""".stripMargin

  /** [[corpus]] ∪ 30-token excerpts of every …3 doc (id+6·band): planted
    * asymmetric positives — each excerpt is FULLY contained in its source
    * (containment 1.0) while Jaccard-similar only in proportion to the
    * source's length.
    */
  def containmentCorpus(s: SparkSession, d: String): DataFrame = {
    val off = docBand(s, d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    corpus(s, d).unionByName(docs.filter(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 6 * off).as("doc_id"),
        array_join(slice(split(
          graft.text.TextAnalysis.normalized(col("text")), " "), 1, 30), " ")
          .as("text"),
        col("lang")))
  }

  /** The daily increment against the plain `documents` corpus: exact copies
    * (every 10th), tail-perturbed near copies (every …5), and a fresh
    * family (every 7th: a synthesized unique text at +400000 plus an exact
    * batch-internal duplicate of it at +500000) — exercising all three
    * incremental paths: corpus exact match, corpus near match, and
    * batch-internal clustering of corpus-unmatched docs.
    */
  def incBatch(s: SparkSession, d: String): DataFrame = {
    val off = docBand(s, d)
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang"))
    // every 3-gram carries the id, so distinct fresh docs share NO shingles
    // (a shared prefix longer than n-1 tokens would make them near-dups of
    // each other at any threshold <= (L-n)/(L+n) — by construction here)
    val fresh = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"),
        concat(lit("fresh document "), col("doc_id"),
          lit(" alpha"), col("doc_id"), lit(" beta"), col("doc_id"),
          lit(" gamma"), col("doc_id")).as("text"),
        col("lang"))
    docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + off).as("doc_id"), col("text"), col("lang"))
      .unionByName(docs.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 2 * off).as("doc_id"),
          concat(col("text"), lit(" duplicated tail marker")).as("text"), col("lang")))
      .unionByName(fresh.select((col("doc_id") + 4 * off).as("doc_id"),
        col("text"), col("lang")))
      .unionByName(fresh.select((col("doc_id") + 5 * off).as("doc_id"),
        col("text"), col("lang")))
  }

  val incBatchCte: String =
    s"""incbatch AS (
      |  SELECT doc_id + $docBandSql AS doc_id, text, lang FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2 * $docBandSql, text || ' duplicated tail marker', lang
      |  FROM documents WHERE doc_id % 10 = 5
      |  UNION ALL
      |  SELECT doc_id + 4 * $docBandSql,
      |    'fresh document ' || doc_id || ' alpha' || doc_id || ' beta' ||
      |    doc_id || ' gamma' || doc_id, lang
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 5 * $docBandSql,
      |    'fresh document ' || doc_id || ' alpha' || doc_id || ' beta' ||
      |    doc_id || ' gamma' || doc_id, lang
      |  FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  /** embeddings (as double) ∪ 1.001-scaled copies of every 10th vector. */
  def vecs(s: SparkSession, d: String): DataFrame = {
    val off = vecBand(s, d)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    e.unionByName(
      Tables.embeddings(s, d).filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + off).as("vec_id"),
          transform(col("embedding"), x => x.cast("double") * 1.001).as("v")))
  }

  val vecsCte: String =
    s"""vecs AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + $vecBandSql, list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.001)
      |  FROM embeddings WHERE vec_id % 10 = 0
      |)""".stripMargin

  // ---- generated DuckDB fragments mirroring Dedup's expressions ----

  private val ntext = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""

  private val gramsExpr =
    s"""CASE WHEN len(string_split($ntext, ' ')) >= 3
       |     THEN list_transform(range(1, len(string_split($ntext, ' ')) - 1),
       |            i -> array_to_string(list_slice(string_split($ntext, ' '), i, i + 2), ' '))
       |     ELSE [$ntext] END""".stripMargin

  /** Fold 12 hex chars of `x` starting at 1-based `start` into a BIGINT —
    * the oracle's `Long.parseLong(hex.substring(...), 16)`.
    */
  private[graft] def hexFoldSql(x: String, start: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(range($start, ${start + 12}),
       |    i -> CAST(strpos('0123456789abcdef', substr($x, CAST(i AS INT), 1)) - 1 AS BIGINT))),
       |  (fa, fb) -> fa * 16 + fb)""".stripMargin

  /** Universal-hash MinHash mirror of `Dedup.minhashSigsUdf`: one md5 per
    * gram, halves reduced mod p, signature k = min over grams of
    * (a_k*h1 + b_k*h2) mod p with the same inlined constants.
    */
  private def minhashCtes(nSigs: Int): String = {
    val p = Dedup.HashMod
    val sigCols = (0 until nSigs).map { k =>
      val (a, b) = Dedup.minhashConsts(k)
      s"list_min(list_transform(range(1, len(h1s) + 1), i -> ($a * h1s[i] + $b * h2s[i]) % $p)) AS sig$k"
    }.mkString(",\n      ")
    s"""h AS (SELECT id, list_transform(grams, s -> md5(s)) AS hx FROM g),
       |hh AS (SELECT id, list_transform(hx, x -> ${hexFoldSql("x", 1)} % $p) AS h1s,
       |              list_transform(hx, x -> ${hexFoldSql("x", 13)} % $p) AS h2s FROM h),
       |sigs AS (SELECT id,
       |      $sigCols
       |    FROM hh)""".stripMargin
  }

  /** Band rows over the signature table: (id, band j, the band's sig pair). */
  private def bandsCte(bands: Int, rowsPerBand: Int): String = {
    val selects = (0 until bands).map { j =>
      val cols = (0 until rowsPerBand)
        .map(r => s"sig${j * rowsPerBand + r} AS s$r").mkString(", ")
      s"SELECT id, $j AS j, $cols FROM sigs"
    }
    "bands AS (" + selects.mkString("\n  UNION ALL\n  ") + ")"
  }

  private def bandJoinOn(rowsPerBand: Int): String =
    (Seq("a.j = b.j") ++ (0 until rowsPerBand).map(r => s"a.s$r = b.s$r"))
      .mkString(" AND ") + " AND a.id < b.id"

  /** 48-bit md5 simhash mirror: token bit-source = first 12 hex chars of
    * md5(token) big-endian, so bit b lives in hex char (12 - b/4), nibble
    * shift (b % 4). Tokens are hashed ONCE into `hx`; each bit's vote is a
    * fold over the hex strings.
    */
  private def simhash48Sql: String = {
    val bits = (0 until Dedup.Simhash48Bits).map { b =>
      val charPos = 12 - b / 4
      val shift = 1L << (b % 4)
      s"""(CASE WHEN list_sum(list_transform(hx,
         |  h -> ((CAST(strpos('0123456789abcdef', substr(h, $charPos, 1)) - 1 AS BIGINT)
         |         // $shift) % 2) * 2 - 1)) > 0 THEN ${1L << b} ELSE 0 END)""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  /** Recursive reference model for survivor clustering: the CTE chain over
    * the augmented corpus ending at `reach` (doc reachability over verified
    * near-dup edges). Shared with the leakage-safe split oracle in
    * `PipelineSurface`, which re-labels clusters on top of it.
    */
  private[graft] val survivorsCtes: String = s"""WITH RECURSIVE $corpusCte,
    |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM corpus),
    |${minhashCtes(12)},
    |${bandsCte(6, 2)},
    |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
    |         FROM bands a JOIN bands b ON ${bandJoinOn(2)}),
    |pairs AS (
    |  SELECT doc_a, doc_b
    |  FROM cand JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
    |  WHERE len(list_intersect(ga.grams, gb.grams)) /
    |      (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5),
    |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
    |          UNION SELECT doc_b, doc_a FROM pairs),
    |reach(id, lab) AS (
    |  SELECT doc_id, doc_id FROM corpus
    |  UNION
    |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)""".stripMargin

  /** Memoized + cached survivor table per (session, sfDir): the full
    * LSH-verify-cluster pipeline is the most expensive derived product on
    * the surface, and two gates (`dedup_survivors`,
    * `pipe_split_leakproof`) plus any downstream consumer read the same
    * fixpoint — one build amortizes across the gate/bench run, exactly like
    * `DerivedItems.nestedItems`.
    */
  private val survivorsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def survivors(s: SparkSession, d: String): DataFrame =
    survivorsMemo.getOrElseUpdate((s, d),
      Dedup.nearDupSurvivors(corpus(s, d), "doc_id", "text", 0.5).cache())

  /** SNM gate window: ±5 sort positions. */
  val SnmWindow = 5

  /** Exact-substring dedup run length: 40 normalized chars ≈ 6-8 words —
    * long enough that sharing one is verbatim reuse, short enough to catch
    * a single boilerplate sentence.
    */
  val SubstringL = 40

  /** PPJoin gate threshold: τ=0.8, the high-similarity operating point
    * where prefix filtering earns its keep (prefix = ~20% of each doc's
    * grams, so the candidate join fans out on RARE grams only; at τ=0.5
    * the prefix is half the doc and the join fan-out — paid before any
    * filter — was measured 43.3M rows at the 10× probe). The operator
    * supports any τ; near-dup gating at 0.8 matches the planted corpus
    * (exact copies 1.0, tail-perturbed ≈ 0.95).
    */
  val PpjoinTau = 0.8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_groups" -> ((s, d) =>
      Dedup.exactGroups(corpus(s, d), "doc_id", "text").orderBy("fp")),
    // the scale-path pipeline: LSH candidates → exact Jaccard verification
    // (the all-pairs jaccardPairs form is exercised in DedupSpec on sf0.001)
    "dedup_jaccard_pairs" -> ((s, d) =>
      Dedup.lshVerifiedPairs(corpus(s, d), "doc_id", "text", 0.5)
        .orderBy("doc_a", "doc_b")),
    "dedup_lsh_candidates" -> ((s, d) =>
      Dedup.lshCandidates(corpus(s, d), "doc_id", "text")
        .orderBy("doc_a", "doc_b")),
    // EXACT Jaccard ≥ τ self-join (prefix filter, no LSH miss): the result
    // is the complete qualifying pair set by construction, so it is a
    // provable superset of dedup_jaccard_pairs (spec-asserted)
    "dedup_ppjoin_pairs" -> ((s, d) =>
      Dedup.prefixFilterJaccardPairs(corpus(s, d), "doc_id", "text", PpjoinTau)
        .orderBy("doc_a", "doc_b")),
    // the 100 TB-safe family-level contract: verified cross-family rep
    // pairs with family sizes — output-linear in FAMILIES where the
    // expanded pair list above is quadratic in family size by contract
    // (a 10⁵-member boilerplate family = ~5·10⁹ expanded rows)
    "dedup_ppjoin_family_pairs" -> ((s, d) =>
      Dedup.prefixFilterJaccardFamilyPairs(corpus(s, d), "doc_id", "text",
        PpjoinTau).orderBy("doc_a", "doc_b")),
    // its companion family table: (rep, n_members, sample_members) — the
    // within-family jaccard-1.0 mass as counts, never expanded
    "dedup_ppjoin_families" -> ((s, d) =>
      Dedup.exactFamilySummary(corpus(s, d), "doc_id", "text")
        .orderBy("rep")),
    // incremental EXACT dedup: batch pairs against a prebuilt corpus
    // prefix index (corpus never self-paired, zero false negatives —
    // the guarantee dedup_incremental's LSH path trades away)
    "dedup_ppjoin_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val ix = Dedup.prefixIndex(docs, "doc_id", "text", PpjoinTau)
      Dedup.ppjoinAgainst(ix, incBatch(s, d), "doc_id", "text", PpjoinTau)
        .orderBy("doc_a", "doc_b")
    }),
    // the family-level contract for the DAILY-BATCH path: verified rep
    // pairs (cross = batch family × corpus family, batch = within-batch)
    // with both family sizes — output-linear in families where
    // dedup_ppjoin_incremental's per-doc expansion is quadratic in family
    // size by contract (a dirty batch against a boilerplate corpus family
    // emits ONE row here)
    "dedup_ppjoin_batch_family_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val ix = Dedup.prefixIndex(docs, "doc_id", "text", PpjoinTau)
      Dedup.ppjoinAgainstFamilyPairs(ix, incBatch(s, d), "doc_id", "text",
        PpjoinTau).orderBy("kind", "doc_a", "doc_b")
    }),
    // its companion: the BATCH's exact-dup family table (rep, n_members,
    // sample) — the within-family jaccard-1.0 mass as counts
    "dedup_ppjoin_batch_families" -> ((s, d) =>
      Dedup.exactFamilySummary(incBatch(s, d), "doc_id", "text")
        .orderBy("rep")),
    // sorted-neighborhood blocking: candidates = within-5 positions in the
    // (normalized-text, id) sort order, verified at the same τ
    "dedup_snm_pairs" -> ((s, d) =>
      Dedup.sortedNeighborhoodPairs(corpus(s, d), "doc_id",
        "text", "text", SnmWindow, 0.5)
        .orderBy("doc_a", "doc_b")),
    // char-level exact substring dedup: docs sharing a verbatim >=40-char
    // normalized run (catches boilerplate/quotes the token operators
    // dilute away); complete via stride-1 l-gram windows
    "dedup_substring_pairs" -> ((s, d) =>
      Dedup.substringPairs(corpus(s, d), "doc_id", "text", SubstringL)
        .orderBy("doc_a", "doc_b")),
    // asymmetric containment over the excerpt-planted corpus: catches
    // quote/excerpt pairs symmetric Jaccard is blind to
    "dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(containmentCorpus(s, d), "doc_id", "text", 0.8)
        .orderBy("doc_a", "doc_b")),
    // 48-bit hamming-band bucketing (pigeonhole recall 1.0): wide enough
    // that bucket collisions are true near-dup clusters, not hash crowding
    // (the 16-bit variant went quadratic in the 10x scale probe)
    "dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashBandPairs48(corpus(s, d), "doc_id", "text", "lang", 3)
        .orderBy("doc_a", "doc_b")),
    // near-dup clustering: verified pairs → connected components → every
    // doc mapped to its cluster's canonical survivor (recursive-CTE oracle)
    "dedup_survivors" -> ((s, d) => survivors(s, d).orderBy("doc_id")),
    // quality-aware survivor election: same clusters, but each cluster's
    // canonical doc is its highest-quality member (ties -> lowest id) —
    // "keep the best duplicate", not "keep the arbitrary min-id one"
    "dedup_survivors_quality" -> ((s, d) =>
      Dedup.electByScore(survivors(s, d),
        graft.text.TextAnalysis.withQuality(corpus(s, d)), "doc_id", "quality")
        .orderBy("doc_id")),
    // incremental dedup: the daily batch checks band buckets against the
    // existing corpus (never re-pairing it), leftovers cluster among
    // themselves
    "dedup_incremental" -> ((s, d) =>
      Dedup.dedupAgainst(
        Tables.documents(s, d).select(col("doc_id"), col("text"), col("lang")),
        incBatch(s, d), "doc_id", "text", 0.5)
        .orderBy("doc_id")),
    // hyperplane-LSH bucket candidates + exact verify — the scale path (the
    // all-pairs cosinePairs form is the recall oracle in DedupSpec)
    "dedup_cosine_pairs" -> ((s, d) =>
      Dedup.lshCosinePairs(vecs(s, d), "vec_id", "v", 0.999,
        graft.sim.SimSurface.Planes, graft.sim.SimSurface.Dims)
        .orderBy("vec_a", "vec_b")),
    // the deployment shape of dedup_incremental: the corpus band index is
    // BUILT AND PERSISTED once per dataset (VersionedTable-backed), and the
    // gate times only load + batch-vs-index — the daily-import query cost
    // once the corpus is indexed. Results bit-identical to the rebuild form
    // (shared oracle).
    "dedup_incremental_indexed" -> ((s, d) =>
      DedupIndex.dedupBatch(s, bandIndexDir(s, d), incBatch(s, d),
        "doc_id", "text", 0.5)
        .orderBy("doc_id")),
    // same for the EXACT path: persisted PPJoin prefix index, gate times
    // load + batch join only (zero false negatives preserved — the index
    // is the same artifact the rebuild derives)
    "dedup_ppjoin_indexed" -> ((s, d) =>
      DedupIndex.ppjoinBatch(s, prefixIndexDir(s, d), incBatch(s, d),
        "doc_id", "text")
        .orderBy("doc_a", "doc_b")),
  )

  /** One persisted dedup index per dataset CONTENT per JVM (the
    * [[graft.sim.SimSurface]] indexDir pattern, content-stamped like
    * [[docBand]]'s memo): built on first use under java.io.tmpdir, the
    * gates above time only the load + batch-vs-index query.
    */
  private val dedupIndexDirs =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), String]

  private def bandIndexDir(s: SparkSession, d: String): String =
    dedupIndexDirs.getOrElseUpdate(("band", d, contentStamp(d, "documents")), {
      val p = java.nio.file.Files.createTempDirectory("graft-dedup-band").toString
      DedupIndex.buildBand(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", p)
      p
    })

  private def prefixIndexDir(s: SparkSession, d: String): String =
    dedupIndexDirs.getOrElseUpdate(("prefix", d, contentStamp(d, "documents")), {
      val p = java.nio.file.Files.createTempDirectory("graft-dedup-prefix").toString
      DedupIndex.buildPrefix(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", p, PpjoinTau)
      p
    })

  private val oraclesBase: Map[String, String] = Map(
    "dedup_exact_groups" -> s"""WITH $corpusCte
      |SELECT md5($ntext) AS fp, COUNT(*) AS n, MIN(doc_id) AS survivor_id
      |FROM corpus GROUP BY 1 ORDER BY fp""".stripMargin,
    "dedup_survivors" -> (survivorsCtes + """
      |SELECT id AS doc_id, MIN(lab) AS survivor_id FROM reach
      |GROUP BY id ORDER BY doc_id""".stripMargin),
    // same reachability fixpoint; the survivor is re-elected per cluster as
    // the max-quality member (score arithmetic kept in sync with the
    // txt_quality oracle), ties to the lowest id, all-NULL clusters keep
    // their min-id label
    "dedup_survivors_quality" -> (survivorsCtes + s""",
      |clus AS (SELECT id AS doc_id, MIN(lab) AS cl FROM reach GROUP BY id),
      |qfeat AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_chars_m,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
      |    CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS BIGINT) AS n_punct,
      |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
      |    CAST(${graft.text.TextSurface.allStops} AS BIGINT) AS n_stop
      |  FROM corpus),
      |qsc AS (SELECT doc_id,
      |  (n_alpha / n_chars_m) * 0.4 + least(n_stop * 10.0 / n_tokens, 1.0) * 0.3
      |    + (1.0 - n_punct / n_chars_m) * 0.2 + least(n_chars_m / 500.0, 1.0) * 0.1 AS score
      |  FROM qfeat),
      |qmx AS (SELECT cl, MAX(score) AS ms FROM clus JOIN qsc USING (doc_id) GROUP BY cl),
      |qbest AS (SELECT cl, MIN(qsc.doc_id) AS survivor_id
      |          FROM clus JOIN qsc USING (doc_id) JOIN qmx USING (cl)
      |          WHERE qsc.score = qmx.ms GROUP BY cl)
      |SELECT c.doc_id, COALESCE(b.survivor_id, c.cl) AS survivor_id
      |FROM clus c LEFT JOIN qbest b USING (cl) ORDER BY doc_id""".stripMargin),
    "dedup_incremental" -> s"""WITH RECURSIVE $incBatchCte,
      |allg AS (SELECT doc_id, text FROM documents
      |         UNION ALL SELECT doc_id, text FROM incbatch),
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM allg),
      |${minhashCtes(12)},
      |${bandsCte(6, 2)},
      |m AS (SELECT b.id AS new_id, MIN(a.id) AS survivor_id
      |      FROM bands b JOIN bands a ON ${bandJoinOn(2).replace("a.id < b.id", s"a.id < $docBandSql AND b.id >= $docBandSql")}
      |      JOIN g gn ON gn.id = b.id JOIN g go ON go.id = a.id
      |      WHERE len(list_intersect(gn.grams, go.grams)) /
      |          (len(gn.grams) + len(go.grams) - len(list_intersect(gn.grams, go.grams))) >= 0.5
      |      GROUP BY b.id),
      |rest AS (SELECT doc_id FROM incbatch
      |         WHERE doc_id NOT IN (SELECT new_id FROM m)),
      |rcand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |          FROM bands a JOIN bands b ON ${bandJoinOn(2)}
      |          WHERE a.id IN (SELECT doc_id FROM rest)
      |            AND b.id IN (SELECT doc_id FROM rest)),
      |rpairs AS (SELECT doc_a, doc_b FROM rcand
      |           JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
      |           WHERE len(list_intersect(ga.grams, gb.grams)) /
      |             (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5),
      |redges AS (SELECT doc_a AS src, doc_b AS dst FROM rpairs
      |           UNION SELECT doc_b, doc_a FROM rpairs),
      |rreach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM rest
      |  UNION
      |  SELECT e.dst, r.lab FROM rreach r JOIN redges e ON e.src = r.id),
      |rsurv AS (SELECT id AS doc_id, MIN(lab) AS survivor_id FROM rreach GROUP BY id)
      |SELECT new_id AS doc_id, survivor_id FROM m
      |UNION ALL SELECT doc_id, survivor_id FROM rsurv
      |ORDER BY doc_id""".stripMargin,
    "dedup_jaccard_pairs" -> s"""WITH $corpusCte,
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM corpus),
      |${minhashCtes(12)},
      |${bandsCte(6, 2)},
      |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |         FROM bands a JOIN bands b ON ${bandJoinOn(2)})
      |SELECT doc_a, doc_b,
      |  len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) AS jaccard
      |FROM cand JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
      |WHERE len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin,
    // same prefix-filter construction, independently spelled: the global
    // (df, gram) order, then every candidate filter phrased as the SAME
    // IEEE comparison the verify makes (fl(x/y) >= τ on ints — the
    // boundary-safe form; a fp rearrangement like ceil(τ/(1+τ)·(sa+sb))
    // prunes true exact-threshold pairs, e.g. 28-in-35 at τ=0.8),
    // and the exact verify all re-derived in SQL
    "dedup_ppjoin_pairs" -> s"""WITH $corpusCte,
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM corpus),
      |t AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM g
      |      WHERE len(grams) > 0),
      |f AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY 1),
      |r AS (SELECT id, sz, t.gram,
      |    row_number() OVER (PARTITION BY id ORDER BY df, t.gram) AS rn
      |  FROM t JOIN f USING (gram)),
      |p AS (SELECT id, sz, rn, gram FROM r WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |  FROM p a JOIN p b ON a.gram = b.gram AND a.id < b.id
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau)
      |SELECT doc_a, doc_b,
      |  len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) AS jaccard
      |FROM cand JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
      |WHERE len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= $PpjoinTau
      |ORDER BY doc_a, doc_b""".stripMargin,
    // family-level twin: the identical exact pipeline run over exact-dup
    // representatives (min id per normalized-text fingerprint), df counted
    // over reps — both sides are zero-miss over the same rep set, so the
    // verified rep-pair sets must coincide; family sizes join in at the end
    "dedup_ppjoin_family_pairs" -> s"""WITH $corpusCte,
      |raw AS (SELECT doc_id AS id, md5($ntext) AS fp,
      |               list_distinct($gramsExpr) AS grams FROM corpus),
      |fam AS (SELECT fp, MIN(id) AS rep, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM raw WHERE len(grams) > 0 GROUP BY fp),
      |g AS (SELECT fam.rep AS id, raw.grams AS grams, fam.n AS n
      |      FROM fam JOIN raw ON raw.id = fam.rep),
      |t AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM g),
      |f AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM t GROUP BY 1),
      |r AS (SELECT id, sz, t.gram,
      |    row_number() OVER (PARTITION BY id ORDER BY df, t.gram) AS rn
      |  FROM t JOIN f USING (gram)),
      |p AS (SELECT id, sz, rn, gram FROM r WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |  FROM p a JOIN p b ON a.gram = b.gram AND a.id < b.id
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau)
      |SELECT doc_a, doc_b,
      |  len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) AS jaccard,
      |  ga.n AS n_a, gb.n AS n_b
      |FROM cand JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
      |WHERE len(list_intersect(ga.grams, gb.grams)) /
      |    (len(ga.grams) + len(gb.grams) - len(list_intersect(ga.grams, gb.grams))) >= $PpjoinTau
      |ORDER BY doc_a, doc_b""".stripMargin,
    // family table: a plain GROUP BY over the normalized-text fingerprint
    "dedup_ppjoin_families" -> s"""WITH $corpusCte,
      |g AS (SELECT doc_id AS id, md5($ntext) AS fp FROM corpus
      |      WHERE len(list_distinct($gramsExpr)) > 0)
      |SELECT MIN(id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  array_to_string(list_sort(list(id))[1:3], ',') AS sample_members
      |FROM g GROUP BY fp ORDER BY rep""".stripMargin,
    // incremental prefix-filter: corpus df only, batch grams unseen in the
    // corpus rank at df 0 (candidate-set differences between engines are
    // harmless — both sides are lossless, and only verified pairs emit)
    "dedup_ppjoin_incremental" -> s"""WITH $incBatchCte,
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM documents),
      |bt AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM incbatch),
      |tg AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM g),
      |f AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM tg GROUP BY 1),
      |cpp AS (SELECT * FROM (
      |    SELECT id, sz, tg.gram,
      |      row_number() OVER (PARTITION BY id ORDER BY df, tg.gram) AS rn
      |    FROM tg JOIN f USING (gram))
      |  WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |bt2 AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM bt),
      |bpp AS (SELECT * FROM (
      |    SELECT id, sz, bt2.gram,
      |      row_number() OVER (PARTITION BY id
      |        ORDER BY COALESCE(df, 0), bt2.gram) AS rn
      |    FROM bt2 LEFT JOIN f USING (gram))
      |  WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |cc AS (SELECT DISTINCT a.id AS xa, b.id AS xb
      |  FROM bpp a JOIN cpp b ON a.gram = b.gram
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau),
      |ci AS (SELECT DISTINCT a.id AS xa, b.id AS xb
      |  FROM bpp a JOIN bpp b ON a.gram = b.gram AND a.id < b.id
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau),
      |vx AS (SELECT xa, xb,
      |    len(list_intersect(ba.grams, gb.grams)) /
      |      (len(ba.grams) + len(gb.grams) - len(list_intersect(ba.grams, gb.grams))) AS jaccard
      |  FROM cc JOIN bt ba ON ba.id = xa JOIN g gb ON gb.id = xb),
      |vi AS (SELECT xa, xb,
      |    len(list_intersect(ba.grams, bb.grams)) /
      |      (len(ba.grams) + len(bb.grams) - len(list_intersect(ba.grams, bb.grams))) AS jaccard
      |  FROM ci JOIN bt ba ON ba.id = xa JOIN bt bb ON bb.id = xb),
      |u AS (SELECT * FROM vx UNION ALL SELECT * FROM vi)
      |SELECT least(xa, xb) AS doc_a, greatest(xa, xb) AS doc_b, jaccard
      |FROM u WHERE jaccard >= $PpjoinTau AND xa <> xb
      |ORDER BY doc_a, doc_b""".stripMargin,
    // the incremental FAMILY form: both sides collapsed to exact-dup reps
    // (min id per normalized-text fingerprint), the same prefix-filter
    // candidate construction (df over corpus reps; batch grams unseen in
    // the corpus rank at df 0 — candidate-set differences are harmless,
    // both sides lossless), verified rep pairs carrying both family sizes
    "dedup_ppjoin_batch_family_pairs" -> s"""WITH $incBatchCte,
      |craw AS (SELECT doc_id AS id, md5($ntext) AS fp,
      |               list_distinct($gramsExpr) AS grams FROM documents),
      |cfam AS (SELECT fp, MIN(id) AS rep, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM craw WHERE len(grams) > 0 GROUP BY fp),
      |g AS (SELECT cfam.rep AS id, craw.grams AS grams, cfam.n AS n,
      |             cfam.fp AS fp
      |      FROM cfam JOIN craw ON craw.id = cfam.rep),
      |braw AS (SELECT doc_id AS id, md5($ntext) AS fp,
      |               list_distinct($gramsExpr) AS grams FROM incbatch),
      |bfam AS (SELECT fp, MIN(id) AS rep, CAST(COUNT(*) AS BIGINT) AS n
      |        FROM braw WHERE len(grams) > 0 GROUP BY fp),
      |bt AS (SELECT bfam.rep AS id, braw.grams AS grams, bfam.n AS n
      |      FROM bfam JOIN braw ON braw.id = bfam.rep),
      |tg AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM g),
      |f AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM tg GROUP BY 1),
      |cpp AS (SELECT * FROM (
      |    SELECT id, sz, tg.gram,
      |      row_number() OVER (PARTITION BY id ORDER BY df, tg.gram) AS rn
      |    FROM tg JOIN f USING (gram))
      |  WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |bt2 AS (SELECT id, len(grams) AS sz, unnest(grams) AS gram FROM bt),
      |bpp AS (SELECT * FROM (
      |    SELECT id, sz, bt2.gram,
      |      row_number() OVER (PARTITION BY id
      |        ORDER BY COALESCE(df, 0), bt2.gram) AS rn
      |    FROM bt2 LEFT JOIN f USING (gram))
      |  WHERE (sz - rn + 1) / sz >= $PpjoinTau),
      |cc AS (SELECT DISTINCT a.id AS xa, b.id AS xb
      |  FROM bpp a JOIN cpp b ON a.gram = b.gram
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau),
      |ci AS (SELECT DISTINCT a.id AS xa, b.id AS xb
      |  FROM bpp a JOIN bpp b ON a.gram = b.gram AND a.id < b.id
      |    AND least(a.sz, b.sz) / greatest(a.sz, b.sz) >= $PpjoinTau
      |    AND (1 + least(a.sz - a.rn, b.sz - b.rn)) /
      |        (a.sz + b.sz - (1 + least(a.sz - a.rn, b.sz - b.rn))) >= $PpjoinTau),
      |vx AS (SELECT xa AS doc_a, xb AS doc_b,
      |    len(list_intersect(ba.grams, gb.grams)) /
      |      (len(ba.grams) + len(gb.grams) - len(list_intersect(ba.grams, gb.grams))) AS jaccard,
      |    ba.n AS n_a, gb.n AS n_b, 'cross' AS kind
      |  FROM cc JOIN bt ba ON ba.id = xa JOIN g gb ON gb.id = xb),
      |vi AS (SELECT xa AS doc_a, xb AS doc_b,
      |    len(list_intersect(ba.grams, bb.grams)) /
      |      (len(ba.grams) + len(bb.grams) - len(list_intersect(ba.grams, bb.grams))) AS jaccard,
      |    ba.n AS n_a, bb.n AS n_b, 'batch' AS kind
      |  FROM ci JOIN bt ba ON ba.id = xa JOIN bt bb ON bb.id = xb)
      |SELECT doc_a, doc_b, jaccard, n_a, n_b, kind
      |FROM (SELECT * FROM vx UNION ALL SELECT * FROM vi)
      |WHERE jaccard >= $PpjoinTau
      |ORDER BY kind, doc_a, doc_b""".stripMargin,
    // the batch's family table: a plain GROUP BY over the batch's
    // normalized-text fingerprint
    "dedup_ppjoin_batch_families" -> s"""WITH $incBatchCte,
      |g AS (SELECT doc_id AS id, md5($ntext) AS fp FROM incbatch
      |      WHERE len(list_distinct($gramsExpr)) > 0)
      |SELECT MIN(id) AS rep, CAST(COUNT(*) AS BIGINT) AS n_members,
      |  array_to_string(list_sort(list(id))[1:3], ',') AS sample_members
      |FROM g GROUP BY fp ORDER BY rep""".stripMargin,
    // positions via row_number over the same (text, id) total order; the
    // within-window pairing is a position range join
    "dedup_snm_pairs" -> s"""WITH $corpusCte,
      |g AS (SELECT doc_id AS id, text, list_distinct($gramsExpr) AS grams
      |      FROM corpus WHERE len(list_distinct($gramsExpr)) > 0),
      |r AS (SELECT id, grams,
      |    row_number() OVER (ORDER BY text NULLS FIRST, id) AS pos FROM g),
      |cand AS (SELECT a.id AS ia, a.grams AS ga, b.id AS ib, b.grams AS gb
      |  FROM r a JOIN r b
      |    ON b.pos > a.pos AND b.pos <= a.pos + $SnmWindow),
      |v AS (SELECT least(ia, ib) AS doc_a, greatest(ia, ib) AS doc_b,
      |    len(list_intersect(ga, gb)) /
      |      (len(ga) + len(gb) - len(list_intersect(ga, gb))) AS jaccard
      |  FROM cand)
      |SELECT DISTINCT doc_a, doc_b, jaccard FROM v WHERE jaccard >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin,
    // char-level l-gram windows (stride 1), self-joined on the gram —
    // the relational restatement of substringPairs' bucket expansion.
    // DuckDB's generate_series is not lateral-correlatable: cross-join a
    // position grid sized from MAX(length(t)) — derived, not a fixed
    // 2048, so a future longer corpus doc can never silently fall off the
    // end of the grid and under-count pairs
    "dedup_substring_pairs" -> s"""WITH $corpusCte,
      |n AS (SELECT doc_id AS id, $ntext AS t FROM corpus),
      |g AS (SELECT DISTINCT id, substr(t, CAST(i AS INTEGER), $SubstringL) AS gram
      |  FROM n CROSS JOIN (SELECT unnest(range(1,
      |    (SELECT COALESCE(MAX(length(t)), 0) FROM n) + 1)) AS i) s
      |  WHERE length(t) >= $SubstringL AND i <= length(t) - ${SubstringL - 1}),
      |p AS (SELECT a.id AS doc_a, b.id AS doc_b
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id)
      |SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM p GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_containment" -> s"""WITH ccorpus AS (
      |  SELECT doc_id, text, lang FROM documents
      |  UNION ALL
      |  SELECT doc_id + $docBandSql, text, lang FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2 * $docBandSql, text || ' duplicated tail marker', lang
      |  FROM documents WHERE doc_id % 10 = 5
      |  UNION ALL
      |  SELECT doc_id + 6 * $docBandSql,
      |    array_to_string(list_slice(string_split($ntext, ' '), 1, 30), ' '), lang
      |  FROM documents WHERE doc_id % 10 = 3
      |),
      |corpus AS (SELECT * FROM ccorpus),
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM corpus),
      |${minhashCtes(12)},
      |${bandsCte(6, 2)},
      |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |         FROM bands a JOIN bands b ON ${bandJoinOn(2)})
      |SELECT doc_a, doc_b,
      |  len(list_intersect(ga.grams, gb.grams)) / len(ga.grams) AS containment_a,
      |  len(list_intersect(ga.grams, gb.grams)) / len(gb.grams) AS containment_b
      |FROM cand JOIN g ga ON ga.id = doc_a JOIN g gb ON gb.id = doc_b
      |WHERE GREATEST(
      |    len(list_intersect(ga.grams, gb.grams)) / len(ga.grams),
      |    len(list_intersect(ga.grams, gb.grams)) / len(gb.grams)) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_lsh_candidates" -> s"""WITH $corpusCte,
      |g AS (SELECT doc_id AS id, list_distinct($gramsExpr) AS grams FROM corpus),
      |${minhashCtes(12)},
      |${bandsCte(6, 2)}
      |SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
      |FROM bands a JOIN bands b ON ${bandJoinOn(2)}
      |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_simhash_pairs" -> s"""WITH $corpusCte,
      |sh AS (SELECT doc_id AS id, lang AS blk, $simhash48Sql AS sh
      |       FROM (SELECT doc_id, lang,
      |               list_transform(list_distinct(string_split($ntext, ' ')), t -> md5(t)) AS hx
      |             FROM corpus))
      |SELECT a.id AS doc_a, b.id AS doc_b,
      |       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
      |WHERE bit_count(xor(a.sh, b.sh)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_cosine_pairs" -> s"""WITH $vecsCte,
      |b AS (SELECT vec_id, v,
      |        ${graft.sim.SimOracle.bucketSql("v", graft.sim.SimSurface.Planes, graft.sim.SimSurface.Dims)} AS bucket
      |      FROM vecs)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ${graft.sim.SimOracle.cosSql("a.v", "b.v")} AS cos
      |FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE ${graft.sim.SimOracle.cosSql("a.v", "b.v")} >= 0.999
      |ORDER BY vec_a, vec_b""".stripMargin,
  )

  /** The persisted-index twins return bit-identical results to their
    * rebuild forms (same pipeline, index round-tripped through parquet),
    * so they share those oracles verbatim.
    */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "dedup_incremental_indexed" -> oraclesBase("dedup_incremental"),
    "dedup_ppjoin_indexed" -> oraclesBase("dedup_ppjoin_incremental"))
}
