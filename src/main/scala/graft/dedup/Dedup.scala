package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Design notes for 100 TB:
  *  - Exact dedup is a hash-groupBy — one shuffle on the fingerprint.
  *  - Pairwise ops (Jaccard/SimHash) NEVER run all-pairs globally: they take
  *    a blocking column (language here; at scale add a length band and/or an
  *    LSH band) so the self-join key-space bounds the quadratic term.
  *  - MinHash+LSH is the scale path: signatures are per-row projections, the
  *    band join is an equi-join on band keys, and candidate verification is
  *    a second narrow join — no all-pairs anywhere.
  *  - Every hash is engine-portable (md5 strings, polynomial char hashes) so
  *    the DuckDB oracle reproduces results bit-for-bit; swapping in
  *    xxhash64 is a one-line change where oracle parity isn't needed.
  */
object Dedup {

  /** Word n-grams (space-joined) over the normalized token array; docs with
    * fewer than n tokens contribute the whole normalized text as one gram.
    */
  def ngrams(text: Column, n: Int): Column = {
    val tokens = split(TextAnalysis.normalized(text), " ")
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => array_join(slice(tokens, i, lit(n)), " ")))
      .otherwise(array(TextAnalysis.normalized(text)))
  }

  /** JVM fast path for `array_distinct(ngrams(text, n))`: identical grams
    * (space-joined token windows, whole-text fallback), produced in one
    * tight loop instead of per-gram interpreted slice/join expressions —
    * the shingle stage dominates every minhash pipeline at scale.
    * Bit-parity with the expression form is spec-asserted.
    */
  def distinctNgramsUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { normalized: String =>
      if (normalized == null) Array.empty[String]
      else {
      val tokens = normalized.split(" ", -1)
      if (tokens.length < n) Array(normalized)
      else {
        val seen = new java.util.LinkedHashSet[String]((tokens.length - n + 1) * 2)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= tokens.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(tokens(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val out = new Array[String](seen.size)
        seen.toArray(out)
        out
      }
      }
    }

  /** Exact dedup groups: normalized-text fingerprint → group size + survivor
    * (min id). One shuffle; survivors join back by fingerprint if the full
    * surviving rows are needed.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(TextAnalysis.normalized(col(textCol))).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("survivor_id"))

  /** Pairwise token-3-gram Jaccard within a blocking key. Quadratic in the
    * block size by construction — callers at scale must block (or use
    * [[lshCandidates]] first and verify only candidates).
    */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val g = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(ngrams(col(textCol), 3)).as("grams"))
    val a = g.alias("a")
    val b = g.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("jaccard",
        size(array_intersect(col("a.grams"), col("b.grams"))) /
          size(array_union(col("a.grams"), col("b.grams"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"), col("jaccard"))
  }

  /** MinHash signature value k: the minimum salted-md5 over the doc's
    * shingles. A string-ordered min under a salted hash is a valid random
    * permutation minimum, and is reproducible in any engine with md5.
    */
  def minhashSig(grams: Column, k: Int): Column =
    array_min(transform(grams, s => md5(concat(lit(s"$k:"), s))))

  /** LSH band keys: `bands` bands × `rowsPerBand` signature rows, band index
    * baked into the key hash so a plain equi-join on the key is the bucket
    * join.
    */
  def bandKeys(grams: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      md5(concat((lit(s"$j|") +:
        (0 until rowsPerBand).map(r => minhashSig(grams, j * rowsPerBand + r))): _*))
    }: _*)

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** JVM fast path for [[bandKeys]]: identical salted-md5 strings, computed
    * in a tight loop instead of interpreted per-element HOF expressions —
    * ~10× on md5-heavy signatures. (Next step if this ever matters more: a
    * codegen'd Catalyst Expression.)
    */
  val bandKeysUdf: (Int, Int) => org.apache.spark.sql.expressions.UserDefinedFunction =
    (bands, rowsPerBand) => udf { grams: Seq[String] =>
      val nSigs = bands * rowsPerBand
      val sigs = Array.tabulate(nSigs) { k =>
        var min: String = null
        grams.foreach { g =>
          val h = md5Hex(s"$k:$g")
          if (min == null || h < min) min = h
        }
        if (min == null) "" else min
      }
      (0 until bands).map { j =>
        md5Hex(s"$j|" + (0 until rowsPerBand).map(r => sigs(j * rowsPerBand + r)).mkString(""))
      }
    }

  /** Per-signature universal-hash constants (a_k, b_k) — portable charHash
    * derivation, nonzero mod 2^31-1, inlined as literals in the oracle.
    */
  def minhashConsts(k: Int): (Long, Long) = {
    def c(prefix: String): Long = {
      val v = graft.sim.Similarity.charHash(s"$prefix:$k") % HashMod
      if (v == 0) 1L else v
    }
    (c("a"), c("b"))
  }

  /** Universal-hashing MinHash signatures: ONE md5 per shingle, halves
    * h1/h2, signature k = min over shingles of
    * `(a_k*(h1 mod p) + b_k*(h2 mod p)) mod p`, p = 2^31-1 — 12× fewer
    * digests than salted-md5-per-signature, k-specific multipliers so the
    * signatures stay UNCORRELATED (plain Kirsch–Mitzenmacher `h1 + k*h2`
    * let one small-h1 shingle win every min: 2.2× candidate noise at
    * sf0.01, ~4× at the 10× probe). Products < 2^62: exact BIGINT both
    * engines, no overflow.
    */
  def minhashSigsUdf(nSigs: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val as = Array.tabulate(nSigs)(minhashConsts(_)._1)
    val bs = Array.tabulate(nSigs)(minhashConsts(_)._2)
    udf { grams: Seq[String] =>
      val mins = Array.fill(nSigs)(Long.MaxValue)
      val in = if (grams == null) Seq.empty[String] else grams
      in.foreach { g =>
        val hex = md5Hex(g)
        val h1 = java.lang.Long.parseLong(hex.substring(0, 12), 16) % HashMod
        val h2 = java.lang.Long.parseLong(hex.substring(12, 24), 16) % HashMod
        var k = 0
        while (k < nSigs) {
          val v = (as(k) * h1 + bs(k) * h2) % HashMod
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      mins
    }
  }

  /** Does an earlier band than `j` already pair these two signature
    * vectors? The "first-match band" trick: each pair is emitted by exactly
    * ONE band (its first matching one), which replaces the global
    * `distinct()` — a full extra shuffle of every duplicated candidate —
    * with a local filter.
    */
  private def earlierBandMatches(sa: Array[Long], sb: Array[Long], j: Int,
      rowsPerBand: Int): Boolean = {
    var jj = 0
    while (jj < j) {
      var r = 0
      var all = true
      while (all && r < rowsPerBand) {
        if (sa(jj * rowsPerBand + r) != sb(jj * rowsPerBand + r)) all = false
        r += 1
      }
      if (all) return true
      jj += 1
    }
    false
  }

  /** Bucket-grouped band rows: each doc's payload ships ONCE per band to
    * its bucket (grams included only when `withGrams`), then pairs are
    * generated bucket-locally. Compare the join form, which ships the
    * payload once per candidate PAIR — O(pairs·|doc|) bytes vs this
    * O(bands·n·|doc|).
    */
  private def bucketLocalPairs[T](
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int, withGrams: Boolean)(
      emit: (Long, Array[Long], Array[String], Long, Array[Long], Array[String]) => Option[T])(
      implicit enc: org.apache.spark.sql.Encoder[T]): org.apache.spark.sql.Dataset[T] = {
    val spark = docs.sparkSession
    import spark.implicits._
    requireIntegralId(docs, idCol)
    val rpb = rowsPerBand
    val sigsOf = minhashSigsUdf(bands * rowsPerBand)
    // sigs always derive from the real shingles; the shingles themselves
    // ride the shuffle only when the verify stage needs them. Null-text
    // docs carry no shingles and cannot pair — excluded up front.
    val base = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        distinctNgramsUdf(3)(TextAnalysis.normalized(col(textCol))).as("__grams"))
      .select(col("id"),
        (if (withGrams) col("__grams") else array().cast("array<string>"))
          .as("grams"),
        sigsOf(col("__grams")).as("sigs"))
    base
      .select(col("id"), col("grams"), col("sigs"),
        explode(array((0 until bands).map(lit): _*)).as("j"))
      .as[(Long, Array[String], Array[Long], Int)]
      // bucket key = band index + that band's FULL signature slice
      .groupByKey(t => (t._4, t._3.slice(t._4 * rpb, t._4 * rpb + rpb).toSeq))
      .flatMapGroups { (key, rows) =>
        val j = key._1
        // buckets are bounded: uncorrelated minhash keys collide only for
        // genuinely similar docs (plus dup clusters)
        val arr = rows.toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[T]
        var i = 0
        while (i < arr.length) {
          val (ia, ga, sa, _) = arr(i)
          var j2 = i + 1
          while (j2 < arr.length) {
            val (ib, gb, sb, _) = arr(j2)
            if (!earlierBandMatches(sa, sb, j, rpb))
              emit(ia, sa, ga, ib, sb, gb).foreach(out += _)
            j2 += 1
          }
          i += 1
        }
        out.iterator
      }
  }

  /** The typed bucket-local kernels encode ids as Long — fail LOUDLY on a
    * non-integral id column instead of letting a cast silently null it.
    */
  private def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(df.schema.fieldIndex(idCol)).dataType
    require(Seq("long", "int", "integer", "bigint", "short", "smallint")
      .contains(dt.typeName) || dt.typeName.startsWith("decimal"),
      s"$idCol must be an integral id column for the bucket-local dedup " +
        s"kernels, got ${dt.typeName} (map your ids to longs first)")
  }

  /** Candidate pairs sharing ≥1 LSH band, generated bucket-locally with
    * first-match-band dedup. THE scale path for near-dedup: no quadratic
    * blow-up, shuffle volume O(bands·n), no global distinct.
    */
  def lshCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bucketLocalPairs[(Long, Long)](docs, idCol, textCol, bands, rowsPerBand,
      withGrams = false) { (ia, _, _, ib, _, _) => Some((ia, ib)) }
      .toDF("doc_a", "doc_b")
  }

  /** The scale-path near-dedup pipeline: LSH bucket candidates → exact
    * Jaccard verification, all bucket-local. Work is O(docs × bands) +
    * O(candidate pairs) with each doc's shingle set shipped once per band —
    * never all-pairs, never once-per-pair; this is the form that survives
    * 100 TB (the all-pairs [[jaccardPairs]] stays for small blocked use and
    * unit tests). Jaccard arithmetic matches the oracle exactly:
    * |a∩b| / (|a|+|b|-|a∩b|) on distinct shingle sets.
    */
  def lshVerifiedPairs(
      docs: DataFrame, idCol: String, textCol: String, threshold: Double,
      bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val thr = threshold
    bucketLocalPairs[(Long, Long, Double)](docs, idCol, textCol, bands,
      rowsPerBand, withGrams = true) { (ia, _, ga, ib, _, gb) =>
      val seen = new java.util.HashSet[String](ga.length * 2)
      ga.foreach(seen.add)
      var inter = 0
      gb.foreach(g => if (seen.contains(g)) inter += 1)
      val jac = inter.toDouble / (ga.length + gb.length - inter)
      if (jac >= thr) Some((ia, ib, jac)) else None
    }
      .toDF("doc_a", "doc_b", "jaccard")
  }

  /** Connected components over an undirected pair graph by iterative
    * min-label propagation: every vertex repeatedly adopts the smallest
    * label among itself and its neighbors until a fixpoint. The step is a
    * join + groupBy-min (all shuffle-parallel); lineage is cut per
    * iteration with `localCheckpoint` (iterative DataFrames otherwise grow
    * an exponential plan). Convergence needs at most graph-diameter
    * rounds — near-dup clusters are dense (LSH pairs of mutually-similar
    * docs), so a handful; `maxIters` is a safety bound, convergence is
    * checked with a cheap count.
    *
    * Returns (`id`, `component`) where `component` = min vertex id in the
    * component. Vertices = every id in `vertices` (singletons keep their
    * own id), so the output is a total doc → canonical-survivor map.
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
      maxIters: Int = 20): DataFrame = {
    val e = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(neighborMin)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      // converged when no vertex lowered its label this round
      val changed = next.alias("n")
        .join(labels.alias("p"), col("n.id") === col("p.id"))
        .filter(col("n.component") < col("p.component"))
        .limit(1).count()
      // release the superseded round's checkpoint blocks — otherwise every
      // iteration pins another copy of the label table for the app lifetime
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    e.unpersist()
    // a silent wrong answer is worse than an error: labels are only
    // component ids if propagation actually reached the fixpoint
    require(converged,
      s"connectedComponents did not converge in $maxIters iterations — " +
        "raise maxIters (component diameter exceeds the bound)")
    labels
  }

  /** The operator a pipeline actually wants from near-dedup: every doc
    * mapped to its cluster's canonical survivor (min doc id over the
    * transitive closure of verified near-dup pairs; unique docs survive as
    * themselves). LSH-verified pairs → connected components.
    */
  def nearDupSurvivors(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val pairs = lshVerifiedPairs(docs, idCol, textCol, threshold, bands, rowsPerBand)
    connectedComponents(pairs, docs.select(col(idCol).cast("long").as("id")))
      .select(col("id").as("doc_id"), col("component").as("survivor_id"))
  }

  /** The end product of the near-dedup pipeline: the corpus with every
    * near-dup cluster collapsed to its canonical survivor row — what a
    * training-data pipeline feeds downstream. A broadcast-friendly semi
    * join of the full rows against the survivor fixpoints.
    */
  def dedupedCorpus(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 6, rowsPerBand: Int = 2): DataFrame = {
    val survivors = nearDupSurvivors(docs, idCol, textCol, threshold, bands, rowsPerBand)
      .filter(col("doc_id") === col("survivor_id"))
      .select(col("doc_id"))
    docs.join(survivors,
      docs(idCol).cast("long") === survivors("doc_id"), "left_semi")
  }

  val HashMod = 2147483647L // 2^31 - 1

  /** Portable token hash: left fold (acc*31 + codepoint) % (2^31-1). */
  def tokenHash(token: Column): Column =
    aggregate(transform(split(token, ""), c => ascii(c)),
      lit(0L), (acc, x) => (acc * 31 + x) % HashMod)

  /** 16-bit SimHash: per-bit majority vote over token hashes. Bits are
    * extracted arithmetically (floor-div + mod) for engine portability.
    * Production note: one explode+groupBy pass computes all bits in a
    * single aggregation; the 16 array folds here keep it shuffle-free and
    * oracle-parallel.
    */
  def simhash16(text: Column): Column = {
    val tokens = array_distinct(split(TextAnalysis.normalized(text), " "))
    (0 until 16).map { bit =>
      // shiftright = floor-div by 2^bit on the nonnegative hash (== the
      // oracle's integer `//`)
      val vote = aggregate(tokens, lit(0L),
        (acc, t) => acc + shiftright(tokenHash(t), bit) % 2 * 2 - 1)
      when(vote > 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** JVM fast path for [[simhash16]]: hashes each token ONCE (the expression
    * form re-folds the token hash per bit), identical arithmetic.
    */
  def charHashJvm(s: String): Long = {
    var acc = 0L
    val it = s.codePoints().iterator()
    while (it.hasNext) acc = (acc * 31 + it.next()) % HashMod
    acc
  }

  val simhash16Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { tokens: Seq[String] =>
      val votes = new Array[Long](16)
      val in = if (tokens == null) Seq.empty[String] else tokens
      in.foreach { t =>
        val h = charHashJvm(t)
        var b = 0
        while (b < 16) { votes(b) += ((h >> b) & 1L) * 2 - 1; b += 1 }
      }
      var sh = 0L
      var b = 0
      while (b < 16) { if (votes(b) > 0) sh |= 1L << b; b += 1 }
      sh
    }

  /** Bit-extracted hamming distance between two 16-bit simhash columns —
    * identical arithmetic (floor-div + mod) to the DuckDB oracle mirror.
    */
  private def hamming16(a: Column, b: Column): Column =
    (0 until 16).map { bit =>
      abs(shiftright(a, bit) % 2 - shiftright(b, bit) % 2)
    }.reduce(_ + _)

  /** SimHash near-dup pairs within a block: hamming(simhash) ≤ maxDist.
    * Quadratic in the block size — unit-test / small-block tool; the scale
    * path is [[simhashBandPairs]] (identical results by pigeonhole).
    */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      maxDist: Int): DataFrame = {
    val g = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      simhash16Udf(array_distinct(split(TextAnalysis.normalized(col(textCol)), " ")))
        .as("sh")).cache()
    val a = g.alias("a")
    val b = g.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("hamming", hamming16(col("a.sh"), col("b.sh")))
      .filter(col("hamming") <= maxDist)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"), col("hamming"))
  }

  /** Scale-path SimHash near-dup: hamming-band bucketing. The `bits`-wide
    * hash is split into (maxDist+1) contiguous segments; by pigeonhole any
    * pair within hamming ≤ maxDist agrees on at least one whole segment, so
    * an equi-join on (block, segment-index, segment-value) produces a
    * candidate superset with recall exactly 1.0 — but the join key-space is
    * blocks × segments × 2^segBits instead of blocks, so no per-block
    * quadratic blow-up at scale. `blockCol` stays as the *semantic* scope of
    * the dedup (same-language), not the thing bounding the join.
    */
  private def bandPairs(g: DataFrame, maxDist: Int, bits: Int,
      hammingOf: (Column, Column) => Column): DataFrame = {
    val segs = maxDist + 1
    require(segs <= bits, s"maxDist $maxDist leaves no bits per segment")
    // near-equal contiguous bit segments: first (bits % segs) get an extra bit
    val base = bits / segs
    val extra = bits % segs
    val bounds = (0 until segs).map { i =>
      val off = i * base + math.min(i, extra)
      val width = base + (if (i < extra) 1 else 0)
      (i, off, width)
    }
    val segStructs = bounds.map { case (i, off, width) =>
      struct(lit(i).as("si"),
        shiftright(col("sh"), off).bitwiseAND(lit((1L << width) - 1)).as("sv"))
    }
    val banded = g.select(col("id"), col("blk"), col("sh"),
        explode(array(segStructs: _*)).as("seg"))
      .select(col("id"), col("blk"), col("sh"),
        col("seg.si").as("si"), col("seg.sv").as("sv"))
    // first-match-segment dedup: a pair is emitted only by its FIRST
    // matching segment (all earlier segments must differ) — replaces the
    // global distinct() with a cheap local bit-arithmetic filter
    val noEarlierMatch = bounds.map { case (i, off, width) =>
      val mask = (1L << width) - 1
      lit(i) >= col("a.si") ||
        shiftright(col("a.sh"), off).bitwiseAND(lit(mask)) =!=
          shiftright(col("b.sh"), off).bitwiseAND(lit(mask))
    }.reduce(_ && _)
    banded.alias("a")
      .join(banded.alias("b"),
        col("a.blk") === col("b.blk") && col("a.si") === col("b.si") &&
          col("a.sv") === col("b.sv") && col("a.id") < col("b.id"))
      .filter(noEarlierMatch)
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .withColumn("hamming", hammingOf(col("sha"), col("shb")))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** 16-bit banded variant — results identical to [[simhashPairs]]
    * (spec-asserted). Kept for parity with the token-hash simhash; the GATE
    * runs the 48-bit [[simhashBandPairs48]], because 2^16 hash values make
    * buckets grow linearly with any large corpus (quadratic candidates — a
    * 60× blow-up in the 10× scale probe), while 2^48 keeps collisions ∝
    * true near-dup clusters.
    */
  def simhashBandPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      maxDist: Int): DataFrame = {
    val g = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      simhash16Udf(array_distinct(split(TextAnalysis.normalized(col(textCol)), " ")))
        .as("sh")).cache()
    bandPairs(g, maxDist, 16, hamming16)
  }

  val Simhash48Bits = 48

  /** 48-bit token bit-source: the first 12 hex chars of md5(token) as a
    * big-endian value — portable (DuckDB md5 produces the same lowercase
    * hex) and BIGINT-safe (< 2^48).
    */
  def md5Bits48Jvm(token: String): Long =
    java.lang.Long.parseLong(md5Hex(token).substring(0, 12), 16)

  /** 48-bit SimHash over distinct tokens: per-bit majority vote on md5-bit
    * ±1 contributions. One md5 per token, all 48 votes in a single pass.
    */
  val simhash48Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { tokens: Seq[String] =>
      val votes = new Array[Long](Simhash48Bits)
      val in = if (tokens == null) Seq.empty[String] else tokens
      in.foreach { t =>
        val h = md5Bits48Jvm(t)
        var b = 0
        while (b < Simhash48Bits) { votes(b) += ((h >> b) & 1L) * 2 - 1; b += 1 }
      }
      var sh = 0L
      var b = 0
      while (b < Simhash48Bits) { if (votes(b) > 0) sh |= 1L << b; b += 1 }
      sh
    }

  /** The 48-bit scale-path gate form: hamming-band candidates over a hash
    * wide enough that unrelated docs virtually never collide. Pairs are
    * generated BUCKET-LOCALLY (groupByKey on (block, segment, value), like
    * the minhash pipeline): each doc row ships once per segment, pairs and
    * the `Long.bitCount(xor)` verify (≡ the oracle's `bit_count(xor)`)
    * happen inside the bucket, and the first-match-segment rule replaces
    * any global dedup.
    */
  def simhashBandPairs48(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      maxDist: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    requireIntegralId(docs, idCol)
    val segs = maxDist + 1
    val bits = Simhash48Bits
    require(segs <= bits, s"maxDist $maxDist leaves no bits per segment")
    val base = bits / segs
    val extra = bits % segs
    val bounds = (0 until segs).map { i =>
      val off = i * base + math.min(i, extra)
      val width = base + (if (i < extra) 1 else 0)
      (i, off, width)
    }.toArray
    val md = maxDist
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(blockCol).cast("string").as("blk"),
        simhash48Udf(array_distinct(split(TextAnalysis.normalized(col(textCol)), " ")))
          .as("sh"))
      .select(col("id"), col("blk"), col("sh"),
        explode(array((0 until segs).map(lit): _*)).as("si"))
      .as[(Long, String, Long, Int)]
      .groupByKey { t =>
        val (_, off, width) = bounds(t._4)
        (t._2, t._4, (t._3 >> off) & ((1L << width) - 1))
      }
      .flatMapGroups { (key, rows) =>
        val si = key._2
        val arr = rows.toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var i = 0
        while (i < arr.length) {
          val (ia, _, sa, _) = arr(i)
          var j = i + 1
          while (j < arr.length) {
            val (ib, _, sb, _) = arr(j)
            // first-match-segment: skip if any earlier segment also matches
            var earlier = false
            var p = 0
            while (!earlier && p < si) {
              val (_, off, width) = bounds(p)
              earlier = ((sa >> off) & ((1L << width) - 1)) ==
                ((sb >> off) & ((1L << width) - 1))
              p += 1
            }
            if (!earlier) {
              val h = java.lang.Long.bitCount(sa ^ sb).toLong
              if (h <= md) out += ((ia, ib, h))
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("doc_a", "doc_b", "hamming")
  }

  /** Left-fold dot product — the exact fold the DuckDB oracle uses. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** THE ascending left-fold dot kernel — every JVM cosine path funnels
    * through this one definition so the fold order that the DuckDB oracle
    * mirrors can never drift between operators.
    */
  def dotAsc(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc = acc + a(i) * b(i); i += 1 }
    acc
  }

  /** JVM fast path for [[dot]]: the SAME ascending left fold (so results
    * are bit-identical to the expression/oracle form), minus the
    * per-element interpreter overhead of HOF expressions.
    */
  val dotUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (a: Seq[Double], b: Seq[Double]) => dotAsc(a.toArray, b.toArray) }

  /** Exact-cosine verification of candidate pairs: a typed mapPartitions
    * over primitive arrays running the SAME ascending left fold as the
    * expression/oracle form (bit-identical doubles), ~20× faster than
    * interpreted HOFs. Input must carry (id_a, id_b, v_a, v_b, nrm_a*nrm_b).
    */
  private def verifyCosine(pairs: DataFrame, threshold: Double): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val thr = threshold
    pairs
      .as[(Long, Long, Array[Double], Array[Double], Double)]
      .mapPartitions { it =>
        it.flatMap { case (ia, ib, va, vb, nn) =>
          val cos = dotAsc(va, vb) / nn
          if (cos >= thr) Iterator.single((ia, ib, cos)) else Iterator.empty
        }
      }
      .toDF("vec_a", "vec_b", "cos")
  }

  /** Embedding cosine near-dup pairs, brute force: O(n²) pair generation —
    * unit-test / small-block tool and the recall oracle for
    * [[lshCosinePairs]], which is the form that scales.
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // norms once per row (not per pair)
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"),
      sqrt(dotUdf(col(vecCol), col(vecCol))).as("nrm")).cache()
    val a = v.alias("a")
    val b = v.alias("b")
    verifyCosine(
      a.join(b, col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"), col("a.v"), col("b.v"),
          (col("a.nrm") * col("b.nrm")).as("nn")),
      threshold)
  }

  /** Scale-path embedding near-dup: random-hyperplane LSH bucketing
    * ([[graft.sim.Similarity.lshBucket]]) → shuffle each vector ONCE to its
    * bucket → all-pairs cosine verify locally within the bucket. The cosine
    * twin of [[lshVerifiedPairs]], but with O(n·d) shuffle volume: a bucket
    * equi-join would ship both vectors per candidate PAIR (O(pairs·d) —
    * ~12× more bytes on the 10× probe). Within a bucket the verify is the
    * same ascending-left-fold kernel as [[verifyCosine]]; bucket sizes (and
    * thus the local quadratic term) are controlled by `planes`.
    * Positive scaling preserves every sign pattern, so exact/scaled
    * duplicates are guaranteed co-bucketed; near-dup recall is tuned by
    * `planes` (fewer planes → bigger buckets → higher recall).
    */
  def lshCosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int, dims: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val thr = threshold
    vecs.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"),
        sqrt(dotUdf(col(vecCol), col(vecCol))).as("nrm"),
        graft.sim.Similarity.lshBucket(col(vecCol), planes, dims).as("bucket"))
      .as[(Long, Array[Double], Double, Long)]
      .groupByKey(_._4)
      .flatMapGroups { (_, rows) =>
        // a bucket is bounded by construction (planes choose the granularity)
        val arr = rows.toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < arr.length) {
          val (ia, va, na, _) = arr(i)
          var j = i + 1
          while (j < arr.length) {
            val (ib, vb, nb, _) = arr(j)
            var acc = 0.0
            var t = 0
            val n = math.min(va.length, vb.length)
            while (t < n) { acc = acc + va(t) * vb(t); t += 1 }
            val cos = acc / (na * nb)
            if (cos >= thr) out += ((ia, ib, cos))
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("vec_a", "vec_b", "cos")
  }
}
