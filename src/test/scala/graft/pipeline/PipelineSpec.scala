package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{Dedup, DedupSurface}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags exactly the train docs sharing an eval shingle") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (11L, "a story about the quick brown fox and nothing else"), // partial
      (12L, "completely unrelated text with no overlap at all"))
      .toDF("doc_id", "text")
    val flagged = Pipeline.decontaminate(train, eval, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // verbatim copy shares all 7 distinct 3-gram shingles
    assert(flagged(10L) === 7L)
    // "the quick brown" / "quick brown fox" survive inside doc 11
    assert(flagged(11L) === 2L)
    assert(!flagged.contains(12L))

    val clean = Pipeline.decontaminatedCorpus(train, eval, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(12L))
  }

  test("stratified sample is deterministic, respects rates, and drops unknown strata") {
    val docs = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "en" else if (i % 3 == 0) "de" else "xx"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 500, "de" -> 100)
    val s1 = Pipeline.stratifiedSample(docs, "doc_id", "lang", rates)
      .select($"doc_id", $"lang", $"bucket").as[(Long, String, Long)].collect()
    val s2 = Pipeline.stratifiedSample(docs, "doc_id", "lang", rates)
      .select($"doc_id", $"lang", $"bucket").as[(Long, String, Long)].collect()
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1)), "sample must be reproducible")
    assert(s1.forall { case (_, l, b) => b < rates(l) }, "bucket under stratum rate")
    assert(!s1.exists(_._2 == "xx"), "unlisted stratum dropped")
    // multiplicative hash spreads uniformly: en keeps ~50% of its 500 docs
    val enKept = s1.count(_._2 == "en")
    assert(enKept > 200 && enKept < 300, s"en kept $enKept of 500 at rate 0.5")
  }

  test("capPerSource keeps the cap-lowest-priority docs per source, partition-independently") {
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val capped = Pipeline.capPerSource(docs, "doc_id", "source", 7)
      .select($"doc_id", $"source", $"priority", $"rank")
      .as[(Long, String, Long, Long)].collect()
    // cap enforced, ranks dense 1..7 per source
    val bySource = capped.groupBy(_._2)
    assert(bySource.keySet === Set("src0", "src1", "src2", "src3"))
    bySource.foreach { case (src, rows) =>
      assert(rows.length === 7, s"$src kept ${rows.length}")
      assert(rows.map(_._4).sorted.sameElements(1L to 7L), s"$src ranks dense")
    }
    // survivors are exactly the 7 priority-minimal ids per source (id tie-break)
    val expected = (0L until 400L).map(i => (i, s"src${i % 4}"))
      .groupBy(_._2).flatMap { case (src, rows) =>
        rows.map { case (id, _) =>
          (id, src, java.lang.Math.floorMod(
            java.lang.Math.floorMod(id, 2147483647L) * 2654435761L, 1000000L))
        }.sortBy(r => (r._3, r._1)).take(7)
      }.map(r => (r._1, r._2)).toSet
    assert(capped.map(r => (r._1, r._2)).toSet === expected)
    // kept set independent of input partitioning
    val repart = Pipeline.capPerSource(docs.repartition(13), "doc_id", "source", 7)
      .select($"doc_id", $"source").as[(Long, String)].collect().toSet
    assert(repart === expected, "kept set must not depend on partitioning")
    // rides the TopKPerKey physical operator: no per-key Sort of the corpus
    val plan = Pipeline.capPerSource(docs, "doc_id", "source", 7)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"expected TopKPerKey lowering:\n$plan")
  }

  test("sequence packing covers every token exactly once per shard") {
    val docs = Seq(
      (0L, Seq.fill(100)("tok").mkString(" ")), // 100 tokens
      (8L, Seq.fill(200)("tok").mkString(" ")), // same shard as 0
      (16L, Seq.fill(30)("tok").mkString(" ")), // same shard
      (1L, Seq.fill(300)("tok").mkString(" "))) // shard 1
      .toDF("doc_id", "text")
    val packed = Pipeline.packSequences(docs, "doc_id", "text",
      windowTokens = 128, shards = 8)
      .select($"doc_id", $"shard", $"n_tokens", $"offset", $"first_window", $"n_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // shard 0 layout: doc0 [0,100), doc8 [100,300), doc16 [300,330)
    assert(packed(0L) === ((0L, 0L, 100L, 0L, 0L, 1L)))
    assert(packed(8L) === ((8L, 0L, 200L, 100L, 0L, 3L))) // tokens 100..299 -> w0..w2
    assert(packed(16L) === ((16L, 0L, 30L, 300L, 2L, 1L)))
    assert(packed(1L) === ((1L, 1L, 300L, 0L, 0L, 3L))) // 0..299 -> w0..w2
    // offsets are contiguous: next offset = prev offset + prev tokens
    val shard0 = packed.values.filter(_._2 == 0L).toSeq.sortBy(_._4)
    shard0.sliding(2).foreach {
      case Seq(a, b) => assert(b._4 === a._4 + a._3)
      case _ =>
    }
  }

  test("top n-grams per key respects k, frequency order, and lexicographic ties") {
    val docs = Seq(
      ("en", "a b a b a b"), // "a b" x3, "b a" x2
      ("en", "c d c d"),     // "c d" x2, "d c" x1
      ("fr", "x y"))
      .toDF("lang", "text")
    val top = Pipeline.topNgramsPerKey(docs, "lang", "text", n = 2, k = 2)
      .select($"key", $"gram", $"n", $"rank")
      .as[(String, String, Long, Long)].collect().toSet
    // en ties at n=2 broken lexicographically: "b a" < "c d"
    assert(top === Set(
      ("en", "a b", 3L, 1L), ("en", "b a", 2L, 2L),
      ("fr", "x y", 1L, 1L)))
  }

  test("decontamination works on string ids (no silent cast-to-null no-op)") {
    val eval = Seq(("e1", "the quick brown fox jumps over it"))
      .toDF("doc_id", "text")
    val train = Seq(
      ("url://a", "the quick brown fox jumps over it"), // verbatim leak
      ("url://b", "nothing shared with the benchmark here"))
      .toDF("doc_id", "text")
    val clean = Pipeline.decontaminatedCorpus(train, eval, "doc_id", "text")
      .select($"doc_id").as[String].collect().toSet
    assert(clean === Set("url://b"), "leaked doc must be removed for string ids too")
  }

  test("near-dup survivors fails loud on non-integral ids") {
    val docs = Seq(("a", "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.nearDupSurvivors(docs, "doc_id", "text", 0.5)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("hashBucket stays in [0, denom) for negative and overflow-range ids") {
    val ids = Seq(-5L, -1L, 0L, 3L, Long.MaxValue / 2, Long.MinValue / 3)
      .toDF("doc_id")
    val buckets = ids.select(Pipeline.hashBucket($"doc_id", 1000).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 1000), s"out of range: ${buckets.toSeq}")
  }

  test("stratified sampling is monotone in the rate (threshold property)") {
    val docs = (0L until 2000L).map((_, "en")).toDF("doc_id", "lang")
    def sample(r: Int) =
      Pipeline.stratifiedSample(docs, "doc_id", "lang", Map("en" -> r))
        .select($"doc_id").as[Long].collect().toSet
    val (small, big) = (sample(100), sample(700))
    assert(small.subsetOf(big), "raising the rate must only ADD rows")
    assert(small.nonEmpty && big.size > small.size)
  }

  test("decontamination flags only grow as the eval set grows") {
    val docs = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val train = docs.filter($"doc_id" % 20 =!= 0)
    def flags(evalMod: Int) =
      Pipeline.decontaminate(train, docs.filter($"doc_id" % evalMod === 0),
        "doc_id", "text")
        .as[(Long, Long)].collect().toMap
    val (narrow, wide) = (flags(40), flags(20)) // %40 eval ⊂ %20 eval
    assert(narrow.keySet.subsetOf(wide.keySet),
      "superset eval must flag a superset of train docs")
    narrow.foreach { case (id, n) =>
      assert(n <= wide(id), s"doc $id lost shared shingles under a larger eval")
    }
  }

  test("JVM ngrams kernel is bit-identical to the expression form") {
    val docs = DedupSurface.corpus(spark, sf0001)
    for (n <- Seq(2, 3)) {
      val e = docs.select($"doc_id", Dedup.ngrams($"text", n).as("g"))
      val u = docs.select($"doc_id",
        Dedup.ngramsUdf(n)(graft.text.TextAnalysis.normalized($"text")).as("g"))
      assert(e.exceptAll(u).count() === 0 && u.exceptAll(e).count() === 0,
        s"n=$n kernel diverges from expression form")
    }
  }

  test("PII redaction scrubs every category and counts on the original text") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or anna@a.io thanks"),
      (2L, "call 555-867-5309 from 10.0.42.7 at 555-000-1111"),
      (3L, "nothing sensitive here"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Pipeline.redactPii(docs, "doc_id", "text")
      .as[(Long, String, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "mail me at <EMAIL> or <EMAIL> thanks",
      Some(2L), Some(0L), Some(0L))))
    assert(out(2L) === ((2L, "call <PHONE> from <IP> at <PHONE>",
      Some(0L), Some(2L), Some(1L))))
    assert(out(3L) === ((3L, "nothing sensitive here",
      Some(0L), Some(0L), Some(0L))))
    assert(out(4L)._2 === null && out(4L)._3.isEmpty, "null text stays null")
  }

  test("repetition metrics expose boilerplate and the filter cuts on the rule") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now"), // one bigram dominates
      (2L, "a varied document with many different words in it"),
      (3L, "word")) // single token: no bigram, fallback gram = whole text
      .toDF("doc_id", "text")
    val m = Pipeline.repetitionMetrics(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L)._2 === 10L && m(1L)._3 === 2L, "10 tokens, 2 distinct")
    assert(m(1L)._4 === 0.2 && m(1L)._5 === 0.5, "distinct ratio / top token")
    // 9 bigrams, "buy now" appears 5 times
    assert(m(1L)._6 === 5.0 / 9.0)
    assert(m(2L)._4 === 1.0 && m(2L)._6 < 0.2)
    assert(m(3L)._2 === 1L && m(3L)._6 === 1.0, "short-doc fallback gram")
    val kept = Pipeline.repetitionFilter(docs, "doc_id", "text",
      minDistinctRatio = 0.35, maxTopBigramFrac = 0.3)
      .filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(2L), "only the varied doc survives the rule")
  }

  test("mixture sample hits the target mixture and is partitioning-independent") {
    val docs = (0L until 3000L).map { i =>
      (i, if (i % 6 < 3) "big" else if (i % 6 < 5) "mid" else "small")
    }.toDF("doc_id", "source") // 1500 big / 1000 mid / 500 small
    val w = Map("big" -> 2, "mid" -> 2, "small" -> 1)
    val kept = Pipeline.mixtureSample(docs, "doc_id", "source", w)
      .select($"doc_id", $"source", $"rate").as[(Long, String, Long)].collect()
    // bottleneck stratum: mid (1000 div 2 = 500 units) → targets 1000/1000/500
    // → per-mille rates floor(1000*target/n) = 666 / 1000 / 1000
    val rates = kept.map(r => r._2 -> r._3).toMap
    assert(rates === Map("big" -> 666L, "mid" -> 1000L, "small" -> 1000L))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("mid") === 1000 && bySrc("small") === 500, "rate-1000 strata keep everything")
    // hash-threshold selection: big keeps ~666/1000 of its 1500 docs
    assert(math.abs(bySrc("big") - 999) < 60, s"big kept ${bySrc("big")} of 1500 at 0.666")
    // partitioning independence: same kept set on a different layout
    val kept2 = Pipeline.mixtureSample(docs.repartition(17, $"doc_id"),
      "doc_id", "source", w)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2 === kept.map(_._1).toSet)
  }

  test("prepareCorpus end-to-end: scrubbed, filtered, decontaminated, deduped, split") {
    val base = DedupSurface.corpus(spark, sf0001) // carries planted near-dups
      .withColumn("source", concat(lit("src"), $"doc_id" % 3))
    // plant PII on a slice so the scrub stage has work
    val docs = base.withColumn("text",
      when($"doc_id" % 4 === 0,
        concat($"text", lit(" reach me at pii@leak.example.com")))
        .otherwise($"text"))
    val eval = base.filter($"doc_id" % 50 === 0).select($"doc_id", $"text")
    val out = Pipeline.prepareCorpus(docs, eval, "doc_id", "text", "source",
      threshold = 0.5).cache()
    val texts = out.select($"text").as[String].collect()
    assert(texts.nonEmpty)
    // 1. no PII survives any output text
    Pipeline.PiiPatterns.foreach { case (name, p, _) =>
      val pat = java.util.regex.Pattern.compile(p)
      assert(!texts.exists(t => t != null && pat.matcher(t).find()),
        s"$name pattern still matchable in output")
    }
    // 2. repetition rule holds on the output corpus
    val badRep = Pipeline.repetitionFilter(out, "doc_id", "text")
      .filter(!$"keep").count()
    assert(badRep === 0L, "a repetition-failing doc survived")
    // 3. eval docs (leaked verbatim into the corpus) are gone
    val evalIds = eval.select($"doc_id").as[Long].collect().toSet
    val outIds = out.select($"doc_id").as[Long].collect().toSet
    assert(evalIds.intersect(outIds).isEmpty, "contaminated docs survived")
    // 4. no verified near-dup pair exists INSIDE the output
    val pairs = Dedup.lshVerifiedPairs(out, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
      .filter(p => outIds(p._1) && outIds(p._2))
    assert(pairs.isEmpty, s"near-dup pairs inside prepared corpus: ${pairs.take(3).toSeq}")
    // 5. split column populated, and the whole pipeline is reproducible
    assert(out.select($"split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "test")))
    val rerun = Pipeline.prepareCorpus(docs, eval, "doc_id", "text", "source",
      threshold = 0.5).select($"doc_id").as[Long].collect().toSet
    assert(rerun === outIds, "pipeline not reproducible")
    out.unpersist()
  }

  test("span dedup removes a repeated span at ANY offset and keeps the first") {
    val boiler = "subscribe to our newsletter for daily updates today"
    val docs = Seq(
      (1L, s"alpha beta gamma delta $boiler"), // first occurrence (at tail)
      (2L, s"$boiler epsilon zeta eta theta"), // same span, shifted to front
      (3L, s"iota kappa $boiler lambda mu")) // same span, mid-doc
      .toDF("doc_id", "text")
    val out = Pipeline.dedupSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

    // doc 1 keeps everything (it owns the first occurrence of every chunk)
    assert(out(0)._2 === out(0)._3, "doc 1 fully kept")
    assert(out(0)._4 === s"alpha beta gamma delta $boiler")
    // docs 2 and 3 lose the boilerplate's interior chunks: kept text must
    // never contain a >=2-chunk run of the boiler span's interior tokens
    assert(out(1)._3 < out(1)._2, "doc 2 lost repeated chunks")
    assert(out(2)._3 < out(2)._2, "doc 3 lost repeated chunks")
    // offset-robustness: the span sits at offsets 4, 0, and 2 — with
    // content-defined boundaries its interior chunks hash identically in
    // all three docs, so the SAME chunk text is removed from docs 2 and 3
    val removed2 = boiler.split(" ").toSet -- out(1)._4.split(" ").toSet
    val removed3 = boiler.split(" ").toSet -- out(2)._4.split(" ").toSet
    assert(removed2.nonEmpty && removed3.nonEmpty,
      "shifted copies must lose boiler tokens")
    // unique doc content always survives
    assert(Seq("epsilon", "zeta", "eta", "theta")
      .forall(out(1)._4.split(" ").contains))
    assert(Seq("iota", "kappa", "lambda", "mu")
      .forall(out(2)._4.split(" ").contains))
  }

  test("span dedup: duplicate-free corpus passes through unchanged") {
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "six seven eight nine ten"))
      .toDF("doc_id", "text")
    val out = Pipeline.dedupSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._4 === "one two three four five")
    assert(out(1)._4 === "six seven eight nine ten")
    assert(out.forall(r => r._2 === r._3), "no chunk removed")
  }

  test("span dedup: exact-duplicate doc empties; result is partitioning-independent") {
    val docs = Seq(
      (1L, "red orange yellow green blue indigo violet"),
      (2L, "red orange yellow green blue indigo violet"))
      .toDF("doc_id", "text")
    val out = Pipeline.dedupSpans(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0)._4 === "red orange yellow green blue indigo violet")
    assert(out(1)._3 === 0L && out(1)._4 === "", "verbatim dup fully removed")

    val big = (0L until 200L).map(i =>
      (i, s"w${i % 37} common span text here w${i % 11} tail w$i"))
      .toDF("doc_id", "text")
    val a = Pipeline.dedupSpans(big, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val b = Pipeline.dedupSpans(big.repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b), "dedup must not depend on partitioning")
  }

  test("leakproof split never lets a verified near-dup pair straddle train/test") {
    val corpus = DedupSurface.corpus(spark, sf0001)
    val split = Pipeline.leakproofSplit(corpus, "doc_id", "text", 0.5)
    val byDoc = split.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    assert(byDoc.values.toSet === Set("train", "test"), "both splits populated")
    val pairs = Dedup.lshVerifiedPairs(corpus, "doc_id", "text", 0.5)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) === byDoc(b), s"pair ($a,$b) straddles the split")
    }
  }

  test("chunking covers every token, overlaps by chunk-stride, reaches the tail") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(100)),  // starts 0,30,60 → 40/40/40
      (2L, words(45)),   // starts 0,30 → 40/15
      (3L, words(10)),   // single short chunk
      (4L, words(40)),   // exactly one full window, no extra chunk
      (5L, ""),          // dropped
      (6L, null.asInstanceOf[String])) // dropped
      .toDF("doc_id", "text")
    val out = Pipeline.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 40, stride = 30)
      .select($"doc_id", $"chunk_id", $"n_tokens").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(out === Seq(
      (1L, 0L, 40L), (1L, 1L, 40L), (1L, 2L, 40L),
      (2L, 0L, 40L), (2L, 1L, 15L),
      (3L, 0L, 10L),
      (4L, 0L, 40L)))
    // the md5 is over the actual token window: doc 2 chunk 1 = tokens 31..45
    val md5s = Pipeline.chunkDocuments(docs, "doc_id", "text", 40, 30)
      .select($"doc_id", $"chunk_id", $"chunk_md5").as[(Long, Long, String)]
      .collect().map { case (d, c, m) => (d, c) -> m }.toMap
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((31 to 45).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5s((2L, 1L)) === expect)
  }

  test("chunking emits no shuffle: the plan has no exchange") {
    val plan = Pipeline.chunkDocuments(
      graft.Tables.documents(spark, sf0001), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must stay narrow:\n$plan")
  }

  test("shuffleCorpus: exact permutation, seed-deterministic, partitioning-invariant") {
    val docs = graft.Tables.documents(spark, sf0001).select($"doc_id")
    val n = docs.count()
    val a = Pipeline.shuffleCorpus(docs, "doc_id", "epoch0")
      .as[(Long, Long)].collect().toMap
    // positions are exactly 0..n-1: a permutation, no gaps, no dups
    assert(a.values.toSeq.sorted === (0L until n))
    // same seed on a different partitioning -> identical position map
    val b = Pipeline.shuffleCorpus(docs.repartition(7), "doc_id", "epoch0")
      .as[(Long, Long)].collect().toMap
    assert(b === a)
    // a different seed is a genuinely different epoch order
    val c = Pipeline.shuffleCorpus(docs, "doc_id", "epoch1")
      .as[(Long, Long)].collect().toMap
    assert(c !== a)
    assert(c.values.toSeq.sorted === (0L until n))
  }

  test("ppsSample: zero-variance pick count, layout invariance, weight edge cases") {
    val docs = (1L to 400L).map(i => (i, 1L + (i * 37) % 97))
      .toDF("doc_id", "w")
    val stride = 512L
    val total = docs.agg(sum($"w")).as[Long].head()
    val picks = Pipeline.ppsSample(docs, "doc_id", "w", stride)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // systematic design: exactly ⌊W/stride⌋ multiples of stride in (0, W]
    assert(picks.length.toLong === total / stride)
    // partition-layout invariance: same rows from any input layout
    val picks2 = Pipeline.ppsSample(docs.repartition(13), "doc_id", "w", stride)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(picks2 === picks)
    // cumw is the true running total in id order
    var c = 0L
    val cumByid = (1L to 400L).map { i =>
      c += 1L + (i * 37) % 97; i -> c
    }.toMap
    picks.foreach { case (id, w, cw) =>
      assert(cw === cumByid(id) && w === 1L + (id * 37) % 97)
    }
    // zero-weight docs never picked; a doc spanning >= stride always is
    val edge = Seq((1L, 0L), (2L, 600L), (3L, 0L), (4L, 600L))
      .toDF("doc_id", "w")
    val ids = Pipeline.ppsSample(edge, "doc_id", "w", 512L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L, 4L))
  }

  test("kAnonymityReport flags small classes and constant-sensitive classes") {
    val rows = Seq(
      // class A: size 6, both sensitive values → clean
      ("A", true), ("A", true), ("A", false), ("A", false), ("A", true), ("A", false),
      // class B: size 2 → k violation (k=5); diverse sensitive
      ("B", true), ("B", false),
      // class C: size 7 but constant sensitive → l violation only
      ("C", true), ("C", true), ("C", true), ("C", true), ("C", true),
      ("C", true), ("C", true)
    ).toDF("quasi", "sens")
    val rep = Pipeline.kAnonymityReport(rows, Seq("quasi"), "sens", 5)
      .select($"quasi", $"class_size", $"l_distinct", $"k_violation", $"l_violation")
      .as[(String, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep("A") === ("A", 6L, 2L, false, false))
    assert(rep("B") === ("B", 2L, 2L, true, false))
    assert(rep("C") === ("C", 7L, 1L, false, true))
  }

  test("globalPrefixSum matches a single-partition window cumsum") {
    val df = (1L to 1000L).map(i => (i * 7 % 1000, i % 13)).toDF("k", "w")
      .distinct()
    val got = graft.analytics.Ranking
      .globalPrefixSum(df, Seq($"k", $"w"), $"w", partitions = 7)
      .select($"k", $"w", $"cumw")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val rows = df.as[(Long, Long)].collect().toSeq.sortBy(identity)
    var acc = 0L
    val want = rows.map { case (k, w) => acc += w; (k, w, acc) }
    assert(got === want)
  }
}
