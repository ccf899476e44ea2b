package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact frequent-items ("heavy hitters") via a mergeable Misra–Gries
  * sketch plus an exact verification pass — the sketch-then-verify pattern
  * that replaces a full-vocabulary groupBy when only the >n/k tail matters.
  *
  * Why not just groupBy(token)? At 100 TB the token vocabulary is billions
  * of keys and the full groupBy shuffles ALL of them to produce a handful
  * of rows. Here pass 1 shrinks the problem to ≤cap candidate tokens with
  * a per-partition O(cap) sketch merged treewise (driver receives one
  * O(cap) map, never data); pass 2 makes the answer EXACT with one
  * shuffle of at most cap+1 keys (candidates + one "other" bucket).
  *
  * Guarantee chain: a Misra–Gries sketch of capacity `cap` retains every
  * item with true frequency > n/(cap+1), and the property survives the
  * merge (sum counters, then subtract the (cap+1)-largest and drop ≤0 —
  * Agarwal et al., "Mergeable Summaries", PODS'12). With cap = 2k, every
  * item above the report threshold n/k is guaranteed present, so the
  * verified output equals the exact full-groupBy answer.
  */
object HeavyHitters {

  /** Report threshold for the gate: tokens with frequency > n/64. */
  val GateK = 64

  private[graft] def mgUpdate(m: mutable.HashMap[String, Long], x: String,
      cap: Int): mutable.HashMap[String, Long] = {
    m.get(x) match {
      case Some(c) => m.update(x, c + 1)
      case None if m.size < cap => m.update(x, 1L)
      case None =>
        // decrement-all; drop zeros (classic MG step, amortized O(1)).
        // snapshot keys first — mutating a HashMap mid-iteration is UB
        val snap = m.toArray
        snap.foreach { case (k, c) =>
          if (c == 1L) m.remove(k) else m.update(k, c - 1)
        }
    }
    m
  }

  private[graft] def mgMerge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long], cap: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) {
      // subtract the (cap+1)-th largest counter from all, drop ≤0 — the
      // mergeable-summaries reduction that preserves the >n/(cap+1) bound
      val pivot = a.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val snap = a.toArray
      snap.foreach { case (k, c) =>
        if (c - pivot <= 0L) a.remove(k) else a.update(k, c - pivot)
      }
    }
    a
  }

  /** Candidate set: keys of the merged MG sketch (size ≤ cap). */
  private[graft] def mgCandidates(items: Dataset[String], cap: Int): Set[String] =
    items.rdd.treeAggregate(mutable.HashMap.empty[String, Long])(
      (m, x) => mgUpdate(m, x, cap),
      (a, b) => mgMerge(a, b, cap)).keySet.toSet

  /** All items with exact frequency > n/k, with their exact counts.
    * Output: (item, cnt), equal to the full-groupBy answer by the MG
    * guarantee (cap = 2k > k). Two passes over the data, one tiny shuffle.
    */
  def frequentItems(items: Dataset[String], k: Int): DataFrame = {
    require(k >= 2, "threshold fraction 1/k needs k >= 2")
    val candidates = mgCandidates(items, 2 * k)
    // exact pass: non-candidates collapse into one structurally-tagged
    // "other" bucket (is_cand=false, key=null), so the exchange carries
    // ≤ 2k+1 keys per map task and total n comes for free. The tag is a
    // column, not a sentinel string — no input item can collide with it.
    val isCand = col("item").isInCollection(candidates)
    val grouped = items.toDF("item")
      .groupBy(isCand.as("is_cand"),
        when(isCand, col("item")).as("key"))
      .agg(count(lit(1)).as("cnt"))
    // the total-n window runs over the ≤2k+1 aggregated rows, not the data
    grouped
      .withColumn("total", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("is_cand") && col("cnt") * k > col("total"))
      .select(col("key").as("item"), col("cnt"))
  }

  private def tokens(s: SparkSession, d: String): Dataset[String] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(TextAnalysis.normalized(col("text")).as("ntext"))
      .filter(col("ntext").isNotNull && col("ntext") =!= "")
      .select(explode(split(col("ntext"), " ")).as("term"))
      .as[String]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_heavy_hitters" -> ((s, d) =>
      frequentItems(tokens(s, d), GateK)
        .withColumnRenamed("item", "term")
        .orderBy(col("cnt").desc, col("term"))))

  val oracles: Map[String, String] = Map(
    "txt_heavy_hitters" -> s"""
      |WITH norm AS (SELECT
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS ntext
      |  FROM documents WHERE text IS NOT NULL),
      |t AS (SELECT unnest(string_split(ntext, ' ')) AS term
      |      FROM norm WHERE ntext <> ''),
      |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_total FROM t)
      |SELECT term, cnt FROM c, n WHERE cnt * $GateK > n_total
      |ORDER BY cnt DESC, term""".stripMargin)
}
