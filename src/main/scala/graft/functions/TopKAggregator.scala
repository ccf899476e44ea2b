package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k largest (score, id) pairs per
  * group with a min-heap — the scale-path replacement for
  * `row_number().over(Window...) <= k`:
  *
  *   - the window form SORTS every group in full (O(n log n) per group,
  *     whole group materialized in one partition);
  *   - this form is a real partial aggregate: map-side combine keeps ≤ k
  *     entries per group per partition, the shuffle moves only k-sized
  *     buffers, merge is O(k) — the only shape that survives groups with
  *     billions of rows.
  *
  * Ties break toward the lower id (matches the `orderBy(score.desc, id)`
  * window convention used across the sim/analytics surface).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {

  require(k > 0, s"k must be positive, got $k")

  // NaN ranks BEST, matching Spark's sort order (NaN > any double, so
  // orderBy(desc) puts it first) — keeps this form result-identical to the
  // window row_number form even on degenerate scores
  private def rankKey(s: Double): Double =
    if (s.isNaN) Double.NegativeInfinity else -s

  // rank order: smaller (rankKey, id) = better. PriorityQueue.head is the
  // MAXIMUM under the ordering, i.e. the worst-ranked entry — exactly what
  // eviction removes. val, not def: this ordering runs per comparison in
  // the hot aggregation loop.
  private val heapOrder: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (rankKey(s), id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrder)

  private def push(
      b: mutable.PriorityQueue[(Double, Long)], s: Double, id: Long): Unit = {
    if (b.size < k) b.enqueue((s, id))
    else if (heapOrder.lt((s, id), b.head)) { b.dequeue(); b.enqueue((s, id)); () }
  }

  override def reduce(
      b: mutable.PriorityQueue[(Double, Long)],
      a: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
    push(b, a._2, a._1); b
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, id) => push(b1, s, id) }
    b1
  }

  /** Best-first output (score desc, id asc). */
  override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
    b.toSeq.sortBy { case (s, id) => (rankKey(s), id) }.map { case (s, id) => (id, s) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
