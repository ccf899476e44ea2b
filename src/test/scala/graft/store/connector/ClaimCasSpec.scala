package graft.store.connector

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Same-JVM CAS contention: `FileChannel.lock` throws
  * `OverlappingFileLockException` (rather than blocking) when a second
  * thread in the SAME process contends — the shape of concurrent local-mode
  * Spark tasks racing one expired lock. The per-file JVM monitor in
  * [[WorkQueueClaimWrite.casSwap]] must serialize them: exactly one swap
  * wins, every loser is told the winner, nothing throws.
  */
class ClaimCasSpec extends AnyFunSuite {

  test("16 threads racing one expired lock: one winner, losers told the winner, no exceptions") {
    val dir = Files.createTempDirectory("graft-casrace").toString
    Files.createDirectories(java.nio.file.Paths.get(dir, "locks"))
    val f = WorkQueueClaimWrite.lockFile(dir, "item_c")
    // expired lease (expiresAt = 1 ms epoch): every contender sees takeable
    Files.write(f, "lockDead,dead,1".getBytes(StandardCharsets.UTF_8))

    val threads = 16
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, String]]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(threads)
    val errors = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until threads).foreach { i =>
      new Thread(() => {
        try {
          start.await()
          val content = (s"lock$i,w$i," + (System.currentTimeMillis() + 60000L))
            .getBytes(StandardCharsets.UTF_8)
          WorkQueueClaimWrite.casSwap(f, content,
            cur => cur._3 > 0 && System.currentTimeMillis() >= cur._3) match {
            case Right(()) => results.add(Right(s"lock$i"))
            case Left(holder) => results.add(Left(holder))
          }
        } catch { case _: Throwable => errors.incrementAndGet() }
        finally done.countDown()
      }).start()
    }
    start.countDown()
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.get() === 0, "casSwap threw under same-JVM contention")

    import scala.collection.JavaConverters._
    val rs = results.asScala.toSeq
    val winners = rs.collect { case Right(l) => l }
    assert(winners.length === 1, s"expected one winner, got $winners")
    // every loser read the final state: the winner's lock
    rs.collect { case Left(h) => h }.foreach(h => assert(h === winners.head))
    val (lock, _, exp) = WorkQueueClaimWrite.lockState(dir, "item_c").get
    assert(lock === winners.head && exp > System.currentTimeMillis())
  }

  test("escapeToken/unescapePartitionValue round-trip any value, including non-Latin-1") {
    val cases = Seq(
      "plain-id_1.2",
      "a,b c%d=e",                  // ASCII specials: one %XX per char
      "中文状态",                    // CJK letters pass through raw
      "done→next",                  // U+2192: 3 UTF-8 bytes, was corrupted pre-fix
      "emoji😀state",     // surrogate pair (4 UTF-8 bytes)
      "nl\nand,comma",              // control chars
      "café ß €",    // Latin-1 letters + 3-byte symbol
      "%41 literal-ish",            // raw '%' must survive its own escape
      "")
    cases.foreach { s =>
      val esc = WorkQueueClaimWrite.escapeToken(s)
      // escaped form is filesystem-safe: no separators or path chars
      assert(!esc.exists(c => c == '/' || c == '\n' || c == ','), esc)
      assert(WorkQueueSource.unescapePartitionValue(esc) === s, s"via $esc")
    }
    // Spark-style single-byte ASCII escapes still decode (the other producer
    // of partition-dir names this decoder must understand)
    assert(WorkQueueSource.unescapePartitionValue("a%20b%2Cc") === "a b,c")
    // a '%' not followed by two hex digits is literal, not an escape
    assert(WorkQueueSource.unescapePartitionValue("100%zz%4") === "100%zz%4")
  }
}
