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
      "中文状态",                    // CJK letters: escaped per UTF-8 byte
      "done→next",                  // U+2192: 3 UTF-8 bytes, was corrupted pre-fix
      "emoji😀state",     // surrogate pair (4 UTF-8 bytes)
      "nl\nand,comma",              // control chars
      "café ß €",    // Latin-1 letters + 3-byte symbol
      "%41 literal-ish",            // raw '%' must survive its own escape
      "")
    cases.foreach { s =>
      val esc = WorkQueueClaimWrite.escapeToken(s)
      // escaped form is filesystem-safe AND pure ASCII: raw non-ASCII in a
      // filename is subject to FS Unicode normalization (macOS NFD), which
      // would break the byte-equality the lock filename contract needs
      assert(esc.forall(c => c < 0x80 && c != '/' && c != '\n' && c != ','), esc)
      assert(WorkQueueSource.unescapePartitionValue(esc) === s, s"via $esc")
    }
    // Spark-style single-byte ASCII escapes still decode (the other producer
    // of partition-dir names this decoder must understand)
    assert(WorkQueueSource.unescapePartitionValue("a%20b%2Cc") === "a b,c")
    // a '%' not followed by two hex digits is literal, not an escape
    assert(WorkQueueSource.unescapePartitionValue("100%zz%4") === "100%zz%4")
    // legacy v1 format escaped 0x80-0xFF as ONE %XX each (Latin-1 bytes):
    // an invalid-UTF-8 byte run falls back to Latin-1 instead of U+FFFD,
    // so pre-existing queue dirs and lock files keep decoding correctly
    assert(WorkQueueSource.unescapePartitionValue("caf%E9") === "café")
    assert(WorkQueueSource.unescapePartitionValue("%E9%20%FC") === "é ü")
    // v2 format passed non-ASCII letters raw: verbatim passthrough decodes
    assert(WorkQueueSource.unescapePartitionValue("café") === "café")
  }

  test("renormalizeEscaping migrates legacy lock filenames and state dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-renorm").toString
    val locks = new java.io.File(dir, "locks"); locks.mkdirs()
    // v1-era lock for itemID "café" (single %XX per Latin-1 char). A
    // v2-era RAW non-ASCII filename cannot even be created under this
    // JVM's POSIX jnu.encoding — one more reason the current format
    // escapes everything past ASCII.
    java.nio.file.Files.write(new java.io.File(locks, "caf%E9.lock").toPath,
      "lock1,inst1".getBytes("UTF-8"))
    // a current-format lock must be untouched
    val current = WorkQueueClaimWrite.escapeToken("plain") + ".lock"
    java.nio.file.Files.write(new java.io.File(locks, current).toPath,
      "lock3,inst3".getBytes("UTF-8"))
    // legacy state dir with a data file that must survive the rename
    val legacyState = new java.io.File(dir, "itemState=todo%E9"); legacyState.mkdirs()
    java.nio.file.Files.write(new java.io.File(legacyState, "part-x.csv").toPath,
      "i1,t1,0,\n".getBytes("UTF-8"))
    assert(WorkQueueSource.renormalizeEscaping(dir) === 2)
    // lockState resolves the migrated lock under its raw itemID
    assert(WorkQueueClaimWrite.lockState(dir, "café").map(_._1) === Some("lock1"))
    assert(WorkQueueClaimWrite.lockState(dir, "plain").map(_._1) === Some("lock3"))
    val canonicalState = "itemState=" + WorkQueueClaimWrite.escapeToken("todoé")
    assert(new java.io.File(new java.io.File(dir, canonicalState), "part-x.csv").isFile)
    // idempotent: a second pass changes nothing
    assert(WorkQueueSource.renormalizeEscaping(dir) === 0)
  }

  test("live legacy-named lock stays visible WITHOUT queue-compact: lookups auto-migrate") {
    val dir = Files.createTempDirectory("graft-legacylock").toString
    val locks = new java.io.File(dir, "locks"); locks.mkdirs()
    // a live pre-upgrade (v1-named) claim on itemID "café", non-expiring
    Files.write(new java.io.File(locks, "caf%E9.lock").toPath,
      "lockL,instL".getBytes(StandardCharsets.UTF_8))
    // first touch resolves (and migrates) it — no operator migration ran
    assert(WorkQueueClaimWrite.lockState(dir, "café").map(_._1) === Some("lockL"))
    assert(!new java.io.File(locks, "caf%E9.lock").exists(),
      "legacy file should be renamed to canonical on first lookup")
    assert(Files.exists(WorkQueueClaimWrite.lockFile(dir, "café")))
    // the live legacy claim must REJECT a renew under the wrong lockID and
    // accept one under its own (mutual exclusion preserved across upgrade)
    assert(!WorkQueueClaimWrite.renew(dir, "café", "other", "w2", 60000L))
    assert(WorkQueueClaimWrite.renew(dir, "café", "lockL", "instL", 60000L))
  }

  test("legacy+canonical lock twins reconcile by later lease expiry, not format") {
    def setup(legacyContent: String, canonContent: String): String = {
      val dir = Files.createTempDirectory("graft-locktwin").toString
      val locks = new java.io.File(dir, "locks"); locks.mkdirs()
      Files.write(new java.io.File(locks, "caf%E9.lock").toPath,
        legacyContent.getBytes(StandardCharsets.UTF_8))
      Files.write(WorkQueueClaimWrite.lockFile(dir, "café"),
        canonContent.getBytes(StandardCharsets.UTF_8))
      dir
    }
    val far = System.currentTimeMillis() + 3600000L
    // legacy holds the LATER-expiring (here: non-expiring) claim → it wins
    val d1 = setup("lockOld,instOld", s"lockNew,instNew,$far")
    assert(WorkQueueSource.renormalizeEscaping(d1) === 1)
    assert(WorkQueueClaimWrite.lockState(d1, "café").map(_._1) === Some("lockOld"))
    // canonical holds the later expiry → legacy twin dropped
    val d2 = setup(s"lockOld,instOld,${far - 60000L}", s"lockNew,instNew,$far")
    assert(WorkQueueSource.renormalizeEscaping(d2) === 1)
    assert(WorkQueueClaimWrite.lockState(d2, "café").map(_._1) === Some("lockNew"))
    // same through the auto-migrating lookup path (no compact run)
    val d3 = setup("lockOld,instOld", s"lockNew,instNew,$far")
    assert(WorkQueueClaimWrite.lockState(d3, "café").map(_._1) === Some("lockOld"))
  }
}
