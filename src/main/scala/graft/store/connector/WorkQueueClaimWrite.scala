package graft.store.connector

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** Conditional-claim write path for [[WorkQueueSource]] (SURVEY §2.9).
  *
  * The reference's claim protocol is write-then-read-verify with a race
  * window: `lockItem` sets `lockID` unconditionally and `verifyItem` sleeps
  * then re-reads to see who actually won (`code/modifier.py:71-125`) — two
  * workers can both believe they hold the lock between the write and the
  * verify. DynamoDB has the fix (a `ConditionExpression`) but the reference
  * doesn't use it; this connector supplies exactly that: a claim row is
  * accepted IFF the item's current lock matches the row's expectation —
  * atomically, no verify round-trip.
  *
  * A claim row is `(itemID, lockID, instanceID, expectedLockID[, leaseMillis])`:
  *  - `expectedLockID` null → fresh claim: atomic lock-file create
  *    (`Files.createFile` — the filesystem guarantees exactly one concurrent
  *    creator wins). If the lock file already exists but its lease has
  *    EXPIRED, the fresh claim takes it over through the same exclusive
  *    `FileChannel` CAS used for re-claims (expiry re-checked under the OS
  *    lock, so two takeover attempts serialize and one wins).
  *  - `expectedLockID` set → re-claim/renew: exclusive `FileChannel` lock,
  *    compare stored lockID, swap only on match. A holder renewing with
  *    `expectedLockID = its own lockID` extends the lease — the liveness
  *    protocol: workers renew inside their budget loop
  *    ([[graft.exec.ScriptRunner]] wall-time semantics,
  *    `/root/reference/code/timeKeeper.py:61-73`), and a crashed holder's
  *    lock becomes re-claimable one lease after its last renewal instead of
  *    wedging until a manual `reset` (the liveness gap the reference's
  *    locked items hit, `code/manager.py:465-549`).
  *  - `leaseMillis` null/absent/≤0 → a non-expiring lock (prior behavior).
  *
  * Outcomes are per-row data, not exceptions (a rejected claim is the
  * protocol working): each task's accepted/rejected lists travel in its
  * [[WriterCommitMessage]] and the driver materializes them under
  * `<path>/_claims/<queryId>.csv` — read back with
  * [[WorkQueueSource.claimResults]]. `BatchWrite.abort` releases the locks
  * the failed query did acquire.
  */
class WorkQueueClaimWrite(path: String, schema: StructType, queryId: String)
    extends WriteBuilder with Write with BatchWrite {

  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def description(): String = s"WorkQueueClaimWrite(path=$path)"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ClaimWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val results = messages.collect { case m: ClaimCommitMessage => m }
    val dir = Paths.get(path, "_claims")
    Files.createDirectories(dir)
    // JSON lines, not bare CSV: ids and lock tokens may contain commas,
    // quotes or newlines and must round-trip claimResults exactly
    def j(s: String): String =
      if (s == null) "null"
      else "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val lines = results.flatMap { m =>
      m.accepted.map { case (id, lock) =>
        s"""{"itemID": ${j(id)}, "status": "accepted", "lockID": ${j(lock)}}"""
      } ++ m.rejected.map { case (id, cur) =>
        s"""{"itemID": ${j(id)}, "status": "rejected", "lockID": ${j(cur)}}"""
      }
    }
    Files.write(dir.resolve(s"$queryId.json"),
      lines.sorted.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.iterator
      .collect { case m: ClaimCommitMessage => m.accepted }
      .flatten
      .foreach { case (id, _) =>
        Files.deleteIfExists(WorkQueueClaimWrite.lockFile(path, id))
      }
}

object WorkQueueClaimWrite {
  /** Claim-request schema accepted by the write path. `leaseMillis` is
    * optional (a write without the column acquires non-expiring locks).
    */
  val schema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("itemID",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("lockID",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("instanceID",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("expectedLockID",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("leaseMillis",
      org.apache.spark.sql.types.LongType)))

  /** Percent-escape for lock filenames AND lock-file field values: both
    * must survive arbitrary ids/tokens (commas, newlines, separators).
    * Escapes operate per UTF-8 BYTE (one %XX each): a per-char %XXXX escape
    * for code points past 0xFF would be ambiguous to the two-hex-digit
    * decoder and corrupt non-Latin-1 values on read-back
    * ([[WorkQueueSource.unescapePartitionValue]] reassembles the byte runs
    * and UTF-8-decodes them).
    *
    * Only ASCII letters/digits/`_-.` pass through raw. Non-ASCII letters
    * are escaped too — deliberately: filenames holding raw non-ASCII are
    * subject to filesystem Unicode normalization (macOS stores NFD), which
    * breaks the byte-equality round-trip a lock filename must guarantee
    * (the same itemID must always map to the same lock file).
    *
    * Format history (decoders accept all three): v1 escaped chars
    * 0x80–0xFF as ONE %XX each (Latin-1 bytes — the decoder's Latin-1
    * fallback recovers these); v2 passed non-ASCII letters raw (verbatim
    * passthrough still decodes); v3 (current) escapes every non-ASCII
    * code point per UTF-8 byte. `Main`'s queue-compact verb renames v1/v2
    * lock files to the current form as its migration step, and every live
    * lock lookup auto-migrates via [[lockFileResolved]] so pre-upgrade
    * claims are never shadowed between the upgrade and that run.
    */
  private[connector] def escapeToken(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      val c = s.charAt(i)
      if (n == 1 && c < 0x80 && (c.isLetterOrDigit || c == '_' || c == '-' || c == '.'))
        sb.append(c)
      else
        new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xFF}%02X"))
      i += n
    }
    sb.result()
  }

  /** Legacy (v1) escape form: per Java char — letters/digits raw including
    * non-ASCII, everything else one `%XX` of the code unit (which prints
    * more than two hex digits past 0xFF). Kept only to LOCATE pre-upgrade
    * lock files; never used to write.
    */
  private[connector] def escapeTokenV1(s: String): String = s.flatMap {
    case c if c.isLetterOrDigit || c == '_' || c == '-' || c == '.' => c.toString
    case c => f"%%${c.toInt}%02X"
  }

  /** Legacy Latin-1 escape form: ASCII letters/digits/`_-.` raw, every
    * other char ≤ 0xFF one `%XX` of its code unit (the form the decoder's
    * Latin-1 fallback exists for); chars past 0xFF per UTF-8 byte like the
    * current encoder. Locator-only, like v1.
    */
  private[connector] def escapeTokenL1(s: String): String = s.flatMap {
    case c if c < 0x80 && (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') =>
      c.toString
    case c if c <= 0xFF => f"%%${c.toInt}%02X"
    case c => c.toString.getBytes(StandardCharsets.UTF_8)
      .map(b => f"%%${b & 0xFF}%02X").mkString
  }

  /** Legacy (v2) escape form: identical to the current encoder except BMP
    * non-ASCII letters/digits passed through raw. Locator-only, like v1.
    */
  private[connector] def escapeTokenV2(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      val c = s.charAt(i)
      if (n == 1 && (c.isLetterOrDigit || c == '_' || c == '-' || c == '.'))
        sb.append(c)
      else
        new String(Character.toChars(cp))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .foreach(b => sb.append(f"%%${b & 0xFF}%02X"))
      i += n
    }
    sb.result()
  }

  private[connector] def lockFile(path: String, itemID: String): JPath =
    Paths.get(path, "locks", s"${escapeToken(itemID)}.lock")

  /** Lease-expiry ordering where 0 means "never expires" (ranks last). */
  private def expiryRank(e: Long): Long = if (e == 0L) Long.MaxValue else e

  /** Reconcile a legacy-named lock file with its canonical twin: if no
    * canonical lock exists the legacy file is renamed in place (the live
    * pre-upgrade claim stays a live claim under its canonical name); if
    * BOTH exist the claim with the LATER lease expiry wins (a non-expiring
    * lock ranks last; ties keep the canonical) — never unconditionally
    * drop the legacy side, it may hold the only live claim.
    */
  private[connector] def migrateLegacyLock(legacy: JPath, canonical: JPath): Unit = {
    if (!Files.exists(canonical)) {
      try Files.move(legacy, canonical, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.io.IOException => () } // raced: twin appeared or legacy vanished
    } else {
      val keepLegacy =
        try {
          val l = parseLock(new String(Files.readAllBytes(legacy), StandardCharsets.UTF_8))
          val c = parseLock(new String(Files.readAllBytes(canonical), StandardCharsets.UTF_8))
          expiryRank(l._3) > expiryRank(c._3)
        } catch { case _: java.io.IOException => false }
      if (keepLegacy)
        casSwap(canonical, Files.readAllBytes(legacy), _ => true)
      Files.deleteIfExists(legacy)
      ()
    }
  }

  /** The canonical lock file for an item, after migrating any pre-upgrade
    * (v1/v2 escape-format) lock file to the canonical name. Without this, a
    * live legacy lock for a non-ASCII itemID would be invisible to
    * [[lockState]]/claims and a fresh CREATE_NEW on the same item would
    * succeed — mutual exclusion broken between the format upgrade and an
    * operator-run `queue-compact`. For ASCII ids all three escape forms
    * coincide and this is a pure function call (no file I/O beyond the
    * caller's own).
    */
  private[connector] def lockFileResolved(path: String, itemID: String): JPath = {
    val canonical = lockFile(path, itemID)
    val legacyStems =
      Seq(escapeTokenV2(itemID), escapeTokenV1(itemID), escapeTokenL1(itemID))
        .distinct.filterNot(_ == escapeToken(itemID))
    if (legacyStems.nonEmpty) {
      jvmLocks.computeIfAbsent(canonical.toAbsolutePath.toString,
        _ => new Object).synchronized {
        legacyStems.flatMap { st =>
          // a raw-non-ASCII (v2) stem may be unmappable under the JVM's
          // POSIX jnu.encoding — then no such file can exist here; skip it
          try Some(Paths.get(path, "locks", s"$st.lock"))
          catch { case _: java.nio.file.InvalidPathException => None }
        }.filter(Files.exists(_))
          .foreach(migrateLegacyLock(_, canonical))
      }
    }
    canonical
  }

  /** Parse lock-file content `escapedLock,escapedInstance[,expiresAt]` —
    * raw lockID, raw instanceID, expiry epoch-millis (0 = never expires;
    * pre-lease files carry two fields and parse as non-expiring).
    */
  private[connector] def parseLock(content: String): (String, String, Long) = {
    val parts = content.split(",", 3)
    val lock = WorkQueueSource.unescapePartitionValue(parts(0))
    val inst =
      if (parts.length > 1) WorkQueueSource.unescapePartitionValue(parts(1)) else ""
    val exp =
      if (parts.length > 2) try parts(2).trim.toLong catch { case _: NumberFormatException => 0L }
      else 0L
    (lock, inst, exp)
  }

  /** Observability hook a production connector needs anyway: the current
    * holder and lease expiry of an item's lock, if locked.
    */
  def lockState(path: String, itemID: String): Option[(String, String, Long)] = {
    val f = lockFileResolved(path, itemID)
    if (!Files.exists(f)) None
    else try Some(parseLock(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)))
    catch { case _: java.io.IOException => None }
  }

  /** Same-JVM serialization for [[casSwap]]: `FileChannel.lock` is a
    * PROCESS-level lock — a second thread in the same JVM contending for
    * the same file gets `OverlappingFileLockException` immediately instead
    * of blocking, which is exactly the shape of two concurrent local-mode
    * Spark tasks racing an expired-lock takeover (surfaced as a rare
    * full-suite flake in the takeover-race spec). Contenders within the
    * JVM serialize on a per-file monitor first; the OS lock then guards
    * cross-process writers. Monitors are never evicted — bounded by the
    * queue's distinct items, the same order as the lock files themselves.
    */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Under a per-file JVM monitor + exclusive OS file lock: parse the
    * current lock, and if `takeIf(current)` holds, replace it with
    * `content`. Returns `Right(())` on swap, `Left(current holder's raw
    * lockID)` otherwise.
    */
  private[connector] def casSwap(file: JPath, content: Array[Byte],
      takeIf: ((String, String, Long)) => Boolean): Either[String, Unit] =
    jvmLocks.computeIfAbsent(file.toAbsolutePath.toString,
      _ => new Object).synchronized {
    try {
      val ch = java.nio.channels.FileChannel.open(file,
        StandardOpenOption.READ, StandardOpenOption.WRITE)
      try {
        val osLock = ch.lock()
        try {
          val buf = java.nio.ByteBuffer.allocate(ch.size().toInt)
          ch.read(buf)
          val cur = parseLock(
            new String(buf.array(), 0, buf.position(), StandardCharsets.UTF_8))
          if (takeIf(cur)) {
            ch.truncate(0)
            ch.position(0)
            ch.write(java.nio.ByteBuffer.wrap(content))
            ch.force(true)
            Right(())
          } else Left(cur._1)
        } finally osLock.release()
      } finally ch.close()
    } catch {
      // raced with an abort's deleteIfExists: the lock is simply gone now;
      // report an empty holder so the caller's retry takes the fresh path
      case _: java.nio.file.NoSuchFileException => Left("")
    }
    }

  /** Lease heartbeat: CAS the item's lock in place IFF still held by
    * `lockID`, pushing expiry out another `leaseMillis` (0 → converts the
    * lock to non-expiring). Returns false when the lock was lost (expired
    * and taken over, or released) — the holder must stop working on the
    * item. This is what a long-running worker calls inside its budget loop
    * (the reference's wall-time state machine, `code/timeKeeper.py:61-73`,
    * routed survivors to `Wall_Time_Exceeded`; here liveness comes from the
    * lease instead).
    */
  def renew(path: String, itemID: String, lockID: String, instanceID: String,
      leaseMillis: Long): Boolean = {
    val expiresAt = if (leaseMillis > 0) System.currentTimeMillis() + leaseMillis else 0L
    val content = (escapeToken(lockID) + "," + escapeToken(instanceID) + "," + expiresAt)
      .getBytes(StandardCharsets.UTF_8)
    val f = lockFileResolved(path, itemID)
    Files.exists(f) && casSwap(f, content, cur => cur._1 == lockID).isRight
  }

  /** Release a lock IFF still held by `lockID` — the dispatcher's
    * budget-skip hand-back: an item that was claimed but never run
    * returns to claimable NOW instead of wedging (no lease) or waiting a
    * lease out. The holder-compare runs under the same per-file JVM
    * monitor as [[casSwap]]; the unlink itself carries the write path's
    * existing `abort` contract (a contender blocked on the old inode's
    * OS lock re-takes the fresh-claim path via casSwap's gone-file
    * fallback). Returns false when the lock is absent or held by
    * someone else.
    */
  def release(path: String, itemID: String, lockID: String): Boolean = {
    val f = lockFileResolved(path, itemID)
    if (!Files.exists(f)) return false
    jvmLocks.computeIfAbsent(f.toAbsolutePath.toString,
      _ => new Object).synchronized {
      val held =
        try parseLock(new String(Files.readAllBytes(f),
          StandardCharsets.UTF_8))._1 == lockID
        catch { case _: java.io.IOException => false }
      held && Files.deleteIfExists(f)
    }
  }
}

final case class ClaimCommitMessage(
    accepted: Seq[(String, String)],
    rejected: Seq[(String, String)]) extends WriterCommitMessage

class ClaimWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ClaimWriter(path, schema)
}

/** Per-task claim executor. Claims take effect at `write` time (they are
  * lock acquisitions, not buffered rows); `commit` just reports outcomes and
  * `abort` releases this task's acquisitions.
  */
class ClaimWriter(path: String, schema: StructType) extends DataWriter[InternalRow] {

  private val idxItem = schema.fieldIndex("itemID")
  private val idxLock = schema.fieldIndex("lockID")
  private val idxInstance =
    if (schema.fieldNames.contains("instanceID")) schema.fieldIndex("instanceID") else -1
  private val idxExpected =
    if (schema.fieldNames.contains("expectedLockID")) schema.fieldIndex("expectedLockID") else -1
  private val idxLease =
    if (schema.fieldNames.contains("leaseMillis")) schema.fieldIndex("leaseMillis") else -1

  private val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  private val rejected = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  Files.createDirectories(Paths.get(path, "locks"))

  private def str(row: InternalRow, i: Int): String =
    if (i < 0 || row.isNullAt(i)) null else row.getUTF8String(i).toString

  override def write(row: InternalRow): Unit = {
    val itemID = str(row, idxItem)
    val lockID = str(row, idxLock)
    val instanceID = Option(str(row, idxInstance)).getOrElse("")
    val expected = str(row, idxExpected)
    val lease = if (idxLease < 0 || row.isNullAt(idxLease)) 0L else row.getLong(idxLease)
    val expiresAt = if (lease > 0) System.currentTimeMillis() + lease else 0L
    // resolved, not raw: migrates any pre-upgrade (v1/v2-named) lock first,
    // so a live legacy claim rejects this CREATE_NEW instead of being shadowed
    val file = WorkQueueClaimWrite.lockFileResolved(path, itemID)
    // fields are percent-escaped so the comma separator is unambiguous for
    // any lock token (and the compare below works on escaped forms)
    val content = (WorkQueueClaimWrite.escapeToken(lockID) + "," +
      WorkQueueClaimWrite.escapeToken(instanceID) + "," + expiresAt)
      .getBytes(StandardCharsets.UTF_8)
    if (expected == null) {
      // fresh claim: exactly one concurrent creator wins (atomic create)
      try {
        val ch = java.nio.channels.FileChannel.open(file,
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        try { ch.write(java.nio.ByteBuffer.wrap(content)); ch.force(true) }
        finally ch.close()
        accepted += itemID -> lockID
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // held — but the holder may be dead: an EXPIRED lease is taken
          // over through the same serialized CAS as re-claims (expiry
          // re-checked under the OS lock, so concurrent takeovers serialize
          // and exactly one wins)
          casSwap(file, content, cur => cur._3 > 0 && System.currentTimeMillis() >= cur._3)
            match {
            case Right(()) => accepted += itemID -> lockID
            case Left(holder) => rejected += itemID -> holder
          }
      }
    } else {
      // conditional swap: exclusive OS lock, compare, replace only on match.
      // A holder renewing with its own lockID lands here: the swap rewrites
      // the expiry, extending the lease.
      if (!Files.exists(file)) rejected += itemID -> ""
      else casSwap(file, content, cur => cur._1 == expected) match {
        case Right(()) => accepted += itemID -> lockID
        case Left(holder) => rejected += itemID -> holder
      }
    }
  }

  private def casSwap(file: JPath, content: Array[Byte],
      takeIf: ((String, String, Long)) => Boolean): Either[String, Unit] =
    WorkQueueClaimWrite.casSwap(file, content, takeIf)

  override def commit(): WriterCommitMessage =
    ClaimCommitMessage(accepted.toSeq, rejected.toSeq)

  override def abort(): Unit =
    accepted.foreach { case (id, _) =>
      Files.deleteIfExists(WorkQueueClaimWrite.lockFile(path, id))
    }

  override def close(): Unit = ()
}
