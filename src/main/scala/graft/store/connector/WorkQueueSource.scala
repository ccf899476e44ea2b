package graft.store.connector

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 work-queue connector (SURVEY §4: "a custom work-queue
  * source with claim semantics — DataSource V2 with SupportsPushDownFilters
  * covers it without a strategy"). This is the slot a DynamoDB connector
  * plugs into (`spark.read.format(...)`): here backed by state-partitioned
  * CSV directories (`path/itemState=<s>/` part files) so the pushdown
  * mechanics —
  * the moral equivalent of choosing the reference's `ItemStateIndex` GSI
  * (`code/client.py:74-135`) — are real and testable:
  *
  *  - `SupportsPushDownFilters`: an `itemState = 'x'` equality prunes whole
  *    state directories before any file is opened (partition pruning at the
  *    source, like a GSI key-condition).
  *  - `SupportsPushDownRequiredColumns`: only requested columns are parsed
  *    (the reference's `ProjectionExpression`, P1).
  *
  * Usage: `spark.read.format("graft.store.connector.WorkQueueSource")
  * .option("path", dir).load()`.
  */
class WorkQueueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WorkQueueSource.schema

  // writes carry the claim-request schema (WorkQueueClaimWrite.schema), not
  // the monitoring read schema — accept the query's own schema so AppendData
  // resolves; reads without a user schema still get inferSchema's shape
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WorkQueueTable(properties.get("path"), schema)
}

object WorkQueueSource {
  /** Flat monitoring subset of the item schema (the queue-poll projection). */
  val schema: StructType = StructType(Seq(
    StructField("itemID", StringType),
    StructField("taskID", StringType),
    StructField("itemState", StringType),
    StructField("logLength", LongType),
    StructField("nestedTaskCount", LongType)))

  /** Overwrite the connector's layout with a DataFrame (schema above),
    * THROUGH the connector's own DSv2 write path ([[WorkQueueItemWrite]]) —
    * the sink half of the source/sink pair. Overwrite semantics: existing
    * state directories are cleared first (driver-side, before the job).
    * itemState must not be null; ids/values with separators round-trip via
    * RFC-4180 quoting.
    */
  def write(df: org.apache.spark.sql.DataFrame, path: String,
      format: String = "csv"): Unit = {
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("itemState="))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(d)
      }
    append(df, path, format)
  }

  /** Append rows into the connector's layout through the DSv2 write path.
    * `format`: `csv` (default) or `parquet` — both readable from one queue
    * dir, so a layout can migrate formats file by file.
    */
  def append(df: org.apache.spark.sql.DataFrame, path: String,
      format: String = "csv"): Unit =
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .write.format("graft.store.connector.WorkQueueSource")
      .option("path", path).option("format", format).mode("append").save()

  /** Claim outcomes written by the conditional-claim write path
    * ([[WorkQueueClaimWrite]]): one row per claim request —
    * `(itemID, status ∈ {accepted, rejected}, lockID)` where `lockID` is the
    * winning lock for accepts and the CURRENT holder for rejects (the
    * reference's `verifyItem` return, but race-free).
    */
  def claimResults(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    spark.read
      .schema("itemID STRING, status STRING, lockID STRING")
      .json(new java.io.File(path, "_claims").getAbsolutePath)
      .select("itemID", "status", "lockID")

  /** Undo percent-escaping of partition directory values — both Spark's
    * own (ASCII specials, one %XX per char) and
    * [[WorkQueueClaimWrite.escapeToken]]'s (one %XX per UTF-8 byte): runs
    * of consecutive %XX groups collect into a byte buffer and decode as
    * UTF-8, so multi-byte escapes reassemble into their original code
    * points. A '%' not followed by two hex digits passes through verbatim.
    *
    * A byte run that is NOT valid UTF-8 decodes as Latin-1 instead: the
    * legacy (v1) escape format wrote chars 0x80–0xFF as one %XX each, and
    * those lone high bytes would otherwise collapse to U+FFFD — the
    * fallback keeps pre-existing queue dirs and lock files readable. (New
    * writes always escape whole UTF-8 sequences, which the strict decode
    * accepts, so the fallback never fires on current-format data.)
    */
  def unescapePartitionValue(s: String): String = {
    def hex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    val out = new StringBuilder
    val bytes = new java.io.ByteArrayOutputStream
    def flush(): Unit = if (bytes.size > 0) {
      val arr = bytes.toByteArray
      val strict = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try out.append(strict.decode(java.nio.ByteBuffer.wrap(arr)).toString)
      catch {
        case _: java.nio.charset.CharacterCodingException =>
          out.append(new String(arr,
            java.nio.charset.StandardCharsets.ISO_8859_1))
      }
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length && hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { flush(); out.append(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** One-shot migration of legacy escape forms to the current
    * [[WorkQueueClaimWrite.escapeToken]] encoding: lock filenames and
    * `itemState=` directory names are decoded (the decoder accepts all
    * historical forms) and re-encoded; entries whose canonical name differs
    * are renamed in place. Lock CONTENT needs no rewrite — it is decoded on
    * every read. If both a legacy and a current-format lock file exist for
    * the same itemID, the claim with the later lease expiry wins (a
    * non-expiring lock ranks last; ties keep the canonical). Returns the
    * number of renamed/dropped entries. Run via `Main queue-compact`.
    */
  def renormalizeEscaping(path: String): Int = {
    var changed = 0
    def canonicalOf(stem: String): String =
      WorkQueueClaimWrite.escapeToken(unescapePartitionValue(stem))
    val locks = new java.io.File(path, "locks")
    for (f <- Option(locks.listFiles()).getOrElse(Array.empty)
         if f.isFile && f.getName.endsWith(".lock")) {
      val stem = f.getName.stripSuffix(".lock")
      val canonical = canonicalOf(stem)
      if (canonical != stem) {
        // reconcile, don't drop: if a canonical twin exists the claim with
        // the LATER lease expiry survives (the legacy file may hold the only
        // live pre-upgrade claim; discarding it silently would break mutual
        // exclusion for its holder)
        val dest = new java.io.File(locks, canonical + ".lock")
        WorkQueueClaimWrite.migrateLegacyLock(f.toPath, dest.toPath)
        require(!f.exists(), s"failed to migrate ${f.getPath}")
        changed += 1
      }
    }
    for (d <- Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
         if d.isDirectory && d.getName.startsWith("itemState=")) {
      val stem = d.getName.stripPrefix("itemState=")
      val canonical = canonicalOf(stem)
      if (canonical != stem) {
        val dest = new java.io.File(path, "itemState=" + canonical)
        if (dest.exists()) {
          // both escape forms of the same state exist: MERGE the legacy
          // dir's data files into the canonical dir (names are unique —
          // they carry query/task/attempt ids), never drop rows
          for (f <- Option(d.listFiles()).getOrElse(Array.empty))
            require(f.renameTo(new java.io.File(dest, f.getName)),
              s"failed to merge ${f.getPath} into ${dest.getPath}")
          require(d.delete(), s"failed to drop emptied ${d.getPath}")
        } else require(d.renameTo(dest),
          s"failed to rename ${d.getPath} to its canonical escape form")
        changed += 1
      }
    }
    changed
  }
}

/** Parquet shape of a queue data file (the `format=parquet` write option):
  * same stored fields and the same CSV value semantics (null strings
  * round-trip as ""), plus what the line layout cannot give — projection
  * pushdown into the file and a metadata-only row count for the count
  * scan.
  */
object WorkQueueParquet {
  import org.apache.parquet.schema.{MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
  import org.apache.parquet.schema.LogicalTypeAnnotation.stringType

  val FileSchema: MessageType = Types.buildMessage()
    .required(PrimitiveTypeName.BINARY).as(stringType()).named("itemID")
    .required(PrimitiveTypeName.BINARY).as(stringType()).named("taskID")
    .optional(PrimitiveTypeName.INT64).named("logLength")
    .optional(PrimitiveTypeName.INT64).named("nestedTaskCount")
    .named("queue_item")

  /** Projection of [[FileSchema]] to the named STORED fields — what the
    * reader hands parquet-mr so unread columns never leave the file.
    */
  def projection(fields: Seq[String]): MessageType = {
    val b = Types.buildMessage()
    fields.foreach {
      case "itemID" =>
        b.required(PrimitiveTypeName.BINARY).as(stringType()).named("itemID"); ()
      case "taskID" =>
        b.required(PrimitiveTypeName.BINARY).as(stringType()).named("taskID"); ()
      case "logLength" => b.optional(PrimitiveTypeName.INT64).named("logLength"); ()
      case "nestedTaskCount" =>
        b.optional(PrimitiveTypeName.INT64).named("nestedTaskCount"); ()
      case other => throw new IllegalArgumentException(s"not a stored field: $other")
    }
    b.named("queue_item")
  }

  /** Open a projected record reader over one queue parquet file. */
  def open(file: String, fields: Seq[String])
      : org.apache.parquet.hadoop.ParquetReader[org.apache.parquet.example.data.Group] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      projection(fields).toString)
    org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(file))
      .withConf(conf)
      .build()
  }

  /** Footer-only row count — the count scan never touches a data page. */
  def rowCount(file: String): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }
}

class WorkQueueTable(path: String, tableSchema: StructType = WorkQueueSource.schema)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"workqueue($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ)
  // itemState/itemID read OPTIONS are the STREAMING pushdown surface:
  // Spark's V2ScanRelationPushDown only rewrites batch relations (checked
  // against 4.1 — MicroBatchExecution builds its scan without it), so a
  // streaming reader declares its key conditions up front and gets the
  // same source-side pruning the batch optimizer derives from filters
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WorkQueueScanBuilder(path,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      Option(options.get("itemState")),
      Option(options.get("itemID")))
  // writes are schema-dispatched: a claim-shaped frame (has lockID) runs
  // the conditional-claim protocol; an item-shaped frame (has itemState)
  // appends queue rows — the connector is a full source/sink pair, the
  // import slot of the reference's batch writer (`code/manager.py:278-358`)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val fields = info.schema().fieldNames.toSet
    if (fields.contains("lockID"))
      new WorkQueueClaimWrite(path, info.schema(), info.queryId())
    else if (fields.contains("itemID") && fields.contains("itemState"))
      new WorkQueueItemWrite(path, info.schema(), info.queryId(),
        info.options().getOrDefault("format", "csv"))
    else throw new IllegalArgumentException(
      s"workqueue write needs a claim (lockID...) or item (itemID, itemState...) schema, got: ${fields.mkString(",")}")
  }
}

class WorkQueueScanBuilder(path: String,
    maxFilesPerTrigger: Option[Int] = None,
    presetState: Option[String] = None,
    presetId: Option[String] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var stateFilter: Option[String] = presetState
  private var idFilter: Option[String] = presetId
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WorkQueueSource.schema
  private var countByState = false
  private var limit: Option[Int] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept exactly ONE itemState equality; a second (possibly conflicting)
    // one must stay post-scan or Spark would trust us to have enforced both
    val firstEq = filters.collectFirst { case f @ EqualTo("itemState", _: String) => f }
    stateFilter = firstEq.map(_.value.asInstanceOf[String]).orElse(presetState)
    // an itemID equality is the point-lookup key (S4/S5, the reference's
    // getCurrentState/getLockID — `code/client.py:139-184`): enforced in the
    // reader during parsing, so LIMIT can then also push beneath it
    val idEq = filters.collectFirst { case f @ EqualTo("itemID", _: String) => f }
    idFilter = idEq.map(_.value.asInstanceOf[String]).orElse(presetId)
    // IsNotNull(c) is implied by a pushed EqualTo(c, nonNullLiteral) — the
    // equality enforcement subsumes it, and leaving it residual would block
    // LIMIT pushdown (Spark only pushes a limit through a fully-pushed
    // filter set)
    val eqCols = (firstEq.toSeq ++ idEq.toSeq)
      .map(_.attribute).toSet
    val impliedNotNull = filters.collect {
      case f @ org.apache.spark.sql.sources.IsNotNull(c) if eqCols(c) => f
    }
    pushed = firstEq.toArray ++ idEq.toArray ++ impliedNotNull
    filters.filterNot(pushed.contains)
  }

  /** Point-lookup LIMIT pushdown (S4/S5): with the key equalities pushed,
    * `pointLookup(...).head()` plans `Limit → Scan` and the limit lands
    * here; each partition reader stops after `limit` matching rows instead
    * of draining its file — a real GSI point read touches one page, and the
    * local analog is "stop at the first hit". `isPartiallyPushed` stays
    * true (the default): readers bound rows PER PARTITION, Spark keeps the
    * cross-partition global limit — and its incremental take (scan 1
    * partition, then grow) means a satisfied point read opens one file.
    */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    true
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The monitor's poll — `GROUP BY itemState` + `COUNT(*)` — is answered
    * from the source without materializing a single item row: one line-count
    * per state directory (the DynamoDB-connector analog is a per-GSI-key
    * `Select COUNT` query, which DynamoDB serves from the index without
    * returning items). COMPLETE pushdown: the scan emits exactly one
    * pre-aggregated row per state, so Spark plans no aggregate at all over
    * the queue — at any queue size the monitor moves `n_states` rows.
    */
  private def canPushCount(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.length == 1 && agg.aggregateExpressions.length == 1 &&
      (agg.groupByExpressions()(0) match {
        case f: org.apache.spark.sql.connector.expressions.NamedReference =>
          f.fieldNames.sameElements(Array("itemState"))
        case _ => false
      }) &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    canPushCount(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    countByState = canPushCount(agg)
    countByState
  }

  override def build(): Scan =
    if (countByState) new WorkQueueCountScan(path, stateFilter, idFilter)
    else new WorkQueueScan(path, stateFilter, idFilter, limit, required,
      maxFilesPerTrigger)
}

/** Complete-pushdown scan for `COUNT(*) GROUP BY itemState`: one input
  * partition per (pruned) state directory, each emitting a single
  * `(itemState, count)` row — no row materialization, no Spark-side
  * aggregate. Without an `itemID` filter the count is a raw line count (no
  * CSV parsing at all); with one, each line's key field is parsed and only
  * matches are counted — the reference's per-item state probe is a point
  * read (`code/client.py:139-159`), and the connector answers it from the
  * index side without shipping rows. A state whose matching count is zero
  * emits NO row (a group-by never invents empty groups).
  */
class WorkQueueCountScan(path: String, state: Option[String],
    id: Option[String] = None) extends Scan with Batch {

  // pushed-aggregate contract: group-by columns first, then aggregate columns
  override def readSchema(): StructType = StructType(Seq(
    StructField("itemState", StringType),
    StructField("count(*)", LongType, nullable = false)))

  override def toBatch: Batch = this
  override def description(): String =
    s"WorkQueueCountScan(path=$path, pushedState=$state, pushedId=$id, " +
      "pushedAggregation=count(*) group by itemState)"

  override def planInputPartitions(): Array[InputPartition] = {
    val base = new java.io.File(path)
    Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("itemState="))
      .filter(f => state.forall(s =>
        WorkQueueSource.unescapePartitionValue(f.getName.stripPrefix("itemState=")) == s))
      .map(dir => WorkQueueStatePartition(dir.getAbsolutePath,
        WorkQueueSource.unescapePartitionValue(dir.getName.stripPrefix("itemState=")))
        : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val idF = id
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[WorkQueueStatePartition]
        new PartitionReader[InternalRow] {
          private var emitted = false
          private lazy val n: Long =
            Option(new java.io.File(p.dir).listFiles()).getOrElse(Array.empty)
              .filter(f => f.isFile &&
                (f.getName.endsWith(".csv") || f.getName.endsWith(".parquet")))
              .map { f =>
                if (f.getName.endsWith(".parquet")) {
                  idF match {
                    // footer metadata only — the parquet count never reads
                    // a data page (the CSV layout must scan every line)
                    case None => WorkQueueParquet.rowCount(f.getAbsolutePath)
                    case Some(wanted) =>
                      // key probe reads exactly one projected column
                      val r = WorkQueueParquet.open(f.getAbsolutePath, Seq("itemID"))
                      try {
                        var c = 0L
                        var g = r.read()
                        while (g != null) {
                          if (g.getFieldRepetitionCount("itemID") > 0 &&
                            g.getString("itemID", 0) == wanted) c += 1
                          g = r.read()
                        }
                        c
                      } finally r.close()
                  }
                } else {
                  val src = scala.io.Source.fromFile(f)(scala.io.Codec.UTF8)
                  try {
                    idF match {
                      case None => src.getLines().length.toLong
                      case Some(wanted) => src.getLines().count(line =>
                        WorkQueueCsv.split(line).headOption.contains(wanted)).toLong
                    }
                  } finally src.close()
                }
              }.sum
          override def next(): Boolean =
            if (emitted || n == 0L) false
            else {
              emitted = true
              true
            }
          override def get(): InternalRow =
            InternalRow.fromSeq(Seq(UTF8String.fromString(p.state), n))
          override def close(): Unit = ()
        }
      }
    }
  }
}

final case class WorkQueueStatePartition(dir: String, state: String) extends InputPartition

/** Minimal RFC-4180 field splitter: handles quoted fields and doubled
  * quotes; enough for round-tripping Spark's default CSV writer output.
  * Shared between the row reader and the count scan's key probe.
  */
object WorkQueueCsv {
  /** Writer-side field encoding: RFC-4180 quoting for separators/quotes;
    * newlines are rejected (the layout is line-based — see
    * [[ItemWriter]]). `split(fields.map(quote).mkString(","))` returns
    * `fields` for any newline-free input (property-checked).
    */
  def quote(s: String): String =
    if (s == null) ""
    else {
      require(!s.exists(c => c == '\n' || c == '\r'),
        s"queue row values must not embed newlines: ${s.take(40)}...")
      if (s.exists(c => c == ',' || c == '"'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }

  def split(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuotes = false
        } else cur.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    out += cur.result()
    out.toArray
  }
}

class WorkQueueScan(path: String, state: Option[String], id: Option[String],
    limit: Option[Int], required: StructType,
    maxFilesPerTrigger: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // the same pushed state/id/columns ride into the streaming read — the
  // dispatcher's plan is pruned exactly like the batch plan's
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WorkQueueMicroBatchStream(path, state, id, required, maxFilesPerTrigger)
  override def description(): String =
    s"WorkQueueScan(path=$path, pushedState=$state, pushedId=$id, " +
      s"pushedLimit=$limit, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val base = new java.io.File(path)
    // state equality prunes directories HERE — unselected states are never
    // listed, the GSI-pushdown analog
    val stateDirs = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("itemState="))
      // compare against the UNESCAPED directory value, so pushed filters on
      // states containing escaped chars still prune correctly
      .filter(f => state.forall(s =>
        WorkQueueSource.unescapePartitionValue(f.getName.stripPrefix("itemState=")) == s))
    stateDirs.flatMap { dir =>
      val st = WorkQueueSource.unescapePartitionValue(dir.getName.stripPrefix("itemState="))
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile &&
          (f.getName.endsWith(".csv") || f.getName.endsWith(".parquet")))
        .map(f => WorkQueuePartition(f.getAbsolutePath, st): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val req = required
    val idF = id
    val lim = limit
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[WorkQueuePartition]
        if (p.file.endsWith(".parquet"))
          new WorkQueueParquetReader(p, req, idF, lim)
        else new WorkQueueReader(p, req, idF, lim)
      }
    }
  }
}

final case class WorkQueuePartition(file: String, state: String) extends InputPartition

/** Line-by-line CSV reader emitting only the pruned columns. The data files
  * hold (itemID, taskID, logLength, nestedTaskCount); itemState comes from
  * the directory name (a partition value, never stored). Fields are parsed
  * with quote handling (Spark's CSV writer quotes values containing
  * delimiter/quote chars) and empty strings decode as null.
  */
class WorkQueueReader(partition: WorkQueuePartition, required: StructType,
    idFilter: Option[String] = None, limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  private val lines =
    scala.io.Source.fromFile(partition.file)(scala.io.Codec.UTF8) // writer emits UTF-8
  private val it = lines.getLines()
  private var current: InternalRow = _
  private var emitted = 0

  private[connector] def splitCsv(line: String): Array[String] =
    WorkQueueCsv.split(line)

  private def longOrNull(s: String): java.lang.Long =
    if (s.isEmpty) null else java.lang.Long.valueOf(s.toLong)

  // pushed itemID equality is enforced HERE (non-matching rows never
  // materialize), and a pushed limit stops the reader at its per-partition
  // bound — a satisfied point read parses up to the hit and no further
  @annotation.tailrec
  override final def next(): Boolean =
    if (limit.exists(emitted >= _) || !it.hasNext) false
    else {
      val parts = splitCsv(it.next())
      require(parts.length >= 4, s"malformed queue row in ${partition.file}: ${parts.length} fields")
      if (idFilter.exists(_ != parts(0))) next()
      else {
        val values = required.fields.map { f =>
          f.name match {
            case "itemID" => UTF8String.fromString(parts(0))
            case "taskID" => UTF8String.fromString(parts(1))
            case "itemState" => UTF8String.fromString(partition.state)
            case "logLength" => longOrNull(parts(2))
            case "nestedTaskCount" => longOrNull(parts(3))
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
        }
        current = InternalRow.fromSeq(values.toSeq)
        emitted += 1
        true
      }
    }

  override def get(): InternalRow = current

  override def close(): Unit = lines.close()
}

/** Parquet twin of [[WorkQueueReader]]: the projection the scan pruned is
  * handed to parquet-mr, so unread columns never leave the file — the
  * pruning the CSV layout can only fake (it must parse every line whole).
  * itemState still comes from the directory; the pushed itemID equality
  * and limit are enforced while iterating, same as the CSV path.
  */
class WorkQueueParquetReader(partition: WorkQueuePartition,
    required: StructType, idFilter: Option[String] = None,
    limit: Option[Int] = None) extends PartitionReader[InternalRow] {

  // stored fields needed: the pruned columns minus the directory-valued
  // itemState, plus itemID when a pushed point filter must probe it
  private val storedNeeded = {
    val cols = required.fieldNames.filterNot(_ == "itemState").toSeq
    if (idFilter.isDefined && !cols.contains("itemID")) "itemID" +: cols
    else cols
  }
  private val reader =
    if (storedNeeded.isEmpty) WorkQueueParquet.open(partition.file, Seq("itemID"))
    else WorkQueueParquet.open(partition.file, storedNeeded)
  private var current: InternalRow = _
  private var emitted = 0

  private def strField(g: org.apache.parquet.example.data.Group,
      name: String): String =
    if (g.getFieldRepetitionCount(name) == 0) null else g.getString(name, 0)
  private def lngField(g: org.apache.parquet.example.data.Group,
      name: String): java.lang.Long =
    if (g.getFieldRepetitionCount(name) == 0) null
    else java.lang.Long.valueOf(g.getLong(name, 0))

  @annotation.tailrec
  override final def next(): Boolean =
    if (limit.exists(emitted >= _)) false
    else {
      val g = reader.read()
      if (g == null) false
      else if (idFilter.exists(_ != strField(g, "itemID"))) next()
      else {
        val values = required.fields.map { f =>
          f.name match {
            case "itemID" => UTF8String.fromString(strField(g, "itemID"))
            case "taskID" => UTF8String.fromString(strField(g, "taskID"))
            case "itemState" => UTF8String.fromString(partition.state)
            case "logLength" => lngField(g, "logLength")
            case "nestedTaskCount" => lngField(g, "nestedTaskCount")
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
        }
        current = InternalRow.fromSeq(values.toSeq)
        emitted += 1
        true
      }
    }

  override def get(): InternalRow = current

  override def close(): Unit = reader.close()
}
