package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the LLM-data-pipeline surface: media as
  * opaque `binary` payloads + typed metadata, with decode / feature-extract
  * / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, batch shape, partition-wise
  * iteration (the Scala analog of `mapInPandas` batches), pushdown-friendly
  * metadata columns. The *decoder itself* is a clearly marked deterministic
  * STUB (`fakeDecode`): the actual image/audio libraries are not in this
  * environment, so it derives features arithmetically from the bytes. Swap
  * `fakeDecode` for a JNI/ffmpeg/ImageIO call and nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Int)
  final case class MediaRow(mediaId: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      mediaId: Long, kind: String, byteLen: Long, checksum: Long, meanByte: Double)

  /** The pluggable codec boundary: everything payload-specific lives behind
    * these three row-level functions, so a production deployment slots in a
    * JNI/ffmpeg/ImageIO-backed implementation WITHOUT touching the pipeline
    * shape (schema, partition-wise batching, explode shapes) or the gates.
    * Implementations must be Serializable — they ship to executors inside
    * task closures and should lazily open any native context per partition.
    *
    * [[StubCodec]] is the sandbox implementation (no codec libraries in
    * this environment): deterministic byte arithmetic, bit-identical to the
    * expression forms the hash-checked gates run (spec-asserted), so specs
    * exercise the exact swap a real deployment performs.
    */
  trait MediaCodec extends Serializable {
    /** Decode a payload into scalar features: (checksum, mean sample). */
    def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double)
    /** Downscale an image payload by `factor`. */
    def resizeImage(payload: Array[Byte], factor: Int): Array[Byte]
    /** Extract sampled frames from a video payload. */
    def sampleFrames(payload: Array[Byte], blockSize: Int, stride: Int): Seq[Array[Byte]]
  }

  /** Sandbox codec: the documented arithmetic stubs, packaged behind the
    * production interface. Every method mirrors the expression-form
    * operator below it byte-for-byte.
    */
  object StubCodec extends MediaCodec {
    override def decodeFeatures(kind: String, payload: Array[Byte]): (Long, Double) =
      fakeDecode(payload)
    override def resizeImage(payload: Array[Byte], factor: Int): Array[Byte] = {
      // bytes at positions 0, factor, 2*factor, ... (the expression form's
      // 1-based substring positions 1, 1+factor, ...)
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = payload(i * factor); i += 1 }
      out
    }
    override def sampleFrames(payload: Array[Byte], blockSize: Int,
        stride: Int): Seq[Array[Byte]] = {
      val nBlocks = payload.length / blockSize
      val starts = 0 to math.max(nBlocks - 1, 0) by stride
      starts.map { b =>
        val from = b * blockSize
        java.util.Arrays.copyOfRange(payload, math.min(from, payload.length),
          math.min(from + blockSize, payload.length))
      }
    }
  }

  /** Derive a media table from `documents` (text bytes as stand-in payloads;
    * kind/meta synthesized deterministically from doc_id).
    */
  def deriveMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sampleRate"),
        (col("doc_id") % 10000).cast("int").as("durationMs")).as("meta"))

  /** STUB decoder — replace with a real codec. Deterministic features from
    * raw bytes: length, polynomial checksum, mean byte value.
    */
  def fakeDecode(payload: Array[Byte]): (Long, Double) = {
    var acc = 0L
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      acc = (acc * 31 + b) % 2147483647L
      sum += b
      i += 1
    }
    (acc, if (payload.length == 0) 0.0 else sum.toDouble / payload.length)
  }

  /** Feature extraction over partition-wise batches — the Scala shape of a
    * `mapInPandas` decode stage: one iterator per partition, library init
    * amortized per partition (where a real decoder would open its context).
    * The codec defaults to the sandbox stub; the gate result is unchanged
    * by construction for any codec that computes the same features.
    */
  def extractFeatures(media: DataFrame,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("mediaId"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real decoder: initialize codec context here, once per partition
        it.map { case (id, kind, payload) =>
          val (checksum, meanByte) = codec.decodeFeatures(kind, payload)
          MediaFeatures(id, kind, payload.length.toLong, checksum, meanByte)
        }
      }
  }

  /** STUB resize for image payloads: nearest-neighbor downsample — keep
    * every `factor`-th byte and scale the metadata dims accordingly. Real
    * implementation swaps the byte-slice for an image scaler; the pipeline
    * shape (payload in → smaller payload + adjusted meta out, no shuffle)
    * is what's exercised.
    */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    val nBytes = octet_length(col("payload"))
    media.withColumn("payload",
        when(col("kind") === "image",
          // bytes at positions 1, 1+factor, 1+2*factor, ...
          aggregate(
            transform(sequence(lit(1), greatest(nBytes, lit(1)), lit(factor)),
              i => substring(col("payload"), i, lit(1))),
            lit("").cast("binary"),
            (acc, b) => concat(acc, b)))
          .otherwise(col("payload")))
      .withColumn("meta", resizedMeta(factor))
  }

  private def resizedMeta(factor: Int) =
    when(col("kind") === "image",
      struct(
        greatest(col("meta.width") / factor, lit(1)).cast("int").as("width"),
        greatest(col("meta.height") / factor, lit(1)).cast("int").as("height"),
        col("meta.sampleRate"),
        col("meta.durationMs")))
      .otherwise(col("meta"))

  /** Codec-backed resize: identical pipeline shape to [[resize]] (payload
    * in → smaller payload + scaled meta out, no shuffle), with the byte
    * transform behind [[MediaCodec]]. With [[StubCodec]] the output is
    * bit-identical to the expression form (spec-asserted) — the swap a real
    * image scaler performs.
    */
  def resizeWith(media: DataFrame, factor: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    val rs = udf((p: Array[Byte]) => codec.resizeImage(p, factor))
    media.withColumn("payload",
        when(col("kind") === "image", rs(col("payload"))).otherwise(col("payload")))
      .withColumn("meta", resizedMeta(factor))
  }

  /** Frame sampling for video payloads: take every `stride`-th byte-block as
    * a "frame" (stub for keyframe extraction); emits (mediaId, frameIdx,
    * frame) rows — the exploding shape a real frame sampler produces.
    */
  def sampleFrames(media: DataFrame, blockSize: Int = 64, stride: Int = 4): DataFrame = {
    val nBlocks = floor(octet_length(col("payload")) / blockSize).cast("int")
    media.filter(col("kind") === "video")
      .select(col("mediaId"),
        posexplode(transform(sequence(lit(0), greatest(nBlocks - 1, lit(0)), lit(stride)),
          i => substring(col("payload"), i * blockSize + 1, lit(blockSize)))))
      .withColumnRenamed("pos", "frameIdx")
      .withColumnRenamed("col", "frame")
  }

  /** Codec-backed frame sampling: same exploding (mediaId, frameIdx, frame)
    * shape as [[sampleFrames]], frames produced by [[MediaCodec]]. With
    * [[StubCodec]] the output is bit-identical to the expression form
    * (spec-asserted) — the swap a real keyframe extractor performs.
    */
  def sampleFramesWith(media: DataFrame, blockSize: Int = 64, stride: Int = 4,
      codec: MediaCodec = StubCodec): DataFrame = {
    val fr = udf((p: Array[Byte]) => codec.sampleFrames(p, blockSize, stride))
    media.filter(col("kind") === "video")
      .select(col("mediaId"), posexplode(fr(col("payload"))))
      .withColumnRenamed("pos", "frameIdx")
      .withColumnRenamed("col", "frame")
  }

  /** The model boundary for embedding inference: called once per BATCH of
    * texts (the way a GPU model is), must return one vector per input in
    * order. Implementations ship to executors; a real deployment loads the
    * model lazily per partition (JNI/ONNX/remote endpoint) — the batching
    * plumbing in [[embedBatch]] is what stays fixed.
    */
  trait TextEmbedder extends Serializable {
    def dim: Int
    def embed(texts: Seq[String]): Seq[Array[Double]]
  }

  /** Sandbox embedder: dimension j of a text's vector is
    * `((h % 997) * (2j+3) % 997) / 997.0` with `h` the first 48 md5 bits —
    * deterministic, engine-portable integer arithmetic (the DuckDB oracle
    * reproduces it through the same hex fold), products bounded < 2^20.
    */
  object StubEmbedder extends TextEmbedder {
    val dim = 4
    def embed(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      val h = graft.dedup.Dedup.md5Bits48Jvm(t) % 997L
      Array.tabulate(dim)(j => (h * (2 * j + 3) % 997L).toDouble / 997.0)
    }
  }

  /** Hashing-trick embedder (the public feature-hashing construction): a
    * REAL embedding function with engine-reproducible arithmetic, not a
    * per-doc fingerprint. Per token of the whitespace-normalized lowercase
    * text: dimension = md5-48(token) mod dim, signed ±1 by the next hash
    * bit; the signed counts accumulate per dimension and the vector is
    * L2-normalized. Tokens are hashed with the same portable md5 fold the
    * dedup family uses ([[graft.dedup.Dedup.md5Bits48Jvm]]), integer
    * accumulation is order-free, and sqrt/divide are correctly-rounded
    * IEEE ops — so the DuckDB oracle re-derives the vectors bit-for-bit
    * (gate `mm_embed_hashtrick`). Texts with no tokens embed to the zero
    * vector.
    */
  final case class HashingEmbedder(dim: Int) extends TextEmbedder {
    require(dim > 0, s"dim must be positive, got $dim")
    def embed(texts: Seq[String]): Seq[Array[Double]] = texts.map { t =>
      val norm = t.toLowerCase.replaceAll("\\s+", " ").trim
      val acc = new Array[Long](dim)
      if (norm.nonEmpty) norm.split(" ").foreach { tok =>
        val h = graft.dedup.Dedup.md5Bits48Jvm(tok)
        val j = (h % dim).toInt
        acc(j) += (if ((h / dim) % 2 == 0) 1L else -1L)
      }
      var n2 = 0L
      var i = 0
      while (i < dim) { n2 += acc(i) * acc(i); i += 1 }
      if (n2 == 0L) new Array[Double](dim)
      else {
        val nrm = math.sqrt(n2.toDouble)
        acc.map(_.toDouble / nrm)
      }
    }
  }

  /** Batched embedding inference over a text column — the plumbing of the
    * "embed the corpus" stage every similarity/clustering pipeline runs.
    * Partition-wise grouped iteration: the embedder sees fixed-size BATCHES
    * (amortizing model-call overhead exactly like `mapInPandas` batches),
    * rows stream through without materializing a partition, and the stage
    * is a narrow map — no shuffle, scan-speed at any corpus size. Docs with
    * NULL text carry no embedding (filtered, same contract as the dedup
    * operators).
    */
  def embedBatch(docs: DataFrame, idCol: String, textCol: String,
      embedder: TextEmbedder = StubEmbedder, batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        // real embedder: load the model context here, once per partition
        it.grouped(batchSize).flatMap { chunk =>
          val vecs = embedder.embed(chunk.map(_._2))
          require(vecs.length == chunk.length,
            s"embedder returned ${vecs.length} vectors for ${chunk.length} texts")
          chunk.iterator.zip(vecs.iterator).map { case ((id, _), v) => (id, v) }
        }
      }
      .toDF("doc_id", "embedding")
  }
}
