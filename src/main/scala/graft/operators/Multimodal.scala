package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt extension): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs partition-wise over the binary payloads.
  *
  * The decode step is STUBBED — this container has no image/audio
  * codecs — with a clearly-marked deterministic fake deriving pseudo
  * dimensions/features from the bytes themselves. Everything around the
  * stub is real and tested: the binary schema, the mapPartitions batch
  * shape (one decoder instance per partition, streaming iterator — no
  * per-row setup, no whole-partition materialization), and the
  * downstream typed metadata columns.
  */
object Multimodal {

  /** Typed metadata for one decoded media payload. */
  case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fingerprint: String)

  /** STUB decoder ???-equivalent: derives deterministic fake dimensions
    * from a byte checksum. A real deployment replaces exactly this
    * function with an image/audio codec call; the operator shape does
    * not change. */
  private[operators] def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L // deterministic FNV-ish fold, not an RNG
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >> 10, 1024).toInt
    val frames = 1 + math.floorMod(h >> 20, 32).toInt
    (w, ht, frames)
  }

  /** Partition-wise decode + metadata extraction over a binary column.
    * Input: (idCol long, binCol binary). One decoder per partition,
    * lazily streamed — the at-scale batch shape. */
  def extractMeta(spark: SparkSession, df: DataFrame,
                  idCol: String, binCol: String,
                  kind: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init: one digest instance reused across rows
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          md.reset()
          val fp = md.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, kind, bytes.length.toLong, w, h, f, fp)
        }
      }
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * index up to n_frames (metadata-level; the stub stands in for the
    * frame grab). Fan-out is a built-in generator — no UDTF. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("fingerprint"))

  /** One payload's 16-bin high-nibble byte histogram. */
  case class MediaHist(media_id: Long, hist: Array[Long])

  /** REAL (non-stub) feature extraction over the raw payload bytes: a
    * 16-bin high-nibble histogram per payload — the per-partition
    * tight-loop shape of any real feature extractor (one pass over the
    * bytes, fixed-size output), computable without codecs and therefore
    * oracle-checkable end to end. */
  def byteHistogram(spark: SparkSession, df: DataFrame,
                    idCol: String, binCol: String): Dataset[MediaHist] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val h = new Array[Long](16)
          var i = 0
          while (i < bytes.length) {
            h((bytes(i) & 0xf0) >> 4) += 1
            i += 1
          }
          MediaHist(id, h)
        }
      }
  }

  /** Aspect-preserving downscale of decoded dimensions to fit within
    * maxW × maxH — pure integer Column arithmetic (Catalyst
    * IntegralDivide, not `/`-which-is-double-division, no UDF), so the
    * resize plan stays in whole-stage codegen and the result is
    * engine-exact for ALL int32 dims: products stay ≤ 2^62, and `div`
    * truncates in long arithmetic with no 2^53 double-mantissa cliff.
    * Payloads already inside the box are untouched; output dims never
    * drop below 1. */
  def resizeMeta(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): DataFrame = {
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val fits = w <= maxW && h <= maxH
    // wider-than-tall relative to the box → clamp width, scale height
    val wider = h * maxW <= w * maxH
    val outW = when(fits, w).when(wider, lit(maxW.toLong))
      .otherwise(greatest(lit(1L), call_function("div", w * maxH, h)))
    val outH = when(fits, h).when(wider, greatest(lit(1L), call_function("div", h * maxW, w)))
      .otherwise(lit(maxH.toLong))
    meta.toDF().select(
      col("media_id"), col("width"), col("height"),
      outW.cast("int").as("out_width"), outH.cast("int").as("out_height"))
  }
}
