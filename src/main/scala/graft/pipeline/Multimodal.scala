package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing — schema, partitioning, batch-shaped typed
  * mapPartitions, deterministic outputs — is real and tested. The actual
  * media DECODE is a clearly-marked deterministic STUB (`decodeStub`): the
  * container ships no image/audio codecs, so the stub derives a fake pixel/
  * sample array from the bytes deterministically. Swapping in a real codec
  * changes only that one function; every schema and operator stays.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int,
                      sample_rate: Int, bytes: Array[Byte])
  case class Feature(media_id: Long, kind: String, n_frames: Int,
                     feature: Array[Float], counts: Array[Int],
                     nSamples: Int)

  /** Deterministic synthetic media table: binary payloads derived from the
    * id (no external data). kind ∈ {image, audio, video}.
    */
  def synthMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.max(2, n / 64)).map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val bytes = Array.tabulate[Byte](len)(i =>
        ((id * 131 + i * 31 + 7) % 251).toByte)
      MediaRow(id, kind, 4 + (id % 16).toInt, 4 + (id % 12).toInt,
        8000 + 100 * (id % 5).toInt, bytes)
    }
  }

  /** STUB decode: a real implementation would decode image pixels / audio
    * samples here (e.g. via javax.imageio or an ffmpeg binding — not in
    * this container). Deterministic fake: byte k of the payload becomes
    * "sample" (bytes(k) & 0xff) / 255f. Marked ??? semantically — replace
    * with a codec to go live; everything downstream is codec-agnostic.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] =
    bytes.map(b => (b & 0xff) / 255f)

  /** Feature extraction over the binary column: batch-shaped mapPartitions
    * (the Scala analog of mapInPandas batches — one partition = one batch,
    * no per-row UDF boxing). Emits a fixed-width 8-bin histogram feature.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val samples = decodeStub(m.bytes)
        val counts = new Array[Int](8)
        samples.foreach { s =>
          val bin = math.min(7, (s * 8).toInt)
          counts(bin) += 1
        }
        val n = math.max(1, samples.length)
        val hist = Array.tabulate(8)(i => counts(i).toFloat / n.toFloat)
        Feature(m.media_id, m.kind, frameCount(m), hist, counts, n)
      }
    }
  }

  /** Frame sampling plan for video rows: every k-th frame index (metadata
    * math only — decode of the selected frames is the stub above).
    */
  def frameCount(m: MediaRow): Int =
    if (m.kind == "video") math.max(1, m.bytes.length / 32) else 1

  def frameSample(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .map(m => (m.media_id, (0 until frameCount(m) by everyK).toArray))
      .toDF("media_id", "frame_indices")
  }

  /** "Resize" = metadata transform + stubbed re-encode: halve dimensions,
    * keep payload (a codec would re-encode). Shows the schema contract.
    */
  def resize(media: Dataset[MediaRow], maxW: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      if (m.kind == "image" && m.width > maxW)
        m.copy(width = maxW, height = math.max(1, m.height * maxW / m.width))
      else m
    }
  }

  /** Aggregate over extracted features: per-kind sample-weighted mean of
    * the bin-0 share. Aggregated from the INTEGER histogram counts (one
    * exact sum, one double division) so the result is bit-identical at any
    * parallelism / aggregation order — a float mean of per-media fractions
    * would depend on summation order.
    */
  def featureStats(media: Dataset[MediaRow]): DataFrame = {
    extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"),
        element_at(col("counts"), 1).cast("long").as("c0"),
        col("nSamples").cast("long").as("ns"))
      .groupBy("kind")
      .agg(count("*").as("n"),
        round(sum("c0").cast("double") / sum("ns"), 4).as("avg_bin0"))
  }
}
