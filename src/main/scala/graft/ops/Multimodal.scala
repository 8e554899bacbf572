package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata, processed
  * batch-at-a-time per partition (north-star extension).
  *
  * The actual codecs (JPEG decode, resampling, frame extraction) are NOT
  * in this container, so the decode kernel is a clearly-marked
  * deterministic STUB — but everything Spark-side is real and tested:
  * the schema contract, the binary column handling, partition-sized
  * batching via `mapPartitions` (the Scala analogue of `mapInPandas`
  * batch shape), and the downstream feature aggregation.
  */
object Multimodal {

  /** The multimodal row contract: raw bytes + typed metadata. */
  case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: Long,
      // Stub "embedding": deterministic per-byte histogram moments the
      // real decoder would replace with model features.
      mean_byte: Double,
      frames_sampled: Int)

  /** STUB decode kernel — replace with a real codec binding in
    * production. Deterministic: features derive only from the bytes.
    * Runs batch-at-a-time inside one task (no driver collect). */
  def decodeAndFeaturize(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var crc = 17L
      var i = 0
      while (i < r.bytes.length) {
        sum += (r.bytes(i) & 0xff)
        crc = crc * 31 + (r.bytes(i) & 0xff)
        i += 1
      }
      val frames = r.modality match {
        case "video" => math.max(1, r.bytes.length / 1024) // ~1 frame/KiB stub
        case _ => 1
      }
      MediaFeatures(r.media_id, r.modality, r.bytes.length.toLong, crc,
        if (r.bytes.isEmpty) 0.0 else sum.toDouble / r.bytes.length, frames)
    }

  /** Full pipeline on a Dataset: partition-parallel decode + featurize. */
  def featurize(media: Dataset[MediaRow])(implicit s: SparkSession): Dataset[MediaFeatures] = {
    import s.implicits._
    media.mapPartitions(decodeAndFeaturize)
  }

  val queries: Map[String, Q] = Map(
    // Binary-column pipeline over synthesized media (documents' text bytes
    // stand in for image payloads — deterministic, schema-correct).
    // Everything after synthesis is the real production path.
    "q50_multimodal_features" -> { (s, dir) =>
      implicit val spark: SparkSession = s
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(
          $"doc_id" as "media_id",
          when($"doc_id" % 3 === 0, "image")
            .when($"doc_id" % 3 === 1, "audio")
            .otherwise("video") as "modality",
          encode($"text", "UTF-8") as "bytes",
          lit(64) as "width",
          lit(64) as "height")
        .as[MediaRow]
      featurize(media)
        .groupBy($"modality")
        .agg(
          count(lit(1)) as "n",
          sum($"n_bytes") as "total_bytes",
          sum($"frames_sampled") as "total_frames")
    })

  // The decode stub's byte arithmetic (ASCII text payloads ⇒ bytes =
  // chars) is mirrored exactly in SQL.
  val oracles: Map[String, String] = Map(
    "q50_multimodal_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents)
        |SELECT modality, count(*) AS n,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN modality = 'video'
        |    THEN greatest(1, n_bytes // 1024) ELSE 1 END) AS BIGINT) AS total_frames
        |FROM m GROUP BY modality""".stripMargin
  )
}
