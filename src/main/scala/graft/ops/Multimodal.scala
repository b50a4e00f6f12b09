package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, modality: String, content: Array[Byte],
                       byte_len: Long, checksum: String)

/** Features "decoded" from a media payload. */
case class MediaFeatures(doc_id: Long, byte_len: Long, content_sig: Long,
                         width: Int, height: Int)

/** One sampled frame of a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Long, frame_len: Long,
                      frame_checksum: String)

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-parallel.
  *
  * The decode step is a clearly-marked STUB — image/audio codecs are not
  * available in this container — producing deterministic fake features
  * from the bytes. Everything around it is real: the binary schema, the
  * metadata struct, checksums computed by codegen'd expressions, and the
  * mapPartitions batch shape (one decoder instance per partition, rows
  * streamed through it — the Scala analog of `mapInPandas` batches).
  */
object Multimodal {

  /** Attach an opaque binary payload + metadata. In production the
    * binary would come from the storage layer; here it is synthesized
    * from the text column so the pipeline is runnable and the checksums
    * oracle-checkable.
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
                   modality: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("content"))
      .withColumn("byte_len", length(col("content")).cast("long"))
      .withColumn("checksum", md5(col("content")))

  /** STUB decoder: deterministic fake features in place of a real
    * image/audio decode (`???` equivalent — swap `fakeDecode` for a
    * codec call when one is available). The partition-parallel shape —
    * per-partition setup, streamed rows, no collect — is the real,
    * tested plumbing.
    */
  def decodeFeaturesStub(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (load codec once)
      it.map { r =>
        val sig = r.content.take(8).foldLeft(0L)((a, b) => a * 31 + (b & 0xffL))
        val len = r.content.length
        MediaFeatures(r.doc_id, len.toLong, sig,
          64 + (len % 64), 64 + (len % 48)) // fakeDecode: stub dimensions
      }
    }
  }

  /** Frame sampling: one output row per `stride`-th fixed-size chunk of
    * the payload (a video's every-Nth-frame extraction). The generator
    * shape is the real plumbing — a partition-parallel flatMap fanning
    * each record out to its frames, per-partition digest instance, no
    * collect, output rows carry (frame_idx, len, checksum) metadata.
    * Chunking bytes stands in for the codec's frame boundaries (STUB —
    * same swap point as decodeFeaturesStub); the checksums are real md5
    * so the step is oracle-checkable end-to-end.
    */
  def frameSample(ds: Dataset[MediaRecord], frameBytes: Int,
                  stride: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    require(frameBytes > 0 && stride > 0)
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        r.content.grouped(frameBytes).zipWithIndex.collect {
          case (chunk, idx) if idx % stride == 0 =>
            md.reset()
            val hex = md.digest(chunk).map("%02x".format(_)).mkString
            MediaFrame(r.doc_id, idx.toLong, chunk.length.toLong, hex)
        }
      }
    }
  }

  /** Batched resize stub: rows are processed in `batchSize` groups —
    * the Scala analog of mapInPandas/Arrow batches, where a real
    * implementation would hand one contiguous batch to a vectorized
    * codec. The stub "resize" truncates or zero-pads the payload to
    * `targetBytes` deterministically; schema and batch shape are the
    * real contract.
    */
  def resizeStub(ds: Dataset[MediaRecord], targetBytes: Int,
                 batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        // a vectorized decoder would process `batch` in one call
        batch.map { r =>
          val resized = java.util.Arrays.copyOf(r.content, targetBytes)
          md.reset()
          val hex = md.digest(resized).map("%02x".format(_)).mkString
          MediaRecord(r.doc_id, r.modality, resized, targetBytes.toLong, hex)
        }
      }
    }
  }
}
