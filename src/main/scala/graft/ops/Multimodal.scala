package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media record: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, modality: String, content: Array[Byte],
                       byte_len: Long, checksum: String)

/** Features "decoded" from a media payload. */
case class MediaFeatures(doc_id: Long, byte_len: Long, content_sig: Long,
                         width: Int, height: Int)

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
}
