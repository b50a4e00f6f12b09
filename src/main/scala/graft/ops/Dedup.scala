package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing.md5LongSql

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), content-fingerprint, MinHash+LSH banding, and
  * exact n-gram/word-set Jaccard verification.
  *
  * Scale design:
  *  - everything is hash → groupBy / equi-join — one shuffle per stage,
  *    no cross product anywhere except within LSH band buckets (bounded
  *    by bucket size) and within explicit candidate groups;
  *  - hashes/minhashes/shingles are computed with codegen'd Catalyst
  *    expressions (md5/conv/higher-order functions), not UDFs;
  *  - the 60-bit md5-derived hash (graft.functions.Hashing) is
  *    reproducible in the DuckDB oracle bit-for-bit.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `cols`.
    * At scale this is a shuffle on the hash of `cols` (same cost class
    * as distinct()); prefer the fingerprint variants to catch
    * trivially-reformatted duplicates.
    */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Exact-duplicate groups by md5 of `textCol`: (text_hash, keep_id =
    * min id, dup_cnt >= 2).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") >= 2)

  /** Canonical content fingerprint: md5 of the sorted distinct word set.
    * Collapses word-order / repetition variants of the same content.
    */
  def fingerprint(textCol: String): Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(col(textCol), " ")))))

  /** Duplicate groups by content fingerprint. */
  def fingerprintGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(textCol).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") >= 2)

  /** Word n-gram shingles as a SQL fragment (documents shorter than the
    * shingle size fall back to one whole-text shingle).
    */
  private def shinglesSql(textCol: String, n: Int): String =
    s"""CASE WHEN size(split($textCol, ' ')) >= $n
       |  THEN transform(sequence(0, size(split($textCol, ' ')) - $n),
       |                 i -> concat_ws(' ', slice(split($textCol, ' '), i + 1, $n)))
       |  ELSE array($textCol) END""".stripMargin

  /** MinHash LSH banding (shingle → minhash → band → bucket key).
    * Output: one row per (doc, band): (doc_id, band_id, band_hash) where
    * band_hash is the md5 of the band's concatenated minhash values.
    * Near-duplicate candidates are docs sharing any (band_id, band_hash)
    * bucket — see [[lshCandidates]]. numHashes minhash functions are
    * split into numHashes/bandSize bands.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 8, bandSize: Int = 2,
                   shingleSize: Int = 3): DataFrame = {
    require(numHashes % bandSize == 0, "bandSize must divide numHashes")
    val base = df.select(col(idCol).as("doc_id"),
      expr(shinglesSql(textCol, shingleSize)).as("shingles"))
    val mh = base.select(
      col("doc_id") +:
      (0 until numHashes).map { h =>
        expr(s"array_min(transform(shingles, s -> ${md5LongSql(s"concat('$h:', s)")}))")
          .as(s"mh$h")
      }: _*)
    val numBands = numHashes / bandSize
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).cast("long").as("band_id"),
        md5(concat_ws(",",
          (b * bandSize until (b + 1) * bandSize).map(i => col(s"mh$i")): _*))
          .as("band_hash"))
    }
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs from LSH bands: docs sharing >= 1
    * band bucket, with the number of colliding bands. The self-join is
    * an equi-join on (band_id, band_hash) — shuffle-partitioned by
    * bucket, so cost is sum over buckets of |bucket|^2, not n^2.
    */
  def lshCandidates(bands: DataFrame): DataFrame =
    bands.as("a").join(bands.as("b"),
        expr("a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))

  /** Exact word-set Jaccard over candidate pairs within `groupCol`
    * groups (the verify step after LSH, or a blocked all-pairs when a
    * natural blocking key exists). Output pairs with jaccard >= threshold,
    * rounded to 6 digits.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, threshold: Double): DataFrame = {
    val w = df.select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
      array_distinct(split(col(textCol), " ")).as("ws"))
    w.as("a").join(w.as("b"), expr("a.grp = b.grp AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("""round(CAST(size(array_intersect(a.ws, b.ws)) AS DOUBLE) /
               |      CAST(size(a.ws) + size(b.ws) - size(array_intersect(a.ws, b.ws)) AS DOUBLE),
               |      6)""".stripMargin).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash signature over the word multiset (bits <= 60 since the
    * underlying hash is 60-bit). Near-dups = signatures within small
    * Hamming distance; the signature itself is the oracle-checkable unit.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame =
    df.select(col(idCol).as("doc_id"),
        expr(s"transform(split($textCol, ' '), w -> ${md5LongSql("w")})").as("hs"))
      .select(col("doc_id"),
        expr(s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, b) -> acc +
                |  IF(aggregate(hs, 0L, (a2, h) -> a2 + (shiftright(h, b) & 1) * 2 - 1) >= 0,
                |     shiftleft(1L, b), 0L))""".stripMargin).as("simhash"))
}
