package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2): media as opaque binary
  * columns + typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing is real — binary payload column, metadata
  * struct, typed Dataset, partition-wise batch decode via
  * mapPartitions (the JVM analogue of mapInPandas batch UDFs) — while
  * the codec itself is a clearly-marked deterministic stub (this
  * container has no image/audio libraries). Swapping `decodeStub` for
  * a real JNI/FFmpeg/JPEG decoder changes nothing in the plan shape:
  * one narrow pass, no shuffle, batch-local decode.
  */
object Multimodal {

  /** An asset as it would arrive from an object store manifest. */
  case class MediaAsset(doc_id: Long, codec: String, n_frames: Long, media: Array[Byte])

  /** Features a decoder would emit per asset. */
  case class MediaFeature(doc_id: Long, codec: String, n_bytes: Long,
                          n_frames: Long, checksum: Long, sample_mean: Double)

  /** STUB DECODER — deterministic fake standing in for image/audio
    * decode. Consumes raw bytes, emits per-asset features: byte count,
    * additive checksum, and the mean of a stride-64 "frame sample".
    * Replace with a real codec; the surrounding plan is unchanged. */
  def decodeStub(a: MediaAsset): MediaFeature = {
    val bytes = a.media
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum += bytes(i) & 0xffL; i += 1 }
    var sampleSum = 0L; var n = 0L; var j = 0
    while (j < bytes.length) { sampleSum += bytes(j) & 0xffL; n += 1; j += 64 }
    MediaFeature(a.doc_id, a.codec, bytes.length.toLong, n,
      checksum % 997, sampleSum.toDouble / n)
  }

  /** Binary ingestion + metadata + partition-wise stub decode. The
    * oracle recomputes the same features from the source text (the
    * corpus is pure ASCII, so codepoints == bytes). */
  val mMultimodalMeta: GraftQuery = GraftQuery.sql(
    "m_multimodal_meta",
    """SELECT doc_id, 'utf8' AS codec,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(len(generate_series(1, length(text), 64)) AS BIGINT) AS n_frames,
      |  CAST(list_sum(list_transform(string_split(text, ''), ch -> ord(ch))) % 997 AS BIGINT) AS checksum,
      |  CAST(list_sum(list_transform(generate_series(1, length(text), 64), i -> ord(substring(text, i, 1)))) AS DOUBLE)
      |    / len(generate_series(1, length(text), 64)) AS sample_mean
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val assets = Tables.documents(s, d)
      .select(col("doc_id"),
        lit("utf8").as("codec"),
        lit(0L).as("n_frames"),                 // unknown until decode
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaAsset]
    assets
      .mapPartitions(_.map(decodeStub))         // batch-local decode, no shuffle
      .toDF()
      .select(col("doc_id"), col("codec"), col("n_bytes"),
        col("n_frames"), col("checksum"), col("sample_mean"))
      .orderBy(col("doc_id"))
  }

  /** Output of the resize/frame-sample stage. */
  case class ResizeFeature(doc_id: Long, thumb_bytes: Long,
                           thumb_checksum: Long, frame_mean: Double)

  /** STUB RESIZE — deterministic fake for media resize + frame
    * sampling: "thumbnail" = first 128 payload bytes, "frames" =
    * stride-32 samples of the thumbnail. Same batch-local plan shape
    * as a real image resize / video frame sampler. */
  def resizeStub(a: MediaAsset): ResizeFeature = {
    val thumb = if (a.media.length > 128) java.util.Arrays.copyOf(a.media, 128) else a.media
    var checksum = 0L
    var i = 0
    while (i < thumb.length) { checksum += thumb(i) & 0xffL; i += 1 }
    var sampleSum = 0L; var n = 0L; var j = 0
    while (j < thumb.length) { sampleSum += thumb(j) & 0xffL; n += 1; j += 32 }
    ResizeFeature(a.doc_id, thumb.length.toLong, checksum % 997, sampleSum.toDouble / n)
  }

  /** Resize + frame-sample over the binary payload column. */
  val mMediaResize: GraftQuery = GraftQuery.sql(
    "m_media_resize",
    """SELECT doc_id,
      |  CAST(LEAST(128, length(text)) AS BIGINT) AS thumb_bytes,
      |  CAST(list_sum(list_transform(string_split(substring(text, 1, 128), ''), ch -> ord(ch))) % 997 AS BIGINT) AS thumb_checksum,
      |  CAST(list_sum(list_transform(generate_series(1, LEAST(128, length(text)), 32), i -> ord(substring(text, i, 1)))) AS DOUBLE)
      |    / len(generate_series(1, LEAST(128, length(text)), 32)) AS frame_mean
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), lit("utf8").as("codec"), lit(0L).as("n_frames"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaAsset]
      .mapPartitions(_.map(resizeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Stub feature-extraction output: an 8-dim byte-bucket histogram
    * standing in for a real image/audio embedding. */
  case class EmbedFeature(doc_id: Long, emb: Array[Double])

  /** STUB EMBEDDER — code-point histogram (16-wide buckets over the
    * ASCII range, code points >= 128 fall outside every bucket but
    * still count toward the normalizer) so the feature definition is
    * byte-encoding-independent and matches the character-based oracle
    * for any input, not just pure-ASCII payloads. Replace with a real
    * vision/audio encoder; the downstream similarity plan is
    * unchanged. */
  def embedStub(a: MediaAsset): EmbedFeature = {
    val text = new String(a.media, java.nio.charset.StandardCharsets.UTF_8)
    val counts = new Array[Long](8)
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp < 128) counts(cp >> 4) += 1
      n += 1
      i += Character.charCount(cp)
    }
    EmbedFeature(a.doc_id,
      if (n == 0) new Array[Double](8) else counts.map(_.toDouble / n))
  }

  /** Multimodal feature pipeline end-to-end: binary payload ->
    * batch-local stub embedding -> cosine closest pairs (the same
    * similarity machinery the embeddings table uses — swapping in a
    * real encoder re-uses the whole downstream plan). */
  val mFeaturePairs: GraftQuery = GraftQuery.sql(
    "m_feature_pairs", {
      import graft.functions.Vectors
      s"""WITH h AS (SELECT doc_id,
         |    list_transform(generate_series(0, 7), b ->
         |      CAST(len(list_filter(string_split(text, ''), ch -> ord(ch) // 16 = b)) AS DOUBLE)
         |        / length(text)) AS emb
         |  FROM documents),
         |n2 AS (SELECT doc_id, emb, ${Vectors.normSql("emb")} AS nrm FROM h)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  ${Vectors.dotSql("a.emb", "b.emb")} / (a.nrm * b.nrm) AS cosine
         |FROM n2 a JOIN n2 b ON a.doc_id < b.doc_id
         |ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""".stripMargin
    }
  ) { (s, d) =>
    import s.implicits._
    import graft.functions.Vectors
    val feats = Tables.documents(s, d)
      .select(col("doc_id"), lit("utf8").as("codec"), lit(0L).as("n_frames"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaAsset]
      .mapPartitions(_.map(embedStub))
      .toDF()
      .withColumn("nrm", Vectors.norm(col("emb")))
      .persist()
    val a = feats.select(col("doc_id").as("doc_a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = feats.select(col("doc_id").as("doc_b"), col("emb").as("eb"), col("nrm").as("nb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (Vectors.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  def all: Seq[GraftQuery] = Seq(mMultimodalMeta, mMediaResize, mFeaturePairs)
}
