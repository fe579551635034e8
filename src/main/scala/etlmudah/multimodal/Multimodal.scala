package etlmudah.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with a
  * typed metadata struct, plus decode / feature-extract / frame-sample
  * plumbing.
  *
  * The actual codec step is STUBBED (this environment ships no
  * image/audio libraries): `decodeFeaturesStub` produces deterministic
  * pseudo-features from the bytes via xxhash64 so the Spark-side
  * contract — schema, batch shape, partition-parallel execution,
  * downstream joins — is real and testable. Swap `decodeFeaturesStub`
  * for a mapPartitions/Pandas-UDF decoder with the same signature
  * (binary -> array<float>) in production; nothing downstream changes.
  *
  * Scale: all derivations are per-row expressions (no shuffle); media
  * bytes never leave their partition; metadata-only queries prune the
  * binary column at the parquet scan.
  */
object Multimodal {

  /** Attach a synthetic media column to any text table: bytes = utf8 of
    * the text, metadata struct carrying (format, n_bytes). Stands in for
    * real image/audio blobs in the testdata. */
  def withFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        length(col(textCol).cast("binary")).cast("long").as("n_bytes")))

  /** STUB decode: deterministic `dims`-length float features in [0,1)
    * derived from the bytes via the md5-uniform construction
    * (`md5(bytes ++ utf8(i))` hex prefix / 2^32) — reproducible in any
    * engine that has md5, so the stub pipeline can be validated
    * end-to-end against an external oracle. Real impl: image decode +
    * model forward pass per batch behind the same
    * (binary -> array<float>) shape. */
  def decodeFeaturesStub(media: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (conv(substring(md5(concat(media, i.cast("string").cast("binary"))),
        1, 8), 16, 10).cast("double") / 4294967296.0).cast("float"))

  /** STUB resize/re-embed: fold `features` down to `outDims` by striding —
    * keeps the pipeline shape of a resolution change. */
  def resizeStub(features: Column, outDims: Int): Column =
    transform(sequence(lit(0), lit(outDims - 1)), i => element_at(features, i + 1))

  /** Batched decode path — the Scala analog of a Pandas UDF over
    * mapInPandas: an iterator-in/iterator-out partition transform where
    * a real implementation would accumulate rows into fixed-size
    * batches, run the image/audio codec + model forward pass per batch,
    * and stream results without materializing the partition. The codec
    * is STUBBED (deterministic byte-fold features); the signature,
    * laziness, schema, and partition-parallel execution are the real
    * contract a production decoder drops into. */
  def decodeBatchedStub(df: DataFrame, idCol: String, mediaCol: String,
                        dims: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val feats = Array.tabulate(dims) { d =>
            var h = 1125899906842597L + d
            var i = 0
            while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xFF); i += 1 }
            ((h & 0xFFFFFL).toFloat / 0x100000L.toFloat)
          }
          (id, feats)
        }
      }
      .toDF(idCol, "features")
  }

  /** Frame sampling for video-like blobs: n equal-spaced byte windows as
    * an array<binary>; empty media yields an empty array, never a crash. */
  def frameSample(media: Column, frames: Int, frameBytes: Int = 16): Column = {
    val len = length(media)
    when(len >= frames,
      transform(sequence(lit(0), lit(frames - 1)),
        i => substring(media, (i * (len / frames) + 1).cast("int"), lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
  }
}
