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

  /** Byte at 1-based position `pos` of a binary column, as int (0-255).
    * Pure substring/hex arithmetic — codegen'd, no UDF. */
  private def byteAt(media: Column, pos: Column): Column =
    conv(hex(substring(media, pos.cast("int"), lit(1))), 16, 10).cast("int")

  /** Big-endian uint16 / uint32 and little-endian uint16 at 1-based pos. */
  private def be16(media: Column, pos: Column): Column =
    byteAt(media, pos) * 256 + byteAt(media, pos + 1)
  // LONG arithmetic: a hostile/corrupt header with byte >= 0x80 at the
  // first position makes the uint32 exceed Int.MaxValue, and under
  // Spark 4's default ANSI mode an Int overflow THROWS instead of
  // yielding the documented null-on-garbage behavior
  private def be32(media: Column, pos: Column): Column =
    (byteAt(media, pos).cast("long") * 16777216L +
      byteAt(media, pos + 1) * 65536L +
      byteAt(media, pos + 2) * 256L +
      byteAt(media, pos + 3)).cast("long")
  private def le16(media: Column, pos: Column): Column =
    byteAt(media, pos) + byteAt(media, pos + 1) * 256
  private def le24(media: Column, pos: Column): Column =
    byteAt(media, pos) + byteAt(media, pos + 1) * 256 +
      byteAt(media, pos + 2) * 65536
  private def le32(media: Column, pos: Column): Column =
    (byteAt(media, pos) +
      byteAt(media, pos + 1) * 256L +
      byteAt(media, pos + 2) * 65536L +
      byteAt(media, pos + 3) * 16777216L).cast("long")

  /** REAL media metadata decode — pure byte arithmetic over the binary
    * column, no image library: container format + pixel dimensions for
    * the three dominant web formats. This shrinks the stubbed surface
    * to the feature-vector step only; the header parse is the real
    * thing.
    *
    *  - PNG  (spec: 8-byte signature, IHDR first chunk): width/height
    *    are the big-endian uint32s at byte offsets 17/21 (1-based).
    *  - GIF  (GIF87a/GIF89a): logical-screen width/height are
    *    little-endian uint16s at offsets 7/9.
    *  - JPEG (ISO 10918 marker stream): dimensions live in the first
    *    SOFn segment, so the marker stream is WALKED — a bounded
    *    `aggregate` over `maxSegments` steps carries (offset, w, h)
    *    through the segment chain (each non-SOF segment advances by
    *    its 2-byte big-endian length + 2). The walk is a single
    *    codegen'd expression: no UDF, no mapPartitions, scales as a
    *    per-row projection.
    *  - WebP (RIFF container, VP8 spec RFC 6386 / VP8L spec / VP8X
    *    extended header): the spec REQUIRES VP8X first when present
    *    and otherwise a single VP8 /VP8L chunk, so the first chunk id
    *    at offset 13 decides the variant — "VP8 " carries 14-bit LE
    *    dims after the 3-byte frame tag + 3-byte sync code; "VP8L"
    *    packs two 14-bit dims-minus-one into the 4 bytes after the
    *    0x2F signature; "VP8X" carries 24-bit LE canvas dims-minus-one
    *    at payload offsets 4/7.
    *
    * Returns struct(format, width, height); unknown containers yield
    * ("unknown", null, null). Truncated/corrupt headers yield nulls
    * rather than throwing (substring past end returns empty -> conv
    * yields null). */
  def mediaMeta(media: Column, maxSegments: Int = 32): Column = {
    val isPng = hex(substring(media, 1, 8)) === "89504E470D0A1A0A"
    val isGif = hex(substring(media, 1, 3)) === "474946"
    val isJpeg = hex(substring(media, 1, 2)) === "FFD8"
    // JPEG SOFn markers: C0-C3, C5-C7, C9-CB, CD-CF (C4=DHT, C8=JPG,
    // CC=DAC are not frame headers)
    val sofMarkers = Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF).map(lit(_))
    val jpegScan = aggregate(
      sequence(lit(1), lit(maxSegments)),
      struct(lit(3).as("off"), lit(null).cast("int").as("w"),
        lit(null).cast("int").as("h")),
      (st, _) => {
        val off = st.getField("off")
        val marker = byteAt(media, off + 1)
        val done = st.getField("w").isNotNull || byteAt(media, off) =!= 0xFF ||
          marker.isNull
        when(done, st)
          .when(marker.isin(sofMarkers: _*),
            struct(off.as("off"),
              be16(media, off + 7).as("w"), be16(media, off + 5).as("h")))
          .otherwise(struct((off + be16(media, off + 2) + 2).as("off"),
            lit(null).cast("int").as("w"), lit(null).cast("int").as("h")))
      })
    val isWebp = hex(substring(media, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(media, 9, 4)) === "57454250"               // "WEBP"
    val webpChunk = hex(substring(media, 13, 4))
    // VP8 lossy: payload at 21 — 3-byte frame tag, 3-byte sync
    // (9D 01 2A), then 14-bit LE width/height (upper 2 bits are scale)
    val vp8W = le16(media, lit(27)).bitwiseAND(lit(0x3FFF))
    val vp8H = le16(media, lit(29)).bitwiseAND(lit(0x3FFF))
    // VP8L lossless: 0x2F signature at 21, then width-1 (14 bits) and
    // height-1 (14 bits) packed little-endian across the next 4 bytes
    val (lb1, lb2, lb3, lb4) = (byteAt(media, lit(22)),
      byteAt(media, lit(23)), byteAt(media, lit(24)), byteAt(media, lit(25)))
    val vp8lW = lb1 + lb2.bitwiseAND(lit(0x3F)) * 256 + 1
    val vp8lH = shiftright(lb2, 6) + lb3 * 4 +
      lb4.bitwiseAND(lit(0x0F)) * 1024 + 1
    // VP8X extended: flags byte + 3 reserved at 21, canvas
    // width-1/height-1 as 24-bit LE at 25/28
    val vp8xW = le24(media, lit(25)) + 1
    val vp8xH = le24(media, lit(28)) + 1
    val webpW = when(webpChunk === "56503820", vp8W)   // "VP8 "
      .when(webpChunk === "5650384C", vp8lW)           // "VP8L"
      .when(webpChunk === "56503858", vp8xW)           // "VP8X"
    val webpH = when(webpChunk === "56503820", vp8H)
      .when(webpChunk === "5650384C", vp8lH)
      .when(webpChunk === "56503858", vp8xH)
    // width/height are LONG across every branch: PNG's uint32 fields
    // don't fit an Int for hostile headers (see be32)
    when(isPng, struct(lit("png").as("format"),
        be32(media, lit(17)).as("width"), be32(media, lit(21)).as("height")))
      .when(isGif, struct(lit("gif").as("format"),
        le16(media, lit(7)).cast("long").as("width"),
        le16(media, lit(9)).cast("long").as("height")))
      .when(isJpeg, struct(lit("jpeg").as("format"),
        jpegScan.getField("w").cast("long").as("width"),
        jpegScan.getField("h").cast("long").as("height")))
      .when(isWebp, struct(lit("webp").as("format"),
        webpW.cast("long").as("width"), webpH.cast("long").as("height")))
      .otherwise(struct(lit("unknown").as("format"),
        lit(null).cast("long").as("width"), lit(null).cast("long").as("height")))
  }

  /** REAL audio metadata decode for WAV (RIFF) containers — the audio
    * sibling of [[mediaMeta]], same no-library contract: the RIFF chunk
    * list is WALKED (a bounded `aggregate` over `maxChunks` steps, the
    * JPEG marker-walk shape) because the spec guarantees neither that
    * `fmt ` is the first chunk nor that `data` follows it directly —
    * real encoders emit LIST/INFO/fact chunks in between. Each step
    * reads the 4-byte chunk id and little-endian uint32 size, captures
    * (channels, sample rate, bits/sample) from `fmt ` and the payload
    * byte count from `data`, and advances by 8 + size + pad (chunk
    * payloads are word-aligned: odd sizes carry one pad byte). The walk
    * stops once both chunks are seen or a truncated header nulls the
    * size.
    *
    * Returns struct(format, channels, sample_rate_hz, bits_per_sample,
    * data_bytes); non-RIFF input yields ("unknown", nulls). Duration is
    * a derivation — data_bytes * 8000 div (rate * channels * bits) —
    * left to the caller so the decoder stays exact-integer end to end. */
  def audioMeta(media: Column, maxChunks: Int = 32): Column = {
    val isWav = hex(substring(media, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(media, 9, 4)) === "57415645"              // "WAVE"
    val nullI = lit(null).cast("int")
    val nullL = lit(null).cast("long")
    val walk = aggregate(
      sequence(lit(1), lit(maxChunks)),
      struct(lit(13L).as("off"), nullI.as("ch"), nullL.as("rate"),
        nullI.as("bits"), nullL.as("db")),
      (st, _) => {
        val off = st.getField("off")
        val chunkId = hex(substring(media, off.cast("int"), lit(4)))
        val size = le32(media, off + 4)
        val next = off + 8L + size + pmod(size, lit(2L))
        // Out-of-range FIRST: a hostile declared size near uint32-max puts
        // `off` beyond the blob (or beyond Int range), and every byte read
        // below casts the offset to int — under ANSI mode that would THROW
        // CAST_OVERFLOW instead of honoring the null-on-garbage contract.
        // Or short-circuits left-to-right in codegen, so no read happens
        // once the first disjunct fires.
        val done = off > length(media).cast("long") ||
          off > lit(Int.MaxValue.toLong - 32L) ||
          (st.getField("ch").isNotNull &&
            st.getField("db").isNotNull) || size.isNull || chunkId === ""
        when(done, st)
          .when(chunkId === lit("666D7420"), // "fmt "
            struct(next.as("off"),
              le16(media, off + 10).as("ch"),
              le32(media, off + 12).as("rate"),
              le16(media, off + 22).as("bits"),
              st.getField("db").as("db")))
          .when(chunkId === lit("64617461"), // "data"
            struct(next.as("off"), st.getField("ch").as("ch"),
              st.getField("rate").as("rate"), st.getField("bits").as("bits"),
              size.as("db")))
          .otherwise(struct(next.as("off"), st.getField("ch").as("ch"),
            st.getField("rate").as("rate"), st.getField("bits").as("bits"),
            st.getField("db").as("db")))
      })
    when(isWav, struct(lit("wav").as("format"),
        walk.getField("ch").as("channels"),
        walk.getField("rate").as("sample_rate_hz"),
        walk.getField("bits").as("bits_per_sample"),
        walk.getField("db").as("data_bytes")))
      .otherwise(struct(lit("unknown").as("format"), nullI.as("channels"),
        nullL.as("sample_rate_hz"), nullI.as("bits_per_sample"),
        nullL.as("data_bytes")))
  }

  /** Synthesize a VALID WAV header for the given PCM parameters — the
    * encode half of the [[audioMeta]] round trip. A 9-byte (ODD-sized,
    * so the walk's pad-byte handling is exercised) LIST chunk sits
    * between "WAVE" and `fmt `, and `data` declares `dataBytes` of
    * payload without materializing them — the decoder reads headers
    * only. Byte assembly is unhex over hex strings, as
    * [[fakeMediaHeader]]. */
  def fakeWavHeader(channels: Column, sampleRate: Column, bits: Column,
                    dataBytes: Column): Column = {
    def leHex16(v: Column): Column = {
      val h = lpad(hex(v), 4, "0")
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    def leHex32(v: Column): Column = {
      val h = lpad(hex(v), 8, "0")
      concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2))
    }
    val byteRate = (sampleRate * channels * bits / lit(8)).cast("long")
    val blockAlign = (channels * bits / lit(8)).cast("int")
    // riff size = 4 (WAVE) + (8+9+1 LIST padded) + (8+16 fmt) + 8 + data
    val riffSize = lit(4L + 18L + 24L + 8L) + dataBytes
    unhex(concat(
      lit("52494646"), leHex32(riffSize),          // "RIFF" + size
      lit("57415645"),                             // "WAVE"
      lit("4C495354"), leHex32(lit(9)), lit("00" * 10), // odd LIST + pad
      lit("666D7420"), leHex32(lit(16)),           // "fmt " PCM chunk
      lit("0100"), leHex16(channels),
      leHex32(sampleRate), leHex32(byteRate),
      leHex16(blockAlign), leHex16(bits),
      lit("64617461"), leHex32(dataBytes)))        // "data" header only
  }

  /** Synthesize a VALID media header (PNG / GIF / JPEG) for the given
    * dimensions — the encode half of the [[mediaMeta]] round trip, and
    * the fixture generator for tables without real blobs. All byte
    * assembly is unhex over hex strings (chr() would UTF-8-mangle
    * bytes >= 0x80). The JPEG variant carries a filler APP0 segment
    * before SOF0 so the decoder's marker WALK is exercised, not just
    * the fixed-offset reads. */
  def fakeMediaHeader(format: Column, width: Column, height: Column): Column = {
    def beHex16(v: Column): Column = lpad(hex(v), 4, "0")
    def beHex32(v: Column): Column = lpad(hex(v), 8, "0")
    def leHex16(v: Column): Column = concat(
      substring(lpad(hex(v), 4, "0"), 3, 2),
      substring(lpad(hex(v), 4, "0"), 1, 2))
    val png = concat(lit("89504E470D0A1A0A"), lit("0000000D49484452"),
      beHex32(width), beHex32(height), lit("0806000000"))
    val gif = concat(lit("474946383961"), leHex16(width), leHex16(height),
      lit("F70000"))
    val jpeg = concat(lit("FFD8"),
      lit("FFE00010"), lit("00" * 14),             // APP0, 16-byte segment
      lit("FFC0001108"), beHex16(height), beHex16(width),
      lit("03" + "00" * 10))                        // SOF0 tail
    unhex(when(format === "png", png)
      .when(format === "gif", gif)
      .when(format === "jpeg", jpeg)
      .otherwise(lit("00")))
  }

  /** Synthesize a VALID WebP header for the given dimensions and
    * variant ("vp8" lossy / "vp8l" lossless / "vp8x" extended) — the
    * encode half of [[mediaMeta]]'s WebP branch and the fixture
    * generator for its three sub-formats. Dimensions must fit 14 bits
    * (VP8/VP8L's field width). Byte assembly is unhex over hex
    * strings, as [[fakeMediaHeader]]; the VP8L payload is odd-sized
    * (5 bytes), so the RIFF pad byte is included for spec validity. */
  def fakeWebpHeader(variant: Column, width: Column, height: Column): Column = {
    def hx2(v: Column): Column = lpad(hex(v), 2, "0")
    def leHex16(v: Column): Column = concat(
      hx2(v.bitwiseAND(lit(0xFF))), hx2(shiftright(v, 8)))
    def leHex24(v: Column): Column = concat(
      hx2(v.bitwiseAND(lit(0xFF))),
      hx2(shiftright(v, 8).bitwiseAND(lit(0xFF))),
      hx2(shiftright(v, 16).bitwiseAND(lit(0xFF))))
    def leHex32(v: Column): Column =
      concat(leHex16(v.bitwiseAND(lit(0xFFFF))), leHex16(shiftright(v, 16)))
    val (wm, hm) = (width - 1, height - 1)
    // VP8 : frame tag (3B, zeroed) + sync 9D 01 2A + 14-bit LE dims
    val vp8 = concat(lit("56503820"), leHex32(lit(10)),
      lit("000000" + "9D012A"), leHex16(width), leHex16(height))
    // VP8L: 2F signature + (w-1, h-1) packed 14+14 bits LE over 4 bytes
    val vp8l = concat(lit("5650384C"), leHex32(lit(5)), lit("2F"),
      hx2(wm.bitwiseAND(lit(0xFF))),
      hx2(shiftright(wm, 8).bitwiseAND(lit(0x3F)) + hm.bitwiseAND(lit(3)) * 64),
      hx2(shiftright(hm, 2).bitwiseAND(lit(0xFF))),
      hx2(shiftright(hm, 10).bitwiseAND(lit(0x0F))),
      lit("00")) // RIFF pad byte for the odd payload
    // VP8X: flags + 3 reserved, canvas dims-minus-one as 24-bit LE
    val vp8x = concat(lit("56503858"), leHex32(lit(10)), lit("00000000"),
      leHex24(wm), leHex24(hm))
    val chunk = when(variant === "vp8", vp8)
      .when(variant === "vp8l", vp8l)
      .otherwise(vp8x)
    // riff size = 4 ("WEBP") + 8 + payload (+ pad): 22 / 18 / 22
    val riffSize = when(variant === "vp8l", lit(18)).otherwise(lit(22))
    unhex(concat(lit("52494646"), leHex32(riffSize),
      lit("57454250"), chunk))
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
