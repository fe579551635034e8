package etlmudah

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

import etlmudah.expr.{ApngFrameStats, ApngMeta, AviFrameAHash, AviFrameStats, AviMeta, BmpAHash, BmpPixelStats, BmpResize, BpeFold, CharNgramCounts, CosineSimilarity, CountMinSketchAgg, FakeAvi, FakeBmp24, FakeBmpBlocks, FakeFlac, FakeJpeg, FakeJpeg420, FakeJpegProg420, FakeMjpegAvi, FakeMp3L1, Mp3L1Stats, FakeGif, FlacFeatures, FlacSampleStats, FlacToWav16, FakeAnimGif, FakeGifInterlaced, FakeApng, FakePng16, FakePngInterlaced, FakePngTyped, GifAHash, GifAnimMeta, GifFrameStats, GifPixelStats, GifToBmp24, FakePng24, FakeWav16, FoldAccents, GramSumsAgg, JaroWinkler, JpegAHash, JpegPixelStats, JpegToBmp24, NfcNormalize, PngAHash, PngPixelStats, PngToBmp24, TiffAHash, TiffPixelStats, TiffToBmp24, FakeTiff, TopKAgg, UnigramViterbi, WavFeatures, WavSampleStats}

/** SparkSessionExtensions entry point registering the engine's native
  * expressions. Enable with:
  *   .config("spark.sql.extensions", "etlmudah.GraftExtensions")
  * after which `graft_cosine(a, b)` resolves in SQL and via
  * functions.call_function.
  *
  * `graft_bloom_agg` / `graft_might_contain` expose Spark's OWN
  * codegen'd bloom-filter expressions (the ones the optimizer injects
  * for runtime row-level filtering, not SQL-registered by default) so
  * the decontamination operators can build a distributed, mergeable
  * bloom filter and probe it — no driver-side `stat.bloomFilter`
  * collect, no UDF. `graft_might_contain`'s filter argument must be a
  * scalar subquery or literal (the expression enforces this — the
  * bloom is evaluated once, then inlined). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) =>
        JaroWinkler(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bmp_stats"),
      new ExpressionInfo(classOf[BmpPixelStats].getName, "graft_bmp_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => BmpPixelStats(c)
        case Seq(c, m) if m.foldable =>
          BmpPixelStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_bmp_stats(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bmp_ahash"),
      new ExpressionInfo(classOf[BmpAHash].getName, "graft_bmp_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => BmpAHash(c)
        case Seq(c, m) if m.foldable =>
          BmpAHash(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_bmp_ahash(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bmp_resize"),
      new ExpressionInfo(classOf[BmpResize].getName, "graft_bmp_resize"),
      (children: Seq[Expression]) => children match {
        case Seq(c, f) if f.foldable =>
          BmpResize(c, f.eval().asInstanceOf[Number].intValue)
        case Seq(c, f, m) if f.foldable && m.foldable =>
          BmpResize(c, f.eval().asInstanceOf[Number].intValue,
            m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_bmp_resize(media, factor[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_fold"),
      new ExpressionInfo(classOf[BpeFold].getName, "graft_bpe_fold"),
      (children: Seq[Expression]) =>
        BpeFold(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_ngram_counts"),
      new ExpressionInfo(classOf[CharNgramCounts].getName,
        "graft_char_ngram_counts"),
      (children: Seq[Expression]) => children match {
        case Seq(c, n) if n.foldable =>
          CharNgramCounts(c, n.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_char_ngram_counts(text, n) with literal n")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_bmp24"),
      new ExpressionInfo(classOf[FakeBmp24].getName, "graft_fake_bmp24"),
      (children: Seq[Expression]) =>
        FakeBmp24(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_wav_stats"),
      new ExpressionInfo(classOf[WavSampleStats].getName, "graft_wav_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => WavSampleStats(c)
        case Seq(c, m) if m.foldable =>
          WavSampleStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_wav_stats(media[, maxSamples])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_wav_features"),
      new ExpressionInfo(classOf[WavFeatures].getName, "graft_wav_features"),
      (children: Seq[Expression]) => children match {
        case Seq(c, t) if t.foldable =>
          WavFeatures(c, t.eval().asInstanceOf[Number].intValue)
        case Seq(c, t, m) if t.foldable && m.foldable =>
          WavFeatures(c, t.eval().asInstanceOf[Number].intValue,
            m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_wav_features(media, thresh[, maxSamples])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avi_meta"),
      new ExpressionInfo(classOf[AviMeta].getName, "graft_avi_meta"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => AviMeta(c)
        case Seq(c, m) if m.foldable =>
          AviMeta(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_avi_meta(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avi_frame_stats"),
      new ExpressionInfo(classOf[AviFrameStats].getName,
        "graft_avi_frame_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c, k) => AviFrameStats(c, k)
        case Seq(c, k, m) if m.foldable =>
          AviFrameStats(c, k, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_avi_frame_stats(media, frameIdx[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_avi_frame_ahash"),
      new ExpressionInfo(classOf[AviFrameAHash].getName,
        "graft_avi_frame_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c, k) => AviFrameAHash(c, k)
        case Seq(c, k, m) if m.foldable =>
          AviFrameAHash(c, k, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_avi_frame_ahash(media, frameIdx[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_avi"),
      new ExpressionInfo(classOf[FakeAvi].getName, "graft_fake_avi"),
      (children: Seq[Expression]) =>
        FakeAvi(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_mjpeg_avi"),
      new ExpressionInfo(classOf[FakeMjpegAvi].getName,
        "graft_fake_mjpeg_avi"),
      (children: Seq[Expression]) =>
        FakeMjpegAvi(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_png_stats"),
      new ExpressionInfo(classOf[PngPixelStats].getName, "graft_png_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => PngPixelStats(c)
        case Seq(c, m) if m.foldable =>
          PngPixelStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_png_stats(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_png_ahash"),
      new ExpressionInfo(classOf[PngAHash].getName, "graft_png_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => PngAHash(c)
        case Seq(c, m) if m.foldable =>
          PngAHash(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_png_ahash(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_png_to_bmp24"),
      new ExpressionInfo(classOf[PngToBmp24].getName, "graft_png_to_bmp24"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => PngToBmp24(c)
        case Seq(c, m) if m.foldable =>
          PngToBmp24(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_png_to_bmp24(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_png24"),
      new ExpressionInfo(classOf[FakePng24].getName, "graft_fake_png24"),
      (children: Seq[Expression]) =>
        FakePng24(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_jpeg_stats"),
      new ExpressionInfo(classOf[JpegPixelStats].getName, "graft_jpeg_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => JpegPixelStats(c)
        case Seq(c, m) if m.foldable =>
          JpegPixelStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_jpeg_stats(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jpeg_ahash"),
      new ExpressionInfo(classOf[JpegAHash].getName, "graft_jpeg_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => JpegAHash(c)
        case Seq(c, m) if m.foldable =>
          JpegAHash(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_jpeg_ahash(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jpeg_to_bmp24"),
      new ExpressionInfo(classOf[JpegToBmp24].getName, "graft_jpeg_to_bmp24"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => JpegToBmp24(c)
        case Seq(c, m) if m.foldable =>
          JpegToBmp24(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_jpeg_to_bmp24(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_jpeg"),
      new ExpressionInfo(classOf[FakeJpeg].getName, "graft_fake_jpeg"),
      (children: Seq[Expression]) =>
        FakeJpeg(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_jpeg_prog420"),
      new ExpressionInfo(classOf[FakeJpegProg420].getName,
        "graft_fake_jpeg_prog420"),
      (children: Seq[Expression]) =>
        FakeJpegProg420(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_jpeg420"),
      new ExpressionInfo(classOf[FakeJpeg420].getName,
        "graft_fake_jpeg420"),
      (children: Seq[Expression]) =>
        FakeJpeg420(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_bmp_blocks"),
      new ExpressionInfo(classOf[FakeBmpBlocks].getName,
        "graft_fake_bmp_blocks"),
      (children: Seq[Expression]) =>
        FakeBmpBlocks(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_stats"),
      new ExpressionInfo(classOf[GifPixelStats].getName, "graft_gif_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => GifPixelStats(c)
        case Seq(c, m) if m.foldable =>
          GifPixelStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gif_stats(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_ahash"),
      new ExpressionInfo(classOf[GifAHash].getName, "graft_gif_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => GifAHash(c)
        case Seq(c, m) if m.foldable =>
          GifAHash(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gif_ahash(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_to_bmp24"),
      new ExpressionInfo(classOf[GifToBmp24].getName, "graft_gif_to_bmp24"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => GifToBmp24(c)
        case Seq(c, m) if m.foldable =>
          GifToBmp24(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gif_to_bmp24(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_anim_meta"),
      new ExpressionInfo(classOf[GifAnimMeta].getName,
        "graft_gif_anim_meta"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => GifAnimMeta(c)
        case Seq(c, m) if m.foldable =>
          GifAnimMeta(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gif_anim_meta(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gif_frame_stats"),
      new ExpressionInfo(classOf[GifFrameStats].getName,
        "graft_gif_frame_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c, k) => GifFrameStats(c, k)
        case Seq(c, k, m) if m.foldable =>
          GifFrameStats(c, k, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gif_frame_stats(media, frameIdx[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_mp3l1_stats"),
      new ExpressionInfo(classOf[Mp3L1Stats].getName, "graft_mp3l1_stats"),
      (children: Seq[Expression]) =>
        Mp3L1Stats(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_mp3l1"),
      new ExpressionInfo(classOf[FakeMp3L1].getName, "graft_fake_mp3l1"),
      (children: Seq[Expression]) =>
        FakeMp3L1(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_gif_interlaced"),
      new ExpressionInfo(classOf[FakeGifInterlaced].getName,
        "graft_fake_gif_interlaced"),
      (children: Seq[Expression]) =>
        FakeGifInterlaced(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_png_interlaced"),
      new ExpressionInfo(classOf[FakePngInterlaced].getName,
        "graft_fake_png_interlaced"),
      (children: Seq[Expression]) =>
        FakePngInterlaced(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_png_typed"),
      new ExpressionInfo(classOf[FakePngTyped].getName,
        "graft_fake_png_typed"),
      (children: Seq[Expression]) =>
        FakePngTyped(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_png16"),
      new ExpressionInfo(classOf[FakePng16].getName,
        "graft_fake_png16"),
      (children: Seq[Expression]) =>
        FakePng16(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_apng_meta"),
      new ExpressionInfo(classOf[ApngMeta].getName, "graft_apng_meta"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => ApngMeta(c)
        case Seq(c, m) if m.foldable =>
          ApngMeta(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_apng_meta(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_apng_frame_stats"),
      new ExpressionInfo(classOf[ApngFrameStats].getName,
        "graft_apng_frame_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c, k) => ApngFrameStats(c, k)
        case Seq(c, k, m) if m.foldable =>
          ApngFrameStats(c, k, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_apng_frame_stats(media, frameIdx[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_apng"),
      new ExpressionInfo(classOf[FakeApng].getName, "graft_fake_apng"),
      (children: Seq[Expression]) =>
        FakeApng(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_tiff_stats"),
      new ExpressionInfo(classOf[TiffPixelStats].getName,
        "graft_tiff_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => TiffPixelStats(c)
        case Seq(c, m) if m.foldable =>
          TiffPixelStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_tiff_stats(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tiff_ahash"),
      new ExpressionInfo(classOf[TiffAHash].getName, "graft_tiff_ahash"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => TiffAHash(c)
        case Seq(c, m) if m.foldable =>
          TiffAHash(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_tiff_ahash(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tiff_to_bmp24"),
      new ExpressionInfo(classOf[TiffToBmp24].getName,
        "graft_tiff_to_bmp24"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => TiffToBmp24(c)
        case Seq(c, m) if m.foldable =>
          TiffToBmp24(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_tiff_to_bmp24(media[, maxPixels])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_tiff"),
      new ExpressionInfo(classOf[FakeTiff].getName, "graft_fake_tiff"),
      (children: Seq[Expression]) =>
        FakeTiff(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_anim_gif"),
      new ExpressionInfo(classOf[FakeAnimGif].getName,
        "graft_fake_anim_gif"),
      (children: Seq[Expression]) =>
        FakeAnimGif(children.head, children(1), children(2),
          children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_gif"),
      new ExpressionInfo(classOf[FakeGif].getName, "graft_fake_gif"),
      (children: Seq[Expression]) =>
        FakeGif(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_flac_stats"),
      new ExpressionInfo(classOf[FlacSampleStats].getName, "graft_flac_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => FlacSampleStats(c)
        case Seq(c, m) if m.foldable =>
          FlacSampleStats(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_flac_stats(media[, maxSamples])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_flac_features"),
      new ExpressionInfo(classOf[FlacFeatures].getName,
        "graft_flac_features"),
      (children: Seq[Expression]) => children match {
        case Seq(c, t) if t.foldable =>
          FlacFeatures(c, t.eval().asInstanceOf[Number].intValue)
        case Seq(c, t, m) if t.foldable && m.foldable =>
          FlacFeatures(c, t.eval().asInstanceOf[Number].intValue,
            m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_flac_features(media, thresh[, maxSamples])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_flac_to_wav16"),
      new ExpressionInfo(classOf[FlacToWav16].getName,
        "graft_flac_to_wav16"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => FlacToWav16(c)
        case Seq(c, m) if m.foldable =>
          FlacToWav16(c, m.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_flac_to_wav16(media[, maxSamples])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_flac"),
      new ExpressionInfo(classOf[FakeFlac].getName, "graft_fake_flac"),
      (children: Seq[Expression]) =>
        FakeFlac(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_fake_wav16"),
      new ExpressionInfo(classOf[FakeWav16].getName, "graft_fake_wav16"),
      (children: Seq[Expression]) =>
        FakeWav16(children.head, children(1), children(2), children(3))))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "graft_cms"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => CountMinSketchAgg(c)
        case Seq(c, d, w) if d.foldable && w.foldable =>
          CountMinSketchAgg(c,
            d.eval().asInstanceOf[Number].intValue,
            w.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_cms(key[, depth, width])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => children match {
        case Seq(s, t, k) if k.foldable =>
          TopKAgg(s, t, k.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_topk(score, tag, k) with foldable k")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_viterbi"),
      new ExpressionInfo(classOf[UnigramViterbi].getName, "graft_viterbi"),
      (children: Seq[Expression]) =>
        UnigramViterbi(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_gram"),
      new ExpressionInfo(classOf[GramSumsAgg].getName, "graft_gram"),
      (children: Seq[Expression]) => children match {
        case Seq(c, d) if d.foldable =>
          GramSumsAgg(c, d.eval().asInstanceOf[Number].intValue)
        case Seq(c, d, s) if d.foldable && s.foldable =>
          GramSumsAgg(c, d.eval().asInstanceOf[Number].intValue,
            s.eval().asInstanceOf[Number].intValue)
        case _ => throw new IllegalArgumentException(
          "graft_gram(vec, dims[, scale])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fold_accents"),
      new ExpressionInfo(classOf[FoldAccents].getName,
        "graft_fold_accents"),
      (children: Seq[Expression]) => FoldAccents(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(value[, estimatedItems[, numBits]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children.head, children(1))))
  }
}
