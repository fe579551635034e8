package etlmudah.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, n-gram language ID, fingerprinting.
  *
  * Everything is a native Catalyst column expression (split / higher-order
  * array functions / regexp) — no UDFs, fully codegen'd, linear per-row
  * cost, embarrassingly parallel at any scale. No shuffles are introduced
  * by this module; downstream group-bys decide partitioning.
  */
object TextStats {

  /** Whitespace tokenization (the testdata documents are single-space
    * separated; `\s+` keeps it robust to real text). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token estimate: counts letter runs, digit runs, and
    * individual punctuation marks separately — the segmentation most
    * subword tokenizers approximate before merges, and a far better
    * LLM-token-cost proxy than whitespace words. Pure regexp_count. */
  def tokenCountBpeIsh(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Unicode cleanup ladder APPLIED — the normalize-before-anything
    * step every curation pipeline runs first (C4 strips control chars
    * and collapses whitespace; typographic quotes/dashes fold to ASCII
    * so every downstream dedup/fingerprint tier sees ONE spelling of
    * the same text). Three codegen'd passes, zero UDFs:
    *   1. control chars (C0 minus tab/newline/CR, plus DEL) -> ''
    *   2. curly quotes / en+em dashes / NBSP fold via 1:1 translate
    *      (NBSP becomes plain space BEFORE the collapse — Java's \s
    *      does not match U+00A0)
    *   3. whitespace runs -> one space, then trim.
    * Idempotent (TextStatsSpec pins clean(clean(x)) == clean(x)); the
    * q120 normalizationLadder DIAGNOSES these dup classes, this is the
    * apply step those diagnostics recommend. 100 TB shape: pure
    * per-row projection — no shuffle, pipelines into whatever scan
    * feeds it. */
  def cleanText(text: Column): Column = {
    val noCtl = regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val folded = translate(noCtl,
      "\u201C\u201D\u2018\u2019\u2013\u2014\u00A0", "\"\"''-- ")
    trim(regexp_replace(folded, "\\s+", " "))
  }

  /** NFC normalization AUDIT per slice: how much of the corpus carries
    * non-canonical Unicode spellings (decomposed combining sequences,
    * compatibility singletons like U+212B), measured by running
    * `graft_nfc` ([[etlmudah.expr.NfcNormalize]]) and counting docs the
    * normalization actually changed plus the codepoint-length delta.
    * This is the diagnose step in front of applying `graft_nfc` as a
    * cleanup stage (the mojibakeScan/cleanText split: scan first, gate
    * the rewrite on evidence).
    *
    * 100 TB shape: one projection computing the normalized form ONCE
    * per row (the q237 one-projection-per-expensive-expression
    * discipline — the change flag and both lengths reuse it), then one
    * map-side-combined aggregate. Requires the `GraftExtensions`
    * session extension (graft_nfc). */
  def nfcAudit(df: DataFrame, textCol: String, sliceCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(sliceCol).as("slice"), col(textCol).as("__t"),
        call_function("graft_nfc", col(textCol)).as("__n"))
      .groupBy(col("slice")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__t") =!= col("__n"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(length(col("__t"))).as("chars_raw"),
        sum(length(col("__n"))).as("chars_nfc"))
      .orderBy(col("slice"))

  /** MOJIBAKE (encoding-damage) scan: per-slice counts of the classic
    * UTF-8-bytes-decoded-as-Latin-1/cp1252 artifacts — 'Ã©'-family
    * accented-letter double-decodes, the 'â€¦' punctuation family
    * (curly quotes/dashes/ellipsis all start â€ under the damage), and
    * 'Â ' (a non-breaking space's C2 byte surfacing). Web crawls carry
    * this damage wherever an origin mislabeled its charset; it
    * poisons tokenizers (each artifact fragments into rare tokens) so
    * curation pipelines count and gate it per source BEFORE training.
    * The pattern matches the damage's LEAD characters alone (U+00C3;
    * U+00E2 U+20AC; U+00C2 + space): counting the lead IS counting the
    * artifact (every 'Ã©' contains exactly one Ã), and distinct-prefix
    * literals cannot diverge between Java and RE2 alternation
    * semantics the way overlapping multi-char alternatives could.
    *
    * Returns per slice: n_docs, n_flagged (docs with ≥1 artifact),
    * n_hits (total artifacts), flagged_share 6dp. 100 TB shape: one
    * codegen'd regexp_count projection + one map-side-combined
    * aggregate — the q48 movement. */
  /** The q212 marker alternation — public so the oracle twin
    * interpolates the IDENTICAL pattern instead of re-typing it. */
  val mojibakeMarkers = "\u00C3|\u00E2\u20AC|\u00C2 "

  def mojibakeScan(df: DataFrame, textCol: String, idCol: String,
                   sliceCol: String): DataFrame = {
    val hits = regexp_count(col(textCol), lit(mojibakeMarkers)).cast("long")
    df.select(col(sliceCol).as("slice"), hits.as("__h"))
      .groupBy(col("slice")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__h") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("__h")).as("n_hits"))
      .withColumn("flagged_share",
        round(col("n_flagged").cast("double") / col("n_docs"), 6))
      .orderBy(col("slice"))
  }

  /** FLESCH reading-ease per document — the classic rule-based
    * readability signal (Flesch 1948: 206.835 − 1.015·words/sentences
    * − 84.6·syllables/words), the cheap heuristic tier next to the
    * trained quality scorer the way markerLangId sits next to the
    * rank-profile classifier. Sentences count terminal-punctuation
    * runs (floored at 1 — headlines have no terminator), syllables
    * approximate as vowel-group runs (the standard heuristic; exact
    * syllabification needs a dictionary no engine ships).
    *
    * Determinism: the three counts are integers from regexp_count;
    * the score is the SAME IEEE expression tree both engines evaluate
    * over those integers (literals cast to double in the SQL twin),
    * so the unrounded double is bit-identical — no rounding seam
    * exists to paper over. 100 TB shape: three codegen'd regexp_count
    * projections, no shuffle at all (per-doc output). */
  def readability(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = tokenCount(col(textCol))
    val sentences = greatest(
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"), lit(1L))
    val syllables =
      regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    df.select(col(idCol).as("id"), words.as("n_words"),
        sentences.as("n_sentences"), syllables.as("n_syllables"))
      .withColumn("fre",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words").cast("double")))
      .orderBy(col("id"))
  }

  /** Hashed-feature LINEAR quality scorer — the fastText/FineWeb-Edu
    * "model-based quality filter" SHAPE made engine-portable. Real
    * pipelines gate documents on a trained linear classifier over
    * hashed token features (the hashing trick: D buckets, no stored
    * vocabulary); the distributed machinery is hash -> weight lookup ->
    * mean -> threshold, and that machinery is what this tier pins with
    * an oracle row. Weights are md5-lattice integers (the q156
    * hyperplane move): bucket = uint32(md5(token) hex prefix) % D,
    * w(bucket) = uint32(md5("w:<salt>:" + bucket) hex prefix) % 2001
    * - 1000 — so any md5-capable engine re-derives every score
    * bit-for-bit. A TRAINED model drops in by swapping the weight
    * expression for a broadcast (bucket, w) table without touching the
    * movement.
    *
    * score = sum(w) / (1000 * n_tokens) rounded to 6dp, bounded
    * [-1, 1]. The rounding is INTEGER-EXACT (see [[score6]]): the 6dp
    * value is a half-away-from-zero integer division, never an engine
    * `round()` over a double — a measured seam: Java rounds the
    * double's shortest DECIMAL string while C engines round the BINARY
    * value, and at sf0.1 three documents landed exactly on a 0.5e-6
    * midpoint where the two disagree. With score6 the only float op
    * left is the final /1e6, which is exact.
    * 100 TB shape: explode + ONE map-side-combined id-keyed aggregate;
    * the weight "table" is an expression, so the portable tier joins
    * and broadcasts nothing at all. */
  def hashedLinearScore(df: DataFrame, textCol: String, idCol: String,
                        buckets: Int = 1024,
                        salt: String = "q"): DataFrame = {
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
    val bucket = conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
    val w = conv(substring(md5(concat(lit(s"w:$salt:"),
        bucket.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long") % 2001L - 1000L
    tok.select(col("id"), w.as("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("wsum"))
      .select(col("id"), col("n_tokens"),
        (score6(col("wsum") * lit(1000L), col("n_tokens")) / lit(1000000.0))
          .as("score"))
  }

  /** round(a/n) with half-away-from-zero ties in PURE INTEGER
    * arithmetic: sign(a) · floor((2·|a| + n) / (2·n)). Used for the
    * 6dp-scaled scores (a = score·1e6·n): integer inputs make the
    * division argument and the tie decision exact, so the result is
    * engine-independent — `round(double, 6)` is NOT (Java rounds the
    * shortest decimal string, C engines the binary value; they split
    * at decimal midpoints). The float division here is safe: the
    * argument is an exact integer-valued rational whose distance from
    * any integer is ≥ 1/(2n), far above double ulp at these
    * magnitudes, so `floor` cannot misround. */
  private[text] def score6(a: Column, n: Column): Column = {
    val mag = floor((abs(a) * 2 + n) / (n * 2))
    when(a >= 0, mag).otherwise(-mag)
  }

  /** TRAIN the hashed linear quality classifier ON-ENGINE — the step
    * [[hashedLinearScore]]'s scaladoc deferred ("a trained model drops
    * in"): full-batch logistic regression over hash-trick token-count
    * features, in the repo's portable discipline, so TRAINING ITSELF
    * is oracle-checkable — every gradient is a sum of 6dp-scaled
    * BIGINTs (order-independent, engine-exact) and every float
    * expression tree is fixed and replayed verbatim by the SQL twin.
    *
    * Per step t (weights start at zero, so step 1's p = 0.5 exactly):
    *  - z6_i = Σ_b x_ib · w6_b  (BIGINT — exact, order-free)
    *  - p_i  = 1.0/(1.0 + exp(-(z6_i/1e6)))  (fixed tree)
    *  - G6_b = Σ_i round(((p_i − y_i)·x_ib)·1e6)  (BIGINT)
    *  - w6_b ← round(((w6_b/1e6) − lr·((G6_b/1e6)/n))·1e6)
    * The w-update runs IN the engine (both engines apply their own
    * round-to-integer to the identical double), and the only driver
    * traffic is `steps` collects of the `buckets`-row weight frame —
    * the BPE bounded-collect discipline.
    *
    * 100 TB shape: the feature table (id, y, bucket, count) is built
    * ONCE (one map-side-combined aggregate off the token explode) and
    * persisted; each step is a broadcast join against the
    * `buckets`-row weight frame + two id-/bucket-keyed aggregates.
    * Steps are sequential by nature (SGD's data dependence); cost is
    * steps × (2 shuffles of the Heaps-ish-bounded feature table).
    * Returns (bucket, w6, w) — w6 the 6dp-scaled BIGINT weight, `w`
    * its exact double form. */
  def trainHashedLogReg(df: DataFrame, textCol: String, idCol: String,
                        labelCol: String, buckets: Int = 16,
                        steps: Int = 3, lr: Double = 1.0): DataFrame =
    trainHashedLogRegCore(df, textCol, idCol, labelCol, buckets, steps,
      lr, withLoss = false)._1

  /** Per-step training LOSS CURVE of [[trainHashedLogReg]] — the
    * convergence diagnostic, in the same exact discipline: each step's
    * total cross-entropy is a sum of 6dp-scaled per-document BIGINT
    * losses (order-independent, SQL-replayable). Row `t` (1-based) is
    * the loss AT the weights entering step t, plus a final row at
    * `steps + 1` for the trained weights — so a healthy run shows the
    * column strictly falling. Returns (step, loss6, loss). */
  def trainHashedLogRegLoss(df: DataFrame, textCol: String, idCol: String,
                            labelCol: String, buckets: Int = 16,
                            steps: Int = 3, lr: Double = 1.0): DataFrame =
    trainHashedLogRegCore(df, textCol, idCol, labelCol, buckets, steps,
      lr, withLoss = true)._2

  private def trainHashedLogRegCore(df: DataFrame, textCol: String,
      idCol: String, labelCol: String, buckets: Int, steps: Int,
      lr: Double, withLoss: Boolean): (DataFrame, DataFrame) = {
    require(buckets > 0 && steps > 0, "buckets and steps must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count().toDouble
    val bucket = conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
    val x = df.repartition(col(idCol))
      .select(col(idCol).as("id"), col(labelCol).cast("int").as("y"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("id"), col("y"), bucket.as("b"))
      .groupBy(col("id"), col("y"), col("b"))
      .agg(count(lit(1)).as("x"))
      .persist()
    x.count()  // materialize once; every step reuses the cached table
    def pFrame(w6: Seq[(Long, Long)]): DataFrame =
      x.join(broadcast(w6.toDF("b", "w6")), "b")
        .groupBy(col("id"), col("y"))
        .agg(sum(col("x") * col("w6")).as("z6"))
        .select(col("id"), col("y"),
          (lit(1.0) / (lit(1.0) +
            exp(-(col("z6").cast("double") / lit(1000000.0))))).as("p"))
    // cross-entropy as a 6dp-scaled BIGINT sum: -(y·ln p + (1−y)·ln(1−p)).
    // p is CLAMPED to [1e-9, 1 − 1e-9] first: a saturated sigmoid hits
    // 1.0 exactly (exp underflow), where ln(1−p) is null in Spark but an
    // ERROR in strict engines — the clamp keeps the expression total and
    // the clamped tree replays identically (caps per-doc loss at ~20.7)
    def loss6(p: DataFrame): Long = {
      val pc = least(greatest(col("p"), lit(1.0e-9)),
        lit(1.0) - lit(1.0e-9))
      p.agg(sum(round(-(col("y") * log(pc) +
          (lit(1) - col("y")) * log(lit(1.0) - pc)) * lit(1000000.0))
        .cast("long")).as("l6")).head().getLong(0)
    }
    var w6 = Seq.tabulate(buckets)(b => (b.toLong, 0L))
    val losses = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    for (t <- 1 to steps) {
      val p = pFrame(w6)
      if (withLoss) losses += ((t, loss6(p)))
      val g = x.join(p.select(col("id"), col("p")), "id")
        .groupBy(col("b"))
        .agg(sum(round((col("p") - col("y")) * col("x") * lit(1000000.0))
          .cast("long")).as("g6"))
      // the update math runs IN the engine so both engines apply their
      // own round-to-integer to the identical IEEE double; the driver
      // only ferries the bounded (b, w6) rows between steps
      w6 = w6.toDF("b", "w6").join(g, Seq("b"), "left_outer")
        .select(col("b"),
          round((col("w6").cast("double") / lit(1000000.0) -
            lit(lr) * ((coalesce(col("g6"), lit(0L)).cast("double") /
              lit(1000000.0)) / lit(n))) * lit(1000000.0))
            .cast("long").as("w6"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    }
    if (withLoss) losses += ((steps + 1, loss6(pFrame(w6))))
    x.unpersist()
    val weights = w6.toDF("bucket", "w6")
      .select(col("bucket"), col("w6"),
        (col("w6").cast("double") / lit(1000000.0)).as("w"))
    val history = losses.toSeq.toDF("step", "loss6")
      .select(col("step"), col("loss6"),
        (col("loss6").cast("double") / lit(1000000.0)).as("loss"))
    (weights, history)
  }

  /** Score documents with a TRAINED (bucket, w6) weight table — the
    * consume half of [[trainHashedLogReg]], riding
    * [[hashedLinearScore]]'s exact movement with the md5-lattice
    * expression swapped for the broadcast weight frame:
    * score = (Σ_b x_b·w6_b)/1e6/n_tokens rounded to 6dp via the
    * integer-exact [[score6]] (the engine-round seam does not enter). */
  def scoreWithWeights(df: DataFrame, textCol: String, idCol: String,
                       weights: DataFrame, buckets: Int = 16): DataFrame = {
    val bucket = conv(substring(md5(col("t").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets
    df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("t"))
      .select(col("id"), bucket.as("b"))
      .join(broadcast(weights.select(col("bucket").as("b"), col("w6"))), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("w6")).as("wsum6"))
      .select(col("id"), col("n_tokens"),
        (score6(col("wsum6"), col("n_tokens")) / lit(1000000.0)).as("score"))
  }

  /** Punctuation density: punct chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      regexp_count(text, lit("[.,;:!?]")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of tokens found in a stopword list — high values indicate
    * natural prose, very low values indicate tables/code/garbage. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length factor x stopword factor,
    * penalizing extreme punctuation (heuristic in the spirit of C4/Gopher
    * quality filters, arbitrary fixed weights for determinism). */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenFactor = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopFactor = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round(lenFactor * 0.4 + stopFactor * 0.4 + punctPenalty * 0.2, 6)
  }

  /** Marker-word hit count for one language's marker list. */
  def markerHits(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(text)
    val m = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(m, lower(t)))).cast("long")
  }

  /** Heuristic n-gram/marker language ID: argmax of per-language marker
    * hits with a fixed tie-break order (first in `langs` wins ties).
    * Mirrors fastText-style langid at the "cheap deterministic filter"
    * end of the spectrum; scores are exposed for downstream thresholds. */
  def langIdByMarkers(text: Column, langs: Seq[(String, Seq[String])]): Column = {
    val scores = langs.map { case (lang, markers) => lang -> markerHits(text, markers) }
    // fold right: earlier languages win ties because `>=` replaces later picks
    scores.tail.foldLeft((scores.head._2, lit(scores.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (greatest(bestScore, score),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Per-document token profile in EXPLODE form — the hot-path variant
    * of tokenCount/stopwordRatio/qualityScore/langIdByMarkers for corpus
    * scans: one explode + one codegen'd conditional-sum aggregate
    * instead of per-row array lambdas (interpreted, with the split
    * re-inlined into every lambda by CollapseProject). Emits
    * (id, n_tokens, punct_ratio, stop_ratio, quality, pred_lang, <carry...>).
    *
    * Precondition: `textCol` must be non-null — explode drops null-array
    * rows, whereas the per-row expression APIs would keep them with null
    * stats. Filter or `coalesce(text, '')` upstream if the corpus can
    * contain null documents.
    */
  def docTokenProfile(df: DataFrame, textCol: String, idCol: String,
                      stopwords: Seq[String],
                      langs: Seq[(String, Seq[String])],
                      carryCols: Seq[String] = Nil): DataFrame = {
    val base = df.select(
      (Seq(col(idCol).as("id"), col(textCol).as("__text"),
        punctRatio(col(textCol)).as("__pr")) ++ carryCols.map(col)): _*)
    val tok = base.repartition(col("id"))
      .select((Seq(col("id"), col("__pr"),
        explode(tokens(col("__text"))).as("__t")) ++ carryCols.map(col)): _*)
      .withColumn("__lt", lower(col("__t")))
    val langAggs = langs.map { case (lang, markers) =>
      sum(when(col("__lt").isin(markers: _*), 1L).otherwise(0L)).as(s"__s_$lang")
    }
    val aggs = Seq(
      count(lit(1)).as("n_tokens"),
      first(col("__pr")).as("punct_ratio"),
      sum(when(col("__t").isin(stopwords: _*), 1L).otherwise(0L)).as("__stop_hits")
    ) ++ langAggs ++ carryCols.map(c => first(col(c)).as(c))
    val agg = tok.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)

    val stopRatio = col("__stop_hits").cast("double") / col("n_tokens")
    val quality = round(
      least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.4 +
        least(stopRatio * 5.0, lit(1.0)) * 0.4 +
        greatest(lit(0.0), lit(1.0) - col("punct_ratio") * 5.0) * 0.2, 6)
    // argmax with first-lang-wins ties, mirroring langIdByMarkers
    val pred = langs.tail.foldLeft(
      (col(s"__s_${langs.head._1}"), lit(langs.head._1))) {
      case ((bestScore, bestLang), (lang, _)) =>
        (greatest(bestScore, col(s"__s_$lang")),
          when(col(s"__s_$lang") > bestScore, lit(lang)).otherwise(bestLang))
    }._2
    agg
      .withColumn("stop_ratio", stopRatio)
      .withColumn("quality", quality)
      .withColumn("pred_lang", pred)
      .drop((Seq("__stop_hits") ++ langs.map(l => s"__s_${l._1}")): _*)
  }

  /** Gopher/C4-style quality filter over the explode-form profile:
    * labels every document keep/drop with the FIRST failing rule as the
    * reason (rule order = argument order, mirroring how published
    * quality-filter stacks report rejection reasons). Thresholds are
    * half-open: a doc is dropped when n_tokens < minTokens, n_tokens >
    * maxTokens, stop_ratio < minStopRatio, or punct_ratio >
    * maxPunctRatio. Pure projection over `docTokenProfile` — one
    * explode + one aggregate, no extra shuffle. */
  def qualityFilter(df: DataFrame, textCol: String, idCol: String,
                    stopwords: Seq[String],
                    minTokens: Long = 10, maxTokens: Long = 100000,
                    minStopRatio: Double = 0.01,
                    maxPunctRatio: Double = 0.2,
                    carryCols: Seq[String] = Nil): DataFrame = {
    val prof = docTokenProfile(df, textCol, idCol, stopwords,
      langs = Seq("und" -> Nil), carryCols = carryCols)
    val reason = when(col("n_tokens") < minTokens, lit("too_short"))
      .when(col("n_tokens") > maxTokens, lit("too_long"))
      .when(col("stop_ratio") < minStopRatio, lit("low_stopwords"))
      .when(col("punct_ratio") > maxPunctRatio, lit("high_punct"))
      .otherwise(lit("keep"))
    prof.select((Seq(col("id"), col("n_tokens"), col("stop_ratio"),
      col("punct_ratio"), reason.as("verdict")) ++ carryCols.map(col)): _*)
  }

  /** Quality-filter FUNNEL — the observability twin of `qualityFilter`:
    * per-slice survivor counts after each rule stage, applied in order
    * (the report every production filter stack ships, because "we kept
    * 61%" is useless without knowing WHICH rule ate the other 39%).
    * Same profile pass as `qualityFilter` — one explode + one
    * aggregate — then a handful of codegen'd conditional sums; adding
    * the funnel costs no extra shuffle over the filter itself. */
  def filterFunnel(df: DataFrame, textCol: String, idCol: String,
                   stopwords: Seq[String], sliceCol: String,
                   minTokens: Long = 10, maxTokens: Long = 100000,
                   minStopRatio: Double = 0.01,
                   maxPunctRatio: Double = 0.2): DataFrame = {
    val prof = docTokenProfile(df, textCol, idCol, stopwords,
      langs = Seq("und" -> Nil), carryCols = Seq(sliceCol))
    val p1 = col("n_tokens") >= minTokens
    val p2 = p1 && col("n_tokens") <= maxTokens
    val p3 = p2 && col("stop_ratio") >= minStopRatio
    val p4 = p3 && col("punct_ratio") <= maxPunctRatio
    prof.groupBy(col(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        count(when(p1, 1)).as("after_min_len"),
        count(when(p2, 1)).as("after_max_len"),
        count(when(p3, 1)).as("after_stopwords"),
        count(when(p4, 1)).as("after_punct"))
      .orderBy(col(sliceCol))
  }

  /** Gopher-rule quality report: the published heuristic rule stack
    * (word-count bounds, mean-word-length bounds, alphabetic-word
    * fraction, symbol-to-word ratio, bullet-line and ellipsis-line
    * fractions) evaluated per document, reported as INDEPENDENT
    * per-rule pass counts per corpus slice — the complement of
    * `filterFunnel`'s cumulative view (a funnel tells you which rule
    * fired first; this tells you how each rule would prune on its own).
    *
    * Shape: line-level metrics are whole-text regexp counts computed
    * BEFORE the token explode (codegen'd, no second explode); word
    * metrics ride the same one-explode-one-aggregate profile as
    * `docTokenProfile`; the report is one further slice aggregate of
    * codegen'd conditional sums. Two shuffles total (doc ids, then
    * slices), both map-side combined — scan-dominated at any corpus
    * size. Same non-null `textCol` precondition as `docTokenProfile`. */
  def gopherStats(df: DataFrame, textCol: String, idCol: String,
                  sliceCol: String,
                  minTokens: Long = 50, maxTokens: Long = 100000,
                  minMeanWordLen: Double = 3.0,
                  maxMeanWordLen: Double = 10.0,
                  minAlphaFrac: Double = 0.8,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3): DataFrame = {
    val base = df.repartition(col(idCol)).select(
      col(idCol).as("id"), col(sliceCol).as("__slice"),
      col(textCol).as("__text"),
      size(split(col(textCol), "\n", -1)).cast("double").as("__nl"),
      regexp_count(col(textCol), lit("(^|\n)[ \t]*[-*•]"))
        .cast("double").as("__bul"),
      regexp_count(col(textCol), lit("\\.\\.\\.(\n|$)"))
        .cast("double").as("__ell"),
      (regexp_count(col(textCol), lit("#")) +
        regexp_count(col(textCol), lit("\\.\\.\\.")))
        .cast("double").as("__sym"))
    val tok = base.select(col("id"), col("__slice"), col("__nl"),
      col("__bul"), col("__ell"), col("__sym"),
      explode(tokens(col("__text"))).as("__t"))
    val perDoc = tok.groupBy(col("id")).agg(
      first(col("__slice")).as("__slice"),
      first(col("__nl")).as("__nl"),
      first(col("__bul")).as("__bul"),
      first(col("__ell")).as("__ell"),
      first(col("__sym")).as("__sym"),
      count(lit(1)).as("n_tokens"),
      sum(length(col("__t"))).as("__sum_len"),
      sum(when(col("__t").rlike("[A-Za-z]"), 1L).otherwise(0L))
        .as("__alpha_hits"))
    val n = col("n_tokens").cast("double")
    val mwl = col("__sum_len").cast("double") / n
    val pLen = col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens
    val pMwl = mwl >= minMeanWordLen && mwl <= maxMeanWordLen
    val pAlpha = col("__alpha_hits").cast("double") / n >= minAlphaFrac
    val pSym = col("__sym") / n <= maxSymbolRatio
    val pBul = col("__bul") / col("__nl") <= maxBulletFrac
    val pEll = col("__ell") / col("__nl") <= maxEllipsisFrac
    perDoc.groupBy(col("__slice").as(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(when(pLen, 1L).otherwise(0L)).as("pass_len"),
        sum(when(pMwl, 1L).otherwise(0L)).as("pass_word_len"),
        sum(when(pAlpha, 1L).otherwise(0L)).as("pass_alpha"),
        sum(when(pSym, 1L).otherwise(0L)).as("pass_symbol"),
        sum(when(pBul, 1L).otherwise(0L)).as("pass_bullet"),
        sum(when(pEll, 1L).otherwise(0L)).as("pass_ellipsis"),
        sum(when(pLen && pMwl && pAlpha && pSym && pBul && pEll, 1L)
          .otherwise(0L)).as("pass_all"),
        round(avg(mwl), 4).as("avg_word_len"))
      .orderBy(col(sliceCol))
  }

  /** Unigram-LM quality scoring — the oracle-checkable little sibling
    * of the KenLM/CCNet perplexity filter: a unigram language model is
    * trained on the corpus itself (token -> ln(count/total)), every
    * document is scored by its length-weighted mean token
    * log-probability, and the report aggregates per slice (documents
    * full of rare tokens score low; templated/common text scores high
    * — the CCNet head/middle/tail dial).
    *
    * Shape: one explode into a (doc, token, m) term-frequency
    * aggregate; the vocabulary and its grand total DERIVE from that
    * same aggregate (no second corpus scan). The occurrence join is
    * tf-to-vocab on the token key with a broadcast hint — vocabulary
    * size is corpus-bounded (Heaps' law), and broadcasting it sidesteps
    * the severe key skew a shuffled token join would have (every "the"
    * row landing on one reducer). At vocabularies too big to broadcast,
    * drop the hint and let AQE's skew-join split the hot keys — the
    * tf shape (one row per DISTINCT (doc, token)) already bounds the
    * skew to one row per document. Per-doc scores round to 6dp, slice
    * aggregates to 4dp (double-sum combine order, same convention as
    * q57's tfidf). */
  def unigramScore(df: DataFrame, textCol: String, idCol: String,
                   sliceCol: String): DataFrame = {
    val tok = df.repartition(col(idCol)).select(
      col(idCol).as("id"), col(sliceCol).as("__slice"),
      explode(tokens(col(textCol))).as("__t"))
    val tf = tok.groupBy(col("id"), col("__t")).agg(
      first(col("__slice")).as("__slice"), count(lit(1)).as("__m"))
    val vocab = tf.groupBy(col("__t")).agg(sum(col("__m")).as("__cnt"))
    val total = vocab.agg(sum(col("__cnt")).as("__total"))
    val perDoc = tf.join(broadcast(vocab), Seq("__t"))
      .crossJoin(broadcast(total))
      .groupBy(col("id")).agg(
        first(col("__slice")).as("__slice"),
        round(
          sum(col("__m") * (log(col("__cnt")) - log(col("__total")))) /
            sum(col("__m")), 6).as("doc_lp"))
    perDoc.groupBy(col("__slice").as(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("doc_lp")), 4).as("avg_logprob"),
        round(min(col("doc_lp")), 6).as("min_logprob"),
        round(max(col("doc_lp")), 6).as("max_logprob"))
      .orderBy(col(sliceCol))
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection via
    * Importance Resampling"): per document, the mean token log-ratio
    * ln p_target(w) - ln p_corpus(w) between a TARGET slice's unigram
    * distribution and the whole corpus's, with +alpha smoothing so
    * tokens absent from the target stay finite. Positive scores mark
    * documents that look like the target domain — the weights behind
    * "select web data that resembles Wikipedia". Feed the score to
    * `Sampling.weightedSample`/`bottomQuantileDrop` to realize the
    * selection.
    *
    * Same single-chain shape as [[unigramScore]]: one explode into a
    * (doc, token) tf aggregate carrying the target flag; BOTH
    * distributions derive from that one aggregate (no second corpus
    * scan); vocabulary joins back broadcast with the same skew note. */
  def dsirScore(df: DataFrame, textCol: String, idCol: String,
                isTarget: Column, sliceCol: String,
                alpha: Double = 0.5): DataFrame = {
    val tok = df.repartition(col(idCol)).select(
      col(idCol).as("id"), col(sliceCol).as("__slice"),
      isTarget.as("__tgt"), explode(tokens(col(textCol))).as("__t"))
    val tf = tok.groupBy(col("id"), col("__t")).agg(
      first(col("__slice")).as("__slice"), first(col("__tgt")).as("__tgt"),
      count(lit(1)).as("__m"))
    val vocab = tf.groupBy(col("__t")).agg(
      sum(col("__m")).as("__cs"),
      sum(when(col("__tgt"), col("__m")).otherwise(0L)).as("__ct"))
    val totals = vocab.agg(sum(col("__cs")).as("__ns"),
      sum(col("__ct")).as("__nt"), count(lit(1)).as("__v"))
    val a = lit(alpha)
    val logRatio =
      (log(col("__ct") + a) - log(col("__nt") + a * col("__v"))) -
        (log(col("__cs") + a) - log(col("__ns") + a * col("__v")))
    val perDoc = tf.join(broadcast(vocab), Seq("__t"))
      .crossJoin(broadcast(totals))
      .groupBy(col("id")).agg(
        first(col("__slice")).as("__slice"),
        round(sum(col("__m") * logRatio) / sum(col("__m")), 6).as("score"))
    perDoc.groupBy(col("__slice").as(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_target_like"),
        round(avg(col("score")), 4).as("avg_score"))
      .orderBy(col(sliceCol))
  }

  /** Sequence-length distribution — the report every training pipeline
    * publishes before fixing a context length or packing strategy: per
    * slice, documents bucketed by power-of-two token count (bucket b
    * holds [2^b, 2^(b+1))), with doc counts, token mass, and the
    * within-slice share. Buckets come from the binary digit count of
    * the integer token count — exact integer arithmetic on both
    * engines, no floor(log2(x)) float edge cases at the powers of two.
    * One scan + one map-side-combined aggregate; the share window runs
    * over the aggregated (slice, bucket) frame only (~60 rows per
    * slice at any corpus size). */
  def lengthHistogram(df: DataFrame, textCol: String, idCol: String,
                      sliceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = df.select(col(sliceCol).as("__slice"),
      tokenCount(col(textCol)).as("__n"))
    val bucket = (length(bin(col("__n"))) - 1).cast("long")
    val lo = pow(lit(2.0), col("bucket")).cast("long")
    counted.select(col("__slice"), col("__n"), bucket.as("bucket"))
      .groupBy(col("__slice").as(sliceCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("sum_tokens"))
      .withColumn("lo", lo)
      .withColumn("hi", lo * 2 - 1)
      .withColumn("share_pct",
        round(col("n_docs") * 100.0 /
          sum(col("n_docs")).over(Window.partitionBy(col(sliceCol))), 4))
      .select(col(sliceCol), col("bucket"), col("lo"), col("hi"),
        col("n_docs"), col("sum_tokens"), col("share_pct"))
      .orderBy(col(sliceCol), col("bucket"))
  }

  /** Sliding token-window chunking — the op feeding embedding and
    * context-window pipelines: chunk k covers token positions
    * [k*stride, k*stride + chunkTokens). With stride < chunkTokens
    * chunks overlap; stride == chunkTokens tiles. Emits
    * (id, chunk, n_tokens, chunk_text), ordered.
    *
    * Shape: posexplode -> per-token chunk-membership fan-out (bounded by
    * ceil(chunkTokens/stride), a constant) -> one aggregate. Chunk text
    * reassembles via array_sort over collected (pos, token) structs —
    * an interpreted lambda, but once per CHUNK over <= chunkTokens
    * elements, not per token. The lower chunk bound guards pos <
    * chunkTokens with a conditional instead of dividing a negative
    * (floor vs truncate-toward-zero differs across engines). */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                chunkTokens: Int = 32, stride: Int = 16): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      "need 0 < stride <= chunkTokens")
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    // non-negative operands only, so floor(double div) == integer div
    val lo = when(col("pos") < chunkTokens, lit(0L))
      .otherwise(floor((col("pos") - chunkTokens) / lit(stride)) + 1)
      .cast("long")
    val hi = floor(col("pos") / lit(stride)).cast("long")
    val memb = tok.select(col("id"), col("pos"), col("t"),
      explode(sequence(lo, hi)).as("chunk"))
    memb.groupBy(col("id"), col("chunk"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          s => s.getField("t")), " ").as("chunk_text"))
      .orderBy(col("id"), col("chunk"))
  }

  /** Vocabulary pruning — the closed-vocab LM preprocessing step:
    * replace tokens whose CORPUS-WIDE occurrence count is below
    * `minCount` with `unk`, reassembling each document in token order.
    * Returns (id, text, n_unk).
    *
    * Scale shape: the frequency table is one partial-agg'd groupBy of
    * 8-byte-ish token rows (|vocab| results — tiny after pruning is
    * worth doing); the join back is token-keyed, and reassembly is the
    * same array_sort(collect_list) per document as `chunkDocs` — one
    * doc-keyed shuffle, bounded by document length. The collect_list
    * is per document, never per corpus. */
  def unkRewrite(df: DataFrame, textCol: String, idCol: String,
                 minCount: Long, unk: String = "<unk>"): DataFrame = {
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("__n"))
    tok.join(freq, Seq("t"), "left")
      .select(col("id"), col("pos"),
        when(col("__n") >= minCount, col("t")).otherwise(lit(unk)).as("t2"))
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("t2")))),
          s => s.getField("t2")), " ").as("text"),
        sum(when(col("t2") === unk, 1L).otherwise(0L)).as("n_unk"))
  }

  /** Within-document repetition ratio (the Gopher boilerplate rule):
    * 1 - distinct_ngrams/total_ngrams per doc. Spam and templated text
    * repeat phrases; clean prose mostly doesn't. Emits (id,
    * total_ngrams, distinct_ngrams, rep_ratio). Same explode + lead
    * window as the dedup shingles; docs with fewer than n tokens have
    * no n-grams and drop out (they're `too_short` for qualityFilter
    * anyway). */
  def repetitionRatio(df: DataFrame, textCol: String, idCol: String,
                      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val leads = (1 until n).map(j => lead(col("t"), j).over(w))
    val grams = tok
      .select(col("id"), concat_ws(" ", col("t") +: leads: _*).as("g"),
        leads.last.isNotNull.as("__full"))
      .filter(col("__full"))
    grams.groupBy(col("id")).agg(
        count(lit(1)).as("total_ngrams"),
        countDistinct(col("g")).as("distinct_ngrams"))
      .select(col("id"), col("total_ngrams"), col("distinct_ngrams"),
        round(lit(1.0) - col("distinct_ngrams").cast("double") /
          col("total_ngrams"), 6).as("rep_ratio"))
      .orderBy(col("id"))
  }

  /** Lexical diversity (type-token ratio) per corpus slice: distinct
    * token types vs total token occurrences, both per average document
    * and pooled across the slice. Low pooled TTR flags templated or
    * machine-generated slices that per-document metrics miss (every doc
    * distinct, corpus vocabulary tiny). Complements `repetitionRatio`
    * (within-doc phrase reuse) with the across-doc vocabulary view.
    *
    * Shape: one explode, then a single hash aggregate per slice with a
    * distinct-count — Spark plans `countDistinct` as a two-stage
    * partial/expand aggregate, so token rows never concentrate on one
    * node. At 100 TB swap the exact distinct for `approx_count_distinct`
    * behind the same signature (the q43/q54 cardinality pattern). */
  def ttrBySlice(df: DataFrame, textCol: String, idCol: String,
                 sliceCol: String): DataFrame =
    df.repartition(col(idCol))
      .select(col(sliceCol).as("slice"), col(idCol).as("id"),
        explode(tokens(col(textCol))).as("t"))
      .groupBy(col("slice")).agg(
        countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("total_tokens"),
        countDistinct(col("t")).as("distinct_tokens"))
      .select(col("slice"), col("n_docs"), col("total_tokens"),
        col("distinct_tokens"),
        round(col("distinct_tokens").cast("double") /
          col("total_tokens"), 6).as("pooled_ttr"),
        round(col("total_tokens").cast("double") / col("n_docs"), 2)
          .as("avg_doc_tokens"))
      .orderBy(col("slice"))

  /** PII-pattern scan (the C4-style scrub diagnostic): per-document
    * counts of email-, phone-, and long-digit-run-shaped substrings.
    * Pure regexp_count projections — codegen'd, shuffle-free. The
    * patterns are deliberately simple/portable (no lookarounds) so the
    * same regexes run in any engine. */
  def piiScan(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      regexp_count(col(textCol),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
        .cast("long").as("n_emails"),
      regexp_count(col(textCol),
        lit("\\+?[0-9][0-9() -]{7,}[0-9]")).cast("long").as("n_phones"),
      regexp_count(col(textCol), lit("[0-9]{9,}"))
        .cast("long").as("n_long_digit_runs"))

  /** Blocklist / safety-wordlist scan — the C4 "bad words" gate
    * (Raffel et al. 2020 drop any page containing a listed word; every
    * production web corpus runs some variant before training). Per
    * doc: hit count plus the sorted distinct list of terms that fired,
    * so the policy layer can choose drop / mask / downweight and the
    * list itself can be audited.
    *
    * Matching is case-insensitive on WORD BOUNDARIES, so "class" can
    * never fire a blocklisted "ass" and the oracle replays the scan
    * verbatim — with one measured seam: Java's `\b` is Unicode-aware
    * (no boundary inside `"aé"`) while RE2's is ASCII; the engines
    * agree wherever terms abut ASCII or true separators, i.e. on the
    * whole oracle corpus (see [[blocklistScanLarge]]'s scaladoc).
    * Terms are regex-escaped (they are WORDS, not patterns)
    * and matched in one alternation pass; the matched-term list is
    * lowercased then sorted so verdict text is engine-stable.
    *
    * 100 TB shape: one codegen'd projection per row (the list compiles
    * into a single automaton), no shuffle, no state — the gate runs at
    * scan speed. A list of ~10³ terms (the published C4 list's size)
    * is still one linear-scan automaton; beyond that, front an
    * Aho-Corasick mapPartitions tier the way compressionRatio fronts
    * its codec. */
  def blocklistScan(df: DataFrame, textCol: String, idCol: String,
                    terms: Seq[String]): DataFrame =
    df.select(col(idCol).as("id"),
      blocklistHitCount(col(textCol), terms).as("n_hits"),
      blocklistTermsHit(col(textCol), terms).as("terms_hit"))

  /** The [[blocklistScan]] alternation: every term regex-escaped (they
    * are WORDS, not patterns; `\Q...\E` is honored by Java and RE2
    * alike) inside one case-insensitive word-boundary group. */
  def blocklistPattern(terms: Seq[String]): String = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    s"(?i)\\b(${terms.map(java.util.regex.Pattern.quote).mkString("|")})\\b"
  }

  /** Count of blocklisted-term occurrences in `text` (column tier of
    * [[blocklistScan]] — composable into any projection). */
  def blocklistHitCount(text: Column, terms: Seq[String]): Column =
    coalesce(size(regexp_extract_all(text, lit(blocklistPattern(terms)),
      lit(1))), lit(0)).cast("long")

  /** Sorted distinct lowercased terms that fired, comma-joined —
    * engine-stable verdict text ('' when clean). */
  def blocklistTermsHit(text: Column, terms: Seq[String]): Column =
    array_join(array_sort(array_distinct(transform(
      regexp_extract_all(text, lit(blocklistPattern(terms)), lit(1)),
      lower(_)))), ",")

  /** SCALE tier of [[blocklistScan]] for LARGE term lists. The regex
    * tier compiles the list into one alternation — fine to ~10³ terms,
    * but a 10⁵-term list (multilingual blocklists, merged policy
    * sets) makes pattern compilation and per-position alternation the
    * bottleneck. This tier is the `mapPartitions` codec shape
    * (`compressionRatio` precedent): one lowercased HashSet per
    * PARTITION, each row scanned once for maximal ASCII word-char runs
    * ([A-Za-z0-9_]+ — exactly Java/RE2 `\w`), each run membership-
    * tested — O(text + hits) per row, constant in list size.
    *
    * Restricted to single-word ASCII terms (`\w+`), the dominant
    * blocklist form — under that restriction a word-boundary regex
    * match IS a whole-token match (a `\w`-only term bounded by `\b` on
    * both sides cannot sit inside a longer word-char run), so this
    * tier returns BIT-IDENTICAL (id, n_hits, terms_hit) rows to
    * [[blocklistScan]] — the equality is property-tested (including
    * non-ASCII seams), and q197 carries q193's oracle shape against
    * this tier to pin it cross-engine. Multi-word or metachar terms
    * stay on the regex tier.
    *
    * Boundary semantics are JAVA's: Java's `\b` is Unicode-aware even
    * with ASCII `\w` (a measured JDK asymmetry — `"aé"` has no
    * boundary between the chars for `\b` although `\w` won't match
    * the é), so the token scanner treats any Unicode letter/digit as
    * a word char. RE2's `\b` is ASCII — the engines agree wherever
    * blocklisted terms abut ASCII or true separators (all realistic
    * text; the oracle corpus is pure ASCII), and the property test
    * pins the Spark-side tiers equal across the seam itself. */
  def blocklistScanLarge(df: DataFrame, textCol: String, idCol: String,
                         terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist needs at least one term")
    require(terms.forall(_.matches("[A-Za-z0-9_]+")),
      "blocklistScanLarge handles single-word ASCII terms only; " +
        "use blocklistScan (regex tier) for phrases/metachars")
    val spark = df.sparkSession
    import spark.implicits._
    val set = terms.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val bc = spark.sparkContext.broadcast(set)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val vocab = bc.value
        rows.map { case (id, text) =>
          if (text == null) (id, 0L, null.asInstanceOf[String])
          else {
          var hits = 0L
          var fired = Set.empty[String]
          var i = 0
          val n = text.length
          while (i < n) {
            // maximal word-char run under Java-\b semantics: any
            // Unicode letter/digit or underscore (see scaladoc)
            var j = i
            while (j < n && (text.charAt(j).isLetterOrDigit ||
              text.charAt(j) == '_')) j += 1
            if (j > i) {
              val w = text.substring(i, j).toLowerCase(java.util.Locale.ROOT)
              if (vocab.contains(w)) { hits += 1; fired += w }
              i = j
            } else i += 1
          }
          (id, hits, fired.toSeq.sorted.mkString(","))
          }
        }
      }
      .toDF("id", "n_hits", "terms_hit")
  }

  /** PII redaction APPLIED (the scrub step `piiScan` diagnoses):
    * email-, phone-, and long-digit-run-shaped substrings replaced with
    * fixed tags. Pure chained regexp_replace (global by default in
    * Spark; external engines need their 'g' flag) — codegen'd,
    * shuffle-free, order of passes fixed so overlapping matches resolve
    * deterministically. */
  def piiRedact(text: Column): Column = {
    // Order matters: emails first (their local parts may contain digit
    // runs), then raw digit runs (IDs/account numbers), then phone-shaped
    // sequences — the phone pattern also matches any 9+ digit run, so it
    // must come LAST or the digits pass is unreachable.
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val digits = regexp_replace(email, "[0-9]{9,}", "<DIGITS>")
    regexp_replace(digits, "\\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>")
  }

  /** Compression-ratio quality proxy: deflate(text).length /
    * text.length. Highly repetitive or templated text compresses far
    * below clean prose (~0.4-0.6); random noise approaches 1. This is
    * the one TextStats op that genuinely needs per-row imperative code
    * (a codec), so it is the module's mapPartitions tier: iterator-in /
    * iterator-out, one Deflater per PARTITION (not per row), no
    * shuffle, streaming through each partition. Level 6, fixed
    * strategy — deterministic for a given input. Returns
    * (id, n_bytes, n_compressed, compression_ratio). */
  def compressionRatio(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        rows.map { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio = if (bytes.length > 0) n.toDouble / bytes.length else 1.0
          (id, bytes.length.toLong, n, math.rint(ratio * 1e6) / 1e6)
        }
      }
      .toDF("id", "n_bytes", "n_compressed", "compression_ratio")
  }

  /** Stable document fingerprint for exact dedup: md5 of
    * case-and-whitespace-normalized text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Corpus-wide top-k word n-grams — vocabulary/phrase frequency, the
    * first diagnostic of any text corpus (and the input to BPE-merge or
    * stopword-list construction). Same explode + lead shape as the
    * dedup shingles but WITHOUT per-document distinct: counts are
    * occurrence counts. One window shuffle + one partial-aggregated
    * count + TakeOrderedAndProject. */
  def topNgrams(df: DataFrame, textCol: String, idCol: String,
                n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val leads = (1 until n).map(j => lead(col("t"), j).over(w))
    val grams =
      if (n == 1) tok.select(col("t").as("ngram"))
      else tok
        .select(concat_ws(" ", col("t") +: leads: _*).as("ngram"),
          leads.last.isNotNull.as("__full"))
        .filter(col("__full"))
        .select("ngram")
    grams.groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(k)
  }

  /** Chi-square TERM–LABEL association (supervised feature selection,
    * the Yang–Pedersen 1997 ranking): for every term with document
    * frequency ≥ `minDf`, the 2×2 presence/label chi-square —
    * N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) over the per-DOCUMENT
    * contingency counts — top `k` terms by statistic. The
    * vocabulary-selection step in front of any trained gate (the q198
    * classifier hashes blindly; this is the readout of WHICH surface
    * forms carry the label).
    *
    * Exactness: all four cells derive from BIGINT document counts and
    * the statistic's numerator/denominator fold as DECIMAL(38,0), so
    * the single closing division is deterministic cross-engine.
    * Scale: per-doc term presence via `array_distinct` INSIDE the
    * explode (no doc-keyed exchange — dedup happens in the row), one
    * map-side-combined term aggregate, corpus totals ride a broadcast
    * single-row frame; minDf prunes the term frame before the join. */
  def chiSquareTerms(df: DataFrame, textCol: String, idCol: String,
                     labelCol: Column, minDf: Long = 5L,
                     k: Int = 25): DataFrame = {
    val docTerms = df.select(labelCol.cast("long").as("y"),
      explode(array_distinct(tokens(col(textCol)))).as("term"))
    val totals = df.agg(count(lit(1)).as("n_docs"),
      sum(labelCol.cast("long")).as("n_pos"))
    val perTerm = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("df_term"), sum(col("y")).as("df_pos"))
      .where(col("df_term") >= minDf)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val a = dec(col("df_pos"))
    val b = dec(col("df_term") - col("df_pos"))
    val c2 = dec(col("n_pos") - col("df_pos"))
    val d2 = dec(col("n_docs") - col("n_pos") - col("df_term") +
      col("df_pos"))
    val det = a * d2 - b * c2
    val denom = (a + b) * (c2 + d2) * (a + c2) * (b + d2)
    perTerm.crossJoin(broadcast(totals))
      .select(col("term"), col("df_term"), col("df_pos"),
        when(denom > 0, round((dec(col("n_docs")) * det * det)
          .cast("double") / denom.cast("double"), 6)).as("chi2"))
      .orderBy(col("chi2").desc_nulls_last, col("term").asc)
      .limit(k)
  }

  /** N-gram DIVERSITY per group: distinct/total n-gram ratio at n =
    * 1..maxN — the repetition-collapse diagnostic (templated or
    * model-generated text shows diversity falling off a cliff as n
    * grows; natural text stays high). The corpus-level cousin of the
    * per-document repetition score (q58).
    *
    * One tokenize + one lead window + ONE aggregate: every n's gram is
    * built from the same window pass and stacked via explode, so the
    * corpus is scanned once regardless of maxN. The exact distinct is
    * the oracle tier; at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (the q54 HLL dial) — totals and the
    * collapse signal survive the 2% error. */
  def ngramDiversity(df: DataFrame, textCol: String, idCol: String,
                     groupCol: String, maxN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxN >= 1, "maxN must be at least 1")
    val tok = df.repartition(col(idCol))
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    // leads materialize in their own projection first — a window
    // expression cannot live inside the generator below
    val withLeads = tok.select(col("grp") +: col("t") +:
      (1 until maxN).map(j => lead(col("t"), j).over(w).as(s"__l$j")): _*)
    val gramsByN = (1 to maxN).map { n =>
      val parts = col("t") +: (1 until n).map(j => col(s"__l$j"))
      // concat_ws SKIPS nulls (would silently shorten the gram), so an
      // incomplete tail window is nulled out explicitly and dropped
      val gram = if (n == 1) col("t")
        else when(col(s"__l${n - 1}").isNotNull, concat_ws(" ", parts: _*))
      struct(lit(n).as("n"), gram.as("ngram"))
    }
    withLeads.select(col("grp"), explode(array(gramsByN: _*)).as("g"))
      .select(col("grp"), col("g.n").as("n"), col("g.ngram").as("ngram"))
      .filter(col("ngram").isNotNull)
      .groupBy(col("grp"), col("n")).agg(
        count(lit(1)).as("total_ngrams"),
        countDistinct(col("ngram")).as("distinct_ngrams"))
      .select(col("grp").as(groupCol), col("n"),
        col("total_ngrams"), col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 6)
          .as("diversity"))
      .orderBy(col(groupCol), col("n"))
  }

  /** TF-IDF term scores: tf(doc, term) x ln(N / df(term)). The corpus
    * size N comes from a broadcast single-row aggregate (never a driver
    * collect), document frequency from one aggregate over the (doc,
    * term) counts; the only corpus-sized shuffles are the two hash
    * aggregates and the term-keyed join. Returns
    * (id, term, tf, score[rounded 4dp]).
    *
    * Ranking note: callers wanting top terms per doc compose with
    * `Analytics.topNPerGroup` on (score desc, term asc); oracle-compared
    * outputs should order by (id, term) instead, so cross-engine
    * 1-ulp `ln` differences can never flip a row order. */
  def tfidf(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    tf.join(docFreq, Seq("term"))
      .join(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 4)
          .as("score"))
  }

  /** Sparse TF-IDF cosine document similarity — the sparse-vector
    * complement of the dense-embedding tiers: pairwise cosine over
    * [[tfidf]] weight vectors, computed as a term-keyed sparse dot
    * product (documents sharing no surviving term never meet). Terms
    * with df > `maxDfFrac` × corpus size are dropped BEFORE the pair
    * join — stopword-grade terms would pair everything with everything
    * — and norms use the SURVIVING terms, so the score is exactly the
    * cosine of the capped vectors.
    *
    * Small-corpus cliff: the cap is corpus-relative, so for n <=
    * 1/maxDfFrac documents ceil(n × maxDfFrac) = 1 keeps only df = 1
    * terms — and two documents can never share a df = 1 term, so the
    * result is ALWAYS EMPTY below that corpus size (n <= 10 at the
    * default 0.1). Intended: a "stopword" fraction is meaningless on a
    * handful of documents; pass a larger maxDfFrac there.
    *
    * Pair generation is PREFIX-FILTERED (Bayardo, Ma & Srikant, WWW
    * 2007 "Scaling Up All Pairs Similarity Search"): each document
    * orders its surviving terms rarest-df-first and indexes only the
    * leading terms whose inclusive suffix norm is still >= minCosine ×
    * its full norm. For any pair with cos >= t, the first shared term
    * (in the global df order) sits in BOTH prefixes — cos <=
    * suffixNorm_a × suffixNorm_b normalized, and each factor <= 1, so
    * each factor >= t — hence candidate generation over the prefix
    * index is EXACT, not approximate; candidates are then verified by
    * the full sparse dot over all surviving shared terms. This removes
    * the Σdf² detonation the fractional cap allowed: a mid-frequency
    * term at the cap (df ~ maxDfFrac·n, potentially 10⁸ docs at the
    * 100 TB design point) lands at the END of every doc's order and is
    * indexed only by docs whose weight mass is concentrated on it; the
    * quadratic join runs over prefix terms, whose fan-out the
    * threshold bounds, never over every capped term.
    *
    * Scale shape: one explode feeds the map-side-combined tf aggregate;
    * df aggregates over the Heaps-bounded term frame; the weight table
    * is materialized once and serves the one id-partitioned window
    * (suffix norms + full norms in a single exchange), both verify
    * sides, and the norm joins; candidate fan-out is threshold-bounded
    * by construction and moves (term, id) rows only. Returns (id_a,
    * id_b, cos_sim >= minCosine) ordered. */
  def tfidfCosinePairs(df: DataFrame, textCol: String, idCol: String,
                       minCosine: Double = 0.5,
                       maxDfFrac: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    // the cap is CORPUS-RELATIVE (df <= maxDfFrac * n): an absolute cap
    // silently empties the tier as the corpus grows, while a fraction
    // keeps "stopword-grade" meaning the same thing at every scale
    // (fan-out safety comes from the prefix filter, not this cap)
    val w = tf.join(docFreq, Seq("term"))
      .join(broadcast(n))
      .filter(col("df") <= ceil(col("n") * maxDfFrac))
      .select(col("id"), col("term"), col("df"),
        (col("tf") * log(col("n").cast("double") / col("df"))).as("w"))
      .localCheckpoint(true) // window + both verify sides + norm joins
    // global term order: rare terms first (their index fan-out is the
    // df they carry), ties broken by term so the order is total; one
    // id-partitioned exchange computes the inclusive suffix norm AND
    // the full norm
    val byDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("term").asc)
    val w2 = col("w") * col("w")
    val withSuffix = w.select(col("id"), col("term"), col("w"),
      sum(w2).over(byDoc.rowsBetween(Window.currentRow,
        Window.unboundedFollowing)).as("sfx2"),
      sum(w2).over(byDoc.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)).as("nrm2"))
    // index a term iff the suffix (this term onward) could still carry
    // cos >= t on its own: sfx2 >= t² · nrm2. The 1e-9 relative slack
    // guards the one failure mode floating summation adds — a
    // borderline pair pruned by an ulp — at the cost of indexing a
    // vanishing sliver more; the final filter below is exact either way.
    val prefix = withSuffix
      .filter(col("sfx2") >= lit(minCosine * minCosine * (1 - 1e-9)) * col("nrm2"))
      .select(col("term"), col("id"))
    val cand = prefix.toDF("term", "id_a")
      .join(prefix.toDF("term", "id_b"), Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // exact verify: full sparse dot over ALL surviving shared terms of
    // each candidate (the prefix only gated candidate generation)
    val dots = cand
      .join(w.select(col("id").as("id_a"), col("term"), col("w").as("wa")),
        Seq("id_a"))
      .join(w.select(col("id").as("id_b"), col("term"), col("w").as("wb")),
        Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("wa") * col("wb")).as("dot"))
    val norms = w.groupBy(col("id"))
      .agg(sqrt(sum(w2)).as("nrm"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), Seq("id_b"))
      // explicit zero-norm exclusion: at maxDfFrac = 1.0 a doc whose
      // every term has df = n carries all-zero idf weights, and 0/0
      // would ride NaN comparison semantics instead of a decision
      .filter(col("na") > 0 && col("nb") > 0)
      .filter(col("dot") / (col("na") * col("nb")) >= minCosine)
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Okapi BM25 term scores — the retrieval-ranking upgrade of [[tfidf]]
    * (Robertson & Zaragoza 2009): idf saturates rare terms
    * (ln(1 + (N - df + 0.5)/(df + 0.5)), the Lucene non-negative form)
    * and term frequency saturates with k1 while normalizing by document
    * length against the corpus average (b) — the scoring function a
    * retrieval/RAG indexing pipeline materializes per (doc, term).
    *
    * Determinism: every factor is a fixed double expression over exact
    * integer counts (tf, df, dl, N) with constants combined at runtime
    * in the same order as the SQL twin — avgdl is an explicit
    * sum/count, never the engine's avg() internals — so scores are
    * bit-reproducible across engines (4dp display rounding on top).
    *
    * Scale: same budget as [[tfidf]] — one explode, two map-side
    * combined aggregates (tf, then df over the Heaps'-bounded term
    * frame), doc lengths ride a third aggregate of the tf frame, and
    * N/avgdl travel as a broadcast 1-row aggregate; the df join is
    * term-keyed with AQE handling the hot-term tail. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(docFreq, Seq("term"))
      .join(dl, Seq("id"))
      .join(broadcast(totals))
      .select(col("id"), col("term"), col("tf"),
        round(idf * tfNorm, 4).as("score"))
  }

  /** BM25 QUERY-SERVING tier — [[bm25]] turned around: score every
    * document against ONE literal term set and return the top `k`
    * (the lexical half of a hybrid retrieval stack; the semantic half
    * is `Similarity.bruteForceTopK`/IVF, fused by
    * `Similarity.rrfFuse`). Same idf/tf-normalization expression trees
    * as [[bm25]] so the two tiers can never disagree on a score.
    *
    * Determinism: per-(doc, term) scores round to 4dp (the q131
    * resolution) and SUM AS DECIMAL — order-independent addition, so
    * the per-doc total cannot drift with partitioning; ranking ties
    * break on id. `excludeId` drops the query's own source document
    * from the RESULTS while keeping it in the corpus statistics
    * (retrieval semantics: the corpus is what it is).
    *
    * Scale: document length is a per-row `tokenCount` projection (no
    * explode needed for dl), the explode filters to QUERY TERMS ONLY
    * before anything aggregates — the moved volume is O(corpus query-
    * term hits), not O(corpus tokens) — and df/totals ride broadcast
    * bounded frames. */
  def bm25Search(df: DataFrame, textCol: String, idCol: String,
                 query: Seq[String], k: Int = 10,
                 excludeId: Option[Long] = None,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25Search needs at least one query term")
    val docs = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("__dl", tokenCount(col("__text")))
    val totals = docs.agg(count(lit(1)).as("n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = docs
      .select(col("id"), col("__dl"),
        explode(tokens(col("__text"))).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy(col("id"), col("__dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("avgdl")))
    val scored = tf.join(docFreq, Seq("term"))
      .join(broadcast(totals))
      .select(col("id"),
        round(idf * tfNorm, 4).cast("decimal(20,4)").as("__ts"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("terms_hit"), sum(col("__ts")).as("__sum"))
      .select(col("id"), col("terms_hit"),
        col("__sum").cast("double").as("score"))
    excludeId.fold(scored)(x => scored.where(col("id") =!= x))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Word n-gram shingles (n>=1) as space-joined strings; documents
    * shorter than n tokens yield their full token string as one shingle
    * so no row silently drops out of dedup. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Collocation mining by pointwise mutual information: bigrams whose
    * observed co-occurrence beats the independence expectation by
    * `minPmi` nats, with a `minCount` support floor (PMI's classic
    * failure mode is hapax pairs scoring infinitely high — the floor
    * is the published fix). The multiword-expression detector run
    * before tokenizer/vocabulary decisions.
    *
    * PMI is computed as ln(c2) + ln(T1) + ln(T1) - ln(T2) - ln(ca) -
    * ln(cb) — each ln on an exact integer count, summed in one fixed
    * expression tree — rather than ln of a product whose integer
    * arithmetic would exceed double exactness on corpus-scale totals.
    *
    * Scale: unigram and bigram counts are two map-side-combined
    * aggregates over the same explode; totals are broadcast 1-row
    * aggregates; the count joins are token-keyed with Heaps'-bounded
    * broadcast sides (AQE skew-join fallback past the ceiling). */
  def collocations(df: DataFrame, textCol: String, idCol: String,
                   minCount: Long = 5, minPmi: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("__pos"))
    val tok = df.repartition(col(idCol))
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__t")))
    val uni = tok.groupBy(col("__t")).agg(count(lit(1)).as("__c1"))
    val t1 = uni.agg(sum(col("__c1")).as("__t1"))
    val bg = tok
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__t").as("w1"), col("__next").as("w2"))
      .agg(count(lit(1)).as("pair_count"))
    val t2 = bg.agg(sum(col("pair_count")).as("__t2"))
    val pmi = log(col("pair_count")) + log(col("__t1")) + log(col("__t1")) -
      log(col("__t2")) - log(col("__ca")) - log(col("__cb"))
    bg.filter(col("pair_count") >= minCount)
      .join(broadcast(uni.select(col("__t").as("w1"), col("__c1").as("__ca"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("__t").as("w2"), col("__c1").as("__cb"))),
        Seq("w2"))
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .withColumn("pmi", round(pmi, 4))
      .filter(col("pmi") >= minPmi)
      .select(col("w1"), col("w2"), col("pair_count"), col("pmi"))
      .orderBy(col("w1"), col("w2"))
  }

  /** Zipf rank-frequency fit: least-squares slope of ln(freq) against
    * ln(rank) over the token frequency table — natural corpora sit
    * near slope -1; templated/synthetic text flattens toward 0 and
    * boilerplate-dominated crawls steepen past -1, so the slope is a
    * one-number corpus-health signal (and its r² says whether the
    * power law holds at all). Rank ties break by token asc (the q56
    * convention) so the fit is deterministic.
    *
    * The regression runs as explicit sums — n, Σx, Σy, Σxy, Σx² with
    * x = ln(rank), y = ln(freq), both ln's on exact integers — in one
    * fixed expression, not the engine's regr_* aggregates (whose
    * accumulation internals differ); 4dp rounding absorbs the
    * remaining double-sum combine-order noise.
    *
    * Scale: the top-`maxRank` slice is selected FIRST by a distributed
    * `orderBy(...).limit(maxRank)` (TakeOrderedAndProject — per-partition
    * top-V, merged on the driver side of the exchange), and only the
    * ≤ maxRank survivors pay the single-partition rank window. Ranking
    * the full vocabulary through one reducer before filtering (the
    * naive shape) would sort ~10^8 distinct tokens on one task at
    * crawl scale. Fitting on the head is also statistically sensible
    * (the head is where Zipf holds). */
  def zipfFit(df: DataFrame, textCol: String, idCol: String,
              maxRank: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df.repartition(col(idCol))
      .select(explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__cnt"))
    val ranked = tf
      .orderBy(col("__cnt").desc, col("__t").asc).limit(maxRank)
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__cnt").desc, col("__t").asc)))
      .select(log(col("__rank")).as("__x"), log(col("__cnt")).as("__y"))
    val n = col("__n").cast("double")
    val slope = (n * col("__sxy") - col("__sx") * col("__sy")) /
      (n * col("__sxx") - col("__sx") * col("__sx"))
    val intercept = (col("__sy") - slope * col("__sx")) / n
    val r2num = n * col("__sxy") - col("__sx") * col("__sy")
    val r2 = r2num * r2num /
      ((n * col("__sxx") - col("__sx") * col("__sx")) *
        (n * col("__syy") - col("__sy") * col("__sy")))
    ranked.agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select(col("__n").as("n_tokens_ranked"),
        round(slope, 4).as("zipf_slope"),
        round(intercept, 4).as("intercept"),
        round(r2, 4).as("r2"))
  }

  /** Vocabulary coverage report — the go/no-go check before freezing a
    * tokenizer or vocab list: build the top-`vocabSize` tokens by
    * corpus frequency (count desc, token asc — the q56 tie-break) and
    * report, per slice, the share of token OCCURRENCES covered and the
    * out-of-vocabulary mass. A slice whose OOV rate is an outlier is
    * drifting away from the vocabulary's training mix.
    *
    * Scale: the vocabulary is a TakeOrderedAndProject over the
    * Heaps'-bounded token frequency table (distributed top-V, never a
    * global window) and joins back broadcast; per-slice sums are one
    * map-side-combined aggregate over the (slice, token) tf frame. */
  def vocabCoverage(df: DataFrame, textCol: String, idCol: String,
                    sliceCol: String, vocabSize: Int = 1000): DataFrame = {
    val tok = df.repartition(col(idCol))
      .select(col(sliceCol).as("__slice"),
        explode(tokens(col(textCol))).as("__t"))
    val tf = tok.groupBy(col("__slice"), col("__t"))
      .agg(count(lit(1)).as("__m"))
    val vocab = tf.groupBy(col("__t")).agg(sum(col("__m")).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__t").asc).limit(vocabSize)
      .select(col("__t"), lit(true).as("__inv"))
    tf.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(col("__slice").as(sliceCol))
      .agg(sum(col("__m")).as("n_tokens"),
        sum(when(col("__inv"), col("__m")).otherwise(0L)).as("covered_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__inv"), 1L).otherwise(0L)).as("covered_distinct"))
      .withColumn("coverage_pct",
        round(col("covered_tokens") * 100.0 / col("n_tokens"), 4))
      .withColumn("oov_pct",
        round((col("n_tokens") - col("covered_tokens")) * 100.0 /
          col("n_tokens"), 4))
      .orderBy(col(sliceCol))
  }

  /** Shannon entropy of the token distribution per slice — the corpus
    * diversity dial (low entropy = templated/boilerplate-heavy slice,
    * high = lexically diverse; the signal behind "this crawl slice is
    * 40% the same cookie banner"). Reported in bits, with the
    * normalized form entropy/log2(V) in [0,1] for cross-slice
    * comparison at different vocabulary sizes.
    *
    * Math shape: H = log2(T) - sum(m*ln m)/(T*ln 2) over term counts m
    * with total T — one pass over the (slice, token) frequency table,
    * all per-term work on exact integers (ln of an integer count is
    * order-independent), only the final sum subject to combine-order
    * noise, absorbed by 4dp rounding (q99's convention).
    *
    * Scale: one explode + two map-side-combined aggregates; the final
    * per-slice reduce moves one row per distinct (slice, token) —
    * Heaps'-law bounded, never corpus-sized. */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String,
                   sliceCol: String): DataFrame = {
    val ln2 = math.log(2.0)
    val tf = df.repartition(col(idCol))
      .select(col(sliceCol).as("__slice"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__slice"), col("__t"))
      .agg(count(lit(1)).as("__m"))
    tf.groupBy(col("__slice").as(sliceCol))
      .agg(sum(col("__m")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("__m") * log(col("__m"))).as("__mlnm"))
      .withColumn("entropy_bits",
        round(log(2.0, col("n_tokens")) -
          col("__mlnm") / (col("n_tokens") * ln2), 4))
      .withColumn("norm_entropy",
        when(col("n_distinct") > 1,
          round((log(2.0, col("n_tokens")) -
            col("__mlnm") / (col("n_tokens") * ln2)) /
            log(2.0, col("n_distinct")), 4))
          .otherwise(lit(0.0)))
      .select(col(sliceCol), col("n_tokens"), col("n_distinct"),
        col("entropy_bits"), col("norm_entropy"))
      .orderBy(col(sliceCol))
  }

  /** Bigram-LM scoring — the conditional upgrade of [[unigramScore]]
    * and the closest oracle-checkable stand-in for the KenLM
    * perplexity filter: an MLE bigram model is trained on the corpus
    * itself (P(w|prev) = c(prev,w)/c(prev,·)), and each document is
    * scored by the mean log-probability of its bigram transitions.
    * Because the model is trained on the text being scored, every
    * observed bigram has count >= 1 — no smoothing needed, and the
    * math stays exactly reproducible in any SQL engine. Repetitive/
    * templated text scores near 0 (predictable transitions); documents
    * of rare transitions score very negative. Docs with < 2 tokens
    * have no transitions and drop out (counted nowhere — callers
    * screening for those use the length rules of [[gopherStats]]).
    *
    * Shape mirrors [[unigramScore]]: one explode + keyed window builds
    * the (doc, prev, cur, m) transition-frequency table; corpus bigram
    * counts AND context totals both derive from that same aggregate
    * (no second scan). The count joins are token-keyed with broadcast
    * hints — bigram vocabulary is Heaps'-bounded; at corpora where it
    * outgrows the broadcast ceiling, drop the hints and AQE's
    * skew-join splits the hot "the ->" keys, with skew already bounded
    * to one row per distinct (doc, transition). */
  def bigramScore(df: DataFrame, textCol: String, idCol: String,
                  sliceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("__pos"))
    val trans = df.repartition(col(idCol))
      .select(col(idCol).as("id"), col(sliceCol).as("__slice"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__cur")))
      .withColumn("__prev", lag(col("__cur"), 1).over(w))
      .filter(col("__prev").isNotNull)
    val tf = trans.groupBy(col("id"), col("__prev"), col("__cur")).agg(
      first(col("__slice")).as("__slice"), count(lit(1)).as("__m"))
    val big = tf.groupBy(col("__prev"), col("__cur"))
      .agg(sum(col("__m")).as("__c2"))
    val ctx = big.groupBy(col("__prev")).agg(sum(col("__c2")).as("__c1"))
    val perDoc = tf
      .join(broadcast(big), Seq("__prev", "__cur"))
      .join(broadcast(ctx), Seq("__prev"))
      .groupBy(col("id")).agg(
        first(col("__slice")).as("__slice"),
        round(sum(col("__m") * (log(col("__c2")) - log(col("__c1")))) /
          sum(col("__m")), 6).as("doc_lp"))
    perDoc.groupBy(col("__slice").as(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("doc_lp")), 4).as("avg_logprob"),
        round(min(col("doc_lp")), 6).as("min_logprob"),
        round(max(col("doc_lp")), 6).as("max_logprob"))
      .orderBy(col(sliceCol))
  }

  /** Interpolated Kneser-Ney bigram scoring — the SMOOTHED upgrade of
    * [[bigramScore]] and the standard LM-quality formulation (Kneser &
    * Ney 1995; Chen & Goodman 1999's interpolated variant with a fixed
    * absolute discount D):
    *
    *   P(cur|prev) = (c(prev,cur) - D) / c(prev)
    *               + (D * N1+(prev,·) / c(prev)) * P_cont(cur)
    *   P_cont(cur) = N1+(·,cur) / |distinct bigrams|
    *
    * Unlike the MLE score, rare continuations are discounted toward
    * how PROMISCUOUS the word is (how many contexts it follows), the
    * property that makes KN the production choice — "Francisco" is
    * frequent but follows only "San", so templated text can't hide
    * behind raw frequency. Self-scored (model trained on the corpus
    * being scored), every bigram has c >= 1 > D, so P > 0 with no
    * backoff path needed and the math stays exactly reproducible in
    * SQL: every term is a fixed arithmetic expression over exact
    * integer counts.
    *
    * Shape is [[bigramScore]] plus two Heaps'-bounded broadcast
    * frames: the context table gains a distinct-continuation count
    * (same aggregate, no extra scan), the continuation table is one
    * more vocabulary-sized aggregate of `big`, and the distinct-bigram
    * total is a 1-row broadcast. */
  def knBigramScore(df: DataFrame, textCol: String, idCol: String,
                    sliceCol: String, discount: Double = 0.75): DataFrame =
    knDocScores(df, textCol, idCol, sliceCol, discount)
      .groupBy(col("__slice").as(sliceCol)).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("doc_lp")), 4).as("avg_logprob"),
        round(min(col("doc_lp")), 6).as("min_logprob"),
        round(max(col("doc_lp")), 6).as("max_logprob"))
      .orderBy(col(sliceCol))

  /** Per-document interpolated-KN log-probabilities — the shared core
    * of [[knBigramScore]] and [[knPerplexityBuckets]]: returns
    * (id, __slice, doc_lp) with doc_lp rounded at 6dp, which makes
    * the SCORE itself the cross-engine contract (anything ordering or
    * aggregating on it downstream sees identical values in SQL). */
  private def knDocScores(df: DataFrame, textCol: String, idCol: String,
                          sliceCol: String, discount: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("__pos"))
    val trans = df.repartition(col(idCol))
      .select(col(idCol).as("id"), col(sliceCol).as("__slice"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__cur")))
      .withColumn("__prev", lag(col("__cur"), 1).over(w))
      .filter(col("__prev").isNotNull)
    val tf = trans.groupBy(col("id"), col("__prev"), col("__cur")).agg(
      first(col("__slice")).as("__slice"), count(lit(1)).as("__m"))
    val big = tf.groupBy(col("__prev"), col("__cur"))
      .agg(sum(col("__m")).as("__c2"))
    val ctx = big.groupBy(col("__prev"))
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1f"))
    val cont = big.groupBy(col("__cur")).agg(count(lit(1)).as("__n1b"))
    val totals = big.agg(count(lit(1)).as("__B"))
    // parenthesization is part of the cross-engine contract: the
    // oracle writes the identical association so both engines run the
    // same float expression tree over the same exact-integer counts
    val p = (col("__c2") - lit(discount)) / col("__c1") +
      (lit(discount) * col("__n1f") / col("__c1")) *
        (col("__n1b") / col("__B"))
    tf.join(broadcast(big), Seq("__prev", "__cur"))
      .join(broadcast(ctx), Seq("__prev"))
      .join(broadcast(cont), Seq("__cur"))
      .crossJoin(broadcast(totals))
      .groupBy(col("id")).agg(
        first(col("__slice")).as("__slice"),
        round(sum(col("__m") * log(p)) / sum(col("__m")), 6).as("doc_lp"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per slice
    * (CCNet's grain is per language), documents are ranked by their
    * [[knDocScores]] log-probability and split into `nBuckets` equal
    * tiles — head / middle / tail for the default 3 — the split real
    * curation pipelines keep, down-sample, or drop on. Returns per
    * (slice, bucket) membership stats; join the underlying scores
    * frame on id to materialize a kept set. Ordering ties (two docs
    * with the same 6dp score) break by id, so bucket assignment is
    * deterministic and engine-reproducible.
    *
    * Scale shape: [[knDocScores]]' exchanges plus ONE per-slice
    * window over the doc-level (id, score) frame — document-count
    * sized, text long gone. The window partitions by slice, so skew
    * is the largest slice's doc count; at the 100 TB design point
    * (one dominant language) pair with the rank-based quality-floor
    * tier (Sampling.qualityCutoff's shape) — same discipline as the
    * q73/q79 exact-vs-scale decile pair. */
  def knPerplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                          sliceCol: String, nBuckets: Int = 3,
                          discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__slice"))
      .orderBy(col("doc_lp").desc, col("id"))
    knDocScores(df, textCol, idCol, sliceCol, discount)
      .withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
      .groupBy(col("__slice").as(sliceCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("doc_lp")), 4).as("avg_logprob"),
        round(min(col("doc_lp")), 6).as("min_logprob"),
        round(max(col("doc_lp")), 6).as("max_logprob"))
      .orderBy(col(sliceCol), col("bucket"))
  }

  /** Cross-source RANK-ENSEMBLE calibration of quality signals: each
    * score column becomes its percent_rank WITHIN the document's
    * source, and the ensemble is the mean of those ranks. Raw quality
    * signals are not comparable across signals (different units) or
    * across sources (a "good" perplexity for code is a terrible one
    * for news — the reason CCNet buckets per language, Wenzek et al.
    * 2020); rank-averaging is the standard unit-free fix when a
    * curation run combines several independent signals (classifier +
    * LM score + heuristics) into one keep/drop ordering.
    *
    * Determinism contract: ranks order by (score asc, id asc) — the
    * id tie-break makes every rank reproducible. Each rank is the
    * exact rational (rn−1)/(n−1) rounded at 6dp via the INTEGER-EXACT
    * [[score6]] (never an engine `round(double)` — the measured Java
    * vs C midpoint seam), and the ensemble is score6 again over the
    * SUM of the 6dp-scaled integer ranks, so the whole tree is
    * engine-identical; a single-row source ranks 0.0. Higher rank =
    * better ONLY if every score column is higher-is-better; negate
    * columns where lower is better.
    *
    * Returns (id, source, r_<col>... , ensemble) ordered by id.
    *
    * Scale shape: ONE hash-partition exchange on the source column
    * serves all k rank windows (same partitioning, k sorts), and the
    * per-row mean adds no shuffle. Sources are provenance labels —
    * dozens — so per-partition skew is the per-source corpus size;
    * for a lopsided corpus rank within (source, md5-salt stratum)
    * upstream and this operator composes unchanged. */
  def rankEnsemble(df: DataFrame, idCol: String, sliceCol: String,
                   scoreCols: Seq[String]): DataFrame = {
    require(scoreCols.nonEmpty, "need at least one score column")
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("source"))
    val ranked = scoreCols.foldLeft(
      df.select(col(idCol).as("id") +: col(sliceCol).as("source") +:
        scoreCols.map(col): _*)) { (acc, sc) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(col(sc).asc, col("id").asc)
      acc.withColumn(s"__r6_$sc", score6(
        (row_number().over(w) - 1).cast("long") * lit(1000000L),
        greatest(count(lit(1)).over(wp) - 1, lit(1L))).cast("long"))
    }
    val ens = score6(scoreCols.map(sc => col(s"__r6_$sc")).reduce(_ + _),
      lit(scoreCols.size.toLong)) / lit(1000000.0)
    ranked.select(col("id") +: col("source") +:
        scoreCols.map(sc =>
          (col(s"__r6_$sc") / lit(1000000.0)).as(s"r_$sc")) :+
        ens.as("ensemble"): _*)
      .orderBy(col("id"))
  }

  /** Pairwise Jensen-Shannon divergence (in bits) between the unigram
    * token distributions of corpus groups — the DISTRIBUTIONAL
    * complement of the set-overlap matrix (`Dedup.sourceOverlap`): two
    * crawls can share 90% of their vocabulary yet weight it so
    * differently that mixing them shifts the training distribution.
    * Returns (src_a, src_b, shared_vocab, jsd_bits) for ALL group
    * pairs; disjoint-vocabulary pairs score exactly 1.0 bit.
    *
    * Only INTERSECTION tokens ever join: for tokens on one side only,
    * the JSD term collapses to p/2 * log2(2) summed = half the
    * unshared probability mass, and that mass is 1 - (shared mass),
    * already known from the intersection aggregate. So the pair join
    * is inner on token — no union-vocabulary outer join, no
    * null-handling, and per-token fan-out is bounded by |groups|²
    * like the overlap matrix.
    *
    * Scale shape: one explode + (group, token) aggregate
    * (vocabulary-sized output), one broadcast of |groups| totals, one
    * token-keyed self-join of the distribution frame, one per-pair
    * aggregate over two |groups|-row frames. Sum order differs across
    * engines, so the score rounds at 4dp (the q57/q99 convention). */
  def lexicalDivergence(df: DataFrame, textCol: String, idCol: String,
                        groupCol: String): DataFrame = {
    val tok = df.select(col(groupCol).as("src"),
      explode(tokens(col(textCol))).as("t"))
    val counts = tok.groupBy(col("src"), col("t"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col("src")).agg(sum(col("__c")).as("__n"))
    val dist = counts.join(broadcast(totals), Seq("src"))
      .select(col("src"), col("t"),
        (col("__c").cast("double") / col("__n")).as("p"))
    val shared = dist.select(col("src").as("src_a"), col("t"),
        col("p").as("pa"))
      .join(dist.select(col("src").as("src_b"), col("t"),
        col("p").as("pb")), Seq("t"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(
        count(lit(1)).as("shared_vocab"),
        sum(lit(0.5) * (col("pa") * log(lit(2.0) * col("pa")
            / (col("pa") + col("pb")))
          + col("pb") * log(lit(2.0) * col("pb")
            / (col("pa") + col("pb"))))).as("__s"),
        sum(col("pa")).as("__ma"), sum(col("pb")).as("__mb"))
    val ln2 = log(lit(2.0))
    broadcast(totals.select(col("src").as("src_a")))
      .join(broadcast(totals.select(col("src").as("src_b"))),
        col("src_a") < col("src_b"))
      .join(shared, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("shared_vocab"), lit(0L)).as("shared_vocab"),
        round((coalesce(col("__s"), lit(0.0))
          + lit(0.5) * ln2 * (lit(2.0) - coalesce(col("__ma"), lit(0.0))
            - coalesce(col("__mb"), lit(0.0)))) / ln2, 4).as("jsd_bits"))
  }

  /** BPE merge-table training ON-ENGINE (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units") —
    * learn `nMerges` subword merges from the corpus. The corpus is
    * touched exactly ONCE (the word-frequency aggregate), and the full
    * adjacent-pair count runs ONCE more on the initial vocabulary;
    * from then on the pair-count frame is maintained INCREMENTALLY
    * (the standard trainer optimization): a merge changes only the
    * pairs of words that actually contain it, so each round re-counts
    * just that touched slice (+new form, −old form) and folds the
    * deltas into the frame with one (l, r)-keyed aggregate — the
    * Heaps-bounded vocabulary never re-explodes wholesale. Each
    * round's argmax is then a bounded TakeOrdered collect off the
    * ready frame (the same bounded-collect contract as the k-means
    * centroid sums), and a higher-order `aggregate` fold applies the
    * winning merges left-to-right inside each touched word. Vocabulary
    * and pair frame are localCheckpoint'ed per round so the plan does
    * not grow with iteration count (the connected-components rounds
    * discipline).
    *
    * Ties break (freq desc, left asc, right asc), so the merge table
    * is fully deterministic. No end-of-word marker is appended
    * (whitespace tokenization already bounds words); as in reference
    * implementations, symbols are plain strings, so a merged symbol is
    * indistinguishable from a pre-existing identical string. Training
    * stops early when the best remaining pair's frequency falls below
    * `minPairFreq`.
    *
    * Merges are BATCHED: production tokenizers learn 3×10⁴–10⁵ merges,
    * and one Spark round per merge makes driver scheduling the
    * bottleneck regardless of cluster size. Each round accepts the
    * longest prefix of the (freq desc, l, r)-sorted pair list — up to
    * `maxBatch` — whose pairs are mutually symbol-disjoint (including
    * each merged symbol vs every other accepted pair's sides), then
    * trims trailing accepts whose freq TIES the first rejected pair's.
    * That batch provably replays serially: a pair touching an accepted
    * pair's symbols ranks below the whole batch, every pair a batch
    * merge creates or shrinks touches such symbols, so its count stays
    * strictly below every accepted freq and the serial argmax sequence
    * is exactly the batch order (the trim closes the equal-freq
    * tie-break edge where a freshly created symbol could sort ahead).
    * Interacting pairs therefore FALL BACK automatically: the walk
    * stops at the first conflict and the next round re-counts.
    *
    * Iterative and data-dependent — not SQL-expressible; verified
    * against a serial (one-merge-per-recount) replay in TextStatsSpec,
    * including planted interacting-pair and tie-trim corpora
    * (rows-only registry entry, like the k-means/ML tiers).
    *
    * Returns (rank, left, right, merged, freq), rank = merge order. */
  def bpeMerges(df: DataFrame, textCol: String, nMerges: Int = 50,
                minPairFreq: Long = 2L, maxBatch: Int = 16,
                driverVocabThreshold: Long = 65536L): DataFrame = {
    // maxBatch = 0 would accept empty batches and spin the round loop
    // forever; the upper bound keeps the 4*maxBatch+1 collect limit a
    // sane driver allocation (and trivially overflow-free)
    require(maxBatch >= 1 && maxBatch <= 65536,
      s"maxBatch must be in [1, 65536], got $maxBatch (1 = serial driving)")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"),
        col("cnt"))
      .localCheckpoint(true)
    val nVocab = vocab.count()
    // A vocabulary at or below `driverVocabThreshold` rows drives the
    // whole merge loop ON THE DRIVER from one bounded collect: below
    // 65536 rows the distributed loop would run single-task rounds
    // anyway (the `parts` sizing below), so every round still pays
    // plan + schedule + checkpoint for driver-scale work — measured 80
    // Spark jobs / ~9 s for a 31-word bench vocabulary vs ~0.1 s
    // locally (optimization guide §1.2: fix the algorithm's shape
    // before per-task work). The collect is Heaps-law-bounded and
    // capped by the threshold (~tens of MB worst case). Web-scale
    // vocabularies take the distributed loop unchanged. Both paths
    // share the SAME fold kernel ([[etlmudah.expr.BpeFoldFn]]) and the
    // same UTF8String binary compare the engine sorts by, so the merge
    // tables are identical — pinned by a TextStatsSpec equality test
    // (threshold = 0 forces the distributed path).
    if (nVocab <= driverVocabThreshold)
      return bpeMergesDriver(spark, vocab, nMerges, minPairFreq, maxBatch)
    // size the ROUND parallelism to the vocabulary, not the corpus: a
    // bench-scale vocab collapses to one task per round (the loop cost
    // is otherwise pure empty-partition scheduling x rounds), while a
    // web-scale vocabulary keeps cluster width. One bounded count job.
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      nVocab / 65536L)).toInt
    vocab = vocab.repartition(parts).localCheckpoint(true)
    // adjacent-pair counts of a (syms, cnt) frame, optionally negated —
    // the building block of the INCREMENTAL pair frame below
    def pairCounts(v: DataFrame, sign: Long = 1L): DataFrame = v
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg((sum(col("cnt")) * sign).as("freq"))
    // the pair-count frame is maintained INCREMENTALLY (the standard
    // trainer optimization): the full corpus-derived count runs ONCE,
    // and each round re-counts only the words an accepted merge
    // actually touches — pair counts change nowhere else, because a
    // word without any accepted (l, r) adjacency folds to itself.
    // Untouched-word pairs therefore never re-explode; the per-round
    // cost is the touched slice (shrinking as training proceeds) plus
    // one (l, r)-keyed merge of the pair frame.
    var pairs = pairCounts(vocab).localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var continue = true
    while (continue && rank < nMerges) {
      // bounded driver collect: <= 4*maxBatch+1 rows (the batch walk
      // needs the first post-batch freq for the tie trim); the frame
      // is already aggregated, so this is a TakeOrdered over it
      val top = pairs
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(4 * maxBatch + 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty || top.head._3 < minPairFreq) continue = false
      else {
        // batch = maximal disjoint PREFIX of the sorted pair list (a
        // skipped-over conflict would break the serial-order proof)
        val sides = scala.collection.mutable.Set.empty[String] // l, r
        val mrgd = scala.collection.mutable.Set.empty[String]  // l+r
        var k = 0
        var open = true
        while (open && k < top.length &&
               k < math.min(maxBatch, nMerges - rank)) {
          val (l, r, f) = top(k)
          // accept iff sides untouched by any accepted pair's sides or
          // merged symbol, and our merged symbol is no accepted side
          // (merged-vs-merged collisions conflate identically serially)
          if (f < minPairFreq) open = false
          else if (sides(l) || sides(r) || mrgd(l) || mrgd(r) ||
            sides(l + r)) open = false
          else { sides += l; sides += r; mrgd += l + r; k += 1 }
        }
        // trim trailing accepts tied with the first rejected pair: at
        // equal freq a created symbol's pair could win the lexicographic
        // tie-break serially, so only strictly-dominating accepts are
        // provably serial-order-safe (k=1 is always safe — round 1 IS
        // the serial argmax)
        while (k >= 2 && k < top.length && top(k - 1)._3 == top(k)._3)
          k -= 1
        val batch = top.take(k)
        batch.foreach { case (l, r, f) =>
          merges += ((rank, l, r, l + r, f)); rank += 1 }
        // ONE native fold (graft_bpe_fold) applies the whole batch in
        // merge order — byte-identical to the serial per-merge fold,
        // but a single plan node: the previous per-merge HOF nest was
        // super-linear in Catalyst's optimizer (the pathology that
        // moved the BMP pixel walk native). A word changed iff the
        // fold changed it — batch pairs are symbol-disjoint, so no
        // batch merge creates or destroys another's adjacency — which
        // gives the touched slice as a plain array comparison.
        val foldedAll = vocab.select(col("syms"),
            call_function("graft_bpe_fold", col("syms"),
              typedLit(batch.map(_._1).toSeq),
              typedLit(batch.map(_._2).toSeq)).as("__new"),
            col("cnt"))
          .localCheckpoint(true)
        val changed = foldedAll.filter(col("__new") =!= col("syms"))
        // incremental frame update: += new-form pairs, -= old-form
        // pairs, CHANGED rows only; exact zeros drop so the frame
        // stays the true pair table (the TakeOrdered above depends on
        // no stale rows surviving)
        pairs = pairs
          .unionByName(pairCounts(
            changed.select(col("__new").as("syms"), col("cnt"))))
          .unionByName(pairCounts(
            changed.select(col("syms"), col("cnt")), sign = -1L))
          .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("freq"))
          .filter(col("freq") > 0)
          .localCheckpoint(true)
        // vocab' is a pure projection of the checkpointed fold — no
        // separate materialization, and the plan cannot grow across
        // rounds because each round re-roots at its own checkpoint
        vocab = foldedAll.select(col("__new").as("syms"), col("cnt"))
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "merged", "freq")
  }

  /** The [[bpeMerges]] driver fast path: the exact same
    * argmax/batch-walk/trim/fold sequence over a collected
    * (syms, cnt) vocabulary. Pair counts are recomputed per round
    * (the distributed loop's incremental frame maintains precisely
    * these counts, so the recount is the same table); ordering uses
    * UTF8String.compareTo — the binary comparison the engine's
    * `orderBy` on StringType performs — and the batch is applied by
    * the SAME [[etlmudah.expr.BpeFoldFn.fold]] kernel the distributed
    * path codegens, so the two paths cannot drift. */
  private def bpeMergesDriver(spark: SparkSession, vocab: DataFrame,
                              nMerges: Int, minPairFreq: Long,
                              maxBatch: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    var words: Array[(Array[UTF8String], Long)] = vocab.collect().map { r =>
      (r.getSeq[String](0).map(UTF8String.fromString).toArray, r.getLong(1))
    }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 0
    var continue = true
    while (continue && rank < nMerges) {
      val cnt =
        scala.collection.mutable.LinkedHashMap.empty[(UTF8String, UTF8String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      // same view the distributed TakeOrdered produces: (freq desc,
      // l asc, r asc) binary order, first 4*maxBatch+1 rows
      val top = cnt.iterator
        .map { case ((l, r), f) => (l, r, f) }
        .toArray
        .sortWith { case ((l1, r1, f1), (l2, r2, f2)) =>
          if (f1 != f2) f1 > f2
          else {
            val c = l1.compareTo(l2)
            if (c != 0) c < 0 else r1.compareTo(r2) < 0
          }
        }
        .take(4 * maxBatch + 1)
      if (top.isEmpty || top.head._3 < minPairFreq) continue = false
      else {
        val sides = scala.collection.mutable.Set.empty[UTF8String]
        val mrgd = scala.collection.mutable.Set.empty[UTF8String]
        var k = 0
        var open = true
        while (open && k < top.length &&
               k < math.min(maxBatch, nMerges - rank)) {
          val (l, r, f) = top(k)
          if (f < minPairFreq) open = false
          else if (sides(l) || sides(r) || mrgd(l) || mrgd(r) ||
            sides(UTF8String.concat(l, r))) open = false
          else {
            sides += l; sides += r; mrgd += UTF8String.concat(l, r); k += 1
          }
        }
        while (k >= 2 && k < top.length && top(k - 1)._3 == top(k)._3)
          k -= 1
        val batch = top.take(k)
        batch.foreach { case (l, r, f) =>
          merges += ((rank, l.toString, r.toString,
            UTF8String.concat(l, r).toString, f))
          rank += 1
        }
        val leftsAd =
          new GenericArrayData(batch.map(_._1.asInstanceOf[Any]))
        val rightsAd =
          new GenericArrayData(batch.map(_._2.asInstanceOf[Any]))
        words = words.map { case (syms, c) =>
          val folded = etlmudah.expr.BpeFoldFn.fold(
            new GenericArrayData(syms.asInstanceOf[Array[Any]]),
            leftsAd, rightsAd)
          (folded.toArray[UTF8String](
            org.apache.spark.sql.types.StringType), c)
        }
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "merged", "freq")
  }

  /** BPE ENCODING of a distinct-word table: applies a learned merge
    * list in rank order (the [[bpeMerges]] output's (left, right)
    * pairs) to every word — the tokenizer-apply step. Input must carry
    * a `w` column; returns (w, syms). Same vocab-sized partitioning as
    * training; all work is Heaps-bounded, the corpus itself is never
    * touched here. Unlike training, encoding applies a FIXED list — no
    * argmax between merges — so the ENTIRE table applies in one
    * projection: the native `graft_bpe_fold` kernel (shared with
    * training, so train/apply can never drift) walks every merge
    * left-to-right per word in a single plan node. `maxBatch` is
    * retained for signature compatibility; the native fold makes
    * batching moot. */
  def bpeEncodeWords(words: DataFrame, merges: Seq[(String, String)],
                     maxBatch: Int = 16): DataFrame = {
    val spark = words.sparkSession
    var wv = words.select(col("w"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("syms"))
      .localCheckpoint(true)
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      wv.count() / 65536L)).toInt
    wv = wv.repartition(parts).localCheckpoint(true)
    if (merges.nonEmpty)
      wv = wv.select(col("w"),
          call_function("graft_bpe_fold", col("syms"),
            typedLit(merges.map(_._1)),
            typedLit(merges.map(_._2))).as("syms"))
        .localCheckpoint(true)
    wv
  }

  /** UNIGRAM-LATTICE Viterbi segmentation (Kudo 2018, the
    * SentencePiece default) — the second tokenizer FAMILY next to the
    * BPE tier: the text segments into the vocabulary pieces maximizing
    * summed integer weights, solved exactly per row by the native
    * `graft_viterbi` DP ([[etlmudah.expr.UnigramViterbiFn]] — one plan
    * node inside whole-stage codegen; uncovered characters become
    * single-char unknowns at the fixed penalty). Pure per-row
    * projection: no shuffle, vocabulary rides the plan as parallel
    * literals (a learned vocab is Heaps-bounded). */
  def viterbiSegment(text: Column, vocab: Seq[(String, Long)]): Column =
    call_function("graft_viterbi", text,
      typedLit(vocab.map(_._1)), typedLit(vocab.map(_._2)))

  /** Held-out segmentation report — the tokenizer-quality readout that
    * belongs next to any learned merge table: encode a TARGET corpus
    * with a (typically train-split-learned) merge list and report, per
    * `sourceCol`: word count, subtoken count, mean subtokens/word (the
    * fertility every LM data card quotes), and the share of words left
    * intact as a single token. Encoding runs on the DISTINCT word
    * table (Heaps-bounded) and joins back to per-(source, word)
    * occurrence counts — the corpus is scanned once and never carries
    * symbol arrays. */
  def bpeSegmentReport(df: DataFrame, textCol: String, sourceCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(sourceCol).as("src"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val encoded = bpeEncodeWords(words.select("w").distinct(), merges)
    words.groupBy(col("src"), col("w")).agg(count(lit(1)).as("n"))
      .join(encoded.select(col("w"), size(col("syms")).as("k")), Seq("w"))
      .groupBy(col("src"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("k")).as("n_subtokens"),
        round(sum(col("n") * col("k")).cast("double") / sum(col("n")), 4)
          .as("subtokens_per_word"),
        round(sum(when(col("k") === 1, col("n")).otherwise(lit(0L)))
          .cast("double") / sum(col("n")), 4).as("intact_word_share"))
      .orderBy(col("src"))
  }

  /** Cavnar–Trenkle rank-profile classification ("N-Gram-Based Text
    * Categorization", 1994 — the classic n-gram language-ID algorithm,
    * here demonstrated with `classCol` as the category label; feed
    * per-language seed corpora and it IS language ID). Each class's
    * profile is its top-`topV` character trigrams ranked by total
    * frequency (ties → gram asc); each document is assigned the class
    * minimizing the out-of-place distance Σ|doc_rank − class_rank| over
    * the document's own top-`topV` trigrams, a trigram absent from the
    * class profile costing `topV`; distance ties → class asc.
    * Deterministic end to end, so an external engine replays profiles,
    * ranks, and distances exactly.
    *
    * Scale shape: the per-(id, gram) counts come from ONE native pass
    * per document (`graft_char_ngram_counts` — a custom Expression,
    * the graft_cosine precedent) instead of the former
    * explode(offsets)+substr+count pipeline: that shape paid
    * O(text²) code-point steps per doc in substr's prefix re-walks,
    * materialized one row per CHAR POSITION, and re-hashed all of
    * them in a corpus-char-scale aggregate (~2.4s of q167's sf0.1
    * tail measured, optimization guide §1.2 step 2 per-task work);
    * the single pass emits each doc's DISTINCT grams pre-counted, so
    * no corpus-scale aggregate (or the id repartition that made it
    * exchange-free) exists at all. Counts per (id, gram) are exact by
    * construction — a doc's rows live in one source row. Class counts
    * aggregate FROM the checkpointed doc counts (re-deriving the
    * class branch from the text instead would decode the corpus
    * twice); both rank windows run over Heaps-law-bounded count
    * tables; the distance join fans each doc's topV rows out by
    * |classes| (a broadcast) and probes the class profiles (topV ×
    * |classes| rows, broadcast). Documents shorter than 3 characters
    * have no trigram and are excluded. Returns (id, actual, predicted,
    * distance). */
  def rankProfileClassify(df: DataFrame, textCol: String, idCol: String,
                          classCol: String, topV: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .select(col(idCol).as("id"), col(classCol).as("cls"),
        lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= 3)
    val docCounts = base
      .select(col("id"), col("cls"),
        explode(call_function("graft_char_ngram_counts", col("t"), lit(3)))
          .as("gc"))
      .select(col("id"), col("cls"), col("gc.g").as("g"),
        col("gc.c").as("c"))
      .localCheckpoint(true) // feeds the class profile AND the doc profile
    val classCounts = docCounts.groupBy(col("cls"), col("g"))
      .agg(sum(col("c")).as("c"))
    // materialized: the profile is <= topV x |classes| rows but its
    // subtree (class aggregate + rank window over the checkpointed doc
    // counts) would otherwise evaluate TWICE — once under each of the
    // two broadcasts below (`classes` and the profile join); broadcast
    // subtrees are not exchange-reused (measured ~1s of the q167 tail)
    val classProf = classCounts
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("cls"))
          .orderBy(col("c").desc, col("g").asc)))
      .filter(col("crank") <= topV)
      .select(col("cls").as("pcls"), col("g"), col("crank"))
      .localCheckpoint(true)
    val docProf = docCounts
      .withColumn("drank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("c").desc, col("g").asc)))
      .filter(col("drank") <= topV)
      .select(col("id"), col("cls").as("actual"), col("g"), col("drank"))
      .localCheckpoint(true) // feeds the hits join, n_d, and the no-hit rescue
    // SPARSE distance: join doc grams to the profiles they actually HIT
    // (on g alone) instead of fanning every doc profile out by
    // |classes| and left-probing (the former crossJoin moved
    // |docs|·topV·|classes| rows through the distance aggregate —
    // guide §2.3 shuffle fewer rows). Algebra: with n_d = |doc profile|
    // and h = hits on class c,
    //   dist(d, c) = Σ_hits |drank−crank| + (n_d − h)·topV
    // and |drank−crank| ≤ topV−1, so ANY class with h ≥ 1 satisfies
    // dist ≤ n_d·topV − h < n_d·topV — STRICTLY below every zero-hit
    // class's distance (exactly n_d·topV). The argmin therefore never
    // needs zero-hit classes unless the document hits NO profile at
    // all, in which case every class ties at n_d·topV and the old
    // (distance, pcls) tie-break picks the alphabetically first class
    // — the rescue branch below reproduces that literally.
    val nD = docProf.groupBy(col("id"), col("actual"))
      .agg(count(lit(1)).as("__nd"))
    val hits = docProf
      .join(broadcast(classProf), Seq("g"))
      .groupBy(col("id"), col("pcls"))
      .agg(sum(abs(col("drank") - col("crank"))).as("__s"),
        count(lit(1)).as("__h"))
    val bestHit = hits
      .groupBy(col("id"))
      .agg(min(struct((col("__s") - col("__h") * topV.toLong).as("__adj"),
        col("pcls"))).as("__b"))
    val firstClass = classProf.select(col("pcls")).distinct()
      .agg(min(col("pcls")).as("__c0"))
    nD.join(bestHit, Seq("id"), "left")
      .crossJoin(broadcast(firstClass))
      .select(col("id"), col("actual"),
        coalesce(col("__b.pcls"), col("__c0")).as("predicted"),
        (coalesce(col("__b.__adj"), lit(0L)) +
          col("__nd") * topV.toLong).cast("long").as("distance"))
      .orderBy(col("id"))
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
    * the word-adjacency graph. Adjacent token pairs are counted
    * UNDIRECTED (canonical least/greatest, self-pairs dropped), then
    * both directions feed the integer-lattice PageRank
    * ([[etlmudah.graph.Centrality.pageRankInt]]) on md5-60bit word ids
    * — the portable-hash discipline, so the SQL twin re-derives
    * identical ids and replays the BIGINT-exact rounds. Returns the
    * topK (word, rank) rows, rank DESC with word as the tie-break.
    *
    * Scale shape: tokenization plus ONE keyed window (lead over doc
    * position) mine adjacency in a single exchange; the pair aggregate
    * is vocabulary-bounded (Heaps' law — the BPE/rank-profile bound),
    * so the graph PageRank iterates on is vocab-sized regardless of
    * corpus size, and the adjacency table is materialized once before
    * symmetrization (the `dupClusters` lesson: union(x, x.swapped)
    * evaluates its input twice). 60-bit id collisions merge nodes with
    * probability ~V²/2⁶¹ — negligible below 10⁸ distinct words. */
  def textRankKeywords(df: DataFrame, textCol: String, idCol: String,
                       iters: Int = 3, topK: Int = 20): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    val adj = tok.withColumn("nx", lead(col("w"), 1).over(win))
      .filter(col("nx").isNotNull && col("w") =!= col("nx"))
      .select(least(col("w"), col("nx")).as("cu"),
        greatest(col("w"), col("nx")).as("cv"))
      .groupBy("cu", "cv").agg(count(lit(1)).as("weight"))
      .localCheckpoint(true)
    def hid(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    val edges = adj.select(hid(col("cu")).as("src"), hid(col("cv")).as("dst"),
        col("weight"))
      .union(adj.select(hid(col("cv")).as("src"), hid(col("cu")).as("dst"),
        col("weight")))
    val words = tok.select(col("w").as("word")).distinct()
      .withColumn("node", hid(col("word")))
    etlmudah.graph.Centrality.pageRankInt(edges, iters)
      .join(words, Seq("node"))
      .select(col("word"), col("rank"))
      .orderBy(desc("rank"), col("word"))
      .limit(topK)
  }

  /** Unicode SCRIPT profile — the multilingual-curation readout next
    * to langid (q22): per document, character counts in three script
    * blocks (Basic Latin letters, Cyrillic U+0400–U+04FF, CJK Unified
    * U+4E00–U+9FFF) and the dominant script, rolled up per (slice,
    * dominant). Corpus routing by writing system is the first split a
    * multilingual pipeline makes — cheaper and more robust than model
    * langid at the script grain (Cyrillic vs Latin never needs an
    * n-gram model).
    *
    * Counts are `length(regexp_replace(text, [^block], ''))` — BMP
    * blocks only, so UTF-16 length equals codepoint count and the
    * same regex runs on both engines. Dominance is max count with the
    * FIXED tie order latin > cyrillic > cjk; all-zero (no letters in
    * any block) reports 'none'. One projection + one map-side-combined
    * aggregate; the regexes are per-row codegen, no explode. */
  def scriptProfile(df: DataFrame, textCol: String,
                    sliceCol: String): DataFrame = {
    def cnt(block: String) = length(
      regexp_replace(col(textCol), s"[^$block]", "")).cast("long")
    val profiled = df
      .withColumn("__lat", cnt("A-Za-z"))
      .withColumn("__cyr", cnt("Ѐ-ӿ"))
      .withColumn("__cjk", cnt("一-鿿"))
      .withColumn("__dom",
        when(col("__lat") === 0 && col("__cyr") === 0 &&
          col("__cjk") === 0, "none")
        .when(col("__lat") >= col("__cyr") &&
          col("__lat") >= col("__cjk"), "latin")
        .when(col("__cyr") >= col("__cjk"), "cyrillic")
        .otherwise("cjk"))
    profiled.groupBy(col(sliceCol), col("__dom").as("dominant"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__lat")).as("n_latin"),
        sum(col("__cyr")).as("n_cyrillic"),
        sum(col("__cjk")).as("n_cjk"))
      .orderBy(col(sliceCol), col("dominant"))
  }
}
