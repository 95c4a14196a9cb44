package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, language-ID heuristics, fingerprinting, vocabulary
  * aggregation — the text side of a large-scale training-data pipeline.
  *
  * Everything is built-in codegen'd expressions (split / higher-order array
  * functions / regexp), so the whole stage is a narrow projection that scales
  * linearly; the only shuffle anywhere is the vocabulary groupBy in t04.
  */
object TextAnalysis {

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  private val StopWords = Seq("the", "a", "of", "to", "in")

  /** t01: per-document token statistics + composite quality score.
    * Thin binding of [[graft.api.Graft.textStats]] plus the extra
    * char-level columns the gate reports. Ratios are single double
    * divisions of exact ints — engine-portable. */
  def t01TextStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val nTok = size(t).cast(LongType)
    val nStop = size(filter(t, x => x.isin(StopWords: _*))).cast(LongType)
    graft.api.Graft.textStats(Tables.load(s, dir, "documents"), $"text", StopWords)
      .select(
        $"doc_id", $"lang", $"source",
        length($"text").cast(LongType).as("n_chars"),
        $"n_tokens",
        $"n_distinct_tokens",
        nStop.as("n_stopwords"),
        $"type_token_ratio",
        $"stopword_ratio",
        (length(regexp_replace($"text", "\\s", "")).cast(DoubleType) / nTok)
          .as("avg_token_len"),
        $"quality_score")
      .orderBy($"doc_id")
  }

  /** t02: deterministic n-gram/character-heuristic language ID. The testdata
    * text is synthetic, so this checks the *mechanics* (profile scoring +
    * argmax) rather than linguistic accuracy. */
  def t02LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val n = size(t).cast(DoubleType)
    val scoreEn = size(filter(t, x => x.isin(StopWords: _*))).cast(DoubleType) / n
    val scoreEs = size(filter(t, x => x.endsWith("o") || x.endsWith("a")))
      .cast(DoubleType) / n
    val scoreDe = size(filter(t, x => x.endsWith("en") || x.startsWith("sch")))
      .cast(DoubleType) / n
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id", $"lang".as("lang_declared"),
        scoreEn.as("score_en"), scoreEs.as("score_es"), scoreDe.as("score_de"),
        when(scoreEn >= scoreEs && scoreEn >= scoreDe && scoreEn > 0, "en")
          .when(scoreEs >= scoreDe && scoreEs > 0, "es")
          .when(scoreDe > 0, "de")
          .otherwise("und").as("lang_detected"))
      .orderBy($"doc_id")
  }

  /** t03: document fingerprints — normalized-text md5, a 60-bit integer
    * fingerprint, and a length bucket (dedup/sharding keys). */
  def t03Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.fingerprint(Tables.load(s, dir, "documents"), $"text")
      .select(
        $"doc_id", $"fp_md5", $"fp_int60",
        floor(length($"text") / 100).cast(LongType).as("len_bucket"))
      .orderBy($"doc_id")
  }

  /** t04: corpus vocabulary — explode tokens, global frequency, top-20.
    * The generator/aggregate shape of tokenization at scale: one shuffle on
    * the token key with map-side partial counts. */
  def t04TopTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token")
      .limit(20)
  }

  /** A BPE-style pre-tokenizer pattern (the GPT-2 family shape, minus the
    * lookahead RE2 lacks): a token is an optionally-space-prefixed letter
    * run, digit run, or punctuation run. Alternation + character classes
    * only — identical semantics in Java regex and RE2. */
  private val BpeRx = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** t05: BPE-ish regex token counting — the pre-tokenization pass of a
    * subword tokenizer, as a codegen'd narrow projection (the whitespace
    * variant is t01). Counts, distinct counts, and the longest
    * pre-token per document. */
  def t05BpeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = regexp_extract_all($"text", lit(BpeRx), lit(0))
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id",
        size(toks).cast(LongType).as("n_bpe_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct_bpe"),
        array_max(transform(toks, t => length(t))).cast(LongType)
          .as("longest_bpe"))
      .orderBy($"doc_id")
  }

  /** t06: benchmark decontamination — a deterministic ~5% hash-sample of
    * the corpus plays the benchmark suite; every other document reports
    * what fraction of its distinct word 5-grams leak from that suite. Thin
    * binding of [[graft.api.Graft.contamination]] (broadcast benchmark
    * n-gram set, narrow corpus side). The synthetic corpus contains real
    * near-duplicates (the d02/d03 pairs), so nonzero contamination rows are
    * exercised, not just the zero path. */
  def t06Contamination(s: SparkSession, dir: String): DataFrame =
    contaminationGate(s, dir, graft.api.Graft.contamination(_, _, _, _, _))

  /** The shared t06/t34 benchmark-split + output contract: a ~5% hash
    * bucket of doc ids plays the benchmark, the rest the corpus; only the
    * decontamination implementation differs between the two gates, so the
    * split/column/order pinning lives in exactly one place. */
  private def contaminationGate(s: SparkSession, dir: String,
      impl: (DataFrame, Column, Column, DataFrame, Column) => DataFrame): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val bucket = conv(substring(md5($"doc_id".cast(StringType)), 1, 4), 16, 10)
      .cast(LongType)
    val isBench = bucket % 20 === 0
    impl(docs.where(!isBench), $"doc_id", $"text", docs.where(isBench), $"text")
      .select($"id".as("doc_id"), $"n_ngrams", $"n_hits", $"contamination")
      .orderBy($"doc_id")
  }

  /** t34: the same decontamination query through the bloom-prefiltered
    * path — [[graft.api.Graft.contaminationBloom]] folds the benchmark
    * n-grams into a Spark `BloomFilterAggregate` sketch and kills
    * non-member corpus grams inside the scan stage before the exact
    * verify join. Bit-identical output to t06 (blooms have no false
    * negatives; the exact join removes false positives), so it shares
    * t06's oracle — the gate pins that the sketch shortcut changes
    * nothing. */
  def t34ContaminationBloom(s: SparkSession, dir: String): DataFrame =
    contaminationGate(s, dir,
      graft.api.Graft.contaminationBloom(_, _, _, _, _))

  /** t07: character-class quality signals + composite score — the filter
    * layer a corpus-cleaning pipeline applies after token stats (t01):
    * punctuation/digit/uppercase density, mean word length, line count.
    * Thin binding of [[graft.api.Graft.qualitySignals]]. */
  def t07QualitySignals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.qualitySignals(Tables.load(s, dir, "documents"), $"text")
      .select($"doc_id", $"n_chars", $"punct_ratio", $"digit_ratio",
        $"upper_ratio", $"mean_word_len", $"n_lines", $"quality_v2")
      .orderBy($"doc_id")
  }

  /** t08: within-document repetition filter — word-2-gram repetition stats
    * plus the keep/drop flag a cleaning pipeline derives from them (docs
    * whose duplicate-2-gram fraction exceeds 0.08 are marked repetitive —
    * a threshold picked to exercise both branches on the low-repetition
    * synthetic corpus; production cleaning uses stricter values).
    * Thin binding of [[graft.api.Graft.repetitionStats]]. */
  def t08RepetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.repetitionStats(
      Tables.load(s, dir, "documents"), $"doc_id", $"text")
      .select($"id".as("doc_id"),
        $"n_ngrams".as("n_2grams"),
        $"n_distinct_ngrams".as("n_distinct_2grams"),
        $"max_ngram_count".as("max_2gram_count"),
        $"dup_ngram_frac".as("dup_2gram_frac"),
        ($"dup_ngram_frac" > 0.08).as("is_repetitive"))
      .orderBy($"doc_id")
  }

  /** t09: PII redaction — the scrubbing stage a training corpus runs before
    * anything ships. The synthetic documents carry no PII, so the gate
    * plants a deterministic doc_id-derived payload first (emails on
    * doc_id%3 in {0,1} — two on 0 — a phone on doc_id%2=0, an IPv4 on
    * doc_id%4=0: every count in {0,1,2} is exercised), then redacts and
    * counts with [[graft.api.Graft.redactPii]]; the oracle plants the
    * identical payload and redacts with the identical regexes. Narrow
    * regexp projection, no shuffle. */
  def t09PiiRedaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    def ds = d.cast(StringType)
    val injected = concat(
      $"text",
      when(d % 3 === 0, concat(lit(" reach user"), ds, lit("@example.com or admin"),
          ds, lit("@test.org")))
        .when(d % 3 === 1, concat(lit(" mail user"), ds, lit("@example.com")))
        .otherwise(lit("")),
      when(d % 2 === 0, concat(lit(" call ("), (d % 800 + 200).cast(StringType),
          lit(") 555-"), lpad((d % 10000).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      when(d % 4 === 0, concat(lit(" from 10.0."), (d % 256).cast(StringType),
          lit("."), ((d * 7) % 256).cast(StringType)))
        .otherwise(lit("")))
    graft.api.Graft.redactPii(
        Tables.load(s, dir, "documents").withColumn("pii_text", injected),
        $"pii_text")
      .select($"doc_id", $"n_emails", $"n_phones", $"n_ips",
        length($"text_redacted").cast(LongType).as("n_chars_redacted"),
        $"text_redacted")
      .orderBy($"doc_id")
  }

  /** t10: URL extraction + normalization — the link-analysis stage of a web
    * corpus pipeline (URL counts, host/domain normalization, path and query
    * parameter extraction feed dedup-by-page and source-quality scoring).
    * URLs are planted deterministically (the synthetic corpus has none),
    * then extracted with regexp and dissected with Spark's native
    * `parse_url` (HOST / PATH / QUERY:key); the oracle reproduces the same
    * dissection with anchored regexes. Narrow projection, no shuffle. */
  def t10UrlExtraction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    def ds = d.cast(StringType)
    val withUrl = concat(
      $"text",
      when(d % 3 === 0, concat(lit(" see https://docs.example"),
          (d % 5).cast(StringType), lit(".com/guide/page"), ds,
          lit("?ref=r"), (d % 7).cast(StringType)))
        .otherwise(lit("")),
      when(d % 4 === 1, concat(lit(" and http://www.mirror.example.org/path"), ds))
        .otherwise(lit("")))
    val urls = regexp_extract_all($"t", lit("https?://[^\\s]+"), lit(0))
    Tables.load(s, dir, "documents")
      .withColumn("t", withUrl)
      .withColumn("first_url", try_element_at(urls, lit(1)))
      .select(
        $"doc_id",
        size(urls).cast(LongType).as("n_urls"),
        parse_url($"first_url", lit("HOST")).as("first_host"),
        regexp_replace(parse_url($"first_url", lit("HOST")), "^www\\.", "")
          .as("first_domain"),
        parse_url($"first_url", lit("PATH")).as("first_path"),
        parse_url($"first_url", lit("QUERY"), lit("ref")).as("ref_param"))
      .orderBy($"doc_id")
  }

  /** t11: the corpus-cleaning pipeline END TO END — chunk boilerplate
    * removal, structural filters on the rebuilt text (non-empty + word-
    * 2-gram repetition <= 0.08, t08's threshold), then full near-dup
    * removal over the REBUILT text. Every stage is the oracle-verified
    * operator from d10/t08/d07; this gate pins their composition, including
    * the stage ORDER (boilerplate first, so dedup signatures never see
    * chunks the corpus drops). Thin binding of
    * [[graft.api.Graft.cleanCorpus]]. */
  def t11CleanCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.cleanCorpus(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", chunkWords = 10, maxDocFreq = 1,
        maxDupFrac = 0.08)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t12: vocabulary coverage — per-document out-of-vocabulary rate
    * against the corpus's own top-20 token vocabulary (t04's exact
    * definition, so the boundary tiebreak is already oracle-proven). The
    * tokenizer-fit signal: high OOV means the vocabulary wastes UNK
    * tokens on this document. Thin binding of
    * [[graft.api.Graft.oovStats]] (broadcast vocabulary membership,
    * narrow corpus side). */
  def t12OovRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val vocab = docs
      .select(explode(tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(20)
    graft.api.Graft.oovStats(docs, $"doc_id", $"text", vocab, $"token")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t13: deterministic data mixing — per-language sampling rates (the
    * upsample/downsample step that turns a raw corpus into a training
    * mix), by hash-bucket membership: reproducible on any engine, any
    * partitioning, any retry. Thin binding of
    * [[graft.api.Graft.stratifiedSample]] (the fraction map folds into one
    * CASE — narrow projection, no join, no shuffle). */
  def t13DataMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.stratifiedSample(
      Tables.load(s, dir, "documents"), $"doc_id", $"lang",
      Map("en" -> 1.0, "es" -> 0.5, "de" -> 0.25), defaultFraction = 0.125)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  /** t14: sequence packing — the concat-and-chop shard layout of a
    * pretraining pipeline: documents ordered by doc_id, token streams
    * concatenated, chopped into 512-token sequences; each document learns
    * which sequences it lands in and at what offset. Thin binding of
    * [[graft.api.Graft.packSequences]] — the global prefix sum runs as
    * value-bucket clustering (one corpus exchange) + per-bucket windows +
    * a broadcast offsets join, NEVER a single-reducer global window
    * (contrast q53's documented gate-only ntile stand-in). */
  def t14SequencePacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    graft.api.Graft.packSequences(docs, $"doc_id",
        size(tokens($"text")).cast(LongType), capacity = 512L)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t15: per-language distinctive terms — top-5 tokens by
    * tf_lang / df_corpus (raw-idf TF-IDF; the one-division score is
    * bit-identical cross-engine where ln(N/df) would not be). Thin
    * binding of [[graft.api.Graft.distinctiveTerms]]. */
  def t15DistinctiveTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.distinctiveTerms(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", $"lang", topK = 5)
      .withColumnRenamed("grp", "lang")
      .orderBy($"lang", $"rank")
  }

  /** t16: per-domain URL aggregation over the same planted URLs as t10
    * (the raw corpus text carries none) — which hosts dominate the corpus
    * and how concentrated their mentions are. Thin binding of
    * [[graft.api.Graft.domainStats]]. */
  def t16DomainStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    def ds = d.cast(StringType)
    val withUrl = concat(
      $"text",
      when(d % 3 === 0, concat(lit(" see https://docs.example"),
          (d % 5).cast(StringType), lit(".com/guide/page"), ds,
          lit("?ref=r"), (d % 7).cast(StringType)))
        .otherwise(lit("")),
      when(d % 4 === 1, concat(lit(" and http://www.mirror.example.org/path"), ds))
        .otherwise(lit("")))
    graft.api.Graft.domainStats(
        Tables.load(s, dir, "documents").withColumn("t", withUrl),
        $"doc_id", $"t")
      .orderBy($"domain")
  }

  /** t17: per-language quota cap — keep at most 60 documents per language,
    * longest first (doc_id tiebreak): the domain/source-cap step that stops
    * any one slice of the crawl from dominating the mix. Thin binding of
    * [[graft.api.Graft.capPerGroup]]. */
  def t17LangQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.capPerGroup(Tables.load(s, dir, "documents"),
        $"lang", $"n_chars", $"doc_id", n = 60)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** The t18 gate's synthetic classifier: 64 hashed buckets with a fixed
    * Knuth-multiplicative weight per bucket, exact 3-decimal values. ONE
    * source of truth — the gate evaluates them in Spark and interpolates
    * the same literals into the oracle SQL. */
  private[graft] def t18Weights: Seq[BigDecimal] =
    (0 until 64).map(i =>
      BigDecimal((i * 2654435761L) % 2001 - 1000) / 1000)

  /** t18: hashed linear quality classifier — fastText-family scoring of
    * every document as the mean hashed-bucket weight of its tokens, in one
    * narrow decimal-exact fold. Thin binding of
    * [[graft.api.Graft.scoreLinearHashed]]. */
  def t18QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.scoreLinearHashed(Tables.load(s, dir, "documents"),
        $"text", t18Weights, bias = BigDecimal("0.05"))
      .select($"doc_id", $"lang", $"n_tokens", $"quality_score")
      .orderBy($"doc_id")
  }

  /** t19: temperature-based data mixing — per-language fractions chosen
    * from count^0.5 so rare languages keep a larger share than their raw
    * frequency, with deterministic hash membership. Thin binding of
    * [[graft.api.Graft.temperatureMix]]. */
  def t19TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.temperatureMix(Tables.load(s, dir, "documents"),
        $"doc_id", $"lang", targetRows = 250L, alpha = 0.5)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  /** t20: sliding-window chunking — 64-token windows every 48 tokens
    * (16-token overlap), short last window, one row per chunk. Thin
    * binding of [[graft.api.Graft.chunkDocuments]]. */
  def t20ChunkDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.chunkDocuments(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", chunkTokens = 64, overlapTokens = 16)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id", $"chunk_id")
  }

  /** t21: deterministic train/val/test split — one hash-bucket label per
    * document, disjoint and exhaustive by construction. Thin binding of
    * [[graft.api.Graft.splitCorpus]]. */
  def t21CorpusSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.splitCorpus(Tables.load(s, dir, "documents"), $"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"lang", $"split")
      .orderBy($"doc_id")
  }

  /** t22: BPE merge training — the first 8 learned byte-pair merges of the
    * corpus with their pair counts. Thin binding of
    * [[graft.api.Graft.trainBpeMerges]]; the oracle unrolls the same 8
    * rounds in SQL (pair count → lexical-tiebreak argmax → greedy
    * left-to-right replace), generated by [[t22OracleSql]] from one loop
    * so Spark and DuckDB can't drift. */
  def t22BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.trainBpeMerges(Tables.load(s, dir, "documents"),
        $"text", nMerges = 8)
      .orderBy($"merge_rank")
  }

  /** The shared unrolled-round training WITH-chain both BPE oracles build
    * on (nMerges CTE rounds; chr(1) is the same symbol sentinel): ends at
    * the last st CTE with NO select tail, so [[t22OracleSql]] and
    * [[t23OracleSql]] each append their own — composition by
    * construction, not by cutting the rendered SQL apart. */
  private[graft] def bpeTrainCtes(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      s"""p$r AS (
        |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
        |    SELECT cnt, syms[i] AS l, syms[i + 1] AS r FROM (
        |      SELECT cnt, string_split(s, chr(1)) AS syms FROM st${r - 1}),
        |      unnest(range(2, len(syms) - 1)) AS t(i))
        |  GROUP BY 1, 2),
        |m$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1),
        |st$r AS (
        |  SELECT word, cnt,
        |    replace(s, chr(1) || m.l || chr(1) || m.r || chr(1),
        |            chr(1) || m.l || m.r || chr(1)) AS s
        |  FROM st${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH wc AS (
      |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
      |    SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |      t -> t <> '')) AS word
      |    FROM documents)
      |  WHERE NOT contains(word, chr(1))
      |  GROUP BY 1),
      |st0 AS (
      |  SELECT word, cnt,
      |    chr(1) || regexp_replace(word, '(.)', '\\1' || chr(1), 'g') AS s
      |  FROM wc),
      |$rounds""".stripMargin
  }

  /** The unrolled-round DuckDB replica of [[graft.api.Graft.trainBpeMerges]]:
    * the shared training chain plus the per-round merge-row output. */
  private[graft] def t22OracleSql(nMerges: Int): String = {
    val out = (1 to nMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS merge_rank, l AS left_sym, r AS right_sym, c AS pair_count FROM m$r")
      .mkString("\nUNION ALL\n")
    s"""${bpeTrainCtes(nMerges)}
      |$out
      |ORDER BY merge_rank""".stripMargin
  }

  /** t23: BPE tokenization — train 8 merges on the corpus
    * ([[graft.api.Graft.trainBpeMerges]]), then segment every document
    * with them ([[graft.api.Graft.tokenizeBpe]]): the full
    * train-then-apply tokenizer loop, cross-engine reproducible. */
  def t23BpeTokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val merges = graft.api.Graft.trainBpeMerges(docs, $"text", nMerges = 8)
      .orderBy($"merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.api.Graft.tokenizeBpe(docs, $"text", merges)
      .select($"doc_id", $"n_bpe_tokens",
        array_join($"bpe_tokens", " ").as("bpe_text"))
      .orderBy($"doc_id")
  }

  /** DuckDB replica of t23: the t22 training rounds plus the same nested
    * greedy replace applied to every word, reassembled in word order.
    * Contract: the corpus must yield at least `nMerges` learnable merges —
    * the apply stage cross-joins every single-row m CTE, so an empty one
    * (trainer early-stop) would empty the whole tokenization while Spark
    * applies the merges it did learn. Holds for the documents corpus at
    * every gate SF (t22 verifies 8 full rounds); revisit if nMerges grows. */
  private[graft] def t23OracleSql(nMerges: Int): String = {
    val trainCtes = bpeTrainCtes(nMerges)
    val applied = (1 to nMerges).foldLeft(
      "chr(1) || regexp_replace(word, '(.)', '\\1' || chr(1), 'g')") { (acc, r) =>
      s"replace($acc, chr(1) || mm$r.l || chr(1) || mm$r.r || chr(1), chr(1) || mm$r.l || mm$r.r || chr(1))"
    }
    val mJoins = (1 to nMerges).map(r => s"m$r mm$r").mkString(", ")
    s"""$trainCtes,
      |docw AS (
      |  SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM (
      |    SELECT doc_id,
      |      list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS words
      |    FROM documents)),
      |wtok AS (
      |  SELECT doc_id, i,
      |    list_filter(string_split($applied, chr(1)), t -> t <> '') AS toks
      |  FROM (SELECT doc_id, i, words[i] AS word FROM docw), $mJoins),
      |agg AS (
      |  SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_bpe_tokens,
      |    string_agg(array_to_string(toks, ' '), ' ' ORDER BY i) AS bpe_text
      |  FROM wtok GROUP BY 1)
      |SELECT d.doc_id, coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
      |  coalesce(a.bpe_text, '') AS bpe_text
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin
  }

  /** t24: per-row weighted sampling — keep each document with probability
    * proportional to its length (capped at 1), deterministically. Thin
    * binding of [[graft.api.Graft.weightedSample]]. */
  def t24WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.weightedSample(Tables.load(s, dir, "documents"),
        $"doc_id", $"n_chars" / lit(2000.0))
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  /** t25: bigram-LM fluency — every document scored by the mean
    * conditional relative frequency of its bigrams under the corpus's own
    * counts, 1e-12-quantized so both engines agree exactly. Thin binding
    * of [[graft.api.Graft.bigramFluency]]. */
  def t25BigramFluency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.bigramFluency(Tables.load(s, dir, "documents"),
        $"doc_id", $"text")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t26: corpus datasheet — per-source volume/length/duplication report,
    * every statistic engine-exact. Thin binding of
    * [[graft.api.Graft.describeCorpus]]. */
  def t26CorpusReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.describeCorpus(Tables.load(s, dir, "documents"),
        $"text", $"source")
      .withColumnRenamed("grp", "source")
      .orderBy($"source")
  }

  /** t27: exact duplicate-substring spans — every 20-token sliding window
    * hashed corpus-wide, repeats flagged at every alignment, flagged
    * windows merged into maximal per-document duplicated spans. The
    * synthetic corpus's real near-duplicates guarantee nonzero spans.
    * Thin binding of [[graft.api.Graft.duplicateSpans]]. */
  def t27DuplicateSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.duplicateSpans(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", window = 20)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t28: duplicate-span excision — rebuild every document with its
    * corpus-duplicated 20-token spans removed (all occurrences; the
    * conservative boilerplate contract). Thin binding of
    * [[graft.api.Graft.exciseDuplicateSpans]]. */
  def t28ExciseDuplicates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.exciseDuplicateSpans(Tables.load(s, dir, "documents"),
        $"doc_id", $"text", window = 20)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t29: robust per-language length outliers — median/MAD scoring where
    * mean/stddev would be dragged by the very artifacts being hunted
    * (truncation stubs, concatenation blobs). Thin binding of
    * [[graft.api.Graft.robustOutliers]] grouped by lang over n_chars. */
  def t29RobustOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.robustOutliers(
        Tables.load(s, dir, "documents").select($"doc_id", $"lang", $"n_chars"),
        $"lang", $"n_chars", zCut = 2.5)
      .orderBy($"doc_id")
  }

  /** t30: dataset-level overlap matrix — every source pair's shared
    * distinct word-5-gram fingerprints with the Jaccard/containment they
    * imply. The mixing-weight sanity check run before combining slices:
    * row-level dedup (d02+) finds duplicate documents, this finds
    * duplicated DATASETS. Thin binding of
    * [[graft.api.Graft.corpusOverlap]] grouped by source. */
  def t30CorpusOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.corpusOverlap(
        Tables.load(s, dir, "documents"), $"source", $"text")
      .orderBy($"grp_a", $"grp_b")
  }

  /** t31: content-defined chunking + shift-resistant chunk dedup — each
    * document split at rolling-hash boundaries (storage-dedup style: a
    * mid-document edit re-chunks only its neighborhood, so chunk hashes
    * survive edits where fixed-offset chunking loses every later match),
    * then per-document accounting of chunks whose content recurs in other
    * documents. Thin binding of [[graft.api.Graft.cdcChunks]] + the d10
    * hot-chunk accounting. */
  def t31CdcChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ch = graft.api.Graft.cdcChunks(
      Tables.load(s, dir, "documents"), $"doc_id", $"text")
    val hot = ch.groupBy($"chunk_md5")
      .agg(countDistinct($"id").as("__nd"))
      .where($"__nd" > 1).select($"chunk_md5", lit(1).as("__hot"))
    ch.join(hot, Seq("chunk_md5"), "left")
      .groupBy($"id").agg(
        count(lit(1)).as("n_chunks"),
        count_if($"__hot".isNotNull).as("n_dup_chunks"),
        coalesce(sum(when($"__hot".isNotNull, $"chunk_len")), lit(0L))
          .as("dup_chars"))
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t32: the overlap matrix from bounded-state sketches — t30's exact
    * self-join replaced by per-source k-minimum-values MinHash sketches
    * (k = 128 truncates for real here: sources carry thousands of
    * fingerprints) and the pairwise Jaccard estimated from sketches alone,
    * deterministically. Thin binding of
    * [[graft.api.Graft.corpusOverlapSketch]]. */
  def t32OverlapSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.corpusOverlapSketch(
        Tables.load(s, dir, "documents"), $"source", $"text", k = 128)
      .orderBy($"grp_a", $"grp_b")
  }

  /** t33: LEAKAGE-SAFE corpus split — t21's hash split keyed by the
    * near-dup cluster instead of the row, so a test set can never contain
    * a verified near-duplicate of a training document (the classic
    * eval-inflation bug id-hash splitting commits by construction). The
    * full dedup chain decides the clusters; singleton docs split exactly
    * as t21 does. Thin binding of
    * [[graft.api.Graft.splitCorpusLeakageSafe]]. */
  def t33LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.splitCorpusLeakageSafe(
        Tables.load(s, dir, "documents"), $"doc_id", $"text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"lang", $"split")
      .orderBy($"doc_id")
  }

  /** t35: greedy token-budget curation — the "train on the best N tokens"
    * selection: rank documents by a quality score (n_chars here — any
    * deterministic score works) and keep them, best first, until a global
    * 10k-token budget fills. Thin binding of
    * [[graft.api.Graft.selectByTokenBudget]] (bucketed exact prefix sum,
    * no global sort); the oracle is the equivalent QUALIFY'd running-sum
    * window over a true global order, pinning the bucketed form equal to
    * the global-sort form including boundary and tie behavior. */
  def t35TokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    graft.api.Graft.selectByTokenBudget(
        docs, $"doc_id", $"n_chars",
        size(filter(split(trim($"text"), "\\s+"), t => t =!= lit(""))),
        budget = 10000L)
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t36: per-language token quotas — t35's greedy selection with an
    * independent 3k-token budget per lang, the mixture-controlled
    * curation shape (token-weighted t17). Thin binding of
    * [[graft.api.Graft.selectByTokenBudgetPerGroup]]. */
  def t36LangTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    graft.api.Graft.selectByTokenBudgetPerGroup(
        docs, $"doc_id", $"lang", $"n_chars",
        size(filter(split(trim($"text"), "\\s+"), t => t =!= lit(""))),
        budget = 3000L)
      .withColumnRenamed("id", "doc_id").withColumnRenamed("grp", "lang")
      .orderBy($"doc_id")
  }

  /** t38: exact heavy hitters WITHOUT a full-vocabulary shuffle — every
    * token holding more than 1/30th of all token occurrences, with its
    * exact count, found by the mergeable Misra–Gries sketch + exact-verify
    * two-pass ([[graft.api.Graft.heavyHitters]]). The sketch pass bounds
    * state at 240 counters however large the vocabulary; the verify pass
    * pushes the candidate IN-list into the scan. The oracle is the exact
    * full groupBy — pinning that sketch-then-verify equals exact. */
  def t38HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select(explode(tokens($"text")).as("token"))
      .where($"token" =!= "")
    graft.api.Graft.heavyHitters(toks, $"token", k = 30)
  }

  /** t39: frequency-ranked vocabulary to a coverage target — the smallest
    * (cnt DESC, token ASC)-prefix of the word-BIGRAM vocabulary covering
    * half of all bigram occurrences (the tokenizer-vocab construction
    * step, on the richer 900-ish-entry bigram vocabulary rather than the
    * corpus's 31 unigrams). Thin binding of
    * [[graft.api.Graft.vocabularyCoverage]] (bucketed exact prefix sum,
    * no global sort); the oracle is the global-sort running-sum window. */
  def t39VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.load(s, dir, "documents")
      .select(tokens($"text").as("a"))
      .where(size($"a") >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(a)-2), i -> concat(a[i], ' ', a[i+1]))"))
        .as("token"))
    graft.api.Graft.vocabularyCoverage(big, $"token", coverage = 0.5)
      .orderBy($"cum_cnt")
  }

  /** t40: interpolated Kneser–Ney bigram scoring — t25's ML bigram
    * fluency upgraded to the discount/back-off smoothing a real LM-based
    * quality filter uses (unseen continuations funded by distinct-context
    * mass, not raw frequency). Thin binding of
    * [[graft.api.Graft.knBigramScore]]; the oracle mirrors the exact
    * IEEE expression shape, probability-space + 1e-12 quantization
    * (t25's determinism discipline). */
  def t40KnFluency(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.knBigramScore(
        Tables.load(s, dir, "documents"), $"doc_id", $"text")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t41: DSIR-style importance weighting — score each non-benchmark
    * document by the mean target-vs-corpus likelihood ratio of its word
    * bigrams, with the t06 hash-bucket docs playing the target domain.
    * The data-selection signal "keep what looks like the target"; thin
    * binding of [[graft.api.Graft.importanceWeights]] (joint frequency
    * table + one-row broadcast totals; ratio-space + 1e-12 quantization
    * per t25/t40's determinism discipline). */
  def t41ImportanceWeights(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val bucket = conv(substring(md5($"doc_id".cast(StringType)), 1, 4), 16, 10)
      .cast(LongType)
    val isBench = bucket % 20 === 0
    graft.api.Graft.importanceWeights(
        docs.where(!isBench), $"doc_id", $"text",
        docs.where(isBench), $"text")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t42: corpus-slice drift — the data-quality monitor between corpus
    * versions/sources: per-token triangular-discrimination contributions
    * between the English slice and everything else, top 20 + the
    * whole-distribution total. Thin binding of
    * [[graft.api.Graft.tokenDistributionDrift]] (rational f-divergence,
    * 1e-12 quantization — the log-free determinism discipline). */
  def t42CorpusDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    graft.api.Graft.tokenDistributionDrift(
        docs.where($"lang" === "en"), $"text",
        docs.where($"lang" =!= "en"), $"text", topK = 20)
      .orderBy($"rank")
  }

  /** t43: MIXED-LANGUAGE detection — the code-switching cleaning signal
    * (documents whose segments disagree about their language hurt
    * monolingual training slices and break per-language quotas): t02's
    * n-gram heuristic applied per 10-token SEGMENT, rolled up to
    * (majority language, disagreeing-segment count, mixed fraction) per
    * document. Majority ties break on the language name; the fraction is
    * one exact integer division. */
  def t43MixedLanguage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val segs = Tables.load(s, dir, "documents")
      .select($"doc_id", t.as("t"))
      .where(size($"t") >= 1)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, (size(t)-1) div 10), i -> slice(t, i*10+1, 10))"))
        .as("seg"))
    val n = size($"seg").cast(DoubleType)
    val scoreEn = size(filter($"seg", x => x.isin(StopWords: _*)))
      .cast(DoubleType) / n
    val scoreEs = size(filter($"seg", x => x.endsWith("o") || x.endsWith("a")))
      .cast(DoubleType) / n
    val scoreDe = size(filter($"seg",
      x => x.endsWith("en") || x.startsWith("sch"))).cast(DoubleType) / n
    val segLang = segs.select($"doc_id",
      when(scoreEn >= scoreEs && scoreEn >= scoreDe && scoreEn > 0, "en")
        .when(scoreEs >= scoreDe && scoreEs > 0, "es")
        .when(scoreDe > 0, "de")
        .otherwise("und").as("seg_lang"))
    val perLang = segLang.groupBy($"doc_id", $"seg_lang")
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy($"doc_id").orderBy($"__c".desc, $"seg_lang")
    val major = perLang
      .withColumn("__rk", row_number().over(w)).where($"__rk" === 1)
      .select($"doc_id", $"seg_lang".as("majority_lang"), $"__c".as("__maj"))
    perLang.groupBy($"doc_id").agg(sum($"__c").as("n_segments"))
      .join(major, Seq("doc_id"))
      .select($"doc_id", $"n_segments", $"majority_lang",
        ($"n_segments" - $"__maj").as("n_disagree"),
        (($"n_segments" - $"__maj").cast(DoubleType) /
          $"n_segments".cast(DoubleType)).as("mixed_frac"))
      .orderBy($"doc_id")
  }

  /** t44: domain-blocklist flags — the crawl kill rule over t16's planted
    * URLs: `example3.com` (catches `docs.example3.com` by SUBDOMAIN
    * suffix) and `mirror.example.org` (exact). Thin binding of
    * [[graft.api.Graft.domainBlocklistFlags]] (suffix-expansion
    * equi-join against the broadcast blocklist — never an endsWith theta
    * join). */
  def t44DomainBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    def ds = d.cast(StringType)
    val withUrl = concat(
      $"text",
      when(d % 3 === 0, concat(lit(" see https://docs.example"),
          (d % 5).cast(StringType), lit(".com/guide/page"), ds,
          lit("?ref=r"), (d % 7).cast(StringType)))
        .otherwise(lit("")),
      when(d % 4 === 1, concat(lit(" and http://www.mirror.example.org/path"), ds))
        .otherwise(lit("")))
    graft.api.Graft.domainBlocklistFlags(
        Tables.load(s, dir, "documents").withColumn("t", withUrl),
        $"doc_id", $"t",
        blocked = Seq("example3.com", "mirror.example.org"))
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t45: EXACT classifier-evaluation AUC — the step that decides
    * whether a quality scorer is worth thresholding on: per source
    * slice, the tie-aware ROC AUC of a ranking signal (here the
    * stopword count, t02's English-ness evidence — integer-valued, so
    * ties are heavy and the average-rank arithmetic is genuinely
    * exercised) against the declared-language weak label. Thin binding
    * of [[graft.api.Graft.binaryAucPerGroup]]; the all-integer
    * Mann–Whitney form makes the value engine-exact. */
  def t45ClassifierAuc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    graft.api.Graft.binaryAucPerGroup(
        Tables.load(s, dir, "documents").select($"source",
          size(filter(t, x => x.isin(StopWords: _*))).cast(LongType)
            .as("score"),
          ($"lang" === "en").as("label")),
        $"source", $"score", $"label")
      .withColumnRenamed("grp", "source")
      .orderBy($"source")
  }

  /** t46: n-gram REPETITION PROFILE per source — the compressibility /
    * dedup-dividend estimator: distinct-vs-total n-gram ratios at
    * n = 1, 2, 3 (a ratio rising with n = repeated PHRASES, the dedup
    * target; flat = just a small vocabulary). Thin binding of
    * [[graft.api.Graft.ngramRepetitionProfile]]. */
  def t46RepetitionProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.api.Graft.ngramRepetitionProfile(
        Tables.load(s, dir, "documents"), $"source", $"text", maxN = 3)
      .withColumnRenamed("grp", "source")
      .orderBy($"source", $"n")
  }

  /** t47: CHECKSUM-GATED PII detection — the precision tier above t09's
    * regex redaction: every planted 16-digit candidate is re-validated
    * with the Luhn check before counting as a card, which is how a
    * compliance pipeline keeps order numbers and tracking codes out of
    * the quarantine queue. The gate plants one VALID card (doc_id % 5)
    * and one INVALID same-shape number (doc_id % 7) per selected
    * document — check digit computed from the same doubled-digit sum on
    * both sides, so the oracle proves the full loop: plant -> extract
    * -> validate. Thin binding of [[graft.api.Graft.luhnCardFlags]]. */
  def t47LuhnCards(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    val base = concat(lit("4"),
      lpad((d % 100000000L).cast(StringType), 14, "0"))
    val sSum = (0 until 15).map { i =>
      val dg = substring(base, i + 1, 1).cast(IntegerType)
      if (i % 2 == 0) { val dd = dg * 2; when(dd > 9, dd - 9).otherwise(dd) }
      else dg
    }.reduce(_ + _)
    val check = (lit(10) - (sSum % 10)) % 10
    val withCards = concat($"text",
      when(d % 5 === 0,
        concat(lit(" card "), base, check.cast(StringType)))
        .otherwise(lit("")),
      when(d % 7 === 0,
        concat(lit(" num "), base, ((check + 5) % 10).cast(StringType)))
        .otherwise(lit("")))
    graft.api.Graft.luhnCardFlags(
        Tables.load(s, dir, "documents").withColumn("t", withCards),
        $"doc_id", $"t")
      .withColumnRenamed("id", "doc_id")
      .orderBy($"doc_id")
  }

  /** t48: canonical TEXT NORMALIZATION — the pre-hash cleaning primitive
    * ([[graft.api.Graft.normalizeText]]): typographic quotes/dashes
    * canonicalized, control characters to spaces, whitespace collapsed.
    * The gate plants a messy suffix (curly quotes, em dash, tab, BEL,
    * double spaces) on every third document and pins the normalized
    * md5 + length cross-engine; idempotence is spec-pinned. */
  def t48NormalizeText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    val messy = concat($"text",
      when(d % 3 === 0,
        lit("  “qu’oted” — and\tctrl\u0007end  "))
        .otherwise(lit("")))
    Tables.load(s, dir, "documents")
      .select(d, graft.api.Graft.normalizeText(messy).as("__n"))
      .select($"doc_id", md5($"__n").as("norm_md5"),
        length($"__n").cast(LongType).as("n_chars_norm"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t48_normalize_text" -> t48NormalizeText,
    "t47_luhn_cards" -> t47LuhnCards,
    "t46_repetition_profile" -> t46RepetitionProfile,
    "t45_classifier_auc" -> t45ClassifierAuc,
    "t44_domain_blocklist" -> t44DomainBlocklist,
    "t43_mixed_language" -> t43MixedLanguage,
    "t42_corpus_drift" -> t42CorpusDrift,
    "t41_importance_weights" -> t41ImportanceWeights,
    "t40_kn_fluency" -> t40KnFluency,
    "t39_vocab_coverage" -> t39VocabCoverage,
    "t38_heavy_hitters" -> t38HeavyHitters,
    "t36_lang_token_budget" -> t36LangTokenBudget,
    "t35_token_budget" -> t35TokenBudget,
    "t33_leakage_safe_split" -> t33LeakageSafeSplit,
    "t32_overlap_sketch" -> t32OverlapSketch,
    "t31_cdc_chunks" -> t31CdcChunks,
    "t30_corpus_overlap" -> t30CorpusOverlap,
    "t29_robust_outliers" -> t29RobustOutliers,
    "t28_excise_duplicates" -> t28ExciseDuplicates,
    "t27_duplicate_spans" -> t27DuplicateSpans,
    "t26_corpus_report" -> t26CorpusReport,
    "t25_bigram_fluency" -> t25BigramFluency,
    "t24_weighted_sample" -> t24WeightedSample,
    "t23_bpe_tokenize" -> t23BpeTokenize,
    "t22_bpe_merges" -> t22BpeMerges,
    "t20_chunk_documents" -> t20ChunkDocuments,
    "t21_corpus_split" -> t21CorpusSplit,
    "t18_quality_classifier" -> t18QualityClassifier,
    "t19_temperature_mix" -> t19TemperatureMix,
    "t17_lang_quota" -> t17LangQuota,
    "t14_sequence_packing" -> t14SequencePacking,
    "t15_distinctive_terms" -> t15DistinctiveTerms,
    "t16_domain_stats" -> t16DomainStats,
    "t10_url_extraction" -> t10UrlExtraction,
    "t11_clean_corpus" -> t11CleanCorpus,
    "t12_oov_rate" -> t12OovRate,
    "t13_data_mix" -> t13DataMix,
    "t01_text_stats" -> t01TextStats,
    "t02_lang_id" -> t02LangId,
    "t03_fingerprint" -> t03Fingerprint,
    "t04_top_tokens" -> t04TopTokens,
    "t05_bpe_tokens" -> t05BpeTokens,
    "t06_contamination" -> t06Contamination,
    "t34_contamination_bloom" -> t34ContaminationBloom,
    "t07_quality_signals" -> t07QualitySignals,
    "t08_repetition_filter" -> t08RepetitionFilter,
    "t09_pii_redaction" -> t09PiiRedaction)

  /** Shared t06/t34 oracle — both compute the same decontamination
    * fractions; t34 merely routes through the bloom prefilter. */
  private val T06Sql: String =
    s"""WITH d AS (SELECT doc_id,
       |  regexp_split_to_array(trim(text), '\\s+') AS t,
       |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 20 = 0 AS is_bench
       | FROM documents),
       |g AS (SELECT doc_id, is_bench,
       |  list_distinct(list_transform(generate_series(1, len(t) - 4),
       |    i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS gs
       | FROM d WHERE len(t) >= 5),
       |bench AS (SELECT DISTINCT unnest(gs) AS ng FROM g WHERE is_bench),
       |sc AS (SELECT doc_id, unnest(gs) AS ng FROM g WHERE NOT is_bench)
       |SELECT doc_id,
       | count(*) AS n_ngrams,
       | CAST(sum(CASE WHEN ng IN (SELECT ng FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       | CAST(sum(CASE WHEN ng IN (SELECT ng FROM bench) THEN 1 ELSE 0 END) AS DOUBLE)
       |   / count(*) AS contamination
       |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "t48_normalize_text" ->
      """WITH m AS (
        |  SELECT doc_id, text || CASE WHEN doc_id % 3 = 0
        |    THEN '  “qu’oted” — and' || chr(9) || 'ctrl' || chr(7) || 'end  '
        |    ELSE '' END AS t
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(t,
        |      '[‘’‚‛]', '''', 'g'),
        |      '[“”„‟]', '"', 'g'),
        |      '[–—―]', '-', 'g'),
        |      '[\x00-\x1f\x7f]', ' ', 'g'),
        |      '\s+', ' ', 'g')) AS nt
        |  FROM m)
        |SELECT doc_id, md5(nt) AS norm_md5,
        | CAST(length(nt) AS BIGINT) AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin,
    "t47_luhn_cards" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |   '4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 14, '0') AS base
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, base,
        |   list_aggregate(list_transform(range(0, 15), i ->
        |     CASE WHEN CAST(i AS INTEGER) % 2 = 0
        |       THEN CASE WHEN CAST(substr(base, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 > 9
        |            THEN CAST(substr(base, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 - 9
        |            ELSE CAST(substr(base, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 END
        |       ELSE CAST(substr(base, CAST(i AS INTEGER)+1, 1) AS INTEGER) END),
        |     'sum') AS ssum
        |  FROM b),
        |p AS (
        |  SELECT doc_id, text
        |   || CASE WHEN doc_id % 5 = 0 THEN ' card ' || base
        |        || CAST((10 - ssum % 10) % 10 AS VARCHAR) ELSE '' END
        |   || CASE WHEN doc_id % 7 = 0 THEN ' num ' || base
        |        || CAST(((10 - ssum % 10) % 10 + 5) % 10 AS VARCHAR) ELSE '' END
        |   AS t
        |  FROM s),
        |c AS (SELECT doc_id, regexp_extract_all(t, '\b\d{16}\b') AS cands FROM p)
        |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_card_like,
        | CAST(len(list_filter(cands, cc ->
        |   list_aggregate(list_transform(range(0, 16), i ->
        |     CASE WHEN CAST(i AS INTEGER) % 2 = 0
        |       THEN CASE WHEN CAST(substr(cc, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 > 9
        |            THEN CAST(substr(cc, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 - 9
        |            ELSE CAST(substr(cc, CAST(i AS INTEGER)+1, 1) AS INTEGER)*2 END
        |       ELSE CAST(substr(cc, CAST(i AS INTEGER)+1, 1) AS INTEGER) END),
        |     'sum') % 10 = 0)) AS BIGINT) AS n_luhn_valid
        |FROM c ORDER BY doc_id""".stripMargin,
    "t45_classifier_auc" ->
      """WITH d AS (
        |  SELECT source,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |     x -> x IN ('the','a','of','to','in'))) AS BIGINT) AS s,
        |   (lang = 'en') AS y
        |  FROM documents),
        |h AS (
        |  SELECT source, s,
        |   CAST(count(*) FILTER (y) AS BIGINT) AS p,
        |   CAST(count(*) FILTER (NOT y) AS BIGINT) AS n
        |  FROM d GROUP BY source, s),
        |c AS (
        |  SELECT source, s, p, n,
        |   coalesce(sum(n) OVER (PARTITION BY source ORDER BY s
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumn
        |  FROM h)
        |SELECT source, CAST(sum(p) AS BIGINT) AS n_pos,
        | CAST(sum(n) AS BIGINT) AS n_neg,
        | CASE WHEN sum(p) > 0 AND sum(n) > 0
        |      THEN CAST(sum(p * (2 * cumn + n)) AS DOUBLE)
        |           / CAST(2 * sum(p) * sum(n) AS DOUBLE)
        |      ELSE NULL END AS auc
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "t46_repetition_profile" ->
      """WITH d AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT source, 1 AS n, unnest(t) AS gram FROM d
        |  UNION ALL
        |  SELECT source, 2, unnest(list_transform(generate_series(2, len(t)),
        |    i -> array_to_string(list_slice(t, i-1, i), ' '))) FROM d
        |  WHERE len(t) >= 2
        |  UNION ALL
        |  SELECT source, 3, unnest(list_transform(generate_series(3, len(t)),
        |    i -> array_to_string(list_slice(t, i-2, i), ' '))) FROM d
        |  WHERE len(t) >= 3)
        |SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
        | CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
        | 1.0 - CAST(count(DISTINCT gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |   AS repetition_ratio
        |FROM g GROUP BY source, n ORDER BY source, n""".stripMargin,
    "t44_domain_blocklist" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' see https://docs.example'
        |         || CAST(doc_id % 5 AS VARCHAR) || '.com/guide/page'
        |         || CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR)
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 1 THEN ' and http://www.mirror.example.org/path'
        |         || CAST(doc_id AS VARCHAR)
        |       ELSE '' END AS t
        | FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\s]+')) AS url FROM p),
        |d AS (SELECT doc_id,
        |  regexp_replace(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '^www\.', '') AS domain
        | FROM u),
        |f AS (SELECT doc_id, domain,
        |  EXISTS(SELECT 1 FROM (SELECT unnest(['example3.com', 'mirror.example.org']) AS bd)
        |         WHERE domain = bd OR domain LIKE '%.' || bd) AS blk
        | FROM d),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(*) FILTER (WHERE blk) AS BIGINT) AS n_blocked
        | FROM f GROUP BY doc_id)
        |SELECT p.doc_id, coalesce(agg.n_urls, 0) AS n_urls,
        | coalesce(agg.n_blocked, 0) AS n_blocked,
        | coalesce(agg.n_blocked, 0) > 0 AS blocked
        |FROM p LEFT JOIN agg ON p.doc_id = agg.doc_id
        |ORDER BY p.doc_id""".stripMargin,
    "t43_mixed_language" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, list_slice(t, i*10+1, i*10+10) AS seg
        |  FROM (SELECT doc_id, t, unnest(range(0, ((len(t)-1)//10)+1)) AS i
        |        FROM d WHERE len(t) >= 1)),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(seg, x -> x IN ('the','a','of','to','in'))) AS DOUBLE) / len(seg) AS score_en,
        |  CAST(len(list_filter(seg, x -> x LIKE '%o' OR x LIKE '%a')) AS DOUBLE) / len(seg) AS score_es,
        |  CAST(len(list_filter(seg, x -> x LIKE '%en' OR x LIKE 'sch%')) AS DOUBLE) / len(seg) AS score_de
        | FROM segs),
        |sl AS (SELECT doc_id,
        |  CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en > 0 THEN 'en'
        |       WHEN score_es >= score_de AND score_es > 0 THEN 'es'
        |       WHEN score_de > 0 THEN 'de' ELSE 'und' END AS seg_lang
        | FROM sc),
        |pl AS (SELECT doc_id, seg_lang, count(*) AS c FROM sl GROUP BY 1, 2),
        |mj AS (SELECT doc_id, seg_lang AS majority_lang, c AS maj,
        |   row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, seg_lang) AS rk
        |  FROM pl),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_segments
        |        FROM pl GROUP BY 1)
        |SELECT tot.doc_id, n_segments, majority_lang,
        | CAST(n_segments - maj AS BIGINT) AS n_disagree,
        | CAST(n_segments - maj AS DOUBLE) / CAST(n_segments AS DOUBLE) AS mixed_frac
        |FROM tot JOIN mj ON tot.doc_id = mj.doc_id AND rk = 1
        |ORDER BY tot.doc_id""".stripMargin,
    "t42_corpus_drift" ->
      """WITH ta AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |    '\s+'), x -> x <> '')) AS token
        |  FROM documents WHERE lang = 'en'),
        |tb AS (
        |  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
        |    '\s+'), x -> x <> '')) AS token
        |  FROM documents WHERE lang <> 'en'),
        |ca AS (SELECT token, count(*) AS ca FROM ta GROUP BY token),
        |cb AS (SELECT token, count(*) AS cb FROM tb GROUP BY token),
        |joint AS (
        |  SELECT coalesce(ca.token, cb.token) AS token,
        |   coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |        CAST(sum(cb) AS BIGINT) AS nb FROM joint),
        |q AS (
        |  SELECT token, CAST(ca AS BIGINT) AS cnt_a, CAST(cb AS BIGINT) AS cnt_b,
        |   CAST(round(((CAST(ca AS DOUBLE) / CAST(tot.na AS DOUBLE)
        |       - CAST(cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
        |     * (CAST(ca AS DOUBLE) / CAST(tot.na AS DOUBLE)
        |       - CAST(cb AS DOUBLE) / CAST(tot.nb AS DOUBLE))
        |     / (CAST(ca AS DOUBLE) / CAST(tot.na AS DOUBLE)
        |       + CAST(cb AS DOUBLE) / CAST(tot.nb AS DOUBLE)))
        |     * 1e12) AS BIGINT) AS drift_q
        |  FROM joint CROSS JOIN tot),
        |tq AS (SELECT CAST(sum(drift_q) AS BIGINT) AS total_drift_q FROM q)
        |SELECT token, cnt_a, cnt_b, drift_q, tq.total_drift_q,
        | CAST(row_number() OVER (ORDER BY drift_q DESC, token) AS BIGINT) AS rank
        |FROM q CROSS JOIN tq
        |ORDER BY drift_q DESC, token LIMIT 20""".stripMargin,
    "t41_importance_weights" ->
      """WITH d AS (
        |  SELECT doc_id,
        |   list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |     x -> x <> '') AS t,
        |   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 20 = 0 AS is_bench
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, is_bench, t[i-1] || ' ' || t[i] AS ng
        |  FROM (SELECT doc_id, is_bench, t, unnest(range(2, len(t)+1)) AS i
        |        FROM d)),
        |ct AS (SELECT ng, count(*) AS ct FROM bi WHERE is_bench GROUP BY ng),
        |cc AS (SELECT ng, count(*) AS cc FROM bi WHERE NOT is_bench GROUP BY ng),
        |joint AS (
        |  SELECT coalesce(ct.ng, cc.ng) AS ng,
        |   coalesce(ct.ct, 0) AS ct, coalesce(cc.cc, 0) AS cc
        |  FROM ct FULL OUTER JOIN cc ON ct.ng = cc.ng),
        |tot AS (SELECT count(*) AS v, CAST(sum(ct) AS BIGINT) AS nt,
        |        CAST(sum(cc) AS BIGINT) AS nc FROM joint),
        |q AS (
        |  SELECT bi.doc_id,
        |   CAST(round(((CAST(joint.ct + 1 AS DOUBLE) / CAST(tot.nt + tot.v AS DOUBLE))
        |     / (CAST(joint.cc + 1 AS DOUBLE) / CAST(tot.nc + tot.v AS DOUBLE)))
        |     * 1e12) AS BIGINT) AS q
        |  FROM bi JOIN joint USING (ng) CROSS JOIN tot
        |  WHERE NOT bi.is_bench),
        |s AS (SELECT doc_id, count(*) AS n_ngrams, sum(q) AS sq
        |      FROM q GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(s.n_ngrams, 0) AS BIGINT) AS n_ngrams,
        | CAST(s.sq AS DOUBLE) / 1e12 / s.n_ngrams AS importance
        |FROM (SELECT doc_id FROM d WHERE NOT is_bench) d2
        |LEFT JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t40_kn_fluency" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)),
        |    '\s+'), x -> x <> '') AS t FROM documents),
        |bi AS (
        |  SELECT doc_id, t[i-1] AS p, t[i] AS w
        |  FROM (SELECT doc_id, t, unnest(range(2, len(t)+1)) AS i FROM d)),
        |c2 AS (SELECT p, w, count(*) AS c2 FROM bi GROUP BY p, w),
        |byp AS (SELECT p, CAST(sum(c2) AS BIGINT) AS c1, count(*) AS tt
        |        FROM c2 GROUP BY p),
        |byw AS (SELECT w, count(*) AS ctx FROM c2 GROUP BY w),
        |btot AS (SELECT count(*) AS b FROM c2),
        |q AS (
        |  SELECT bi.doc_id,
        |   CAST(round(((greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0)
        |     + 0.75 * CAST(byp.tt AS DOUBLE)
        |       * (CAST(byw.ctx AS DOUBLE) / CAST(btot.b AS DOUBLE)))
        |     / CAST(byp.c1 AS DOUBLE)) * 1e12) AS BIGINT) AS q
        |  FROM bi JOIN c2 USING (p, w) JOIN byp USING (p)
        |  JOIN byw USING (w) CROSS JOIN btot),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, sum(q) AS sq
        |      FROM q GROUP BY doc_id)
        |SELECT d2.doc_id, CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        | CAST(s.sq AS DOUBLE) / 1e12 / s.n_bigrams AS kn_score
        |FROM documents d2 LEFT JOIN s USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t38_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tt AS (SELECT token FROM t WHERE token <> ''),
        |c AS (SELECT token, count(*) AS cnt FROM tt GROUP BY token)
        |SELECT token, cnt FROM c
        |WHERE cnt * 30 > (SELECT count(*) FROM tt)
        |ORDER BY cnt DESC, token""".stripMargin,
    "t39_vocab_coverage" ->
      """WITH d AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS a FROM documents),
        |t AS (
        |  SELECT unnest(list_transform(range(1, len(a)),
        |    i -> a[i] || ' ' || a[i+1])) AS token FROM d),
        |c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
        |w AS (SELECT token, cnt,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, token) AS BIGINT) AS cum_cnt
        |  FROM c)
        |SELECT token, cnt, cum_cnt FROM w
        |WHERE CAST(cum_cnt - cnt AS DOUBLE)
        |    < 0.5 * (SELECT CAST(sum(cnt) AS DOUBLE) FROM c)
        |ORDER BY cum_cnt""".stripMargin,
    "t36_lang_token_budget" ->
      """WITH t AS (
        |  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS score,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |     x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, doc_id, score, n_tokens,
        |   CAST(sum(n_tokens) OVER (PARTITION BY lang
        |     ORDER BY score DESC NULLS LAST, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT lang, doc_id, score, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 3000 ORDER BY doc_id""".stripMargin,
    "t35_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
        |   CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |     x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, score, n_tokens,
        |   CAST(sum(n_tokens) OVER (
        |     ORDER BY score DESC NULLS LAST, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, score, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 10000 ORDER BY doc_id""".stripMargin,
    "t33_leakage_safe_split" -> {
      val cuts = Seq(0.8, 0.9).map(f => math.round(f * 65536))
      s"""WITH RECURSIVE ${Dedup.sigsSql()},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM documents),
         |edges AS (
         |  SELECT doc_a, doc_b FROM agreed
         |  JOIN sets sa ON agreed.doc_a = sa.doc_id
         |  JOIN sets sb ON agreed.doc_b = sb.doc_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |     / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),
         |verts AS (SELECT doc_a AS id FROM edges UNION SELECT doc_b FROM edges),
         |edges2 AS (SELECT doc_a AS a, doc_b AS b FROM edges
         |           UNION SELECT doc_b, doc_a FROM edges),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN edges2 e2 ON r.b = e2.a),
         |cc AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |lbl AS (
         |  SELECT d.doc_id, d.lang, coalesce(cc.comp, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id)
         |SELECT doc_id, lang,
         |  CASE WHEN CAST(concat('0x', substr(md5(CAST(grp AS VARCHAR)), 1, 4)) AS BIGINT) < ${cuts(0)} THEN 'train'
         |       WHEN CAST(concat('0x', substr(md5(CAST(grp AS VARCHAR)), 1, 4)) AS BIGINT) < ${cuts(1)} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lbl ORDER BY doc_id""".stripMargin
    },
    "t32_overlap_sketch" ->
      """WITH t AS (
        |  SELECT source,
        |   list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT source,
        |   md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS fp
        |  FROM (SELECT source, tk, unnest(generate_series(1, len(tk) - 4)) AS i
        |        FROM t WHERE len(tk) >= 5)),
        |rk AS (SELECT source, fp,
        |        row_number() OVER (PARTITION BY source ORDER BY fp) AS r
        |       FROM g),
        |sk AS (SELECT source, list_sort(list(fp)) AS sk
        |       FROM rk WHERE r <= 128 GROUP BY source),
        |p AS (SELECT a.source AS grp_a, b.source AS grp_b,
        |       list_slice(list_sort(list_distinct(list_concat(a.sk, b.sk))),
        |                  1, 128) AS xx,
        |       a.sk AS sa, b.sk AS sb
        |      FROM sk a JOIN sk b ON a.source < b.source)
        |SELECT grp_a, grp_b,
        | CAST(len(list_intersect(list_intersect(xx, sa), sb)) AS BIGINT) AS n_common,
        | CAST(len(xx) AS BIGINT) AS k_used,
        | CAST(len(list_intersect(list_intersect(xx, sa), sb)) AS DOUBLE)
        |   / len(xx) AS j_est
        |FROM p ORDER BY grp_a, grp_b""".stripMargin,
    "t31_cdc_chunks" -> {
      // the same literal-power polynomial window hash cdcChunks uses
      // (base CdcB mod Mersenne CdcM, window 8, divisor 64) — powers are
      // inlined as BIGINT constants so DuckDB's DOUBLE-valued pow() never
      // enters the expression; exact because every sum stays below 2^41
      val terms = graft.api.Graft.cdcPowers(8).zipWithIndex.map {
        case (p, j) => s"ascii(cs[i - ${7 - j}]) * ${p}::BIGINT"
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n,
        |   string_split(text, '') AS cs FROM documents),
        |bn AS (
        |  SELECT doc_id, text, n,
        |   CASE WHEN n >= 8 THEN list_filter(generate_series(8, n), i ->
        |     ($terms) % 2147483647 % 64 = 0)
        |   ELSE [] END AS bnds
        |  FROM d),""".stripMargin + "\n" +
      """ex AS (
        |  SELECT doc_id, text, n, bnds,
        |   unnest(generate_series(1, len(bnds) + 1)) AS j
        |  FROM bn),
        |sp AS (
        |  SELECT doc_id, text,
        |   CASE WHEN j = 1 THEN 0 ELSE bnds[j - 1] END AS s,
        |   CASE WHEN j <= len(bnds) THEN bnds[j] ELSE n END AS e
        |  FROM ex),
        |ck AS (
        |  SELECT doc_id, e - s AS chunk_len, md5(substr(text, s + 1, e - s)) AS h
        |  FROM sp WHERE e > s),
        |hot AS (SELECT h FROM ck GROUP BY h HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(count(*) FILTER (h IN (SELECT h FROM hot)) AS BIGINT) AS n_dup_chunks,
        | CAST(coalesce(sum(chunk_len) FILTER (h IN (SELECT h FROM hot)), 0) AS BIGINT)
        |   AS dup_chars
        |FROM ck GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "t30_corpus_overlap" ->
      """WITH t AS (
        |  SELECT source,
        |   list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT source,
        |   md5(array_to_string(list_slice(tk, i, i + 4), ' ')) AS fp
        |  FROM (SELECT source, tk, unnest(generate_series(1, len(tk) - 4)) AS i
        |        FROM t WHERE len(tk) >= 5)),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n_fp FROM g GROUP BY source),
        |sh AS (
        |  SELECT a.source AS grp_a, b.source AS grp_b,
        |   CAST(count(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b ON a.fp = b.fp AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT grp_a, grp_b, n_shared, sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
        | CAST(n_shared AS DOUBLE) / (sa.n_fp + sb.n_fp - n_shared) AS jaccard,
        | CAST(n_shared AS DOUBLE) / least(sa.n_fp, sb.n_fp) AS containment
        |FROM sh
        |JOIN sz sa ON grp_a = sa.source
        |JOIN sz sb ON grp_b = sb.source
        |ORDER BY grp_a, grp_b""".stripMargin,
    "t29_robust_outliers" ->
      // 1.4826 must be CAST to DOUBLE (DuckDB parses the bare literal as
      // DECIMAL(5,4) and decimal arithmetic would diverge from Spark's IEEE)
      """WITH m AS (
        |  SELECT doc_id, lang, n_chars,
        |   quantile_cont(CAST(n_chars AS DOUBLE), 0.5)
        |     OVER (PARTITION BY lang) AS med
        |  FROM documents),
        |mm AS (
        |  SELECT doc_id, lang, n_chars, med,
        |   quantile_cont(abs(CAST(n_chars AS DOUBLE) - med), 0.5)
        |     OVER (PARTITION BY lang) AS mad
        |  FROM m)
        |SELECT doc_id, lang, n_chars, med, mad,
        | CASE WHEN mad <> 0 THEN (CAST(n_chars AS DOUBLE) - med)
        |        / (CAST(1.4826 AS DOUBLE) * mad) END AS robust_z,
        | coalesce(abs(CASE WHEN mad <> 0 THEN (CAST(n_chars AS DOUBLE) - med)
        |        / (CAST(1.4826 AS DOUBLE) * mad) END) > CAST(2.5 AS DOUBLE),
        |   false) AS is_outlier
        |FROM mm ORDER BY doc_id""".stripMargin,
    "t22_bpe_merges" -> t22OracleSql(8),
    "t23_bpe_tokenize" -> t23OracleSql(8),
    "t28_excise_duplicates" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM d),
        |wins AS (
        |  SELECT doc_id, i AS ws, i + 19 AS we,
        |    md5(array_to_string(list_slice(toks, i, i + 19), ' ')) AS wh
        |  FROM base, unnest(range(1, CAST(n_tokens AS INTEGER) - 19 + 1)) AS t(i)),
        |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) > 1),
        |flagged AS (SELECT doc_id, ws, we FROM wins JOIN dup USING (wh)),
        |tokpos AS (
        |  SELECT doc_id, i, toks[i] AS tok
        |  FROM base, unnest(range(1, CAST(n_tokens AS INTEGER) + 1)) AS t(i)),
        |covered AS (
        |  SELECT DISTINCT tp.doc_id, tp.i
        |  FROM tokpos tp JOIN flagged f
        |    ON tp.doc_id = f.doc_id AND tp.i BETWEEN f.ws AND f.we),
        |kept AS (
        |  SELECT tp.doc_id, tp.i, tp.tok
        |  FROM tokpos tp LEFT JOIN covered c
        |    ON tp.doc_id = c.doc_id AND tp.i = c.i
        |  WHERE c.i IS NULL),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY i) AS clean_text
        |  FROM kept GROUP BY 1)
        |SELECT b.doc_id, b.n_tokens,
        |  b.n_tokens - coalesce(a.n_kept, 0) AS dup_tokens,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,
    "t27_duplicate_spans" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM d),
        |wins AS (
        |  SELECT doc_id, i AS ws, i + 19 AS we,
        |    md5(array_to_string(list_slice(toks, i, i + 19), ' ')) AS wh
        |  FROM base, unnest(range(1, CAST(n_tokens AS INTEGER) - 19 + 1)) AS t(i)),
        |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) > 1),
        |flagged AS (SELECT doc_id, ws, we FROM wins JOIN dup USING (wh)),
        |isl AS (
        |  SELECT doc_id, ws, we,
        |    CASE WHEN max(we) OVER (PARTITION BY doc_id ORDER BY ws
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR ws > max(we) OVER (PARTITION BY doc_id ORDER BY ws
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS new_island
        |  FROM flagged),
        |isl2 AS (
        |  SELECT doc_id, ws, we,
        |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY ws
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, CAST(sum(span) AS BIGINT) AS dup_tokens,
        |    CAST(sum(nw) AS BIGINT) AS n_dup_windows
        |  FROM (SELECT doc_id, island, max(we) - min(ws) + 1 AS span,
        |          count(*) AS nw
        |        FROM isl2 GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT b.doc_id, b.n_tokens,
        |  CAST(greatest(b.n_tokens - 19, 0) AS BIGINT) AS n_windows,
        |  coalesce(s.n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(s.dup_tokens, 0) AS dup_tokens,
        |  CASE WHEN b.n_tokens > 0
        |    THEN CAST(coalesce(s.dup_tokens, 0) AS DOUBLE) / b.n_tokens
        |    ELSE 0.0 END AS dup_token_frac
        |FROM base b LEFT JOIN spans s ON b.doc_id = s.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "t26_corpus_report" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(nt) AS DOUBLE) / count(*) AS mean_tokens,
        |  quantile_cont(nc, 0.5) AS p50_chars,
        |  quantile_cont(nc, 0.9) AS p90_chars,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  CAST(count(*) FILTER (nt = 0) AS BIGINT) AS n_empty,
        |  1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*) AS dup_rate
        |FROM (
        |  SELECT source,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> t <> '')) AS BIGINT) AS nt,
        |    CAST(length(text) AS BIGINT) AS nc, md5(text) AS h
        |  FROM documents)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "t25_bigram_fluency" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, ts[i - 1] AS p, ts[i] AS w
        |  FROM (SELECT doc_id, ts, unnest(range(2, len(ts) + 1)) AS i FROM tok)),
        |c2 AS (SELECT p, w, CAST(count(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT p, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |q AS (
        |  SELECT bi.doc_id,
        |    CAST(round((CAST(c2.c2 AS DOUBLE) / c1.c1) * 1e12) AS BIGINT) AS q
        |  FROM bi JOIN c2 USING (p, w) JOIN c1 USING (p)),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(q) AS BIGINT) AS sq
        |  FROM q GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |  CAST(a.sq AS DOUBLE) / 1e12 / a.n_bigrams AS fluency
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t24_weighted_sample" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
        |  < CAST(floor(least(greatest(n_chars / 2000.0, 0.0), 1.0) * 65536) AS BIGINT)
        |ORDER BY doc_id""".stripMargin,
    "t20_chunk_documents" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(range(1, greatest(len(toks) - 16, 1) + 1, 48)) AS start_token
        |  FROM d)
        |SELECT doc_id,
        |  CAST((start_token - 1) // 48 + 1 AS BIGINT) AS chunk_id,
        |  CAST(start_token AS BIGINT) AS start_token,
        |  CAST(len(list_slice(toks, start_token, start_token + 63)) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, start_token, start_token + 63), ' ') AS chunk_text
        |FROM s
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "t21_corpus_split" -> {
      val cuts = Seq(0.8, 0.9).map(f => math.round(f * 65536))
      s"""SELECT doc_id, lang,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < ${cuts(0)} THEN 'train'
        |       WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < ${cuts(1)} THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    },
    "t18_quality_classifier" -> {
      val wl = t18Weights.map(_.toString).mkString("[", ", ", "]")
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
        |  FROM documents),
        |tw AS (
        |  SELECT doc_id,
        |    CAST(list_extract($wl,
        |      CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 64 AS INTEGER) + 1)
        |      AS DECIMAL(12,6)) AS w
        |  FROM tok WHERE t <> ''),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(w) AS DECIMAL(38,6)) AS s
        |  FROM tw GROUP BY 1)
        |SELECT d.doc_id, d.lang, coalesce(a.n_tokens, 0) AS n_tokens,
        |  CASE WHEN a.n_tokens > 0
        |    THEN CAST(CAST(0.05 AS DECIMAL(38,6)) + a.s AS DOUBLE) / a.n_tokens END
        |    AS quality_score
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin
    },
    "t19_temperature_mix" ->
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        |w AS (
        |  SELECT lang, c, CAST(round(sqrt(c) * 1e9) AS BIGINT) AS w FROM c),
        |t AS (
        |  SELECT lang, c, w, CAST(sum(w) OVER () AS BIGINT) AS total FROM w),
        |f AS (
        |  SELECT lang,
        |    CAST(floor(least(1.0,
        |      (CAST(250 AS DOUBLE) * w) / (CAST(total AS DOUBLE) * c)) * 65536)
        |      AS BIGINT) AS cut
        |  FROM t)
        |SELECT doc_id, lang, source
        |FROM documents JOIN f USING (lang)
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < cut
        |ORDER BY doc_id""".stripMargin,
    "t17_lang_quota" ->
      """SELECT doc_id, lang, n_chars
        |FROM (SELECT doc_id, lang, n_chars,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 60
        |ORDER BY doc_id""".stripMargin,
    "t15_distinctive_terms" ->
      """WITH tok AS (SELECT doc_id, lang, token FROM (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
        |  WHERE token <> ''),
        |tf AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
        |sc AS (SELECT lang, token, tf, df, CAST(tf AS DOUBLE) / df AS score
        |       FROM tf JOIN dfq USING (token)),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |       ORDER BY score DESC, token) AS BIGINT) AS rank FROM sc)
        |SELECT lang, token, tf, df, score, rank FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    "t16_domain_stats" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' see https://docs.example'
        |         || CAST(doc_id % 5 AS VARCHAR) || '.com/guide/page'
        |         || CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR)
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 1 THEN ' and http://www.mirror.example.org/path'
        |         || CAST(doc_id AS VARCHAR)
        |       ELSE '' END AS t
        | FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\s]+')) AS url FROM p),
        |d AS (SELECT doc_id,
        |  regexp_replace(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '^www\.', '') AS domain
        | FROM u)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        | CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | CAST(count(*) AS DOUBLE) / count(DISTINCT doc_id) AS urls_per_doc
        |FROM d GROUP BY domain ORDER BY domain""".stripMargin,
    "t14_sequence_packing" ->
      s"""WITH tok AS (SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM tok)
         |SELECT doc_id, n_tokens, cum - n_tokens AS start_tok,
         | (cum - n_tokens) // 512 AS seq_first,
         | (cum - n_tokens) % 512 AS off_first,
         | (cum - n_tokens + greatest(n_tokens, 1) - 1) // 512 AS seq_last,
         | CAST(CASE WHEN n_tokens = 0 THEN 0
         |      ELSE ((cum - n_tokens + greatest(n_tokens,1) - 1) // 512)
         |         - ((cum - n_tokens) // 512) + 1 END AS BIGINT) AS n_seqs
         |FROM c ORDER BY doc_id""".stripMargin,
    "t01_text_stats" ->
      s"""WITH d AS (SELECT doc_id, lang, source, text,
         |  regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
         |SELECT doc_id, lang, source,
         | length(text) AS n_chars,
         | len(t) AS n_tokens,
         | len(list_distinct(t)) AS n_distinct_tokens,
         | len(list_filter(t, x -> x IN ('the','a','of','to','in'))) AS n_stopwords,
         | CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS type_token_ratio,
         | CAST(len(list_filter(t, x -> x IN ('the','a','of','to','in'))) AS DOUBLE) / len(t) AS stopword_ratio,
         | CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(t) AS avg_token_len,
         | (CASE WHEN len(t) BETWEEN 20 AND 400 THEN 0.4 ELSE 0.0 END
         |  + CASE WHEN CAST(len(list_distinct(t)) AS DOUBLE) / len(t) > 0.3 THEN 0.3 ELSE 0.0 END
         |  + CASE WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','to','in'))) AS DOUBLE) / len(t) > 0.05 THEN 0.3 ELSE 0.0 END) AS quality_score
         |FROM d ORDER BY doc_id""".stripMargin,
    "t02_lang_id" ->
      s"""WITH d AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  CAST(len(list_filter(t, x -> x IN ('the','a','of','to','in'))) AS DOUBLE) / len(t) AS score_en,
         |  CAST(len(list_filter(t, x -> x LIKE '%o' OR x LIKE '%a')) AS DOUBLE) / len(t) AS score_es,
         |  CAST(len(list_filter(t, x -> x LIKE '%en' OR x LIKE 'sch%')) AS DOUBLE) / len(t) AS score_de
         | FROM d)
         |SELECT doc_id, lang AS lang_declared, score_en, score_es, score_de,
         | CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en > 0 THEN 'en'
         |      WHEN score_es >= score_de AND score_es > 0 THEN 'es'
         |      WHEN score_de > 0 THEN 'de'
         |      ELSE 'und' END AS lang_detected
         |FROM sc ORDER BY doc_id""".stripMargin,
    "t03_fingerprint" ->
      """WITH d AS (SELECT doc_id, md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS h,
        |  length(text) AS len FROM documents)
        |SELECT doc_id, h AS fp_md5,
        | CAST(concat('0x', substr(h, 1, 15)) AS BIGINT) AS fp_int60,
        | CAST(floor(len / 100) AS BIGINT) AS len_bucket
        |FROM d ORDER BY doc_id""".stripMargin,
    "t04_top_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,
    "t05_bpe_tokens" ->
      s"""WITH d AS (SELECT doc_id,
         |  regexp_extract_all(text, '$BpeRx') AS t FROM documents)
         |SELECT doc_id,
         | len(t) AS n_bpe_tokens,
         | len(list_distinct(t)) AS n_distinct_bpe,
         | CAST(list_max(list_transform(t, x -> length(x))) AS BIGINT) AS longest_bpe
         |FROM d ORDER BY doc_id""".stripMargin,
    "t06_contamination" -> T06Sql,
    // t34 is the bloom-prefiltered path; output is pinned bit-identical
    // to t06, so the gates share one oracle.
    "t34_contamination_bloom" -> T06Sql,
    "t07_quality_signals" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n_chars,
         |  length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
         |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         |  length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |    / len(regexp_split_to_array(trim(text), '\\s+')) AS mean_word_len,
         |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines
         | FROM documents),
         |r AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         |  CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
         |  CAST(n_digit AS DOUBLE) / n_chars AS digit_ratio,
         |  CAST(n_upper AS DOUBLE) / n_chars AS upper_ratio,
         |  mean_word_len, n_lines FROM d)
         |SELECT doc_id, n_chars, punct_ratio, digit_ratio, upper_ratio,
         | mean_word_len, n_lines,
         | (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.25 ELSE 0.0 END
         |  + CASE WHEN punct_ratio < 0.1 THEN 0.25 ELSE 0.0 END
         |  + CASE WHEN digit_ratio < 0.2 THEN 0.25 ELSE 0.0 END
         |  + CASE WHEN mean_word_len BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END) AS quality_v2
         |FROM r ORDER BY doc_id""".stripMargin,
    "t08_repetition_filter" ->
      s"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
         |g AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS ng
         | FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |       FROM d WHERE len(t) >= 2)),
         |c AS (SELECT doc_id, ng, count(*) AS cnt FROM g GROUP BY doc_id, ng),
         |a AS (SELECT doc_id,
         |  CAST(sum(cnt) AS BIGINT) AS n_2grams,
         |  count(*) AS n_distinct_2grams,
         |  max(cnt) AS max_2gram_count,
         |  1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS dup_2gram_frac
         | FROM c GROUP BY doc_id)
         |SELECT doc_id, n_2grams, n_distinct_2grams, max_2gram_count,
         | dup_2gram_frac, dup_2gram_frac > 0.08 AS is_repetitive
         |FROM a ORDER BY doc_id""".stripMargin,
    "t13_data_mix" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) AS b
        |  FROM documents)
        |WHERE b < (CASE lang WHEN 'en' THEN 65536 WHEN 'es' THEN 32768
        |           WHEN 'de' THEN 16384 ELSE 8192 END)
        |ORDER BY doc_id""".stripMargin,
    "t12_oov_rate" ->
      """WITH tok AS (SELECT doc_id,
        |        unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |       FROM documents),
        |vocab AS (SELECT token FROM (
        |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
        |  ORDER BY cnt DESC, token LIMIT 20)),
        |f AS (SELECT doc_id, token,
        |       token IN (SELECT token FROM vocab) AS inv FROM tok)
        |SELECT doc_id,
        | CAST(count(*) AS BIGINT) AS n_tokens,
        | CAST(count(*) FILTER (NOT inv) AS BIGINT) AS n_oov,
        | CAST(count(*) FILTER (NOT inv) AS DOUBLE) / count(*) AS oov_rate
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t11_clean_corpus" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         |           FROM documents),
         |ch AS (
         |  SELECT doc_id, i - 1 AS pos,
         |   array_to_string(list_slice(t, (i-1)*10 + 1, i*10), ' ') AS chunk
         |  FROM (SELECT doc_id, t,
         |         unnest(generate_series(1, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS i
         |        FROM d)),
         |hot AS (SELECT md5(chunk) AS h FROM ch
         |        GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
         |fl AS (SELECT doc_id, pos, chunk,
         |        md5(chunk) IN (SELECT h FROM hot) AS is_hot FROM ch),
         |rebuilt AS (
         |  SELECT doc_id,
         |   CAST(count(*) AS BIGINT) AS n_chunks,
         |   CAST(count(*) FILTER (is_hot) AS BIGINT) AS n_dropped,
         |   coalesce(string_agg(CASE WHEN NOT is_hot THEN chunk END, ' '
         |                       ORDER BY pos), '') AS clean_text
         |  FROM fl GROUP BY doc_id
         |  HAVING count(*) FILTER (is_hot) < count(*)),
         |rt AS (SELECT doc_id, regexp_split_to_array(trim(clean_text), '\\s+') AS t
         |       FROM rebuilt),
         |g2 AS (SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS ng
         |       FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |             FROM rt WHERE len(t) >= 2)),
         |c2 AS (SELECT doc_id, ng, count(*) AS cnt FROM g2 GROUP BY doc_id, ng),
         |rep AS (SELECT doc_id,
         |         1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS BIGINT) AS dup_frac
         |        FROM c2 GROUP BY doc_id),
         |kept AS (
         |  SELECT r.* FROM rebuilt r LEFT JOIN rep USING (doc_id)
         |  WHERE rep.dup_frac IS NULL OR rep.dup_frac <= 0.08),
         |docs2 AS (SELECT doc_id, clean_text AS text FROM kept),
         |uniq AS (
         |  SELECT d2.* FROM docs2 d2
         |  JOIN (SELECT md5(text) AS h, min(doc_id) AS k
         |        FROM docs2 GROUP BY 1) e ON d2.doc_id = e.k),
         |${Dedup.sigsSql("uniq")},
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, length(text)-4), i -> substr(text, i, 5))) AS sh
         |  FROM uniq),
         |edges AS (
         |  SELECT doc_a, doc_b FROM agreed
         |  JOIN sets sa ON agreed.doc_a = sa.doc_id
         |  JOIN sets sb ON agreed.doc_b = sb.doc_id
         |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         |     / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5),
         |verts AS (SELECT doc_a AS id FROM edges UNION SELECT doc_b FROM edges),
         |edgesym AS (SELECT doc_a AS a, doc_b AS b FROM edges
         |            UNION SELECT doc_b, doc_a FROM edges),
         |reach(a, b) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT r2.a, e2.b FROM reach r2 JOIN edgesym e2 ON r2.b = e2.a),
         |cc AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |dropids AS (SELECT id FROM cc WHERE comp <> id)
         |SELECT k.doc_id, k.n_chunks, k.n_dropped, k.clean_text
         |FROM kept k JOIN uniq u ON k.doc_id = u.doc_id
         |WHERE k.doc_id NOT IN (SELECT id FROM dropids)
         |ORDER BY k.doc_id""".stripMargin,
    "t10_url_extraction" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' see https://docs.example'
        |         || CAST(doc_id % 5 AS VARCHAR) || '.com/guide/page'
        |         || CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR)
        |       ELSE '' END ||
        |  CASE WHEN doc_id % 4 = 1 THEN ' and http://www.mirror.example.org/path'
        |         || CAST(doc_id AS VARCHAR)
        |       ELSE '' END AS t
        | FROM documents),
        |u AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  nullif(regexp_extract(t, 'https?://[^\s]+'), '') AS first_url
        | FROM p),
        |h AS (SELECT doc_id, n_urls, first_url,
        |  nullif(regexp_extract(first_url, '^[a-z]+://([^/?#]+)', 1), '') AS first_host
        | FROM u)
        |SELECT doc_id, n_urls, first_host,
        | regexp_replace(first_host, '^www\.', '') AS first_domain,
        | nullif(regexp_extract(first_url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1), '') AS first_path,
        | nullif(regexp_extract(first_url, '[?&]ref=([^&#]*)', 1), '') AS ref_param
        |FROM h ORDER BY doc_id""".stripMargin,
    "t09_pii_redaction" -> {
      val emailRx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRx = "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"
      val ipRx = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
      s"""WITH p AS (SELECT doc_id, text ||
         |  CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)
         |         || '@example.com or admin' || CAST(doc_id AS VARCHAR) || '@test.org'
         |       WHEN doc_id % 3 = 1 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@example.com'
         |       ELSE '' END ||
         |  CASE WHEN doc_id % 2 = 0 THEN ' call (' || CAST(doc_id % 800 + 200 AS VARCHAR)
         |         || ') 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |       ELSE '' END ||
         |  CASE WHEN doc_id % 4 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         |       ELSE '' END AS pii
         | FROM documents)
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(pii, '$emailRx')) AS BIGINT) AS n_emails,
         | CAST(len(regexp_extract_all(s1, '$phoneRx')) AS BIGINT) AS n_phones,
         | CAST(len(regexp_extract_all(s2, '$ipRx')) AS BIGINT) AS n_ips,
         | length(regexp_replace(s2, '$ipRx', '<IP>', 'g')) AS n_chars_redacted,
         | regexp_replace(s2, '$ipRx', '<IP>', 'g') AS text_redacted
         |FROM (SELECT doc_id, pii,
         |  regexp_replace(pii, '$emailRx', '<EMAIL>', 'g') AS s1,
         |  regexp_replace(regexp_replace(pii,
         |    '$emailRx', '<EMAIL>', 'g'),
         |    '$phoneRx', '<PHONE>', 'g') AS s2
         | FROM p)
         |ORDER BY doc_id""".stripMargin
    })
}
