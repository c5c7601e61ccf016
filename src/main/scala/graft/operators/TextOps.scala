package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline: tokenization
  * stats, quality scoring, language-ID heuristic, document fingerprinting,
  * and the shingle/MinHash machinery [[Dedup]] builds on.
  *
  * Everything is built from codegen'd Catalyst expressions (split /
  * higher-order functions / md5) — no UDFs, so the hot path stays inside
  * whole-stage codegen and scales linearly with no shuffle until an
  * explicit aggregation.
  */
object TextOps {

  /** Whitespace tokens of the raw text. */
  def tokens(text: Column): Column = split(text, " ")

  /** GPT-2-style pre-tokenizer approximation: word pieces are letter
    * runs, digit runs, or punctuation runs — the "BPE-ish regex" count
    * that tracks model-token counts far better than whitespace splits on
    * punctuation-heavy text.
    */
  val WordPiecePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Per-document token statistics + quality signals
    * (length, distinct-token ratio, mean token length, stopword ratio).
    * All ratios are single IEEE divisions of integer counts —
    * bit-deterministic in any engine.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      regexp_count(col(textCol), lit(WordPiecePattern)).as("n_word_pieces"),
      size(array_distinct(toks)).as("n_distinct"),
      (length(regexp_replace(col(textCol), " ", "")).cast("double") /
        size(toks)).as("avg_token_len"),
      (size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") /
        size(toks)).as("stopword_ratio"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("distinct_ratio"))
  }

  /** Quality score in [0,1]: composite of length, diversity and stopword
    * signals — a deterministic stand-in for model-based quality filters.
    */
  def qualityScore(stats: DataFrame): DataFrame =
    stats.withColumn("quality_score",
      (when(col("n_tokens") >= 20, lit(1.0)).otherwise(
         col("n_tokens").cast("double") / 20) * lit(0.4) +
       col("distinct_ratio") * lit(0.4) +
       when(col("stopword_ratio") > 0.02, lit(1.0)).otherwise(lit(0.0)) *
         lit(0.2)))

  /** Language-ID heuristic: stopword-hit counts per language, argmax with a
    * fixed priority order on ties. Pure integer comparisons — portable.
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    def hits(words: Seq[String]) =
      size(filter(toks, t => t.isin(words: _*)))
    val scored = docs.select(
      col("doc_id"),
      hits(EnStopwords).as("en_hits"), hits(DeStopwords).as("de_hits"),
      hits(FrStopwords).as("fr_hits"), hits(EsStopwords).as("es_hits"))
    val best = greatest(col("en_hits"), col("de_hits"), col("fr_hits"),
                        col("es_hits"))
    scored.withColumn("pred_lang",
      when(best === 0, lit("unknown"))
        .when(col("en_hits") === best, lit("en"))
        .when(col("de_hits") === best, lit("de"))
        .when(col("fr_hits") === best, lit("fr"))
        .otherwise(lit("es")))
  }

  /** Content fingerprint (md5 of the normalized text) — the exact-dedup
    * key. md5 keeps it portable to the oracle engine.
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Winnowing-style rolling-hash fingerprint: the minimum Rabin-Karp
    * window hash over the normalized text (one codegen'd O(n) pass — see
    * [[graft.functions.RollingHashWindows]]). Near-identical documents
    * that share any `window`-byte run can collide on it, which is the
    * point: it is a locality-sensitive single-long signature, cheaper
    * than MinHash when one band suffices. Null for docs shorter than
    * `window` bytes.
    */
  def rollingMinFingerprint(text: Column, window: Int = 32): Column =
    array_min(graft.functions.RollingHashWindows(lower(trim(text)), window))

  /** Deterministic stratified downsampling for data mixing: keep one in
    * `rates(stratum)` documents per stratum (default `defaultRate`),
    * selected by id residue — reproducible across runs and engines. At
    * scale, swap the residue for `pmod(xxhash64(id), rate)` to decorrelate
    * from id assignment; the plan (a pushed-down filter, no shuffle) is
    * identical.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultRate: Int, stratumCol: String = "lang",
                       idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    docs.where(pmod(col(idCol), rate) === 0)
  }

  /** 64-bit SimHash from token hashes, built entirely from higher-order
    * functions: per-token xxhash64 → ±1 per bit → summed bit counts →
    * sign bits reassembled into a long. No UDF, no shuffle — but the HOFs
    * run interpreted, so this form is retained ONLY as the independent
    * reference [[Dedup.simhashSignatures]] is equivalence-tested against
    * (DedupSpec); production paths use the codegen'd aggregate form. (The
    * analogous interpreted shingle/minhash HOFs were deleted outright —
    * their aggregate replacements in [[Dedup]] are oracle-checked, which
    * is a stronger reference than a second in-engine formulation.)
    */
  def simhash(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val bitIdx = sequence(lit(0), lit(63))
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, transform(bitIdx, i =>
        when(call_function("shiftright", xxhash64(t), i)
               .bitwiseAND(1) === 1, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, bitIdx, (c, i) =>
        when(c > 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  // Small per-language stopword lists for the heuristic. Deliberately tiny:
  // the point is the (portable, codegen'd) mechanism, not lexicon coverage.
  val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  val DeStopwords = Seq("der", "die", "das", "und", "ist", "mit", "ein", "zu")
  val FrStopwords = Seq("le", "la", "les", "et", "est", "une", "dans", "que")
  val EsStopwords = Seq("el", "los", "las", "y", "es", "una", "en", "por")
}
