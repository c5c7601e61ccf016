package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document token summary as a native expression:
  * `struct<n_tokens, n_distinct, tok_chars, stop_hits, entropy_fp>`
  * over the `split(text, " ")` tokenization (empty segments included,
  * exactly like the SQL `split` — token count is always spaces+1).
  *
  * This is the row-local replacement for two corpus-shaped plans that
  * measurement showed age badly at the sixth decade (SCALING.md batch
  * 17: 50 M docs):
  *
  *  - [[graft.operators.TextOps.tokenEntropy]]'s explode →
  *    (doc_id, token) hash aggregate fell back to sort past RAM
  *    residency (887 s at sf1000, ×11.9 in the last decade). A token
  *    histogram is PER-DOCUMENT state — each row carries everything its
  *    own entropy needs — so the aggregate never had to cross rows at
  *    all: this expression builds the histogram in one hash-map pass
  *    inside the scan, and the operator becomes a pure map with ZERO
  *    exchanges.
  *  - [[graft.operators.TextOps.tokenStats]]'s higher-order-function
  *    form avoided the shuffle but paid interpreted per-token eval
  *    (`ArrayDistinct`/`ArrayFilter` are CodegenFallback) and THREE
  *    tokenization passes (size, distinct, stopword filter); this
  *    does all of it in the single pass.
  *
  * Fields (all computed from one traversal, null iff the input is null):
  *  - `n_tokens`   — segment count (spaces + 1)
  *  - `n_distinct` — distinct token strings (byte equality)
  *  - `tok_chars`  — Σ per-token character count (= chars minus spaces;
  *    the `avg_token_len` numerator)
  *  - `stop_hits`  — tokens found in the `stopwords` set (byte-exact,
  *    case-sensitive — callers lowercase the child first if desired)
  *  - `n_word_pieces` — matches of the GPT-2-ish pre-tokenizer regex
  *    `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+`, computed as a character-class
  *    RUN counter instead of a regex engine: every maximal run of
  *    letters, digits, or other-non-whitespace is exactly one match
  *    (alternatives are disjoint and each is greedy), and runs are
  *    detectable per BYTE because every byte of a multi-byte UTF-8
  *    character is ≥ 0x80 and lands in the same "other" class Java's
  *    `[^A-Za-z0-9\s]` assigns the whole character. The whitespace
  *    class matches Java regex `\s` = `[ \t\n\x0B\f\r]` (the
  *    engine the replaced `regexp_count` used — measurement: the regex
  *    was 70%+ of tokenStats' runtime at every decade)
  *  - `entropy_fp` — unigram Shannon entropy in Q40 fixed point:
  *    `Σ h·(log2fp(n) − log2fp(h)) DIV n` over the histogram, with
  *    [[Log2Fp.compute]] as the log kernel so the DuckDB HUGEINT
  *    recursion replays it bit-for-bit. NULL above
  *    [[TokenSummary.EntropyCapTokens]] tokens: the Long accumulator is
  *    provably exact only while `n·log2(n) ≤ 2^23` (the sum is bounded
  *    by `n·log2(n)·2^40` and must stay under 2^63); past the cap a
  *    wrapped sum would SILENTLY diverge from the oracle's HUGEINT —
  *    null is the honest answer for a pathological >300k-token
  *    document (round-9 ADVICE). The cap is part of the operator
  *    contract and mirrored in the oracle SQL.
  *
  * Codegen and interpreted paths both call the one static
  * [[TokenSummary.compute]], so they cannot drift (NO_CODEGEN sweep).
  */
case class TokenSummary(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TokenSummary.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "token_summary"

  @transient private lazy val stopSet: java.util.HashSet[UTF8String] =
    TokenSummary.toStopSet(stopwords.toArray)

  override def nullSafeEval(input: Any): Any =
    TokenSummary.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftStopSet", stopSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSummary.compute($c, $setRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenSummary = copy(child = newChild)
}

object TokenSummary {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("tok_chars", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("n_word_pieces", LongType, nullable = false),
    StructField("entropy_fp", LongType, nullable = true)))

  /** Documented entropy domain bound: above this many tokens the Q40
    * entropy sum could exceed Long range (`n·log2(n)·2^40 ≥ 2^63` from
    * n ≈ 4.4e5), so `entropy_fp` is null. 300k·log2(300k) ≈ 5.5e6 ≪
    * 2^23 ≈ 8.4e6 leaves a comfortable margin.
    */
  val EntropyCapTokens: Long = 300000L

  def toStopSet(words: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** The shared scalar kernel — both eval paths route here. One byte
    * scan finds the space separators (a 0x20 byte never occurs inside a
    * multi-byte UTF-8 sequence); tokens are zero-copy slices of the
    * input's backing array; the histogram is one open hash map keyed by
    * token bytes.
    */
  def compute(s: UTF8String,
              stop: java.util.HashSet[UTF8String]): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    val hist = new java.util.HashMap[UTF8String, Array[Long]]()
    var nTokens = 0L
    var tokChars = 0L
    var stopHits = 0L
    var nPieces = 0L
    var prevClass = 0 // 0 = whitespace (runs not counted)
    var start = 0
    var i = 0
    while (i <= len) {
      if (i < len) {
        // word-piece run counter (see scaladoc): L=1, D=2, other=3,
        // Java-\s whitespace=0; a piece starts wherever the class
        // changes to a non-whitespace class
        val b = bytes(i)
        val cls =
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
          else if (b >= '0' && b <= '9') 2
          else if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B ||
                   b == '\f' || b == '\r') 0
          else 3
        if (cls != 0 && cls != prevClass) nPieces += 1L
        prevClass = cls
      }
      if (i == len || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        nTokens += 1L
        tokChars += tok.numChars().toLong
        if (!stop.isEmpty && stop.contains(tok)) stopHits += 1L
        val h = hist.get(tok)
        if (h == null) hist.put(tok, Array(1L)) else h(0) += 1L
        start = i + 1
      }
      i += 1
    }
    val nDistinct = hist.size().toLong
    val entropyFp: Any =
      if (nTokens > EntropyCapTokens) null
      else {
        val ln = Log2Fp.compute(nTokens)
        var sum = 0L
        val it = hist.values().iterator()
        while (it.hasNext) {
          val h = it.next()(0)
          sum += h * (ln - Log2Fp.compute(h))
        }
        java.lang.Long.valueOf(sum / nTokens)
      }
    new GenericInternalRow(Array[Any](nTokens, nDistinct, tokChars,
      stopHits, nPieces, entropyFp))
  }

  def apply(text: Column, stopwords: Seq[String] = Nil): Column =
    ColumnBridge.column(
      new TokenSummary(ColumnBridge.expression(text), stopwords))
}
