package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `n`-token shingles of a single-space-separated string, as a
  * native codegen'd expression returning `array<string>` in token
  * order.
  *
  * Tokenization matches `split(text, " ")` exactly: tokens are the
  * segments between single 0x20 bytes (empty segments included, so the
  * token count is always spaces+1), and the i-th gram — the `n` tokens
  * from i joined by one space — is therefore EXACTLY the byte range
  * from the start of token i to the end of token i+n−1 of the input.
  * Each gram is emitted as a substring reference copy: one O(bytes)
  * scan for the separators and no per-gram string concatenation (a
  * space byte can never occur inside a multi-byte UTF-8 sequence, so
  * byte scanning is codepoint-safe).
  *
  * This is the shingle primitive behind
  * [[graft.operators.Dedup]]'s gram front: it keeps the gram build
  * inside whole-stage codegen with zero shuffle — unlike a
  * posexplode+window-lead formulation (shuffles the corpus's token
  * stream) or a higher-order `transform`/`slice` build (HOF lambdas
  * are evaluated interpreted, outside codegen).
  *
  * Strings with fewer than `n` tokens yield an empty array.
  */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    // segment start offsets: 0 and every byte after a space
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val nTok = spaces + 1
    if (nTok < n) new GenericArrayData(Array.empty[Any])
    else {
      val starts = new Array[Int](nTok)
      var t = 1
      i = 0
      while (i < len) {
        if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
        i += 1
      }
      val out = new Array[Any](nTok - n + 1)
      var g = 0
      while (g <= nTok - n) {
        val from = starts(g)
        val until = if (g + n < nTok) starts(g + n) - 1 else len
        out(g) = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, from, until))
        g += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val len = ctx.freshName("len")
      val spaces = ctx.freshName("spaces")
      val nTok = ctx.freshName("nTok")
      val starts = ctx.freshName("starts")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val g = ctx.freshName("g")
      val from = ctx.freshName("from")
      val until = ctx.freshName("until")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $len = $bytes.length;
         |int $spaces = 0;
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($bytes[$i] == ' ') $spaces++;
         |}
         |int $nTok = $spaces + 1;
         |if ($nTok < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]);
         |} else {
         |  int[] $starts = new int[$nTok];
         |  int $t = 1;
         |  for (int $i = 0; $i < $len; $i++) {
         |    if ($bytes[$i] == ' ') { $starts[$t++] = $i + 1; }
         |  }
         |  Object[] $out = new Object[$nTok - $n + 1];
         |  for (int $g = 0; $g <= $nTok - $n; $g++) {
         |    int $from = $starts[$g];
         |    int $until = ($g + $n < $nTok) ? $starts[$g + $n] - 1 : $len;
         |    $out[$g] = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |      java.util.Arrays.copyOfRange($bytes, $from, $until));
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenNgrams = copy(child = newChild)
}

object TokenNgrams {
  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(
      new TokenNgrams(ColumnBridge.expression(text), n))
}
