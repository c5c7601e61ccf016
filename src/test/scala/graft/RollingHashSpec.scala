package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHashWindows

class RollingHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Straightforward O(n·k) reference: hash every window from scratch. */
  private def reference(s: String, w: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    if (b.length < w) Seq.empty
    else (0 to b.length - w).map { i =>
      var h = 0L
      (i until i + w).foreach(j => h = h * 257L + (b(j) & 0xFF))
      h
    }
  }

  test("matches the from-scratch hash on every window (incl. roll wrap)") {
    val samples = Seq("hello rolling world", "aaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog", "äöü unicode ßtring")
    val w = 8
    val got = samples.toDF("s")
      .select(RollingHashWindows(col("s"), w).as("h"))
      .collect().map(_.getSeq[Long](0))
    samples.zip(got).foreach { case (s, hs) =>
      assert(hs === reference(s, w), s"mismatch for '$s'")
    }
  }

  test("short and empty strings yield empty arrays; null stays null") {
    val rows = Seq(Some("abc"), Some(""), None).toDF("s")
      .select(RollingHashWindows(col("s"), 8).as("h"))
      .collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).isNullAt(0))
  }

  test("rollingMinFingerprint collides for docs sharing a long run") {
    val docs = Seq(
      (1L, "PREFIX one " + ("shared common run of text " * 4) + " tail A"),
      (2L, "other start " + ("shared common run of text " * 4) + " tail B"),
      (3L, "completely unrelated content with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        graft.operators.TextOps.rollingMinFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 and 2 share every window inside the repeated run; the global
    // min may or may not fall inside it — assert on shared-window overlap
    val h1 = docs.where($"doc_id" === 1).select(
      RollingHashWindows(lower(col("text")), 32).as("h"))
      .head().getSeq[Long](0).toSet
    val h2 = docs.where($"doc_id" === 2).select(
      RollingHashWindows(lower(col("text")), 32).as("h"))
      .head().getSeq[Long](0).toSet
    val h3 = docs.where($"doc_id" === 3).select(
      RollingHashWindows(lower(col("text")), 32).as("h"))
      .head().getSeq[Long](0).toSet
    assert((h1 & h2).nonEmpty)      // shared run → shared window hashes
    assert((h1 & h3).isEmpty)       // unrelated → disjoint
    assert(fps.size === 3)
  }

  /** Brute-force winnowing reference: every window's struct-min
    * (hash asc, position asc on ties), distinct, in window order.
    */
  private def winnowRef(hs: Seq[Long], w: Int): Seq[(Long, Int)] =
    if (hs.length < w) Seq.empty
    else (0 to hs.length - w)
      .map(p => (p until p + w).map(i => (hs(i), i)).min)
      .distinct

  test("WinnowSelect matches the brute-force per-window min, " +
       "including hash ties and short arrays") {
    val w = 4
    val rnd = new scala.util.Random(7)
    // deliberately small hash alphabet → many ties exercise the
    // leftmost-on-tie rule; lengths straddle the < w edge
    val cases = (0 until 40).map { k =>
      val n = rnd.nextInt(12)  // 0..11, some below w
      (k.toLong, (0 until n).map(_ => rnd.nextInt(4).toLong))
    }
    val df = cases.map { case (id, hs) => (id, hs) }
      .toDF("id", "hs")
      .select(col("id"),
        graft.functions.WinnowSelect(col("hs"), w).as("sel"))
    val got = df.collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getLong(0), s.getInt(1)))
    }.toMap
    cases.foreach { case (id, hs) =>
      assert(got(id) === winnowRef(hs, w), s"case $id: $hs")
    }
  }

  test("TokenNgrams matches the split/concat_ws reference, including " +
       "empty tokens, trailing separators, and multi-byte UTF-8") {
    def ref(s: String, n: Int): Seq[String] = {
      val toks = s.split(" ", -1).toSeq
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    val texts = Seq(
      "a b c d e", "one two", "", " ", "a  b", " lead", "trail ",
      "solo", "héllo wörld déjà vu naïve", "日本 語 テスト です ね",
      "a b c", "x " * 5 + "y")
    for (n <- Seq(1, 2, 3, 6)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"),
          graft.functions.TokenNgrams(col("t"), n).as("g"))
      val got = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === ref(t, n), s"n=$n text='$t'")
      }
    }
    // null text → null array (same as split(null))
    val nul = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(graft.functions.TokenNgrams(col("t"), 3).as("g"))
    assert(nul.head().isNullAt(0))
  }
}
