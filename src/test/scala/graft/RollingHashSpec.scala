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
}
