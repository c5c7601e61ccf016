package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionStats: hand-computed fractions on crafted docs") {
    val d = Seq((0L, "a a a b"), (1L, "x y z w"), (2L, "go go go go"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(d).orderBy("doc_id").collect()
    // doc 0: "a a a b" → top 3/4; bigrams {a a, a a, a b} → (3-2)/3;
    // trigrams {a a a, a a b} → both distinct → 0
    assert(out(0).getAs[Long]("n_tokens") === 4L)
    assert(out(0).getAs[Double]("top_token_frac") === 0.75)
    assert(math.abs(out(0).getAs[Double]("dup_bigram_frac") - 1.0 / 3) < 1e-12)
    assert(out(0).getAs[Double]("dup_trigram_frac") === 0.0)
    // doc 1: all distinct
    assert(out(1).getAs[Double]("top_token_frac") === 0.25)
    assert(out(1).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out(1).getAs[Double]("dup_trigram_frac") === 0.0)
    // doc 2: "go"×4 → top 1.0; 3×"go go" → 2/3; 2×"go go go" → 1/2
    assert(out(2).getAs[Double]("top_token_frac") === 1.0)
    assert(math.abs(out(2).getAs[Double]("dup_bigram_frac") - 2.0 / 3) < 1e-12)
    assert(out(2).getAs[Double]("dup_trigram_frac") === 0.5)
  }

  test("repetitionStats: single-token doc has no n-grams, fractions 0") {
    val out = TextOps.repetitionStats(Seq((0L, "solo")).toDF("doc_id", "text"))
      .collect()(0)
    assert(out.getAs[Long]("n_tokens") === 1L)
    assert(out.getAs[Double]("top_token_frac") === 1.0)
    assert(out.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out.getAs[Double]("dup_trigram_frac") === 0.0)
  }

  test("piiScrub counts and redacts emails, urls, phones") {
    val d = Seq(
      (0L, "mail me at bob@corp.io or visit https://a.example.org/x " +
           "then call 555-123-4567"),
      (1L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextOps.piiScrub(d).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") === 1)
    assert(out(0).getAs[Int]("n_urls") === 1)
    assert(out(0).getAs[Int]("n_phones") === 1)
    assert(out(0).getAs[String]("scrubbed") ===
      "mail me at <EMAIL> or visit <URL> then call <PHONE>")
    assert(out(1).getAs[Int]("n_emails") === 0)
    assert(out(1).getAs[String]("scrubbed") === "no pii here at all")
  }

  test("urlDomains aggregates per-domain url and doc counts") {
    val d = Seq(
      (0L, "see https://a.io/x and https://a.io/y"),
      (1L, "see https://b.net/z and https://a.io/w")).toDF("doc_id", "text")
    val out = TextOps.urlDomains(d).orderBy("domain").collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_urls"),
                 r.getAs[Long]("n_docs"))).toSeq
    assert(out === Seq(("a.io", 3L, 2L), ("b.net", 1L, 1L)))
  }
}
