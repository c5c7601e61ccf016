package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins corpus_card's null-text guard (ADVICE r5): under the repo's
  * legacy `sizeOfNull` behavior, an unguarded `size(split(null, ' '))`
  * is -1 and would be SUMmed — silently deflating `total_tokens` by one
  * per null-text doc — while the DuckDB oracle's SUM skips NULLs. The
  * guard makes null texts contribute NULL (skipped), so a corpus that
  * gains null texts cannot diverge from the oracle.
  */
class CorpusCardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("corpus_card total_tokens skips null texts instead of summing -1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_card").toString
    Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, null.asInstanceOf[String], "en", "web", 0L),
      (3L, "d e", "fr", "book", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("corpus_card")(spark, dir).head()
    assert(row.getAs[Long]("n_docs") === 3L)
    // 3 + 2 tokens; an unguarded sum would add size(null) = -1 → 4.
    assert(row.getAs[Long]("total_tokens") === 5L)
    // fingerprints: two distinct non-null texts (countDistinct skips null)
    assert(row.getAs[Long]("n_fingerprints") === 2L)
  }
}
