package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-amplifier's anti-aliasing contract under STACKED
  * amplification — the property whose violation round 8's fifth-decade
  * measurement surfaced: with replica 0 left verbatim, gen-2 replica j
  * of a gen-1 replica-0 doc ("r<j>" + raw) was byte-identical to gen-2
  * replica 0's copy of the gen-1 replica-j doc, planting factor²-growing
  * exact-duplicate pairs that read as superlinear near-dup growth. Every
  * replica now gets its own salt layer, so duplicate DENSITY must stay
  * exactly linear across generations; embeddings use an affine (not
  * purely additive) perturbation for the same reason — additive offsets
  * commute across generations and alias in embedding space.
  */
class ScaleUpSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stacked amplification keeps duplicate density exactly linear") {
    val src = Files.createTempDirectory("graft_su_src").toString
    val g1 = Files.createTempDirectory("graft_su_g1").toString
    val g2 = Files.createTempDirectory("graft_su_g2").toString
    // 6 docs, ONE exact-duplicate pair (ids 0/1) — source dup count 1.
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      (2L, "alpha beta gamma delta epsilon eta", "en", "web"),
      (3L, "totally different words one two three", "en", "book"),
      (4L, "yet another unrelated document body here", "en", "book"),
      (5L, "final text with its own token stream", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    Seq((0L, Array(1.0f, 0.0f, 0.0f), 0),
        (1L, Array(0.9f, 0.1f, 0.0f), 0),
        (2L, Array(0.0f, 1.0f, 0.0f), 1),
        (3L, Array(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")

    val only = Some(Set("documents", "embeddings"))
    ScaleUp.amplify(spark, src, g1, 3, only)
    ScaleUp.amplify(spark, g1, g2, 3, only)

    val d2 = spark.read.parquet(s"$g2/documents.parquet")
    assert(d2.count() === 54)  // 6 × 3 × 3
    // Duplicate density linear: the single source dup pair appears once
    // per (gen1 replica × gen2 replica) = 9 dups, and NOTHING else
    // collides — with verbatim replica 0 this read 45 − alias count.
    assert(d2.select("text").distinct().count() === 45)
    // Every (gen2 replica) block is a bijection of gen1: 15 distinct
    // texts each (6 × 3 = 18 gen1 docs minus 3 gen1-internal dups).
    val perRep = d2.withColumn("rep", floor(col("doc_id") / 18))
      .groupBy("rep").agg(countDistinct("text").as("u"))
      .collect().map(_.getAs[Long]("u")).toSeq
    assert(perRep === Seq(15L, 15L, 15L))
    // doc_id space stays dense and disjoint.
    assert(d2.agg(countDistinct("doc_id")).head.getLong(0) === 54)

    // Embeddings: 4 × 9 vectors, all pairwise distinct — the affine
    // perturbation must not commute across generations.
    val e2 = spark.read.parquet(s"$g2/embeddings.parquet")
    assert(e2.count() === 36)
    assert(e2.select("embedding").distinct().count() === 36)
  }
}
