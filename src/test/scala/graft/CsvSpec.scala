package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Csv

class CsvSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("write → read round-trip is field-exact with zero quarantine") {
    val dir = Files.createTempDirectory("graft_csv_rt").toString + "/d"
    Csv.writeLines(Csv.renderLines(docs), dir)
    val landed = Csv.read(spark, dir).cache()

    assert(landed.where(col(Csv.CorruptCol).isNotNull).count() === 0)
    assert(landed.count() === docs.count())
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val back = landed.select(cols.head, cols.tail: _*)
    assert(back.exceptAll(docs.select(cols.head, cols.tail: _*)).count() === 0)
    assert(docs.select(cols.head, cols.tail: _*).exceptAll(back).count() === 0)
  }

  test("escaping round-trip: delimiters, quotes, backslashes survive " +
       "the symmetric quote/escape defaults") {
    val tricky = Seq(
      (1L, "en", 9L, "s1", """commas, "quoted" and \back\slash"""),
      (2L, "e,n", 4L, "s,2", "delimiter in keys"),
      (3L, "en", 5L, "s3", "tab\tand 'single' quotes"))
      .toDF("doc_id", "lang", "n_chars", "source", "text")
    val dir = Files.createTempDirectory("graft_csv_esc").toString + "/d"
    Csv.writeLines(Csv.renderLines(tricky), dir)
    assert(spark.read.text(dir).count() === 3)
    val back = Csv.read(spark, dir).cache()
    assert(back.where(col(Csv.CorruptCol).isNotNull).count() === 0)
    assert(back.select("doc_id", "lang", "n_chars", "source", "text")
      .exceptAll(tricky).count() === 0)
  }

  test("quarantine is field-local: corrupt rows keep parsed source, " +
       "null the violating field, carry the raw line") {
    val dir = Files.createTempDirectory("graft_csv_q").toString + "/d"
    Csv.writeLines(Csv.renderLines(docs, corruptMod = 7), dir)
    val landed = Csv.read(spark, dir).cache()

    val bad = landed.where(col(Csv.CorruptCol).isNotNull)
    assert(bad.count() === docs.where(col("doc_id") % 7 === 0).count())
    // Field-local recovery: the type-violating n_chars is null, but
    // doc_id/source/text parsed fine — the CSV-vs-JSON semantic split
    // the scaladoc documents.
    assert(bad.where(col("n_chars").isNotNull).count() === 0)
    assert(bad.where(col("source").isNull || col("doc_id").isNull ||
      col("text").isNull).count() === 0)
    // The raw line carries the planted token.
    assert(bad.where(!col(Csv.CorruptCol).contains(",xx,")).count() === 0)
    // The clean complement is exactly the non-corrupted originals.
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val good = landed.where(col(Csv.CorruptCol).isNull)
      .select(cols.head, cols.tail: _*)
    val expectedGood = docs.where(col("doc_id") % 7 =!= 0)
      .select(cols.head, cols.tail: _*)
    assert(good.exceptAll(expectedGood).count() === 0)
    assert(expectedGood.exceptAll(good).count() === 0)
  }

  test("landingStats groups damage under the real source (and defeats " +
       "projection-dependent corrupt detection)") {
    val dir = Files.createTempDirectory("graft_csv_s").toString + "/d"
    Csv.writeLines(Csv.renderLines(docs, corruptMod = 7), dir)
    val stats = Csv.landingStats(Csv.read(spark, dir)).collect()

    // No NULL bucket — every quarantined row kept its parsed source.
    assert(stats.forall(!_.isNullAt(0)))
    val expected = docs.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("q"),
        sum(when(col("doc_id") % 7 =!= 0, length(col("text")))).as("chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(stats.length === expected.size)
    stats.foreach { r =>
      val (n, q, chars) = expected(r.getString(0))
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_quarantined") === q)
      assert(r.getAs[Long]("sum_chars_clean") === chars)
    }
  }

  test("landingStats: a source whose clean rows are all empty-text " +
       "sums to 0 chars, not NULL (CSV '' → NULL round-trip)") {
    val d = Seq(
      (1L, "en", 0L, "empty_src", ""),
      (2L, "en", 0L, "empty_src", ""),
      (3L, "en", 5L, "mixed", "hello"),
      (4L, "en", 0L, "mixed", ""))
      .toDF("doc_id", "lang", "n_chars", "source", "text")
    val dir = Files.createTempDirectory("graft_csv_e").toString + "/d"
    Csv.writeLines(Csv.renderLines(d), dir)
    val stats = Csv.landingStats(Csv.read(spark, dir)).collect()
      .map(r => r.getString(0) ->
        (r.isNullAt(r.fieldIndex("sum_chars_clean")),
          if (r.isNullAt(r.fieldIndex("sum_chars_clean"))) -1L
          else r.getAs[Long]("sum_chars_clean"))).toMap
    // The all-empty group must be (false, 0) — the parquet-side replay
    // LENGTH(COALESCE(text,'')) computes 0 there, and before the
    // coalesce fix this group read NULL.
    assert(stats("empty_src") === ((false, 0L)))
    assert(stats("mixed") === ((false, 5L)))
  }

  test("schema evolution: per-generation read + null-fill union lands " +
       "gen1 clean with tier null; a quarantined gen2 row KEEPS its " +
       "parsed tier (field-local recovery under evolution)") {
    val root = Files.createTempDirectory("graft_csv_ev").toString
    val g1 = docs.where(col("doc_id") % 2 === 0)
    val g2 = docs.where(col("doc_id") % 2 === 1)
    Csv.writeLines(Csv.renderLines(g1), s"$root/gen1")
    Csv.writeLines(Csv.renderLinesV2(g2, corruptMod = 7), s"$root/gen2")
    val landed = Csv.readEvolved(spark, s"$root/gen1", s"$root/gen2")
      .cache()
    try {
      val nBad = g2.where(col("doc_id") % 7 === 0).count()
      assert(landed.count() === docs.count())
      assert(landed.where(col(Csv.CorruptCol).isNotNull).count() === nBad)
      // gen1 rows: clean, tier null-filled by the union
      assert(landed.where(col("doc_id") % 2 === 0 &&
        col("quality_tier").isNotNull).count() === 0)
      // EVERY gen2 row carries its tier - including the quarantined
      // ones, whose n_chars field failed but whose later fields parsed
      val g2n = g2.count()
      assert(landed.where(col("quality_tier").isNotNull).count() === g2n)
      assert(landed.where(col(Csv.CorruptCol).isNotNull &&
        col("quality_tier").isNotNull &&
        col("n_chars").isNull).count() === nBad)
    } finally landed.unpersist(blocking = false)
  }

  test("schema evolution: the pinned REASON the generation key must be " +
       "explicit - a gen1 (5-field) shard under the superset schema is " +
       "all short rows, null-filled AND flagged corrupt") {
    val root = Files.createTempDirectory("graft_csv_short").toString
    val g1 = docs.where(col("doc_id") % 2 === 0).limit(50)
    Csv.writeLines(Csv.renderLines(g1), s"$root/gen1")
    val wrong = spark.read
      .schema(Csv.docSchemaV2)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Csv.CorruptCol)
      .csv(s"$root/gen1")
      .cache()
    try {
      assert(wrong.count() === g1.count())
      assert(wrong.where(col(Csv.CorruptCol).isNotNull).count() ===
        g1.count())
    } finally wrong.unpersist(blocking = false)
  }

  test("schema evolution: a gen2 (6-field) row under the V1 schema is " +
       "flagged corrupt (extra tokens), not silently truncated") {
    val root = Files.createTempDirectory("graft_csv_extra").toString
    val g2 = docs.where(col("doc_id") % 2 === 1).limit(50)
    Csv.writeLines(Csv.renderLinesV2(g2), s"$root/gen2")
    val v1 = Csv.read(spark, s"$root/gen2").cache()
    try {
      assert(v1.count() === g2.count())
      assert(v1.where(col(Csv.CorruptCol).isNotNull).count() ===
        g2.count())
    } finally v1.unpersist(blocking = false)
  }

  test("type-change widening: per-generation schemas + union-cast UP " +
       "land three generations; only gen3 rows are fractional, plants " +
       "stay field-local in both planted generations") {
    val root = Files.createTempDirectory("graft_csv_w").toString
    val g1 = docs.where(col("doc_id") % 5 < 2)
    val g2 = docs.where(col("doc_id") % 5 === 2 || col("doc_id") % 5 === 3)
    val g3 = docs.where(col("doc_id") % 5 === 4)
    Csv.writeLines(Csv.renderLines(g1), s"$root/gen1")
    Csv.writeLines(Csv.renderLinesV2(g2, corruptMod = 7), s"$root/gen2")
    Csv.writeLines(Csv.renderLinesV3(g3, corruptMod = 7), s"$root/gen3")
    val landed = Csv.readRetyped(spark,
      s"$root/gen1", s"$root/gen2", s"$root/gen3").cache()
    try {
      val nBad = g2.unionAll(g3).where(col("doc_id") % 7 === 0).count()
      assert(landed.count() === docs.count())
      assert(landed.where(col(Csv.CorruptCol).isNotNull).count() === nBad)
      // field-local recovery carries through the widened union: every
      // quarantined row keeps its parsed tier, n_chars null
      assert(landed.where(col(Csv.CorruptCol).isNotNull &&
        col("quality_tier").isNotNull && col("n_chars").isNull)
        .count() === nBad)
      // the union-cast is lossless: no fractional values outside gen3
      assert(landed.where(col("n_chars") =!= floor(col("n_chars")) &&
        col("doc_id") % 5 =!= 4).count() === 0)
      // gen3 clean rows carry exactly n_chars + 0.5
      val mismatch = landed
        .where(col("doc_id") % 5 === 4 && col(Csv.CorruptCol).isNull)
        .select(col("doc_id"), col("n_chars"))
        .join(docs.select(col("doc_id"),
          (col("n_chars").cast("double") + lit(0.5)).as("_want")),
          Seq("doc_id"))
        .where(col("n_chars") =!= col("_want"))
      assert(mismatch.count() === 0)
    } finally landed.unpersist(blocking = false)
  }

  test("type-change narrowing is a pinned REFUSAL: a fractional gen-3 " +
       "shard under the BIGINT schema quarantines field-locally — the " +
       "value is never truncated into the narrow column") {
    val root = Files.createTempDirectory("graft_csv_n").toString
    val g3 = docs.where(col("doc_id") % 5 === 4).limit(50)
    Csv.writeLines(Csv.renderLinesV3(g3), s"$root/gen3")
    // the NARROW read: V2 schema still types n_chars BIGINT
    val narrow = spark.read
      .schema(Csv.docSchemaV2)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Csv.CorruptCol)
      .csv(s"$root/gen3")
      .cache()
    try {
      assert(narrow.count() === g3.count())
      // every fractional row flags corrupt with n_chars null and the
      // OTHER fields recovered (source/tier parse field-locally)
      assert(narrow.where(col(Csv.CorruptCol).isNotNull).count() ===
        g3.count())
      assert(narrow.where(col("n_chars").isNotNull).count() === 0)
      assert(narrow.where(col("quality_tier").isNotNull).count() ===
        g3.count())
    } finally narrow.unpersist(blocking = false)
  }
}
