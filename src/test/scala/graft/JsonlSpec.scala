package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jsonl

class JsonlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("write → read round-trip is field-exact with zero quarantine") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString + "/d"
    Jsonl.writeLines(Jsonl.renderLines(docs), dir)
    // Cached: Spark disallows raw-file queries whose only referenced
    // column is the internal corrupt-record column (the zero-quarantine
    // assertion below is exactly that shape).
    val landed = Jsonl.read(spark, dir).cache()

    assert(landed.where(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(landed.count() === docs.count())
    // Full-row equality through the round trip: anti-join in both
    // directions over every data column (JSON escaping of quotes,
    // backslashes, newlines must be lossless).
    val back = landed.select("doc_id", "lang", "n_chars", "source", "text")
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    assert(back.exceptAll(docs.select(cols.head, cols.tail: _*)).count() === 0)
    assert(docs.select(cols.head, cols.tail: _*).exceptAll(back).count() === 0)
  }

  test("escaping round-trip: newlines, quotes, backslashes, unicode " +
       "stay single-line and lossless") {
    import spark.implicits._
    val tricky = Seq(
      (1L, "en", 9L, "s1", "line1\nline2\t\"quoted\" \\back\\"),
      (2L, "xx", 4L, "s2", "emoji é中 end"),
      (3L, "en", 0L, "s1", ""))
      .toDF("doc_id", "lang", "n_chars", "source", "text")
    val dir = Files.createTempDirectory("graft_jsonl_esc").toString + "/d"
    Jsonl.writeLines(Jsonl.renderLines(tricky), dir)
    // One physical line per record — the embedded \n must be escaped.
    assert(spark.read.text(dir).count() === 3)
    val back = Jsonl.read(spark, dir).cache()
    assert(back.where(col(Jsonl.CorruptCol).isNotNull).count() === 0)
    assert(back.select("doc_id", "lang", "n_chars", "source", "text")
      .exceptAll(tricky).count() === 0)
  }

  test("corruptMod quarantines exactly the doc_id%mod rows, raw line " +
       "preserved, parsed complement intact") {
    val dir = Files.createTempDirectory("graft_jsonl_q").toString + "/d"
    Jsonl.writeLines(Jsonl.renderLines(docs, corruptMod = 7), dir)
    val landed = Jsonl.read(spark, dir).cache()

    val expectedBad = docs.where(col("doc_id") % 7 === 0).count()
    val bad = landed.where(col(Jsonl.CorruptCol).isNotNull)
    assert(bad.count() === expectedBad)
    // Quarantined rows carry the raw line and nothing else.
    assert(bad.where(col("doc_id").isNotNull || col("text").isNotNull ||
      col("source").isNotNull).count() === 0)
    // Every quarantined raw line is a strict prefix of a JSON object.
    assert(bad.where(!col(Jsonl.CorruptCol).startsWith("{")).count() === 0)
    assert(bad.where(col(Jsonl.CorruptCol).endsWith("}")).count() === 0)
    // The parsed complement is exactly the non-corrupted originals.
    val good = landed.where(col(Jsonl.CorruptCol).isNull)
      .select("doc_id", "lang", "n_chars", "source", "text")
    val expectedGood = docs.where(col("doc_id") % 7 =!= 0)
      .select("doc_id", "lang", "n_chars", "source", "text")
    assert(good.exceptAll(expectedGood).count() === 0)
    assert(expectedGood.exceptAll(good).count() === 0)
  }

  test("landingStats groups quarantine under the NULL source bucket") {
    val dir = Files.createTempDirectory("graft_jsonl_s").toString + "/d"
    Jsonl.writeLines(Jsonl.renderLines(docs, corruptMod = 7), dir)
    val stats = Jsonl.landingStats(Jsonl.read(spark, dir)).collect()

    // NULLS FIRST ordering: the quarantine bucket leads.
    assert(stats.head.isNullAt(0))
    assert(stats.head.getAs[Long]("n_rows") ===
      docs.where(col("doc_id") % 7 === 0).count())
    assert(stats.head.getAs[Long]("n_parsed") === 0L)
    assert(stats.head.isNullAt(stats.head.fieldIndex("sum_chars")))
    // Healthy buckets: per-source counts and character sums match a
    // direct computation from the originals.
    val expected = docs.where(col("doc_id") % 7 =!= 0)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    stats.tail.foreach { r =>
      val (n, chars) = expected(r.getString(0))
      assert(r.getAs[Long]("n_rows") === n)
      assert(r.getAs[Long]("n_parsed") === n)
      assert(r.getAs[Long]("sum_chars") === chars)
    }
  }

  test("schema evolution: superset read lands gen1 clean with tier null, " +
       "gen2 with its tier, damaged gen2 in whole-row quarantine; a gen2 " +
       "shard under the V1 schema parses clean (additive forward-compat)") {
    val root = Files.createTempDirectory("graft_jsonl_ev").toString
    val g1 = docs.where(col("doc_id") % 2 === 0)
    val g2 = docs.where(col("doc_id") % 2 === 1)
    Jsonl.writeLines(Jsonl.renderLines(g1), s"$root/gen1")
    Jsonl.writeLines(Jsonl.renderLinesV2(g2, corruptMod = 7), s"$root/gen2")
    val landed = Jsonl.readEvolved(spark, s"$root/gen1", s"$root/gen2")
      .cache()
    try {
      val nBad = g2.where(col("doc_id") % 7 === 0).count()
      assert(landed.count() === docs.count())
      assert(landed.where(col(Jsonl.CorruptCol).isNotNull).count() === nBad)
      // gen1: every row clean, tier null
      assert(landed.where(col("doc_id") % 2 === 0 &&
        col("quality_tier").isNotNull).count() === 0)
      assert(landed.where(col("doc_id") % 2 === 0).count() === g1.count())
      // gen2 clean rows carry the deterministic tier
      val tierOk = landed.where(col("doc_id") % 2 === 1)
        .where(col("quality_tier") ===
          elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
            lit("high"), lit("medium"), lit("low")))
        .count()
      assert(tierOk === g2.count() - nBad)

      // Forward-compat: the OLD (V1) reader over the gen2 shard — the
      // streaming landing's posture — ignores the unknown key and
      // quarantines exactly the planted damage. Additive evolution
      // never breaks a deployed v1 consumer.
      val v1 = Jsonl.read(spark, s"$root/gen2").cache()
      try {
        assert(v1.where(col(Jsonl.CorruptCol).isNotNull).count() === nBad)
        assert(v1.where(col(Jsonl.CorruptCol).isNull).count() ===
          g2.count() - nBad)
      } finally v1.unpersist(blocking = false)
    } finally landed.unpersist(blocking = false)
  }

  test("schema evolution: a TYPE change (string in the BIGINT n_chars) " +
       "flags the row corrupt and nulls the violating field - never " +
       "silently coerces; well-formed fields are retained (partial " +
       "results), unlike a MALFORMED line which nulls whole-row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl_ty").toString + "/d"
    Seq(
      """{"doc_id":1,"lang":"en","n_chars":"xx","source":"s","text":"t","quality_tier":"high"}""",
      """{"doc_id":2,"lang":"en","n_chars":5,"source":"s","text":"ok","quality_tier":"low"}""")
      .toDF("value").coalesce(1).write.text(dir)
    val landed = Jsonl.readEvolved(spark, dir).cache()
    try {
      val bad = landed.where(col(Jsonl.CorruptCol).isNotNull).collect()
      assert(bad.length === 1)
      // the violating field is null - the value was never coerced
      assert(bad.head.isNullAt(bad.head.fieldIndex("n_chars")))
      // but the row is still VISIBLE as damaged (corrupt col set) with
      // its well-formed fields retained - Spark's PERMISSIVE partial
      // results; the audit counts it via COUNT(_corrupt)
      assert(bad.head.getLong(bad.head.fieldIndex("doc_id")) === 1L)
      assert(bad.head.getString(
        bad.head.fieldIndex("quality_tier")) === "high")
      assert(landed.where(col(Jsonl.CorruptCol).isNull)
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    } finally landed.unpersist(blocking = false)
  }

  test("type-change widening: three generations under the widened " +
       "schema — old integers parse clean as doubles, only gen3 rows " +
       "are fractional, plants still quarantine whole-row") {
    val root = Files.createTempDirectory("graft_jsonl_w").toString
    val g1 = docs.where(col("doc_id") % 5 < 2)
    val g2 = docs.where(col("doc_id") % 5 === 2 || col("doc_id") % 5 === 3)
    val g3 = docs.where(col("doc_id") % 5 === 4)
    Jsonl.writeLines(Jsonl.renderLines(g1), s"$root/gen1")
    Jsonl.writeLines(Jsonl.renderLinesV2(g2, corruptMod = 7), s"$root/gen2")
    Jsonl.writeLines(Jsonl.renderLinesV3(g3, corruptMod = 7), s"$root/gen3")
    val landed = Jsonl.readRetyped(spark,
      s"$root/gen1", s"$root/gen2", s"$root/gen3").cache()
    try {
      val nBad = (g2.unionAll(g3)).where(col("doc_id") % 7 === 0).count()
      assert(landed.count() === docs.count())
      assert(landed.where(col(Jsonl.CorruptCol).isNotNull).count() === nBad)
      // widening is lossless for the old generations: integral doubles
      val frac = landed.where(col("n_chars") =!= floor(col("n_chars")))
      assert(frac.where(col("doc_id") % 5 =!= 4).count() === 0)
      // and observable for gen3: every clean gen-3 row is fractional,
      // carrying exactly n_chars + 0.5
      val g3Clean = landed.where(col("doc_id") % 5 === 4 &&
        col(Jsonl.CorruptCol).isNull)
      assert(g3Clean.count() === g3.count() - g3.where(col("doc_id") % 7 === 0).count())
      val mismatch = g3Clean.select(col("doc_id"), col("n_chars"))
        .join(docs.select(col("doc_id"),
          (col("n_chars").cast("double") + lit(0.5)).as("_want")),
          Seq("doc_id"))
        .where(col("n_chars") =!= col("_want"))
      assert(mismatch.count() === 0)
    } finally landed.unpersist(blocking = false)
  }

  test("type-change narrowing is a pinned REFUSAL: a fractional gen-3 " +
       "line under the old BIGINT schema quarantines field-locally — " +
       "never a silent truncation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl_n").toString + "/d"
    Seq(
      """{"doc_id":1,"lang":"en","n_chars":123.5,"source":"s","text":"t","quality_tier":"high"}""",
      """{"doc_id":2,"lang":"en","n_chars":5,"source":"s","text":"ok","quality_tier":"low"}""")
      .toDF("value").coalesce(1).write.text(dir)
    // readEvolved = the NARROW (BIGINT n_chars) superset schema
    val landed = Jsonl.readEvolved(spark, dir).cache()
    try {
      val bad = landed.where(col(Jsonl.CorruptCol).isNotNull).collect()
      assert(bad.length === 1)
      // the fractional value was never truncated into the BIGINT column
      assert(bad.head.isNullAt(bad.head.fieldIndex("n_chars")))
      // partial results: the row is visible with its well-formed fields
      assert(bad.head.getLong(bad.head.fieldIndex("doc_id")) === 1L)
      assert(bad.head.getString(
        bad.head.fieldIndex("quality_tier")) === "high")
      // the integral row is untouched by the narrow read
      assert(landed.where(col(Jsonl.CorruptCol).isNull)
        .select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
    } finally landed.unpersist(blocking = false)
  }
}
