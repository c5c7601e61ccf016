package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EventOps, TextOps}

/** Round-8 second-wave curation/mixing operators: temperature source
  * weights, per-source z-scores, CCNet terciles, the equi-width length
  * histogram, quality-argmax dedup, and the RANGE-frame moving average.
  */
class MixingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String, String)]) =
    rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("sourceTemperature: sqrt weights upsample the small source") {
    // 16 docs in 'big', 4 in 'small' → raw ratio 4:1, sqrt ratio 2:1.
    val d = mkDocs(
      (0 until 16).map(i => (i.toLong, s"doc $i", "en", "big")) ++
      (16 until 20).map(i => (i.toLong, s"doc $i", "en", "small")))
    val out = TextOps.sourceTemperature(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("p_ppm"))).toMap
    assert(out("big")._1 === 16L && out("small")._1 === 4L)
    // weights 4e6 : 2e6 → p_ppm 666666 : 333333 to the fixed-point floor
    assert(out("big")._2 === 666666L)
    assert(out("small")._2 === 333333L)
    // temperature flattening: small gets 1/3 > its raw 1/5 share
    assert(out("small")._2 > 200000L)
  }

  test("zscoreBySource: ppm z-scores, zero-variance source safe") {
    val d = Seq(
      (0L, "a", "en", "s1", 10L), (1L, "b", "en", "s1", 20L),
      (2L, "c", "en", "s1", 30L),
      (3L, "d", "en", "s2", 7L), (4L, "e", "en", "s2", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.zscoreBySource(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("z_ppm")).toMap
    // s1: mean 20, population sd = sqrt(200/3); z(10) = -10/8.1649...
    // fixed point: sd_fp = floor(sqrt(3*1400 - 60*60)) = floor(sqrt(600))
    //            = 24; z_ppm = -(abs(10*3-60)*1e6 div 24) = -1250000
    assert(out(0L) === -1250000L)
    assert(out(1L) === 0L)
    assert(out(2L) === 1250000L)
    // zero-variance source never divides by zero
    assert(out(3L) === 0L && out(4L) === 0L)
  }

  test("ccnetBuckets: per-lang terciles by LM score, no-bigram doc sinks") {
    // 'common common' bigrams make high-probability docs; a rare pair
    // scores low; a single-token doc has no bigrams at all → tail.
    val d = mkDocs(Seq(
      (0L, "x x x x", "en", "s"), (1L, "x x x x", "en", "s"),
      (2L, "x x x x", "en", "s"), (3L, "x q", "en", "s"),
      (4L, "solo", "en", "s"),
      (5L, "y y", "de", "s")))
    val out = TextOps.ccnetBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("bucket"), r.getAs[Long]("score_fp"))).toMap
    // en partition has 5 docs → terciles of sizes 2/2/1
    assert(out(0L)._1 === "head")
    assert(out(4L)._1 === "tail" && out(4L)._2 === -1L)
    // the lone de doc is its own head
    assert(out(5L)._1 === "head")
  }

  test("lengthHistogram: equi-width bins cover [min, max] exactly") {
    val d = mkDocs((0 until 32).map(i =>
      (i.toLong, "x" * (10 + i), "en", "s")))   // n_chars 10..41
    val out = TextOps.lengthHistogram(d, bins = 16).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 32L)
    // 32 lengths over width-2 bins → every bin holds exactly 2
    assert(out.length === 16)
    assert(out.forall(_.getAs[Long]("n_docs") === 2L))
    val first = out.minBy(_.getAs[Long]("bin"))
    val last = out.maxBy(_.getAs[Long]("bin"))
    assert(first.getAs[Long]("min_chars") === 10L)
    assert(last.getAs[Long]("max_chars") === 41L)
  }

  test("keepByScore: quality argmax beats keep-longest on a planted pair") {
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L))
      .toDF("doc_id", "cluster")
    val scored = Seq((0L, 0.3), (1L, 0.9), (2L, 0.5))
      .toDF("doc_id", "quality_score")
    val out = Dedup.keepByScore(scored, clusters).collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("doc_id")).toMap
    assert(out === Map(0L -> 1L, 2L -> 2L))
  }

  test("keepByScore: doc_id tiebreak on equal scores") {
    val clusters = Seq((5L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val scored = Seq((5L, 0.7), (3L, 0.7)).toDF("doc_id", "quality_score")
    val out = Dedup.keepByScore(scored, clusters).collect()
    assert(out.length === 1 && out.head.getAs[Long]("doc_id") === 3L)
  }

  test("mixManifest: temperature quota caps each source, best-quality " +
       "docs fill it") {
    // 16 big docs, 4 small docs → expected draws 13 and 6 of total 20
    // (666666 ppm × 20 // 1e6 = 13; 333333 × 20 // 1e6 = 6, capped by
    // the 4 available) — the cap is the rank filter, so small keeps
    // all 4 and big keeps its 13 best.
    val texts = (0 until 16).map(i =>
      (i.toLong, ("tok " * (i + 2)).trim, "en", "big")) ++
      (16 until 20).map(i => (i.toLong, "a b c", "en", "small"))
    val out = TextOps.mixManifest(mkDocs(texts)).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("big").length === 13)
    assert(bySrc("small").length === 4)
    // every kept rank is within the quota and ranks are dense from 1
    assert(bySrc("big").map(_.getAs[Long]("rk")).sorted.toSeq ===
      (1L to 13L))
  }

  test("movingAvgRange: RANGE frame spans trailing hour incl. peers") {
    val h = 3600000L
    val ev = Seq(
      // user 1: t=0, t=30min, t=90min — third window excludes t=0
      (1L, 1L, 0L, 10.0), (2L, 1L, h / 2, 20.0), (3L, 1L, h + h / 2, 40.0),
      // user 2: two events at the SAME ms — peers see each other both ways
      (4L, 2L, 1000L, 1.0), (5L, 2L, 1000L, 3.0))
      .toDF("event_id", "user_id", "ms", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_millis(col("ms")).as("ts"), col("value"))
    val out = EventOps.movingAvgRange(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("win_n"), r.getAs[Double]("moving_avg"))).toMap
    assert(out(1L) === ((1L, 10.0)))
    assert(out(2L) === ((2L, 15.0)))          // 0 and 30min both in frame
    assert(out(3L) === ((2L, 30.0)))          // 30min + 90min; 0 aged out
    assert(out(4L) === ((2L, 2.0)))           // same-ms peer included
    assert(out(5L) === ((2L, 2.0)))
  }

  test("curation_reasons: 'kept' is exactly curation_pipeline_v2's " +
       "survivor set and verdicts partition the corpus (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val reasons = SparkEntry.queries("curation_reasons")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
    val nDocs = spark.read
      .parquet(s"$dir/documents.parquet").count()
    assert(reasons.length === nDocs)          // every doc gets a verdict
    val kept = reasons.collect { case (id, "kept") => id }.toSet
    val v2 = SparkEntry.queries("curation_pipeline_v2")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === v2)                       // definitional sync
    // attribution uses only the pipeline's vocabulary of reasons
    val allowed = Set("length", "quality", "language", "duplicate",
      "dup_spans", "unscoreable", "kept")
    assert(reasons.map(_._2).toSet.subsetOf(allowed))
  }
}
