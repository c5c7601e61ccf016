package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

class EventOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val events = Seq(
    // user 7: value changes 1.0 → 2.0 → 2.0 (no change) → 3.0
    (1L, ts(0), 7L, "click", 1.0),
    (2L, ts(1), 7L, "click", 2.0),
    (3L, ts(2), 7L, "view", 2.0),
    (4L, ts(90), 7L, "view", 3.0),    // also starts a new session (gap>30m)
    // user 8: constant
    (5L, ts(0), 8L, "click", 5.0),
    (6L, ts(5), 8L, "click", 5.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("changeCapture emits one row per observed change, in order") {
    val out = EventOps.changeCapture(events).orderBy("user_id", "event_id")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Double]("old_value"),
        r.getAs[Double]("new_value")))
    assert(out.toSeq === Seq((7L, 2L, 1.0, 2.0), (7L, 4L, 2.0, 3.0)))
  }

  test("sessionize splits on the 30-minute gap") {
    val out = EventOps.sessionize(events).orderBy("user_id", "session_id")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("session_id"), r.getAs[Long]("n_events")))
    assert(out.toSeq === Seq((7L, 1L, 3L), (7L, 2L, 1L), (8L, 1L, 2L)))
  }

  test("scd2Enrich: every event lands on its valid version; boundary " +
       "events take the newer version") {
    // user 7 versions: v1(1.0)@ts0, v2(2.0)@ts1, v3(3.0)@ts90; the
    // change events themselves (ts1, ts90) must attach to the version
    // they OPEN, not the one they close.
    val out = EventOps.scd2Enrich(events).orderBy("user_id", "event_id")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id"), r.getAs[Long]("version"),
        r.getAs[Double]("dim_value")))
    assert(out.toSeq === Seq(
      (7L, 1L, 1L, 1.0), (7L, 2L, 2L, 2.0), (7L, 3L, 2L, 2.0),
      (7L, 4L, 3L, 3.0), (8L, 5L, 1L, 5.0), (8L, 6L, 1L, 5.0)))
  }

  test("eventPaths: per-user time-ordered trigrams, no cross-user " +
       "leakage, count-desc order") {
    // user 7: click,click,view,view → 2 trigrams; user 8: click,click →
    // none (and no trigram spans users).
    val out = EventOps.eventPaths(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_paths")))
    assert(out.toSeq === Seq(("click", "click", "view", 1L),
      ("click", "view", "view", 1L)))
  }

  test("hourlySpikes: integer 3-sigma predicate flags the burst hour " +
       "only, low hours never flag") {
    // 12 buckets of one event + one bucket of three: (x−1)²(m−9) > 9
    // with m=12, x=3 → 12 > 9 flags the burst; every c=1 bucket fails
    // the upward test (c·n < s).
    val singles = (0 until 12).map(h =>
      ((h + 1).toLong, ts(60 * h), 7L, "c", 1.0))
    val burst = Seq((100L, ts(720), 7L, "c", 1.0),
      (101L, ts(721), 7L, "c", 1.0), (102L, ts(722), 7L, "c", 1.0))
    val ev = (singles ++ burst)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.hourlySpikes(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket_ms"),
        r.getAs[Long]("n_events")))
    val expectedBucket =
      (1700000000000L + 720L * 60000L) / 3600000L * 3600000L
    assert(out.toSeq === Seq((7L, expectedBucket, 3L)))
  }

  test("decayedCounts: exact 2^-h half-life weights from the corpus " +
       "max time, >40-period events contribute zero") {
    val Q = 1099511627776L // 2^40
    val ev = Seq(
      (1L, ts(0), 7L, "c", 1.0),      // 2h before max → Q/4
      (2L, ts(60), 7L, "c", 1.0),     // 1h before   → Q/2
      (3L, ts(120), 7L, "c", 1.0),    // at max      → Q
      (4L, ts(-60 * 41), 8L, "c", 1.0), // 42h+ ago  → h>40 → 0
      (5L, ts(90), 8L, "c", 1.0))     // 30min ago → h=0 → Q
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.decayedCounts(ev).orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("decayed_fp")))
    assert(out.toSeq === Seq((7L, 3L, Q / 4 + Q / 2 + Q),
      (8L, 2L, 0L + Q)))
  }

  test("sessionOverlapPairs: overlap detected across hour-bin " +
       "boundaries, touch counts, disjoint doesn't") {
    // u7: sessions [0,2] and [90,90]; u8: [0,5]; u9: [58,95] (22/15-min
    // gaps keep it one session, and it straddles the 60-min bin edge).
    val ev = (Seq((1L, ts(0), 7L, "c", 1.0), (2L, ts(2), 7L, "c", 1.0),
      (3L, ts(90), 7L, "c", 1.0), (4L, ts(0), 8L, "c", 1.0),
      (5L, ts(5), 8L, "c", 1.0), (6L, ts(58), 9L, "c", 1.0),
      (7L, ts(80), 9L, "c", 1.0), (8L, ts(95), 9L, "c", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.sessionOverlapPairs(ev)
      .orderBy("user_a", "session_a", "user_b", "session_b")
      .collect().map(r => (r.getAs[Long]("user_a"),
        r.getAs[Long]("session_a"), r.getAs[Long]("user_b"),
        r.getAs[Long]("session_b"), r.getAs[Long]("overlap_ms")))
    // u7s1×u8s1 overlap 2 min; u7s2 [90,90] touches u9 [58,95] → 0-ms
    // overlap INCLUDED (inclusive endpoints, despite different hour
    // bins for the session starts); u7s1/u7s2 same user → excluded;
    // u8 [0,5] vs u9 [58,95] disjoint → excluded.
    assert(out.toSeq === Seq(
      (7L, 1L, 8L, 1L, 2L * 60000),
      (7L, 2L, 9L, 1L, 0L)))
  }

  test("sessionWindows: same gap grouping as sessionize on clear gaps") {
    val out = EventOps.sessionWindows(events)
      .orderBy("user_id", "session_start_ms")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"),
        r.getAs[Long]("session_end_ms") - r.getAs[Long]("session_start_ms")))
    // end = last event + gap, so a single-event session spans exactly 30m
    assert(out.toSeq === Seq((7L, 3L, 2L * 60000 + 1800000),
      (7L, 1L, 1800000L), (8L, 2L, 5L * 60000 + 1800000)))
  }

  test("sessionWindows boundary: events exactly gap apart DO merge") {
    // Pins the oracle's strict-`>` micros rule: session_window merges a
    // window starting exactly at the previous window's end (measured,
    // Spark 4.1 — the merge treats the boundary inclusively), matching
    // sessionize's `diff > gap` rule, only at microsecond precision.
    val boundary = Seq((1L, ts(0), 1L, "view", 0.0),
                       (2L, ts(30), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val sw = EventOps.sessionWindows(boundary).collect()
    assert(sw.length === 1)
    assert(sw(0).getAs[Long]("n_events") === 2L)
    // and one microsecond past the gap splits
    val past = Seq((1L, ts(0), 1L, "view", 0.0),
                   (2L, new Timestamp(ts(30).getTime + 1), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventOps.sessionWindows(past).collect().length === 2)
  }

  test("funnel: earliest-completion cohorts are monotone and ordered") {
    def m(min: Int) = ts(min)
    val ev = Seq(
      // user 1 completes the whole funnel in order
      (1L, m(0), 1L, "view", 0.0), (2L, m(10), 1L, "click", 0.0),
      (3L, m(20), 1L, "purchase", 0.0),
      // user 2 stops after the click
      (4L, m(0), 2L, "view", 0.0), (5L, m(5), 2L, "click", 0.0),
      // user 3 clicked BEFORE the first view — never reaches step 1
      (6L, m(0), 3L, "click", 0.0), (7L, m(10), 3L, "view", 0.0),
      // user 4 has no view at all
      (8L, m(0), 4L, "purchase", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.funnel(ev).collect()
      .map(r => (r.getAs[Long]("step_idx"), r.getAs[String]("step"),
        r.getAs[Long]("n_users")))
    assert(out.toSeq === Seq((0L, "view", 3L), (1L, "click", 2L),
      (2L, "purchase", 1L)))
  }

  test("retentionCohorts: first-bucket cohorts, offset counts") {
    // 1-minute buckets so the fixture's minute offsets are the buckets:
    // user 7 active in buckets {0,1,2,90}, user 8 in {0,5} (relative to
    // the shared epoch minute), both cohorted at the same first bucket.
    val out = EventOps.retentionCohorts(events, bucketMs = 60000L)
      .collect().map(r => (r.getAs[Long]("bucket_offset"),
        r.getAs[Long]("n_users")))
    assert(out.toSeq === Seq((0L, 2L), (1L, 1L), (2L, 1L), (5L, 1L),
      (90L, 1L)))
  }

  test("transitionMatrix: fixed-point row-normalized adjacent-pair counts") {
    // user 7's sequence click,click,view,view → click→click, click→view,
    // view→view; user 8's click,click → click→click.
    // Totals per src: click=3, view=1.
    val out = EventOps.transitionMatrix(events).collect()
      .map(r => (r.getAs[String]("src_type"), r.getAs[String]("dst_type"),
        r.getAs[Long]("n"), r.getAs[Long]("prob_fp")))
    assert(out.toSeq === Seq(
      ("click", "click", 2L, 666666L),   // (2·10^6) // 3
      ("click", "view", 1L, 333333L),    // (1·10^6) // 3
      ("view", "view", 1L, 1000000L)))
  }

  test("scd2: adjacent-equal values collapse, intervals chain, " +
       "last version per key is current") {
    // user 7: 1.0 → 2.0 → 2.0 (collapses) → 3.0; user 8: constant 5.0.
    val out = EventOps.scd2(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("value"),
        r.getAs[Long]("effective_from_ms"),
        Option(r.getAs[java.lang.Long]("effective_to_ms")).map(_.toLong),
        r.getAs[Long]("version"), r.getAs[Boolean]("is_current")))
    val t0 = 1700000000000L
    assert(out.toSeq === Seq(
      (7L, 1.0, t0, Some(t0 + 60000L), 1L, false),
      (7L, 2.0, t0 + 60000L, Some(t0 + 90 * 60000L), 2L, false),
      (7L, 3.0, t0 + 90 * 60000L, None, 3L, true),
      (8L, 5.0, t0, None, 1L, true)))
  }

  test("twap: interval-weighted mean, exact decimal sums, " +
       "single-event users excluded") {
    // user 7 holds 1.0 for 1min, 2.0 for 1min, 2.0 for 88min →
    // twap = (1·60000 + 2·60000 + 2·5280000) / 5400000 = 10740000/5400000
    // user 8 holds 5.0 for 5min → exactly 5.0
    val out = EventOps.twap(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_intervals"),
        r.getAs[Long]("span_ms"), r.getAs[Double]("twap")))
    assert(out.toSeq === Seq(
      (7L, 3L, 90 * 60000L, 10740000.0 / 5400000.0),
      (8L, 1L, 5 * 60000L, 5.0)))
  }

  test("valueVariance: power-sum variance matches the textbook formula") {
    // click values: 1.0, 2.0, 5.0, 5.0 → n=4, Σv=13, Σv²=55;
    // var = (4·55 − 169) / (4·3) = 51/12; view values: 2.0, 3.0 →
    // var = (2·13 − 25) / 2 = 0.5
    val out = EventOps.valueVariance(events).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("mean"), r.getAs[Double]("var_samp")))
    assert(out.toSeq === Seq(
      ("click", 4L, 13.0 / 4.0, 51.0 / 12.0),
      ("view", 2L, 2.5, 0.5)))
  }

  test("gapFill: dense grid, forward fill, in-bucket tiebreak, " +
       "per-user spans") {
    // minute buckets on the shared fixture: user 7 observes minutes
    // 0,1,2,90 (values 1,2,2,3) → 91 grid rows, minutes 3..89 filled
    // with 2.0; user 8 observes 0 and 5 → 6 rows, 1..4 filled with 5.0
    val out = EventOps.gapFill(events, bucketMs = 60000L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket"),
        r.getAs[Double]("filled_value"), r.getAs[Boolean]("is_observed")))
    val u7 = out.filter(_._1 == 7L)
    assert(u7.length === 91)
    assert(u7.count(_._4) === 4)
    assert(u7(2)._3 === 2.0 && u7(50)._3 === 2.0 && u7(90)._3 === 3.0)
    val u8 = out.filter(_._1 == 8L)
    assert(u8.length === 6)
    assert(u8.map(_._3).forall(_ === 5.0))
    // two observations in ONE bucket: the later (ms, event_id) wins
    val sameBucket = Seq(
      (1L, ts(0), 1L, "view", 10.0),
      (2L, new java.sql.Timestamp(ts(0).getTime + 1), 1L, "view", 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val one = EventOps.gapFill(sameBucket, bucketMs = 60000L).collect()
    assert(one.length === 1)
    assert(one(0).getAs[Double]("filled_value") === 20.0)
  }

  test("asofJoin: latest right value at or before each left row, per key") {
    val clicks = Seq((7L, 10L, 100L), (7L, 20L, 300L), (7L, 30L, 250L),
                     (8L, 40L, 100L))
      .toDF("user_id", "click_id", "_ms")
    val purchases = Seq((7L, 100L, 1.0), (7L, 250L, 2.0), (9L, 50L, 9.0))
      .toDF("user_id", "_ms", "value")
    val out = EventOps.asofJoin(clicks, purchases, "user_id", "_ms", "value")
      .orderBy("user_id", "click_id")
      .collect().map(r => (r.getAs[Long]("click_id"),
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)))
    assert(out.toSeq === Seq(
      (10L, Some(1.0)),   // ms 100 == purchase ms 100: inclusive
      (20L, Some(2.0)),   // ms 300: latest purchase at/before is ms 250
      (30L, Some(2.0)),   // ms 250 == purchase ms 250: inclusive
      (40L, None)))       // user 8 has no purchases
  }

  test("tumblingCounts aggregates per hour × event_type") {
    val out = EventOps.tumblingCounts(events)
      .orderBy("window_start_ms", "event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
                 r.getAs[Double]("total_value")))
    // hour 1: clicks (1.0+2.0+5.0+5.0), views (2.0); hour 2: view (3.0)
    assert(out.toSeq === Seq(("click", 4L, 13.0), ("view", 1L, 2.0),
                             ("view", 1L, 3.0)))
  }

  test("hoppingCounts: every event lands in exactly width/slide windows") {
    val hop = EventOps.hoppingCounts(events)   // 1h width, 30m slide
    val total = hop.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head().getLong(0)
    assert(total === events.count() * 2)       // 2 overlapping windows each
    // consecutive window starts differ by the slide, not the width
    val starts = hop.select("window_start_ms").distinct()
      .orderBy("window_start_ms").collect().map(_.getLong(0))
    assert(starts.sliding(2).forall {
      case Array(a, b) => (b - a) % 1800000L === 0L
      case _ => true
    })
  }

  test("jsonProps: typed extraction, malformed/missing degrade to null") {
    val ev = Seq(
      (1L, ts(0), 7L, "click", 1.0, """{"k": 42}"""),
      (2L, ts(1), 7L, "click", 1.0, """{"other": 1}"""),  // key missing
      (3L, ts(2), 7L, "view", 1.0, "not json at all"),     // malformed
      (4L, ts(3), 8L, "view", 1.0, null))                  // null payload
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.jsonProps(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("k"))).toMap
    assert(out(1L) === Some(42L))
    assert(out(2L) === None && out(3L) === None && out(4L) === None)
  }

  test("jsonPropsRollup: null payloads counted, mean over non-null only") {
    val ev = Seq(
      (1L, ts(0), 7L, "click", 1.0, """{"k": 10}"""),
      (2L, ts(1), 7L, "click", 1.0, """{"k": 20}"""),
      (3L, ts(2), 7L, "click", 1.0, "broken"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.jsonPropsRollup(ev).collect().head
    assert(r.getAs[Long]("n_events") === 3L)
    assert(r.getAs[Long]("n_null_props") === 1L)
    assert(r.getAs[Long]("sum_k") === 30L)
    assert(r.getAs[Double]("avg_k") === 15.0)
  }
}
