package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's own smoke check: `SparkEntry.entry` must return
  * rows on sf0.001, and every declared query must at least build a plan
  * against sf0.001 (catches wiring typos before the round gate does).
  */
class EntrySmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query declares a resolvable, cartesian-free plan on " +
       "sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(s"query $name: ") {
        val df = fn(spark, dir)
        df.schema  // forces analysis
        // The one blanket plan contract: nothing may plan an all-pairs
        // product. (1-row BroadcastNestedLoopJoin frames are fine and
        // excluded — they are constant-size broadcasts, not n².)
        assert(!df.queryExecution.sparkPlan.toString
          .contains("CartesianProduct"))
      }
    }
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query has a DuckDB oracle — the rows-only set is EMPTY") {
    // Every query must ship with a DuckDB oracle. The last three
    // rows-only sketches (approx_users_per_type, approx_event_quantiles,
    // column_stats_approx) graduated in round 12: each now outputs its
    // exact twin's columns plus an in-plan `within_bound` verdict (the
    // same error bounds PropertySpec/ScaleSpec assert), and the oracle
    // replays the exact twin + TRUE — the hash matches iff the bound
    // held. (multimodal_features graduated in round 8 via the Q40
    // fixed-point entropy replay; the xxhash64 simhash_pairs row folded
    // into the oracle-checked simhash_pairs_md5 twin in round 9.)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
  }
}
