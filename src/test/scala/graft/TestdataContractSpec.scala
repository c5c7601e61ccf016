package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the testdata timestamp contract that silently broke round 6
  * (VERDICT r6 §wrong.1): the driver regenerated `events.parquet` with
  * `ts` as parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) — read by
  * Spark as TIMESTAMP_NTZ — and every event-time query failed at
  * analysis. This spec fails in seconds, not after a full round, if
  * either side of the contract moves again:
  *
  *  1. [[graft.operators.EventOps.eventMs]]/`eventTs` must resolve AND
  *     produce the same epoch-millis instant for all three readings the
  *     source has ever shipped with: LongType (nanos via
  *     `nanosAsLong`), TIMESTAMP, TIMESTAMP_NTZ (session tz pinned UTC).
  *  2. Whatever type `/root/testdata` *actually* stores today, `eventMs`
  *     must resolve and execute against it.
  */
class TestdataContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2023-11-14T22:13:20.123 UTC
  private val ms = 1700000000123L

  private def msOf(df: org.apache.spark.sql.DataFrame): Long =
    df.select(graft.operators.EventOps.eventMs(df).cast("long"))
      .head().getLong(0)

  private def tsMsOf(df: org.apache.spark.sql.DataFrame): Long = {
    val out = df.select(graft.operators.EventOps.eventTs(df).as("t"))
    assert(out.schema("t").dataType === TimestampType,
      "eventTs must yield a plain TIMESTAMP for window()")
    out.select(unix_millis(col("t"))).head().getLong(0)
  }

  test("eventMs/eventTs resolve on LongType nanos reading") {
    val df = Seq(ms * 1000000L).toDF("ts")
    assert(df.schema("ts").dataType === LongType)
    assert(msOf(df) === ms)
    assert(tsMsOf(df) === ms)
  }

  test("eventMs/eventTs resolve on TIMESTAMP reading") {
    val df = spark.range(1).select(timestamp_millis(lit(ms)).as("ts"))
    assert(df.schema("ts").dataType === TimestampType)
    assert(msOf(df) === ms)
    assert(tsMsOf(df) === ms)
  }

  test("eventMs/eventTs resolve on TIMESTAMP_NTZ reading") {
    val df = spark.range(1)
      .select(timestamp_millis(lit(ms)).cast("timestamp_ntz").as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(msOf(df) === ms)
    assert(tsMsOf(df) === ms)
  }

  test("eventMs resolves and executes against today's testdata events") {
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf/events.parquet")
      .filter(p => new java.io.File(p).exists)
    assert(dirs.nonEmpty, "no testdata events.parquet found")
    dirs.foreach { p =>
      val ev = spark.read.parquet(p)
      val tsType = ev.schema("ts").dataType
      assert(Seq(LongType, TimestampType, TimestampNTZType).contains(tsType),
        s"$p ts is $tsType — a reading EventOps.eventMs has no case for; " +
          "add one and extend this spec")
      // Resolve + execute: one aggregate forces analysis and a scan.
      val n = ev.select(graft.operators.EventOps.eventMs(ev).as("ms"))
        .where(col("ms").isNotNull).limit(5).count()
      assert(n > 0, s"$p yielded no non-null event-ms rows")
    }
  }
}
