package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are materialized
  * through the `noop` sink so Catalyst cannot prune the projection/
  * expression work a bare `.count()` would let it skip (VERDICT r1 §wrong.2).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS): read as long (epoch nanos)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup (codegen/JIT/file-listing) so the first timed query
    // isn't charged the cold-start; then min-of-2 per query to damp
    // machine noise at these sub-10s scales.
    try SparkEntry.queries("flagship_rank")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def timeOnce(name: String,
                 fn: (org.apache.spark.sql.SparkSession, String) =>
                     org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Cold-cache before EVERY timed run, not just per query pair: some
    // operators persist frames internally (two-phase rank totals, near-dup
    // shingle sets), and a second run hitting the first's InMemoryRelation
    // would time only the tail of the plan — an unfair min-of-2.
    def timeCold(name: String,
                 fn: (org.apache.spark.sql.SparkSession, String) =>
                     org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      System.gc()
      timeOnce(name, fn)
    }
    // Optional comma-separated filter for quick single-query experiments.
    val only = SparkEntry.onlyFilter()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        name -> math.min(timeCold(name, fn), timeCold(name, fn))
      }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Stdout gets drowned in sbt log noise; also write the line to a file
    // the driver can parse reliably, and echo it on stderr as the very
    // last lines so a tail-reader finds it either way. The raw JSON is
    // printed AFTER spark.stop() so no shutdown logging can land below
    // it: a last-line tail parse must see the bare JSON object.
    val outPath = java.nio.file.Paths.get("bench_out.json").toAbsolutePath
    java.nio.file.Files.writeString(outPath, json + "\n")
    spark.stop()
    System.err.println(s"BENCH_JSON_FILE=$outPath")
    System.err.println(json)
    println(s"BENCH_JSON_FILE=$outPath")
    println(json)
    System.out.flush()
  }
}
