package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-audit dump: formatted physical plans for every SparkEntry query,
  * written to a markdown file. Used to keep the promises the operators
  * make (broadcast joins broadcast, filters/projections reach the scan,
  * no cartesian products) inspectable per round.
  *
  * Usage: runMain graft.Explain <sfDir> <outFile>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("PLANS_r02.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# Physical plans (audit) — `explain(\"formatted\")`\n\n")
    sb.append(s"Generated from `$sfDir` by `graft.Explain`.\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        sb.append(s"\n## $name\n\n```\n$plan```\n")
      } catch { case e: Throwable =>
        sb.append(s"\n## $name\n\nFAILED: ${e.getMessage}\n")
      }
      // Per-query cache reset, like Verify: frames persisted by one
      // query's operator must not substitute InMemoryRelations into the
      // NEXT query's audited plan — each plan should be the one a fresh
      // session would run.
      spark.catalog.clearCache()
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
  }
}
