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
    val plans = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try plans(name) = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Throwable =>
        failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
      // Per-query cache reset, like Verify: frames persisted by one
      // query's operator must not substitute InMemoryRelations into the
      // NEXT query's audited plan — each plan should be the one a fresh
      // session would run.
      spark.catalog.clearCache()
      System.gc()   // reclaim localCheckpoint blocks (see Verify)
    }
    val sb = new StringBuilder
    sb.append("# Physical plans (audit) — `explain(\"formatted\")`\n\n")
    sb.append(s"Generated from `$sfDir` by `graft.Explain`.\n")
    // Machine-generated scale-killer scan, so every PLANS_r* file
    // carries its own audit instead of relying on a by-hand pass:
    // cartesians are outright failures (EntrySmokeSpec also rejects
    // them); plain `Cross` counts include the benign 1-row
    // BroadcastNestedLoopJoin frames and are listed for eyeballing.
    sb.append("\n## Audit summary (generated)\n\n")
    sb.append(s"- queries planned: ${plans.size}; FAILED: ${failures.size}")
    sb.append(failures.keys.mkString(if (failures.isEmpty) "" else " (",
      ", ", if (failures.isEmpty) "" else ")"))
    sb.append("\n")
    val cartesian = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n }
    sb.append(s"- CartesianProduct: ${cartesian.size}")
    sb.append(cartesian.mkString(if (cartesian.isEmpty) "" else " (",
      ", ", if (cartesian.isEmpty) "" else ")"))
    sb.append("\n")
    def count(p: String, op: String): Int = op.r.findAllMatchIn(p).size
    val rows = plans.toSeq.map { case (n, p) =>
      // Word-boundary anchor: bare "Exchange" would also match
      // BroadcastExchange / ReusedExchange nodes (ADVICE r7), inflating
      // the shuffle column — only the shuffle Exchange operator counts.
      (n, count(p, "(?<![A-Za-z])Exchange"), count(p, "SortMergeJoin"),
        count(p, "BroadcastHashJoin"), count(p, "BroadcastNestedLoopJoin"))
    }
    sb.append("- top plans by shuffle Exchange count (printed-plan nodes; " +
      "BSP loops print their full nested lineage but execute per-round " +
      "against persisted frames):\n\n")
    sb.append("| query | Exchange | SMJ | BHJ | BNLJ |\n|---|---|---|---|---|\n")
    rows.sortBy(-_._2).take(12).foreach { case (n, e, s, b, c) =>
      sb.append(s"| $n | $e | $s | $b | $c |\n")
    }
    failures.foreach { case (name, msg) =>
      sb.append(s"\n## $name\n\nFAILED: $msg\n")
    }
    plans.foreach { case (name, plan) =>
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"wrote $outFile")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
