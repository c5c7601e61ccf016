package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities the flat reference never needed but a 100 TB
  * deployment does: skew-salted joins and bucketed (pre-shuffled) tables
  * for co-located joins. Both are plan-shape tools — the operator
  * semantics above them are unchanged.
  */
object Scale {

  /** Skew-salted inner equi-join: the fact side gets a random-but-
    * deterministic salt in [0, `salts`), the dimension side is replicated
    * `salts` times, and the join key becomes (key, salt) — so one hot key
    * spreads over `salts` reducers instead of melting a single task.
    *
    * Use when a handful of keys dominate (power-law joins) and the dim
    * side is too large to broadcast outright; AQE's skew-join handles
    * sort-merge cases, but salting also covers aggregations-after-join
    * and pre-AQE shuffles.
    *
    * The salt is `pmod(hash(fact rowid-ish cols), salts)` — deterministic
    * given the row, so retries/replays produce identical partitioning.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(fact.columns.toSeq.map(col): _*), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt"), "inner")
      .drop("_salt")
  }

  /** Write a table bucketed (and sorted) by `keys` into the session
    * catalog: a join of two tables bucketed the same way needs **no
    * shuffle at all** — the co-location was paid once at write time,
    * which is the right trade for fact-to-fact joins repeated across a
    * 100 TB pipeline's runs. Verified shuffle-free in ScaleSpec.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write a table with a pruning-friendly physical layout: hive-style
    * partition directories on `partitionCols` (so predicate on those
    * columns prunes whole directories at planning time) and a
    * `sortWithinPartitions` on `sortCols` (so parquet row-group min/max
    * stats skip pages within files). The once-at-write cost that makes
    * every later selective scan read a fraction of a 100 TB table.
    */
  def writeLayout(df: DataFrame, dir: String, partitionCols: Seq[String],
                  sortCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      // partitionCols lead the sort: the dynamic-partition writer requires
      // an ordering on them and would insert its own (order-scrambling)
      // sort otherwise, defeating the sortCols clustering
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(dir)

  /** Sketch-path incremental dedup — [[Dedup.incrementalDedup]] for the
    * corpus size where the exact fingerprint index no longer broadcasts:
    * the existing corpus' fingerprints fold into a Bloom filter (a fixed
    * ~1.2 bytes/key at 1% fpp — gigabytes where the index is hundreds of
    * gigabytes), incoming docs are pre-screened executor-side by the
    * codegen'd membership probe
    * ([[graft.functions.BloomMightContain]]), and ONLY the flagged
    * candidates pay the exact anti-join against the index.
    *
    * The composition is EXACT, not approximate: a Bloom filter has no
    * false negatives, so every truly-known fingerprint is flagged and
    * re-checked; a false positive merely sends a new doc through the
    * anti-join, which keeps it. Output rows are therefore identical to
    * [[Dedup.incrementalDedup]]'s for any (expectedItems, fpp) — asserted
    * in ScaleSpec and oracle-checked against the same SQL.
    *
    * Building the filter is one distributed aggregate over the existing
    * side (`stat.bloomFilter` merges per-partition filters) — the
    * once-per-corpus-version index-build job, like k-means training.
    */
  def bloomIncrementalDedup(incoming: DataFrame, existing: DataFrame,
                            key: Column => Column = TextOps.fingerprint,
                            expectedItems: Long = 1L << 20,
                            fpp: Double = 0.01,
                            textCol: String = "text"): DataFrame = {
    val exFp = existing.select(key(col(textCol)).as("fingerprint"))
    val bf = exFp.stat.bloomFilter("fingerprint", expectedItems, fpp)
    val incFp = incoming.select(key(col(textCol)).as("fingerprint"),
      col("doc_id"))
    // A null fingerprint (null text) probes to null; coalesce routes it
    // to the candidate path, where the anti-join keeps it (null never
    // equals a key) — exactly what the exact path does, preserving the
    // identical-output guarantee on corpora with null texts.
    val maybeKnown = coalesce(
      graft.functions.BloomMightContain.mightContain(bf, col("fingerprint")),
      lit(true))
    val surelyNew = incFp.where(!maybeKnown)
    val candidates = incFp.where(maybeKnown)
      .join(exFp.distinct(), Seq("fingerprint"), "left_anti")
    surelyNew.unionAll(candidates)
      .groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
  }

  /** Join-key skew diagnostics — the measurement that decides whether a
    * key needs [[saltedJoin]] before the job melts a reducer: per-key row
    * counts for the `topK` heaviest keys plus each key's share of the
    * table and its ratio over the mean key load. One hash aggregate on
    * the key (the same shuffle the join itself would do), then a
    * broadcast of the 2-row global stats — nothing here is driver-side.
    */
  def keySkewStats(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum("n").as("_total"),
      count(lit(1)).as("_nkeys"))
    counts.crossJoin(broadcast(totals))
      .select(col(key), col("n"),
        (col("n").cast("double") / col("_total")).as("share"),
        (col("n").cast("double") * col("_nkeys") / col("_total"))
          .as("skew_ratio"))
      .orderBy(desc("n"), col(key))
      .limit(topK)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Number of files the scan of `df` will actually read after partition
    * pruning — the observable data-skipping effect of [[writeLayout]].
    * Descends into AQE-wrapped plans (AdaptiveSparkPlanExec is a leaf of
    * the outer plan, so a plain collectLeaves would find no scans).
    */
  def scannedFiles(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        (other.children ++ other.subqueries).flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.selectedPartitions.totalNumberOfFiles).sum
  }
}
