package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

class ScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows under skew") {
    // 90% of fact rows hit one hot key
    val fact = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", s"payload$i")
    }.toDF("key", "payload")
    val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
      .map(k => (k, s"dim-$k")).toDF("key", "dim_value")

    val plain = fact.join(dim, Seq("key")).orderBy("payload")
      .collect().map(_.toSeq)
    val salted = Scale.saltedJoin(fact, dim, "key").orderBy("payload")
      .select("key", "payload", "dim_value")
      .collect().map(_.toSeq)
    assert(salted.toSeq === plain.toSeq)
    // and the salt actually spreads the hot key over multiple values
    val spread = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col): _*), lit(8)))
      .where($"key" === "hot").select("_salt").distinct().count()
    assert(spread > 1)
  }

  test("bloomIncrementalDedup matches the exact anti-join composition") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val incoming = docs.where($"doc_id" % 2 === 1)
    val existing = docs.where($"doc_id" % 2 === 0)
    val key = (t: org.apache.spark.sql.Column) =>
      md5(substring(lower(t), 1, 64))
    val exact = Dedup.incrementalDedup(incoming, existing, key)
      .orderBy("fingerprint").collect().map(_.toSeq)
    // Tiny filter (high collision pressure) and roomy filter must BOTH
    // reproduce the exact rows — false positives only re-route docs
    // through the anti-join, never change the result.
    for (items <- Seq(64L, 1L << 20)) {
      val sketch = Scale.bloomIncrementalDedup(incoming, existing, key,
          expectedItems = items)
        .orderBy("fingerprint").collect().map(_.toSeq)
      assert(sketch.toSeq === exact.toSeq, s"expectedItems=$items")
    }
    // and the membership probe itself never false-negatives: every
    // existing fingerprint must be flagged by the filter.
    val exFp = existing.select(key($"text").as("fingerprint"))
    val bf = exFp.stat.bloomFilter("fingerprint", 1L << 20, 0.01)
    val misses = exFp.where(
      !graft.functions.BloomMightContain.mightContain(bf, $"fingerprint"))
      .count()
    assert(misses === 0L)
  }

  test("rangeBounds: equi-depth buckets on a uniform column, depths " +
       "within one row, ranges non-overlapping and ordered") {
    val d = (1 to 64).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Scale.rangeBounds(d, "v", buckets = 4).orderBy("bucket")
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    // 64 uniform rows into 4 buckets: exactly 16 each; contiguous ranges.
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).toSeq === Seq(16L, 16L, 16L, 16L))
    assert(out.sliding(2).forall { case Array(a, b) => a._4 < b._3 })
  }

  test("columnStats: one-pass nulls/ndv/min-max, numeric-only ranges, " +
       "timestamps as epoch millis") {
    val d = Seq(
      (1L, Some(2.5), "x", new java.sql.Timestamp(1000L)),
      (2L, None, "y", new java.sql.Timestamp(5000L)),
      (3L, Some(7.5), "x", new java.sql.Timestamp(3000L)))
      .toDF("id", "v", "s", "ts")
    val out = Scale.columnStats(d).orderBy("column_name").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_nulls"),
        r.getAs[Long]("ndv"), Option(r.getAs[java.lang.Double]("min_num")),
        Option(r.getAs[java.lang.Double]("max_num"))))
    assert(out.toSeq === Seq(
      ("id", 0L, 3L, Some(1.0), Some(3.0)),
      ("s", 0L, 2L, None, None),
      ("ts", 0L, 3L, Some(1000.0), Some(5000.0)),
      ("v", 1L, 2L, Some(2.5), Some(7.5))))
  }

  test("columnStatsApprox: exact nulls/min/max, HLL ndv within " +
       "rsd-scaled error of the exact twin, NO expand in the plan") {
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = Scale.columnStats(lineitem).collect()
      .map(r => r.getString(0) -> r).toMap
    val rsd = 0.02
    val approx = Scale.columnStatsApprox(lineitem, rsd).collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val e = exact(r.getString(0))
      // nulls and ranges are exact — identical to the exact twin
      assert(r.getAs[Long]("n_nulls") === e.getAs[Long]("n_nulls"))
      assert(Option(r.getAs[java.lang.Double]("min_num")) ===
        Option(e.getAs[java.lang.Double]("min_num")))
      assert(Option(r.getAs[java.lang.Double]("max_num")) ===
        Option(e.getAs[java.lang.Double]("max_num")))
      // HLL++ at rsd=0.02: 6 standard errors is a generous determinism
      // bound (the estimate is deterministic; the bound documents it)
      val ndv = e.getAs[Long]("ndv").toDouble
      val est = r.getAs[Long]("ndv_approx").toDouble
      assert(math.abs(est - ndv) <= math.max(1.0, 6 * rsd * ndv),
        s"${r.getString(0)}: est=$est exact=$ndv")
    }
    // The scale contract: the approx plan must NOT carry the expand
    // node the exact form's COUNT(DISTINCT)s require.
    val planned = Scale.columnStatsApprox(lineitem, rsd)
      .queryExecution.executedPlan.toString
    assert(!planned.contains("Expand"),
      "approx column stats must plan without an expand node")
    // (The exact twin's round-13 per-column form plans WITHOUT expand
    // too — its distinct counts ride per-column dedupe aggregates; the
    // contrast pinned here is sketch-vs-exact values, not plan shape.)
    assert(!Scale.columnStats(lineitem)
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact per-column form plans without an expand node")
  }

  test("paretoFront2D: non-dominated points only, coincident points " +
       "tie and both survive via the count") {
    // Points: (y=3,x=1) front; (3,1) duplicate (same point — counts 2);
    // (2,5) front; (2,4) dominated by (2,5); (1,5) dominated by (2,5);
    // (1,9) front.
    val pts = Seq((10L, 1L, 3.0), (11L, 1L, 3.0), (12L, 5L, 2.0),
      (13L, 4L, 2.0), (14L, 5L, 1.0), (15L, 9L, 1.0))
      .toDF("doc_id", "x", "y")
    val out = Scale.paretoFront2D(pts, "doc_id", "x", "y", partitions = 3)
      .orderBy(desc("y"), asc("x")).collect()
      .map(r => (r.getAs[Double]("y"), r.getAs[Long]("x"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_doc_id")))
    assert(out.toSeq === Seq((3.0, 1L, 2L, 10L), (2.0, 5L, 1L, 12L),
      (1.0, 9L, 1L, 15L)))
  }

  test("writeLayout: partition pruning reads only the predicate's files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout")
      .resolve("docs").toString
    val df = (0 until 1000).map { i =>
      (i.toLong, Seq("en", "de", "fr", "es")(i % 4), s"text $i")
    }.toDF("doc_id", "lang", "text")
    Scale.writeLayout(df, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"))

    val all = spark.read.parquet(dir)
    val pruned = all.where($"lang" === "en")
    assert(pruned.count() === 250)
    val prunedFiles = Scale.scannedFiles(pruned)
    val totalFiles = Scale.scannedFiles(all)
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"expected pruning: $prunedFiles of $totalFiles files")
    // the partition predicate must be resolved at planning, not as a
    // post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("BitInterleave matches the reference interleave and z-order " +
       "layout clusters BOTH dimensions; a single-column sort leaves " +
       "the other dimension scattered across every file") {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    def ref(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L)((z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    // exact interleave vs reference on assorted values
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L),
      (21L, 42L), (1048575L, 524287L))
    val got = samples.toDF("a", "b")
      .select(graft.functions.BitInterleave(col("a"), col("b"), 21))
      .collect().map(_.getLong(0))
    assert(got.toSeq === samples.map { case (a, b) => ref(a, b, 21) })

    // 64×64 grid, 16 files of 256 rows: Morton blocks of 256 aligned
    // values are exact 16×16 tiles, so BOTH per-file ranges are 15;
    // sorting by `a` alone leaves `b`'s per-file range at the full 63.
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    def fileRanges(dir: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val base = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zDir = base.resolve("z").toString
    grid.withColumn("z", graft.functions.BitInterleave(col("a"), col("b"), 6))
      .repartition(1).sortWithinPartitions("z").drop("z")
      .write.option("maxRecordsPerFile", 256).parquet(zDir)
    val zRanges = fileRanges(zDir)
    assert(zRanges.size === 16)
    assert(zRanges.forall { case (ra, rb) => ra <= 15 && rb <= 15 },
      s"z-order file ranges not tile-bounded: $zRanges")
    val aDir = base.resolve("a").toString
    grid.repartition(1).sortWithinPartitions("a", "b")
      .write.option("maxRecordsPerFile", 256).parquet(aDir)
    val aRanges = fileRanges(aDir)
    assert(aRanges.forall { case (ra, _) => ra <= 15 })       // a clusters
    assert(aRanges.forall { case (_, rb) => rb === 63L },     // b scattered
      s"expected full-range b under single-col sort: $aRanges")
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val left = (0 until 1000).map(i => (i.toLong, s"l$i"))
      .toDF("k", "lv")
    val right = (0 until 1000).map(i => (i.toLong, s"r$i"))
      .toDF("k", "rv")
    Scale.writeBucketed(left, "bucketed_left", Seq("k"), 4)
    Scale.writeBucketed(right, "bucketed_right", Seq("k"), 4)
    // Disable broadcast: with a tiny table the planner would broadcast
    // (an Exchange) and never exercise the bucketing; the property under
    // test is the big-big case where bucketing is the only shuffle-free
    // plan.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_left")
        .join(spark.table("bucketed_right"), Seq("k"))
      assert(joined.count() === 1000)
      assert(Scale.isShuffleFree(joined),
        s"expected shuffle-free bucketed join:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
      // contrast: the same join on plain (unbucketed) frames must shuffle
      val plain = left.join(right, Seq("k"))
      assert(!Scale.isShuffleFree(plain))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact: coalesce mode collapses small files without a shuffle, " +
       "shuffle mode balances; content identical in both") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // A streaming-sink-shaped landing: 64 tiny part files.
    docs.repartition(64).write.parquet(s"$dir/src")

    val (before, after) = Scale.compact(spark, s"$dir/src", s"$dir/dst",
      targetFileBytes = 1L << 20)
    assert(before === 64L)
    assert(after < 8L)
    val back = spark.read.parquet(s"$dir/dst")
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
    // coalesce mode: no Exchange in the write plan's lineage.
    assert(Scale.isShuffleFree(
      spark.read.parquet(s"$dir/src").coalesce(2)))

    val (_, afterSh) = Scale.compact(spark, s"$dir/src", s"$dir/dst2",
      targetFileBytes = 1L << 20, shuffle = true)
    assert(afterSh < 8L)
    val backSh = spark.read.parquet(s"$dir/dst2")
    assert(backSh.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(backSh).count() === 0)
  }
}
