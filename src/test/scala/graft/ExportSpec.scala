package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Export

/** Training-shard export contract (VERDICT r11 item 3): deterministic
  * contiguous shard assignment, a receiver-verifiable manifest, and the
  * write→read round trip for both shard formats.
  */
class ExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // A produced-corpus-shaped frame: dense 1-based positions in a
  // scrambled physical order (the operator must not depend on row order).
  private def produced(n: Int) = {
    val rows = (1 to n).map { p =>
      (1000L + p * 7, s"src${p % 3}", 0.5 + (p % 5) / 10.0,
        p.toLong, 10L + p % 40, p.toLong / 3, (p % 3).toLong * 100)
    }
    new scala.util.Random(42).shuffle(rows)
      .toDF("doc_id", "source", "quality_score", "position", "n_tokens",
        "seq_id", "seq_offset")
  }

  test("shardAssign: contiguous position ranges, sizes differ by <= 1, " +
       "ids cover [0, nShards)") {
    val n = 103
    val nShards = 8
    val asg = Export.shardAssign(produced(n), nShards)
      .select("shard_id", "position").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(asg.map(_._1).toSet === (0L until nShards).toSet)
    val bySh = asg.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // contiguous: each shard's positions are a dense range, and ranges
    // chain in shard order
    var next = 1L
    (0L until nShards).foreach { sh =>
      val ps = bySh(sh)
      assert(ps.head === next, s"shard $sh starts at ${ps.head}")
      assert(ps.last - ps.head + 1 === ps.length, s"shard $sh has a gap")
      next = ps.last + 1
    }
    assert(next === n + 1)
    val sizes = bySh.values.map(_.length).toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
  }

  test("exportManifest is row-order insensitive and receiver-replayable " +
       "from the written shards") {
    val p = produced(60)
    val m1 = Export.exportManifest(p, 4).collect().map(_.toSeq)
    val m2 = Export.exportManifest(p.orderBy(desc("doc_id")), 4)
      .collect().map(_.toSeq)
    assert(m1.toSeq === m2.toSeq)

    val dir = java.nio.file.Files.createTempDirectory("graft_export")
    try {
      val manifest = Export.writeShards(p, 4, dir.toString)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
      // Receiver side: recompute count/tokens/checksum from the WRITTEN
      // parquet shards (any physical order) and compare to the manifest.
      // partition-column type inference may narrow shard_id to int on
      // read — normalize back to the manifest's long
      val back = spark.read.parquet(s"$dir/shards")
        .withColumn("shard_id", col("shard_id").cast("long"))
      val recomputed = back
        .select(col("shard_id"), col("n_tokens"),
          conv(substring(md5(concat_ws("|",
              col("doc_id"), col("source"), col("position"),
              col("n_tokens"), col("seq_id"), col("seq_offset"))),
            1, 15), 16, 10).cast("long").as("_h"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"),
          expr("bit_xor(_h)").as("c"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(recomputed === manifest)
    } finally EntryHelpers.deleteTree(dir)
  }

  test("writeShards round trip: parquet shards reassemble the produced " +
       "corpus exactly; JSONL shards parse back to the same rows") {
    val p = produced(60)
    val dir = java.nio.file.Files.createTempDirectory("graft_export_rt")
    try {
      Export.writeShards(p, 4, dir.toString)
      val want = p.orderBy("position").collect().map(_.toSeq).toSeq

      val backPq = spark.read.parquet(s"$dir/shards")
        .select("doc_id", "source", "quality_score", "position",
          "n_tokens", "seq_id", "seq_offset")
        .orderBy("position").collect().map(_.toSeq).toSeq
      assert(backPq === want)

      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("quality_score",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("position",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_tokens",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seq_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("seq_offset",
          org.apache.spark.sql.types.LongType)))
      // json partition discovery appends shard_id — project it away
      val backJs = spark.read.schema(sch).json(s"$dir/shards_jsonl")
        .select("doc_id", "source", "quality_score", "position",
          "n_tokens", "seq_id", "seq_offset")
        .orderBy("position").collect().map(_.toSeq).toSeq
      assert(backJs === want)

      // each parquet shard dir holds a position-sorted run
      val oneShard = spark.read.parquet(s"$dir/shards")
        .where(col("shard_id") === 0).select("position")
        .collect().map(_.getLong(0)).toSeq
      assert(oneShard === oneShard.sorted)
    } finally EntryHelpers.deleteTree(dir)
  }

  test("runsPerShard > 1: manifest and read-back rows are IDENTICAL to " +
       "the single-run form; each file is a contiguous position run") {
    val p = produced(120)
    val dir1 = java.nio.file.Files.createTempDirectory("graft_export_r1")
    val dirK = java.nio.file.Files.createTempDirectory("graft_export_rk")
    try {
      val m1 = Export.writeShards(p, 4, dir1.toString)
        .collect().map(_.toSeq).toSeq
      val mK = Export.writeShards(p, 4, dirK.toString, runsPerShard = 3)
        .collect().map(_.toSeq).toSeq
      assert(mK === m1)
      val want = p.orderBy("position").collect().map(_.toSeq).toSeq
      val backK = spark.read.parquet(s"$dirK/shards")
        .select("doc_id", "source", "quality_score", "position",
          "n_tokens", "seq_id", "seq_offset")
        .orderBy("position").collect().map(_.toSeq).toSeq
      assert(backK === want)
      // per-FILE contract: every written file is a sorted contiguous
      // position run (the receiver can stream file runs in order)
      import org.apache.spark.sql.functions.input_file_name
      val files = spark.read.parquet(s"$dirK/shards")
        .select(input_file_name().as("f"), col("position"))
        .collect().groupBy(_.getString(0))
        .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
      files.foreach { case (f, ps) =>
        assert(ps.last - ps.head + 1 === ps.length,
          s"file $f is not a contiguous run")
      }
      // and the parallelism is real: more files than shards
      assert(files.size > 4, s"expected >4 files, got ${files.size}")
    } finally {
      EntryHelpers.deleteTree(dir1)
      EntryHelpers.deleteTree(dirK)
    }
  }
}
