package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Epoch, TextOps}

/** Pins the epoch-advance contract (graft.operators.Epoch) properties
  * that the `incremental_production` oracle cannot state directly:
  * epoch-1 immutability, dense position extension, the pack-extension
  * identity, and the existing-wins dedup rule.
  */
class EpochSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val base = EntryHelpers.epochVersion(spark, sfDir)
  private lazy val batch = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .where(col("doc_id") % 2 === 1)
  private lazy val advanced =
    Epoch.advance(batch, base)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  test("epoch-1 rows ship VERBATIM: the epoch=1 slice equals the " +
       "corpus version's produced table, column for column") {
    val cols = Seq("doc_id", "source", "quality_score", "position",
      "n_tokens", "seq_id", "seq_offset")
    val e1 = advanced.where(col("epoch") === 1)
      .select(cols.head, cols.tail: _*)
    val want = base.produced.select(cols.head, cols.tail: _*)
    assert(e1.exceptAll(want).count() === 0)
    assert(want.exceptAll(e1).count() === 0)
  }

  test("positions stay DENSE across the epoch boundary: 1..N total, " +
       "every epoch-2 position after every epoch-1 position") {
    val n = advanced.count()
    val stats = advanced.agg(min("position"), max("position"),
      countDistinct("position")).head()
    assert(stats.getLong(0) === 1L)
    assert(stats.getLong(1) === n)
    assert(stats.getLong(2) === n)
    val n1 = advanced.where(col("epoch") === 1).count()
    assert(advanced.where(col("epoch") === 2 && col("position") <= n1)
      .count() === 0)
    // the advance admitted a real batch (the split plants survivors)
    assert(advanced.where(col("epoch") === 2).count() > 0)
  }

  test("PACK EXTENSION identity: re-packing the concatenated " +
       "(position, n_tokens) stream from scratch reproduces every " +
       "epoch-1 AND epoch-2 sequence slot bit-for-bit") {
    val repacked = TextOps.packSequencesByLen(
        advanced.select(col("position").as("doc_id"), col("n_tokens")))
      .select(col("doc_id").as("position"),
        col("seq_id").as("_sid"), col("seq_offset").as("_soff"))
    val joined = advanced.join(repacked, Seq("position"))
    assert(joined.where(col("seq_id") =!= col("_sid") ||
      col("seq_offset") =!= col("_soff")).count() === 0)
    assert(joined.count() === advanced.count())
  }

  test("EXISTING WINS: no admitted batch doc shares a union near-dup " +
       "cluster with any existing-corpus doc") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val clusters = Dedup.connectedComponents(
      Dedup.nearDupPairs(d).select("doc_a", "doc_b"), d.select("doc_id"))
    val withBase = clusters.join(
        d.where(col("doc_id") % 2 === 0).select("doc_id"), Seq("doc_id"))
      .select("cluster").distinct()
    val offenders = advanced.where(col("epoch") === 2)
      .select("doc_id").join(clusters, Seq("doc_id"))
      .join(withBase, Seq("cluster"))
    assert(offenders.count() === 0)
    spark.catalog.clearCache()
  }
}
