package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("synthesize: deterministic distributed assets with typed metadata") {
    val a1 = Multimodal.synthesize(spark, 30).collect()
      .sortBy(_.getLong(0))
    val a2 = Multimodal.synthesize(spark, 30).collect()
      .sortBy(_.getLong(0))
    assert(a1.length === 30)
    assert(a1.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq ===
           a2.map(_.getAs[Array[Byte]]("bytes").toSeq).toSeq)
    val mods = a1.map(_.getString(1)).toSet
    assert(mods === Set("image", "audio", "video"))
    val meta = a1.head.getStruct(3)
    assert(meta.getInt(0) >= 64)  // width
  }

  test("perceptualHash: mean-threshold bits packed MSB-first into two " +
       "non-negative halves") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // Pixels 0–31 bright (200), 32–63 dark (10): mean = 105, so exactly
    // the first half is set → hash_hi all-ones 32 bits, hash_lo zero.
    val bytes = (Array.fill(32)(200.toByte) ++ Array.fill(32)(10.toByte))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, bytes)),
      StructType(Seq(StructField("asset_id", LongType, false),
        StructField("bytes", BinaryType))))
    val h = Multimodal.perceptualHash(df).collect().head
    assert(h.getAs[Long]("hash_hi") === 0xFFFFFFFFL)
    assert(h.getAs[Long]("hash_lo") === 0L)
  }

  test("corruptCopies: every 5th asset re-appears offset with exactly " +
       "byte 7's top bit flipped") {
    val base = Multimodal.synthesize(spark, 10, payloadBytes = 512)
    val copies = Multimodal.corruptCopies(base, idOffset = 10).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(copies.keySet === Set(10L, 15L))
    val orig = base.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    for ((id, b) <- copies; o = orig(id - 10)) {
      assert(b(7) === (o(7) ^ 0x80).toByte)
      assert(b.indices.filter(i => b(i) != o(i)) === Seq(7))
    }
  }

  test("phashPairs: identical hashes at hamming 0, one-bit neighbors " +
       "found via the surviving bands, unrelated hashes absent") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("asset_id", LongType, false),
      StructField("hash_hi", LongType, false),
      StructField("hash_lo", LongType, false)))
    val h1 = 0x00010002L; val l1 = 0x00030004L
    val rows = java.util.List.of(
      Row(1L, h1, l1), Row(2L, h1, l1),           // identical
      Row(3L, h1 ^ (1L << 30), l1),               // 1 bit off in band 0
      Row(4L, 0x7A5A0F0FL, 0x13371337L))          // unrelated, no band hit
    val pairs = Multimodal.phashPairs(
        spark.createDataFrame(rows, schema), maxHamming = 8)
      .orderBy("asset_a", "asset_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(pairs.toSeq === Seq((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("extractFeatures: per-partition histogram + entropy, full coverage") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesize(spark, 20))
      .collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.getAs[Long]("n_bytes") === 4096L)
      assert(f.getAs[Seq[Long]]("histogram").sum === 4096L) // all bytes binned
      val ent = f.getAs[Double]("byte_entropy")
      assert(ent > 3.5 && ent <= 4.0)           // ~uniform over 16 bins
      // the Q40 fixed-point entropy tracks the float one to < 2^-20
      val fp = f.getAs[Long]("entropy_fp").toDouble / (1L << 40)
      assert(math.abs(fp - ent) < 1e-6, s"fp=$fp float=$ent")
    }
  }

  test("log2Fp: exact on powers of two, Q40-close elsewhere, and the " +
       "fixed-point entropy of a uniform histogram is exactly its bits") {
    assert(Multimodal.log2Fp(1L) === 0L)
    assert(Multimodal.log2Fp(2L) === (1L << 40))
    assert(Multimodal.log2Fp(512L) === (9L << 40))
    for (v <- Seq(3L, 7L, 100L, 511L, 12345L)) {
      val fp = Multimodal.log2Fp(v).toDouble / (1L << 40)
      assert(math.abs(fp - math.log(v.toDouble) / math.log(2)) < 1e-9,
        s"v=$v fp=$fp")
    }
    // uniform 16-bin histogram over 512 observations → exactly 4 bits
    assert(Multimodal.entropyFp(Array.fill(16)(32L), 512L) === (4L << 40))
    // single-bin histogram → zero entropy
    assert(Multimodal.entropyFp(
      Array(512L) ++ Array.fill(15)(0L), 512L) === 0L)
  }

  test("log2Fp: Long-only kernel is bit-identical to the BigInt reference " +
       "across the full domain (the oracle replays THIS bit pattern)") {
    // the original BigInt square-and-shift, kept verbatim as the reference
    def ref(v: Long): Long = {
      val ip = 63 - java.lang.Long.numberOfLeadingZeros(v)
      var x = BigInt(v) << (60 - ip)
      val two = BigInt(1) << 61
      var frac = 0L
      var k = 0
      while (k < 40) {
        x = (x * x) >> 60
        frac <<= 1
        if (x >= two) { x >>= 1; frac |= 1L }
        k += 1
      }
      (ip.toLong << 40) | frac
    }
    for (v <- 1L to 65536L)
      assert(graft.functions.Log2Fp.compute(v) === ref(v), s"v=$v")
    val rnd = new scala.util.Random(40)
    // cover every bit position, incl. the ip > 60 right-shift branch
    for (bits <- 1 to 63; _ <- 1 to 8) {
      val v = (rnd.nextLong() >>> (64 - bits)) | (1L << (bits - 1))
      assert(graft.functions.Log2Fp.compute(v) === ref(v), s"v=$v")
    }
    for (v <- Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 62) + 3L,
        (1L << 61) - 1L, (1L << 60) + 1L))
      assert(graft.functions.Log2Fp.compute(v) === ref(v), s"v=$v")
  }

  test("sampleFrames: strided selection with binary slices") {
    val vids = Multimodal.synthesize(spark, 30)
    val frames = Multimodal.sampleFrames(vids, stride = 4, frameBytes = 64)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length == 64))
    val byAsset = frames.groupBy(_.getLong(0))
    byAsset.foreach { case (_, fs) =>
      val nos = fs.map(_.getAs[Int]("frame_no")).sorted
      assert(nos === nos.distinct)
      assert(nos.forall(_ % 4 == 0))            // stride respected
    }
  }

  test("resizeStub halves/quarters payloads deterministically") {
    val out = Multimodal.resizeStub(Multimodal.synthesize(spark, 5), 4)
      .collect()
    assert(out.forall(_.getAs[Array[Byte]]("bytes").length === 1024))
  }
}
