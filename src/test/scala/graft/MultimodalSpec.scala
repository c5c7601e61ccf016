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
