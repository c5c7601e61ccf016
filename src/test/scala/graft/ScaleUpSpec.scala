package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-amplifier's anti-aliasing contract under STACKED
  * amplification — the property whose violation round 8's fifth-decade
  * measurement surfaced: with replica 0 left verbatim, gen-2 replica j
  * of a gen-1 replica-0 doc ("r<j>" + raw) was byte-identical to gen-2
  * replica 0's copy of the gen-1 replica-j doc, planting factor²-growing
  * exact-duplicate pairs that read as superlinear near-dup growth. Every
  * replica now gets its own salt layer, so duplicate DENSITY must stay
  * exactly linear across generations.
  *
  * Embeddings pin the analogous contract caught one measurement later:
  * the affine perturbation that replaced the (commuting, aliasing)
  * additive one left cross-replica same-base cosine at 0.91–0.94 —
  * above the 0.9 near-dup threshold — so amplified corpora grew
  * factor-sized spurious near-dup families and pair-query cost grew
  * quadratically in the factor. The map is now a per-replica SIGNED
  * PERMUTATION: exactly orthogonal (within-replica neighbor structure
  * preserved, absolute thresholds included), cross-replica cosine ~0,
  * and non-commutative composition under stacking (no aliasing).
  */
class ScaleUpSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("stacked amplification keeps duplicate density exactly linear") {
    val src = Files.createTempDirectory("graft_su_src").toString
    val g1 = Files.createTempDirectory("graft_su_g1").toString
    val g2 = Files.createTempDirectory("graft_su_g2").toString
    // 6 docs, ONE exact-duplicate pair (ids 0/1) — source dup count 1.
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      (1L, "alpha beta gamma delta epsilon zeta", "en", "web"),
      (2L, "alpha beta gamma delta epsilon eta", "en", "web"),
      (3L, "totally different words one two three", "en", "book"),
      (4L, "yet another unrelated document body here", "en", "book"),
      (5L, "final text with its own token stream", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    // 16-dim unit-ish vectors: 0/1 a true near-dup pair (cos ≈ 0.995),
    // 2/3 unrelated — enough width that the signed-permutation images
    // separate (at dim 3 two of 48 possible maps colliding by chance
    // would make the cross-replica assertion fixture-fragile).
    def vec(seed: Int): Array[Float] = {
      val v = Array.tabulate(16)(i =>
        math.sin(seed * 97 + i * 13 + 1).toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val v0 = vec(1)
    val v1 = v0.zipWithIndex.map { case (x, i) =>
      if (i == 0) x + 0.1f else x }  // near-dup of v0
    Seq((0L, v0, 0), (1L, v1, 0), (2L, vec(2), 1), (3L, vec(3), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$src/embeddings.parquet")

    val only = Some(Set("documents", "embeddings"))
    ScaleUp.amplify(spark, src, g1, 3, only)
    ScaleUp.amplify(spark, g1, g2, 3, only)

    val d2 = spark.read.parquet(s"$g2/documents.parquet")
    assert(d2.count() === 54)  // 6 × 3 × 3
    // Duplicate density linear: the single source dup pair appears once
    // per (gen1 replica × gen2 replica) = 9 dups, and NOTHING else
    // collides — with verbatim replica 0 this read 45 − alias count.
    assert(d2.select("text").distinct().count() === 45)
    // Every (gen2 replica) block is a bijection of gen1: 15 distinct
    // texts each (6 × 3 = 18 gen1 docs minus 3 gen1-internal dups).
    val perRep = d2.withColumn("rep", floor(col("doc_id") / 18))
      .groupBy("rep").agg(countDistinct("text").as("u"))
      .collect().map(_.getAs[Long]("u")).toSeq
    assert(perRep === Seq(15L, 15L, 15L))
    // doc_id space stays dense and disjoint.
    assert(d2.agg(countDistinct("doc_id")).head.getLong(0) === 54)

    // Embeddings: 4 × 9 vectors, all pairwise distinct — stacked signed
    // permutations must not alias.
    val e2 = spark.read.parquet(s"$g2/embeddings.parquet")
    assert(e2.count() === 36)
    assert(e2.select("embedding").distinct().count() === 36)

    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / math.sqrt(ad.map(x => x * x).sum * bd.map(x => x * x).sum)
    }
    val byId = e2.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val srcCos01 = cos(v0, v1)
    // 9 gen2 replicas of base ids 0 and 1 at (4k, 4k+1), k = 0..8.
    val repIds = (0 until 9).map(k => (k * 4L, k * 4L + 1))
    // Within-replica: the near-dup pair's cosine is preserved through
    // BOTH generations' maps (orthogonality — same product multiset, so
    // only float summation order can move it).
    repIds.foreach { case (a, b) =>
      assert(math.abs(cos(byId(a), byId(b)) - srcCos01) < 1e-6,
        s"within-replica cosine drifted for pair ($a, $b)")
    }
    // Cross-replica: every same-base pair must sit WELL under the 0.9
    // near-dup threshold — the affine map's failure mode (0.91–0.94).
    val bases = repIds.map(_._1).map(byId)
    for (i <- bases.indices; j <- bases.indices if i < j) {
      val c = math.abs(cos(bases(i), bases(j)))
      assert(c < 0.8, s"cross-replica same-base |cosine| $c for ($i, $j)")
    }
  }

  test("amplified documents keep their function-word skeleton: lang-id " +
       "and stopword signals survive, content tokens stay salted") {
    val src = Files.createTempDirectory("graft_su_fw_src").toString
    val out = Files.createTempDirectory("graft_su_fw_out").toString
    val docs = Seq(
      (0L, "the cat is in a hat and the dog", "en", "s0"),
      (10L, "der hund ist mit der katze und ein vogel", "de", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.parquet(s"$src/documents.parquet")
    ScaleUp.amplify(spark, src, out, factor = 3,
      tables = Some(Set("documents")))
    val amp = spark.read.parquet(s"$out/documents.parquet")
    assert(amp.count() === 6L)
    // lang-id must still resolve on every replica (round-10 fix: the
    // all-token salt made every amplified doc 'unknown' and the
    // curation family measured empty pipelines at sf >= 1)
    val langs = graft.operators.TextOps.langIdAgg(amp)
      .select("pred_lang").collect().map(_.getString(0))
    assert(langs.count(_ == "en") === 3)
    assert(langs.count(_ == "de") === 3)
    // content tokens of distinct replicas must stay disjoint (the
    // anti-aliasing contract is untouched for non-function words)
    val toks = amp.select(explode(split(col("text"), " ")).as("t"))
      .where(!col("t").isin(ScaleUp.FunctionWords: _*))
      .select("t").distinct().collect().map(_.getString(0))
    assert(toks.forall(t => t.startsWith("r0") || t.startsWith("r1") ||
      t.startsWith("r2")))
  }

  test("signedPerm: non-identity, distinct, non-commuting") {
    val dim = 64
    val maps = (0 until 20).map(r => ScaleUp.signedPerm(r, dim))
    maps.zipWithIndex.foreach { case ((p, s), r) =>
      assert(!(p.zipWithIndex.forall { case (x, i) => x == i } &&
               s.forall(_ > 0f)), s"replica $r drew the identity map")
      assert(p.sorted.sameElements(Array.tabulate(dim)(identity)),
        s"replica $r is not a permutation")
      assert(s.forall(x => x == 1.0f || x == -1.0f))
    }
    assert(maps.map { case (p, s) =>
      (p.toSeq, s.toSeq) }.distinct.size === 20)
    // Composition order matters (the stacking-alias guard): applying
    // map0 then map1 differs from map1 then map0 on a probe vector.
    def apply(m: (Array[Int], Array[Float]), v: Array[Float]) =
      Array.tabulate(dim)(i => m._2(i) * v(m._1(i)))
    val probe = Array.tabulate(dim)(i => (i + 1).toFloat)
    val a = apply(maps(1), apply(maps(0), probe))
    val b = apply(maps(0), apply(maps(1), probe))
    assert(!a.sameElements(b))
  }
}
