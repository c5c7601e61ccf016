package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f, 0.0f), 0),    // identical to query
    (2L, Array(0.9f, 0.1f, 0.0f), 0),    // close
    (3L, Array(0.0f, 1.0f, 0.0f), 1),    // orthogonal
    (4L, Array(-1.0f, 0.0f, 0.0f), 1))   // opposite
    .toDF("vec_id", "embedding", "label")

  test("topK: exact cosine ordering against the query vector") {
    val out = Similarity.topK(vecs, queryId = 0L, k = 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(out(0)._2 === 1.0)
    assert(out(2)._2 === 0.0)
    assert(out(3)._2 === -1.0)
  }

  test("recallAtK: self-recall is 1, disjoint is 0, partial is exact") {
    val exact = Similarity.topK(vecs, queryId = 0L, k = 4)
    val self = Similarity.recallAtK(exact, exact, k = 4).collect()(0)
    assert(self.getAs[Long]("k") === 4L)
    assert(self.getAs[Long]("n_hits") === 4L)
    assert(self.getAs[Double]("recall") === 1.0)
    val disjoint = Seq(99L, 98L).toDF("vec_id")
    assert(Similarity.recallAtK(exact, disjoint, k = 4).collect()(0)
      .getAs[Double]("recall") === 0.0)
    val half = Seq(1L, 2L, 99L, 98L).toDF("vec_id")
    assert(Similarity.recallAtK(exact, half, k = 4).collect()(0)
      .getAs[Double]("recall") === 0.5)
  }

  test("lshNearDupPairs catches identical vectors, skips opposites") {
    val pairs = Similarity.lshNearDupPairs(vecs, threshold = 0.95)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 === 4L && p._1 === 0L))
  }

  test("lshTopKJoin: per-query k-cut, query/corpus split, exact sims") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.lshTopKJoin(emb, nQueries = 5, k = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
                 r.getAs[Double]("sim")))
    assert(out.nonEmpty)
    assert(out.forall(_._1 < 5) && out.forall(_._2 >= 5))
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
    // every reported sim equals the brute-force 6dp-rounded cosine
    val byId = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    out.foreach { case (q, c, sim) =>
      val expect = BigDecimal(cos(byId(q), byId(c)))
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(sim === expect, s"pair ($q,$c)")
    }
  }

  test("lshTopK retrieves planted high-cosine neighbors from real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // Plant 5 slightly-perturbed copies of the query vector: cosine ≈ 1,
    // which is the regime LSH bucketing is built for. (Unperturbed random
    // 64-dim vectors have near-zero pairwise cosine — nothing to recall.)
    val q = emb.where($"vec_id" === 0L).head()
      .getSeq[Float](1).toArray
    val planted = (1 to 5).map { i =>
      val v = q.zipWithIndex.map { case (x, j) =>
        x * (1.0f + 0.01f * ((i + j) % 3)) }
      (10000L + i, v, 9)
    }.toDF("vec_id", "embedding", "label")
    val all = emb.unionByName(planted)

    val exact = Similarity.topK(all, queryId = 0L, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(exact === (1 to 5).map(10000L + _).toSet) // sanity: they are top-5

    val approx = Similarity.lshTopK(all, queryId = 0L, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low (got $approx)")

    val ivf = Similarity.ivfTopK(all, queryId = 0L, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(ivfRecall >= 0.6, s"IVF recall $ivfRecall too low (got $ivf)")

    // Multi-probe probes a superset of the single-probe buckets, so its
    // candidate set — and recall — can only grow.
    val mp = Similarity.lshTopKMultiProbe(all, queryId = 0L, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val mpRecall = (exact & mp).size.toDouble / exact.size
    assert(mpRecall >= recall,
      s"multi-probe recall $mpRecall below single-probe $recall")

    // A trained codebook must not lose the planted neighbors either.
    val cb = Similarity.kmeansCodebook(all, nCells = 8, iters = 2)
    assert(cb.length === 8)
    val ivfKm = Similarity.ivfTopK(all, queryId = 0L, k = 5, nCells = 8,
        codebook = Some(cb)).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val kmRecall = (exact & ivfKm).size.toDouble / exact.size
    assert(kmRecall >= 0.6, s"k-means IVF recall $kmRecall (got $ivfKm)")
  }

  test("lshNearDupPairsFromVecs recovers planted perturbed pairs") {
    // Same planting as SparkEntry's embedding_neardup_lsh query: first 8
    // vectors get a copy with +0.01 on the first component (cosine ≈ 1).
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val planted = base.where(col("vec_id") < 8)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.01)),
          slice(col("v"), 2, 63)).as("v"))
    val pairs = Similarity.lshNearDupPairsFromVecs(
        base.unionAll(planted), threshold = 0.9, dim = 64)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
                 r.getAs[Double]("sim")))
    val plantedPairs = pairs.filter { case (a, b, _) =>
      b === a + 10000000L }
    // Each planted pair survives banding unless a sign-projection margin
    // splits it in all 3 tables — allow at most 2 of 8 such losses.
    assert(plantedPairs.length >= 6,
      s"only ${plantedPairs.length} planted pairs recovered")
    plantedPairs.foreach { case (_, _, sim) => assert(sim >= 0.999) }
  }

  test("semanticDedupPairs finds planted pairs within cells only") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val planted = base.where(col("vec_id") < 8)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.01)),
          slice(col("v"), 2, 63)).as("v"))
    val cb = Similarity.kmeansCodebook(emb, nCells = 16, iters = 2)
    val pairs = Similarity.semanticDedupPairs(
        base.unionAll(planted), cb, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
                 r.getAs[Double]("sim")))
    // A perturbed copy is cosine ≈ 0.9998 to its source, so both land in
    // the same cell (the argmax is continuous in v) — all 8 pairs found.
    val plantedPairs = pairs.filter { case (a, b, _) => b === a + 10000000L }
    assert(plantedPairs.length === 8,
      s"recovered ${plantedPairs.length} of 8 planted pairs")
    plantedPairs.foreach { case (_, _, sim) => assert(sim >= 0.999) }
    // and nothing else at this threshold: the raw corpus has no 0.9+ pair
    assert(pairs.length === 8)
  }

  test("semanticDedupPairsScaled matches the literal form pair-for-pair") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val planted = base.where(col("vec_id") < 8)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.01)),
          slice(col("v"), 2, 63)).as("v"))
    val vecs = base.unionAll(planted)
    val cb = Similarity.kmeansCodebook(emb, nCells = 16, iters = 2)
    // Same codebook through both assignment paths (16 inlined cosine
    // expressions vs one transform over a 2-D literal) must produce the
    // identical pair set with identical sims — assignment argmax, tie
    // rule, and verify arithmetic all agree.
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("cell"), r.getAs[Long]("vec_a"),
       r.getAs[Long]("vec_b"), r.getAs[Double]("sim"))
    val lit16 = Similarity.semanticDedupPairs(vecs, cb, 0.9)
      .collect().map(key).sortBy(k => (k._2, k._3))
    val scaled = Similarity.semanticDedupPairsScaled(vecs, cb, 0.9)
      .collect().map(key).sortBy(k => (k._2, k._3))
    assert(scaled.length === 8)
    assert(scaled.toSeq === lit16.toSeq)
  }

  test("rpTopK: reduced-space candidates preserve planted neighbors, " +
       "exact re-rank orders them") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" === 0L).head().getSeq[Float](1).toArray
    val planted = (1 to 5).map { i =>
      val v = q.zipWithIndex.map { case (x, j) =>
        x * (1.0f + 0.01f * ((i + j) % 3)) }
      (20000L + i, v, 9)
    }.toDF("vec_id", "embedding", "label")
    val all = emb.unionByName(planted)
    val exact = Similarity.topK(all, queryId = 0L, k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val rp = Similarity.rpTopK(all, queryId = 0L, k = 5).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
    // A JL projection distorts angles by O(1/√outDim) — near-duplicate
    // cosines (≈1) stay near 1 in the reduced space, far above the random
    // corpus baseline (≈0), so all 5 planted neighbors must survive the
    // top-40 reduced cut and win the exact re-rank.
    assert(rp.map(_._1).toSet === exact)
    // re-rank similarities are the exact 6dp cosines (same as topK's)
    val exactSims = Similarity.topK(all, queryId = 0L, k = 5).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim")).toMap
    rp.foreach { case (id, sim) => assert(sim === exactSims(id)) }
  }

  test("pqTopK: planted duplicate is retrieved at the minimum ADC " +
       "distance; reported distances replay exactly") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // An exact copy of the query encodes to the argmin code in every
    // subspace, so its ADC distance is the global minimum by construction.
    val q = emb.where($"vec_id" === 0L).head().getSeq[Float](1).toArray
    val all = emb.unionByName(
      Seq((99999L, q, 9)).toDF("vec_id", "embedding", "label"))
    val books = Similarity.pqCodebooks(all, m = 8, kCents = 16, iters = 2)
    val out = Similarity.pqTopK(all, queryId = 0L, k = 10,
        books = Some(books))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adist")))
    assert(out.length === 10)
    assert(!out.map(_._1).contains(0L))
    val planted = out.find(_._1 === 99999L)
    assert(planted.isDefined, s"planted duplicate missing from ${out.toSeq}")
    assert(planted.get._2 === out.map(_._2).min)

    // Replay ADC for every returned row: encode the vector against the
    // books (reduced-argmin rule), then sum the LUT terms in subspace
    // order — must equal the reported 6dp-rounded distance.
    val byId = all.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qv = byId(0L)
    def dotr(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    out.foreach { case (id, adist) =>
      val v = byId(id)
      val expect = (0 until 8).map { s =>
        val sv = v.slice(s * 8, s * 8 + 8)
        val qs = qv.slice(s * 8, s * 8 + 8)
        val code = books(s).zipWithIndex.minBy { case (cv, c) =>
          (dotr(cv, cv) - 2.0 * dotr(sv, cv), c) }._2
        val cv = books(s)(code)
        dotr(qs, qs) - 2.0 * dotr(qs, cv) + dotr(cv, cv)
      }.reduceLeft(_ + _)
      val rounded = BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      assert(adist === rounded, s"vec $id")
    }
  }

  test("ivfPqTopK routes the planted duplicate through the coarse cells " +
       "to the ADC minimum, and every result lies in a probed cell") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" === 0L).head().getSeq[Float](1).toArray
    val all = emb.unionByName(
      Seq((88888L, q, 9)).toDF("vec_id", "embedding", "label"))
    val cb = Similarity.kmeansCodebook(all, nCells = 16, iters = 2)
    val books = Similarity.pqCodebooks(all, m = 8, kCents = 16, iters = 2)
    val out = Similarity.ivfPqTopK(all, queryId = 0L, k = 10,
        codebook = cb, books = books).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adist")))
    assert(out.nonEmpty && out.length <= 10)
    assert(!out.map(_._1).contains(0L))
    // An exact copy of the query lands in the query's own best cell
    // (cosine argmax is continuous), so IVF routing cannot lose it, and
    // its codes are the per-subspace argmin — the global ADC minimum.
    val planted = out.find(_._1 === 88888L)
    assert(planted.isDefined, s"planted duplicate missing from ${out.toSeq}")
    assert(planted.get._2 === out.map(_._2).min)
    // The routing claim itself: every returned vector's coarse cell
    // (argmax cosine, ties to the higher cell) must be one of the 4
    // query-closest cells (ties to the lower cell) — a degenerate
    // probe-everything implementation would fail this for any corpus
    // vector ranked into the top-10 from an unprobed cell.
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val qd = q.map(_.toDouble)
    val probes = cb.zipWithIndex
      .map { case (cv, i) => (i, cos(qd, cv)) }
      .sortBy { case (i, c) => (-c, i) }.take(4).map(_._1).toSet
    val byId = all.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    out.foreach { case (id, _) =>
      val cell = cb.zipWithIndex
        .map { case (cv, i) => (cos(byId(id), cv), i) }.max._2
      assert(probes.contains(cell), s"vec $id routed from unprobed cell")
    }
  }

  test("ivfPqResidualTopK retrieves the planted duplicate; residual ADC " +
       "error beats raw ADC error on the planted near-duplicates") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where($"vec_id" === 0L).head().getSeq[Float](1).toArray
    val all = emb.unionByName(
      Seq((77777L, q, 9)).toDF("vec_id", "embedding", "label"))
    val cb = Similarity.kmeansCodebook(all, nCells = 16, iters = 2)
    val rawBooks = Similarity.pqCodebooks(all, m = 8, kCents = 16, iters = 2)
    val resBooks = Similarity.pqResidualBooks(all, cb, m = 8, kCents = 16,
      iters = 2)
    val out = Similarity.ivfPqResidualTopK(all, queryId = 0L, k = 10,
        codebook = cb, books = resBooks).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("adist")))
    assert(out.nonEmpty && out.length <= 10)
    assert(!out.map(_._1).contains(0L))
    // The exact copy shares the query's best coarse cell, its residual
    // equals the query's residual there, and its codes are that
    // residual's per-subspace argmin — the ADC minimum.
    val planted = out.find(_._1 === 77777L)
    assert(planted.isDefined, s"planted duplicate missing from ${out.toSeq}")
    assert(planted.get._2 === out.map(_._2).min)

    // The reason residual encoding exists: residuals have far smaller
    // norm than raw vectors, so the same byte budget quantizes them more
    // finely. Check on held-out near-duplicates (the 8 perturbed twins —
    // in no training set): mean |ADC(q, x) − L2²(q, x)| must be smaller
    // under residual books than raw books.
    def dotr(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def sub(a: Array[Double], b: Array[Double]): Array[Double] =
      a.indices.map(i => a(i) - b(i)).toArray
    def adcEst(qv: Array[Double], x: Array[Double],
               books: Array[Array[Array[Double]]]): Double =
      (0 until 8).map { s =>
        val sv = x.slice(s * 8, s * 8 + 8)
        val qs = qv.slice(s * 8, s * 8 + 8)
        val cv = books(s).zipWithIndex.minBy { case (c, i) =>
          (dotr(c, c) - 2.0 * dotr(sv, c), i) }._1
        dotr(qs, qs) - 2.0 * dotr(qs, cv) + dotr(cv, cv)
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      dotr(a, b) / math.sqrt(dotr(a, a) * dotr(b, b))
    def cellOf(x: Array[Double]): Int =
      cb.zipWithIndex.map { case (cv, i) => (cos(x, cv), i) }.max._2
    val qd = q.map(_.toDouble)
    val baseById = emb.where($"vec_id" < 8).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val errs = (0L until 8L).map { i =>
      val x = baseById(i).clone(); x(0) += 0.01   // the planted twin
      val truth = { val d = sub(qd, x); dotr(d, d) }
      val errRaw = math.abs(adcEst(qd, x, rawBooks) - truth)
      val c = cellOf(x)
      val errRes = math.abs(
        adcEst(sub(qd, cb(c)), sub(x, cb(c)), resBooks) - truth)
      (errRaw, errRes)
    }
    val meanRaw = errs.map(_._1).sum / errs.size
    val meanRes = errs.map(_._2).sum / errs.size
    assert(meanRes <= meanRaw,
      s"residual ADC error $meanRes should not exceed raw $meanRaw")
  }

  test("pqCodebooks are invariant to input partitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.pqCodebooks(emb, m = 8, kCents = 16, iters = 2)
    val b = Similarity.pqCodebooks(emb.repartition(7), m = 8, kCents = 16,
      iters = 2)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq ===
      b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("contrastiveTriplets draws deterministic negatives distinct from " +
       "the pair") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pool = emb.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val planted = pool.where(col("vec_id") < 8)
      .select((col("vec_id") + lit(10000000L)).as("vec_id"),
        concat(array(element_at(col("v"), 1) + lit(0.01)),
          slice(col("v"), 2, 63)).as("v"))
    val all = pool.unionAll(planted)
    val pairs = Similarity.lshNearDupPairsFromVecs(all, threshold = 0.9,
      dim = 64)
    def run() = Similarity.contrastiveTriplets(all, pairs, pool)
      .orderBy("anchor", "positive").collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Long]("negative"), r.getAs[Double]("sim_pos"),
        r.getAs[Double]("sim_neg")))
    val t = run()
    val poolN = pool.count()
    assert(t.nonEmpty)
    t.foreach { case (a, p, neg, sp, _) =>
      assert(neg != a && neg != p, s"negative $neg collides with ($a,$p)")
      assert(neg >= 0L && neg < poolN)
      assert(sp >= 0.9)
    }
    // deterministic: a second run yields the identical triplets
    assert(run().toSeq === t.toSeq)
  }

  test("contrastiveTriplets collision steps: forced single and double " +
       "steps with wraparound; gapped pool draws by rank; tiny pool " +
       "fails loudly") {
    import org.apache.spark.sql.functions._
    // Pool ids 0..4 (n = 5, dense → rank r holds id r). 2654435761 ≡ 1
    // (mod 5), so the draw is (a + b) mod 5. Pair (0, 3): r0 = 3 =
    // positive → step → 4. Pair (0, 4): r0 = 4 = positive → step →
    // (4+1)%5 = 0 = anchor → second step → 1. Exercises both collision
    // steps AND the modular wrap — identical to the pre-rank dense
    // behavior by construction.
    val pool = (0L until 5L).map(i =>
        (i, Array.fill(4)(i.toDouble + 1.0).toSeq))
      .toDF("vec_id", "v")
    val pairs = Seq((0L, 3L, 0.95), (0L, 4L, 0.95))
      .toDF("vec_a", "vec_b", "sim")
    val negs = Similarity.contrastiveTriplets(pool, pairs, pool)
      .orderBy("positive").collect()
      .map(r => (r.getAs[Long]("positive"), r.getAs[Long]("negative")))
    assert(negs.toSeq === Seq((3L, 4L), (4L, 1L)))

    // A pool with an id gap draws by RANK: ids {0,2,3,4}, n = 4,
    // 2654435761 ≡ 1 (mod 4), pair (0, 4) → r0 = 4 % 4 = 0 → rank 0 is
    // id 0 = anchor → rank 1 is id 2, valid → negative 2. The old dense
    // draw raised here; the rank draw yields a triplet.
    val sparse = pool.where(col("vec_id") =!= 1L)
    val gapped = Similarity.contrastiveTriplets(pool,
        Seq((0L, 4L, 0.95)).toDF("vec_a", "vec_b", "sim"), sparse)
      .collect().map(r => r.getAs[Long]("negative"))
    assert(gapped.toSeq === Seq(2L))

    // A pool smaller than 3 cannot guarantee a negative distinct from
    // the pair — loud failure, not a degenerate triplet.
    val tiny = pool.where(col("vec_id") <= 1L)
    val ex = intercept[Exception] {
      Similarity.contrastiveTriplets(pool,
        Seq((0L, 1L, 0.95)).toDF("vec_a", "vec_b", "sim"), tiny)
        .collect()
    }
    assert(ex.getMessage.contains(">= 3") ||
      ex.getCause != null && ex.getCause.getMessage.contains(">= 3"))
  }

  test("kmeansCodebook is invariant to input partitioning") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.kmeansCodebook(emb, nCells = 8, iters = 2)
    val b = Similarity.kmeansCodebook(emb.repartition(7), nCells = 8,
      iters = 2)
    // Exact DECIMAL sums make the trained centroids bit-identical at any
    // partition count — the property the SQL oracle relies on.
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("centroidOutliers: farthest-from-centroid vectors surface first, " +
       "ascending, k-bounded, partition-invariant") {
    import spark.implicits._
    // Centroid ≈ (0.25, 0.275): vector 2 (-1, 0) points away from it,
    // vector 1 (0, 1) is orthogonal-ish, 0 and 3 align with it.
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (2L, Array(-1f, 0f), 1), (3L, Array(1f, 0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidOutliers(emb, k = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.length === 2)
    assert(out(0)._1 === 2L)               // most anomalous first
    assert(out(0)._2 <= out(1)._2)         // ascending similarity
    val rep = Similarity.centroidOutliers(emb.repartition(3), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq === rep.toSeq)        // exact-DECIMAL centroid
  }
}
