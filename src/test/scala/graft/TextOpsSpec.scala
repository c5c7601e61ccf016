package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bpeMerges: hand-computed merges, greedy application, " +
       "lexicographic tie-break, weighted counts, early stop") {
    // One word "aaab" occurring 3 times (frequency-weighted), plus a
    // single-symbol word (no pairs — must not break the position walk).
    val d = Seq((0L, "aaab aaab x"), (1L, "aaab"))
      .toDF("doc_id", "text")
    val out = TextOps.bpeMerges(d, nMerges = 5).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("n_occ")))
    // merge 0: pairs of a␟a␟a␟b␟ weighted ×3 → (a,a)=6, (a,b)=3 →
    //   (a,a); greedy left-to-right gives aa␟a␟b␟ (NOT aa␟aa — the
    //   second (a,a) overlaps the first)
    // merge 1: (aa,a)=3 ties (a,b)=3 → lexicographic lhs: "a" < "aa"
    //   → (a,b) → aa␟ab␟
    // merge 2: (aa,ab)=3 → aaab; then no pairs remain → early stop
    //   (the x word never has a pair)
    assert(out.toSeq === Seq(
      (0L, "a", "a", "aa", 6L),
      (1L, "a", "b", "ab", 3L),
      (2L, "aa", "ab", "aaab", 3L)))
  }

  test("invertedIndex: hand-computed df/total_tf and tf-desc, id-asc " +
       "bounded postings") {
    val d = Seq((0L, "a b a"), (1L, "b b b c"), (2L, "a"))
      .toDF("doc_id", "text")
    val out = TextOps.invertedIndex(d, maxPostings = 2).orderBy("term")
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getAs[Long]("total_tf"), r.getAs[String]("postings")))
    assert(out.toSeq === Seq(
      ("a", 2L, 3L, "0:2;2:1"),     // tf desc
      ("b", 2L, 4L, "1:3;0:1"),
      ("c", 1L, 1L, "1:1")))
    // maxPostings caps the list but never df/total_tf
    val capped = TextOps.invertedIndex(d, maxPostings = 1).orderBy("term")
      .collect().map(r => (r.getAs[String]("term"),
        r.getAs[String]("postings")))
    assert(capped.toSeq === Seq(("a", "0:2"), ("b", "1:3"), ("c", "1:1")))
  }

  test("invertedIndexMerge: merging disjoint halves equals the full " +
       "index (mergeable-summary law), including tie cuts") {
    val d = Seq((0L, "a b a"), (1L, "b b b c"), (2L, "a"), (3L, "a c c"),
      (4L, "b a a a"), (5L, "c"))
      .toDF("doc_id", "text")
    val full = TextOps.invertedIndex(d, maxPostings = 2)
      .orderBy("term").collect().map(_.toSeq)
    val merged = TextOps.invertedIndexMerge(
        TextOps.invertedIndex(d.where($"doc_id" % 2 === 0), maxPostings = 2),
        TextOps.invertedIndex(d.where($"doc_id" % 2 === 1), maxPostings = 2),
        maxPostings = 2)
      .orderBy("term").collect().map(_.toSeq)
    assert(merged.toSeq === full.toSeq)
  }

  test("bm25TopK: fixed-point scores match the hand-computed formula; " +
       "shorter doc outranks on equal idf") {
    val d = Seq((0L, "a b a"), (1L, "b b b c"), (2L, "a"))
      .toDF("doc_id", "text")
    val out = TextOps.bm25TopK(d, Seq("q" -> Seq("a")), k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_fp")))
    // N=3, T=8, df(a)=2 → idf_fp = ((2·1+1)·10^6)//5 = 600000.
    // doc0: dl=3, tf=2 → dlr=(3·1000·3)//8=1125;
    //   tfc=(22000·2·10^5)//(20000+3000+9·1125)=4400000000//33125=132830
    // doc2: dl=1, tf=1 → dlr=375;
    //   tfc=2200000000//16375=134351 → the shorter doc wins
    assert(out.toSeq === Seq(
      ("q", 1L, 2L, 600000L * 134351L),
      ("q", 2L, 0L, 600000L * 132830L)))
  }

  test("weightedSample: k smallest hash/weight priorities win, heavier " +
       "docs more likely kept, deterministic across runs") {
    val d = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "t " * 99 + "t" else "t")).toDF("doc_id", "text")
    val s1 = TextOps.weightedSample(d, k = 40).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens")))
    val s2 = TextOps.weightedSample(d, k = 40).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens")))
    assert(s1.toSeq === s2.toSeq)          // seeded, not rand()
    assert(s1.length === 40)
    // 100-token docs are 100× likelier than 1-token docs: expect the
    // sample to be overwhelmingly heavy docs (bound is loose on purpose)
    assert(s1.count(_._2 == 100L) >= 30)
  }

  test("sourceDrift: hand-computed ppm total-variation, absent terms " +
       "counted against the source") {
    val d = Seq((0L, "a a b", "s1"), (1L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.sourceDrift(d).orderBy("source").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("tv_fp")))
    // corpus ppm: a=600000 b=400000. s1: a=666666 b=333333 →
    // 66666+66667; s2: a=b=500000 → 100000+100000.
    assert(out.toSeq === Seq(("s1", 3L, 2L, 133333L),
      ("s2", 2L, 2L, 200000L)))
  }

  test("pmiCooccur: hand-computed windowed pair counts and fp ratios") {
    val d = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val out = TextOps.pmiCooccur(d, window = 2, minCount = 1)
      .orderBy("x", "y").collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"),
        r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
        r.getAs[Long]("pmi_fp")))
    // pairs within +1/+2: (a,b)@0→1 (a,a)@0→2 (b,a)@1→2 (b,b)@1→3
    // (a,b)@2→3 → np=5; c_x: a=3 b=2; c_y: a=2 b=3
    assert(out.toSeq === Seq(
      ("a", "a", 1L, 3L, 2L, 5000000L / 6),
      ("a", "b", 2L, 3L, 3L, 10000000L / 9),
      ("b", "a", 1L, 2L, 2L, 1250000L),
      ("b", "b", 1L, 2L, 3L, 5000000L / 6)))
  }

  test("bpeEncodeTokens: trained merges tokenize the corpus, chars " +
       "conserved") {
    val d = Seq((0L, "aa aa ab")).toDF("doc_id", "text")
    // merge 0: (a,a)=2 beats (a,b)=1 → "aa"; merge 1: (a,b)=1 → "ab";
    // encoding then yields exactly the two merged tokens.
    val merges = TextOps.bpeMerges(d, nMerges = 2).orderBy("merge_rank")
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
      .toSeq
    assert(merges === Seq(("a", "a"), ("a", "b")))
    val enc = TextOps.bpeEncodeTokens(d, merges).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_occ")))
    assert(enc.toSeq === Seq(("aa", 2L), ("ab", 1L)))
    // with NO merges, encoding falls back to characters — and total
    // characters are conserved under any merge list
    val chars = TextOps.bpeEncodeTokens(d, Seq.empty).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_occ")))
    assert(chars.toSeq === Seq(("a", 5L), ("b", 1L)))
    assert(enc.map { case (t, n) => t.length * n }.sum ===
      chars.map(_._2).sum)
  }

  test("holdoutSplit: splits partition the corpus, assignment is a " +
       "pure deterministic projection") {
    val d = (0L until 200L).map(i => (i, "t " * 3, i % 7))
      .toDF("doc_id", "text", "n_chars")
    val out = TextOps.holdoutSplit(d).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_chars"))).toSeq
    assert(out.map(_._1) === Seq("test", "train", "val"))
    assert(out.map(_._2).sum === 200L)
    assert(out.map(_._3).sum === (0L until 200L).map(_ % 7).sum)
    // exact bucket arithmetic for one known id: 1·2654435761 mod 1e9+7
    // mod 100 = (2654435761 - 2·1000000007) % 100 = 654435747 % 100 = 47
    // → train
    val one = TextOps.holdoutSplit(
      Seq((1L, "x", 1L)).toDF("doc_id", "text", "n_chars")).collect()
    assert(one.map(_.getAs[String]("split")).toSeq === Seq("train"))
    // deterministic across invocations
    assert(TextOps.holdoutSplit(d).collect().map(_.toString).toSeq ===
      out.map(t => s"[${t._1},${t._2},${t._3}]"))
  }

  test("split bucket arithmetic is overflow-safe: huge ids get the " +
       "EXACT (unbounded-arithmetic) Knuth bucket, not the Long-wrapped " +
       "one") {
    // (id·2654435761) mod 1e9+7 mod 100 computed with big integers:
    //   4e9                  → 17  (Long-wrapped form would say 9)
    //   Long.MaxValue        → 86  (wrapped: 64)
    //   123456789012345      → 44  (wrapped: 39)
    // The reduced modular form must agree with unbounded arithmetic —
    // the DuckDB-HUGEINT-vs-Spark-Long divergence the r8 advisor
    // flagged. All three land < 90 → train, but we pin the bucket
    // itself via a 1%-granular probe: split with trainPct chosen just
    // below/at the exact bucket flips the assignment.
    for ((id, b) <- Seq((4000000000L, 17), (Long.MaxValue, 86),
                        (123456789012345L, 44))) {
      val df = Seq((id, id)).toDF("doc_id", "cluster")
      val at = TextOps.clusterSplit(df, trainPct = b + 1, valPct = 0)
        .collect().head.getString(2)
      val below = TextOps.clusterSplit(df, trainPct = math.max(b, 1),
          valPct = 0).collect().head.getString(2)
      assert(at === "train", s"id=$id bucket should be < ${b + 1}")
      if (b > 0)
        assert(below === "test", s"id=$id bucket should be >= $b")
    }
  }

  test("clusterSplit: cluster members never straddle splits, buckets " +
       "match the Knuth arithmetic the per-doc split would scatter") {
    def bucket(k: Long) = k * 2654435761L % 1000000007L % 100L
    // A near-dup cluster whose members' PER-DOC buckets land in
    // different splits (the leakage holdoutSplit cannot prevent) plus
    // singletons. Clusters keyed by min member id, as
    // connectedComponents labels them.
    val members = (0L until 400L).filter(i => bucket(i) >= 90)
      .take(3).toSeq :+ 1L                      // 1 → bucket 47 (train)
    val clusters = (members.map(m => (m, members.min)) ++
      Seq((200L, 200L), (201L, 201L))).toDF("doc_id", "cluster")
    val out = TextOps.clusterSplit(clusters).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[String]("split")))
    // the per-doc buckets really do straddle the 90/95 boundaries…
    assert(members.map(bucket).exists(_ < 90) &&
      members.map(bucket).exists(_ >= 90))
    // …but every cluster gets exactly one split
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length === 1)
    }
    // and the assigned split is the cluster label's own bucket
    out.foreach { case (_, cl, split) =>
      val b = bucket(cl)
      val expected =
        if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(split === expected, s"cluster $cl bucket $b")
    }
    // pure projection: no shuffle introduced over the input clustering
    val plan = TextOps.clusterSplit(clusters)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("blocklistStats: occurrence counts, fraction, verdict, " +
       "null-text propagation, shuffle-free plan") {
    val d = Seq(
      (0L, Option("clean words only here")),            // 0/4 → pass
      (1L, Option("slow query slow disk dup")),         // 3/5 = 0.6 → fail
      (2L, Option("slow a b c d e f g h i")),           // 1/10 = 0.1 → pass
      (3L, Option.empty[String]))                       // null → null verdict
      .toDF("doc_id", "text")
    val out = TextOps.blocklistStats(d, Seq("slow", "dup"), maxFrac = 0.25)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getAs[Long]("n_tokens"),
      out(i).getAs[Long]("n_flagged"), out(i).getAs[Double]("flagged_frac"))
    assert(row(0) === ((4L, 0L, 0.0)) && out(0).getAs[Boolean]("pass"))
    assert(row(1) === ((5L, 3L, 0.6)) && !out(1).getAs[Boolean]("pass"))
    assert(row(2) === ((10L, 1L, 0.1)) && out(2).getAs[Boolean]("pass"))
    assert(out(3).isNullAt(1) && out(3).isNullAt(2) && out(3).isNullAt(4))
    // the blocklist is a literal: the whole gate is one projection
    val plan = TextOps.blocklistStats(d, Seq("slow"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("winnowFingerprints: shared-run guarantee, density bound, " +
       "determinism, short-doc empty") {
    val shared = "the quick brown fox jumps over it"   // 33 chars
    val a = s"AAAA $shared zzz"
    val b = s"totally different prefix $shared"
    val d = Seq((0L, a), (1L, b), (2L, a), (3L, "tiny")).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("fp")))
    val byDoc = fps.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._3).toSet)
    }
    // winnowing guarantee: a shared run of ≥ gram + w − 1 = 11 bytes
    // yields at least one common fingerprint
    assert(byDoc(0L).intersect(byDoc(1L)).nonEmpty)
    // identical docs → identical signatures (and identical positions)
    assert(fps.filter(_._1 == 0L).map(t => (t._2, t._3)).toSet ===
      fps.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet)
    // density: at least one selection per disjoint w-run, at most one
    // per window position
    val nhA = a.length - 8 + 1
    val nA = fps.count(_._1 == 0L)
    assert(nA >= (nhA - 4 + 1 + 3) / 4 && nA <= nhA)
    // doc shorter than gram + w − 1 bytes has no signature
    assert(!byDoc.contains(3L))
  }

  test("tokenDeciles: equi-depth bins under total order, nulls excluded, " +
       "remainder rows land in the first bins") {
    // Token counts 1..5 plus a null text; ntile(2) over 5 rows → the
    // first tile takes the extra row: {1,2,3} then {4,5}.
    val d = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"),
      (4L, "a b c d"), (5L, "a b c d e"), (6L, null))
      .toDF("doc_id", "text")
    val out = TextOps.tokenDeciles(d, n = 2).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_docs"),
        r.getAs[Int]("min_tokens"), r.getAs[Int]("max_tokens"),
        r.getAs[Long]("sum_tokens")))
    assert(out.toSeq === Seq((1L, 3L, 1, 3, 6L), (2L, 2L, 4, 5, 9L)))
  }

  test("tokenEntropy: Q40 integer entropy — 0 for a stutter, exactly " +
       "2 bits for 4 distinct tokens, 1 bit for 2+2, null for null text") {
    val d = Seq((1L, "x x x x"), (2L, "a b c d"),
        (3L, null.asInstanceOf[String]), (4L, "a a b b"))
      .toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getAs[java.lang.Long]("entropy_fp")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("entropy_bits"))
          .map(_.toDouble)))
    val q40 = 1L << 40
    // "x x x x": one token class → H = 0 exactly
    assert(out(0) === ((1L, 4L, 1L, Some(0L), Some(0.0))))
    // "a b c d": H = log2(4) = 2 bits — exact in Q40 (L(4) = 2·2^40,
    // L(1) = 0, truncation-free)
    assert(out(1) === ((2L, 4L, 4L, Some(2 * q40), Some(2.0))))
    // null text → no tokens → zero counts, null entropy
    assert(out(2) === ((3L, 0L, 0L, None, None)))
    // "a a b b": H = 1 bit exactly (L(4) − L(2) = 2^40)
    assert(out(3) === ((4L, 4L, 2L, Some(q40), Some(1.0))))
  }

  test("TokenSummary's word-piece run counter matches regexp_count on " +
       "adversarial class-boundary strings (unicode, control chars, " +
       "digit/letter/punct runs)") {
    import org.apache.spark.sql.functions.{col, lit, regexp_count}
    // The run counter replaced the regex engine for performance; this
    // pins byte-level equivalence with Spark's own regexp_count on the
    // exact cases where the two could diverge: multi-byte UTF-8 runs,
    // Java-\\s whitespace (incl. \\x0B vertical tab), class flips
    // with no separator, empty and whitespace-only strings.
    val cases = Seq(
      "hello world", "abc123def", "a1!b2?c", "  leading", "trailing  ",
      "", " ", "\t\n\f\r", "tab\tsep", "emoji \ud83d\ude00 mix",
      "caf\u00e9 na\u00efve", "42", "...", "a.b,c;d", "x\u00e9\u00e97y",
      "\u4e16\u754c hello \u4e16\u754c", "a  b   c", "1,234.56",
      "don't stop", "under_score", "mixed\u000bvtab\fformfeed")
    val d = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        graft.functions.TokenSummary(col("text"))
          .getField("n_word_pieces").cast("int").as("rc"),
        regexp_count(col("text"), lit(TextOps.WordPiecePattern)).as("re"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"run counter diverged from regexp on case ${r.getLong(0)}")
    }
  }

  test("tokenEntropy: the 300k-token domain cap — exact just under, " +
       "null just over (the Long accumulator's provable-exactness bound)") {
    val cap = graft.functions.TokenSummary.EntropyCapTokens.toInt
    // Under the cap: `cap` copies of one token → entropy exactly 0
    // (single token class), still computed. Over the cap: cap+1 tokens
    // → entropy_fp/entropy_bits null, counts still real — a wrapped
    // Long sum would silently diverge from the oracle's HUGEINT, so
    // out-of-domain is an explicit null, not a wrong number.
    val under = ("t " * (cap - 1)) + "t"
    val over = under + " t"
    val d = Seq((1L, under), (2L, over)).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(d).orderBy("doc_id").collect()
    assert(out(0).getLong(1) === cap.toLong)
    assert(out(0).getAs[java.lang.Long]("entropy_fp") === 0L)
    assert(out(1).getLong(1) === cap.toLong + 1)
    assert(out(1).getAs[java.lang.Long]("entropy_fp") === null)
    assert(out(1).getAs[java.lang.Double]("entropy_bits") === null)
    assert(out(1).getLong(2) === 1L) // n_distinct unaffected by the cap
  }

  test("classifierScore: hand-computed logits via an independent md5 " +
       "(MessageDigest), keep thresholding, null/empty-text handling") {
    import org.apache.spark.sql.functions.col
    // Independent re-derivation of the fixed literal model: bucket =
    // int of first 3 md5 hex digits, w(b) = ((b*37 + 11) % 201) - 100.
    def w(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 3), 16)
      ((b * 37 + 11) % 201) - 100
    }
    val d = Seq((1L, "alpha beta beta"), (2L, ""),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.classifierScore(d).orderBy("doc_id").collect()
    val exp1 = w("alpha") + 2 * w("beta")
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === exp1)
    assert(out(0).getAs[Double]("avg_logit") === exp1.toDouble / 3.0)
    assert(out(0).getBoolean(4) === (exp1 > 0))
    // empty text tokenizes to one empty token -> its bucket's weight
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getLong(2) === w(""))
    // null text -> zero counts, null average, keep=false
    assert(out(2).getLong(1) === 0L)
    assert(out(2).getLong(2) === 0L)
    assert(out(2).getAs[java.lang.Double]("avg_logit") === null)
    assert(out(2).getBoolean(4) === false)
  }

  test("classifierTrain: hand-computed NB presence counts and smoothed " +
       "integer weights over the labeled slice; trained scorer applies " +
       "them with the prior for unseen buckets") {
    import org.apache.spark.sql.functions.col
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 3), 16)
    }
    // toy corpus engineered so the quality label splits the slice:
    // pos = distinct-rich 25+ tokens with stopwords, neg = "a a a a";
    // doc 3 is OUTSIDE the doc_id%5 slice and must not train anything.
    val pos1 = (1 to 25).map(i => s"w$i").mkString(" ") + " the of and"
    val pos2 = (1 to 22).map(i => s"v$i").mkString(" ") + " the in is"
    val neg1 = "a a a a"
    val docs = Seq((0L, pos1), (5L, neg1), (10L, pos2),
      (3L, "outside slice marker")).toDF("doc_id", "text")
    // sanity: the operator's label derivation splits the toy as designed
    val labels = TextOps.qualityScore(
        TextOps.tokenStats(docs.where(col("doc_id") % 5 === 0)))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("quality_score") >= 0.5)).toMap
    assert(labels === Map(0L -> true, 5L -> false, 10L -> true))
    // independent expected model: distinct buckets per slice doc,
    // add-one-smoothed ppm weights
    val expected = Seq(0L -> pos1, 5L -> neg1, 10L -> pos2)
      .flatMap { case (id, tx) =>
        tx.toLowerCase.split(" ").map(bucket).distinct
          .map(b => (b, labels(id)))
      }
      .groupBy(_._1).map { case (b, xs) =>
        val np = xs.count(_._2).toLong
        val nn = xs.size - np
        (b, np, nn, (np + 1L) * 1000000L / (np + nn + 2L))
      }.toSeq.sortBy(_._1)
    val out = TextOps.classifierTrain(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === expected)
    val wMap = out.map(r => r._1 -> r._4).toMap
    // trained scorer: per-token trained weight (or the 500000 prior),
    // exact integer sums, keep = above-neutral average
    val scored = TextOps.classifierScoreTrained(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    def exp(tx: String) = tx.toLowerCase.split(" ")
      .map(t => wMap.getOrElse(bucket(t), 500000L)).sum
    assert(scored(5L) === ((4L, 4L * wMap(bucket("a")),
      4L * wMap(bucket("a")) > 4L * 500000L)))
    assert(scored(0L) === ((28L, exp(pos1), exp(pos1) > 28L * 500000L)))
    assert(scored(3L) === ((3L, exp("outside slice marker"),
      exp("outside slice marker") > 3L * 500000L)))
    // the all-neg bucket scores below neutral, the pos-only ones above
    assert(wMap(bucket("a")) < 500000L)
    assert(wMap(bucket("w1")) > 500000L)
    // held-out eval: doc 3 is the only non-slice doc; its quality
    // label is false (3 tokens, no stopwords) and the confusion table
    // is exactly that one cell, keyed by whatever the scorer predicted
    val eval = TextOps.classifierEval(docs).collect()
      .map(r => ((r.getBoolean(0), r.getBoolean(1)), r.getLong(2)))
      .toMap
    assert(eval === Map((false, scored(3L)._3) -> 1L))
  }

  test("lmScoreSliced equals lmScore exactly (per-doc sums additive " +
       "over the gram-hash partition)") {
    val d = Seq(
      (0L, "the cat sat on the mat the cat ran"),
      (1L, "the cat sat on a log"),
      (2L, "one"), (3L, null.asInstanceOf[String]),
      (4L, "the cat the cat the cat"))
      .toDF("doc_id", "text")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val work = java.nio.file.Files
      .createTempDirectory("graft_lm_sliced").toString
    assert(dump(TextOps.lmScoreSliced(d, work, slices = 3)) ===
      dump(TextOps.lmScore(d)))
  }

  test("repetitionStats: hand-computed fractions on crafted docs") {
    val d = Seq((0L, "a a a b"), (1L, "x y z w"), (2L, "go go go go"))
      .toDF("doc_id", "text")
    val out = TextOps.repetitionStats(d).orderBy("doc_id").collect()
    // doc 0: "a a a b" → top 3/4; bigrams {a a, a a, a b} → (3-2)/3;
    // trigrams {a a a, a a b} → both distinct → 0
    assert(out(0).getAs[Long]("n_tokens") === 4L)
    assert(out(0).getAs[Double]("top_token_frac") === 0.75)
    assert(math.abs(out(0).getAs[Double]("dup_bigram_frac") - 1.0 / 3) < 1e-12)
    assert(out(0).getAs[Double]("dup_trigram_frac") === 0.0)
    // doc 1: all distinct
    assert(out(1).getAs[Double]("top_token_frac") === 0.25)
    assert(out(1).getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out(1).getAs[Double]("dup_trigram_frac") === 0.0)
    // doc 2: "go"×4 → top 1.0; 3×"go go" → 2/3; 2×"go go go" → 1/2
    assert(out(2).getAs[Double]("top_token_frac") === 1.0)
    assert(math.abs(out(2).getAs[Double]("dup_bigram_frac") - 2.0 / 3) < 1e-12)
    assert(out(2).getAs[Double]("dup_trigram_frac") === 0.5)
  }

  test("repetitionStats: single-token doc has no n-grams, fractions 0") {
    val out = TextOps.repetitionStats(Seq((0L, "solo")).toDF("doc_id", "text"))
      .collect()(0)
    assert(out.getAs[Long]("n_tokens") === 1L)
    assert(out.getAs[Double]("top_token_frac") === 1.0)
    assert(out.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(out.getAs[Double]("dup_trigram_frac") === 0.0)
  }

  test("canonicalize composes decomposed accents (NFC), NFKC folds compat") {
    import graft.functions.UnicodeNormalize
    import org.apache.spark.sql.functions.col
    val d = Seq((0L, "café plain"), (1L, "ascii only"), (2L, null))
      .toDF("doc_id", "text")
    val out = TextOps.canonicalize(d).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("canonical") === "café plain")
    assert(out(1).getAs[String]("canonical") === "ascii only")
    assert(out(2).getAs[String]("canonical") === null)
    // NFKC also folds compatibility characters (ligature fi → f i)
    val nfkc = d.where(col("doc_id") === 0L)
      .select(UnicodeNormalize.normalize(
        org.apache.spark.sql.functions.lit("ﬁle"), "NFKC").as("c"))
      .head().getAs[String]("c")
    assert(nfkc === "file")
    intercept[IllegalArgumentException] {
      UnicodeNormalize.normalize(col("text"), "NFX")
    }
  }

  test("groupQuota keeps the k longest docs per group, doc_id tiebreak") {
    val d = Seq(
      (0L, "en", "web", "aaaa bbbb"),      // 9 chars
      (1L, "en", "web", "ccc ddd eee"),    // 11 → rank 1
      (2L, "en", "web", "ff gg hh"),       // 8 → rank 3, cut at quota 2
      (3L, "en", "web", "iiii jjjj"),      // 9, ties doc 0 → doc 0 wins
      (4L, "de", "web", "kk"))             // alone in its group
      .toDF("doc_id", "lang", "source", "text")
    val out = TextOps.groupQuota(d, Seq("lang", "source"), quota = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_in_group")))
      .toMap
    assert(out === Map(1L -> 1L, 0L -> 2L, 4L -> 1L))
  }

  test("epochMix repeats docs per-stratum, default elsewhere") {
    val d = Seq((0L, "wiki", "x"), (1L, "web", "y"), (2L, "wiki", "z"))
      .toDF("doc_id", "source", "text")
    val out = TextOps.epochMix(d, Map("wiki" -> 3), defaultEpochs = 1)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")))
      .sorted
    assert(out.toSeq === Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 1L), (2L, 1L), (2L, 2L), (2L, 3L)))
    // weight 0 DROPS the stratum (sequence(1,0) would silently reverse);
    // negative weights are rejected outright
    val zeroed = TextOps.epochMix(d, Map("wiki" -> 0), defaultEpochs = 1)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(zeroed.toSeq === Seq(1L))
    intercept[IllegalArgumentException] {
      TextOps.epochMix(d, Map("wiki" -> -1), defaultEpochs = 1)
    }
  }

  test("shuffleOrder is a permutation, deterministic, partition-invariant") {
    val d = (0L until 97L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = TextOps.shuffleOrder(d, partitions = 7).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("position"))
    // positions are exactly 1..n (a permutation)
    assert(a.map(_._2).sorted.toSeq === (1L to 97L))
    // the order is shuffled, not id order
    assert(a.sortBy(_._2).map(_._1).toSeq !== (0L until 97L).toSeq)
    // identical under a different partition count and on re-run
    val b = TextOps.shuffleOrder(d, partitions = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("position"))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    spark.catalog.clearCache()
  }

  test("piiScrub counts and redacts emails, urls, phones") {
    val d = Seq(
      (0L, "mail me at bob@corp.io or visit https://a.example.org/x " +
           "then call 555-123-4567"),
      (1L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextOps.piiScrub(d).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") === 1)
    assert(out(0).getAs[Int]("n_urls") === 1)
    assert(out(0).getAs[Int]("n_phones") === 1)
    assert(out(0).getAs[String]("scrubbed") ===
      "mail me at <EMAIL> or visit <URL> then call <PHONE>")
    assert(out(1).getAs[Int]("n_emails") === 0)
    assert(out(1).getAs[String]("scrubbed") === "no pii here at all")
  }

  test("topTerms ranks by tf·(N−df) with term-ascending tiebreak") {
    val d = Seq((0L, "apple apple banana"),
                (1L, "banana cherry cherry cherry"),
                (2L, "apple banana date")).toDF("doc_id", "text")
    val out = TextOps.topTerms(d, k = 3).orderBy("doc_id", "term").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
                 r.getAs[Long]("tf"), r.getAs[Long]("df"),
                 r.getAs[Long]("score"))).toSeq
    // N=3; df: apple 2, banana 3, cherry 1, date 1
    assert(out === Seq(
      (0L, "apple", 2L, 2L, 2L), (0L, "banana", 1L, 3L, 0L),
      (1L, "banana", 1L, 3L, 0L), (1L, "cherry", 3L, 1L, 6L),
      (2L, "apple", 1L, 2L, 1L), (2L, "banana", 1L, 3L, 0L),
      (2L, "date", 1L, 1L, 2L)))
    // k cuts per doc: with k=1 only each doc's argmax survives
    val top1 = TextOps.topTerms(d, k = 1).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"))).toSeq
    assert(top1 === Seq((0L, "apple"), (1L, "cherry"), (2L, "date")))
  }

  test("lengthBandFilter drops the tails outside the quantile band") {
    val d = (1 to 20).map(i => (i.toLong, Seq.fill(i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.lengthBandFilter(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"))).toSeq
    // P5 of 1..20 = 1 (cume_dist 1/20 ≥ 0.05), P95 = 19 → only the
    // 20-token doc is outside the band
    assert(out.length === 19)
    assert(out.map(_._2).max === 19L)
  }

  test("packSequences: two-phase prefix sum matches brute-force packing") {
    // lengths 3,2,4,1 at seqLen=4 → starts 0,3,5,9 → seq 0,0,1,2 /
    // offsets 0,3,1,1; docs deliberately span range-partition boundaries
    val d = Seq((0L, "a b c"), (1L, "d e"), (2L, "f g h i"), (3L, "j"))
      .toDF("doc_id", "text")
    val out = TextOps.packSequences(d, seqLen = 4, partitions = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
                 r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toSeq
    assert(out === Seq((0L, 3L, 0L, 0L), (1L, 2L, 0L, 3L),
                       (2L, 4L, 1L, 1L), (3L, 1L, 2L, 1L)))
  }

  test("packSequences is partition-count-invariant") {
    val d = (0L until 100L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    def run(p: Int) = TextOps.packSequences(d, seqLen = 16, partitions = p)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id"),
                 r.getAs[Long]("seq_offset"))).toSeq
    assert(run(1) === run(13))
  }

  test("tokenStatsAgg is column-for-column equivalent to tokenStats") {
    val d = Seq((0L, "the quick brown fox the lazy dog the"),
                (1L, "one"), (2L, "a a  b")).toDF("doc_id", "text")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(TextOps.tokenStatsAgg(d).columns.toSeq ===
      TextOps.tokenStats(d).columns.toSeq)
    assert(dump(TextOps.tokenStatsAgg(d)) === dump(TextOps.tokenStats(d)))
  }

  test("langIdAgg matches langId on every corpus row") {
    val d = Seq((0L, "the cat is in the house"),
                (1L, "der hund ist mit der katze"),
                (2L, "zzz qqq xxx"),
                (3L, "le chat est dans la maison")).toDF("doc_id", "text")
    def dump(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(dump(TextOps.langIdAgg(d)) === dump(TextOps.langId(d)))
  }

  test("curationDocSignals: fused pass is column-identical to the " +
       "standalone operators it replaces, null/empty text included") {
    import org.apache.spark.sql.functions._
    val d = Seq((0L, "src_a", "the quick brown fox the lazy dog the"),
                (1L, "src_a", "one"),
                (2L, "src_b", ""),
                (3L, "src_b", null.asInstanceOf[String]),
                (4L, "src_a", "a a  b the of and to in is it extra"))
      .toDF("doc_id", "source", "text")
    val fused = TextOps.curationDocSignals(d).orderBy("doc_id").collect()
    val stats = TextOps.qualityScore(TextOps.tokenStats(d))
      .orderBy("doc_id").collect()
    val lens = d.select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        size(split(col("text"), " ")).cast("long").as("nts"),
        when(col("text").isNull, lit(null).cast("long"))
          .otherwise(size(split(lower(col("text")), " ")).cast("long"))
          .as("ntc"))
      .orderBy("doc_id").collect()
    fused.zip(stats).zip(lens).foreach { case ((f, s), l) =>
      assert(f.getAs[Long]("doc_id") === s.getAs[Long]("doc_id"))
      assert(Option(f.getAs[java.lang.Integer]("n_tokens")) ===
        Option(s.getAs[java.lang.Integer]("n_tokens")))
      assert(Option(f.getAs[java.lang.Double]("quality_score")) ===
        Option(s.getAs[java.lang.Double]("quality_score")))
      assert(Option(f.getAs[String]("fingerprint")) ===
        Option(l.getAs[String]("fp")))
      assert(Option(f.getAs[java.lang.Long]("n_tok_split")) ===
        Option(l.getAs[java.lang.Long]("nts")))
      assert(Option(f.getAs[java.lang.Long]("n_tok_cov")) ===
        Option(l.getAs[java.lang.Long]("ntc")))
    }
  }

  test("langClassifierGate: fused gate decisions equal langIdAgg's " +
       "pred_lang and classifierScore's keep, null text included") {
    val d = Seq((0L, "the cat is in the house"),
                (1L, "der hund ist mit der katze"),
                (2L, "zzz qqq xxx"),
                (3L, null.asInstanceOf[String]),
                (4L, ""))
      .toDF("doc_id", "text")
    val fused = TextOps.langClassifierGate(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val lang = TextOps.langIdAgg(d).orderBy("doc_id").collect()
      .map(r => r.getAs[String]("pred_lang"))
    val clf = TextOps.classifierScore(d).orderBy("doc_id").collect()
      .map(r => r.getAs[Boolean]("keep"))
    assert(fused.map(_._2).toSeq === lang.toSeq)
    assert(fused.map(_._3).toSeq === clf.toSeq)
  }

  test("packSequences, topTerms, shuffleOrder plan no unpartitioned window") {
    val d = Seq((0L, "a b c"), (1L, "d e f")).toDF("doc_id", "text")
    for (df <- Seq(TextOps.packSequences(d), TextOps.topTerms(d),
                   TextOps.shuffleOrder(d))) {
      // An unpartitioned window prints as `Window [...], [ord]` (two
      // argument lists); partitioned ones as `Window [...], [part], [ord]`.
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.nonEmpty)
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"unpartitioned window in plan: $w"))
    }
  }

  test("repetitionStats and topTerms are partition-count-invariant") {
    val docs = (0L until 60L).map { i =>
      (i, Seq.tabulate((i % 9 + 2).toInt)(j => s"w${(i + j) % 5}")
        .mkString(" "))
    }
    def dump(df: org.apache.spark.sql.DataFrame, sortCols: Seq[String]) =
      df.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSeq
    val d1 = docs.toDF("doc_id", "text").repartition(1)
    val d7 = docs.toDF("doc_id", "text").repartition(7)
    assert(dump(TextOps.repetitionStats(d1), Seq("doc_id")) ===
           dump(TextOps.repetitionStats(d7), Seq("doc_id")))
    assert(dump(TextOps.topTerms(d1), Seq("doc_id", "term")) ===
           dump(TextOps.topTerms(d7), Seq("doc_id", "term")))
  }

  test("chunkDocs: overlapping windows cover every token, no subset chunk") {
    // 10 tokens, chunkSize 4, overlap 2 → stride 2 → starts 0,2,4,6:
    // window [6,10) reaches the end, so no 5th chunk (it would be a
    // subset of chunk 3)
    val d = Seq((0L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocs(d, chunkSize = 4, overlap = 2)
      .orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Int]("n_chunk_tokens")))
      .toSeq
    assert(out === Seq((0L, 4), (1L, 4), (2L, 4), (3L, 4)))
    // chunk text windows match the brute-force sliding view
    val md5s = TextOps.chunkDocs(d, chunkSize = 4, overlap = 2)
      .orderBy("chunk_id").collect().map(_.getAs[String]("chunk_md5")).toSeq
    val expect = (0 until 4).map { k =>
      val toks = (1 to 10).map(i => s"t$i").slice(k * 2, k * 2 + 4)
      java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(md5s === expect)
    // a doc shorter than one chunk still yields exactly one chunk
    val short = TextOps.chunkDocs(
      Seq((0L, "a b")).toDF("doc_id", "text"), 4, 2).collect()
    assert(short.length === 1 &&
      short(0).getAs[Int]("n_chunk_tokens") === 2)
    // every doc length up to 3 chunks: full coverage, last window hits
    // the end, and no chunk is a subset of its predecessor
    for (n <- 1 to 9) {
      val dn = Seq((0L, (1 to n).map(i => s"x$i").mkString(" ")))
        .toDF("doc_id", "text")
      val chunks = TextOps.chunkDocs(dn, chunkSize = 4, overlap = 2)
        .orderBy("chunk_id").collect()
      val lastStart = (chunks.length - 1) * 2
      assert(lastStart + 4 >= n, s"n=$n: last window misses the tail")
      assert(chunks.length == 1 || (lastStart - 2) + 4 < n,
        s"n=$n: final chunk is a subset of its predecessor")
    }
  }

  test("urlDomains aggregates per-domain url and doc counts") {
    val d = Seq(
      (0L, "see https://a.io/x and https://a.io/y"),
      (1L, "see https://b.net/z and https://a.io/w")).toDF("doc_id", "text")
    val out = TextOps.urlDomains(d).orderBy("domain").collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_urls"),
                 r.getAs[Long]("n_docs"))).toSeq
    assert(out === Seq(("a.io", 3L, 2L), ("b.net", 1L, 1L)))
  }

  test("lmScore: hand-computed fixed-point transition probabilities") {
    // Corpus counts: c1(a)=3; c2(a,b)=2, c2(a,c)=1.
    val d = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.lmScore(d).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_bigrams"), r.getAs[Long]("prob_fp_sum"),
                 Option(r.get(3)).map(_.asInstanceOf[Double])))
    // P(b|a) = 2/3 → ⌊2·10^8 / 3⌋ = 66666666; P(c|a) = 1/3 → 33333333.
    assert(out(0) === ((1L, 66666666L, Some(0.66666666))))
    assert(out(1) === ((1L, 66666666L, Some(0.66666666))))
    assert(out(2) === ((1L, 33333333L, Some(0.33333333))))
    // single-token doc: no bigram, null score (not NaN)
    assert(out(3) === ((0L, 0L, None)))
  }

  test("importanceWeights: hand-computed target/source frequency math") {
    import org.apache.spark.sql.functions.col
    // Target (ids 0, 10): bigram (a b) twice → nt = 2, ct(ab) = 2.
    // Source (ids 1, 2): (a b) once, (c d) once → ns = 2.
    val d = Seq((0L, "a b"), (10L, "a b"), (1L, "a b"), (2L, "c d"))
      .toDF("doc_id", "text")
    val out = TextOps.importanceWeights(d, col("doc_id") % 10 === 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_feats"),
                 r.getAs[Long]("importance_fp"),
                 r.getAs[Double]("avg_importance")))
    // r(ab) = 2e8/2 − 1e8/2 = 5e7 (target-typical, positive);
    // r(cd) = 0 − 5e7 = −5e7 (source-only, negative).
    assert(out.toSeq === Seq((1L, 1L, 50000000L, 0.5),
                             (2L, 1L, -50000000L, -0.5)))
  }

  test("heavyHitters: exact result over the sketch pre-screen") {
    // 50 "hot" + 60 distinct singletons → n = 110; only "hot" clears
    // count·100 > n.
    val hot = Seq.fill(50)("hot")
    val cold = (0 until 60).map(i => s"w$i")
    val d = Seq((0L, (hot ++ cold).mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.heavyHitters(d).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_occurrences")))
    assert(out.toSeq === Seq(("hot", 50L)))
  }

  test("heavyHitters equals the exact full-vocabulary computation even " +
       "with a sketch far smaller than the vocabulary") {
    // 400 distinct tokens + planted heavies, slots=15 « vocabulary: the
    // MG superset guarantee (anything above n/16 survives) must still
    // make the re-counted result exactly the > n/10 relation.
    val rnd = new scala.util.Random(42)
    val tokens = Seq.fill(120)("h1") ++ Seq.fill(80)("h2") ++
      (0 until 400).map(i => s"t${rnd.nextInt(400)}")
    val d = tokens.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .grouped(20).zipWithIndex
      .map { case (g, i) => (i.toLong, g.map(_._2).mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val sketch = TextOps.heavyHitters(d, threshold = 10, slots = 15)
      .collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n_occurrences")))
      .toSet
    import org.apache.spark.sql.functions._
    val toks = d.select(explode(split(lower(col("text")), " ")).as("t"))
    val n = toks.count()
    val exact = toks.groupBy("t").count()
      .where(col("count") * 10 > n).collect()
      .map(r => (r.getAs[String]("t"), r.getAs[Long]("count"))).toSet
    assert(sketch === exact)
    assert(exact.map(_._1).contains("h1"))  // the test is not vacuous
  }

  test("stripBoilerplateLines drops high-df lines, keeps rare lines in " +
       "order, and trims for the df key only") {
    import org.apache.spark.sql.functions.col
    // banner appears in 7 docs (> maxLineDf 5, incl. one padded copy
    // that must share the df key via trim), body lines are unique,
    // doc 7 has no boilerplate at all, doc 8 is a single line.
    val docs = (0L until 7L).map { i =>
      val banner = if (i == 0) "  the banner  " else "the banner"
      (i, s"$banner\nbody line $i\ntail $i")
    } :+ (7L, "only body\nsecond line") :+ (8L, "solo")
    val out = TextOps.stripBoilerplateLines(
        docs.toDF("doc_id", "text"), maxLineDf = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // banner removed from all 7 carriers (trimmed copy too), bodies kept
    (0 until 7).foreach { i =>
      assert(out(i)._2 === 3L && out(i)._3 === 1L, s"doc $i")
    }
    assert(out(7) === ((7L, 2L, 0L,
      TestSpark.spark.sql("SELECT md5('only body\nsecond line')")
        .head().getString(0))))
    assert(out(8)._2 === 1L && out(8)._3 === 0L)
    // order preserved: doc 3 cleaned text = "body line 3\ntail 3"
    val want3 = TestSpark.spark.sql("SELECT md5('body line 3\ntail 3')")
      .head().getString(0)
    assert(out(3)._4 === want3)
  }

  test("vocabCoverage: OOV fraction against the deterministic top-k " +
       "vocab, null rate for token-less docs") {
    import org.apache.spark.sql.functions.col
    // vocab k=2 → {"a" (4x), "b" (3x)} (count desc, token asc cut);
    // "c" and "z" are OOV. doc 3 has null text.
    val d = Seq((0L, "a a b c"), (1L, "b b a z"), (2L, "a"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(d, k = 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out(0) === ((0L, 4L, 1L, Some(0.25))))
    assert(out(1) === ((1L, 4L, 1L, Some(0.25))))
    assert(out(2) === ((2L, 1L, 0L, Some(0.0))))
    assert(out(3) === ((3L, 0L, 0L, None)))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedupParagraphs: first (doc_id, idx) occurrence survives " +
       "corpus-wide, every later copy dropped, ordered reassembly") {
    val d = Seq(
      (0L, "alpha\nshared"),  // introduces both "alpha" and "shared"
      (1L, "shared\nbeta"),   // "shared" is a repeat → dropped
      (2L, "shared\nshared")  // both copies later than doc 0 → all gone
    ).toDF("doc_id", "text")
    val out = TextOps.dedupParagraphs(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 0L, md5Hex("alpha\nshared")),
      (1L, 2L, 1L, md5Hex("beta")),
      (2L, 2L, 2L, md5Hex(""))))
  }

  test("gopherRules: every rule verdict on hand-built documents") {
    val goodText = (Seq.fill(50)("there") ++ Seq("the", "be")).mkString(" ")
    val d = Seq(
      (0L, goodText),                      // passes all seven rules
      (1L, Seq.fill(11)("- x").mkString("\n")), // all-bullet, 22 short words
      (2L, "one two...\nthree..."),        // both lines ellipsis-terminated
      (3L, "1 2 3 4 the be")               // 4/6 words non-alphabetic
    ).toDF("doc_id", "text")
    val rows = TextOps.gopherRules(d).orderBy("doc_id").collect()
    def b(i: Int, c: String) = rows(i).getAs[Boolean](c)
    // doc 0: 52 words, mean len 255/52 ≈ 4.90, 2 distinct stopwords
    assert(rows(0).getAs[Long]("n_words") === 52L)
    assert(b(0, "pass"))
    // doc 1: bullet ratio 11/11 > 0.9; 22 words < 50; mean len < 3
    assert(!b(1, "rule_bullets") && !b(1, "rule_word_count") &&
      !b(1, "rule_mean_word_len") && !b(1, "pass"))
    // doc 2: ellipsis ratio 2/2 > 0.3 and "..." symbols 2/3 > 0.1
    assert(!b(2, "rule_ellipsis") && !b(2, "rule_symbol_ratio") &&
      !b(2, "pass"))
    // doc 3: alpha ratio 2/6 < 0.8 but stopword rule holds (the, be)
    assert(!b(3, "rule_alpha") && b(3, "rule_stopwords") && !b(3, "pass"))
  }
}
