package graft

import graft.operators._

import graft.EntryOracleSql._

/** The `oracleSql` half of the driver contract: DuckDB SQL equivalent to
  * each [[EntryQueries]] entry (column names aligned — the driver's
  * compare sorts columns by name before hashing). Rows-only queries are
  * deliberately absent; see [[SparkEntry]]'s scaladoc.
  */
private[graft] object EntryOracles {

  val all: Map[String, String] = Map(
    "merged_detail" ->
      s"""SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS customer_id,
         |  c.c_name AS name, p.p_partkey AS product_code,
         |  p.p_name AS product_name, p.p_brand AS category,
         |  l.l_extendedprice AS amount
         |$mergedSql
         |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "category_totals" ->
      s"""WITH ct AS ($ctSql)
         |SELECT customer_id, name, category, CAST(amount AS DOUBLE) AS amount
         |FROM ct ORDER BY customer_id, name, category""".stripMargin,

    "flagship_rank" -> flagshipSql,

    "flagship_rank_window" -> flagshipSql,

    "nested_details" ->
      s"""WITH ct AS ($ctSql),
         |r AS (SELECT customer_id, name, category,
         |  COALESCE(CAST(CAST(roundbankers(amount, 2) AS DECIMAL(18,2))
         |    AS VARCHAR), '') AS amt
         |  FROM ct)
         |SELECT customer_id,
         |  string_agg(COALESCE(name, '') || '|' || COALESCE(category, '')
         |      || '|' || amt, ';'
         |    ORDER BY name NULLS FIRST, category NULLS FIRST) AS details
         |FROM r GROUP BY customer_id ORDER BY customer_id""".stripMargin,

    "users_per_type" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Verdict twin of users_per_type (VERDICT r11 item 2): exact count +
    // TRUE — Spark computes within_bound (|HLL − exact|/exact ≤ 0.05)
    // in-plan, so the hash matches iff the sketch held the bound.
    "approx_users_per_type" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "ann_topk_lsh" -> annLshSql,

    "ann_topk_join" -> annJoinSql,

    "ann_topk_lsh_mp" -> annLshMultiProbeSql,

    "ann_topk_ivf" -> annIvfSql,

    "ann_topk_ivf_kmeans" -> annIvfKmeansSql,

    "ann_topk_pq" -> annPqSql,

    "ann_topk_rp" -> annRpSql,

    "ann_topk_ivfpq" -> annIvfPqSql,

    "ann_topk_ivfpq_residual" -> annIvfPqResidualSql,

    "embedding_neardup_lsh" -> embNearDupSql,

    "semantic_dedup" -> semanticDedupSql,

    "contrastive_triplets" -> contrastiveTripletsSql,

    "incremental_neardup" -> incNearDupSql,

    // The incremental edge table must equal the FULL REBUILD on the
    // union snapshot — the oracle IS the rebuild (the neardup_pairs
    // relation, edges only).
    "incremental_edges" ->
      s"""SELECT doc_a, doc_b FROM (
         |$nearDupPairsSql
         |) ORDER BY doc_a, doc_b""".stripMargin,

    "incremental_dedup" -> incDedupSql,

    // Same relation by construction: the bloom pre-screen is exact-
    // composition-preserving, so the sketch path must hash-match the
    // plain anti-join's oracle.
    "incremental_dedup_bloom" -> incDedupSql,

    "source_quota" ->
      """WITH r AS (SELECT lang, source, doc_id,
        |    CAST(length(text) AS BIGINT) AS n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang, source
        |      ORDER BY length(text) DESC, doc_id) AS rank_in_group
        |  FROM documents)
        |SELECT lang, source, doc_id, n_chars, rank_in_group
        |FROM r WHERE rank_in_group <= 3
        |ORDER BY lang NULLS FIRST, source NULLS FIRST, rank_in_group"""
        .stripMargin,

    "canonicalize_text" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN text || ' caf' || 'e' || chr(769)
        |       ELSE text END AS text FROM documents),
        |n AS (SELECT doc_id, nfc_normalize(text) AS c FROM p)
        |SELECT doc_id, CAST(length(c) AS BIGINT) AS n_chars,
        |  md5(c) AS canonical_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    "vocab_topk" ->
      """SELECT token, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,

    // Replays the total-order vocab k-cut, then per-doc OOV counting via
    // a NOT-IN over the vocab CTE; rate is one IEEE division.
    "vocab_coverage" ->
      """WITH v AS (SELECT token FROM (
        |    SELECT token, COUNT(*) AS n
        |    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |          FROM documents)
        |    GROUP BY token ORDER BY n DESC, token LIMIT 100)),
        |t AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |    SUM(CASE WHEN token NOT IN (SELECT token FROM v)
        |        THEN 1 ELSE 0 END) AS n_oov
        |  FROM t GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(c.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(c.n_oov, 0) AS BIGINT) AS n_oov,
        |  CASE WHEN coalesce(c.n_tokens, 0) > 0
        |    THEN CAST(c.n_oov AS DOUBLE) / c.n_tokens END AS oov_rate
        |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "bpe_merges" -> bpeMergesSql,

    "bpe_encode" -> bpeEncodeSql,

    // Reduced modular form mirrors TextOps.knuthBucket — same value as
    // the textbook (id·2654435761)%p form, defined for any 64-bit id.
    "split_assign" ->
      """SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM (SELECT CASE
        |    WHEN doc_id % 1000000007 * 654435747 % 1000000007 % 100 < 90
        |      THEN 'train'
        |    WHEN doc_id % 1000000007 * 654435747 % 1000000007 % 100 < 95
        |      THEN 'val'
        |    ELSE 'test' END AS split, n_chars FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin,

    "corpus_card" ->
      """WITH a AS (SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |    AS total_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  COUNT(DISTINCT source) AS n_sources,
        |  COUNT(DISTINCT md5(lower(trim(text)))) AS n_fingerprints
        |  FROM documents)
        |SELECT n_docs, total_tokens,
        |  CAST(total_tokens AS DOUBLE) / n_docs AS avg_doc_tokens,
        |  n_langs, n_sources, n_fingerprints,
        |  1.0 - CAST(n_fingerprints AS DOUBLE) / n_docs AS exact_dup_rate
        |FROM a""".stripMargin,

    // Exact oracle for the sketch-prescreened heavy hitters: the
    // Misra–Gries candidate set provably contains every token above the
    // n/100 threshold, and the exact re-count filters to precisely this
    // relation — the incremental_dedup_bloom shared-oracle pattern.
    "heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' '))
        |    AS token FROM documents),
        |n AS (SELECT COUNT(*) AS n FROM tok),
        |c AS (SELECT token, COUNT(*) AS n_occurrences FROM tok
        |  GROUP BY token)
        |SELECT c.token, c.n_occurrences FROM c, n
        |WHERE c.n_occurrences * 100 > n.n
        |ORDER BY c.token""".stripMargin,

    "dup_spans" ->
      s"""WITH $dupSpansCteSql
         |SELECT doc_id, span_start, span_len FROM spans
         |ORDER BY doc_id, span_start""".stripMargin,

    "dup_span_clip" ->
      s"""WITH $dupSpansCteSql,
         |tokpos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i,
         |  toks FROM t),
         |tp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM tokpos),
         |cov AS (SELECT doc_id, unnest(range(span_start,
         |  span_start + span_len)) AS pos FROM spans),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp
         |  LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.pos = cov.pos
         |  WHERE cov.pos IS NULL),
         |k AS (SELECT doc_id, COUNT(*) AS kept_tokens,
         |    md5(string_agg(tok, ' ' ORDER BY pos)) AS clipped_md5
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
         |  COALESCE(k.clipped_md5, md5('')) AS clipped_md5
         |FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "dup_span_coverage" -> dupSpanCoverageSql,

    // DSIR importance weights: hashed-bigram buckets (integer value of
    // the first 3 md5 hex digits), fixed-point per-bucket frequency
    // differences, exact per-doc sums — TextOps.importanceWeights
    // integer for integer.
    "importance_weights" -> {
      def nib(k: Int) =
        s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"
      s"""WITH t AS (SELECT doc_id, doc_id % 10 = 0 AS tgt,
         |  string_split(lower(text), ' ') AS toks FROM documents),
         |p AS (SELECT doc_id, tgt, unnest(range(1, len(toks))) AS i, toks
         |  FROM t),
         |hx AS (SELECT doc_id, tgt,
         |  md5(concat_ws(' ', toks[i], toks[i+1])) AS h FROM p),
         |f AS (SELECT doc_id, tgt,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS b FROM hx),
         |tot AS (SELECT SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS nt,
         |  SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS ns FROM f),
         |tc AS (SELECT b, COUNT(*) AS ct FROM f WHERE tgt GROUP BY b),
         |sc AS (SELECT b, COUNT(*) AS cs FROM f WHERE NOT tgt GROUP BY b),
         |r AS (SELECT COALESCE(tc.b, sc.b) AS b,
         |  (COALESCE(tc.ct, 0) * 100000000 // tot.nt)
         |    - (COALESCE(sc.cs, 0) * 100000000 // tot.ns) AS r
         |  FROM tc FULL JOIN sc ON tc.b = sc.b, tot),
         |s AS (SELECT f.doc_id, COUNT(*) AS n_feats,
         |    CAST(SUM(r.r) AS BIGINT) AS importance_fp
         |  FROM f JOIN r ON f.b = r.b WHERE NOT f.tgt GROUP BY f.doc_id)
         |SELECT d.doc_id, COALESCE(s.n_feats, 0) AS n_feats,
         |  COALESCE(s.importance_fp, 0) AS importance_fp,
         |  CAST(s.importance_fp AS DOUBLE) / (s.n_feats * 100000000)
         |    AS avg_importance
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
         |LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // Hashed-feature linear classifier inference: unigram md5 buckets
    // (importance_weights' feature hash), the fixed literal weight
    // formula w(b) = ((b*37+11) % 201) - 100, exact BIGINT logit sums,
    // one final IEEE division - TextOps.classifierScore integer for
    // integer.
    "classifier_score" -> {
      def nib(k: Int) =
        s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |f AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t),
         |b AS (SELECT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS b FROM f),
         |s AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |    CAST(SUM(((b * 37 + 11) % 201) - 100) AS BIGINT) AS logit_fp
         |  FROM b GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(s.n_tokens, 0) AS n_tokens,
         |  COALESCE(s.logit_fp, 0) AS logit_fp,
         |  CAST(s.logit_fp AS DOUBLE) / s.n_tokens AS avg_logit,
         |  COALESCE(s.logit_fp, 0) > 0 AS keep
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // Naive-Bayes classifier training: the deterministic labeled slice
    // (doc_id%5, quality>=0.5), DISTINCT (doc, hex-nibble bucket)
    // presence features, add-one-smoothed integer ppm weights — every
    // step re-derived independently, all-integer.
    "classifier_train" -> {
      def nib(k: Int) =
        s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)
         |  WHERE quality_score IS NOT NULL),
         |t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents WHERE doc_id % 5 = 0),
         |f AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t),
         |b AS (SELECT DISTINCT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS bucket FROM f),
         |l AS (SELECT b.bucket, q.quality_score >= 0.5 AS pos
         |  FROM b JOIN q ON b.doc_id = q.doc_id),
         |c AS (SELECT bucket,
         |    CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
         |    CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS n_neg
         |  FROM l GROUP BY bucket)
         |SELECT bucket, n_pos, n_neg,
         |  (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS w_ppm
         |FROM c ORDER BY bucket""".stripMargin
    },

    // Trained-weight inference: per token the trained bucket weight or
    // the smoothed prior 500000, exact BIGINT per-doc sums, integer
    // keep threshold.
    "classifier_score_trained" -> {
      def nib(k: Int) =
        s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)
         |  WHERE quality_score IS NOT NULL),
         |t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents WHERE doc_id % 5 = 0),
         |f0 AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t0),
         |b0 AS (SELECT DISTINCT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS bucket FROM f0),
         |l AS (SELECT b0.bucket, q.quality_score >= 0.5 AS pos
         |  FROM b0 JOIN q ON b0.doc_id = q.doc_id),
         |w AS (SELECT bucket,
         |    (CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) + 1) * 1000000
         |      // (CAST(COUNT(*) AS BIGINT) + 2) AS w_ppm
         |  FROM l GROUP BY bucket),
         |t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |f AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t),
         |b AS (SELECT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS bucket FROM f),
         |s AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(COALESCE(w.w_ppm, 500000)) AS BIGINT) AS score_fp
         |  FROM b LEFT JOIN w ON b.bucket = w.bucket GROUP BY b.doc_id)
         |SELECT d.doc_id,
         |  COALESCE(s.n_tokens, 0) AS n_tokens,
         |  COALESCE(s.score_fp, 0) AS score_fp,
         |  COALESCE(s.score_fp, 0) > COALESCE(s.n_tokens, 0) * 500000
         |    AS keep
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // Held-out confusion counts: the trained-weight keep decision
    // (replayed as in classifier_score_trained) against the quality
    // label, restricted to the docs outside the training slice.
    "classifier_eval" -> {
      def nib(k: Int) =
        s"(strpos('0123456789abcdef', substr(h, $k, 1)) - 1)"
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)
         |  WHERE quality_score IS NOT NULL),
         |t0 AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents WHERE doc_id % 5 = 0),
         |f0 AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t0),
         |b0 AS (SELECT DISTINCT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS bucket FROM f0),
         |l AS (SELECT b0.bucket, q.quality_score >= 0.5 AS pos
         |  FROM b0 JOIN q ON b0.doc_id = q.doc_id),
         |w AS (SELECT bucket,
         |    (CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) + 1) * 1000000
         |      // (CAST(COUNT(*) AS BIGINT) + 2) AS w_ppm
         |  FROM l GROUP BY bucket),
         |t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |f AS (SELECT doc_id, md5(unnest(toks)) AS h FROM t),
         |b AS (SELECT doc_id,
         |  ${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS bucket FROM f),
         |s AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    CAST(SUM(COALESCE(w.w_ppm, 500000)) AS BIGINT) AS score_fp
         |  FROM b LEFT JOIN w ON b.bucket = w.bucket GROUP BY b.doc_id),
         |pred AS (SELECT d.doc_id,
         |    COALESCE(s.score_fp, 0) > COALESCE(s.n_tokens, 0) * 500000
         |      AS keep
         |  FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id),
         |lab AS (SELECT doc_id, quality_score >= 0.5 AS label FROM q
         |  WHERE doc_id % 5 <> 0)
         |SELECT lab.label, pred.keep, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM lab JOIN pred ON lab.doc_id = pred.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // Fixed-point bigram LM score: integer `(c2·10^8) // c1` per
    // transition, exact BIGINT per-doc sums, one final IEEE division —
    // replaying TextOps.lmScore's arithmetic step for step.
    "lm_score" -> lmScoreSql,

    "key_skew" ->
      """WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem
        |  GROUP BY 1),
        |t AS (SELECT SUM(n) AS total, COUNT(*) AS nkeys FROM c)
        |SELECT c.l_suppkey, c.n,
        |  CAST(c.n AS DOUBLE) / t.total AS share,
        |  CAST(c.n AS DOUBLE) * t.nkeys / t.total AS skew_ratio
        |FROM c, t ORDER BY c.n DESC, c.l_suppkey LIMIT 10""".stripMargin,

    "shuffle_order" ->
      """SELECT doc_id,
        |  md5('graft:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  ROW_NUMBER() OVER (
        |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS position
        |FROM documents ORDER BY position""".stripMargin,

    "simhash_pairs_md5" -> simhashMd5Sql,

    "rolling_fingerprint" -> rollingFingerprintSql,

    "winnow_fingerprints" -> winnowFingerprintsSql,

    "winnow_pairs" ->
      s"""WITH wfp AS (SELECT DISTINCT doc_id, fp
         |  FROM ($winnowFingerprintsSql)),
         |rare AS (SELECT fp FROM (SELECT fp, COUNT(*) AS df FROM wfp
         |  GROUP BY fp) WHERE df BETWEEN 2 AND 10),
         |bl AS (SELECT doc_id, fp FROM wfp JOIN rare USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM bl a JOIN bl b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY 1, 2""".stripMargin,

    "retention_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 604800000 AS bucket FROM events),
        |c AS (SELECT user_id, bucket, MIN(bucket) OVER (
        |    PARTITION BY user_id) AS cohort_bucket FROM a)
        |SELECT cohort_bucket, bucket - cohort_bucket AS bucket_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Fixed-point row-normalized transition matrix: n·10^6 floor-divided
    // by the per-source total (SUM over BIGINT is HUGEINT in DuckDB —
    // cast back), ONE final exact division for the readable double.
    "event_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ms(ts) AS ms FROM events),
        |p AS (SELECT event_type AS src_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS dst_type
        |  FROM e),
        |c AS (SELECT src_type, dst_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM p WHERE dst_type IS NOT NULL GROUP BY 1, 2)
        |SELECT src_type, dst_type, n,
        |  CAST((n * 1000000) // CAST(SUM(n) OVER (
        |    PARTITION BY src_type) AS BIGINT) AS BIGINT) AS prob_fp,
        |  CAST((n * 1000000) // CAST(SUM(n) OVER (
        |    PARTITION BY src_type) AS BIGINT) AS DOUBLE) / 1000000
        |    AS prob
        |FROM c ORDER BY src_type, dst_type""".stripMargin,

    // SCD2 twin: survivors are rows whose value differs from the
    // previous event's (adjacent-equal runs collapse); validity bounds
    // and versions then come from windows over the survivors only.
    "scd2_users" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ms
        |  FROM events),
        |l AS (SELECT user_id, event_id, value, ms, lag(value) OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |s AS (SELECT user_id, event_id, value, ms FROM l
        |  WHERE prev IS NULL OR prev <> value)
        |SELECT user_id, value, ms AS effective_from_ms,
        |  lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |    AS effective_to_ms,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id) AS BIGINT) AS version,
        |  (lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |    IS NULL) AS is_current
        |FROM s ORDER BY user_id, version""".stripMargin,

    "resize_assets" ->
      """WITH n AS (SELECT COUNT(*) AS c FROM documents)
        |SELECT unnest(range((SELECT c FROM n))) AS asset_id,
        |  CAST(1024 AS BIGINT) AS n_bytes
        |ORDER BY asset_id""".stripMargin,

    // Full feature replay: the multimodal_histogram LCG CTE, plus
    // Multimodal.log2Fp's square-and-shift Q40 binary log as a second
    // recursion over the ≤ 513 distinct bin counts (HUGEINT mantissa —
    // the 122-bit intermediate square fits int128), composed into the
    // fixed-point entropy Σ h·(L(512) − L(h)) // 512 and the dense
    // histogram serialized exactly as Spark's to_json.
    "multimodal_features" ->
      """WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
        |ids AS (SELECT unnest(range((SELECT c FROM n))) AS id),
        |g(asset_id, i, x) AS (
        |  SELECT CAST(id AS BIGINT), 0,
        |    CAST((((CAST(id AS HUGEINT) * 6364136223846793005
        |             + 1442695040888963407) % 18446744073709551616)
        |          * 6364136223846793005 + 1442695040888963407)
        |         % 18446744073709551616 AS HUGEINT)
        |  FROM ids
        |  UNION ALL
        |  SELECT asset_id, i + 1,
        |    CAST(((x * 6364136223846793005) % 18446744073709551616
        |          + 1442695040888963407) % 18446744073709551616 AS HUGEINT)
        |  FROM g WHERE i < 511),
        |hist AS (SELECT asset_id,
        |    CAST(x // 1152921504606846976 AS BIGINT) AS bin, COUNT(*) AS h
        |  FROM g GROUP BY 1, 2),
        |bins AS (SELECT CAST(a.id AS BIGINT) AS asset_id, b.bin
        |  FROM ids a, (SELECT CAST(unnest(range(16)) AS BIGINT) AS bin) b),
        |dense AS (SELECT b.asset_id, b.bin, COALESCE(hist.h, 0) AS h
        |  FROM bins b LEFT JOIN hist
        |    ON b.asset_id = hist.asset_id AND b.bin = hist.bin),
        |vals AS (SELECT DISTINCT h AS v FROM hist UNION SELECT 512),
        |p2 AS (SELECT CAST(e AS INT) AS e, CAST(1 AS BIGINT) << CAST(e AS INT) AS pv
        |  FROM (SELECT unnest(range(61)) AS e)),
        |ipart AS (SELECT v, MAX(e) AS ip FROM vals JOIN p2 ON pv <= v
        |  GROUP BY v),
        |lg(v, k, x, frac) AS (
        |  SELECT i.v, 0,
        |    CAST(CAST(i.v AS BIGINT) << (60 - i.ip) AS HUGEINT),
        |    CAST(0 AS BIGINT)
        |  FROM ipart i
        |  UNION ALL
        |  SELECT v, k + 1,
        |    CASE WHEN (x*x) // 1152921504606846976 >= 2305843009213693952
        |         THEN ((x*x) // 1152921504606846976) // 2
        |         ELSE (x*x) // 1152921504606846976 END,
        |    CASE WHEN (x*x) // 1152921504606846976 >= 2305843009213693952
        |         THEN frac * 2 + 1 ELSE frac * 2 END
        |  FROM lg WHERE k < 40),
        |l2 AS (SELECT lg.v,
        |    (CAST(i.ip AS BIGINT) << 40) + lg.frac AS lfp
        |  FROM lg JOIN ipart i ON lg.v = i.v WHERE lg.k = 40),
        |ent AS (SELECT d.asset_id,
        |    CAST(SUM(d.h * (l512.lfp - lh.lfp)) // 512 AS BIGINT)
        |      AS entropy_fp
        |  FROM dense d
        |  JOIN l2 lh ON lh.v = d.h
        |  CROSS JOIN (SELECT lfp FROM l2 WHERE v = 512) l512
        |  WHERE d.h > 0
        |  GROUP BY 1),
        |hj AS (SELECT asset_id,
        |    '[' || string_agg(CAST(h AS VARCHAR), ',' ORDER BY bin) || ']'
        |      AS histogram
        |  FROM dense GROUP BY 1)
        |SELECT e.asset_id,
        |  CASE e.asset_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CAST(512 AS BIGINT) AS n_bytes, e.entropy_fp, hj.histogram
        |FROM ent e JOIN hj ON e.asset_id = hj.asset_id
        |ORDER BY e.asset_id""".stripMargin,

    // Replays Multimodal.synthesize's 64-bit LCG (x' = x·A + C mod 2^64;
    // payload byte i = top byte of iterate i+2) in a recursive CTE with
    // HUGEINT arithmetic — bin = top 4 bits = x div 2^60. Zero-count bins
    // are re-attached via a bins×assets frame, matching the dense 16-slot
    // histogram Spark emits.
    "multimodal_histogram" ->
      """WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
        |ids AS (SELECT unnest(range((SELECT c FROM n))) AS id),
        |g(asset_id, i, x) AS (
        |  SELECT CAST(id AS BIGINT), 0,
        |    CAST((((CAST(id AS HUGEINT) * 6364136223846793005
        |             + 1442695040888963407) % 18446744073709551616)
        |          * 6364136223846793005 + 1442695040888963407)
        |         % 18446744073709551616 AS HUGEINT)
        |  FROM ids
        |  UNION ALL
        |  SELECT asset_id, i + 1,
        |    CAST(((x * 6364136223846793005) % 18446744073709551616
        |          + 1442695040888963407) % 18446744073709551616 AS HUGEINT)
        |  FROM g WHERE i < 511),
        |hist AS (SELECT asset_id,
        |    CAST(x // 1152921504606846976 AS BIGINT) AS bin, COUNT(*) AS h
        |  FROM g GROUP BY 1, 2),
        |bins AS (SELECT CAST(a.id AS BIGINT) AS asset_id, b.bin
        |  FROM ids a, (SELECT CAST(unnest(range(16)) AS BIGINT) AS bin) b)
        |SELECT b.asset_id,
        |  CASE b.asset_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  b.bin, COALESCE(hist.h, 0) AS h
        |FROM bins b LEFT JOIN hist
        |  ON b.asset_id = hist.asset_id AND b.bin = hist.bin
        |ORDER BY b.asset_id, b.bin""".stripMargin,

    "sample_frames" ->
      """WITH n AS (SELECT COUNT(*) AS c FROM documents),
        |ids AS (SELECT unnest(range((SELECT c FROM n))) AS id),
        |vids AS (SELECT id, 16 + (id % 16) AS n_frames FROM ids
        |         WHERE id % 3 = 2),
        |fr AS (SELECT id AS asset_id,
        |  unnest(range(0, n_frames, 4)) AS frame_no FROM vids)
        |SELECT asset_id, frame_no, CAST(256 AS BIGINT) AS n_frame_bytes
        |FROM fr WHERE (frame_no + 1) * 256 <= 4096
        |ORDER BY asset_id, frame_no""".stripMargin,

    "salted_join_agg" ->
      """SELECT s.s_name AS supplier, COUNT(*) AS n_lineitems,
        |  CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
        |    AS DOUBLE) AS revenue
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "audit_uploads" ->
      """SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS id, 'batch_2.xlsx' AS filename,
        |    '2026-01-02T00:00:00' AS "timestamp",
        |    CAST(0 AS BIGINT) AS transactions_rows,
        |    (SELECT COUNT(*) FROM customer) AS customers_rows,
        |    CAST(0 AS BIGINT) AS products_rows
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'batch_1.xlsx', '2026-01-01T00:00:00',
        |    CAST(0 AS BIGINT), (SELECT COUNT(*) FROM customer),
        |    CAST(0 AS BIGINT))
        |ORDER BY "timestamp" DESC, id DESC""".stripMargin,

    // The idempotent-ingest state: batch_1 + a byte-identical dup +
    // batch_2 through the content-digest gate. Expected = exactly two
    // uploads rows (ids dense 1,2 -- the dup allocated NOTHING), counts
    // from the customer table capped at the builder's 200-row slice.
    "audit_ingest_idempotent" ->
      """SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS id, 'batch_2.xlsx' AS filename,
        |    '2026-01-02T00:00:00' AS "timestamp",
        |    CAST(0 AS BIGINT) AS transactions_rows,
        |    (SELECT LEAST(COUNT(*), 200) FROM customer) AS customers_rows,
        |    CAST(0 AS BIGINT) AS products_rows
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), 'batch_1.xlsx', '2026-01-01T00:00:00',
        |    CAST(0 AS BIGINT), (SELECT LEAST(COUNT(*), 200) FROM customer),
        |    CAST(0 AS BIGINT))
        |ORDER BY "timestamp" DESC, id DESC""".stripMargin,

    // Document-landing digest gates: the ledger must hold exactly the
    // two distinct shards (the byte-identical dup allocated nothing)
    // and the ingested per-source counts must equal the documents
    // table — a double-ingest would double every even doc_id's source
    // count.
    "audit_jsonl_idempotent" ->
      """SELECT kind, name, n FROM (
        |  SELECT 'ingested' AS kind, source AS name, COUNT(*) AS n
        |  FROM documents GROUP BY source
        |  UNION ALL
        |  SELECT 'ledger', 'shard_a.jsonl', CAST(NULL AS BIGINT)
        |  UNION ALL
        |  SELECT 'ledger', 'shard_b.jsonl', CAST(NULL AS BIGINT))
        |ORDER BY kind, name""".stripMargin,

    "audit_csv_idempotent" ->
      """SELECT kind, name, n FROM (
        |  SELECT 'ingested' AS kind, source AS name, COUNT(*) AS n
        |  FROM documents GROUP BY source
        |  UNION ALL
        |  SELECT 'ledger', 'shard_a.csv', CAST(NULL AS BIGINT)
        |  UNION ALL
        |  SELECT 'ledger', 'shard_b.csv', CAST(NULL AS BIGINT))
        |ORDER BY kind, name""".stripMargin,

    "audit_address_changes" ->
      """WITH ch AS (
        |  SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS id,
        |    CAST(c_custkey AS VARCHAR) AS customer_id,
        |    c_mktsegment || ' St ' || c_nationkey AS old_address,
        |    c_mktsegment || ' St ' || c_nationkey || 'B' AS new_address,
        |    '2026-01-02T00:00:00' AS change_timestamp,
        |    CAST(2 AS BIGINT) AS upload_id
        |  FROM customer WHERE c_custkey % 3 = 0)
        |SELECT id, customer_id, old_address, new_address, change_timestamp,
        |  upload_id
        |FROM ch ORDER BY change_timestamp DESC, id DESC""".stripMargin,

    "top_spenders" ->
      s"""WITH ct AS ($ctSql),
         |r AS (SELECT category, customer_id, name, amount,
         |  ROW_NUMBER() OVER (PARTITION BY category
         |    ORDER BY amount DESC, customer_id ASC, name ASC) AS rn FROM ct)
         |SELECT category, customer_id, name,
         |  CAST(roundbankers(amount, 2) AS DOUBLE) AS amount
         |FROM r WHERE rn = 1 ORDER BY category""".stripMargin,

    "parse_customers" ->
      """WITH b AS (
        |  SELECT c_custkey, c_custkey || '_' || c_name || '_' ||
        |    lower(c_mktsegment) || '@example.com_' || c_nationkey || '_' ||
        |    c_mktsegment || ' St ' || c_nationkey || '_' ||
        |    (c_custkey * 7) AS core
        |  FROM customer),
        |r AS (
        |  SELECT CASE
        |    WHEN c_custkey % 89 = 0 THEN '{bad_' || c_custkey || '_record}'
        |    WHEN c_custkey % 97 = 0 THEN '{' || core
        |    ELSE '{' || core || '}' END AS line
        |  FROM b),
        |f AS (SELECT trim(line) AS l FROM r
        |      WHERE trim(line) LIKE '{%' AND trim(line) LIKE '%}'),
        |c AS (SELECT substr(l, 2, length(l) - 2) AS content FROM f),
        |p AS (SELECT string_split(content, '_') AS parts FROM c
        |      WHERE len(string_split(content, '_')) = 6)
        |SELECT parts[1] AS customer_id, parts[2] AS name, parts[3] AS email,
        |  parts[4] AS dob, parts[5] AS address, parts[6] AS created_date
        |FROM p ORDER BY CAST(customer_id AS BIGINT)""".stripMargin,

    "cdc_lag" ->
      """SELECT user_id, event_id, old_value, new_value FROM (
        |  SELECT user_id, event_id,
        |    lag(value) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS old_value,
        |    value AS new_value
        |  FROM events)
        |WHERE old_value IS NOT NULL AND old_value <> new_value
        |ORDER BY user_id, event_id""".stripMargin,

    "event_windows" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Width 1h = 2 slides of 30min → every event lands in exactly the
    // window starting at its latest 30-min boundary and the one before.
    "event_windows_hopping" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms, event_type, value
        |  FROM events),
        |w AS (
        |  SELECT (ms // 1800000) * 1800000 AS ws, event_type, value FROM e
        |  UNION ALL
        |  SELECT (ms // 1800000) * 1800000 - 1800000, event_type, value
        |  FROM e)
        |SELECT ws AS window_start_ms, event_type, COUNT(*) AS n_events,
        |  CAST(round(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT user_id, event_id, ms, lag(ms) OVER (
        |  PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, ms, CASE WHEN prev IS NULL
        |  OR ms - prev > 1800000 THEN 1 ELSE 0 END AS flag FROM l),
        |s AS (SELECT user_id, ms, event_id, CAST(SUM(flag) OVER (
        |  PARTITION BY user_id ORDER BY ms, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS session_id FROM f)
        |SELECT user_id, session_id, MIN(ms) AS session_start_ms,
        |  MAX(ms) AS session_end_ms, COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // session_window twin: gap comparisons in MICROSECONDS (Spark merges
    // windows at its internal micros precision and the timestamps carry
    // sub-ms digits); two events exactly `gap` apart MERGE — the merge
    // boundary is inclusive (EventOpsSpec pins this), so the island rule
    // is strict `>`, the same rule as sessionize only in micros.
    "session_windows" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |l AS (SELECT user_id, event_id, us, lag(us) OVER (
        |  PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |f AS (SELECT user_id, us, CASE WHEN prev IS NULL
        |  OR us - prev > 1800000000 THEN 1 ELSE 0 END AS flag FROM l),
        |s AS (SELECT user_id, us, SUM(flag) OVER (
        |  PARTITION BY user_id ORDER BY us
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id,
        |  CAST(MIN(us) // 1000 AS BIGINT) AS session_start_ms,
        |  CAST((MAX(us) + 1800000000) // 1000 AS BIGINT) AS session_end_ms,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
        |  FROM events),
        |s0 AS (SELECT user_id, MIN(ms) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e
        |  JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'click' AND e.ms > s0.t GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, MIN(e.ms) AS t FROM e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ms > s1.t
        |  GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
        |    CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
        |  UNION ALL SELECT CAST(1 AS BIGINT), 'click',
        |    CAST(COUNT(*) AS BIGINT) FROM s1
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'purchase',
        |    CAST(COUNT(*) AS BIGINT) FROM s2)
        |ORDER BY step_idx""".stripMargin,

    "running_total" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY epoch_ms(o_orderdate), o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "category_customers" ->
      s"""SELECT p.p_brand AS category,
         |  COUNT(DISTINCT o.o_custkey) AS n_customers,
         |  COUNT(*) AS n_lineitems
         |$mergedSql
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "customers_without_orders" ->
      """SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND CAST(o.o_orderdate AS DATE)
        |                          >= DATE '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q4 shape: EXISTS replays the left-semi join, epoch-millis lag.
    "order_priority_counts" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND epoch_ms(l.l_shipdate)
        |                      > epoch_ms(o.o_orderdate) + 5184000000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Q16 shape: distinct suppliers per (brand, type), one brand out.
    "brand_supplier_counts" ->
      """SELECT p_brand, p_type,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,

    // Q14 shape: monthly promo revenue share, DECIMAL sums + one IEEE
    // division.
    "promo_revenue_share" ->
      """SELECT epoch_ms(date_trunc('month', l_shipdate)) AS month_ms,
        |  CAST(roundbankers(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END), 2)
        |    AS DOUBLE) AS promo_rev,
        |  CAST(roundbankers(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
        |    AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Q19 shape: OR-of-ANDs disjuncts, single aggregate row.
    "special_revenue" ->
      """SELECT COUNT(*) AS n_items,
        |  CAST(roundbankers(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 30)
        |   OR (p_brand = 'Brand#2' AND p_type IN ('SMALL', 'MEDIUM')
        |       AND l_quantity >= 10)
        |   OR (p_size >= 40 AND l_discount < 0.05)""".stripMargin,

    "event_quantiles" ->
      """SELECT event_type,
        |  roundbankers(quantile_cont(value, 0.5), 4) AS p50,
        |  roundbankers(quantile_cont(value, 0.95), 4) AS p95,
        |  roundbankers(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Verdict twin of event_quantiles (VERDICT r11 item 2): exact
    // percentiles + TRUE — Spark recomputes each approx quantile's
    // achieved RANK in-plan and checks PropertySpec's tolerance
    // (max(0.01, 2/n), +1/n upper step); the hash matches iff every
    // quantile's rank bound held.
    "approx_event_quantiles" ->
      """SELECT event_type,
        |  roundbankers(quantile_cont(value, 0.5), 4) AS p50,
        |  roundbankers(quantile_cont(value, 0.95), 4) AS p95,
        |  roundbankers(quantile_cont(value, 0.99), 4) AS p99,
        |  TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // pivot∘unpivot is lossless: the same wide CTE fanned back out to
    // long form, zero cells kept.
    "events_unpivot" ->
      """WITH w AS (SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1)
        |SELECT user_id, event_type, n_events FROM (
        |  SELECT user_id, 'click' AS event_type, click AS n_events FROM w
        |  UNION ALL SELECT user_id, 'view', view FROM w
        |  UNION ALL SELECT user_id, 'purchase', purchase FROM w
        |  UNION ALL SELECT user_id, 'signup', signup FROM w
        |  UNION ALL SELECT user_id, 'error', error FROM w)
        |ORDER BY user_id, event_type""".stripMargin
  ) ++ EntryOraclesB.all
}
