package graft

import graft.operators._

import graft.EntryOracleSql._

/** Second half of the [[EntryOracles]] DuckDB oracle map (event-time,
  * dedup/graph, text and streaming-adjacent families), split out purely
  * for file-size reviewability — composed back into the single
  * [[SparkEntry.oracleSql]] contract, names unchanged.
  */
private[graft] object EntryOraclesB {

  // Shared by inverted_index and inverted_index_merged (the merge of two
  // disjoint halves must equal the full index).
  private val invertedIndexSql: String =
    """WITH tf AS (SELECT tok, doc_id, COUNT(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |    FROM documents) GROUP BY tok, doc_id),
      |rk AS (SELECT tok, doc_id, tf, ROW_NUMBER() OVER (PARTITION BY tok
      |    ORDER BY tf DESC, doc_id) AS rn FROM tf),
      |p AS (SELECT tok, string_agg(CAST(doc_id AS VARCHAR) || ':' ||
      |    CAST(tf AS VARCHAR), ';' ORDER BY rn) AS postings
      |  FROM rk WHERE rn <= 5 GROUP BY tok),
      |s AS (SELECT tok, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT)
      |    AS total_tf FROM tf GROUP BY tok)
      |SELECT s.tok AS term, s.df, s.total_tf, p.postings
      |FROM s JOIN p ON s.tok = p.tok ORDER BY term""".stripMargin

  // Shared by column_stats and the column_stats_approx verdict twin
  // (exact per-column stats arms, no terminal order).
  private val columnStatsBareSql: String = {
    val numeric = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val strings = Seq("l_returnflag", "l_linestatus")
    val arms =
      numeric.map(c =>
        s"SELECT '$c' AS column_name, COUNT(*) - COUNT($c) AS n_nulls, " +
          s"COUNT(DISTINCT $c) AS ndv, CAST(MIN($c) AS DOUBLE) AS " +
          s"min_num, CAST(MAX($c) AS DOUBLE) AS max_num FROM lineitem") ++
      strings.map(c =>
        s"SELECT '$c', COUNT(*) - COUNT($c), COUNT(DISTINCT $c), " +
          "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM lineitem") ++
      Seq("SELECT 'l_shipdate', COUNT(*) - COUNT(l_shipdate), " +
        "COUNT(DISTINCT l_shipdate), " +
        "CAST(epoch_ms(MIN(l_shipdate)) AS DOUBLE), " +
        "CAST(epoch_ms(MAX(l_shipdate)) AS DOUBLE) FROM lineitem")
    arms.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n)")
  }

  // The composed corpus-production chain (curate v3 gates -> cluster
  // representatives -> decontamination -> temperature mix -> shuffle ->
  // pack), shared by corpus_production, corpus_production_card and
  // export_manifest: every stage is the SAME SQL its standalone oracle
  // row uses, so the three composite oracles stay definitionally in sync
  // with each component AND each other. Ends at CTE `fin`
  // (doc_id, source, quality_score, position, n_tokens, seq_id,
  // seq_offset).
  /** The hashed-feature classifier keep-gate as SQL over `rel` — shared
    * by the chain's `clf` CTE and the epoch oracle's batch-side gate
    * (identical arithmetic over a different document relation).
    */
  private def clfKeepSql(rel: String): String =
    s"""SELECT doc_id FROM (SELECT doc_id,
       |    SUM(((b * 37 + 11) % 201) - 100) AS logit FROM (
       |      SELECT doc_id,
       |        (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 256
       |        + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
       |        + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) AS b
       |      FROM (SELECT doc_id,
       |          md5(unnest(string_split(lower(text), ' '))) AS h
       |        FROM $rel))
       |    GROUP BY doc_id) WHERE logit > 0""".stripMargin

  private val corpusProductionChainSql: String =
    s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
       |l AS (SELECT doc_id, pred_lang FROM ($langIdSql)),
       |band AS (SELECT doc_id FROM ($lengthFilterSql)),
       |reps AS (SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(lower(trim(text)))),
       |dsc AS (SELECT doc_id, dup_frac FROM ($dupSpanCoverageSql)),
       |lm AS (SELECT doc_id, avg_prob FROM ($lmScoreSql)),
       |clf AS (${clfKeepSql("documents")}),
       |cur AS (SELECT d.doc_id, d.source, q.quality_score
       |  FROM documents d
       |  JOIN band USING (doc_id) JOIN q USING (doc_id)
       |  JOIN l USING (doc_id) JOIN reps USING (doc_id)
       |  JOIN dsc USING (doc_id) JOIN lm USING (doc_id)
       |  JOIN clf USING (doc_id)
       |  WHERE q.quality_score >= 0.5 AND l.pred_lang <> 'unknown'
       |    AND dsc.dup_frac <= 0.5 AND lm.avg_prob IS NOT NULL),
       |cl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql)),
       |ddw AS (SELECT cur.doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY cl.cluster
       |    ORDER BY cur.quality_score DESC, cur.doc_id ASC) AS rn
       |  FROM cur JOIN cl ON cur.doc_id = cl.doc_id),
       |dd AS (SELECT cur.* FROM cur
       |  JOIN ddw ON cur.doc_id = ddw.doc_id WHERE ddw.rn = 1),
       |$contamGramsSql,
       |flag AS (SELECT DISTINCT c.doc_id FROM c JOIN hh ON c.g = hh.g),
       |dec AS (SELECT dd.* FROM dd WHERE dd.doc_id % 10 <> 0
       |  AND NOT EXISTS (SELECT 1 FROM flag f WHERE f.doc_id = dd.doc_id)),
       |ps AS (SELECT source, COUNT(*) AS n_docs FROM dec GROUP BY 1),
       |w AS (SELECT source, n_docs,
       |  CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS weight_fp FROM ps),
       |tt AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tot,
       |  CAST(SUM(n_docs) AS BIGINT) AS n FROM w),
       |expd AS (SELECT source,
       |  CAST((weight_fp * 1000000 // tot) * n // 1000000 AS BIGINT)
       |    AS expected_docs FROM w CROSS JOIN tt),
       |r AS (SELECT dec.source, dec.doc_id, dec.quality_score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY dec.source
       |      ORDER BY dec.quality_score DESC, dec.doc_id) AS BIGINT) AS rk
       |  FROM dec),
       |mix AS (SELECT r.doc_id, r.source, r.quality_score
       |  FROM r JOIN expd USING (source) WHERE r.rk <= expd.expected_docs),
       |sh AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id)
       |    AS BIGINT) AS position FROM mix),
       |tok AS (SELECT m.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
       |  FROM mix m JOIN documents d ON m.doc_id = d.doc_id),
       |pk AS (SELECT sh.doc_id, sh.position, tok.n_tokens,
       |    CAST(SUM(tok.n_tokens) OVER (ORDER BY sh.position)
       |      - tok.n_tokens AS BIGINT) AS st
       |  FROM sh JOIN tok ON sh.doc_id = tok.doc_id),
       |fin AS (SELECT m.doc_id, m.source, m.quality_score, pk.position,
       |    pk.n_tokens, pk.st // 2048 AS seq_id, pk.st % 2048 AS seq_offset
       |  FROM mix m JOIN pk ON m.doc_id = pk.doc_id)""".stripMargin

  /** The epoch-advance oracle (see the `incremental_production` entry
    * below). Epoch 1 is [[corpusProductionChainSql]] VERBATIM with its
    * document relation shadowed to the even-id slice — definitionally
    * in sync with `corpus_production`'s oracle; the batch stages are
    * independent SQL re-derivations of each Epoch.advance step.
    */
  private lazy val epochAdvanceSql: String = {
    val gram8 = (0 until 8).map(o => s"toks[i+$o]").mkString(", ")
    val evenChain = corpusProductionChainSql
      .replace("documents", "docs_even").stripPrefix("WITH ")
    s"""WITH docs_even AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
       |docs_odd AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
       |$evenChain,
       |bq AS (SELECT doc_id, quality_score FROM
       |  (${qualityScoreSql.replace("documents", "docs_odd")})),
       |blg AS (SELECT doc_id, pred_lang FROM
       |  (${langIdSql.replace("documents", "docs_odd")})),
       |bclf AS (${clfKeepSql("docs_odd")}),
       |bbnd AS (SELECT t.doc_id FROM
       |  (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
       |     AS n_tokens FROM docs_odd) t,
       |  (SELECT
       |     percentile_disc(0.05) WITHIN GROUP (ORDER BY n_tokens) AS lo,
       |     percentile_disc(0.95) WITHIN GROUP (ORDER BY n_tokens) AS hi
       |   FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
       |     AS n_tokens FROM docs_even)) b
       |  WHERE t.n_tokens >= b.lo AND t.n_tokens <= b.hi),
       |befp AS (SELECT DISTINCT md5(lower(trim(text))) AS fp
       |  FROM docs_even),
       |bex AS (SELECT r.doc_id FROM
       |  (SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS doc_id
       |   FROM docs_odd GROUP BY 1) r
       |  WHERE NOT EXISTS (SELECT 1 FROM befp WHERE befp.fp = r.fp)),
       |wt AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |  FROM documents),
       |wp AS (SELECT doc_id, unnest(range(1, len(toks) - 6)) AS i, toks
       |  FROM wt WHERE len(toks) >= 8),
       |wg AS (SELECT doc_id, i - 1 AS pos,
       |  md5(concat_ws(' ', $gram8)) AS gh FROM wp),
       |wdup AS (SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS nd
       |  FROM wg GROUP BY gh) WHERE nd >= 2),
       |whits AS (SELECT doc_id, pos FROM wg JOIN wdup USING (gh)
       |  WHERE doc_id % 2 = 1),
       |wisl AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (
       |    PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS nw
       |  FROM whits),
       |wisl2 AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS island FROM wisl),
       |wspans AS (SELECT doc_id, island,
       |    CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
       |  FROM wisl2 GROUP BY doc_id, island),
       |bdsc AS (SELECT t.doc_id,
       |    CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / len(t.toks)
       |      AS dup_frac
       |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |    FROM docs_odd) t
       |  LEFT JOIN (SELECT doc_id, SUM(span_len) AS dup_tokens
       |    FROM wspans GROUP BY doc_id) c ON t.doc_id = c.doc_id),
       |ebt AS (SELECT string_split(lower(text), ' ') AS toks
       |  FROM docs_even),
       |ebi AS (SELECT DISTINCT toks[i] || ' ' || toks[i+1] AS bg FROM
       |  (SELECT unnest(range(1, len(toks))) AS i, toks FROM ebt
       |   WHERE len(toks) >= 2)),
       |obi AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] AS bg
       |  FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
       |    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |      FROM docs_odd) WHERE len(toks) >= 2)),
       |blm AS (SELECT DISTINCT doc_id FROM obi JOIN ebi USING (bg)),
       |bcur AS (SELECT o.doc_id, o.source, bq.quality_score
       |  FROM docs_odd o
       |  JOIN bbnd ON o.doc_id = bbnd.doc_id
       |  JOIN bq ON o.doc_id = bq.doc_id
       |  JOIN blg ON o.doc_id = blg.doc_id
       |  JOIN bex ON o.doc_id = bex.doc_id
       |  JOIN bdsc ON o.doc_id = bdsc.doc_id
       |  JOIN bclf ON o.doc_id = bclf.doc_id
       |  JOIN blm ON o.doc_id = blm.doc_id
       |  WHERE bq.quality_score >= 0.5 AND blg.pred_lang <> 'unknown'
       |    AND bdsc.dup_frac <= 0.5),
       |ucl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql)),
       |basecl AS (SELECT DISTINCT cluster FROM ucl WHERE doc_id % 2 = 0),
       |bfree AS (SELECT u.doc_id, u.cluster FROM ucl u
       |  WHERE u.doc_id % 2 = 1 AND NOT EXISTS
       |    (SELECT 1 FROM basecl b WHERE b.cluster = u.cluster)),
       |brepw AS (SELECT c.doc_id, ROW_NUMBER() OVER (
       |    PARTITION BY f.cluster
       |    ORDER BY c.quality_score DESC, c.doc_id ASC) AS rn
       |  FROM bcur c JOIN bfree f ON c.doc_id = f.doc_id),
       |bdd AS (SELECT bcur.* FROM bcur
       |  JOIN brepw ON bcur.doc_id = brepw.doc_id WHERE brepw.rn = 1),
       |ddt AS (SELECT doc_id, doc_id % 10 = 0 AS h,
       |  string_split(lower(text), ' ') AS toks FROM documents),
       |ddg AS (SELECT doc_id, h, unnest(list_distinct(
       |    CASE WHEN len(toks) >= 8 THEN
       |      list_transform(range(1, len(toks) - 6),
       |        i -> md5(concat_ws(' ', $gram8)))
       |    ELSE [] END)) AS g FROM ddt),
       |dflag AS (SELECT DISTINCT dc.doc_id FROM
       |  (SELECT doc_id, g FROM ddg WHERE NOT h) dc
       |  JOIN (SELECT g FROM ddg WHERE h) dh ON dc.g = dh.g),
       |bdec AS (SELECT bdd.* FROM bdd WHERE bdd.doc_id % 10 <> 0
       |  AND NOT EXISTS (SELECT 1 FROM dflag f
       |    WHERE f.doc_id = bdd.doc_id)),
       |bps AS (SELECT source, COUNT(*) AS n_docs FROM bdec GROUP BY 1),
       |ups AS (SELECT COALESCE(p.source, b.source) AS source,
       |    COALESCE(p.n_docs, 0) + COALESCE(b.n_docs, 0) AS n_docs
       |  FROM ps p FULL OUTER JOIN bps b ON p.source = b.source),
       |uw AS (SELECT source, n_docs,
       |  CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
       |    AS weight_fp FROM ups),
       |utt AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tot,
       |  CAST(SUM(n_docs) AS BIGINT) AS n FROM uw),
       |uexpd AS (SELECT source,
       |  CAST((weight_fp * 1000000 // tot) * n // 1000000 AS BIGINT)
       |    AS expected_docs FROM uw CROSS JOIN utt),
       |sel1 AS (SELECT source, COUNT(*) AS n1 FROM mix GROUP BY 1),
       |room AS (SELECT e.source,
       |    GREATEST(e.expected_docs - COALESCE(s.n1, 0), 0) AS r
       |  FROM uexpd e LEFT JOIN sel1 s ON e.source = s.source),
       |br AS (SELECT d.doc_id, d.source, d.quality_score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source
       |      ORDER BY d.quality_score DESC, d.doc_id) AS BIGINT) AS rk
       |  FROM bdec d),
       |badm AS (SELECT br.doc_id, br.source, br.quality_score
       |  FROM br JOIN room ON br.source = room.source
       |  WHERE br.rk <= room.r),
       |n1t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1,
       |  CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t1 FROM fin),
       |bsh AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |    ORDER BY md5('graft:' || CAST(doc_id AS VARCHAR)), doc_id)
       |    AS BIGINT) AS bpos FROM badm),
       |btok AS (SELECT m.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
       |  FROM badm m JOIN docs_odd d ON m.doc_id = d.doc_id),
       |bpk AS (SELECT bsh.doc_id, bsh.bpos, btok.n_tokens,
       |    CAST(SUM(btok.n_tokens) OVER (ORDER BY bsh.bpos)
       |      - btok.n_tokens AS BIGINT) AS st0
       |  FROM bsh JOIN btok ON bsh.doc_id = btok.doc_id),
       |bfin AS (SELECT m.doc_id, m.source, m.quality_score,
       |    n1t.n1 + p.bpos AS position, p.n_tokens,
       |    (n1t.t1 + p.st0) // 2048 AS seq_id,
       |    (n1t.t1 + p.st0) % 2048 AS seq_offset
       |  FROM badm m JOIN bpk p ON m.doc_id = p.doc_id CROSS JOIN n1t)
       |SELECT doc_id, source, quality_score, position, n_tokens,
       |  seq_id, seq_offset, CAST(1 AS BIGINT) AS epoch FROM fin
       |UNION ALL
       |SELECT doc_id, source, quality_score, position, n_tokens,
       |  seq_id, seq_offset, CAST(2 AS BIGINT) AS epoch FROM bfin
       |ORDER BY position""".stripMargin
  }

  val all: Map[String, String] = Map(
    "events_cube" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events)
        |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(roundbankers(SUM(v), 2) AS DOUBLE) AS total_value,
        |  CAST(GROUPING(event_type, day) AS BIGINT) AS level
        |FROM e GROUP BY CUBE(event_type, day)
        |ORDER BY level, event_type NULLS FIRST, day NULLS FIRST"""
        .stripMargin,

    // Exact DECIMAL power sums; variance finished by the identical fixed
    // double expression on both engines.
    "value_variance" ->
      """WITH a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv,
        |    SUM(CAST(value AS DECIMAL(18,4)) *
        |        CAST(value AS DECIMAL(18,4))) AS svv
        |  FROM events GROUP BY 1)
        |SELECT event_type, n, CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS mean,
        |  (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) -
        |   CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) /
        |  (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS var_samp
        |FROM a ORDER BY event_type""".stripMargin,

    "twap_users" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(value AS DECIMAL(18,4)) AS v, epoch_ms(ts) AS ms
        |  FROM events),
        |l AS (SELECT user_id, v, ms, lead(ms) OVER (
        |    PARTITION BY user_id ORDER BY ms, event_id) AS nxt FROM e),
        |i AS (SELECT user_id, v, nxt - ms AS w FROM l
        |  WHERE nxt IS NOT NULL)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(w) AS BIGINT) AS span_ms,
        |  CAST(SUM(v * w) AS DOUBLE) /
        |    CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS twap
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

    // Dense per-user grid via range() (upper-exclusive → b1+1), bucket
    // observations collapsed by (ms, event_id) DESC row_number, forward
    // fill as last_value IGNORE NULLS over the running frame.
    "gapfill_hourly" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    epoch_ms(ts) // 3600000 AS bucket FROM events),
        |lb AS (SELECT user_id, bucket, value FROM (
        |    SELECT user_id, bucket, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, bucket
        |      ORDER BY ms DESC, event_id DESC) AS rn FROM e)
        |  WHERE rn = 1),
        |grid AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
        |  FROM (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
        |    FROM e GROUP BY 1)),
        |j AS (SELECT g.user_id, g.bucket, lb.value FROM grid g
        |  LEFT JOIN lb ON g.user_id = lb.user_id AND g.bucket = lb.bucket)
        |SELECT user_id, bucket,
        |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value,
        |  (value IS NOT NULL) AS is_observed
        |FROM j ORDER BY user_id, bucket""".stripMargin,

    "asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
        |  FROM events WHERE event_type = 'click'),
        |p0 AS (SELECT user_id, epoch_ms(ts) AS ms, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ms(ts)
        |    ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase'),
        |purch AS (SELECT user_id, ms, value FROM p0 WHERE rn = 1)
        |SELECT c.user_id, c.event_id, p.value AS last_purchase
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ms >= p.ms
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "nation_revenue" ->
      """SELECT r.r_name AS region, n.n_name AS nation,
        |  COUNT(*) AS n_lineitems,
        |  CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2)
        |    AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "topk_per_category_agg" ->
      s"""WITH ct AS ($ctSql),
         |r AS (SELECT category, CAST(customer_id AS VARCHAR) AS cid,
         |  CAST(amount AS DOUBLE) AS amt,
         |  ROW_NUMBER() OVER (PARTITION BY category
         |    ORDER BY CAST(amount AS DOUBLE) DESC,
         |             CAST(customer_id AS VARCHAR) ASC) AS rk FROM ct)
         |SELECT category, CAST(rk AS BIGINT) AS rk, cid AS customer_id,
         |  amt AS amount
         |FROM r WHERE rk <= 3 ORDER BY category, rk""".stripMargin,

    "topk_per_category" ->
      s"""WITH ct AS ($ctSql),
         |r AS (SELECT category, customer_id, name, amount,
         |  ROW_NUMBER() OVER (PARTITION BY category
         |    ORDER BY amount DESC, customer_id ASC) AS rk FROM ct)
         |SELECT category, CAST(rk AS BIGINT) AS rk, customer_id, name,
         |  CAST(amount AS DOUBLE) AS amount
         |FROM r WHERE rk <= 3 ORDER BY category, rk""".stripMargin,

    "cdc_state_join" ->
      """WITH thr AS (SELECT MAX(event_id) // 2 AS t FROM events),
        |e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value
        |      FROM events),
        |state AS (SELECT user_id, value FROM (
        |  SELECT e.user_id, e.value, ROW_NUMBER() OVER (
        |    PARTITION BY e.user_id ORDER BY e.ms DESC, e.event_id DESC)
        |    AS rn
        |  FROM e, thr WHERE e.event_id <= thr.t) WHERE rn = 1),
        |batch AS (SELECT e.* FROM e, thr WHERE e.event_id > thr.t),
        |x AS (SELECT b.user_id, b.event_id, COALESCE(
        |    LAG(b.value) OVER (PARTITION BY b.user_id
        |      ORDER BY b.ms, b.event_id), s.value) AS old_value,
        |    b.value AS new_value
        |  FROM batch b LEFT JOIN state s ON b.user_id = s.user_id)
        |SELECT user_id, event_id, old_value, new_value FROM x
        |WHERE old_value IS NOT NULL AND old_value <> new_value
        |ORDER BY user_id, event_id""".stripMargin,

    "dedup_keep_longest" ->
      """WITH k AS (SELECT md5(substr(lower(text), 1, 64)) AS fingerprint,
        |  doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents),
        |w AS (SELECT fingerprint, doc_id, n_chars,
        |  ROW_NUMBER() OVER (PARTITION BY fingerprint
        |    ORDER BY n_chars DESC, doc_id ASC) AS rn,
        |  COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies FROM k)
        |SELECT fingerprint, doc_id, n_chars, n_copies FROM w
        |WHERE rn = 1 ORDER BY fingerprint""".stripMargin,

    "docs_rollup" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS level
        |FROM documents GROUP BY ROLLUP(lang, source)
        |ORDER BY level, lang NULLS FIRST, source NULLS FIRST""".stripMargin,

    // Replays the JSONL landing contract from the parquet originals:
    // doc_id%53 rows were written truncated (never valid JSON — a strict
    // object prefix), so they land in quarantine with every field null;
    // everything else must round-trip character-exactly.
    "jsonl_landing" ->
      """WITH landed AS (
        |  SELECT CASE WHEN doc_id % 53 = 0 THEN NULL ELSE source END AS src,
        |    CASE WHEN doc_id % 53 = 0 THEN NULL ELSE doc_id END AS did,
        |    CASE WHEN doc_id % 53 = 0 THEN NULL ELSE text END AS txt
        |  FROM documents)
        |SELECT src AS source, COUNT(*) AS n_rows, COUNT(txt) AS n_parsed,
        |  CAST(SUM(LENGTH(txt)) AS BIGINT) AS sum_chars,
        |  MIN(did) AS min_doc, MAX(did) AS max_doc
        |FROM landed GROUP BY src ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the CSV landing contract: doc_id%59 rows carry a type
    // violation in n_chars (quarantined but field-locally recovered —
    // their source still groups), clean rows must round-trip exactly.
    "csv_landing" ->
      """SELECT source, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN doc_id % 59 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_quarantined,
        |  CAST(SUM(CASE WHEN doc_id % 59 = 0 THEN NULL
        |    ELSE LENGTH(COALESCE(text, '')) END) AS BIGINT)
        |    AS sum_chars_clean,
        |  CAST(SUM(CASE WHEN doc_id % 59 = 0 THEN NULL
        |    ELSE n_chars END) AS BIGINT) AS sum_n_chars_clean,
        |  MIN(CASE WHEN doc_id % 59 = 0 THEN NULL ELSE doc_id END)
        |    AS min_doc,
        |  MAX(CASE WHEN doc_id % 59 = 0 THEN NULL ELSE doc_id END)
        |    AS max_doc
        |FROM documents GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the two-generation JSONL evolution contract: gen1 = even
    // doc_ids under the base schema (tier absent -> null, parses clean
    // under the superset read), gen2 = odd doc_ids with the
    // deterministic tier and the %53 truncation plant (quarantined
    // whole-row, NULL bucket).
    "jsonl_landing_evolved" ->
      """WITH landed AS (
        |  SELECT
        |    CASE WHEN doc_id % 2 = 1 AND doc_id % 53 = 0 THEN NULL
        |      ELSE source END AS src,
        |    CASE WHEN doc_id % 2 = 1 AND doc_id % 53 = 0 THEN NULL
        |      ELSE doc_id END AS did,
        |    CASE WHEN doc_id % 2 = 1 AND doc_id % 53 = 0 THEN NULL
        |      ELSE text END AS txt,
        |    CASE WHEN doc_id % 2 = 1 AND doc_id % 53 <> 0 THEN
        |      CASE doc_id % 3 WHEN 0 THEN 'high' WHEN 1 THEN 'medium'
        |        ELSE 'low' END
        |      ELSE NULL END AS tier
        |  FROM documents)
        |SELECT src AS source, COUNT(*) AS n_rows, COUNT(txt) AS n_parsed,
        |  COUNT(tier) AS n_with_tier,
        |  CAST(SUM(LENGTH(txt)) AS BIGINT) AS sum_chars,
        |  MIN(did) AS min_doc, MAX(did) AS max_doc
        |FROM landed GROUP BY src ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the two-generation CSV evolution contract: gen1 = even
    // doc_ids (per-generation schema, tier null-filled by the union),
    // gen2 = odd doc_ids with tier and the %59 type plant — quarantined
    // field-locally, so the damaged rows KEEP source and tier.
    "csv_landing_evolved" ->
      """SELECT source, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 AND doc_id % 59 = 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_with_tier,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 AND doc_id % 59 = 0 THEN NULL
        |    ELSE LENGTH(COALESCE(text, '')) END) AS BIGINT)
        |    AS sum_chars_clean,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 AND doc_id % 59 = 0 THEN NULL
        |    ELSE n_chars END) AS BIGINT) AS sum_n_chars_clean,
        |  MIN(CASE WHEN doc_id % 2 = 1 AND doc_id % 59 = 0 THEN NULL
        |    ELSE doc_id END) AS min_doc,
        |  MAX(CASE WHEN doc_id % 2 = 1 AND doc_id % 59 = 0 THEN NULL
        |    ELSE doc_id END) AS max_doc
        |FROM documents GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the three-generation type-change contract, JSONL: gen1 =
    // doc_id%5<2 (base schema), gen2 = %5 in (2,3) (additive tier, %53
    // truncation plant — whole-row quarantine), gen3 = %5=4 (n_chars
    // widened to DOUBLE with the +0.5 fractional payload, same plant).
    // Read under the widened superset schema: integers parse losslessly
    // as doubles, so only gen-3 clean rows count in n_frac.
    "jsonl_landing_retyped" ->
      """WITH landed AS (
        |  SELECT
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 53 = 0 THEN NULL
        |      ELSE source END AS src,
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 53 = 0 THEN NULL
        |      ELSE doc_id END AS did,
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 53 = 0 THEN NULL
        |      ELSE text END AS txt,
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 53 <> 0 THEN
        |      CASE doc_id % 3 WHEN 0 THEN 'high' WHEN 1 THEN 'medium'
        |        ELSE 'low' END
        |      ELSE NULL END AS tier,
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 53 = 0 THEN NULL
        |      WHEN doc_id % 5 = 4 THEN CAST(n_chars AS DOUBLE) + 0.5
        |      ELSE CAST(n_chars AS DOUBLE) END AS nch
        |  FROM documents)
        |SELECT src AS source, COUNT(*) AS n_rows, COUNT(txt) AS n_parsed,
        |  COUNT(tier) AS n_with_tier,
        |  COUNT(CASE WHEN nch <> FLOOR(nch) THEN 1 END) AS n_frac,
        |  CAST(SUM(nch) AS DOUBLE) AS sum_n_chars,
        |  MIN(did) AS min_doc, MAX(did) AS max_doc
        |FROM landed GROUP BY src ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the three-generation type-change contract, CSV: same
    // generation split, %59 'xx' type plant in gen2 AND gen3 —
    // field-locally quarantined (source/tier/doc_id recovered, n_chars
    // null), older generations' n_chars union-cast UP to DOUBLE.
    "csv_landing_retyped" ->
      """WITH landed AS (
        |  SELECT source, doc_id,
        |    (doc_id % 5 >= 2 AND doc_id % 59 = 0) AS bad,
        |    CASE WHEN doc_id % 5 >= 2 THEN
        |      CASE doc_id % 3 WHEN 0 THEN 'high' WHEN 1 THEN 'medium'
        |        ELSE 'low' END
        |      ELSE NULL END AS tier,
        |    CASE WHEN doc_id % 5 >= 2 AND doc_id % 59 = 0 THEN NULL
        |      WHEN doc_id % 5 = 4 THEN CAST(n_chars AS DOUBLE) + 0.5
        |      ELSE CAST(n_chars AS DOUBLE) END AS nch
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN bad THEN 1 END) AS n_quarantined,
        |  COUNT(tier) AS n_with_tier,
        |  COUNT(CASE WHEN NOT bad AND nch <> FLOOR(nch) THEN 1 END)
        |    AS n_frac,
        |  CAST(SUM(CASE WHEN NOT bad THEN nch END) AS DOUBLE)
        |    AS sum_n_chars_clean,
        |  MIN(CASE WHEN NOT bad THEN doc_id END) AS min_doc,
        |  MAX(CASE WHEN NOT bad THEN doc_id END) AS max_doc
        |FROM landed GROUP BY source
        |ORDER BY source NULLS FIRST""".stripMargin,

    // Replays the ENTIRE epoch-advance contract (graft.operators.Epoch)
    // from raw parquet: the full factory chain over the even-id corpus
    // version (epoch 1, verbatim chain SQL over a shadowed document
    // relation) PLUS every batch stage — doc-local gates, the frozen
    // even-corpus length band, exact-fingerprint anti-join,
    // union-window dup-span coverage, even-trained LM scoreability,
    // existing-wins near-dup via the union cluster relation,
    // union-holdout decontamination, quota top-up from union dec
    // counts against epoch-1 selections, epoch-append shuffle
    // positions, and packing extended from the epoch-1 token boundary.
    "incremental_production" -> epochAdvanceSql,

    "stratified_sample" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id % (CASE WHEN lang = 'en' THEN 2 ELSE 4 END) = 0
        |ORDER BY doc_id""".stripMargin,

    // md5-fold XOR digest: the first 15 hex nibbles parsed positionally
    // (DuckDB has no conv(); 16^k weights are exact BIGINT literals),
    // then commutative bit_xor — row order and partitioning free.
    "table_checksum" -> {
      val fold = (0 until 15).map { k =>
        val w = BigInt(16).pow(14 - k)
        s"(CAST(strpos('0123456789abcdef', substr(m, ${k + 1}, 1)) - 1 " +
          s"AS BIGINT) * $w)"
      }.mkString(" +\n        |    ")
      s"""WITH h AS (SELECT source,
         |    $fold AS hh
         |  FROM (SELECT source, md5(concat_ws('|', doc_id,
         |      COALESCE(text, ''), lang, source, n_chars)) AS m
         |    FROM documents))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(bit_xor(hh) AS BIGINT) AS checksum
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // Replays TextOps.tokenEntropy bit-for-bit: the Q40 square-and-
    // shift binary log as a HUGEINT recursion over the distinct token
    // counts (the multimodal_features lg-CTE applied to text), entropy
    // as the integer Σ h·(L(n) − L(h)) // n, then the single IEEE
    // division by 2^40. Mirrors the operator's documented 300k-token
    // domain cap (TokenSummary.EntropyCapTokens): past it the Spark
    // Long accumulator could wrap where HUGEINT does not, so BOTH
    // sides return null rather than risk silent divergence.
    "token_entropy" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  string_split(lower(text), ' ') AS toks FROM documents),
        |hist AS (SELECT doc_id, tok, COUNT(*) AS h FROM
        |    (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
        |nn AS (SELECT doc_id, CAST(SUM(h) AS BIGINT) AS n,
        |    COUNT(*) AS nd FROM hist GROUP BY 1),
        |vals AS (SELECT DISTINCT h AS v FROM hist
        |  UNION SELECT DISTINCT n FROM nn),
        |p2 AS (SELECT CAST(e AS INT) AS e,
        |    CAST(1 AS BIGINT) << CAST(e AS INT) AS pv
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
        |l2 AS (SELECT lg.v, (CAST(i.ip AS BIGINT) << 40) + lg.frac AS lfp
        |  FROM lg JOIN ipart i ON lg.v = i.v WHERE lg.k = 40),
        |ent AS (SELECT hist.doc_id, nn.n, nn.nd,
        |    CASE WHEN nn.n > 300000 THEN NULL ELSE
        |      CAST(SUM(hist.h * (l2n.lfp - l2h.lfp)) // nn.n AS BIGINT)
        |    END AS entropy_fp
        |  FROM hist JOIN nn ON hist.doc_id = nn.doc_id
        |  JOIN l2 l2h ON l2h.v = hist.h
        |  JOIN l2 l2n ON l2n.v = nn.n
        |  GROUP BY 1, 2, 3)
        |SELECT d.doc_id,
        |  CAST(coalesce(e.n, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(e.nd, 0) AS BIGINT) AS n_distinct,
        |  e.entropy_fp,
        |  CAST(e.entropy_fp AS DOUBLE) / 1099511627776.0 AS entropy_bits
        |FROM documents d LEFT JOIN ent e ON d.doc_id = e.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |ta AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    MAX(c) AS top FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c FROM
        |      (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2)
        |  GROUP BY 1),
        |bi AS (SELECT doc_id, len(bg) AS n, len(list_distinct(bg)) AS d
        |  FROM (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN
        |      list_transform(range(1, len(toks)),
        |        i -> concat_ws(' ', toks[i], toks[i+1]))
        |    ELSE [] END AS bg FROM t)),
        |tri AS (SELECT doc_id, len(tg) AS n, len(list_distinct(tg)) AS d
        |  FROM (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    ELSE [] END AS tg FROM t))
        |SELECT ta.doc_id, n_tokens,
        |  CAST(top AS DOUBLE) / n_tokens AS top_token_frac,
        |  CASE WHEN bi.n = 0 THEN 0.0
        |    ELSE CAST(bi.n - bi.d AS DOUBLE) / bi.n END AS dup_bigram_frac,
        |  CASE WHEN tri.n = 0 THEN 0.0
        |    ELSE CAST(tri.n - tri.d AS DOUBLE) / tri.n END
        |    AS dup_trigram_frac
        |FROM ta JOIN bi ON ta.doc_id = bi.doc_id
        |JOIN tri ON ta.doc_id = tri.doc_id
        |ORDER BY ta.doc_id""".stripMargin,

    "top_terms" ->
      """WITH n AS (SELECT COUNT(*) AS n FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM
        |    (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |     FROM documents) GROUP BY 1, 2),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        |r AS (SELECT t.doc_id, t.tok AS term,
        |    CAST(t.tf AS BIGINT) AS tf, CAST(d.df AS BIGINT) AS df,
        |    CAST(t.tf * (n.n - d.df) AS BIGINT) AS score,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY t.tf * (n.n - d.df) DESC, t.tok ASC) AS rn
        |  FROM tf t JOIN df d USING (tok), n)
        |SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3
        |ORDER BY doc_id, score DESC, term""".stripMargin,

    "length_filter" -> lengthFilterSql,

    // Packing twin: one window cumsum (the oracle engine is single-node,
    // so the literal form is fine there), integer div/mod boundaries.
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT)
        |      AS st FROM t)
        |SELECT doc_id, n_tokens, st // 2048 AS seq_id,
        |  st % 2048 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // Chunking twin: same stride arithmetic, 1-based inclusive list_slice.
    // greatest(0, ·) also absorbs the //-floors-toward-negative vs
    // DIV-truncates-toward-zero difference on short docs.
    "chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |    unnest(range(0, greatest(0, (n - 32 + 23) // 24) + 1))
        |      AS chunk_id FROM t)
        |SELECT doc_id, chunk_id,
        |  CAST(len(list_slice(toks, chunk_id * 24 + 1,
        |    least(chunk_id * 24 + 32, n))) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(toks, chunk_id * 24 + 1,
        |    least(chunk_id * 24 + 32, n)), ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "pii_scrub" ->
      s"""WITH $piiAugSql
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextOps.EmailPattern}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextOps.UrlPattern}')) AS BIGINT) AS n_urls,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextOps.PhonePattern}')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '${TextOps.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.UrlPattern}', '<URL>', 'g'),
         |    '${TextOps.PhonePattern}', '<PHONE>', 'g')) AS scrubbed_md5
         |FROM aug ORDER BY doc_id""".stripMargin,

    "url_domains" ->
      s"""WITH $piiAugSql,
         |u AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '${TextOps.UrlPattern}'))
         |      AS url FROM aug)
         |SELECT regexp_extract(url, 'https?://([A-Za-z0-9._-]+)', 1)
         |    AS domain,
         |  CAST(COUNT(*) AS BIGINT) AS n_urls,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays the banner/footer planting, per-line df over md5(trim),
    // NOT-IN anti-join, and ordered string_agg reassembly.
    "strip_boilerplate" ->
      """WITH aug AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'subscribe to our newsletter' || chr(10) ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN chr(10) || 'all rights reserved 2024' ELSE '' END ||
        |    CASE WHEN doc_id % 97 = 0
        |      THEN chr(10) || 'rare footer ' || doc_id ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM aug),
        |f AS (SELECT doc_id, i - 1 AS idx, l[i] AS line,
        |    md5(trim(l[i])) AS lf
        |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
        |        FROM ls)),
        |b AS (SELECT lf FROM (SELECT lf, COUNT(DISTINCT doc_id) AS nd
        |    FROM f GROUP BY 1) WHERE nd > 5),
        |k AS (SELECT doc_id, idx, line FROM f
        |  WHERE lf NOT IN (SELECT lf FROM b)),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |    md5(string_agg(line, chr(10) ORDER BY idx)) AS cleaned_md5
        |  FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM f GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
        |  CAST(coalesce(tot.n_lines, 0) - coalesce(agg.n_kept, 0)
        |    AS BIGINT) AS n_removed,
        |  coalesce(agg.cleaned_md5, md5('')) AS cleaned_md5
        |FROM documents d
        |LEFT JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // First-occurrence paragraph dedup: same planting + line explode as
    // strip_boilerplate, winner per md5(trim(line)) is the two-stage
    // (MIN doc_id, then MIN idx within it) first occurrence,
    // ordered string_agg reassembly of the surviving lines.
    "paragraph_dedup" ->
      """WITH aug AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'subscribe to our newsletter' || chr(10) ELSE '' END ||
        |    text ||
        |    CASE WHEN doc_id % 4 = 0
        |      THEN chr(10) || 'all rights reserved 2024' ELSE '' END ||
        |    CASE WHEN doc_id % 97 = 0
        |      THEN chr(10) || 'rare footer ' || doc_id ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM aug),
        |f AS (SELECT doc_id, i - 1 AS idx, l[i] AS line,
        |    md5(trim(l[i])) AS lf
        |  FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i
        |        FROM ls)),
        |fd AS (SELECT lf, MIN(doc_id) AS d FROM f GROUP BY 1),
        |fw AS (SELECT f.lf, f.doc_id AS d, MIN(f.idx) AS i
        |  FROM f JOIN fd ON f.lf = fd.lf AND f.doc_id = fd.d
        |  GROUP BY 1, 2),
        |k AS (SELECT f.doc_id, f.idx, f.line FROM f JOIN fw
        |  ON f.lf = fw.lf AND f.doc_id = fw.d AND f.idx = fw.i),
        |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
        |    md5(string_agg(line, chr(10) ORDER BY idx)) AS cleaned_md5
        |  FROM k GROUP BY 1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_paras FROM f GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(tot.n_paras, 0) AS BIGINT) AS n_paras,
        |  CAST(coalesce(tot.n_paras, 0) - coalesce(agg.n_kept, 0)
        |    AS BIGINT) AS n_removed,
        |  coalesce(agg.cleaned_md5, md5('')) AS cleaned_md5
        |FROM documents d
        |LEFT JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Gopher §A1.1 rule suite: replays the structure planting, then every
    // signal as list ops over the same token/line splits Spark uses.
    "gopher_rules" ->
      s"""WITH aug AS (SELECT doc_id,
         |    CASE WHEN doc_id % 15 = 0
         |      THEN repeat('- item' || chr(10), 10) ELSE '' END ||
         |    text ||
         |    CASE WHEN doc_id % 21 = 0
         |      THEN ' 0 1 2 3 4 5 6 7 8 9 0 1 2 3 4 5 6 7 8 9'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 6 = 0
         |      THEN chr(10) || 'to be continued...' ELSE '' END AS text
         |  FROM documents),
         |sig AS (SELECT doc_id,
         |    string_split_regex(text, '\\s+') AS w,
         |    string_split(text, chr(10)) AS l,
         |    len(regexp_extract_all(text, '#')) +
         |      len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym
         |  FROM aug),
         |m AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS n_words,
         |    CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
         |      / len(w) AS mean_word_len,
         |    CAST(n_sym AS DOUBLE) / len(w) AS symbol_ratio,
         |    CAST(len(list_filter(l, x -> x LIKE '- %')) AS DOUBLE)
         |      / len(l) AS bullet_ratio,
         |    CAST(len(list_filter(l, x -> x LIKE '%...')) AS DOUBLE)
         |      / len(l) AS ellipsis_ratio,
         |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
         |      AS DOUBLE) / len(w) AS alpha_ratio,
         |    CAST(len(list_intersect(list_distinct(w),
         |      ['the','be','to','of','and','that','have','with']))
         |      AS BIGINT) AS n_stop_distinct
         |  FROM sig)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
         |  ellipsis_ratio, alpha_ratio, n_stop_distinct,
         |  n_words >= 50 AND n_words <= 100000 AS rule_word_count,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AS rule_mean_word_len,
         |  symbol_ratio <= 0.1 AS rule_symbol_ratio,
         |  bullet_ratio <= 0.9 AS rule_bullets,
         |  ellipsis_ratio <= 0.3 AS rule_ellipsis,
         |  alpha_ratio >= 0.8 AS rule_alpha,
         |  n_stop_distinct >= 2 AS rule_stopwords,
         |  (n_words >= 50 AND n_words <= 100000) AND
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AND
         |  symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND
         |  ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8 AND
         |  n_stop_distinct >= 2 AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    "exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS fingerprint, MIN(doc_id) AS doc_id,
        |  COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "prefix_dedup" ->
      """SELECT md5(substr(lower(text), 1, 64)) AS fingerprint,
        |  MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "minhash_signatures" ->
      s"""$shinglesSql
         |SELECT doc_id,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 1, 8)))
         |    AS sig_0,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 9, 8)))
         |    AS sig_1,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 17, 8)))
         |    AS sig_2,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 25, 8)))
         |    AS sig_3
         |FROM sh ORDER BY doc_id""".stripMargin,

    "neardup_pairs" -> nearDupPairsSql,

    "neardup_pairs_banded" -> nearDupPairsBandedSql,

    // The sliced mode computes the IDENTICAL relation (union of
    // band-hash slices + distinct) — same oracle.
    "neardup_pairs_banded_sliced" -> nearDupPairsBandedSql,

    "containment_pairs" -> containmentPairsSql,

    // Bit-interleave replay: sum of shifted masked bits of both inputs.
    "z_order_key" ->
      """SELECT event_id, user_id,
        |  (epoch_ms(ts) // 86400000) AS day,
        |  CAST(list_sum(list_transform(range(0, 21), i ->
        |      (((user_id >> i) & 1) << (2 * i)) +
        |      ((((epoch_ms(ts) // 86400000) >> i) & 1) << (2 * i + 1))))
        |    AS BIGINT) AS z
        |FROM events ORDER BY event_id""".stripMargin,

    // Levenshtein verify joined over the MATERIALIZED LSH pair CTE (two
    // join arms would otherwise re-run the MinHash pipeline twice).
    "edit_distance_pairs" ->
      s"""WITH ndp AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |$nearDupPairsSql
         |))
         |SELECT p.doc_a, p.doc_b,
         |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_distance,
         |  CAST((CAST(levenshtein(a.text, b.text) AS BIGINT) * 1000000)
         |    // GREATEST(length(a.text), length(b.text), 1) AS BIGINT)
         |    AS norm_fp
         |FROM ndp p JOIN documents a ON p.doc_a = a.doc_id
         |JOIN documents b ON p.doc_b = b.doc_id
         |ORDER BY 1, 2""".stripMargin,

    "pagerank_neardup" -> pageRankSql,

    // Unrolled 12-round peel replay (rounds = the operator's maxRounds;
    // fixpoint is stable under extra rounds — see kCoreSql's scaladoc).
    "kcore_graph" -> kCoreSql(2, 12),

    // Round-exact 4-iteration LPA replay (NOT a fixpoint — LPA can
    // oscillate; the fixed round count IS the contract).
    "label_communities" -> labelPropSql(4),

    "weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, len(string_split(text, ' '))
         |    AS n_tokens FROM documents WHERE text IS NOT NULL),
         |h AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS m FROM d WHERE n_tokens > 0),
         |pr AS (SELECT doc_id, n_tokens,
         |    CAST($md5Nibbles12 AS BIGINT) AS hv FROM h)
         |SELECT doc_id, n_tokens, CAST(hv AS DOUBLE) / n_tokens AS priority
         |FROM pr ORDER BY priority, doc_id LIMIT 50""".stripMargin,

    "scd2_enrich" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value
        |  FROM events),
        |chg AS (SELECT user_id, event_id, value, ms,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |      AS prev FROM e),
        |v AS (SELECT user_id, value, ms AS efrom,
        |    lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
        |      AS eto,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS BIGINT) AS version
        |  FROM chg WHERE prev IS NULL OR prev <> value)
        |SELECT e.user_id, e.event_id, e.ms, v.version,
        |  v.value AS dim_value
        |FROM e JOIN v ON e.user_id = v.user_id AND e.ms >= v.efrom
        |  AND (v.eto IS NULL OR e.ms < v.eto)
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    "event_paths" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    event_type FROM events),
        |l AS (SELECT event_type AS step1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS step2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ms, event_id) AS step3
        |  FROM e)
        |SELECT step1, step2, step3, COUNT(*) AS n_paths FROM l
        |WHERE step3 IS NOT NULL GROUP BY 1, 2, 3
        |ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10""".stripMargin,

    // All-integer 3-sigma cross-multiplied predicate — replayed verbatim.
    "hourly_spikes" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |h AS (SELECT user_id, ms // 3600000 AS hr, COUNT(*) AS c
        |  FROM e GROUP BY 1, 2),
        |st AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
        |    CAST(SUM(c * c) AS BIGINT) AS s2
        |  FROM h GROUP BY 1)
        |SELECT h.user_id, h.hr * 3600000 AS bucket_ms, h.c AS n_events,
        |  st.n AS n_hours, st.s AS total_events
        |FROM h JOIN st ON h.user_id = st.user_id
        |WHERE (h.c * st.n - st.s) * (h.c * st.n - st.s)
        |    > 9 * (st.n * st.s2 - st.s * st.s)
        |  AND h.c * st.n > st.s
        |ORDER BY h.user_id, bucket_ms""".stripMargin,

    // Exact-vs-estimate replay over the identical shingle space; the
    // estimate's four components are the md5-slice minima of the
    // minhash_signatures oracle.
    "minhash_est_eval" ->
      s"""$shinglesSql,
         |gd AS (SELECT DISTINCT doc_id, unnest(list_transform(shingles,
         |    s -> md5(s))) AS g FROM sh),
         |rare AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM gd
         |    GROUP BY 1) WHERE df BETWEEN 2 AND 10),
         |bl AS (SELECT gd.doc_id, gd.g FROM gd JOIN rare USING (g)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bl a JOIN bl b ON a.g = b.g AND a.doc_id < b.doc_id),
         |ns AS (SELECT doc_id, COUNT(*) AS n FROM gd GROUP BY 1),
         |iv AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i FROM cand c
         |  JOIN gd ga ON ga.doc_id = c.doc_a
         |  JOIN gd gb ON gb.doc_id = c.doc_b AND ga.g = gb.g
         |  GROUP BY 1, 2),
         |sg AS (SELECT doc_id,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 1, 8)))
         |    AS s0,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 9, 8)))
         |    AS s1,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 17, 8)))
         |    AS s2,
         |  list_min(list_transform(shingles, s -> substr(md5(s), 25, 8)))
         |    AS s3
         |  FROM sh),
         |sc AS (SELECT c.doc_a, c.doc_b,
         |    CAST(iv.i AS DOUBLE) / (na.n + nb.n - iv.i) AS jaccard,
         |    CAST((CASE WHEN a.s0 = b.s0 THEN 1 ELSE 0 END) +
         |         (CASE WHEN a.s1 = b.s1 THEN 1 ELSE 0 END) +
         |         (CASE WHEN a.s2 = b.s2 THEN 1 ELSE 0 END) +
         |         (CASE WHEN a.s3 = b.s3 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_match
         |  FROM cand c
         |  JOIN iv ON c.doc_a = iv.doc_a AND c.doc_b = iv.doc_b
         |  JOIN ns na ON na.doc_id = c.doc_a
         |  JOIN ns nb ON nb.doc_id = c.doc_b
         |  JOIN sg a ON a.doc_id = c.doc_a
         |  JOIN sg b ON b.doc_id = c.doc_b)
         |SELECT doc_a, doc_b, jaccard, n_match,
         |  CAST(n_match AS DOUBLE) / 4 AS est,
         |  abs(jaccard - CAST(n_match AS DOUBLE) / 4) AS abs_err
         |FROM sc WHERE jaccard >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin,

    "column_stats" ->
      s"SELECT * FROM ($columnStatsBareSql) ORDER BY column_name",

    // Verdict twin (VERDICT r11 item 2): the exact stats + TRUE — the
    // Spark side computes within_bound in-plan (|ndv_approx − ndv| ≤
    // max(1, 6·rsd·ndv), ScaleSpec's determinism bound), so the hash
    // matches iff the HLL estimate held the bound for every column.
    "column_stats_approx" ->
      (s"SELECT *, TRUE AS within_bound FROM ($columnStatsBareSql) " +
        "ORDER BY column_name"),

    // Transitive closure over the semantic pair graph, per-cluster
    // membership counts (pvecs is the planted vertex set).
    "semantic_dedup_apply" ->
      s"""WITH RECURSIVE $pvecsSql,
         |sp AS MATERIALIZED (SELECT vec_a, vec_b FROM (
         |$semanticDedupSql
         |)),
         |esym AS (SELECT vec_a AS src, vec_b AS dst FROM sp
         |  UNION ALL SELECT vec_b, vec_a FROM sp),
         |reach(s, d) AS (
         |  SELECT src, dst FROM esym
         |  UNION
         |  SELECT r.s, e.dst FROM reach r JOIN esym e ON r.d = e.src),
         |cl AS (SELECT v.vec_id,
         |    LEAST(v.vec_id, COALESCE(MIN(r.d), v.vec_id)) AS cluster
         |  FROM (SELECT vec_id FROM pvecs) v
         |  LEFT JOIN reach r ON v.vec_id = r.s
         |  GROUP BY v.vec_id)
         |SELECT cluster, COUNT(*) AS n_members FROM cl
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Size histogram over the same transitive-closure clustering.
    "neardup_cluster_sizes" ->
      s"""WITH cl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql)),
         |s AS (SELECT cluster, COUNT(*) AS sz FROM cl GROUP BY 1)
         |SELECT sz, COUNT(*) AS n_clusters FROM s
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Per-source roll-up over the transitive-closure clustering.
    "neardup_rate_by_source" ->
      s"""WITH cl AS (SELECT doc_id, cluster FROM (
         |$nearDupClustersSql
         |))
         |SELECT d.source, COUNT(*) AS n_docs,
         |  COUNT(DISTINCT cl.cluster) AS n_clusters,
         |  1.0 - CAST(COUNT(DISTINCT cl.cluster) AS DOUBLE) / COUNT(*)
         |    AS dup_rate
         |FROM documents d JOIN cl ON d.doc_id = cl.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "decayed_counts" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |t AS (SELECT MAX(ms) AS tm FROM e),
        |w AS (SELECT user_id, (tm - ms) // 3600000 AS h
        |  FROM e CROSS JOIN t),
        |a AS (SELECT user_id, COUNT(*) AS n_events,
        |    CAST(SUM(CASE WHEN h <= 40 THEN
        |      1099511627776 // (CAST(1 AS BIGINT) << CAST(h AS INT))
        |      ELSE 0 END) AS BIGINT) AS decayed_fp
        |  FROM w GROUP BY 1)
        |SELECT user_id, n_events, decayed_fp,
        |  CAST(decayed_fp AS DOUBLE) / 1099511627776.0 AS decayed
        |FROM a ORDER BY user_id""".stripMargin,

    // Ordered wedge join over the a<b SimHash pair list: (a<b)⋈(b<c)
    // closed against (a<c) — each 3-clique exactly once. The pair CTE is
    // MATERIALIZED (three self-join arms would otherwise re-inline the
    // whole 64-bit-sum SimHash pipeline three times). Replays the
    // operator's deterministic degree cap (256 smallest-id neighbors per
    // vertex per orientation — exact at test SFs, a skew bound at scale).
    "triangle_count" ->
      s"""WITH sp0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |$simhashMd5Sql
         |)),
         |sp AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b,
         |    row_number() OVER (PARTITION BY doc_a ORDER BY doc_b) AS ra,
         |    row_number() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rb
         |  FROM sp0)
         |  WHERE ra <= 256 AND rb <= 256),
         |tri AS MATERIALIZED (
         |  SELECT ab.doc_a, ab.doc_b, bc.doc_b AS doc_c
         |  FROM sp ab JOIN sp bc ON ab.doc_b = bc.doc_a
         |  JOIN sp ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
         |n AS (SELECT COUNT(*) AS n_triangles FROM tri)
         |SELECT t.doc_a, t.doc_b, t.doc_c, n.n_triangles
         |FROM tri t CROSS JOIN n
         |ORDER BY 1, 2, 3 LIMIT 10000""".stripMargin,

    // Per-vertex twin: same capped wedge closure, 3-arm UNION ALL of the
    // triangle's member vertices, GROUP BY vertex — replays the
    // explode-and-count aggregate exactly.
    "triangle_counts_by_vertex" ->
      s"""WITH sp0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |$simhashMd5Sql
         |)),
         |sp AS (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b,
         |    row_number() OVER (PARTITION BY doc_a ORDER BY doc_b) AS ra,
         |    row_number() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rb
         |  FROM sp0)
         |  WHERE ra <= 256 AND rb <= 256),
         |tri AS (SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         |  FROM sp ab JOIN sp bc ON ab.doc_b = bc.doc_a
         |  JOIN sp ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b)
         |SELECT doc_id, COUNT(*) AS n_triangles FROM (
         |  SELECT a AS doc_id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Clustering coefficient: same capped graph; degrees from the
    // symmetrized edge list, triangles from the 3-arm union, one IEEE
    // division 2·tri/(deg·(deg−1)).
    "clustering_coeff" ->
      s"""WITH sp0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |$simhashMd5Sql
         |)),
         |sp AS MATERIALIZED (SELECT doc_a, doc_b FROM (
         |  SELECT doc_a, doc_b,
         |    row_number() OVER (PARTITION BY doc_a ORDER BY doc_b) AS ra,
         |    row_number() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rb
         |  FROM sp0)
         |  WHERE ra <= 256 AND rb <= 256),
         |tri AS (SELECT ab.doc_a AS a, ab.doc_b AS b, bc.doc_b AS c
         |  FROM sp ab JOIN sp bc ON ab.doc_b = bc.doc_a
         |  JOIN sp ac ON ac.doc_a = ab.doc_a AND ac.doc_b = bc.doc_b),
         |tc AS (SELECT doc_id, COUNT(*) AS n_triangles FROM (
         |  SELECT a AS doc_id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri) GROUP BY 1),
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM (
         |  SELECT doc_a AS doc_id FROM sp
         |  UNION ALL SELECT doc_b FROM sp) GROUP BY 1)
         |SELECT d.doc_id, d.degree,
         |  COALESCE(tc.n_triangles, 0) AS n_triangles,
         |  CASE WHEN d.degree < 2 THEN 0.0
         |    ELSE CAST(COALESCE(tc.n_triangles, 0) * 2 AS DOUBLE) /
         |      CAST(d.degree * (d.degree - 1) AS DOUBLE) END
         |    AS clustering_coeff
         |FROM deg d LEFT JOIN tc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Degree histogram over the UNCAPPED pair graph (symmetrized edge
    // list → degree per vertex → count per degree).
    "degree_hist" ->
      s"""WITH sp AS (SELECT doc_a, doc_b FROM (
         |$simhashMd5Sql
         |)),
         |deg AS (SELECT doc_id, COUNT(*) AS degree FROM (
         |  SELECT doc_a AS doc_id FROM sp
         |  UNION ALL SELECT doc_b FROM sp) GROUP BY 1)
         |SELECT degree, COUNT(*) AS n_vertices FROM deg
         |GROUP BY 1 ORDER BY degree""".stripMargin,

    // Rare-gram-blocked Jaccard twin: distinct md5 6-gram hashes, DF
    // filter 2..10, blocking self-join, exact Jaccard over full gram sets.
    "jaccard_pairs" -> {
      val gram6 = (0 until 6).map(o => s"toks[i+$o]").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 6 THEN
        |      list_transform(range(1, len(toks) - 4),
        |        i -> md5(concat_ws(' ', $gram6)))
        |    ELSE [] END)) AS g FROM t),
        |rare AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM g GROUP BY 1)
        |  WHERE df BETWEEN 2 AND 10),
        |blocked AS (SELECT doc_id, g.g FROM g JOIN rare USING (g)),
        |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM blocked a JOIN blocked b
        |  ON a.g = b.g AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY 1),
        |inter AS (SELECT c.da, c.db, COUNT(*) AS i
        |  FROM cand c JOIN g x ON x.doc_id = c.da
        |  JOIN g y ON y.doc_id = c.db AND y.g = x.g
        |  GROUP BY 1, 2)
        |SELECT c.da AS doc_a, c.db AS doc_b,
        |  CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS jaccard
        |FROM cand c
        |JOIN sizes sa ON c.da = sa.doc_id
        |JOIN sizes sb ON c.db = sb.doc_id
        |JOIN inter i ON c.da = i.da AND c.db = i.db
        |WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin
    },

    "neardup_clusters" -> nearDupClustersSql,

    // Incremental touched-cluster relabel == the full clustering of the
    // union snapshot, by construction — same oracle relation.
    "incremental_relabel" -> nearDupClustersSql,

    "neardup_clusters_star" -> nearDupClustersSql,

    // Leakage-safe split twin: the transitive-closure clustering wrapped
    // in the split_assign Knuth bucket arithmetic (reduced modular form,
    // mirrors TextOps.knuthBucket), keyed by cluster.
    "cluster_split" ->
      s"""WITH cl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql))
         |SELECT doc_id, cluster,
         |  CASE WHEN cluster % 1000000007 * 654435747 % 1000000007 % 100
         |           < 90 THEN 'train'
         |       WHEN cluster % 1000000007 * 654435747 % 1000000007 % 100
         |           < 95 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM cl ORDER BY doc_id""".stripMargin,

    // Snapshot-diff twin: the same two deterministic snapshot views
    // (old drops %7==1, new drops %7==2 and revises %7==3), digests
    // full-outer-joined on doc_id.
    "snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(coalesce(text, '')) AS fp
        |    FROM documents WHERE doc_id % 7 <> 1),
        |n AS (SELECT doc_id, md5(CASE WHEN doc_id % 7 = 3
        |      THEN coalesce(text, '') || ' [rev2]'
        |      ELSE coalesce(text, '') END) AS fp
        |    FROM documents WHERE doc_id % 7 <> 2)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.fp IS NULL THEN 'added'
        |       WHEN n.fp IS NULL THEN 'removed'
        |       WHEN o.fp <> n.fp THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // Blocklist gate twin: the same 3-word list literal, list_filter
    // count, one IEEE division, same 0.02 verdict threshold.
    "blocklist_filter" ->
      """WITH t AS (SELECT doc_id,
        |    string_split(lower(text), ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks,
        |      x -> list_contains(['slow', 'dup', 'leak'], x)))
        |      AS BIGINT) AS n_flagged
        |  FROM t)
        |SELECT doc_id, n_tokens, n_flagged,
        |  CAST(n_flagged AS DOUBLE) / n_tokens AS flagged_frac,
        |  (CAST(n_flagged AS DOUBLE) / n_tokens) <= 0.02 AS pass
        |FROM s ORDER BY doc_id""".stripMargin,

    // Incremental re-curation twin: the snapshot CTEs feed a dirty set
    // (added/changed), and the blocklist + min-length gates run over
    // ONLY those docs' new text.
    "incremental_curation" ->
      """WITH o AS (SELECT doc_id, md5(coalesce(text, '')) AS fp
        |    FROM documents WHERE doc_id % 7 <> 1),
        |n AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 3
        |      THEN coalesce(text, '') || ' [rev2]'
        |      ELSE text END AS text
        |    FROM documents WHERE doc_id % 7 <> 2),
        |nf AS (SELECT doc_id, text, md5(coalesce(text, '')) AS fp FROM n),
        |diff AS (SELECT COALESCE(o.doc_id, nf.doc_id) AS doc_id,
        |    CASE WHEN o.fp IS NULL THEN 'added'
        |         WHEN nf.fp IS NULL THEN 'removed'
        |         WHEN o.fp <> nf.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN nf ON o.doc_id = nf.doc_id),
        |dirty AS (SELECT d.doc_id, d.status,
        |    string_split(lower(nf.text), ' ') AS toks
        |  FROM diff d JOIN nf ON nf.doc_id = d.doc_id
        |  WHERE d.status IN ('added', 'changed')),
        |g AS (SELECT doc_id, status,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(list_filter(toks,
        |      x -> list_contains(['slow', 'dup', 'leak'], x)))
        |      AS BIGINT) AS n_flagged
        |  FROM dirty)
        |SELECT doc_id, status, n_tokens, n_flagged,
        |  CAST(n_flagged AS DOUBLE) / n_tokens AS flagged_frac
        |FROM g
        |WHERE CAST(n_flagged AS DOUBLE) / n_tokens <= 0.02
        |  AND n_tokens >= 10
        |ORDER BY doc_id""".stripMargin,

    // 8-gram decontamination twin: same md5 gram hashes, same 10% holdout
    // predicate, set-distinct grams per doc before the overlap join.
    "contamination_overlap" ->
      s"""WITH $contamGramsSql
         |SELECT c.doc_id, hh.holdout_id, COUNT(*) AS n_shared
         |FROM c JOIN hh ON c.g = hh.g
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // 3-gram novelty of odd-id docs vs the even-id gram set: distinct
    // md5'd grams (same byte-exact gram recipe as the contamination
    // CTE), LEFT JOIN against the reference set, one IEEE division;
    // docs with < 3 tokens carry null novelty.
    "ngram_novelty" -> {
      val gram3 = (0 until 3).map(o => s"toks[i+$o]").mkString(", ")
      s"""WITH t AS (SELECT doc_id, doc_id % 2 = 0 AS r,
         |  string_split(lower(text), ' ') AS toks FROM documents),
         |g AS (SELECT doc_id, r, unnest(list_distinct(
         |    CASE WHEN len(toks) >= 3 THEN
         |      list_transform(range(1, len(toks) - 1),
         |        i -> md5(concat_ws(' ', $gram3)))
         |    ELSE [] END)) AS g FROM t),
         |inc AS (SELECT doc_id, g FROM g WHERE NOT r),
         |ref AS (SELECT DISTINCT g FROM g WHERE r),
         |s AS (SELECT i.doc_id, COUNT(*) AS n_grams,
         |    SUM(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS n_novel
         |  FROM inc i LEFT JOIN ref ON i.g = ref.g GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
         |  CASE WHEN s.n_grams > 0
         |    THEN CAST(s.n_novel AS DOUBLE) / s.n_grams END AS novelty
         |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
         |WHERE d.doc_id % 2 = 1
         |ORDER BY d.doc_id""".stripMargin
    },

    // minShared = 1, so "flagged" reduces to sharing ANY distinct 8-gram.
    "decontaminate" ->
      s"""WITH $contamGramsSql,
         |flag AS (SELECT DISTINCT c.doc_id FROM c JOIN hh ON c.g = hh.g)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id % 10 <> 0
         |  AND NOT EXISTS (SELECT 1 FROM flag f WHERE f.doc_id = d.doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "epoch_mix" ->
      """WITH n AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END
        |    AS n_epochs
        |  FROM documents)
        |SELECT doc_id, source,
        |  CAST(unnest(range(1, n_epochs + 1)) AS BIGINT) AS epoch
        |FROM n ORDER BY doc_id, epoch""".stripMargin,

    // Keep-one-per-cluster endpoint: the clusters oracle embeds as a CTE,
    // then the same longest-text / doc_id-ascending window picks each
    // cluster's representative.
    "dedup_apply" ->
      s"""WITH cl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql)),
         |k AS (SELECT cl.cluster, cl.doc_id,
         |    CAST(length(d.text) AS BIGINT) AS n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster
         |      ORDER BY length(d.text) DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
         |SELECT cluster, doc_id, n_chars FROM k WHERE rn = 1
         |ORDER BY cluster""".stripMargin,

    "ann_topk" -> annExactSql,

    // Trains the identical exact-DECIMAL(28,14) per-component centroid
    // (the lloydSql mean contract), then ranks ascending centroid-cosine.
    "embedding_outliers" ->
      s"""WITH $vecsSql,
         |m AS (SELECT pos,
         |    CAST(SUM(CAST(v[pos] AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)
         |      AS m
         |  FROM vecs, (SELECT unnest(range(1, ${EmbDim + 1})) AS pos) p
         |  GROUP BY pos),
         |c AS (SELECT list(m ORDER BY pos) AS cv FROM m)
         |SELECT vec_id, label,
         |  roundbankers(${cosSql("v", "cv")}, 6) AS sim_centroid
         |FROM vecs, c
         |ORDER BY sim_centroid ASC, vec_id LIMIT 25""".stripMargin,

    "ann_recall_ivf" ->
      s"""SELECT CAST(10 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  roundbankers(CAST(COUNT(*) AS DOUBLE) / 10, 6) AS recall
         |FROM ($annExactSql) ex
         |JOIN ($annIvfSql) ap ON ex.vec_id = ap.vec_id""".stripMargin,

    "token_stats" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |  FROM documents)
         |SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))
         |    AS BIGINT) AS n_word_pieces,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks)
         |    AS avg_token_len,
         |  CAST(len(list_filter(toks, x -> x IN $enList)) AS DOUBLE) /
         |    len(toks) AS stopword_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         |    AS distinct_ratio
         |FROM t ORDER BY doc_id""".stripMargin,

    // Equi-depth deciles: ntile under the identical TOTAL order
    // (n_tokens, doc_id) — both engines use the standard "first
    // (total mod n) buckets get the extra row" rule, so bin boundaries
    // match exactly. Null texts excluded on both sides.
    "token_deciles" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |d AS (SELECT doc_id, n_tokens, CAST(ntile(10) OVER (
        |    ORDER BY n_tokens, doc_id) AS BIGINT) AS decile FROM t)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,

    "lang_id" -> langIdSql,

    "quality_score" -> qualityScoreSql,

    // Composed curation pass: the component oracles embed as subqueries,
    // so the composite stays definitionally in sync with each piece.
    "curation_pipeline" ->
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
         |l AS (SELECT doc_id, pred_lang FROM ($langIdSql)),
         |band AS (SELECT doc_id FROM ($lengthFilterSql)),
         |reps AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(trim(text))))
         |SELECT d.doc_id, d.lang, d.source, d.n_chars,
         |  q.quality_score, l.pred_lang
         |FROM documents d
         |JOIN band USING (doc_id) JOIN q USING (doc_id)
         |JOIN l USING (doc_id) JOIN reps USING (doc_id)
         |WHERE q.quality_score >= 0.5 AND l.pred_lang <> 'unknown'
         |ORDER BY d.doc_id""".stripMargin,

    // The composed corpus-production chain: every stage is the SAME SQL
    // its standalone oracle row uses (quality/lang/band/reps/dup-span/
    // LM/classifier gates -> cluster representatives among survivors ->
    // 8-gram decontamination -> temperature quotas + quality ranking on
    // the SURVIVING corpus -> md5 shuffle order -> prefix-sum packing in
    // training order). Shared by the per-document row and the card.
    "corpus_production" ->
      s"""$corpusProductionChainSql
       |SELECT doc_id, source, quality_score, position, n_tokens,
       |  seq_id, seq_offset
       |FROM fin ORDER BY position""".stripMargin,

    "corpus_production_card" ->
      s"""$corpusProductionChainSql
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(position) AS first_position, MAX(position) AS last_position
       |FROM fin GROUP BY source ORDER BY source""".stripMargin,

    // Training-shard export manifest (VERDICT r11 item 3): the shard
    // assignment is pure arithmetic on the training order
    // (shard = (position-1)*8 // total), the digest is the
    // table_checksum md5-fold XOR over the long/string columns -- both
    // replayed here from the SAME chain SQL the corpus_production row
    // hashes, so the manifest the factory ships is checked end to end.
    "export_manifest" -> {
      val fold = (0 until 15).map { k =>
        val w = BigInt(16).pow(14 - k)
        s"(CAST(strpos('0123456789abcdef', substr(m, ${k + 1}, 1)) - 1 " +
          s"AS BIGINT) * $w)"
      }.mkString(" +\n        |    ")
      s"""$corpusProductionChainSql,
       |asg AS (SELECT fin.*,
       |    CAST(((position - 1) * 8) // tot.n AS BIGINT) AS shard_id
       |  FROM fin CROSS JOIN (SELECT COUNT(*) AS n FROM fin) tot),
       |h AS (SELECT shard_id, n_tokens, position,
       |    $fold AS hh
       |  FROM (SELECT shard_id, n_tokens, position,
       |      md5(concat_ws('|', doc_id, source, position, n_tokens,
       |        seq_id, seq_offset)) AS m
       |    FROM asg))
       |SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  MIN(position) AS first_position, MAX(position) AS last_position,
       |  CAST(bit_xor(hh) AS BIGINT) AS checksum
       |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "curation_pipeline_v2" ->
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
         |l AS (SELECT doc_id, pred_lang FROM ($langIdSql)),
         |band AS (SELECT doc_id FROM ($lengthFilterSql)),
         |reps AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(trim(text)))),
         |dsc AS (SELECT doc_id, dup_frac FROM ($dupSpanCoverageSql)),
         |lm AS (SELECT doc_id, avg_prob FROM ($lmScoreSql))
         |SELECT d.doc_id, d.lang, d.source, d.n_chars,
         |  q.quality_score, l.pred_lang, dsc.dup_frac, lm.avg_prob
         |FROM documents d
         |JOIN band USING (doc_id) JOIN q USING (doc_id)
         |JOIN l USING (doc_id) JOIN reps USING (doc_id)
         |JOIN dsc USING (doc_id) JOIN lm USING (doc_id)
         |WHERE q.quality_score >= 0.5 AND l.pred_lang <> 'unknown'
         |  AND dsc.dup_frac <= 0.5 AND lm.avg_prob IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,

    // Drop-reason attribution twin: the same six component CTEs
    // left-joined as signals, first-failing-gate CASE in the pipeline's
    // rule order — 'kept' is definitionally curation_pipeline_v2's
    // survivor set.
    "curation_reasons" ->
      s"""WITH q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
         |l AS (SELECT doc_id, pred_lang FROM ($langIdSql)),
         |band AS (SELECT doc_id FROM ($lengthFilterSql)),
         |reps AS (SELECT MIN(doc_id) AS doc_id FROM documents
         |  GROUP BY md5(lower(trim(text)))),
         |dsc AS (SELECT doc_id, dup_frac FROM ($dupSpanCoverageSql)),
         |lm AS (SELECT doc_id, avg_prob FROM ($lmScoreSql))
         |SELECT d.doc_id, d.source,
         |  CASE WHEN band.doc_id IS NULL THEN 'length'
         |       WHEN q.quality_score IS NULL
         |         OR q.quality_score < 0.5 THEN 'quality'
         |       WHEN l.pred_lang IS NULL
         |         OR l.pred_lang = 'unknown' THEN 'language'
         |       WHEN reps.doc_id IS NULL THEN 'duplicate'
         |       WHEN dsc.dup_frac IS NULL
         |         OR dsc.dup_frac > 0.5 THEN 'dup_spans'
         |       WHEN lm.avg_prob IS NULL THEN 'unscoreable'
         |       ELSE 'kept' END AS verdict
         |FROM documents d
         |LEFT JOIN band ON band.doc_id = d.doc_id
         |LEFT JOIN q ON q.doc_id = d.doc_id
         |LEFT JOIN l ON l.doc_id = d.doc_id
         |LEFT JOIN reps ON reps.doc_id = d.doc_id
         |LEFT JOIN dsc ON dsc.doc_id = d.doc_id
         |LEFT JOIN lm ON lm.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // BM25 with the log-free fixed-point scoring formula mirrored
    // operation-for-operation (see TextOps.bm25TopK scaladoc for the
    // derivation); `//` is DuckDB's BIGINT floor division = Spark DIV on
    // the all-positive operands here.
    "bm25_topk" ->
      """WITH tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        |    FROM documents) GROUP BY doc_id, tok),
        |q(query_id, tok) AS (VALUES
        |  ('q_hash_join', 'hash'), ('q_hash_join', 'join'),
        |  ('q_sort_merge', 'sort'), ('q_sort_merge', 'merge'),
        |  ('q_stream_window', 'stream'), ('q_stream_window', 'window'),
        |  ('q_stream_window', 'agg')),
        |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
        |  GROUP BY doc_id),
        |corpus AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
        |  (SELECT COUNT(*) FROM (SELECT
        |     unnest(string_split(lower(text), ' ')) FROM documents)) AS tt),
        |sc AS (SELECT q.query_id, tf.doc_id, COUNT(*) AS n_terms,
        |    CAST(SUM(
        |      (((2 * (n - df) + 1) * 1000000) // (2 * df + 1)) *
        |      ((22000 * tf.tf * 100000) //
        |       (10000 * tf.tf + 3000 + 9 * ((dl.dl * 1000 * n) // tt)))
        |    ) AS BIGINT) AS score_fp
        |  FROM tf JOIN q ON tf.tok = q.tok
        |  JOIN dfreq ON tf.tok = dfreq.tok
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN corpus
        |  GROUP BY q.query_id, tf.doc_id),
        |rk AS (SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score_fp DESC, doc_id) AS rank FROM sc)
        |SELECT query_id, rank, doc_id, n_terms, score_fp,
        |  CAST(score_fp AS DOUBLE) / 100000000000.0 AS score
        |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Candidate histogram over the unfiltered (threshold 64) banded
    // SimHash pair set.
    "simhash_hamming_hist" ->
      s"""WITH sp AS MATERIALIZED (SELECT hamming FROM (
         |${simhashMd5SqlThresh(64)}
         |))
         |SELECT hamming, COUNT(*) AS n_pairs FROM sp
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The window-rank formulation reproduces the TopKAggregator's
    // (tf desc, doc_id asc) posting order exactly.
    "inverted_index" -> invertedIndexSql,

    // The merged-halves query must equal the full index — the mergeable-
    // summary law as a driver-gate row, not just a spec.
    "inverted_index_merged" -> invertedIndexSql,

    "shipping_priority" ->
      """SELECT l.l_orderkey,
        |  epoch_ms(o.o_orderdate) AS o_orderdate_ms,
        |  o.o_orderpriority,
        |  CAST(roundbankers(SUM(CAST(l.l_extendedprice *
        |    (1.0 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
        |  AND CAST(l.l_shipdate AS DATE) > DATE '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,

    "returned_revenue" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  COUNT(*) AS n_items,
        |  CAST(roundbankers(SUM(CAST(l.l_extendedprice *
        |    (1.0 - l.l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,

    "source_drift" ->
      """WITH tk AS (SELECT source,
        |    unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |st AS (SELECT source, tok, COUNT(*) AS c_st FROM tk GROUP BY 1, 2),
        |t AS (SELECT tok, COUNT(*) AS c_t FROM tk GROUP BY 1),
        |ns AS (SELECT source, COUNT(*) AS n_s FROM tk GROUP BY 1),
        |n AS (SELECT COUNT(*) AS nn FROM tk),
        |dense AS (SELECT ns.source, ns.n_s, t.c_t,
        |    COALESCE(st.c_st, 0) AS c_st
        |  FROM ns CROSS JOIN t
        |  LEFT JOIN st ON st.source = ns.source AND st.tok = t.tok),
        |agg AS (SELECT d.source, CAST(MAX(d.n_s) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_terms,
        |    CAST(SUM(abs((c_st * 1000000) // n_s
        |                 - (c_t * 1000000) // nn)) AS BIGINT) AS tv_fp
        |  FROM dense d CROSS JOIN n GROUP BY 1)
        |SELECT source, n_tokens, n_terms, tv_fp,
        |  CAST(tv_fp AS DOUBLE) / 2000000.0 AS tv
        |FROM agg ORDER BY source""".stripMargin,

    // aHash + banding replay over the same recursive-CTE LCG byte
    // generator as multimodal_features (byte i = top byte of iterate
    // i+2); corrupted copies xor bit 7 of byte 7, exactly as
    // Multimodal.corruptCopies does.
    "phash_pairs" ->
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
        |  FROM g WHERE i < 63),
        |b AS (SELECT asset_id, i,
        |    CAST(x // 72057594037927936 AS BIGINT) AS v FROM g),
        |b2 AS (SELECT asset_id + (SELECT c FROM n) AS asset_id, i,
        |    CASE WHEN i = 7 THEN xor(v, 128) ELSE v END AS v
        |  FROM b WHERE asset_id % 5 = 0),
        |allb AS (SELECT * FROM b UNION ALL SELECT * FROM b2),
        |m AS (SELECT asset_id, SUM(v) // 64 AS mean FROM allb GROUP BY 1),
        |h AS (SELECT a.asset_id,
        |    CAST(SUM(CASE WHEN v > mean AND i < 32
        |      THEN (CAST(1 AS BIGINT) << (31 - i)) ELSE 0 END) AS BIGINT)
        |      AS hash_hi,
        |    CAST(SUM(CASE WHEN v > mean AND i >= 32
        |      THEN (CAST(1 AS BIGINT) << (63 - i)) ELSE 0 END) AS BIGINT)
        |      AS hash_lo
        |  FROM allb a JOIN m ON a.asset_id = m.asset_id GROUP BY 1),
        |bands AS (
        |  SELECT asset_id, 0 AS band, hash_hi // 65536 AS bkey FROM h
        |  UNION ALL SELECT asset_id, 1, hash_hi % 65536 FROM h
        |  UNION ALL SELECT asset_id, 2, hash_lo // 65536 FROM h
        |  UNION ALL SELECT asset_id, 3, hash_lo % 65536 FROM h),
        |cand AS (SELECT DISTINCT x.asset_id AS asset_a,
        |    y.asset_id AS asset_b
        |  FROM bands x JOIN bands y ON x.band = y.band
        |    AND x.bkey = y.bkey AND x.asset_id < y.asset_id),
        |sc AS (SELECT c.asset_a, c.asset_b,
        |    CAST(bit_count(xor(ha.hash_hi, hb.hash_hi))
        |       + bit_count(xor(ha.hash_lo, hb.hash_lo)) AS BIGINT)
        |      AS hamming
        |  FROM cand c JOIN h ha ON c.asset_a = ha.asset_id
        |  JOIN h hb ON c.asset_b = hb.asset_id)
        |SELECT asset_a, asset_b, hamming FROM sc WHERE hamming <= 8
        |ORDER BY asset_a, asset_b""".stripMargin,

    // Exact discrete percentiles at binary fractions + the same
    // comparison-chain bucket assignment.
    "range_bounds" -> {
      val bs = (1 to 7).map(i =>
        s"percentile_disc(0.${i * 125}) " +
          s"WITHIN GROUP (ORDER BY l_extendedprice) AS _b$i")
        .mkString(",\n  ")
      val cases = (1 to 7).map(i =>
        s"(CASE WHEN l_extendedprice > _b$i THEN 1 ELSE 0 END)")
        .mkString(" +\n    ")
      s"""WITH b AS (SELECT $bs FROM lineitem),
         |a AS (SELECT l_extendedprice AS v,
         |  CAST($cases AS BIGINT) AS bucket
         |  FROM lineitem CROSS JOIN b)
         |SELECT bucket, COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
         |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    // Quadratic NOT-EXISTS domination check — fine at oracle scale; the
    // Spark side is the two-phase prefix-max skyline.
    "pareto_front" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct,
         |  len(list_filter(toks, x -> x IN $enList)) AS hits FROM t),
         |q AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  (CASE WHEN n_tokens >= 20 THEN 1.0
         |        ELSE n_tokens / 20.0 END) * 0.4 +
         |  (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.4 +
         |  (CASE WHEN CAST(hits AS DOUBLE) / n_tokens > 0.02
         |        THEN 1.0 ELSE 0.0 END) * 0.2 AS quality_score
         |  FROM s),
         |pts AS (SELECT quality_score, n_tokens, COUNT(*) AS n_docs,
         |    MIN(doc_id) AS min_doc_id
         |  FROM q GROUP BY 1, 2)
         |SELECT quality_score, n_tokens, n_docs, min_doc_id FROM pts p
         |WHERE NOT EXISTS (SELECT 1 FROM pts e
         |  WHERE e.quality_score >= p.quality_score
         |    AND e.n_tokens >= p.n_tokens
         |    AND (e.quality_score > p.quality_score
         |         OR e.n_tokens > p.n_tokens))
         |ORDER BY quality_score DESC, n_tokens""".stripMargin,

    // Direct range-predicate join (DuckDB's IEJoin handles it natively);
    // the Spark side's bin-bucketing + distinct lands on the same pairs.
    "session_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT user_id, event_id, ms, lag(ms) OVER (
        |  PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, ms, CASE WHEN prev IS NULL
        |  OR ms - prev > 1800000 THEN 1 ELSE 0 END AS flag FROM l),
        |s AS (SELECT user_id, ms, CAST(SUM(flag) OVER (
        |  PARTITION BY user_id ORDER BY ms, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS session_id FROM f),
        |sess AS (SELECT user_id, session_id, MIN(ms) AS a, MAX(ms) AS b
        |  FROM s GROUP BY 1, 2)
        |SELECT x.user_id AS user_a, x.session_id AS session_a,
        |  y.user_id AS user_b, y.session_id AS session_b,
        |  LEAST(x.b, y.b) - GREATEST(x.a, y.a) AS overlap_ms
        |FROM sess x JOIN sess y ON x.user_id < y.user_id
        |  AND x.a <= y.b AND y.a <= x.b
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "pmi_cooccur" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |pos AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks
        |  FROM t),
        |tk AS (SELECT doc_id, i, toks[i] AS tok FROM pos),
        |pairs AS (SELECT a.tok AS x, b.tok AS y FROM tk a JOIN tk b
        |  ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2),
        |cxy AS (SELECT x, y, COUNT(*) AS c_xy FROM pairs GROUP BY x, y),
        |cx AS (SELECT x, COUNT(*) AS c_x FROM pairs GROUP BY x),
        |cy AS (SELECT y, COUNT(*) AS c_y FROM pairs GROUP BY y),
        |n AS (SELECT COUNT(*) AS np FROM pairs)
        |SELECT x, y, c_xy, c_x, c_y,
        |  (c_xy * np * 1000000) // (c_x * c_y) AS pmi_fp,
        |  (CAST(c_xy AS DOUBLE) * np) / (CAST(c_x AS DOUBLE) * c_y)
        |    AS pmi_ratio
        |FROM cxy JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN n
        |WHERE c_xy >= 50 ORDER BY x, y""".stripMargin,

    // ---- Data-mixing / curation additions (round 8, second wave) --------

    "source_temperature" ->
      """WITH ps AS (SELECT source, COUNT(*) AS n_docs FROM documents
        |  GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |  CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
        |    AS weight_fp FROM ps),
        |t AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tot,
        |  CAST(SUM(n_docs) AS BIGINT) AS n FROM w)
        |SELECT source, n_docs, weight_fp,
        |  CAST(weight_fp * 1000000 // tot AS BIGINT) AS p_ppm,
        |  CAST((weight_fp * 1000000 // tot) * n // 1000000 AS BIGINT)
        |    AS expected_docs
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin,

    "zscore_by_source" ->
      """WITH st AS (SELECT source, COUNT(*) AS n, SUM(n_chars) AS s1,
        |    SUM(n_chars * n_chars) AS s2 FROM documents GROUP BY 1),
        |sd AS (SELECT source, n, s1,
        |  CAST(FLOOR(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE))) AS BIGINT)
        |    AS sd_fp FROM st)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CASE WHEN sd_fp = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(SIGN(d.n_chars * n - s1) AS BIGINT) *
        |      CAST(ABS(d.n_chars * n - s1) * 1000000 // sd_fp AS BIGINT)
        |  END AS z_ppm
        |FROM documents d JOIN sd USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    "ccnet_buckets" ->
      s"""WITH lm AS (SELECT doc_id, n_bigrams, prob_fp_sum FROM
         |($lmScoreSql)),
         |s AS (SELECT doc_id, CASE WHEN n_bigrams = 0
         |    THEN CAST(-1 AS BIGINT)
         |    ELSE CAST(prob_fp_sum // n_bigrams AS BIGINT) END
         |    AS score_fp FROM lm),
         |j AS (SELECT d.doc_id, d.lang, s.score_fp
         |  FROM documents d JOIN s USING (doc_id)),
         |t AS (SELECT doc_id, lang, score_fp,
         |  NTILE(3) OVER (PARTITION BY lang
         |    ORDER BY score_fp DESC, doc_id) AS terc FROM j)
         |SELECT doc_id, lang, score_fp,
         |  CASE terc WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket
         |FROM t ORDER BY doc_id""".stripMargin,

    "length_histogram" ->
      """WITH mm AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi
        |  FROM documents)
        |SELECT CAST(LEAST(15, (n_chars - lo) * 16 // (hi - lo + 1))
        |    AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
        |  MAX(n_chars) AS max_chars
        |FROM documents CROSS JOIN mm
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    "dedup_keep_best" ->
      s"""WITH cl AS (SELECT doc_id, cluster FROM ($nearDupClustersSql)),
         |q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
         |k AS (SELECT cl.cluster, cl.doc_id, q.quality_score,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster
         |      ORDER BY q.quality_score DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN q ON cl.doc_id = q.doc_id)
         |SELECT cluster, doc_id, quality_score FROM k WHERE rn = 1
         |ORDER BY cluster""".stripMargin,

    "moving_avg_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CAST(value AS DECIMAL(18,4)) AS v FROM events),
        |w AS (SELECT event_id, user_id, ms,
        |    COUNT(*) OVER win AS win_n, SUM(v) OVER win AS s
        |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ms
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ms, win_n,
        |  CAST(s AS DOUBLE) AS win_sum,
        |  CAST(s AS DOUBLE) / CAST(win_n AS DOUBLE) AS moving_avg
        |FROM w ORDER BY event_id""".stripMargin,

    // json_valid + TRY_CAST replay the operator's malformed-degrades-to-
    // null contract (from_json PERMISSIVE): a bad payload must compare
    // as NULL, never crash the oracle side of the gate.
    "json_props" ->
      """SELECT event_id, event_type,
        |  CASE WHEN props IS NOT NULL AND json_valid(props)
        |    THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT) END AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "mix_manifest" ->
      s"""WITH ps AS (SELECT source, COUNT(*) AS n_docs FROM documents
         |  GROUP BY 1),
         |w AS (SELECT source, n_docs,
         |  CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
         |    AS weight_fp FROM ps),
         |t AS (SELECT CAST(SUM(weight_fp) AS BIGINT) AS tot,
         |  CAST(SUM(n_docs) AS BIGINT) AS n FROM w),
         |exp AS (SELECT source,
         |  CAST((weight_fp * 1000000 // tot) * n // 1000000 AS BIGINT)
         |    AS expected_docs FROM w CROSS JOIN t),
         |q AS (SELECT doc_id, quality_score FROM ($qualityScoreSql)),
         |r AS (SELECT d.source, d.doc_id, q.quality_score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY d.source
         |      ORDER BY q.quality_score DESC, d.doc_id) AS BIGINT) AS rk
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT r.doc_id, r.source, r.quality_score, r.rk
         |FROM r JOIN exp USING (source)
         |WHERE r.rk <= exp.expected_docs
         |ORDER BY r.doc_id""".stripMargin,

    "json_props_rollup" ->
      """WITH p AS (SELECT event_type,
        |    CASE WHEN props IS NOT NULL AND json_valid(props)
        |      THEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
        |    END AS k FROM events)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_props,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k,
        |  MAX(k) AS max_k,
        |  CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE)
        |    AS avg_k
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

