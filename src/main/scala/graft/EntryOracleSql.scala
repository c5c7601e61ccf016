package graft

import graft.operators._

/** The DuckDB SQL snippet library behind [[EntryOracles]]: shared CTE
  * fragments and generated oracle builders (LSH planes, k-means Lloyd
  * rounds, PQ codebooks, BPE merge chains, …). Pure string constants —
  * no Spark here.
  */
private[graft] object EntryOracleSql {

  // ---- DuckDB oracle SQL ----------------------------------------------
  // Every registry query carries an oracle (the rows-only set is empty
  // since round 12): the three sketch rows (approx_users_per_type,
  // approx_event_quantiles, column_stats_approx) output their exact
  // twin's columns + an in-plan within_bound verdict, and their oracles
  // replay the exact twin + TRUE.
  // The xxhash64 simhash pair search ships as Dedup.simhashPairs + a
  // DedupSpec equivalence pin, with the md5-sliced simhash_pairs_md5
  // registry row carrying the oracle. multimodal_features is oracle-checked via
  // the LCG replay + Q40 fixed-point entropy (and the mod-2^64
  // rolling_fingerprint via HUGEINT arithmetic). The approximate ANN
  // paths (ann_topk_lsh / ann_topk_ivf / ann_topk_ivf_kmeans /
  // embedding_neardup_lsh) ARE oracle-checked: their hyperplanes/centroids
  // are deterministic (k-means trains with order-free DECIMAL means), so
  // the generated SQL below reproduces them bit-for-bit.

  private[graft] val mergedSql =
    """FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin

  private[graft] val ctSql =
    s"""SELECT o.o_custkey AS customer_id, c.c_name AS name,
       |  p.p_brand AS category,
       |  SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS amount
       |$mergedSql
       |GROUP BY 1, 2, 3""".stripMargin

  /** SQL twin of [[piiDocs]]'s deterministic contact planting. */
  private[graft] val piiAugSql =
    """aug AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 7 = 0
      |    THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |    THEN ' via https://site' || (doc_id % 50) || '.example.org/p/' ||
      |      doc_id ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0
      |    THEN ' call 555-' ||
      |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199'
      |    ELSE '' END AS text
      |  FROM documents)""".stripMargin

  private[graft] val shinglesSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS tokens
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(tokens) >= 3
      |    THEN list_transform(range(1, len(tokens) - 1),
      |      i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
      |    ELSE [] END) AS shingles
      |  FROM t)""".stripMargin

  /** Band-minima CTE over `sh` — shared by every MinHash oracle. */
  private[graft] val minhashBandsSql: String =
    """bands AS (
      |  SELECT doc_id, 0 AS band,
      |    list_min(list_transform(shingles, s -> substr(md5(s), 1, 8)))
      |    AS sig FROM sh
      |  UNION ALL SELECT doc_id, 1,
      |    list_min(list_transform(shingles, s -> substr(md5(s), 9, 8)))
      |    FROM sh
      |  UNION ALL SELECT doc_id, 2,
      |    list_min(list_transform(shingles, s -> substr(md5(s), 17, 8)))
      |    FROM sh
      |  UNION ALL SELECT doc_id, 3,
      |    list_min(list_transform(shingles, s -> substr(md5(s), 25, 8)))
      |    FROM sh)""".stripMargin

  /** Candidate verification tail shared by the MinHash pair oracles:
    * exact Jaccard over the distinct-shingle sets of a `cand(da, db)`
    * CTE, emitted as (`aName`, `bName`, jaccard) ≥ 0.5.
    */
  private[graft] def jaccardVerifySql(aName: String, bName: String): String =
    s"""sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |shing AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |inter AS (SELECT c.da, c.db, COUNT(*) AS i
       |  FROM cand c JOIN shing x ON x.doc_id = c.da
       |  JOIN shing y ON y.doc_id = c.db AND y.s = x.s
       |  GROUP BY 1, 2)
       |SELECT c.da AS $aName, c.db AS $bName,
       |  CAST(COALESCE(i.i, 0) AS DOUBLE) /
       |    (sa.n + sb.n - COALESCE(i.i, 0)) AS jaccard
       |FROM cand c
       |JOIN sizes sa ON c.da = sa.doc_id
       |JOIN sizes sb ON c.db = sb.doc_id
       |LEFT JOIN inter i ON c.da = i.da AND c.db = i.db
       |WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) /
       |  (sa.n + sb.n - COALESCE(i.i, 0)) >= 0.5
       |ORDER BY $aName, $bName""".stripMargin

  /** Containment twin of the pair oracle: same band candidates, both
    * asymmetric i/|A| and i/|B| directions, either ≥ 0.8 keeps the pair.
    */
  private[graft] val containmentPairsSql: String =
    s"""$shinglesSql,
       |$minhashBandsSql,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |shing AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
       |inter AS (SELECT c.da, c.db, COUNT(*) AS i
       |  FROM cand c JOIN shing x ON x.doc_id = c.da
       |  JOIN shing y ON y.doc_id = c.db AND y.s = x.s
       |  GROUP BY 1, 2)
       |SELECT c.da AS doc_a, c.db AS doc_b,
       |  CAST(COALESCE(i.i, 0) AS DOUBLE) / sa.n AS containment_a,
       |  CAST(COALESCE(i.i, 0) AS DOUBLE) / sb.n AS containment_b,
       |  CAST(COALESCE(i.i, 0) AS DOUBLE) /
       |    (sa.n + sb.n - COALESCE(i.i, 0)) AS jaccard
       |FROM cand c
       |JOIN sizes sa ON c.da = sa.doc_id
       |JOIN sizes sb ON c.db = sb.doc_id
       |LEFT JOIN inter i ON c.da = i.da AND c.db = i.db
       |WHERE CAST(COALESCE(i.i, 0) AS DOUBLE) / sa.n >= 0.8
       |   OR CAST(COALESCE(i.i, 0) AS DOUBLE) / sb.n >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash-LSH near-dup pair oracle — also embedded as the edge set of
    * the `neardup_clusters` transitive-closure oracle.
    */
  private[graft] val nearDupPairsSql: String =
    s"""$shinglesSql,
       |$minhashBandsSql,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |${jaccardVerifySql("doc_a", "doc_b")}""".stripMargin

  /** b×r banding twin of [[nearDupPairsSql]] (b=2 bands of r=2
    * concatenated slice minima — candidate iff BOTH minima of some band
    * collide).
    */
  private[graft] val nearDupPairsBandedSql: String =
    s"""$shinglesSql,
       |bands2 AS (
       |  SELECT doc_id, 0 AS band,
       |    list_min(list_transform(shingles, s -> substr(md5(s), 1, 8))) ||
       |    list_min(list_transform(shingles, s -> substr(md5(s), 9, 8)))
       |    AS sig FROM sh
       |  UNION ALL SELECT doc_id, 1,
       |    list_min(list_transform(shingles, s -> substr(md5(s), 17, 8))) ||
       |    list_min(list_transform(shingles, s -> substr(md5(s), 25, 8)))
       |    FROM sh),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands2 a JOIN bands2 b
       |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |${jaccardVerifySql("doc_a", "doc_b")}""".stripMargin

  /** Cross-corpus twin of [[nearDupPairsSql]]: incoming (odd) bands join
    * existing (even) bands instead of the `<` self-join.
    */
  private[graft] val incNearDupSql: String =
    s"""$shinglesSql,
       |$minhashBandsSql,
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.sig = b.sig
       |  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0),
       |${jaccardVerifySql("inc_id", "ex_id")}""".stripMargin

  /** Transitive closure over the (deterministic) near-dup pair graph:
    * symmetric edges, recursive reachability (UNION dedupe terminates
    * it), cluster = min reachable doc_id, singletons via the left join.
    * Also embedded as the cluster CTE of the `dedup_apply` oracle.
    */
  /** Fixed-point PageRank twin: replays [[graft.operators.Dedup
    * .pageRank]]'s 4 BSP rounds over the near-dup pair graph as a CTE
    * chain — every division a positive floor division (`//` here, `div`
    * in Spark), sums over exact BIGINTs (cast back from DuckDB's
    * HUGEINT), so both engines produce identical integers. `adj` and the
    * pair CTE are MATERIALIZED: four rounds would otherwise re-inline
    * the whole MinHash-LSH pair search per stage.
    */
  private[graft] val pageRankSql: String = {
    val S = 1000000000000L
    val stages = (1 to 4).map { k =>
      s"""p$k AS MATERIALIZED (SELECT a.dst AS v, CAST(
         |    (15 * $S) // (100 * (SELECT nn FROM nv)) +
         |    (85 * SUM(p.p // a.d)) // 100 AS BIGINT) AS p
         |  FROM adj a JOIN p${k - 1} p ON a.src = p.v GROUP BY a.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pr0 AS MATERIALIZED (SELECT doc_a, doc_b FROM (
       |$nearDupPairsSql
       |)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr0
       |  UNION ALL SELECT doc_b, doc_a FROM pr0),
       |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
       |adj AS MATERIALIZED (SELECT e.src, e.dst, d.d FROM edges e
       |  JOIN deg d ON e.src = d.src),
       |nv AS (SELECT COUNT(DISTINCT src) AS nn FROM adj),
       |p0 AS (SELECT DISTINCT src AS v,
       |    CAST($S // (SELECT nn FROM nv) AS BIGINT) AS p FROM adj),
       |$stages
       |SELECT v AS doc_id, p AS pr_fp, CAST(p AS DOUBLE) / $S AS pr
       |FROM p4 ORDER BY pr_fp DESC, doc_id""".stripMargin
  }

  private[graft] val nearDupClustersSql: String =
    s"""WITH RECURSIVE edges AS (SELECT doc_a, doc_b FROM (
       |$nearDupPairsSql
       |)),
       |esym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |  UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach(s, d) AS (
       |  SELECT src, dst FROM esym
       |  UNION
       |  SELECT r.s, e.dst FROM reach r JOIN esym e ON r.d = e.src),
       |v AS (SELECT doc_id FROM documents)
       |SELECT v.doc_id,
       |  LEAST(v.doc_id, COALESCE(MIN(r.d), v.doc_id)) AS cluster
       |FROM v LEFT JOIN reach r ON v.doc_id = r.s
       |GROUP BY v.doc_id ORDER BY v.doc_id""".stripMargin

  // One SQL for both rank-path variants: flagship_rank (two-phase scale
  // path) and flagship_rank_window (literal W1 window) must produce the
  // identical relation.
  private[graft] val flagshipSql =
    s"""WITH ct AS ($ctSql),
       |s AS (SELECT customer_id, name, roundbankers(SUM(amount), 2) AS amt
       |      FROM ct GROUP BY 1, 2)
       |SELECT customer_id, name, CAST(amt AS DOUBLE) AS amount,
       |  CAST(DENSE_RANK() OVER (ORDER BY amt DESC) AS INT) AS "rank"
       |FROM s ORDER BY "rank", customer_id""".stripMargin

  /** Generated oracle for the portable md5-nibble SimHash: 64 per-bit ±1
    * sums from the first 16 hex nibbles of each distinct token's md5,
    * packed into four 16-bit band keys, banded pair join, Hamming via
    * bit_count(xor). Mirrors [[graft.operators.Dedup.simhashPairsPortable]]
    * integer-for-integer.
    */
  private[graft] val simhashMd5Sql: String = simhashMd5SqlThresh(3)

  /** Threshold-parameterized variant (the default-3 form is the oracle
    * for the pair queries; 64 disables the filter for the candidate
    * Hamming histogram).
    */
  private[graft] def simhashMd5SqlThresh(maxHamming: Int): String = {
    val nibDefs = (0 until 16).map(k =>
      s"strpos('0123456789abcdef', substr(md5(tok), ${k + 1}, 1)) - 1 AS nib$k")
      .mkString(", ")
    val bitSums = (0 until 64).map { i =>
      s"SUM(CASE WHEN (nib${i / 4} & ${1 << (i % 4)}) != 0 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(", ")
    val chunkDefs = (0 until 4).map { c =>
      (0 until 16).map(j =>
        s"(CASE WHEN b${c * 16 + j} > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ") + s" AS chunk_$c"
    }.mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, chunk_0, chunk_1, chunk_2, chunk_3, $b AS band, chunk_$b AS bkey FROM sig")
      .mkString(" UNION ALL ")
    val ham = (0 until 4).map(c =>
      s"bit_count(xor(a.chunk_$c, b.chunk_$c))").mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
       |  unnest(list_distinct(string_split(lower(text), ' '))) AS tok
       |  FROM documents),
       |n AS (SELECT doc_id, $nibDefs FROM t),
       |b AS (SELECT doc_id, $bitSums FROM n GROUP BY doc_id),
       |sig AS (SELECT doc_id, $chunkDefs FROM b),
       |banded AS ($bands),
       |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($ham AS BIGINT) AS hamming
       |  FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Unrolled k-core peel replay over the SimHash pair graph — one
    * degree-filter + edge-semi-join CTE pair per round, like the BPE
    * 16-stage merge chain. `rounds` must equal the operator's maxRounds:
    * the Spark loop proves fixpoint-within-budget (it throws otherwise),
    * and a fixpoint is stable under extra rounds, so replaying exactly
    * `rounds` rounds lands on the same edge set no matter how many
    * rounds the peel actually needed.
    */
  private[graft] def kCoreSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH sp AS MATERIALIZED (SELECT doc_a, doc_b FROM (\n")
    sb.append(simhashMd5Sql)
    sb.append("\n)),\nr0 AS MATERIALIZED (")
    sb.append("SELECT doc_a AS src, doc_b AS dst FROM sp\n")
    sb.append("  UNION SELECT doc_b, doc_a FROM sp)")
    // every r$i is MATERIALIZED: DuckDB inlines plain CTEs at each
    // reference, and each round references its predecessor three times —
    // unhinted, the 12-round chain expands 3^12 copies of the SimHash
    // pipeline and never finishes
    for (i <- 1 to rounds) {
      sb.append(s""",
d$i AS (SELECT src AS v FROM r${i - 1} GROUP BY src
  HAVING COUNT(*) >= $k),
r$i AS MATERIALIZED (SELECT e.src, e.dst FROM r${i - 1} e
  JOIN d$i a ON e.src = a.v JOIN d$i b ON e.dst = b.v)""")
    }
    sb.append(s"\nSELECT src AS doc_id, COUNT(*) AS core_degree " +
      s"FROM r$rounds GROUP BY src ORDER BY doc_id")
    sb.toString
  }

  /** Unrolled synchronous label-propagation replay over the SimHash pair
    * graph — per round: neighbor-label counts, argmax via the identical
    * (count desc, label asc) row_number, left-join-back. `iters` must
    * equal the operator's fixed round count (the contract is
    * round-exact, not fixpoint).
    */
  private[graft] def labelPropSql(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH sp AS MATERIALIZED (SELECT doc_a, doc_b FROM (\n")
    sb.append(simhashMd5Sql)
    sb.append("\n)),\nsym AS MATERIALIZED (")
    sb.append("SELECT doc_a AS src, doc_b AS dst FROM sp\n")
    sb.append("  UNION SELECT doc_b, doc_a FROM sp),\n")
    sb.append("l0 AS MATERIALIZED (SELECT DISTINCT src AS v, src AS label" +
      " FROM sym)")
    for (i <- 1 to iters) {
      sb.append(s""",
c$i AS (SELECT e.dst AS v, l.label, COUNT(*) AS c FROM sym e
  JOIN l${i - 1} l ON e.src = l.v GROUP BY 1, 2),
p$i AS (SELECT v, label FROM (SELECT v, label,
    ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn
  FROM c$i) WHERE rn = 1),
l$i AS MATERIALIZED (SELECT b.v, COALESCE(p.label, b.label) AS label
  FROM l${i - 1} b LEFT JOIN p$i p ON b.v = p.v)""")
    }
    sb.append(s"\nSELECT v AS doc_id, label AS community FROM l$iters " +
      "ORDER BY doc_id")
    sb.toString
  }

  /** First 12 md5 hex nibbles parsed positionally to a BIGINT (DuckDB has
    * no conv(); 16^k weights are exact literals — same trick as the
    * table_checksum fold). `m` must name a lowercase-hex md5 column.
    */
  private[graft] val md5Nibbles12: String =
    (1 to 12).map(p =>
      s"(strpos('0123456789abcdef', substr(m, $p, 1)) - 1) * " +
        BigInt(16).pow(12 - p).toString)
      .mkString(" + ")

  // ---- Generated LSH / IVF oracles ------------------------------------
  // The sign-random-projection hyperplanes are deterministic integer-mixed
  // doubles (Similarity.planeVec); they are inlined as SQL literals so
  // DuckDB computes the identical buckets. Embeddings are 64-wide at every
  // testdata SF. Shortest-round-trip double rendering parses back to the
  // same binary double (DECIMAL literal → DOUBLE cast is a correct
  // round-trip for ≤17 significant digits).
  private[graft] val EmbDim = 64

  private[graft] def planeSqlLit(salt: Int, i: Int): String =
    "CAST([" + Similarity.planeVec(salt * 1024 + i, EmbDim).mkString(", ") +
      "] AS DOUBLE[])"

  /** Σ 2^i over planes whose projection of `vExpr` is ≥ 0 — the SQL twin
    * of [[graft.operators.Similarity.lshBucket]].
    */
  private[graft] def bucketSql(vExpr: String, planes: Int, salt: Int): String =
    (0 until planes).map { i =>
      s"(CASE WHEN list_inner_product($vExpr, ${planeSqlLit(salt, i)}) >= 0" +
        s" THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  private[graft] def cosSql(a: String, b: String): String =
    s"list_inner_product($a, $b) / " +
      s"sqrt(list_inner_product($a, $a) * list_inner_product($b, $b))"

  private[graft] val vecsSql =
    """vecs AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings)""".stripMargin

  private[graft] def bandedSql(planes: Int, tables: Int, from: String = "vecs",
                        withLabel: Boolean = true): String = {
    val cols = if (withLabel) "vec_id, label, v" else "vec_id, v"
    "banded AS (" + (0 until tables).map { t =>
      s"SELECT $cols, $t AS tbl, " +
        bucketSql("v", planes, salt = t) + s" AS bucket FROM $from"
    }.mkString(" UNION ALL ") + ")"
  }

  private[graft] val annLshSql =
    s"""WITH $vecsSql,
       |${bandedSql(planes = 8, tables = 3)},
       |qb AS (SELECT tbl, bucket, v AS qv FROM banded WHERE vec_id = 0),
       |sims AS (SELECT b.vec_id, b.label,
       |  roundbankers(${cosSql("b.v", "q.qv")}, 6) AS sim
       |  FROM banded b JOIN qb q ON b.tbl = q.tbl AND b.bucket = q.bucket
       |  WHERE b.vec_id <> 0)
       |SELECT DISTINCT vec_id, label, sim FROM sims
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  /** Batch-join twin of [[annLshSql]]: every vec_id < 20 is a query; the
    * same banded CTE serves both join sides, candidates dedup on the id
    * pair, and the k-cut replays the query-partitioned row_number.
    */
  private[graft] val annJoinSql =
    s"""WITH $vecsSql,
       |${bandedSql(planes = 8, tables = 3, withLabel = false)},
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
       |  FROM banded a JOIN banded b
       |  ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  WHERE a.vec_id < 20 AND b.vec_id >= 20),
       |sims AS (SELECT c.q_id, c.c_id, y.label,
       |  roundbankers(${cosSql("x.v", "y.v")}, 6) AS sim
       |  FROM cand c JOIN vecs x ON c.q_id = x.vec_id
       |  JOIN vecs y ON c.c_id = y.vec_id),
       |r AS (SELECT q_id, c_id, label, sim, ROW_NUMBER() OVER (
       |  PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn FROM sims)
       |SELECT q_id, c_id, label, sim FROM r WHERE rn <= 10
       |ORDER BY q_id, sim DESC, c_id""".stripMargin

  /** Multi-probe twin of [[annLshSql]]: the probe set (query bucket plus
    * the `probes` single-bit flips with the smallest |projection| margin,
    * plane-index tiebreak) is recomputed in SQL from the same hyperplane
    * literals.
    */
  private[graft] val annLshMultiProbeSql: String = {
    val projBranches = (for { t <- 0 until 3; i <- 0 until 8 } yield
      s"SELECT $t AS tbl, $i AS plane, ${1L << i} AS bit, " +
        s"list_inner_product(q.qv, ${planeSqlLit(t, i)}) AS proj FROM q")
      .mkString(" UNION ALL ")
    s"""WITH $vecsSql,
       |${bandedSql(planes = 8, tables = 3)},
       |q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
       |projs AS ($projBranches),
       |base AS (SELECT tbl, SUM(CASE WHEN proj >= 0 THEN bit ELSE 0 END)
       |  AS b FROM projs GROUP BY tbl),
       |flips AS (SELECT tbl, bit FROM (
       |  SELECT tbl, bit, ROW_NUMBER() OVER (PARTITION BY tbl
       |    ORDER BY abs(proj), plane) AS rn FROM projs) WHERE rn <= 3),
       |probe AS (SELECT tbl, b AS bucket FROM base
       |  UNION ALL SELECT f.tbl, xor(b.b, f.bit) FROM flips f
       |  JOIN base b ON f.tbl = b.tbl),
       |sims AS (SELECT bd.vec_id, bd.label,
       |  roundbankers(${cosSql("bd.v", "q.qv")}, 6) AS sim
       |  FROM banded bd
       |  JOIN probe p ON bd.tbl = p.tbl AND bd.bucket = p.bucket, q
       |  WHERE bd.vec_id <> 0)
       |SELECT DISTINCT vec_id, label, sim FROM sims
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  }

  /** Near-dup pair oracle over the corpus PLUS the deterministic planted
    * perturbations (first 8 vectors, first component +0.01 in double space
    * — one double add on identical operands, so bit-identical to the Spark
    * side's `element_at(v,1) + 0.01`).
    */
  /** Incremental-dedup oracle — shared by the exact anti-join query and
    * its Bloom-sketch twin (which must produce the identical relation).
    */
  private[graft] val incDedupSql: String =
    """WITH fp AS (SELECT doc_id,
      |    md5(substr(lower(text), 1, 64)) AS fingerprint
      |  FROM documents),
      |inc AS (SELECT * FROM fp WHERE doc_id % 2 = 1)
      |SELECT fingerprint, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      |FROM inc
      |WHERE NOT EXISTS (SELECT 1 FROM fp ex
      |  WHERE ex.doc_id % 2 = 0 AND ex.fingerprint = inc.fingerprint)
      |GROUP BY 1 ORDER BY fingerprint""".stripMargin

  /** Shared CTE fragment for the 8-gram contamination oracles: `c` =
    * (corpus doc, distinct gram md5), `hh` = (holdout doc, gram md5) with
    * the `doc_id % 10 = 0` holdout rule.
    */
  private[graft] val contamGramsSql: String = {
    val gram8 = (0 until 8).map(o => s"toks[i+$o]").mkString(", ")
    s"""t AS (SELECT doc_id, doc_id % 10 = 0 AS h,
       |  string_split(lower(text), ' ') AS toks FROM documents),
       |g AS (SELECT doc_id, h, unnest(list_distinct(
       |    CASE WHEN len(toks) >= 8 THEN
       |      list_transform(range(1, len(toks) - 6),
       |        i -> md5(concat_ws(' ', $gram8)))
       |    ELSE [] END)) AS g FROM t),
       |c AS (SELECT doc_id, g FROM g WHERE NOT h),
       |hh AS (SELECT doc_id AS holdout_id, g FROM g WHERE h)""".stripMargin
  }

  /** SQL twin of [[plantedVecs]] (as a CTE fragment over `vecs0`). */
  private[graft] val pvecsSql =
    """vecs0 AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |pvecs AS (SELECT vec_id, v FROM vecs0
      |  UNION ALL
      |  SELECT vec_id + 10000000, [v[1] + 0.01] || v[2:] FROM vecs0
      |  WHERE vec_id < 8)""".stripMargin

  private[graft] val embNearDupSql = {
    val banded = bandedSql(planes = 12, tables = 3, from = "pvecs",
      withLabel = false)
    s"""WITH $pvecsSql,
       |$banded,
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM banded a JOIN banded b
       |  ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |sims AS (SELECT c.vec_a, c.vec_b,
       |  roundbankers(${cosSql("x.v", "y.v")}, 6) AS sim
       |  FROM cand c JOIN pvecs x ON c.vec_a = x.vec_id
       |  JOIN pvecs y ON c.vec_b = y.vec_id)
       |SELECT vec_a, vec_b, sim FROM sims WHERE sim >= 0.9
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** IVF cell-probe twin: centroids are the 16 lowest vec_ids (cell = rank
    * in that order), assignment is argmax cosine with ties to the higher
    * cell, probing takes the 4 query-closest cells with ties to the lower
    * cell — exactly [[graft.operators.Similarity.ivfTopK]]'s rules.
    */
  /** Exact brute-force cosine top-10 for query vec 0 — also the ground
    * truth side of [[annRecallIvfSql]]. */
  private[graft] val annExactSql: String =
    """WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
      |  AS qv FROM embeddings WHERE vec_id = 0),
      |c AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id <> 0)
      |SELECT vec_id, label,
      |  roundbankers(list_inner_product(v, qv) /
      |    sqrt(list_inner_product(v, v) * list_inner_product(qv, qv)), 6)
      |    AS sim
      |FROM c, q ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  private[graft] val annIvfSql =
    s"""WITH $vecsSql,
       |cent AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
       |  v AS cv FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 16)),
       |q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
       |asg AS (SELECT vec_id, label, v, cell FROM (
       |  SELECT vecs.vec_id, vecs.label, vecs.v, cent.cell,
       |    ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
       |      ORDER BY ${cosSql("vecs.v", "cent.cv")} DESC, cent.cell DESC)
       |      AS rn
       |  FROM vecs, cent) WHERE rn = 1),
       |probe AS (SELECT cell FROM (
       |  SELECT cent.cell, ROW_NUMBER() OVER (
       |    ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.cell ASC) AS rn
       |  FROM cent, q) WHERE rn <= 4)
       |SELECT a.vec_id, a.label,
       |  roundbankers(${cosSql("a.v", "q.qv")}, 6) AS sim
       |FROM asg a JOIN probe p ON a.cell = p.cell, q
       |WHERE a.vec_id <> 0
       |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin

  /** Trained-codebook IVF twin: replays [[Similarity.kmeansCodebook]]'s
    * two Lloyd iterations in SQL — same deterministic init (16 lowest
    * vec_ids), same assignment rule (argmax cosine, ties to the higher
    * cell), and the same exact-DECIMAL(28,14)-sum mean (order-free, so
    * both engines train bit-identical centroids) — then probes like
    * [[annIvfSql]].
    */
  private[graft] def lloydSql(prev: String, n: Int): String =
    s"""a$n AS (SELECT vec_id, v, cell FROM (
       |  SELECT vecs.vec_id, vecs.v, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
       |      ORDER BY ${cosSql("vecs.v", "c.cv")} DESC, c.cell DESC) AS rn
       |  FROM vecs, $prev c) WHERE rn = 1),
       |m$n AS (SELECT cell, pos,
       |  CAST(SUM(CAST(v[pos] AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)
       |    AS m
       |  FROM a$n, (SELECT unnest(range(1, ${EmbDim + 1})) AS pos) p
       |  GROUP BY cell, pos),
       |g$n AS (SELECT cell, list(m ORDER BY pos) AS mv FROM m$n
       |  GROUP BY cell),
       |cent$n AS (SELECT c.cell, COALESCE(g.mv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN g$n g ON c.cell = g.cell)"""

  /** CTE chain training the 16-cell codebook (two Lloyd iterations over
    * `vecs`, deterministic lowest-id init) — ends at `cent2`, the SQL twin
    * of the memoized [[kmeansBook]].
    */
  private[graft] val kmeansCent2Sql: String =
    s"""cent0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
       |  v AS cv FROM (SELECT vec_id, v FROM vecs ORDER BY vec_id LIMIT 16)),
       |${lloydSql("cent0", 1)},
       |${lloydSql("cent1", 2)}""".stripMargin

  private[graft] val annIvfKmeansSql: String = {
    s"""WITH $vecsSql,
       |$kmeansCent2Sql,
       |q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
       |asg AS (SELECT vec_id, label, v, cell FROM (
       |  SELECT vecs.vec_id, vecs.label, vecs.v, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
       |      ORDER BY ${cosSql("vecs.v", "c.cv")} DESC, c.cell DESC) AS rn
       |  FROM vecs, cent2 c) WHERE rn = 1),
       |probe AS (SELECT cell FROM (
       |  SELECT c.cell, ROW_NUMBER() OVER (
       |    ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cell ASC) AS rn
       |  FROM cent2 c, q) WHERE rn <= 4)
       |SELECT a.vec_id, a.label,
       |  roundbankers(${cosSql("a.v", "q.qv")}, 6) AS sim
       |FROM asg a JOIN probe p ON a.cell = p.cell, q
       |WHERE a.vec_id <> 0
       |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin
  }

  /** Semantic-dedup twin: trains the identical cent2 codebook, assigns
    * the corpus + planted vectors (argmax cosine, ties to the higher
    * cell — [[graft.operators.Similarity.semanticDedupPairs]]'s rule),
    * then searches pairs within cells only.
    */
  private[graft] val semanticDedupSql: String =
    s"""WITH $vecsSql,
       |$kmeansCent2Sql,
       |$pvecsSql,
       |asg AS (SELECT vec_id, v, cell FROM (
       |  SELECT p.vec_id, p.v, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
       |      ORDER BY ${cosSql("p.v", "c.cv")} DESC, c.cell DESC) AS rn
       |  FROM pvecs p, cent2 c) WHERE rn = 1)
       |SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  roundbankers(${cosSql("a.v", "b.v")}, 6) AS sim
       |FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE roundbankers(${cosSql("a.v", "b.v")}, 6) >= 0.9
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Generated oracle for the winnowing rolling-hash fingerprint: replays
    * [[graft.functions.RollingHashWindows]]'s Rabin–Karp window hash
    * (base 257, arithmetic mod 2^64) in HUGEINT SQL — each window hash is
    * Σ byte·257^t with the 32 power constants inlined mod 2^64, the
    * unsigned result converted to the signed long the Spark expression
    * emits, then the per-doc MIN. The oracle reads code points as bytes,
    * valid because the corpus is ASCII (the expression hashes UTF-8
    * bytes); docs shorter than the window keep their null via the left
    * join.
    */
  private[graft] val rollingFingerprintSql: String = {
    val W = 32
    val powers = Iterator.iterate(1L)(_ * 257L).take(W).toArray
    val terms = (0 until W).map(t =>
      s"CAST(b[i+${W - 1 - t}] AS HUGEINT) * " +
        java.lang.Long.toUnsignedString(powers(t)))
      .mkString(" + ")
    s"""WITH s AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
       |bs AS (SELECT doc_id, list_transform(range(1, len(t)+1),
       |    i -> ord(substr(t, i, 1))) AS b, len(t) AS n FROM s),
       |w AS (SELECT doc_id, unnest(range(1, n - $W + 2)) AS i, b
       |  FROM bs WHERE n >= $W),
       |h AS (SELECT doc_id,
       |  ($terms) % 18446744073709551616 AS hu FROM w),
       |m AS (SELECT doc_id, MIN(CAST(CASE WHEN hu >= 9223372036854775808
       |    THEN hu - 18446744073709551616 ELSE hu END AS BIGINT)) AS f
       |  FROM h GROUP BY doc_id)
       |SELECT s.doc_id, m.f AS fingerprint
       |FROM s LEFT JOIN m ON s.doc_id = m.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  /** Generated winnowing oracle: the [[rollingFingerprintSql]] HUGEINT
    * mod-2^64 Rabin–Karp replay at gram = 8, then the
    * Schleimer–Wilkerson–Aiken selection — every window of 4 consecutive
    * hashes keeps its (hash, position)-minimal element (leftmost tie) —
    * as a per-(doc, window-start) ROW_NUMBER pick, deduplicated.
    * Mirrors [[graft.operators.TextOps.winnowFingerprints]] step for
    * step (the ×4 candidate unnest is the same bounded fan-out).
    */
  private[graft] val winnowFingerprintsSql: String = {
    val W = 8
    val Wn = 4
    val powers = Iterator.iterate(1L)(_ * 257L).take(W).toArray
    val terms = (0 until W).map(t =>
      s"CAST(b[i+${W - 1 - t}] AS HUGEINT) * " +
        java.lang.Long.toUnsignedString(powers(t)))
      .mkString(" + ")
    s"""WITH s AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
       |bs AS (SELECT doc_id, list_transform(range(1, len(t)+1),
       |    i -> ord(substr(t, i, 1))) AS b, len(t) AS n FROM s),
       |w AS (SELECT doc_id, unnest(range(1, n - $W + 2)) AS i, b,
       |    n - $W + 1 AS nh FROM bs WHERE n >= ${W + Wn - 1}),
       |h0 AS (SELECT doc_id, i - 1 AS hi, nh,
       |  ($terms) % 18446744073709551616 AS hu FROM w),
       |h AS (SELECT doc_id, hi, nh,
       |  CAST(CASE WHEN hu >= 9223372036854775808
       |    THEN hu - 18446744073709551616 ELSE hu END AS BIGINT) AS f
       |  FROM h0),
       |cand AS (SELECT doc_id, hi, f, unnest(range(
       |    greatest(0, hi - ${Wn - 1}), least(hi, nh - $Wn) + 1)) AS p
       |  FROM h),
       |sel AS (SELECT doc_id, p, f, hi, ROW_NUMBER() OVER (
       |    PARTITION BY doc_id, p ORDER BY f, hi) AS rn FROM cand)
       |SELECT DISTINCT doc_id, hi AS pos, f AS fp FROM sel WHERE rn = 1
       |ORDER BY doc_id, pos""".stripMargin
  }

  /** Generated BPE-training oracle: replays
    * [[graft.operators.TextOps.bpeMerges]]'s 16 merge stages in ONE CTE
    * chain (the Lloyd-chain pattern). Per stage: split the
    * chr(31)-suffix-delimited symbol strings, count adjacent pairs
    * weighted by word frequency (SUM over BIGINT — cast back from
    * HUGEINT at the end), argmax with the lexicographic (lhs, rhs)
    * tie-break, and apply the merge as one literal `replace` — which
    * scans left-to-right non-overlapping in both engines, i.e. greedy
    * BPE application. The suffix (not infix) delimiter is what makes
    * consecutive merge sites independent occurrences for `replace`.
    */
  private[graft] val BpeN = 16

  private[graft] val bpeChainSql: String = {
    val sep = "chr(31)"
    // Each stage consumes bv{k-1} TWICE (pair count + merge apply):
    // without MATERIALIZED, CTE inlining doubles the tree per stage and
    // bv16 expands to 2^16 scans of documents.parquet.
    val stages = (1 to BpeN).map { k =>
      s"""bs$k AS (SELECT list_filter(string_split(seq, $sep),
         |    x -> x <> '') AS s, n FROM bv${k - 1}),
         |bp$k AS (SELECT s[i] AS lhs, s[i+1] AS rhs, SUM(n) AS c
         |  FROM (SELECT s, n, unnest(range(1, len(s))) AS i
         |        FROM bs$k WHERE len(s) >= 2)
         |  GROUP BY lhs, rhs),
         |bm$k AS MATERIALIZED (SELECT lhs, rhs, c FROM bp$k
         |  ORDER BY c DESC, lhs, rhs LIMIT 1),
         |bv$k AS MATERIALIZED (SELECT replace(seq,
         |    lhs || $sep || rhs || $sep, lhs || rhs || $sep) AS seq, n
         |  FROM bv${k - 1}, bm$k)""".stripMargin
    }.mkString(",\n")
    s"""bw AS (SELECT word, COUNT(*) AS n FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents) WHERE word <> '' GROUP BY word),
       |bv0 AS (SELECT regexp_replace(word, '(.)', '\\1' || $sep, 'g')
       |    AS seq, n FROM bw),
       |$stages""".stripMargin
  }

  private[graft] val bpeMergesSql: String = {
    val rows = (1 to BpeN).map { k =>
      s"SELECT CAST(${k - 1} AS BIGINT) AS merge_rank, lhs, rhs, " +
        s"lhs || rhs AS merged, CAST(c AS BIGINT) AS n_occ FROM bm$k"
    }.mkString("\nUNION ALL ")
    s"""WITH $bpeChainSql
       |SELECT * FROM ($rows) ORDER BY merge_rank""".stripMargin
  }

  /** Tokenizer-apply twin: the training chain's final vocab stage
    * (`bv$BpeN` — all merges applied) tokenized back into symbols and
    * frequency-counted, mirroring [[graft.operators.TextOps
    * .bpeEncodeTokens]] run on [[graft.operators.TextOps.bpeMerges]]'s
    * output.
    */
  private[graft] val bpeEncodeSql: String =
    s"""WITH $bpeChainSql,
       |tok AS (SELECT unnest(list_filter(string_split(seq, chr(31)),
       |    x -> x <> '')) AS token, n FROM bv$BpeN)
       |SELECT token, CAST(SUM(n) AS BIGINT) AS n_occ FROM tok
       |GROUP BY token ORDER BY n_occ DESC, token""".stripMargin

  /** Contrastive-triplet twin: the pair graph is [[embNearDupSql]] as a
    * CTE; the negative replays the rank-based Knuth-hash draw over the
    * gapped pool (plain `%` — operands non-negative, so it equals
    * Spark's `pmod`): ROW_NUMBER over vec_id gives the pool ranks, the
    * three stepped candidate ranks join back to ids, and the CASE chain
    * is the first-valid-candidate pick; `sim_neg` is the same 6dp
    * cosine.
    */
  private[graft] val contrastiveTripletsSql: String =
    s"""WITH pairs0 AS (SELECT * FROM ($embNearDupSql)),
       |$pvecsSql,
       |pool AS (SELECT vec_id, v FROM vecs0 WHERE vec_id % 7 <> 3),
       |pr AS (SELECT vec_id, v,
       |    ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS rk FROM pool),
       |n AS (SELECT COUNT(*) AS nn FROM pool),
       |t0 AS (SELECT vec_a, vec_b, sim, n.nn AS nn,
       |    (vec_a * 2654435761 + vec_b) % n.nn AS r0
       |  FROM pairs0, n),
       |c AS (SELECT t0.vec_a, t0.vec_b, t0.sim,
       |    p0.vec_id AS id0, p1.vec_id AS id1, p2.vec_id AS id2,
       |    p0.v AS v0, p1.v AS v1, p2.v AS v2
       |  FROM t0 JOIN pr p0 ON p0.rk = t0.r0
       |  JOIN pr p1 ON p1.rk = (t0.r0 + 1) % t0.nn
       |  JOIN pr p2 ON p2.rk = (t0.r0 + 2) % t0.nn),
       |sel AS (SELECT vec_a, vec_b, sim,
       |    CASE WHEN id0 <> vec_a AND id0 <> vec_b THEN id0
       |         WHEN id1 <> vec_a AND id1 <> vec_b THEN id1
       |         ELSE id2 END AS negative,
       |    CASE WHEN id0 <> vec_a AND id0 <> vec_b THEN v0
       |         WHEN id1 <> vec_a AND id1 <> vec_b THEN v1
       |         ELSE v2 END AS nv
       |  FROM c)
       |SELECT sel.vec_a AS anchor, sel.vec_b AS positive, sel.negative,
       |  sel.sim AS sim_pos,
       |  roundbankers(${cosSql("a.v", "sel.nv")}, 6) AS sim_neg
       |FROM sel
       |JOIN pvecs a ON sel.vec_a = a.vec_id
       |ORDER BY anchor, positive""".stripMargin

  /** Shared CTE chain for the duplicate-span oracles: md5-hashed 8-token
    * windows with 0-based positions, windows occurring in ≥ 2 distinct
    * docs, and the gaps-and-islands merge (new island when the position
    * gap exceeds the window width) into maximal spans — mirroring
    * [[graft.operators.Dedup.duplicateSpans]] step for step.
    */
  private[graft] val dupSpansCteSql: String = {
    val gram8 = (0 until 8).map(o => s"toks[i+$o]").mkString(", ")
    s"""t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |  FROM documents),
       |p AS (SELECT doc_id, unnest(range(1, len(toks) - 6)) AS i, toks
       |  FROM t WHERE len(toks) >= 8),
       |g AS (SELECT doc_id, i - 1 AS pos,
       |  md5(concat_ws(' ', $gram8)) AS gh FROM p),
       |dup AS (SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS nd
       |  FROM g GROUP BY gh) WHERE nd >= 2),
       |hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
       |isl AS (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER (
       |    PARTITION BY doc_id ORDER BY pos) > 8 THEN 1 ELSE 0 END AS nw
       |  FROM hits),
       |isl2 AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS island FROM isl),
       |spans AS (SELECT doc_id, island,
       |    CAST(MIN(pos) AS BIGINT) AS span_start,
       |    CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
       |  FROM isl2 GROUP BY doc_id, island)""".stripMargin
  }

  /** PQ ADC top-k oracle: replays the ENTIRE path in SQL — per-subspace
    * k-means training (two Lloyd iterations over 8-dim subvectors,
    * deterministic lowest-vec_id init, exact DECIMAL(28,14) means — the
    * [[kmeansCent2Sql]] contract, here one combined pass per iteration
    * across all 8 subspaces), corpus encode (argmin with the same reduced
    * `cv·cv − 2·sv·cv` distance and lower-cell ties), the query-side
    * lookup table (`q·q − 2·q·cv + cv·cv`, the association the Spark
    * driver loop reproduces), and the fixed-order 8-term ADC sum (pivoted
    * columns added left-to-right — matching the Spark side's literal `+`
    * chain, since a SUM over rows would be order-dependent in double).
    */
  private[graft] val PqM = 8; private val PqSub = 8; private val PqK = 16

  private[graft] def pqLloydSql(prev: String, n: Int, sub: String = "sub",
                         p: String = "p"): String =
    s"""${p}a$n AS (SELECT vec_id, s, sv, c FROM (
       |  SELECT $sub.vec_id, $sub.s, $sub.sv, cc.c,
       |    ROW_NUMBER() OVER (PARTITION BY $sub.vec_id, $sub.s
       |      ORDER BY list_inner_product(cc.cv, cc.cv)
       |        - 2 * list_inner_product($sub.sv, cc.cv) ASC, cc.c ASC)
       |      AS rn
       |  FROM $sub JOIN $prev cc ON $sub.s = cc.s) WHERE rn = 1),
       |${p}m$n AS (SELECT s, c, pos,
       |  CAST(SUM(CAST(sv[pos] AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*)
       |    AS mval
       |  FROM ${p}a$n, (SELECT unnest(range(1, ${PqSub + 1})) AS pos) p
       |  GROUP BY s, c, pos),
       |${p}g$n AS (SELECT s, c, list(mval ORDER BY pos) AS mv FROM ${p}m$n
       |  GROUP BY s, c),
       |${p}cent$n AS (SELECT cc.s, cc.c, COALESCE(g.mv, cc.cv) AS cv
       |  FROM $prev cc LEFT JOIN ${p}g$n g ON cc.s = g.s AND cc.c = g.c)"""

  /** CTE chain replaying PQ training over `vecs` (ends at `pcent2`),
    * corpus encode (`enc`, queryId 0 excluded), and the query-side
    * lookup table (`lut`) — shared by the PQ and IVF-PQ oracles. CTE
    * names are `p`-prefixed so the chain composes with [[kmeansCent2Sql]]
    * in one statement.
    */
  private[graft] val pqChainSql: String =
    s"""pss AS (SELECT unnest(range(0, $PqM)) AS s),
       |sub AS (SELECT vec_id, s,
       |  list_slice(v, s*$PqSub + 1, s*$PqSub + $PqSub) AS sv
       |  FROM vecs, pss),
       |pcent0 AS (SELECT s,
       |    ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS c,
       |    sv AS cv
       |  FROM sub WHERE vec_id IN
       |    (SELECT vec_id FROM vecs ORDER BY vec_id LIMIT $PqK)),
       |${pqLloydSql("pcent0", 1)},
       |${pqLloydSql("pcent1", 2)},
       |enc AS (SELECT vec_id, s, c FROM (
       |  SELECT sub.vec_id, sub.s, cc.c,
       |    ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |      ORDER BY list_inner_product(cc.cv, cc.cv)
       |        - 2 * list_inner_product(sub.sv, cc.cv) ASC, cc.c ASC) AS rn
       |  FROM sub JOIN pcent2 cc ON sub.s = cc.s
       |  WHERE sub.vec_id <> 0) WHERE rn = 1),
       |q AS (SELECT s, sv AS qsv FROM sub WHERE vec_id = 0),
       |lut AS (SELECT cc.s, cc.c,
       |  list_inner_product(q.qsv, q.qsv)
       |    - 2 * list_inner_product(q.qsv, cc.cv)
       |    + list_inner_product(cc.cv, cc.cv) AS d
       |  FROM pcent2 cc JOIN q ON cc.s = q.s),
       |terms AS (SELECT e.vec_id, e.s, l.d
       |  FROM enc e JOIN lut l ON e.s = l.s AND e.c = l.c)""".stripMargin

  private[graft] val pqTermsSum = (0 until PqM).map(s => s"d$s").mkString(" + ")
  private[graft] val pqPivots = (0 until PqM).map(s =>
    s"MAX(CASE WHEN s = $s THEN d END) AS d$s").mkString(", ")

  private[graft] val annPqSql: String =
    s"""WITH $vecsSql,
       |$pqChainSql,
       |piv AS (SELECT vec_id, $pqPivots FROM terms GROUP BY vec_id)
       |SELECT p.vec_id, v.label, roundbankers($pqTermsSum, 6) AS adist
       |FROM piv p JOIN vecs v ON p.vec_id = v.vec_id
       |ORDER BY adist, p.vec_id LIMIT 10""".stripMargin

  /** IVF-PQ twin: the k-means coarse codebook trains exactly as in
    * [[annIvfKmeansSql]] (cosine Lloyd, `cent2`), the PQ books and codes
    * exactly as in [[annPqSql]] (`pcent2`/`enc` — disjoint CTE names),
    * and the final rank keeps only vectors assigned to the 4
    * query-closest coarse cells, ordered by the fixed-order ADC sum.
    */
  private[graft] val annIvfPqSql: String =
    s"""WITH $vecsSql,
       |$kmeansCent2Sql,
       |$pqChainSql,
       |asg AS (SELECT vec_id, cell FROM (
       |  SELECT vecs.vec_id, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
       |      ORDER BY ${cosSql("vecs.v", "c.cv")} DESC, c.cell DESC) AS rn
       |  FROM vecs, cent2 c) WHERE rn = 1),
       |kq AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
       |probe AS (SELECT cell FROM (
       |  SELECT c.cell, ROW_NUMBER() OVER (
       |    ORDER BY ${cosSql("kq.qv", "c.cv")} DESC, c.cell ASC) AS rn
       |  FROM cent2 c, kq) WHERE rn <= 4),
       |piv AS (SELECT vec_id, $pqPivots FROM terms GROUP BY vec_id)
       |SELECT p.vec_id, v.label, roundbankers($pqTermsSum, 6) AS adist
       |FROM piv p
       |JOIN vecs v ON p.vec_id = v.vec_id
       |JOIN asg a ON p.vec_id = a.vec_id
       |JOIN probe pr ON a.cell = pr.cell
       |ORDER BY adist, p.vec_id LIMIT 10""".stripMargin

  /** Residual IVF-PQ twin: coarse codebook and probe cells exactly as in
    * [[annIvfPqSql]]; the PQ chain trains over RESIDUALS `v − cv(cell)`
    * (CTE `rv`, elementwise double subtraction — the Spark side's
    * `zip_with`), with the same Lloyd contract under `r`-prefixed names;
    * the query side builds one LUT per probed cell from the query's
    * residual against that cell's centroid, joined back through each
    * vector's coarse cell — a residual code is only comparable inside
    * its own cell's frame of reference.
    */
  private[graft] val annIvfPqResidualSql: String =
    s"""WITH $vecsSql,
       |$kmeansCent2Sql,
       |asg AS (SELECT vec_id, v, cell FROM (
       |  SELECT vecs.vec_id, vecs.v, c.cell,
       |    ROW_NUMBER() OVER (PARTITION BY vecs.vec_id
       |      ORDER BY ${cosSql("vecs.v", "c.cv")} DESC, c.cell DESC) AS rn
       |  FROM vecs, cent2 c) WHERE rn = 1),
       |rv AS (SELECT a.vec_id,
       |  list_transform(range(1, ${EmbDim + 1}), i -> a.v[i] - c.cv[i])
       |    AS v, a.cell
       |  FROM asg a JOIN cent2 c ON a.cell = c.cell),
       |pss AS (SELECT unnest(range(0, $PqM)) AS s),
       |rsub AS (SELECT vec_id, s,
       |  list_slice(v, s*$PqSub + 1, s*$PqSub + $PqSub) AS sv
       |  FROM rv, pss),
       |rcent0 AS (SELECT s,
       |    ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS c,
       |    sv AS cv
       |  FROM rsub WHERE vec_id IN
       |    (SELECT vec_id FROM rv ORDER BY vec_id LIMIT $PqK)),
       |${pqLloydSql("rcent0", 1, "rsub", "r")},
       |${pqLloydSql("rcent1", 2, "rsub", "r")},
       |renc AS (SELECT vec_id, s, c FROM (
       |  SELECT rsub.vec_id, rsub.s, cc.c,
       |    ROW_NUMBER() OVER (PARTITION BY rsub.vec_id, rsub.s
       |      ORDER BY list_inner_product(cc.cv, cc.cv)
       |        - 2 * list_inner_product(rsub.sv, cc.cv) ASC, cc.c ASC)
       |      AS rn
       |  FROM rsub JOIN rcent2 cc ON rsub.s = cc.s
       |  WHERE rsub.vec_id <> 0) WHERE rn = 1),
       |kq AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
       |probe AS (SELECT cell FROM (
       |  SELECT c.cell, ROW_NUMBER() OVER (
       |    ORDER BY ${cosSql("kq.qv", "c.cv")} DESC, c.cell ASC) AS rn
       |  FROM cent2 c, kq) WHERE rn <= 4),
       |qr AS (SELECT c.cell,
       |  list_transform(range(1, ${EmbDim + 1}), i -> kq.qv[i] - c.cv[i])
       |    AS qv
       |  FROM cent2 c JOIN probe pr ON c.cell = pr.cell, kq),
       |qsub AS (SELECT cell, s,
       |  list_slice(qv, s*$PqSub + 1, s*$PqSub + $PqSub) AS qsv
       |  FROM qr, pss),
       |lut AS (SELECT qs.cell, cc.s, cc.c,
       |  list_inner_product(qs.qsv, qs.qsv)
       |    - 2 * list_inner_product(qs.qsv, cc.cv)
       |    + list_inner_product(cc.cv, cc.cv) AS d
       |  FROM rcent2 cc JOIN qsub qs ON cc.s = qs.s),
       |terms AS (SELECT e.vec_id, e.s, l.d
       |  FROM renc e JOIN rv a ON e.vec_id = a.vec_id
       |  JOIN lut l ON a.cell = l.cell AND e.s = l.s AND e.c = l.c),
       |piv AS (SELECT vec_id, $pqPivots FROM terms GROUP BY vec_id)
       |SELECT p.vec_id, v.label, roundbankers($pqTermsSum, 6) AS adist
       |FROM piv p JOIN vecs v ON p.vec_id = v.vec_id
       |ORDER BY adist, p.vec_id LIMIT 10""".stripMargin

  /** Random-projection twin: the 16 reduction hyperplanes (salt 7 —
    * disjoint from every LSH table's planes) inline as literals; the
    * reduced-space candidate cut and the exact re-rank replay
    * [[graft.operators.Similarity.rpTopK]]'s two bround-before-rank
    * orderings.
    */
  private[graft] val annRpSql: String = {
    val rvExpr = "[" + (0 until 16).map(i =>
      s"list_inner_product(v, ${planeSqlLit(7, i)})").mkString(", ") + "]"
    s"""WITH $vecsSql,
       |red AS (SELECT vec_id, label, v, $rvExpr AS rv FROM vecs),
       |q AS (SELECT rv AS qrv, v AS qv FROM red WHERE vec_id = 0),
       |cand AS (SELECT vec_id, label, v, ROW_NUMBER() OVER (
       |    ORDER BY roundbankers(${cosSql("rv", "q.qrv")}, 6) DESC,
       |      vec_id) AS rn
       |  FROM red, q WHERE vec_id <> 0)
       |SELECT c.vec_id, c.label,
       |  roundbankers(${cosSql("c.v", "q.qv")}, 6) AS sim
       |FROM cand c, q WHERE c.rn <= 40
       |ORDER BY sim DESC, c.vec_id LIMIT 10""".stripMargin
  }

  /** Per-doc duplicated-span coverage oracle — also embedded as a CTE of
    * the `curation_pipeline_v2` oracle.
    */
  private[graft] val dupSpanCoverageSql: String =
    s"""WITH $dupSpansCteSql,
       |cov AS (SELECT doc_id, COUNT(*) AS n_spans,
       |    SUM(span_len) AS dup_tokens
       |  FROM spans GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(c.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(COALESCE(c.dup_tokens, 0) AS DOUBLE) / len(t.toks)
       |    AS dup_frac
       |FROM t LEFT JOIN cov c ON t.doc_id = c.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Fixed-point bigram LM score oracle — also embedded as a CTE of the
    * `curation_pipeline_v2` oracle.
    */
  private[graft] val lmScoreSql: String =
    """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
      |  FROM documents),
      |p AS (SELECT doc_id, unnest(range(1, len(toks) + 1)) AS i, toks
      |  FROM t),
      |tk AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM p),
      |uni AS (SELECT w1 AS w, COUNT(*) AS c1 FROM tk GROUP BY w1),
      |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM tk
      |  WHERE w2 IS NOT NULL GROUP BY w1, w2),
      |sc AS (SELECT tk.doc_id, COUNT(*) AS n_bigrams,
      |    CAST(SUM(bi.c2 * 100000000 // uni.c1) AS BIGINT)
      |      AS prob_fp_sum
      |  FROM tk
      |  JOIN bi ON tk.w1 = bi.w1 AND tk.w2 = bi.w2
      |  JOIN uni ON tk.w1 = uni.w
      |  WHERE tk.w2 IS NOT NULL GROUP BY tk.doc_id)
      |SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
      |  COALESCE(sc.prob_fp_sum, 0) AS prob_fp_sum,
      |  CAST(sc.prob_fp_sum AS DOUBLE) / (sc.n_bigrams * 100000000)
      |    AS avg_prob
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY d.doc_id""".stripMargin

  private[graft] val enList = "('the','a','of','and','to','in','is','it')"
  private[graft] val deList = "('der','die','das','und','ist','mit','ein','zu')"
  private[graft] val frList = "('le','la','les','et','est','une','dans','que')"
  private[graft] val esList = "('el','los','las','y','es','una','en','por')"


  private[graft] lazy val lengthFilterSql =
    """WITH t AS (SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |b AS (SELECT
      |    percentile_disc(0.05) WITHIN GROUP (ORDER BY n_tokens) AS lo,
      |    percentile_disc(0.95) WITHIN GROUP (ORDER BY n_tokens) AS hi
      |  FROM t)
      |SELECT doc_id, n_tokens FROM t, b
      |WHERE n_tokens >= lo AND n_tokens <= hi
      |ORDER BY doc_id""".stripMargin

  // COALESCE(…, 0): a NULL text must count as 0 hits → 'unknown',
  // matching langIdAgg's explode_outer + sum semantics (list_filter on
  // a NULL list would otherwise propagate NULL and fall through the
  // argmax CASE to 'es').
  private[graft] lazy val langIdSql =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
       |  FROM documents),
       |h AS (SELECT doc_id,
       |  CAST(COALESCE(len(list_filter(toks, x -> x IN $enList)), 0)
       |    AS BIGINT) AS en_hits,
       |  CAST(COALESCE(len(list_filter(toks, x -> x IN $deList)), 0)
       |    AS BIGINT) AS de_hits,
       |  CAST(COALESCE(len(list_filter(toks, x -> x IN $frList)), 0)
       |    AS BIGINT) AS fr_hits,
       |  CAST(COALESCE(len(list_filter(toks, x -> x IN $esList)), 0)
       |    AS BIGINT) AS es_hits
       |  FROM t)
       |SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
       |  CASE WHEN greatest(en_hits, de_hits, fr_hits, es_hits) = 0
       |    THEN 'unknown'
       |  WHEN en_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
       |    THEN 'en'
       |  WHEN de_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
       |    THEN 'de'
       |  WHEN fr_hits = greatest(en_hits, de_hits, fr_hits, es_hits)
       |    THEN 'fr'
       |  ELSE 'es' END AS pred_lang
       |FROM h ORDER BY doc_id""".stripMargin

  private[graft] lazy val qualityScoreSql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents),
       |s AS (SELECT doc_id, len(toks) AS n_tokens,
       |  len(list_distinct(toks)) AS n_distinct,
       |  len(list_filter(toks, x -> x IN $enList)) AS hits FROM t)
       |SELECT doc_id,
       |  (CASE WHEN n_tokens >= 20 THEN 1.0
       |        ELSE n_tokens / 20.0 END) * 0.4 +
       |  (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.4 +
       |  (CASE WHEN CAST(hits AS DOUBLE) / n_tokens > 0.02
       |        THEN 1.0 ELSE 0.0 END) * 0.2 AS quality_score
       |FROM s ORDER BY doc_id""".stripMargin
}
