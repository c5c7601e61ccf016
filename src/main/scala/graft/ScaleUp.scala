package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend data amplifier: derives an sf(N·factor)-equivalent dataset
  * from an existing sf(N) directory by stamping `factor` key-remapped
  * replicas of every fact table. Used to measure how the heavy queries
  * GROW (SCALING.md) beyond the largest driver-provided scale factor —
  * the evidence that "bounded construction" claims hold off the small-SF
  * operating point.
  *
  * Replication preserves the workload's *density*, not just its row
  * count — naive copying would make every document an exact duplicate of
  * its 9 clones and near-dup pair counts would grow quadratically in
  * factor (45 extra pairs per group), measuring an artifact instead of
  * the engine:
  *  - documents: EVERY replica (including 0) prefixes every token with
  *    `r<r>` so cross-replica shingles/minhashes/simhashes do NOT
  *    collide; each replica reproduces the original pair structure in a
  *    disjoint hash space → pairs/edges/triangles scale linearly in
  *    factor, which is what real corpus growth looks like. Replica 0
  *    MUST be salted too: an earlier version kept replica 0 verbatim,
  *    and STACKED amplifications then alias — gen-2 replica j of a
  *    gen-1 replica-0 doc ("r<j>" + raw) is byte-identical to gen-2
  *    replica 0's copy of the gen-1 replica-j doc (also "r<j>" + raw),
  *    planting factor²-growing exact-duplicate pairs that a measurement
  *    reads as superlinear near-dup growth (observed: the sf100 pair
  *    graph carried 992 k cross-replica jaccard-1.0 alias pairs vs
  *    752 k real ones). With every replica salted, each generation adds
  *    exactly one prefix layer, so cross-generation token strings are
  *    distinct by construction. doc_id offsets by max(doc_id)+1 per
  *    replica, so `doc_id % 10` style holdout predicates keep their
  *    per-replica meaning (the offset is a multiple of 10 for the
  *    driver's contiguous 0-based ids).
  *  - embeddings: a deterministic per-replica AFFINE map — scalar gain
  *    (1 + .002·(r+1)) plus a per-(replica, dimension) sinusoidal
  *    offset — keeps cross-replica cosine well under dedup thresholds
  *    while leaving each replica's neighbor structure intact. The gain
  *    term exists for the same stacking reason as the token salt: a
  *    purely additive perturbation commutes across generations
  *    (v + p_j + p_i == v + p_i + p_j), re-creating the alias pairs in
  *    embedding space; affine compositions don't commute
  *    (a_i·(a_j·v + p_j) + p_i ≠ a_j·(a_i·v + p_i) + p_j).
  *  - events: event/user ids offset, timestamps kept — the event stream
  *    gets `factor`× denser over the same window, as real growth does.
  *  - lineitem/orders/customer: consistent key offsets (orderkey,
  *    custkey) so joins fan out exactly as the original; part/supplier/
  *    nation/region stay fixed — dimensions grow sublinearly in real
  *    deployments and the broadcast-ability of the dim side is exactly
  *    what the scale test should preserve.
  *
  * Everything is declarative DataFrame work (crossJoin with a broadcast
  * `factor`-row frame + column transforms) — no driver-side loops, so
  * the same job amplifies a 100 TB input on a cluster.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> [factor] [tables]
  * `tables` is an optional comma-separated subset (e.g.
  * `documents,embeddings`) for partial regeneration when scratch space
  * is the constraint — omitted means all tables.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val tables = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    amplify(spark, src, out, factor, tables)
    spark.stop()
  }

  def amplify(spark: SparkSession, src: String, out: String,
              factor: Int, tables: Option[Set[String]] = None): Unit = {
    val reps = broadcast(spark.range(factor)
      .select(col("id").cast("int").as("rep")))
    def want(t: String) = tables.forall(_.contains(t))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    def offsetFor(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // -- documents: id offset + per-replica token salt (ALL replicas —
    //    see the scaladoc's stacking-alias note) ------------------------
    if (want("documents")) {
      val docs = read("documents")
      val dOff = offsetFor(docs, "doc_id")
      val salted = docs.crossJoin(reps).select(
        (col("doc_id") + col("rep").cast("long") * dOff).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit("r"), col("rep"), t)), " ").as("text"),
        col("lang"), col("source"))
      write(salted.withColumn("n_chars", length(col("text")).cast("long")),
        "documents", factor * 4)
    }

    // -- embeddings: id offset + per-replica affine perturbation (ALL
    //    replicas; gain term breaks cross-generation commutation) -------
    if (want("embeddings")) {
      val emb = read("embeddings")
      val vOff = offsetFor(emb, "vec_id")
      write(emb.crossJoin(reps).select(
          (col("vec_id") + col("rep").cast("long") * vOff).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x * (lit(1.0) + (col("rep") + 1) * lit(0.002)) +
              sin((i + 1) * (col("rep") * 7 + 3)) * lit(0.05))
              .cast("float")).as("embedding"),
          col("label")),
        "embeddings", factor * 2)
    }

    // -- events: id offsets, same time window (density grows) ----------
    if (want("events")) {
      val ev = read("events")
      val eOff = offsetFor(ev, "event_id")
      val uOff = offsetFor(ev, "user_id")
      write(ev.crossJoin(reps).select(
          (col("event_id") + col("rep").cast("long") * eOff).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep").cast("long") * uOff).as("user_id"),
          col("event_type"), col("value"), col("props")),
        "events", factor * 2)
    }

    // -- TPC-H facts: consistent orderkey/custkey offsets --------------
    if (want("customer") || want("orders") || want("lineitem")) {
      val ordersSrc = read("orders")
      val custSrc = read("customer")
      val oOff = offsetFor(ordersSrc, "o_orderkey")
      val cOff = offsetFor(custSrc, "c_custkey")
      if (want("customer"))
        write(custSrc.crossJoin(reps).withColumn("c_custkey",
            col("c_custkey") + col("rep").cast("long") * cOff).drop("rep"),
          "customer", factor)
      if (want("orders"))
        write(ordersSrc.crossJoin(reps)
            .withColumn("o_orderkey",
              col("o_orderkey") + col("rep").cast("long") * oOff)
            .withColumn("o_custkey",
              col("o_custkey") + col("rep").cast("long") * cOff)
            .drop("rep"),
          "orders", factor * 2)
      if (want("lineitem"))
        write(read("lineitem").crossJoin(reps)
            .withColumn("l_orderkey",
              col("l_orderkey") + col("rep").cast("long") * oOff)
            .drop("rep"),
          "lineitem", factor * 4)
    }

    // -- dimensions: fixed (sublinear growth; broadcast side preserved) -
    Seq("part", "supplier", "nation", "region").foreach { t =>
      if (want(t)) write(read(t), t, 1)
    }
  }
}
