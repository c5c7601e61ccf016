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
  *  - documents: replica r > 0 prefixes every token with `r<r>` so
  *    cross-replica shingles/minhashes/simhashes do NOT collide; each
  *    replica reproduces the original pair structure in a disjoint hash
  *    space → pairs/edges/triangles scale linearly in factor, which is
  *    what real corpus growth looks like. doc_id offsets by
  *    max(doc_id)+1 per replica, so `doc_id % 10` style holdout
  *    predicates keep their per-replica meaning (the offset is a
  *    multiple of 10 for the driver's contiguous 0-based ids).
  *  - embeddings: a deterministic per-(replica, dimension) sinusoidal
  *    perturbation keeps cross-replica cosine well under dedup
  *    thresholds while leaving each replica's neighbor structure intact.
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
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> [factor]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    amplify(spark, src, out, factor)
    spark.stop()
  }

  def amplify(spark: SparkSession, src: String, out: String,
              factor: Int): Unit = {
    val reps = broadcast(spark.range(factor)
      .select(col("id").cast("int").as("rep")))
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    def offsetFor(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // -- documents: id offset + per-replica token salt ------------------
    val docs = read("documents")
    val dOff = offsetFor(docs, "doc_id")
    val salted = docs.crossJoin(reps).select(
      (col("doc_id") + col("rep").cast("long") * dOff).as("doc_id"),
      when(col("rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          t => concat(lit("r"), col("rep"), t)), " ")).as("text"),
      col("lang"), col("source"))
    write(salted.withColumn("n_chars", length(col("text")).cast("long")),
      "documents", factor * 4)

    // -- embeddings: id offset + deterministic per-replica perturbation -
    val emb = read("embeddings")
    val vOff = offsetFor(emb, "vec_id")
    write(emb.crossJoin(reps).select(
        (col("vec_id") + col("rep").cast("long") * vOff).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + sin((i + 1) * (col("rep") * 7 + 3)) * lit(0.05))
              .cast("float"))).as("embedding"),
        col("label")),
      "embeddings", factor * 2)

    // -- events: id offsets, same time window (density grows) ----------
    val ev = read("events")
    val eOff = offsetFor(ev, "event_id")
    val uOff = offsetFor(ev, "user_id")
    write(ev.crossJoin(reps).select(
        (col("event_id") + col("rep").cast("long") * eOff).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep").cast("long") * uOff).as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events", factor * 2)

    // -- TPC-H facts: consistent orderkey/custkey offsets --------------
    val ordersSrc = read("orders")
    val custSrc = read("customer")
    val oOff = offsetFor(ordersSrc, "o_orderkey")
    val cOff = offsetFor(custSrc, "c_custkey")
    write(custSrc.crossJoin(reps).withColumn("c_custkey",
        col("c_custkey") + col("rep").cast("long") * cOff).drop("rep"),
      "customer", factor)
    write(ordersSrc.crossJoin(reps)
        .withColumn("o_orderkey",
          col("o_orderkey") + col("rep").cast("long") * oOff)
        .withColumn("o_custkey",
          col("o_custkey") + col("rep").cast("long") * cOff)
        .drop("rep"),
      "orders", factor * 2)
    write(read("lineitem").crossJoin(reps)
        .withColumn("l_orderkey",
          col("l_orderkey") + col("rep").cast("long") * oOff)
        .drop("rep"),
      "lineitem", factor * 4)

    // -- dimensions: fixed (sublinear growth; broadcast side preserved) -
    Seq("part", "supplier", "nation", "region").foreach { t =>
      write(read(t), t, 1)
    }
  }
}
