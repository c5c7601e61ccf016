package graft.state

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Parquet-backed persistent state for the micro-batch pipeline — the
  * Spark-native re-expression of the reference's SQLite layer
  * (/root/reference/app.py:20-52): `uploads` run metadata (S5/S6),
  * `customers` keyed upsert dimension (S7), `address_changes` CDC log
  * (S8), and the ordered audit scans (S10/S11).
  *
  * The reference's per-row `SELECT` + `INSERT OR REPLACE` loop
  * (app.py:110-123) is replaced by *set-based* plans with identical
  * semantics (SURVEY.md J3/S7): one window + one join per batch instead
  * of 2N point statements.
  *
  * Concurrency/scale notes:
  *  - upload ids and change ids are dense driver-side sequences — the
  *    reference's AUTOINCREMENT contract (app.py:89). Single-writer by
  *    design, exactly like the reference.
  *  - the customers upsert rewrites state via write-to-temp + atomic
  *    directory swap. On an object store / multi-writer deployment this
  *    slot is where a table format's MERGE would plug in; the operator
  *    semantics above it do not change.
  */
class StateStore(spark: SparkSession, dir: String) {

  private val root = Paths.get(dir)
  Files.createDirectories(root)
  recoverAll()

  private def sub(name: String): Path = root.resolve(name)

  /** Find every table with a leftover `__tmp`/`__old` sibling (no
    * hardcoded name list — any future swapWrite table is covered) and
    * run its crash recovery. Runs once at construction, before any read.
    */
  private def recoverAll(): Unit = {
    val s = Files.list(root)
    val bases =
      try {
        val it = s.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.endsWith("__tmp")) b += n.stripSuffix("__tmp")
          else if (n.endsWith("__old")) b += n.stripSuffix("__old")
        }
        b.result()
      } finally s.close()
    bases.foreach(recoverSwap)
  }

  /** Crash recovery for [[swapWrite]]'s rename sequence. If the live dir
    * is gone: a fully-committed temp (Spark's `_SUCCESS` marker) is the
    * newer state — finish the swap; otherwise the renamed-away `__old`
    * dir is the last good state — restore it (covers deployments where
    * success markers are disabled). Any remaining temp/old dir is stale
    * and removed.
    */
  private def recoverSwap(name: String): Unit = {
    val live = sub(name)
    val tmp = sub(s"${name}__tmp")
    val old = sub(s"${name}__old")
    if (!Files.exists(live) && Files.exists(tmp.resolve("_SUCCESS")))
      Files.move(tmp, live)
    else if (!Files.exists(live) && Files.exists(old))
      Files.move(old, live)
    if (Files.exists(live)) {
      deleteRecursively(tmp)
      deleteRecursively(old)
    }
  }

  private def readOrEmpty(name: String,
                          schema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    val p = sub(name)
    val nonEmpty = Files.exists(p) && {
      val s = Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
    if (nonEmpty)
      spark.read.schema(schema).parquet(p.toString)
    else
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
  }

  def customers: DataFrame = readOrEmpty("customers", Tables.customersSchema)
  def uploads: DataFrame = readOrEmpty("uploads", Tables.uploadsSchema)
  def addressChanges: DataFrame =
    readOrEmpty("address_changes", Tables.addressChangesSchema)

  /** S10: uploads audit listing, newest first (app.py:193-197). */
  def uploadsOrdered: DataFrame =
    uploads.orderBy(desc("timestamp"), desc("id"))

  /** S11: address-change audit listing, newest first (app.py:199-203). */
  def addressChangesOrdered: DataFrame =
    addressChanges.orderBy(desc("change_timestamp"), desc("id"))

  /** S6: append upload metadata; returns the dense autoincrement id
    * (driver-side single-writer sequence — NOT
    * `monotonically_increasing_id`, which is neither dense nor stable).
    */
  def recordUpload(filename: String, timestamp: String, txRows: Long,
                   custRows: Long, prodRows: Long): Long = {
    val nextId = uploads.agg(coalesce(max("id"), lit(0L))).head().getLong(0) + 1
    val row = spark.createDataFrame(
      java.util.List.of(
        Row(nextId, filename, timestamp, txRows, custRows, prodRows)),
      Tables.uploadsSchema)
    row.write.mode("append").parquet(sub("uploads").toString)
    nextId
  }

  /** J3 + S7 + S8 (app.py:110-123): CDC against *mutating intra-batch
    * state* plus last-writer-wins upsert, set-based.
    *
    * For the k-th occurrence of a customer in file order, the "old"
    * address is the (k-1)-th occurrence's address, or the stored state for
    * k=1 — expressed as `coalesce(lag(address) over file-order, stored)`.
    * A change row is emitted whenever old exists and differs, so repeat
    * uploads of a file with intra-batch duplicates re-toggle addresses
    * every time (4 changes then 8 per repeat on the reference sample —
    * deliberately non-idempotent, SURVEY.md §7.4.3).
    *
    * @param batch parsed customer rows carrying `_row_idx` (file order)
    * @return number of change rows captured
    */
  /** Note: this method materializes `batch` three times (change count,
    * change write, upsert write) — callers whose batch lineage is
    * expensive (e.g. a workbook parse) should persist it for the call
    * and unpersist afterwards, as [[graft.Pipeline.runBatch]] does;
    * caching is deliberately caller-owned so an already-cached frame is
    * not clobbered here.
    */
  def applyCustomerBatch(batch: DataFrame, timestamp: String,
                         uploadId: Long): Long = {
    val occ = Window.partitionBy("customer_id").orderBy("_row_idx")
    val stored = customers.select(col("customer_id"),
      col("address").as("_stored_address"))
    val withOld = batch
      .join(stored, Seq("customer_id"), "left")
      .withColumn("_old",
        coalesce(lag("address", 1).over(occ), col("_stored_address")))

    val changes = withOld
      .where(col("_old").isNotNull && col("_old") =!= col("address"))
      .select(col("customer_id"), col("_old").as("old_address"),
        col("address").as("new_address"),
        lit(timestamp).as("change_timestamp"),
        lit(uploadId).as("upload_id"), col("_row_idx"))

    // Crash consistency across the two tables: the change append commits
    // BEFORE the customers swap, so a crash between them leaves orphaned
    // change rows for this upload id; the per-file ledger then replays
    // the batch under the SAME upload id, and this rewrite absorbs the
    // orphans instead of double-logging them (change ids stay dense and
    // the log reflects the attempt that actually updated the state).
    // Normal operation pays only the take-1 probe — the rewrite runs on
    // replay alone. Cross-table atomicity beyond this needs a
    // transactional table format (the roadmap's MERGE-backend slot).
    if (!addressChanges.where(col("upload_id") === uploadId).isEmpty)
      swapWrite("address_changes",
        addressChanges.where(col("upload_id") =!= uploadId))

    // Dense change ids in file order. The unpartitioned window only ever
    // sees this batch's change rows (a per-batch trickle), not the corpus.
    val maxId =
      addressChanges.agg(coalesce(max("id"), lit(0L))).head().getLong(0)
    val idd = changes.withColumn("id",
        (lit(maxId) + row_number().over(Window.orderBy("_row_idx")))
          .cast("long"))
      .select(Tables.addressChangesSchema.fieldNames.toSeq.map(col): _*)

    val nChanges = idd.count()
    if (nChanges > 0)
      idd.write.mode("append").parquet(sub("address_changes").toString)

    // S7 upsert: last occurrence in file order wins within the batch.
    val lastWins = batch
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy("customer_id").orderBy(desc("_row_idx"))))
      .where(col("_rn") === 1)
      .select(col("customer_id"), col("name"), col("email"), col("dob"),
        col("address"), col("created_date"), lit(uploadId).as("upload_id"))
    val newState = customers
      .join(lastWins.select("customer_id"), Seq("customer_id"), "left_anti")
      .unionByName(lastWins)

    swapWrite("customers", newState)
    nChanges
  }

  /** Materialize `df` into `<name>__tmp`, then swap it in with two
    * same-directory renames (live → old, tmp → live) — never a
    * delete-then-move, so every crash point leaves either the old state
    * intact or a committed temp that [[recoverSwap]] finishes; the table
    * is never lost. The rename starts only after the parquet commit
    * protocol has written `_SUCCESS`.
    */
  private def swapWrite(name: String, df: DataFrame): Unit = {
    val tmp = sub(s"${name}__tmp")
    val live = sub(name)
    val old = sub(s"${name}__old")
    deleteRecursively(tmp)
    deleteRecursively(old)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (Files.exists(live)) Files.move(live, old)
    Files.move(tmp, live)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
