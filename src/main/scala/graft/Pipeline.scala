package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Xlsx
import graft.state.StateStore

/** One micro-batch outcome (the reference's render/download payload,
  * /root/reference/app.py:169-174).
  */
case class BatchResult(
    uploadId: Long,
    summary: DataFrame,      // category_totals_summary: rank table
    topSpenders: DataFrame,  // one row per category
    merged: DataFrame,       // 14-column joined detail
    nested: DataFrame,       // per-customer category detail (A4)
    nChanges: Long)          // address-change rows captured this batch

/** The end-to-end micro-batch pipeline — the Spark-native equivalent of
  * the reference's `upload_file` flow (/root/reference/app.py:58-182):
  * xlsx ingest → sheet validation → upload metadata → customer parse →
  * CDC + upsert → header promotion → joins → aggregates → ranked outputs
  * → 3-sheet xlsx export.
  *
  * This is the reference-parity path: amounts are float64 with banker's
  * rounding, duplicate customers inflate the m:m join, repeat uploads
  * re-toggle addresses — all deliberately preserved (SURVEY.md §7.4).
  * The GoldenPipelineSpec asserts the reference's golden values on its
  * own sample workbook.
  */
class Pipeline(spark: SparkSession, stateDir: String, processedDir: String,
               shardThreshold: Long = Xlsx.DefaultShardThreshold) {

  val store = new StateStore(spark, stateDir)
  Files.createDirectories(Paths.get(processedDir))

  val RequiredSheets = Set("Transactions", "Customers", "Products")

  /** S3: the reference accepts only .xlsx uploads (app.py:55-56). */
  def allowedFile(filename: String): Boolean =
    filename.toLowerCase.endsWith(".xlsx")

  /** Run one workbook as a micro-batch against persistent state.
    *
    * @param timestamp one ISO timestamp per batch (app.py:78 — computed
    *                  once, shared by all change rows; F9)
    */
  def runBatch(workbookPath: String,
               timestamp: String = LocalDateTime.now().toString)
      : BatchResult = {
    val filename = Paths.get(workbookPath).getFileName.toString
    require(allowedFile(filename), s"not an xlsx: $filename")

    val sheets = Xlsx.readSheets(spark, workbookPath)
    runBatchSheets(sheets, filename, timestamp)
  }

  /** Same micro-batch against already-materialized sheet frames — the
    * entry the batched landing stream uses after its one distributed
    * parse across all of a micro-batch's workbooks
    * ([[graft.streaming.StreamingPipeline.workbookStreamBatched]]): per
    * workbook it passes filtered views of the shared parse output
    * instead of re-parsing on the driver.
    */
  def runBatchSheets(sheets: Map[String, DataFrame], filename: String,
                     timestamp: String = LocalDateTime.now().toString)
      : BatchResult = {
    require(RequiredSheets.subsetOf(sheets.keySet),          // S2
      "File must contain Transactions, Customers, and Products sheets.")

    val txRaw = sheets("Transactions")
    val custRaw = sheets("Customers")
    val prodRaw = sheets("Products")

    // A5 + S6: per-sheet data row counts (minus header), dense upload id.
    val uploadId = store.recordUpload(filename, timestamp,
      txRaw.count() - 1, custRaw.count() - 1, prodRaw.count() - 1)

    // P1-P9: skip header row, parse packed records, keep file order.
    // Cached for the batch: the CDC/upsert layer and the analytics chain
    // materialize it several times; the cache is dropped before returning
    // (post-return re-reads of the BatchResult frames re-derive lazily).
    val parsed = Relational.parseCustomers(
        custRaw.where(col("_row_idx") > 0), "_c0",
        passthrough = Seq("_row_idx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try runBatchImpl(parsed, txRaw, prodRaw, timestamp, uploadId)
    finally parsed.unpersist(blocking = false)
  }

  private def runBatchImpl(parsed: DataFrame, txRaw: DataFrame,
                           prodRaw: DataFrame, timestamp: String,
                           uploadId: Long): BatchResult = {
    // J3 + S7 + S8: CDC capture + last-wins upsert.
    val nChanges = store.applyCustomerBatch(parsed, timestamp, uploadId)
    renderBatch(parsed, txRaw, prodRaw, uploadId, nChanges)
  }

  /** The stateless tail of a micro-batch — joins, aggregates, ranked
    * outputs, xlsx export — for a file whose STATE effects (upload
    * metadata, CDC, upsert) were already applied, possibly as part of a
    * whole-micro-batch set-based application
    * ([[graft.state.StateStore.applyCustomerBatchMulti]]).
    */
  private[graft] def renderBatch(parsed: DataFrame, txRaw: DataFrame,
                                 prodRaw: DataFrame, uploadId: Long,
                                 nChanges: Long): BatchResult = {
    // P10-P11: header promotion; the batch's own (possibly duplicated)
    // customer view joins the analytics — not the deduped state table
    // (app.py:132 uses the parsed frame; SURVEY.md §7.4.2).
    val transactions = Relational.promoteHeader(txRaw)
      .withColumnRenamed("_row_idx", "_tx_idx")
    val products = Relational.promoteHeader(prodRaw).drop("_row_idx")
    val customersBatch = parsed.withColumnRenamed("_row_idx", "_cust_idx")

    // J1 + J2 + P12. Row order mirrors pandas merge output (left row
    // order, then right occurrence order) via the carried indices.
    val merged = Relational.castAmount(
        Relational.enrich(transactions, products, customersBatch))
      .orderBy("_tx_idx", "_cust_idx")
      .select("transaction_id", "customer_id", "transaction_date",
        "product_code", "amount", "payment_type", "product_name", "category",
        "unit_price", "name", "email", "dob", "address", "created_date")

    // A1 → A2/W1 + A3 + A4. The parity path uses the literal W1 window
    // form: its input is one row per customer (bounded by the workbook),
    // and unlike the two-phase scale path it caches nothing — a
    // long-lived ingestion service must not accumulate persisted frames
    // per batch. The scale path is the SparkEntry flagship default and
    // is equality-tested against this form in RelationalSpec.
    val categoryTotals = Relational.categoryTotals(merged)
    val summary = Relational.summaryRankedWindow(categoryTotals)
    val top = Relational.topSpenders(categoryTotals)
    val nested = Relational.nestDetails(categoryTotals)

    // S12: 3-sheet export, rows ordered as rendered (SURVEY.md §7.4.5).
    // Size-aware (SURVEY §7.4.8): the bounded summary/top sheets always
    // collect into the single workbook; the input-sized MergedData sheet
    // switches to the executor-side sharded writer past shardThreshold
    // rows, so a large upload never collects its detail on the driver.
    Xlsx.writeAuto(s"$processedDir/processed_$uploadId.xlsx",
      Seq("CategoryTotalsSummary" -> summary,
        "TopSpenders" -> top.orderBy("category")),
      "MergedData" -> merged,
      shardThreshold)

    BatchResult(uploadId, summary, top, merged, nested, nChanges)
  }
}
