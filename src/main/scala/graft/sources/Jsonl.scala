package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) landing source/sink for document
  * corpora — the de-facto interchange format of LLM training-data
  * pipelines, added alongside the reference's xlsx landing surface
  * (reference: upload validation at /root/reference/app.py:55-71 —
  * extension filter + required-sheet check + reject-with-message; here
  * the same "validate on landing, never crash the job" contract applied
  * to malformed JSON lines).
  *
  * Scale posture (100 TB):
  *  - **Explicit schema, never inference.** `spark.read.json` without a
  *    schema runs a full extra pass over the input to infer one; at
  *    corpus scale that doubles the scan. [[read]] requires the schema.
  *  - **Line-splittable.** Records are single physical lines (the writer
  *    relies on JSON string-escaping `\n`), so the text source splits a
  *    100 TB landing zone into `maxPartitionBytes` chunks with no
  *    record-boundary coordination.
  *  - **Quarantine, don't fail.** PERMISSIVE mode routes malformed lines
  *    to a corrupt-record column instead of killing the job five hours
  *    in; the landing stats make the quarantine *visible* (a silent
  *    DROPMALFORMED hides data loss). The whole path is plain projections
  *    + one aggregation — codegen'd, no UDFs.
  */
object Jsonl {

  /** Corrupt-record column name (PERMISSIVE quarantine target). */
  val CorruptCol = "_corrupt"

  /** The documents-table landing schema plus the quarantine column. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField(CorruptCol, StringType)))

  /** Generation-2 landing schema — the base document columns plus the
    * ADDITIVE `quality_tier` string. This is the superset schema the
    * evolution contract reads EVERY generation under: JSON records
    * self-describe field absence, so a gen-1 line (no `quality_tier`
    * key) parses CLEAN with the column null — additive evolution costs
    * nothing and quarantines nothing (pinned by JsonlSpec and the
    * `jsonl_landing_evolved` oracle). A TYPE change is not additive: a
    * line whose field violates the schema type flags corrupt with the
    * violating field null and well-formed fields retained (PERMISSIVE
    * partial results) — visible damage, never a silent coercion; a
    * MALFORMED line still nulls whole-row. Both pinned in JsonlSpec.
    */
  val docSchemaV2: StructType = StructType(
    docSchema.fields.patch(5,
      Seq(StructField("quality_tier", StringType)), 0))

  /** Render documents as generation-2 JSON lines: the base fields plus
    * `quality_tier` derived deterministically from doc_id
    * (0→high, 1→medium, 2→low), so a DuckDB oracle replays the evolved
    * generation exactly. Same `corruptMod` truncation plant as
    * [[renderLines]].
    */
  def renderLinesV2(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars"),
      col("source"), col("text"),
      elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
        lit("high"), lit("medium"), lit("low")).as("quality_tier")))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          line.substr(lit(1), floor(length(line) / 2).cast("int")))
          .otherwise(line)
      else line
    docs.select(rendered.as("value"))
  }

  /** Scan a MIXED-generation JSONL landing (any number of paths) under
    * the superset schema [[docSchemaV2]]: gen-1 rows parse clean with
    * `quality_tier` null, gen-2 rows carry it, malformed lines
    * quarantine whole-row exactly as in [[read]].
    */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(docSchemaV2)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** Generation-3 landing schema — [[docSchemaV2]] with `n_chars`
    * WIDENED BIGINT → DOUBLE (VERDICT r12 item 5: the type-CHANGE leg
    * of the evolution contract). The widening rule for JSONL: read
    * every generation under the WIDEST type any generation wrote — a
    * JSON integer parses losslessly as a double, so gen-1/gen-2 lines
    * stay clean under this schema while gen-3 lines may carry the
    * fractional values the widening exists for. The NARROWING rule is
    * the mirror image and is pinned as a refusal: reading a
    * fractional-valued generation under the old BIGINT schema flags
    * those rows corrupt (JsonlSpec pins the exact quarantine shape) —
    * narrowing is never a silent truncation, so a landing zone that
    * widened a column can only be read correctly by widening the read
    * schema with it.
    */
  val docSchemaV3: StructType = StructType(docSchemaV2.fields.map {
    case f if f.name == "n_chars" => f.copy(dataType = DoubleType)
    case f => f
  })

  /** Render documents as generation-3 JSON lines: `quality_tier` as in
    * [[renderLinesV2]], and `n_chars` carrying the widened DOUBLE
    * payload — the deterministic fractional value `n_chars + 0.5`, so
    * (a) the widening is observable (an integral-valued double would be
    * indistinguishable in JSON), and (b) a DuckDB oracle replays it
    * exactly (dyadic fractions are exact in IEEE doubles). Same
    * `corruptMod` truncation plant as [[renderLines]].
    */
  def renderLinesV3(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val line = to_json(struct(col("doc_id"), col("lang"),
      (col("n_chars").cast("double") + lit(0.5)).as("n_chars"),
      col("source"), col("text"),
      elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
        lit("high"), lit("medium"), lit("low")).as("quality_tier")))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          line.substr(lit(1), floor(length(line) / 2).cast("int")))
          .otherwise(line)
      else line
    docs.select(rendered.as("value"))
  }

  /** Scan a THREE-generation JSONL landing under the widened superset
    * schema [[docSchemaV3]]: gen-1 (no tier, integer n_chars) and gen-2
    * (tier, integer n_chars) parse clean — JSON integers widen
    * losslessly to double — and gen-3 carries the fractional values.
    * Malformed lines quarantine whole-row exactly as in [[read]].
    */
  def readRetyped(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(docSchemaV3)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** [[landingStatsEvolved]] extended with the widening signal: how
    * many clean rows carry a FRACTIONAL `n_chars` (only the widened
    * generation can) and the double-typed sum — exact, because every
    * landed value is a dyadic rational far below 2^53, so the hash
    * compare is engine- and order-portable.
    */
  def landingStatsRetyped(landed: DataFrame): DataFrame =
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("text")).as("n_parsed"),
        count(col("quality_tier")).as("n_with_tier"),
        count(when(col("n_chars") =!= floor(col("n_chars")), lit(1)))
          .as("n_frac"),
        sum(col("n_chars")).cast("double").as("sum_n_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(asc_nulls_first("source"))

  /** [[landingStats]] extended with the evolution signal: how many rows
    * of each source carry the generation-2 column. One aggregate answers
    * "did the new generation land, and did the old one survive the
    * superset read".
    */
  def landingStatsEvolved(landed: DataFrame): DataFrame =
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("text")).as("n_parsed"),
        count(col("quality_tier")).as("n_with_tier"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(asc_nulls_first("source"))

  /** Render documents as JSON lines. With `corruptMod > 0`, rows with
    * `doc_id % corruptMod == 0` are truncated to half length — a strict
    * prefix of a JSON object is never valid JSON (the closing brace is
    * lost and any interior `}` sits inside a still-open string), so the
    * corruption is deterministically malformed: the exact planted-input
    * pattern the PII/boilerplate queries use, letting a DuckDB oracle
    * replay which rows land in quarantine.
    */
  def renderLines(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars"),
      col("source"), col("text")))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          line.substr(lit(1), floor(length(line) / 2).cast("int")))
          .otherwise(line)
      else line
    docs.select(rendered.as("value"))
  }

  /** Write rendered lines ([[renderLines]]) as a plain-text JSONL dir. */
  def writeLines(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)

  /** Scan a JSONL landing dir with the explicit document schema;
    * malformed lines surface with every data field null and the raw line
    * in [[CorruptCol]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Per-source landing audit over a [[read]] result: row/parsed counts,
    * round-tripped character volume, id range. Quarantined rows group
    * under the NULL source bucket (their fields are unparsed), so the one
    * aggregate shows both the healthy partitions and the damage.
    */
  def landingStats(landed: DataFrame): DataFrame =
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("text")).as("n_parsed"),
        sum(length(col("text"))).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(asc_nulls_first("source"))
}
