package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV landing source/sink for document corpora — the [[Jsonl]] landing
  * contract on the other ubiquitous interchange format, with CSV's
  * *different* quarantine semantics made explicit and tested:
  *
  *  - JSON parse failure nulls the WHOLE row (one malformed byte poisons
  *    the record); CSV failure is field-local — a type-violating field
  *    nulls only itself, later fields still parse, and the raw line
  *    lands in the corrupt column. Quarantined CSV rows therefore keep
  *    their (parsed) `source`, so the landing audit groups damage under
  *    the real source instead of a NULL bucket (CsvSpec pins this
  *    field-local recovery; the `csv_landing` oracle replays it).
  *  - A short row (fewer tokens than the schema) is null-filled AND
  *    flagged corrupt.
  *
  * Scale posture mirrors [[Jsonl]]: explicit schema (no inference pass),
  * single-line records so the scan stays line-splittable (embedded
  * newlines would force `multiLine=true`, which makes files
  * unsplittable — the corpus contract here is single-line; [[Jsonl]] is
  * the format for newline-bearing text), PERMISSIVE quarantine instead
  * of job failure. Reader and writer stay on Spark's symmetric defaults
  * (quote `"`, escape `\`), so the write→read round trip is lossless for
  * delimiter/quote/backslash content. Known CSV coercion: empty string
  * and NULL both serialize to the empty field and read back as NULL.
  */
object Csv {

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

  /** Generation-2 landing schema: base columns plus the additive
    * `quality_tier` string. CSV records are POSITIONAL — they cannot
    * self-describe field absence the way JSON lines can, so the
    * evolution contract for CSV reads each GENERATION under its own
    * schema (the generation boundary is explicit: per-generation landing
    * subdirectories) and unions under the superset with null-fill
    * ([[readEvolved]]). Reading a gen-1 shard under the superset schema
    * would be WRONG by this format's own rule: a 5-field row under a
    * 6-field schema is a short row, which is null-filled AND flagged
    * corrupt — additive evolution would quarantine every old shard.
    * That behavior is pinned (CsvSpec) as part of the contract:
    * it is why the generation key must be explicit for CSV.
    */
  val docSchemaV2: StructType = StructType(
    docSchema.fields.patch(5,
      Seq(StructField("quality_tier", StringType)), 0))

  /** Render documents as generation-2 CSV lines: base fields plus the
    * deterministic `quality_tier` (doc_id%3: 0→high, 1→medium, 2→low).
    * Same `corruptMod` type-violation plant as [[renderLines]] (`xx` in
    * the BIGINT `n_chars` slot) — under CSV's field-local recovery the
    * violating row's OTHER fields, including the new quality_tier,
    * still parse.
    */
  def renderLinesV2(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val tier = elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
      lit("high"), lit("medium"), lit("low")).as("quality_tier")
    val good = to_csv(struct(col("doc_id"), col("lang"), col("n_chars"),
      col("source"), col("text"), tier))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          to_csv(struct(col("doc_id"), col("lang"),
            lit("xx").as("n_chars"), col("source"), col("text"), tier)))
          .otherwise(good)
      else good
    docs.select(rendered.as("value"))
  }

  /** Two-generation CSV landing scan: gen-1 under [[docSchema]], gen-2
    * under [[docSchemaV2]], unioned by name with null-fill (gen-1 rows
    * read `quality_tier` null). Quarantine semantics within each
    * generation are [[read]]'s unchanged — field-local recovery, short
    * rows flagged.
    */
  def readEvolved(spark: SparkSession, gen1Path: String,
                  gen2Path: String): DataFrame =
    read(spark, gen1Path).unionByName(
      spark.read
        .schema(docSchemaV2)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .csv(gen2Path),
      allowMissingColumns = true)

  /** Generation-3 landing schema: [[docSchemaV2]] with `n_chars`
    * WIDENED BIGINT → DOUBLE (the type-CHANGE leg of the evolution
    * contract, VERDICT r12 item 5). CSV generations read under their
    * own schemas ([[docSchemaV2]]'s positional-records rationale), so a
    * type change is a UNION-CAST rule, not a read-schema rule:
    * [[readRetyped]] casts every older generation's column UP to the
    * widest type any generation declares — BIGINT → DOUBLE is lossless
    * for every value a BIGINT generation can hold (documents' n_chars
    * is far below 2^53). The NARROWING direction is a pinned REFUSAL:
    * the union never casts down (a DOUBLE → BIGINT cast would silently
    * truncate the fractional generation), and reading a
    * fractional-valued shard under a BIGINT schema is a field-local
    * type violation — quarantined exactly like the `xx` plant, with
    * the other fields recovered (CsvSpec pins both).
    */
  val docSchemaV3: StructType = StructType(docSchemaV2.fields.map {
    case f if f.name == "n_chars" => f.copy(dataType = DoubleType)
    case f => f
  })

  /** Render documents as generation-3 CSV lines: `quality_tier` as in
    * [[renderLinesV2]], `n_chars` carrying the widened DOUBLE payload
    * (`n_chars + 0.5` — deterministic, dyadic-exact, observable). Same
    * `corruptMod` type-violation plant (`xx` in the now-DOUBLE
    * `n_chars` slot — still non-numeric, still field-locally
    * quarantined).
    */
  def renderLinesV3(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val tier = elt((pmod(col("doc_id"), lit(3)) + 1).cast("int"),
      lit("high"), lit("medium"), lit("low")).as("quality_tier")
    val frac = (col("n_chars").cast("double") + lit(0.5)).as("n_chars")
    val good = to_csv(struct(col("doc_id"), col("lang"), frac,
      col("source"), col("text"), tier))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          to_csv(struct(col("doc_id"), col("lang"),
            lit("xx").as("n_chars"), col("source"), col("text"), tier)))
          .otherwise(good)
      else good
    docs.select(rendered.as("value"))
  }

  /** Three-generation CSV landing scan with the widening union-cast:
    * gen-1 under [[docSchema]], gen-2 under [[docSchemaV2]], gen-3
    * under [[docSchemaV3]]; older generations' `n_chars` is cast UP to
    * DOUBLE before the name-union (lossless), `quality_tier` null-fills
    * for gen-1. Quarantine semantics within each generation are
    * [[read]]'s unchanged.
    */
  def readRetyped(spark: SparkSession, gen1Path: String, gen2Path: String,
                  gen3Path: String): DataFrame = {
    def widen(df: DataFrame): DataFrame =
      df.withColumn("n_chars", col("n_chars").cast("double"))
    widen(read(spark, gen1Path))
      .unionByName(
        widen(spark.read
          .schema(docSchemaV2)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .csv(gen2Path)),
        allowMissingColumns = true)
      .unionByName(
        spark.read
          .schema(docSchemaV3)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CorruptCol)
          .csv(gen3Path),
        allowMissingColumns = true)
  }

  /** [[landingStatsEvolved]] extended with the widening signal —
    * `n_frac` (clean rows with fractional n_chars: only the widened
    * generation can produce them) and the double-typed clean sum
    * (dyadic-exact, order-portable). The field-local rule carries
    * through: a quarantined gen-2/gen-3 row still counts in
    * n_with_tier.
    */
  def landingStatsRetyped(landed: DataFrame): DataFrame = {
    val clean = col(CorruptCol).isNull
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col(CorruptCol)).as("n_quarantined"),
        count(col("quality_tier")).as("n_with_tier"),
        count(when(clean && col("n_chars") =!= floor(col("n_chars")),
          lit(1))).as("n_frac"),
        sum(when(clean, col("n_chars"))).cast("double")
          .as("sum_n_chars_clean"),
        min(when(clean, col("doc_id"))).as("min_doc"),
        max(when(clean, col("doc_id"))).as("max_doc"))
      .orderBy(asc_nulls_first("source"))
  }

  /** [[landingStats]] extended with the evolution signal (n_with_tier).
    * Note the field-local consequence the `csv_landing_evolved` oracle
    * replays: a gen-2 row quarantined by the n_chars type violation
    * still counts in n_with_tier — its quality_tier field parsed.
    */
  def landingStatsEvolved(landed: DataFrame): DataFrame = {
    val clean = col(CorruptCol).isNull
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col(CorruptCol)).as("n_quarantined"),
        count(col("quality_tier")).as("n_with_tier"),
        sum(when(clean, length(coalesce(col("text"), lit("")))))
          .cast("long").as("sum_chars_clean"),
        sum(when(clean, col("n_chars"))).cast("long")
          .as("sum_n_chars_clean"),
        min(when(clean, col("doc_id"))).as("min_doc"),
        max(when(clean, col("doc_id"))).as("max_doc"))
      .orderBy(asc_nulls_first("source"))
  }

  /** Render documents as CSV lines. With `corruptMod > 0`, rows with
    * `doc_id % corruptMod == 0` carry the non-numeric token `xx` in the
    * BIGINT `n_chars` slot — a deterministic type violation (truncation,
    * the JSONL plant, is NOT reliably malformed in CSV: a numeric prefix
    * still parses), replayable by a DuckDB oracle.
    */
  def renderLines(docs: DataFrame, corruptMod: Int = 0): DataFrame = {
    val good = to_csv(struct(col("doc_id"), col("lang"), col("n_chars"),
      col("source"), col("text")))
    val rendered =
      if (corruptMod > 0)
        when(col("doc_id") % corruptMod === 0,
          to_csv(struct(col("doc_id"), col("lang"),
            lit("xx").as("n_chars"), col("source"), col("text"))))
          .otherwise(good)
      else good
    docs.select(rendered.as("value"))
  }

  /** Write rendered lines ([[renderLines]]) as a plain-text CSV dir. */
  def writeLines(lines: DataFrame, path: String): Unit =
    lines.write.mode("overwrite").text(path)

  /** Scan a CSV landing dir with the explicit document schema; malformed
    * rows surface with the failing fields null, the parseable fields
    * intact, and the raw line in [[CorruptCol]].
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Per-source landing audit over a [[read]] result. Unlike the JSONL
    * form, quarantined rows group under their REAL source (CSV recovery
    * is field-local), so the audit shows per-source damage directly;
    * character volume is summed over clean rows only.
    *
    * IMPORTANT (a measured Spark footgun, pinned by CsvSpec): CSV
    * corrupt-record detection is PROJECTION-DEPENDENT — the parser only
    * parses referenced columns, so a type violation in a pruned-away
    * column is never seen and its row silently reads as clean. An audit
    * that grouped by `source` alone would report zero quarantine over a
    * damaged landing zone. This aggregate therefore references every
    * typed column (`doc_id`, `n_chars`, `text`) so the scan validates
    * the full row — which is also why `sum_n_chars_clean` exists.
    */
  def landingStats(landed: DataFrame): DataFrame = {
    val clean = col(CorruptCol).isNull
    landed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count(col(CorruptCol)).as("n_quarantined"),
        // CSV round-trips '' to NULL; coalescing before length() makes
        // empty and absent texts both contribute 0, so the audit agrees
        // with a parquet-side replay (LENGTH(COALESCE(text,''))) even
        // for a source whose every clean row is empty — without it that
        // group sums to NULL here but 0 over the originals.
        sum(when(clean, length(coalesce(col("text"), lit("")))))
          .cast("long").as("sum_chars_clean"),
        sum(when(clean, col("n_chars"))).cast("long")
          .as("sum_n_chars_clean"),
        min(when(clean, col("doc_id"))).as("min_doc"),
        max(when(clean, col("doc_id"))).as("max_doc"))
      .orderBy(asc_nulls_first("source"))
  }
}
