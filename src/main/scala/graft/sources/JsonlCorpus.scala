package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document-corpus source — the interchange format crawl dumps and
  * training corpora actually arrive in (one JSON object per line).
  *
  * Read discipline for 100 TB of crawler output, where malformed lines
  * are a certainty, not an edge case:
  *  - EXPLICIT schema (never `inferSchema` — inference is a full extra
  *    pass over the data and pins the schema to whatever the first files
  *    happened to contain);
  *  - PERMISSIVE mode with a corrupt-record column, so one bad line
  *    quarantines instead of failing a 1000-executor job
  *    (FAILFAST) or silently vanishing (DROPMALFORMED);
  *  - the caller splits valid from quarantined with [[splitCorrupt]] and
  *    routes the rejects to a dead-letter sink for inspection.
  */
object JsonlCorpus {

  val CorruptCol = "_corrupt_json"

  /** Default document schema (mirrors the engine's documents table). */
  val DocumentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read a JSONL corpus with quarantine. The returned frame carries
    * [[CorruptCol]]: null for parsed rows, the raw line for rejects.
    *
    * Implemented as a TEXT scan + `from_json` expression rather than the
    * JSON datasource: the datasource refuses plans that reference only
    * the corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    * COLUMN), which is exactly what a dead-letter sink does — and the
    * text+expression form keeps the parse inside whole-stage codegen of
    * a single scan (per materialization; see [[splitCorrupt]] on paying
    * for both halves). */
  def read(spark: SparkSession, path: String,
      schema: StructType = DocumentSchema): DataFrame = {
    // Spark resolution is case-insensitive by default — so is this guard
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(CorruptCol)),
      s"schema must not already contain $CorruptCol")
    val full = schema.add(StructField(CorruptCol, StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0) // blank lines are not documents
      .select(col("value"), from_json(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("__j"))
      .select(
        schema.fieldNames.map(f => col(s"__j.`$f`")) :+
          // a line holding a non-object JSON value (`null`, `42`, `"x"`)
          // parses to a NULL struct with no corrupt marker — without this
          // coalesce it would masquerade as an all-null VALID document
          coalesce(col(s"__j.`$CorruptCol`"),
            when(col("__j").isNull, col("value"))).as(CorruptCol): _*)
  }

  /** (valid, quarantined) split of a [[read]] frame. Valid rows drop the
    * corrupt column; quarantined rows keep only the raw line (for a
    * dead-letter sink).
    *
    * The two halves are independent filters over the SAME lazy plan:
    * materializing both re-reads the input twice. Fine for a quarantine
    * sink that runs alongside the main write anyway; when one pass must
    * pay for both outputs, either persist the [[read]] frame first or
    * write it once partitioned by `CorruptCol IS NULL` and split at the
    * sink. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))
}
