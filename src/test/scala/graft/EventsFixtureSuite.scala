package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver owns /root/testdata and has already changed events.parquet's
  * physical `ts` type once (TIMESTAMP(NANOS) through round 9,
  * TIMESTAMP_MICROS isAdjustedToUTC=0 from round 10). This suite pins
  * `SparkEntry.events()`'s type dispatch: every encoding the fixture has
  * ever shipped (or plausibly could) must load to the identical instant,
  * and anything else must fail fast with the loaded type named — never an
  * analysis error deep inside a consumer query.
  *
  * The NANOS case is exercised at the loaded-shape level: with
  * `spark.sql.legacy.parquet.nanosAsLong` (which events() sets), a physical
  * TIMESTAMP(NANOS) column arrives as LongType — indistinguishable from the
  * plain-INT64 nanos column written here, which Spark CAN write. The
  * dispatch only ever sees the loaded type.
  */
class EventsFixtureSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2026-01-02T03:04:05.123456 UTC — sub-second micros catch unit slips.
  private val instantMicros = {
    val ldt = LocalDateTime.of(2026, 1, 2, 3, 4, 5, 123456000)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + 123456L
  }

  private def otherCols(df: DataFrame): DataFrame = df
    .withColumn("event_id", lit(1L))
    .withColumn("user_id", lit(7L))
    .withColumn("event_type", lit("view"))
    .withColumn("value", lit(1.5))
    .withColumn("props", lit("{}"))

  /** Write a one-row events.parquet whose ts column is built by `mk`,
    * then load it through SparkEntry.events and return the instant as
    * epoch micros (evaluated under the pinned UTC session). */
  private def roundtrip(name: String, mk: DataFrame => DataFrame): Long = {
    val dir = Files.createTempDirectory(s"events_fixture_$name").toString
    otherCols(mk(spark.range(1).toDF()))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    val loaded = SparkEntry.events(spark, dir)
    assert(loaded.schema("ts").dataType === TimestampType,
      s"$name: events() must normalize ts to TIMESTAMP")
    loaded.select(unix_micros(col("ts"))).as[Long].head()
  }

  test("nanos-as-long, NTZ micros, and UTC micros all load to the same instant") {
    val fromNanosLong = roundtrip("nanos",
      _.withColumn("ts", lit(instantMicros * 1000L)))
    val fromNtz = roundtrip("ntz",
      _.withColumn("ts", timestamp_micros(lit(instantMicros)).cast(TimestampNTZType)))
    val fromUtc = {
      // Force the UTC-adjusted micros physical encoding (not INT96/nanos).
      val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try roundtrip("utc", _.withColumn("ts", timestamp_micros(lit(instantMicros))))
      finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
        spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    }
    assert(fromNanosLong === instantMicros)
    assert(fromNtz === instantMicros)
    assert(fromUtc === instantMicros)
  }

  test("an unsupported ts type fails fast with the loaded type named") {
    val err = intercept[RuntimeException] {
      roundtrip("string", _.withColumn("ts", lit("2026-01-02 03:04:05")))
    }
    assert(err.getMessage.contains("unsupported type"))
    assert(err.getMessage.contains("StringType"))
  }
}
