package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** An empty events table has no max(ts) to anchor the flush sentinel on:
  * before the guard, the long branch NPE'd on getLong and the timestamp
  * branch staged a NullType `ts` whose parquet schema conflicted with the
  * declared stream schema. The contract is now a clear fail-fast error
  * naming the real cause, not a crash three operators later.
  */
class SessionizeEmptyInputSpec extends SparkSpec {

  test("empty events table fails fast with the real reason, not an NPE downstream") {
    val dir = Files.createTempDirectory("empty-events")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = intercept[IllegalArgumentException] {
      StatefulSessionize(spark, dir.toString)
    }
    assert(e.getMessage.contains("empty"), e.getMessage)
    assert(e.getMessage.contains("events.parquet"), e.getMessage)
  }
}
