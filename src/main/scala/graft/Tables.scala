package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Test-table reader. The driver's `events` table carries a parquet TIMESTAMP(NANOS)
 * column, which Spark does not decode natively ([PARQUET_TYPE_ILLEGAL]); we read it as
 * a raw nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
 * microseconds with integer arithmetic (a double division would lose precision at
 * 1e18 ns magnitudes).
 */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
