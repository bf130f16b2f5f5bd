package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs that exercise Dataset-level operators. */
trait SparkSuiteBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuiteBase.session
}

object SparkSuiteBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
