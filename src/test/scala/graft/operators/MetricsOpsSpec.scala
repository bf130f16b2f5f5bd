package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuiteBase

/**
 * `get_mean_grouping` behaviors ported from
 * `test_unstructured/metrics/test_evaluate.py:410-570`.
 */
class MetricsOpsSpec extends SparkSuiteBase {

  private def metricsDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a.pdf", "pdf", "s3", 0.9, 0.1),
      ("b.pdf", "pdf", "s3", 0.7, 0.3),
      ("c.docx", "docx", "local", 0.8, 0.2))
      .toDF("filename", "doctype", "connector", "cct-accuracy", "cct-%missing")
  }

  // -- test_get_mean_grouping_df_input (doctype: 2 groups, connector: 2)
  test("mean grouping aggregates mean/stdev/pstdev/count per group") {
    val byDoctype = MetricsOps.getMeanGrouping(metricsDf, "doctype", "text_extraction")
    assert(byDoctype.count() == 2)
    val pdf = byDoctype.filter(byDoctype("doctype") === "pdf").collect().head
    assert(pdf.getAs[Double]("cct-accuracy _mean") == 0.8)
    assert(pdf.getAs[Long]("cct-accuracy _count") == 2L)
    assert(MetricsOps.getMeanGrouping(metricsDf, "connector", "text_extraction")
      .count() == 2)
  }

  // -- metrics/utils.py _stdev/_pstdev: "Returns None if only 0 or 1 element
  // in the list" — a single-doc group must emit null deviations, not Spark's
  // stddev_samp=NaN / stddev_pop=0.0
  test("a single-doc group yields null deviations, matching _stdev/_pstdev") {
    val byDoctype = MetricsOps.getMeanGrouping(metricsDf, "doctype", "text_extraction")
    val docx = byDoctype.filter(byDoctype("doctype") === "docx").collect().head
    assert(docx.getAs[Long]("cct-accuracy _count") == 1L)
    assert(docx.getAs[Double]("cct-accuracy _mean") == 0.8)
    assert(docx.isNullAt(docx.fieldIndex("cct-accuracy _stdev")),
      s"n=1 sample stdev must be null, got ${docx.get(docx.fieldIndex("cct-accuracy _stdev"))}")
    assert(docx.isNullAt(docx.fieldIndex("cct-accuracy _pstdev")),
      s"n=1 population stdev must be null, got ${docx.get(docx.fieldIndex("cct-accuracy _pstdev"))}")
    // and a 2-doc group still gets real deviations
    val pdf = byDoctype.filter(byDoctype("doctype") === "pdf").collect().head
    assert(!pdf.isNullAt(pdf.fieldIndex("cct-accuracy _stdev")))
    assert(!pdf.isNullAt(pdf.fieldIndex("cct-accuracy _pstdev")))
  }

  // -- test_get_mean_grouping_all_file: one global row, no grouping column
  test("'all' grouping yields one global row") {
    val all = MetricsOps.getMeanGrouping(metricsDf, "all", "text_extraction")
    assert(all.count() == 1)
    assert(!all.columns.contains("grouping_key"))
    assert(all.collect().head.getAs[Double]("cct-accuracy _mean") == 0.8)
  }

  // -- test_get_mean_grouping_all_file / _all_file_txt (:538, :570): filter
  // the dummy CCT frame to two filenames, then 'all'-group — the reference
  // pins mean 0.903, sample sd 0.129, population sd 0.091 for cct-accuracy
  test("filter-by-filename then 'all' grouping matches the pinned statistics") {
    import spark.implicits._
    val dummy = Seq(
      ("Bank Good Credit Loan.pptx", "pptx", "connector1", 0.812, 0.001),
      ("Performance-Audit-Discussion.pdf", "pdf", "connector1", 0.994, 0.002),
      ("currency.csv", "csv", "connector2", 0.887, 0.041))
      .toDF("filename", "doctype", "connector", "cct-accuracy", "cct-%missing")
    val filtered = MetricsOps.filterMetrics(dummy,
      Seq("Bank Good Credit Loan.pptx", "Performance-Audit-Discussion.pdf"))
    assert(filtered.count() == 2)
    val all = MetricsOps.getMeanGrouping(filtered, "all", "text_extraction")
      .collect().head
    assert(all.getAs[Double]("cct-accuracy _mean") == 0.903)
    assert(all.getAs[Double]("cct-accuracy _stdev") == 0.129)
    assert(all.getAs[Double]("cct-accuracy _pstdev") == 0.091)
  }

  // -- test_get_mean_grouping_invalid_group
  test("an invalid grouping category raises") {
    val e = intercept[IllegalArgumentException](
      MetricsOps.getMeanGrouping(metricsDf, "invalid", "text_extraction"))
    assert(e.getMessage.contains("Invalid grouping category"))
  }

  // -- test_get_mean_grouping_invalid_eval_name
  test("an unknown eval name raises") {
    val e = intercept[IllegalArgumentException](
      MetricsOps.getMeanGrouping(metricsDf, "doctype", "invalid"))
    assert(e.getMessage.contains("Unknown metric"))
  }

  // -- test_get_mean_grouping_missing_grouping_column / _all_null /
  // test_text_extraction_grouping_empty_df
  test("missing column, all-null column, and empty data raise") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val noCol = metricsDf.drop("doctype")
    assertThrows[IllegalStateException](
      MetricsOps.getMeanGrouping(noCol, "doctype", "text_extraction"))
    val allNull = metricsDf.withColumn("doctype", lit(null).cast("string"))
    assertThrows[IllegalStateException](
      MetricsOps.getMeanGrouping(allNull, "doctype", "text_extraction"))
    val empty = metricsDf.filter(lit(false))
    assertThrows[IllegalStateException](
      MetricsOps.getMeanGrouping(empty, "doctype", "text_extraction"))
  }
}
