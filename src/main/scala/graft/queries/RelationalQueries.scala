package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Core relational operator coverage (SURVEY §2.5-§2.9): joins, windowed aggregation,
 * top-k, the metadata-consolidation aggregate dictionary, hash-id assignment, and
 * sessionization — each paired with a DuckDB oracle (ANSI SQL over the same parquet).
 *
 * Scale notes (the 100 TB design intent, validated on the plans):
 *  - dimension joins (`region`, `nation`, `customer`, `orders` at low SF) are explicitly
 *    `broadcast()` so no shuffle of the fact side is induced by small sides;
 *  - aggregations are partial (map-side combine) by construction — plain `groupBy.agg`;
 *  - every query filters/projects before joining so parquet scans carry
 *    `PushedFilters` and a pruned `ReadSchema`;
 *  - window functions partition by high-cardinality keys (no single-reducer sorts).
 */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.read(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-flavor pricing summary: partial-agg friendly, 6 aggregates, tiny result.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3-flavor: top-10 revenue orders in one segment. Scale-safe plan: only the
    // filtered CUSTOMER dim is broadcast; lineitem |><| orders is a shuffle join on the
    // order key (orders is a fact table — broadcasting it would OOM at 100x; AQE picks
    // the physical strategy at runtime).
    "q3_top_revenue_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val keys = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey")
      l.join(keys, l("l_orderkey") === keys("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-flavor: region->nation->customer->orders->lineitem star join, revenue
    // per nation for one region. Scale-safe plan: only true dims (region, nation) are
    // broadcast; customer|><|orders and orders|><|lineitem are shuffle joins on their
    // keys — both sides are fact-sized at 100x, so no fact-side broadcast anywhere.
    "q5_region_nation_revenue" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
      val dims = c
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("n_name"))
      val ord = o.join(dims, o("o_custkey") === dims("c_custkey"))
        .select(col("o_orderkey"), col("n_name"))
      l.join(ord, l("l_orderkey") === ord("o_orderkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("n_name"))
    }),

    // Event-time tumbling window aggregation (streaming-shaped, batch-executed).
    "q_events_hourly_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // The same hourly aggregation executed through Structured Streaming
    // (readStream → window() → AvailableNow → memory sink) — SURVEY §2.12
    // driver-visible: batch oracle, streaming execution.
    "q_stream_hourly_window" -> ((s, dir) =>
      graft.streaming.StreamingOps.hourlyWindowAvailableNow(s, s"$dir/events.parquet")
        .orderBy("hour", "event_type")),

    // Top-k per group via ranking window (partitioned by group key — scales out).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
      t(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("event_type", "rn")
    }),

    // Consolidation strategy FIRST (reference `ConsolidationStrategy.FIRST`,
    // elements.py:525-579): first value in document order -> min_by over the seq key.
    "q_consolidate_first" -> ((s, dir) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data — the ordering
      // key must include the value to stay deterministic across engines.
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(min_by(col("l_returnflag"),
          concat(lpad(col("l_linenumber"), 2, "0"), col("l_returnflag")))
          .as("first_flag"))
        .orderBy("l_orderkey")
    }),

    // STRING_CONCATENATE: order-sensitive concat — sort the collected (seq, value)
    // structs inside the agg, never rely on row order.
    "q_consolidate_string_concat" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("l_linenumber").as("ln"),
              col("l_returnflag").as("rf")))),
            x => x.getField("rf")), "").as("concat_flags"))
        .orderBy("l_orderkey")
    }),

    // LIST_UNIQUE: order-insensitive distinct union (sorted for determinism).
    "q_consolidate_list_unique" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(array_distinct(collect_list(col("l_returnflag")))), ",")
          .as("uniq_flags"))
        .orderBy("l_orderkey")
    }),

    // DICT_LIST_UNIQUE (enrichment_origins, elements.py:512-515): per element a
    // dict {l_linestatus -> [l_returnflag]}; consolidation unions keys and per key
    // concatenates then dedupes in first-seen (l_linenumber, value) order. Rendered
    // "K:v1,v2;K2:v3" with keys sorted for a deterministic compare.
    "q_consolidate_dict_list_unique" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linestatus")
        .agg(array_join(array_distinct(transform(
          array_sort(collect_list(struct(col("l_linenumber").as("ln"),
            col("l_returnflag").as("rf")))),
          x => x.getField("rf"))), ",").as("vals"))
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_list(
          concat(col("l_linestatus"), lit(":"), col("vals")))), ";").as("dict_str"))
        .orderBy("l_orderkey")
    }),

    // filter_metrics (metrics/evaluate.py:599-662): semi-join a per-doc metrics
    // frame on a filename allow-list (broadcast — the list side is always small)
    "q_filter_metrics" -> ((s, dir) => {
      val metrics = graft.Tables.read(s, dir, "documents")
        .select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("filename"),
          col("n_chars"), length(col("text")).cast("long").as("text_len"))
      val allow = graft.Tables.read(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0)
        .select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("filename"))
      graft.operators.MetricsOps.filterMetrics(metrics, allow, "filename")
        .orderBy("filename")
    }),

    // LIST_CONCATENATE: order-sensitive list append.
    "q_consolidate_list_concat" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("l_linenumber").as("ln"),
              col("l_linestatus").as("st")))),
            x => x.getField("st")), ",").as("all_status"))
        .orderBy("l_orderkey")
    }),

    // Deterministic hash ids + per-doc sequence numbers (reference
    // `assign_and_map_hash_ids`, elements.py:585-617: sha256 truncated to 32 hex +
    // row_number window).
    "q_hash_ids" -> ((s, dir) => {
      val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_returnflag")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .withColumn("seq_on_page", row_number().over(w))
        .withColumn("element_id",
          substring(sha2(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag")), 256), 1, 32))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "seq_on_page")
    }),

    // Sessionization: 30-minute-gap sessions per user (streaming-state analog,
    // expressed as lag + running sum windows; partitions by user_id so it scales).
    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
        .withColumn("boundary",
          when(col("prev_ms").isNull ||
            (unix_millis(col("ts")) - col("prev_ms")) > 1800000L, 1L).otherwise(0L))
        .withColumn("session_id", sum("boundary").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("user_id", "session_id")
    }),

    // Mean/stddev/count grouping (reference metrics `get_mean_grouping`,
    // metrics/evaluate.py:510-597).
    "q_mean_grouping" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("source")
        .agg(
          round(avg("n_chars"), 4).as("mean_chars"),
          round(stddev_samp(col("n_chars")), 4).as("stdev_chars"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")
    }),

    // Levenshtein edit distance (reference `calculate_edit_distance`,
    // metrics/text_extraction.py:69-121 — unweighted built-in form).
    "q_levenshtein" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(lower(col("p_name")), lower(col("p_type"))).as("edit_dist"))
        .orderBy("p_partkey")
    }))

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue_orders" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_region_nation_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_events_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_topk_per_group" ->
      """SELECT event_type, event_id, value, rn FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin,
    "q_consolidate_first" ->
      """SELECT l_orderkey,
        |  arg_min(l_returnflag, lpad(CAST(l_linenumber AS VARCHAR), 2, '0')
        |          || l_returnflag) AS first_flag
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_consolidate_string_concat" ->
      """SELECT l_orderkey,
        |  string_agg(l_returnflag, '' ORDER BY l_linenumber, l_returnflag)
        |    AS concat_flags
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_consolidate_list_unique" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS uniq_flags
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_consolidate_list_concat" ->
      """SELECT l_orderkey,
        |  string_agg(l_linestatus, ',' ORDER BY l_linenumber, l_linestatus)
        |    AS all_status
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_consolidate_dict_list_unique" ->
      """WITH per_val AS (
        |  -- first-seen dedupe: each value keeps its earliest (linenumber, value) slot
        |  SELECT l_orderkey, l_linestatus, l_returnflag, min(l_linenumber) AS first_ln
        |  FROM lineitem GROUP BY l_orderkey, l_linestatus, l_returnflag),
        |per_key AS (
        |  SELECT l_orderkey, l_linestatus,
        |    string_agg(l_returnflag, ',' ORDER BY first_ln, l_returnflag) AS vals
        |  FROM per_val GROUP BY l_orderkey, l_linestatus)
        |SELECT l_orderkey,
        |  string_agg(l_linestatus || ':' || vals, ';' ORDER BY l_linestatus || ':' || vals)
        |    AS dict_str
        |FROM per_key GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_filter_metrics" ->
      """SELECT 'doc_' || doc_id || '.txt' AS filename, n_chars, length(text) AS text_len
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY filename""".stripMargin,
    "q_hash_ids" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  row_number() OVER (PARTITION BY l_orderkey
        |                     ORDER BY l_linenumber, l_returnflag) AS seq_on_page,
        |  substr(sha256(l_orderkey || '-' || l_linenumber || '-' || l_returnflag), 1, 32)
        |    AS element_id
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, seq_on_page""".stripMargin,
    "q_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ms
        |  FROM events),
        |sess AS (
        |  SELECT user_id, event_id, ts,
        |    sum(CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_mean_grouping" ->
      """SELECT source, round(avg(n_chars), 4) AS mean_chars,
        |  round(stddev_samp(n_chars), 4) AS stdev_chars, count(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_levenshtein" ->
      """SELECT p_partkey, levenshtein(lower(p_name), lower(p_type)) AS edit_dist
        |FROM part ORDER BY p_partkey""".stripMargin)
}
