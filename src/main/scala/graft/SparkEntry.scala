package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Analytics, CoreOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator family from SURVEY.md §2,
  * re-expressed Spark-first over the driver testdata; `oracleSql` holds the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet files.
  * Column names and types are aligned on both sides (counts→BIGINT,
  * year/month/row_number→INT, monetary sums→exact DECIMAL accumulation cast
  * to DOUBLE) so the driver's sorted-column value hash matches exactly.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's most complex query shape (olap_queries.sql:38-69):
    * CTE → COUNT(DISTINCT) → window argmax → top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topMonthlyUniqueLocations(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1/D2 aggregate + F2 ordered output
    "q1_agg" -> (CoreOps.q1Agg _),
    // F1 top-k + C1 join chain
    "q_topk_revenue" -> (CoreOps.topkRevenue _),
    // C1 multi-way FK joins to broadcast dims
    "q_join_multiway" -> (CoreOps.joinMultiway _),
    // C2 left outer join
    "q_left_join" -> (CoreOps.leftJoinAgg _),
    // B6/B7/A9 anti join (NOT EXISTS / NOT IN / quarantine delete)
    "q_anti_join" -> (CoreOps.antiJoin _),
    // C10 semi join (EXISTS)
    "q_semi_join" -> (CoreOps.semiJoin _),
    // A4 quarantine sink + B2-B5 validation predicates
    "q_quarantine_invalid" -> (CoreOps.quarantineInvalid _),
    "q_quarantine_valid" -> (CoreOps.quarantineValid _),
    // A8 scrub + B8 CASE + B10 NULLIF/COALESCE
    "q_scrub_case" -> (CoreOps.scrubCase _),
    // D7 DISTINCT ON first-row-per-group
    "q_distinct_on" -> (CoreOps.distinctOn _),
    // E1 SCD2 end-dating via window lead/lag
    "q_scd2_lag" -> (CoreOps.scd2Lag _),
    // C5/C6 temporal as-of join + fallback coalesce
    "q_asof_join" -> (CoreOps.asofJoin _),
    // C7 prioritized best-match resolution
    "q_priority_bestmatch" -> (CoreOps.priorityBestmatch _),
    // C4 theta substring-containment join
    "q_theta_contains" -> (CoreOps.thetaContains _),
    // C8 join on computed key + D8/dim_date build + §1 surrogate keys
    "q_dim_date_join" -> (CoreOps.dimDateJoin _),
    // C11 case-insensitive equi-join
    "q_ci_join" -> (CoreOps.ciJoin _),
    // A6 idempotent anti-join insert
    "q_dim_upsert_new" -> (CoreOps.dimUpsertNew _),
    // D3/D4 conditional aggregates
    "q_cond_agg" -> (CoreOps.condAgg _),
    // D5 multiple exact COUNT(DISTINCT)
    "q_multi_count_distinct" -> (CoreOps.multiCountDistinct _),
    // D6 group key = expression
    "q_groupby_expr" -> (CoreOps.groupbyExpr _),
    // G set operations
    "q_set_ops" -> (CoreOps.setOps _),
    // B3 regex validation/extraction
    "q_regex_extract" -> (CoreOps.regexExtract _),
    // H scalar batteries
    "q_scalar_strings" -> (CoreOps.scalarStrings _),
    "q_scalar_dates" -> (CoreOps.scalarDates _),
    "q_scalar_casts" -> (CoreOps.scalarCasts _),
    // EP3: the reference's 7 analytical queries
    "q_top_months_excl_jan" -> (Analytics.topMonthsExclJan _),
    "q_top_location_months" -> (Analytics.topLocationMonths _),
    "q_top_pairs" -> (Analytics.topPairs _),
    "q_habitat_rank" -> (Analytics.habitatRank _),
    "q_quality_summary" -> (Analytics.qualitySummary _),
    "q_top_users" -> (Analytics.topUsers _),
    "q_top_monthly_unique" -> (Analytics.topMonthlyUniqueLocations _),
  )

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)"

  private val eventErrSql =
    """CASE WHEN value IS NULL OR value < 0 THEN 'value out of range'
      | WHEN UPPER(event_type) NOT IN ('CLICK','VIEW','PURCHASE','SIGNUP') THEN 'unknown event_type'
      | WHEN value > 400 THEN 'value above limit'
      | WHEN NOT regexp_matches(props, '^\{"k": [0-9]+\}$') THEN 'malformed props'
      | ELSE NULL END""".stripMargin.replaceAll("\n", " ")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_topk_revenue" ->
      s"""SELECT c_custkey, c_name, $revenueSql AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q_join_multiway" ->
      s"""SELECT r_name, COUNT(*) AS n_items, $revenueSql AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        | CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_quarantine_invalid" ->
      s"""SELECT event_id, event_type, value, err AS error_message
        |FROM (SELECT *, $eventErrSql AS err FROM events)
        |WHERE err IS NOT NULL ORDER BY event_id""".stripMargin,
    "q_quarantine_valid" ->
      s"""SELECT event_id, user_id, event_type, value
        |FROM (SELECT *, $eventErrSql AS err FROM events)
        |WHERE err IS NULL ORDER BY event_id""".stripMargin,
    "q_scrub_case" ->
      """SELECT p_partkey,
        | COALESCE(CASE WHEN TRIM(p_name) = '' THEN NULL ELSE TRIM(p_name) END, 'unknown') AS name_clean,
        | CASE WHEN p_size BETWEEN 1 AND 25 THEN 'small'
        |      WHEN p_size BETWEEN 26 AND 40 THEN 'medium'
        |      ELSE 'large' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_distinct_on" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS first_order_date
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_scd2_lag" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_date,
        | CAST(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |      - INTERVAL 1 DAY AS DATE) AS end_date
        |FROM orders ORDER BY o_custkey, start_date, o_orderkey""".stripMargin,
    "q_asof_join" ->
      """WITH cand AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts),
        |earliest AS (
        |  SELECT o_custkey, o_orderkey AS earliest_orderkey FROM (
        |    SELECT o_custkey, o_orderkey,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT c.event_id, COALESCE(c.o_orderkey, e2.earliest_orderkey) AS resolved_orderkey
        |FROM cand c LEFT JOIN earliest e2 ON c.user_id = e2.o_custkey
        |WHERE c.rn = 1 ORDER BY c.event_id""".stripMargin,
    "q_priority_bestmatch" ->
      """WITH intervals AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_date,
        |    CAST(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |         - INTERVAL 1 DAY AS DATE) AS end_date
        |  FROM orders),
        |cand AS (
        |  SELECT e.event_id, i.o_orderkey, i.start_date,
        |    CASE WHEN i.start_date <= CAST(e.ts AS DATE)
        |              AND (i.end_date IS NULL OR i.end_date >= CAST(e.ts AS DATE)) THEN 1
        |         WHEN i.start_date IS NULL THEN 2
        |         WHEN CAST(e.ts AS DATE) < i.start_date THEN 3
        |         ELSE 4 END AS prio
        |  FROM events e JOIN intervals i ON e.user_id = i.o_custkey)
        |SELECT event_id, o_orderkey AS matched_orderkey, prio FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
        |    ORDER BY prio, start_date, o_orderkey) AS rn FROM cand)
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "q_theta_contains" ->
      """SELECT e.event_id, COUNT(*) AS n_matched, MIN(c.c_custkey) AS min_custkey
        |FROM events e JOIN customer c
        |  ON c.c_custkey < 100 AND e.props LIKE '%' || CAST(c.c_custkey AS VARCHAR) || '%'
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q_dim_date_join" ->
      """WITH dim_date AS (
        |  SELECT CAST(year * 100 + month AS INT) AS date_sk,
        |    year, month,
        |    strftime(make_date(year, month, 1), '%B') AS month_name,
        |    strftime(make_date(year, month, 1), '%Y-%m') AS month_year
        |  FROM (SELECT DISTINCT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS year,
        |          CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS month FROM orders))
        |SELECT d.date_sk, d.year, d.month, d.month_name, d.month_year,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN dim_date d
        |  ON CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) = d.year
        | AND CAST(EXTRACT(MONTH FROM l.l_shipdate) AS INT) = d.month
        |GROUP BY d.date_sk, d.year, d.month, d.month_name, d.month_year
        |ORDER BY d.year, d.month""".stripMargin,
    "q_ci_join" ->
      """WITH seg_dim AS (
        |  SELECT CAST(concat('0x', substr(md5(seg_name), 1, 8)) AS BIGINT) AS seg_sk, seg_name
        |  FROM (SELECT DISTINCT UPPER(c_mktsegment) AS seg_name FROM customer))
        |SELECT s.seg_sk, s.seg_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer c JOIN seg_dim s ON LOWER(c.c_mktsegment) = LOWER(s.seg_name)
        |GROUP BY s.seg_sk, s.seg_name ORDER BY s.seg_name""".stripMargin,
    "q_dim_upsert_new" ->
      """SELECT c_mktsegment, c_nationkey
        |FROM (SELECT DISTINCT c_mktsegment, c_nationkey FROM customer WHERE c_custkey >= 750) i
        |WHERE NOT EXISTS (SELECT 1 FROM customer e
        |  WHERE e.c_custkey < 750 AND e.c_mktsegment = i.c_mktsegment
        |    AND e.c_nationkey = i.c_nationkey)
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q_cond_agg" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_highdisc,
        | COUNT(CASE WHEN l_tax > 0.04 THEN 1 END) AS n_hightax,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_multi_count_distinct" ->
      """SELECT o_custkey,
        | COUNT(DISTINCT l_suppkey) AS n_suppliers,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT o_orderkey) AS n_orders,
        | COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS n_months
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q_groupby_expr" ->
      """SELECT COALESCE(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END,
        |         'PENDING') AS status_bucket,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY status_bucket, order_year""".stripMargin,
    "q_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |p AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM p)
        |UNION ALL
        |SELECT 'f_only' AS tag, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM p)
        |ORDER BY tag, o_custkey""".stripMargin,
    "q_regex_extract" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS INT) AS k_val,
        | CASE WHEN regexp_matches(props, '^\{"k": [0-9]+\}$') THEN 1 ELSE 0 END AS valid_props,
        | CASE WHEN UPPER(event_type) IN ('CLICK','VIEW') THEN 1 ELSE 0 END AS is_passive
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_strings" ->
      """SELECT p_partkey, TRIM(p_name) AS name_trim, UPPER(p_name) AS name_upper,
        | LOWER(p_brand) AS brand_lower,
        | UPPER(SUBSTRING(SPLIT_PART(p_name, ' ', 1), 1, 1)) || SUBSTRING(SPLIT_PART(p_name, ' ', 1), 2)
        |   || ' ' ||
        | UPPER(SUBSTRING(SPLIT_PART(p_name, ' ', 2), 1, 1)) || SUBSTRING(SPLIT_PART(p_name, ' ', 2), 2)
        |   AS name_initcap,
        | SPLIT_PART(p_name, ' ', 1) AS first_word,
        | REVERSE(p_brand) AS brand_rev,
        | CAST(STRPOS(p_name, 'widget') AS INT) AS widget_pos,
        | SUBSTRING(p_name, 3) AS name_from3,
        | LPAD(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
        | p_brand || '/' || p_type AS brand_type,
        | CASE WHEN p_name LIKE '%bolt%' THEN 1 ELSE 0 END AS is_bolt,
        | CAST(LENGTH(p_name) AS INT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_dates" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
        | CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
        | CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS order_day,
        | strftime(o_orderdate, '%B') AS month_name,
        | strftime(o_orderdate, '%Y-%m') AS month_year,
        | CAST(o_orderdate - INTERVAL 1 DAY AS DATE) AS prev_day,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus_30,
        | CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS roundtrip_date
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,
    "q_scalar_casts" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(l_quantity AS INT) AS qty_int,
        | CASE WHEN l_returnflag = 'R' THEN TRUE ELSE FALSE END AS returned_bool,
        | CAST(CAST(l_discount AS DECIMAL(9,6)) AS DOUBLE) AS disc_dec,
        | CAST(l_linenumber AS VARCHAR) AS line_str
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_top_months_excl_jan" ->
      """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
        | CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS ship_month,
        | COUNT(*) AS n_returned
        |FROM lineitem
        |WHERE EXTRACT(MONTH FROM l_shipdate) <> 1 AND l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY n_returned DESC, ship_year, ship_month LIMIT 5""".stripMargin,
    "q_top_location_months" ->
      """SELECT n_name, strftime(o_orderdate, '%Y-%m') AS order_month,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY n_orders DESC, n_name, order_month LIMIT 10""".stripMargin,
    "q_top_pairs" ->
      """SELECT p_name, s_name, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2 ORDER BY n_lines DESC, p_name, s_name LIMIT 10""".stripMargin,
    "q_habitat_rank" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY n_customers DESC, c_mktsegment""".stripMargin,
    "q_quality_summary" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
        | COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_large,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_top_users" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY n_orders DESC, c_custkey LIMIT 10""".stripMargin,
    "q_top_monthly_unique" ->
      """WITH user_monthly AS (
        |  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS order_month,
        |    COUNT(DISTINCT l_suppkey) AS n_distinct_suppliers
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY n_distinct_suppliers DESC, order_month) AS rn
        |  FROM user_monthly)
        |SELECT o_custkey, order_month, n_distinct_suppliers FROM ranked WHERE rn = 1
        |ORDER BY n_distinct_suppliers DESC, o_custkey LIMIT 10""".stripMargin,
  )
}
