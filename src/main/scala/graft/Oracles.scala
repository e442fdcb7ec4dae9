package graft

/** DuckDB oracle SQL for every entry in [[Queries]] (driver contract:
  * same column names, same row order, ANSI SQL runnable by DuckDB over
  * the same parquet tables registered under their bare names).
  */
object Oracles {
  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_typed_projection" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS order_id,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_dt,
        |       substring(o_orderpriority, 1, 1) AS prio_code,
        |       lower(concat_ws('-', o_orderstatus, o_orderpriority)) AS status_tag,
        |       o_totalprice * 2.0 AS double_price
        |FROM orders
        |ORDER BY order_id""".stripMargin,
    "q03_watermark_filter" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       max(strftime(l_shipdate, '%Y-%m-%d')) AS new_watermark
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'""".stripMargin,
    "q04_surrogate_key" ->
      """SELECT c_custkey,
        |       sha256(concat_ws('||', c_custkey, c_name)) AS c_sk
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q05_join_agg" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q06_broadcast_join" ->
      """SELECT p_brand,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_retail
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin
  )
}
