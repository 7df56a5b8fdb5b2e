package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped warehouse composites: the multi-join rollup and
  * group-HAVING paths a reporting warehouse lives on, expressed the way
  * they should run at 100 TB.
  *
  * The headline join/agg queries elsewhere in the suite are q1/q3-shaped
  * (one join, one aggregation); these two exercise what those don't —
  * join ORDER across a star of dimensions, partial (map-side) aggregation
  * under a multi-join, and a semi-reductive HAVING feeding a top-k.
  */
object WarehouseQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Q9-shaped profit rollup: lineitem against four other relations
    * (part, supplier, nation, orders), profit summed per supplier-nation
    * and order year.
    *
    * Scale shape: the three dimension relations (filtered part,
    * supplier, nation) are orders of magnitude smaller than the fact
    * table — broadcast all three, so lineitem flows through the star
    * without a single exchange. The only big×big contact is
    * lineitem⋈orders, which shuffles on the join key once and feeds the
    * partial aggregation; with both sides key-partitioned the same way
    * at warehouse layout time this becomes a co-located join. Group-by
    * cardinality is |nations|×|years| (tiny), so the partial aggregate
    * collapses nearly all rows map-side before the final exchange. */
  private val qQ9Profit: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_name").contains("bolt"))
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val o = Tables.orders(spark, dir)
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))
          - lit(100.0) * col("l_quantity")), 4).as("profit"))
  }

  /** Q18-shaped large-volume orders: orders whose total line quantity
    * exceeds a threshold (HAVING over the fact table), enriched with the
    * customer and ranked by order value.
    *
    * Scale shape: the HAVING aggregation reduces the fact table to a
    * tiny qualifying set FIRST; that set broadcasts into orders, and the
    * (now qualifying-set-sized) result broadcasts again into customer —
    * the two enrichment joins never shuffle either big table. The final
    * global top-k is a TakeOrderedAndProject (per-partition heads then
    * one driver merge), not a full sort.
    *
    * SELECTIVITY CONTRACT: the `reduced` broadcast assumes the HAVING
    * threshold keeps the qualifying set tiny (qty > 300 is the Q18
    * shape: a vanishing fraction of orders). Loosening the threshold
    * grows the broadcast toward the driver/executor memory limit —
    * below ~300 at large SF, drop the explicit broadcast hint on
    * `reduced` and let AQE pick the join strategy from the measured
    * aggregate size instead. */
  private val qQ18BigOrders: Q = (spark, dir) => {
    val l = Tables.lineitem(spark, dir)
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 300)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val reduced = o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
    c.join(broadcast(reduced), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .limit(100)
  }

  /** Q5-shaped local-supplier volume: revenue per nation within one
    * region and one order year, counted only when the CUSTOMER and the
    * SUPPLIER sit in the same nation — the classic 6-relation join whose
    * cross-dimension equality (c_nationkey = s_nationkey) join ordering
    * must carry through the whole spine.
    *
    * Scale shape: region⋈nation collapses to a broadcast-sized key set
    * gating both enrichment paths; supplier (with its nation name
    * resolved) broadcasts into lineitem. Customer is FACT-sized at
    * warehouse scale — 1.5M rows per TPC-H SF, the same order as orders
    * — so unlike Q9's dimensions it must NOT broadcast: the spine is
    * lineitem⋈(date-filtered orders) shuffled once on the order key,
    * then one shuffle on (custkey, nationkey) against the region-gated
    * customer slice, where the same-nation equality rides the join key
    * instead of becoming a post-join filter. Group-by cardinality is
    * |nations in region|, so partials collapse map-side. */
  private val qQ5LocalVolume: Q = (spark, dir) => {
    val nAsia = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(nAsia), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nAsia.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
  }

  def queries: Map[String, Q] = Map(
    "q_q9_profit"     -> qQ9Profit,
    "q_q18_big_orders" -> qQ18BigOrders,
    "q_q5_local_volume" -> qQ5LocalVolume
  )

  def oracleSql: Map[String, String] = Map(
    "q_q5_local_volume" ->
      """SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
                        AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= DATE '1996-01-01'
           AND o_orderdate < DATE '1997-01-01'
         GROUP BY 1""",
    "q_q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount) - 100.0 * l_quantity), 4) AS profit
         FROM lineitem
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%bolt%'
         GROUP BY 1, 2""",
    "q_q18_big_orders" ->
      """WITH big AS (
           SELECT l_orderkey, sum(l_quantity) AS qty
           FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, qty
         FROM customer
           JOIN orders ON o_custkey = c_custkey
           JOIN big ON o_orderkey = big.l_orderkey
         ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
         LIMIT 100"""
  )
}
