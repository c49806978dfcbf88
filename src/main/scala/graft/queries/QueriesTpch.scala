package graft.queries

import org.apache.spark.sql.functions._

import Q._

/** §2.6 analytics heads — TPC-H-shaped queries over the star schema.
  * Shapes follow the public TPC-H specification (Q1/Q3/Q5), adapted to the
  * driver's synthetic schema. These are the bench flagships: partial-agg
  * friendly group-bys, broadcast dimension joins, top-k with deterministic
  * tiebreaks.
  *
  * Numeric determinism: per-row products are computed in DOUBLE (bit-identical
  * across engines), then cast to DECIMAL for an exact, order-independent sum,
  * then back to DOUBLE.
  */
object QueriesTpch {

  private def discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private def charge = discPrice * (lit(1.0) + col("l_tax"))

  val queries: Map[String, QueryFn] = Map(
    "q1_pricing" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumDec(col("l_quantity")).as("sum_qty"),
          sumDec(col("l_extendedprice")).as("sum_base_price"),
          sumDec(discPrice, 6).as("sum_disc_price"),
          sumDec(charge, 6).as("sum_charge"),
          (sumDec(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sumDec(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (sumDec(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q6 shape: pure filter + agg — everything pushes to the scan.
    "q6_forecast" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sumDec(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
          count(lit(1)).as("n"))
    },

    "q3_topk" -> { (s, d) =>
      // The BUILDING restriction (1/5 of customers) meets orders BEFORE the
      // lineitem join, so only restricted orders shuffle by orderkey — and
      // customer carries no broadcast hint: it scales with SF (3M BUILDING
      // rows at sf100), so AQE decides broadcast-vs-shuffle instead of a
      // forced driver-side build that outgrows memory at some scale.
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o.join(c, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumDec(discPrice, 6).as("revenue"))
        .select(col("l_orderkey"), eu(col("o_orderdate")).as("o_orderdate_us"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    "q5_region" -> { (s, d) =>
      // Scale-first join order (same row set, same exact sums): the ASIA
      // restriction keeps only 1/5 of nations, so it pushes into customer
      // and supplier BEFORE any fact join instead of filtering four joins
      // later, and orders meets the restricted customers before lineitem —
      // the 600M-row join at sf100 then produces only ASIA-customer rows.
      // Only the fixed-cardinality nation/region frames carry broadcast
      // hints; the restricted supplier side is left to AQE, which converts
      // the join to broadcast while supplier actually fits and falls back
      // to shuffle when a larger SF outgrows it — no forced-broadcast cliff.
      val asia = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val custAsia = customer(s, d)
        .join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val suppAsia = supplier(s, d)
        .join(broadcast(asia.select(col("n_nationkey").as("sn_nationkey"))),
          col("s_nationkey") === col("sn_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"))
      val ordCustAsia = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(custAsia, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
      lineitem(s, d)
        .join(ordCustAsia, col("l_orderkey") === col("o_orderkey"))
        .join(suppAsia,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sumDec(discPrice, 6).as("revenue"))
    }
  )

  private val discPriceSql = "l_extendedprice * (1.0 - l_discount)"
  private val chargeSql = "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"

  val oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${sumDecSql("l_quantity")} AS sum_qty,
         ${sumDecSql("l_extendedprice")} AS sum_base_price,
         ${sumDecSql(discPriceSql, 6)} AS sum_disc_price,
         ${sumDecSql(chargeSql, 6)} AS sum_charge,
         ${sumDecSql("l_quantity")} / COUNT(*) AS avg_qty,
         ${sumDecSql("l_extendedprice")} / COUNT(*) AS avg_price,
         ${sumDecSql("l_discount")} / COUNT(*) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",

    "q6_forecast" ->
      s"""SELECT ${sumDecSql("l_extendedprice * l_discount", 6)} AS revenue,
         COUNT(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.03 AND l_discount <= 0.07
           AND l_quantity < 24""",

    "q3_topk" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority,
         ${sumDecSql(discPriceSql, 6)} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue DESC, l_orderkey ASC
         LIMIT 10""",

    "q5_region" ->
      s"""SELECT n_name, ${sumDecSql(discPriceSql, 6)} AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1999-01-01'
         GROUP BY n_name"""
  )
}
