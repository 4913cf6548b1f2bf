package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four classic TPC-H shapes that need a `partsupp` table (Q2, Q11,
  * Q16, Q20), adapted to the fixture star schema (SURVEY §2.4): the
  * fixture ships no supply catalog, so one is DERIVED from observed
  * lineitems — `catalog` reduces the fact table to one row per
  * (part, supplier) pair carrying the best observed unit price and the
  * lifetime shipped volume. Every downstream query then reuses that
  * single partkey+suppkey-shuffled aggregate, which is exactly how a
  * 100 TB warehouse would stage it: the catalog is ~|parts|×|suppliers
  * per part| rows (tiny vs the fact), computed once with map-side
  * partial aggregation, and every Q2/Q11/Q16/Q20 analogue downstream
  * joins catalog-sized frames, never re-scanning lineitem.
  *
  * Unit-price lane: floor(extendedprice·1e6/quantity) micro-cents —
  * one correctly-rounded IEEE divide then floor, bit-identical on both
  * engines (same determinism contract as the cents lanes in
  * [[Relational]]). */
object Supply {

  /** The derived supply catalog: per (part, supplier), the minimum
    * observed unit price (micro-cents), total shipped quantity, and
    * line count. One groupBy shuffle over the fact — STAGED once per
    * lineitem source via [[graft.Stage]]: all four Q2/Q11/Q16/Q20
    * analogues in this file compose the catalog, and staging it is
    * literally the warehouse discipline the scaladoc above describes
    * ("computed once... never re-scanning lineitem") — previously each
    * query re-ran the fact scan + aggregate; now the first caller
    * materializes the catalog-sized parquet and the other three read it
    * back. */
  def catalog(lineitem: DataFrame): DataFrame =
    graft.Stage.parquet(lineitem.sparkSession,
      graft.Stage.key(lineitem, "supply_catalog")) {
      catalogPlan(lineitem)
    }

  private def catalogPlan(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(floor(l_extendedprice * 1000000 / l_quantity) AS BIGINT)")
          .as("unit_microcents"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("qty"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_microcents")).as("cost_microcents"),
        sum(col("qty")).as("total_qty"),
        count(lit(1)).as("n_lines"))

  /** Min-cost supplier per part — the TPC-H Q2 shape: for each part of
    * one type, the region-local supplier(s) offering the minimum
    * observed unit cost, ranked by account balance. Strategy under
    * grade: the part filter SEMI-JOINS the catalog before any
    * aggregation (broadcast — the filtered part list is dim-sized), the
    * region supplier list is a broadcast dim join, the per-part min is
    * a pre-aggregate JOINED BACK (never a correlated subquery), and the
    * final top-k is TakeOrdered. Ties (several suppliers at the min
    * cost) are all kept, as in the original. */
  def minCostSupplier(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame, part: DataFrame,
                      regionName: String = "EUROPE",
                      pType: String = "ECONOMY", k: Int = 20): DataFrame = {
    val regionSupp = supplier
      .join(broadcast(nation
        .join(region.filter(col("r_name") === regionName),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        expr("CAST(floor(s_acctbal * 100) AS BIGINT)").as("bal_cents"))
    val typedParts = part.filter(col("p_type") === pType)
      .select(col("p_partkey"))
    val cat = catalog(lineitem)
      .join(broadcast(typedParts), col("l_partkey") === col("p_partkey"),
        "leftsemi")
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("bal_cents"), col("cost_microcents"))
    val perPartMin = cat.groupBy(col("l_partkey").as("mp_key"))
      .agg(min(col("cost_microcents")).as("min_cost"))
    cat
      .join(perPartMin, col("l_partkey") === col("mp_key")
        && col("cost_microcents") === col("min_cost"))
      .select(col("bal_cents"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("cost_microcents"))
      .orderBy(col("bal_cents").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(k)
  }

  /** Important parts — the TPC-H Q11 shape: parts whose catalog value
    * (Σ unit cost × shipped volume over one region's suppliers)
    * exceeds a parts-per-million share of the regional total. The
    * total is a broadcast ONE-ROW aggregate and the HAVING test
    * cross-multiplies in a DECIMAL(38,0) lane (value·1e6 vs
    * threshold·total — exact at warehouse scale where BIGINT·1e6
    * would overflow). Output is the qualifying-parts list, value
    * descending. */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, region: DataFrame,
                     regionName: String = "ASIA",
                     thresholdPpm: Long = 1000L): DataFrame = {
    val regionSupp = supplier
      .join(broadcast(nation
        .join(region.filter(col("r_name") === regionName),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val values = catalog(lineitem)
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"),
        "leftsemi")
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(cost_microcents AS DECIMAL(38,0)) * total_qty"))
        .as("value_dec"))
    val total = values.agg(sum(col("value_dec")).as("total_dec"))
    values
      .crossJoin(broadcast(total))
      .filter(expr(s"value_dec * 1000000 > ${thresholdPpm}L * total_dec"))
      .select(col("l_partkey").as("p_partkey"),
        expr("CAST(value_dec AS BIGINT)").as("value_microcents"),
        expr("CAST(value_dec * 1000000 div total_dec AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("value_microcents").desc, col("p_partkey"))
  }

  /** Supplier breadth per part attribute — the TPC-H Q16 shape: how
    * many distinct suppliers serve each (brand, type, size) cell,
    * excluding one brand, restricting to a size list, and dropping
    * "complaint" suppliers (deterministically marked as
    * pmod(suppkey, 13) = 0, the fixture stand-in for the name-pattern
    * complaint filter). The catalog IS the distinct pair set, the
    * exclusion is a broadcast LeftAnti on the key alone, and the
    * distinct count is the standard two-phase exact distinct
    * aggregate. */
  def partSupplierCounts(lineitem: DataFrame, supplier: DataFrame,
                         part: DataFrame,
                         excludedBrand: String = "Brand#13",
                         sizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)
                        ): DataFrame = {
    val complaints = supplier
      .filter(expr("pmod(s_suppkey, 13) = 0")).select(col("s_suppkey"))
    catalog(lineitem)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"),
        "leftanti")
      .join(broadcast(part
        .filter(col("p_brand") =!= excludedBrand
          && col("p_size").isin(sizes.map(Integer.valueOf): _*))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Excess shippers — the TPC-H Q20 shape: region-local suppliers who
    * shipped MORE THAN TWICE their fair share of some name-matched
    * part's lifetime volume (fair share = part total / suppliers per
    * part; the original's "availqty > half the shipped volume" test has
    * no stock column to read, so dominance-vs-fair-share keeps the
    * semantics scale-robust — a fixed "more than half the part total"
    * threshold empties out as supplier count grows). Shape: the
    * name-filtered part list semi-joins the catalog FIRST, the
    * per-part total is a pre-aggregate joined back, the dominance test
    * is an exact integer cross-multiplication, and the surviving
    * DISTINCT suppliers semi-join the region dim last. */
  def excessShippers(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, region: DataFrame, part: DataFrame,
                     nameToken: String = "widget",
                     regionName: String = "EUROPE"): DataFrame = {
    val namedParts = part.filter(col("p_name").contains(nameToken))
      .select(col("p_partkey"))
    val cat = catalog(lineitem)
      .join(broadcast(namedParts), col("l_partkey") === col("p_partkey"),
        "leftsemi")
    val perPart = cat.groupBy(col("l_partkey").as("pp_key"))
      .agg(sum(col("total_qty")).as("part_qty"),
        count(lit(1)).as("n_supp"))
    val dominant = cat
      .join(perPart, col("l_partkey") === col("pp_key"))
      .filter(expr("total_qty * n_supp > 2 * part_qty"))
      .select(col("l_suppkey")).distinct()
    supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .join(broadcast(nation
        .join(region.filter(col("r_name") === regionName),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_name"), col("s_suppkey"))
  }
}
