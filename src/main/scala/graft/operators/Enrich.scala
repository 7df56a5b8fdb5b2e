package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J2/J2a — the tax-assessor enrichment (GSMLS.py:153-273).
  *
  * The reference probes the tax table per listing row (two SQL queries
  * inside an iterrows loop) and then patches fields one at a time
  * (fix_tax_assessment_data / fix_property_year / fix_lat_long /
  * fix_lot_size / fix_sqft / fix_tax_id — GSMLS.py:694-866). Set-based
  * re-expression: ONE left join on (towncode, street-number, 4-char
  * street prefix) followed by a declarative repair bank.
  *
  * At 100 TB the tax side stops being broadcastable: the equi keys
  * (towncode, locnum) drive a sort-merge join with AQE skew handling,
  * and the prefix predicate rides along as a post-join filter condition.
  */
object Enrich {

  /** One repair rule: overwrite `target` from `source` when the current
    * value is null or one of `badValues` (the sentinel algebra). */
  final case class Repair(target: String, source: Column, badValues: Seq[Any])

  def applyRepairs(df: DataFrame, repairs: Seq[Repair]): DataFrame =
    repairs.foldLeft(df) { (d, r) =>
      Relational.coalesceRepair(d, r.target, r.source, r.badValues)
    }

  /** The J2 probe as a join: equi keys + case-insensitive 4-char street
    * prefix (GSMLS.py:942-944 `LOCSTREET ILIKE '{street[:4]}%%'`). */
  def taxJoinCondition(listingTown: Column, listingNum: Column, listingStreet: Column,
                       taxTown: Column, taxNum: Column, taxStreet: Column): Column =
    listingTown === taxTown &&
      listingNum === taxNum &&
      lower(listingStreet).startsWith(lower(substring(taxStreet, 1, 4)))

  /** Full J2 + J2a: left-join the tax side and run the repair bank.
    * Unmatched listings keep their original values (null tax columns
    * fall through coalesceRepair). */
  def taxEnrich(listings: DataFrame, tax: DataFrame, cond: Column,
                repairs: Seq[Repair]): DataFrame =
    applyRepairs(listings.join(tax, cond, "left"), repairs)
}
