package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.gsmls.{Pipeline, Schemas}

class PipelineSpec extends SparkSpec {

  private def emptyIngest(pt: Schemas.PropType) =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.ingestSchema(pt))

  test("every per-type composition runs on its full ingest schema") {
    for (pt <- Schemas.allTypes) {
      val out = Pipeline.forType(pt)(emptyIngest(pt))
      assert(out.count() == 0)
      // output order is exactly the authoritative list (present columns)
      val expect = Schemas.finalColumns(pt).filter(out.columns.contains)
      assert(out.columns.toSeq == expect)
    }
  }

  test("RES output drops sink-prep columns and renames OWNERNAME/SUBPROPTYPE") {
    val out = Pipeline.resPropertyCleaning(emptyIngest(Schemas.RES))
    val cols = out.columns.toSet
    assert(!cols.contains("OWNERNAME") && cols.contains("SELLERNAME"))
    assert(!cols.contains("SUBPROPTYPE") && cols.contains("SUBPROPTYPE_SFH"))
    assert(Schemas.dropColumns(Schemas.RES).forall(c => !cols.contains(c)))
    assert(cols.contains("LISTING_REMARKS") && out.columns.last == "LISTING_REMARKS")
    assert(cols.contains("DAYS_TO_CLOSE") && cols.contains("LOTSIZE (SQFT)"))
  }

  test("stage order matters: fillNa before remarks-concat feeds 'None' not null") {
    import spark.implicits._
    val df = Seq(("fixer upper", null: String, null: String))
      .toDF("REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL")
    val ordered = Pipeline.combineListingRemarks(
      Pipeline.fillNaValues(Schemas.RES)(df))
    assert(ordered.select("LISTING_REMARKS").collect()(0).getString(0)
      == "fixer upper. None. None")
    // reversed order would bake the na_rep '_' instead of the sentinel
    val reversed = Pipeline.combineListingRemarks(df)
    assert(reversed.select("LISTING_REMARKS").collect()(0).getString(0)
      == "fixer upper. _. _")
  }

  test("schema tables are consistent") {
    for (pt <- Schemas.allTypes) {
      // fillna keys refer to real consumer-visible columns
      val visible = Schemas.targetColumns(pt).toSet ++ Schemas.producerColumns
      assert(Schemas.fillNa(pt).keys.forall(visible.contains))
      assert(Schemas.targetColumns(pt).distinct.size == Schemas.targetColumns(pt).size)
    }
    // reference cardinalities (GSMLS.py:1613-1698)
    assert(Schemas.targetColumns(Schemas.RES).size == 81)
    assert(Schemas.targetColumns(Schemas.MUL).size == 94)
    assert(Schemas.targetColumns(Schemas.LND).size == 67)
    assert(Schemas.targetColumns(Schemas.RNT).size == 59)
    assert(Schemas.targetColumns(Schemas.TAX).size == 53)
  }
}
