package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** E3 — the image document pipeline (RealEstateImages.py:590-687) and
  * F24 style split/priority (RealEstateImages.py:488-529, 352-400),
  * re-expressed set-based: the reference's per-row dict building becomes
  * explode → classify → collect_list/map_from_entries, and the nested
  * result is a real StructType/MapType document ready for a document
  * sink (S8; mongo connector at deploy, JSON sink for tests).
  */
object ImagesDoc {

  // ---------------------------------------------------------------------
  // F24 — style split/priority. Mirrors the reference exactly, including
  // its quirks: Duplex > Triplex > FourPlex priority; for other csv
  // lists, the FIRST non-empty of the first two entries decides MultiFam
  // (the Python `(a or b) in [...]` idiom); unmatched csv lists -> null;
  // bare SeeRem/FixrUppr -> null; FixrUppr (bare, or present in a
  // MultiFam-classified list) side-sets Condition to 'FIXER UPPER'.
  // ---------------------------------------------------------------------
  val multiFamStyles = Seq("Cluster", "UndrOver", "TwoStory", "ThreStry", "OneStory")

  private def firstNonEmpty(parts: Column): Column =
    coalesce(nullif(element_at(parts, 1), lit("")), element_at(parts, 2))

  def styleSplit(style: Column): Column = {
    val parts = split(style, ",")
    when(style.isNull, lit(null))
      .when(style.contains(","),
        when(array_contains(parts, "Duplex"), lit("Duplex"))
          .when(array_contains(parts, "Triplex"), lit("Triplex"))
          .when(array_contains(parts, "FourPlex"), lit("FourPlex"))
          .when(firstNonEmpty(parts).isin(multiFamStyles: _*), lit("MultiFam"))
          .otherwise(lit(null)))
      .when(style.isin(multiFamStyles: _*), lit("MultiFam"))
      .when(style === "Resident", lit("Residential"))
      .when(style === "SeeRem", lit(null))
      .when(style === "FixrUppr", lit(null))
      .otherwise(style)
  }

  /** True where the split side-sets Condition = 'FIXER UPPER': bare
    * FixrUppr, or FixrUppr inside a list that classified as MultiFam. */
  def styleSetsFixerUpper(style: Column): Column = {
    val parts = split(style, ",")
    coalesce(
      (style === "FixrUppr") ||
        (style.contains(",") &&
          !array_contains(parts, "Duplex") && !array_contains(parts, "Triplex") &&
          !array_contains(parts, "FourPlex") &&
          firstNonEmpty(parts).isin(multiFamStyles: _*) &&
          array_contains(parts, "FixrUppr")),
      lit(false))
  }

  def applyStyleSplit(df: DataFrame, styleCol: String,
                      conditionCol: String = "Condition"): DataFrame =
    df.withColumn(conditionCol,
        when(styleSetsFixerUpper(col(styleCol)), lit("FIXER UPPER"))
          .otherwise(if (df.columns.contains(conditionCol)) col(conditionCol)
                     else lit("Unknown")))
      .withColumn("Prop_Style", styleSplit(col(styleCol)))

  // ---------------------------------------------------------------------
  // E3 — flat image rows from the IMAGES dict-string: parse → explode →
  // caption classification → path synthesis. Pure projections + one
  // generator; no shuffle.
  // ---------------------------------------------------------------------
  def explodeImages(df: DataFrame, mlsCol: String, imagesCol: String,
                    conditionCol: String, baseDir: Column): DataFrame = {
    val exploded = df
      .select(col(mlsCol).as("MLSNum"), col(conditionCol).as("Condition"),
        explode(Cleaning.parseImagesDict(col(imagesCol))).as(Seq("caption", "url")))
    val classified = exploded.withColumn("section",
      Cleaning.firstMatchClassify(col("caption"), Cleaning.homeSections, "Other"))
    classified
      .withColumn("seq",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("MLSNum"), col("section")).orderBy(col("url"))))
      .withColumn("directory",
        Cleaning.imagePath(baseDir, col("section"), col("Condition"), col("MLSNum"), col("seq")))
  }

  /** Nested per-listing document: Images = map(section -> array of
    * {Condition, URL, Directory}) — the Mongo document shape
    * (RealEstateImages.py:603-687). The reference's full document also
    * carries the flat listing fields {Date, Address, Town, State,
    * Zipcode, CountyCode, BlockID, LotID, Prop_Style}; pass them as
    * `listingCols` and they ride the group keys (each is functionally
    * dependent on MLSNum, so the key widening never changes the
    * grouping — it just carries the fields through). Two aggregations,
    * both partial-agg friendly; the map rebuild is exactly the
    * reference's dict nesting. */
  def assembleDocuments(flat: DataFrame,
                        listingCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = (Seq("MLSNum", "Condition") ++ listingCols).map(col)
    flat.groupBy(keys :+ col("section"): _*)
      .agg(sort_array(collect_list(struct(
        col("Condition").as("Condition"),
        col("url").as("URL"),
        col("directory").as("Directory")))).as("imgs"))
      .groupBy(keys: _*)
      .agg(map_from_entries(sort_array(collect_list(struct(col("section"), col("imgs")))))
        .as("Images"))
  }

  /** S8 — document sink: JSON lines (one document per line), the
    * connector-agnostic stand-in for insert_one (RealEstateImages.py:687). */
  def writeDocuments(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
