package graft.gsmls

import org.apache.spark.sql.types._

/** GSMLS data model — SURVEY §7.1 module 1.
  *
  * Per-property-type target column lists (GSMLS.py:1613-1698), sink-prep
  * drop lists (Kafka_GSMLSConsumer.py:254-284), sentinel fillna maps
  * (Kafka_GSMLSConsumer.py:316-491), typed-cast maps
  * (Kafka_GSMLSConsumer.py:93-128), control-char strip targets
  * (Kafka_GSMLSConsumer.py:287-313), and the authoritative final column
  * order (positional-insert semantics of Kafka_GSMLSConsumer.py:929-1013
  * re-expressed as one explicit list per type — SURVEY §7.4(4)).
  *
  * All tables here are config data: the pipeline stages in
  * [[Pipeline]] are driven from them exactly like the reference's
  * dict-driven stages.
  */
object Schemas {

  sealed trait PropType { def name: String }
  case object RES extends PropType { val name = "RES" }
  case object MUL extends PropType { val name = "MUL" }
  case object LND extends PropType { val name = "LND" }
  case object RNT extends PropType { val name = "RNT" }
  case object TAX extends PropType { val name = "TAX" }
  val allTypes: Seq[PropType] = Seq(RES, MUL, LND, RNT, TAX)

  /** Ingest projection per type (GSMLS.py:1613-1698). */
  val targetColumns: Map[PropType, Seq[String]] = Map(
    RES -> Seq(
      "MLSNUM", "STATUS_SHORT", "STREETNUMDISPLAY", "STREETNAME", "TOWN", "COUNTY", "ZIPCODE",
      "TOWNCODE", "COUNTYCODE", "BLOCKID", "LOTID", "TAXID", "DAYSONMARKET", "ORIGLISTPRICE",
      "LISTPRICE", "SALESPRICE", "SP/LP%", "LOANTERMS_SHORT", "ROOMS", "BEDS", "BATHSFULLTOTAL",
      "BATHSHALFTOTAL", "BATHSTOTAL", "SQFTAPPROX", "ACRES", "LOTSIZE", "ASSESSAMOUNTBLDG",
      "ASSESSAMOUNTLAND", "ASSESSTOTAL", "SUBPROPTYPE", "STYLEPRIMARY_SHORT", "STYLE_SHORT",
      "SUBDIVISION", "TAXAMOUNT", "TAXRATE", "TAXYEAR", "YEARBUILT", "LISTDATE", "PENDINGDATE",
      "ANTICCLOSEDDATE", "CLOSEDDATE", "EXPIREDATE", "WITHDRAWNDATE", "OWNERSHIP_SHORT",
      "EASEMENT_SHORT", "PARKNBRAVAIL", "DRIVEWAYDESC_SHORT", "GARAGECAP", "HEATSRC_SHORT",
      "HEATSYSTEM_SHORT", "COOLSYSTEM_SHORT", "WATER_SHORT", "UTILITIES_SHORT", "EXTERIOR_SHORT",
      "FIREPLACES", "FLOORS_SHORT", "POOL_SHORT", "ROOF_SHORT", "SEWER_SHORT", "SIDING_SHORT",
      "BASEMENT_SHORT", "BASEDESC_SHORT", "FLOODZONE", "ZONING", "APPFEE", "ASSOCFEE", "COMPBUY",
      "COMPSELL", "COMPTRANS", "LISTTYPE_SHORT", "OFFICELIST", "OFFICESELL", "OFFICESELLNAME",
      "AGENTSELLNAME", "OWNERNAME", "AGENTLIST", "AGENTSELL", "REMARKSAGENT", "REMARKSPUBLIC",
      "SHOWSPECIAL", "BUSRELATION_SHORT"),
    MUL -> Seq(
      "MLSNUM", "STATUS_SHORT", "STREETNUMDISPLAY", "STREETNAME", "TOWN", "COUNTY", "ZIPCODE",
      "TOWNCODE", "COUNTYCODE", "BLOCKID", "LOTID", "TAXID", "DAYSONMARKET", "ORIGLISTPRICE",
      "LISTPRICE", "SALESPRICE", "SP/LP%", "LOANTERMS_SHORT", "NUMUNITS", "ROOMS", "BEDS",
      "BATHSFULLTOTAL", "BATHSHALFTOTAL", "BATHSTOTAL", "SQFTBLDG", "ACRES", "LOTSIZE",
      "ASSESSAMOUNTBLDG", "ASSESSAMOUNTLAND", "ASSESSTOTAL", "UNITSTYLE_SHORT", "SUBDIVISION",
      "TAXAMOUNT", "TAXRATE", "TAXYEAR", "YEARBUILT", "INCOMEGROSSOPERATING", "EXPENSEOPERATING",
      "INCOMENETOPERATING", "EXPENSESINCLUDE_SHORT", "UNIT1BEDS", "UNIT1BATHS", "UNIT1ROOMS",
      "UNIT1OWNERTENANTPAYS_SHORT", "UNIT2BEDS", "UNIT2BATHS", "UNIT2ROOMS",
      "UNIT2OWNERTENANTPAYS_SHORT", "UNIT3BEDS", "UNIT3BATHS", "UNIT3ROOMS",
      "UNIT3OWNERTENANTPAYS_SHORT", "UNIT4BEDS", "UNIT4BATHS", "UNIT4ROOMS",
      "UNIT4OWNERTENANTPAYS_SHORT", "LISTDATE", "PENDINGDATE", "ANTICCLOSEDDATE", "CLOSEDDATE",
      "EXPIREDATE", "WITHDRAWNDATE", "EASEMENT_SHORT", "PARKNBRAVAIL", "DRIVEWAYDESC_SHORT",
      "GARAGECAP", "HEATSRC_SHORT", "HEATSYSTEM_SHORT", "COOLSYSTEM_SHORT", "WATER_SHORT",
      "UTILITIES_SHORT", "EXTERIOR_SHORT", "ROOF_SHORT", "SEWER_SHORT", "SIDING_SHORT",
      "BASEMENT_SHORT", "BASEDESC_SHORT", "FLOODZONE", "ZONING", "COMPBUY", "COMPSELL",
      "COMPTRANS", "LISTTYPE_SHORT", "OFFICELIST", "OFFICESELL", "OFFICESELLNAME",
      "AGENTSELLNAME", "OWNERNAME", "AGENTLIST", "AGENTSELL", "REMARKSAGENT", "REMARKSPUBLIC",
      "SHOWSPECIAL", "BUSRELATION_SHORT"),
    LND -> Seq(
      "MLSNUM", "STATUS_SHORT", "STREETNUMDISPLAY", "STREETNAME", "TOWN", "COUNTY", "ZIPCODE",
      "TOWNCODE", "COUNTYCODE", "BLOCKID", "LOTID", "TAXID", "DAYSONMARKET", "ORIGLISTPRICE",
      "LISTPRICE", "SALESPRICE", "SP/LP%", "LOANTERMS", "NUMLOTS", "ACRES", "LOTSIZE",
      "ASSESSAMOUNTBLDG", "ASSESSAMOUNTLAND", "ASSESSTOTAL", "SUBDIVISION", "TAXAMOUNT",
      "TAXRATE", "TAXYEAR", "LISTDATE", "PENDINGDATE", "ANTICCLOSEDDATE", "CLOSEDDATE",
      "EXPIREDATE", "WITHDRAWNDATE", "FLOODZONE", "ZONINGDESC_SHORT", "BUILDINGSINCLUDED_SHORT",
      "CURRENTUSE_SHORT", "DEVRESTRICT_SHORT", "DEVSTATUS_SHORT", "EASEMENT_SHORT",
      "IMPROVEMENTS_SHORT", "LOTDESC_SHORT", "PERCTEST_SHORT", "ROADFRONTDESC_SHORT",
      "ROADSURFACEDESC_SHORT", "SERVICES_SHORT", "SEWERINFO_SHORT", "SITEPARTICULARS_SHORT",
      "SOILTYPE_SHORT", "TOPOGRAPHY_SHORT", "WATERINFO_SHORT", "COMPBUY", "COMPSELL",
      "COMPTRANS", "LISTTYPE_SHORT", "OFFICELIST", "OFFICESELL", "OFFICESELLNAME",
      "AGENTSELLNAME", "OWNERNAME", "AGENTLIST", "AGENTSELL", "REMARKSAGENT", "REMARKSPUBLIC",
      "SHOWSPECIAL", "BUSRELATION_SHORT"),
    RNT -> Seq(
      "MLSNUM", "STATUS_SHORT", "STREETNUMDISPLAY", "STREETNAME", "TOWN", "COUNTY", "ZIPCODE",
      "TOWNCODE", "COUNTYCODE", "BLOCKID", "LOTID", "TAXID", "DAYSONMARKET", "RENTPRICEORIG",
      "LP", "RENTMONTHPERLSE", "RP/LP%", "RENTEDDATE", "LEASETERMS_SHORT", "ROOMS", "BEDS",
      "BATHSFULLTOTAL", "BATHSHALFTOTAL", "BATHSTOTAL", "SQFTAPPROX", "SUBDIVISION", "YEARBUILT",
      "PROPERTYTYPEPRIMARY_SHORT", "PROPSUBTYPERN", "LOCATION_SHORT", "PRERENTREQUIRE_SHORT",
      "OWNERPAYS_SHORT", "TENANTPAYS_SHORT", "TENANTUSEOF_SHORT", "RENTINCLUDES_SHORT",
      "RENTTERMS_SHORT", "LENGTHOFLEASE", "AVAILABLE_SHORT", "AMENITIES_SHORT",
      "APPLIANCES_SHORT", "LAUNDRYFAC", "FURNISHINFO_SHORT", "PETS_SHORT", "PARKNBRAVAIL",
      "DRIVEWAYDESC_SHORT", "BASEMENT_SHORT", "BASEDESC_SHORT", "GARAGECAP", "HEATSRC_SHORT",
      "HEATSYSTEM_SHORT", "COOLSYSTEM_SHORT", "WATER_SHORT", "UTILITIES_SHORT", "FLOORS_SHORT",
      "SEWER_SHORT", "TENLANDCOMM_SHORT", "REMARKSAGENT", "REMARKSPUBLIC", "SHOWSPECIAL"),
    TAX -> Seq(
      "AUTOROW", "CITYCODE", "BLOCKID", "BLOCKSUFFIX", "LOT", "LOTSUFFIX", "PARCEL_NO", "MCR",
      "MAP", "LOCNUM", "LOCDIR", "LOCSTREET", "LOCMODE", "LOCCITY", "LOCSTATE", "LOCZIP",
      "PROPERTYDESC", "PROPERTYUSECODE", "EQVALUE", "BANKCODE", "SALEDATE", "SALEPRICE", "TAXES",
      "TAXYR", "RATE", "RATIO", "RATIOYR", "TOTALASSESSMENT", "ASSESSMENT2", "ASSESSMENT1",
      "YEARBUILT", "BUILDINGDESC", "BUILDINGCLASSCODE", "ACRES", "ADDITIONALLOTS", "DEEDBOOK",
      "DEEDPAGE", "OWNER", "OWNERS", "MAILNUM", "MAILDIR", "MAILSTREET", "MAILMODE", "MAILCITY",
      "MAILSTATE", "MAILZIP", "PRIOROWNER", "PRIORSALEAMT", "PRIORSALEDATE", "PRIORDEEDBOOK",
      "PRIORDEEDPAGE", "DATEMODIFIED", "LCR"))

  /** Columns the producer adds AFTER the target projection — geo merge +
    * literal adds (GSMLS.py:1370-1381: LATITUDE/LONGITUDE/IMAGES from the
    * scrape join; MLS/QTR/CONDITION/PROP_CLASS/SCRAPED_DATE literals).
    * Consumer frames therefore carry target ∪ producer columns. */
  val producerColumns: Seq[String] =
    Seq("LATITUDE", "LONGITUDE", "IMAGES", "MLS", "QTR", "CONDITION", "PROP_CLASS",
      "SCRAPED_DATE")

  /** Permissive ingest schema: everything lands as string, typed later by
    * the changeDatatypes stage (SURVEY §1.2). */
  def ingestSchema(pt: PropType): StructType =
    StructType(targetColumns(pt).map(c => StructField(c, StringType, nullable = true)))

  /** What the consumer actually receives off the wire (TAX bypasses the
    * producer's geo/literal adds). */
  def consumerSchema(pt: PropType): StructType =
    if (pt == TAX) ingestSchema(pt)
    else StructType((targetColumns(pt) ++ producerColumns)
      .map(c => StructField(c, StringType, nullable = true)))

  /** Sink-prep drops (Kafka_GSMLSConsumer.py:254-284). */
  val dropColumns: Map[PropType, Seq[String]] = Map(
    RES -> Seq("ACRES", "REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL", "DRIVEWAYDESC_SHORT",
      "COOLSYSTEM_SHORT", "FLOORS_SHORT", "HEATSRC_SHORT", "HEATSYSTEM_SHORT", "ROOF_SHORT",
      "SEWER_SHORT", "SIDING_SHORT", "EXTERIOR_SHORT", "BASEDESC_SHORT", "STYLE_SHORT",
      "TAXRATE", "TAXYEAR", "WATER_SHORT", "UTILITIES_SHORT", "BASEMENT_SHORT", "IMAGES",
      "PROP_CLASS"),
    MUL -> Seq("ACRES", "REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL", "DRIVEWAYDESC_SHORT",
      "COOLSYSTEM_SHORT", "HEATSRC_SHORT", "HEATSYSTEM_SHORT", "ROOF_SHORT", "SEWER_SHORT",
      "SIDING_SHORT", "EXTERIOR_SHORT", "BASEDESC_SHORT", "UNITSTYLE_SHORT", "TAXRATE",
      "TAXYEAR", "WATER_SHORT", "UTILITIES_SHORT", "BASEMENT_SHORT", "IMAGES", "PROP_CLASS"),
    LND -> Seq("ACRES", "REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL", "TAXRATE", "TAXYEAR",
      "BUILDINGSINCLUDED_SHORT", "CURRENTUSE_SHORT", "DEVSTATUS_SHORT", "IMPROVEMENTS_SHORT",
      "LOTDESC_SHORT", "ROADSURFACEDESC_SHORT", "SITEPARTICULARS_SHORT", "SEWERINFO_SHORT",
      "WATERINFO_SHORT", "ZONINGDESC_SHORT", "PROP_CLASS"),
    RNT -> Seq("REMARKSPUBLIC", "REMARKSAGENT", "SHOWSPECIAL", "DRIVEWAYDESC_SHORT",
      "COOLSYSTEM_SHORT", "FLOORS_SHORT", "HEATSRC_SHORT", "HEATSYSTEM_SHORT", "SEWER_SHORT",
      "BASEDESC_SHORT", "WATER_SHORT", "UTILITIES_SHORT", "BASEMENT_SHORT", "TENANTPAYS_SHORT",
      "RENTINCLUDES_SHORT", "IMAGES", "PROP_CLASS"),
    TAX -> Seq.empty)

  /** Control-char strip targets (Kafka_GSMLSConsumer.py:287-313). */
  val escapeColumns: Map[PropType, Seq[String]] = {
    val sale = Seq("STREETNUMDISPLAY", "STREETNAME", "LOTID", "BLOCKID", "LATITUDE",
      "LONGITUDE", "LOTSIZE", "SUBDIVISION", "OFFICESELLNAME", "AGENTSELLNAME", "SELLERNAME",
      "LISTING_REMARKS")
    Map(
      RES -> sale, MUL -> sale, LND -> sale,
      RNT -> Seq("STREETNUMDISPLAY", "STREETNAME", "LOTID", "BLOCKID", "LATITUDE", "LONGITUDE",
        "SUBDIVISION"),
      TAX -> Seq("MCR", "LOCNUM", "LOCDIR", "LOCSTREET", "LOCMODE", "LOCCITY", "PROPERTYDESC",
        "OWNER", "MAILNUM", "MAILDIR", "MAILSTREET", "MAILMODE", "MAILCITY", "PRIOROWNER"))
  }

  /** Sentinel fillna maps (Kafka_GSMLSConsumer.py:316-491; entries with a
    * null default in the reference are no-ops and omitted). */
  val fillNa: Map[PropType, Map[String, String]] = {
    val dateS = "00/00/0000 00:00:00"
    val taxId = "0000-00000-0000-00000-0000"
    Map(
      RES -> Map(
        "ACRES" -> "0.0", "AGENTLIST" -> "000000", "ANTICCLOSEDDATE" -> dateS,
        "BATHSTOTAL" -> "0.0", "BEDS" -> "0", "CLOSEDDATE" -> dateS, "COUNTYCODE" -> "00",
        "AGENTSELL" -> "000000", "DAYSONMARKET" -> "0.0", "FIREPLACES" -> "0",
        "EXPIREDATE" -> dateS, "GARAGECAP" -> "0.0", "LISTDATE" -> dateS, "APPFEE" -> "0.0",
        "LISTPRICE" -> "0", "LOANTERMS_SHORT" -> "Unknown", "LOTSIZE" -> "0x0",
        "MLSNUM" -> "000000", "OFFICELIST" -> "000000", "OFFICESELLNAME" -> "NEW JERSEY",
        "ORIGLISTPRICE" -> "0.0", "OWNERNAME" -> "Not Available", "PARKNBRAVAIL" -> "0.0",
        "EASEMENT_SHORT" -> "N", "PENDINGDATE" -> dateS, "ASSOCFEE" -> "0.0",
        "POOL_SHORT" -> "N", "STYLEPRIMARY_SHORT" -> "Unknown", "SUBPROPTYPE" -> "U",
        "REMARKSAGENT" -> "None", "REMARKSPUBLIC" -> "None", "ROOMS" -> "0.0",
        "SALESPRICE" -> "0.0", "SHOWSPECIAL" -> "None", "STREETNUMDISPLAY" -> "0",
        "SUBDIVISION" -> "None", "TAXID" -> taxId, "TOWNCODE" -> "0", "WITHDRAWNDATE" -> dateS,
        "YEARBUILT" -> "0", "ZIPCODE" -> "00000", "SP/LP%" -> "0%", "BASEMENT_SHORT" -> "N",
        "BUSRELATION_SHORT" -> "Unknown", "AGENTSELLNAME" -> "NOT AVAILABLE",
        "OFFICESELL" -> "000000", "LISTTYPE_SHORT" -> "Unknown", "BASEDESC_SHORT" -> "None",
        "ASSESSAMOUNTBLDG" -> "0.0", "ASSESSAMOUNTLAND" -> "0.0", "ASSESSTOTAL" -> "0.0",
        "STYLE_SHORT" -> "Unknown", "UTILITIES_SHORT" -> "Unknown", "WATER_SHORT" -> "Unknown",
        "BATHSHALFTOTAL" -> "0.0", "BATHSFULLTOTAL" -> "0.0", "SQFTAPPROX" -> "0",
        "LATITUDE" -> "0E-20", "LONGITUDE" -> "0E-20"),
      MUL -> Map(
        "ACRES" -> "0.0", "AGENTLIST" -> "000000", "ANTICCLOSEDDATE" -> dateS,
        "BATHSTOTAL" -> "0.0", "BEDS" -> "0", "CLOSEDDATE" -> dateS, "COUNTYCODE" -> "00",
        "AGENTSELL" -> "000000", "DAYSONMARKET" -> "0.0", "SQFTBLDG" -> "0",
        "EXPIREDATE" -> dateS, "GARAGECAP" -> "0.0", "LISTDATE" -> dateS, "LISTPRICE" -> "0",
        "LOANTERMS_SHORT" -> "Unknown", "LOTSIZE" -> "0x0", "MLSNUM" -> "000000",
        "OFFICELIST" -> "000000", "OFFICESELLNAME" -> "NEW JERSEY", "ORIGLISTPRICE" -> "0.0",
        "OWNERNAME" -> "Not Available", "PARKNBRAVAIL" -> "0.0", "EASEMENT_SHORT" -> "N",
        "PENDINGDATE" -> dateS, "UNITSTYLE_SHORT" -> "Unknown", "REMARKSAGENT" -> "None",
        "REMARKSPUBLIC" -> "None", "ROOMS" -> "0.0", "SALESPRICE" -> "0.0",
        "SHOWSPECIAL" -> "None", "STREETNUMDISPLAY" -> "0", "SUBDIVISION" -> "None",
        "TAXID" -> taxId, "TOWNCODE" -> "0", "WITHDRAWNDATE" -> dateS, "YEARBUILT" -> "0",
        "ZIPCODE" -> "00000", "SP/LP%" -> "0%", "BASEMENT_SHORT" -> "N",
        "BUSRELATION_SHORT" -> "Unknown", "AGENTSELLNAME" -> "NOT AVAILABLE",
        "OFFICESELL" -> "000000", "LISTTYPE_SHORT" -> "Unknown", "BASEDESC_SHORT" -> "None",
        "ASSESSAMOUNTBLDG" -> "0.0", "ASSESSAMOUNTLAND" -> "0.0", "ASSESSTOTAL" -> "0.0",
        "UTILITIES_SHORT" -> "Unknown", "WATER_SHORT" -> "Unknown", "BATHSHALFTOTAL" -> "0.0",
        "BATHSFULLTOTAL" -> "0.0", "INCOMEGROSSOPERATING" -> "0.0",
        "EXPENSEOPERATING" -> "0.0", "INCOMENETOPERATING" -> "0.0", "NUMUNITS" -> "0",
        "UNIT1BEDS" -> "0", "UNIT1BATHS" -> "0", "UNIT1ROOMS" -> "0", "UNIT2BEDS" -> "0",
        "UNIT2BATHS" -> "0", "UNIT2ROOMS" -> "0", "UNIT3BEDS" -> "0", "UNIT3BATHS" -> "0",
        "UNIT3ROOMS" -> "0", "UNIT4BEDS" -> "0", "UNIT4BATHS" -> "0", "UNIT4ROOMS" -> "0",
        "LATITUDE" -> "0E-20", "LONGITUDE" -> "0E-20"),
      LND -> Map(
        "ACRES" -> "0.0", "AGENTLIST" -> "000000", "ANTICCLOSEDDATE" -> dateS,
        "CLOSEDDATE" -> dateS, "COUNTYCODE" -> "00", "AGENTSELL" -> "000000",
        "DAYSONMARKET" -> "0.0", "EXPIREDATE" -> dateS, "LISTDATE" -> dateS,
        "LISTPRICE" -> "0", "LOANTERMS" -> "Unknown", "LOTSIZE" -> "0x0", "MLSNUM" -> "000000",
        "OFFICELIST" -> "000000", "OFFICESELLNAME" -> "NEW JERSEY", "ORIGLISTPRICE" -> "0.0",
        "OWNERNAME" -> "Not Available", "EASEMENT_SHORT" -> "N", "PENDINGDATE" -> dateS,
        "REMARKSAGENT" -> "None", "REMARKSPUBLIC" -> "None", "SALESPRICE" -> "0.0",
        "SHOWSPECIAL" -> "None", "STREETNUMDISPLAY" -> "0", "SUBDIVISION" -> "None",
        "TAXID" -> taxId, "TOWNCODE" -> "0", "WITHDRAWNDATE" -> dateS, "ZIPCODE" -> "00000",
        "SP/LP%" -> "0%", "BUSRELATION_SHORT" -> "Unknown", "LISTTYPE_SHORT" -> "Unknown",
        "AGENTSELLNAME" -> "NOT AVAILABLE", "OFFICESELL" -> "000000",
        "ASSESSAMOUNTBLDG" -> "0.0", "ASSESSAMOUNTLAND" -> "0.0", "ASSESSTOTAL" -> "0.0",
        "NUMLOTS" -> "0", "ZONINGDESC_SHORT" -> "Unknown",
        "BUILDINGSINCLUDED_SHORT" -> "Unknown", "CURRENTUSE_SHORT" -> "Unknown",
        "DEVRESTRICT_SHORT" -> "Unknown", "DEVSTATUS_SHORT" -> "Unknown",
        "IMPROVEMENTS_SHORT" -> "None", "LOTDESC_SHORT" -> "None",
        "PERCTEST_SHORT" -> "Unknown", "ROADFRONTDESC_SHORT" -> "Unknown",
        "ROADSURFACEDESC_SHORT" -> "Unknown", "SERVICES_SHORT" -> "Unknown",
        "SEWERINFO_SHORT" -> "Unknown", "SITEPARTICULARS_SHORT" -> "Unknown",
        "SOILTYPE_SHORT" -> "Unknown", "TOPOGRAPHY_SHORT" -> "Unknown",
        "WATERINFO_SHORT" -> "Unknown", "LATITUDE" -> "0E-20", "LONGITUDE" -> "0E-20"),
      RNT -> Map(
        "MLSNUM" -> "000000", "STREETNUMDISPLAY" -> "0", "ZIPCODE" -> "00000",
        "TOWNCODE" -> "0", "COUNTYCODE" -> "00", "TAXID" -> taxId, "DAYSONMARKET" -> "0.0",
        "RENTPRICEORIG" -> "0.0", "LP" -> "0.0", "RENTMONTHPERLSE" -> "0.0", "RP/LP%" -> "0",
        "LEASETERMS_SHORT" -> "Unknown", "ROOMS" -> "0.0", "BEDS" -> "0.0",
        "BATHSFULLTOTAL" -> "0.0", "BATHSHALFTOTAL" -> "0.0", "BATHSTOTAL" -> "0.0",
        "SQFTAPPROX" -> "0", "SUBDIVISION" -> "Unknown", "YEARBUILT" -> "0",
        "PROPERTYTYPEPRIMARY_SHORT" -> "Unknown", "PROPSUBTYPERN" -> "Unknown",
        "LOCATION_SHORT" -> "Unknown", "PRERENTREQUIRE_SHORT" -> "Unknown",
        "OWNERPAYS_SHORT" -> "Unknown", "TENANTPAYS_SHORT" -> "Unknown",
        "TENANTUSEOF_SHORT" -> "Unknown", "RENTINCLUDES_SHORT" -> "Unknown",
        "RENTTERMS_SHORT" -> "Unknown", "LENGTHOFLEASE" -> "0.0",
        "AVAILABLE_SHORT" -> "Unknown", "AMENITIES_SHORT" -> "Unknown",
        "APPLIANCES_SHORT" -> "Unknown", "LAUNDRYFAC" -> "Unknown",
        "FURNISHINFO_SHORT" -> "Unknown", "PETS_SHORT" -> "Unknown", "PARKNBRAVAIL" -> "0.0",
        "DRIVEWAYDESC_SHORT" -> "Unknown", "BASEMENT_SHORT" -> "Unknown",
        "BASEDESC_SHORT" -> "Unknown", "GARAGECAP" -> "0.0", "HEATSRC_SHORT" -> "Unknown",
        "HEATSYSTEM_SHORT" -> "Unknown", "COOLSYSTEM_SHORT" -> "Unknown",
        "WATER_SHORT" -> "Unknown", "UTILITIES_SHORT" -> "Unknown",
        "FLOORS_SHORT" -> "Unknown", "SEWER_SHORT" -> "Unknown",
        "TENLANDCOMM_SHORT" -> "Unknown", "REMARKSAGENT" -> "Unknown",
        "REMARKSPUBLIC" -> "Unknown", "SHOWSPECIAL" -> "Unknown", "RENTEDDATE" -> dateS,
        "LATITUDE" -> "0E-20", "LONGITUDE" -> "0E-20"),
      TAX -> Map(
        "AUTOROW" -> "0", "CITYCODE" -> "0", "BLOCKID" -> "0", "BLOCKSUFFIX" -> "00",
        "LOT" -> "0", "LOTSUFFIX" -> "00", "PARCEL_NO" -> taxId, "MCR" -> "Unknown",
        "MAP" -> "00", "LOCNUM" -> "00", "LOCDIR" -> "Unknown", "LOCSTREET" -> "Unknown",
        "LOCMODE" -> "Unknown", "LOCCITY" -> "Unknown", "LOCSTATE" -> "Unknown",
        "LOCZIP" -> "00000", "PROPERTYDESC" -> "Unknown", "PROPERTYUSECODE" -> "Unknown",
        "EQVALUE" -> "0.0", "BANKCODE" -> "0", "SALEDATE" -> dateS, "SALEPRICE" -> "0",
        "TAXES" -> "0.0", "TAXYR" -> "0", "RATE" -> "0.0", "RATIO" -> "0.0", "RATIOYR" -> "0",
        "TOTALASSESSMENT" -> "0", "ASSESSMENT2" -> "0", "ASSESSMENT1" -> "0",
        "YEARBUILT" -> "0", "BUILDINGDESC" -> "Unknown", "BUILDINGCLASSCODE" -> "00",
        "ACRES" -> "0.0", "ADDITIONALLOTS" -> "N", "DEEDBOOK" -> "Unknown",
        "DEEDPAGE" -> "Unknown", "OWNER" -> "Unknown", "OWNERS" -> "1", "MAILNUM" -> "Unknown",
        "MAILDIR" -> "Unknown", "MAILSTREET" -> "Unknown", "MAILMODE" -> "Unknown",
        "MAILCITY" -> "Unknown", "MAILSTATE" -> "Unknown", "MAILZIP" -> "00000",
        "PRIOROWNER" -> "Unknown", "PRIORSALEAMT" -> "0", "PRIORSALEDATE" -> dateS,
        "PRIORDEEDBOOK" -> "Unknown", "PRIORDEEDPAGE" -> "Unknown", "DATEMODIFIED" -> dateS))
  }

  /** Typed-cast maps (Kafka_GSMLSConsumer.py:93-128). Applied per-value
    * with try_cast (null on failure) — documented divergence from the
    * reference's whole-column keep-on-failure astype (SURVEY §7.4(2)). */
  val typedCasts: Map[PropType, Map[String, DataType]] = Map(
    RES -> Map(
      "TOWNCODE" -> LongType, "ASSESSAMOUNTBLDG" -> DoubleType, "APPFEE" -> DoubleType,
      "YEAR" -> LongType, "ASSESSAMOUNTLAND" -> DoubleType, "ASSESSTOTAL" -> DoubleType,
      "QTR" -> LongType, "TAXAMOUNT" -> DoubleType, "YEARBUILT" -> DoubleType,
      "SQFTAPPROX" -> DoubleType, "ORIGLISTPRICE" -> LongType, "LISTPRICE" -> LongType,
      "SALESPRICE" -> LongType, "PARKNBRAVAIL" -> LongType),
    MUL -> Map(
      "TOWNCODE" -> LongType, "ASSESSAMOUNTBLDG" -> DoubleType, "YEAR" -> LongType,
      "ASSESSAMOUNTLAND" -> DoubleType, "ASSESSTOTAL" -> DoubleType, "QTR" -> LongType,
      "TAXAMOUNT" -> DoubleType, "YEARBUILT" -> DoubleType, "SQFTBLDG" -> DoubleType,
      "INCOMEGROSSOPERATING" -> DoubleType, "EXPENSEOPERATING" -> DoubleType,
      "INCOMENETOPERATING" -> DoubleType, "ORIGLISTPRICE" -> LongType,
      "LISTPRICE" -> LongType, "SALESPRICE" -> LongType, "PARKNBRAVAIL" -> LongType),
    LND -> Map(
      "TOWNCODE" -> LongType, "ASSESSAMOUNTBLDG" -> DoubleType, "YEAR" -> LongType,
      "ASSESSAMOUNTLAND" -> DoubleType, "ASSESSTOTAL" -> DoubleType, "QTR" -> LongType,
      "TAXAMOUNT" -> DoubleType, "ORIGLISTPRICE" -> LongType, "LISTPRICE" -> LongType,
      "SALESPRICE" -> LongType),
    RNT -> Map(
      "TOWNCODE" -> LongType, "YEAR" -> LongType, "QTR" -> LongType, "BEDS" -> LongType,
      "YEARBUILT" -> DoubleType, "SQFTAPPROX" -> DoubleType, "RENTMONTHPERLSE" -> LongType,
      "GARAGECAP" -> LongType, "LP" -> LongType, "RENTPRICEORIG" -> LongType,
      "LENGTHOFLEASE" -> LongType),
    TAX -> Map.empty)

  /** Multi-hot attribute dictionary — representative subset of the
    * ~26-column × ~150-flag table (Kafka_GSMLSConsumer.py:617-885);
    * extend per deployment, stages are fully dict-driven. */
  val attrDict: Map[String, Map[String, String]] = Map(
    "FLOORS_SHORT" -> Map(
      "WOOD_FLOORS" -> "Wood", "TILE_FLOORS" -> "Tile", "CARPET_FLOORS" -> "Carpet"),
    "UTILITIES_SHORT" -> Map(
      "GAS_UTIL" -> "Gas", "ELECTRIC_UTIL" -> "Electric"),
    "WATER_SHORT" -> Map(
      "PUBLIC_WATER" -> "Public", "WELL_WATER" -> "Well"),
    "POOL_SHORT" -> Map("POOL" -> "Y"))

  /** Derived flag/metric columns the cleaning stages add, in their
    * authoritative output positions (re-expression of the positional
    * inserts at Kafka_GSMLSConsumer.py:929-1013). */
  private val derivedSale = Seq(
    "CONDITION", "OLP/LP%", "SP/OLP%", "INVESTMENT_SALE", "POTENTIAL_INVESTMENT",
    "DISTRESSED_SALE", "SHORT_SALE", "BANK_OWNED", "LOTSIZE (SQFT)", "QTR", "MONTH", "YEAR",
    "DAYS_TO_CLOSE", "ANTIC_CLOSEDATE_DIFF")

  /** Authoritative final column order per type: retained ingest columns
    * (with stage renames applied), then derived metrics/flags, then the
    * dict-driven attribute flags, with LISTING_REMARKS pinned last
    * (Kafka_GSMLSConsumer.py:929-1013 'LISTING_REMARKS': shape[1]-1). */
  def finalColumns(pt: PropType): Seq[String] = {
    val renames = Map("OWNERNAME" -> "SELLERNAME", "SUBPROPTYPE" -> "SUBPROPTYPE_SFH")
    val retained = targetColumns(pt)
      .filterNot(dropColumns(pt).contains)
      .map(c => renames.getOrElse(c, c))
    val attrs = attrDict.values.flatMap(_.keys).toSeq.sorted
    pt match {
      case RES | MUL | LND => retained ++ derivedSale ++ attrs ++ Seq("LISTING_REMARKS")
      case RNT             => retained ++ Seq("QTR", "MONTH", "YEAR") ++ attrs
      case TAX             => retained ++ Seq("PREVOWN_POSS_TIME (YRS)")
    }
  }
}
