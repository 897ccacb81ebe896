package graft.schema

import org.apache.spark.sql.types._

/** Canonical CTB table schema + header normalization rules.
  *
  * Mirrors the reference's schema system (reference: main.py:299-364):
  *   - `renameMap`  — cleaned file-header -> canonical column (main.py:299-321)
  *   - `columnTypes`— canonical column -> one of STRING/INTEGER/DATE (main.py:323-345)
  *   - `cleanHeader`— BOM strip, trim, remove CR, uppercase, spaces->underscores
  *     (main.py:347-351)
  *
  * Enforcement is a subset check: every cleaned header must be a known canonical
  * column, else the whole file fails; missing columns are allowed (main.py:353-364).
  */
/** Typed row of the canonical CTB table — the type-safe Dataset view of the
  * ingested data (column order and types mirror [[CtbSchema.sparkSchema]]).
  */
final case class CtbRecord(
    ORG_CODE: Option[String], MASTER_CUST_NAME: Option[String],
    CUSTOMER_NUMBER: Option[String], ITEM_NUMBER: Option[String],
    CUST_PART_NUM: Option[String], ITEM_DESCRIPTION: Option[String],
    DEMAND_DUE_DATE: Option[java.sql.Date], DEMAND_QTY: Option[Long],
    ONTIME_QTY: Option[Long], AVAILABLE_DATE: Option[java.sql.Date],
    SUPPLY_SOURCE: Option[String], SUPPLY_AVAILABLE_DATE: Option[java.sql.Date],
    SUPPLY_AVA_QTY: Option[Long], DAYS_LATE: Option[Long],
    UNIQ_SHORT_QTY: Option[Long], GATING_PART: Option[String],
    MAKE_BUY: Option[String], LEAD_TIME: Option[Long],
    GATING_CUST_PART: Option[String], CUST_PART_DESCRIPTION: Option[String],
    SNAPSHOT_DATE: Option[java.sql.Date])

object CtbSchema {

  sealed trait CtbType
  case object CtbString extends CtbType
  case object CtbInt extends CtbType
  case object CtbDate extends CtbType

  /** cleaned raw header -> canonical column name (reference main.py:299-321). */
  val renameMap: Map[String, String] = Map(
    "ORG_CODE" -> "ORG_CODE",
    "MASTER_CUST_NAME" -> "MASTER_CUST_NAME",
    "CUSTOMER_NUMBER" -> "CUSTOMER_NUMBER",
    "ITEM_NUMBER" -> "ITEM_NUMBER",
    "CUST_PART_NUM" -> "CUST_PART_NUM",
    "ITEM_DESCRIPTION" -> "ITEM_DESCRIPTION",
    "DEMAND_DUE_DATE" -> "DEMAND_DUE_DATE",
    "DEMAND_QTY" -> "DEMAND_QTY",
    "AVAIL_ONTIME" -> "ONTIME_QTY",
    "AVAIL_DATE" -> "AVAILABLE_DATE",
    "SPLITAVAIL_SUPPLY_SOURCE" -> "SUPPLY_SOURCE",
    "SPLITAVAILDATE" -> "SUPPLY_AVAILABLE_DATE",
    "SPLITAVAIL_QTY" -> "SUPPLY_AVA_QTY",
    "DAYS_LATE" -> "DAYS_LATE",
    "UNIQUE_SHORT_QTY_COUNT" -> "UNIQ_SHORT_QTY",
    "GATING_PART" -> "GATING_PART",
    "GATING_M/B" -> "MAKE_BUY",
    "GATING_LT" -> "LEAD_TIME",
    "GATING_CUST_PART" -> "GATING_CUST_PART",
    "CUST_PART_DESCRIPTION" -> "CUST_PART_DESCRIPTION",
    "SNAPSHOT_DATE" -> "SNAPSHOT_DATE"
  )

  /** canonical column -> type; exactly 3 types (reference main.py:323-345). */
  val columnTypes: Map[String, CtbType] = Map(
    "ORG_CODE" -> CtbString,
    "MASTER_CUST_NAME" -> CtbString,
    "CUSTOMER_NUMBER" -> CtbString,
    "ITEM_NUMBER" -> CtbString,
    "CUST_PART_NUM" -> CtbString,
    "ITEM_DESCRIPTION" -> CtbString,
    "DEMAND_DUE_DATE" -> CtbDate,
    "DEMAND_QTY" -> CtbInt,
    "ONTIME_QTY" -> CtbInt,
    "AVAILABLE_DATE" -> CtbDate,
    "SUPPLY_SOURCE" -> CtbString,
    "SUPPLY_AVAILABLE_DATE" -> CtbDate,
    "SUPPLY_AVA_QTY" -> CtbInt,
    "DAYS_LATE" -> CtbInt,
    "UNIQ_SHORT_QTY" -> CtbInt,
    "GATING_PART" -> CtbString,
    "MAKE_BUY" -> CtbString,
    "LEAD_TIME" -> CtbInt,
    "GATING_CUST_PART" -> CtbString,
    "CUST_PART_DESCRIPTION" -> CtbString,
    "SNAPSHOT_DATE" -> CtbDate
  )

  /** Canonical column ordering (the reference's BQ table order). */
  val canonicalColumns: Seq[String] = Seq(
    "ORG_CODE", "MASTER_CUST_NAME", "CUSTOMER_NUMBER", "ITEM_NUMBER",
    "CUST_PART_NUM", "ITEM_DESCRIPTION", "DEMAND_DUE_DATE", "DEMAND_QTY",
    "ONTIME_QTY", "AVAILABLE_DATE", "SUPPLY_SOURCE", "SUPPLY_AVAILABLE_DATE",
    "SUPPLY_AVA_QTY", "DAYS_LATE", "UNIQ_SHORT_QTY", "GATING_PART", "MAKE_BUY",
    "LEAD_TIME", "GATING_CUST_PART", "CUST_PART_DESCRIPTION", "SNAPSHOT_DATE"
  )

  private def sparkType(t: CtbType): DataType = t match {
    case CtbString => StringType
    case CtbInt    => LongType // BigQuery INTEGER is INT64
    case CtbDate   => DateType
  }

  /** Typed Spark schema for a fully-populated canonical table. */
  val sparkSchema: StructType =
    StructType(canonicalColumns.map(c => StructField(c, sparkType(columnTypes(c)), nullable = true)))

  /** Header normalization (reference main.py:347-351): strip BOM, trim,
    * drop CR, uppercase, spaces -> underscores. Headers are metadata, so
    * this is plain Scala (runs driver-side on the header row only).
    */
  def cleanHeader(raw: String): String =
    raw.replace("﻿", "").trim.replace("\r", "").toUpperCase.replace(' ', '_')

  /** Cleaned header -> canonical name; unknown names pass through unchanged
    * (reference main.py:350 `.get(cleaned, cleaned)`).
    */
  def canonicalName(rawHeader: String): String = {
    val cleaned = cleanHeader(rawHeader)
    renameMap.getOrElse(cleaned, cleaned)
  }

  /** File-level validation (reference main.py:353-364): every canonicalized
    * header must be a known column. Returns the unknown columns (empty = valid).
    * Missing columns do NOT fail the file (asymmetry noted in SURVEY §1.2).
    */
  def unknownColumns(rawHeaders: Seq[String]): Seq[String] =
    rawHeaders.map(canonicalName).filterNot(columnTypes.contains)
}
