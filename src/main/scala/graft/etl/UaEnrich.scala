package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Computed user-agent enrichment (SURVEY.md §2.1 H10 v1, VERDICT r10 #7).
  *
  * H10 v0 passed the pre-enriched br_/os_/dvce_ fields through; this
  * derives browser family + major version, OS family, and device class
  * from the raw `useragent` string with public-knowledge markers (the
  * token conventions every UA parser keys on: "Edg/" before "Chrome/",
  * "Version/…Safari" for real Safari, "like Mac OS X" devices are iOS,
  * Android before Linux, bots by (?i)bot|crawler|spider|curl|wget).
  *
  * Same dialect trick as [[graft.ops.Text.piiPatterns]] (k16): every
  * pattern stays in the RE2 ∩ java.util.regex COMMON dialect — no
  * backreferences, no lookaround, inline (?i) only — so the DuckDB oracle
  * runs the IDENTICAL pattern strings. Both the Spark Columns and the
  * oracle SQL are generated from the single ordered tables below
  * (first match wins), so the two sides cannot drift apart silently.
  *
  * Map-only (one codegen'd regex chain per row, no shuffle, no UDF) —
  * at 100 TB this rides the scan like any other projection.
  */
object UaEnrich {

  /** (family, detect pattern, version-capture pattern or "") — ORDERED,
    * first match wins. Edge/Opera carry "Chrome/" too, so they test
    * first; Safari requires the "Version/" token Chrome-family UAs lack.
    */
  val families: Seq[(String, String, String)] = Seq(
    ("Bot", "(?i)(bot|crawler|spider|curl|wget)", ""),
    ("Edge", "Edg", "Edg/([0-9]+)"),
    ("Opera", "(OPR/|Opera)", "OPR/([0-9]+)"),
    ("Chrome", "Chrome/", "Chrome/([0-9]+)"),
    ("Firefox", "Firefox/", "Firefox/([0-9]+)"),
    ("Safari", "Version/[0-9.]+.*Safari/", "Version/([0-9]+)"))

  /** (os family, detect pattern) — ordered: iOS before macOS ("like Mac
    * OS X"), Android before Linux (Android UAs contain "Linux").
    */
  val osFamilies: Seq[(String, String)] = Seq(
    ("Windows", "Windows NT"),
    ("Android", "Android"),
    ("iOS", "(iPhone|iPad|iPod)"),
    ("macOS", "Mac OS X"),
    ("Linux", "Linux"))

  /** (device class, detect pattern) — ordered; fallthrough = desktop. */
  val deviceClasses: Seq[(String, String)] = Seq(
    ("bot", "(?i)(bot|crawler|spider|curl|wget)"),
    ("tablet", "(iPad|Tablet)"),
    ("mobile", "(Mobi|iPhone|Android)"))

  private def classify(ua: Column, table: Seq[(String, String)],
      fallback: String): Column =
    table.foldRight(lit(fallback)) { case ((label, pat), acc) =>
      when(ua.rlike(pat), label).otherwise(acc)
    }

  def uaFamily(ua: Column): Column =
    classify(ua, families.map { case (f, det, _) => (f, det) }, "Other")

  /** Major version of the matched family; NULL when the family carries no
    * version token (bots, Other). `nullif(…, '')` canonicalizes the
    * no-match empty string to NULL on both engines.
    */
  def uaVersion(ua: Column): Column =
    families.foldRight(lit(null).cast("string")) { case ((_, det, ver), acc) =>
      if (ver.isEmpty) when(ua.rlike(det), lit(null).cast("string")).otherwise(acc)
      else when(ua.rlike(det), nullif(regexp_extract(ua, ver, 1), lit(""))).otherwise(acc)
    }

  def uaOsFamily(ua: Column): Column = classify(ua, osFamilies, "Other")

  def uaDeviceClass(ua: Column): Column = classify(ua, deviceClasses, "desktop")

  // --- oracle SQL generation (same tables, same patterns) ------------------

  private def sqlClassify(uaExpr: String, table: Seq[(String, String)],
      fallback: String): String =
    table.foldRight(s"'$fallback'") { case ((label, pat), acc) =>
      s"CASE WHEN regexp_matches($uaExpr, '$pat') THEN '$label' ELSE $acc END"
    }

  def familySql(uaExpr: String): String =
    sqlClassify(uaExpr, families.map { case (f, det, _) => (f, det) }, "Other")

  def versionSql(uaExpr: String): String =
    families.foldRight("CAST(NULL AS VARCHAR)") { case ((_, det, ver), acc) =>
      val thenExpr =
        if (ver.isEmpty) "CAST(NULL AS VARCHAR)"
        else s"nullif(regexp_extract($uaExpr, '$ver', 1), '')"
      s"CASE WHEN regexp_matches($uaExpr, '$det') THEN $thenExpr ELSE $acc END"
    }

  def osFamilySql(uaExpr: String): String =
    sqlClassify(uaExpr, osFamilies, "Other")

  def deviceClassSql(uaExpr: String): String =
    sqlClassify(uaExpr, deviceClasses, "desktop")
}
