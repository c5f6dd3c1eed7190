package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Target-table mapping (SURVEY.md §2.1 J6): parsed canonical events →
  * destination table row-sets, silvia's load shape — one wide "atomic
  * events" table plus per-event-family child tables, each keyed for the
  * idempotent upsert sink (A5).
  *
  * Pure projections (column pruning reaches the scan; nothing widens the
  * shuffle), so adding a target table costs one `select`.
  */
object TargetMapping {

  /** The wide atomic table: identity, timestamps, user, geo, page, device. */
  def atomicEvents(good: DataFrame): DataFrame =
    good.select(
      col("event_id"), col("collector_tstamp"), col("derived_tstamp"),
      col("event"), col("event_vendor"), col("event_name"),
      col("app_id"), col("platform"),
      col("user_id"), col("domain_userid"), col("domain_sessionid"),
      col("domain_sessionidx"), col("network_userid"), col("user_ipaddress"),
      col("geo_country"), col("geo_region"), col("geo_city"),
      col("geo_latitude"), col("geo_longitude"),
      col("page_url"), col("page_urlhost"), col("page_urlpath"),
      col("refr_urlhost"), col("refr_medium"),
      col("mkt_medium"), col("mkt_source"), col("mkt_campaign"),
      col("useragent"), col("br_name"), col("os_name"), col("dvce_type"),
      col("dvce_ismobile"), col("event_fingerprint"),
      // H10 v1: COMPUTED ua enrichment beside the pass-through fields —
      // derived from the raw useragent, oracle-checked by p11
      UaEnrich.uaFamily(col("useragent")).as("ua_family"),
      UaEnrich.uaVersion(col("useragent")).as("ua_version"),
      UaEnrich.uaOsFamily(col("useragent")).as("ua_os_family"),
      UaEnrich.uaDeviceClass(col("useragent")).as("ua_device_class"))

  /** Structured-event child table (se_* family). */
  def structuredEvents(good: DataFrame): DataFrame =
    good.filter(col("event") === "struct")
      .select(
        col("event_id"), col("collector_tstamp"),
        col("se_category"), col("se_action"), col("se_label"),
        col("se_property"), col("se_value"))

  /** Transaction child table (tr_* family). */
  def transactions(good: DataFrame): DataFrame =
    good.filter(col("event") === "transaction")
      .select(
        col("event_id"), col("collector_tstamp"),
        col("tr_orderid"), col("tr_affiliation"), col("tr_total"),
        col("tr_tax"), col("tr_shipping"), col("tr_city"), col("tr_country"),
        col("tr_currency"), col("tr_total_base"), col("base_currency"))

  /** Transaction-item child table (ti_* family). */
  def transactionItems(good: DataFrame): DataFrame =
    good.filter(col("event") === "transaction_item")
      .select(
        col("event_id"), col("collector_tstamp"),
        col("ti_orderid"), col("ti_sku"), col("ti_name"), col("ti_category"),
        col("ti_price"), col("ti_quantity"), col("ti_currency"))

  /** (table name, rows, upsert keys) for every target of a parsed batch. */
  def allTargets(good: DataFrame): Seq[(String, DataFrame, Seq[String])] = Seq(
    ("atomic_events", atomicEvents(good), Seq("event_id")),
    ("structured_events", structuredEvents(good), Seq("event_id")),
    ("transactions", transactions(good), Seq("event_id")),
    ("transaction_items", transactionItems(good), Seq("event_id")))

  /** Load a parsed batch into every target table of a JDBC database. */
  def loadAll(good: DataFrame, url: String): Unit =
    allTargets(good).foreach { case (table, rows, keys) =>
      JdbcUpsert.ensureTable(url, table, rows.schema, keys)
      JdbcUpsert.upsertBatch(rows, url, table, keys)
    }
}
