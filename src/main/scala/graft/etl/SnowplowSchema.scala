package graft.etl

import org.apache.spark.sql.types._

/** Snowplow canonical enriched-event model: the 131 positional TSV fields
  * (SURVEY.md §1.1, §2.1-J1; public atomic.events field list `[pub:snowplow]`).
  *
  * Order is load-bearing — an off-by-one silently shifts every downstream
  * column (SURVEY.md §7 risk 3) — so tests pin well-known positions
  * (app_id=0, event_id=6, contexts=52, unstruct_event=58, true_tstamp=130)
  * and the total count.
  */
object SnowplowSchema {

  import DataTypes.{BooleanType => B, DoubleType => D, IntegerType => I,
    StringType => S, TimestampType => T}

  /** (field name, target type) in canonical TSV position order. */
  val FIELDS: Vector[(String, DataType)] = Vector(
    // app
    "app_id" -> S, "platform" -> S,
    // timestamps + event identity
    "etl_tstamp" -> T, "collector_tstamp" -> T, "dvce_created_tstamp" -> T,
    "event" -> S, "event_id" -> S, "txn_id" -> I,
    // tracker/collector versions
    "name_tracker" -> S, "v_tracker" -> S, "v_collector" -> S, "v_etl" -> S,
    // user
    "user_id" -> S, "user_ipaddress" -> S, "user_fingerprint" -> S,
    "domain_userid" -> S, "domain_sessionidx" -> I, "network_userid" -> S,
    // geo / ip
    "geo_country" -> S, "geo_region" -> S, "geo_city" -> S, "geo_zipcode" -> S,
    "geo_latitude" -> D, "geo_longitude" -> D, "geo_region_name" -> S,
    "ip_isp" -> S, "ip_organization" -> S, "ip_domain" -> S, "ip_netspeed" -> S,
    // page / referrer URL components
    "page_url" -> S, "page_title" -> S, "page_referrer" -> S,
    "page_urlscheme" -> S, "page_urlhost" -> S, "page_urlport" -> I,
    "page_urlpath" -> S, "page_urlquery" -> S, "page_urlfragment" -> S,
    "refr_urlscheme" -> S, "refr_urlhost" -> S, "refr_urlport" -> I,
    "refr_urlpath" -> S, "refr_urlquery" -> S, "refr_urlfragment" -> S,
    "refr_medium" -> S, "refr_source" -> S, "refr_term" -> S,
    // marketing
    "mkt_medium" -> S, "mkt_source" -> S, "mkt_term" -> S, "mkt_content" -> S,
    "mkt_campaign" -> S,
    // self-describing JSON: custom contexts
    "contexts" -> S,
    // structured events
    "se_category" -> S, "se_action" -> S, "se_label" -> S, "se_property" -> S,
    "se_value" -> D,
    // self-describing JSON: unstructured event
    "unstruct_event" -> S,
    // e-commerce transaction
    "tr_orderid" -> S, "tr_affiliation" -> S, "tr_total" -> D, "tr_tax" -> D,
    "tr_shipping" -> D, "tr_city" -> S, "tr_state" -> S, "tr_country" -> S,
    // e-commerce transaction item
    "ti_orderid" -> S, "ti_sku" -> S, "ti_name" -> S, "ti_category" -> S,
    "ti_price" -> D, "ti_quantity" -> I,
    // page pings
    "pp_xoffset_min" -> I, "pp_xoffset_max" -> I, "pp_yoffset_min" -> I,
    "pp_yoffset_max" -> I,
    // browser
    "useragent" -> S, "br_name" -> S, "br_family" -> S, "br_version" -> S,
    "br_type" -> S, "br_renderengine" -> S, "br_lang" -> S,
    "br_features_pdf" -> B, "br_features_flash" -> B, "br_features_java" -> B,
    "br_features_director" -> B, "br_features_quicktime" -> B,
    "br_features_realplayer" -> B, "br_features_windowsmedia" -> B,
    "br_features_gears" -> B, "br_features_silverlight" -> B,
    "br_cookies" -> B, "br_colordepth" -> S, "br_viewwidth" -> I,
    "br_viewheight" -> I,
    // OS / device
    "os_name" -> S, "os_family" -> S, "os_manufacturer" -> S,
    "os_timezone" -> S, "dvce_type" -> S, "dvce_ismobile" -> B,
    "dvce_screenwidth" -> I, "dvce_screenheight" -> I,
    // document
    "doc_charset" -> S, "doc_width" -> I, "doc_height" -> I,
    // currency
    "tr_currency" -> S, "tr_total_base" -> D, "tr_tax_base" -> D,
    "tr_shipping_base" -> D, "ti_currency" -> S, "ti_price_base" -> D,
    "base_currency" -> S,
    // geo/marketing extras, etl
    "geo_timezone" -> S, "mkt_clickid" -> S, "mkt_network" -> S,
    "etl_tags" -> S, "dvce_sent_tstamp" -> T,
    // referrer cross-domain
    "refr_domain_userid" -> S, "refr_dvce_tstamp" -> T,
    // self-describing JSON: derived contexts
    "derived_contexts" -> S,
    // session + derived/true timestamps, event vendor info, fingerprint
    "domain_sessionid" -> S, "derived_tstamp" -> T,
    "event_vendor" -> S, "event_name" -> S, "event_format" -> S,
    "event_version" -> S, "event_fingerprint" -> S, "true_tstamp" -> T
  )

  require(FIELDS.length == 131, s"canonical model is 131 fields, got ${FIELDS.length}")

  val NUM_FIELDS: Int = FIELDS.length

  val SCHEMA: StructType =
    StructType(FIELDS.map { case (n, t) => StructField(n, t, nullable = true) })

  /** Fields that must be present and valid for a row to be loadable. */
  val REQUIRED: Set[String] = Set("event_id", "collector_tstamp", "event")

  val UUID_RE = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
}
