package graft.etl

import java.nio.file.{Files, Paths}

/** Hand-authored raw-event fixtures (FIXTURES.md §B1/§B2), written under
  * `target/etl/` for both the scalatest goldens and the declared p1/p2
  * pipeline queries. Lines are assembled positionally from field→value maps
  * against [[SnowplowSchema.FIELDS]]; tests pin well-known positions
  * independently so a schema off-by-one cannot hide here.
  */
object EtlFixtures {

  private def mkLine(values: Map[String, String]): String =
    SnowplowSchema.FIELDS.map { case (n, _) => values.getOrElse(n, "") }
      .mkString("\t")

  val uuidPageView = "c6ef3124-b53a-4b13-a233-0088f79dcbcb"
  val uuidStruct   = "5c298bbc-2c12-4a31-a32f-59e0d9318e10"
  val uuidUnstruct = "7f2c8e11-4a52-4c39-9a3e-6c1d22caf1f4"
  val uuidTrans    = "9a17c9f6-0b3a-4e02-b0a1-3d3e7a2ce0aa"
  val uuidTransItem = "0d5f2f66-91dc-43c2-8f63-77bd02d3cd1f"

  private val base = Map(
    "app_id" -> "qlean-web", "platform" -> "web",
    "etl_tstamp" -> "2024-01-01 10:00:05.000",
    "collector_tstamp" -> "2024-01-01 10:00:01.000",
    "dvce_created_tstamp" -> "2024-01-01 10:00:00.500",
    "v_tracker" -> "js-2.17.0", "v_collector" -> "ssc-2.8.2",
    "v_etl" -> "spark-enrich-1.0.0",
    "user_id" -> "user42", "user_ipaddress" -> "203.0.113.7",
    "domain_userid" -> "bc2e92ec6c204a14", "domain_sessionidx" -> "3",
    "network_userid" -> "ecdff4d0-9175-40ac-a8bb-325c49733607",
    "geo_country" -> "RU", "geo_city" -> "Moscow",
    "geo_latitude" -> "55.7558", "geo_longitude" -> "37.6173",
    "useragent" -> "Mozilla/5.0",
    "br_name" -> "Chrome", "br_family" -> "Chrome", "br_lang" -> "en-US",
    "br_features_pdf" -> "1", "br_features_flash" -> "0",
    "br_cookies" -> "1", "br_colordepth" -> "24",
    "br_viewwidth" -> "1920", "br_viewheight" -> "1080",
    "os_name" -> "Mac OS X", "os_family" -> "Mac OS X",
    "os_timezone" -> "Europe/Moscow",
    "dvce_type" -> "Computer", "dvce_ismobile" -> "0",
    "dvce_screenwidth" -> "2560", "dvce_screenheight" -> "1440",
    "doc_charset" -> "UTF-8", "doc_width" -> "1920", "doc_height" -> "4320",
    "domain_sessionid" -> "2b15e5c8-d3b1-11e4-b9d6-1681e6b88ec1",
    "derived_tstamp" -> "2024-01-01 10:00:00.500",
    "dvce_sent_tstamp" -> "2024-01-01 10:00:00.800"
  )

  // Per-line useragents (p11 UA enrichment, VERDICT r10 #7): one per
  // browser/OS/device class the classifier distinguishes, so the computed
  // enrichment is exercised beyond a single constant.
  val goodPageView: String = mkLine(base ++ Map(
    "event" -> "page_view", "event_id" -> uuidPageView,
    "useragent" -> ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) " +
      "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
    "page_url" -> "https://qlean.example/catalog/cleaning?utm_source=ya&page=2",
    "page_title" -> "Catalog", "page_referrer" -> "https://ya.example/search",
    "page_urlscheme" -> "https", "page_urlhost" -> "qlean.example",
    "page_urlport" -> "443", "page_urlpath" -> "/catalog/cleaning",
    "page_urlquery" -> "utm_source=ya&page=2",
    "refr_urlscheme" -> "https", "refr_urlhost" -> "ya.example",
    "refr_urlport" -> "443", "refr_urlpath" -> "/search",
    "refr_medium" -> "search", "refr_source" -> "Yandex",
    "mkt_medium" -> "cpc", "mkt_source" -> "ya",
    "event_vendor" -> "com.snowplowanalytics.snowplow",
    "event_name" -> "page_view", "event_format" -> "jsonschema",
    "event_version" -> "1-0-0",
    "event_fingerprint" -> "c5f2b1aa19d8e6f1"))

  val goodStruct: String = mkLine(base ++ Map(
    "event" -> "struct", "event_id" -> uuidStruct,
    "useragent" -> ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) " +
      "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 " +
      "Safari/604.1"),
    "se_category" -> "checkout", "se_action" -> "add_to_cart",
    "se_label" -> "sku-123", "se_property" -> "qty", "se_value" -> "2.0",
    "event_vendor" -> "com.google.analytics", "event_name" -> "event",
    "event_format" -> "jsonschema", "event_version" -> "1-0-0"))

  val goodUnstruct: String = mkLine(base ++ Map(
    "event" -> "unstruct", "event_id" -> uuidUnstruct,
    "useragent" ->
      "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
    "unstruct_event" ->
      """{"schema":"iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0","data":{"schema":"iglu:com.qlean/order_created/jsonschema/1-0-0","data":{"order_id":"ord-77","amount":"129.90"}}}""",
    "contexts" ->
      """{"schema":"iglu:com.snowplowanalytics.snowplow/contexts/jsonschema/1-0-1","data":[{"schema":"iglu:com.qlean/user_ctx/jsonschema/1-0-0","data":{"tier":"gold"}},{"schema":"iglu:org.w3/PerformanceTiming/jsonschema/1-0-0","data":{"domComplete":"1234"}}]}""",
    "event_vendor" -> "com.qlean", "event_name" -> "order_created",
    "event_format" -> "jsonschema", "event_version" -> "1-0-0"))

  val goodTransaction: String = mkLine(base ++ Map(
    "event" -> "transaction", "event_id" -> uuidTrans,
    "useragent" -> ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) " +
      "AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 " +
      "Safari/537.36 Edg/120.0.2210.91"),
    "tr_orderid" -> "ord-77", "tr_affiliation" -> "web",
    "tr_total" -> "129.90", "tr_tax" -> "21.65", "tr_shipping" -> "0.00",
    "tr_city" -> "Moscow", "tr_country" -> "RU",
    "tr_currency" -> "RUB", "tr_total_base" -> "1.42",
    "base_currency" -> "EUR",
    "event_vendor" -> "com.snowplowanalytics.snowplow",
    "event_name" -> "transaction", "event_format" -> "jsonschema",
    "event_version" -> "1-0-0"))

  val goodTransactionItem: String = mkLine(base ++ Map(
    "event" -> "transaction_item", "event_id" -> uuidTransItem,
    "useragent" -> ("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; " +
      "compatible; Googlebot/2.1; +http://www.google.com/bot.html) " +
      "Chrome/120.0.6099.129 Safari/537.36"),
    "ti_orderid" -> "ord-77", "ti_sku" -> "sku-123",
    "ti_name" -> "Deep cleaning", "ti_category" -> "cleaning",
    "ti_price" -> "129.90", "ti_quantity" -> "1",
    "ti_currency" -> "RUB", "ti_price_base" -> "1.42",
    "event_vendor" -> "com.snowplowanalytics.snowplow",
    "event_name" -> "transaction_item", "event_format" -> "jsonschema",
    "event_version" -> "1-0-0"))

  /** 130 fields: count mismatch must dead-letter (A9). */
  val badFieldCount: String = {
    val full = mkLine(base ++ Map("event" -> "page_view",
      "event_id" -> "11111111-2222-3333-4444-555555555555"))
    full.substring(0, full.lastIndexOf('\t'))
  }

  /** Malformed event_id UUID. */
  val badUuid: String = mkLine(base ++ Map(
    "event" -> "page_view", "event_id" -> "not-a-uuid"))

  /** Non-numeric tr_total. */
  val badTrTotal: String = mkLine(base ++ Map(
    "event" -> "transaction",
    "event_id" -> "22222222-3333-4444-5555-666666666666",
    "tr_orderid" -> "ord-99", "tr_total" -> "12f.90"))

  val snowplowLines: Seq[String] = Seq(
    goodPageView, goodStruct, goodUnstruct, goodTransaction,
    goodTransactionItem, badFieldCount, badUuid, badTrTotal)

  val adjustLines: Seq[String] = Seq(
    // install
    """{"activity_kind":"install","app_token":"4w565xzmb54d","adid":"18546f6171f67e29d1cb983322ad1329","gps_adid":"5056e23a-dc1d-418f-b5a2-4ab4e75daab2","created_at":"1704103200","tracker":"abc123","tracker_name":"Organic","network_name":"Organic","country":"ru","os_name":"android","os_version":"14","device_name":"Pixel 8","is_organic":"1"}""",
    // revenue event
    """{"activity_kind":"event","event_token":"f0ob4r","app_token":"4w565xzmb54d","adid":"18546f6171f67e29d1cb983322ad1329","created_at":"1704106800","tracker":"xyz789","tracker_name":"AdNet::Campaign1","network_name":"AdNet","campaign_name":"Campaign1","adgroup_name":"ag1","creative_name":"cr1","country":"ru","os_name":"android","os_version":"14","device_name":"Pixel 8","is_organic":"0","revenue_float":"1.99","currency":"USD"}""",
    // session
    """{"activity_kind":"session","app_token":"4w565xzmb54d","idfa":"8C6CBCOD-5F43-4765-A6E6-84DFF3D24707","created_at":"1704110400","tracker":"abc123","tracker_name":"Organic","network_name":"Organic","country":"de","os_name":"ios","os_version":"17.2","device_name":"iPhone15,2","is_organic":"1"}""",
    // bad: missing created_at
    """{"activity_kind":"install","app_token":"4w565xzmb54d","adid":"ffffffffffffffffffffffffffffffff","country":"ru","os_name":"android","is_organic":"1"}""",
    // bad: non-numeric revenue
    """{"activity_kind":"event","event_token":"f0ob4r","app_token":"4w565xzmb54d","adid":"18546f6171f67e29d1cb983322ad1329","created_at":"1704110500","revenue_float":"one.99","currency":"USD","is_organic":"0"}""",
    // bad: malformed JSON (truncated object) — must dead-letter as bad_json,
    // not under a spurious per-field label (ADVICE r2)
    """{"activity_kind":"install","created_at":"1704110600""")

  private def writeOnce(path: String, lines: Seq[String]): String = {
    val p = Paths.get(path)
    val content = lines.mkString("", "\n", "\n")
    // rewrite on content drift too — a stale target/ file from a previous
    // build would silently pin the old fixture
    if (!Files.exists(p) || Files.readString(p) != content) {
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    path
  }

  def snowplowTsv(): String =
    writeOnce("target/etl/snowplow_enriched.tsv", snowplowLines)

  def adjustJsonl(): String =
    writeOnce("target/etl/adjust_postbacks.jsonl", adjustLines)
}
