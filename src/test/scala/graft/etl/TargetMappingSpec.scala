package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J6: target-table mapping goldens over the parsed fixture, plus the A7
  * console sink smoke (the remaining dev-sink in SURVEY §2.1-A7).
  */
class TargetMappingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val good =
    SnowplowParser.read(spark, EtlFixtures.snowplowTsv()).good

  test("atomic events: one row per good event, keyed by event_id") {
    val atomic = TargetMapping.atomicEvents(good)
    assert(atomic.count() == 5)
    assert(atomic.select("event_id").distinct().count() == 5)
    assert(atomic.columns.contains("geo_country")) // enrichment pass-through (H10)
  }

  test("child tables route by event family with typed payloads") {
    assert(TargetMapping.structuredEvents(good).count() == 1)
    val tr = TargetMapping.transactions(good).head()
    assert(tr.getAs[Double]("tr_total") == 129.90)
    val ti = TargetMapping.transactionItems(good).head()
    assert(ti.getAs[String]("ti_sku") == "sku-123")
    assert(ti.getAs[Int]("ti_quantity") == 1)
  }

  test("loadAll into Derby twice leaves per-table counts unchanged (J6+A5)") {
    val url = {
      val dir = "target/derby/test_j6"
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$dir;shutdown=true")
      catch { case _: java.sql.SQLException => () }
      graft.streaming.StreamInput.deleteRecursively(java.nio.file.Paths.get(dir))
      s"jdbc:derby:$dir;create=true"
    }
    TargetMapping.loadAll(good, url)
    TargetMapping.loadAll(good, url)
    def n(table: String) = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load().count()
    assert(n("atomic_events") == 5)
    assert(n("structured_events") == 1)
    assert(n("transactions") == 1)
    assert(n("transaction_items") == 1)
  }

  test("A7: console sink accepts a batch write (dev sink smoke)") {
    // console format prints to stdout; the assertion is that the write
    // completes without error
    good.limit(1).write.format("console").save()
  }
}
