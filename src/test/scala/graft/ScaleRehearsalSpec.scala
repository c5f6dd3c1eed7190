package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-adjudicating rehearsal artifact (VERDICT r18 #5): out-of-band
  * roster ratios carry their solo fresh-JVM readings machine-readably, so
  * the tracked JSON never needs prose to be read correctly.
  */
class ScaleRehearsalSpec extends AnyFunSuite {

  test("rehearsalJson: roster trios, solo trios for adjudicated entries, " +
    "and the band ride the artifact") {
    val rows = Seq(
      "p13_lake_merge" -> (3.56, 24.33, 6.83),
      "k2_minhash_neardup" -> (1.0, 2.0, 2.0))
    val solos = Map("p13_lake_merge" -> (3.4, 18.7, 5.5))
    val line = ScaleRehearsal.rehearsalJson(rows, solos, "/src", "/out")
    assert(line.contains("\"band\":"))
    assert(line.contains(
      "\"p13_lake_merge\":{\"small_sec\":3.56,\"big_sec\":24.33," +
        "\"ratio\":6.83,\"solo\":{\"small_sec\":3.40,\"big_sec\":18.70," +
        "\"ratio\":5.50}}"), line)
    // in-band entries carry no solo field
    assert(line.contains(
      "\"k2_minhash_neardup\":{\"small_sec\":1.00,\"big_sec\":2.00," +
        "\"ratio\":2.00}"), line)
    // parses as JSON (brace balance + the driver's last-line contract)
    assert(line.count(_ == '{') == line.count(_ == '}'))
    assert(line.startsWith("{\"metric\":\"scale_rehearsal\""))
  }

  test("the solo-parse regex shape matches what a child run prints") {
    // what rehearsalJson itself emits for a filtered child run — the
    // parent parses the child with the same trio shape
    val childLine = ScaleRehearsal.rehearsalJson(
      Seq("p15_lake_delete" -> (1.98, 17.78, 8.96)), Map.empty, "/s", "/o")
    val re = ("\"p15_lake_delete\":\\{\"small_sec\":([0-9.]+)," +
      "\"big_sec\":([0-9.]+),\"ratio\":(-?[0-9.]+)").r
    val m = re.findFirstMatchIn(childLine)
    assert(m.isDefined, childLine)
    assert(m.get.group(1).toDouble === 1.98)
    assert(m.get.group(3).toDouble === 8.96)
  }
}
