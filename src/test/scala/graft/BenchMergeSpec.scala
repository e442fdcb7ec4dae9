package graft

import graft.tools.BenchMerge
import org.scalatest.funsuite.AnyFunSuite

/** The scale tools co-own one JSON artifact; a tool's re-run must
  * replace ONLY its own sections. The old truncate-at-marker merge
  * deleted every section another tool had appended after the marker
  * (a ScaleDml re-run ate ScalePrune's partition_prune evidence).
  */
class BenchMergeSpec extends AnyFunSuite {

  private val file =
    """{"metric":"x","factor":10,"queries":{"q1":{"t":1.5,"note":"a {brace} in prose"}},""" +
      """"dml_queries":{"queries":{"m1":2.0}},"dml_touched_partition":{"n":7},""" +
      """"partition_prune":{"n_dirs":20000,"criteria":"text with } brace"}}"""

  test("dropSection removes only the named member, string-aware") {
    val out = BenchMerge.dropSection(file, "dml_queries")
    assert(!out.contains("\"dml_queries\""))
    assert(out.contains("\"partition_prune\"") && out.contains("\"dml_touched_partition\""))
    assert(out.contains("a {brace} in prose") && out.contains("text with } brace"))
    assert(BenchMerge.dropSection(file, "absent") == file)
  }

  test("replaceSections keeps every other tool's sections intact") {
    // ScaleDml re-run: replaces its two sections, must keep partition_prune
    val afterDml = BenchMerge.replaceSections(file, Seq(
      "dml_queries" -> """{"queries":{"m1":9.9}}""",
      "dml_touched_partition" -> """{"n":8}"""))
    assert(afterDml.contains(""""partition_prune":{"n_dirs":20000"""))
    assert(afterDml.contains(""""m1":9.9""") && !afterDml.contains(""""m1":2.0"""))
    assert(afterDml.contains(""""n":8""") && afterDml.contains(""""metric":"x""""))
    // ScalePrune re-run on the result: replaces only its section
    val afterPrune = BenchMerge.replaceSections(afterDml,
      Seq("partition_prune" -> """{"n_dirs":30000}"""))
    assert(afterPrune.contains(""""n_dirs":30000""") && !afterPrune.contains("20000"))
    assert(afterPrune.contains(""""m1":9.9""") && afterPrune.contains(""""queries":{"q1""""))
    // idempotent shape: still one object, trailing newline, no ",}"
    assert(afterPrune.trim.startsWith("{") && afterPrune.trim.endsWith("}"))
    assert(!afterPrune.contains(",}") && !afterPrune.contains("{,"))
  }

  test("base-writer merge: replacing base sections preserves appended tool sections") {
    val rebased = BenchMerge.replaceSections(file, Seq(
      "metric" -> "\"scale_ratio_10x\"", "factor" -> "11",
      "queries" -> """{"q2":{"t":0.5}}"""))
    assert(rebased.contains(""""factor":11""") && rebased.contains(""""q2""""))
    assert(!rebased.contains(""""q1"""") && rebased.contains(""""dml_queries""""))
    assert(rebased.contains(""""partition_prune""""))
  }

  test("scalar and string members drop cleanly at either end") {
    val first = BenchMerge.dropSection(file, "metric")
    assert(first.startsWith("""{"factor":10"""))
    val last = BenchMerge.dropSection(file, "partition_prune")
    assert(last.trim.endsWith("""{"n":7}}"""))
  }
}
