package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench's BASELINE.md floor parser: the outlier re-run pass keys off this
  * table, so it must read exactly the per-query floor section and nothing
  * from the sf1 scaling tables below it.
  */
class BenchFloorsSpec extends AnyFunSuite {

  test("parses both name/seconds pairs per row, floor section only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_floors")
    val md = dir.resolve("BASELINE.md")
    java.nio.file.Files.writeString(md,
      """# BASELINE
        |
        |## Per-query floor (seconds, sf0.1)
        |
        || query | r6 sec | query | r6 sec |
        ||---|---|---|---|
        || q1_pricing | 0.188 | q3_topk | 0.571 |
        || floor_time | 0.099 |  |  |
        |## sf1 scale point
        |
        || query | sf0.1 sec | sf1 sec | scaling (10x data) |
        ||---|---|---|---|
        || q5_region | 0.810 | 1.521 | 1.88x |
        |""".stripMargin)
    val floors = Bench.baselineFloors(md)
    assert(floors == Map(
      "q1_pricing" -> 0.188, "q3_topk" -> 0.571, "floor_time" -> 0.099))
  }

  test("the outlier pass arms only at the exact sf0.1 terminal dir") {
    assert(Bench.isFloorScale("/root/testdata/sf0.1"))
    assert(Bench.isFloorScale("sf0.1"))
    assert(!Bench.isFloorScale("/root/testdata/sf0.15"))
    assert(!Bench.isFloorScale("/data/sf0.1_backup"))
    assert(!Bench.isFloorScale("/data/sf0.1/subset"))
    assert(!Bench.isFloorScale("data/sf1"))
  }

  test("missing file or section yields an empty map") {
    assert(Bench.baselineFloors(
      java.nio.file.Paths.get("/nonexistent/BASELINE.md")).isEmpty)
  }

  test("the real BASELINE.md parses into a full floor table") {
    val floors = Bench.baselineFloors()
    assert(floors.size >= 100, s"expected ~101 floors, got ${floors.size}")
    assert(floors.get("q1_pricing").exists(_ > 0))
    assert(!floors.contains("query") && !floors.contains("---"))
    // nothing leaked from the sf1 tables: every value is a plausible
    // per-query floor, and the sf1-only 10.330 stream_attach point is absent
    assert(floors("stream_attach") < 5.0)
  }
}
