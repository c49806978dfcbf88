package graft

import graft.pipeline.Posture

/** Per-plan reduce-parallelism posture (pipeline/Posture.scala): the rule
  * that replaced the global 256-initial-partition sweep knob. Pins the
  * classification of every head the round-10 posture finding measured —
  * the §2.3 ordered family must land on core-count parallelism (the tuned
  * numbers of bench_sf100_ordered_tuned.json), the wide fact shuffles must
  * keep the volume-scaled fan-out — plus the mixed-plan case (asof_join:
  * a group-bounded rollup exchange must not drag the raw window shuffle
  * onto the wide posture).
  */
class PostureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val cores = 4

  private def classify(name: String): Boolean =
    Posture.sortDominated(Posture.plannedWithExchanges(
      SparkEntry.queries(name)(spark, sf)))

  test("the tuned ordered family is sort-dominated -> core-count parallelism") {
    // config_sequence is deliberately absent: its ordered work runs at
    // plan-BUILD time (checkpointed sequence windows), so its result plan
    // is a group-bounded fold aggregate — the upstream jobs get the tuned
    // posture from the AMBIENT core-count default Bench resets per query.
    val tuned = Seq("ensure_cadence", "forward_sum", "asof_join",
      "forward_fill", "rolling_mean", "rolling_median",
      "rolling_slope", "rolling_stdev", "sessionize",
      "lag_periods", "lead_periods", "rolling_max", "rolling_min",
      "rolling_pstdev", "fill_mean", "collapse_last", "pipeline_chain")
    val misclassified = tuned.filterNot(classify)
    assert(misclassified.isEmpty,
      s"ordered heads classified wide (would re-pay the ~2x fan-out tax): $misclassified")
  }

  test("wide fact shuffles keep the volume-scaled posture") {
    val wide = Seq("q1_pricing", "q3_topk", "q5_region", "dedup_exact",
      "dedup_minhash", "dedup_cluster", "vocab_topk", "align_streams",
      "derived_stream", "bigram_logprob")
    val misclassified = wide.filter(classify)
    assert(misclassified.isEmpty,
      s"wide heads classified sort-only (would lose spill relief at scale): $misclassified")
  }

  test("initial partitions: cores for sort plans, volume-clamped for wide") {
    val sorted = SparkEntry.queries("rolling_median")(spark, sf)
    assert(Posture.initialShufflePartitions(sorted, cores) == cores)
    val wide = SparkEntry.queries("q1_pricing")(spark, sf)
    val parts = Posture.initialShufflePartitions(wide, cores)
    // tiny input -> the volume term is below cores and the clamp holds
    assert(parts == cores, s"at sf0.001 volume must clamp to cores, got $parts")
    // the volume term itself tracks bytes / 64MB up to the ceiling
    assert(Posture.scanBytes(wide) > 0)
  }
}
