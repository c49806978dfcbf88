package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Explain-audit snapshots for the six bench heads (q1/q3/q5/q6,
  * dedup_cluster, ann_lsh): the committed operator-tree skeleton under
  * src/test/resources/plans/ is the plan we signed off on, so any Catalyst
  * regression (a lost broadcast, a new shuffle, a filter that stops pushing)
  * fails `sbt test` instead of waiting for a human `.explain` read.
  *
  * Regenerate deliberately with GRAFT_UPDATE_PLANS=1 sbt test and review the
  * git diff like any other code change.
  *
  * Plan-shape invariants are asserted separately from the snapshot so a
  * failure names the broken property, not just a text diff.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val snapDir = Paths.get("src/test/resources/plans")
  private val update = sys.env.contains("GRAFT_UPDATE_PLANS")

  private def formattedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  /** The numbered operator tree at the top of the formatted explain, with
    * the (N) ordinals stripped — pure structure, no expression ids/paths.
    */
  private def skeleton(plan: String): String =
    plan.linesIterator
      .dropWhile(_.startsWith("=="))
      .takeWhile(_.trim.nonEmpty)
      .map(_.replaceAll("\\(\\d+\\)", "").replaceAll("\\s+$", ""))
      .mkString("\n") + "\n"

  private def checkSnapshot(name: String, plan: String): Unit = {
    val file = snapDir.resolve(s"$name.plan")
    val current = skeleton(plan)
    if (update || !Files.exists(file)) {
      Files.createDirectories(snapDir)
      Files.write(file, current.getBytes(StandardCharsets.UTF_8))
      info(s"wrote plan snapshot $file")
    } else {
      val committed = new String(Files.readAllBytes(file), StandardCharsets.UTF_8)
      assert(current == committed,
        s"""physical plan of $name drifted from the committed snapshot.
           |If the new plan is intentional, regenerate with GRAFT_UPDATE_PLANS=1.
           |--- committed ---
           |$committed
           |--- current ---
           |$current""".stripMargin)
    }
  }

  private def audit(name: String)(invariants: String => Unit): Unit =
    test(s"plan audit: $name") {
      val plan = formattedPlan(name)
      assert(!plan.contains("CartesianProduct"), s"cartesian product in $name:\n$plan")
      invariants(plan)
      checkSnapshot(name, plan)
    }

  audit("q1_pricing") { plan =>
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "q1 ship-date filter must reach the parquet scan")
    // column pruning: exactly the 7 referenced lineitem columns, nothing else
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"),
      "q1 scan must prune to the 7 referenced columns")
  }

  audit("q6_forecast") { plan =>
    Seq("GreaterThanOrEqual(l_shipdate,1996-01-01", "LessThan(l_shipdate,1997-01-01",
      "GreaterThanOrEqual(l_discount,0.03)", "LessThanOrEqual(l_discount,0.07)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(plan.contains(f), s"q6 filter $f must push to the scan")
    }
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp"),
      "q6 scan must prune to the 4 referenced columns")
  }

  audit("q3_topk") { plan =>
    assert(plan.contains("TakeOrderedAndProject"),
      "q3 orderBy+limit must plan as partial top-k, not a global sort")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      "q3 segment filter must push to the customer scan")
    assert(plan.contains("BroadcastHashJoin"),
      "q3 customer join must broadcast")
  }

  audit("q5_region") { plan =>
    assert("BroadcastHashJoin".r.findAllMatchIn(plan.linesIterator
      .takeWhile(_.trim.nonEmpty).mkString("\n")).size >= 2,
      "q5 nation and region joins must broadcast")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate,1995-01-01"),
      "q5 order-date filter must push to the orders scan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      "q5 region filter must push to the region scan")
  }

  audit("ann_lsh") { plan =>
    assert(plan.contains("BroadcastExchange"),
      "ann_lsh query side must broadcast into the bucket join")
    assert(plan.contains("WindowGroupLimit"),
      "ann_lsh per-query top-k must plan as WindowGroupLimit (partial rank pushdown)")
    assert(plan.contains("LessThan(vec_id,5)"),
      "ann_lsh query-set filter must push to the embeddings scan")
  }

  audit("dedup_cluster") { plan =>
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dedup_cluster must join on digest/label keys only")
  }

  audit("dedup_minhash") { plan =>
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "minhash candidates must come from the band-hash equi-join")
  }

  test("dedup_minhash signature pipeline stays inside whole-stage codegen") {
    // codegen spans only exist in the POST-EXECUTION final plan under AQE.
    // The registered ShingleJoin/MinhashSig expressions keep the signature
    // computation codegen'd — interpreted HOFs would not.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("dedup_minhash")(spark, sf)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan.toString
      case p => p.toString
    }
    assert(plan.contains("*("),
      s"no codegen span in:\n${plan.take(1500)}")
  }

  audit("curation_chunk") { plan =>
    // chunking is pure per-row codegen: any Exchange means the operator
    // stopped chunking at scan speed
    assert(!plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .exists(_.contains("Exchange")),
      "curation_chunk must be shuffle-free")
  }

  audit("config_dataset") { plan =>
    // train-fold scaler stats attach as a one-row broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      "config_dataset scaler stats must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "config_dataset has no large-side join at gate scale; SMJ means a lost broadcast")
  }

  audit("decontam_fuzzy") { plan =>
    // the benchmark side broadcasts into both the bucket join and the
    // shingle-verify join — the corpus is never shuffled against itself
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark buckets/shingles must attach as broadcast hash joins")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "fuzzy decontam candidates must come from the band-hash equi-join")
  }

  audit("dedup_semantic") { plan =>
    // SemDeDup: hyperplane-LSH buckets → exact cosine edges → connected
    // components. The CC labels enter the final plan through a checkpoint
    // boundary, and every join is an equi-join — candidates come from the
    // bucket keys, never an all-pairs nested loop.
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "semantic-dup candidates must come from the LSH bucket equi-join")
    // r16: under the bounded-edges gate the CC labels arrive as a driver
    // union-find's broadcast LocalTableScan (the bucket/edge subtree ran
    // once inside the gate's bounded take); above the ceiling they attach
    // through the checkpoint boundary as before
    assert(plan.contains("LocalTableScan") || plan.contains("Scan ExistingRDD"),
      "the CC label frame must attach as a gated local relation or " +
        "through its checkpoint boundary")
  }

  audit("curation_diversity") { plan =>
    // after the plan-build kmeans rounds (each one bounded aggregate job,
    // k×dim centroids through the driver), the FINAL plan is a single
    // map-side pass: cluster assignment is a pure expression over literal
    // centroids and the sha256-ratio gate is a row filter — zero Exchange.
    assert(!plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .exists(_.contains("Exchange")),
      "diversity sampling must assign + sample in one shuffle-free pass")
  }

  audit("config_corpus") { plan =>
    // the composed corpus journey: the curated frame is checkpointed once
    // (filter/dedup subtree computes once across the probe, signatures, CC
    // rounds and join-back), joins are digest/id equi-joins, and chunking
    // explodes via Generate at the top
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "corpus joins are digest/id equi-joins")
    assert(plan.contains("Scan ExistingRDD"),
      "the curated frame must enter through its checkpoint boundary")
    assert(plan.contains("Generate"),
      "chunking must plan as a Generate explode, not a join")
  }

  audit("bpe_encode") { plan =>
    // tokenizer application: the encode map is the training loop's final
    // checkpointed vocabulary (enters as ExistingRDD), the corpus collapses
    // to per-doc term frequencies map-side before the join, and candidates
    // attach by word equality — never a nested loop
    assert(plan.contains("Scan ExistingRDD"),
      "the encode map must enter through the training checkpoint boundary")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "term frequencies must partially aggregate before the encode-map join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the encode map attaches by word equi-join")
  }

  audit("ann_ivf_trained") { plan =>
    // trained centroids enter as codegen'd LITERAL structs — assignment and
    // probing must not plan any centroid join, and the rerank attaches the
    // Q×nprobe probe rows by broadcast cluster equi-join
    assert(!plan.contains("CartesianProduct"),
      "no cartesian product anywhere in the trained-IVF plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "probes attach by cluster equi-join, never a nested loop")
    assert(plan.contains("BroadcastHashJoin"),
      "the Q×nprobe probe side must broadcast into the rerank join")
  }

  audit("dedup_incremental_semantic") { plan =>
    // the union labeling reads the persisted index: members/edges parquet
    // scans, a bucket-bounded candidate graph (never all-pairs), and the
    // CC labels attach by equi-join
    assert(plan.contains("Scan parquet"),
      "clusters() must read the persisted generations, not recompute them")
    assert(!plan.contains("CartesianProduct"),
      "no all-pairs join in the incremental semantic labeling")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "membership and labels attach by equi-join")
  }

  audit("bpe_artifact") { plan =>
    // the artifact round trip encodes under HYDRATED merges: same plan
    // contract as bpe_encode (checkpointed encode map, tf partial
    // aggregation, word equi-join) — and no training aggregate may appear
    // on the encode side (the merge table comes from the JSON artifact)
    assert(plan.contains("Scan ExistingRDD"),
      "the encode map must enter through a checkpoint boundary")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "term frequencies must partially aggregate before the encode-map join")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the encode map attaches by word equi-join")
    assert(!plan.contains("TakeOrderedAndProject"),
      "no best-pair ranking may run on the encode side — merges are loaded")
  }

  audit("vocab_topk") { plan =>
    // global top-k = partial counts then TakeOrdered over the vocabulary —
    // never a single-partition global sort of all counts
    assert(plan.contains("TakeOrderedAndProject"),
      "vocab_topk must rank via TakeOrderedAndProject")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      "token counts must partially aggregate map-side")
  }

  audit("substring_dedup") { plan =>
    // segment blocks shuffle as 60-bit hashes: the frequency table and the
    // join back are keyed on the hash — equi-joins only, and the block
    // counts must partially aggregate before any exchange
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "segment frequency must attach by hash equi-join")
    assert(plan.contains("HashAggregate"),
      "block frequencies must partially aggregate map-side")
  }

  audit("dsir_select") { plan =>
    // the model fits at plan-build time (one fused fit pass, collected at
    // `buckets` rows — the kmeans-centroids discipline) and enters the
    // scoring plan as a LITERAL: the result plan is one per-row codegen'd
    // fold over the scan — no join, no shuffle, nothing corpus-sized moves
    assert(!plan.contains("Join"),
      "the hydrated model must be a plan literal, not a joined table")
    assert(!plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .exists(_.contains("Exchange")),
      "scoring under the literal model must be shuffle-free")
    assert(plan.contains("dsirfold"),
      "the per-doc mean must be the codegen'd DsirFold")
  }

  audit("domain_mix") { plan =>
    // the per-domain rate table is one row per source — broadcast onto the
    // corpus; the keep gate is a pure sha256-ratio row filter
    assert(plan.contains("BroadcastHashJoin"),
      "per-domain rates must broadcast onto the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "a sort-merge join here means the bounded rate table got shuffled")
  }

  audit("bigram_logprob") { plan =>
    // the head hydrates the train-if-missing LM artifact — the result plan
    // is the artifact scan, nothing recomputes (the fit's shape is audited
    // separately below, where the work actually happens)
    assert(plan.contains("Scan parquet"), "the head must read the artifact")
    assert(!plan.contains("Exchange"),
      "hydrating the per-doc artifact must not shuffle")
  }

  test("plan audit: bigram LM fit (the train-if-missing job)") {
    // the unigram table is vocabulary-bounded → broadcast; bigram counts
    // partial-aggregate and join keyed on the bigram string
    val docs = graft.sources.Tables.documents(spark, sf)
    val plan = graft.operators.BigramLm.scoreFrame(docs, "doc_id", "text")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "the unigram prefix table must broadcast")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bigram counts attach by bigram equi-join")
    checkSnapshot("bigram_lm_fit", plan)
  }

  audit("shard_manifest") { plan =>
    // one hash exchange on source feeds the running-token window, and the
    // manifest groupBy(source, shard_id) reuses that partitioning
    // (HashPartitioning(source) satisfies the clustered distribution) —
    // a second Exchange means the reuse broke
    val exchanges = plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(_.contains("Exchange"))
    assert(exchanges <= 1,
      s"shard manifest must shuffle once on source, saw $exchanges exchanges")
  }

  audit("ann_pq") { plan =>
    // the ks-row codebook attaches as a broadcast cross join (encoding and
    // the ADC lookup table both read it); the ADC join itself is a
    // (subspace, code) broadcast equi-join; per-(query, vector) distances
    // partial-aggregate before the shuffle
    assert(plan.contains("BroadcastHashJoin"),
      "the ADC lookup table must broadcast-join on (subspace, code)")
    assert(plan.contains("HashAggregate"),
      "ADC partial sums must aggregate map-side")
  }

  audit("ann_ivfpq") { plan =>
    // IVF-ADC: the coarse centroids are plan literals (argmin assignment
    // and probing are join-free), the centroid attach + ADC LUT join are
    // broadcast hash equi-joins, the ks-row residual codebook crosses in
    // as a bounded broadcast, and ADC sums partial-aggregate map-side
    assert(plan.contains("BroadcastHashJoin"),
      "centroid attach and the ADC LUT must broadcast-hash-join")
    assert(plan.contains("HashAggregate"),
      "encode argmins and ADC partial sums must aggregate map-side")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized shuffle join anywhere in the IVF-ADC path")
  }

  audit("config_corpus_order") { plan =>
    // filter → best-quality near-dup keep → shuffled sharding composed:
    // the curated frame enters through its checkpoint boundary, the
    // canonical set joins back by id (equi-join), and the epoch-order
    // windows ride the shard exchange
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "journey joins are digest/id equi-joins")
    assert(plan.contains("Scan ExistingRDD"),
      "the curated frame must enter through its checkpoint boundary")
    assert(plan.contains("Window"),
      "shard assignment + epoch order must plan as windows")
  }

  audit("dedup_keep_best") { plan =>
    // the quality score is evaluated in the scan projection and only
    // (id, cluster, score) enters the ranking window — document bodies
    // never shuffle: no text column in any Exchange's output
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, "clustering needs its hash exchanges")
    assert(plan.contains("Window"),
      "the per-cluster keep rank must plan as a window")
  }

  audit("shard_shuffle") { plan =>
    // one hash exchange on source feeds both the assignment and the
    // within-shard position windows; shard_key is a pure projection
    assert(plan.contains("Window"), "two-level order plans as windows")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "the epoch shuffle is join-free")
  }

  audit("sink_partitioned") { plan =>
    // the day filter must prune at the DIRECTORY level, not post-scan:
    // PartitionFilters carries the day predicate, and partition count at
    // the scan is 1
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      "the day predicate must prune partitions at the scan")
  }

  audit("sink_bucketed") { plan =>
    // the co-located-join technique: both facts are bucketed on the join
    // key, so the SortMergeJoin reads bucket-local scans with ZERO
    // join-side Exchange — the only Exchange in the plan is the final
    // aggregation's
    assert(plan.contains("SortMergeJoin"),
      "the bucketed fact join must plan as a SortMergeJoin")
    assert(!plan.contains("BroadcastExchange"),
      "the merge hint pins the 100 TB shape — no broadcast")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"bucketing must leave only the aggregation Exchange, found $exchanges:\n$plan")
  }

  audit("html_extract") { plan =>
    // extraction is a chain of codegen'd string expressions over the scan:
    // any Exchange means it stopped running at scan speed
    assert(!plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .exists(_.contains("Exchange")),
      "html_extract must be shuffle-free")
  }

  audit("quality_gopher") { plan =>
    // the five rule signals compute in one per-row pass — shuffle-free
    assert(!plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .exists(_.contains("Exchange")),
      "quality_gopher must be shuffle-free")
  }

  audit("url_dedup") { plan =>
    // exactly one exchange: the url_norm hash partitioning that feeds the
    // min-id window; a second one means normalization stopped being
    // per-row or the window re-partitioned
    val exchanges = plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"url_dedup must shuffle once on url_norm, saw $exchanges exchanges")
    assert(plan.contains("Window"), "canonical id must come from a window")
  }

  audit("config_corpus_crawl") { plan =>
    // extract + gopher fold into the scan side; the line-frequency side
    // broadcasts back; no cartesian, no BNLJ anywhere in the journey
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the crawl journey must stay equi-join only")
  }

  audit("decontam_bloom") { plan =>
    // the benchmark bitmap folded into the plan as a literal at build time:
    // the corpus probe must be a pure per-row expression over the scan —
    // any Exchange or Join means the zero-shuffle contract broke
    val ops = plan.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!ops.exists(_.contains("Exchange")),
      "decontam_bloom corpus probe must be shuffle-free")
    assert(!ops.exists(_.contains("Join")),
      "decontam_bloom must not join — the bitmap is a plan literal")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string"),
      "decontam_bloom scan must prune to (doc_id, text)")
  }

  audit("quality_classifier") { plan =>
    // training ran at plan-build time on the bounded sample (fitSampled);
    // the served plan scores the FULL corpus by streaming the feature
    // relation straight off the parquet scan — materializing full-corpus
    // features for a single aggregate pass would be the 100 TB bug
    assert(plan.contains("Scan parquet"),
      "scoring must stream features off the corpus scan")
    assert(!plan.contains("Scan ExistingRDD"),
      "the full-corpus feature relation must not materialize for serving")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "label join must stay an equi-join")
    assert(plan.contains("HashAggregate"),
      "per-doc scores must partial-aggregate map-side")
  }

  audit("config_corpus_classify") { plan =>
    // training ran at plan-build time over the curated checkpoint; the
    // served journey is per-row scoring + the prob gate — any Exchange or
    // Join means the zero-shuffle serving contract broke
    val ops = plan.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!ops.exists(_.contains("Exchange")),
      "the classify journey must serve shuffle-free")
    assert(!ops.exists(_.contains("Join")),
      "no join — the weight vector is a plan literal")
    assert(plan.contains("Scan ExistingRDD"),
      "scoring must run over the checkpointed curated frame")
  }

  audit("config_corpus_decontam") { plan =>
    // the whole journey — quality gate + benchmark-bitmap probe — is one
    // per-row pass over the parquet scan: no Exchange, no Join anywhere
    val ops = plan.linesIterator.takeWhile(_.trim.nonEmpty).toSeq
    assert(!ops.exists(_.contains("Exchange")),
      "the Bloom decontamination journey must be shuffle-free")
    assert(!ops.exists(_.contains("Join")),
      "no join — the benchmark bitmap is a plan literal")
    assert(plan.contains("Scan parquet"),
      "the gate must fold into the corpus scan")
  }

  audit("config_corpus_full") { plan =>
    // six stages, one plan: the gate/dedup/decontam/classify prefix is
    // per-row over the curated checkpoint (training + bitmap ran at plan
    // build), the mix rate table joins back broadcast, the shard window
    // partitions once by source
    assert(plan.contains("Window"),
      "shard assignment must come from a per-source window")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "the domain rate table must broadcast back, not shuffle the corpus")
  }

  audit("perplexity_bucket") { plan =>
    // scoring checkpointed at plan build; the tertile walk is DISTRIBUTED
    // (no range-dependent driver collect): shuffles touch only the
    // grid-bounded level table (level groupBy + the single-partition
    // cumsum window), and the 2-value threshold row broadcasts back onto
    // the corpus as a one-row BNLJ
    val n = shuffleExchanges(plan)
    assert(n <= 3,
      s"tertile walk must bound its shuffles to the level frame, got $n")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "thresholds must attach as a one-row broadcast")
    assert(plan.contains("scores.parquet"),
      "assignment must run over the hydrated LM artifact, not a re-fit")
  }

  audit("line_dedup") { plan =>
    // the frequency side aggregates line hashes (partial aggregate before
    // its exchange), the boilerplate set joins back, and one doc-keyed
    // exchange rebuilds bodies — no cartesian, no BNLJ
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "boilerplate join must stay an equi-join")
    assert(plan.contains("HashAggregate"),
      "line-hash frequencies must partial-aggregate map-side")
  }

  /** Shuffle exchanges only — BroadcastExchange is the cheap kind and must
    * not count against a "no shuffle" contract.
    */
  private def shuffleExchanges(plan: String): Int =
    plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))

  audit("classifier_calibration") { plan =>
    // the GD rounds ran at plan-build time over the checkpointed feature
    // frame; the served sweep is one two-phase aggregate into the
    // grid-bounded calibration histogram
    assert(plan.contains("Scan ExistingRDD"),
      "calibration must score the checkpointed feature frame, not retrain")
    assert(!plan.contains("Join"), "no join — weights are plan literals")
    assert(shuffleExchanges(plan) == 1,
      s"calibration must aggregate in one shuffle, saw ${shuffleExchanges(plan)}")
  }

  audit("ann_recall") { plan =>
    // the truth side is the bounded TopK aggregator (partial map-side, one
    // Q-by-k-row exchange) over the broadcast-query brute-force scan; the
    // recall join itself is metadata-scale (one row per planted query)
    assert(plan.contains("ObjectHashAggregate"),
      "exact truth must come from the bounded TopK aggregator")
    assert(plan.contains("BroadcastExchange"),
      "the planted query side must broadcast against the corpus")
  }

  audit("tokenizer_fertility") { plan =>
    // tf-compression aggregate before any join (distinct words, not rows,
    // meet the merge table); the merge table and source dim both broadcast
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "fertility joins must all broadcast — the corpus never co-shuffles")
    assert(plan.contains("Scan ExistingRDD"),
      "the trained merge table must enter as the checkpointed artifact")
    assert(plan.contains("BroadcastHashJoin"),
      "merge-table and source-dim joins must be broadcast equi-joins")
  }

  audit("quality_threshold_sweep") { plan =>
    // one pass over the corpus: the per-doc quality histogram partial-
    // aggregates map-side, and the 20-threshold grid explodes from the
    // AGGREGATED frame (grid x buckets), never from the corpus rows
    assert(shuffleExchanges(plan) == 1,
      s"the sweep must read the corpus once, saw ${shuffleExchanges(plan)} shuffles")
    val ops = plan.linesIterator.takeWhile(_.trim.nonEmpty).toVector
    val gen = ops.indexWhere(_.contains("Generate"))
    val agg = ops.indexWhere(_.contains("HashAggregate"))
    assert(gen >= 0 && agg > gen,
      "the threshold grid must explode above the aggregate, not per corpus row")
  }

  audit("corpus_stats") { plan =>
    // the report card is two stacked two-phase aggregates (doc level, then
    // (source, lang) level) over a single pruned corpus scan — no joins
    assert(!plan.contains("Join"), "corpus_stats must not join")
    assert(shuffleExchanges(plan) <= 2,
      s"two aggregate levels means at most two shuffles, saw ${shuffleExchanges(plan)}")
    assert(plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(_.contains("Scan parquet")) == 1,
      "one corpus scan only")
  }

  audit("config_corpus_diff") { plan =>
    // the incremental-crawl gate: the prior run's digest set broadcasts
    // back against the new crawl — the crawl side itself never shuffles
    assert(plan.contains("BroadcastHashJoin"),
      "the digest anti-join must broadcast the prior-run side")
    assert(shuffleExchanges(plan) == 0,
      s"the crawl side must not shuffle, saw ${shuffleExchanges(plan)} exchanges")
  }

  audit("link_graph") { plan =>
    // link resolution is an id-keyed hash join; host-pair weights partial-
    // aggregate before their exchange so the shuffled frame is host-graph-
    // sized, not page-sized
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "link resolution must be an equi-join on the target id")
    assert(plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(_.contains("HashAggregate")) >= 2,
      "host-pair weights must partial-aggregate map-side")
  }

  audit("pagerank_hosts") { plan =>
    // the returned frame is the LAST iteration (earlier rounds are behind
    // checkpoints — constant plan depth): one edge-rank equi-join, one
    // partial-aggregated destination groupBy, one rank re-attach
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "pagerank rounds must join on the host key")
    assert(shuffleExchanges(plan) <= 4,
      s"one round = bounded exchanges, saw ${shuffleExchanges(plan)}")
  }

  audit("curation_quota") { plan =>
    // exact quotas through the bounded map-side TopK aggregator: partial
    // top-k runs before the shuffle (only strata x k rows move), and no
    // Window rank funnels whole strata through single partitions
    assert(plan.linesIterator.takeWhile(_.trim.nonEmpty)
      .count(_.contains("ObjectHashAggregate")) >= 2,
      "quota sampling must partial-aggregate its top-k map-side")
    assert(!plan.contains("Window"),
      "quota sampling must not plan a window rank")
  }

  audit("split_leakage") { plan =>
    // at gate scale the corpus is mostly distinct, so the audit pins the
    // DIRECT path: candidate pairs come from the band-bucket equi-join,
    // folds attach by id — no nested-loop anywhere
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "leakage pairs must come from band-bucket equi-joins")
  }

  audit("sft_pack") { plan =>
    // pure per-row template rendering: scan → filter → projects, nothing
    // else — zero shuffles, no join, at any corpus size
    assert(shuffleExchanges(plan) == 0,
      s"sft_pack must not shuffle, saw ${shuffleExchanges(plan)}")
    assert(!plan.contains("Join"), "sft_pack must not join")
  }

  audit("curation_funnel") { plan =>
    // three per-row gate scores fold into ONE source-keyed partial
    // aggregate; the scan prunes to the two referenced columns
    assert(shuffleExchanges(plan) == 1,
      s"funnel must aggregate in one shuffle, saw ${shuffleExchanges(plan)}")
    assert(plan.contains("partial_count"),
      "funnel counts must partial-aggregate map-side")
    assert(plan.contains("ReadSchema: struct<text:string,source:string>"),
      "funnel scan must prune to (text, source)")
  }

  audit("cluster_silhouette") { plan =>
    // centroids are codegen'd literals (no join); the per-cluster report
    // is one partial-aggregated exchange of k rows
    assert(!plan.contains("Join"), "silhouette must not join — centroids are literals")
    assert(shuffleExchanges(plan) == 1,
      s"silhouette must aggregate in one shuffle, saw ${shuffleExchanges(plan)}")
  }

  audit("hard_negatives") { plan =>
    // the id-capped query slice broadcasts against the corpus scan; the
    // argmax partial-aggregates map-side so only Q rows reach the exchange
    assert(plan.contains("BroadcastNestedLoopJoin Cross BuildRight"),
      "the bounded query side must broadcast")
    assert(shuffleExchanges(plan) == 1,
      s"only the Q-row argmax may shuffle, saw ${shuffleExchanges(plan)}")
    assert(plan.contains("partial_max") || plan.contains("SortAggregate"),
      "the struct argmax must partial-aggregate before the exchange")
  }

  audit("pack_efficiency") { plan =>
    // the per-source report REUSES the window's hashpartitioning(source):
    // one exchange total, aggregate exchange-free on top of the window
    assert(plan.contains("Window"), "pack stats read the cumsum window")
    assert(shuffleExchanges(plan) == 1,
      s"the source aggregate must reuse the window partitioning, saw ${shuffleExchanges(plan)}")
  }

  audit("budget_sample") { plan =>
    // histogram (docs → strata×bucket rows) → bounded window → cutoff,
    // then the strata-row cutoff frame BROADCASTS back onto the scan —
    // the corpus itself never shuffles
    assert(plan.contains("BroadcastHashJoin LeftOuter"),
      "the cutoff frame must broadcast back, never co-shuffle the corpus")
    assert(plan.contains("Window"), "the cutoff cumsum runs over the bucket histogram")
    assert(shuffleExchanges(plan) <= 3,
      s"histogram+window+cutoff are the only exchanges, saw ${shuffleExchanges(plan)}")
  }

  audit("hits_authority") { plan =>
    // the returned frame is EITHER the bounded-graph driver result (r16:
    // a broadcast LocalTableScan — all rounds ran on the driver) or, above
    // the graft.graph.driver_max_edges ceiling, the final auth⨝hub
    // re-attach of two checkpointed frames (constant plan depth)
    assert(plan.contains("LocalTableScan") || plan.contains("Scan ExistingRDD"),
      "HITS must be a driver-gated local relation or checkpointed rounds")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the final re-attach joins on the host key")
    assert(shuffleExchanges(plan) <= 2,
      s"final join = bounded exchanges, saw ${shuffleExchanges(plan)}")
  }

  audit("heldout_nll") { plan =>
    // the vocab-bounded freq table broadcasts onto the test-fold token
    // stream; one lang-keyed exact-decimal aggregate leaves the join
    assert(plan.contains("BroadcastHashJoin LeftOuter"),
      "the unigram freq table must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus token stream must never co-shuffle with the vocab")
    assert(shuffleExchanges(plan) <= 2,
      s"freq build + lang aggregate only, saw ${shuffleExchanges(plan)}")
  }

  audit("quality_length_corr") { plan =>
    // six moment sums in ONE source-keyed partial aggregate, no join
    assert(!plan.contains("Join"), "the moment pass must not join")
    assert(shuffleExchanges(plan) == 1,
      s"one aggregate shuffle only, saw ${shuffleExchanges(plan)}")
    assert(plan.contains("partial_count"),
      "moments must partial-aggregate map-side")
  }

  audit("gate_agreement") { plan =>
    // both verdicts per-row in one scan; the confusion is one global
    // aggregate — a single row crosses the one exchange
    assert(!plan.contains("Join"), "verdicts must compute in one scan")
    assert(shuffleExchanges(plan) == 1,
      s"one confusion aggregate only, saw ${shuffleExchanges(plan)}")
  }

  audit("shard_balance") { plan =>
    // the balance aggregate rides the manifest's source partitioning —
    // window + two aggregate levels, bounded exchanges, no join
    assert(plan.contains("Window"), "shard ids come from the cumsum window")
    assert(!plan.contains("Join"), "the report must not join")
    assert(shuffleExchanges(plan) <= 2,
      s"window + manifest aggregate only, saw ${shuffleExchanges(plan)}")
  }

  audit("multimodal_video_dedup") { plan =>
    // the y4m parse runs per partition; only 8-byte fingerprints meet the
    // copy-count aggregate and the join-back
    assert(plan.contains("MapPartitions"),
      "the container parse is the per-partition decode pass")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "the copy-count join is an equi-join on the fingerprint")
    assert(shuffleExchanges(plan) <= 3,
      s"fingerprint agg + join-back only, saw ${shuffleExchanges(plan)}")
  }

  audit("config_corpus_budget") { plan =>
    // the budget step's cutoff frame broadcasts back onto the curated
    // frame — the corpus itself never co-shuffles for the gate
    assert(plan.contains("BroadcastHashJoin LeftOuter"),
      "the cutoff frame must broadcast back")
    assert(plan.contains("Window"),
      "the cutoff cumsum runs over the bucket histogram")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus never co-shuffles in the budget gate")
  }

  audit("data_contract") { plan =>
    // every rule folds into one aggregate pass; the exact-distinct
    // uniqueness term is the only reason a second exchange may appear
    assert(!plan.contains("Join"), "the contract must not join")
    assert(shuffleExchanges(plan) <= 2,
      s"one aggregate (+ distinct expand) only, saw ${shuffleExchanges(plan)}")
  }

  audit("corpus_drift") { plan =>
    // histogram + spine join + one-row totals broadcast; the corpus
    // contributes exactly one scan
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the totals row must broadcast into the report")
    assert(shuffleExchanges(plan) <= 4,
      s"histogram + report only, saw ${shuffleExchanges(plan)}")
  }

  audit("bm25_topk") { plan =>
    // percolator-shaped retrieval: the fitted scorer folds per row, the
    // top-k cut is the bounded typed aggregator, and the only join is the
    // 100-row rank table broadcast back for n_terms — no postings
    // aggregate, no rank window, no corpus-sized co-shuffle
    assert(plan.contains("bm25scores("),
      "scoring must run through the fitted Bm25Scores fold")
    assert(plan.contains("BroadcastHashJoin"),
      "the bounded top-k rank table must broadcast back")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized co-shuffle in the retrieval join")
    assert(!plan.contains("Window"),
      "the top-k cut is the bounded aggregator, not a rank window")
  }

  audit("quality_rrf") { plan =>
    // both rank tables are grid-bounded levels broadcast back; the corpus
    // itself never globally sorts
    assert(plan.contains("BroadcastHashJoin"),
      "the rank level tables must broadcast back onto the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus must not co-shuffle for the ranks")
  }

  audit("mixture_weights") { plan =>
    // one source-keyed corpus aggregate; the waterfill rounds live on the
    // |sources|-bounded frame with one-row scalar aggregates broadcast back
    assert(plan.contains("HashAggregate"),
      "the per-source token aggregate must partial-aggregate")
    assert(!plan.contains("SortMergeJoin"),
      "scalar stats attach by broadcast, never a co-shuffle")
    assert(!plan.contains("Window"), "no rank funnel in the waterfill")
  }

  audit("winnow_fingerprint") { plan =>
    // per-row codegen'd fingerprinting; the constant-size reference set
    // broadcasts; the only shuffles are the per-doc overlap aggregate and
    // its id-keyed join-back
    assert(plan.contains("BroadcastHashJoin"),
      "the reference fingerprint set must broadcast")
    assert(shuffleExchanges(plan) <= 4,
      s"overlap aggregate + join-back only, saw ${shuffleExchanges(plan)}")
  }

  audit("entropy_gate") { plan =>
    // row-local EntropyStats fold: a doc's entropy needs only its own
    // tokens — scan → fold → project, ZERO shuffles at every scale (the
    // relational twin with its two exchanges is spec-pinned in MiningSpec)
    assert(plan.contains("entropy_stats("),
      "the gate must run through the EntropyStats fold")
    assert(!plan.contains("Join"), "the entropy fold must not join")
    assert(!plan.contains("Window") && !plan.contains("HashAggregate"),
      "row-local fold: no window, no aggregate")
    assert(shuffleExchanges(plan) == 0,
      s"zero-shuffle plan, saw ${shuffleExchanges(plan)}")
  }

  audit("sample_weighted") { plan =>
    // scan → keyed projection → global top-k as TakeOrdered (per-partition
    // heaps, driver merge bounded by k) — no join, no full sort
    assert(plan.contains("TakeOrderedAndProject"),
      "the weighted cut must be TakeOrdered, not a global sort")
    assert(!plan.contains("Join"), "sampling keys compute in one scan")
  }

  audit("cooccurrence_ppmi") { plan =>
    // pair counts partial-aggregate; unigram and totals frames broadcast;
    // the final cut is TakeOrdered
    assert(plan.contains("BroadcastHashJoin"),
      "the unigram table must broadcast onto the pair counts")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized co-shuffle in the PMI join")
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-k cut must be TakeOrdered")
  }

  audit("approx_distinct") { plan =>
    // the exact and sketch terms are SEPARATE aggregates joined
    // group-keyed: fused, Spark keys the first aggregate by (group,
    // target) and carries the HLL's ~53-long register buffer through
    // every distinct pair row — the r14 board's only superlinear ratio
    // (sf100: fused 23.1 s vs split ~6.5 s). merge_approx_count_distinct
    // exists only in that fused 3-level rewrite.
    assert(!plan.contains("merge_approx_count_distinct"),
      "the HLL buffer must not ride the exact term's pair rows")
    assert(plan.contains("BroadcastHashJoin"),
      "the split terms join group-keyed (group-count bounded broadcast)")
  }

  audit("unigram_artifact") { plan =>
    // the hydrated model segments DISTINCT words through the fitted
    // UnigramSeg fold (no per-document re-segmentation); documents collapse
    // to term frequencies before joining the vocabulary-sized piece map
    assert(plan.contains("unigramseg("),
      "encode must run through the fitted UnigramSeg fold")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "bounded equi-joins only")
    assert(shuffleExchanges(plan) <= 4,
      s"word-freq agg + tf agg + join/agg only, saw ${shuffleExchanges(plan)}")
  }

  audit("sink_compacted") { plan =>
    // the returned frame is the governance PROOF: one scan of the governed
    // layout, a per-file aggregate, one global roll-up — no join, no sort
    assert(!plan.contains("Join") && !plan.contains("Sort"),
      "the compaction proof is a two-level aggregate over the re-read")
    assert(plan.contains("input_file_name"),
      "the proof must group by the physical file")
  }

  audit("percolate_route") { plan =>
    // fitted-fold percolation: the metadata-scale weight table embeds in
    // the codegen'd PercolateScores fold — the scoring plan is scan →
    // fold → explode, no join, no aggregation, no shuffle at all
    assert(plan.contains("percolatescores("),
      "scoring must run through the fitted PercolateScores fold")
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      "the fold plan needs no scoring join")
    assert(!plan.contains("Exchange"), "zero-shuffle per-row alert gate")
    assert(!plan.contains("Window"), "no rank funnel in the alert gate")
  }

  audit("containment_dedup") { plan =>
    // band-bucket candidates then exact verify — never all-pairs
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "candidates come from the band buckets, not a cross join")
    assert(!plan.contains("Window"), "no rank funnel in the verify")
  }

  audit("heavy_hitters") { plan =>
    // the h×w sketch and the candidate set broadcast; the exact verify is
    // the only remaining aggregate over corpus rows (semi-join-restricted)
    assert(plan.contains("BroadcastHashJoin"),
      "sketch cells and candidates must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "nothing corpus-sized co-shuffles")
    assert(!plan.contains("Window"), "no rank funnel in the report")
  }

  audit("span_corrupt") { plan =>
    // the example builder is ONE per-row pass: no join, no shuffle, no
    // aggregate — every corruption decision is block-local by construction
    assert(!plan.contains("Exchange"), "zero-shuffle per-row builder")
    assert(!plan.contains("Join"), "no join in the builder")
    assert(!plan.contains("Window"), "no sequential scan state")
  }

  audit("ngram_diversity") { plan =>
    // exact two-level distinct: (source, gram) partial-aggregates map-side
    assert(plan.contains("HashAggregate"),
      "the gram aggregate must partial-aggregate")
    assert(!plan.contains("Join"), "no join in the diversity metric")
    assert(!plan.contains("Window"), "no rank funnel")
  }

  audit("text_tiling") { plan =>
    // pure per-row segmentation: no join, no shuffle, no scan state
    assert(!plan.contains("Exchange"), "zero-shuffle per-row segmentation")
    assert(!plan.contains("Join"), "no join in the tiler")
    assert(!plan.contains("Window"), "no sequential scan state")
  }

  audit("zipf_fit") { plan =>
    // one vocabulary-bounded aggregate; ranks come from the grid-bounded
    // LEVEL table (strictly-better cumsum + chunked explode), so the only
    // Window frame is the level table — never a token total order
    assert(plan.contains("HashAggregate"),
      "the vocabulary count must partial-aggregate")
    assert(!plan.contains("Join"), "no join anywhere in the fit")
    assert(plan.contains("Window"), "the level cumsum is the rank base")
    assert(!plan.contains("row_number"),
      "no per-token rank assignment — the fit's sums are tie-invariant")
  }

  audit("curation_skyline") { plan =>
    // the front computes on the grid-bounded quality-level table and
    // broadcasts back; the corpus itself never sorts
    assert(plan.contains("BroadcastHashJoin"),
      "the front levels must broadcast back onto the corpus")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus must not co-shuffle for the skyline")
    assert(plan.contains("Window"),
      "the running level max is the skyline recurrence")
  }

  audit("multimodal_pair_align") { plan =>
    // two id-keyed equi-joins, no broadcast-nested-loop, no window
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "pair lookup is an equi-join on the id maps")
    assert(!plan.contains("Window"), "pure per-pair scoring")
  }

  audit("community_labelprop") { plan =>
    // the returned frame is the LAST round (earlier rounds are behind
    // checkpoints — constant plan depth, the pagerank_hosts discipline)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "label votes must join on the host key")
    assert(shuffleExchanges(plan) <= 4,
      s"one round = bounded exchanges, saw ${shuffleExchanges(plan)}")
  }

  test("whole-stage codegen: the per-row heads run as ONE fused span") {
    // The brief's "widen the WholeStageCodegen spans" check, made a gate:
    // each pure per-row head (scan → expressions → output, no shuffle)
    // must compile into a single fused codegen stage — an interpreted
    // expression or a codegen fallback would split or drop the span.
    val sf = "/root/testdata/sf0.001"
    val perRow = Seq("html_extract", "pii_scrub", "text_normalize",
      "corpus_filter", "quality_gopher", "quality_score", "token_count",
      "repetition_ratio", "lang_id", "curation_chunk", "doc_fingerprint")
    val bad = perRow.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
      // SimpleMode marks codegen'd operators with "*(id)"; one span id
      // means the whole plan fused
      val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet
      if (spans.size == 1) None
      else Some(s"$name: ${spans.size} codegen spans\n$plan")
    }
    assert(bad.isEmpty, s"per-row heads with split/missing codegen:\n${bad.mkString("\n")}")
  }
}
