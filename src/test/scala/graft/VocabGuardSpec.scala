package graft

import org.apache.spark.sql.functions._

import graft.pipeline.VocabGuard

/** The vocabulary-broadcast guardrail (r13 verdict ask #1): a
  * distinct-token frame is only FORCED to broadcast while the corpus-scan
  * estimate sits under the guard's ceiling; a pathological (planted)
  * posture drops the hint and the plan falls back to a shuffled join —
  * with identical results, so every gated hash is unchanged by
  * construction.
  */
class VocabGuardSpec extends SparkSpec {

  private def mkDocs() = {
    import spark.implicits._
    (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} common"))
      .toDF("doc_id", "text")
  }

  /** unigram-frequency join through the guard — the shape all four gated
    * sites share (BigramLm.unigram, tfidf.df, unigram_logprob.freq,
    * heldout_nll.freq).
    */
  private def guardedJoin(docs: org.apache.spark.sql.DataFrame) = {
    val toks = docs.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    toks.join(VocabGuard.hint(freq, docs, "spec.freq"), Seq("tok"))
      .groupBy(col("doc_id")).agg(sum(col("cnt")).as("s"))
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("under the ceiling the broadcast hint is forced") {
    // disable the planner's own size-based broadcast so the ONLY way a
    // BroadcastExchange appears is the guard's forced hint
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = guardedJoin(mkDocs()).queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected a forced broadcast under the default ceiling:\n$plan")
    }
  }

  test("a pathological corpus posture drops the hint — shuffled join") {
    withConf(VocabGuard.ConfKey -> "1",
             "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = guardedJoin(mkDocs()).queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"guard must drop the hint over the ceiling:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fallback must be a shuffled join:\n$plan")
    }
  }

  test("an RDD-backed corpus (no honest estimate) keeps the hint") {
    // a frame built straight over an RDD has no origin stats — Catalyst
    // substitutes spark.sql.defaultSizeInBytes = Long.MaxValue. That is
    // "unknown", not "huge": even a planted 1-byte ceiling must NOT drop
    // the hint there (r14 advice). NOTE localCheckpoint is NOT such a
    // case on Spark 4: its LogicalRDD preserves the origin plan's stats
    // (probed: lazy AND eager both report the LocalRelation's 1440 B).
    withConf(VocabGuard.ConfKey -> "1",
             "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      val rdd = spark.sparkContext.parallelize(
        (1L to 40L).map(i => Row(i, s"tok${i % 7} tok${i % 5} common")))
      val docs = spark.createDataFrame(rdd, schema)
      assert(docs.queryExecution.optimizedPlan.stats.sizeInBytes ==
        BigInt(Long.MaxValue))
      val plan = guardedJoin(docs).queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"unknown estimate must keep the forced broadcast:\n$plan")
    }
  }

  test("fallback results are identical to the broadcast path") {
    val hinted = guardedJoin(mkDocs()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    withConf(VocabGuard.ConfKey -> "1") {
      val fallback = guardedJoin(mkDocs()).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fallback == hinted)
    }
  }

  test("the gated heads stay broadcast-planned at gate scale") {
    // the guard must not change today's plans: BigramLm's unigram join
    // still carries the forced hint on a small corpus
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = graft.operators.BigramLm
        .scoreFrame(mkDocs(), "doc_id", "text")
        .queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"bigram unigram join must stay broadcast at gate scale:\n$plan")
    }
  }
}
