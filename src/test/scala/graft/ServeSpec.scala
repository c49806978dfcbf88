package graft

import org.apache.spark.sql.functions._

import graft.operators.{Crawl, Dedup, Sharding, Similarity}

/** Round-9 serving/reporting operators: quality-aware dedup keep, the
  * deterministic training-order shuffle, crawl-generation diff, and the
  * composed IVF+PQ ANN.
  */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  // --- Dedup.keepBest -----------------------------------------------------

  private val dupDocs = Seq(
    // a near-dup cluster: same text, one copy longer/higher quality
    (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    // an unrelated singleton
    (3L, "completely different text about distributed query engines")
  ).toDF("doc_id", "text")

  test("keepBest keeps exactly one doc per cluster, by (score desc, id asc)") {
    // score by doc length: doc 1 is the longer near-dup → it wins even
    // though doc 2... wait, doc 1 already has the min id; invert the score
    // so doc 2 wins and the min-id convention would have picked doc 1.
    val out = Dedup.keepBest(dupDocs, "text", "doc_id",
        -length(col("text")).cast("double"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(4)))).toMap
    assert(out(1L)._1 == out(2L)._1, "near-dups share a cluster")
    assert(!out(1L)._2 && out(2L)._2,
      "the higher-scored doc 2 is kept, not the min-id doc 1")
    assert(out(3L)._2, "singletons keep themselves")
  }

  test("keepBest ties break by min id") {
    val out = Dedup.keepBest(dupDocs, "text", "doc_id", lit(1.0))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(1L) && !out(2L) && out(3L))
  }

  // --- Sharding.shuffleOrder ----------------------------------------------

  private val shardDocs = (0L until 40L)
    .map(i => (i, if (i < 20) "a" else "b", "w " * 500)) // 500 tokens each
    .toDF("doc_id", "source", "text")

  test("shuffleOrder: pos is a permutation of 1..n within each shard") {
    val out = Sharding.shuffleOrder(shardDocs, "doc_id", "source",
        graft.functions.Text.tokenCountWs(col("text")), 2000L, seed = 11)
      .select("source", "shard_id", "pos")
    val byShard = out.collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    byShard.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length))
    }
    // 500-token docs, 2000 budget → 4 docs per shard
    assert(byShard.values.forall(_.length == 4))
  }

  test("shuffleOrder is deterministic and actually permutes") {
    val run = () => Sharding.shuffleOrder(shardDocs, "doc_id", "source",
        graft.functions.Text.tokenCountWs(col("text")), 2000L, seed = 11)
      .select("doc_id", "pos", "shard_key").collect().toSeq.map(_.toSeq)
    assert(run() == run(), "same seed → identical epoch order")
    val out = run()
    // at least one shard's hash order differs from id order
    assert(out.exists { case Seq(id: Long, pos: Int, _) =>
      (id % 4 + 1).toInt != pos
    }, "the sha256 ratio order differs from insertion order somewhere")
    // shard_key is a ratio in [0,1)
    assert(out.forall { case Seq(_, _, k: Double) => k >= 0.0 && k < 1.0 })
  }

  // --- corpus: config surface ---------------------------------------------

  private def corpusYaml(steps: String) =
    s"""sources:
       |  - id: docs
       |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
       |corpus:
       |  source: docs
       |  id: doc_id
       |  text: text
       |  steps:
       |$steps
       |""".stripMargin

  test("corpus config rejects an unknown dedup_fuzzy keep") {
    val ex = intercept[Exception] {
      graft.pipeline.Config.parseProject(corpusYaml(
        "    - { step: dedup_fuzzy, threshold: 0.5, keep: longest }"))
    }
    assert(ex.getMessage.contains("keep"))
  }

  test("corpus config parses keep: best_quality and shard shuffle_seed") {
    val p = graft.pipeline.Config.parseProject(corpusYaml(
      """    - { step: dedup_fuzzy, threshold: 0.5, keep: best_quality }
        |    - { step: shard, by: source, budget: 2000, shuffle_seed: 11 }""".stripMargin))
    val steps = p.corpus.get.steps
    assert(steps(0) == graft.pipeline.Config.CorpusDedupFuzzy(0.5, "best_quality"))
    assert(steps(1) == graft.pipeline.Config.CorpusShard("source", 2000L, Some(11)))
  }

  // --- Crawl.corpusDiff ---------------------------------------------------

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val oldGen = Seq((1L, "same"), (2L, "old body"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newGen = Seq((1L, "same"), (2L, "new body"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Crawl.corpusDiff(oldGen, newGen, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  // --- Multimodal.audioFingerprint ----------------------------------------

  test("audioFingerprint: identical audio shares the hash, distinct differs") {
    import graft.operators.Multimodal
    val loud = (0 until 200).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val docs = Seq(
      (1L, loud), (2L, loud),
      (3L, "zzzzzzzz" + loud.reverse + "aaaaaaaa")
    ).toDF("doc_id", "text")
    val fp = Multimodal.audioFingerprint(spark,
        Multimodal.asMediaTable(docs, "doc_id", "text"))
      .collect().map(r => r.media_id -> r.afp).toMap
    assert(fp(1L) == fp(2L), "identical payloads share the fingerprint")
    assert(fp(1L) != fp(3L), "distinct audio separates")
    val report = Multimodal.audioDedup(spark,
        Multimodal.asMediaTable(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(report(1L) == 1L && report(2L) == 1L && report(3L) == 0L,
      "exact-copy counts reflect the planted duplicate")
  }

  // --- Similarity.annIvfPq ------------------------------------------------

  test("annIvfPq finds a planted exact duplicate at rank 1") {
    // 32 near-orthogonal 8-dim vectors + an exact duplicate of vec 3 at 100
    val base = (0L until 32L).map { i =>
      val v = Array.tabulate(8)(j =>
        if (j == (i % 8).toInt) 1.0f + i * 0.01f else 0.001f * ((i + j) % 5))
      (i, v.toSeq)
    }
    val corpus = (base :+ ((100L, base(3)._2))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 3L)
    val out = Similarity.annIvfPq(queries, corpus, "vec_id", "embedding",
        k = 3, dim = 8, m = 4, ks = 8, kc = 4, nprobe = 2)
      .collect().sortBy(_.getInt(4))
    // the duplicate shares vec 3's list and codes → ADC distance is the
    // self-distance, the minimum possible → rank 1
    assert(out.head.getLong(1) == 100L)
    assert(out.map(_.getInt(4)).toSeq == Seq(1, 2, 3))
  }

  test("annIvfPq only scores vectors in probed lists") {
    val base = (0L until 32L).map { i =>
      val v = Array.tabulate(8)(j => if (j == (i % 8).toInt) 1.0f else 0.0f)
      (i, v.toSeq)
    }
    val corpus = base.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.annIvfPq(queries, corpus, "vec_id", "embedding",
      k = 32, dim = 8, m = 4, ks = 8, kc = 4, nprobe = 1)
    val lists = out.select("centroid_id").distinct().collect().map(_.getInt(0))
    assert(lists.length == 1, "nprobe=1 → every candidate from one list")
    assert(out.count() < 32, "unprobed lists are never scanned")
  }

  test("corpus_drift PSI terms equal a driver-side smoothed replay") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("corpus_drift")(spark, sf)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == (0 until 10).toSet, "all 10 buckets report")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.Text.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    def bucket(q: Double) = math.min(math.floor(q * 10).toInt, 9)
    val ref = docs.filter(_._1 % 5 != 0).map(d => bucket(d._2))
    val cur = docs.filter(_._1 % 5 == 0).map(d => bucket(d._2))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 10).foreach { b =>
      val (nr, nc) = (ref.count(_ == b).toLong, cur.count(_ == b).toLong)
      val pr = (nr + 1.0) / (ref.length + 10.0)
      val pc = (nc + 1.0) / (cur.length + 10.0)
      assert(got(b) == ((nr, nc, r6((pc - pr) * math.log(pc / pr)))), s"bucket $b")
    }
    // 80/20 slices of one corpus: every term is small but some are nonzero
    assert(got.values.map(v => math.abs(v._3)).max < 0.1)
    assert(got.values.exists(_._3 != 0.0))
  }

  test("shard_balance reconstructs from the manifest per source") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("shard_balance")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val manifest = SparkEntry.queries("shard_manifest")(spark, sf)
      .select(col("source"), col("n_tokens")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == manifest.map(_._1).toSet && got.nonEmpty)
    got.foreach { case (src, (n, mn, mx, mean, bal)) =>
      val toks = manifest.filter(_._1 == src).map(_._2)
      assert(n == toks.length.toLong, src)
      assert(mn == toks.min && mx == toks.max, src)
      assert(mean == r6(toks.sum.toDouble / toks.length), src)
      assert(bal == r6(toks.min.toDouble / toks.max), src)
      assert(bal > 0.0 && bal <= 1.0, src)
    }
    // at gate scale every source fits one shard (balance exactly 1);
    // multi-shard discrimination: a doubled corpus splits and unbalances
    val doubled = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val m2 = graft.operators.Sharding.manifest(
      doubled.unionByName(doubled.select(col("doc_id") + 100000L,
        col("source"), col("text")).toDF("doc_id", "source", "text")),
      "doc_id", "source", "text",
      graft.functions.Text.tokenCountWs(col("text")), 2000L)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        (min(col("n_tokens")).cast("double") /
          max(col("n_tokens")).cast("double")).as("bal"))
      .collect()
    assert(m2.exists(r => r.getLong(1) > 1L && r.getDouble(2) < 1.0),
      "a multi-shard source must report its tail-shard imbalance")
  }

  test("quality_length_corr equals a driver-side moment replay") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("quality_length_corr")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"),
        graft.functions.Text.tokenCountWs(col("text")).cast("long").as("x"),
        graft.functions.Text.qualityScore(col("text")).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dec6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(got.keySet == docs.map(_._1).toSet && got.nonEmpty)
    got.foreach { case (src, (n, r)) =>
      val ds = docs.filter(_._1 == src)
      assert(n == ds.length.toLong, src)
      val nn = ds.length.toDouble
      val sx = ds.map(_._2).sum.toDouble
      val sy = ds.map(d => dec6(d._3)).sum.toDouble
      val sxy = ds.map(d => dec6(r6(d._2 * d._3))).sum.toDouble
      val sxx = ds.map(d => d._2 * d._2).sum.toDouble
      val syy = ds.map(d => dec6(r6(d._3 * d._3))).sum.toDouble
      val den = math.sqrt(nn * sxx - sx * sx) * math.sqrt(nn * syy - sy * sy)
      val expect = if (den == 0.0) 0.0 else r6((nn * sxy - sx * sy) / den)
      assert(r == expect, src)
      assert(r >= -1.0 && r <= 1.0, src)
    }
    // the quality score's length term shows up: positive correlation exists
    assert(got.values.exists(_._2 > 0.2))
  }

  test("stream_data_contract equals the batch contract minus the at-rest rule") {
    val sf = "/root/testdata/sf0.001"
    val live = SparkEntry.queries("stream_data_contract")(spark, sf)
      .collect().map(_.toString).toSet
    val batch = SparkEntry.queries("data_contract")(spark, sf)
      .collect().filterNot(_.getString(0) == "doc_id_unique")
      .map(_.toString).toSet
    assert(live == batch && live.size == 4)
  }

  test("stream_drift's final emission equals the batch corpus_drift head") {
    val sf = "/root/testdata/sf0.001"
    val live = SparkEntry.queries("stream_drift")(spark, sf)
      .collect().map(_.toString).toSet
    val batch = SparkEntry.queries("corpus_drift")(spark, sf)
      .collect().map(_.toString).toSet
    assert(live == batch && live.size == 10)
  }
}
