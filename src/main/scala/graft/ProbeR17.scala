package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 synthetic A/B harness for the 100 TB fallback paths ABOVE the
  * r16 driver gates (the paths the sf0.1 bench never exercises because its
  * graphs fit the gates). Runs the r15/r16 distributed implementations
  * (copied verbatim below as `old*`) against the r17 rewrites in the same
  * JVM, alternating, on deterministic synthetic graphs larger than the
  * 1M-edge gate, with `graft.cc.driver_max_edges=0` /
  * `graft.graph.driver_max_edges=0` so both sides take the distributed
  * path. Reports wall seconds and Spark job counts per run, and asserts
  * result equality old == new once per shape. Evidence lands in
  * measurements/r17/ and OPTIMIZATION_r17.md.
  */
object ProbeR17 {

  // ---- r15/r16 baseline: min-label propagation with pointer jumping ----
  // (Dedup.connectedComponents' distributed branch as of r16, verbatim)
  def oldCcPointerJump(nodes: DataFrame, edges: DataFrame, idCol: String,
                       maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = false)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(eager = false)
    var prevSum = Option.empty[Long]
    var iter = 0
    var converged = labels.isEmpty
    while (!converged && iter < maxIter) {
      val msgs = sym.as("s").join(labels.as("l"), col("s.src") === col("l.id"))
        .select(col("s.dst").as("id"), col("l.label").as("nlabel"))
      val minN = msgs.groupBy(col("id")).agg(min(col("nlabel")).as("nlabel"))
      val l1 = labels.join(minN, Seq("id"), "left")
        .select(col("id"),
          least(coalesce(col("nlabel"), col("label")), col("label")).as("label"))
      val next = l1.as("a")
        .join(l1.as("b"), col("a.label") === col("b.id"))
        .select(col("a.id").as("id"), col("b.label").as("label"))
        .localCheckpoint(eager = false)
      val s = next.agg(sum(col("label"))).head().getLong(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      labels = next
      iter += 1
    }
    require(converged, s"oldCcPointerJump did not converge in $maxIter rounds")
    nodes.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("label"), col(idCol)).as("cluster_id"))
  }

  // ---- r16 baseline: pageRankHosts' distributed rounds, verbatim ----
  def oldPageRank(edges: DataFrame, iters: Int,
                  initMicros: Long = 1000000L, baseMicros: Long = 150000L,
                  dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val outW = edges.groupBy(col("src_host")).agg(sum(col("weight")).as("out_w"))
    val e = edges.join(outW, "src_host")
      .select(col("src_host"), col("dst_host"), col("weight"), col("out_w"))
      .localCheckpoint(eager = false)
    val hosts = e.select(col("src_host").as("host"))
      .unionByName(e.select(col("dst_host").as("host")))
      .distinct()
      .localCheckpoint(eager = false)
    var ranks = hosts.select(col("host"), lit(initMicros).as("rank_micros"))
    for (_ <- 1 to iters) {
      val inflow = e.join(ranks, col("src_host") === col("host"))
        .selectExpr("dst_host", "rank_micros * weight div out_w AS contrib")
        .groupBy(col("dst_host")).agg(sum(col("contrib")).as("inflow"))
      ranks = hosts
        .join(inflow, col("host") === col("dst_host"), "left")
        .select(col("host"), coalesce(col("inflow"), lit(0L)).as("inflow"))
        .selectExpr("host",
          s"CAST($baseMicros + ($dampNum * inflow div $dampDen) AS BIGINT)" +
            " AS rank_micros")
        .localCheckpoint(eager = false)
    }
    ranks
  }

  // ---- r16 baseline: hitsHosts' distributed half-rounds, verbatim ----
  def oldHits(edges: DataFrame, iters: Int,
              initMicros: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src_host"), col("dst_host"), col("weight"))
      .localCheckpoint(eager = false)
    val hosts = e.select(col("src_host").as("host"))
      .unionByName(e.select(col("dst_host").as("host")))
      .distinct().localCheckpoint(eager = false)
    def normalized(raw: DataFrame, key: String, out: String): DataFrame = {
      val m = raw.agg(max(col("raw")).as("m"))
      hosts.join(raw, col("host") === col(key), "left")
        .select(col("host"), coalesce(col("raw"), lit(0L)).as("raw"))
        .crossJoin(broadcast(m))
        .selectExpr("host",
          s"CAST(raw div greatest(m div 1000000, 1) AS BIGINT) AS $out")
        .localCheckpoint(eager = false)
    }
    var hub = hosts.select(col("host"), lit(initMicros).as("hub_micros"))
    var auth: DataFrame = hosts.select(col("host"),
      lit(initMicros).as("auth_micros"))
    for (_ <- 1 to iters) {
      val authRaw = e.join(hub, col("src_host") === col("host"))
        .selectExpr("dst_host", "hub_micros * weight AS c")
        .groupBy(col("dst_host")).agg(sum(col("c")).as("raw"))
      auth = normalized(authRaw, "dst_host", "auth_micros")
      val hubRaw = e.join(auth, col("dst_host") === col("host"))
        .selectExpr("src_host", "auth_micros * weight AS c")
        .groupBy(col("src_host")).agg(sum(col("c")).as("raw"))
      hub = normalized(hubRaw, "src_host", "hub_micros")
    }
    auth.join(hub, Seq("host"))
  }

  // ---- r16 baseline: labelPropagate's distributed rounds, verbatim ----
  def oldLabelProp(edges: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val und = edges
      .select(col("src_host").as("a"), col("dst_host").as("b"), col("weight"))
      .unionByName(edges
        .select(col("dst_host").as("a"), col("src_host").as("b"), col("weight")))
      .groupBy(col("a"), col("b")).agg(sum(col("weight")).as("w"))
      .localCheckpoint(eager = false)
    var labels = und.select(col("a").as("host")).distinct()
      .withColumn("label", col("host"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val votes = und
        .join(labels, col("b") === col("host"))
        .groupBy(col("a"), col("label")).agg(sum(col("w")).as("lw"))
      val top = row_number().over(
        Window.partitionBy(col("a"))
          .orderBy(col("lw").desc, col("label").asc))
      labels = votes.withColumn("r", top).where(col("r") === 1)
        .select(col("a").as("host"), col("label"))
        .localCheckpoint(eager = false)
    }
    labels.select(col("host"), col("label").as("community"))
  }

  // ------------------------------------------------------------ harness
  private val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private final case class JobRec(id: Int, t0: Long, var t1: Long,
                                  what: String)
  private val jobRecs =
    new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()

  /** Order-robust A/B: alternate which side runs first per rep — the
    * second run of a pair systematically benefits from warmed state
    * (measured: two IDENTICAL hits implementations read 7.5 vs 5.5 s in
    * fixed old-then-new order), so a fixed order flatters one side.
    */
  private def ab(spark: SparkSession, name: String, rep: Int)
                (old: => DataFrame)(nu: => DataFrame): Unit = {
    if (rep % 2 == 1) {
      timed(spark, s"$name old")(old); timed(spark, s"$name new")(nu)
    } else {
      timed(spark, s"$name new")(nu); timed(spark, s"$name old")(old)
    }
  }

  private def timed(spark: SparkSession, label: String)
                   (mk: => DataFrame): (Double, Int) = {
    spark.sparkContext.setJobDescription(label)
    val j0 = jobCount.get()
    val t0 = System.nanoTime()
    mk.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val jobs = jobCount.get() - j0
    println(f"[probe] $label%-28s $sec%8.2f s  $jobs%3d jobs")
    (sec, jobs)
  }

  private def assertEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    require(d1 == 0 && d2 == 0, s"$what: old/new differ ($d1/$d2 rows)")
    println(s"[probe] $what: old == new OK")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        val what = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobRecs.put(js.jobId,
          JobRec(js.jobId, System.nanoTime(), -1L, what.take(140)))
        ()
      }
      override def onJobEnd(
          je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobRecs.get(je.jobId)).foreach(_.t1 = System.nanoTime())
        ()
      }
    })
    // force the distributed paths on both sides
    spark.conf.set("graft.cc.driver_max_edges", "0")
    spark.conf.set("graft.graph.driver_max_edges", "0")
    val which = args.headOption.getOrElse("all")
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt

    if (which == "all" || which == "cc") {
      // three >1M-edge shapes: star components (the near-dup shape),
      // 64-node chains (high diameter), and a hot hub + pair soup (skew)
      val shapes: Seq[(String, DataFrame, DataFrame)] = Seq(
        {
          val n = 2500000L
          val nodes = spark.range(n).toDF("doc_id")
          val edges = spark.range(n).where(col("id") % 5 =!= 0)
            .select(col("id").as("id_a"), (col("id") - col("id") % 5).as("id_b"))
          ("cc_stars_2m", nodes, edges)
        },
        {
          val n = 2031616L // 31744 chains of 64
          val nodes = spark.range(n).toDF("doc_id")
          val edges = spark.range(n - 1).where((col("id") + 1) % 64 =!= 0)
            .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
          ("cc_chains64_2m", nodes, edges)
        },
        {
          val n = 3000000L
          val nodes = spark.range(n).toDF("doc_id")
          val hub = spark.range(1L, 1000001L)
            .select(col("id").as("id_a"), lit(0L).as("id_b"))
          val pairs = spark.range(500000L)
            .select((col("id") * 2 + 1000002L).as("id_a"),
              (col("id") * 2 + 1000001L).as("id_b"))
          ("cc_hub_pairs_1m5", nodes, hub.unionByName(pairs))
        })
      for ((name, nodes0, edges0) <- shapes) {
        val nodes = nodes0.localCheckpoint() // materialize inputs OUTSIDE timing
        val edges = edges0.localCheckpoint()
        assertEqual(
          oldCcPointerJump(nodes, edges, "doc_id"),
          operators.Dedup.connectedComponents(nodes, edges, "doc_id"),
          name)
        for (r <- 1 to reps) {
          ab(spark, name, r)(oldCcPointerJump(nodes, edges, "doc_id"))(
            operators.Dedup.connectedComponents(nodes, edges, "doc_id"))
        }
      }
    }

    if (which == "plans") {
      // does a join over two key-pinned localCheckpoints really plan
      // exchange-free? dump the FINAL (post-AQE) physical plan of one
      // pagerank-shaped round, pinned vs unpinned
      val np = cpus.toInt
      val edges = spark.range(2000000L)
        .selectExpr("concat('h', id % 200000) AS src_host",
          "concat('h', (id * 31 + 7) % 200000) AS dst_host",
          "1 + id % 5 AS weight")
        .localCheckpoint()
      def round(e: DataFrame, ranks: DataFrame): DataFrame =
        e.join(ranks, col("src_host") === col("host"))
          .selectExpr("dst_host", "rank_micros * weight AS c")
          .groupBy(col("dst_host")).agg(sum(col("c")).as("raw"))
      def finalPlan(df: DataFrame): String = {
        df.write.format("noop").mode("overwrite").save()
        df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.finalPhysicalPlan.toString
          case p => p.toString
        }
      }
      val hosts0 = edges.select(col("src_host").as("host"))
        .unionByName(edges.select(col("dst_host").as("host"))).distinct()
      val unpinnedE = edges.localCheckpoint()
      val unpinnedH = hosts0.localCheckpoint()
        .select(col("host"), lit(1000000L).as("rank_micros"))
      println("[plans] ===== UNPINNED round =====")
      println(finalPlan(round(unpinnedE, unpinnedH)))
      val pinnedE = edges.repartition(np, col("src_host"))
        .sortWithinPartitions(col("src_host")).localCheckpoint()
      val pinnedH = hosts0.repartition(np, col("host"))
        .sortWithinPartitions(col("host")).localCheckpoint()
        .select(col("host"), lit(1000000L).as("rank_micros"))
      println("[plans] ===== PINNED (localCheckpoint) round =====")
      println(finalPlan(round(pinnedE, pinnedH)))
      val cachedE = edges.repartition(np, col("src_host"))
        .sortWithinPartitions(col("src_host")).persist()
      val cachedH = hosts0.repartition(np, col("host"))
        .sortWithinPartitions(col("host")).persist()
        .select(col("host"), lit(1000000L).as("rank_micros"))
      cachedE.count(); cachedH.count()
      println("[plans] ===== PINNED (persist) round =====")
      println(finalPlan(round(cachedE, cachedH)))
      // the web-scale regime: the rank side is NOT broadcastable — the
      // round must plan a sort-merge join that reuses the pinned side's
      // partitioning AND ordering (no Exchange, no Sort over the edges)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      println("[plans] ===== PINNED (persist) round, no broadcast =====")
      val smj = finalPlan(round(cachedE, cachedH))
      println(smj)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("plans/r17/pagerank_round_pinned.txt"),
        "pagerank-shaped round over persist-pinned edges, broadcast disabled\n" +
          "(the 100 TB regime: rank side too big to broadcast) — the edge\n" +
          "side must show NO Exchange and NO Sort above its cache scan:\n\n" +
          smj)
    }

    if (which == "decomp") {
      // per-job cost decomposition of declared heads (guide §1: find which
      // stage dominates before touching anything):
      //   runMain graft.ProbeR17 decomp <sfDir> <head> [head ...]
      val sfDir = args(1)
      // warm the tables like Bench does, so scan-cache noise doesn't
      // masquerade as a dominant stage
      Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
        "part", "documents", "embeddings").foreach { t =>
        graft.sources.Tables.table(spark, sfDir, t).count()
      }
      for (head <- args.drop(2)) {
        // second run of two: steady-state decomposition, like the bench's
        // best-of-2
        (1 to 2).foreach { rep =>
          jobRecs.clear()
          val t0 = System.nanoTime()
          SparkEntry.queries(head)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val total = (System.nanoTime() - t0) / 1e9
          if (rep == 2) {
            println(f"[decomp] $head total $total%.2f s")
            import scala.jdk.CollectionConverters._
            val rows = jobRecs.values.asScala.toSeq.sortBy(_.t0)
            for (r <- rows) {
              val d = if (r.t1 < 0) Double.NaN else (r.t1 - r.t0) / 1e9
              println(f"[decomp]   job ${r.id}%4d $d%7.2f s  ${r.what}")
            }
          }
        }
      }
    }

    if (which == "all" || which == "graph") {
      // weighted host graph: 1M hosts, 4M edges, ~4 out-edges/host — the
      // score/label frames are tens of MB, ABOVE the broadcast threshold,
      // so the rounds plan the sort-merge joins the 100 TB regime plans
      // (at 200K hosts the score side broadcast and the edge side never
      // shuffled per round in EITHER variant — unrepresentative)
      val h = 1000000L
      val edges = spark.range(4000000L)
        .selectExpr(s"concat('h', id % $h) AS src_host",
          s"concat('h', (id * 31 + 7) % $h) AS dst_host",
          "1 + id % 5 AS weight")
        .where(col("src_host") =!= col("dst_host"))
        .localCheckpoint()
      assertEqual(oldPageRank(edges, 5),
        operators.Crawl.pageRankHosts(edges, 5), "graph_pagerank")
      assertEqual(oldHits(edges, 2),
        operators.Crawl.hitsHosts(edges, 2), "graph_hits")
      assertEqual(oldLabelProp(edges, 3),
        operators.Crawl.labelPropagate(edges, 3), "graph_labelprop")
      for (r <- 1 to reps) {
        ab(spark, "pagerank_2m", r)(oldPageRank(edges, 5))(
          operators.Crawl.pageRankHosts(edges, 5))
        ab(spark, "hits_2m", r)(oldHits(edges, 2))(
          operators.Crawl.hitsHosts(edges, 2))
        ab(spark, "labelprop_2m", r)(oldLabelProp(edges, 3))(
          operators.Crawl.labelPropagate(edges, 3))
      }
    }
    spark.stop()
  }
}
