package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-curation operators for LLM-training-data pipelines (SURVEY.md
  * §2.7): benchmark decontamination, stratified sampling, per-group top-k
  * selection, and deterministic k-means clustering over embeddings.
  *
  * Scale posture: decontamination is a bucketed n-gram equi-join (the
  * benchmark side is the small one — broadcast); stratified sampling is a
  * pure codegen'd filter (zero shuffle); group top-k uses the bounded
  * [[TopK]] aggregator so only G×k rows shuffle; k-means keeps the data
  * distributed and only moves k×dim centroid statistics through the driver
  * per iteration (artifact-scale, the same shape MLlib uses).
  */
object Curation {

  /** Benchmark n-gram decontamination: flag every training document that
    * shares at least one word n-gram with the benchmark corpus — the
    * standard test-set-contamination check run before pretraining.
    *
    * Shape: distinct n-grams per side, equi-join on the n-gram, per-doc
    * overlap counts, left-join back. The benchmark is broadcast (benchmark
    * suites are ≪ the training corpus); drop the hint if yours is not.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    def ngrams(df: DataFrame) =
      array_distinct(Text.shingles(Text.tokens(col(textCol)), n))
    val trainNg = train.select(col(idCol), explode(ngrams(train)).as("ngram"))
    val benchNg = benchmark.select(explode(ngrams(benchmark)).as("ngram"))
      .distinct()
    val overlap = trainNg.join(broadcast(benchNg), Seq("ngram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated"))
    train.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("contaminated"))
  }

  /** Fuzzy benchmark decontamination: flag training documents that
    * NEAR-duplicate a benchmark doc — exact n-gram overlap
    * ([[decontaminate]]) misses paraphrased or lightly-edited test-set
    * leaks, so production pipelines run this minhash variant beside it.
    *
    * Shape: minhash band buckets on both sides, candidates where a corpus
    * doc shares a bucket with a benchmark doc (benchmark side broadcast —
    * the corpus is never shuffled or self-joined), exact Jaccard confirm on
    * candidates only, per-doc left-joined report:
    * `(id, n_candidates, n_matches, max_jacc, keep)` with
    * keep = no candidate at-or-above `threshold`.
    */
  def decontaminateFuzzy(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String,
                         threshold: Double = 0.5, shingleSize: Int = 3,
                         numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val pairs = Dedup.minhashCrossScoredPairs(corpus, benchmark, textCol,
      idCol, shingleSize, numPerm, bands)
    val perDoc = pairs.groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jacc") >= threshold, 1L).otherwise(0L)).as("n_matches"),
        max(col("jacc")).as("max_jacc"))
    corpus.select(col(idCol))
      .join(perDoc, col(idCol) === col("corpus_id"), "left")
      .select(col(idCol),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("max_jacc"),
        (coalesce(col("n_matches"), lit(0L)) === 0).as("keep"))
  }

  /** Bloom-filter benchmark decontamination — the LARGE-benchmark scale
    * path. [[decontaminate]] broadcasts the raw benchmark n-gram set, which
    * stops fitting when the held-out suite reaches hundreds of millions of
    * n-grams; a Bloom bitmap is FIXED-SIZE (`mBits` bits) regardless of
    * benchmark cardinality, the standard posture for membership tests at
    * 100 TB.
    *
    * Build: distinct benchmark n-grams hash to `numHashes` positions; the
    * positions OR into a bitmap of `mBits/64` longs via a partial-aggregated
    * `bit_or` — at most `mBits/64` rows reach the driver (metadata-scale,
    * the k-means-centroids discipline).
    *
    * Probe: the bitmap enters the plan as ONE constant-folded array literal;
    * each corpus document counts its distinct n-grams whose every position
    * bit is set — a pure per-row expression, ZERO shuffle on the corpus
    * ([[decontaminate]]'s n-gram equi-join disappears entirely).
    *
    * False positives are the Bloom trade (never false negatives) —
    * deterministic given the hash family, so the DuckDB oracle reproduces
    * them bit for bit. Output: `(id, n_flagged, contaminated)`.
    */
  def decontaminateBloom(train: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int,
                         mBits: Int = 1 << 16,
                         numHashes: Int = 2): DataFrame = {
    val bitmap = bloomBitmap(benchmark, textCol, n, mBits, numHashes)
    val nFlagged = bloomFlags(col(textCol), bitmap, n, numHashes)
    train.select(col(idCol), nFlagged.as("n_flagged"))
      .withColumn("contaminated", col("n_flagged") > 0L)
  }

  /** The benchmark's Bloom bitmap (mBits/64 longs): distinct n-grams hash
    * to numHashes positions, positions OR into words via a partial
    * -aggregated bit_or — metadata-scale driver hop regardless of benchmark
    * size. Runs its Spark job at call (plan-build) time.
    */
  def bloomBitmap(benchmark: DataFrame, textCol: String, n: Int,
                  mBits: Int, numHashes: Int): Array[Long] = {
    def ngrams = array_distinct(Text.shingles(Text.tokens(col(textCol)), n))
    val benchNg = benchmark.select(explode(ngrams).as("ngram")).distinct()
    bloomBitmapKeys(benchNg, "ngram", mBits, numHashes)
  }

  /** Bitmap of arbitrary pre-built STRING keys — the [[bloomBitmap]] core
    * without the n-gram construction, shared with the dedup-index ingest
    * screens ([[IncrementalDedup.ingestScreens]]). Same partial-aggregated
    * bit_or fold, same metadata-scale driver hop.
    */
  def bloomBitmapKeys(keys: DataFrame, keyCol: String, mBits: Int,
                      numHashes: Int): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val positions = (0 until numHashes)
      .map(i => keys.select(bloomPos(col(keyCol), i, mBits).as("p")))
      .reduce(_ unionAll _)
    val words = positions
      .select(floor(col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("p"), lit(64)).cast("int")).as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
      .collect()
    val bitmap = Array.fill(mBits / 64)(0L)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** All-positions-set test of ONE pre-built key against a bitmap literal —
    * the per-key probe for callers that already hold the key (the dedup
    * -index ingest screens probe a digest and one key per signature band
    * per row). Pure expression over a constant-folded array literal; same
    * hash family and bit layout as [[bloomBitmapKeys]].
    */
  def bloomHitKey(key: Column, bitmap: Array[Long], mBits: Int,
                  numHashes: Int): Column = {
    val bm = lit(bitmap)
    (0 until numHashes).map { i =>
      val p = bloomPos(key, i, mBits)
      element_at(bm, floor(p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(64)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** The bitmap as a PERSISTED artifact (the save/load_scaler discipline —
    * benchmark suites are static, so the build runs once and every later
    * run, including streams, hydrates): JSON with the sizing parameters so
    * parameter drift on load fails loudly instead of probing garbage.
    */
  def saveBloom(path: String, bitmap: Array[Long], n: Int, mBits: Int,
                numHashes: Int): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p,
      s"""{"ngram": $n, "m_bits": $mBits, "num_hashes": $numHashes, """ +
        s""""words": [${bitmap.mkString(", ")}]}""")
  }

  def loadBloom(path: String, n: Int, mBits: Int,
                numHashes: Int): Array[Long] = {
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    def field(k: String): Long =
      s""""$k":\\s*(-?\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(
          s"bloom artifact $path: missing field '$k'"))
        .group(1).toLong
    val (fn, fm, fh) = (field("ngram"), field("m_bits"), field("num_hashes"))
    require(fn == n && fm == mBits && fh == numHashes,
      s"bloom artifact $path was built with (ngram=$fn, m_bits=$fm, " +
        s"num_hashes=$fh) but the step asks for ($n, $mBits, $numHashes) — " +
        "rebuild the artifact or align the step")
    val arr = json.split("\\[")(1).split("\\]")(0).trim
    val words = if (arr.isEmpty) Array.empty[Long]
                else arr.split(",").map(_.trim.toLong)
    require(words.length == mBits / 64,
      s"bloom artifact $path has ${words.length} words, expected ${mBits / 64}")
    words
  }

  /** Per-row count of distinct word n-grams testing positive against a
    * bitmap literal: one codegen'd pass per document
    * (functions/BloomNgramHits — n-gram build + distinct + numHashes
    * digests in a tight loop; the higher-order filter formulation it
    * replaced is kept below as the spec-proven interpreted reference).
    * Pure expression, zero shuffle, no state — the decontamination shape
    * that gates a crawl AT INGEST.
    */
  def bloomFlags(text: Column, bitmap: Array[Long], n: Int,
                 numHashes: Int): Column = {
    graft.functions.BloomNgramHits.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("bloom_ngram_hits",
      Text.tokens(text), array(bitmap.map(lit(_)): _*), lit(n),
      lit(numHashes))
  }

  /** The Bloom probe as built-in higher-order folds — the interpreted
    * reference implementation BloomNgramHits is spec-proven against (the
    * DsirFold discipline). Not for hot paths: CodegenFallback, every
    * n-gram walks an interpreted tree around its digests.
    */
  private[graft] def bloomHitsHof(toks: Column, bitmapLit: Column, n: Int,
                                  mBits: Int, numHashes: Int): Column = {
    def hit(g: Column): Column = (0 until numHashes).map { i =>
      val p = bloomPos(g, i, mBits)
      val word = element_at(bitmapLit, floor(p / 64).cast("int") + 1)
      word.bitwiseAND(call_function("shiftleft", lit(1L),
        pmod(p, lit(64)).cast("int"))) =!= 0L
    }.reduce(_ && _)
    size(filter(array_distinct(Text.shingles(toks, n)), hit(_))).cast("long")
  }

  /** Position of hash family member `i` for an n-gram, in [0, mBits) —
    * shared (via [[graft.functions.Text.portableHash]]) with the oracle SQL
    * so the bitmap is engine-reproducible.
    */
  def bloomPos(ngram: Column, i: Int, mBits: Int): Column =
    pmod(Text.portableHash(concat(lit(s"bloom$i:"), ngram)), lit(mBits.toLong))

  /** The deterministic sha256 53-bit ratio in [0,1) behind hash splitting —
    * same bucketing as [[Assembly.hashSplitLabel]] (reference HashLabeler).
    */
  def hashRatio(token: Column, seed: Int): Column = {
    val hex = sha2(concat(lit(seed.toString), lit("|"), token.cast("string")), 256)
    val low56 = conv(substring(hex, 3, 14), 16, 10).cast("long")
    (low56.bitwiseAND(lit((1L << 53) - 1))).cast("double") /
      lit((1L << 53).toDouble)
  }

  /** Stratified deterministic sampling: keep a row iff its sha256 ratio is
    * below its stratum's target rate. Pure filter — no shuffle, no state,
    * reproducible across runs and engines (the property `df.sample` lacks).
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       seed: Int): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultRate)) { case (acc, (s, p)) =>
        when(col(stratumCol) === s, lit(p)).otherwise(acc)
      }
    df.filter(hashRatio(col(idCol), seed) < rate)
  }

  /** Overlapping token-window chunking — the pre-tokenization step of an
    * LLM training-data pipeline: split each document into windows of
    * `chunkSize` tokens advancing by `stride` (overlap = chunkSize −
    * stride), so no training sequence loses context at a hard boundary.
    *
    * Pure per-row codegen (tokens → window count → posexploded slices): no
    * shuffle, no state — a 100 TB corpus chunks at scan speed. Chunk count
    * per doc = 1 if n ≤ chunkSize else ceil((n − chunkSize)/stride) + 1,
    * so every token lands in ≥1 chunk and the last window may be short
    * (`n_tokens` carries its actual length).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"chunkDocuments: need 0 < stride <= chunkSize, got ($chunkSize, $stride)")
    val toks = Text.tokens(col(textCol))
    val n = size(toks).cast("long")
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(ceil((n - chunkSize).cast("double") / stride).cast("long") + lit(1L))
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_id") * stride)
          .as("n_tokens"),
        array_join(slice(col("__toks"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Top-k rows per group by (score desc, id asc), via the bounded [[TopK]]
    * aggregator: partial top-k happens map-side, so only G×k rows shuffle —
    * a Window rank would funnel every row of a group into one partition.
    *
    * Contract (like Similarity's ANN entry points): `idCol` must cast to
    * BIGINT and `score` must be non-null — enforced eagerly with a named
    * error instead of the opaque encoder NPE a silent cast would produce.
    */
  def groupTopK(df: DataFrame, groupCol: String, idCol: String,
                score: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // try_cast: ANSI mode would otherwise throw its own CAST_INVALID_INPUT
    // before the named groupTopK error below could fire
    val idLong = col(idCol).try_cast("long")
    val scored = df
      .select(col(groupCol).cast("string").as("grp"),
        when(score.isNull,
          raise_error(lit("groupTopK: score must be non-null")))
          .otherwise(score).as("score"),
        when(idLong.isNull, raise_error(concat(
          lit(s"groupTopK: id column '$idCol' must cast to BIGINT, got "),
          coalesce(col(idCol).cast("string"), lit("NULL")))))
          .otherwise(idLong).as("id"))
      .as[(String, Double, Long)]
    scored.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.topKAggregator(k).toColumn.name("top"))
      .toDF("grp", "top")
      .select(col("grp").as(groupCol), posexplode(col("top")).as(Seq("pos", "sn")))
      .select(col(groupCol), col("sn._2").as(idCol), col("sn._1").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** One k-means assignment pass against literal centroids: squared
    * Euclidean distance as a sequential fold (round-6 for the cross-engine
    * contract), argmin with centroid-index tiebreak via struct ordering.
    */
  private[operators] def assign(v: DataFrame,
                                centroids: Seq[(Int, Array[Double])]): DataFrame = {
    v.withColumn("best", array_min(array(distStructs(centroids): _*)))
      .select(col("vec_id"), col("v"),
        col("best.cluster").as("cluster"), col("best.dist").as("dist"))
  }

  /** The per-centroid (dist, cluster) candidate structs against a
    * (vec_id, v) frame — codegen'd literals, no join (shared by the argmin
    * assignment and the IVF n-nearest probe).
    */
  private def distStructs(centroids: Seq[(Int, Array[Double])]): Seq[Column] =
    centroids.map { case (i, c) =>
      val carr = array(c.map(lit(_)): _*)
      // codegen'd full-vector squared L2 (functions.SliceL2, start=1,
      // len=dim) — bit-identical to the interpreted
      // round(aggregate(zip_with(...)), 6) chain it replaced: same
      // sequential fold, same HALF_UP round; the assignment pass runs
      // n×k of these per k-means round
      val d2 = call_function("slice_l2", col("v"), carr, lit(1), lit(c.length))
      struct(d2.as("dist"), lit(i).as("cluster"))
    }

  /** The `n` nearest centroids per vector (dist asc, cluster asc — the
    * assignment tiebreak), one output row each: the IVF probe pass. Sorting
    * the ≤k-element candidate array happens per row inside codegen; nothing
    * shuffles.
    */
  private[operators] def assignN(v: DataFrame,
                                 centroids: Seq[(Int, Array[Double])],
                                 n: Int): DataFrame =
    v.withColumn("near",
      slice(array_sort(array(distStructs(centroids): _*)), 1, n))
      .select(col("vec_id"), col("v"),
        posexplode(col("near")).as(Seq("probe_pos", "best")))
      .select(col("vec_id"), col("v"),
        col("best.cluster").as("cluster"), col("best.dist").as("dist"))

  /** Deterministic Lloyd k-means over an embedding column: init = the k
    * vectors with the smallest ids, `iters` update rounds (exact decimal
    * element means rounded to 6dp), final assignment returned as
    * (vec_id, cluster, dist).
    *
    * The data never collects: each round moves only k×dim centroid
    * statistics through the driver and re-broadcasts them as codegen'd
    * literals — the artifact-scale pattern of the scaler, and of MLlib's
    * own k-means. Clusters that lose all members simply drop out (their
    * centroid cannot be updated), matching the oracle's GROUP BY semantics.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int): DataFrame = {
    val v = df.select(col(idCol).as("vec_id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    assign(v, kmeansCentroids(df, idCol, vecCol, k, iters)).drop("v")
  }

  // --- fill-in-the-middle (the code-pretraining PSM example builder) -------
  // The public FIM recipe (Bavarian et al. 2022): with a deterministic
  // sha-gated rate, a document re-orders into <PRE> prefix <SUF> suffix
  // <MID> middle — the model learns infilling from the moved span. Split
  // points come from two per-DOC sha-ratio draws (i in 0..n, j in i..n over
  // the token array), so the transform is reproducible across engines and
  // runs; ungated docs pass through verbatim. Pure per-row expressions —
  // zero shuffle, three sha draws per document.
  val FimGateSeed = 701
  val FimSplitSeedA = 702
  val FimSplitSeedB = 703
  val FimPre = "<PRE>"
  val FimSuf = "<SUF>"
  val FimMid = "<MID>"

  /** One per-row pass from (id, text) to
    * `(id, fim_applied, n_tokens, pre_len, mid_len, suf_len, output)`.
    * Length accounting is emitted for ungated docs too (pre = n, mid =
    * suf = 0) so the frame is uniformly consumable downstream.
    *
    * STAGED projections (the r13 ask-#9 rework): the token array, the
    * gate, and the two split points are named intermediate columns, each
    * referenced by several output columns. Built inline (the old shape),
    * every output column carried its OWN copy of the tokenizer/sha
    * subtree — the regex split evaluated up to 8x per row (the
    * CollapseProject hoist trap that motivated DsirFold's fused input).
    * CollapseProject keeps a non-cheap alias with multiple references
    * staged, so each subtree now evaluates once per row. Expressions are
    * unchanged — only shared — so results are bit-identical (measured
    * sf10: 2.22 -> see BASELINE notes).
    */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   rate: Double): DataFrame = {
    val s1 = docs.select(col(idCol), col(textCol),
      Text.tokens(col(textCol)).as("__w"),
      (hashRatio(col(idCol), FimGateSeed) < rate).as("__gate"))
    val n1 = size(col("__w")).cast("long")
    val s2 = s1.select(col(idCol), col(textCol), col("__w"), col("__gate"),
      n1.as("__n"),
      floor(hashRatio(col(idCol), FimSplitSeedA) *
        (n1 + 1).cast("double")).cast("long").as("__i"))
    val s3 = s2.select(col(idCol), col(textCol), col("__w"), col("__gate"),
      col("__n"), col("__i"),
      (col("__i") + floor(hashRatio(col(idCol), FimSplitSeedB) *
        (col("__n") - col("__i") + 1).cast("double")).cast("long")).as("__j"))
    val (w, n, gate, i, j) =
      (col("__w"), col("__n"), col("__gate"), col("__i"), col("__j"))
    val pre = array_join(slice(w, lit(1), i.cast("int")), " ")
    val mid = array_join(slice(w, (i + 1).cast("int"), (j - i).cast("int")), " ")
    val suf = array_join(slice(w, (j + 1).cast("int"), (n - j).cast("int")), " ")
    val fim = concat(lit(FimPre), lit(" "), pre, lit(" "), lit(FimSuf),
      lit(" "), suf, lit(" "), lit(FimMid), lit(" "), mid)
    s3.select(col(idCol),
      gate.as("fim_applied"),
      n.as("n_tokens"),
      when(gate, i).otherwise(n).as("pre_len"),
      when(gate, j - i).otherwise(0L).as("mid_len"),
      when(gate, n - j).otherwise(0L).as("suf_len"),
      when(gate, fim).otherwise(col(textCol)).as("output"))
  }

  // --- span corruption (the T5/UL2 pretraining example builder) ------------
  // Block-deterministic: corruption decisions key per (id, SpanBlock-token
  // block) on sha-ratio draws — gate < 0.5, offset in [0, SpanBlock-2),
  // length in {1, 2} — so spans can NEVER overlap, every decision is
  // independent (embarrassingly parallel, no sequential scan state), and
  // both engines replay the same draws. Sentinels number spans left to
  // right. Constants are public: the oracle SQL interpolates them.
  val SpanBlock = 8
  val SpanGateSeed = 601
  val SpanOffSeed = 602
  val SpanLenSeed = 603

  /** One per-row pass from (id, text) to (id, n_tokens, n_spans,
    * n_corrupted, inputs, targets). Zero shuffle. Shared verbatim by the
    * batch head, the streaming twin, and the `corrupt:` corpus stage, so
    * the paths cannot drift.
    *
    * Native codegen'd build (functions/SpanCorruptExpr — digest-byte
    * ratio draws + one linear walk per row); the interpreted HOF chain it
    * replaced stays below as [[spanCorruptHof]], the executable spec
    * CurationSpec property-pins equality against.
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val expr = graft.functions.SpanCorruptExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(
        col(idCol).cast("string")),
      org.apache.spark.sql.GraftColumnBridge.expression(
        graft.functions.Text.tokens(col(textCol))),
      SpanBlock, SpanGateSeed, SpanOffSeed, SpanLenSeed)
    docs.select(col(idCol),
      org.apache.spark.sql.GraftColumnBridge.column(expr).as("__sc"))
      .select(col(idCol),
        col("__sc.n_tokens").as("n_tokens"),
        col("__sc.n_spans").as("n_spans"),
        col("__sc.n_corrupted").as("n_corrupted"),
        col("__sc.inputs").as("inputs"),
        col("__sc.targets").as("targets"))
  }

  /** The higher-order-function form of [[spanCorrupt]] — an aggregate fold
    * splices sentinel tokens into the input, a two-arg transform numbers
    * the target spans. The executable spec; not on the hot path.
    */
  private[graft] def spanCorruptHof(docs: DataFrame, idCol: String,
                                    textCol: String): DataFrame = {
    val w = col("w")
    val n = size(w).cast("long")
    val blocks = sequence(lit(0L),
      ceil(n.cast("double") / SpanBlock).cast("long") - 1)
    def ratio(b: Column, seed: Int) = hashRatio(
      concat(col(idCol).cast("string"), lit(":"), b.cast("string")), seed)
    val spans = filter(
      transform(blocks, b => {
        val start = b * SpanBlock +
          floor(ratio(b, SpanOffSeed) * (SpanBlock - 2)).cast("long")
        val len0 = floor(ratio(b, SpanLenSeed) * 2).cast("long") + 1
        when(ratio(b, SpanGateSeed) < 0.5 && start < n,
          struct(start.as("start"),
            least(len0, n - start).as("len"))).otherwise(lit(null))
      }), sp => sp.isNotNull)
    def sentinel(i: Column) = concat(lit("<X"), i.cast("string"), lit(">"))
    val inputsArr = {
      val acc0 = struct(
        slice(w, 1, 0).as("arr"), lit(0L).as("pos"), lit(0L).as("idx"))
      aggregate(spans, acc0,
        (acc, sp) => struct(
          concat(acc.getField("arr"),
            slice(w, (acc.getField("pos") + 1).cast("int"),
              (sp.getField("start") - acc.getField("pos")).cast("int")),
            array(sentinel(acc.getField("idx")))).as("arr"),
          (sp.getField("start") + sp.getField("len")).as("pos"),
          (acc.getField("idx") + 1).as("idx")),
        acc => concat(acc.getField("arr"),
          slice(w, (acc.getField("pos") + 1).cast("int"),
            (n - acc.getField("pos")).cast("int"))))
    }
    val targetsArr = flatten(transform(spans, (sp, i) =>
      concat(array(sentinel(i.cast("long"))),
        slice(w, (sp.getField("start") + 1).cast("int"),
          sp.getField("len").cast("int")))))
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("w"))
      .select(col(idCol), n.as("n_tokens"),
        size(spans).cast("long").as("n_spans"),
        aggregate(spans, lit(0L),
          (a, sp) => a + sp.getField("len")).as("n_corrupted"),
        array_join(inputsArr, " ").as("inputs"),
        array_join(targetsArr, " ").as("targets"))
  }

  /** [[assign]] against pre-fitted centroid literals — the routing half of
    * [[kmeansAssign]] for callers that fit once batch-side and score
    * elsewhere (the streaming embed-route head): pure per-row codegen'd
    * folds, streaming-safe.
    */
  def assignTo(df: DataFrame, idCol: String, vecCol: String,
               centroids: Seq[(Int, Array[Double])]): DataFrame = {
    graft.functions.SliceL2.register(df.sparkSession)
    val v = df.select(col(idCol).as("vec_id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    assign(v, centroids).drop("v")
  }

  /** The trained centroids alone — [[kmeansAssign]]'s Lloyd loop without
    * the final assignment, for callers that feed a coarse quantizer
    * (Similarity.annIvfTrained). k×dim doubles, driver-side by design.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      iters: Int): Seq[(Int, Array[Double])] = {
    require(k > 0 && iters >= 0, "k-means needs k > 0, iters >= 0")
    graft.functions.SliceL2.register(df.sparkSession) // distStructs' core
    val v = df.select(col(idCol).as("vec_id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    var centroids: Seq[(Int, Array[Double])] = v.orderBy(col("vec_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }.toSeq
    for (_ <- 1 to iters) {
      // cluster labels survive updates verbatim (an emptied cluster drops
      // out rather than compacting the index space)
      val updated = assign(v, centroids)
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(sum(col("x").cast("decimal(30,6)")).cast("double") /
          count(col("x")), 6).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          r => r.getField("m")).as("c"))
        .collect()
      centroids = updated
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
        .sortBy(_._1)
    }
    centroids
  }

  /** Simplified (centroid) silhouette of a fitted k-means clustering — the
    * cluster-quality evaluation a curation run reports before trusting its
    * diversity sampling or SemDeDup buckets. Per vector: `a` = squared
    * distance to the assigned centroid, `b` = squared distance to the
    * nearest OTHER centroid — both read off the same sorted candidate
    * array the assignment uses (elements 0 and 1), so the evaluation costs
    * exactly one assignment pass — and s = (b−a)/max(a,b) (0 when both
    * vanish). Distances stay SQUARED (the round-6 grid slice_l2 emits;
    * monotone in the true distance, so the [-1,1] reading holds).
    *
    * Scale posture: centroids are k×dim codegen'd literals (no join); the
    * per-cluster report is one partial-aggregated groupBy with
    * exact-decimal means — k rows leave the shuffle, vectors never
    * collect. Output: (cluster, n, mean_sil, mean_dist).
    */
  def silhouette(df: DataFrame, idCol: String, vecCol: String, k: Int,
                 iters: Int): DataFrame = {
    require(k >= 2, "silhouette needs k >= 2 (no 'other' centroid otherwise)")
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters)
    val v = df.select(col(idCol).as("vec_id"),
      Similarity.toDouble(col(vecCol)).as("v"))
    val cand = array_sort(array(distStructs(cents): _*))
    v.select(
        element_at(cand, 1).getField("cluster").as("cluster"),
        element_at(cand, 1).getField("dist").as("a"),
        element_at(cand, 2).getField("dist").as("b"))
      .select(col("cluster"), col("a"),
        when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
          .otherwise(round((col("b") - col("a")) /
            greatest(col("a"), col("b")), 6)).as("sil"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("sil").cast("decimal(30,6)")).cast("double") /
          count(lit(1)), 6).as("mean_sil"),
        round(sum(col("a").cast("decimal(30,6)")).cast("double") /
          count(lit(1)), 6).as("mean_dist"))
  }
}
