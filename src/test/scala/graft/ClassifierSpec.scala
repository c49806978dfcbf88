package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Trained quality classifier (operators/Classifier.scala): hashed-feature
  * logistic regression with the integer-micros hard-sigmoid link.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 32

  private def fixture = Seq(
    (1L, "good clean prose with varied words", 1.0),
    (2L, "more good clean prose here too", 1.0),
    (3L, "good words clean text varied prose", 1.0),
    (4L, "spam spam spam buy now spam", 0.0),
    (5L, "buy buy now now spam buy", 0.0),
    (6L, "now spam buy spam now buy", 0.0)
  ).toDF("doc_id", "text", "y")

  test("fitLogReg separates a separable fixture and classify scores it") {
    val docs = fixture
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val w = Classifier.fitLogReg(feats, labels, "doc_id", B,
      iters = 8, eta = 1.0, nDocs = 6L)
    val out = Classifier.classify(feats, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every positive doc must score above every negative doc
    val pos = Seq(1L, 2L, 3L).map(out)
    val neg = Seq(4L, 5L, 6L).map(out)
    assert(pos.min > neg.max,
      s"positives $pos must outrank negatives $neg")
  }

  test("sampled fit == full fit when the corpus fits under the cap") {
    val docs = fixture
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val full = Classifier.fitLogReg(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0, nDocs = 6L)
    // cap >= n → rate = 1.0 → the predicate keeps every row: bit-equal
    val sampled = Classifier.fitLogRegSampled(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0, cap = 6L)
    assert(sampled.toSeq == full.toSeq)
    val defaulted = Classifier.fitLogRegSampled(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0)
    assert(defaulted.toSeq == full.toSeq)
  }

  test("fitSampled driver loop == distributed rounds, bit for bit") {
    val docs = fixture
    // driver path (default gate): the GD rounds run locally over the
    // collected sample
    val local = Classifier.fitSampled(docs, "doc_id", "text",
      col("y"), B, iters = 3, eta = 1.0)
    // distributed path (gate disabled by conf)
    spark.conf.set("graft.classifier.driver_max_feature_rows", "0")
    val dist =
      try Classifier.fitSampled(docs, "doc_id", "text",
        col("y"), B, iters = 3, eta = 1.0)
      finally spark.conf.unset("graft.classifier.driver_max_feature_rows")
    assert(local.toSeq == dist.toSeq)
    assert(local.exists(_ != 0.0), "the fit must actually train")
    // and both equal the raw fitLogReg over pre-built features (cap >= n)
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val raw = Classifier.fitLogReg(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0, nDocs = 6L)
    assert(local.toSeq == raw.toSeq)
  }

  test("sampled fit under a tight cap == full fit on the pre-filtered sample") {
    val docs = fixture
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val cap = 3L
    val sampled = Classifier.fitLogRegSampled(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0, cap = cap)
    // replay by hand: same predicate, pre-filtered frames, plain fitLogReg
    val p = Classifier.trainSamplePredicate("doc_id", 6L, cap)
    val tl = labels.filter(p)
    val n = tl.count()
    assert(n > 0 && n < 6, s"cap must select a proper subset, got $n")
    val manual = Classifier.fitLogReg(feats.filter(p), tl, "doc_id", B,
      iters = 3, eta = 1.0, nDocs = n)
    assert(sampled.toSeq == manual.toSeq)
    assert(sampled.exists(_ != 0.0), "the sampled fit must actually train")
  }

  test("fitSampled (sample pushed before features) == fitLogRegSampled") {
    // the r12 shape: filter the corpus FIRST, build features of the sample
    // only. Feature rows are per-doc independent, so the weights must be
    // bit-equal to filtering pre-built full-corpus features — both under
    // the cap (rate 1.0: sample == corpus) and over it (proper subset).
    val docs = fixture
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    for (cap <- Seq(6L, 3L)) {
      val old = Classifier.fitLogRegSampled(feats, labels, "doc_id", B,
        iters = 3, eta = 1.0, cap = cap)
      val pushed = Classifier.fitSampled(docs, "doc_id", "text", col("y"),
        B, iters = 3, eta = 1.0, cap = cap)
      assert(pushed.toSeq == old.toSeq, s"cap=$cap")
    }
  }

  test("probExpr (per-row fold) equals classify (relational aggregate)") {
    val docs = fixture
    val labels = docs.select(col("doc_id"), col("y"))
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val w = Classifier.fitLogReg(feats, labels, "doc_id", B,
      iters = 3, eta = 1.0, nDocs = 6L)
    val relational = Classifier.classify(feats, "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val perRow = docs
      .select(col("doc_id"), Classifier.probExpr(col("text"), w, B).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(perRow == relational) // bit-exact: same rounding chain
  }

  test("codegen'd ClsProbFold equals the interpreted HOF fold (incl. edges)") {
    // negative + positive weights, a weight that rounds at the .5 micro
    // boundary, empty-ish and single-token docs
    val docs = fixture.unionByName(Seq(
      (7L, "", 0.0), (8L, "solo", 1.0),
      (9L, "x x x x x x x x x x x x x", 0.0)).toDF("doc_id", "text", "y"))
    val w = Array.tabulate(B + 1)(i =>
      BigDecimal((if (i % 2 == 0) 1 else -1) * (i * 137 % 997) / 997.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val fast = docs.select(col("doc_id"),
      Classifier.probExpr(col("text"), w, B).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val slow = docs.select(col("doc_id"),
      Classifier.probExprHof(col("text"), w, B).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fast == slow)
  }

  test("model artifact round-trips exactly; fractional eta fails loudly") {
    val w = Array(0.125, -3.000001, 0.0, 1e-6)
    val path = java.nio.file.Files.createTempDirectory("cls").toString + "/m.json"
    Classifier.saveModel(path, w)
    assert(Classifier.loadModel(path).toSeq == w.toSeq)
    val docs = fixture
    val feats = Classifier.features(docs, "doc_id", "text", B)
    val err = intercept[IllegalArgumentException] {
      Classifier.fitLogReg(feats, docs.select(col("doc_id"), col("y")),
        "doc_id", B, iters = 1, eta = 0.5, nDocs = 6L)
    }
    assert(err.getMessage.contains("whole number"))
  }

  test("hard sigmoid: clamps, midpoint, and grid exactness") {
    val out = Seq(0.0, 0.123456, -0.123456, 8.0, -8.0, 1.999998)
      .toDF("s").select(Classifier.sigmoid(col("s")).as("p"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 0.5)
    assert(out(1) == 0.530864) // 500000 + floor(123456/4) micros
    assert(out(2) == 0.469136)
    assert(out(3) == 1.0 && out(4) == 0.0) // clamped
    assert(out(5) == 0.999999)
  }
}
