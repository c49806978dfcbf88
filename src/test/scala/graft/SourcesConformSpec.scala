package graft

import org.apache.spark.sql.functions._

import graft.operators.Assembly
import graft.sources.Tables

/** Source codec round-trips and vector conform contract. */
class SourcesConformSpec extends SparkSpec {
  import spark.implicits._

  test("gzip csv round-trip preserves rows (codec auto-detect on read)") {
    val out = "/tmp/graft_scratch/spec_gzip_csv"
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    nation.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(out)
    val gzFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".csv.gz"))
    assert(gzFiles > 0, "expected gzip-compressed part files")
    val back = Tables.readCsv(spark, out, header = true,
      schemaDDL = Some("n_nationkey INT, n_name STRING, n_regionkey INT"))
    assert(back.count() == nation.count())
    assert(back.agg(sum("n_nationkey")).head().getLong(0) ==
      nation.agg(sum("n_nationkey")).head().getLong(0))
  }

  test("conform: contract order, missing → NULL, extras dropped, lengths checked") {
    val df = Seq((1L, 2.0, "extra", Seq(1.0, 2.0))).toDF("k", "a", "junk", "seq2")
    val out = Assembly.conform(df, Seq("k"), Seq(
      Assembly.VectorEntry("a"),
      Assembly.VectorEntry("b"),
      Assembly.VectorEntry("seq2", "sequence", 2)))
    assert(out.columns.toSeq == Seq("k", "a", "b", "seq2"))
    val row = out.head()
    assert(row.getDouble(1) == 2.0 && row.isNullAt(2))
    assert(row.getSeq[Double](3) == Seq(1.0, 2.0))
    // wrong sequence length → job fails (reference raises)
    val bad = Assembly.conform(df, Seq("k"),
      Seq(Assembly.VectorEntry("seq2", "sequence", 3)))
    intercept[Exception](bad.collect())
  }

  test("stateful streaming counts equal the batch group-by") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.Streaming
      .runUserCountsToBatch(spark, sf, "spec_stateful")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
