package graft

import org.scalatest.funsuite.AnyFunSuite

/** Footer row counts must agree exactly with a Spark count — they replace
  * count() jobs in plan-build paths (incremental-dedup audit counts, crawl
  * cardinalities, warc/bucket file sizing), so a mismatch would silently
  * change file counts and UpdateReports.
  */
class ParquetMetaSpec extends AnyFunSuite with SparkSpec {

  test("rowCount matches Spark count on a multi-file directory") {
    val dir = java.nio.file.Files.createTempDirectory("pqmeta").toString
    spark.range(0, 1234).selectExpr("id", "id * 2 as v")
      .repartition(5)
      .write.mode("overwrite").parquet(dir)
    assert(graft.sources.ParquetMeta.rowCount(
      spark, java.nio.file.Paths.get(dir)) === 1234L)
    assert(spark.read.parquet(dir).count() === 1234L)
  }

  test("rowCount on a single parquet file equals the table's count") {
    val sf = "/root/testdata/sf0.001"
    val viaFooter = graft.sources.ParquetMeta.tableRows(spark, sf, "documents")
    val viaSpark = graft.sources.Tables.documents(spark, sf).count()
    assert(viaFooter === viaSpark)
  }

  test("rowCount of an empty write is 0") {
    val dir = java.nio.file.Files.createTempDirectory("pqmeta0").toString
    spark.range(0, 10).filter("id < 0")
      .write.mode("overwrite").parquet(dir)
    assert(graft.sources.ParquetMeta.rowCount(
      spark, java.nio.file.Paths.get(dir)) === 0L)
  }
}
