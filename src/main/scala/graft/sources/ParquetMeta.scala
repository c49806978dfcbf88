package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata reads — exact row counts from file footers,
  * O(files) with zero data pages and zero Spark jobs. For auditing a
  * directory THIS process just wrote (generation dirs of the incremental
  * dedup indexes): the write already shaped the files, so the count is a
  * metadata lookup, not a computation — launching a Spark scan job (or
  * re-running the increment plan) for it paid task scheduling plus, for a
  * re-scan, a full extra pass over the increment at every scale.
  */
object ParquetMeta {

  /** Exact row count of a parquet file, or of the parquet files directly
    * under a directory (non-hidden `*.parquet` only — Spark's
    * `_SUCCESS`/`.crc` sidecars are skipped).
    */
  def rowCount(spark: SparkSession, path: Path): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val hp = new org.apache.hadoop.fs.Path(path.toString)
    val fs = hp.getFileSystem(conf)
    val root = fs.getFileStatus(hp)
    val files =
      if (root.isFile) Iterator.single(root)
      else fs.listStatus(hp).iterator
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
          !f.getPath.getName.startsWith(".") &&
          !f.getPath.getName.startsWith("_"))
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Row count of a bare test table (`$sfDir/$name.parquet`) — replaces a
    * plan-build-time `table.count()` job with a footer read when the
    * consumer needs only the table's cardinality.
    */
  def tableRows(spark: SparkSession, sfDir: String, name: String): Long =
    rowCount(spark, java.nio.file.Paths.get(sfDir, s"$name.parquet"))
}
