package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text

/** Deterministic training-shard assembly: the serving step that turns a
  * curated corpus into token-budgeted output shards plus a verifiable
  * manifest — what a 100 TB pipeline hands to the trainer.
  *
  * Scale posture: shard assignment is the sequence_pack discipline — a
  * running token total INSIDE each source partition key (no global
  * ordering, the window shuffle is one hash exchange on source) — and the
  * manifest is a plain partial-aggregated groupBy. The per-shard digest is
  * a bit_xor of per-doc content hashes: order-free and mergeable, so the
  * manifest can be recomputed shard-local on read-back and compared.
  */
object Sharding {

  /** Token-budgeted shard id within each source: shard_id = floor(tokens-
    * before-this-doc / budget). Docs stay whole (a doc that crosses the
    * budget boundary closes its shard over budget — the standard
    * "document-atomic" packing rule). Appends `n_tokens` and `shard_id`,
    * keeping the input columns.
    */
  def shardAssign(df: DataFrame, idCol: String, srcCol: String,
                  tokCount: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(srcCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokCount.cast("long"))
      .withColumn("shard_id",
        (coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
          .cast("long"))
  }

  /** Per-shard manifest: doc/token counts, id bounds, and an order-free
    * content digest (bit_xor of the portable 60-bit text hashes).
    */
  def manifest(df: DataFrame, idCol: String, srcCol: String,
               textCol: String, tokCount: Column, budget: Long): DataFrame =
    shardAssign(df, idCol, srcCol, tokCount, budget)
      .withColumn("__h", Text.portableHash(col(textCol)))
      .groupBy(col(srcCol), col("shard_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col(idCol)).as("min_doc_id"),
        max(col(idCol)).as("max_doc_id"),
        expr("bit_xor(__h)").as("digest"))

  /** Deterministic training-order shuffle (the "epoch shuffle" a trainer
    * consumes): token-budgeted [[shardAssign]] shards, a shuffled
    * WITHIN-shard position (`pos` = rank of the doc's sha256 ratio inside
    * its shard), and a shuffled SHARD order key (`shard_key` = the sha256
    * ratio of the shard's identity) — the WebDataset-style two-level
    * shuffle: shards are read in `shard_key` order, documents within a
    * shard in `pos` order. Zero RNG state: both levels are seeded sha256
    * ratios, so the epoch order is reproducible across runs and engines
    * (re-seed for the next epoch).
    *
    * Scale posture: no global ordering anywhere — `pos` is a window inside
    * the (source, shard_id) partition key (bounded by shard budget), and
    * `shard_key` is a pure per-row expression; the trainer sorts the
    * manifest-scale shard list itself. One hash exchange on source (shared
    * with the assignment window), bodies never shuffle.
    */
  def shuffleOrder(df: DataFrame, idCol: String, srcCol: String,
                   tokCount: Column, budget: Long, seed: Int): DataFrame = {
    val w = Window.partitionBy(col(srcCol), col("shard_id"))
      .orderBy(Curation.hashRatio(col(idCol), seed).asc, col(idCol).asc)
    shardAssign(df, idCol, srcCol, tokCount, budget)
      .withColumn("pos", row_number().over(w))
      .withColumn("shard_key",
        Curation.hashRatio(
          concat_ws("/", col(srcCol), col("shard_id")), seed))
  }
}
