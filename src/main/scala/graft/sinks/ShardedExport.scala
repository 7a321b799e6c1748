package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sharded export — the terminal step of a training-data
  * pipeline: split a curated corpus into `nShards` shards whose
  * membership is a pure function of the document id (so re-exports,
  * incremental appends, and multi-engine readers all agree), write one
  * parquet directory per shard, and emit a manifest with per-shard
  * row/token totals.
  *
  * Shard assignment is the repo's portable-hash idiom (see
  * `CurationOps.hashSplit`): the first 8 hex chars of
  * `md5("<seed>:<id>")` as an integer, mod `nShards`. md5 is
  * standardized, so any engine — the DuckDB oracle included — computes
  * the identical assignment; balance is the usual 1/√(docs-per-shard)
  * hash equidistribution (gated in ShardedExportSpec).
  *
  * Scale posture (100 TB): assignment is a pure projection — no shuffle,
  * no driver state. The write has two shapes:
  *  - `singleFilePerShard = true`: one `repartition(nShards, shard)`
  *    shuffle so each shard is exactly one file — the contract training
  *    loaders usually want. Right when shards are ≤ a few GB each
  *    (pick `nShards` from corpus size, not the other way round).
  *  - `singleFilePerShard = false`: no shuffle; every input task writes
  *    its rows into per-shard subdirectories in place. Right when a
  *    shard is bigger than one writer should handle; readers get a
  *    directory per shard instead of a file.
  * The manifest is ONE grouped aggregate over (shard, tokenCol) — a
  * column-pruned second scan, never a file-listing walk — written as
  * `_MANIFEST.json` beside the shards (driver writes |shards| rows).
  */
object ShardedExport {

  /** Portable shard id for `idCol` — `md5("<seed>:<id>")[0,8) as int
    * % nShards`, identical in Spark and DuckDB. */
  def shardOf(idCol: Column, nShards: Int, seed: String): Column =
    pmod(conv(substring(md5(
        concat_ws(":", lit(seed), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong))

  /** Writes `df` to `dir/shard=K/` parquet and `dir/_MANIFEST.json`;
    * returns the manifest as `(shard, n_rows, sum_tokens)` ordered by
    * shard. `tokenCol` is whatever per-row cost the training loader
    * budgets by (token count, char count, bytes). */
  def write(df: DataFrame, dir: String, nShards: Int,
            idCol: String, tokenCol: String, seed: String = "shard",
            singleFilePerShard: Boolean = true): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val sharded = df.withColumn("shard",
      shardOf(col(idCol), nShards, seed))
    val placed =
      if (singleFilePerShard) sharded.repartition(nShards, $"shard")
      else sharded
    placed.write.mode("overwrite").partitionBy("shard").parquet(dir)
    val manifest = sharded
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(tokenCol).cast("long")).as("sum_tokens"))
      .orderBy($"shard")
    val rows = manifest.collect()
    val json = rows.map { r =>
      s"""{"shard":${r.getLong(0)},"n_rows":${r.getLong(1)},""" +
        s""""sum_tokens":${r.getLong(2)}}"""
    }.mkString("[\n", ",\n", "\n]")
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, "_MANIFEST.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    manifest
  }
}
