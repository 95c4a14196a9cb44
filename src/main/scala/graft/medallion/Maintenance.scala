package graft.medallion

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse table-maintenance operators: incremental layer builds,
  * key-based upserts, and small-file compaction. These are the operations
  * that keep a medallion deployment healthy once it runs continuously
  * instead of as one-shot backfills (the reference's orchestrator only
  * re-runs full stages; `docs/TUNING.md:50-53` tunes file sizes but ships
  * no compactor).
  *
  * All three are partition-scoped: they only ever read and rewrite the
  * partitions that changed, never the whole table — the property that
  * makes them usable on a 100 TB silver layer where a full rewrite is a
  * multi-hour job.
  */
object Maintenance {

  /** Set dynamic partition-overwrite for the duration of `f`: an
    * `INSERT OVERWRITE` then replaces only the partitions present in the
    * written frame (idempotent partition re-processing), not the table. */
  private def withDynamicOverwrite[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Incremental silver: enrich and write ONLY the bronze rows belonging to
    * partitions at-or-after the silver watermark (max interaction_date
    * already present), overwriting exactly those partitions. Re-running is
    * idempotent; the watermark day itself is always re-processed so late
    * rows of the newest day are picked up. Returns the rows written.
    *
    * Scale shape: one pushed-down date filter on the bronze scan (no full
    * re-read), the same narrow enrichment projection as the full build,
    * and a write that shuffles only the incremental slice. */
  def silverIncremental(spark: SparkSession, cfg: MdpConfig): Long = {
    val bronze = spark.read.parquet(cfg.bronzeUri)
    val clock = (to_date(timestamp_seconds(lit(cfg.baseEpochS))),
      timestamp_seconds(lit(cfg.baseEpochS)), lit(cfg.baseEpochS))
    val target = cfg.silverFallbackUri
    val existing =
      try Some(spark.read.parquet(target)) catch { case _: Throwable => None }
    val watermark = existing.flatMap(df =>
      Option(df.agg(max(col("interaction_date"))).head().getDate(0)))
    // filter the RAW timestamp, not the derived interaction_date: the
    // comparison against a literal reaches the parquet scan as a pushed
    // filter (row-group pruning), which a post-enrichment filter on a
    // computed column never would
    val sliceIn = watermark match {
      case Some(d) =>
        bronze.where(col("event_timestamp") >= to_timestamp(lit(d.toString)))
      case None => bronze
    }
    val slice = Silver.enrich(sliceIn, clock._1, clock._2, clock._3)
    val n = withDynamicOverwrite(spark) {
      val dist = slice.repartition(col("interaction_date"), col("channel"))
      dist.write.mode(if (existing.isDefined) "overwrite" else "errorifexists")
        .partitionBy("interaction_date", "channel")
        .parquet(target)
      spark.read.parquet(target).count()
    }
    n
  }

  /** Key-based MERGE/upsert into a date-partitioned parquet table: rows of
    * `updates` replace existing rows with the same key, new keys append —
    * but only the partitions that `updates` touches are read, merged and
    * rewritten (classic copy-on-write merge). `updates` must carry the
    * table's schema including `partitionCol`.
    *
    * Returns the merged row count of the touched partitions. */
  def upsertPartitioned(spark: SparkSession, path: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCol: String): Long = {
    val touched = updates.select(col(partitionCol)).distinct()
    val current = spark.read.parquet(path)
    // restrict the existing side to touched partitions (partition-pruned
    // scan via broadcast semi join on the partition column)
    val affected = current.join(broadcast(touched), Seq(partitionCol), "left_semi")
    val keep = affected.join(updates.select(keyCols.map(col): _*),
      keyCols, "left_anti")
    val merged = keep.unionByName(updates.select(current.columns.map(col): _*))
    val out = merged.repartition(col(partitionCol))
      .localCheckpoint() // materialize BEFORE overwriting the partitions it reads
    withDynamicOverwrite(spark) {
      out.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    }
    out.count()
  }

  /** Compact the small files of a (possibly partitioned) parquet table to
    * ~`targetFileMb` files without changing its data: the table is
    * rewritten with `maxRecordsPerFile` derived from its own measured
    * bytes/row, clustered by the partition columns so each output task
    * writes whole partitions. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              targetFileMb: Int = 128): (Long, Long) = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: Path): Seq[Path] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f.getPath
      }
      buf.toSeq
    }
    val before = parquetFiles(new Path(path))
    val totalBytes = before.map(f => fs.getFileStatus(f).getLen).sum
    val df = spark.read.parquet(path)
    val rows = df.count()
    val bytesPerRow = math.max(1L, totalBytes / math.max(1L, rows))
    val rowsPerFile = math.max(1L, targetFileMb.toLong * 1024 * 1024 / bytesPerRow)
    val clustered =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(math.max(1,
        (totalBytes / (targetFileMb.toLong * 1024 * 1024)).toInt + 1))
    val out = clustered
      .localCheckpoint() // materialize BEFORE overwriting what it reads
    out.write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile.toString)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    (before.size.toLong, parquetFiles(new Path(path)).size.toLong)
  }
}
