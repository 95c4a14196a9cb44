package graft.sources

import java.nio.file.{Files, Path => JPath}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.read.partitioning.{Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING READS of catalog tables — `spark.readStream.table(t)`,
  * the Delta/Iceberg capability that turns the lakehouse table into a
  * source: the first micro-batch serves the full snapshot current at
  * stream start, then each commit's ADDED data files become a batch
  * (offsets are immutable version-directory names, resolved through
  * the same pointer log as time travel — one file read per trigger).
  *
  * Change semantics are a documented two-option choice, same as
  * Iceberg/Delta: by default APPEND-DRIVEN re-emission (a
  * copy-on-write commit re-emits the rows of every file it rewrote —
  * never misses data; downstream must be idempotent on replays, the
  * st12 batch-id guard's consumer shape), or
  * `.option("skipChangeCommits", true)` for pure-append consumption
  * (change commits are skipped whole — updated rows never replay, at
  * the price that a change commit's own inserts are skipped with it).
  * A version vacuumed out of the retention window before the stream
  * consumed it fails with a pointed error — the stream must restart
  * from a fresh checkpoint (same contract as an expired Iceberg
  * snapshot). */
private[sources] final class CatalogMicroBatchStream(
    session: SparkSession, name: String, tableDir: JPath,
    tableSchema: StructType, readSchema: StructType,
    maxFilesPerTrigger: Option[Int], skipChangeCommits: Boolean)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit, ReadMaxFiles}

  // Trigger.AvailableNow: pin the run's end at prepare time so the
  // admission-controlled latestOffset still CHUNKS its way there
  // (without this, Spark's wrapper would take everything in one batch)
  @volatile private var availableNowCap: Option[String] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    val l = log()
    availableNowCap = Some(if (l.isEmpty) "" else l.head)
  }

  private def log(): Seq[String] = {
    val p = tableDir.resolve("_current")
    if (!Files.exists(p)) Seq.empty
    else new String(Files.readAllBytes(p), "UTF-8").linesIterator
      .map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Relative data-file paths of one committed version. */
  private def dataFiles(version: String): Set[String] = {
    val v = tableDir.resolve(version)
    if (!Files.isDirectory(v)) throw new IllegalStateException(
      s"$name: stream offset $version is no longer in the retention " +
        "window (vacuumed) — restart the stream from a fresh checkpoint")
    val walk = Files.walk(v)
    try walk.iterator().asScala.collect {
      case p if Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith(".") =>
        v.relativize(p).toString
    }.toSet
    finally walk.close()
  }

  /** A scan over explicit file paths, constructed IDENTICALLY for the
    * reader factory and every batch's partition planning, so the
    * factory's data/partition schemas always line up with the planned
    * [[org.apache.spark.sql.execution.datasources.FilePartition]]s. */
  private def scanOver(baseDir: JPath, paths: Seq[String]): Scan = {
    val options = new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("basePath", baseDir.toString))
    val b = ParquetTable(s"$name-stream", session, options,
      paths.map(p => baseDir.resolve(p).toString),
      Some(tableSchema), classOf[ParquetFileFormat])
      .newScanBuilder(options)
    b match {
      case fb: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =>
        fb.pruneColumns(readSchema)
      case _ => ()
    }
    b.build()
  }

  /** The (sourceVersion, relativePath) file list a consumer owes for
    * the `base → upto` advance, deterministic given the retained log.
    *
    * Default (re-emission) mode: the plain set diff — every emitted
    * file exists in `upto`, so it serves from there. With
    * `skipChangeCommits` (Iceberg's option of the same name) the walk
    * goes COMMIT BY COMMIT and drops any version that REMOVED files (a
    * COW merge/update/delete, a compaction, a re-layout) — pure-append
    * consumption: updated rows are never replayed, at the documented
    * price that a change commit's own inserts are skipped with it.
    * Files added by a kept commit but later rewritten no longer exist
    * in `upto`, so each file is served from the immutable version that
    * ADDED it — which is also why this mode needs the intermediate
    * versions retained (an expired chain fails with the same pointed
    * restart-fresh error as any vacuumed offset). */
  private def addedFiles(base: String, upto: String): Seq[(String, String)] =
    if (!skipChangeCommits)
      (dataFiles(upto) --
        (if (base.isEmpty) Set.empty[String] else dataFiles(base)))
        .toSeq.sorted.map(upto -> _)
    else {
      val l = log() // newest first
      val ui = l.indexOf(upto)
      val bi = if (base.isEmpty) l.size else l.indexOf(base)
      if (ui < 0 || bi < 0 || ui > bi) throw new IllegalStateException(
        s"$name: skipChangeCommits needs the $base → $upto commit chain " +
          "in the retention window — part of it is expired; restart the " +
          "stream from a fresh checkpoint")
      val chain = l.slice(ui, bi).reverse // oldest → upto
      var prev = if (base.isEmpty) Set.empty[String] else dataFiles(base)
      val out = Seq.newBuilder[(String, String)]
      for (v <- chain) {
        val cur = dataFiles(v)
        if ((prev -- cur).isEmpty)
          out ++= (cur -- prev).toSeq.sorted.map(v -> _)
        prev = cur
      }
      out.result()
    }

  override def initialOffset(): Offset = VersionOffset("", "", 0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-controlled path")

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** ADMISSION CONTROL — the 100 TB restart story: a stream started
    * (or restarted from an old offset) against a huge table must not
    * take the whole snapshot in one micro-batch. With
    * `maxFilesPerTrigger` the offset advances at FILE granularity
    * through each version's sorted added-file list — `k` files into
    * the `base → upto` diff — and a fully-consumed version normalizes
    * to the next `base`. Unbounded reads consume whole versions. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionOffset]
    val maxF = limit match {
      case m: ReadMaxFiles => m.maxFiles()
      case _: ReadAllAvailable => Int.MaxValue
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.collectFirst { case m: ReadMaxFiles => m.maxFiles() }
          .getOrElse(Int.MaxValue)
      case _ => Int.MaxValue
    }
    def normalized(base: String, upto: String, k: Int): VersionOffset = {
      val total = addedFiles(base, upto).size
      if (k >= total) VersionOffset(upto, upto, 0)
      else VersionOffset(base, upto, k)
    }
    if (s.upto.nonEmpty && s.base != s.upto) {
      // mid-version: keep consuming this diff before looking for more
      normalized(s.base, s.upto, s.k + maxF)
    } else {
      val cur = availableNowCap.getOrElse {
        val l = log(); if (l.isEmpty) "" else l.head
      }
      val base = s.upto // "" initially, else the last fully-consumed
      if (cur.isEmpty || cur == base) s
      else normalized(base, cur, maxF)
    }
  }

  override def deserializeOffset(json: String): Offset = {
    if (json.isEmpty) VersionOffset("", "", 0)
    else json.split(";", -1) match {
      case Array(b, u, k) => VersionOffset(b, u, k.toInt)
      case _ => // pre-admission-control checkpoint: a bare version name
        VersionOffset(json, json, 0)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset]
    val e = end.asInstanceOf[VersionOffset]
    if (e.upto.isEmpty || s == e) return Array.empty
    // sequential contract: `end` was derived from `start` by
    // latestOffset, so the pair is one of four adjacent shapes
    val files =
      if (s.base == e.base && s.upto == e.upto)
        // advancing within one diff: files [s.k, e.k)
        addedFiles(e.base, e.upto).slice(s.k, e.k)
      else if (s.upto == e.upto && e.base == e.upto)
        // completing s's diff (end normalized): the remainder
        addedFiles(s.base, s.upto).drop(s.k)
      else if (s.base == s.upto && e.base == e.upto)
        // a whole new diff consumed in one step
        addedFiles(s.upto, e.upto)
      else if (s.base == s.upto && e.base == s.upto)
        // entering a new diff part-way: its first e.k files
        addedFiles(e.base, e.upto).take(e.k)
      else throw new IllegalStateException(
        s"$name: non-adjacent stream offsets $s -> $e")
    if (files.isEmpty) return Array.empty
    // serve each file from the immutable version that holds it, then
    // re-index the concatenated partitions densely (RDD positions)
    val parts = files.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (v, fs) => scanOver(tableDir.resolve(v), fs.map(_._2))
        .toBatch.planInputPartitions().toSeq
    }
    parts.zipWithIndex.map {
      case (fp: org.apache.spark.sql.execution.datasources.FilePartition, i) =>
        org.apache.spark.sql.execution.datasources.FilePartition(i, fp.files)
          : InputPartition
      case (other, _) => other
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // factory from the identically-constructed scan shape; the current
    // version's files only pin the schemas, each batch re-plans its own
    val l = log()
    val v = if (l.isEmpty) "" else l.head
    val paths = if (v.isEmpty) Seq.empty else dataFiles(v).toSeq.sorted
    scanOver(if (v.isEmpty) tableDir else tableDir.resolve(v), paths)
      .toBatch.createReaderFactory()
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Stream position: every data file of committed version `base`, plus
  * the first `k` of the sorted added-file diff `base → upto`. A fully
  * consumed diff normalizes to `(upto, upto, 0)`; the initial offset
  * is `("", "", 0)` (before any data). Version names are immutable
  * v-UUID directory names, so an offset survives any pointer-log
  * growth — only vacuum can invalidate it, and that fails pointedly. */
private[sources] final case class VersionOffset(base: String, upto: String,
    k: Int) extends Offset {
  override def json(): String =
    if (upto.isEmpty) "" else s"$base;$upto;$k"
}

/** Forwarding wrapper giving any catalog batch scan a
  * [[MicroBatchStream]] — applied as the LAST step of the catalog's
  * scan builder so `readStream.table` works on every layout. The
  * batch interfaces forward conditionally: a capability the inner
  * scan lacks degrades to the interface's neutral answer, never an
  * error, so wrapping is behavior-preserving for batch plans
  * (pushdown lives on the BUILDER and is untouched). */
private[sources] final class StreamCapableScan(
    inner: Scan, session: SparkSession, name: String, tableDir: JPath,
    tableSchema: StructType, maxFilesPerTrigger: Option[Int],
    skipChangeCommits: Boolean)
    extends Scan with SupportsRuntimeV2Filtering
    with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = inner.description()
  override def toBatch: Batch = inner.toBatch

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CatalogMicroBatchStream(session, name, tableDir, tableSchema,
      inner.readSchema(), maxFilesPerTrigger, skipChangeCommits)

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    inner match {
      case f: SupportsRuntimeV2Filtering => f.filterAttributes()
      case _ => Array.empty
    }
  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    inner match {
      case f: SupportsRuntimeV2Filtering => f.filter(predicates)
      case _ => ()
    }

  override def outputPartitioning(): Partitioning = inner match {
    case p: SupportsReportPartitioning => p.outputPartitioning()
    case _ => new UnknownPartitioning(0)
  }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    inner match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes() = java.util.OptionalLong.empty()
        override def numRows() = java.util.OptionalLong.empty()
      }
    }
}
