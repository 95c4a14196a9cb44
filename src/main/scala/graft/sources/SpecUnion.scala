package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.types.StructType

/** An input partition that CARRIES the reader factory that must serve
  * it — the glue that lets one DSv2 [[Batch]] union scans with
  * DIFFERENT partition layouts (a mixed-spec catalog version after
  * metadata-only spec evolution, or a streaming backlog spanning a
  * layout change): each underlying scan plans its own partitions
  * against its own directory layout, and the partition rides with the
  * factory whose data/partition schema split actually matches it.
  * Both halves are Spark's own serializable task payload
  * (FilePartition + ParquetPartitionReaderFactory), so embedding costs
  * one small object graph per task. `columnarOk` is the BATCH-uniform
  * columnar answer (Spark requires all partitions of one scan to
  * agree), computed by whoever planned the batch from the real
  * partition list. */
private[sources] final case class DispatchedPartition(
    inner: InputPartition, factory: PartitionReaderFactory,
    partSchema: StructType, columnarOk: Boolean) extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Serves [[DispatchedPartition]]s by delegating to the embedded
  * factory, PROJECTING rows to `target` when the part's read schema
  * differs (a `FileScan` always appends partition columns LAST, so two
  * specs that partition different columns serve the same column SET in
  * different ORDER — the by-name unsafe projection re-aligns them).
  * Columnar reads stay on exactly when every part is schema-aligned
  * and columnar-capable (the embedded flag; the columnar path never
  * needs the projection by construction). */
private[sources] final class DispatchReaderFactory(target: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case DispatchedPartition(inner, f, partSchema, _) =>
        val r = f.createReader(inner)
        if (partSchema == target) r
        else new PartitionReader[InternalRow] {
          import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
          private val proj = UnsafeProjection.create(
            target.fields.map { tf =>
              val si = partSchema.fields.indexWhere(
                _.name.equalsIgnoreCase(tf.name))
              require(si >= 0, s"spec-union part serves no column " +
                s"${tf.name} (part schema ${partSchema.simpleString})")
              BoundReference(si, partSchema.fields(si).dataType,
                partSchema.fields(si).nullable)
            }.toIndexedSeq)
          override def next(): Boolean = r.next()
          override def get(): InternalRow = proj(r.get())
          override def close(): Unit = r.close()
        }
      case other => throw new IllegalStateException(
        s"DispatchReaderFactory got a non-dispatched partition $other")
    }

  // only reachable when the embedded flag is true, which requires every
  // part schema-aligned with `target` — no projection is needed here
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    p match {
      case DispatchedPartition(inner, f, _, _) => f.createColumnarReader(inner)
      case other => throw new IllegalStateException(
        s"DispatchReaderFactory got a non-dispatched partition $other")
    }

  override def supportColumnarReads(p: InputPartition): Boolean = p match {
    case dp: DispatchedPartition => dp.columnarOk
    case _ => false
  }
}

/** The batch of a mixed-spec union scan: concatenates every part's
  * partitions, each tagged with its own factory; the single factory
  * Spark asks for is the dispatcher. */
private[sources] final class SpecUnionBatch(
    parts: Seq[(Batch, StructType)], target: StructType) extends Batch {

  private lazy val planned: Seq[(Array[InputPartition], PartitionReaderFactory, StructType)] =
    parts.map { case (b, s) => (b.planInputPartitions(), b.createReaderFactory(), s) }

  private lazy val columnarOk: Boolean = planned.forall { case (ps, f, s) =>
    s == target && ps.forall(f.supportColumnarReads)
  }

  override def planInputPartitions(): Array[InputPartition] =
    planned.flatMap { case (ps, f, s) =>
      ps.map(DispatchedPartition(_, f, s, columnarOk): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new DispatchReaderFactory(target)
}

/** The UNION read of a mixed-spec catalog version — the scan shape
  * metadata-only partition-spec evolution needs: after
  * `CALL system.evolve_layout` a version's data files span the current
  * layout (at the version root) plus one `_spec-<k>/` subtree per
  * prior spec, each file staying exactly where its spec wrote it (zero
  * rewrite). Each part arrives here as its OWN fully-armed scan
  * (pushdown replayed, static hidden-transform pruning applied,
  * runtime partition pruning wrapped), so per-spec pruning works
  * exactly as it does single-spec; this scan only unions the planned
  * work and forwards runtime filters to every part (a part that cannot
  * prune on a given column keeps its directories — the same
  * conservative contract every runtime filter here follows).
  *
  * Not implemented on purpose: [[org.apache.spark.sql.connector.read.
  * SupportsReportPartitioning]] — two specs cannot report one key
  * grouping, so a mixed version never claims SPJ (compaction /
  * `rewrite_layout` unifies the spec and SPJ returns). */
private[sources] final class SpecUnionScan(
    parts: Seq[Scan], scanName: String,
    diskSizeFallback: () => Long = () => -1L) extends Scan
    with SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  require(parts.nonEmpty, s"$scanName: spec union needs at least one part")
  private val target: StructType = parts.head.readSchema()

  // computed at most once per scan: an O(file metadata) walk over the
  // version — the honest floor when any part declines exact stats, so
  // a small post-evolve table never loses its AQE broadcast decision
  // to a missing estimate (empty stats read as "unknown = huge")
  private lazy val diskBytes: Long = diskSizeFallback()

  override def readSchema(): StructType = target
  override def description(): String =
    s"graft-spec-union(${parts.size} specs) ${parts.head.description()}"

  // fresh batch per call: runtime filters swap the parts' delegates,
  // and Spark re-plans through toBatch after filtering
  override def toBatch: Batch =
    new SpecUnionBatch(parts.map(p => (p.toBatch, p.readSchema())), target)

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    parts.flatMap {
      case f: SupportsRuntimeV2Filtering => f.filterAttributes().toSeq
      case _ => Nil
    }.groupBy(_.fieldNames().mkString(".")).map(_._2.head).toArray

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    parts.foreach {
      case f: SupportsRuntimeV2Filtering => f.filter(predicates)
      case _ => ()
    }

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val stats = parts.map {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        Some(s.estimateStatistics())
      case _ => None
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (stats.forall(_.exists(_.sizeInBytes().isPresent)))
          java.util.OptionalLong.of(
            stats.map(_.get.sizeInBytes().getAsLong).sum)
        else if (diskBytes >= 0L) java.util.OptionalLong.of(diskBytes)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (stats.forall(_.exists(_.numRows().isPresent)))
          java.util.OptionalLong.of(stats.map(_.get.numRows().getAsLong).sum)
        else java.util.OptionalLong.empty()
    }
  }
}
