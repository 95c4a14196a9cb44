package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => V2Expression}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.StructType

/** A [[FilePartition]] that also names the partition-column values all
  * of its files share — the [[HasPartitionKey]] handshake Spark's
  * storage-partitioned join machinery groups tasks by. Subclassing (not
  * wrapping) keeps the inner parquet reader factory working unchanged:
  * it sees the FilePartition it expects. */
private[sources] final class KeyedFilePartition(
    index: Int, files: Array[PartitionedFile], key: InternalRow)
    extends FilePartition(index, files) with HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** STORAGE-PARTITIONED JOIN support for the atomic catalog — the
  * co-located-join path a lakehouse format's tables get from reporting
  * their partition layout to Spark (SPARK-37375; what Iceberg tables do
  * at scale): when BOTH sides of an equi-join are partitioned on the
  * join keys, Spark plans the join with ZERO shuffle — each task joins
  * one partition-value group read straight from both tables' files.
  * At 100 TB this removes the dominant cost of fact-to-fact joins
  * between co-partitioned tables (two full-table exchanges).
  *
  * Mechanics: wraps the delegated parquet [[Scan]] and (a) reports
  * `KeyGroupedPartitioning(identity(partCols), nDistinctKeys)` through
  * [[SupportsReportPartitioning]], (b) re-plans the inner scan's input
  * partitions so every task holds files of exactly ONE partition value,
  * tagged with [[HasPartitionKey]] — Spark's `BatchScanExec` then
  * groups same-key tasks (`spark.sql.sources.v2.bucketing.enabled`) and
  * `EnsureRequirements` recognizes the two sides as co-partitioned.
  * Within one partition value the inner scan's task packing is kept, so
  * a non-join read of a wrapped scan parallelizes exactly as before up
  * to partition-boundary splits.
  *
  * The wrap is applied by [[PointerTable]]'s scan builder ONLY when
  * `spark.sql.sources.v2.bucketing.enabled` is true in the building
  * session AND the scan still carries every partition column (a scan
  * that pruned them away has no per-file key to report) — so the
  * default read path keeps its task packing, and sessions that opt
  * into v2 bucketing get the exchange-free plan.
  * StoragePartitionedJoinSpec pins both the plan shape (no shuffle
  * exchange under the join) and the joined rows. */
/** The full parquet pushdown protocol — filters, column pruning,
  * aggregates, variant extraction — forwarded verbatim to the real
  * [[ParquetScanBuilder]], with a `build()` that wraps the resulting
  * scan for the table's runtime behaviors: [[KeyGroupedParquetScan]]
  * (storage-partitioned joins) when the building session has v2
  * bucketing enabled, else [[RuntimePrunedParquetScan]] (dynamic
  * partition pruning for star-schema joins) — both only while the scan
  * still carries every partition column. The planner feature-tests the
  * builder's interfaces, so every interface the parquet builder
  * implements must be declared here or its pushdown silently turns off
  * (PlanQualitySpec's pushdown asserts guard that). A subclass override
  * of `build()` is impossible — the parent narrows the return type to
  * ParquetScan. The pruneColumns/pushFilters arguments are CAPTURED so
  * the DPP scan can replay the original pushdown onto its pruned
  * delegate. */
private[sources] final class KeyGroupedParquetScanBuilder(
    inner: ParquetScanBuilder, session: SparkSession, scanName: String,
    versionDir: java.nio.file.Path, tableSchema: StructType,
    parts: Seq[String])
    extends org.apache.spark.sql.connector.read.ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownVariantExtractions {
  import org.apache.spark.sql.catalyst.expressions.{Expression => CExpression}
  import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
  import org.apache.spark.sql.connector.read.VariantExtraction

  private var requiredSchema: Option[StructType] = None
  private var dataFilters: Seq[CExpression] = Nil
  private var aggPushed = false

  override def pruneColumns(requiredSchema: StructType): Unit = {
    this.requiredSchema = Some(requiredSchema)
    inner.pruneColumns(requiredSchema)
  }
  override def pushFilters(filters: Seq[CExpression]): Seq[CExpression] = {
    dataFilters = filters
    inner.pushFilters(filters)
  }
  override def pushedFilters: Array[V2Predicate] = inner.pushedFilters
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val pushed = inner.pushAggregation(aggregation)
    aggPushed ||= pushed
    pushed
  }
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(extractions)

  override def build(): Scan = inner.build() match {
    case ps: ParquetScan if ps.readPartitionSchema.fieldNames.toSeq == parts =>
      if (session.conf.get("spark.sql.sources.v2.bucketing.enabled",
          "false") == "true")
        new KeyGroupedParquetScan(ps, ps.readPartitionSchema)
      // a pushed aggregate changes the scan's output to the aggregate
      // rows — the DPP rebuild cannot replay that, so serve it as-is
      else if (aggPushed) ps
      else new RuntimePrunedParquetScan(ps, session, scanName, versionDir,
        tableSchema, parts, requiredSchema, dataFilters)
    case other => other
  }
}

private[sources] final class KeyGroupedParquetScan(
    inner: Scan, partSchema: StructType) extends Scan
    with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  // SPJ composes with DYNAMIC PARTITION PRUNING: the keyed task list is
  // already grouped by partition value, so a runtime filter just drops
  // the non-matching keys — no delegate rebuild — and Spark's
  // BatchScanExec regroups the surviving HasPartitionKey tasks
  // (value-set changes are the pushPartValues path it already handles
  // for mismatched sides). Conservative like every runtime filter here:
  // unparseable predicates and null keys keep their tasks.
  @volatile private var keepSets: Map[String, Set[Any]] = Map.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    partSchema.fieldNames.map(f => Expressions.column(f)
      .asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference])

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    val parsed = PartitionRuntimeFilters.parse(predicates)
    if (parsed.nonEmpty) keepSets = parsed
  }

  private def passes(key: InternalRow): Boolean =
    keepSets.forall { case (col, wanted) =>
      partSchema.fieldNames.indexWhere(_.equalsIgnoreCase(col)) match {
        case -1 => true // not a partition column at this level: keep
        case i =>
          val v = key.get(i, partSchema.fields(i).dataType)
          v == null || wanted.exists(w => java.util.Objects.equals(w, v))
      }
    }

  // forward the parquet scan's size/row estimates — hiding them would
  // make the relation fall back to the (huge) default size and the
  // planner would never broadcast this table
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    inner match {
      case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
        s.estimateStatistics()
      case _ => new org.apache.spark.sql.connector.read.Statistics {
        override def sizeInBytes() = java.util.OptionalLong.empty()
        override def numRows() = java.util.OptionalLong.empty()
      }
    }

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"graft-key-grouped(${partSchema.fieldNames.mkString(",")}) " +
      inner.description()

  // one InputPartition per (inner task, partition value): flatMapping
  // the inner packing instead of one-task-per-key keeps intra-partition
  // parallelism for plain scans; Spark groups same-key tasks itself
  // when a storage-partitioned join needs them co-located.
  //
  // PartitionedFile.partitionValues rows are per-task instances, so
  // grouping and counting go through a value projection (Seq equality
  // over the unwrapped column values); Spark's own task grouping wraps
  // the reported keys in InternalRowComparableWrapper and needs no
  // instance sharing.
  private def keyValues(r: InternalRow): Seq[Any] =
    partSchema.fields.indices.map(i => r.get(i, partSchema.fields(i).dataType))

  private lazy val keyed: Array[InputPartition] = {
    val fps = inner.toBatch.planInputPartitions()
    var idx = -1
    fps.flatMap {
      case fp: FilePartition =>
        fp.files.groupBy(f => keyValues(f.partitionValues)).toSeq
          .sortBy(_._1.mkString(" ")).map { case (_, files) =>
            idx += 1
            new KeyedFilePartition(idx, files,
              files.head.partitionValues.copy()): InputPartition
          }
      case other => // not a file partition: cannot key, serve as-is
        idx += 1; Seq(other)
    }
  }

  private lazy val nKeys: Int =
    keyed.collect { case k: KeyedFilePartition =>
      keyValues(k.partitionKey())
    }.distinct.length

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      partSchema.fieldNames.map(Expressions.identity(_): V2Expression),
      math.max(nKeys, 1))

  override def toBatch: Batch = new Batch {
    private val innerBatch = inner.toBatch
    override def planInputPartitions(): Array[InputPartition] =
      if (keepSets.isEmpty) keyed
      else keyed.filter {
        case k: KeyedFilePartition => passes(k.partitionKey())
        case _ => true // unkeyed partition: cannot prove, keep
      }
    override def createReaderFactory(): PartitionReaderFactory =
      innerBatch.createReaderFactory()
  }
}
