package graft.sources

import java.nio.file.{Path => JPath}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, UnsafeProjection, Expression => CExpression}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ROW-LINEAGE METADATA COLUMNS for catalog tables — `_file` (the
  * version-relative path of the data file a row lives in) and `_pos`
  * (the row's index within that file, straight from the parquet
  * readers' row-index machinery): Iceberg's `_file`/`_pos` surface,
  * re-expressed over Spark's [[MetadataColumn]] contract. Queries can
  * `SELECT _file, _pos FROM t` for lineage/debugging, and — the
  * load-bearing consumer — the POSITIONAL merge-on-read path uses the
  * pair as the row id for tables with no usable PRIMARY KEY
  * (`DeltaRowLevel`): Spark resolves `rowId = [_file, _pos]` against
  * the table's metadata output, the scan serves both columns, and the
  * matched rows' (file, ordinal) pairs land as a positional delete
  * sidecar ([[MorDeletes.PosEntry]]).
  *
  * `_pos` is ALWAYS the row's ordinal in its file regardless of any
  * filters or live delete entries applied on the read path — the
  * readers populate the reserved row-index column from parquet row
  * group metadata, so pushdown, splits and MoR row drops never
  * renumber it. That invariance is what makes the ordinal a stable row
  * address for positional deletes. */
private[sources] object GraftMetadataColumns {
  val FileName = "_file"
  val PosName = "_pos"

  val columns: Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = FileName
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "version-relative path of the row's data file"
    },
    new MetadataColumn {
      override def name(): String = PosName
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row ordinal within the data file"
    })

  def isMeta(name: String): Boolean =
    name.equalsIgnoreCase(FileName) || name.equalsIgnoreCase(PosName)
}

/** The scan wrapper serving `_file`/`_pos`: splits every planned file
  * partition to ONE [[org.apache.spark.sql.execution.datasources
  * .PartitionedFile]] per task (the file identity must be constant per
  * reader — a multi-file task cannot tell which file a row came from),
  * and projects each inner row to the requested output order with
  * `_file` bound to the task's (version-relative) path literal and
  * `_pos` to the row-index column the builder added to the inner read
  * schema. Row readers only while active — the projection rewrites
  * rows. Applied OUTSIDE the delete-applying wrapper, so `_pos`
  * arrives as the original file ordinal of the SURVIVING rows. */
private[sources] final class MetadataColumnsScan(
    private[sources] val inner: Scan, versionDir: JPath,
    private[sources] val output: StructType) extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  override def readSchema(): StructType = output
  override def description(): String =
    s"graft-metadata-cols(${output.fieldNames.filter(
      GraftMetadataColumns.isMeta).mkString(",")}) ${inner.description()}"
  override def toBatch: Batch = this

  override def equals(o: Any): Boolean = o match {
    case m: MetadataColumnsScan => inner == m.inner && output == m.output
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(inner, output)

  override def planInputPartitions(): Array[InputPartition] = {
    val out = Seq.newBuilder[InputPartition]
    var idx = 0
    def nextIdx(): Int = { val i = idx; idx += 1; i }
    def split(p: InputPartition): Unit = p match {
      case k: KeyedFilePartition =>
        k.files.foreach { f =>
          out += new KeyedFilePartition(nextIdx(), Array(f),
            k.partitionKey())
        }
      case f: FilePartition =>
        f.files.foreach(pf => out += FilePartition(nextIdx(), Array(pf)))
      case d: DispatchedPartition =>
        d.inner match {
          case f: FilePartition =>
            f.files.foreach(pf =>
              out += d.copy(inner = FilePartition(nextIdx(), Array(pf))))
          case _ => out += d
        }
      case other => out += other
    }
    inner.toBatch.planInputPartitions().foreach(split)
    out.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MetadataColumnsReaderFactory(inner.toBatch.createReaderFactory(),
      versionDir.toString, inner.readSchema(), output)

  override def filterAttributes(): Array[NamedReference] = inner match {
    case f: SupportsRuntimeV2Filtering => f.filterAttributes()
    case _ => Array.empty
  }
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    inner match {
      case f: SupportsRuntimeV2Filtering => f.filter(predicates)
      case _ => ()
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

private[sources] final class MetadataColumnsReaderFactory(
    inner: PartitionReaderFactory, versionDirStr: String,
    innerSchema: StructType, output: StructType)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  private def fileOf(p: InputPartition): Option[String] = p match {
    case d: DispatchedPartition => fileOf(d.inner)
    case f: FilePartition =>
      val rels = f.files.toSeq.map { pf =>
        val disk =
          try new java.net.URI(pf.urlEncodedPath).getPath
          catch { case _: java.net.URISyntaxException => null }
        val vPrefix = versionDirStr + "/"
        if (disk == null) pf.urlEncodedPath
        else if (disk.startsWith(vPrefix)) disk.substring(vPrefix.length)
        else disk
      }.distinct
      if (rels.length == 1) Some(rels.head) else None
    case _ => None
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rel = fileOf(p).getOrElse(throw new IllegalStateException(
      "metadata-column scan planned a task without a single file " +
        s"identity: $p"))
    val rixIdx = innerSchema.fieldNames.indexWhere(
      _.equalsIgnoreCase(MorDeletes.RowIndexCol))
    val exprs: Seq[CExpression] = output.fields.toSeq.map { f =>
      if (f.name.equalsIgnoreCase(GraftMetadataColumns.FileName))
        Literal(UTF8String.fromString(rel), StringType)
      else if (f.name.equalsIgnoreCase(GraftMetadataColumns.PosName)) {
        if (rixIdx < 0) throw new IllegalStateException(
          "_pos requested but the inner scan carries no row-index column")
        BoundReference(rixIdx, LongType, nullable = false)
      } else {
        val i = innerSchema.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
        if (i < 0) throw new IllegalStateException(
          s"output column ${f.name} missing from the inner read schema")
        BoundReference(i, innerSchema.fields(i).dataType,
          innerSchema.fields(i).nullable)
      }
    }
    val r = inner.createReader(p)
    new PartitionReader[InternalRow] {
      private val proj = UnsafeProjection.create(exprs.toArray)
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(r.get())
      override def close(): Unit = r.close()
    }
  }
}
