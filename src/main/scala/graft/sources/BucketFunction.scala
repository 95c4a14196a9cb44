package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** One field of a table's partition spec — identity (a hive directory
  * per column value, the classic layout) or `bucket(n, col)` (a hidden
  * `_gb_<col>=<k>` directory per hash bucket, Iceberg's bucket
  * transform). Bucketing is the partition strategy for HIGH-CARDINALITY
  * keys at 100 TB: identity-partitioning a billion-customer key would
  * create a billion directories, while `bucket(1024, custkey)` caps the
  * layout at 1024 and still gives storage-partitioned joins (both sides
  * co-hashed → zero-exchange joins), runtime bucket pruning (a
  * selective dim filter keeps only the buckets its keys hash into) and
  * bucket-granular MERGE copy-on-write. The bucket id column is HIDDEN
  * partitioning: derived at write time, never part of the table schema
  * (reference's Iceberg silver catalog is the same shape:
  * k8s/spark/43-silver-build.yaml:54). */
private[sources] sealed trait PartitionField {
  /** The SCHEMA column the field derives from (= the join/filter key). */
  def srcCol: String
  /** The directory-level column name in the hive layout. */
  def dirName: String
}

private[sources] final case class IdentityPart(col: String)
    extends PartitionField {
  def srcCol: String = col
  def dirName: String = col
}

private[sources] final case class BucketPart(numBuckets: Int, col: String)
    extends PartitionField {
  require(numBuckets > 0, s"bucket($numBuckets, $col): need > 0 buckets")
  def srcCol: String = col
  def dirName: String = s"_gb_$col"
}

private[sources] object PartitionField {
  private val BucketRe = """bucket\((\d+),(.+)\)""".r

  /** `_partitions.txt` line form: `col` (identity, the historical
    * format — old tables parse unchanged) or `bucket(n,col)`. */
  def serialize(fields: Seq[PartitionField]): String =
    fields.map {
      case IdentityPart(c) => c
      case BucketPart(n, c) => s"bucket($n,$c)"
    }.mkString("\n")

  def parseLine(line: String): PartitionField = line match {
    case BucketRe(n, c) => BucketPart(n.toInt, c.trim)
    case c => IdentityPart(c)
  }

  /** Materialize each bucket field's hidden directory column on `df` —
    * the write-time router. `pmod(hash(col), n)` is exactly
    * [[GraftBucketFunction.bucketOf]] as a codegen'd expression
    * (`functions.hash` = Murmur3 seed 42), so write routing, the V2
    * bucket function and the runtime bucket pruner can never disagree.
    * `withColumn` REPLACES an existing column of the same name, so a
    * compaction re-read that already carried the directory column
    * recomputes it to identical values. */
  def materializeDirCols(df: org.apache.spark.sql.DataFrame,
                         fields: Seq[PartitionField]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    fields.foldLeft(df) {
      case (d, b: BucketPart) =>
        d.withColumn(b.dirName, pmod(hash(col(b.col)), lit(b.numBuckets)))
      case (d, _) => d
    }
  }
}

/** The catalog's `bucket(numBuckets, col)` V2 function — loaded by
  * Spark's `V2ExpressionUtils` from the table's [[org.apache.spark.sql.
  * connector.catalog.FunctionCatalog]] when a scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`, and bound here so both
  * sides of a storage-partitioned join agree they hash identically
  * (`canonicalName` equality is Spark's compatibility test). The hash
  * MUST match the write path's routing expression
  * (`pmod(hash(col), n)`, `functions.hash` = Murmur3 seed 42) — rows
  * were placed in directories by that expression, and SPJ's correctness
  * rests on "same key value ⇒ same reported partition" holding on both
  * sides. [[GraftBucketFunction.bucketOf]] is that single definition,
  * shared by the write router, the runtime bucket pruner and this
  * function's `produceResult`. */
private[graft] object GraftBucketFunction extends UnboundFunction {

  /** Types the bucket transform accepts — the hashable scalar keys; the
    * same list `createTable` validates a bucket spec against. */
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         DateType | TimestampType => true
    case _ => false
  }

  /** Bucket id of a value in CATALYST INTERNAL form (UTF8String for
    * strings, days-int for dates): `pmod(murmur3(value, seed 42), n)`.
    * Null hashes to the seed itself — exactly what `functions.hash`
    * evaluates to on a null child — so null rows land in a regular
    * bucket, never a `__HIVE_DEFAULT_PARTITION__` directory. */
  def bucketOf(value: Any, dt: DataType, numBuckets: Int): Int = {
    val h = if (value == null) 42
            else Murmur3HashFunction.hash(value, dt, 42L).toInt
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — pmod(murmur3_hash(col, seed=42), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket expects (numBuckets INT, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.simpleString)
    val dt = inputType.fields(1).dataType
    require(supports(dt),
      s"bucket does not support ${dt.simpleString} keys (supported: " +
        "tinyint/smallint/int/bigint/string/date/timestamp)")
    new BoundBucket(dt)
  }
}

private[sources] final class BoundBucket(dt: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // the SPJ compatibility token: two scans' bucket transforms are
  // "the same function" iff these strings match — type-qualified so a
  // bigint bucketing never false-matches a string bucketing
  override def canonicalName(): String = s"graft.bucket(${dt.catalogString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = if (input.isNullAt(1)) null else input.get(1, dt)
    Integer.valueOf(GraftBucketFunction.bucketOf(v, dt, n))
  }
}
