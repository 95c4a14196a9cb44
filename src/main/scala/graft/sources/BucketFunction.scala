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

/** `days(ts)` — Iceberg's day transform: rows land in a hidden
  * `_gd_<col>=<utc epoch day>` directory derived from a timestamp/date
  * column, so an event stream gets daily partitioning WITHOUT the
  * derived date column every classic layout forces into the schema
  * (the reference's silver materializes `interaction_date` for exactly
  * this; CM:327-329). Day ordinals are UTC-fixed (`floorDiv(epoch
  * seconds, 86400)`), never session-timezone-dependent — two writers
  * in different zones route identically. */
private[sources] final case class DaysPart(col: String)
    extends PartitionField {
  def srcCol: String = col
  def dirName: String = s"_gd_$col"
}

private[sources] object PartitionField {
  private val BucketRe = """bucket\((\d+),(.+)\)""".r
  private val DaysRe = """days\((.+)\)""".r

  /** `_partitions.txt` line form: `col` (identity, the historical
    * format — old tables parse unchanged), `bucket(n,col)`, or
    * `days(col)`. */
  def serialize(fields: Seq[PartitionField]): String =
    fields.map {
      case IdentityPart(c) => c
      case BucketPart(n, c) => s"bucket($n,$c)"
      case DaysPart(c) => s"days($c)"
    }.mkString("\n")

  def parseLine(line: String): PartitionField = line match {
    case BucketRe(n, c) => BucketPart(n.toInt, c.trim)
    case DaysRe(c) => DaysPart(c.trim)
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
    import org.apache.spark.sql.functions.{col, datediff, floor, hash, lit, pmod}
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType}
    fields.foldLeft(df) {
      case (d, b: BucketPart) =>
        d.withColumn(b.dirName, pmod(hash(col(b.col)), lit(b.numBuckets)))
      case (d, p: DaysPart) =>
        // epoch day, session-timezone-independent: zoned timestamp→long
        // is epoch SECONDS (floorDiv micros) and floor handles
        // pre-1970; NTZ routes through its wall-clock date (casting
        // NTZ to a number is not a thing). Exactly
        // GraftDaysFunction.daysOf as an expression. A null timestamp
        // yields a null day (the hive default-partition dir).
        import org.apache.spark.sql.functions.to_date
        import org.apache.spark.sql.types.TimestampNTZType
        val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
        val dayExpr = d.schema.fields
          .find(_.name.equalsIgnoreCase(p.col))
          .map(_.dataType)
          .getOrElse(org.apache.spark.sql.types.TimestampType) match {
          case DateType => datediff(col(p.col), epoch)
          case TimestampNTZType => datediff(to_date(col(p.col)), epoch)
          case _ => floor(col(p.col).cast(LongType) / lit(86400L)).cast(IntegerType)
        }
        d.withColumn(p.dirName, dayExpr)
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

/** The `days` V2 function backing [[DaysPart]]'s reported
  * `KeyGroupedPartitioning(days(col))` — same role as
  * [[GraftBucketFunction]] for buckets: write routing, runtime day
  * pruning and this function all share [[GraftDaysFunction.daysOf]]. */
private[graft] object GraftDaysFunction extends UnboundFunction {
  import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

  def supports(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || dt == DateType

  /** Epoch day of a CATALYST-INTERNAL value: micros for timestamps
    * (`floorDiv` twice composes correctly for all signs; UTC for
    * zoned timestamps, the wall-clock day for NTZ — both
    * session-timezone-independent), days-int for dates (already the
    * answer). */
  def daysOf(value: Any, dt: DataType): Int = dt match {
    case DateType => value.asInstanceOf[Int]
    case _ =>
      Math.floorDiv(value.asInstanceOf[Long], 86400L * 1000000L).toInt
  }

  override def name(): String = "days"
  override def description(): String =
    "days(col) — UTC epoch day: floorDiv(epoch_seconds, 86400)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"days expects one timestamp/date column, got ${inputType.simpleString}")
    val dt = inputType.fields(0).dataType
    require(supports(dt),
      s"days does not support ${dt.simpleString} (timestamp, " +
        "timestamp_ntz or date only)")
    new BoundDays(dt)
  }
}

private[sources] final class BoundDays(dt: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = "days"
  override def canonicalName(): String = s"graft.days(${dt.catalogString})"
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else Integer.valueOf(GraftDaysFunction.daysOf(input.get(0, dt), dt))
}
