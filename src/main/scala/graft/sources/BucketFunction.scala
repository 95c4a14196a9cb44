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

/** `truncate(w, col)` — Iceberg's truncate transform: rows land in a
  * hidden `_gt_<col>=<truncated value>` directory — the first `w`
  * characters for strings, the value floored to a multiple of `w` for
  * integers. The ORDER-PRESERVING coarsening: unlike hash buckets the
  * directory id is monotone in the value, so range predicates prune
  * statically (`WHERE sku >= 'AB'` keeps only prefixes ≥ 'AB'), while
  * still capping directory counts on high-cardinality keys (1 M SKUs →
  * at most 26² two-letter prefixes). The truncated id keeps the SOURCE
  * column's type — string prefixes for strings — which is why its key
  * type in SPJ reporting is the source type, not INT. */
private[sources] final case class TruncatePart(width: Int, col: String)
    extends PartitionField {
  require(width > 0, s"truncate($width, $col): need a positive width")
  def srcCol: String = col
  def dirName: String = s"_gt_$col"
}

/** A hidden TIME transform — the Iceberg `years`/`months`/`days`/
  * `hours` family: rows land in a hidden `_g?_<col>=<unit ordinal>`
  * directory derived from a timestamp/date column, so an event stream
  * gets time partitioning WITHOUT the derived date column every
  * classic layout forces into the schema (the reference's silver
  * materializes `interaction_date` for exactly this; CM:327-329).
  * Ordinals are UTC-fixed epochs (days/hours: `floorDiv` of the epoch
  * instant; months/years: calendar units since 1970-01), never
  * session-timezone-dependent — two writers in different zones route
  * identically. All four are MONOTONE in the source value (unlike hash
  * buckets), so range predicates prune directories statically. The
  * granularity ladder is the retention/scale dial: `hours` for
  * short-retention hot streams, `days` for the classic event table,
  * `months`/`years` for long-retention archives where daily dirs
  * would mean 36 500 directories a decade. */
private[sources] sealed trait TimeTransformPart extends PartitionField {
  def col: String
  final def srcCol: String = col
  /** Transform name — also the V2 function + `Expressions.*` name. */
  def unit: String
  /** The backing V2 function: write routing, static + runtime pruning
    * and SPJ all share its `idOf`, so they can never disagree. */
  def fn: GraftTimeFunction
  final def idOf(value: Any, dt: DataType): Int = fn.idOf(value, dt)
}

private[sources] final case class DaysPart(col: String)
    extends TimeTransformPart {
  def dirName: String = s"_gd_$col"
  def unit: String = "days"
  def fn: GraftTimeFunction = GraftDaysFunction
}

private[sources] final case class HoursPart(col: String)
    extends TimeTransformPart {
  def dirName: String = s"_gh_$col"
  def unit: String = "hours"
  def fn: GraftTimeFunction = GraftHoursFunction
}

private[sources] final case class MonthsPart(col: String)
    extends TimeTransformPart {
  def dirName: String = s"_gm_$col"
  def unit: String = "months"
  def fn: GraftTimeFunction = GraftMonthsFunction
}

private[sources] final case class YearsPart(col: String)
    extends TimeTransformPart {
  def dirName: String = s"_gy_$col"
  def unit: String = "years"
  def fn: GraftTimeFunction = GraftYearsFunction
}

private[sources] object PartitionField {
  private val BucketRe = """bucket\((\d+),(.+)\)""".r
  private val TruncateRe = """truncate\((\d+),(.+)\)""".r
  private val TimeRe = """(days|hours|months|years)\((.+)\)""".r

  def timePart(unit: String, col: String): TimeTransformPart = unit match {
    case "days" => DaysPart(col)
    case "hours" => HoursPart(col)
    case "months" => MonthsPart(col)
    case "years" => YearsPart(col)
  }

  /** One field's display/serialized form — `col` (identity),
    * `bucket(n,col)`, or `<unit>(col)`. */
  def show(f: PartitionField): String = f match {
    case IdentityPart(c) => c
    case BucketPart(n, c) => s"bucket($n,$c)"
    case TruncatePart(w, c) => s"truncate($w,$c)"
    case t: TimeTransformPart => s"${t.unit}(${t.col})"
  }

  /** The V2 transform a field reports — the single mapping shared by
    * SPJ's KeyGroupedPartitioning and the row-level-op table's
    * `partitioning()`. */
  def v2Transform(f: PartitionField)
      : org.apache.spark.sql.connector.expressions.Transform = {
    import org.apache.spark.sql.connector.expressions.Expressions
    f match {
      case IdentityPart(c) => Expressions.identity(c)
      case BucketPart(n, c) => Expressions.bucket(n, c)
      case TruncatePart(w, c) => Expressions.apply("truncate",
        Expressions.literal(w), Expressions.column(c))
      case DaysPart(c) => Expressions.days(c)
      case HoursPart(c) => Expressions.hours(c)
      case MonthsPart(c) => Expressions.months(c)
      case YearsPart(c) => Expressions.years(c)
    }
  }

  /** `_partitions.txt` line form: [[show]] per field (identity is the
    * historical bare-column format — old tables parse unchanged). */
  def serialize(fields: Seq[PartitionField]): String =
    fields.map(show).mkString("\n")

  def parseLine(line: String): PartitionField = line match {
    case BucketRe(n, c) => BucketPart(n.toInt, c.trim)
    case TruncateRe(w, c) => TruncatePart(w.toInt, c.trim)
    case TimeRe(u, c) => timePart(u, c.trim)
    case c => IdentityPart(c)
  }

  /** Parse a whole comma-joined spec string — `bucket(4,k), days(ts)`
    * is two fields; the split respects parens (the comma inside
    * `bucket(4,k)` is the transform's own). The shared parser of the
    * `rewrite_layout`/`evolve_layout` procedure arguments and the
    * `_legacy_specs.txt` sidecar lines; '' parses to the empty
    * (unpartitioned) spec. */
  def parseSpecString(spec: String): Seq[PartitionField] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    spec.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty).map(parseLine)
  }

  /** Should a partitioned write HASH-CLUSTER rows on the partition
    * columns first (Iceberg's `write.distribution-mode=hash`)? The
    * measured small-files cliff (PERF.md: 720 hourly dirs, 12 s
    * unclustered vs 3.4 s clustered at sf0.1 — every task opens a
    * writer per directory it sees, tasks × dirs tiny files) says any
    * layout finer than ~100 directories wants it on; clustering a
    * COARSE layout instead LOSES write parallelism (≤ n-dirs active
    * tasks after the exchange). The conf is therefore tri-state:
    * `true` / `false` force it; unset (= `auto`) turns it on exactly
    * where fineness is knowable WITHOUT scanning the data — an
    * `hours` transform (any realistic retention exceeds 100 hourly
    * dirs), a static bucket-count product over 100, or the canonical
    * composite `(days, bucket)` event layout (≥ 8 buckets × weeks of
    * days). `days`/`months`/`truncate` alone carry no static
    * cardinality bound, so auto stays off for them — set `true`
    * explicitly (the 100 TB deployment posture for any layout known
    * to be fine). */
  def clusterWrite(spark: org.apache.spark.sql.SparkSession,
                   fields: Seq[PartitionField]): Boolean =
    spark.conf
      .getOption("spark.sql.catalog.graft.write.clusterByPartitions") match {
      case Some("true") => fields.nonEmpty
      case Some("false") => false
      case _ => // auto
        val bucketProduct = fields.collect { case b: BucketPart =>
          b.numBuckets.toLong
        }.product
        fields.exists(_.isInstanceOf[HoursPart]) ||
          (fields.exists(_.isInstanceOf[BucketPart]) && bucketProduct > 100) ||
          (fields.exists(_.isInstanceOf[DaysPart]) &&
            fields.exists(_.isInstanceOf[BucketPart]))
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
      case (d, t: TruncatePart) =>
        // exactly GraftTruncateFunction.truncOf as a codegen'd
        // expression: string prefix, or integer floored to a multiple
        // of the width (pmod, so negatives floor toward -∞ like
        // Iceberg). A null value yields a null id (hive default dir).
        import org.apache.spark.sql.functions.substring
        import org.apache.spark.sql.types.StringType
        val expr = d.schema.fields
          .find(_.name.equalsIgnoreCase(t.col))
          .map(_.dataType).getOrElse(StringType) match {
          case StringType => substring(col(t.col), 1, t.width)
          case dt => (col(t.col) - pmod(col(t.col), lit(t.width))).cast(dt)
        }
        d.withColumn(t.dirName, expr)
      case (d, p: TimeTransformPart) =>
        val dt = d.schema.fields
          .find(_.name.equalsIgnoreCase(p.col))
          .map(_.dataType)
          .getOrElse(org.apache.spark.sql.types.TimestampType)
        d.withColumn(p.dirName, timeDirExpr(p, dt))
      case (d, _) => d
    }
  }

  /** The unit ordinal of `p.col` as a codegen'd expression — exactly
    * `p.fn.idOf` (the pruning/SPJ definition), session-timezone-
    * independent in every branch: zoned timestamp→long is UTC epoch
    * SECONDS (floorDiv micros, so floor handles pre-1970); NTZ routes
    * through its wall-clock date/hour fields (casting NTZ to a number
    * is not a thing, and `to_date`/`hour` on NTZ read the wall clock
    * directly); dates carry their day ordinal. Months/years go
    * value → UTC calendar date → TZ-free date-field arithmetic. A null
    * timestamp yields a null ordinal (the hive default-partition
    * dir). */
  private def timeDirExpr(p: TimeTransformPart,
                          dt: DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, date_add, datediff, floor, hour, lit, month, to_date, year}
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType}
    val c = col(p.col)
    val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
    // the UTC calendar date of the value (date functions are TZ-free)
    lazy val utcDate = dt match {
      case DateType => c
      case TimestampNTZType => to_date(c)
      case _ => date_add(epoch,
        floor(c.cast(LongType) / lit(86400L)).cast(IntegerType))
    }
    p.unit match {
      case "days" => dt match {
        case DateType => datediff(c, epoch)
        case TimestampNTZType => datediff(to_date(c), epoch)
        case _ => floor(c.cast(LongType) / lit(86400L)).cast(IntegerType)
      }
      case "hours" => dt match {
        // wall-clock hours since epoch: day*24 + hour-of-day (hour()
        // on NTZ is the wall-clock field, never session-TZ-shifted)
        case TimestampNTZType =>
          (datediff(to_date(c), epoch) * lit(24) + hour(c)).cast(IntegerType)
        case _ => floor(c.cast(LongType) / lit(3600L)).cast(IntegerType)
      }
      case "months" =>
        ((year(utcDate) - lit(1970)) * lit(12) + month(utcDate) - lit(1))
          .cast(IntegerType)
      case "years" => (year(utcDate) - lit(1970)).cast(IntegerType)
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

/** The catalog's `truncate(width, col)` V2 function — [[TruncatePart]]'s
  * counterpart to [[GraftBucketFunction]]: the single truncation
  * definition shared by the write router's expression
  * (`substring` / `v - pmod(v, w)`), the static + runtime pruners, and
  * SPJ function resolution. The result keeps the SOURCE type (a string
  * prefix, a floored integer), so `canonicalName` is type-qualified and
  * co-truncated tables group compatibly. */
private[graft] object GraftTruncateFunction extends UnboundFunction {

  def supports(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Truncated id of a value in CATALYST INTERNAL form: UTF8String
    * prefix for strings (SQL substring semantics — the same definition
    * as the write expression), floor-to-multiple for integrals
    * (`floorMod`, so negatives floor toward -∞ like Iceberg). Null in,
    * null out (the hive default directory). */
  def truncOf(value: Any, dt: DataType, width: Int): Any =
    if (value == null) null
    else dt match {
      case StringType =>
        value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .substringSQL(1, width)
      case ByteType =>
        val v = value.asInstanceOf[Byte]
        (v - Math.floorMod(v.toInt, width)).toByte
      case ShortType =>
        val v = value.asInstanceOf[Short]
        (v - Math.floorMod(v.toInt, width)).toShort
      case IntegerType =>
        val v = value.asInstanceOf[Int]
        v - Math.floorMod(v, width)
      case LongType =>
        val v = value.asInstanceOf[Long]
        v - Math.floorMod(v, width.toLong)
      case other => throw new IllegalArgumentException(
        s"truncate does not support ${other.simpleString}")
    }

  override def name(): String = "truncate"
  override def description(): String =
    "truncate(width, col) — string prefix / integer floored to a " +
      "multiple of width"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate expects (width INT, col), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"truncate's first argument is the INT width, got " +
        inputType.fields(0).dataType.simpleString)
    val dt = inputType.fields(1).dataType
    require(supports(dt),
      s"truncate does not support ${dt.simpleString} keys (supported: " +
        "tinyint/smallint/int/bigint/string)")
    new BoundTruncate(dt)
  }
}

private[sources] final class BoundTruncate(dt: DataType)
    extends ScalarFunction[AnyRef] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
  override def resultType(): DataType = dt
  override def name(): String = "truncate"
  override def canonicalName(): String = s"graft.truncate(${dt.catalogString})"
  override def produceResult(input: InternalRow): AnyRef = {
    val w = input.getInt(0)
    if (input.isNullAt(1)) null
    else GraftTruncateFunction.truncOf(input.get(1, dt), dt, w)
      .asInstanceOf[AnyRef]
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

/** The time-transform V2 function family backing [[TimeTransformPart]]'s
  * reported `KeyGroupedPartitioning(<unit>(col))` — same role as
  * [[GraftBucketFunction]] for buckets: write routing, static + runtime
  * pruning and these functions all share one `idOf` per unit. Ordinals
  * of a CATALYST-INTERNAL value: micros for timestamps (`floorDiv`
  * composes correctly for all signs; UTC for zoned timestamps, the
  * wall clock for NTZ — both session-timezone-independent), days-int
  * for dates. `hours` is timestamp-only (a date has no hour — Iceberg
  * refuses it too). */
private[graft] sealed abstract class GraftTimeFunction(
    fnName: String, dateOk: Boolean) extends UnboundFunction {
  import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

  final def supports(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType || (dateOk && dt == DateType)

  def idOf(value: Any, dt: DataType): Int

  /** Is `value` the FIRST instant of its unit? Drives the static
    * pruner's exclusive upper bounds: `ts < '2024-02-01T00:00'` on a
    * days/months table excludes the boundary unit entirely — the
    * canonical retention/range predicate shape — while
    * `ts < '2024-02-01T05:00'` keeps it (conservative floor). */
  def isUnitStart(value: Any, dt: DataType): Boolean

  /** A date carries no sub-day instant; a timestamp is day-aligned iff
    * its micros floor to the day. */
  protected final def dayAligned(value: Any, dt: DataType): Boolean =
    dt == org.apache.spark.sql.types.DateType ||
      Math.floorMod(value.asInstanceOf[Long], 86400L * 1000000L) == 0L

  /** Epoch day of an internal value — the shared stepping stone. */
  protected final def epochDayOf(value: Any, dt: DataType): Int = dt match {
    case DateType => value.asInstanceOf[Int]
    case _ =>
      Math.floorDiv(value.asInstanceOf[Long], 86400L * 1000000L).toInt
  }

  protected final def utcDateOf(value: Any, dt: DataType): java.time.LocalDate =
    java.time.LocalDate.ofEpochDay(epochDayOf(value, dt).toLong)

  override final def name(): String = fnName
  override final def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"$fnName expects one ${if (dateOk) "timestamp/date" else "timestamp"} " +
        s"column, got ${inputType.simpleString}")
    val dt = inputType.fields(0).dataType
    require(supports(dt),
      s"$fnName does not support ${dt.simpleString} (timestamp, " +
        s"timestamp_ntz${if (dateOk) " or date" else ""} only)")
    new BoundTime(dt, this)
  }
}

private[graft] object GraftDaysFunction
    extends GraftTimeFunction("days", dateOk = true) {
  /** Kept under its historical name — pruning call sites read better. */
  def daysOf(value: Any, dt: DataType): Int = epochDayOf(value, dt)
  override def idOf(value: Any, dt: DataType): Int = epochDayOf(value, dt)
  override def isUnitStart(value: Any, dt: DataType): Boolean =
    dayAligned(value, dt)
  override def description(): String =
    "days(col) — UTC epoch day: floorDiv(epoch_seconds, 86400)"
}

private[graft] object GraftHoursFunction
    extends GraftTimeFunction("hours", dateOk = false) {
  override def idOf(value: Any, dt: DataType): Int =
    Math.floorDiv(value.asInstanceOf[Long], 3600L * 1000000L).toInt
  override def isUnitStart(value: Any, dt: DataType): Boolean =
    Math.floorMod(value.asInstanceOf[Long], 3600L * 1000000L) == 0L
  override def description(): String =
    "hours(col) — UTC epoch hour: floorDiv(epoch_seconds, 3600)"
}

private[graft] object GraftMonthsFunction
    extends GraftTimeFunction("months", dateOk = true) {
  override def idOf(value: Any, dt: DataType): Int = {
    val d = utcDateOf(value, dt)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
  override def isUnitStart(value: Any, dt: DataType): Boolean =
    utcDateOf(value, dt).getDayOfMonth == 1 && dayAligned(value, dt)
  override def description(): String =
    "months(col) — UTC months since 1970-01: (year-1970)*12 + month-1"
}

private[graft] object GraftYearsFunction
    extends GraftTimeFunction("years", dateOk = true) {
  override def idOf(value: Any, dt: DataType): Int =
    utcDateOf(value, dt).getYear - 1970
  override def isUnitStart(value: Any, dt: DataType): Boolean =
    utcDateOf(value, dt).getDayOfYear == 1 && dayAligned(value, dt)
  override def description(): String =
    "years(col) — UTC years since 1970: year - 1970"
}

private[sources] final class BoundTime(dt: DataType, fn: GraftTimeFunction)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(dt)
  override def resultType(): DataType = IntegerType
  override def name(): String = fn.name()
  // the SPJ compatibility token — unit- and type-qualified, so a
  // days(timestamp) grouping never false-matches months or a date key
  override def canonicalName(): String =
    s"graft.${fn.name()}(${dt.catalogString})"
  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null
    else Integer.valueOf(fn.idOf(input.get(0, dt), dt))
}
