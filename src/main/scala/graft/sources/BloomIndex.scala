package graft.sources

import java.nio.file.{Files, Path => JPath, StandardCopyOption}
import java.util.{Base64, UUID}

import scala.jdk.CollectionConverters._

import org.apache.parquet.column.values.bloomfilter.{BlockSplitBloomFilter, BloomFilter}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.BlockMetaData
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, In, InSet, Or, Expression => CExpression, Literal => CLiteral}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BLOOM-FILTER FILE INDEX — point-lookup skipping where min/max
  * cannot prune: Iceberg's Puffin-blob / Delta's bloom-index posture.
  * Footer min/max stats ([[FileStats]]) skip files on SORTED layouts,
  * but a high-cardinality key written in arrival order (a uuid, a
  * content hash) gives every file a [min,max] spanning the whole key
  * space — a point lookup keeps every file. With the
  * `write.bloom-cols` TBLPROPERTY the layout writer has parquet build
  * its NATIVE column bloom filters (split-block xxHash64 — the format
  * other engines' readers also use for row-group filtering), and the
  * commit-time footer pass harvests each filter's bitset into a
  * table-level sidecar, so scan PLANNING can drop a file no probe key
  * can live in without opening any footer — the task is never
  * scheduled, the decisive difference from parquet's own row-group
  * bloom filtering (which runs inside an already-scheduled task) at
  * 100 TB.
  *
  * Store shape: `<tableDir>/_bloomidx/` TSV, APPEND-ONLY, one line per
  * (file, column, row group): `relPath \t col \t tag \t base64(bitset)`
  * — the same version-relative-path keying, self-healing backfill,
  * clone carry and live-path compaction contract as `_filestats`
  * (the two stores are written by the same commit-lock footer pass).
  * The `tag` pins the PHYSICAL shape the writer hashed (i/l/f/d/s/y),
  * so a probe only trusts a filter when the catalyst literal maps to
  * that exact shape — a shape mismatch keeps the file. Timestamps are
  * harvested only for MICROS physical storage (catalyst's own unit);
  * unsigned ints, decimals, INT96 and fixed-len binaries are never
  * harvested. Probing is may-match by construction: a missing store,
  * missing column, missing filter, unknown literal shape or any
  * non-equality predicate shape keeps the file; only a bloom MISS on
  * every row group of every conjunct-required key drops it — and a
  * bloom miss is a proof of absence (false positives only). */
private[sources] object BloomIndex {

  private val STORE = "_bloomidx"
  /** Bitsets above this size are not harvested (sidecar hygiene; the
    * file simply stays unskippable-by-bloom). Parquet's own default
    * max is 1 MiB. */
  private val MAX_BITSET = 1 << 20
  /** Store files above this count are compacted into one. */
  private val COMPACT_AT = 24
  /** Expected per-file NDV when neither `write.bloom-ndv` nor
    * `write.target-file-size-rows` says better (~117 KiB bitset at
    * parquet's default 1% fpp). */
  private val DEFAULT_NDV = 100000L

  def probingEnabled(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.getOption("spark.sql.catalog.graft.read.bloomSkipping")
      .forall(_ != "false")

  // ---- write-time options (consumed by writeLayout) ----

  /** Parquet writer options for `write.bloom-cols` — enables the
    * native bloom filter on each named column, sized by
    * `write.bloom-ndv` (falling back to the per-file row cap: a file
    * holds at most that many distinct values). Column names are
    * resolved against `cols` case-insensitively; a name that does not
    * exist in the write schema refuses (same stance as
    * write.sort-cols). */
  def writerOptions(props: Map[String, String],
                    cols: Seq[String]): Map[String, String] = {
    val named = props.get("write.bloom-cols")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .getOrElse(return Map.empty)
    val ndv = props.get("write.bloom-ndv").flatMap(_.toLongOption)
      .orElse(props.get("write.target-file-size-rows").flatMap(_.toLongOption))
      .filter(_ > 0L).getOrElse(DEFAULT_NDV)
    named.flatMap { c =>
      val exact = cols.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"write.bloom-cols column $c does not exist in the write " +
            s"schema (${cols.mkString(", ")})"))
      Seq(s"parquet.bloom.filter.enabled#$exact" -> "true",
        s"parquet.bloom.filter.expected.ndv#$exact" -> ndv.toString)
    }.toMap
  }

  // ---- commit-time harvest (called from FileStats' footer pass) ----

  /** The physical-shape tag a probe must reproduce, or None when the
    * (physical, logical) pair has no deterministic catalyst hash
    * input. */
  private def tagOf(prim: PrimitiveType): Option[Char] = {
    import PrimitiveType.PrimitiveTypeName._
    import LogicalTypeAnnotation._
    (prim.getPrimitiveTypeName, prim.getLogicalTypeAnnotation) match {
      case (_, _: DecimalLogicalTypeAnnotation) => None
      case (INT32, a: IntLogicalTypeAnnotation) if !a.isSigned => None
      case (INT64, a: IntLogicalTypeAnnotation) if !a.isSigned => None
      case (INT32, _) => Some('i') // int / date / signed small ints
      case (INT64, t: TimestampLogicalTypeAnnotation) =>
        if (t.getUnit == TimeUnit.MICROS) Some('l') else None
      case (INT64, _) => Some('l')
      case (FLOAT, _) => Some('f')
      case (DOUBLE, _) => Some('d')
      case (BINARY, _: StringLogicalTypeAnnotation) => Some('s')
      case (BINARY, null) => Some('y')
      case _ => None
    }
  }

  /** Bloom lines for one already-open footer reader — one line per
    * (top-level column, row group) that carries a filter within the
    * size cap. Runs inside [[FileStats]]' footer pass, so a file is
    * opened exactly once for both sidecars. */
  def harvestLines(reader: ParquetFileReader, rel: String): Seq[String] = {
    val footer = reader.getFooter
    val fileSchema = footer.getFileMetaData.getSchema
    footer.getBlocks.asScala.toSeq.flatMap { b: BlockMetaData =>
      b.getColumns.asScala.toSeq
        .filter(c => c.getPath.size == 1 && c.getBloomFilterOffset >= 0L)
        .flatMap { c =>
          val col = c.getPath.toDotString
          val prim = fileSchema
            .getType(fileSchema.getFieldIndex(col)).asPrimitiveType()
          tagOf(prim).flatMap { tag =>
            try {
              reader.getBloomFilterDataReader(b).readBloomFilter(c) match {
                case bf: BlockSplitBloomFilter
                    if bf.getBitsetSize <= MAX_BITSET =>
                  val bos = new java.io.ByteArrayOutputStream(
                    bf.getBitsetSize)
                  bf.writeTo(bos)
                  Some(s"$rel\t$col\t$tag\t" +
                    Base64.getEncoder.encodeToString(bos.toByteArray))
                case _ => None
              }
            } catch {
              case e: Exception =>
                System.err.println(s"[graft-bloomidx] WARN: bloom read " +
                  s"failed for $rel/$col (${e.getMessage}); column stays " +
                  "unskippable-by-bloom")
                None
            }
          }
        }
    }
  }

  /** Append harvested lines and compact the store against the live
    * relative paths on the usual cadence. Called under the commit lock
    * (from FileStats.record). */
  def append(tableDir: JPath, lines: Seq[String],
             livePaths: => Set[String]): Unit = {
    if (lines.nonEmpty) {
      val store = tableDir.resolve(STORE)
      Files.createDirectories(store)
      val tmp = store.resolve(s".bf-tmp-${UUID.randomUUID()}")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, store.resolve(s"bf-${UUID.randomUUID()}.tsv"),
        StandardCopyOption.ATOMIC_MOVE)
      cache.remove(tableDir.toString)
    }
    maybeCompact(tableDir, livePaths)
  }

  private def maybeCompact(tableDir: JPath,
                           livePaths: => Set[String]): Unit = {
    val store = tableDir.resolve(STORE)
    if (!Files.isDirectory(store)) return
    val parts = listStoreFiles(store)
    if (parts.size <= COMPACT_AT) return
    val live = livePaths
    val all = parts.flatMap(f =>
      new String(Files.readAllBytes(f), "UTF-8").split("\n").toSeq)
      .filter(l => l.nonEmpty && live.contains(l.takeWhile(_ != '\t')))
    val tmp = store.resolve(s".bf-tmp-${UUID.randomUUID()}")
    Files.write(tmp, all.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, store.resolve(s"bf-${UUID.randomUUID()}.tsv"),
      StandardCopyOption.ATOMIC_MOVE)
    parts.foreach(Files.deleteIfExists(_))
    cache.remove(tableDir.toString)
  }

  private def listStoreFiles(store: JPath): Seq[JPath] = {
    if (!Files.isDirectory(store)) return Nil
    val ls = Files.list(store)
    try ls.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".tsv")).toSeq.sortBy(_.toString)
    finally ls.close()
  }

  /** Clone-time carry — the destination links the same data files
    * under the same relative paths (see FileStats.carryStore). */
  def carryStore(srcTable: JPath, dstTable: JPath): Unit = {
    val src = srcTable.resolve(STORE)
    if (!Files.isDirectory(src)) return
    val dst = dstTable.resolve(STORE)
    Files.createDirectories(dst)
    listStoreFiles(src).foreach { f =>
      val out = dst.resolve(f.getFileName.toString)
      try { Files.createLink(out, f); () }
      catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          Files.copy(f, out, StandardCopyOption.REPLACE_EXISTING); ()
      }
    }
  }

  // ---- scan-time loading (cached per store fingerprint) ----

  /** file → column (as written) → (shape tag, row-group filters). */
  type Index = Map[String, Map[String, (Char, Seq[BlockSplitBloomFilter])]]

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Index)]()

  def load(tableDir: JPath): Index = {
    val store = tableDir.resolve(STORE)
    val parts = listStoreFiles(store)
    if (parts.isEmpty) return Map.empty
    val fp = parts.map(p =>
      s"${p.getFileName}:${Files.size(p)}").mkString(",")
    val hit = cache.get(tableDir.toString)
    if (hit != null && hit._1 == fp) return hit._2
    val byFile = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.Map[String, (Char, Vector[BlockSplitBloomFilter])]]
    for (p <- parts;
         line <- new String(Files.readAllBytes(p), "UTF-8").split("\n")
         if line.nonEmpty) {
      val f = line.split("\t", -1)
      if (f.length == 4 && f(2).length == 1) {
        try {
          val bits = Base64.getDecoder.decode(f(3))
          val filt = new BlockSplitBloomFilter(bits)
          val cols = byFile.getOrElseUpdate(f(0),
            scala.collection.mutable.Map.empty)
          cols.get(f(1)) match {
            case Some((t, fs)) if t == f(2).charAt(0) =>
              cols(f(1)) = (t, fs :+ filt)
            case Some(_) => // shape conflict across row groups: distrust
              cols.remove(f(1)); ()
            case None => cols(f(1)) = (f(2).charAt(0), Vector(filt))
          }
        } catch { case _: IllegalArgumentException => () }
      }
    }
    val out: Index = byFile.map { case (n, m) =>
      n -> m.map { case (c, (t, fs)) => c -> (t, fs: Seq[BlockSplitBloomFilter]) }.toMap
    }.toMap
    cache.put(tableDir.toString, (fp, out))
    out
  }

  // ---- probing ----

  /** Hash `v` (a catalyst-internal value) the way parquet's writer
    * hashed column values of physical shape `tag`, or None when the
    * shapes don't line up (probe keeps the file). */
  private def hashOf(bf: BloomFilter, tag: Char, v: Any): Option[Long] =
    (tag, v) match {
      case (_, null) => None
      case ('i', i: Int) => Some(bf.hash(i))
      case ('i', s: Short) => Some(bf.hash(s.toInt))
      case ('i', b: Byte) => Some(bf.hash(b.toInt))
      case ('l', l: Long) => Some(bf.hash(l))
      case ('f', f: Float) => Some(bf.hash(f))
      case ('d', d: Double) => Some(bf.hash(d))
      case ('s', u: UTF8String) =>
        Some(bf.hash(Binary.fromConstantByteArray(u.getBytes)))
      case ('y', b: Array[Byte]) =>
        Some(bf.hash(Binary.fromConstantByteArray(b)))
      case _ => None
    }

  /** Could a row of `file` match every filter, as far as its bloom
    * filters can tell? Over-approximating: only an equality/IN leaf
    * whose every candidate key bloom-misses every row group proves
    * `false`; everything else is `true`. */
  def mayMatch(filters: Seq[CExpression],
               cols: Map[String, (Char, Seq[BlockSplitBloomFilter])]): Boolean =
    filters.forall(may(_, cols))

  private def may(e: CExpression,
                  cols: Map[String, (Char, Seq[BlockSplitBloomFilter])]): Boolean = {
    def probe(a: AttributeReference, v: Any): Boolean =
      cols.find(_._1.equalsIgnoreCase(a.name)).map(_._2) match {
        case None => true
        case Some((tag, fs)) =>
          fs.isEmpty || fs.exists { f =>
            hashOf(f, tag, v) match {
              case Some(h) => f.findHash(h)
              case None => true
            }
          }
      }
    e match {
      case And(l, r) => may(l, cols) && may(r, cols)
      case Or(l, r) => may(l, cols) || may(r, cols)
      case EqualTo(a: AttributeReference, CLiteral(v, _)) => probe(a, v)
      case EqualTo(CLiteral(v, _), a: AttributeReference) => probe(a, v)
      case EqualNullSafe(a: AttributeReference, CLiteral(v, _)) if v != null =>
        probe(a, v)
      case EqualNullSafe(CLiteral(v, _), a: AttributeReference) if v != null =>
        probe(a, v)
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[CLiteral]) =>
        vs.exists(l => probe(a, l.asInstanceOf[CLiteral].value))
      case InSet(a: AttributeReference, vs) => vs.exists(probe(a, _))
      case _ => true
    }
  }

  /** The subset of `files` whose bloom filters cannot rule out holding
    * at least one of `keys` in `colName` — the bloom half of
    * [[FileStats.filesMayContainKeys]], composed after it on the
    * merge-on-read equality-entry write path so a scattered CDC merge
    * on a hash-shaped key scopes its entry to the files that actually
    * hold the keys (min/max sees the whole space there). Same
    * may-match contract: no store / no column / shape mismatch keeps
    * the file. */
  def filesMayContainKeys(idx: Index, files: Set[String], colName: String,
                          keys: Seq[Any]): Set[String] = {
    if (idx.isEmpty || keys.isEmpty) return files
    files.filter { f =>
      idx.get(f).flatMap(_.find(_._1.equalsIgnoreCase(colName)).map(_._2)) match {
        case None => true
        case Some((tag, fs)) =>
          fs.isEmpty || keys.exists(k => fs.exists { bf =>
            hashOf(bf, tag, k) match {
              case Some(h) => bf.findHash(h)
              case None => true
            }
          })
      }
    }
  }
}
