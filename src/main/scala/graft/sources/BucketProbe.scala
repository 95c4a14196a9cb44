package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.types._

/** Scratch probe (deleted before round close): can ParquetTable with a
  * user schema serve a directory layout holding an EXTRA partition dir
  * column not in that schema (the hidden-bucket layout)? */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val dir = java.nio.file.Files.createTempDirectory("bucket_probe").toString
    val df = (1L to 1000L).toDF("id")
      .withColumn("name", concat(lit("n"), $"id"))
      .withColumn("grp", ($"id" % 7).cast("int"))
    df.withColumn("_gb_id", pmod(hash($"id"), lit(8)))
      .write.mode("overwrite").partitionBy("_gb_id", "grp").parquet(dir)

    val userSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("grp", IntegerType)))
    val tbl = ParquetTable("probe", spark, CaseInsensitiveStringMap.empty(),
      Seq(dir), Some(userSchema), classOf[ParquetFileFormat])
    println("TABLE SCHEMA: " + tbl.schema.fields.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))

    val sb = tbl.newScanBuilder(CaseInsensitiveStringMap.empty())
    sb match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder =>
        p.pruneColumns(userSchema)
      case _ =>
    }
    val scan = sb.build()
    println("SCAN SCHEMA: " + scan.readSchema().map(_.name).mkString(", "))
    val parts = scan.toBatch.planInputPartitions()
    println("TASKS: " + parts.length)
    parts.take(3).foreach {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        println("  files=" + fp.files.length +
          " firstPath=" + fp.files.head.urlEncodedPath +
          " partValsArity=" + fp.files.head.partitionValues.numFields)
      case other => println("  other: " + other)
    }
    spark.stop()
  }
}
