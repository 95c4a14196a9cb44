package graft

import graft.plans.{FuseDotProduct, GraftExtensions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def foldDot = {
    aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
  }

  test("FuseDotProduct rewrites the higher-order fold into graft_dot") {
    import spark.implicits._
    val df = spark.range(5)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), lit(3.0)).as("b"))
      .select(foldDot.as("d"))
    val before = df.queryExecution.analyzed
    val after = FuseDotProduct(before)
    assert(!before.toString.contains("graft_dot"))
    assert(after.toString.contains("graft_dot"), after.toString)
    // value-equality of the rewritten expression is covered by the
    // session-level test below and VectorFunctionsSpec's fold comparison
  }

  test("extensions-enabled session applies the fusion during optimization") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val df = s2.range(5)
        .select(array(col("id").cast("double"), lit(1.0)).as("a"),
          array(lit(2.0), lit(3.0)).as("b"))
        .select(foldDot.as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.collect().map(_.getDouble(0)).toSeq == Seq(3.0, 5.0, 7.0, 9.0, 11.0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
