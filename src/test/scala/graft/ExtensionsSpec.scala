package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions exposes dot_product / l2_norm to SQL") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
          |       l2_norm(array(3.0d, 4.0d)) AS n""".stripMargin).collect()(0)
      assert(row.getDouble(0) == 32.0)
      assert(row.getDouble(1) == 5.0)
    } finally {
      // keep the shared session for other suites intact
    }
  }

  test("register() makes the functions available on an existing session") {
    val spark = TestSpark.spark
    graft.functions.VectorFunctions.register(spark)
    val row = spark.sql("SELECT dot_product(array(1.0d, 1.0d), array(2.0d, 3.0d)) AS d")
      .collect()(0)
    assert(row.getDouble(0) == 5.0)
  }
}
