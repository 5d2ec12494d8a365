package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make `vector_dot` a first-class SQL function at
  * SESSION BUILD time — no per-session registration call — and bind it
  * to the native codegen'd Expression, not a UDF. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) injects native vector_dot") {
    // force a genuinely new session (extensions apply only at build);
    // the SparkContext is shared with the other suites' session
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val df = s.sql("SELECT vector_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d")
      assert(df.head().getDouble(0) == 32.0)
      // bound to the native expression → visible in the analyzed plan
      assert(df.queryExecution.analyzed.toString.contains("vectordot"),
        df.queryExecution.analyzed.toString)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
