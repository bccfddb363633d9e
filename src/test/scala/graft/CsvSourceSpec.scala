package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** P3 header-trim CSV path (transform.py:53-54): headers with stray
  * whitespace must come back clean. */
class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("csvInferTrimmed strips header whitespace and infers types") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "dirty.csv")
    val w = new java.io.PrintWriter(f)
    w.println("  FlightDate , Carrier ,Delay  ")
    w.println("2024-01-01,AA,12")
    w.println("2024-01-02,DL,0")
    w.close()
    val df = Tables.csvInferTrimmed(spark, f.getAbsolutePath)
    assert(df.columns.toSeq == Seq("FlightDate", "Carrier", "Delay"))
    assert(df.count() == 2)
    assert(df.schema("Delay").dataType.typeName == "integer")
  }
}
