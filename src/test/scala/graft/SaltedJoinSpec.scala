package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.core

/** saltedJoin must return exactly the rows of the plain equi-join — the
  * salt is an execution detail, never a semantics change. */
class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of left rows share one hot key — the salting target.
    val left = spark.range(2000)
      .select(col("id"), when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"))
    val right = Seq((1L, "hot"), (7L, "seven"), (13L, "thirteen"), (999L, "absent-left"))
      .toDF("rk", "v")

    val plain = left.join(right, col("k") === col("rk")).select("id", "k", "v")
    val salted = core.saltedJoin(left, right, col("k"), col("rk"), saltFactor = 8)
      .select("id", "k", "v")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("left join keeps unmatched left rows exactly once") {
    val left = spark.range(50).select(col("id"), (col("id") % 5).as("k"))
    val right = Seq((0L, "z"), (2L, "t")).toDF("rk", "v")
    val plain = left.join(right, col("k") === col("rk"), "left").select("id", "k", "v")
    val salted = core.saltedJoin(left, right, col("k"), col("rk"), 4, "left")
      .select("id", "k", "v")
    assert(salted.count() == 50)
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
