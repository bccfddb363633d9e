package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q136 count-min guarantees: the native aggregate's cell matrix equals
  * the relational per-(row, bucket) counts exactly under every
  * partitioning (merge is elementwise addition — associativity is
  * testable, not assumed), and the estimate is one-sided: est ≥ exact
  * for EVERY queried item, with the εN bound holding on the fixture. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val d = 4
  private val w = 64

  private def bkt(j: Int) =
    (conv(substring(md5(concat(lit(s"$j:"), col("v"))), 1, 14), 16, 10)
      .cast("long") % w)

  test("sketch equals relational cell counts under every partitioning") {
    graft.functions.CmsSketch.register(spark)
    val rows = (0 until 5000).map(i => s"tok${i % 97}")
    val df = rows.toDF("v")
    val expected = df
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("j"), bkt(j).as("b"))): _*)).as("s"))
      .groupBy(col("s.j"), col("s.b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (p <- Seq(1, 4, 32)) {
      val cms = df.repartition(p)
        .select(array((0 until d).map(bkt): _*).as("bkts"))
        .agg(expr(s"graft_cms(bkts, $d, $w)"))
        .collect()(0).getSeq[Long](0)
      expected.foreach { case ((j, b), c) =>
        assert(cms(j * w + b.toInt) == c,
          s"cell ($j, $b) diverged at repartition($p)")
      }
      assert(cms.sum == d.toLong * rows.size, "total mass = d * N")
    }
  }

  test("estimate is one-sided (est >= exact) and inside the eps*N bound") {
    graft.functions.CmsSketch.register(spark)
    val rows = (0 until 5000).map(i => s"tok${i % 97}")
    val df = rows.toDF("v")
    val cms = df.select(array((0 until d).map(bkt): _*).as("bkts"))
      .agg(expr(s"graft_cms(bkts, $d, $w)")).collect()(0).getSeq[Long](0)
    val exact = rows.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val est = df.distinct()
      .select(col("v"),
        least((0 until d).map(j =>
          element_at(typedlit(cms.toArray),
            (lit(j * w) + bkt(j) + 1).cast("int"))): _*).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.size.toLong
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CMS undercounted $t: ${est(t)} < $c")
      // expected overcount <= e/w * N; use the loose 2e/w * N guard
      assert(est(t) - c <= (2 * math.E / w * n).toLong + 1,
        s"overcount for $t way outside the CMS bound")
    }
  }
}
