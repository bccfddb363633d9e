package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{DocQueries, StreamQueries}

/** q154 streaming shard router: the registered oracle is q150's batch
  * SQL verbatim, justified by stream ≡ batch — pinned here directly as
  * Spark-side frame equality (stateless per-row assignment + a census
  * of commutative-associative aggregates cannot depend on micro-batch
  * boundaries). */
class StreamShardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed census equals the batch export row for row") {
    val dir = "/root/testdata/sf0.001"
    val stream = StreamQueries.q154StreamShardRoute(spark, dir)
      .collect().map(_.toSeq).toList
    val batch = DocQueries.q150ShardExport(spark, dir)
      .collect().map(_.toSeq).toList
    assert(stream == batch)
  }
}
