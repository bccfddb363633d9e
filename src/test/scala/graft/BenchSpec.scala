package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The bench's previous-round parser feeds the >3x contention guard; it
  * must read the driver's wrapper shape (our JSON line escaped inside a
  * "tail" string) and a bare line alike, and ignore non-bench JSONs.
  */
class BenchSpec extends AnyFunSuite {

  test("previousRoundTimes parses the driver's escaped-tail wrapper") {
    val dir = Files.createTempDirectory("benchspec").toFile
    val wrapped =
      """{"n":3,"rc":0,"tail":"noise [info] {\"metric\":\"total\",\"value\":2.5,\"unit\":\"sec\",\"queries\":{\"q01_a\":0.5,\"q47_corpus_manifest\":1.08},\"repeats\":3}"}"""
    Files.write(dir.toPath.resolve("BENCH_r03.json"), wrapped.getBytes)
    // an older round and an unrelated json must not win
    Files.write(dir.toPath.resolve("BENCH_r02.json"),
      """{"tail":"{\"queries\":{\"q01_a\":9.9}}"}""".getBytes)
    Files.write(dir.toPath.resolve("BASELINE.json"),
      """{"queries":{"q01_a":111.0}}""".getBytes)
    val m = Bench.previousRoundTimes(dir)
    assert(m == Map("q01_a" -> 0.5, "q47_corpus_manifest" -> 1.08))
  }

  test("previousRoundTimes handles a bare unwrapped line and absence") {
    val dir = Files.createTempDirectory("benchspec2").toFile
    Files.write(dir.toPath.resolve("BENCH_r01.json"),
      """{"metric":"total","queries":{"q02_b":0.25},"repeats":3}""".getBytes)
    assert(Bench.previousRoundTimes(dir) == Map("q02_b" -> 0.25))
    val empty = Files.createTempDirectory("benchspec3").toFile
    assert(Bench.previousRoundTimes(empty).isEmpty)
  }
}
