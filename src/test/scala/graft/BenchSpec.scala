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

  test("rounds sort numerically, not lexicographically") {
    val dir = Files.createTempDirectory("benchspec4").toFile
    // lexicographic sort would pick r9 over r10
    Files.write(dir.toPath.resolve("BENCH_r9.json"),
      """{"tail":"{\"queries\":{\"q01_a\":9.0}}"}""".getBytes)
    Files.write(dir.toPath.resolve("BENCH_r10.json"),
      """{"tail":"{\"queries\":{\"q01_a\":10.0}}"}""".getBytes)
    assert(Bench.previousRoundTimes(dir) == Map("q01_a" -> 10.0))
  }

  test("log noise containing the word 'queries' after the metric line is ignored") {
    val dir = Files.createTempDirectory("benchspec5").toFile
    // a WARN mentioning 'queries' after the metric line must not hijack
    // the anchor (the old bare-word lastIndexOf did exactly that)
    val wrapped =
      """{"tail":"{\"metric\":\"total\",\"queries\":{\"q03_c\":0.7}} WARN slow queries detected in log"}"""
    Files.write(dir.toPath.resolve("BENCH_r05.json"), wrapped.getBytes)
    assert(Bench.previousRoundTimes(dir) == Map("q03_c" -> 0.7))
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
