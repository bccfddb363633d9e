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

  test("front-truncated tail (anchor lost) still parses via whole-text scan") {
    val dir = Files.createTempDirectory("benchspec6").toFile
    // Replica of the real BENCH_r07.json failure shape: the driver truncates
    // the tail string from the FRONT, so it begins mid-number and the
    // "queries":{ anchor is gone. The guard must still arm.
    val truncated =
      """{"n":7,"rc":0,"tail":"68319,\"q38_semi_anti_join\":0.638985117,\"q40_bucketed_join\":0.551947772},\"repeats\":3,\"reran\":[\"q40_bucketed_join\"],\"errors\":{\"q99_x\":\"boom\"}}"}"""
    Files.write(dir.toPath.resolve("BENCH_r07.json"), truncated.getBytes)
    val m = Bench.previousRoundTimes(dir)
    assert(m == Map("q38_semi_anti_join" -> 0.638985117,
                    "q40_bucketed_join" -> 0.551947772))
    // reran-array names (no :float) and error strings (:"msg") must not match
    assert(!m.contains("q99_x"))
  }

  test("BENCHLOCAL.json is preferred over driver BENCH_r*.json artifacts") {
    val dir = Files.createTempDirectory("benchspec7").toFile
    Files.write(dir.toPath.resolve("BENCH_r08.json"),
      """{"tail":"{\"queries\":{\"q01_a\":9.9}}"}""".getBytes)
    Files.write(dir.toPath.resolve("BENCHLOCAL.json"),
      """{"metric":"total","queries":{"q01_a":0.4},"repeats":3}""".getBytes)
    val (m, src) = Bench.previousRound(dir)
    assert(m == Map("q01_a" -> 0.4))
    assert(src == "BENCHLOCAL.json")
  }

  test("empty or corrupt BENCHLOCAL.json falls through to BENCH_r*.json") {
    val dir = Files.createTempDirectory("benchspec8").toFile
    Files.write(dir.toPath.resolve("BENCH_r08.json"),
      """{"tail":"{\"queries\":{\"q01_a\":1.5}}"}""".getBytes)
    // corrupt preferred file: no query map — must not shadow the valid r08
    Files.write(dir.toPath.resolve("BENCHLOCAL.json"), "{}".getBytes)
    val (m, src) = Bench.previousRound(dir)
    assert(m == Map("q01_a" -> 1.5))
    assert(src == "BENCH_r08.json")
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
