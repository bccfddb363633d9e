package graft

/** Dev profiling harness for the optimization rounds (NOT part of the
  * driver contract — Bench.main stays the only timed artifact): times a
  * subset of SparkEntry.queries through the noop sink (guide §1.4) and
  * dumps `.explain("formatted")` per query for the plan audit.
  *
  * Usage:
  *   sbt "runMain graft.Profile <sfDir> <outDir> [q1,q2,...|all] [repeats]"
  *
  * Per query it prints every sample and the min; jobs are labelled via
  * setJobDescription so a UI attach or event log is readable (§1.5).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/profile_out")
    val sel = args.lift(2).getOrElse("all")
    val repeats = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed warmup, same as Bench.
    graft.sources.Tables.all.foreach { t =>
      try materialize(graft.sources.Tables(spark, sfDir, t))
      catch { case _: Throwable => () }
    }

    val names =
      if (sel == "all") SparkEntry.queries.keys.toVector.sorted
      else sel.split(",").toVector.flatMap { p =>
        SparkEntry.queries.keys.filter(_.startsWith(p))
      }.distinct.sorted

    val results = names.map { name =>
      val samples = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name [$i/$repeats]")
        val t0 = System.nanoTime()
        try {
          materialize(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[profile] $name FAILED: $e"); -1.0
        }
      }
      spark.sparkContext.setJobDescription(null)
      // Plan dump (formatted) — built fresh so the dump can't observe a
      // half-warm memo differently than the timed runs did.
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/$name.txt"),
          plan.getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[profile] $name plan dump failed: $e")
      }
      val ok = samples.filter(_ >= 0)
      val min = if (ok.isEmpty) -1.0 else ok.min
      println(f"PROFILE $name%-36s min=$min%8.3f  samples=${
        samples.map(s => f"$s%.3f").mkString(",")}")
      name -> min
    }
    println("== slowest first ==")
    results.sortBy(-_._2).foreach { case (n, t) =>
      println(f"PROFILE-SORTED $t%8.3f  $n")
    }
    println(f"PROFILE-TOTAL ${results.map(_._2).filter(_ >= 0).sum}%.3f")
    spark.stop()
  }
}
