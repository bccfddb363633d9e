package graft

import org.apache.spark.sql.SparkSession

/** Deterministic MIXTURE-OF-CENTROIDS embedding fixture — the missing
  * counterpart to the shipped near-uniform `embeddings` table.
  *
  * The shipped synthetic vectors are deliberately near-uniform on the
  * sphere, which is the WORST case for sign-LSH (recall ≈ 2× candidate
  * fraction — there is no angular structure to exploit; see
  * EmbedQueries.q28's scaladoc). Real text/image embeddings are strongly
  * clustered, and the ANN paths' whole value proposition rests on that.
  * This fixture makes the "clustered data does far better" claim
  * MEASURED, not asserted: 500 vectors drawn around 16 well-separated
  * centroids with small additive noise, zero RNG anywhere (a splitmix64
  * finalizer over (cluster|id, dim) indices), so recall pins are exact
  * and reproducible across runs and engines.
  *
  * Geometry: centroid components are uniform-ish in [-0.5, 0.5)
  * (E‖c‖ ≈ 2.31 at dim 64); noise components in [-0.1, 0.1)
  * (E‖n‖ ≈ 0.46), giving intra-cluster cosine ≈ 0.96 and inter-cluster
  * cosine ≈ 0 — the regime real near-dup/ANN corpora live in.
  *
  * Layout matches the driver testdata contract: vec_ids 0..15 land one
  * per cluster (they double as q46's seeded centroids — each seed then
  * genuinely represents its list), and query vectors vec_id < 5 sit in
  * five distinct clusters.
  */
object ClusteredEmbeddings {

  val nVecs = 500
  val nClusters = 16
  val dim = 64

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic uniform in [-0.5, 0.5) from a (stream, index) pair. */
  private def unit(a: Long, b: Long): Double =
    ((mix(a * 1000003L + b) >>> 11).toDouble / (1L << 53)) - 0.5

  def vector(id: Long): Array[Float] = {
    val c = id % nClusters
    Array.tabulate(dim)(i => (unit(c, i) + 0.2 * unit(1000000L + id, i)).toFloat)
  }

  /** Write the fixture once per build dir; returns a dir Tables can read
    * (`<dir>/embeddings.parquet`), so every EmbedQueries entry runs on it
    * unchanged. */
  def ensure(spark: SparkSession): String = {
    val dir = "target/fixtures/clustered"
    val path = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
      import spark.implicits._
      (0L until nVecs.toLong)
        .map(id => (id, vector(id), s"c${id % nClusters}"))
        .toDF("vec_id", "embedding", "label")
        .repartition(4)
        .write.mode("overwrite").parquet(path.toString)
    }
    dir
  }
}
