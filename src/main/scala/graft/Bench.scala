package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query against
 * `SPARK_GRAFT_SF_DIR` and prints one JSON line of per-query seconds.
 *
 * Materialization is a `noop`-format write — every row is fully produced
 * and shipped to the sink, unlike `count()` which lets parquet answer from
 * row-group metadata and would under-measure wide projections.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up passes so JIT, whole-stage-codegen compilation and FileSystem
    // init don't bill to the first query of each operator family: a scan, a
    // shuffled agg, a window and a join over throwaway data.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    val r = spark.range(100000).select(col("id"), (col("id") % 100).as("k"))
    r.groupBy("k").count().write.format("noop").mode("overwrite").save()
    r.withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("id")))
      .join(r.select(col("k")).distinct(), "k")
      .write.format("noop").mode("overwrite").save()
    // min_by over a struct CONTAINING STRINGS: the arg-min comparator and
    // UnsafeRow string paths are the single most JIT-expensive generated
    // code in the battery (dedup_exact); an int-only warm-up doesn't touch
    // them and the first real run can bill tens of seconds on a loaded host.
    r.select(col("id"), (col("id") % 100).as("k"),
        md5(col("id").cast("string")).as("s1"), repeat(md5((col("id") + 1).cast("string")), 4).as("s2"))
      .groupBy(md5(col("k").cast("string")))
      .agg(min_by(struct(col("id"), col("k"), col("s1"), col("s2")), col("id")))
      .write.format("noop").mode("overwrite").save()
    val results = Queries.all.map { case (name, fn, _) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          name -> -1.0 // sentinel: a broken query must not look fast-and-complete
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
