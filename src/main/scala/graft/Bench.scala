package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warmup pass at sf0.001 first exercises each query shape end-to-end
  * (codegen compilation, classloading, parquet footer caching) so the
  * timed pass measures the engine, not JVM warmup — the reference's
  * steady-state throughput is the comparison target (BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: forces full evaluation of every output column (a bare
    // count() would let Catalyst prune the projections away and
    // under-measure expression-heavy queries). Returns the failure (if
    // any) so a crashing query is reported as err/-1, never as a
    // near-zero "fast pass".
    def run(name: String, dir: String): Option[Throwable] =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case t: Throwable => Some(t) }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup: full pass at the small scale factor
    names.foreach(run(_, warmDir))

    // best-of-N: single-shot timings on a shared box see multi-second
    // GC/scheduler spikes; the minimum is the steady-state number the
    // baseline comparison wants
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val results = names.map { name =>
      val timings = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val err = run(name, sfDir)
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val err = timings.map(_._2).find(_.isDefined).flatten
      (name, if (err.isDefined) -1.0 else timings.map(_._1).min, err)
    }
    // millisecond precision: full-precision doubles pushed the 67-query
    // line past the driver's stdout tail capture in r3 ("parsed": null)
    // — keep the ONE JSON line compact so it always survives intact
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(t)) =>
      val msg = (t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage))
        .replaceAll("[\"\\\\\n\r]", " ").take(160)
      "\"" + k + "\":\"" + msg + "\""
    }
    val errField = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}""")
    spark.stop()
  }
}
