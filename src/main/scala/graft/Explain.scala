package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registry entries —
  * `runMain graft.Explain <sfDir> <query> [query...]`. The same session
  * config as Verify, so the audited plan is the one the driver runs.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // --exec: run the query to completion first, so the printed plan is
    // the AQE FINAL plan (isFinalPlan=true, AQEShuffleRead visible) —
    // the shape runtime coalescing claims must be audited against
    val exec = args.contains("--exec")
    val rest = args.filterNot(_ == "--exec")
    val sfDir = rest(0)
    val names = rest.drop(1)
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench/Verify's session posture so audited plans are the
      // ones the driver runs
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same A/B hook as Bench: plan comparisons across session postures
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    names.foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (exec) {
        // run THIS Dataset's own query execution to completion (a write
        // or a derived aggregate would plan a separate execution), so
        // the explain below prints its finalized AdaptiveSparkPlan —
        // isFinalPlan=true with AQEShuffleRead nodes visible. Dev tool:
        // entry results are bench-sized, the collect is driver-safe.
        df.collect()
        // the formatted plan labels AQEShuffleRead only "coalesced";
        // the COUNT is the evidence runtime-coalescing claims need
        println(s"-- final output partitions: ${df.rdd.getNumPartitions}")
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
