package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: run registry entries with a job listener attached and print
  * every Spark job's wall time + description — `runMain graft.ProbeJobs
  * <sfDir> <query> [query...]`. Same session config as Bench, so the
  * job census reflects what the bench pays. Each entry runs twice (the
  * first run absorbs codegen/page-cache warmup; read the second).
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val unknown = names.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench's session posture (r20's byte-sized coalescing)
      // so the census counts the jobs the bench actually pays
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same A/B hook as Bench, same echo
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        System.err.println(s"[probe:conf] extra conf applied: " +
          s"${k.trim}=${v.trim}")
      })

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc))
        }
      }
    })

    def mat(df: org.apache.spark.sql.DataFrame): Unit = {
      val h = xxhash64(df.columns.toIndexedSeq.map(col): _*)
      df.select(h.as("h")).agg(bit_xor(col("h"))).collect()
      ()
    }

    names.foreach { name =>
      for (r <- 1 to 2) {
        done.clear()
        PhaseTimer.drain()
        val t0 = System.nanoTime()
        mat(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        val ph = PhaseTimer.drain()
        val js = {
          val b = Seq.newBuilder[(Int, Long, String)]
          var e = done.poll()
          while (e != null) { b += e; e = done.poll() }
          b.result().sortBy(_._1)
        }
        val jsum = js.map(_._2).sum / 1e3
        println(f"==== $name run$r ${dt}%.2fs  jobs=${js.size} jobSum=$jsum%.2fs ====")
        if (r == 2) {
          js.foreach { case (id, ms, desc) =>
            println(f"  job $id%4d ${ms / 1e3}%7.3fs  ${desc.take(100)}")
          }
          ph.toSeq.sortBy(-_._2).foreach { case (p, v) =>
            println(f"  phase $p $v%.2fs")
          }
        }
      }
    }
    spark.stop()
  }
}
