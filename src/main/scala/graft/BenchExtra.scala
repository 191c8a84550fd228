package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/**
 * Optimization-round profiling harness (guide §1.4/§1.5) — SEPARATE from
 * the frozen driver bench: times individual SparkEntry.queries through
 * the noop sink with repeats, and (optionally) prints a per-Spark-job
 * wall-time breakdown so multi-job queries (stateful sinks, iterative
 * loops, collect-offset idioms) show where their time actually goes.
 *
 * Env knobs:
 *   SPARK_GRAFT_SF_DIR       data dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS         local[N] (default 32)
 *   SPARK_GRAFT_BENCH_ONLY   comma-separated query subset (default: all)
 *   SPARK_GRAFT_BENCH_REPEATS  timed repeats per query (default 2)
 *   SPARK_GRAFT_BENCH_JOBS   "1" → per-job breakdown for each run
 */
object BenchExtra {

  private final case class JobRec(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    val showJobs = sys.env.get("SPARK_GRAFT_BENCH_JOBS").contains("1")

    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.kryo.registrator", "graft.engine.GraftKryoRegistrator")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
    val shm = new java.io.File("/dev/shm")
    val spark = (if (shm.isDirectory && shm.canWrite) {
      val d = new java.io.File(shm, "graft-spark-local"); d.mkdirs()
      b.config("spark.local.dir", d.getAbsolutePath)
    } else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(j.jobId, JobRec(j.jobId, d, System.nanoTime(), -1L))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId)
        if (r != null) r.end = System.nanoTime()
      }
    })

    // session warmup (same as Bench: codegen compiler, parquet reader)
    try {
      spark.range(16).select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("id"))).write.format("noop").mode("overwrite").save()
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // SPARK_GRAFT_EXPLAIN=<dir>: write each query's explain("formatted")
    // to <dir>/<name>.txt instead of executing (plans/r06 deliverable)
    sys.env.get("SPARK_GRAFT_EXPLAIN").foreach { dir =>
      new java.io.File(dir).mkdirs()
      selected.foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$dir/$name.txt"), plan)
          println(s"explained $name -> $dir/$name.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[explain $name] ${e.getMessage}")
        }
      }
      spark.stop()
      return
    }

    val results = selected.map { case (name, fn) =>
      val times = (1 to repeats).map { i =>
        jobs.clear()
        spark.sparkContext.setJobDescription(s"$name run $i")
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable => System.err.println(s"[$name] ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        if (showJobs) {
          import scala.jdk.CollectionConverters._
          val rs = jobs.values.asScala.toSeq.sortBy(_.start)
          println(f"  -- $name run $i: ${rs.size} jobs, $dt%.3f s")
          rs.foreach { r =>
            val d = if (r.end > 0) (r.end - r.start) / 1e9 else Double.NaN
            println(f"     job ${r.id}%3d  $d%7.3f s  ${r.desc.take(90)}")
          }
        }
        dt
      }
      spark.sparkContext.setJobDescription(null)
      println(f"$name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}  min=${times.min}%.3f")
      name -> times.min
    }
    println(f"TOTAL(min) ${results.map(_._2).sum}%.2f s over ${results.size} queries")
    spark.stop()
  }
}
