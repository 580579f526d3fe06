package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Local-iteration profiler: run one query key and report wall seconds,
  * SPARK JOB COUNT, and summed job time. Lifecycle keys (stores, views)
  * are dominated by fixed per-commit overhead — many tiny driver-blocking
  * jobs — which this makes visible without an event-log UI.
  *
  * Usage: runMain graft.ProfileOne <sfDir> <name1,name2,...> [repeats]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val repeats = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    // boxed key/value types: a primitive-typed CHM would unbox a missing
    // key's null remove() to 0L and corrupt the sum with epoch millis
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Long]()
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    val siteOf = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    // SQL execution id → the ACTION's call site (async broadcast /
    // subquery jobs run on a capture pool whose own stage site is a
    // useless lambda; the enclosing execution's description is the
    // attribution that matters)
    val execSite = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execSite.put(s.executionId, s.description.takeWhile(_ != '\n')): Unit
        case _ =>
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, j.time); jobs.incrementAndGet()
        val fromExec = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(execSite.get(id.toLong)))
        val fromStages = j.stageInfos.map(_.name.takeWhile(_ != '\n'))
          .filterNot(_.contains("CompletableFuture")).lastOption
        val site = fromExec.orElse(fromStages)
          .orElse(j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        siteOf.put(j.jobId, site.take(90)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(starts.remove(Integer.valueOf(j.jobId))).foreach { s =>
          jobMs.addAndGet(j.time - s)
          val site = Option(siteOf.remove(j.jobId)).getOrElse("?")
          bySite.compute(site, (_, v) => {
            val a = if (v == null) Array(0L, 0L) else v
            a(0) += 1; a(1) += (j.time - s); a
          }): Unit
        }
    })
    names.foreach { name =>
      (1 to repeats).foreach { r =>
        jobs.set(0); jobMs.set(0L); bySite.clear()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        println(f"[profile] $name run$r: wall=$wall%.2fs jobs=${jobs.get}" +
          f" jobTime=${jobMs.get / 1000.0}%.2fs rows=$n")
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(-_._2(1)).take(40).foreach {
          case (site, a) => println(
            f"[profile]   $site%-50s n=${a(0)}%3d t=${a(1) / 1000.0}%.2fs")
        }
      }
    }
    spark.stop()
  }
}
