package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for query keys to files —
  * the optimization rounds' before/after plan evidence
  * (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <name1,name2,...> [suffix]
  *
  * NOTE for iterative/lifecycle keys: the dumped plan is the FINAL
  * returned frame's plan (the fold/read the caller sees); per-round loop
  * shapes are attributed with ProfileOne's job/site breakdown instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args(2).split(",").toSeq
    val suffix = if (args.length > 3) args(3) else "plan"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name")
      } catch {
        // NonFatal only: an OOM/linkage error must kill the run, not be
        // swallowed while the tool keeps "succeeding" on later keys
        case scala.util.control.NonFatal(e) =>
          failed += 1
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
    // a plan-evidence run that silently produced no files must not exit 0
    if (failed > 0) sys.exit(1)
  }
}
