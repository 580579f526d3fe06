package graft

import java.nio.file.{Files, Paths}

/** Local-iteration helper: run a comma-separated subset of
  * [[SparkEntry.queries]] against a testdata dir, dump each result to
  * `outDir/<name>` parquet and the subset's oracle SQL to
  * `outDir/oracle_sql.json` — the same layout [[Verify]] produces for the
  * driver, so a DuckDB compare of one query needs no full verify pass.
  *
  * Usage: runMain graft.VerifyOne <sfDir> <outDir> <name1,name2,...>
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, csv) = args
    val names = csv.split(",").toSeq
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verify-one] wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
