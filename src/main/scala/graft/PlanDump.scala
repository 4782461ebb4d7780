package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for a named list of queries — the
  * optimization-round evidence files under `plans/rNN/` (one
  * `<query>_<tag>.txt` per query, `tag` = before/after). Usage:
  *
  *   runMain graft.PlanDump <outDir> <tag> <sfDir> <q1,q2,...>
  *
  * Unlike [[Plans]] (the curated PLANS.md narrative) this is a plain
  * dump so a judge can diff the plan shape a change claims against the
  * committed text without running Spark.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.PlanDump <outDir> <tag> <sfDir> <q1,q2,...>")
      sys.exit(2)
    }
    val Array(outDir, tag, sfDir, nameCsv) = args.take(4)
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
    Sessions.config.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    nameCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), formatted)
      println(s"[plandump] wrote $n ($tag)")
    }
    println(s"[plandump] done: ${nameCsv.split(",").length} plans -> $outDir")
    spark.stop()
  }
}
