package graft

// Measurement probe (guide §1): splits the q182_ledger breakdown row into
// its localCheckpoint vs downstream-constructor eager cost — the numbers
// behind the round-15 verdict-table restructure of
// Pipeline.curateFromLedger (OPTIMIZATION_r15.md §10).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeStageA {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    Sessions.config.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val cfg = graft.ops.Pipeline.CurationConfig(
      blockedDomains = Seq("site5.example.com", "site11.example.com"),
      phrases = Seq("customer query", "window merge"),
      weights = (0 until 20).map(i => s"src$i" ->
        (if (i == 3) 8L else 1L)).toMap,
      budgetTokens = 12000L,
      shardTokens = 1500L)
    import spark.implicits._
    val eval = Seq(
      "It is the case that the answer to the benchmark question is in the set.")
      .toDF("text")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stageA] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // NOTE: crawlDocs is private to SparkEntry; drive through the bench
    // breakdown row instead (same code path the bench times).
    val fn182 = SparkEntry.benchBreakdown.collectFirst {
      case ("q182_pipeline_e2e", "q182_ledger", f) => f
    }.get
    t("benchBreakdown q182_ledger")(fn182(spark, sfDir))

    // replica crawl (same synthesis as ProbeExtract) for the split probes
    val c = ProbeExtract.crawl(spark, sfDir)
    val ledger = t("eager(ledgerProjection) alone")(
      graft.ops.Materialize.eager(graft.ops.Pipeline.ledgerProjection(
        c, "doc_id", "url", "source", "html", cfg)))
    t("curateFromLedger constructors")(
      graft.ops.Pipeline.curateFromLedger(
        ledger, eval, "text", cfg, "doc_id", "source"))
    t("curateStages end-to-end")(
      graft.ops.Pipeline.curateStages(
        c, "doc_id", "url", "source", "html", eval, "text", cfg))
    spark.stop()
  }
}
