package graft

// Measurement probe for the q182 stage-A ledger pass (guide §1.4: noop
// sink, component isolation) — reproduces the stage-A cost decomposition
// recorded in OPTIMIZATION_r15.md. Not part of the library surface; the
// crawl synthesis is a verbatim copy of SparkEntry.crawlDocs (private
// there) and must be kept in sync if that fixture ever changes.
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ProbeExtract {
  private[graft] def crawl(s: SparkSession, d: String): DataFrame = {
    val docs = s.read.parquet(s"$d/documents.parquet")
      .repartition(32, col("doc_id"))
    val canon = col("doc_id") -
      when(col("doc_id") % 10 === 3, lit(3L)).otherwise(lit(0L))
    val inner =
      when(col("doc_id") % 9 === 4,
        lit("It is the standard document of the training corpus and " +
          "the shared body of the page that the editors kept in the " +
          "collection for the reader of it."))
        .otherwise(col("text"))
    val body = concat(
      lit("It is the body of the page that it is in for the set of it " +
        "and it is of the day that it is in it for the set of it and " +
        "the crawl saved it to the store for a reader to read it: "),
      inner,
      lit(" and that is the end of it in the set of the page for the " +
        "day of it and it is all of it."))
    val hashes = "# it is # the tag # of # the day # in # the set # of " +
      "# it # in # the end # of # the day # it is # the one # of # all " +
      "# of # it # okay #."
    docs.select(
      col("doc_id"), col("source"),
      concat(
        lit("https://www.site"), (canon % 37).cast("string"),
        lit(".example.com/a/"), canon.cast("string"),
        when(col("doc_id") % 10 === 3,
          concat(lit("?utm_campaign="), col("doc_id").cast("string"),
            lit("#f"))).otherwise(lit(""))).as("url"),
      concat(
        lit("<html><!-- crawl --><head><style>body { color: red }" +
          "</style><script>if (x < 2) { y = 3; }</script><title>Page" +
          "</title></head><body><h1>Page "),
        col("doc_id").cast("string"),
        lit("</h1><div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About</a></div><p>"),
        body,
        lit("</p><p>It is a pleasant morning for the people of the " +
          "village and the weather is a gentle presence in all of the " +
          "streets.</p><p>The point of it is that the work of the day " +
          "sits in the middle of it for all of the people involved." +
          "</p><p>The point of the note is that it is written for the " +
          "reader and it is kept in the set.</p>"),
        when(col("doc_id") % 6 === 1, lit(
          "<p>It is the same line of it in the day of the set.</p>" +
            "<p>It is the same line of it in the day of the set.</p>" +
            "<p>It is the same line of it in the day of the set.</p>" +
            "<p>It is the same line of it in the day of the set.</p>" +
            "<p>It is the same line of it in the day of the set.</p>"))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0, lit(
          "<p>It is the case that the answer to the benchmark question " +
            "is in the set.</p>")).otherwise(lit("")),
        when(col("doc_id") % 17 === 2,
          concat(lit("<p>"), lit(hashes), lit("</p><p>"), lit(hashes),
            lit("</p>"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(
          "<p>lorem ipsum dolor sit amet the words go on in the line " +
            "of it okay.</p>")).otherwise(lit("")),
        lit("<p>Short bit</p><footer><a href=\"/legal\">Legal notice " +
          "terms page</a> fine print</footer></body></html>")).as("html"))
  }

  // component replicas of TextOps' private strip chain (same regexes)
  private def preStrip(html: Column): Column =
    Seq("(?s)<!--.*?-->",
      "(?is)<script(\\s[^>]*)?>.*?</script>",
      "(?is)<style(\\s[^>]*)?>.*?</style>",
      "(?is)<title(\\s[^>]*)?>.*?</title>")
      .foldLeft(html)((acc, p) => regexp_replace(acc, p, " "))

  private def rawBlocks(pre: Column): Column = {
    val blockTags = "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|td|th|" +
      "blockquote|section|article|header|footer|nav)(\\s[^>]*)?/?>"
    val untagged = regexp_replace(
      regexp_replace(pre, blockTags, "\n"), "<[^>]*>", " ")
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
  }

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

    def time(name: String)(df: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      println(f"[probe] $name%-28s ${t}%6.2f s")
    }

    val c = crawl(spark, sfDir)
    time("gen-only (html col)") { c.select(col("html")) }
    time("gen+len(html)") { c.select(length(col("html")).as("l")) }
    time("prestrip") { c.select(length(preStrip(col("html"))).as("l")) }
    time("prestrip+anchorstrip") { c.select(length(regexp_replace(
      preStrip(col("html")), "(?is)<a(\\s[^>]*)?>.*?</a>", "")).as("l")) }
    time("rawblocks (1 variant)") {
      c.select(length(rawBlocks(preStrip(col("html")))).as("l")) }
    time("rawblocks (2 variants)") {
      val pre = preStrip(col("html"))
      c.select((length(rawBlocks(pre)) + length(rawBlocks(regexp_replace(
        pre, "(?is)<a(\\s[^>]*)?>.*?</a>", "")))).as("l")) }
    time("blockmetrics (full)") {
      c.select(size(graft.ops.TextOps.htmlBlockMetrics(col("html"))).as("s")) }
    time("extract (text)") {
      c.select(length(graft.ops.TextOps.htmlExtractText(col("html"))).as("l")) }
    // screens over already-materialized text (isolate screen cost)
    val txtDir = "/tmp/probe_extract_text"
    c.select(col("doc_id"),
      graft.ops.TextOps.htmlExtractText(col("html")).as("text"))
      .write.mode("overwrite").parquet(txtDir)
    val txt = spark.read.parquet(txtDir)
    time("screens on extracted") {
      txt.select(graft.ops.TextOps.curationFirstFailFull(
        col("text"), Seq("customer query", "window merge"), 3).as("v")) }
    time("tokencount on extracted") {
      txt.select(graft.ops.TextOps.tokenCount(col("text")).as("n")) }
    time("full ledgerProjection") {
      val cfg = graft.ops.Pipeline.CurationConfig(
        blockedDomains = Seq("site5.example.com", "site11.example.com"),
        phrases = Seq("customer query", "window merge"),
        weights = (0 until 20).map(i => s"src$i" ->
          (if (i == 3) 8L else 1L)).toMap,
        budgetTokens = 12000L,
        shardTokens = 1500L)
      graft.ops.Pipeline.ledgerProjection(
        c, "doc_id", "url", "source", "html", cfg) }
    spark.stop()
  }
}
