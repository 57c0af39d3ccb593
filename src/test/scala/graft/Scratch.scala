package graft

import org.apache.spark.sql.functions._

/** Dev scratch harness (Test scope only, never shipped): stage timings for
  * whatever is being optimized right now. Run:
  * `sbt "Test/runMain graft.Scratch"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    import graft.functions.text
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$d/documents.parquet").repartition(32, col("doc_id"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val threshold = 0.9
    val shingleK = 3
    val base = docs0.where(col("text").isNotNull)
      .select(col("doc_id").as("doc"), text.tokens(col("text")).as("__toks"))
    val shingled = base.where(size(col("__toks")) >= shingleK)
      .select(col("doc"), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - shingleK)).as("__st"))
      .select(col("doc"), concat_ws(" ",
        slice(col("__toks"), col("__st") + 1, lit(shingleK))).as("token"))
    val shorts = base.where(size(col("__toks")) < shingleK)
      .select(col("doc"), array_join(col("__toks"), " ").as("token"))
    val tok = shingled.unionByName(shorts)
      .select(col("doc"),
        conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long").as("token"))
      .distinct()
    time("scan")(docs0.count())
    time("base tokens")(base.count())
    time("shingled raw")(shingled.count())
    time("shingled+md5")(shingled.select(conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long")).count())
    tok.persist()
    time("tok distinct")(tok.count())
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    time("dfreq")(dfreq.count())
    val docs = tok.join(dfreq, Seq("token"))
      .groupBy(col("doc"))
      .agg(transform(array_sort(collect_list(struct(col("__df"), col("token")))),
        e => e.getField("token")).as("toks"))
    docs.persist()
    time("docs collect+sort")(docs.count())
    val clusters = docs.groupBy(col("toks"))
      .agg(sort_array(collect_list(col("doc"))).as("members"))
      .select(col("toks"), col("members"),
        col("members").getItem(0).as("rep"), size(col("toks")).as("sz"),
        (size(col("toks")) - ceil(lit(threshold) * size(col("toks"))) + 1)
          .cast("int").as("__pl"))
    clusters.persist()
    time("clusters")(clusters.count())
    val prefix = clusters.select(col("rep"), col("sz"),
      explode(slice(col("toks"), lit(1), col("__pl"))).as("token"))
    val cand = prefix.select(col("token"), col("rep").as("rl"), col("sz").as("__szl"))
      .join(prefix.select(col("token"), col("rep").as("rr"), col("sz").as("__szr")),
        Seq("token"))
      .where(col("rl") < col("rr") &&
        lit(threshold) * col("__szl") <= col("__szr") &&
        lit(threshold) * col("__szr") <= col("__szl"))
      .select(col("rl"), col("rr")).distinct()
    cand.persist()
    time("candidates")(cand.count())
    val side = clusters.select(col("rep"), col("toks"), col("members"))
    val cross = cand
      .join(side.select(col("rep").as("rl"), col("toks").as("__tl"),
        col("members").as("__ml")), Seq("rl"))
      .join(side.select(col("rep").as("rr"), col("toks").as("__tr"),
        col("members").as("__mr")), Seq("rr"))
      .withColumn("__ic", size(array_intersect(col("__tl"), col("__tr"))))
      .withColumn("__jac", col("__ic").cast("double") /
        (size(col("__tl")) + size(col("__tr")) - col("__ic")))
      .where(col("__jac") >= threshold)
    time("verify+expand")(cross
      .select(explode(col("__ml")).as("a"), col("__mr"), col("__jac"))
      .select(col("a"), explode(col("__mr")).as("b"), col("__jac")).count())
    spark.stop()
  }
}
