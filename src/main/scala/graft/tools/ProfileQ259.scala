package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.text

/** Dev tool (round-17 verdict #2): stage-profile q259_ccnet_pipeline to
  * attribute its floor between LM fit, score+join, bucketing and the
  * temperature mixture. Each stage is forced with a noop write of the
  * minimal frame; later stages include their upstream cost (the plan is
  * one DAG), so read DELTAS between successive rows.
  */
object ProfileQ259 {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32, "graft-profile-q259")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm twice, report min of 3 — the Bench floor convention
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $name%-22s min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    def fanOut(df: org.apache.spark.sql.DataFrame, parts: Int) =
      df.repartition(parts, col("doc_id"))

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .where(col("text").isNotNull)
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val model = graft.ext.NgramLm.fit(
      fanOut(docs.where(col("doc_id") <= mid), 8), "text", maxBigrams = 500)
    // model fit is driver-side work inside fit(); time it separately
    val t0 = System.nanoTime()
    val model2 = graft.ext.NgramLm.fit(
      fanOut(docs.where(col("doc_id") <= mid), 8), "text", maxBigrams = 500)
    println(f"STAGE fit(model)          ${(System.nanoTime() - t0) / 1e9}%.3f")

    val scored = graft.ext.NgramLm.score(
        fanOut(docs.where(col("doc_id") > mid), 8), "doc_id", "text", model2)
      .join(docs.select(col("doc_id"), col("lang"), col("text")), Seq("doc_id"))
      .where(col("n_pairs") > 0)
      .withColumn("fit", col("sum_bi").cast("double") / col("n_pairs"))
    t("score+join")(scored.select("doc_id", "fit", "lang"))
    val kept = graft.ops.Profile.rankBuckets(scored, Seq("lang"), "fit", 3)
      .where(col("bucket") >= 1)
    t("rankBuckets")(kept.select("doc_id", "lang", "bucket"))
    t("temperature(full)")(
      graft.ext.Mixtures.temperatureWeights(kept, "lang", alpha = 0.5,
        budget = 50000L, mass = Some(text.tokenCount(col("text")))))
    spark.stop()
  }
}
