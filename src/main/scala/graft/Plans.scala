package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries so
  * pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs shuffle),
  * and WholeStageCodegen coverage can be inspected per round.
  *
  * Usage: runMain graft.Plans [queryName ...]   (default: a core set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q02_filter_pushdown", "q03_topk_revenue", "q04_region_revenue",
        "q14_matchmerge_inner", "q21_dedup_minhash", "q24_knn_bruteforce",
        "q52_embed_neardup", "q57_sequence_packing", "q59_asof_join",
        "q64_dedup_increment", "q74_group_topk", "q85_segment_dedup",
        "q89_mixture_apply", "q90_corpus_pipeline", "q91_cdc_merge",
        "q93_bloom_join", "q98_knn_lsh_portable", "q101_partition_pruning",
        "q102_incremental_agg")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
