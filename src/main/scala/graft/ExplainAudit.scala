package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.LocalIo(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("q5_multiway_join", "q1_agg", "r_bgp_join", "q_asof_join",
        "d_prefix_dup", "q_kmv_distinct", "w_funnel", "s_pq_ann", "t_source_cap",
        // round-7 skew-safe rewrites: prefix passes + join-back doc freq
        "t_quality_percentile", "t_token_budget", "d_span_dup", "g_label_prop",
        // round-8: boundary-merge per-user ops + new pipeline gates
        "w_sessionize", "w_row_number_lag", "t_bm25", "s_hard_negatives",
        // round-10 batch 4: posting-list retrieval, margin mining,
        // rolling sketch composition, equi-binned interval overlap
        "t_sparse_cosine", "s_margin_mining", "w_rolling_hll",
        "w_interval_overlap")) {
      println(s"===== $name =====")
      Queries.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
