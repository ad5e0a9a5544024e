package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for the flagship pipeline
  * and the heaviest operator queries, so pushdown / codegen / join
  * strategy can be inspected (the "explain until it's the plan you'd
  * want" loop). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = args.drop(1) match {
      case Array() => Seq("kg_edges_plan", "q01_groupagg", "q29_embed_cosine_dup",
        "q30_knn_bruteforce", "q27_minhash_jaccard", "q20_term_relevance")
      case xs => xs.toSeq
    }
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      name match {
        case "kg_edges_plan" =>
          new Pipeline(GraftConfig(linkMode = "exact"))
            .run(SparkEntry.syntheticCorpus(spark, sfDir))
            .edges.explain("formatted")
        case q =>
          graft.Queries.all(q)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
