package graft

import graft.kg._
import graft.kg.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Wrap the driver's `documents` table as a corpus Dataset (the
    * Iceberg-shaped input of the north rule: repo/path/commit/lang/
    * content). doc_id becomes the path; source becomes the repo. */
  def documentsAsCorpus(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[CorpusRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("source").as("repo"),
        concat(lit("doc_"), col("doc_id")).as("path"),
        sha2(concat_ws("|", col("source"), col("doc_id")), 256).substr(1, 40).as("commit"),
        col("lang"),
        col("text").as("content"))
      .as[CorpusRow]
  }

  /** The KG pipeline's input corpus: the deterministic synthesized
    * source-code-fact table of BASELINE.json's input_hint (FIXTURES.md §1;
    * the driver's `documents` table carries no sentence/SVO structure, so
    * it feeds the dedup/text-analysis operators instead). Size scales
    * with the sf dir so Bench exercises real load. */
  /** Corpus size per sf dir — shared with the independent KG oracle so
    * both sides generate the identical deterministic corpus. */
  def corpusShape(sfDir: String): (Int, Int) =
    if (sfDir.contains("sf0.1")) (60, 30)
    else if (sfDir.contains("sf0.01")) (20, 12)
    else (8, 6)

  def syntheticCorpus(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[CorpusRow] = {
    import spark.implicits._
    val (repos, files) = corpusShape(sfDir)
    spark.createDataset(kg.fixtures.CorpusGen.generate(repos, files, seed = 42L).rows)
      .repartition(spark.sparkContext.defaultParallelism)
  }

  /** Flagship query on sf=0.001 scale; driver smoke-checks rows>0.
    * Runs the full KG pipeline (chunk → extract → link → canonicalize →
    * materialize edge set) over the synthesized corpus. */
  def entry(spark: SparkSession): DataFrame = {
    val corpus = syntheticCorpus(spark, "sf0.001")
    new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.toDF()
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * (Filled per-operator; each key also present in [[oracleSql]] when
    * SQL-expressible, else covered by the rows-only check.) */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
