package graft.tools

import graft.kg._
import graft.kg.pipeline.Pipeline
import graft.kg.stages._
import graft.kg.extract.RuleSVOExtractor
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-stage wall time of the KG pipeline at a given
  * parallelism, to locate non-scaling components. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8").toInt
    val repos = args.lift(1).map(_.toInt).getOrElse(3000)
    val files = args.lift(2).map(_.toInt).getOrElse(80)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark
      .createDataset(graft.kg.fixtures.CorpusGen.generate(repos, files, 42L).rows)
      .repartition(cores * 4).cache()
    corpus.count()

    def time(name: String)(f: => Long): Unit = {
      // run twice, report steady-state
      f
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"stage":"$name","cores":$cores,"rows":$n,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    // plan-once / execute-many: same Dataset counted repeatedly — isolates
    // driver-side planning (serial) from distributed execution
    val planned = new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges
    planned.count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      planned.count()
      println(f"""{"stage":"planned_exec_$i","cores":$cores,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val docs = Ingest.docs(corpus)
    time("docs") { docs.count() }
    val chunks = Ingest.chunks(docs, 200)
    time("chunks") { chunks.count() }
    time("sentences_split_only") {
      chunks.flatMap(c => graft.kg.textspec.Sentences.split(c.text)).count()
    }
    val triples = Triples.triples(chunks, new RuleSVOExtractor())
    time("triples") { triples.count() }
    time("edges") { Materialize.edges(triples).count() }
    time("full_pipeline") {
      new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.count()
    }
    spark.stop()
  }
}
