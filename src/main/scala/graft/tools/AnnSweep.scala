package graft.tools

import graft.kg.GraftConfig
import graft.kg.embed.{Embedder, HashEmbedder}
import graft.kg.fixtures.CorpusGen
import graft.kg.pipeline.Pipeline
import graft.kg.retrieve.VectorIndex
import org.apache.spark.sql.SparkSession

/** Recall-vs-read-amplification sweep for the ANN sign-sketch index
  * (VERDICT r3 #5): measures recall@10 of the multi-probe LSH lookup
  * against the exact brute-force top-10, across L ∈ {4, 8} hash tables
  * and probe radius r ∈ {0, 1, 2}, over the deterministic bench corpus.
  *
  * The sketch math here is the same md5-plane spec the engine layout uses
  * ([[VectorIndex.planeWeights]] / [[VectorIndex.queryBuckets]]), run
  * driver-side over the collected chunk vectors — at the sweep corpus
  * size (~2k chunks) that is exact and instant, and lets one run cover
  * every (L, r) cell without rebuilding six stored layouts.
  *
  * Output: one markdown table row per (L, r) with mean/min recall@10,
  * the probed-directory fraction (partition-level read amplification) and
  * the measured candidate-row fraction. Feeds the default choice
  * documented in BENCH/BASELINE.md.
  *
  * Usage: runMain graft.tools.AnnSweep [repos] [filesPerRepo] [nQueries]
  */
object AnnSweep {

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def main(args: Array[String]): Unit = {
    val repos = args.lift(0).map(_.toInt).getOrElse(9)
    val files = args.lift(1).map(_.toInt).getOrElse(23)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(60)
    val topK = 10

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-ann-sweep")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val embedder: Embedder = new HashEmbedder()
    val dim = embedder.dim
    val corpus = spark.createDataset(CorpusGen.generate(repos, files, seed = 42L).rows)
    val run = new Pipeline(GraftConfig(linkMode = "exact")).run(corpus)
    val withText = run.chunkEmbeddings.toDF()
      .join(run.chunks.toDF().select("chunkId", "text"), Seq("chunkId"))
      .select("chunkId", "vec", "text")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray, r.getString(2)))
      .sortBy(_._1)
    println(s"corpus: ${repos}x$files, ${withText.length} chunks, dim $dim")

    // queries: an even spread of stored chunk texts ("find this document").
    // embedQuery's "query: " prefix makes the query vector differ from the
    // stored passage vector, so recall is non-trivial.
    val step = math.max(1, withText.length / nQueries)
    val queries: Array[Array[Float]] =
      withText.indices.by(step).take(nQueries).map(i => embedder.embedQuery(withText(i)._3)).toArray

    val bits = VectorIndex.BitsPerTable
    val maxL = 8
    val planes = Array.tabulate(maxL * bits)(pid => VectorIndex.planeWeights(pid, dim))
    // per-plane dataset-median thresholds (the balanced-bucket layout) —
    // same interpolation as VectorIndex.computeThresholds
    val medians: Array[Double] = Array.tabulate(maxL * bits) { pid =>
      val projs = withText.map(c => dot(c._2, planes(pid))).sorted
      val pos = 0.5 * (projs.length - 1)
      val lo = pos.toInt
      if (lo == projs.length - 1) projs(lo)
      else projs(lo) + (pos - lo) * (projs(lo + 1) - projs(lo))
    }

    val bruteTop: Array[Set[Int]] = queries.map { qv =>
      withText.indices
        .sortBy(i => (-dot(withText(i)._2, qv), withText(i)._1))
        .take(topK).toSet
    }

    // rowFrac = Σ_tables (rows in probed buckets) / index rows — the true
    // read amplification of the partitioned layout (candFrac counts each
    // chunk once; the layout stores it L times)
    for ((label, thr) <- Seq(
        ("raw-sign (thr=0)", Array.fill(maxL * bits)(0.0)),
        ("median-threshold", medians))) {
      def sketch(v: Array[Float], l: Int): Int =
        (0 until bits).map { p =>
          val pid = l * bits + p
          if (dot(v, planes(pid)) > thr(pid)) 1 << p else 0
        }.sum
      val chunkSketches: Array[Array[Int]] =
        withText.map { case (_, v, _) => Array.tabulate(maxL)(l => sketch(v, l)) }
      println(s"### $label (K=$bits)")
      println("| L | r | probed dirs | dir frac | mean row frac | mean cand frac | recall@10 mean | min |")
      println("|---|---|-------------|----------|---------------|----------------|----------------|-----|")
      for (l <- Seq(4, 8); radius <- Seq(0, 1, 2)) {
        val masks = (0 until (1 << bits)).filter(m => Integer.bitCount(m) <= radius)
        val dirs = l * masks.size
        val total = l * (1 << bits)
        val cells = queries.indices.map { qi =>
          val qv = queries(qi)
          val probed: Array[Set[Int]] =
            Array.tabulate(l) { t => val base = sketch(qv, t); masks.map(base ^ _).toSet }
          val cand = withText.indices.filter { ci =>
            (0 until l).exists(t => probed(t).contains(chunkSketches(ci)(t)))
          }
          val rowsRead = withText.indices.map { ci =>
            (0 until l).count(t => probed(t).contains(chunkSketches(ci)(t)))
          }.sum
          val top = cand
            .sortBy(i => (-dot(withText(i)._2, qv), withText(i)._1))
            .take(topK).toSet
          val recall = (top intersect bruteTop(qi)).size.toDouble / bruteTop(qi).size
          (recall, cand.size.toDouble / withText.length,
            rowsRead.toDouble / (withText.length.toDouble * l))
        }
        val recalls = cells.map(_._1)
        val fracs = cells.map(_._2)
        val rows = cells.map(_._3)
        println(f"| $l | $radius | $dirs / $total | ${dirs.toDouble / total}%.3f " +
          f"| ${rows.sum / rows.size}%.3f | ${fracs.sum / fracs.size}%.3f " +
          f"| ${recalls.sum / recalls.size}%.3f | ${recalls.min}%.2f |")
      }
    }
    // query-directed multi-probe (Lv et al., VLDB'07): instead of the
    // blind Hamming-ball, rank masks by the summed squared MARGIN of the
    // flipped bits (|projection - threshold| - how close the query sat to
    // each cut) and probe the P cheapest masks per table. Also swept over
    // K (bits per table): more bits -> finer buckets -> smaller candidate
    // row fraction, at a recall cost the directed probing buys back.
    for (kb <- Seq(6, 8, 10)) {
      val planesK = Array.tabulate(maxL * kb)(pid => VectorIndex.planeWeights(pid, dim))
      val mediansK: Array[Double] = Array.tabulate(maxL * kb) { pid =>
        val projs = withText.map(c => dot(c._2, planesK(pid))).sorted
        val pos = 0.5 * (projs.length - 1)
        val lo = pos.toInt
        if (lo == projs.length - 1) projs(lo)
        else projs(lo) + (pos - lo) * (projs(lo + 1) - projs(lo))
      }
      def sketchAndMargins(v: Array[Float], l: Int): (Int, Array[Double]) = {
        var base = 0
        val margins = new Array[Double](kb)
        (0 until kb).foreach { p =>
          val pid = l * kb + p
          val m = dot(v, planesK(pid)) - mediansK(pid)
          margins(p) = m
          if (m > 0) base |= (1 << p)
        }
        (base, margins)
      }
      val chunkSketches: Array[Array[Int]] =
        withText.map { case (_, v, _) =>
          Array.tabulate(maxL)(l => sketchAndMargins(v, l)._1) }
      println(s"### median-threshold + query-directed probes, K=$kb")
      println("| L | P/table | dir frac | mean row frac | recall@10 mean | min |")
      println("|---|---------|----------|---------------|----------------|-----|")
      for (l <- Seq(4, 8); probes <- Seq(4, 8, 12, 16, 24, 32)) {
        val cells = queries.indices.map { qi =>
          val qv = queries(qi)
          val probed: Array[Set[Int]] = Array.tabulate(l) { t =>
            val (base, margins) = sketchAndMargins(qv, t)
            // rank only masks flipping <= 4 bits: at K=10 the full 2^K
            // sort is slow and deep flips never rank in the cheap set
            val masks = (0 until (1 << kb))
              .filter(m => Integer.bitCount(m) <= 4)
              .sortBy(m => (0 until kb)
                .filter(p => (m & (1 << p)) != 0)
                .map(p => margins(p) * margins(p)).sum)
            masks.take(probes).map(base ^ _).toSet
          }
          val cand = withText.indices.filter { ci =>
            (0 until l).exists(t => probed(t).contains(chunkSketches(ci)(t)))
          }
          val rowsRead = withText.indices.map { ci =>
            (0 until l).count(t => probed(t).contains(chunkSketches(ci)(t)))
          }.sum
          val top = cand
            .sortBy(i => (-dot(withText(i)._2, qv), withText(i)._1))
            .take(topK).toSet
          val recall = (top intersect bruteTop(qi)).size.toDouble / bruteTop(qi).size
          (recall, rowsRead.toDouble / (withText.length.toDouble * l))
        }
        val recalls = cells.map(_._1)
        val rows = cells.map(_._2)
        println(f"| $l | $probes | ${probes.toDouble / (1 << kb)}%.3f " +
          f"| ${rows.sum / rows.size}%.3f | ${recalls.sum / recalls.size}%.3f " +
          f"| ${recalls.min}%.2f |")
      }
    }
    run.cleanup()
    spark.stop()
  }
}
