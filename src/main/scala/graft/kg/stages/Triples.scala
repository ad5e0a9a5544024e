package graft.kg.stages

import graft.kg._
import graft.kg.extract.TripletExtractor
import graft.kg.textspec.Sentences
import org.apache.spark.sql.Dataset

/** Triple-extraction stage (reference `core/triplets.py:405-430`):
  * re-sentence-tokenize each chunk, run the extractor per sentence, parse
  * model output to (subj, rel, obj).
  *
  * Spark shape: one `mapPartitions` stage so a real model would be
  * initialized once per partition and fed partition-sized batches
  * (replacing the reference's batch-size-1 per-sentence generate,
  * `triplets.py:146-147` — SURVEY.md §4.2). Subject/pred/object are kept
  * VERBATIM here; lowercasing happens at merge (reference
  * `triplets.py:355-363`).
  */
object Triples {

  def triples(chunks: Dataset[Chunk], extractor: TripletExtractor): Dataset[Triple] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      // one extractor "session" per partition (model-init amortization point)
      it.flatMap { c =>
        Sentences.split(c.text).iterator.zipWithIndex.flatMap { case (sent, si) =>
          extractor.extract(sent).map { case (s, p, o) =>
            Triple(c.docId, c.chunkId, si, s, p, o)
          }
        }
      }
    }
  }
}
