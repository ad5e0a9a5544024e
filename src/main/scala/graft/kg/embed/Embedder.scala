package graft.kg.embed

import scala.util.hashing.MurmurHash3

/** Embedding stage interface (reference `utils/common.py:50-98`:
  * SentenceTransformer E5-base-v2, L2-normalized). A real model would be
  * plugged in behind this trait inside a `mapPartitions` batch stage; the
  * sandbox default is the deterministic [[HashEmbedder]] (SURVEY.md §7.5).
  *
  * E5 prefix convention (reference `utils/common.py:70-82`,
  * `retrieval.py:93`): passages embedded as `"passage: " + text`,
  * queries as `"query: " + text`.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed raw text (no prefix). Returns a unit-L2 vector (or zeros for
    * degenerate input, mirroring `common.py:92-98`). */
  def embed(text: String): Array[Float]

  final def embedPassage(text: String): Array[Float] = embed("passage: " + text)
  final def embedQuery(text: String): Array[Float] = embed("query: " + text)
}

object Embedder {
  /** Dot product; on unit vectors this IS cosine similarity (the
    * reference L2-normalizes at `common.py:86`, so Qdrant COSINE ==
    * dot — SURVEY.md §2.11 M2). */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}

/** Deterministic feature-hashing embedder (spec in SURVEY.md §7.5):
  * character 3-grams of the lowercased text (with begin/end sentinels)
  * are murmur3-hashed into `dim` buckets with a hash-derived sign, then
  * L2-normalized. Deterministic, prefix-sensitive, cosine-capable:
  * identical strings → cosine 1.0; near-identical strings (alias pairs
  * like "utilLib"/"util lib") share most 3-grams → high cosine. */
final class HashEmbedder(val dim: Int = 768) extends Embedder {
  private val BucketSeed = 0x9747b28c
  private val SignSeed = 0x85ebca6b

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val s = "\u0001" + (if (text == null) "" else text.toLowerCase) + "\u0002"
    if (s.length < 3) return v
    var i = 0
    while (i + 3 <= s.length) {
      val g = s.substring(i, i + 3)
      val bucket = math.floorMod(MurmurHash3.stringHash(g, BucketSeed), dim)
      val sign = if ((MurmurHash3.stringHash(g, SignSeed) & 1) == 0) 1f else -1f
      v(bucket) += sign
      i += 1
    }
    var norm2 = 0.0
    var j = 0
    while (j < dim) { norm2 += v(j).toDouble * v(j).toDouble; j += 1 }
    if (norm2 > 0.0) {
      val inv = (1.0 / math.sqrt(norm2)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}
