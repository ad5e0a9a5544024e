package graft.ops

import graft.kg.textspec.Stopwords
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators (SURVEY.md §2.2/§2.4 + the training-data
  * pipeline ops: language-ID, quality scoring, token counting, document
  * fingerprinting) over the driver's `documents`/`part` tables, each with
  * a DuckDB oracle.
  */
object TextOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** SQL-escape + quote a term list. */
  private def sqlList(words: Iterable[String]): String =
    words.toSeq.sorted.map(w => "'" + w.replace("'", "''") + "'").mkString(", ")

  private val stopwordsSql = sqlList(Stopwords.english)
  private val stopwordsArr = Stopwords.english.toSeq.sorted

  // fixed retrieval terms for the A1 term-relevance check
  private val queryTerms = Seq("merge", "join", "fast")

  // language marker words (mechanics check: the synthetic corpus is
  // English-ish for every lang value, so scores — not accuracy — are the
  // contract; tie-break order is pinned in both engines)
  private val langMarkers = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "la", "et"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2/P3/N1: tokenize + explode + count (term table build).
    "q13_tokenize_explode" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(30)
    }),

    // N2 bigram generation via higher-order functions (no UDF).
    "q14_bigrams" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
          .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(30)
    }),

    // P4: stopword filter (pinned NLTK list) before counting.
    "q15_stopword_filter" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(!col("tok").isin(stopwordsArr: _*))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(30)
    }),

    // P7: regexp_extract_all entity-candidate heuristic.
    "q16_regex_extract" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0))).as("n_long"))
        .orderBy(col("doc_id"))
    }),

    // P5: relation sanitizer (dead-code parity op, triplets.py:207-218).
    "q17_sanitize_relation" -> ((s, dir) => {
      t(s, dir, "part")
        .select(upper(regexp_replace(
          regexp_replace(col("p_type"), "[^0-9a-zA-Z_ ]", ""), " ", "_"))
          .as("rel"))
        .distinct()
        .orderBy(col("rel"))
    }),

    // P10: payload truncation substring.
    "q18_substr_payload" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 100).as("payload"),
          length(col("text")).as("n"))
        .orderBy(col("doc_id"))
    }),

    // M4: deterministic opaque id (UUIDv5 analogue) via md5.
    "q19_md5_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat(col("source"), lit("|"), col("doc_id").cast("string")))
            .as("point_id"))
        .orderBy(col("doc_id"))
    }),

    // A1: term-relevance SUM per doc, ORDER BY relevance DESC LIMIT k
    // (retrieval.py:204-218 with the TF score spec of SURVEY.md §7.5).
    "q20_term_relevance" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isin(queryTerms: _*))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("relevance"))
        .orderBy(col("relevance").desc, col("doc_id"))
        .limit(10)
    }),

    // A1 variant: DF-weighted (BM25-shaped) term relevance — the
    // reference ranks term search with Lucene fulltext scores
    // (retrieval.py:204-218); raw TF (q20) is the documented spec
    // substitution, this adds the IDF weight a Lucene-like ranking
    // carries: score = Σ_t tf(t,d) · ln(N / df(t)).
    "q38_term_relevance_idf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isin(queryTerms: _*))
      val n = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val dfreq = toks.groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).cast("double").as("tf"))
      tf.join(broadcast(dfreq), Seq("tok"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"),
          (col("tf") * log(col("n_docs") / col("df"))).as("w"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("w")), 6).as("relevance"))
        .orderBy(col("relevance").desc, col("doc_id"))
        .limit(10)
    }),

    // A1 variant: BM25 (Robertson/Sparck-Jones) — the full Lucene-shaped
    // ranking with tf saturation (k1) and length normalization (b) on top
    // of q38's IDF weight: score = Σ_t ln(1 + (N-df+0.5)/(df+0.5)) ·
    // tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)). All partial-aggregable +
    // two broadcast scalars — same shuffle count as q20.
    "q39_term_relevance_bm25" -> ((s, dir) => {
      val (k1, b) = (1.2, 0.75)
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("double").as("dl"))
      val toks = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
        .filter(col("tok").isin(queryTerms: _*))
      val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val dfreq = toks.groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      tf.join(broadcast(dfreq), Seq("tok"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
            .as("w"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("w")), 6).as("relevance"))
        .orderBy(col("relevance").desc, col("doc_id"))
        .limit(10)
    }),

    // Token counting: whitespace tokens + BPE-ish subword estimate
    // (sum of ceil(len/4) per token), grouped per lang.
    "q21_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), split(col("text"), " ").as("toks"))
        .select(col("lang"), size(col("toks")).cast("long").as("n_tok"),
          expr("aggregate(toks, 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))")
            .as("n_bpe"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("tokens"), sum(col("n_bpe")).as("bpe_tokens"),
          count(lit(1)).as("docs"))
        .orderBy(col("lang"))
    }),

    // Quality scoring: token count, mean token length, stopword ratio.
    "q22_quality_score" -> ((s, dir) => {
      val stopArrSql = stopwordsArr.map(w => "'" + w.replace("'", "\\'") + "'")
        .mkString("array(", ", ", ")")
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"),
          length(regexp_replace(col("text"), " ", "")).as("n_chars"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          (col("n_chars").cast("double") / size(col("toks"))).as("mean_tok_len"),
          (expr(s"size(filter(toks, x -> array_contains($stopArrSql, x)))").cast("double")
            / size(col("toks"))).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID by marker-word scoring with pinned tie-break order.
    "q23_lang_id" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val scored = langMarkers.foldLeft(base) { case (df, (lang, markers)) =>
        val arr = markers.map(w => s"'$w'").mkString("array(", ", ", ")")
        df.withColumn(s"score_$lang",
          expr(s"size(filter(toks, x -> array_contains($arr, x)))").cast("long"))
      }
      val predicted = langMarkers.map(_._1).foldRight(lit("unknown")) {
        case (lang, acc) =>
          // strict > of every later-listed language → first max wins
          when(langMarkers.map(_._1).filter(_ != lang)
            .map(o => col(s"score_$lang") >=
              (if (langMarkers.map(_._1).indexOf(o) < langMarkers.map(_._1).indexOf(lang))
                col(s"score_$o") + 1 else col(s"score_$o")))
            .reduce(_ && _) && col(s"score_$lang") > 0, lit(lang)).otherwise(acc)
      }
      scored.select((Seq(col("doc_id")) ++
          langMarkers.map { case (l, _) => col(s"score_$l") } :+
          predicted.as("predicted")): _*)
        .orderBy(col("doc_id"))
    }),

    // Rolling-hash document fingerprint (Rabin-Karp-style polynomial fold
    // over md5-derived token hashes, mod 1e9+7 — engine-portable exact
    // integer arithmetic; base 131).
    "q35_rolling_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), expr(
          """transform(split(text, ' '),
             t -> CAST(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) AS BIGINT))""")
          .as("hs"))
        .select(col("doc_id"), expr(
          """aggregate(slice(hs, 2, size(hs) - 1), hs[0],
             (acc, h) -> (acc * 131L + h) % 1000000007L)""").as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprinting: md5 of whitespace-normalized text +
    // distinct-fingerprint count per source.
    "q24_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("source"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
        .groupBy(col("source"))
        .agg(countDistinct(col("fp")).as("n_distinct"), count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }))

  def oracles: Map[String, String] = {
    val markersSql = langMarkers.map { case (l, ws) =>
      s"len(list_filter(string_split(text, ' '), x -> x IN (${sqlList(ws)}))) AS score_$l"
    }.mkString(", ")
    // predicted: first language (in listed order) that strictly beats all
    // earlier ones and >= all later ones, and has score > 0
    val predictedSql =
      """CASE
         WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
         WHEN score_de > 0 AND score_de > score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de'
         WHEN score_es > 0 AND score_es > score_en AND score_es > score_de AND score_es >= score_fr THEN 'es'
         WHEN score_fr > 0 AND score_fr > score_en AND score_fr > score_de AND score_fr > score_es THEN 'fr'
         ELSE 'unknown' END AS predicted"""
    Map(
      "q13_tokenize_explode" ->
        """SELECT tok, count(*) AS cnt
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 30""",
      "q14_bigrams" ->
        """SELECT bigram, count(*) AS cnt FROM (
             SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
             FROM (SELECT string_split(text, ' ') AS toks FROM documents)
             WHERE len(toks) >= 2)
           GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 30""",
      "q15_stopword_filter" ->
        s"""SELECT tok, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
            WHERE tok NOT IN ($stopwordsSql)
            GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 30""",
      "q16_regex_extract" ->
        """SELECT doc_id, len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long
           FROM documents ORDER BY doc_id""",
      "q17_sanitize_relation" ->
        """SELECT DISTINCT upper(replace(regexp_replace(p_type, '[^0-9a-zA-Z_ ]', '', 'g'), ' ', '_')) AS rel
           FROM part ORDER BY rel""",
      "q18_substr_payload" ->
        """SELECT doc_id, substr(text, 1, 100) AS payload, length(text) AS n
           FROM documents ORDER BY doc_id""",
      "q19_md5_id" ->
        """SELECT doc_id, md5(source || '|' || CAST(doc_id AS VARCHAR)) AS point_id
           FROM documents ORDER BY doc_id""",
      "q20_term_relevance" ->
        s"""SELECT doc_id, count(*) AS relevance
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
            WHERE tok IN (${sqlList(queryTerms)})
            GROUP BY 1 ORDER BY relevance DESC, doc_id LIMIT 10""",
      "q38_term_relevance_idf" ->
        s"""WITH q AS (
              SELECT doc_id, tok
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
              WHERE tok IN (${sqlList(queryTerms)})),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
            dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                      FROM q GROUP BY 1),
            tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
                   FROM q GROUP BY 1, 2)
            SELECT tf.doc_id, round(sum(tf.tf * ln(n.n_docs / dfreq.df)), 6) AS relevance
            FROM tf JOIN dfreq ON dfreq.tok = tf.tok CROSS JOIN n
            GROUP BY 1 ORDER BY relevance DESC, doc_id LIMIT 10""",
      "q39_term_relevance_bm25" ->
        s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            dl AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM d),
            q AS (
              SELECT doc_id, dl, unnest(toks) AS tok FROM dl),
            qf AS (SELECT doc_id, dl, tok FROM q WHERE tok IN (${sqlList(queryTerms)})),
            stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
            dfreq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                      FROM qf GROUP BY 1),
            tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
                   FROM qf GROUP BY 1, 2)
            SELECT tf.doc_id,
              round(sum(ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
                (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 6)
                AS relevance
            FROM tf JOIN dfreq ON dfreq.tok = tf.tok CROSS JOIN stats
            GROUP BY 1 ORDER BY relevance DESC, doc_id LIMIT 10""",
      "q21_token_count" ->
        """SELECT lang,
           CAST(sum(len(toks)) AS BIGINT) AS tokens,
           CAST(sum(list_sum(list_transform(toks, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)))) AS BIGINT) AS bpe_tokens,
           count(*) AS docs
           FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
           GROUP BY 1 ORDER BY 1""",
      "q22_quality_score" ->
        s"""SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tok,
            CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS mean_tok_len,
            CAST(len(list_filter(toks, x -> x IN ($stopwordsSql))) AS DOUBLE) / len(toks) AS stop_ratio
            FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
            ORDER BY doc_id""",
      "q23_lang_id" ->
        s"""SELECT doc_id, $predictedSql, score_en, score_de, score_es, score_fr
            FROM (SELECT doc_id, $markersSql FROM documents)
            ORDER BY doc_id""",
      "q35_rolling_fingerprint" ->
        """SELECT doc_id,
           list_reduce(
             list_transform(string_split(text, ' '),
               t -> ('0x' || substr(md5(t), 1, 8))::BIGINT),
             (acc, h) -> (acc * 131 + h) % 1000000007) AS fp
           FROM documents ORDER BY doc_id""",
      "q24_fingerprint" ->
        """SELECT source, count(DISTINCT md5(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS n_distinct,
           count(*) AS n_docs
           FROM documents GROUP BY 1 ORDER BY 1""")
  }
}
