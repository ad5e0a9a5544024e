package graft.kg

import graft.kg.textspec._
import org.scalatest.funsuite.AnyFunSuite

class TextSpecSuite extends AnyFunSuite {

  // --- Sentences (P1) ---

  test("splits on terminator + capital") {
    val s = Sentences.split("Alpha calls beta. Gamma uses delta. Done!")
    assert(s == Vector("Alpha calls beta.", "Gamma uses delta.", "Done!"))
  }

  test("does not split on abbreviations or initials") {
    val s = Sentences.split("Dr. Smith wrote code. J. Doe reviewed it.")
    assert(s == Vector("Dr. Smith wrote code.", "J. Doe reviewed it."))
  }

  test("does not split when next word is lowercase") {
    val s = Sentences.split("The ver. number is 3. and counting.")
    assert(s.size == 1)
  }

  test("blank line is a hard boundary") {
    val s = Sentences.split("first paragraph\n\nsecond paragraph")
    assert(s == Vector("first paragraph", "second paragraph"))
  }

  test("question and exclamation marks terminate") {
    val s = Sentences.split("Is it fast? It is! Very fast.")
    assert(s == Vector("Is it fast?", "It is!", "Very fast."))
  }

  test("empty and null inputs") {
    assert(Sentences.split("").isEmpty)
    assert(Sentences.split(null).isEmpty)
  }

  // --- Tokens (P2, P3) ---

  test("tokenize splits words and punctuation") {
    assert(Tokens.tokenize("Alpha calls beta.") ==
      Vector("Alpha", "calls", "beta", "."))
    assert(Tokens.tokenize("a,b;c") == Vector("a", ",", "b", ";", "c"))
  }

  test("underscore identifiers are single tokens") {
    assert(Tokens.tokenize("util_lib works") == Vector("util_lib", "works"))
  }

  test("isAlnum matches Python str.isalnum") {
    assert(Tokens.isAlnum("abc123"))
    assert(!Tokens.isAlnum("util_lib")) // '_' is not alnum in Python either
    assert(!Tokens.isAlnum(""))
    assert(!Tokens.isAlnum("."))
  }

  test("normalize lowercases and drops non-alnum tokens (nlp_graph.py:45)") {
    assert(Tokens.normalize("Alpha calls Beta-Lib.") ==
      Vector("alpha", "calls", "beta", "lib"))
  }

  // --- NGrams (N1-N3, P4) ---

  test("ngram counts follow the sliding law") {
    val toks = Vector("a", "b", "c", "d")
    assert(NGrams.ngrams(toks, 2) == Vector("a b", "b c", "c d"))
    assert(NGrams.ngrams(toks, 3) == Vector("a b c", "b c d"))
    assert(NGrams.ngrams(Vector("x"), 2).isEmpty)
  }

  test("stopwords removed from unigrams ONLY (nlp_graph.py:48-55)") {
    val (uni, bi, tri) = NGrams.extract("The graph is fast")
    assert(uni == Vector("graph", "fast")) // "the", "is" are stopwords
    assert(bi == Vector("the graph", "graph is", "is fast")) // unfiltered
    assert(tri == Vector("the graph is", "graph is fast"))
  }

  test("duplicates kept in term lists (set semantics only at MERGE)") {
    val (uni, _, _) = NGrams.extract("graph graph graph")
    assert(uni == Vector("graph", "graph", "graph"))
  }

  // --- TripletParse (P8, P9, P5) ---

  test("marker format parses (triplets.py:153-175)") {
    val out = TripletParse.parse(
      "<pad><triplet> Alpha <relation> calls <object> Beta</triplet></s>")
    assert(out == Vector(("Alpha", "calls", "Beta")))
  }

  test("multiple triplet segments parse") {
    val out = TripletParse.parse(
      "<triplet> A <relation> r1 <object> B</triplet>" +
        "<triplet> C <relation> r2 <object> D</triplet>")
    assert(out == Vector(("A", "r1", "B"), ("C", "r2", "D")))
  }

  test("marker segment missing a part yields nothing") {
    assert(TripletParse.parse("<triplet> A <relation> r </triplet>").isEmpty)
    assert(TripletParse.parse("<triplet> <relation> r <object> B</triplet>").isEmpty)
  }

  test("heuristic format: exactly 3 parts split on 2+ spaces (triplets.py:176-192)") {
    assert(TripletParse.parse("<pad>Alpha  calls  Beta</s>") ==
      Vector(("Alpha", "calls", "Beta")))
    assert(TripletParse.parse("<pad>only two  parts</s>").isEmpty)
    assert(TripletParse.parse("a  b  c  d").isEmpty) // 4 parts
  }

  test("sanitizeRelation (triplets.py:207-218, dead code parity)") {
    assert(TripletParse.sanitizeRelation("is defined in!") == "IS_DEFINED_IN")
    assert(TripletParse.sanitizeRelation("a-b c") == "AB_C")
  }
}
