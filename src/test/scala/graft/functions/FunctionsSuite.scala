package graft.functions

import graft.kg.SparkSessionFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("cosine_sim: codegen path matches hand computation, float + double") {
    val s = spark; import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)), // orthogonal
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)), // identical
      (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))  // 45°
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.cosine_sim($"a", $"b").as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 0.0) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - math.sqrt(0.5)) < 1e-12)
    // double arrays too
    val d = Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VectorFunctions.cosine_sim($"a", $"b")).head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("cosine_sim: zero vector yields 0.0; null yields null") {
    val s = spark; import s.implicits._
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine_sim($"a", $"b")).head().getDouble(0)
    assert(z == 0.0)
    val n = Seq((Option.empty[Array[Float]], Some(Array(1.0f))))
      .toDF("a", "b")
      .select(VectorFunctions.cosine_sim($"a", $"b")).head()
    assert(n.isNullAt(0))
  }

  test("dot_product on unit vectors equals cosine_sim") {
    val s = spark; import s.implicits._
    val v1 = Array(0.6f, 0.8f); val v2 = Array(0.8f, 0.6f)
    val df = Seq((v1, v2)).toDF("a", "b")
    val dot = df.select(VectorFunctions.dot_product($"a", $"b")).head().getDouble(0)
    val cos = df.select(VectorFunctions.cosine_sim($"a", $"b")).head().getDouble(0)
    assert(math.abs(dot - cos) < 1e-6)
  }

  test("SQL registration: usable from spark.sql") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " dot_product(array(0.5D, 0.5D), array(0.5D, 0.5D)) AS d")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
  }

  test("type check rejects non-array inputs") {
    val s = spark; import s.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.cosine_sim($"a", $"b")).head()
    }
    assert(ex.getMessage.toLowerCase.contains("cosine_sim") ||
      ex.getMessage.toLowerCase.contains("data type"))
  }

  test("topk_by_score equals orderBy.limit, globally and per group") {
    val s = spark; import s.implicits._
    import graft.functions.TopKByScore.topk_by_score
    val df = (1 to 500).map(i => (i % 7, i * 0.37 % 11, s"p$i"))
      .toDF("g", "score", "payload").cache()
    // global top-10
    val viaAgg = df.select(topk_by_score($"score", $"payload", 10).as("t"))
      .select(explode($"t").as("r")).select($"r.score", $"r.payload")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    val viaSort = df.orderBy($"score".desc, $"payload")
      .select($"score", $"payload").limit(10)
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(viaAgg == viaSort)
    // per-group top-3 composes under GROUP BY (no window sort)
    val perGroup = df.groupBy($"g")
      .agg(topk_by_score($"score", $"payload", 3).as("t"))
      .select($"g", explode($"t").as("r"))
      .select($"g", $"r.score", $"r.payload")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2)))
      .groupBy(_._1)
    perGroup.foreach { case (g, rows) =>
      val expected = df.filter($"g" === g)
        .orderBy($"score".desc, $"payload").limit(3)
        .collect().map(r => (g, r.getDouble(1), r.getString(2))).toSeq
      assert(rows.toSeq == expected, s"group $g mismatch")
    }
  }

  test("GraftExtensions injects SQL functions without explicit register") {
    // the fixture session sets spark.sql.extensions=graft.functions.
    // GraftExtensions — these names must resolve with no register() call
    val r = spark.sql(
      """SELECT t.score, t.payload FROM (
           SELECT explode(topk_by_score(s, p, 2)) AS t FROM VALUES
             (1.0D, 'a'), (3.0D, 'b'), (2.0D, 'c') AS v(s, p))""")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(r == Seq((3.0, "b"), (2.0, "c")))
    val c = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))").head().getDouble(0)
    assert(math.abs(c - 11.0) < 1e-12)
  }
}
