package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    (1 to 200).map { i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native expressions register idempotently") {
    VectorExpressions.register(spark)
    VectorExpressions.register(spark)
    assert(VectorExpressions.isRegistered(spark))
  }

  test("native codegen results are bit-identical to the HOF reference forms") {
    VectorExpressions.register(spark)
    val rows = df.select(
      call_function("graft_dot_product", col("a"), col("b")).as("n_dot"),
      dotProduct(col("a"), col("b")).as("h_dot"),
      call_function("graft_cosine_distance", col("a"), col("b")).as("n_cos"),
      cosineDistance(col("a"), col("b")).as("h_cos"),
      call_function("graft_l2_distance", col("a"), col("b")).as("n_l2"),
      l2Distance(col("a"), col("b")).as("h_l2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
      assert(r.getDouble(4) == r.getDouble(5), "l2 mismatch")
    }
  }

  test("zero-norm vector → cosine distance 1 (cos treated as 0), no NaN") {
    VectorExpressions.register(spark)
    val out = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(call_function("graft_cosine_distance", col("a"), col("b")))
      .head().getDouble(0)
    assert(out == 1.0)
  }

  test("null input → null output") {
    VectorExpressions.register(spark)
    val out = Seq((Option.empty[Seq[Float]], Seq(1.0f))).toDF("a", "b")
      .select(call_function("graft_dot_product", col("a"), col("b"))).head()
    assert(out.isNullAt(0))
  }

  test("functions are SQL-visible after registration") {
    VectorExpressions.register(spark)
    val v = spark.sql("SELECT graft_dot_product(array(cast(1.0 as float), cast(2.0 as float)), " +
      "array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
    assert(v == 11.0)
  }

  test("extensions plugin injects the full function surface (vector + hash families)") {
    new graft.plans.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // the plugin and register() share one builder list per family, so the
    // SQL-name surface is identical by construction; pin its breadth here
    val names = (graft.plans.VectorExpressions.builders
      ++ graft.plans.HashExpressions.builders).map(_._1)
    assert(names.size == names.distinct.size)
    assert(names.toSet.contains("graft_cosine_distance")
      && names.toSet.contains("graft_minhash_sig")
      && names.size >= 12)
  }
}
