package graft

import org.apache.spark.sql.functions._
import graft.operators.Spectral

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("topComponent recovers the direction of a rank-1 corpus") {
    // every x_i = c_i · u with u = (.5,.5,.5,.5) unit: XᵀXv = (Σc²)(u·v)u,
    // so ONE round already yields loading = u and λ = Σc² · (u·v₀) with
    // v₀ uniform (u·v₀ = 1)
    val u = Array(0.5f, 0.5f, 0.5f, 0.5f)
    val df = Seq(1.0f, 2.0f, 3.0f).zipWithIndex
      .map { case (c, i) => (i.toLong, u.map(_ * c).toSeq) }
      .toDF("vec_id", "embedding")
    val out = Spectral.topComponent(df, "embedding", dim = 4, rounds = 2)
      .orderBy("dim")
      .select("loading", "lambda").as[(Double, Double)].collect()
    out.foreach { case (l, lam) =>
      assert(math.abs(l - 0.5) < 1e-9)
      assert(math.abs(lam - 14.0) < 1e-9) // Σc² = 1+4+9
    }
  }

  test("topComponent prefers the dominant direction of a two-cluster corpus") {
    // 10 vectors along e1, 2 along e2 → top component is ±e1
    val df = ((0 until 10).map(i => (i.toLong, Seq(2.0f, 0.0f, 0.0f, 0.0f))) ++
      Seq((100L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val loads = Spectral.topComponent(df, "embedding", dim = 4, rounds = 4)
      .orderBy("dim").select("loading").as[Double].collect()
    assert(math.abs(math.abs(loads(0)) - 1.0) < 1e-6)
    assert(math.abs(loads(1)) < 1e-3)
  }

  test("topComponent is deterministic under repartitioning") {
    val df = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 7 + d * 13) % 11 - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    def run(p: Int) =
      Spectral.topComponent(df.repartition(p), "embedding", 8, 2)
        .orderBy("dim").select("loading", "lambda")
        .as[(Double, Double)].collect().toSeq
    assert(run(1) == run(13)) // exact decimal sums → bit-identical
  }

  test("anisotropyAudit: cancelling directions 0, identical vectors 1") {
    val iso = Seq(Tuple1(Seq(3f, 4f)), Tuple1(Seq(-3f, -4f)))
      .toDF("embedding")
    val r = Spectral.anisotropyAudit(iso, "embedding", 2).head()
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 5.0)       // both norms 5
    assert(r.getDouble(2) == 0.0)       // no norm spread
    assert(r.getDouble(3) == 0.0)       // cv
    assert(r.getDouble(4) == 0.0)       // mean vector cancels
    assert(r.getDouble(5) == 0.0)       // anisotropy 0: isotropic
    val aligned = Seq(Tuple1(Seq(1f, 0f)), Tuple1(Seq(1f, 0f)))
      .toDF("embedding")
    val r2 = Spectral.anisotropyAudit(aligned, "embedding", 2).head()
    assert(r2.getDouble(1) == 1.0 && r2.getDouble(4) == 1.0)
    assert(r2.getDouble(5) == 1.0)      // fully anisotropic
  }

  test("snapshotDrift: exact mean gap, cosine of identical means is 1") {
    import spark.implicits._
    // half A means (1, 0); half B means (0, 1) → delta (1, −1),
    // l2 = √2, cos = 0
    val vecs = Seq((true, Seq(1f, 0f)), (true, Seq(1f, 0f)),
      (false, Seq(0f, 1f)), (false, Seq(0f, 1f))).toDF("h", "v")
    val out = Spectral.snapshotDrift(vecs, "v", "h", topK = 2)
      .collect().map(r => r.getAs[Int]("dim") -> r).toMap
    assert(out(0).getAs[Double]("delta") == 1.0)
    assert(out(1).getAs[Double]("delta") == -1.0)
    assert(out(0).getAs[Double]("cos_means") == 0.0)
    assert(math.abs(out(0).getAs[Double]("l2_gap") - math.sqrt(2)) < 1e-6)
    // identical halves → cosine 1, zero gap
    val same = Seq((true, Seq(3f, 4f)), (false, Seq(3f, 4f)))
      .toDF("h", "v")
    val s = Spectral.snapshotDrift(same, "v", "h", topK = 1).head()
    assert(s.getAs[Double]("cos_means") == 1.0)
    assert(s.getAs[Double]("l2_gap") == 0.0)
  }
}
