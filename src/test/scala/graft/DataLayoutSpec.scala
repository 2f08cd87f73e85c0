package graft

import org.apache.spark.sql.functions._
import graft.operators.DataLayout

class DataLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (x even, y odd)") {
    // x=3 (011) → bits 0,2 set → 1+4; y=5 (101) → bits 1,5 set → 2+32
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(DataLayout.zValue2(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(z == 39L)
  }

  test("z-order buckets partition the input and bound both dimensions") {
    val df = (0L until 4096L).map(i => ((i * 37) % 64, (i * 53) % 64)).toDF("x", "y")
    val stats = DataLayout.zOrderStats(df, "x", "y", bits = 6, nBuckets = 16)
      .collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 4096L)
    // each bucket spans 4096/16 = 256 z-codes = a 16x16 tile: both
    // dimensions bounded within a 16-wide range (the skipping guarantee)
    stats.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 16)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 16)
    }
  }

  test("skew profile surfaces the hot key with its exact ratio") {
    val df = (Seq.fill(100)(0L) ++ (1L to 10L)).toDF("k")
    val top = DataLayout.skewProfile(df, "k", 3).as[(Long, Long, Double)].collect()
    assert(top.head == ((0L, 100L, 100.0 * 11 / 110)))
    assert(top(1)._2 == 1L)
  }
}
