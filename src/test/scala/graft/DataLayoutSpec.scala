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

  test("skipStats/skipSummary: sorted layout prunes, shuffled layout cannot") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values 1..100; predicate [41, 60]; files of 20 rows
    // sorted layout: files [1-20][21-40][41-60][61-80][81-100] → 4 skippable
    // "shuffled" layout: file = v % 5 → every file spans the range → 0
    val df = (1 to 100).map(_.toLong).toDF("v")
    val sorted = graft.operators.DataLayout.skipStats(df,
      expr("(v - 1) div 20"), col("v"), lit(41L), lit(60L))
    val shuffled = graft.operators.DataLayout.skipStats(df,
      expr("v % 5"), col("v"), lit(41L), lit(60L))
    val out = graft.operators.DataLayout
      .skipSummary(Seq("sorted" -> sorted, "shuffled" -> shuffled))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("sorted") == ((5L, 4L, 80L, 0.8)))
    assert(out("shuffled") == ((5L, 0L, 0L, 0.0)))
  }

  test("compaction plan cuts key-aligned files with disjoint key ranges") {
    // keys 0..9, 10 rows each; target 25 rows/file → files of 3,3,3,1 keys
    val df = (0L until 100L).map(i => Tuple1(i % 10)).toDF("k")
    val plan = DataLayout.compactionPlan(df, "k", 25)
      .orderBy("file_id")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(plan.map(_._3).sum == 100L) // partitions the input
    assert(plan.map(_._1).toSeq == plan.map(_._1).toSeq.distinct)
    // key-aligned: ranges are disjoint and ordered (max of file i < min of i+1)
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4)
      case _ =>
    }
    // a key is never split: n_rows per file is a multiple of the 10/key
    plan.foreach(f => assert(f._3 % 10 == 0 && f._3 / 10 == f._2))
  }

  test("compact writes key-clustered files honoring maxRecordsPerFile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    val out = s"${dir.getAbsolutePath}/t"
    val df = (0L until 1000L).map(i => (i % 50, i)).toDF("k", "v")
    DataLayout.compact(df, out, "k", nFiles = 4, maxRecordsPerFile = 300)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 4) // 4 ranges, one split by the record cap
    val back = spark.read.parquet(out)
    assert(back.count() == 1000L)
    // range clustering: per-file key ranges from distinct parquet splits
    // barely overlap — check global data equality instead of footers here
    assert(back.agg(sum("v")).as[Long].head() == (0L until 1000L).sum)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("compact write path: per-file key ranges are disjoint and capped") {
    // the footer-stats contract a reader prunes on: ordered by min key,
    // file N's max <= file N+1's min (boundaries may share one key), and
    // no file exceeds maxRecordsPerFile
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toFile
    val out = s"${dir.getAbsolutePath}/t"
    val df = (0L until 2000L).map(i => ((i * 7919L) % 100, i)).toDF("k", "v")
    DataLayout.compact(df, out, "k", nFiles = 4, maxRecordsPerFile = 250)
    val stats = spark.read.parquet(out)
      .select(col("k"), input_file_name().as("f"))
      .groupBy("f")
      .agg(min("k").as("mn"), max("k").as("mx"), count(lit(1)).as("n"))
      .orderBy("mn", "mx")
      .as[(String, Long, Long, Long)].collect()
    assert(stats.forall(_._4 <= 250L))
    assert(stats.length >= 8) // 4 ranges, each split by the cap
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2, s"overlapping file ranges: $a vs $b")
    case _ => ()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("ringShard: movers on node-join land ONLY on the new node") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("k")
    val moved = keys
      .withColumn("n4", DataLayout.ringShard(col("k"), 4, 8))
      .withColumn("n5", DataLayout.ringShard(col("k"), 5, 8))
      .filter(col("n4") =!= col("n5"))
    // the consistent-hashing contract: every mover goes to the newcomer
    assert(moved.filter(col("n5") =!= 4).count() == 0)
    // and a sane share moves (≈1/5; allow wide slack on 500 keys)
    val frac = moved.count().toDouble / 500
    assert(frac > 0.05 && frac < 0.45, s"moved_frac $frac")
    // assignment is total and within range
    val nodes = keys.select(DataLayout.ringShard(col("k"), 4, 8).as("n"))
      .distinct().as[Int].collect().toSet
    assert(nodes.subsetOf(Set(0, 1, 2, 3)))
  }

  test("deltaEncodingAudit: zigzag widths over natural-order deltas") {
    import spark.implicits._
    // order by k: a = 10,11,11,13 → deltas 1,0,2 → bits 2,0,3
    //   avg = 5/3; zero_frac = 1/3; max = 3
    val df = Seq((1L, 10L), (2L, 11L), (3L, 11L), (4L, 13L))
      .toDF("k", "a")
    val out = DataLayout.deltaEncodingAudit(df, Seq("k"), Seq("a"))
      .head()
    assert(out.getAs[Long]("n") == 4L)
    assert(math.abs(out.getAs[Double]("avg_delta_bits") - 5.0 / 3) < 1e-6)
    assert(math.abs(out.getAs[Double]("zero_delta_frac") - 1.0 / 3) < 1e-6)
    assert(out.getAs[Long]("max_delta_bits") == 3L)
  }

  test("encodingAdvisor: exact NDV, natural-order runs, dict width") {
    import spark.implicits._
    // storage order (by k): a = x,x,y,y → 2 runs; b = 4 distinct → 4 runs
    val df = Seq((1L, "x", 10L), (2L, "x", 20L), (3L, "y", 30L),
      (4L, "y", 40L)).toDF("k", "a", "b")
    val out = DataLayout.encodingAdvisor(df, Seq("k"), Seq("a", "b"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out("a").getAs[Long]("ndv") == 2L)
    assert(out("a").getAs[Long]("runs") == 2L)
    assert(out("a").getAs[Long]("dict_bits") == 1L) // ceil(log2 2)
    assert(out("a").getAs[Double]("avg_run_len") == 2.0)
    assert(out("b").getAs[Long]("runs") == 4L)
    assert(out("b").getAs[Long]("dict_bits") == 2L) // ceil(log2 4)
    assert(!out("b").getAs[Boolean]("dict_recommended")) // 4·100 > 4
  }

  test("hilbertValue2: bijective space-filling path with unit steps") {
    import spark.implicits._
    val grid = for { x <- 0 to 15; y <- 0 to 15 } yield (x.toLong, y.toLong)
    val d = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        DataLayout.hilbertValue2(col("x"), col("y"), 4).as("d"))
      .as[(Long, Long, Long)].collect()
    // bijection onto 0..255
    assert(d.map(_._3).sorted.toSeq == (0L to 255L))
    // the defining Hilbert property: consecutive indices are GRID-
    // ADJACENT (Manhattan distance exactly 1) — Morton order fails this
    val byD = d.map(t => t._3 -> ((t._1, t._2))).toMap
    (0L to 254L).foreach { i =>
      val (x1, y1) = byD(i); val (x2, y2) = byD(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$i: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("bitmapIndexAudit: AND popcount equals direct count incl bit 31") {
    import spark.implicits._
    // rids straddle word boundaries AND hit bit 31 (the int-shift trap)
    val rows = Seq((31L, "x", "p"), (32L, "x", "p"), (63L, "x", "q"),
      (64L, "y", "p"), (95L, "x", "p")).toDF("rid", "a", "b")
    val out = graft.operators.DataLayout
      .bitmapIndexAudit(rows, "rid", "a", "b").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    // (x, p): rids 31, 32, 95 → and = 3; x rows = 4, p rows = 4 → or = 5
    assert(out(("x", "p")) == ((3L, 5L, 3L, true)))
    assert(out(("x", "q")) == ((1L, 4L, 1L, true)))
    assert(out.values.forall(_._4)) // every pair's algebra is exact
  }

  test("lruStackDistance: textbook trace distances and capacity curve") {
    import spark.implicits._
    // trace (one group): a b c a b a — reuses: a@4 d=2, b@5 d=2, a@6 d=1
    val t = Seq("a", "b", "c", "a", "b", "a").zipWithIndex
      .map { case (k, i) => (1L, i.toLong, k) }.toDF("g", "t", "k")
    val out = graft.operators.DataLayout
      .lruStackDistance(t, "g", Seq("t"), "k", Seq(1, 2, 3))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // C=1: no hits; C=2: only d=1 hits; C=3: all three hit
    assert(out(1) == ((6L, 3L, 3L, 0L)))
    assert(out(2) == ((6L, 3L, 3L, 1L)))
    assert(out(3) == ((6L, 3L, 3L, 3L)))
  }

  test("partitionAdvisor: skewed key defeats partition growth; bytes conserved") {
    import spark.implicits._
    // one hot key carries 90 of 100 rows — max partition never drops
    // below the hot key's bytes no matter the partition count
    val rows = ((1L to 90L).map(_ => 7L) ++ (1L to 10L)).toDF("k")
    val out = graft.operators.DataLayout.partitionAdvisor(
      rows, "k", org.apache.spark.sql.functions.lit(10L),
      candidates = Seq(2, 50), budgetBytes = 500L)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(4), r.getBoolean(6)))).toMap
    assert(out(2)._1 == 1000L && out(50)._1 == 1000L) // bytes conserved
    assert(out(50)._2 >= 900L) // hot key floor
    assert(!out(50)._3) // 900 > 500 budget: even 50 partitions can't fit
  }

  test("binningMse: exact hand-computed MSE; uniform data ties the schemes") {
    import spark.implicits._
    // uniform 0..63, 8 bins: both schemes cut identical 8-value bins;
    // per-bin SSE of 0..7 is 42 → mse = 42/8 = 5.25
    val uni = (0L until 64L).map(i => (i, i)).toDF("id", "v")
    val u = graft.operators.DataLayout.binningMse(uni, "id", "v", 8)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mse")).toMap
    assert(u("equal_freq") == 5.25 && u("equal_width") == 5.25)
    // two tight clusters: equal-width isolates them (near-zero MSE)
    // while equal-freq mixes cluster edges into shared bins — the
    // measured verdict the "equi-depth handles skew" folklore misses
    val rows = ((1L to 90L).map(i => (i, i % 10)) ++
      (91L to 100L).map(i => (i, 1000L + i))).toDF("id", "v")
    val out = graft.operators.DataLayout.binningMse(rows, "id", "v", 8)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mse")).toMap
    assert(out("equal_width") < out("equal_freq"))
  }

  test("zOrderAudit: a 2-D rectangle touches far fewer blocks under z-order") {
    // 32x32 grid in row-major natural order: a 8x8 corner rectangle
    // touches ~every natural block (one row-stripe each) but clusters
    // into few z-order blocks
    val grid = (0 until 1024).map { i =>
      (i.toLong, (i % 32).toLong, (i / 32).toLong)
    }.toDF("id", "x", "y")
    val out = graft.operators.DataLayout.zOrderAudit(grid, "id", "x", "y",
        bits = 5, blockRows = 64, xLo = 0, xHi = 7, yLo = 0, yHi = 7)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("blocks_total"), r.getAs[Long]("blocks_touched"),
          r.getAs[Long]("rows_selected"))).toMap
    assert(out("natural")._1 == 16 && out("zorder")._1 == 16)
    assert(out("natural")._3 == 64 && out("zorder")._3 == 64)
    // natural: y in 0..7 -> rows 0..255 -> blocks 0..3 each partially
    // touched; zorder: the 8x8 quadrant is one contiguous 64-row block
    assert(out("zorder")._2 == 1, out.toString)
    assert(out("natural")._2 == 4, out.toString)
    assert(out("zorder")._2 < out("natural")._2)
  }
}
