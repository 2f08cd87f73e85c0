package graft

import org.apache.spark.sql.functions._
import graft.operators.Governance

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("row policy keeps exactly the allowlisted keys") {
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val policy = Seq(Tuple1(1L), Tuple1(3L), Tuple1(3L)).toDF("allowed")
    val got = Governance.applyRowPolicy(data, "k", policy, "allowed")
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("mask tail is format-preserving") {
    val got = Seq("Customer#42", "ab", "").toDF("s")
      .select(Governance.maskTail(col("s"), 4).as("m")).as[String].collect().toSeq
    assert(got == Seq("Cust*******", "ab", ""))
  }

  test("generalize bands negative and positive values consistently") {
    val got = Seq(1863.84, -12.5, 0.0, 99.99).toDF("x")
      .select(Governance.generalize(col("x"), 100.0).as("b")).as[Double].collect().toSeq
    assert(got == Seq(1800.0, -100.0, 0.0, 0.0))
  }

  test("url safety rejects non-http schemes, localhost, and private ranges") {
    val cases = Seq(
      "https://ok.example.com/x" -> true,
      "http://ok.example.com/x" -> true,
      "file:///etc/passwd" -> false,
      "ftp://host/x" -> false,
      "http://localhost/admin" -> false,
      "http://127.0.0.1/x" -> false,
      "http://10.1.2.3/x" -> false,
      "http://192.168.0.9/x" -> false,
      "http://172.16.0.1/x" -> false,
      "http://172.32.0.1/x" -> true, // 172.32 is outside RFC-1918
      "http://169.254.1.1/x" -> false)
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Governance.urlIsSafe(col("url")).as("s"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (u, expect) => assert(got(u) == expect, u) }
  }

  test("URL canonicalization collapses cosmetic variants, keeps real differences") {
    val cases = Seq(
      "https://Example.COM/a" -> "https://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:80/a" -> "http://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a", // real port kept
      "https://example.com/a#section" -> "https://example.com/a",
      "https://example.com/a?utm_source=x&b=2&a=1&fbclid=z" ->
        "https://example.com/a?a=1&b=2",
      "https://example.com/a?b=2&a=1" -> "https://example.com/a?a=1&b=2",
      "https://example.com" -> "https://example.com/", // empty path → '/'
      "https://example.com/a?x=1" -> "https://example.com/a?x=1",
      // a '?' INSIDE the fragment is not a query — the whole fragment drops
      "https://example.com/a#sec?x=1" -> "https://example.com/a",
      "https://example.com/a?b=2#sec?x=1" -> "https://example.com/a?b=2")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Governance.canonicalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, expect) => assert(got(u) == expect, u) }
  }

  test("grant catalog: grant/revoke visibility, role union, row filters OR") {
    import graft.plans.Grants._
    val t = Seq((1L, "alice", 700.0, "EU"), (2L, "bob", 50.0, "US"),
      (3L, "carol", 900.0, "EU")).toDF("id", "name", "bal", "region")
    val cat0 = GrantCatalog.empty
      .grant("analyst", TableGrant("cust", Seq("id", "name", "bal"),
        maskedCols = Set("name"), rowFilterSql = Some("region = 'EU'")))
      .grant("auditor", TableGrant("cust", Seq("id", "name"),
        rowFilterSql = Some("bal > 800")))
      .addMember("u1", "analyst")
    // single role: projection, masking, row filter all apply
    val v1 = cat0.viewFor("u1", "cust", t)
    assert(v1.columns.toSeq == Seq("id", "name", "bal"))
    assert(v1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(v1.select("name").as[String].collect().forall(_ == "***"))
    // no grant → AccessDenied, not an empty frame
    intercept[AccessDenied](cat0.viewFor("u2", "cust", t))
    intercept[AccessDenied](cat0.viewFor("u1", "orders", t))
    // second role widens: name unmasks (one granting role leaves it clear),
    // filters OR (EU ∪ bal>800 — here the same rows)
    val cat1 = cat0.addMember("u1", "auditor")
    val v2 = cat1.viewFor("u1", "cust", t)
    assert(v2.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(v2.filter(col("id") === 1L).select("name").as[String].head() == "alice")
    // revoke drops access back to the remaining role
    val cat2 = cat1.revoke("analyst", "cust").removeMember("u1", "analyst")
    val v3 = cat2.viewFor("u1", "cust", t)
    assert(v3.columns.toSeq == Seq("id", "name"))
    assert(v3.select("id").as[Long].collect().toSeq == Seq(3L))
    // revoking the last grant removes access entirely
    intercept[AccessDenied](
      cat2.revoke("auditor", "cust").viewFor("u1", "cust", t))
    // catalog immutability: the original catalog still masks and filters
    assert(cat0.viewFor("u1", "cust", t).select("name")
      .as[String].collect().forall(_ == "***"))
    // invalid identifiers rejected at grant time
    intercept[IllegalArgumentException](
      cat0.grant("r;drop", TableGrant("cust", Seq("id"))))
    intercept[IllegalArgumentException](
      cat0.grant("r", TableGrant("cust", Seq("id; --"))))
  }

  test("grant catalog loads from plain policy tables") {
    import graft.plans.Grants._
    val t = Seq((1L, "alice", 700.0, "EU"), (2L, "bob", 50.0, "US"),
      (3L, "carol", 900.0, "EU")).toDF("id", "name", "bal", "region")
    val grants = Seq(
      ("analyst", "cust", Seq("id", "name", "bal"), Seq("name"), Some("region = 'EU'")),
      ("auditor", "cust", Seq("id", "name"), Seq.empty[String], None))
      .toDF("role", "table", "allowed_cols", "masked_cols", "row_filter")
    val members = Seq(("u1", "analyst"), ("u9", "auditor"))
      .toDF("principal", "role")
    val cat = GrantCatalog.fromPolicyTables(grants, members)
    val v = cat.viewFor("u1", "cust", t)
    assert(v.columns.toSeq == Seq("id", "name", "bal"))
    assert(v.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(v.select("name").as[String].collect().forall(_ == "***"))
    // auditor role: no filter, unmasked, narrower projection
    val v9 = cat.viewFor("u9", "cust", t)
    assert(v9.columns.toSeq == Seq("id", "name"))
    assert(v9.count() == 3)
    intercept[AccessDenied](cat.viewFor("u2", "cust", t))
  }

  test("kAnonymityAudit: class sizes, l-diversity, violation flags") {
    val df = Seq(
      // class (en, 1): 5 rows, 3 sensitive values -> passes both
      ("en", 1L, "a"), ("en", 1L, "a"), ("en", 1L, "b"),
      ("en", 1L, "c"), ("en", 1L, "c"),
      // class (en, 2): 2 rows -> k-violation; 2 distinct -> l-violation
      ("en", 2L, "a"), ("en", 2L, "b"),
      // class (fr, 1): 6 rows but all one sensitive value -> l-violation only
      ("fr", 1L, "a"), ("fr", 1L, "a"), ("fr", 1L, "a"),
      ("fr", 1L, "a"), ("fr", 1L, "a"), ("fr", 1L, "a"))
      .toDF("lang", "bucket", "secret")
    val out = graft.operators.Governance
      .kAnonymityAudit(df, Seq("lang", "bucket"), "secret", k = 5, l = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(out(("en", 1L)) == ((5L, 3L, false, false)))
    assert(out(("en", 2L)) == ((2L, 2L, true, true)))
    assert(out(("fr", 1L)) == ((6L, 1L, false, true)))
  }

  test("dpNoisyCounts: deterministic bounded noise, zero clamp, exact CDF draw") {
    import graft.plans.HashExpressions
    val df = Seq(("s1", "en"), ("s1", "en"), ("s1", "en"), ("s2", "fr"))
      .toDF("source", "lang")
    val out = graft.operators.Governance
      .dpNoisyCounts(df, Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // replay the draw on the driver: fingerprint then scrambled hash
    def fp(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    def noiseOf(key: String): Long = {
      val u = HashExpressions.scrambleHash(fp(key), HashExpressions.PolyBase1)
      val th = graft.operators.Governance.GeometricCdf
      th.collectFirst { case (k, t) if u < t => k.toLong }.getOrElse(8L)
    }
    for (((src, lg), (n, noise, noisy)) <- out) {
      assert(noise == noiseOf(s"$src|$lg"))
      assert(noise >= -8L && noise <= 8L)
      assert(noisy == math.max(0L, n + noise))
    }
    assert(out(("s1", "en"))._1 == 3L && out(("s2", "fr"))._1 == 1L)
  }

  test("tClosenessAudit: exact TVD, absent values count their global mass") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // class A: 3×x, 1×y; class B: 4×y. Global: x=3, y=5, N=8.
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "y"), ("B", "y"), ("B", "y"), ("B", "y")).toDF("qi", "s")
    val out = graft.operators.Governance
      .tClosenessAudit(df, Seq("qi"), "s", t = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // A: ½(|3/4−3/8| + |1/4−5/8|) = ½(3/8+3/8) = 0.375
    assert(out("A") == ((4L, 0.375, true)))
    // B: ½(|0−3/8| + |1−5/8|) = ½(3/8+3/8) = 0.375 — the x-absent class
    // still pays x's full global mass
    assert(out("B") == ((4L, 0.375, true)))
  }

  test("kAnonymityLadder: per-level class profile, first passing level") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "x")).toDF("a", "b")
    val out = graft.operators.Governance
      .kAnonymityLadder(df, Seq(Seq("a", "b"), Seq("a"), Seq()), k = 2)
      .orderBy(col("level")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    assert(out(0) == ((0, "a,b", 3L, 1L, 2L, 0.5, false)))
    assert(out(1) == ((1, "a", 2L, 1L, 1L, 0.25, false)))
    assert(out(2) == ((2, "(all)", 1L, 4L, 0L, 0.0, true)))
  }

  test("ldpFrequency: debias recovers totals; estimates sum to n") {
    import spark.implicits._
    val cats = Seq("a", "b", "c")
    val rows = (1L to 300L).map(i => (i, cats((i % 3).toInt)))
      .toDF("id", "cat")
    val out = graft.operators.Governance
      .ldpFrequency(rows, "id", "cat", cats, pNum = 3, pDen = 4)
      .collect()
    // invariant: sum of debiased estimates == n exactly
    // (Σobs = n and Σ(obs·k·pDen − n(pDen−pNum)) = n·k·pNum)
    assert(math.abs(out.map(_.getAs[Double]("est_n")).sum - 300.0) < 1e-6)
    assert(out.map(_.getAs[Long]("obs_n")).sum == 300L)
    // each category roughly recovered (100 each, noise bounded)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("est_n") - 100.0) < 40.0) }
  }
}
