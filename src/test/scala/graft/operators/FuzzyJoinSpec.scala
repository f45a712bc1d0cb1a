package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)], d: Int = 1) =
    FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", maxDist = d)
      .select("id1", "id2", "dist").as[(Long, Long, Int)].collect().toSet

  private def lev(s: String, t: String): Int = {
    val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to s.length; j <- 1 to t.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
    d(s.length)(t.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int) = (for {
    (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
    dist = lev(s1, s2) if dist <= d
  } yield (i1, i2, dist)).toSet

  test("substitution, insertion, deletion neighbors are all found") {
    val got = pairs(Seq(
      1L -> "spark", 2L -> "spork",  // substitution
      3L -> "sparks",                // insertion vs 1
      4L -> "spak",                  // deletion vs 1
      5L -> "flink"))                // far from everything
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 1)))
    assert(got.contains((1L, 4L, 1)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("exact duplicates report distance 0, once") {
    val got = pairs(Seq(1L -> "same", 2L -> "same"))
    assert(got == Set((1L, 2L, 0)))
  }

  test("matches a brute-force scan exactly (soundness + completeness)") {
    // small alphabet makes distance-1 pairs dense and adversarial
    val words = for (a <- "abc"; b <- "abc"; c <- "abc") yield s"$a$b$c"
    val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
    assert(pairs(rows) == brute(rows, 1))
  }

  test("d=2: every edit-script shape is found — transposition, " +
      "double substitution, sub+insert, double insert, insert+delete") {
    val got = pairs(Seq(
      1L -> "abcdef",
      2L -> "abcdfe",   // transposition of e,f → lev 2
      3L -> "azcdxf",   // two substitutions at distinct positions
      4L -> "zabcdefy", // two inserts (front and back)
      5L -> "bcdefa",   // delete front + insert back (rotation) → lev 2
      6L -> "xbcdefg",  // sub at front + insert at back
      7L -> "abclmn"),  // distance 3 from 1 — out of range
      d = 2)
    for (other <- 2L to 6L)
      assert(got.exists(p => p._1 == 1L && p._2 == other),
        s"missing pair (1, $other)")
    assert(!got.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("d=2 matches a brute-force scan exactly on a dense space") {
    // all 2- and 3-letter words over {a,b}: crowded distance-2
    // neighborhoods, every witness class exercised
    val words = (for (a <- "ab"; b <- "ab") yield s"$a$b") ++
      (for (a <- "ab"; b <- "ab"; c <- "ab") yield s"$a$b$c") ++
      Seq("", "a", "b")
    val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
    assert(pairs(rows, d = 2) == brute(rows, 2))
  }

  test("d=2 on zero-padded sequential ids (the dense false-candidate " +
      "space the position pruning targets) still matches brute force") {
    val rows = (0 until 120).map(i => (i.toLong, f"Customer#$i%05d"))
    assert(pairs(rows, d = 2) == brute(rows, 2))
  }

  test("singleton and empty-adjacent strings are handled") {
    val got = pairs(Seq(1L -> "a", 2L -> "b", 3L -> "ab"))
    // "a"~"b" substitution, "a"~"ab" insertion, "b"~"ab" insertion
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("maxDist outside {1, 2} is rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(Seq(1L -> "x").toDF("id", "s"), "id", "s", 3)
    }
  }

  test("non-integral id column is rejected, not silently nulled") {
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(
        Seq(("u-1", "x")).toDF("id", "s"), "id", "s", 1)
    }
    assert(e.getMessage.contains("integral"))
  }
}
