package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, String)]) =
    FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("id1", "id2", "dist").as[(Long, Long, Int)].collect().toSet

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
    val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val brute = (for {
      (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
      d = lev(s1, s2) if d <= 1
    } yield (i1, i2, d)).toSet
    assert(pairs(rows.toSeq) == brute)
  }

  test("singleton and empty-adjacent strings are handled") {
    val got = pairs(Seq(1L -> "a", 2L -> "b", 3L -> "ab"))
    // "a"~"b" substitution, "a"~"ab" insertion, "b"~"ab" insertion
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("maxDist other than 1 is rejected") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(Seq(1L -> "x").toDF("id", "s"), "id", "s", 2)
    }
  }
}
