package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (
    (1L to 800L).map(i => (i, "en")) ++
      (801L to 950L).map(i => (i, "fr")) ++
      (951L to 1000L).map(i => (i, "sw")))
    .toDF("id", "dom")

  test("quotas follow the alpha-scaled distribution and cap at " +
      "availability") {
    val q = Mixture.temperatureQuotas(corpus, "dom", alpha = 0.5,
        budget = 500)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val z = math.sqrt(800.0) + math.sqrt(150.0) + math.sqrt(50.0)
    def want(n: Double): Long =
      math.min(n, math.floor(500 * math.sqrt(n) / z + 0.5)).toLong
    assert(q("en")._2 == want(800.0))
    assert(q("fr")._2 == want(150.0))
    // sw's alpha-scaled ask (74) exceeds its 50 rows — capped
    assert(math.floor(500 * math.sqrt(50.0) / z + 0.5).toLong == 74L)
    assert(q("sw")._2 == 50L)
  }

  test("alpha=1 is proportional; quota caps at domain size when the " +
      "budget overshoots") {
    val q1 = Mixture.temperatureQuotas(corpus, "dom", alpha = 1.0,
        budget = 100)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(q1 == Map("en" -> 80L, "fr" -> 15L, "sw" -> 5L))
    val qBig = Mixture.temperatureQuotas(corpus, "dom", alpha = 0.2,
        budget = 5000)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(qBig("sw") == 50L) // can't sample more than exists
  }

  test("sample meets every quota exactly and is deterministic") {
    val got = Mixture.sample(corpus, "dom", "id", alpha = 0.5,
      budget = 500)
    val byDom = got.groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    val quotas = Mixture.temperatureQuotas(corpus, "dom", 0.5, 500)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(byDom == quotas)
    val again = Mixture.sample(corpus.repartition(7), "dom", "id", 0.5, 500)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == got.select("id").as[Long].collect().sorted.toSeq)
  }

  test("selection within a domain is the md5 rank prefix") {
    val got = Mixture.sample(corpus, "dom", "id", alpha = 0.5, budget = 100)
    val swIds = got.filter($"dom" === "sw").select("id")
      .as[Long].collect().toSet
    val expected = corpus.filter($"dom" === "sw")
      .withColumn("h", md5($"id".cast("string")))
      .orderBy("h", "id").limit(swIds.size)
      .select("id").as[Long].collect().toSet
    assert(swIds == expected)
  }

  test("uniformNegatives: on-ring, never self, deterministic, k draws " +
      "minus self-collisions, spread across the ring") {
    val n = 50L
    val anchors = (0L until n).toDF("id")
    def run() = Mixture.uniformNegatives(anchors, "id", k = 4, n = n)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val out = run()
    assert(out == run(), "same negatives on every run")
    assert(out.forall { case (a, _, neg) => neg != a && neg >= 0 && neg < n })
    // each anchor keeps 3..4 of its 4 draws (at most rare self-hits drop)
    val perAnchor = out.groupBy(_._1).view.mapValues(_.size)
    assert(perAnchor.values.forall(c => c >= 3 && c <= 4))
    // hash draws actually spread: a large fraction of the ring is hit
    assert(out.map(_._3).size > n / 2)
  }

  test("tokenBudgetPlan: desired/planned/rate/epochs arithmetic, " +
      "unweighted domains plan to zero") {
    val docs = Seq(
      ("a", 60L), ("a", 40L),      // available 100
      ("b", 10L),                  // available 10
      ("c", 500L))                 // available 500, no weight
      .toDF("dom", "n_tok")
    val out = Mixture.tokenBudgetPlan(docs, "dom", "n_tok",
        Map("a" -> 0.5, "b" -> 0.5), budget = 200L)
      .as[(String, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    // a: desired 100 == available -> rate 1, one epoch
    assert(out("a") == ("a", 100L, 100L, 100L, 1.0, 1L))
    // b: wants 100 but holds 10 -> rate 1 (planned/available), 10 epochs
    assert(out("b") == ("b", 10L, 100L, 10L, 1.0, 10L))
    // c: no weight -> excluded, zero everything
    assert(out("c") == ("c", 500L, 0L, 0L, 0.0, 0L))
  }

  test("tokenBudgetPlan: a weight whose domain is absent from the " +
      "corpus surfaces as an impossible available=0/desired>0 row, " +
      "never a silent drop") {
    val docs = Seq(("a", 100L)).toDF("dom", "n_tok")
    val out = Mixture.tokenBudgetPlan(docs, "dom", "n_tok",
        Map("a" -> 0.5, "enn" -> 0.5), budget = 200L)
      .as[(String, Long, Long, Long, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set("a", "enn"))
    assert(out("enn") == ("enn", 0L, 100L, 0L, 0.0, 0L))
    // the sanity gate the docs name catches exactly this row
    assert(out.values.count(r => r._3 > 0 && r._2 == 0) == 1)
  }

  test("interleavePlan: every slot prefix matches the target mixture " +
      "within one item per domain (low-discrepancy guarantee)") {
    val docs = ((1L to 40L).map(i => ("a", i)) ++
      (41L to 60L).map(i => ("b", i)) ++
      (61L to 80L).map(i => ("c", i))).toDF("dom", "id")
    val w = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    val plan = Mixture.interleavePlan(docs, "dom", "id", w)
      .as[(String, Long, Long, Long)].collect()
    // slot of the k-th item = ceil(k / w): per-domain slots strictly
    // increase with k
    plan.groupBy(_._1).values.foreach { rows =>
      val byK = rows.sortBy(_._3)
      assert(byK.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    }
    // prefix property: after any N slots, domain d has emitted
    // |{k : ceil(k/w_d) <= N}| = floor(w_d * N) items (±1 for fp)
    for (n <- 1 to 80) {
      val emitted = plan.filter(_._4 <= n).groupBy(_._1)
        .view.mapValues(_.length).toMap
      w.foreach { case (d, wd) =>
        val want = math.floor(wd * n)
        val got = emitted.getOrElse(d, 0)
        assert(math.abs(got - want) <= 1, s"dom=$d N=$n got=$got want=$want")
      }
    }
  }

  test("epochExpand: full epochs for everyone, the md5-ranked prefix " +
      "for the remainder, nothing for unweighted domains") {
    // domain a: 3 docs of 10 tokens (available 30); budget 100 at
    // weight 0.5 -> desired 50 -> 1 full epoch + 20 remainder tokens
    // -> partial epoch = the 2 first-by-md5 docs (cum 0, 10 < 20; the
    // third has cum 20, not < 20). domain z carries no weight.
    val docs = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("z", 9L, 50L)).toDF("dom", "id", "toks")
    val out = Mixture.epochExpand(docs, "dom", "id", "toks",
        Map("a" -> 0.5), budget = 100L)
      .as[(String, Long, Long)].collect()
    assert(out.count(_._3 == 1L) == 3) // full epoch: all 3 docs
    val partial = out.filter(_._3 == 2L).map(_._2).toSet
    assert(partial.size == 2)
    // the partial prefix follows the md5(id:dom) rank order
    val order = Seq(1L, 2L, 3L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:a".getBytes).map("%02x".format(_)).mkString, i))
    assert(partial == order.take(2).toSet)
    assert(!out.exists(_._1 == "z"))
    // totals: emitted tokens per domain = full*available + prefix cut
    assert(out.length == 5)
  }

  test("epochExpand: a weighted domain with zero available tokens (the " +
      "impossible-plan row) expands to nothing, and the window never " +
      "runs over unweighted domains") {
    val docs = Seq(
      ("a", 1L, 0L), ("a", 2L, 0L), // weighted, but supplies no tokens
      ("b", 3L, 10L)).toDF("dom", "id", "toks")
    val out = Mixture.epochExpand(docs, "dom", "id", "toks",
        Map("a" -> 0.5, "b" -> 0.5), budget = 20L)
      .as[(String, Long, Long)].collect()
    assert(!out.exists(_._1 == "a"), out.mkString(","))
    // b: available 10, desired 10 -> exactly 1 full epoch, no partial
    assert(out.toSet == Set(("b", 3L, 1L)))
  }

  test("interleavePlan: unweighted domains are excluded") {
    val docs = Seq(("a", 1L), ("zz", 2L)).toDF("dom", "id")
    val plan = Mixture.interleavePlan(docs, "dom", "id", Map("a" -> 1.0))
      .as[(String, Long, Long, Long)].collect()
    assert(plan.map(_._1).toSet == Set("a"))
    assert(plan.head == (("a", 1L, 1L, 1L)))
  }

  test("curriculumStages bands by score within each group, remainder " +
      "to the first bands, ties broken by id") {
    val docs = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 30.0),
      ("en", 4L, 40.0), ("en", 5L, 50.0),
      // tie group: identical scores -> id order decides the split
      ("de", 1L, 7.0), ("de", 2L, 7.0))
      .toDF("g", "id", "sc")
    val out = Mixture.curriculumStages(docs, "g", "id", "sc", stages = 2)
      .as[(String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // en: 5 rows / 2 stages -> first band takes 3 (remainder rule)
    assert(out(("en", 1L)) == 1 && out(("en", 2L)) == 1 &&
      out(("en", 3L)) == 1)
    assert(out(("en", 4L)) == 2 && out(("en", 5L)) == 2)
    assert(out(("de", 1L)) == 1 && out(("de", 2L)) == 2)
  }

  test("stratifiedExactSplit: every stratum splits to the exact " +
      "ceiling quotas regardless of layout; labels exhaust; the IEEE " +
      "0.8*n boundary rounds down, not up") {
    // strata of 20, 3, and 1 rows
    val rows = ((1L to 20L).map(i => (i, "en")) ++
      (21L to 23L).map(i => (i, "de")) :+ ((24L, "fr"))).toDF("id", "g")
    val out = Mixture.stratifiedExactSplit(rows.repartition(7), "id", "g",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s")
      .as[(Long, String, String)].collect()
    assert(out.length == 24 && out.forall(_._3 != null))
    def quota(g: String) = out.filter(_._2 == g).groupBy(_._3)
      .view.mapValues(_.length).toMap
    // en: ceil(16)=16 train (0.8*20 must NOT become 17), ceil(18)-16=2
    // val, 2 test
    assert(quota("en") == Map("train" -> 16, "val" -> 2, "test" -> 2))
    // de(3): ceil(2.4)=3 train -> val/test empty
    assert(quota("de") == Map("train" -> 3))
    // fr(1): ceil(0.8)=1 train
    assert(quota("fr") == Map("train" -> 1))
    // determinism across layouts
    val again = Mixture.stratifiedExactSplit(rows.coalesce(1), "id", "g",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "s")
      .as[(Long, String, String)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("weightedSample: ES key arithmetic, deterministic across runs " +
      "and partitionings, nonpositive weights excluded, contiguous rk") {
    val rows = (1L to 50L).map(i => (i, if (i % 10 == 0) 0L else i * 7))
      .toDF("id", "w")
    val a = Mixture.weightedSample(rows, "id", "w", k = 10, seed = "s")
      .as[(Long, Long, Double, Int)].collect()
    val b = Mixture.weightedSample(rows.repartition(7), "id", "w",
        k = 10, seed = "s")
      .as[(Long, Long, Double, Int)].collect()
    assert(a.sortBy(_._4).toSeq == b.sortBy(_._4).toSeq)
    assert(a.length == 10 && a.map(_._4).sorted.toSeq == (1 to 10))
    assert(a.forall(_._2 > 0)) // zero-weight rows never sampled
    // rk follows (es_key desc, id) exactly
    val byRank = a.sortBy(_._4)
    assert(byRank.sliding(2).forall { case Array(x, y) =>
      x._3 > y._3 || (x._3 == y._3 && x._1 < y._1) })
    // the key is the documented expression for a known row
    val u = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("1:s")
        .substring(0, 8), 16).toDouble / 4294967296.0
    val expect = BigDecimal(math.pow(u, 1.0 / 7.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row1 = Mixture.weightedSample(rows, "id", "w", k = 50, seed = "s")
      .as[(Long, Long, Double, Int)].collect().find(_._1 == 1L)
    assert(row1.exists(_._3 == expect))
    // a different seed reorders the draw
    val c = Mixture.weightedSample(rows, "id", "w", k = 10, seed = "t")
      .as[(Long, Long, Double, Int)].collect()
    assert(c.map(_._1).toSet != a.map(_._1).toSet ||
      c.sortBy(_._4).map(_._1).toSeq != byRank.map(_._1).toSeq)
  }
}
