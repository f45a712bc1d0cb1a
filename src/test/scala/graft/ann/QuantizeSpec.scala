package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("codes are bounded by ±127 and the reported error bound holds") {
    val vecs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(-3.0f, 3.0f, 1.5f, -1.5f)),
      (3L, Seq(1e-4f, -1e-4f, 5e-5f, 0.0f))).toDF("vec_id", "embedding")
    val out = Quantize.int8Quantize(vecs, "vec_id", "embedding")
      .as[(Long, Double, Seq[Int], Double)].collect()
    out.foreach { case (_, scale, codes, maxErr) =>
      assert(codes.forall(c => c >= -127 && c <= 127))
      // symmetric rounding error is at most half a quantization step
      assert(maxErr <= scale / 2 + 1e-9)
      // the max-magnitude element always lands exactly on ±127
      assert(codes.exists(c => math.abs(c) == 127))
    }
  }

  test("the zero vector quantizes to zeros with scale 0, not a NaN") {
    val out = Quantize.int8Quantize(
        Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .as[(Long, Double, Seq[Int], Double)].head()
    assert(out == ((1L, 0.0, Seq(0, 0), 0.0)))
  }

  test("dequantized vectors reconstruct within max_err everywhere") {
    val vecs = (1L to 50L)
      .map(i => (i, (0 until 8).map(j =>
        math.sin(i * 7 + j).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val rows = Quantize.int8Quantize(vecs, "vec_id", "embedding")
      .join(vecs, "vec_id")
      .select(col("vec_id"), col("scale"), col("codes"),
        col("max_err"), col("embedding"))
      .as[(Long, Double, Seq[Int], Double, Seq[Float])].collect()
    rows.foreach { case (_, scale, codes, maxErr, orig) =>
      codes.zip(orig).foreach { case (c, o) =>
        // max_err rounds to 6 decimals (±5e-7) and the reported scale
        // to 9 (up to 127·5e-10 reconstruction drift): allow both
        assert(math.abs(c * scale - o.toDouble) <= maxErr + 6e-7)
      }
    }
  }

  test("binaryHammingTopK: hamming counts sign flips across word " +
      "boundaries and the rerank restores cosine order") {
    // 70 dims forces two packed words (64 + 6). Query = all-positive.
    // n1 flips NO signs (hamming 0) but has a worse cosine than n2,
    // which flips one sign in word 0 and one in word 1 (hamming 2).
    val dim = 70
    val q = (0 until dim).map(_ => 1.0f)
    val n1 = (0 until dim).map(i => if (i < 35) 1.0f else 0.01f)
    val n2 = q.updated(3, -1.0f).updated(66, -1.0f)
    val n3 = q.map(v => -v) // all flipped: hamming = 70
    val df = Seq((0L, q), (1L, n1), (2L, n2), (3L, n3))
      .toDF("vec_id", "embedding")
    val out = Quantize.binaryHammingTopK(
        df, "vec_id", "embedding", df.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 3, rerank = 3)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(out.sortBy(_._3).map(r => (r._3, r._4)).toSeq ==
      Seq((1L, 0L), (2L, 2L), (3L, 70L)))
    // ranks follow exact cosine, not hamming: n2 (cos 66/70 ~ 0.943)
    // outranks the hamming-0 n1 (cos ~ 0.714)
    assert(out.sortBy(_._2).map(_._3).toSeq == Seq(2L, 1L, 3L))
  }

  test("binaryHammingTopK: a tight rerank budget prunes by hamming " +
      "before any float math sees the pair") {
    val q = Seq.fill(8)(1.0f)
    // hamming: a=0, b=1, c=8; rerank=2 must drop c even though its
    // cosine (−1) would lose anyway — and keep a,b by hamming order
    val df = Seq(
      (0L, q), (1L, q), (2L, q.updated(0, -1.0f)), (3L, q.map(-_)))
      .toDF("vec_id", "embedding")
    val out = Quantize.binaryHammingTopK(
        df, "vec_id", "embedding", df.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 2, rerank = 2)
      .as[(Long, Int, Long, Long, Double)].collect()
    assert(out.map(_._3).toSet == Set(1L, 2L))
  }

  test("int8TopK: full rerank budget equals the exact brute-force topK") {
    // int8 prune scores reorder slightly vs float cosine, but with
    // rerank = |corpus| every candidate survives to the float rerank,
    // so (rank, neighbor, sim) must match Ann.topK exactly
    val vecs = (1L to 40L)
      .map(i => (i, (0 until 8).map(j =>
        math.sin(i * 13 + j * 3).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" <= 3)
    val out = Quantize.int8TopK(vecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 5, rerank = 40)
      .select("q_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val exact = Ann.topK(vecs, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(out == exact)
  }

  test("int8TopK: a tight rerank budget prunes by the int8 cosine and " +
      "a zero vector scores 0, not NaN") {
    val q = Seq(1.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq(
      (0L, q),
      (1L, Seq(1.0f, 1.0f, 0.1f, 0.0f)),   // int8-cos highest
      (2L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),   // mid
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))   // zero vector: qsim 0
      .toDF("vec_id", "embedding")
    val out = Quantize.int8TopK(df, "vec_id", "embedding",
        df.filter($"vec_id" === 0), "vec_id", "embedding",
        k = 2, rerank = 2)
      .as[(Long, Int, Long, Double, Option[Double])].collect()
    assert(out.map(_._3).toSet == Set(1L, 2L))
    val all = Quantize.int8TopK(df, "vec_id", "embedding",
        df.filter($"vec_id" === 0), "vec_id", "embedding",
        k = 3, rerank = 3)
      .as[(Long, Int, Long, Double, Option[Double])].collect()
    val zeroRow = all.find(_._3 == 3L).get
    assert(zeroRow._4 == 0.0)        // int8 prune score guards to 0
    assert(zeroRow._5.isEmpty)       // undefined cosine stays null
    assert(zeroRow._2 == 3)          // nulls rank last
  }

  test("binaryHammingTopK: an empty corpus vector packs to zero words " +
      "instead of tripping the ANSI element_at(0) path") {
    val q = Seq.fill(4)(1.0f)
    val df = Seq((0L, q), (1L, q), (2L, Seq.empty[Float]))
      .toDF("vec_id", "embedding")
    // must not throw; absent words read as 0 bits, so the empty
    // vector's hamming is the query's full popcount (4 positive dims),
    // and its zero-norm cosine is honestly null rather than invented
    val out = Quantize.binaryHammingTopK(
        df, "vec_id", "embedding", df.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 2, rerank = 2)
      .as[(Long, Int, Long, Long, Option[Double])].collect()
    assert(out.map(r => r._3 -> r._4).toMap == Map(1L -> 0L, 2L -> 4L))
    assert(out.find(_._3 == 2L).get._5.forall(_.isNaN))
  }
}
