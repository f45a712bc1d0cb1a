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
}
