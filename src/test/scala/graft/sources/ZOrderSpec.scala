package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits exactly (x even positions, y odd)") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
        .reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (65535L, 0L), (0L, 65535L), (43210L, 12345L))
    val out = cases.toDF("x", "y")
      .select(ZOrder.morton2($"x", $"y")).as[Long].collect()
    assert(out.toSeq == cases.map { case (x, y) => ref(x, y) })
    // known landmark: x=0b11, y=0b01 -> z=0b0111 = 7
    assert(ref(3L, 1L) == 7L)
  }

  test("z-ordered layout prunes a 2-D box to a few files; a 1-D sort " +
      "of the same data cannot") {
    val tmp = graft.EntryKit.scratchTracked("graft_zorder").toString
    // 64×64 grid, one row per cell
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    ZOrder.writeZOrdered(grid, s"$tmp/z", "x", "y", numFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.parquet(s"$tmp/naive")
    def filesTouched(path: String): (Long, Long) = {
      val hit = spark.read.parquet(path)
        .where($"x" >= 8 && $"x" < 16 && $"y" >= 8 && $"y" < 16)
      (hit.count(),
        hit.select(input_file_name()).distinct().count())
    }
    val (zRows, zFiles) = filesTouched(s"$tmp/z")
    val (nRows, nFiles) = filesTouched(s"$tmp/naive")
    assert(zRows == 64 && nRows == 64, "both layouts return the same rows")
    // the 8×8 box is one 64-cell z-aligned quadrant: contiguous in z,
    // so it lives in at most 2 of the 16 range files. The x-sorted
    // layout holds each x-run in one file but the box spans y freely —
    // with 4096 rows over 16 files each file is a 4-wide x-stripe, so
    // the 8-wide box must touch at least 2 and gains nothing on y.
    assert(zFiles <= 2, s"z layout touched $zFiles files")
    assert(nFiles >= 2, s"x-sorted layout touched only $nFiles files")
    // the real claim: z prunes at least as hard as 1-D while ALSO
    // bounding y — check y-pruning directly with a y-only box
    val yOnly = spark.read.parquet(s"$tmp/z")
      .where($"y" >= 0 && $"y" < 4)
    assert(yOnly.select(input_file_name()).distinct().count() <= 8,
      "y-constrained query must skip at least half the z files")
  }
}
