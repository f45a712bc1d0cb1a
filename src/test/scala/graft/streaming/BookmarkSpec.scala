package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

class BookmarkSpec extends SparkSpec {
  import spark.implicits._

  test("first run sees everything; committed files are skipped; " +
      "recommit advances the bookmark") {
    val tmp = Files.createTempDirectory("graft_bm").toString
    val data = s"$tmp/data"
    val manifest = s"$tmp/manifest"

    Seq(1, 2, 3).toDF("x").write.mode("append").parquet(data)
    // no manifest yet → everything is new
    assert(Bookmark.newData(spark, data, manifest).count() == 3)

    Bookmark.commit(spark, data, manifest)
    assert(Bookmark.newData(spark, data, manifest).count() == 0)

    Seq(4, 5).toDF("x").write.mode("append").parquet(data)
    val second = Bookmark.newData(spark, data, manifest)
    assert(second.as[Int].collect().sorted.sameElements(Array(4, 5)))

    Bookmark.commit(spark, data, manifest)
    assert(Bookmark.newData(spark, data, manifest).count() == 0)
  }
}
