package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 500L).toDF("id")

  test("shard membership and position are stable across runs and " +
      "cluster layouts") {
    val a = Shuffle.deterministicShard(docs, "id", "s1")
      .as[(Long, String, Long)].collect().toSet
    val b = Shuffle.deterministicShard(docs.repartition(7), "id", "s1")
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }

  test("positions are a contiguous 1..n ranking within every shard") {
    val byShard = Shuffle.deterministicShard(docs, "id", "s1")
      .as[(Long, String, Long)].collect().groupBy(_._2)
    assert(byShard.keys.forall(s => s.length == 1 && "0123456789abcdef".contains(s)))
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("the seed changes the order, not the corpus") {
    val a = Shuffle.deterministicShard(docs, "id", "s1")
      .as[(Long, String, Long)].collect()
    val b = Shuffle.deterministicShard(docs, "id", "s2")
      .as[(Long, String, Long)].collect()
    assert(a.map(_._1).toSet == b.map(_._1).toSet)
    assert(a.toSet != b.toSet) // 500 ids all landing identically is ~impossible
  }

  test("nibble refinement nests: 2-nibble shards partition 1-nibble ones") {
    val fine = Shuffle.deterministicShard(docs, "id", "s1", nibbles = 2)
      .as[(Long, String, Long)].collect()
    val coarse = Shuffle.deterministicShard(docs, "id", "s1", nibbles = 1)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    fine.foreach { case (id, shard, _) =>
      assert(shard.take(1) == coarse(id))
    }
  }
}
