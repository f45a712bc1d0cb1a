package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.dedup.Dedup
import graft.relationalize.Relationalize
import graft.schema.SchemaMerge

/** ScalaCheck properties over generated inputs — the invariants the
  * example-based suites can't sweep: relationalize round-trips arbitrary
  * nested data, schema merge is idempotent/additive, exact dedup
  * partitions the corpus.
  */
object PropertySpec extends Properties("graft") {

  // Spark jobs per case are expensive; a handful of generated cases per
  // property still sweeps sizes/shapes example tests would miss.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session

  private val rowsGen: Gen[List[(String, Option[List[Int]])]] = for {
    n <- Gen.chooseNum(1, 8)
    ids = (0 until n).map(i => s"r$i").toList
    arrays <- Gen.listOfN(n, Gen.option(
      Gen.chooseNum(0, 5).flatMap(m =>
        Gen.listOfN(m, Gen.chooseNum(-100, 100)))))
  } yield ids.zip(arrays)

  property("relationalize round-trip: child join-back reconstructs every " +
      "array, parent row count preserved") =
    Prop.forAllNoShrink(rowsGen) { rows =>
      val schema = StructType(Seq(
        StructField("rid", StringType),
        StructField("xs", ArrayType(IntegerType))))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, xs) => Row(id, xs.orNull) }, 2),
        schema)
      val tables = Relationalize.relationalize(
        df, "t", keyCols = Seq("rid"), carryCols = Seq("rid"))
      val root = tables("t")
      val child = tables("t_xs")

      val parentCountOk = root.count() == rows.length
      // reconstruct each non-null array from the child via the carried key
      val rebuilt = child.collect()
        .map(r => (r.getAs[String]("rid"), r.getAs[Int]("index"),
          r.getAs[Int]("xs_val")))
        .groupBy(_._1)
        .map { case (id, es) =>
          id -> es.sortBy(_._2).map(_._3).toList
        }
      val expected = rows.collect {
        case (id, Some(xs)) if xs.nonEmpty => id -> xs
      }.toMap
      val contentOk = rebuilt == expected
      // FK linkage: child ids all appear as parent fk values
      val fks = root.collect()
        .flatMap(r => Option(r.get(r.fieldIndex("xs"))))
        .map(_.asInstanceOf[Long]).toSet
      val childFks = child.collect()
        .map(_.getAs[Long]("id")).toSet
      val fkOk = childFks.subsetOf(fks)
      parentCountOk && contentOk && fkOk
    }

  // Deep corners from the golden contract's edge semantics
  // (tests/test_json_s3_to_parquet.py:365-425): null structs, null/empty
  // outer arrays, null/empty INNER arrays of an array-of-array — the
  // shapes example tests under-sweep.
  private val deepRowsGen
      : Gen[List[(String, Option[(String, Option[Int])], Option[List[Option[List[Int]]]])]] =
    for {
      n <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(n, for {
        s <- Gen.option(Gen.zip(
          Gen.alphaStr.map(_.take(4)), Gen.option(Gen.chooseNum(0, 9))))
        xs <- Gen.option(Gen.chooseNum(0, 3).flatMap(m => Gen.listOfN(m,
          Gen.option(Gen.chooseNum(0, 3).flatMap(k =>
            Gen.listOfN(k, Gen.chooseNum(-9, 9)))))))
      } yield (s, xs))
    } yield rows.zipWithIndex.map { case ((s, xs), i) => (s"r$i", s, xs) }

  property("relationalize deep corners: null struct flattens to nulls, " +
      "array-of-array recurses, empty/null inners reconstruct exactly") =
    Prop.forAllNoShrink(deepRowsGen) { rows =>
      val schema = StructType(Seq(
        StructField("rid", StringType),
        StructField("st", StructType(Seq(
          StructField("a", StringType), StructField("b", IntegerType)))),
        StructField("xs", ArrayType(ArrayType(IntegerType)))))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, s, xs) =>
          Row(id,
            s.map { case (a, b) => Row(a, b.map(Int.box).orNull) }.orNull,
            xs.map(_.map(_.orNull).toSeq).orNull)
        }, 2), schema)
      val tables = Relationalize.relationalize(
        df, "t", keyCols = Seq("rid"), carryCols = Seq("rid"))
      val namesOk = tables.keySet == Set("t", "t_xs", "t_xs_xs_val")

      val root = tables("t").collect()
        .map(r => r.getAs[String]("rid") -> r).toMap
      // null struct → both flattened columns null; non-null → field values
      val structOk = rows.forall { case (id, s, _) =>
        val r = root(id)
        Option(r.getAs[String]("st_a")) == s.map(_._1) &&
          Option(r.get(r.fieldIndex("st_b")))
            .map(_.asInstanceOf[Int]) == s.flatMap(_._2)
      }
      // two-level reconstruction via the FK chain
      val child = tables("t_xs").collect()
      val grand = tables("t_xs_xs_val").collect()
      val innersByFk = grand.groupBy(_.getAs[Long]("id"))
        .map { case (fk, rs) =>
          fk -> rs.sortBy(_.getAs[Int]("index"))
            .map(_.getAs[Int]("xs_val_val")).toList
        }
      val rebuilt = child.groupBy(_.getAs[String]("rid"))
        .map { case (id, rs) =>
          id -> rs.sortBy(_.getAs[Int]("index")).map { r =>
            Option(r.get(r.fieldIndex("xs_val"))).map(fk =>
              innersByFk.getOrElse(fk.asInstanceOf[Long], Nil))
          }.toList
        }
      // a null outer array (or an empty one) produces no child rows
      val expected = rows.collect {
        case (id, _, Some(xs)) if xs.nonEmpty => id -> xs
      }.toMap
      val contentOk = rebuilt == expected
      namesOk && structOk && contentOk
    }

  property("relationalizeDrain ≡ batch relationalize: streamed root and " +
      "child tables match the batch operator over generated rows") =
    Prop.forAllNoShrink(rowsGen) { rows =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions.lit
      val tmp = graft.EntryKit.scratchTracked("graft_pdrain").toString
      val schema = StructType(Seq(
        StructField("recordid", StringType),
        StructField("xs", ArrayType(IntegerType))))
      spark.createDataFrame(
          spark.sparkContext.parallelize(
            rows.map { case (id, xs) => Row(id, xs.orNull) }, 2), schema)
        .withColumn("assessmentid", lit("a"))
        .withColumn("year", lit(2023))
        .withColumn("month", lit(1))
        .withColumn("day", lit(15))
        .write.partitionBy("assessmentid", "year", "month", "day")
        .json(s"$tmp/json/dataset=ds")
      graft.streaming.StreamingIngest.relationalizeDrain(
        spark, s"$tmp/json", "ds", schema, s"$tmp/pq", s"$tmp/ckpt")
        .awaitTermination()
      val batchIn = spark.read.schema(schema)
        .option("basePath", s"$tmp/json/dataset=ds")
        .json(s"$tmp/json/dataset=ds")
      val batch = Relationalize.relationalize(batchIn, "ds",
        keyCols = Seq("recordid"),
        carryCols = graft.pipeline.ParquetJob.CarryCols)

      def roots(d: DataFrame) = d.select("recordid", "xs").collect()
        .map(r => (r.getAs[String]("recordid"),
          Option(r.get(1)).map(_.asInstanceOf[Long])))
        .sortBy(_._1).toSeq
      def children(d: DataFrame) = d.select("id", "index", "xs_val")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq

      val rootOk =
        roots(spark.read.parquet(s"$tmp/pq/ds")) == roots(batch("ds"))
      // the streamed child dir may hold zero part files when no row had a
      // non-empty array; an explicit schema makes the empty read legal
      val streamedChild = spark.read.schema(batch("ds_xs").schema)
        .parquet(s"$tmp/pq/ds_xs")
      val childOk = children(streamedChild) == children(batch("ds_xs"))
      rootOk && childOk
    }

  private val corpusSizesGen: Gen[(List[Int], Int, Int)] = for {
    n <- Gen.chooseNum(1, 40)
    lens <- Gen.listOfN(n, Gen.chooseNum(1, 50))
    maxTokens <- Gen.oneOf(8, 16, 32)
    groups <- Gen.chooseNum(1, 4)
  } yield (lens, maxTokens, groups)

  property("packSequences conserves docs and tokens at any corpus shape, " +
      "group count, and budget") =
    Prop.forAllNoShrink(corpusSizesGen) { case (lens, maxTokens, groups) =>
      import spark.implicits._
      val docs = lens.zipWithIndex
        .map { case (len, i) => (i.toLong, List.fill(len)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val packed = graft.text.TextAnalysis.packSequences(
        docs, "doc_id", "text", maxTokens, groups).collect()
      val docsOk = packed.map(_.getAs[Long]("n_docs")).sum == lens.length
      val toksOk = packed.map(_.getAs[Long]("n_tokens")).sum == lens.sum
      // per group, sequence ids ascend and start at zero
      val seqOk = packed.groupBy(_.getAs[Long]("grp")).forall { case (_, rs) =>
        val s = rs.map(_.getAs[Long]("seq")).sorted.toSeq
        s.head == 0L && s == s.distinct
      }
      docsOk && toksOk && seqOk
    }

  private val chunkGen: Gen[(Int, Int, Int)] = for {
    n <- Gen.chooseNum(0, 120)
    chunkSize <- Gen.chooseNum(2, 40)
    overlap <- Gen.chooseNum(0, chunkSize - 1)
  } yield (n, chunkSize, overlap)

  property("chunks covers every token in order with the exact overlap, " +
      "for any length/size/overlap") =
    Prop.forAllNoShrink(chunkGen) { case (n, chunkSize, overlap) =>
      import spark.implicits._
      val words = (1 to n).map(i => s"w$i")
      val out = Seq(words.mkString(" ")).toDF("text")
        .select(graft.text.TextAnalysis.chunks($"text", chunkSize, overlap))
        .as[Seq[String]].head()
      val step = chunkSize - overlap
      val chunksTok = out.map(_.split(" ").filter(_.nonEmpty).toSeq)
      // chunk i is exactly the token window [i·step, i·step + size)
      val windowsOk = chunksTok.zipWithIndex.forall { case (c, i) =>
        c == words.slice(i * step, i * step + chunkSize)
      }
      // concatenation of de-overlapped chunks reconstructs the corpus
      val rebuilt = chunksTok.zipWithIndex.flatMap { case (c, i) =>
        if (i == 0) c else c.drop(overlap)
      }
      windowsOk && rebuilt == words && out.nonEmpty
    }

  private val typeGen: Gen[DataType] = Gen.oneOf(
    StringType, IntegerType, LongType, DoubleType, BooleanType,
    ArrayType(StringType), ArrayType(IntegerType))

  private val structGen: Gen[StructType] = for {
    n <- Gen.chooseNum(1, 6)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f", "g", "h"))
    types <- Gen.listOfN(n, typeGen)
  } yield StructType(names.toSeq.zip(types).map {
    case (nm, t) => StructField(nm, t)
  })

  property("schema merge is idempotent: merge(a, a) == a") =
    Prop.forAllNoShrink(structGen) { st =>
      SchemaMerge.merge(st, st) == Right(st)
    }

  property("schema merge is additive: result covers both field sets") =
    Prop.forAllNoShrink(structGen, structGen) { (a, b) =>
      SchemaMerge.merge(a, b) match {
        case Right(m) =>
          val names = m.fieldNames.toSet
          a.fieldNames.forall(names) && b.fieldNames.forall(names)
        case Left(errs) => errs.nonEmpty // conflicts must be reported
      }
    }

  private val textsGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 20)
    pool <- Gen.listOfN(5, Gen.alphaStr.map(s => s"doc $s"))
    texts <- Gen.listOfN(n, Gen.oneOf(pool))
  } yield texts

  // Small word pool => dense overlaps; lengths 1-12 sweep the prefix-size
  // boundary cases (|d| - ceil(t*|d|) + 1) of the PPJoin-style filter.
  private val corpusGen: Gen[(List[String], Double)] = for {
    n <- Gen.chooseNum(2, 12)
    texts <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(1, 12)
      ws <- Gen.listOfN(len, Gen.oneOf(
        "alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa"))
    } yield ws.mkString(" "))
    t <- Gen.oneOf(0.3, 0.5, 0.7, 0.8, 0.9)
  } yield (texts, t)

  property("both jaccardPairs variants (counted index, prefix-filtered) " +
      "equal brute-force all-pairs word-set Jaccard") =
    Prop.forAllNoShrink(corpusGen) { case (texts, threshold) =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val counted = Dedup.jaccardPairs(df, "doc_id", "text", threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val prefixed = Dedup.jaccardPairsPrefix(df, "doc_id", "text", threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sets = texts.map(_.toLowerCase.split("\\s+").toSet)
      val expected = (for {
        i <- sets.indices; j <- sets.indices if i < j
        inter = (sets(i) & sets(j)).size
        union = (sets(i) | sets(j)).size
        if union > 0 && inter.toDouble / union >= threshold
      } yield (i.toLong, j.toLong)).toSet
      counted == expected && prefixed == expected
    }

  property("bitset jaccard equals brute-force all-pairs word-set Jaccard") =
    Prop.forAllNoShrink(corpusGen) { case (texts, threshold) =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.jaccardPairsBitset(df, "doc_id", "text", threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sets = texts.map(_.toLowerCase.split("\\s+").toSet)
      val expected = (for {
        i <- sets.indices; j <- sets.indices if i < j
        inter = (sets(i) & sets(j)).size
        union = (sets(i) | sets(j)).size
        if union > 0 && inter.toDouble / union >= threshold
      } yield (i.toLong, j.toLong)).toSet
      got == expected
    }

  property("containment paths (inverted index, adaptive bitset) equal " +
      "brute-force |A∩B|/min over word sets") =
    Prop.forAllNoShrink(corpusGen) { case (texts, threshold) =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val inv = Dedup.containmentPairs(df, "doc_id", "text", threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      // the 10-word corpusGen vocabulary always fits 64 bits, so auto
      // takes the bitset path — the parity under test
      val auto = Dedup.containmentPairsAuto(df, "doc_id", "text", threshold)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val sets = texts.map(_.toLowerCase.split("\\s+").toSet)
      val expected = (for {
        i <- sets.indices; j <- sets.indices if i < j
        inter = (sets(i) & sets(j)).size
        mn = math.min(sets(i).size, sets(j).size)
        if mn > 0 && inter.toDouble / mn >= threshold
      } yield (i.toLong, j.toLong)).toSet
      inv == expected && auto == expected
    }

  property("contentChunks partitions every document: concatenation " +
      "reproduces the text, chunk numbering dense from 0") =
    Prop.forAllNoShrink(corpusGen) { case (texts, _) =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = graft.text.TextAnalysis
        .contentChunks(df, "doc_id", "text", window = 3, divisor = 3)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (id, rows) =>
          id -> rows.sortBy(_.getInt(1)).map(r =>
            (r.getInt(1), r.getString(2))).toSeq
        }
      texts.zipWithIndex.forall { case (t, i) =>
        val chunks = out.getOrElse(i.toLong, Seq.empty)
        chunks.map(_._2).mkString(" ") == t.toLowerCase.trim
          .split("\\s+").mkString(" ") &&
          chunks.map(_._1) == chunks.indices
      }
    }

  // Half-integer lattice values make every bound an exact double, so
  // boundary (p == lo, p == hi) semantics are exercised exactly;
  // zero-width intervals are generated too.
  private val intervalCaseGen: Gen[(List[Double], List[(Double, Double)])] =
    for {
      np <- Gen.chooseNum(1, 30)
      ni <- Gen.chooseNum(1, 15)
      ps <- Gen.listOfN(np, Gen.chooseNum(0, 100).map(_ / 2.0))
      ivs <- Gen.listOfN(ni, for {
        lo <- Gen.chooseNum(0, 100).map(_ / 2.0)
        w <- Gen.chooseNum(0, 30).map(_ / 2.0)
      } yield (lo, lo + w))
    } yield (ps, ivs)

  property("strategy-planned interval join equals brute force, " +
      "boundary points included") =
    Prop.forAllNoShrink(intervalCaseGen) { case (ps, ivs) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val p = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "p")
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val joined = p.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
      val planned = joined.queryExecution.executedPlan.toString
        .contains("BroadcastIntervalJoin")
      val got = joined.select("pid", "iid").as[(Long, Long)].collect().toSet
      val expected = (for {
        (v, i) <- ps.zipWithIndex
        ((lo, hi), j) <- ivs.zipWithIndex
        if v >= lo && v < hi
      } yield (i.toLong, j.toLong)).toSet
      planned && got == expected
    }

  // Random sparse graphs: up to 14 nodes, random edge subsets — sweeps
  // chains, cliques, forests, and isolated nodes in one generator.
  private val graphGen: Gen[(Int, List[(Long, Long)])] = for {
    n <- Gen.chooseNum(1, 14)
    m <- Gen.chooseNum(0, n * 2)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1)
      b <- Gen.chooseNum(0, n - 1)
      if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield (n, edges)

  property("connectedComponents equals a reference union-find") =
    Prop.forAllNoShrink(graphGen) { case (n, edges) =>
      import spark.implicits._
      val nodes = (0L until n.toLong).toDF("id")
      val edgeDf = edges.toDF("id1", "id2")
      val got = graft.dedup.Clusters.connectedComponents(
          edgeDf, "id1", "id2", nodes = Some(nodes))
        .as[(Long, Long)].collect().toMap
      // driver-side union-find as the oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { i =>
        // component label = min node id of the component
        val members = (0 until n).filter(j => find(j) == find(i))
        i.toLong -> members.min.toLong
      }.toMap
      got == expected
    }

  property("spanDupFractions equals brute-force cross-doc window counting") =
    Prop.forAllNoShrink(corpusGen) { case (texts, _) =>
      import spark.implicits._
      val w = 3
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.spanDupFractions(df, "doc_id", "text", w)
        .as[(Long, Int, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val spans = texts.map(_.toLowerCase.split("\\s+").toSeq)
        .map(ts => if (ts.length >= w) ts.sliding(w).map(_.mkString(" ")).toSeq
        else Seq.empty)
      val docsOf = spans.zipWithIndex
        .flatMap { case (ss, i) => ss.distinct.map(_ -> i) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      texts.indices.forall { i =>
        val n = spans(i).length
        val dup = spans(i).count(s => docsOf(s) >= 2)
        val expFrac =
          if (n == 0) 0.0
          else math.floor(dup.toDouble / n * 10000 + 0.5) / 10000
        got(i.toLong) == ((n, expFrac))
      }
    }

  property("winnowed span-dup is a sound sample of the full span census: " +
      "selected spans never exceed full spans, and a winnowed dup signal " +
      "implies a full dup signal") =
    Prop.forAllNoShrink(corpusGen) { case (texts, _) =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val full = Dedup.spanDupFractions(df, "doc_id", "text", 3)
        .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap
      val win = Dedup.winnowedSpanDup(df, "doc_id", "text", 3, 2)
        .as[(Long, Int, Double)].collect().map(r => r._1 -> r).toMap
      texts.indices.forall { i =>
        val f = full(i.toLong); val v = win(i.toLong)
        v._2 <= f._2 && (v._3 == 0.0 || f._3 > 0.0)
      }
    }

  property("repetitionSignals equals brute-force mode and trigram " +
      "distinct-fraction computation") =
    Prop.forAllNoShrink(corpusGen) { case (texts, _) =>
      import spark.implicits._
      import graft.text.TextAnalysis
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.repetitionSignals(df, "doc_id", "text")
        .as[(Long, Int, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      def q4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      texts.indices.forall { i =>
        val ts = texts(i).trim.toLowerCase.split("\\s+").toSeq
        val top = q4(ts.groupBy(identity).values.map(_.size).max.toDouble /
          ts.length)
        val tgs = if (ts.length >= 3)
          ts.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
        val dup = if (tgs.isEmpty) 0.0
          else q4(1.0 - tgs.distinct.length.toDouble / tgs.length)
        got(i.toLong) == ((ts.length, top, dup))
      }
    }

  // dense small-alphabet strings make distance-1 neighborhoods crowded —
  // the adversarial case for deletion-neighborhood blocking
  private val fuzzyGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(2, 14)
    strs <- Gen.listOfN(n,
      Gen.chooseNum(0, 4).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
  } yield strs

  private def fuzzyBruteMatches(strs: List[String], maxDist: Int): Boolean = {
    import spark.implicits._
    val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val brute = (for {
      (s1, i1) <- strs.zipWithIndex; (s2, i2) <- strs.zipWithIndex
      if i1 < i2; d = lev(s1, s2) if d <= maxDist
    } yield (i1.toLong, i2.toLong, d)).toSet
    val got = graft.operators.FuzzyJoin
      .selfJoin(rows.toDF("id", "s"), "id", "s", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got == brute
  }

  property("fuzzy join matches a brute-force levenshtein scan exactly") =
    Prop.forAllNoShrink(fuzzyGen)(fuzzyBruteMatches(_, 1))

  property("fuzzy join at d=2 matches a brute-force levenshtein scan " +
      "exactly (incl. transpositions and mixed ins/del/sub)") =
    Prop.forAllNoShrink(fuzzyGen)(fuzzyBruteMatches(_, 2))

  property("ngram decontamination: flagged docs are exactly those sharing " +
      "an n-gram with the held-out side, every train row present") =
    Prop.forAllNoShrink(textsGen, textsGen) { (train, held) =>
      import spark.implicits._
      val n = 2
      def grams(t: String): Set[String] = {
        val ts = t.toLowerCase.trim.split("\\s+").toSeq
        if (ts.length < n) Set.empty
        else ts.sliding(n).map(_.mkString(" ")).toSet
      }
      val heldGrams = held.flatMap(grams).toSet
      val trainDf = train.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val heldDf = held.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.dedup.Dedup
        .ngramContamination(trainDf, heldDf, "id", "text", n = n)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      val allRows = got.size == train.length
      val exact = train.zipWithIndex.forall { case (t, i) =>
        val overlap = grams(t).intersect(heldGrams).size.toLong
        got(i.toLong) == ((overlap, overlap > 0))
      }
      allRows && exact
    }

  property("exact dedup partitions the corpus: group sizes sum to total, " +
      "groups == distinct texts, keeper is the min id") =
    Prop.forAllNoShrink(textsGen) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val out = Dedup.exact(df, "doc_id", "text").collect()
      val sumOk = out.map(_.getAs[Long]("n_dups")).sum == texts.length
      val groupsOk = out.length == texts.distinct.length
      val keeperOk = out.forall { r =>
        val fpTexts = texts.zipWithIndex
          .filter { case (t, _) => t == texts(r.getAs[Long]("keeper").toInt) }
        fpTexts.map(_._2.toLong).min == r.getAs[Long]("keeper")
      }
      sumOk && groupsOk && keeperOk
    }

  // bodies designed to confuse a marker-scanning parser: raw binary,
  // embedded CRLF runs, and full fake WARC records INSIDE the payload —
  // Content-Length framing must never look at payload bytes
  private val warcBodyGen: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte)).map(_.toArray),
    for {
      pre <- Gen.listOf(Gen.chooseNum(32, 126).map(_.toByte))
      post <- Gen.listOf(Gen.chooseNum(0, 255).map(_.toByte))
    } yield pre.toArray ++
      "\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
        .getBytes("UTF-8") ++ post.toArray)

  property("WARC framing is immune to payload content: arbitrary bodies " +
      "(embedded CRLFs, fake nested records) round-trip byte-exact, " +
      "plain and gzipped") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 5).flatMap(n =>
        Gen.listOfN(n, warcBodyGen))) { bodies =>
      import graft.sources.Warc
      val recs = bodies.zipWithIndex.map { case (b, i) =>
        Warc.httpResponseRecord(s"http://x.test/$i",
          "2026-01-01T00:00:00Z", s"<urn:uuid:$i>", b)
      }
      val plain = Warc.parse("f.warc", recs.reduce(_ ++ _))
      val gzBytes = {
        val out = new java.io.ByteArrayOutputStream()
        recs.foreach { r =>
          val g = new java.util.zip.GZIPOutputStream(out)
          g.write(r); g.finish()
        }
        out.toByteArray
      }
      val gz = Warc.parse("f.warc.gz", gzBytes)
      Seq(plain, gz).forall { rows =>
        rows.length == bodies.length &&
          rows.forall(_.getString(2) == "response") &&
          rows.zip(bodies).forall { case (r, b) =>
            r.getAs[Array[Byte]](10).sameElements(b)
          }
      }
    }

  private val robotsSegGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('/'),
      Gen.const('.'))).map(_.mkString)

  property("robots matching laws: wildcard-free patterns are prefix " +
      "tests, a lone trailing $ makes them equality tests, and a " +
      "pattern always matches itself") =
    Prop.forAllNoShrink(robotsSegGen, robotsSegGen) { (path0, pat0) =>
      import graft.text.Robots
      val path = "/" + path0
      val pat = "/" + pat0
      val prefixLaw = Robots.matches(path, pat) == path.startsWith(pat)
      val anchorLaw = Robots.matches(path, pat + "$") == (path == pat)
      val selfLaw = Robots.matches(pat, pat) && Robots.matches(pat, pat + "$")
      prefixLaw && anchorLaw && selfLaw
    }

  private val fimDocsGen: Gen[List[Int]] =
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 40)))

  property("fimTransform: the span slices exactly the middle, and the " +
      "three pieces reconstruct the normalized token stream") =
    Prop.forAllNoShrink(fimDocsGen) { lens =>
      import spark.implicits._
      val docs = lens.zipWithIndex
        .map { case (len, i) =>
          (i.toLong, (0 until len).map(j => s"t${i}_$j").mkString("  ")) }
        .toDF("doc_id", "text")
      val out = graft.text.TextAnalysis
        .fimTransform(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getInt(3), r.getInt(4)))
      out.forall { case (id, n, fim, s, e) =>
        val toks = (0 until lens(id.toInt)).map(j => s"t${id}_$j")
        val (p, m) = (n / 3, n * 2 / 3)
        val mid = toks.slice(p, m).mkString(" ")
        val rebuilt = (toks.take(p) ++ toks.drop(m) ++ toks.slice(p, m))
        n == lens(id.toInt) &&
          fim.substring(s, e) == mid &&
          fim == s"<PRE>${toks.take(p).mkString(" ")}" +
            s"<SUF>${toks.drop(m).mkString(" ")}<MID>$mid" &&
          rebuilt.length == n
      }
    }

  private val prefPoolGen: Gen[List[(Long, Long, String, Double)]] = for {
    nPrompts <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(nPrompts, for {
      k <- Gen.chooseNum(1, 5)
      texts <- Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd"))
      scores <- Gen.listOfN(k, Gen.chooseNum(0, 4).map(_.toDouble))
    } yield texts.zip(scores))
  } yield rows.zipWithIndex.flatMap { case (pool, p) =>
    pool.zipWithIndex.map { case ((t, sc), r) =>
      (p.toLong, r.toLong, t, sc)
    }
  }

  property("preferencePairs equals the brute-force driver derivation " +
      "on random pools (extremes, tie-breaks, every filter)") =
    Prop.forAllNoShrink(prefPoolGen) { rows =>
      import spark.implicits._
      val margin = 1.0
      val out = graft.text.Pref.preferencePairs(
          rows.toDF("prompt", "rid", "txt", "sc"),
          "prompt", "rid", "txt", "sc", minMargin = margin)
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val want = rows.groupBy(_._1).flatMap { case (p, pool) =>
        val ch = pool.maxBy(r => (r._4, r._2))
        val rj = pool.minBy(r => (r._4, r._2))
        val m = ch._4 - rj._4
        if (pool.size >= 2 && m >= margin && ch._3 != rj._3)
          Some(p -> ((p, ch._2, rj._2, pool.size.toLong,
            BigDecimal(m).setScale(4,
              BigDecimal.RoundingMode.HALF_UP).toDouble)))
        else None
      }
      out == want
    }

  private val splitGraphGen: Gen[(Int, List[(Long, Long)])] = for {
    nodes <- Gen.chooseNum(2, 24)
    m <- Gen.chooseNum(0, 30)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, nodes - 1)
      b <- Gen.chooseNum(0, nodes - 1)
      if a != b
    } yield (a.toLong, b.toLong))
  } yield (nodes, edges)

  property("leakageSafeSplit: no component ever straddles a split — the " +
      "brute-force closure of any random graph agrees") =
    Prop.forAllNoShrink(splitGraphGen) { case (n, edges) =>
      import spark.implicits._
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("id1", "id2")
      val out = graft.dedup.Clusters
        .leakageSafeSplit(docs, "doc_id", pairs)
        .as[(Long, Long, String)].collect()
      // brute-force components on the driver
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val splitsByComp = out.groupBy(r => find(r._1.toInt))
        .view.mapValues(_.map(_._3).toSet)
      out.length == n && splitsByComp.values.forall(_.size == 1)
    }

  private val weightsGen: Gen[Map[String, Double]] = for {
    k <- Gen.chooseNum(1, 4)
    ws <- Gen.listOfN(k, Gen.chooseNum(1, 20))
  } yield {
    val total = ws.sum.toDouble
    ws.zipWithIndex.map { case (w, i) => s"d$i" -> w / total }.toMap
  }

  property("interleavePlan: the low-discrepancy prefix guarantee holds " +
      "for arbitrary weights — |emitted_d(N) - floor(w_d * N)| <= 1 at " +
      "every slot prefix") =
    Prop.forAllNoShrink(weightsGen, Gen.chooseNum(5, 30)) { (w, perDom) =>
      import spark.implicits._
      val docs = w.keys.toSeq.sorted.zipWithIndex.flatMap { case (d, di) =>
        (1 to perDom).map(i => (d, (di * 1000 + i).toLong))
      }.toDF("dom", "id")
      val plan = graft.operators.Mixture.interleavePlan(docs, "dom", "id", w)
        .as[(String, Long, Long, Long)].collect()
      val maxSlot = plan.map(_._4).max
      (1L to math.min(maxSlot, 200L)).forall { nSlots =>
        val emitted = plan.filter(_._4 <= nSlots).groupBy(_._1)
          .view.mapValues(_.length).toMap
        w.forall { case (d, wd) =>
          val got = emitted.getOrElse(d, 0)
          // the domain may have run out of items — then it trails floor
          val want = math.min(math.floor(wd * nSlots), perDom.toDouble)
          math.abs(got - want) <= 1
        }
      }
    }

  property("deterministicShard is a bijection partitioned into dense " +
      "per-shard rankings, invariant to input layout") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 300), Gen.chooseNum(1, 7)) {
      (n, parts) =>
        import spark.implicits._
        val ids = (1L to n.toLong).toDF("id").repartition(parts)
        val out = graft.operators.Shuffle.deterministicShard(ids, "id", "ps")
          .as[(Long, String, Long)].collect()
        val idsOk = out.map(_._1).sorted.toSeq == (1L to n.toLong)
        val dense = out.groupBy(_._2).values.forall(rows =>
          rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
        idsOk && dense
    }

  property("majorityVote: the vote always carries a maximal count, and " +
      "agreement = n_agree / n exactly") =
    Prop.forAllNoShrink(Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 5L), Gen.oneOf("a", "b", "c")))) { labels =>
      labels.isEmpty || {
        import spark.implicits._
        val out = graft.operators.Annotations.majorityVote(
            labels.toDF("item", "lab"), "item", "lab")
          .as[(Long, String, Long, Long, Double, Boolean)].collect()
        val byItem = labels.groupBy(_._1)
        out.forall { case (item, vote, nAnn, nAgree, agr, unan) =>
          val hist = byItem(item).groupBy(_._2).view.mapValues(_.size).toMap
          val maxC = hist.values.max
          hist(vote) == maxC && nAnn == byItem(item).size &&
            nAgree == maxC && unan == (maxC == byItem(item).size) &&
            // agr is round(maxC/n, 4): within half an ulp of the ratio
            math.abs(agr - maxC.toDouble / byItem(item).size) <=
              0.00005 + 1e-12
        }
      }
    }

  property("fleissKappa equals the textbook scalar recomputation and " +
      "respects its bounds") =
    Prop.forAllNoShrink(Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 4L), Gen.oneOf("a", "b", "c")))) { labels =>
      val kept = labels.groupBy(_._1).filter(_._2.size >= 2)
      kept.isEmpty || {
        import spark.implicits._
        val out = graft.operators.Annotations.fleissKappa(
            labels.toDF("item", "lab"), "item", "lab")
          .as[(Long, Long, Long, Double, Double, Double)].collect().head
        // scalar re-derivation over ONLY the kept items
        val pis = kept.values.map { rs =>
          val n = rs.size.toDouble
          val s2 = rs.groupBy(_._2).values.map(g => g.size * g.size).sum
          (s2 - n) / (n * (n - 1))
        }
        val pBar = pis.sum / pis.size
        val marg = kept.values.flatten.groupBy(_._2).view
          .mapValues(_.size.toDouble).toMap
        val tot = marg.values.sum
        val pE = marg.values.map(c => (c / tot) * (c / tot)).sum
        val (nItems, nRatings, nCats, oPb, oPe, oK) = out
        val countsOk = nItems == kept.size &&
          nRatings == kept.values.map(_.size).sum && nCats == marg.size
        val pbOk = math.abs(oPb - pBar) <= 5e-7 + 1e-12
        val peOk = math.abs(oPe - pE) <= 5e-7 + 1e-12
        // kappa only defined when chance agreement < 1
        val kOk = pE >= 1.0 - 1e-12 ||
          math.abs(oK - (pBar - pE) / (1 - pE)) <= 5e-7 + 1e-9
        val boundOk = oK.isNaN || oK <= 1.0 + 1e-9
        countsOk && pbOk && peOk && kOk && boundOk
      }
    }

  property("templateGroups partitions the corpus by the digit/ws/case " +
      "mask: sizes sum to total, keepers are group minima") =
    Prop.forAllNoShrink(Gen.listOf(Gen.zip(Gen.chooseNum(0L, 50L),
      Gen.oneOf("a 1 b", "A  2 B", "x9y", "x 12 y", "zz")))) { docs =>
      docs.isEmpty || {
        import spark.implicits._
        val ids = docs.zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }
        val out = graft.dedup.Dedup.templateGroups(
            ids.toDF("id", "t"), "id", "t")
          .as[(String, Long, Long)].collect()
        def mask(t: String) = t.toLowerCase.trim
          .replaceAll("[0-9]+", "#").replaceAll("\\s+", " ")
        val byMask = ids.groupBy { case (_, t) => mask(t) }
        out.map(_._3).sum == ids.size &&
          out.length == byMask.size &&
          out.forall { case (_, keeper, n) =>
            byMask.values.exists(g =>
              g.map(_._1).min == keeper && g.size == n)
          }
      }
    }

  property("keySkew equals a scalar recomputation of every ratio") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(Gen.chooseNum(0L, 15L))) { ks =>
      import spark.implicits._
      val (nRows, nKeys, mx, mean, skew, t1, t10) =
        graft.operators.Profile.keySkew(ks.toDF("k"), "k")
          .as[(Long, Long, Long, Double, Double, Double, Double)]
          .collect().head
      def r(d: Double, s: Int) = BigDecimal(d)
        .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
      val hist = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val top = hist.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
      nRows == ks.size && nKeys == hist.size &&
        mx == hist.values.max &&
        mean == r(ks.size.toDouble / hist.size, 4) &&
        skew == r(hist.values.max.toDouble * hist.size / ks.size, 4) &&
        t1 == r(top.head._2.toDouble / ks.size, 6) &&
        t10 == r(top.map(_._2).sum.toDouble / ks.size, 6)
    }

  property("binaryHammingTopK equals a scalar brute-force recomputation " +
      "(packing, candidate cut, rerank, every tie-break)") =
    Prop.forAllNoShrink(Gen.chooseNum(2, 30), Gen.chooseNum(3, 70),
      Gen.chooseNum(0L, 999L)) { (n, dim, seed) =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val vecs = (0L until n.toLong).map(i =>
        (i, Seq.tabulate(dim)(j =>
          // element 0 is forced nonzero: an all-zero vector has an
          // undefined cosine and both sides would just disagree on NaN
          if (j == 0) (rnd.nextInt(4) + 1) *
            (if (rnd.nextBoolean()) 0.25f else -0.25f)
          else (rnd.nextInt(9) - 4) * 0.25f)))
      val k = 1 + rnd.nextInt(3)
      val rerank = k + rnd.nextInt(4)
      val out = graft.ann.Quantize.binaryHammingTopK(
          vecs.toDF("id", "v"), "id", "v",
          vecs.take(2).toDF("id", "v"), "id", "v", k, rerank)
        .as[(Long, Int, Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r =>
          (r._3, r._4, r._5)).toSeq).toMap
      def round4(d: Double) = BigDecimal(d)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expected = vecs.take(2).map { case (qid, qv) =>
        val cands = vecs.filter(_._1 != qid).map { case (cid, cv) =>
          val ham = qv.zip(cv).count { case (a, b) => (a > 0) != (b > 0) }
          (cid, ham.toLong, cv)
        }.sortBy(c => (c._2, c._1)).take(rerank)
        val reranked = cands.map { case (cid, ham, cv) =>
          val dot = qv.zip(cv).foldLeft(0.0)((a, p) =>
            a + p._1.toDouble * p._2.toDouble)
          def norm(v: Seq[Float]) = math.sqrt(
            v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
          (cid, ham, round4(dot / (norm(qv) * norm(cv))))
        }.sortBy(c => (-c._3, c._1)).take(k)
        qid -> reranked
      }.toMap
      out == expected
    }

  property("rootPaths: every path walks parent pointers from a root to " +
      "its node with the exact depth") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 60), Gen.chooseNum(0L, 1000L)) {
      (n, seed) =>
        import spark.implicits._
        val rnd = new scala.util.Random(seed)
        // random forest: node i attaches to a uniform earlier node, or
        // roots itself with probability ~1/4
        val parents = (0L until n.toLong).map(i =>
          if (i == 0 || rnd.nextInt(4) == 0) (i, None: Option[Long])
          else (i, Some(rnd.nextInt(i.toInt).toLong)))
        val pmap = parents.toMap
        val out = graft.graph.TreePaths.rootPaths(
            parents.toDF("id", "parent"), "id", "parent")
          .as[(Long, Long, Long, String)].collect()
        val allNodes = out.map(_._1).sorted.toSeq == (0L until n.toLong)
        val pathsOk = out.forall { case (node, root, depth, path) =>
          val ids = path.split("/").map(_.toLong).toSeq
          ids.last == node && ids.head == root &&
            pmap(root).isEmpty && depth == ids.length - 1 &&
            ids.sliding(2).forall {
              case Seq(p, c) => pmap(c).contains(p)
              case _ => true
            }
        }
        allNodes && pathsOk
    }

  property("weightedSample is actually WEIGHTED: across many seeds a " +
      "10x-weight row is drawn far more often than a 1x row, and every " +
      "draw is a valid exact-k sample") = {
    import org.apache.spark.sql.functions.col
    // 20 rows; row 1 carries weight 1000, rows 2..20 weight 100. ES
    // inclusion probability for k=5 strongly favors row 1; with 40
    // seeds the heavy row should appear in nearly all draws and far
    // more often than any light row (a deterministic check: the seeds
    // are fixed strings, so this is replayable, not flaky).
    val rows = (1L to 20L).map(i => (i, if (i == 1L) 1000L else 100L))
    val df = {
      val s = spark
      import s.implicits._
      rows.toDF("id", "w")
    }
    val draws = (1 to 40).map { s =>
      graft.operators.Mixture.weightedSample(df, "id", "w", k = 5,
          seed = s"seed$s")
        .select(col("id")).collect().map(_.getLong(0)).toSet
    }
    val okShape = draws.forall(d => d.size == 5 &&
      d.subsetOf(rows.map(_._1).toSet))
    val heavyHits = draws.count(_.contains(1L))
    val lightHits = (2L to 20L).map(i => draws.count(_.contains(i)))
    // E[heavy] ≈ 40·0.95+, E[light] ≈ 40·0.21 — a wide margin
    Prop(okShape) :| "every draw is a 5-subset" &&
      Prop(heavyHits >= 30) :| s"heavy row drawn $heavyHits/40" &&
      Prop(lightHits.max <= heavyHits - 5) :|
        s"max light ${lightHits.max} vs heavy $heavyHits"
  }

  private val outlierCorpusGen: Gen[(List[(Long, Seq[Float], Int)], Int, Int)] =
    for {
      n <- Gen.chooseNum(3, 14)
      nClusters <- Gen.chooseNum(1, 4)
      dim = 6
      vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-3, 3)))
      labels <- Gen.listOfN(n, Gen.chooseNum(0, nClusters - 1))
      k <- Gen.chooseNum(1, 4)
      nprobe <- Gen.chooseNum(1, nClusters)
    } yield (
      vecs.zip(labels).zipWithIndex.collect {
        // keep the zero vector out: cosine against it is undefined
        case ((v, l), i) if v.exists(_ != 0) =>
          (i.toLong, v.map(_.toFloat): Seq[Float], l)
      },
      k, nprobe)

  property("knnOutliersIvf conservative-gate containment: at ANY nprobe " +
      "every brute outlier stays flagged, and every corpus row appears") =
    Prop.forAllNoShrink(outlierCorpusGen) { case (rows, k, nprobe) =>
      if (rows.size < 2) Prop.passed else {
        val df = {
          val s = spark
          import s.implicits._
          rows.toDF("vec_id", "embedding", "label")
        }
        import graft.ann.Ann
        def gate(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
        val brute = gate(Ann.knnOutliers(df, "vec_id", "embedding",
          k, minSim = 0.3))
        val pruned = gate(Ann.knnOutliersIvf(df, "vec_id", "embedding",
          "label", k, minSim = 0.3, nprobe = nprobe))
        val allRows = pruned.keySet == rows.map(_._1).toSet
        val contained = brute.forall { case (id, flag) =>
          !flag || pruned(id)
        }
        Prop(allRows) :| s"missing rows: ${rows.map(_._1).toSet -- pruned.keySet}" &&
          Prop(contained) :| s"brute=$brute pruned=$pruned k=$k nprobe=$nprobe"
      }
    }

  private val semSplitGen: Gen[(List[(Long, Seq[Float], Int)], Int, Double)] =
    for {
      n <- Gen.chooseNum(2, 10)
      dim = 4
      vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-3, 3)))
        .suchThat(_.forall(_.exists(_ != 0))) // zero vectors have no cosine
      labels <- Gen.listOfN(n, Gen.chooseNum(0, 2))
      splits <- Gen.chooseNum(1, 3)
      thr <- Gen.oneOf(0.5, 0.75, 0.9)
    } yield (vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat): Seq[Float], labels(i)) }, splits, thr)

  property("semanticDedupStep decomposition: draining ordered id-range " +
      "batches through the step (state = ALL prior rows) equals the " +
      "one-shot semanticDedup on the full corpus, for any split") =
    Prop.forAllNoShrink(semSplitGen) { case (rows, splits, thr) =>
      val s = spark
      import s.implicits._
      import graft.ann.Ann
      import org.apache.spark.sql.functions.col
      val df = rows.toDF("vec_id", "embedding", "label")
      val cents = Ann.pivotCentroids(df, "label", "vec_id", "embedding")
      def verdicts(d: org.apache.spark.sql.DataFrame) = d
        .select(col("vec_id"), col("keep"))
        .as[(Long, Boolean)].collect().toMap
      val oneShot = verdicts(Ann.semanticDedup(df, "vec_id", "embedding",
        "label", threshold = thr, cents = Some(cents)))
      // ordered id-range batches; seen = union of ALL prior batches
      val n = rows.size
      val bounds = (1 to splits).map(i => n.toLong * i / splits)
      var lo = 0L
      var seen: Option[org.apache.spark.sql.DataFrame] = None
      var drained = Map.empty[Long, Boolean]
      bounds.foreach { hi =>
        val batch = df.where(col("vec_id") >= lo && col("vec_id") < hi)
        if (lo < hi && !batch.isEmpty) {
          val (out, state) = Ann.semanticDedupStep(batch, seen,
            "vec_id", "embedding", "label", thr, cents)
          drained ++= verdicts(out)
          seen = Some(seen.map(_.unionByName(state)).getOrElse(state))
        }
        lo = hi
      }
      Prop(drained == oneShot) :|
        s"splits=$splits thr=$thr drained=$drained oneShot=$oneShot"
    }

  private val maxSimGen: Gen[(List[(Long, List[List[Float]])], Int)] = {
    // exact-binary components keep float→double casts bit-stable; the
    // zero vector exercises the zero-norm → 0 contribution rule
    val comp = Gen.oneOf(-1.0f, 0.0f, 0.25f, 0.5f, 1.0f, 2.0f)
    val tok = Gen.listOfN(4, comp)
    for {
      n <- Gen.chooseNum(2, 6)
      mats <- Gen.listOfN(n,
        Gen.chooseNum(1, 3).flatMap(t => Gen.listOfN(t, tok)))
      k <- Gen.chooseNum(1, 4)
    } yield (mats.zipWithIndex.map { case (m, i) => (i.toLong, m) }, k)
  }

  property("maxSimTopK equals an independent scalar MaxSim reference " +
      "(round-4 HALF_UP per-pair cosine, zero-norm → 0, per-query-token " +
      "max summed, (score desc, id) ranking) on random token matrices") =
    Prop.forAllNoShrink(maxSimGen) { case (docs, k) =>
      val s = spark
      import s.implicits._
      import graft.ann.Ann
      import org.apache.spark.sql.functions.col
      val df = docs.toDF("doc_id", "token_vecs")
      val got = Ann.maxSimTopK(df, "doc_id", "token_vecs",
          df.where(col("doc_id") < 2), "doc_id", "token_vecs", k)
        .select(col("q_id"), col("rank"), col("neighbor_id"), col("score"))
        .as[(Long, Int, Long, Double)].collect().toSet
      // scalar reference — same fold orders as the engine (left-to-
      // right dot, token-array order), so rounding replays exactly
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      def dot(a: List[Double], b: List[Double]) =
        a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
      def cos(a: List[Float], b: List[Float]): Double = {
        val ad = a.map(_.toDouble)
        val bd = b.map(_.toDouble)
        val nn = math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd))
        if (nn > 0) r4(dot(ad, bd) / nn) else 0.0
      }
      val expect = docs.filter(_._1 < 2).flatMap { case (qid, qt) =>
        docs.filter(_._1 != qid).map { case (did, dt) =>
          (did, r4(qt.foldLeft(0.0)((acc, q) =>
            acc + dt.foldLeft(-1.0)((m, d) => math.max(m, cos(q, d))))))
        }.sortBy { case (did, sc) => (-sc, did) }
          .take(k).zipWithIndex
          .map { case ((did, sc), i) => (qid, i + 1, did, sc) }
      }.toSet
      Prop(got == expect) :| s"got=$got expect=$expect"
    }

  private val semOooGen: Gen[(List[(Long, Seq[Float], Int)], Int, Double, Long)] =
    for {
      (rows, splits, thr) <- semSplitGen
      seed <- Gen.chooseNum(0L, 100000L)
    } yield (rows, splits, thr, seed)

  property("semanticDedupStep under OUT-OF-ORDER batches: verdicts " +
      "equal first-seen-wins (witness = similar same-cluster lower id " +
      "that arrived in the same batch or earlier), for any permutation " +
      "of the id-range batches") =
    Prop.forAllNoShrink(semOooGen) { case (rows, splits, thr, seed) =>
      val s = spark
      import s.implicits._
      import graft.ann.Ann
      import org.apache.spark.sql.functions.col
      val df = rows.toDF("vec_id", "embedding", "label")
      val cents = Ann.pivotCentroids(df, "label", "vec_id", "embedding")
      // id-range batches, then a seeded permutation = arrival order
      val n = rows.size
      val bounds = (0 to splits).map(i => n.toLong * i / splits)
      val ranges = bounds.zip(bounds.tail).filter(p => p._1 < p._2)
      val arrival = new scala.util.Random(seed).shuffle(ranges.toList)
      // drain through the real step in arrival order
      var seen: Option[org.apache.spark.sql.DataFrame] = None
      var drained = Map.empty[Long, Boolean]
      arrival.foreach { case (lo, hi) =>
        val batch = df.where(col("vec_id") >= lo && col("vec_id") < hi)
        val (out, state) = Ann.semanticDedupStep(batch, seen,
          "vec_id", "embedding", "label", thr, cents)
        drained ++= out.select(col("vec_id"), col("keep"))
          .as[(Long, Boolean)].collect().toMap
        seen = Some(seen.map(_.unionByName(state)).getOrElse(state))
      }
      // independent reference: round-4 HALF_UP cosine, pivot-centroid
      // argmax with lowest-label tiebreak, first-seen-wins witness rule
      def cos4(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.iterator.zip(b.iterator)
          .map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.iterator.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(b.iterator.map(x => x.toDouble * x).sum)
        BigDecimal(dot / (na * nb))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val byId = rows.map(r => r._1 -> r._2).toMap
      val pivots = rows.groupBy(_._3).map { case (l, rs) =>
        l -> byId(rs.map(_._1).min)
      }
      def clOf(id: Long): Int = pivots.toSeq
        .map { case (l, cv) => (l, cos4(byId(id), cv)) }
        .maxBy { case (l, c) => (c, -l) }._1
      val arrOf = arrival.zipWithIndex.flatMap { case ((lo, hi), i) =>
        rows.map(_._1).filter(id => id >= lo && id < hi).map(_ -> i)
      }.toMap
      val expected = rows.map(_._1).map { r =>
        val dropped = rows.map(_._1).exists { w =>
          w < r && clOf(w) == clOf(r) && arrOf(w) <= arrOf(r) &&
            cos4(byId(w), byId(r)) >= thr
        }
        r -> !dropped
      }.toMap
      Prop(drained == expected) :|
        s"arrival=$arrival thr=$thr drained=$drained expected=$expected"
    }
}
