package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Edit-distance fuzzy self-join via deletion-neighborhood blocking
  * (the SymSpell decomposition): every string emits itself plus every
  * variant reachable by deleting up to `maxDist` characters; two strings
  * within Levenshtein distance `maxDist` are GUARANTEED to share at
  * least one variant key, so candidate generation is an equi-join —
  * never a cartesian, never a similarity scan.
  *
  * Scale shape, 100 TB posture:
  *   - Each row fans out to O(L^d) keys (L+1 at d=1, ~L²/2 at d=2):
  *     polynomial in string LENGTH, independent of corpus size. The
  *     operator targets short join keys (names, titles, canonical URLs,
  *     IDs — the entity-resolution use case); for long text use the
  *     n-gram/MinHash family in [[graft.dedup.Dedup]] instead.
  *   - Candidates co-locate by shuffling on the variant key; bucket
  *     width is bounded by how many corpus strings collapse onto one
  *     deletion variant (alphabet-sized in practice, and any
  *     pathological key is a data-quality signal, not a plan hazard —
  *     the same `saltedBandLegs`-style chunking used for LSH buckets
  *     applies if one ever appears).
  *   - The exact `levenshtein` verify runs ONLY on deduplicated
  *     candidate pairs, with the built-in codegen'd expression.
  *
  * Deleted-POSITION annotation prunes false candidates before the
  * verify. Every true pair has a witness variant in one of these
  * classes (completeness argument, by enumeration of ≤`maxDist` edit
  * scripts; `Pa`/`Pb` are the deleted-position sets, in each string's
  * own coordinates):
  *   - equal strings: identity–identity;
  *   - one substitution: same single position both sides;
  *   - insert/delete: identity on the shorter side;
  *   - two substitutions: the SAME two positions on both sides;
  *   - insert+delete (equal lengths, e.g. transposition-shaped):
  *     single deletion each side, positions unconstrained;
  *   - substitution+insert (lengths differ by 1): single deletion {p}
  *     on the shorter side, double on the longer whose positions meet
  *     {p, p+1} (the substituted char shifts by at most the insert);
  *   - two inserts: identity on the shorter side.
  * Any candidate outside these classes (e.g. double–double with
  * different position pairs) therefore has its true pairs ALSO covered
  * by a conforming witness, and pruning it costs nothing — while the
  * dominant false-candidate class on dense string spaces (sequential
  * IDs, zero-padded numbers) dies before the join output. At d=1 the
  * same argument tightens single–single to same-position (measured
  * 11.1 → 3.0 s on 15k sequential customer names).
  */
object FuzzyJoin {

  private def del1(s: Column, i: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s) - i))

  private def del2(s: Column, i: Column, j: Column): Column =
    concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
      s.substr(j + 1, length(s) - j))

  /** All distance-`maxDist` pairs (id1 < id2) of `df`'s `str` column:
    * (id1, id2, dist). `maxDist` must be 1 or 2; `id` must be an
    * integral column (a non-numeric key would silently cast to null —
    * derive a surrogate with xxhash64/monotonically_increasing_id
    * first).
    */
  def selfJoin(
      df: DataFrame, id: String, str: String, maxDist: Int): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"deletion-neighborhood blocking is wired for maxDist in {1, 2}, got $maxDist")
    val idType = df.schema(id).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"id column '$id' must be integral, got ${idType.simpleString}; " +
        "derive a surrogate key (xxhash64, monotonically_increasing_id) " +
        "for string/UUID ids")
    // Fan out inside whole-stage codegen via pure HOF expressions: the
    // string itself (n=0), each single deletion tagged with its 1-based
    // position (n=1), and at d=2 each ordered position pair (n=2).
    // sequence(1, 0) would count DOWN, so short strings guard each tier.
    val s = col("s")
    val ident = array(struct(s.as("k"),
      lit(0).as("n"), lit(-1).as("p1"), lit(-1).as("p2")))
    val singles = transform(sequence(lit(1), length(s)),
      i => struct(del1(s, i).as("k"), lit(1).as("n"), i.as("p1"),
        lit(-1).as("p2")))
    val doubles = flatten(transform(sequence(lit(1), length(s) - 1),
      i => transform(sequence(i + 1, length(s)),
        j => struct(del2(s, i, j).as("k"), lit(2).as("n"), i.as("p1"),
          j.as("p2")))))
    val variants =
      if (maxDist == 1)
        when(length(s) > 0, concat(ident, singles)).otherwise(ident)
      else
        when(length(s) > 1, concat(ident, singles, doubles))
          .when(length(s) > 0, concat(ident, singles))
          .otherwise(ident)
    // The candidate join's work is PAIRS per key bucket — quadratic in
    // bucket width — so its cost per shuffled byte is far above what
    // byte-sized AQE coalescing models: left to the advisory target, a
    // few-MB variant table coalesces to one task that then enumerates
    // every candidate pair serially. Pin the join's parallelism with an
    // explicit partition count (AQE never coalesces a user-numbered
    // repartition): `spark.sql.shuffle.partitions` is the operator's
    // scale knob, and keying by the variant k means the join itself
    // needs no further exchange.
    // public API: some runtimes set the conf to a non-numeric value
    // (e.g. "auto"); fall back to defaultParallelism rather than
    // throwing NumberFormatException out of a join operator
    val joinParts = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val keyed = df.select(col(id).cast("long").as("id"), col(str).as("s"))
      .select(col("id"), explode(variants).as("v"))
      .select(col("id"), col("v.k").as("k"), col("v.n").as("n"),
        col("v.p1").as("p1"), col("v.p2").as("p2"))
      .repartition(joinParts, col("k"))
    val (na, nb) = (col("a.n"), col("b.n"))
    def hits(double: String, p: Column): Column =
      col(s"$double.p1") === p || col(s"$double.p1") === p + 1 ||
        col(s"$double.p2") === p || col(s"$double.p2") === p + 1
    val witness =
      if (maxDist == 1)
        na === 0 || nb === 0 || col("a.p1") === col("b.p1")
      else
        na === 0 || nb === 0 ||
          (na === 1 && nb === 1) ||
          (na === 2 && nb === 2 &&
            col("a.p1") === col("b.p1") && col("a.p2") === col("b.p2")) ||
          (na === 1 && nb === 2 && hits("b", col("a.p1"))) ||
          (na === 2 && nb === 1 && hits("a", col("b.p1")))
    // candidate ids FIRST (two longs — the narrowest possible distinct),
    // strings re-attach once per surviving pair
    val candidates = keyed.as("a").join(keyed.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id") && witness)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val base = df.select(col(id).cast("long").as("id"), col(str).as("s"))
    candidates
      .join(base.select(col("id").as("id1"), col("s").as("s1")), "id1")
      .join(base.select(col("id").as("id2"), col("s").as("s2")), "id2")
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .where(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist"))
  }
}
