package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): (String, Long) = {
    val out = Pii.redact(Seq((1L, s)).toDF("id", "s"), "s")
      .select(col("s_redacted"), col("n_pii")).head()
    (out.getString(0), out.getLong(1))
  }

  test("masks emails, IPv4s, and phone variants, counting each once") {
    val (r, n) = redactOne(
      "mail bob.smith+x@corp.example.org, host 192.168.0.12, " +
        "call 555-123-4567 or (555) 987-6543 or +1 555-222-3333")
    assert(r == "mail [EMAIL], host [IP], call [PHONE] or [PHONE] or [PHONE]")
    assert(n == 5L)
  }

  test("masking order: an email's dotted domain is consumed as EMAIL, " +
      "never half-eaten as an IP; clean text passes through untouched") {
    val (r, n) = redactOne("a@b12.cd and plain text")
    assert(r == "[EMAIL] and plain text")
    assert(n == 1L)
    val (r2, n2) = redactOne("nothing sensitive here 12.5 degrees")
    assert(r2 == "nothing sensitive here 12.5 degrees")
    assert(n2 == 0L)
  }

  test("null text stays null with a null count; counts ride the " +
      "progressively masked text so stages never double-count") {
    val out = Pii.redact(
      Seq((1L, Option("x 10.0.0.1 y")), (2L, Option.empty[String]))
        .toDF("id", "s"), "s")
      .orderBy("id")
      .select(col("s_redacted"), col("n_pii")).collect()
    assert(out(0).getString(0) == "x [IP] y" && out(0).getLong(1) == 1L)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }
}
