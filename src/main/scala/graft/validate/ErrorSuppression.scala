package graft.validate

/** V4 — expected-error suppression (s3_to_json_s3.py:418-490, tested by
  * the matrix at tests/test_s3_to_json_s3.py:614-700): first-year Android
  * data from the mobile-toolbox app has known, non-severe schema
  * deviations; those exact errors are dropped per file type, and files
  * whose error lists become empty are dropped entirely.
  */
object ErrorSuppression {

  val MetadataAllowed: Seq[String] = Seq(
    "'appName' is a required property",
    "'files' is a required property")

  val TaskDataAllowed: Seq[String] = Seq(
    "Additional properties are not allowed ('type' was unexpected)")

  val WeatherAllowed: Seq[String] = Seq(
    "'type' is a required property")

  val MotionAllowed: Seq[String] = Seq(
    "'acceleration' is not one of ['accelerometer', 'gyro', " +
      "'magnetometer', 'attitude', 'gravity', 'magneticField', " +
      "'rotationRate', 'userAcceleration']",
    "'stepPath' is a required property",
    "None is not of type 'integer'")

  val allowlists: Map[String, Seq[String]] = Map(
    "metadata.json" -> MetadataAllowed,
    "taskData.json" -> TaskDataAllowed,
    "weather.json" -> WeatherAllowed,
    "motion.json" -> MotionAllowed)

  /** Drop allowlisted errors (preserving duplicates of unexpected ones,
    * like the reference's list comprehension), then drop files left with
    * no errors. Applies only to Android clients of the mobile-toolbox app.
    */
  def suppress(
      errors: Map[String, Seq[String]],
      appId: String,
      clientInfo: String): Map[String, Seq[String]] = {
    if (errors.isEmpty) return errors
    if (appId != "mobile-toolbox") return errors
    if (!clientInfo.contains("Android")) return errors
    errors
      .map { case (file, errs) =>
        val allowed = allowlists.getOrElse(file, Nil).toSet
        file -> errs.filterNot(allowed)
      }
      .filter { case (_, errs) => errs.nonEmpty }
  }

  /** SO3 — the 10-errors-per-file reporting cap (s3_to_json_s3.py:814-818). */
  def cap(errors: Map[String, Seq[String]], limit: Int = 10): Map[String, Seq[String]] =
    errors.map { case (f, es) => f -> es.take(limit) }
}
