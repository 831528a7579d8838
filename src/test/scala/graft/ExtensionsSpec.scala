package graft

/** The native kernels must be reachable from SQL text, not only the
  * Column API — GraftExtensions injects them into the function
  * registry at session build.
  */
class ExtensionsSpec extends SparkSuite {

  test("vector kernels callable from spark.sql") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_l2(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS l,
        |       vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 &&
      r.getDouble(2) == 1.0)
  }

  test("vec_cosine NULL contract holds through SQL") {
    val r = spark.sql(
      """SELECT vec_cosine(array(0.0D, 0.0D), array(1.0D, 0.0D)) AS zero,
        |       vec_cosine(array(1.0D), array(1.0D, 0.0D)) AS mismatch
        |""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("nfc_normalize callable from spark.sql; composes + fast-paths") {
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS composed, " +
        "nfc_normalize('plain ascii') AS same, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) == "café", "NFD input not composed")
    assert(r.getString(1) == "plain ascii")
    assert(r.isNullAt(2))
  }

  test("hash and byte kernels callable from spark.sql") {
    val r = spark.sql(
      """SELECT md5_prefix60('abc') AS h,
        |       conv(substring(md5('abc'), 1, 15), 16, 10) AS href,
        |       byte_sum(CAST('ab' AS BINARY)) AS bs,
        |       CAST(byte_sample(CAST('abcdef' AS BINARY), 2) AS STRING) AS smp
        |""".stripMargin).head()
    assert(r.getLong(0) == r.getString(1).toLong)
    assert(r.getLong(2) == 'a'.toLong + 'b'.toLong)
    assert(r.getString(3) == "ace")
  }
}
