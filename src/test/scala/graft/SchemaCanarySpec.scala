package graft

/** Schema-drift canary: fails with ONE message naming the drifted
  * column/type when the driver regenerates testdata with a different
  * physical schema (the r7 failure mode — 26 scattered analysis
  * errors with no single diagnostic). Also pins that the adaptive
  * events loader normalizes `ts` to a timestamp under BOTH known
  * physical vintages.
  */
class SchemaCanarySpec extends SparkSuite {
  test("testdata physical schemas match loader expectations") {
    val d = SchemaCanary.drift(spark, sf)
    assert(d.isEmpty, s"\nTESTDATA SCHEMA DRIFT:\n  ${d.mkString("\n  ")}")
  }

  test("events loader normalizes ts to TimestampType") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.limit(5).count() > 0)
  }
}
