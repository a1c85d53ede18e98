package graft

/** Smoke for the bench capstone WIRING (the pipelines themselves are
  * covered e2e by EtlRunSpec / EtlProxyClusterSpec / CurateRunSpec): a
  * broken fixture here would otherwise only surface at record time, as a
  * capstone_etl error in the round's bench JSON. Runs the etl capstone
  * once — since round 14 that path loads through ProxyJdbcServer's TCP
  * endpoint, so this also smoke-checks the proxy under the exact call
  * shape Bench uses. */
class BenchCapstonesSpec extends SparkSpec {
  test("etl capstone runs through the proxy endpoint and reports a sane time") {
    val s = BenchCapstones.etlSeconds(spark)
    assert(s > 0.0 && s < 300.0, s"etl capstone took ${s}s")
  }
}
