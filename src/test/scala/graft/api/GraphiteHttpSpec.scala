package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec

/** End-to-end Graphite Render API round trip over the HTTP facade:
  * /render JSON shape, /metrics/find tree/completer formats,
  * /metrics/expand, and the /tags family
  * (app/vmselect/graphite/{render,metrics,tags}_api.go routes).
  */
class GraphiteHttpSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, pathAndQuery: String): String = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathAndQuery")).GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  private def base = Seq(
    ("web.s1.cpu", Map("dc" -> "east"), 0L, 1.0),
    ("web.s1.cpu", Map("dc" -> "east"), 10000L, 2.0),
    ("web.s2.cpu", Map("dc" -> "west"), 0L, 3.0),
    ("web.s2.cpu", Map("dc" -> "west"), 10000L, 4.0),
    ("web.s1.cpu.user", Map.empty[String, String], 0L, 9.0))
    .toDF("name", "tags", "ts", "value")

  test("render: json series with datapoints, sorted by name") {
    val api = new HttpApi(spark, Some(base))
    val port = api.start()
    try {
      val body = get(port,
        "/render?format=json&target=sumSeries(web.*.cpu)&from=0&until=20&storage_step=10")
      assert(body.startsWith("""[{"target":"sumSeries(web.*.cpu)""""))
      assert(body.contains(""""datapoints":[[4,0],[6,10]]"""))
      assert(body.contains(""""aggregatedBy":"sum""""))
      // two targets, series sorted by name
      val multi = get(port,
        "/render?format=json&target=web.s2.cpu&target=web.s1.cpu&from=0&until=20&storage_step=10")
      val i1 = multi.indexOf("web.s1.cpu")
      val i2 = multi.indexOf("web.s2.cpu")
      assert(i1 >= 0 && i2 > i1)
      assert(multi.contains("""[1,0]""") && multi.contains("""[4,10]"""))
      // non-json format is rejected with the error envelope
      assert(get(port, "/render?format=csv&target=web.s1.cpu").contains("error"))
    } finally api.stop()
  }

  test("metrics/find: treejson with branch/leaf flags; completer; expand") {
    val api = new HttpApi(spark, Some(base))
    val port = api.start()
    try {
      val tree = get(port, "/metrics/find?query=web.*")
      // branch paths keep the trailing delimiter in their id
      // (metrics_find_response.qtpl: only the double-delimiter merge strips)
      assert(tree.contains(""""id":"web.s1.","text":"s1""""))
      assert(tree.contains(""""allowChildren":1"""))
      val kids = get(port, "/metrics/find?query=web.s1.*")
      // cpu is both a leaf (web.s1.cpu) and a branch (web.s1.cpu.user):
      // the treejson merge emits it once as expandable
      assert(kids.contains(""""id":"web.s1.cpu""""))
      val completer = get(port, "/metrics/find?query=web.*&format=completer")
      assert(completer.contains(""""path":"web.s1.""""))
      assert(completer.contains(""""is_leaf":0"""))
      val expand = get(port, "/metrics/expand?query=web.*.cpu")
      assert(expand.contains("\"web.s1.cpu\"") && expand.contains("\"web.s2.cpu\""))
    } finally api.stop()
  }

  test("/functions lists the registry; details for one name") {
    val api = new HttpApi(spark, Some(base))
    val port = api.start()
    try {
      val all = get(port, "/functions")
      assert(all.contains(""""sumSeries":{"name":"sumSeries""""))
      assert(all.contains(""""movingAverage""""))
      val one = get(port, "/functions/aliasByNode")
      assert(one.startsWith("""{"name":"aliasByNode""""))
      assert(get(port, "/functions/nope").contains("cannot find function"))
    } finally api.stop()
  }

  test("tags family: list, values, findSeries, autoComplete") {
    val api = new HttpApi(spark, Some(base))
    val port = api.start()
    try {
      val tags = get(port, "/tags")
      assert(tags.contains("""{"tag":"dc"}""") && tags.contains("""{"tag":"name"}"""))
      val vals = get(port, "/tags/dc")
      assert(vals.contains(""""tag":"dc"""") && vals.contains(""""value":"east""""))
      val fs = get(port, "/tags/findSeries?expr=dc=east")
      assert(fs == """["web.s1.cpu;dc=east"]""")
      val act = get(port, "/tags/autoComplete/tags?tagPrefix=d")
      assert(act == """["dc"]""")
      val acv = get(port, "/tags/autoComplete/values?tag=dc&valuePrefix=w")
      assert(acv == """["west"]""")
    } finally api.stop()
  }
}
