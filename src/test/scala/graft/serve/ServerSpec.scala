package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Functional API tests mirroring the reference's live-API suite
  * (/root/reference/src/tests/test_functional.py:22-112): train each model
  * type over HTTP, invalid type → 400, predict smoke with cache hit on the
  * second call, plus the upload mode the reference ships broken.
  */
class ServerSpec extends SparkSpec {

  private val featureCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private lazy val server = {
    val s = new GraftServer(
      spark,
      () => Tables.load(spark, sf0001, "lineitem").select(
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax")),
      featureCols,
      Files.createTempDirectory("graft-serve").toString)
    s.start()
    s
  }

  private val http = HttpClient.newHttpClient()

  private def post(path: String, body: String = ""): (Int, String) = {
    val req = HttpRequest.newBuilder()
      .uri(new URI(s"http://127.0.0.1:${server.boundPort}$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("POST /train/ trains each model type (functional suite parity)") {
    for (mt <- Seq("LOG_REG", "GNB", "D_TREE")) {
      val (code, body) = post(
        s"/train/?model_type=$mt&max_iter=5&n_estimators=3&name=m_$mt")
      assert(code === 200, body)
      assert(body.contains("\"model_trained\":true"))
      assert(body.contains("\"model_saved\":true"))
    }
  }

  test("POST /train/ with invalid model type returns 400") {
    val (code, body) = post("/train/?model_type=NOT_A_MODEL")
    assert(code === 400)
    assert(body.contains("invalid model type"))
  }

  test("POST /predict/ smoke scores in [0,1]; second call hits cache") {
    post("/train/?model_type=D_TREE&name=cache_test")
    val (c1, b1) = post("/predict/?mode=smoke&name=cache_test")
    assert(c1 === 200, b1)
    assert(b1.contains("\"from_cache\":false"))
    assert(b1.contains("test_score"))
    val (c2, b2) = post("/predict/?mode=smoke&name=cache_test")
    assert(c2 === 200)
    assert(b2.contains("\"from_cache\":true"))
  }

  test("POST /predict/ upload mode scores CSV rows (fixed vs reference)") {
    post("/train/?model_type=D_TREE&name=upload_test")
    val csv =
      "l_quantity,l_extendedprice,l_discount,l_tax\n" +
        "10,1000.0,0.05,0.02\n25,50000.0,0.1,0.08\n"
    val (code, body) = post("/predict/?mode=upload&name=upload_test", csv)
    assert(code === 200, body)
    assert(body.contains("\"n_scored\":2"))
    assert(body.contains("predictions"))
  }

  test("POST /predict/ unknown mode returns 400") {
    post("/train/?model_type=D_TREE&name=mode_test")
    val (code, _) = post("/predict/?mode=bogus&name=mode_test")
    assert(code === 400)
  }

  test("GET-style /metrics/ returns confusion matrix for trained model") {
    post("/train/?model_type=D_TREE&name=metrics_test")
    val (code, body) = post("/metrics/?name=metrics_test")
    assert(code === 200, body)
    assert(body.contains("confusion"))
  }
}
