package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.Metrics
import graft.io.RedisSink
import graft.ml.{ModelRegistry, MultiModel}

/** The reference's FastAPI serving layer re-expressed on the JDK HTTP
  * server (zero extra dependencies): `POST /train/` and `POST /predict/`
  * with a response cache (reference /root/reference/src/app.py:37-140).
  *
  * Deliberate fixes over the reference (SURVEY §2.12):
  *   - one long-lived SparkSession and a cached prepared DataFrame shared
  *     across requests — the reference re-reads and re-fits the world per
  *     request (train.py:26-114);
  *   - `upload` mode actually works (app.py:124 calls a method that does
  *     not exist);
  *   - no CLI-argv parsing inside the HTTP path (predict.py:100);
  *   - registry is append-only JSONL, not racy INI rewrites.
  *
  * Cache: in-memory by default; Redis-backed (`predict:{mode}` keys, as in
  * app.py:98-140) when a redis endpoint is configured.
  */
class GraftServer(
    spark: SparkSession,
    trainData: () => DataFrame,
    featureCols: Seq[String],
    modelDir: String,
    port: Int = 0,
    redis: Option[(String, Int)] = None) {

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
  private val registry = new ModelRegistry(s"$modelDir/registry.jsonl")
  private val localCache = new ConcurrentHashMap[String, String]()
  @volatile private var lastModelName: Option[String] = None

  // the reference rebuilds this per request; we prepare once and reuse
  private lazy val prepared: (DataFrame, DataFrame) = {
    val (tr, te) = MultiModel.split(trainData())
    (tr.cache(), te.cache())
  }

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(4))

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: Map[String, Any])
      : Unit = {
    val bytes = mapper.writeValueAsString(body)
      .getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def cacheGet(key: String): Option[String] = redis match {
    case Some((h, p)) => RedisSink.cacheGet(h, p, key)
    case None => Option(localCache.get(key))
  }

  private def cachePut(key: String, value: String): Unit = redis match {
    case Some((h, p)) => RedisSink.cacheSet(h, p, key, value)
    case None => localCache.put(key, value)
  }

  server.createContext("/train/", (ex: HttpExchange) => {
    try {
      val p = queryParams(ex)
      val modelType = p.getOrElse("model_type", "D_TREE")
      if (!graft.ml.Trainers.ModelTypes.contains(modelType.toUpperCase)) {
        respond(ex, 400, Map("error" -> s"invalid model type: $modelType"))
      } else {
        val (tr, _) = prepared
        val t = MultiModel.train(tr, featureCols, modelType, p,
          useSmote = p.getOrElse("use_smote", "true").toBoolean,
          smoteStrategy = p.getOrElse("smote_strategy", "oversample"))
        val name = p.getOrElse("name", modelType.toLowerCase)
        MultiModel.save(t, modelDir, registry, name)
        lastModelName = Some(name)
        localCache.clear()
        respond(ex, 200, Map(
          "model_trained" -> true,
          "model_type" -> modelType,
          "model_saved" -> true,
          "train_accuracy" -> t.trainAccuracy))
      }
    } catch {
      case e: Throwable => respond(ex, 500, Map("error" -> e.getMessage))
    }
  })

  server.createContext("/predict/", (ex: HttpExchange) => {
    try {
      val p = queryParams(ex)
      val mode = p.getOrElse("mode", "smoke")
      val name = p.get("name").orElse(lastModelName)
        .getOrElse(throw new IllegalStateException("no trained model"))
      // upload bodies can only be read once — read before the cache probe
      val uploadBody =
        if (mode == "upload")
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        else ""
      // resolve the model BEFORE the cache probe: the key carries
      // everything the answer depends on — mode, resolved model name,
      // request body digest, and the registry entry's durable identity
      // (path + created_at). A retrain appends a new registry entry, so
      // its key can never alias a pre-retrain hit — and unlike a
      // process-local generation counter, this survives server restarts
      // against a persistent Redis cache.
      val entry = registry.latest(name)
        .getOrElse(throw new IllegalStateException(s"unknown model $name"))
      val cacheKey = s"predict:$mode:$name:" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"${entry.path}@${entry.createdAtMs}\n$uploadBody"
            .getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
      cacheGet(cacheKey) match {
        case Some(hit) =>
          val parsed = mapper.readValue(hit, classOf[Map[String, Any]])
          respond(ex, 200, parsed + ("from_cache" -> true))
        case None =>
          val model = MultiModel.load(entry.path)
          val result: Map[String, Any] = mode match {
            case "smoke" =>
              val (_, te) = prepared
              Map("mode" -> "smoke",
                "test_score" -> MultiModel.accuracy(model, te))
            case "db" =>
              val (_, te) = prepared
              val preds = MultiModel.score(model, te)
              redis.foreach { case (h, rp) =>
                RedisSink.writeList(preds, "prediction", h, rp)
              }
              Map("mode" -> "db", "n_predictions" -> preds.count(),
                "sink" -> redis.map(_ => "redis").getOrElse("none"))
            case "upload" =>
              // the mode the reference 500s on (app.py:124): accept CSV
              // feature rows in the body (pre-read above), conform, score
              val lines =
                uploadBody.split("\n").filter(_.trim.nonEmpty).toSeq
              import spark.implicits._
              val header = lines.head.split(",").map(_.trim)
              val data = spark.createDataset(lines.tail).toDF("line")
                .select((0 until header.length).map(i =>
                  split(col("line"), ",").getItem(i)
                    .cast("double").as(header(i))): _*)
              val conformed = graft.etl.Preprocess.conform(data,
                org.apache.spark.sql.types.StructType(featureCols.map(c =>
                  org.apache.spark.sql.types.StructField(c,
                    org.apache.spark.sql.types.DoubleType))))
              val scored = model.transform(conformed)
              Map("mode" -> "upload", "n_scored" -> scored.count(),
                "predictions" -> scored.select("prediction")
                  .collect().map(_.getDouble(0)).toSeq)
            case other =>
              throw new IllegalArgumentException(s"unknown mode: $other")
          }
          cachePut(cacheKey, mapper.writeValueAsString(result))
          respond(ex, 200, result + ("from_cache" -> false))
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 400, Map("error" -> e.getMessage))
      case e: Throwable => respond(ex, 500, Map("error" -> e.getMessage))
    }
  })

  server.createContext("/metrics/", (ex: HttpExchange) => {
    try {
      val name = queryParams(ex).get("name").orElse(lastModelName)
        .getOrElse(throw new IllegalArgumentException("no model"))
      val entry = registry.latest(name)
        .getOrElse(throw new IllegalArgumentException(s"unknown $name"))
      val model = MultiModel.load(entry.path)
      val (_, te) = prepared
      val cm = Metrics.confusion(
        MultiModel.score(model, te)
          .select(col("label").cast("double").as("label"),
            col("prediction")))
        .collect().map(r => Seq(r.get(0), r.get(1), r.get(2)))
      respond(ex, 200, Map("name" -> name, "confusion" -> cm.toSeq))
    } catch {
      case e: Throwable => respond(ex, 400, Map("error" -> e.getMessage))
    }
  })

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
}
