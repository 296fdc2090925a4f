package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** S9 — per-run experiment manifest, the reference's `exp_config.yaml` +
  * copied-artifact convention (/root/reference/src/predict.py:146-169):
  * records model, params, metrics and input fingerprints so a scoring run
  * is reproducible. S10's DVC pinning is mirrored by recording the input
  * path + its file inventory (name, size) — the same contract data.dvc
  * carries (path + md5 + size).
  */
final case class Experiment(
    name: String,
    modelPath: String,
    modelType: String,
    params: Map[String, String],
    metrics: Map[String, Double],
    inputs: Seq[InputPin],
    createdAtMs: Long)

final case class InputPin(path: String, files: Int, bytes: Long)

object ExperimentManifest {

  private val mapper =
    new ObjectMapper(new YAMLFactory()).registerModule(DefaultScalaModule)

  /** S10-style pin of an input path: recursive file count + total bytes
    * (parquet outputs are directories of part files).
    */
  def pin(path: String): InputPin = {
    val p = Paths.get(path)
    if (!Files.exists(p)) InputPin(path, 0, 0L)
    else {
      val walk = Files.walk(p)
      try {
        val files = walk.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(Files.isRegularFile(_))
        InputPin(path, files.length, files.map(Files.size).sum)
      } finally walk.close()
    }
  }

  def write(exp: Experiment, dir: String): String = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val out = d.resolve("exp_config.yaml")
    Files.write(out,
      mapper.writeValueAsString(exp).getBytes(StandardCharsets.UTF_8))
    out.toString
  }

  def read(path: String): Experiment =
    mapper.readValue(Files.readString(Paths.get(path)),
      classOf[Experiment])
}
