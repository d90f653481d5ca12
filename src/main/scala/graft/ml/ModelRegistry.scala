package graft.ml

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.ml.util.{MLReadable, MLWritable}

/** Model versioning — Spark realization of model_registry.py: each
  * registered model gets a monotonically-increasing version directory
  * plus a line in a JSON-lines registry file recording name, version,
  * path and metrics. MLlib native save/load is used for persistence
  * (cluster-portable: models write to any Hadoop-compatible FS).
  */
class ModelRegistry(rootDir: String) {
  private val root: Path = Paths.get(rootDir)
  Files.createDirectories(root)
  private val indexFile = root.resolve("registry.jsonl")

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
  }

  /** Save `model` as the next version of `name`; returns the version. */
  def register(name: String, model: MLWritable, metrics: Map[String, Double]): Int = {
    val version = latestVersion(name).getOrElse(0) + 1
    val dir = root.resolve(name).resolve(s"v$version")
    model.write.overwrite().save(dir.toString)
    val ms = metrics.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")
    val line = s"""{"name": "${esc(name)}", "version": $version, "path": "${esc(dir.toString)}", "metrics": $ms}"""
    Files.writeString(indexFile, line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    version
  }

  /** All registered (name, version, path) triples. */
  def entries: Seq[(String, Int, String)] =
    if (!Files.exists(indexFile)) Seq.empty
    else Files.readAllLines(indexFile).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val name = """"name": "([^"]*)"""".r.findFirstMatchIn(l).get.group(1)
      val v = """"version": (\d+)""".r.findFirstMatchIn(l).get.group(1).toInt
      val p = """"path": "([^"]*)"""".r.findFirstMatchIn(l).get.group(1)
      (name, v, p)
    }

  def latestVersion(name: String): Option[Int] =
    entries.filter(_._1 == name).map(_._2).maxOption

  /** Load the latest version of `name` with the given loader
    * (e.g. `ModelRegistry.load(reg, "rf", RandomForestRegressionModel)`). */
  def load[M](name: String, loader: MLReadable[M]): M = {
    val (_, _, path) = entries.filter(_._1 == name).maxBy(_._2)
    loader.load(path)
  }
}
