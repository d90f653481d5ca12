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

  /** SHA-256 over the saved artifact's files (sorted walk) —
    * model_registry.py:47-55's integrity hash, directory-shaped. */
  def artifactHash(dir: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Files.walk(dir).iterator().asScala.toSeq
      .filter(Files.isRegularFile(_)).sortBy(_.toString)
      .foreach(p => md.update(Files.readAllBytes(p)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Save `model` as the next version of `name`; returns the version. */
  def register(name: String, model: MLWritable, metrics: Map[String, Double]): Int = {
    val version = latestVersion(name).getOrElse(0) + 1
    val dir = root.resolve(name).resolve(s"v$version")
    model.write.overwrite().save(dir.toString)
    // NaN/Infinity are not valid JSON number literals — write null
    val ms = metrics.map { case (k, v) =>
      val jv = if (v.isNaN || v.isInfinity) "null" else v.toString
      s""""${esc(k)}": $jv"""
    }.mkString("{", ", ", "}")
    val line = s"""{"name": "${esc(name)}", "version": $version, "path": "${esc(dir.toString)}", "hash": "${artifactHash(dir)}", "metrics": $ms}"""
    Files.writeString(indexFile, line + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    version
  }

  /** Metric values of a registered (name, version). */
  def metricsOf(name: String, version: Int): Map[String, Double] = {
    val line = rawLines.find(l =>
      l.contains(s""""name": "${esc(name)}"""") && l.contains(s""""version": $version"""))
      .getOrElse(throw new NoSuchElementException(s"$name v$version"))
    """"([a-zA-Z0-9_]+)": (-?[0-9.eE+-]+)""".r.findAllMatchIn(
      line.substring(line.indexOf("\"metrics\"")))
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Compare two versions of a model (model_registry.py:102-128):
    * per-metric (a, b, delta). */
  def compare(name: String, versionA: Int, versionB: Int)
      : Map[String, (Double, Double, Double)] = {
    val a = metricsOf(name, versionA)
    val b = metricsOf(name, versionB)
    (a.keySet ++ b.keySet).map { k =>
      val va = a.getOrElse(k, Double.NaN)
      val vb = b.getOrElse(k, Double.NaN)
      k -> (va, vb, vb - va)
    }.toMap
  }

  private def rawLines: Seq[String] =
    if (!Files.exists(indexFile)) Seq.empty
    else Files.readAllLines(indexFile).asScala.toSeq.filter(_.nonEmpty)

  /** All registered (name, version, path) triples. */
  def entries: Seq[(String, Int, String)] =
    rawLines.map { l =>
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
