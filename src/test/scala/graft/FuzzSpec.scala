package graft

import org.scalatest.funsuite.AnyFunSuite

/** Standing adversarial-data regression lock.
  *
  * src/test/resources/fuzz_sf is a COMMITTED copy of the
  * tools/gen_fuzz_data.py output over sf0.001: unicode NFC/NFD,
  * zero-width and combining characters, markup double-decode traps,
  * PII lookalikes, quote/escape injection, window-ordering ties,
  * rounding-half boundaries, signed zero, denormals, malformed JSON
  * props, filter-boundary timestamps, orphan foreign keys, and
  * duplicate/scaled/negated embeddings. The committed goldens
  * (fuzz_golden.json) were recorded from a run whose outputs the
  * DuckDB oracle gate verified hash-green on the SAME data
  * (FUZZCHECK.json, round 13) — so this spec locks verified
  * cross-engine behavior into every `sbt test` run without needing
  * DuckDB in the JVM. A future kernel or oracle-contract change that
  * breaks unicode/ANSI/tie/signed-zero semantics fails here, named
  * per query.
  *
  * Regeneration after an INTENTIONAL semantics change: see the
  * [[FuzzGold]] scaladoc — the procedure re-runs the DuckDB gate,
  * which is what keeps the goldens honest.
  */
class FuzzSpec extends AnyFunSuite {

  private lazy val fuzzDir: String = {
    val url = getClass.getResource("/fuzz_sf")
    assert(url != null, "committed fuzz dataset /fuzz_sf missing from test resources")
    new java.io.File(url.toURI).getAbsolutePath
  }

  private lazy val golden: Map[String, String] = {
    val url = getClass.getResource("/fuzz_golden.json")
    assert(url != null, "committed goldens /fuzz_golden.json missing from test resources")
    val txt = scala.io.Source.fromURL(url, "UTF-8").mkString
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(txt) match {
      case JObject(fs) => fs.collect {
        case (k, JString(v)) if !k.startsWith("_") => k -> v
      }.toMap
      case _ => Map.empty
    }
  }

  test("goldens cover exactly the deterministic (oracled) query set") {
    val expect = SparkEntry.queries.keySet -- FuzzGold.excluded
    assert(golden.keySet == expect,
      s"missing=${(expect -- golden.keySet).toSeq.sorted} extra=${(golden.keySet -- expect).toSeq.sorted}")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted if !FuzzGold.excluded(name)) {
    test(s"fuzz golden: $name") {
      val df = SparkEntry.queries(name)(TestSession.spark, fuzzDir)
      val h = try FuzzGold.hash(df)
        finally {
          graft.operators.Caches.releaseAll()
          // keep the trained-literal oracle registry unambiguous for
          // the contract suites sharing this JVM (see the hook's doc)
          SparkEntry.forgetQuantizerRuns(fuzzDir)
        }
      assert(golden.contains(name), s"no committed golden for $name")
      assert(h == golden(name),
        s"$name diverged from its DuckDB-verified golden on adversarial data; " +
          "if the semantics change is INTENTIONAL, regenerate per the FuzzGold scaladoc " +
          "(the procedure re-runs the DuckDB gate)")
    }
  }
}
