package graft

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Pins the machine-readable bench record (VERDICT r13 #1).
  *
  * The round driver archives Bench's stdout and tries to parse the
  * summary JSON; rounds 12-13 recorded `"parsed": null` because sbt's
  * logger prefixed the line with "[info] ". The fix has three parts —
  * build.sbt routes the forked run through StdoutOutput (not testable
  * here), [[Bench.renderSummary]] produces ONE bare single-line JSON
  * used for both sinks, and [[Bench.writeResult]] lands the identical
  * bytes in target/bench_result.json. This spec pins the latter two:
  * the SCHEMA of the summary (key set, types, metric/unit values) and
  * the file's byte-identity with the stdout line, so a drive-by edit to
  * either sink shows up as a red test, not as a silently unparseable
  * round artifact.
  */
class BenchEmitSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def sample: String = Bench.renderSummary(
    wall = 25.444, n = 204, threads = 6, seqWall = 62.071,
    slowestJson = """{"text_langid_chargram":2.518,"dedup_components":2.440}""",
    failedJson = """["join_asof"]""",
    sfDir = "/root/testdata/sf0.1")

  test("summary is a single bare line parseable as JSON") {
    assert(!sample.contains("\n"), "must be one line — the driver scrapes line-wise")
    assert(sample.startsWith("{") && sample.endsWith("}"))
    val node = mapper.readTree(sample)
    assert(node.isObject)
  }

  test("summary schema: pinned key set, types, and fixed fields") {
    val node = mapper.readTree(sample)
    val keys = node.fieldNames().asScala.toSet
    assert(keys === Set("metric", "value", "unit", "n", "threads",
      "seq_wall", "queries", "failed", "sf"),
      "key set is the driver-facing contract — extend the pin when extending the line")
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("value").isNumber && node.get("value").asDouble() === 25.44)
    assert(node.get("seq_wall").isNumber && node.get("seq_wall").asDouble() === 62.07)
    assert(node.get("n").isInt && node.get("n").asInt() === 204)
    assert(node.get("threads").isInt && node.get("threads").asInt() === 6)
    assert(node.get("queries").isObject &&
      node.get("queries").get("dedup_components").asDouble() === 2.44)
    assert(node.get("failed").isArray &&
      node.get("failed").get(0).asText() === "join_asof")
    assert(node.get("sf").asText() === "/root/testdata/sf0.1")
  }

  test("writeResult lands the identical summary bytes (plus trailing newline)") {
    val dir = Files.createTempDirectory("bench-emit")
    try {
      val path = dir.resolve("nested").resolve("bench_result.json")
      Bench.writeResult(sample, path)
      assert(Files.readString(path) === sample + "\n",
        "file copy must be byte-identical to the stdout line")
      // Overwrite semantics: a rerun replaces, never appends — the file
      // is a per-run record like BENCH_DETAILS.json.
      Bench.writeResult(sample, path)
      assert(Files.readString(path) === sample + "\n")
    } finally {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
        Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("resultPath is the documented driver-facing location") {
    assert(Bench.resultPath === "target/bench_result.json")
  }

  test("build.sbt keeps the forked-run stdout routing that makes the summary line bare") {
    // VERDICT r14 #5, sbt half: the driver's `parsed` block went null for
    // two rounds because sbt's default LoggedOutput prefixed the summary
    // with "[info] ". The fix is configuration, so only a text pin can
    // hold it — an sbt logging change (dropping outputStrategy, or
    // un-forking run) must show up as a red test, not as a silently
    // unparseable BENCH_r{N}.json.
    val sbtText = Files.readString(Path.of("build.sbt"))
    assert(sbtText.contains("run / fork := true"),
      "run must stay forked — in-process run would re-route stdout through sbt")
    assert(sbtText.contains("run / outputStrategy := Some(OutputStrategy.StdoutOutput)"),
      "the StdoutOutput routing is the driver-parse contract — " +
        "restore it or re-derive the BENCH parsed pipeline")
  }

  test("end-to-end: a forked Bench run's FINAL stdout line is the bare summary, byte-identical to bench_result.json") {
    // VERDICT r14 #5, process half: pins the chain the unit tests can't —
    // that the summary really is the LAST stdout line of a real Bench
    // process (after Spark shutdown chatter, which goes to stderr) and
    // that target/bench_result.json lands the identical bytes. Forks
    // `java graft.Bench` directly with this test JVM's classpath and
    // add-opens (bypassing sbt — the sbt prefix seam is the text pin
    // above), cwd'd to a temp dir so the run's BENCH_DETAILS.json and
    // target/bench_result.json never touch the repo's real artifacts.
    // Two cheap queries at sf0.001 keep it ~30 s.
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("bench-e2e")
    val javaBin = Path.of(sys.props("java.home"), "bin", "java").toString
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED")).toSeq
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"), "graft.Bench")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.directory(tmp.toFile)
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    // THREADS=2 so the REAL sequential pass runs before the concurrent
    // one (threads=1 skips it and falls back) — VERDICT r17 #6: seq_wall
    // is the gate-comparable series, so a harness regression that
    // silently dropped the sequential pass must show here.
    pb.environment().put("SPARK_GRAFT_BENCH_THREADS", "2")
    pb.environment().put("SPARK_GRAFT_BENCH_SEQ", "1")
    pb.environment().put("SPARK_GRAFT_BENCH_ONLY", "scan_full,fn_string")
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    // stdout via a FILE, never a pipe read-before-waitFor: readAllBytes on
    // the pipe would block past the advertised timeout if the child wedges
    // before closing stdout, hanging the whole suite with the child alive
    // (review r15); with a file redirect the timeout actually fires and
    // the child is killed.
    val stdoutFile = tmp.resolve("stdout.txt").toFile
    pb.redirectOutput(stdoutFile)
    val proc = pb.start()
    val finished = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly().waitFor()
    val stdout = Files.readString(stdoutFile.toPath)
    assert(finished, s"forked Bench did not finish in 180s; killed. stdout so far:\n$stdout")
    assert(proc.exitValue() === 0, s"forked Bench exited ${proc.exitValue()}:\n$stdout")

    val lines = stdout.linesIterator.toSeq
    assert(lines.nonEmpty, "forked Bench printed nothing to stdout")
    val last = lines.last
    assert(last.startsWith("{") && last.endsWith("}"),
      s"final stdout line is not the bare summary JSON: <$last>")
    val fileBytes = Files.readString(tmp.resolve("target").resolve("bench_result.json"))
    assert(fileBytes === last + "\n",
      "bench_result.json drifted from the final stdout line — the two sinks share one renderer; re-sync")
    val node = mapper.readTree(last)
    assert(node.fieldNames().asScala.toSet === Set("metric", "value", "unit",
      "n", "threads", "seq_wall", "queries", "failed", "sf"),
      "driver-facing key set changed — extend BOTH schema pins together")
    assert(node.get("n").asInt() === 2, "SPARK_GRAFT_BENCH_ONLY restriction not honored")
    assert(node.get("value").isNumber && node.get("value").asDouble() > 0.0)
    assert(node.get("seq_wall").isNumber && node.get("seq_wall").asDouble() > 0.0,
      "seq_wall missing or zero with SPARK_GRAFT_BENCH_SEQ=1 — the " +
        "gate-comparable sequential series was silently dropped")
    // The sequential pass is a separate wall-clock measurement from the
    // concurrent pass; its per-query map must have been recorded for both
    // queries in BENCH_DETAILS.json (the seq_queries key tags the pass).
    val details = mapper.readTree(
      Files.readString(tmp.resolve("BENCH_DETAILS.json")))
    assert(details.get("seq_queries").isObject &&
      details.get("seq_queries").fieldNames().asScala.toSet ===
        Set("scan_full", "fn_string"),
      "sequential-pass per-query map missing from BENCH_DETAILS.json")
    assert(node.get("queries").isObject &&
      node.get("queries").fieldNames().asScala.toSet === Set("scan_full", "fn_string"))
    assert(node.get("failed").isArray && node.get("failed").size() === 0,
      s"mini-run had failed queries: $last")
    assert(node.get("sf").asText() === "/root/testdata/sf0.001")
  }
}
