package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forked-JVM reproduction of the r8 shutdown failure shape (r8 verdict
  * ask #1): `ExitProbe` runs a RocksDB-backed stateful stream, tears down
  * via `CleanExit.teardown`, prints its marker, and `CleanExit.halt`s.
  * The assertions are exactly the driver's needs: exit code 0, the
  * parseable marker as the LAST stdout line (nothing — crash banner
  * included — printed after it), and no `hs_err_pid*.log` in the probe's
  * working directory. */
class CleanExitSpec extends AnyFunSuite {

  test("probe JVM exits rc 0 with the marker as the final stdout line") {
    // Test / fork := true, so java.class.path is the full test classpath
    // (spark jars + compiled classes); reuse it plus the same JDK-17
    // --add-opens set the build ships.
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cwd = java.nio.file.Files.createTempDirectory("graft_exit_spec").toFile
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"), "graft.ExitProbe")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd)
    pb.redirectErrorStream(false)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
    val finished = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(finished, "probe JVM did not finish within 300s")
    assert(p.exitValue() === 0,
      s"probe rc ${p.exitValue()}; stderr tail: ${err.takeRight(500)}")
    val lines = out.linesIterator.filter(_.nonEmpty).toSeq
    assert(lines.nonEmpty && lines.last.startsWith("PROBE_OK"),
      s"final stdout line was not the marker: ${lines.takeRight(3)}")
    // the marker carries the drained row count — the stream really ran
    assert(lines.last === "PROBE_OK 7")
    val crashLogs = cwd.listFiles((_, n) => n.startsWith("hs_err"))
    assert(crashLogs == null || crashLogs.isEmpty,
      s"probe left crash logs: ${crashLogs.map(_.getName).toSeq}")
  }
}
