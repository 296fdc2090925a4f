package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Logger-component parity (reference logger.py): file handler writes
  * formatted lines, repeated gets don't duplicate handlers, unwritable
  * paths degrade instead of throwing, clear truncates.
  */
class LogSpec extends AnyFunSuite {

  test("file handler writes formatted lines; no handler duplication") {
    val f = Files.createTempFile("graft-log", ".log")
    val lg = Log.logger("graft.test.filelog", show = false, logFile = f)
    lg.info("first message")
    Log.logger("graft.test.filelog", show = false, logFile = f)
      .warning("second message")
    lg.getHandlers.foreach(_.flush())
    val lines = Files.readAllLines(f)
    assert(lines.size === 2, lines)
    assert(lines.get(0).matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} — graft\.test\.filelog — INFO — first message"""),
      lines.get(0))
    assert(lines.get(1).contains("WARNING — second message"))
    // idempotent get: still exactly one file handler
    assert(Log.logger("graft.test.filelog", logFile = f)
      .getHandlers.count(_.isInstanceOf[java.util.logging.FileHandler]) === 1)
  }

  test("unwritable log path degrades silently; clear truncates") {
    val bad = Paths.get("/proc/graft-definitely-unwritable/x.log")
    val lg = Log.logger("graft.test.badpath", show = false, logFile = bad)
    lg.info("does not throw") // no file handler, no exception
    assert(!lg.getHandlers.exists(
      _.isInstanceOf[java.util.logging.FileHandler]))

    val f = Files.createTempFile("graft-log-clear", ".log")
    Files.write(f, "old content\n".getBytes)
    Log.clearLogFile(f)
    assert(Files.readAllBytes(f).isEmpty)
    Log.clearLogFile(Paths.get("/proc/graft-nope/y.log")) // never throws
  }
}
