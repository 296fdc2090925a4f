package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.logging.{ConsoleHandler, FileHandler, Formatter, Level,
  LogRecord, Logger}

/** Console+file logging infrastructure — parity with the reference's
  * Logger component (/root/reference/src/logger.py:10-93): a named logger
  * with an optional console handler, a file handler whose path comes from
  * the LOG_FILE env var (temp-dir default), graceful degradation when the
  * log file isn't writable, and no handler duplication on repeated gets.
  *
  * Built on java.util.logging so it never touches Spark's log4j config —
  * engine components log through here; Spark internals keep their own
  * sink.
  */
object Log {

  /** "2026-08-12 14:00:00 — name — INFO — message" (reference FORMATTER,
    * logger.py:23).
    */
  private object LineFormatter extends Formatter {
    private val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    override def format(r: LogRecord): String = {
      val when = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(r.getMillis),
        java.time.ZoneId.systemDefault())
      s"${ts.format(when)} — ${r.getLoggerName} — ${r.getLevel} — " +
        s"${formatMessage(r)}\n"
    }
  }

  /** Default log file: $LOG_FILE or <tmpdir>/logfile.log
    * (logger.py:26-28).
    */
  def defaultLogFile: Path = Paths.get(
    sys.env.getOrElse("LOG_FILE",
      s"${System.getProperty("java.io.tmpdir")}/logfile.log"))

  /** Truncate the log file if possible; never throws (logger.py:31-40). */
  def clearLogFile(path: Path = defaultLogFile): Unit =
    try {
      if (Files.exists(path)) Files.write(path, Array.emptyByteArray)
    } catch { case _: java.io.IOException | _: SecurityException => () }

  /** Configured named logger: console handler when `show`, file handler
    * when the path is writable (silently skipped otherwise —
    * logger.py:50-70), DEBUG-equivalent level, no propagation to parent
    * handlers, idempotent on repeated calls for the same name.
    */
  def logger(name: String, show: Boolean = false,
      logFile: Path = defaultLogFile): Logger = {
    val lg = Logger.getLogger(name)
    lg.setLevel(Level.ALL)
    lg.setUseParentHandlers(false) // logger.propagate = False
    val handlers = lg.getHandlers
    if (show && !handlers.exists(_.isInstanceOf[ConsoleHandler])) {
      val h = new ConsoleHandler
      h.setEncoding("UTF-8")
      h.setFormatter(LineFormatter)
      h.setLevel(Level.ALL)
      lg.addHandler(h)
    }
    if (!handlers.exists(_.isInstanceOf[FileHandler])) {
      try {
        Option(logFile.getParent).foreach(Files.createDirectories(_))
        val h = new FileHandler(logFile.toString, true)
        h.setEncoding("UTF-8")
        h.setFormatter(LineFormatter)
        h.setLevel(Level.ALL)
        lg.addHandler(h)
      } catch {
        // unwritable file/dir: degrade to console-only, like the
        // reference's None-handler path
        case _: java.io.IOException | _: SecurityException => ()
      }
    }
    lg
  }
}
