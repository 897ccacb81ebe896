package graft.notify

/** Notification sinks (SURVEY §2-A D1-D4; reference main.py:575-627).
  *
  * Success / error / no-data reporting is a first-class output of the
  * reference pipeline — every failure path converges on it
  * (main.py:488-511). The engine emits through this trait from the stream
  * driver; `send` is the transport (the reference's Gmail send, D1) and the
  * three typed notifications mirror the reference's subject/body semantics.
  * Transport is pluggable: tests and local runs use [[LogNotifier]]; a
  * production deployment would supply an SMTP/webhook implementation.
  */
trait Notifier {

  /** D1: the transport (reference send_email, main.py:575-588). */
  def send(to: String, subject: String, body: String): Unit

  def recipients: String

  /** D2: success with inserted-row count (reference main.py:591-598). */
  def notifySuccess(fileName: String, insertedRows: Long): Unit =
    send(recipients,
      s"SUCCESS: CTB File '$fileName' Processing Successful",
      s"Successfully processed '$fileName' and inserted $insertedRows rows into the sink.\n\n" +
        "The file has been archived and acknowledged at the source.")

  /** D3: error with context + full error report (reference main.py:601-620). */
  def notifyError(context: String, errorDetails: String): Unit =
    send(recipients,
      s"ERROR: CTB Processing Failed - $context",
      s"An error occurred during CTB file processing.\n\nDetails:\n$errorDetails\n\n" +
        "The problematic file (if any) should be in the 'Failed' folder.")

  /** D4: nothing found / nothing processed (reference main.py:623-627,679-685). */
  def notifyNoData(query: String): Unit =
    send(recipients,
      "INFO: No CTB Documents Found",
      s"No CTB documents matching the query '$query' were processed during this run.")
}

/** In-memory + stdout notifier: the local transport for tests and driver
  * logs (the engine has no mail credentials in this environment).
  */
final class LogNotifier(val recipients: String = "ops@localhost") extends Notifier {
  final case class Sent(to: String, subject: String, body: String)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Sent]
  def send(to: String, subject: String, body: String): Unit = synchronized {
    buf += Sent(to, subject, body)
    println(s"[notify] to=$to subject=$subject")
  }
  def sent: Seq[Sent] = synchronized(buf.toList)
}
