package graft.streaming

import graft.sources.ConcurrentPublishException

/** The lost-creation-race fold-in shared by every cow streaming sink
  * (F17/F18/F20 and the keyed update sink).
  *
  * A first micro-batch that finds no table tries to CREATE it; a rival
  * writer creating concurrently surfaces in exactly two spellings, and both
  * mean the same thing — the table now exists, so the batch must FOLD IN
  * (merge/append) instead of failing the streaming query:
  *   - [[ConcurrentPublishException]]: the rival won between our staging
  *     write and the CAS publish;
  *   - `create`'s own `IllegalArgumentException("… already exists")`: the
  *     rival won between the caller's version check and create's require.
  *
  * Centralized so a change to create's race signaling (message wording,
  * exception type) has ONE place to update — the message match below is
  * pinned by spec against `FileCow.create`'s actual wording.
  */
private[streaming] object CowRace {

  def createOrFoldIn(create: => Unit)(foldIn: => Unit): Unit =
    try create
    catch {
      case _: ConcurrentPublishException => foldIn
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("already exists") =>
        foldIn
    }
}
