package graft

/**
 * One sweep for every keyed cache the engine keeps per (session, input,
 * params): basket tables, fitted FP-Growth models, shingle indexes,
 * bigram LMs, BPE merge tables, and live CC checkpoints. Long-lived
 * sessions that iterate over many corpora call this between corpora to
 * release executor storage and driver metadata in one place instead of
 * tracking six registries; everything re-materializes lazily on next
 * use, so a sweep is always safe, never required for correctness.
 */
object Caches {

  /** Lazily-evaluated cache cell for `ConcurrentHashMap.computeIfAbsent`
    * callers whose body is a multi-second Spark job: computeIfAbsent
    * holds the map's bin lock for the whole mapping function, so
    * computing the value INSIDE it blocks every unrelated lookup that
    * hashes to the same bin for the job's duration (and a re-entrant
    * mine on the same key would deadlock on the bin). Mapping to a cell
    * keeps the critical section to an allocation; the Spark job runs on
    * first [[value]] OUTSIDE the map lock. Same-key callers serialize on
    * the cell's own lazy-init monitor — the intended wait — while other
    * keys proceed. */
  final class Memo[T](body: => T) { lazy val value: T = body }

  def clearAll(): Unit = {
    Tables.clearCaches()
    FpmQueries.clearCaches()
    RelQueries.clearCaches()
    graft.pipeline.Dedup.clearCaches()
    graft.pipeline.Signals.clearCaches()
    graft.pipeline.Similarity.clearCaches()
    graft.pipeline.Bpe.clearCaches()
    graft.pipeline.Unigram.clearCaches()
    graft.pipeline.Curation.clearCheckpoints()
    Fs.sweepStaged()
  }
}
