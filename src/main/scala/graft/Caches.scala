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
