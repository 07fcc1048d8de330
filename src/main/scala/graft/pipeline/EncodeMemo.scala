package graft.pipeline

/**
 * Per-executor memo for pure word → encoding functions (BPE merge
 * replay, unigram Viterbi, greedy match): word frequencies are Zipfian,
 * so re-segmenting every OCCURRENCE wastes almost every invocation —
 * memoized, encode cost is proportional to DISTINCT words per executor.
 *
 * Ship one instance per encode invocation via broadcast: the captured
 * segmenter (and whatever model it closes over) serializes once, the
 * transient map materializes per executor, is shared by all its tasks,
 * and dies with the broadcast. Each instance is bound to exactly ONE
 * segmenter, so distinct encode regimes can never serve each other's
 * cached tokenizations. Entries are capped — beyond the cap the
 * function computes directly, so correctness never depends on the
 * cache (the segmenter must be a pure function of the word).
 */
private[pipeline] final class EncodeMemo(f: String => String)
    extends Serializable {
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MaxEntries = 1 << 20
  def apply(w: String): String = {
    val hit = memo.get(w)
    if (hit != null) return hit
    val v = f(w)
    if (memo.size < MaxEntries) memo.put(w, v)
    v
  }
}
