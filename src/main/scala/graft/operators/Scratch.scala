package graft.operators

/** Shared scratch-reclamation helper for the bounded-scratch sliced
  * operators ([[Dedup.nearDupPairsBandedSliced]],
  * [[Dedup.contaminationOverlapSliced]], [[Dedup.duplicateSpansSliced]],
  * [[TextOps.lmScoreSliced]]): each slice ends with a GC hint so the
  * ContextCleaner's weak references fire and the slice's shuffle files
  * are deleted BEFORE the next slice starts — that bound on peak
  * scratch is the whole point of slicing (measured ~60 GB of spill per
  * unsliced build stride at sf1000).
  */
private[graft] object Scratch {

  /** `System.gc()` only when the JVM heap shows real pressure
    * (used > half of max). At ladder scale the slice jobs grow the
    * local-mode heap toward -Xmx and the hint fires exactly as before;
    * at bench scale (sf0.1, tens of MB per slice) a full GC costs
    * 0.1–0.5 s per slice against zero scratch worth reclaiming —
    * measured 5 unconditional GCs inside the timed
    * `neardup_pairs_banded_sliced` run (round 13). Periodic cleanup
    * still backstops the skipped case (`spark.cleaner.periodicGC
    * .interval`, default 30 min).
    */
  def gcIfPressured(): Unit = {
    val rt = Runtime.getRuntime
    val used = rt.totalMemory() - rt.freeMemory()
    if (used * 2 > rt.maxMemory()) System.gc()
  }
}
