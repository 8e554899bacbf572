package graft.ops

import org.apache.spark.sql.SparkSession

/** Registry of the ONE-TIME shared-store builds behind the query
  * families, as first-class schedulable units (VERDICT r8 #1).
  *
  * Round 8's bench billed each shared store's build to whichever family
  * member happened to run first, so the committed cost cache said those
  * queries cost 0.07–0.14s; the next round's cheapest-first sweep then
  * ordered them early and paid ~82s of cold builds inside "cheap"
  * entries — 49 of 112 queries budget-skipped. This registry lets the
  * bench (a) pre-build a store as its own `build:<name>` cost entry,
  * (b) order work by MARGINAL query cost, and (c) skip a family's
  * queries honestly when their build no longer fits the budget, instead
  * of silently paying it inside one sibling's timing.
  *
  * Every `run` spelling delegates to the SAME memoized builder the
  * query bodies call — warming and querying cannot drift. `prereqs`
  * express the dedup chain (sig → lsh → strong → cc / cluster_store):
  * warming a link first attributes each link's marginal cost to its own
  * entry rather than folding the whole chain into the deepest consumer.
  */
object SharedBuilds {
  /** `cacheTag`: the [[StoreCache]] tag this build's store directory is
    * disk-cached under across RUNS (Bench enables the cache; Verify
    * never does) — None for the memoized-DataFrame builds, whose
    * artifacts are in-memory tables rather than store directories.
    * `cacheExtra`: that entry's shape key (task identity + layout,
    * [[StoreCache.keyOf]]) — the bench planner MUST probe
    * `isCached(tag, sf, cacheExtra)` with it: a bare `isCached(tag)`
    * sees a stale pre-layout-change entry as a 2s copy-cost hit that
    * `restore` then rejects into an unplanned cold build (review r15). */
  final case class Build(
      name: String,
      queries: Set[String],
      prereqs: Seq[String],
      cacheTag: Option[String],
      cacheExtra: String,
      isBuilt: (SparkSession, String) => Boolean,
      run: (SparkSession, String) => Unit)

  /** Every cached store's `extra`, keyed by tag — resolved at registry
    * init, so a cacheTag with no registered extra fails the process
    * loudly instead of mis-planning silently. */
  private val extras: Map[String, String] =
    IndexQueries.cacheExtras ++ IncrementalIndexes.cacheExtras

  private def b(name: String, queries: Seq[String], prereqs: Seq[String] = Nil,
      cacheTag: Option[String] = None)(
      isBuilt: (SparkSession, String) => Boolean)(
      run: (SparkSession, String) => Unit): Build =
    Build(name, queries.toSet, prereqs, cacheTag, cacheTag.fold("")(extras),
      isBuilt, run)

  val all: Seq[Build] = Seq(
    // Read-only / built-and-updated Executer stores (IndexQueries).
    b("custbynation",
      Seq("q40_mr_index_build", "q43_mr_delete_key", "q44_mr_point_query",
        "q45_mr_contributors", "q62_mr_join_enrich", "q65_mr_multi_point",
        "q99_sql_view_read", "q118_reshape_layout", "q120_document_ids",
        "q123_external_sql_view"),
      cacheTag = Some("custbynation"))(
      (_, dir) => IndexQueries.storeBuilt("CustByNation", dir))(
      (s, dir) => IndexQueries.warmStore("CustByNation", s, dir)),
    b("ordersmultitag",
      Seq("q42_mr_multi_emit", "q56_mr_doc_contributions"),
      cacheTag = Some("ordersmultitag"))(
      (_, dir) => IndexQueries.storeBuilt("OrdersMultiTag", dir))(
      (s, dir) => IndexQueries.warmStore("OrdersMultiTag", s, dir)),
    b("ordersbypriority",
      Seq("q41_mr_index_update", "q41b_mr_time_travel",
        "q104_changed_keys", "q104b_changed_keys_refetch",
        "q107_cdc_diff", "q106c_cdc_rollup_direct",
        "q114_external_read", "q115_external_changed_keys",
        "q116_external_diff", "q119_compacted_read",
        "q122_external_contributors", "q124_external_contributions"),
      cacheTag = Some("ordersbypriorityupdated"))(
      (_, dir) => IndexQueries.storeBuilt("OrdersByPriorityUpdated", dir))(
      (s, dir) => IndexQueries.warmStore("OrdersByPriorityUpdated", s, dir)),
    // q111's store: the q41 store branched at its pre-update generation
    // (r15: a file copy, not a rebuild — VERDICT r14 #2), hit by a bad
    // batch, rolled back, corrected — the mutation cycle runs once
    // here; the query body only reads.
    b("ordersrolledback", Seq("q111_rollback_update"),
      prereqs = Seq("ordersbypriority"), cacheTag = Some("ordersrolledback"))(
      (_, dir) => IndexQueries.storeBuilt("OrdersRolledBack", dir))(
      (s, dir) => IndexQueries.warmStore("OrdersRolledBack", s, dir)),
    // q112's store: the q41 store forked at its pre-update generation
    // (a read of one immutable generation — the source is a prereq but
    // is never mutated), then updated with the branch's own batch.
    b("ordersbranch", Seq("q112_branch_update"),
      prereqs = Seq("ordersbypriority"), cacheTag = Some("ordersbranch"))(
      (_, dir) => IndexQueries.storeBuilt("OrdersBranch", dir))(
      (s, dir) => IndexQueries.warmStore("OrdersBranch", s, dir)),
    // q117's store: built and updated entirely through the Structured
    // Streaming front-end (two checkpointed drains inside the one-time
    // build; the query body only reads).
    b("streamingingest", Seq("q117_streaming_ingest"),
      cacheTag = Some("streamingingest"))(
      (_, dir) => IndexQueries.storeBuilt("StreamingIngest", dir))(
      (s, dir) => IndexQueries.warmStore("StreamingIngest", s, dir)),
    // The maintained-join chain (q121): both upstreams build + churn in
    // their own entries; the join store's build is the bootstrap sync +
    // one steady-state poll over both CDC feeds.
    b("ordersbycust", Seq("q121_join_index"),
      cacheTag = Some("ordersbycust"))(
      (_, dir) => IndexQueries.storeBuilt("OrdersByCust", dir))(
      (s, dir) => IndexQueries.warmStore("OrdersByCust", s, dir)),
    b("custnation", Seq("q121_join_index"),
      cacheTag = Some("custnationidx"))(
      (_, dir) => IndexQueries.storeBuilt("CustNationIdx", dir))(
      (s, dir) => IndexQueries.warmStore("CustNationIdx", s, dir)),
    b("joinidx", Seq("q121_join_index"),
      prereqs = Seq("ordersbycust", "custnation"), cacheTag = Some("joinidx"))(
      (_, dir) => IndexQueries.storeBuilt("JoinIdx", dir))(
      (s, dir) => IndexQueries.warmStore("JoinIdx", s, dir)),
    // The chained downstream stage (q106): its build IS a CDC sync off
    // the upstream store, so the upstream is a prereq link.
    b("cdcbands", Seq("q106_cdc_pipeline"),
      prereqs = Seq("ordersbypriority"), cacheTag = Some("cdcbands"))(
      (_, dir) => IndexQueries.storeBuilt("CdcBands", dir))(
      (s, dir) => IndexQueries.warmStore("CdcBands", s, dir)),
    // q106b's bisection twin: the same chain with a recompute-only
    // downstream (q106c needs no build of its own — it reads the
    // upstream store directly).
    b("cdcbandsrecompute", Seq("q106b_cdc_pipeline_recompute"),
      prereqs = Seq("ordersbypriority"), cacheTag = Some("cdcbandsrecompute"))(
      (_, dir) => IndexQueries.storeBuilt("CdcBandsRecompute", dir))(
      (s, dir) => IndexQueries.warmStore("CdcBandsRecompute", s, dir)),
    // q106d's diff-driven twin: the steady-state sync consumes
    // diffSince's feed instead of the refetch protocol.
    b("cdcbandsdiff", Seq("q106d_cdc_pipeline_diff"),
      prereqs = Seq("ordersbypriority"), cacheTag = Some("cdcbandsdiff"))(
      (_, dir) => IndexQueries.storeBuilt("CdcBandsDiff", dir))(
      (s, dir) => IndexQueries.warmStore("CdcBandsDiff", s, dir)),
    // The third pipeline stage (q108): a CDC consumer of the q106
    // store, so the band chain is its prereq link.
    b("cdctotals", Seq("q108_cdc_pipeline_3stage"),
      prereqs = Seq("cdcbands"), cacheTag = Some("cdctotals"))(
      (_, dir) => IndexQueries.storeBuilt("CdcTotals", dir))(
      (s, dir) => IndexQueries.warmStore("CdcTotals", s, dir)),

    // The maintained-index families' pristine base stores (each query
    // invocation still pays clone + update — its marginal cost).
    b("base-q29", Seq("q29_minhash_index_update"), cacheTag = Some("base-q29"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q29", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q29", s, dir)),
    b("base-q64", Seq("q64_winnow_index_update"), cacheTag = Some("base-q64"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q64", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q64", s, dir)),
    b("base-q37", Seq("q37_ivf_cell_index_update"), cacheTag = Some("base-q37"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q37", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q37", s, dir)),
    b("base-q77", Seq("q77_shingle_freq_index_update"), cacheTag = Some("base-q77"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q77", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q77", s, dir)),
    b("base-q97", Seq("q97_simhash_index_update"), cacheTag = Some("base-q97"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q97", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q97", s, dir)),
    b("base-q91", Seq("q91_ivf_centroid_index_update"), cacheTag = Some("base-q91"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q91", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q91", s, dir)),
    b("base-q78", Seq("q78_decontaminate_index_update"), cacheTag = Some("base-q78"))(
      (_, dir) => IncrementalIndexes.baseBuilt("q78", dir))(
      (s, dir) => IncrementalIndexes.warmBase("q78", s, dir)),
    // q89's whole one-time pipeline (base build + clone + update) is
    // memoized and shared by q89/q89b, so it is ONE build entry; the
    // Phases lines decompose it in the summary's phases map.
    b("q89", Seq("q89_length_hist_index_update", "q89b_hist_drift"),
      cacheTag = Some("q89"))(
      (_, dir) => IncrementalIndexes.q89Built(dir))(
      (s, dir) => IncrementalIndexes.warmBase("q89", s, dir)),

    // The dedup chain, one entry per link.
    b("sig", Seq("q26_minhash_signatures", "q86_fuzzy_decontaminate"))(
      (s, dir) => Dedup.chainBuilt("sig", s, dir))(
      (s, dir) => { Dedup.sigTables(s, dir); () }),
    b("lsh", Seq("q27_lsh_candidate_pairs", "q90_cross_source_dups"),
      prereqs = Seq("sig"))(
      (s, dir) => Dedup.chainBuilt("lsh", s, dir))(
      (s, dir) => { Dedup.lshCandidatePairs(s, dir); () }),
    b("strong", Seq("q92_incremental_cluster_assign"),
      prereqs = Seq("lsh"))(
      (s, dir) => Dedup.chainBuilt("strong", s, dir))(
      (s, dir) => { Dedup.strongPairs(s, dir); () }),
    b("cc",
      Seq("q59_neardup_clusters", "q80_dedup_manifest",
        "q59c_recluster_refresh",
        "q81_leakage_safe_split", "q93_split_token_budget",
        "q102c_bpe_split_budget"),
      prereqs = Seq("strong"))(
      (s, dir) => Dedup.chainBuilt("cc", s, dir))(
      (s, dir) => { Dedup.neardupClusters(s, dir); () }),
    b("cluster_store",
      Seq("q59b_cluster_index_update", "q59c_recluster_refresh",
        "q92_incremental_cluster_assign"),
      prereqs = Seq("strong"))(
      (s, dir) => Dedup.chainBuilt("cluster_store", s, dir))(
      (s, dir) => { Dedup.clusterIndex(s, dir); () }),

    // Memoized shared tables (Curation / TextOps).
    b("freq3",
      Seq("q69_dup_shingle_rate", "q84_source_quality_filter",
        "q87_curation_funnel", "q96_quality_rank"))(
      (s, dir) => Curation.freq3Built(s, dir))(
      (s, dir) => { Curation.shingleFreq3(s, dir); () }),
    b("fluency", Seq("q83_bigram_fluency", "q96_quality_rank"))(
      (s, dir) => Curation.fluencyBuilt(s, dir))(
      (s, dir) => { Curation.bigramFluency(s, dir); () }),
    b("winnow", Seq("q53_winnow_fingerprints", "q94_winnow_matches"))(
      (s, dir) => TextOps.winnowBuilt(s, dir))(
      (s, dir) => { TextOps.winnowFpTable(s, dir); () }))

  val byName: Map[String, Build] = all.map(x => x.name -> x).toMap

  /** The builds `query` consumes, with transitive prereqs first —
    * running them in this order gives each link its marginal cost. */
  def depsOf(query: String): Seq[Build] = {
    val direct = all.filter(_.queries.contains(query))
    val out = collection.mutable.LinkedHashSet.empty[String]
    def add(n: String): Unit = {
      val bb = byName(n)
      bb.prereqs.foreach(add)
      out += n
    }
    direct.foreach(d => add(d.name))
    out.toSeq.map(byName)
  }
}
