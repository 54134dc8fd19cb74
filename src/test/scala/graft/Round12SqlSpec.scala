package graft

import org.apache.spark.sql.functions._
import graft.queries.{Q19dAnnIvf, Q19eAnnIvfStore, Q70bSemanticDedupStore, Q70SemanticDedup}

/** Round 12 — SQL front door over the PERSISTED STORES (VERDICT r11
  * item 10): the round-11 store families' serve paths, hand-written
  * as `spark.sql` TEXT over the bound store tables + fixture views,
  * row-for-row equal to their DataFrame twins. SqlParitySpec
  * auto-sweeps every Spark-parseable oracle; SqlFrontDoorSpec covers
  * the headline batch shapes; this closes the store-serve surface a
  * SQL user would actually hit: "query the ANN index by text",
  * "dedup a delta against the semantic store by text" — both through
  * the registered native function (`graft_dot`) with no Scala.
  *
  * The remaining non-twinned surface is classified, with reasons, in
  * the final test — every SparkEntry query must fall in exactly one
  * documented class, so a new query forces a conscious
  * classification rather than silently joining an unchecked pile. */
class Round12SqlSpec extends SparkSpec {

  private def canonRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("q19e: the IVF index probe runs as pure SQL text over the store tables") {
    Engine.registerTables(spark, sf01)
    val (centT, listsT) = Q19eAnnIvfStore.ensureStore(spark, sf01)
    val sql = s"""
      WITH q AS (SELECT cast(embedding as array<double>) AS qe
                 FROM embeddings WHERE vec_id = 0),
      ranked AS (
        SELECT c.list_id,
          row_number() OVER (ORDER BY
            aggregate(zip_with(c.centroid, q.qe, (x, y) -> (x - y) * (x - y)),
              0D, (acc, v) -> acc + v) ASC, c.list_id ASC) AS rk
        FROM $centT c CROSS JOIN q),
      cand AS (
        SELECT l.vec_id, l.embedding
        FROM $listsT l JOIN ranked ON l.list_id = ranked.list_id
        WHERE ranked.rk <= ${Q19dAnnIvf.NProbe} AND l.vec_id <> 0),
      ex AS (
        SELECT vec_id, pos, cast(x as decimal(18,10)) AS x
        FROM cand LATERAL VIEW posexplode(embedding) t AS pos, x),
      qx AS (
        SELECT pos, cast(x as decimal(18,10)) AS qx
        FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos, x
        WHERE vec_id = 0),
      qn AS (SELECT sum(qx * qx) AS qn2 FROM qx),
      dots AS (
        SELECT ex.vec_id, sum(ex.x * qx.qx) AS dot, sum(ex.x * ex.x) AS n2
        FROM ex JOIN qx ON ex.pos = qx.pos GROUP BY ex.vec_id)
      SELECT vec_id,
        round(cast(dot as double) /
          (sqrt(cast(n2 as double)) * sqrt(cast(qn2 as double))), 4) AS cosine
      FROM dots CROSS JOIN qn
      ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """
    val viaSql = canonRows(spark.sql(sql))
    val viaDf = canonRows(Q19eAnnIvfStore.run(spark, sf01))
    assert(viaSql === viaDf)
  }

  test("q70b: the semantic-store delta dedup runs as pure SQL text over the store tables") {
    Engine.registerTables(spark, sf01)
    val (centT, assignT) = Q70bSemanticDedupStore.ensureStore(spark, sf01)
    val split =
      "CASE WHEN locate(substring(md5(cast(vec_id as string)), 32, 1), " +
        "'0123456789abcdef') - 1 < 13 THEN 'train' ELSE 'test' END"
    val sql = s"""
      WITH delta AS (
        SELECT vec_id, embedding, graft_dot(embedding, embedding) AS n2
        FROM embeddings WHERE ($split) = 'test'),
      assigned AS (
        SELECT vec_id, embedding, n2, -m.ncid AS cluster
        FROM (
          SELECT d.vec_id, d.embedding, d.n2,
            max(named_struct(
              'cos', graft_dot(d.embedding, c.ce) / (sqrt(d.n2) * sqrt(c.cn2)),
              'ncid', -c.cid)) AS m
          FROM delta d CROSS JOIN $centT c
          GROUP BY d.vec_id, d.embedding, d.n2)),
      cands AS (
        SELECT a.vec_id, 0 AS pri, s.base_id
        FROM assigned a JOIN $assignT s ON a.cluster = s.cluster
        WHERE graft_dot(a.embedding, s.be) / (sqrt(a.n2) * sqrt(s.bn2))
              >= ${Q70SemanticDedup.Tau}),
      best AS (
        SELECT vec_id, min(named_struct('pri', pri, 'base_id', base_id)) AS b
        FROM (SELECT vec_id, pri, base_id FROM cands
              UNION ALL
              SELECT vec_id, 1 AS pri, cast(null as bigint) AS base_id
              FROM assigned)
        GROUP BY vec_id)
      SELECT best.vec_id, assigned.cluster,
        CASE WHEN best.b.pri = 0 THEN 'dup' ELSE 'new' END AS verdict,
        best.b.base_id AS dom_id
      FROM best JOIN assigned ON best.vec_id = assigned.vec_id
      ORDER BY best.vec_id
    """
    val viaSql = canonRows(spark.sql(sql))
    val viaDf = canonRows(Q70bSemanticDedupStore.run(spark, sf01))
    assert(viaSql === viaDf)
  }

  /** The pinned TOTAL classification of the SQL-front-door surface:
    * every SparkEntry query falls in exactly one class. A new query
    * fails this test until it is consciously classified — there is
    * no silent "not covered" pile. */
  test("SQL front-door coverage: every query classified, with reasons") {
    // (A) auto-swept: the DuckDB oracle text is ALSO valid Spark SQL;
    // SqlParitySpec executes it against the DataFrame twin per run.
    val autoSwept = Set(
      "q5_semi_anti_join", "q7_window_rank_orders", "q7b_topk_per_key_agg",
      "q11_set_ops", "q12_distinct_agg", "q12c_hll_sketch_union",
      "q38_window_distribution", "q39_fuzzy_match",
      "q50_pii_redact") // parses; runtime-excluded (regexp flags arg)
    // (B) hand-written Spark-SQL twins with row-for-row parity:
    // SqlFrontDoorSpec (batch shapes) + this spec (store serves).
    val sqlTwinned = Set(
      "q2_agg_pricing_summary", "q3_join_revenue_by_nation",
      "q18_dedup_exact", "q1_inverted_index", "q1b_inverted_index_udaf",
      "q1c_inverted_index_native", "q32_asof_join", "q32b_asof_join_native",
      "q66_scd2_dimension", "q67_rolling_window", "q25d_image_neardup",
      "q70_semantic_dedup", "q64b_bpe_encode",
      "q19e_ann_ivf_store", "q70b_semantic_dedup_store")
    // (C) SQL-expressible, not individually twinned: single-plan
    // relational/HOF shapes whose Spark-SQL spelling is a mechanical
    // dialect translation of the DuckDB oracle (every construct —
    // windows, grouping sets, HOF lambdas, banded joins, decimal
    // chains, store-table reads — has a parity-pinned representative
    // in A/B). The DuckDB oracle itself remains the correctness gate.
    val sqlExpressible = Set(
      "q4_broadcast_join_brand", "q6_topk_customers",
      "q8_window_running_sum", "q9_rollup_orders", "q10_cube_lineitem",
      "q12b_approx_distinct", "q13_scalar_functions", "q14_json_extract",
      "q15_array_hof_stats", "q16_range_join_shipping", "q17_sessionize",
      "q18b_dedup_minhash", "q18c_dedup_simhash", "q18d_dedup_ngram",
      "q18e_dedup_embedding", "q19_similarity_topk", "q19b_ann_lsh",
      "q19f_ann_rebalance", "q20_top_terms_per_lang", "q21_language_id",
      "q22_quality_score", "q23_token_count", "q24_fingerprint",
      "q26_tfidf_top_terms", "q27_outer_join", "q28_pivot",
      "q29_scalar_subquery", "q30_percentiles", "q30b_approx_percentiles",
      "q31_map_json", "q33_grouping_sets", "q34_salted_skew_join",
      "q35_unpivot_measures", "q36_stats_moments", "q37_date_spine",
      "q40_train_test_split", "q41_argmax_per_group", "q42_corpus_clean",
      "q42b_corpus_clean_full", "q43_top_bigrams", "q44_source_cap",
      "q45_token_packing", "q46_decontaminate", "q46b_decontaminate_dfcap",
      "q47_repetition", "q48_mix_sample", "q49_cross_doc_paragraphs",
      // q46c (round 13): q46's semantics behind a lossless bloom
      // prefilter (scalar subquery + graft_bloom_contains) — the
      // oracle is q46's own.
      "q46c_decontaminate_bloom",
      "q51_url_domains", "q52_mix_interleave", "q53_token_entropy",
      "q54_lm_perplexity", "q55_classifier_score", "q56_chunk_windows",
      "q57_delta_dedup", "q57b_delta_dedup_store", "q58_training_shards",
      "q60_repeated_spans", "q60b_longest_shared_spans",
      "q60c_excise_duplicates", "q60d_excise_store", "q61_gopher_rules",
      "q61b_gopher_repetition",
      "q63_gap_fill", "q64d_bpe_encode_local", "q64e_bpe_encode_store",
      "q64f_vocab_drift", "q65_incremental_stats", "q72_html_extract",
      "q72b_warc_extract", "q73_unicode_normalize",
      // q64g: the DuckDB oracle is a mechanical relational unroll of the
      // greedy longest-piece fold (bounded steps) — squarely class C.
      "q64g_wordpiece_encode",
      // q64i (round 13): encode = dictionary join; the oracle's Viterbi
      // unroll is the same bounded-steps technique as q64g's.
      "q64i_unigram_encode",
      // q64j (round 13): q64g's greedy fold as a fixed-depth relational
      // unroll over the piece store — literally the oracle's own shape.
      "q64j_wordpiece_encode_store",
      // q64k (round 13): Viterbi DP as the same fixed-depth relational
      // unroll over the unigram score store.
      "q64k_unigram_encode_store",
      // q18g: the serve is one groupBy over the persisted labels table
      // (the q19e/q70b store-serve shape, without even a join).
      "q18g_dedup_labels_store",
      // q74/q74b (round 13): BM25 is joins + a window over exact
      // integer stats with a sorted float fold — the oracle (shared
      // by both tiers) is plain relational SQL.
      "q74_bm25_retrieval", "q74b_bm25_store",
      // q75 (round 13): RRF = two ranked CTE arms full-outer-joined
      // with a two-term reciprocal sum — plain relational SQL.
      "q75_hybrid_rrf",
      // q76/q76b (round 13): triplet mining = the q18b pair CTEs +
      // hashed bucket (or cosine-candidate) joins + one anti-join +
      // a pick window — relational.
      "q76_contrastive_triplets", "q76b_hard_negatives",
      "q76c_triplets_backfilled",
      // q74c (round 14): phrase match = pruned store scan + term-index
      // join + one aggregation + an array adjacency predicate + a rank
      // window — plain relational SQL (its oracle is exactly that).
      "q74c_phrase_store",
      // q74d (round 14): phrase-as-virtual-term = q74c's occurrence
      // aggregation unioned into q74's relational Okapi chain.
      "q74d_bm25_phrase_boost",
      // q74e (round 14): MinDist proximity = a cross-term occurrence
      // min + q74's Okapi chain + one quantized-log boost — relational.
      "q74e_bm25_proximity_boost",
      // q77 (round 14): DSIR = two hashed-bigram count rollups + a
      // quantized-log join + a top-K — plain relational SQL.
      "q77_dsir_selection",
      // q77b (round 14): q77's chain + q45's cumulative shard window
      // over the K-row selection — relational.
      "q77b_dsir_packing",
      // q64l (round 14): WordPiece drift = q64g's bounded greedy-fold
      // unroll (class-C technique) + per-(lang, split) rollups.
      "q64l_wordpiece_drift",
      // q75b (round 14): both arms are store serves whose probed list
      // ids / query terms are driver-known literals (the q19e twin's
      // shape) fused by q75's relational RRF — SQL-expressible over
      // the store tables.
      "q75b_hybrid_rrf_store",
      // q74f (round 15): q74b's serve over a driver-provided query
      // table — the batch's terms become literals (driver-scale by
      // contract), the rest is q74's relational chain.
      "q74f_bm25_query_table",
      // q75c (round 15): three exact relational arms (q74b serve +
      // q75's cosine + q74e's proximity chain) fused by RRF — its
      // oracle is pure SQL.
      "q75c_hybrid_rrf3",
      // q75d (round 16): q75c's three relational arms parameterized
      // by the caller's (query_id, word)/(query_id, qv) tables — the
      // batch is driver-scale by contract, so the SQL spelling is
      // q75c's with the batch as VALUES tables.
      "q75d_fusion_query_tables",
      // q77c (round 15): q77's relational chain with the target as a
      // second gram-count rollup (full-outer bucket alignment).
      "q77c_dsir_target",
      // q77d (round 16): q77's chain + a min-over-top-K threshold CTE
      // and a per-doc compare — the store serve is plain SQL over the
      // persisted λ/threshold tables.
      "q77d_dsir_store",
      // q19h (round 15): exact batch cosine = q75's semantic-arm
      // relational shape with a VALUES-style probe table.
      "q19h_ann_query_batch",
      // q64o (round 15): the WordPiece gate measures through q64g's
      // bounded greedy-fold unroll (q64l's class-C technique) + one
      // per-lang rollup against the frozen stats table.
      "q64o_wordpiece_drift_gated_store",
      // q64q (round 17): q64o's measurement on the deterministic
      // md5-nibble doc sample — the same class-C encode chain, one
      // extra hash filter + the envelope-flag audit join.
      "q64q_wordpiece_drift_gate_sampled")
    // (D) driver-coordinated iteration / per-partition accumulators:
    // no single SQL statement computes these (a pagerank loop, BPE
    // merge loops, two-pass prefix sums, Misra-Gries coupled
    // counters, label-propagation convergence).
    val driverIteration = Set(
      "q59_graph_pagerank", "q62_vocab_coverage", "q68_heavy_hitters",
      "q69_score_deciles", "q64_bpe_merges", "q64c_bpe_merges_local",
      "q18f_dedup_clusters",
      // q64h (round 13): the hard-EM loop collects a vocab-sized count
      // table per round to rebuild the quantized score map.
      "q64h_unigram_vocab",
      // q64m (round 14): drift over q64h's train-split EM — same loop.
      "q64m_unigram_drift",
      // q64n (round 14): the gate trains via q64c's driver-local
      // learner before the relational measurement.
      "q64n_bpe_drift_gated_store",
      // q78 (round 14): the console composes q64f (driver-local
      // learn) and q64m (EM loop) — inherits their class.
      "q78_drift_console",
      // q64p (round 15): the Unigram gate's store build runs q64h's
      // hard-EM loop (the q64m/q64n posture); the decide pass itself
      // is the relational DP, but the entry's ensure is the loop.
      "q64p_unigram_drift_gated_store")
    // (E) spark.ml training inside the plan: SQL has no spelling for
    // the fit (serve paths ARE SQL-twinned where persisted — q19e,
    // q70b above).
    val mlTrained = Set(
      "q19c_ann_sparkml", "q19d_ann_ivf", "q70c_semantic_dedup_trained",
      "q55b_classifier_trained",
      // q19g (round 13): M seeded KMeans codebooks inside the build.
      "q19g_ann_pq")
    // (F) binary-codec mapPartitions (ImageIO/PCM decode) feeding the
    // relational tail — the decode step has no SQL form; the banded
    // tail's SQL shape is twinned via q25d.
    val codecBound = Set(
      "q25_multimodal_features", "q25b_audio_features",
      "q25c_image_features", "q25e_video_scenes",
      "q25f_image_dedup_store", "q25g_audio_neardup",
      "q25h_audio_dedup_store", "q71_multimodal_curation",
      // q25i/q25j (round 13): the video demux+decode+temporal-pool
      // fingerprint is an ImageIO mapPartitions pass, like the rest
      // of the q25 family; the banded tail's SQL shape is twinned
      // via q25d.
      "q25i_video_neardup", "q25j_video_dedup_store",
      // q25k (round 19): the lossy JPEG encode+decode is an ImageIO
      // mapPartitions pass; only the codec-invariant surface is
      // relational.
      "q25k_jpeg_lossy",
      // q58b (round 19): the shard-file WRITE (partitioned text via
      // the staged committer) is the non-SQL step; the manifest
      // aggregation itself is relational and oracle-twinned.
      "q58b_shard_export")
    // (G) streaming: driven by writeStream/foreachBatch, not sql()
    // text (Spark streaming SQL would need STREAM table refs the
    // engine deliberately keeps behind the DataFrame API).
    val streaming = SparkEntry.all.map(_.name)
      .filter(_.matches("^s\\d+[a-z]?_.*")).toSet

    val classes = Seq(
      "autoSwept" -> autoSwept, "sqlTwinned" -> sqlTwinned,
      "sqlExpressible" -> sqlExpressible,
      "driverIteration" -> driverIteration, "mlTrained" -> mlTrained,
      "codecBound" -> codecBound, "streaming" -> streaming)
    val allNames = SparkEntry.all.map(_.name).toSet
    val union = classes.flatMap(_._2).toSet
    val unclassified = allNames -- union
    assert(unclassified.isEmpty,
      s"unclassified queries (add to a class, with its reason): " +
        unclassified.toSeq.sorted.mkString(", "))
    val phantom = union -- allNames
    assert(phantom.isEmpty,
      s"classified names that no longer exist: ${phantom.toSeq.sorted.mkString(", ")}")
    classes.combinations(2).foreach { case Seq((na, a), (nb, b)) =>
      val overlap = a intersect b
      assert(overlap.isEmpty, s"$na ∩ $nb: ${overlap.toSeq.sorted.mkString(", ")}")
    }
  }
}
