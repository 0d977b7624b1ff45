package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. The driver hash-compares the two at
  * sf0.01 (`CORRECTNESS_r{N}.json`). Queries without an oracle get a
  * weaker rows-only check.
  *
  * Cache contract: queries may `persist()` intermediates that several
  * branches of their own plan consume; they do NOT unpersist (the
  * returned DataFrame is lazy — the persisted blocks are only
  * populated when the caller executes it). Every harness that runs
  * registry queries (Bench, Verify, QueryProbe) MUST call
  * `spark.sqlContext.clearCache()` after consuming each query's
  * result, or a long session accumulates every query's leftover
  * blocks. */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central registry — every operator from SURVEY.md §2 plus the
  * training-data-pipeline extensions registers here; `SparkEntry`
  * exposes it to the driver harness. */
object Registry {

  /** Names of the registered artifact BUILD-STEP queries (each one
    * force-materializes a derived structure other queries consume) —
    * the set `Bench`'s pre-build pass runs. Kept beside the registry
    * so a new artifact's builder gets added here in the same commit;
    * a builder missing from this set still lazy-builds on first
    * consumption (cost lands in rep 1; the per-query minimum then
    * reports the clean rep 2). */
  val buildSteps: Set[String] = Set(
    "q_suffix_array",        // strided suffix rank table + plain view
    "q_suffix_array_strided",
    "q_dedup_lrs",           // plain repeat-pair table
    "q_dedup_lrs_strided",   // strided repeat-pair table
    "q_dedup_jaccard_capped", // near-dup pair table
    "q_dedup_clusters",      // CC cluster labels
    "q_eval_shingles_build", // eval-set shingle index
    "q_graph_edges_build",   // co-occurrence edge list
    "q_bpe_vocab",           // learned BPE vocab + doc reprs
    "q_unigram_vocab",       // unigram-LM vocab + doc reprs
    "q_embed_ivf_refined",   // IVF index (centroids + inverted list)
    "q_text_cosine_knn",     // tf-idf term index
    "q_embed_label_noise",   // kNN edge list
    "q_embed_nndescent",     // NN-descent graph
    "q_text_topics",         // topic model artifact
    "q_media_catalog",       // media blob table (all codecs)
    "q_nb_distill",          // teacher labels + NB scores
    "q_rocchio_centroid",    // Rocchio student predictions
    "q_sketch_hll")          // HLL sketch table
  def all: Seq[Q] =
    graft.queries.CoreQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.AnalyticsQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.SuffixQueries.all ++
      graft.queries.SimilarityQueries.all ++
      graft.queries.CurationQueries.all ++
      graft.queries.PlanningQueries.all ++
      graft.queries.LayoutQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.SequenceQueries.all ++
      graft.queries.RelationalQueries.all ++
      graft.queries.SignalQueries.all ++
      graft.queries.ClassifierQueries.all ++
      graft.queries.RobustQueries.all ++
      graft.queries.PrivacyQueries.all
}
