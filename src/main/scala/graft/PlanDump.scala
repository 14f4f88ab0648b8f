package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerates PLANS.md: `explain("formatted")` snapshots of the headline
  * queries with the plan properties each one is expected to exhibit — the
  * written record of the "iterate on the plan until it's the one you'd want"
  * loop (the property assertions live in PlanSpec; this is the human-readable
  * evidence). Run: `sbt "runMain graft.PlanDump"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.builder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"

    val sections: Seq[(String, String)] = Seq(
      ("q1_pricing_summary",
       "Filter reaches the scan (`PushedFilters`), aggregation is partial+final " +
         "around one exchange, everything inside whole-stage codegen."),
      ("s6_point_read",
       "Point read: equality predicate pushed to parquet (`EqualTo`), 4-column " +
         "`ReadSchema` — the Spark form of the reference's single-partition PK read."),
      ("s7_recent_scan",
       "Global top-N plans as `TakeOrderedAndProject` — per-partition heap + " +
         "driver merge of N·partitions rows; no global sort, no hot partition."),
      ("j1_enrich_lookup",
       "Dimension enrich is a `BroadcastHashJoin` — the fact side never shuffles."),
      ("a1_hour_counts",
       "Tumbling bucket counts: `HashAggregate` (partial) → single hash exchange " +
         "→ `HashAggregate` (final)."),
      ("sim_topk_bruteforce",
       "Similarity scoring: `dotproductexpr` (native codegen expression) inside " +
         "a `WholeStageCodegen` span; per-query top-k via the bounded-heap " +
         "aggregate (`topkbyscoreagg`) — map side forwards at most k rows per query."),
      ("a4_latest_per_key",
       "Last-write-wins via the native hash-aggregatable argmax (`ArgMaxAgg`) — an ObjectHashAggregate " +
         "with map-side partial aggregation: hot keys reduce before the shuffle, where " +
         "a window `row_number` would sort the hot key's whole partition on one task."),
      ("q_range_join_bucketed",
       "Banded range join with time-bucket equi-key: a shuffled hash/sort-merge " +
         "join on (user, bucket) — per-task pair work bounded by bucket size, " +
         "never a key's full history; no nested-loop join."),
      ("sim_ivf_topk",
       "Trained IVF: cell assignment is a map-only `nearestcentroidexpr` over " +
         "the centroid matrix (no join, no corpus shuffle); the probe set " +
         "broadcasts against the assignment; the only hash exchange is the " +
         "bounded top-k aggregate on query_id."),
      ("pipeline_curate_fp",
       "Curation with fingerprint-keyed dedup: language/quality filters run " +
         "before the only exchange, which carries `xxhash64(norm)` — column " +
         "pruning drops the document text on the map side."),
      ("pipeline_chunk",
       "Context-window chunking: tokenize-once projection + `posexplode` over " +
         "array slices — one map-only `Generate`, no shuffle anywhere."),
      ("s_queue_decode",
       "Queue-frame decode: encode→decode round trip is a single projection " +
         "chain (`to_json`/`from_json` stay inside whole-stage codegen); no " +
         "exchange — the transport decode adds zero shuffle to any view fed by it."),
      ("search_bm25",
       "BM25: map-side tf kernels (`markerhitsexpr`) over the tokenize-once " +
         "projection, a SINGLE-ROW global-stats broadcast (the only exchange " +
         "feeds the one-row aggregate), top-k as `TakeOrderedAndProject` — " +
         "document rows are never hash-shuffled."),
      ("search_bm25_batch",
       "Batch BM25 (query-count-independent corpus work: two scans — global " +
         "stats + tokenize-for-scoring — however many queries): the exploded " +
         "token stream is broadcast-filtered to the query vocabulary BEFORE any " +
         "exchange; per-term df is a count window over the matched tf rows (no " +
         "third corpus scan); query terms and the one-row global stats ride " +
         "broadcasts; per-query top-k is the bounded-heap aggregate. The only " +
         "hash exchanges carry query-vocabulary matches, never the corpus."),
      ("search_postings_sharded",
       "Hot-term sharded inverted index: df counted first (count-only buffers), " +
         "postings grouped by (term, pmod(doc_id, shards)) so a stop word's " +
         "pairs spread across shards — no aggregation buffer ever holds more " +
         "than max(maxDf, df_max/shards) ids."),
      ("pipeline_decontaminate",
       "Decontamination: the benchmark gram set is the BUILD side of a " +
         "`BroadcastHashJoin` — the corpus probe is map-only; the only " +
         "corpus-keyed exchange is the per-doc matched-gram count aggregate."),
      ("dedup_dup_spans",
       "Cross-doc duplicate spans (substring dedup): ONE corpus tokenize pass; " +
         "TWO exchanges total — the gram-keyed 8-byte (gram, doc) sort whose " +
         "single ordering drives both distinct-doc windows (dense_rank + " +
         "partition max: pure primitive arithmetic, no object aggregation " +
         "buffers), and the per-doc island-merge window bounded by " +
         "tokens-per-document; the span aggregation reuses the per-doc " +
         "partitioning."),
      ("dedup_incremental",
       "Incremental dedup: both sides reduce to `xxhash64` fingerprints before " +
         "any exchange — no `text` column appears in any Exchange's schema; the " +
         "cross-snapshot check is a LEFT ANTI join fingerprint-vs-fingerprint."),
      ("sim_centroid_classify",
       "Nearest-centroid classifier: the trained centroid table (|classes| " +
         "rows) is assembled by class-bounded aggregates and rides a " +
         "`BroadcastNestedLoopJoin` over the corpus (map-only scoring); the " +
         "single corpus-keyed exchange is the per-vec `ArgMaxAgg` " +
         "ObjectHashAggregate — partial aggregation ships ONE candidate row " +
         "per vec, where a window form would shuffle |classes|x the corpus " +
         "and sort it."),
      ("text_nb_classify",
       "Naive Bayes train+score in one plan: every model-side aggregate " +
         "(class-term counts, class totals, vocabulary, priors) is vocab- or " +
         "class-bounded; the corpus pays the term-keyed scoring join, the " +
         "(doc, class) log-likelihood aggregate, and a per-doc argmax window " +
         "whose key holds at most |classes| rows — the true label rides the " +
         "grouping key, so no corpus-sized re-join recovers it."),
      ("dedup_edit_distance",
       "Edit-distance near-dup: prefix-block equi-join with the length-gate " +
         "pre-filter in the join condition and the banded DP " +
         "(`bandededitdistanceexpr`) evaluated once per surviving pair; the " +
         "non-null normalize key suppresses constraint-inference regex re-derivation."),
      ("search_tfidf_topk",
       "TF-IDF doc similarity: the sparse-matrix build is ONE (term, doc) " +
         "count aggregate + a term-keyed df window (no second corpus scan); " +
         "the query doc's vector and norm ride broadcasts, ONE doc-keyed " +
         "aggregate computes norm and dot together, top-k is " +
         "`TakeOrderedAndProject`. Unpersisted-weights composition shown here; " +
         "a deployment persists the weights table and each reference is a scan."),
      ("sim_random_projection",
       "Johnson-Lindenstrauss sign projection: map-only — one native " +
         "`dotproductexpr` per output dim against literal sign rows inside a " +
         "single `WholeStageCodegen` span; NO exchange anywhere (the pin is 0)."),
      ("sim_rp_topk",
       "RP-shortlist ANN: projected 16-dim scoring feeds the bounded-heap " +
         "top-k aggregate (the only hash exchange); the exact rerank joins " +
         "broadcast the id-only shortlist and the query set — full-precision " +
         "vectors are read only for shortlist rows."),
      ("dedup_incremental_minhash",
       "Cross-snapshot near-dedup: both sides reduce to signatures then bare " +
         "(doc_id, band, bucket) rows before the candidate equi-join — no " +
         "document text in any Exchange schema; signatures re-attach to the " +
         "deduped candidate pairs only; the batch side broadcasts where " +
         "fixture stats allow."),
      ("pipeline_embedding_outliers",
       "Embedding outlier gate: ONE dim-keyed centroid aggregate (map-side " +
         "partials — the exchange carries tasks x dim tiny rows), centroid " +
         "broadcast back as a single row, cosine scoring map-only."),
      ("pipeline_weighted_sample",
       "Efraimidis-Spirakis weighted sample: the ln(u)/w key is map-only " +
         "content arithmetic (no RNG state), the top-k is " +
         "`TakeOrderedAndProject` — NO exchange anywhere (the pin is 0)."),
      ("text_pmi_top",
       "PMI collocations: unigram and bigram counts are each one explode + " +
         "aggregate; the corpus-size normalizer rides a window over the " +
         "vocab-bounded unigram frame (never a second corpus scan); the PMI " +
         "join keys single tokens against vocab-bounded count tables."),
      ("search_domain_keywords",
       "Per-domain TF-IDF keywords: one (domain, term) count aggregate, " +
         "term-keyed df window over the AGGREGATED rows, per-domain rank " +
         "window over vocabulary-bounded frames; the domain count rides a " +
         "one-row broadcast."),
      ("dedup_embedding_incremental",
       "Cross-snapshot embedding near-dedup: hyperplane tag generation is " +
         "map-only on both sides; the candidate equi-join, its dedup, and " +
         "the keep-flag joins ship only ids and buckets — vectors re-attach " +
         "to the deduped candidate pairs for the exact cosine filter."),
      ("dedup_clusters_canonical",
       "Canonical cluster resolution: components via the size-adaptive " +
         "union-find fast path (label map broadcast), then ONE cluster-keyed " +
         "hash-argmax (ObjectHashAggregate, map-side partials) picks the " +
         "highest-quality representative and the verdict re-joins on id."),
      ("dedup_containment",
       "Asymmetric containment (explode-once bucket form): ONE " +
         "normalize+shingle projection feeds a df-count pre-filter (8-byte " +
         "count buffers, never lists) whose semi-join drops df∉[2,maxDf] " +
         "postings BEFORE any collect_list, so bucket buffers are genuinely " +
         "<= maxDf entries map-side and post-shuffle; the df-count and " +
         "semi-join probe share one gkey exchange (ReusedExchange); pairs " +
         "explode inside the bucket and ONE pair-keyed count finishes " +
         "|A∩B| — exchanges carry longs, never grams or text; both " +
         "direction verdicts explode from the one pair row (no union, so " +
         "the pair-agg subtree plans once)."),
      ("dedup_containment_prefix",
       "Containment with the positional prefix filter (PPJoin-style): grams " +
         "order rarest-first by global df, candidates must share a gram in " +
         "the contained side's prefix (|g| - ceil(t*|g|) + 1 rarest grams — " +
         "the pigeonhole bound), so bucket pair explosion only fires when a " +
         "RARE gram is shared; the exact |A∩B| then comes from one " +
         "array_intersect over the candidate pairs' gram-key arrays."),
      ("pipeline_dsir_weights",
       "DSIR importance weights: both count models are vocab-bounded " +
         "aggregates (hashed form: <= hashBuckets rows) assembled by one " +
         "full-outer join; the corpus feature stream pays exactly ONE " +
         "equi-join on the materialized feature key; the totals/vocab " +
         "scalars ride a single-row broadcast crossJoin."),
      ("search_phrase",
       "Positional phrase search: corpus tokens filter to the phrase " +
         "vocabulary (a broadcast literal) BEFORE any exchange, so the " +
         "(doc, start) vote shuffle carries only phrase-term hits — cost " +
         "tracks the terms' document frequency, never corpus size; the " +
         "occurrence count reuses the vote aggregation's partitioning."),
      ("q_hourly_anomalies",
       "Hourly anomaly detection: events reduce to (type, hour) counts in " +
         "ONE map-side-combined aggregate BEFORE the per-type trailing " +
         "window — the window sorts types x hours rows (24/day/type), so " +
         "no raw event ever enters a window sort."),
      ("sim_binary_topk",
       "Binary-quantized ANN: the sign-bit signature packs in a map-only " +
         "projection (one long per row), stage-1 Hamming ranking is " +
         "`bit_count(XOR)` feeding the bounded-heap top-k aggregate (the " +
         "only hash exchange), and the exact rerank broadcasts the id-only " +
         "shortlist — full-precision vectors are read only for shortlist " +
         "rows (the rpTopK architecture with an 8-byte compressor)."),
      ("sim_mrl_topk",
       "Matryoshka-prefix ANN: stage-1 scoring is a map-only slice + " +
         "`dotproductexpr` over the first 16 dims feeding the bounded-heap " +
         "top-k aggregate (the only hash exchange); the exact rerank " +
         "broadcasts the id-only shortlist and query set — full-precision " +
         "vectors are read only for shortlist rows (the rpTopK architecture " +
         "with a zero-arithmetic compressor)."),
      ("q_funnel",
       "Ordered funnel: each stage is a filtered min-aggregate (the " +
         "event-type filter reaches the scan) joined user-keyed to the " +
         "previous stage's |users|-row table — no per-user event sort " +
         "anywhere; hot users reduce in map-side partials."),
      ("sim_ivf_persisted_topk",
       "Persisted IVF index lifecycle: the assignment table is laid out " +
         "cell-PARTITIONED on disk and the probe pushes its driver-computed " +
         "cell set as a PARTITION filter (`PartitionFilters` at the scan — " +
         "only probed cell directories are read); queries broadcast onto the " +
         "pruned scan and the only hash exchange is the bounded top-k " +
         "aggregate — the corpus is never rescanned, never re-exchanged."),
      ("pipeline_decontaminate_bloom",
       "Bloom decontamination (the benchmark-outgrows-broadcast regime): the " +
         "fixed-size filter is fitted distributed and rides the plan as a " +
         "binary literal; the corpus pass is MAP-ONLY — a higher-order " +
         "`filter` probes each doc's gram array in place, no explode, no " +
         "join, NO exchange (the pin is 0) — streaming-append-safe like the " +
         "literal-array form."),
      ("sim_ivfpq_persisted_topk",
       "Persisted IVFADC (the billion-scale serving layout): the probe " +
         "partition-prunes to its cells, ADC-scores the stored residual " +
         "codes (native `pqadcexpr` + the broadcast centroid term), and the " +
         "exact rerank reads full-precision vectors only for shortlist " +
         "rows — scan FRACTION (IVF pruning) and BYTES per scanned row (PQ " +
         "codes) both shrink, and the only hash exchange is the bounded " +
         "top-k aggregate."),
      ("text_lm_score_kn",
       "Kneser-Ney LM score: the corpus-scale bigram stream tokenizes once " +
         "and pays exactly ONE equi-join against the assembled count model; " +
         "every model table (bigram counts, left stats, continuation stats) " +
         "is vocab²-bounded and broadcasts, and the distinct-type total " +
         "rides one unpartitioned window over the vocab-bounded " +
         "continuation frame — never a second corpus scan."),
      ("text_unigram_encode_fixed",
       "Unigram-LM Viterbi encode (pinned vocabulary): map-only — the " +
         "native `unigramencodeexpr` evaluates inside a single " +
         "`WholeStageCodegen` projection with the piece table riding as a " +
         "codegen reference object; NO exchange anywhere (the pin is 0)."),
      ("text_lm_score_kn_transfer",
       "Transfer KN scoring (frozen model, the CCNet deployment shape): the " +
         "score-side bigram stream tokenizes once and pays three LEFT " +
         "broadcast joins against the train-vocab-bounded model tables plus " +
         "a one-row totals broadcast — left joins plant no " +
         "constraint-inference filters on the stream side, so the " +
         "split-derived w1/w2 keys compute once; the only corpus-keyed " +
         "exchange is the per-doc score aggregate."),
      ("pipeline_gopher_repetition",
       "Gopher within-doc repetition gate: map-only — one normalize " +
         "projection feeds the native `gramrepetitionexpr` kernel (per-row " +
         "gram counts + span-union walk, O(chars)) inside a single " +
         "`WholeStageCodegen` span; NO exchange anywhere (the pin is 0) — " +
         "the quality gate runs at scan speed ahead of any dedup shuffle."),
      ("pipeline_decontaminate_batch",
       "One-pass multi-benchmark decontamination: the (gram, bench_id) union " +
         "table is the BUILD side of a `BroadcastHashJoin`; the corpus " +
         "tokenize/shingle/explode appears ONCE however many benchmarks are " +
         "screened, and the only corpus-keyed exchange is the " +
         "(doc, bench)-keyed matched-row count — its volume tracks " +
         "contamination, not corpus size."),
      ("pipeline_decontaminate_batch_stateless",
       "The STREAMING face of the multi-benchmark screen: k gram-set models " +
         "probe via the native `longsethitsexpr` kernel (each reference set " +
         "builds once — `array_intersect` vs a literal rebuilds its hash set " +
         "per row, measured 4x slower), the k counts stack through one " +
         "map-only Generate — no join, no aggregation, NO exchange (the pin " +
         "is 0); append-mode-safe over a document stream."),
      ("pipeline_remove_boilerplate_stateless",
       "Frozen-model boilerplate removal (the CCNet step's apply half): the " +
         "xxhash64 segment model probes the scalar `longsetcontainsexpr` " +
         "kernel inside a higher-order filter — scan → project, NO exchange " +
         "(the pin is 0); runs unchanged on a stream. The fit+apply join " +
         "form's anti join broadcasts the segments/minDf-bounded model " +
         "(PlanSpec pins BroadcastHashJoin LeftAnti)."),
      ("dedup_winnow_fingerprints",
       "Winnowing (MOSS) fingerprints: tokenize → shingle → md5-60-bit hash " +
         "→ the native `winnowexpr` rightmost-min window scan, all fused in " +
         "one projection pipeline over the scan + a Generate for the " +
         "~2/(w+1)-sampled selections — map-only, NO exchange (the pin is " +
         "0); the fingerprint stream shuffles only when a consumer " +
         "aggregates it (winnowPairs' df-bounded self-join)."),
      ("pipeline_cluster_balance",
       "Cluster-balanced pruning: map-only seed assignment " +
         "(`nearestcentroidexpr`, the IVF kernel) feeding ONE k-bounded heap " +
         "aggregation (`topkbyscoreagg`) keyed on cluster_id — a single " +
         "exchange carrying at most perCluster rows per cluster per map " +
         "task, and NO window sort (a row_number quota would sort a " +
         "power-law hot cluster in one task at 100 TB)."),
      ("multimodal_gif_frames",
       "Format-aware frame extraction: the GIF89a block walk (image " +
         "descriptors, extension sub-blocks, color-table skips) runs as a " +
         "typed flatMap over the payload scan — map-only, NO exchange (the " +
         "pin is 0); payloads never shuffle."),
      ("multimodal_wav_windows",
       "Audio windowing: RIFF chunk walk (fmt → data) + window/hop framing " +
         "over the PCM16 samples, emitted by a typed flatMap generator — " +
         "map-only, NO exchange (the pin is 0)."),
      ("multimodal_resize_png",
       "PNG resize: zlib inflate → scanline unfilter (Sub/Up/Average/Paeth) " +
         "→ nearest-neighbor sample → re-deflate, all inside one typed " +
         "mapPartitions chain — map-only, NO exchange (the pin is 0); the " +
         "pixel bytes round-trip without ever leaving the task."),
      ("dedup_winnow_persisted",
       "Persisted winnow index probe: the base corpus's fingerprint table is " +
         "stored BUCKETED on fp, so its distinct, df-bound aggregation, and " +
         "both joins read co-located buckets with ZERO base-side exchanges " +
         "(DedupSpec proves bucketed < plain); only the batch side's " +
         "distinct + fp join shuffle + pair aggregation move data (pin 3)."),
      ("multimodal_gif_pixels",
       "GIF pixel decode: the full variable-width LZW decode (width bumps, " +
         "KwKwK, deferred clear, de-interlacing) runs inside the same typed " +
         "flatMap as the block walk — map-only, NO exchange (the pin is 0); " +
         "checksums leave the task, pixel bytes never do."),
      ("dedup_winnow_persisted_delete",
       "Winnow index DELETE: the probe plan is IDENTICAL to " +
         "dedup_winnow_persisted (pin 3, zero base-side exchanges) — the " +
         "delete rewrites only the affected buckets' files through a staged " +
         "checked swap, so survivors still read co-located; revocation cost " +
         "tracks the affected buckets, probe cost is unchanged."),
      ("dedup_winnow_persisted_compact",
       "Bucketed compaction: multi-file buckets rewrite into ONE file each " +
         "(input pre-partitioned by the bucket spec's own pmod(hash(fp), n)), " +
         "and the probe keeps the identical 3-exchange co-located plan — " +
         "compaction changes file COUNT, never the layout contract."),
      ("multimodal_jpeg_pixels",
       "Baseline JPEG decode: the full T.81 pipeline (marker walk, canonical " +
         "Huffman from the file's DHT, byte-unstuffing, RST resync, dequant, " +
         "separable IDCT) runs inside one typed flatMap over the payload " +
         "scan — map-only, NO exchange (the pin is 0); entropy-coded bytes " +
         "and decoded pixels never leave the task, only the checksums do."),
      ("multimodal_avi_frames",
       "MJPEG video frames: the RIFF list walk (hdrl → movi → '##dc' " +
         "chunks) plus a per-frame baseline-JPEG decode, all one typed " +
         "flatMap — map-only, NO exchange (the pin is 0); at 100 TB the " +
         "video corpus streams through scan tasks, frame payloads never " +
         "shuffle."),
      ("pipeline_embedding_whiten",
       "PCA whitening: ONE distributed moments pass (each partition emits " +
         "d + d(d+1)/2 doubles — never vectors), a driver Jacobi eigensolve " +
         "on the d×d covariance (kilobytes), a map-only projection, and a " +
         "second moments pass over the projections; the returned diagnostics " +
         "are a driver-built model-scale result (pin 0)."),
      ("sim_pca_topk",
       "PCA-trained ANN gate: the sim_rp_topk architecture with a TRAINED " +
         "compressor — 16-dim variance-optimal shortlist scan + exact " +
         "rerank; the gate form adds the brute-force twin and recall aggs " +
         "(pin 4). Training cost is one moments pass; the model broadcasts."),
      ("multimodal_scene_cuts",
       "Scene-cut / keyframe detection: per-frame deltas against the previous " +
         "decoded frame AND the per-video keyframe rank, all inside the same " +
         "zero-exchange typed flatMap as the frame walk (all frames of one " +
         "video sit in one payload) — map-only, NO exchange (the pin is 0); " +
         "only per-frame metadata rows leave the task."),
      ("multimodal_wav_spectrum",
       "Fixed-bin DFT spectra: per wavWindows window, exact integer inner " +
         "products against fixed-point twiddle tables plus the per-window " +
         "centroid rational, computed locally in the chunk-walk flatMap — " +
         "map-only, NO exchange (the pin is 0)."),
      ("dedup_winnow_persisted_rebucket",
       "Bucket-count rebuild: the whole table re-clusters to n' buckets " +
         "through the shared staged rewriteBuckets protocol and the catalog " +
         "entry is recreated with the n' spec — so the probe keeps the " +
         "identical 3-exchange co-located plan against the NEW layout " +
         "(re-bucketing changes the parallelism/file-size knob, never the " +
         "layout contract)."),
      ("sim_ivf_persisted_resplit_topk",
       "Cell-count rebuild: the index re-splits to a new centroid set from " +
         "its OWN stored vectors (one map-only argmax pass — no corpus " +
         "rescan), and the probe under the new centroids keeps the pruned " +
         "partition-filter shape; the gate form adds the in-memory twin and " +
         "equality aggs (pin 5)."),
      ("multimodal_keyframes",
       "Keyframe extraction: decode, scene-delta ranking, top-k selection, " +
         "and the standalone re-encode all inside one typed flatMap — " +
         "map-only, NO exchange (the pin is 0); only the selected frames' " +
         "JPEG payloads and checksums leave the task."),
      ("multimodal_wav_resample",
       "Anti-alias FIR decimation: an L-tap fixed-point convolution per " +
         "output sample with per-file checksums computed locally — " +
         "map-only, NO exchange (the pin is 0); the resampled stream never " +
         "materializes off-task, only the rounding-free integers do."),
      ("multimodal_dhash",
       "Perceptual image fingerprint: decode + 9×8 nearest-neighbor sample " +
         "+ 64 gradient comparisons, one typed flatMap — map-only, NO " +
         "exchange (the pin is 0); 16 bytes of hash leave the task per " +
         "image, never pixels."),
      ("dedup_image_clusters",
       "Visual exact-dup clusters: the dedup_exact shape with a perceptual " +
         "key — map-only decode+hash, then ONE aggregation exchange keyed " +
         "by the 16-byte hash (pin 1); one row per distinct image, never a " +
         "pair list that goes quadratic in an image's copy count."),
      ("dedup_image_persisted",
       "Persisted dHash image-dedup index probe (r15): the base corpus's " +
         "band rows live BUCKETED on bkey = band·2¹⁶ + slice, so the " +
         "candidate join reads the base co-located with ZERO exchanges — " +
         "only the probe batch shuffles (pin 3: probe-side bkey exchange + " +
         "df-bound semi + pair-dedup agg). The frozen corpus's images are " +
         "never re-decoded; exact bit_count Hamming verifies in the join " +
         "projection. At 100 TB: the winnow-index read shape on the image " +
         "modality.")
    )
    // Entries that round 10 wrapped in driver quality gates (recall /
    // bit-equality harnesses): snapshot the OPERATOR plan the section
    // documents, not the gate plumbing around it.
    import org.apache.spark.sql.functions.col
    val operatorForms: Map[String, SparkSession => org.apache.spark.sql.DataFrame] = Map(
      "sim_ivf_topk" -> { s =>
        val emb = graft.sources.Tables.embeddings(s, d)
        graft.operators.Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 20), 10,
          nlist = 8, nprobe = 5)
      },
      "sim_ivf_persisted_topk" -> { s =>
        val emb = graft.sources.Tables.embeddings(s, d)
        val cents = graft.operators.Similarity.trainCentroidsSampled(emb, 8, 3)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_plandump"
        graft.operators.Similarity.writeIvfIndex(emb, cents, path)
        graft.operators.Similarity.ivfProbePersisted(s, path, cents,
          emb.filter(col("vec_id") < 20), 10, nprobe = 5)
      },
      "sim_ivfpq_persisted_topk" -> { s =>
        val emb = graft.sources.Tables.embeddings(s, d)
        val (cents, books) = graft.operators.Similarity.trainIvfPq(emb,
          nlist = 8, m = 16, ksub = 32, iters = 3)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfpq_plandump"
        graft.operators.Similarity.writeIvfPqIndex(emb, cents, books, path)
        graft.operators.Similarity.ivfPqProbePersisted(s, path, cents, books,
          emb.filter(col("vec_id") < 20), emb, 10, nprobe = 6, rerankFactor = 8)
      },
      "pipeline_decontaminate_bloom" -> { s =>
        val docs = graft.sources.Tables.documents(s, d)
        graft.operators.Curation.decontaminateBloom(
          docs.filter(col("doc_id") % 20 =!= 0),
          docs.filter(col("doc_id") % 20 === 0), n = 3)
      },
      "dedup_incremental_minhash" -> { s =>
        val docs = graft.sources.Tables.documents(s, d)
        graft.operators.Dedup.incrementalMinhashDedup(
          batch = docs.filter(col("doc_id") % 5 === 0),
          base = docs.filter(col("doc_id") % 5 =!= 0))
      },
      "dedup_embedding_incremental" -> { s =>
        val emb = graft.sources.Tables.embeddings(s, d)
        graft.operators.Similarity.incrementalCosineDedup(
          batch = emb.filter(col("vec_id") % 5 === 0),
          base = emb.filter(col("vec_id") % 5 =!= 0),
          threshold = 0.4, dim = 64, nbits = 3, tables = 8)
      })
    val rendered = sections.map { case (name, note) =>
      val df = operatorForms.get(name).map(_(spark))
        .getOrElse(SparkEntry.queries(name)(spark, d))
      df.collect() // finalize adaptive plan
      val tag = if (operatorForms.contains(name))
        " *(operator form — the driver entry wraps this plan in its round-10 quality gate)*"
      else ""
      (name, note + tag, df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }

    val md = new StringBuilder
    md.append("# PLANS — physical-plan snapshots of headline queries\n\n")
    md.append("Generated by `sbt \"runMain graft.PlanDump\"` over sf0.001 (plans are\n")
    md.append("finalized adaptive plans after execution). PlanSpec asserts these\n")
    md.append("properties; this file is the readable record.\n")
    rendered.foreach { case (name, note, plan) =>
      md.append(s"\n## $name\n\n$note\n\n```\n${plan.trim}\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), md.toString)
    println(s"PLANS.md written (${rendered.size} sections)")
    spark.stop()
  }
}
