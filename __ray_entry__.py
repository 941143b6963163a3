"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().

queries() entries map to SURVEY.md §2 operators:
  exact_dedup_docs     D2 exact-lookup analog (groupby content-hash keep-first)
  token_count          text analysis: token counting (oracle)
  token_count_bpe      BPE-ish regex pre-tokenizer count (oracle)
  quality_score        text analysis: quality features (oracle)
  stratified_kfold     perfectly balanced per-lang k-fold assignment —
                       GROUPED exact row_number over md5 order via the
                       scan-carry rank machinery applied per stratum;
                       round-robin deal, fold sizes differ ≤1 (oracle)
  readability_scores   Flesch reading-ease in exact integer micros —
                       vowel-proxy syllables, floor-division formula
                       mirrored in SQL; map-only vectorized (oracle)
  lang_id              text analysis: language-ID heuristic (oracle)
  doc_fingerprint      document fingerprinting: SimHash + MinHash (rows-only)
  doc_fingerprint_md5  SQL-verifiable 32-bit SimHash (md5 shingles,
                       per-bit majority mirrored in the oracle)
  docs_ngram_novelty   per-doc corpus novelty: distinct n-grams first
                       seen here, via ONE gram-keyed min(doc) exchange (oracle)
  docs_vocab_growth    Heaps-law vocabulary growth at quartile
                       checkpoints from the same first-occurrence primitive (oracle)
  docs_char_class_profile per-lang character-class census, vectorized
                       re2 kernels (oracle)
  events_inter_arrival_stats per-user inter-arrival gaps, exact
                       digit-count log-bucketing (oracle)
  lineitem_moment_stats skewness/kurtosis from single-pass int64 power
                       sums, bit-mirrored float finish (oracle)
  part_type_supplier_hhi supplier-concentration HHI per brand from
                       exact counts (oracle)
  events_user_daily_streaks gaps-and-islands: per-user consecutive
                       active-day runs (oracle)
  events_session_count_sweep session counts at candidate timeouts from
                       one gap pass (oracle)
  events_value_benford first-significant-digit census over exact
                       cents (oracle)
  orders_repeat_latency_histogram first-to-second-order day gaps per
                       customer (oracle)
  lineitem_ship_latency_histogram order-to-ship day latency via the
                       union-tag bucketed join (oracle)
  lineitem_returns_rate_by_month monthly return-rate ppm from exact
                       counts (oracle)
  supplier_part_bipartite_degree bipartite degree distributions over
                       the distinct-edge exchange (oracle)
  lineitem_price_qty_ols single-pass OLS from exact sufficient
                       statistics, bit-mirrored float finish (oracle)
  events_weekend_contrast weekday/weekend activity + cents per type
                       (oracle)
  docs_hapax_ratio     hapax legomena per language via one
                       vocab-bounded count exchange (oracle)
  minhash_lsh_docs     D3/D4 similarity join: MinHash-LSH near-dup clusters (rows-only)
  simhash_dup_pairs    SimHash banded near-dup pairs, exact Hamming verify (rows-only)
  minhash_lsh_oph      one-permutation-hashing MinHash-LSH, md5 slots —
                       the hash-VERIFIED LSH candidate join (oracle)
  simhash_md5_pairs    weighted SimHash pairs with EXACT-recall
                       pigeonhole banding + popcount verify (oracle)
  pagerank_tokens      iterative distributed PageRank: partitioned rank
                       vector, tag-and-union rank⋈edges shuffle per
                       iteration, unrolled-CTE oracle (oracle)
  corpus_dedup_eval    flagship scorecard vs planted truth (rows-only)
  corpus_preset_sweep  exhaustive vs champion-top-k vs pair-rendezvous
                       verify: edge counts + recall per preset
                       (similarity_detection.c candidate-count parity;
                       rows-only)
  band_skew_profile    reducer-bucket histogram of THE band exchange:
                       max/p99-over-mean skew ratios, the pre-run
                       salting decision input (rows-only)
  lsh_param_sweep      LSH tuning curve: candidate volume vs recall
                       across band counts, self-relative to the most
                       sensitive configuration (rows-only)
  corpus_gate_sweep    verify-gate OPERATING CURVE: flagship candidate
                       edges re-verified at a low 18 dB gate, then
                       swept across gates 18..40 dB against planted
                       truth — recall holds 1.0 through 25 dB where
                       distractors and false merges are both zero,
                       the measured justification for the production
                       default (rows-only)
  corpus_resize_stats  multimodal image decode→resize actor-pool stage,
                       per-format stats (rows-only)
  curation_job_metrics resumable checkpointed curation job (rows-only)
  segment_routing      D3 champion top-k segment routing with feature trim (rows-only)
  ngram_jaccard_pairs  exact n-gram Jaccard over LSH candidates (rows-only)
  jaccard_join_exact   inverted-index set-similarity join, ALL pairs (oracle)
  jaccard_join_ppjoin  same result via AllPairs/PPJoin prefix+length pruning (oracle)
  common_substring_pairs suffix-array channel: winnowing fingerprint candidates,
                       exact shared min_len-gram counts (oracle)
  lcs_pairs            exact longest-common-substring length via generalized
                       suffix array + Kasai LCP (rows-only; pytest vs DP)
  stopword_scrub       curation: boilerplate stop-phrase removal, re2 (oracle)
  dataset_split        curation: deterministic md5 train/val split (oracle)
  decontaminate        curation: benchmark n-gram decontamination via
                       broadcast gram set (oracle)
  segment_dedup        curation: line-level (k-token window) keep-first
                       dedup, per-doc survivor counts (oracle)
  pii_scrub            curation: email/phone/IP regex redaction over
                       deterministically planted PII (oracle)
  incremental_dedup    dedup of arriving docs against an ingested index
                       partition, one fp shuffle, no broadcast (oracle)
  customers_without_urgent_orders  distributed tag-and-union shuffle
                       anti-join, map-side key dedup (oracle)
  orders_running_total partitioned window function: per-customer
                       running sum + rank, segmented cumsum (oracle)
  events_grouped_sample deterministic per-group reservoir sample via
                       min-wise hashing, map-side partial top-k (oracle)
  events_sliding_window ROWS-frame sliding aggregate per user,
                       prefix-sum per bucket (oracle)
  events_type_percentiles exact rank-based per-group percentiles (oracle)
  user_event_pivot     pivot/crosstab via conditional aggregation (oracle)
  filtered_ann_topk    composed filter ⋈ ANN: predicate on documents,
                       narrow post-score join, partial top-k (oracle)
  label_centroids      per-label embedding centroids, segmented partial
                       sums then tiny (label,dim) aggregate (oracle)
  kmeans_assign        Lloyd's assignment step vs broadcast centroids,
                       one matmul per batch (oracle)
  events_value_histogram fixed-width integer-exact histogram (oracle)
  corpus_phash_topk    image similarity search by phash Hamming
                       distance, local top-k per batch (rows-only)
  container_refs       HAR utilization aggregate (R4 analog, oracle)
  cap_top_containers   CAP top-k by referenced bytes (R3 analog, oracle)
  docs_stats_by_lang   per-job counters (W5 analog, oracle)
  events_windowed / events_type_stats / events_sessionize /
  events_user_daily_topk  stream + ranked-window shapes (oracles)
  events_asof_join     as-of join: latest strictly-preceding right event
                       per left event, co-partitioned by user (oracle)
  events_range_join    range join: right-event count in the preceding
                       window, binary-search probe per bucket (oracle)
  events_funnel        ordered funnel: strict view→click→purchase
                       progression per user, bucket-local counts (oracle)
  top_ngrams           global top-k bigrams via map-side combiner (oracle)
  repetition_scores    Gopher-style repetition features per doc (oracle)
  logreg_train_lang    bit-reproducible distributed GD classifier training:
                       micro-quantized gradient all-reduce, integer weight
                       updates, chained-CTE oracle certifies every round
                       (oracle)
  bpe_encode_corpus    BPE apply with the trained merge table: per-word
                       segmentation runs once per DISTINCT word (domain
                       encode), corpus pass is map-only searchsorted
                       lookup (parity test)
  events_type_mad      exact by-rank median + MAD per group, two-pass
                       broadcast-back (oracle)
  user_retention_cohorts cohort-retention matrix: batch-local
                       (user, day) dedup, one user-keyed shuffle,
                       tiny (cohort, offset) aggregate (oracle)
  events_upsert_latest SCD/upsert merge compaction: delta-priority
                       latest-wins per key, one key shuffle (oracle)
  lineitem_corr_stats  exact grouped Pearson corr via limb-decomposed
                       128-bit moment sums, HUGEINT-mirrored (oracle)
  triangle_count       degree-ordered oriented wedge⋈edge triangle
                       counting over the token graph (oracle)
  events_zscore_outliers exact integer z-score outlier detection:
                       tiny limb-sum moment pass, map-only flag via
                       isqrt threshold (oracle)
  bloom_semi_join      Bloom-pruned semi-join: mergeable per-block
                       filters, map-only probe, match-proportional
                       exact verify shuffle (oracle)
  orders_decile_stats  exact distributed ntile via two-pass counting
                       sort (value-count table → cutoffs → map-only
                       assign) (oracle)
  q3_shipping_priority TPC-H Q3 3-way join: segment-customer key set
                       broadcast, orders⋈lineitem tag-and-union with
                       map-side revenue partials, per-bucket top-k (oracle)
  q5_local_supplier_volume TPC-H Q5 5-way join: region/nation driver-
                       resolved, supplier map broadcast, 2 chained
                       tag-and-union exchanges (custkey → orderkey)
                       with map-side revenue partials (oracle)
  heavy_hitter_tokens  Misra-Gries/Space-Saving frequent items:
                       capacity-bounded per-batch sketches, token-sum
                       merge, error mass tracked (oracle exact regime)
  quality_percentile_filter learned per-lang quantile cutoff (value-
                       count profile pass → broadcast thresholds →
                       map-only filter) (oracle)
  degree_distribution  out-degree histogram of the token digraph:
                       skew-profiling pass before iterative jobs (oracle)
  token_communities    hash-VERIFIED min-label propagation CC (the
                       flagship's hash-to-min topology pinned by an
                       unrolled-CTE oracle, 3 sync rounds) (oracle)
  doc_feature_hashing  feature-hashing vectorizer (Weinberger 2009):
                       map-only md5-bucketed bag-of-words, zero
                       vocabulary coordination (oracle)
  tokenize_to_ids      frequency-ranked vocab build + map-only integer
                       encode (searchsorted vs broadcast vocab) (oracle)
  sequence_pack        GPT-style fixed-length sequence packing via the
                       global-prefix-sum primitive (hierarchical scan
                       pattern documented) (oracle)
  pretraining_pipeline CAPSTONE composition: quantile filter →
                       keep-best dedup → sequence packing, certified
                       end-to-end by one four-CTE oracle (oracle)
  docs_csv_stats       CSV leg of the format dispatch, round-trip
                       certified against the parquet original (oracle)
  video_frame_stats    VIDEO multimodal path: binary payloads fan out
                       through the frame-sample actor pool (ffmpeg
                       seam stubbed; Ray plumbing real + exact pytest)
  jfif_scan_mode_stats per-scan-mode read economics: entropy bytes the
                       DC-thumbnail path Huffman-walks vs stream total
                       (progressive rows walk only the leading DC scans)
  gif_decode_stats     REAL GIF89a files (variable-width LZW, palette,
                       interlace) through the flagship decode actor pool
  gif_palette_dedup    GIF re-save near-dups (palette permutation, depth
                       reduction, interlace re-layout), per-class recall
  gif_animation_dedup  animated-GIF near-dups (k-slot sampling: depth /
                       frame-drop / palette-perm classes), per-class recall
  format_convert_dedup container-format-conversion dups (same picture
                       re-hosted as BMP/PPM/TIFF-LZW/lossless-WebP/
                       ICO/TGA — byte-hash-blind, pixel-lossless — or
                       re-encoded JPEG/GIF/lossy-VP8-WebP), exact
                       pixel-SHA band family + perceptual bands,
                       per-class recall
  image_format_stats   uniform nine-container ingestion (PNG/JPEG/GIF/
                       BMP/PPM/TIFF/WebP/ICO/TGA) through one decode
                       dispatch, per-format counts + mean luminance
  crossformat_animation_dedup the same animation re-hosted as animated
                       GIF / lossless animated WebP / MJPEG-AVI (the
                       GIF-to-video transcode), one container-agnostic
                       decode_frames signature stage, per-class recall
  webdataset_roundtrip_stats image+caption corpus exported as POSIX
                       tar shards (one file per map task, content-
                       hashed, resumable) and read back one-task-per-
                       shard; per-shard counts + byte sums, exact
  corpus_dedup_from_wds input-format independence: the flagship runs
                       unchanged over tar shards and produces the
                       IDENTICAL cluster partition as over parquet
  corpus_dedup_export_wds the full production curation path composed:
                       flagship clustering -> keep-best-quality write
                       decision -> representatives shipped as tar
                       shards -> read-back certified equal
  jfif_decode_stats    REAL baseline JFIF JPEGs (pure-numpy T.81 codec,
                       Annex K tables) decoded by the flagship's
                       actor pool; PSNR pinned by pytest (rows-only)
  partitioned_write_readback hive-partitioned write → pruned read-back
                       round trip, WHERE-mirror certified (oracle)
  decode_quarantine_mixed dead-letter routing across ALL EIGHT codecs
                       (corruption planted per container; fmt still
                       attributed via signature sniff), exact split
  decode_quarantine_stats poison-row dead-letter routing: planted
                       corrupt payloads quarantine per-row, job never
                       fails (rows-only + exact pytest)
  edit_distance_pairs  exact-Levenshtein near-dup channel: prefix-fp
                       banding + vectorized two-row DP verify (oracle)
  keep_best_dedup      keep-BEST-policy dedup (CC-Net champion rule):
                       prefix-fp shuffle of 30 B rows, per-bucket
                       lexsort winner pick (oracle)
  kmeans_iter_assign   distributed ITERATIVE Lloyd training (2 full
                       rounds: map-only assign, k·d partial-sum update,
                       1e-6 centroid contract) hash-verified vs an
                       unrolled-CTE oracle (oracle)
  embedding_model_scores batched model inference on an actor pool:
                       weights once per actor, one quantized matmul
                       per batch, oracle-exact scores (oracle)
  docs_embedding_join_stats cross-modal text⋈embedding join on doc id
                       (narrow rows both sides, vectors never move)
                       (oracle)
  source_length_gini   per-source Gini inequality coefficient as an
                       exact int64 rational over value-count profiles
                       (oracle)
  q7_nation_volume     TPC-H Q7 nation-PAIR volume matrix: group key
                       spans both join sides (customer × supplier
                       nations), |nations|²-sized aggregate (oracle)
  q9_product_profit    TPC-H Q9 two-dimension group key assembled from
                       two different joins (supplier nation × order
                       year), one orderkey exchange (oracle)
  q19_disjunctive_revenue TPC-H Q19 OR-of-conjunctions predicate across
                       both join sides, map-only broadcast eval (oracle)
  q8_market_share      TPC-H Q8 national market share as an exact
                       (numerator, denominator) int64 pair per order
                       year: three broadcast dimensions + the Q5/Q7
                       two-exchange plan (oracle)
  q12_priority_by_linestatus TPC-H Q12 CASE-counted order priority
                       grouped by a lineitem attribute, one orderkey
                       exchange of per-(order, status) partials (oracle)
  q21_waiting_suppliers TPC-H Q21 sole-late-supplier quantification
                       (EXISTS peer / NOT EXISTS late peer) evaluated
                       vectorized per order group (oracle)
  bfs_token_distances  single-source BFS frontier rounds over the token
                       bigram graph, distance vector exchanged (never
                       broadcast), unrolled frontier-SET oracle (oracle)
  part_pareto_frontier 2-D skyline via local-prune-then-global-prune
                       (domination transitivity), NOT EXISTS
                       domination anti-join oracle (oracle)
  containment_join_exact Broder containment c/|A| (directed) over the
                       shared shingle-posting machinery — copied-into-
                       bigger-doc duplication (oracle)
  normalize_text       case-fold + whitespace-collapse + trim, map-only
                       vectorized re2 kernels (oracle)
  events_dedup_window  at-least-once delivery dedup: same (user, type,
                       value) within the window, lag semantics, one
                       identity exchange (oracle)
  table_profile        per-column ANALYZE (nulls, exact cardinality,
                       range) in one tagged exchange (oracle)
  orders_customer_set_ops INTERSECT/EXCEPT membership of two period
                       populations as ONE grouped boolean aggregate
                       (oracle)
  lineitem_unpivot     UNPIVOT/melt of the four measure columns inside
                       the batch map + domain-sized groupby (oracle)
  table_digest         order-insensitive per-partition table
                       fingerprint (Σ md5_60bit(row) mod 2^63) — the
                       certify-a-copy-without-sorting primitive;
                       hi/lo-split partials so int64 Sums never
                       overflow (oracle)
  exact_global_quantiles exact median/p90/p99 by 3-pass histogram-
                       refine selection — no sort, no co-location
                       (the exact-median-of-100TB algorithm) (oracle)
  dedup_ratio_estimate sampled dedup-ratio estimation (Harnik-style
                       1/64 content-defined hash slice, exact distinct
                       on the sample × mod) — the plan-before-you-run
                       primitive (oracle)
  events_type_trend    per-group OLS trend (value vs hour) as EXACT
                       int64 slope_num/slope_den cross-multiplied pairs
                       — moment partials fold map-side, one domain
                       exchange, no float accumulation (oracle)
  zonemap_prune_stats  min/max zonemap built from parquet FOOTER
                       statistics over a range-sharded store; a
                       mid-range predicate scans only overlapping
                       shards — oracle recomputes shard assignment,
                       zones, overlap count and the filtered aggregate
                       in SQL (oracle)
  jfif_dc_dedup        REAL-JPEG near-dup dedup with NO full decode:
                       DC-coefficient luma thumbs → phash+aHash dual
                       8×8-bit LSH bands → thumb-PSNR verify in-bucket
                       — planted re-encode recall 1.0, 0 false merges
                       (rows-only; pytest pins recall)
  dihedral_image_dedup near-dup detection that survives MIRRORED /
                       ROTATED re-uploads (a flip moves phash ~31
                       bits — past every band): orbit expansion bands
                       all 8 D4 orientations; verify = dual-Hamming
                       prefilter + orientation/shift-aligned DC-thumb
                       PSNR ≥ 35 dB (measured 25 dB separation) —
                       planted transform+re-encode recall 1.0, 0
                       false merges (rows-only; pytest pins recall)
  avi_shot_stats       shot-boundary detection + keyframe selection
                       over real MJPEG AVI: frame-to-frame DC-thumb
                       difference spikes (every frame decoded DC-only,
                       no IDCT) → per-shot middle keyframe — the
                       scene-level sampling primitive; map-only, no
                       shuffle (rows-only; pytest pins exact cut
                       recovery)
  photometric_image_dedup near-dup detection that survives BRIGHTNESS/
                       CONTRAST edits (y'=clip(a·y+b)): aHash is
                       affine-equivariant so banding survives (≤2 bits
                       moved, measured), but thumb PSNR FAILS (11 dB)
                       — verify = zero-normalized cross-correlation,
                       mathematically invariant to the transform;
                       planted recall 1.0, 0 false merges (rows-only;
                       pytest pins)
  tonecurve_image_dedup near-dup detection that survives NONLINEAR
                       monotone tone edits (gamma / S-curve /
                       histogram stretch — the curves-levels class
                       where the photometric channel's affine
                       machinery fails): candidates hash the RANK
                       IMAGE (exactly tone-invariant per channel;
                       rank-aHash moves 2.0 bits mean vs 20 plain,
                       48/48 band-collide), verify = per-channel
                       HISTOGRAM-MATCHED ZNCC gated on the min over
                       R/G/B (monotone transport inverts any curve;
                       measured true ≥0.9967 vs distinct ≤0.6576 —
                       gray-only and Spearman variants measured and
                       rejected as overlapping); planted recall 1.0,
                       0 false merges (rows-only; pytest pins)
  crop_image_dedup     near-dup detection that survives an AGGRESSIVE
                       CROP (55-80%-per-dim window at arbitrary
                       offset + re-encode — the social-media /
                       thumbnail class; global phash/aHash go blind
                       past ~2% trims): candidates are CONTENT-DEFINED
                       2D ANCHORS (destor's CDC boundary idea lifted
                       to 2D — centroid-refined local maxima of
                       smoothed luma re-pick the same pixels at any
                       crop offset) with translation-exact 64-bit
                       patch aHashes through a 4x16-bit band exchange;
                       colliding anchors PROPOSE a displacement,
                       a pair-keyed vote selects <=6 candidates, and
                       verify = overlap-window PSNR from rendezvous-
                       attached 32x32 global thumbs with a +-2
                       displacement sweep (measured: true >=30.7 dB vs
                       false <=23.6 dB at the 27 dB gate); planted
                       recall 1.0, 0 false merges (rows-only; pytest
                       pins)
  audio_offset_dedup   TIME-SHIFT-invariant audio near-dup detection
                       (head-trimmed / silence-padded re-uploads at
                       altered gain — the offset class slot-positioned
                       fingerprints are blind to): Shazam-style (Wang
                       2003) content-defined anchor times carry 32-bit
                       spectral-shape words through one LSH exchange;
                       collisions PROPOSE the time offset, verify =
                       min(masked envelope time-corr, overlap band-
                       profile corr) over a ±2-frame sweep (measured:
                       true ≥0.9911 vs false ≤0.7846 at the 0.95 gate;
                       silence mask is load-bearing — a real 0.9515
                       false merge between distinct silence-padded
                       clips without it); planted recall 1.0, 0 false
                       merges (rows-only; pytest pins)
  timescale_audio_dedup TIME-SCALE-invariant audio near-dup detection
                       (resampled ±4-10% speed-change re-uploads, also
                       trimmed + gain-altered — no constant offset
                       aligns them, so the offset channel is blind):
                       scale-COVARIANT anchor times; anchor PAIRS
                       RANSAC-fit the (rho,d) time map from full
                       anchor lists riding the band rows (sliding-byte
                       spectral keys only need ONE collision); verify
                       = dual gate warped envelope corr ≥0.97 AND min
                       2-coarse-band track corr ≥0.82 (measured true
                       ≥0.993/0.957 vs distinct env ≤0.78; 16-band
                       profiles decorrelate under the log-rho band
                       shift — the halved-spectrum tracks are the
                       scale-robust second arm); planted recall 1.0,
                       0 false merges (rows-only; pytest pins)
  samplerate_audio_dedup SAMPLE-RATE-invariant audio near-dup
                       detection (8k→16k/11.025k transcodes at
                       altered gain — fixed frame/hop-in-samples
                       features see different time-frequency cells:
                       fingerprints measured moving 30/60 bits): a
                       NORMALIZATION channel (the EXIF-orientation
                       pattern) — PCM resampled once to the canonical
                       rate, then the proven Haitsma-Kalker banding +
                       the offset channel's dual-arm verify at offset
                       0 (the slot channel's profile-only verify
                       measured FAILING here: interp lowpass tilts
                       profiles, true 0.990 < distinct 0.9946; dual
                       arm separates 0.991 vs 0.533); planted recall
                       1.0, 0 false merges (rows-only; pytest pins)
  stereo_audio_dedup   STEREO-RE-MASTER-invariant audio near-dup
                       detection (mono recording re-released as a
                       2-channel master: constant-power pan /
                       Haas-delay widening / mid-side widening).
                       Measured: NO single decode projection is
                       invariant across the three styles — Haas
                       comb-filters the mean downmix (11.5/60 bits,
                       verify 0.88 < gate) but leaves ch0 bit-exact,
                       mid/side moves ch0/ch1 by 23-25 bits (verify
                       0.61) but cancels exactly in the downmix —
                       so multi-channel clips emit the HK words of
                       the {downmix, ch0, ch1} PROJECTION SET (the
                       grayscale dual-luma rendezvous pattern) and
                       verify maxes the dual-arm gate over combos
                       present (true ≥0.99 vs distinct ≤0.534 at
                       0.95); per-class recall 1.0, 0 false merges
                       (rows-only; pytest pins)
  pitchshift_audio_dedup PITCH-SHIFT-invariant audio near-dup
                       detection (±2-4 semitone tempo-preserving
                       transposition — the "nightcore" / key-change
                       class; measured blind on the offset channel at
                       2/12: spectral words move past both banding
                       halves): candidates hash 32-bit ENVELOPE-shape
                       anchor words (total frame energy is pitch-
                       invariant by Parseval — every true pair
                       collides vs 1/66 distinct); verify = dual gate
                       at offset 0: masked envelope ZNCC ≥0.95 AND
                       fractional-log-band-shift-swept 2D block-
                       profile ZNCC ≥0.85 on INTEGRATED geometric
                       power bands (integration, not grid sampling —
                       sampled grids alias narrow tones, measured
                       specZ −0.02 on true pairs; true ≥0.968/0.926
                       vs distinct ≤0.449/0.722); near-unison beating
                       documented as the invariant's physical
                       boundary; planted recall 1.0, 0 false merges
                       (rows-only; pytest pins)
  video_offset_dedup   TIME-SHIFT-invariant video near-dup detection
                       (head-trimmed / ad-prepended re-uploads at q70
                       transcode — the offset class fraction-sampled
                       frame slots are blind to): SHOT CUTS are the
                       content-defined anchor times (a trim shifts
                       every cut with the content), cut-keyframe dual
                       phash+aHash bands propose the frame offset,
                       verify = mean aligned-frame 16x16 DC-thumb PSNR
                       over the whole overlap with a ±1 sweep
                       (measured: true ≥52.9 dB vs false ≤19.0 dB at
                       the 30 dB gate); frames decode DC-only; planted
                       recall 1.0, 0 false merges (rows-only; pytest
                       pins incl. exact cut shift-covariance)
  framerate_video_dedup CERTIFIES the k-slot DC-thumb video channel
                       is FRAME-RATE INVARIANT BY CONSTRUCTION:
                       relative-position slot sampling (j·nf)//k
                       lands at the same wall times for any fps at
                       equal duration (5/15/25 fps reduce to pure
                       re-encode at the slot times; 12.5 fps lands up
                       to 0.04 s off and the 28 dB slot gate absorbs
                       the one-motion-step error) — no normalization
                       stage needed, unlike the audio sample-rate
                       class; fps change that alters duration is a
                       speed change (timescale_video_dedup's class,
                       documented boundary); per-fps-class recall
                       1.0, 0 false merges (rows-only; pytest pins)
  resolution_video_dedup SPATIAL-RESOLUTION-invariant video near-dup
                       detection (the 1080p→720p re-upload class:
                       box half/quarter res, 2× upscale, aliasing
                       NN-2/3). The DC-only slot channel is MEASURED
                       BLIND (half-res: 18.1 dB min slot PSNR, 0/4
                       slots past the gate; quarter-res: 0 band
                       collisions); the channel fully decodes ONLY
                       the k sampled frames and hashes/verifies
                       _box_thumb32 area averages of full-res luma —
                       scale-invariant by construction (true ≥26.3 dB
                       vs distinct ≤18.2 at the 25 dB slot gate);
                       per-class recall 1.0, 0 false merges
                       (rows-only; pytest pins)
  timescale_video_dedup TIME-SCALE-invariant video near-dup detection
                       (speed-changed / frame-rate-resampled re-uploads
                       rho 0.75-1.3, head-trimmed, q70 — trim+scale
                       shifts every fraction slot AND admits no
                       constant offset): shot cuts are scale-COVARIANT
                       anchors (measured jitter ≤0.7 frames, 0
                       misses); cut-keyframe dual-hash bands bring
                       pairs together, cut lists + frame counts ride
                       the band rows, coarse (rho,d) proposals from
                       cut×cut / cut×end correspondences are sharpened
                       by frame-level best-match least squares, gate =
                       global warped DC-thumb PSNR ≥35 dB (measured
                       true ≥52.7 vs distinct ≤17.8); frames decode
                       DC-only; planted recall 1.0, 0 false merges
                       (rows-only; pytest pins)
  letterbox_video_dedup LETTERBOX/PILLARBOX-invariant video near-dup
                       detection (uniform bars on every frame — TV
                       re-broadcast / vertical repost — shift+rescale
                       content in the DC thumbs: slot hashes measured
                       moving 26.2 bits mean, past any band): the k
                       slot frames are FULLY decoded and bar-trimmed
                       (codec.trim_uniform_border, the image letterbox
                       channel's measured criteria) before the stock
                       dual-hash slot banding; verify = mean per-slot
                       thumb PSNR over a {0,1} inset sweep (true ≥37.8
                       vs distinct ≤17.7 dB at the 30 dB gate); full
                       decodes bounded at k per video; planted recall
                       1.0, 0 false merges (rows-only; pytest pins)
  mirror_video_dedup   MIRROR/ROT180-invariant video near-dup
                       detection (horizontally flipped / upside-down
                       re-uploads — the cheapest manual evasion edit;
                       slot phash measured moving 34.8/64 bits mean,
                       min 30, past any band): the image dihedral
                       channel's orbit emission lifted to video with
                       Klein-4-group economy — band rows for the
                       3-element set {id, fliplr, flipud} whose
                       difference set is the WHOLE group, so any
                       flipped copy collides on a shared orientation
                       at 3× (not 4×) rows; verify = per-slot DC-thumb
                       PSNR under one GLOBAL group element (≥6 of 8
                       slots at 30 dB; true ≥50.9 vs distinct ≤22.6
                       dB); DC-only decodes; planted recall 1.0, 0
                       false merges (rows-only; pytest pins)
  omni_video_dedup     PRODUCTION COMPOSITION of the video channels:
                       one container walk + DC decode pass computes
                       the orbit-slot (re/mr), trimmed-slot (lb) and
                       cut-anchor (of/ts — offset verify first, then
                       timescale (rho,d) proposals) families; ONE
                       unified band exchange (channel<<24|slot<<8|
                       bits), each row carrying only its channel's
                       verify payload, bucket verifier dispatches at
                       the standalone gates; mixed fixture plants one
                       dup per class: per-class recall 1.0, zero
                       false merges — certifies the channels COMPOSE
                       without cross-channel false amplification
                       (rows-only; pytest pins)
  audiotrack_video_dedup CROSS-MODAL dedup over MJPEG AVI files with
                       a REAL interleaved PCM audio stream (avi.py
                       encodes/decodes the 'auds' strl + '01wb'
                       chunks; audio=None stays byte-identical): one
                       container walk runs BOTH modality families
                       through ONE unified exchange — VS k-slot
                       DC-thumb dual bands + slot-majority PSNR,
                       AT Haitsma-Kalker words + offset dual-arm
                       verify at dt 0; planted classes are the
                       families' exact complements and the output
                       ATTRIBUTES pairs per family: at (same audio,
                       new visuals — slideshow re-post) lands with
                       n_video == 0, vt (re-dub) with n_audio == 0,
                       re found by BOTH; recall 1.0, zero false
                       merges (rows-only; pytest pins)
  omni_audio_dedup     PRODUCTION COMPOSITION of the audio channels:
                       one decode + ONE FFT pass per clip, sample-
                       rate NORMALIZED at decode (the sr class
                       disappears by construction); HK slot words,
                       offset anchor words, timescale sliding keys
                       and pitch envelope words all from the same
                       spectrogram through ONE unified exchange;
                       verify dispatch at the standalone gates — the
                       SL family verifies with the OFFSET dual arm
                       at dt 0 (mean-profile-only verify measured
                       false-merging two distinct 5-tone clips at
                       0.9956); mixed fixture (re/of/ts/sr/ps):
                       per-class recall 1.0, zero false merges
                       (rows-only; pytest pins)
  omni_text_dedup      PRODUCTION COMPOSITION of the text channels:
                       one normalize+tokenize pass per doc; sha1
                       (EX), normalized sha1 (NX), order-invariant
                       bag hash (BG — token reorder preserves the
                       multiset exactly while w=3 shingles fall to
                       J<=0.385 and CTPH permutes below its distinct
                       ceiling), MinHash-LSH w=3 shingles with
                       bottom-64 exact-Jaccard verify (MH), and
                       bottom-64 shingle POSTINGS with shared-count
                       containment gate (CN — boilerplate injection
                       keeps containment ~1.0 while symmetric J
                       falls to ~0.56 and spamsum's blocksize scale
                       changes entirely, measured score 0 on 3/8);
                       ONE unified exchange (chan<<56|h56), one
                       (l,r,chan) pair groupby that dedups decided
                       edges AND sums CN partials; mixed fixture
                       (ex/ws/ro/mh/ct/tr): per-class recall 1.0, zero
                       false merges (rows-only; pytest pins)
  rotation_image_dedup SMALL-ANGLE-ROTATION-invariant near-dup
                       detection (±2-8° straighten/deskew + re-encode
                       — plain phash measured moving 18.5 bits mean,
                       dihedral covers only 90° multiples): both arms
                       in POLAR coordinates where rotation is a cyclic
                       roll — candidates hash per-ring angular-FFT
                       magnitudes + relative phases φ_m−m·φ_1 (both
                       EXACTLY roll-invariant, pinned by test) through
                       one 8x8-bit band exchange; verify recovers the
                       angle by luma circular correlation and gates on
                       MIN-over-R/G/B polar PSNR at the shared rolled
                       alignment (measured ladder: thumb PSNR 1 dB
                       margin, ZNCC overlap, luma-only 31.7-vs-33.8;
                       channel-min true ≥29.5 dB vs false ≤10.9 dB at
                       the 24 dB gate); planted recall 1.0, 0 false
                       merges (rows-only; pytest pins)
  huesat_image_dedup   near-dup detection that survives HUE-ROTATION +
                       SATURATION edits (white balance / colorize /
                       vibrance — the channel-MIXING color class;
                       photometric/tone-curve cover only per-channel
                       maps): Rec601 arms measured blind (phash 15.0
                       bits mean, flagship thumb PSNR rejects 34/48
                       true pairs at min 15.1 dB, gray ZNCC bottoms
                       0.19); both arms here are the transform's EXACT
                       invariants — per-pixel RGB-mean luma (gray-axis
                       projection; aHash ≤4 bits moved) for dual-band
                       candidates, verify = mean-luma thumb PSNR ≥28 dB
                       (true ≥34.6 vs distinct ≤21.3) AND rotation-
                       exact chroma-magnitude ZNCC ≥0.85 (true ≥0.978
                       vs distinct ≤0.56; also excludes s=0 grayscale
                       conversions by construction); planted recall
                       1.0, 0 false merges (rows-only; pytest pins)
  grayscale_image_dedup near-dup detection for GRAYSCALE RE-UPLOADS
                       (color→gray + re-encode) — the s=0 class the
                       hue/sat chroma arm excludes by construction.
                       Which converter the uploader used decides which
                       existing arm survives (601 is the G channel's
                       fixpoint at 43.8 dB; RGB-mean drops G thumb
                       PSNR to 20.5 and chroma ZNCC to 0.0), so
                       candidates hash BOTH luma projections (Rec601 +
                       RGB-mean dual bands, 32 rows/image; union
                       collision 20/20 per converter incl. 709) and
                       verify is converter-AGNOSTIC: least-squares fit
                       of the best linear converter over the colored
                       side's 3×16×16 channel thumbs vs the gray
                       side's thumb, residual PSNR ≥32 dB (true ≥48.4
                       for all three wild converters vs distinct
                       ≤21.8); both-chromatic pairs skipped (other
                       channels' job — zero false-merge surface on
                       colored content); planted recall 1.0, 0 false
                       merges (rows-only; pytest pins)
  degrade_image_dedup  per-class certification of the flagship
                       G-channel arms against the everyday
                       RECOMPRESSION family (blur σ2, half-res,
                       quarter-res, Bayer-dither palette quantize,
                       grain σ10, unsharp-mask): half-res / dither /
                       grain / sharpen pass thumb PSNR-28 outright;
                       blur σ2 and quarter-res expose the measured
                       bandwidth-mismatch gap (1/24 and 3/24 arm
                       misses) closed by the joint low-pass arm (8×8
                       box PSNR ≥25 ∧ 3×3 blur-matched ZNCC ≥0.93
                       under aHash ≤8; zero distinct false-passes);
                       blur σ4 documented OUT of class (8×8 margin
                       collapses to 0.3 dB — visually a different
                       asset); fixture rejection-samples bases so
                       cross pairs stay ≥2 dB below every gate;
                       per-class recall 1.0, 0 false merges
                       (rows-only; pytest pins)
  omni_image_dedup     the PRODUCTION COMPOSITION of the image
                       channels: ONE decode pass computes every
                       channel's signature, ONE unified band exchange
                       keys (channel<<24|slot<<8|bits) with per-channel
                       payloads riding their own rows, and the bucket
                       verifier dispatches to each channel's measured
                       kernel (Rec601 PSNR/ZNCC/trimmed-tile, rank
                       hist-match min-RGB, mean-luma+chroma, inset
                       sweep, orbit-aligned PSNR, rolled polar PSNR);
                       mixed fixture plants one dup per class
                       (re-encode, dihedral, letterbox, photometric,
                       tone-curve, hue/sat, overlay, rotation,
                       grayscale, blur σ2, half/quarter-res) —
                       per-class recall 1.0, zero false merges: the
                       channels COMPOSE without cross-channel false
                       amplification (rows-only; pytest pins)
  overlay_image_dedup  near-dup detection that survives a LOCALIZED
                       opaque edit (logo / timestamp / watermark box,
                       4-11% of frame): aHash banding survives because
                       the overlay touches few 8x8 blocks (6.6 bits
                       mean, measured), but global thumb PSNR FAILS
                       (true pairs bottom at 13.6 dB) — verify =
                       TRIMMED-TILE PSNR, worst 4 of 16 tiles dropped
                       ("best 75% must agree"): true ≥41.5 dB vs
                       distinct ≤24.7 dB; planted recall 1.0, 0 false
                       merges (rows-only; pytest pins)
  ctph_fuzzy_dedup     byte-stream near-dup via CTPH fuzzy hashing
                       (spamsum/ssdeep): ~100 B signature per file,
                       content-defined piece triggers resynchronize
                       through insert/delete edits; candidates = shared
                       7-gram at common blocksize (one packed-key LSH
                       exchange), verify = scaled edit distance of the
                       digests — planted recall 1.0, 0 false merges
                       incl. 1/8-overlap distractors (rows-only;
                       pytest pins + vectorized==scalar parity)
  letterbox_image_dedup near-dup detection that survives LETTERBOX /
                       PILLARBOX padding (uniform bars shift+rescale
                       content — plain banding blind): full-res
                       uniform-border trim → dual phash+aHash bands →
                       inset-sweep PSNR verify; planted recall 1.0, 0
                       false merges (rows-only; pytest pins)
  jfif_exif_stats      EXIF provenance extraction (APP1/TIFF IFD0:
                       make, model, orientation, DateTime) header-only
                       per row — per-camera counts + timestamp range;
                       rows without EXIF aggregate under "(none)"
                       (rows-only; pytest pins exact counts)
  exif_orientation_dedup metadata-GUIDED orientation-robust dedup:
                       camera-rotated re-uploads (pixels stored
                       rotated, EXIF Orientation set) normalized via
                       EXIF_ORIENT_FIX before phash/aHash banding —
                       1× signature cost and 16 band rows/image vs the
                       blind orbit expansion's 128 — planted recall
                       1.0, 0 false merges (rows-only; pytest pins)
  corpus_transcode_stats storage-transcode advisor: hash-sampled rows
                       through the REAL codec composition (decode →
                       T.81 JFIF encode → decode → PSNR vs source),
                       per-format size-ratio + fidelity table
                       (rows-only; stage parity test)
  sq8_ann_topk         int8 scalar-quantized (SQ8) ANN scan — 8× less
                       scan bandwidth than float64 — with exact
                       float64 re-rank of the per-batch shortlist;
                       shares ann_topk's brute-force oracle (oracle)
  embedding_pca_top1   top principal component via mergeable (n, Σx,
                       XᵀX) moment partials + exact driver eigh, then
                       a map-only per-label mean-projection pass
                       (rows-only; numpy parity test)
  events_autocorr      per-type lag-k autocorrelation (k=1..3) of the
                       value series in event_id order — EXACT limb-split
                       moment partials per range bucket, spanning pairs
                       stitched from the O(buckets·types·k) boundary
                       set; lag() UNION mirror (oracle)
  events_ks_drift      exact two-sample Kolmogorov–Smirnov drift
                       statistic between stream halves — binning-free
                       PSI complement; value-range buckets + exclusive
                       per-side count carries, cross-multiplied
                       integer gap max (oracle)
  events_mannwhitney_drift exact Mann–Whitney U / AUC between stream
                       halves — the rank-based drift member; one
                       value-range-bucket exchange, O(buckets) carry,
                       no float ranks; exact tie-correction term
                       (oracle)
  events_rolling_active_users rolling 7-day WAU — SLIDING-window
                       COUNT(DISTINCT): fact table reduces to the
                       distinct (user, day) domain first; the 7× window
                       expansion applies to that domain table only
                       (oracle)
  rp_ann_topk          Johnson-Lindenstrauss random-projection ANN:
                       deterministic ±1/√d' sign matrix, projected-space
                       shortlist per batch, exact full-dim re-rank of
                       the shortlist only (~13× less score compute at
                       d=256→16; rows-only + recall test)
  table_constraints_audit data-quality expectations pass — 8 exact
                       constraint counters (nulls, ranges, PK dups, FK
                       orphans both directions, declared-vs-actual
                       lengths): map-side partial counters, one distinct
                       exchange, dimension-keyset broadcasts (oracle)
  events_global_rank   exact global row_number (ORDER BY value DESC)
                       WITHOUT a global sort: histogram range buckets +
                       exclusive-prefix offsets + independent per-bucket
                       sorts — the TeraSort rank-assignment scan, output
                       thinned to every 100th rank (oracle)
  events_cumulative_users unique-users growth curve — cumulative
                       COUNT(DISTINCT) reformulated as first-occurrence
                       min aggregate (set-union prefix monoid collapsed
                       to a user-domain exchange) (oracle)
  events_hourly_gapfill densified (type, hour) counts with zero fill —
                       generate_series ⨯ dimension resample; the grid
                       is built on the domain-sized aggregate, never by
                       exploding the corpus (oracle)
  corpus_incremental_dedup second-backup workflow (D8 index update):
                       arriving shard probes the persisted base
                       signature index, base-base pairs masked, delta
                       rows anchor into existing cluster ids; combined
                       == from-scratch job (mismatch 0; rows-only)
  q17_small_quantity_revenue TPC-H Q17 per-group correlated scalar:
                       each row vs ITS part's average via exact
                       cross-multiplication, one partkey exchange (oracle)
  q15_top_supplier     TPC-H Q15 global argmax WITH TIES (view →
                       max → equality filter) (oracle)
  q4_order_priority_check TPC-H Q4 EXISTS semi-join (late-lineitem
                       adaptation), vectorized in-bucket EXISTS (oracle)
  q14_promo_revenue_share TPC-H Q14 broadcast part map + conditional
                       revenue partials, exact rational share (oracle)
  q18_large_volume_orders TPC-H Q18 HAVING-over-join top-k (oracle)
  q22_global_sales_opportunity TPC-H Q22 scalar-subquery threshold
                       (exact rational) + anti-join + aggregate (oracle)
  q10_returned_revenue TPC-H Q10 top-k customers by returned revenue:
                       2 chained exchanges, per-bucket top-k (oracle)
  q2_min_cost_supplier TPC-H Q2 groupwise argmin-with-ties join-back
                       over a DERIVED partsupp (distinct lineitem
                       pairs + deterministic integer columns, mirrored
                       in the oracle CTE) (oracle)
  q11_important_stock  TPC-H Q11 global-threshold group filter, exact
                       cross-multiplied predicate value·n > 2·total
                       (oracle)
  q16_supplier_part_counts TPC-H Q16 grouped COUNT DISTINCT with
                       NOT-IN complaint-supplier anti-join (oracle)
  q20_excess_stock_suppliers TPC-H Q20 correlated semi-join vs a
                       windowed grouped aggregate, pair-key rendezvous
                       (oracle)
  q13_order_count_distribution TPC-H Q13 left-join-then-histogram with
                       zero-order customers kept (oracle)
  q6_forecast_revenue  TPC-H Q6 scan-filter-aggregate: read-layer date
                       pruning + one exact int64 partial per block
                       (oracle)
  orders_monthly_stats calendar-month resample (date_trunc-equivalent
                       datetime64[M] bucketing, map-side partials)
                       (oracle)
  events_incremental_stats materialized-view maintenance: cached base
                       state + delta partials merge == full recompute,
                       certified by the full-table oracle (oracle)
  zorder_layout_stats  Z-order (Morton) layout audit: bit-interleave
                       tiles bound BOTH dims per tile, interleave
                       mirrored bit-for-bit in SQL (oracle)
  event_transitions    first-order Markov transition counts per user
                       sequence (lexsort + boundary-masked shift,
                       domain-sized reduce) (oracle)
  events_hourly_active_users exact windowed distinct count: batch-
                       local pair dedup, one hour-keyed exchange (oracle)
  events_recent_stats  predicate pushdown INTO the parquet read (row-
                       group pruning), WHERE-mirror oracle (oracle)
  event_type_cooccurrence market-basket pair support counts: local
                       distinct, user-keyed expand, pair-sum (oracle)
  events_type_top_values dense-rank <= k per type, ties included:
                       value-count profile + broadcast cutoffs (oracle)
  events_time_weighted_avg LOCF time-weighted mean over irregular
                       timelines, exact int64 rational (oracle)
  events_ewma          per-user EWMA (α=1/2, K-term): exact dyadic-
                       rational weighted ROWS frame, one user shuffle,
                       shifted-array fold (oracle)
  events_user_hour_ohlc per-(user, hour) OHLC bars: associative
                       first/last-by-(ts,id) + min/max fold, map-side
                       partials, bucket merge (oracle)
  events_value_rank    ties-inclusive cumulative rank (cume_dist
                       numerator) via domain-bounded value-count pass
                       + map-only searchsorted (oracle)
  events_type_sketch_percentiles grouped KLL sketch percentiles —
                       scale path when a group can't co-locate
                       (rows-only; rank-bound pytest)
  orders_lineitem_left_join LEFT OUTER join via tag-and-union +
                       per-bucket zero-fill (oracle)
  events_value_delta   lag window: per-user consecutive value delta,
                       nullable firsts (oracle)
  docs_jsonl_stats     JSONL ingest round trip through the
                       sources.read_table format dispatch (oracle)
  lineitem_cube        GROUP BY CUBE, cube-from-finest (oracle)
  source_token_entropy per-source Shannon entropy of the token
                       distribution, integer-micro quantized (oracle)
  events_props_stats   semi-structured JSON-field extraction via
                       vectorized regex, then grouped stats (oracle)
  cust_orders_full_join FULL OUTER join via tag-and-union +
                       two-sided zero-fill (oracle)
  events_weighted_sample deterministic weighted sampling w/o
                       replacement (exponential ranks, hash uniform,
                       k per group) (oracle)
  events_version_diff  two-snapshot reconciliation: added/removed/
                       changed/same in one tag-and-union pass (oracle)
  user_event_paths     grouped ORDERED string_agg: per-user event
                       journey, width-bounded (oracle)
  audio_wav_stats      audio multimodal path: real WAV PCM decode via
                       the AudioFeatures actor pool (rows-only;
                       exact pytest)
  audio_format_convert_dedup lossless audio container-conversion dups:
                       the same recording re-hosted as FLAC (two
                       blocksizes) / IEEE-float WAV, canonical-PCM
                       SHA band family, exact verify (rows-only;
                       recall pytest-pinned)
  audio_container_stats mixed wav+flac corpus through the one
                       AudioFeatures dispatch (pure-numpy CRC-verified
                       FLAC decoder) (rows-only; exact pytest)
  audio_quarantine_stats audio poison-row dead-letter routing: CRC-
                       flipped / truncated FLAC, garbage, unknown
                       containers quarantine with attribution
                       (rows-only; exact pytest)
  video_container_stats per-container video attribution through one
                       dispatch: MJPEG-AVI full decode, WebM EBML walk
                       + VP8 key-frame decode, MP4 box-tree metadata
                       (codec fourcc seam), inter-only/garbage
                       quarantine with attribution (rows-only; exact
                       pytest)
  events_user_mode     grouped mode/argmax via map-side-combined pair
                       counts + per-group top-1 (oracle)
  training_mix_sample  mixture construction: per-source hash-ranked
                       quotas hitting target weights (oracle)
  docs_stopword_profile per-source stopword density (fixed 20-word
                       list, one re2 split + is_in) (oracle)
  docs_prefix_cluster_sizes prefix-fingerprint dedup group-size
                       histogram (collapse-factor sizing) (oracle)
  docs_zipf_slope      Zipf log-log OLS over the vocab-bounded token
                       frequency table (oracle)
  simhash64_shingle_pairs oracle-verified SimHash near-dup PAIRS: 64-bit
                       md5 Charikar fingerprints, 8x8-bit bands
                       (EXACT for hamming<=7 by pigeonhole), popcount
                       verify — the whole band topology certified by
                       the all-pairs SQL mirror (oracle)
  token_cms_md5        oracle-verified Count-Min sketch: d x width md5
                       grid reproduced cell-for-cell in SQL, min-reads
                       for the exact top-k tokens (oracle)
  token_bloom_md5      oracle-verified Bloom filter (destor B1): bit
                       set + membership answers reproduced in SQL —
                       no-false-negative invariant certified (oracle)
  events_funnel_conversion strictly-ordered view->click->purchase
                       funnel, earliest-chain semantics (oracle)
  events_daily_anomaly per-type daily-volume 2-sigma screen in exact
                       integer arithmetic (oracle)
  events_bounce_rate   session bounce by first-event type on the
                       engine's sessionization rule (oracle)
  events_props_field_stats semi-structured leg: JSON props field via
                       the vectorized RE2 kernel, exact grouped
                       aggregates + distinct (oracle)
  events_type_hll_users_md5 ORACLE-VERIFIED HyperLogLog: md5-derived
                       hash, registers reproduced bit-for-bit in SQL
                       (exact bin()-length ranks), identical
                       estimator expression (oracle)
  customer_order_gap_stats per-segment inter-order day gaps via one
                       custkey tag-and-union rendezvous (oracle)
  supplier_revenue_pareto revenue-concentration prefix (exact-int
                       cum-share thresholds) (oracle)
  lsh_param_sweep, corpus_phash_topk, corpus_aspect_buckets gained
                       DuckDB oracles this round (md5-OPH mirror /
                       bit_count Hamming / metadata-only bucket math
                       over the corpus parquet read directly by SQL)
  bigram_pmi           collocation mining: top-k bigrams by PMI,
                       micro-quantized (oracle)
  unigram_logprob      unigram LM quality score: train counts → top-V
                       broadcast model → map-only scoring (oracle)
  distinct_tokens_exact exact per-lang distinct tokens: local dedup →
                       one token-keyed shuffle → partial counts (oracle)
  distinct_token_stats HyperLogLog distinct-token cardinality, mergeable
                       registers, no shuffle (rows-only; pytest error bound)
  lineitem_pricing_summary / customer_order_stats / top_parts_by_quantity /
  part_type_revenue / supplier_region_stats  relational surface (oracles;
                       partitioned join, broadcast map-join, multi-way join)
  ann_topk             brute-force cosine top-k similarity search (oracle)
  lsh_bucket_topk      LSH-bucketed ANN (scale path; rows-only)
  ivf_topk             IVF ANN: deterministic k-means coarse quantizer + n_probe cells (rows-only)
  pq_index_topk        product-quantization ADC top-k over a
                       materialized uint8-codes index (32x compressed
                       scan; recall-tested vs brute force)
  ivfpq_topk           IVF+PQ composed index: probed-cell scan +
                       residual ADC + exact re-rank (recall-tested)
  ivf_index_topk       IVF over a MATERIALIZED hive-partitioned index —
                       probe cells pruned at the read (rows-only; pytest
                       asserts equality with ivf_topk)
  embedding_dedup_pairs exact block-grid cosine self-join (oracle)
  embedding_lsh_pairs  approximate hyperplane-band pairs (rows-only)
  embedding_clusters   CC over cosine pairs (rows-only)
  semantic_dedup       SemDeDup: k-means partition + in-cluster cosine
                       prune, keep-lowest-id representative (oracle)
  job_gc_stats         X1-X3 CMA GC across two jobs: refcounts + invalidation (rows-only)
  fsl_trace_stats      S4 FSL hashfile trace reader → parquet → aggregate (rows-only)
  corpus_restore       T1-T5 real restore: gather payloads from cluster reps + decode-verify (rows-only)
  corpus_dedup_clusters flagship: image+caption near-dup clustering (rows-only)
  corpus_exact_dedup   flagship exact channel on the synthetic corpus (rows-only)
  corpus_probe_index   online query-by-image: broadcast query band
                       micro-index, map-only semi-join + verify over
                       the corpus (destor's index probe as a serving
                       path; rows-only + planted test)
  corpus_dedup_manifest tier-dedup write decision: per-cluster best-
                       quality keeper (max w×h, tie min id) + exact
                       saved-bytes accounting (destor W2/W5 with a
                       quality keeper rule; rows-only + planted-plan test)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CORPUS_ROWS = {  # deterministic synthetic corpus size per driver sf dir
    "sf0.001": 400,
    "sf0.01": 1000,
    "sf0.1": 4000,
}


def _corpus_rows_for(sf_dir: str) -> int:
    for key, n in _CORPUS_ROWS.items():
        if sf_dir.rstrip("/").endswith(key):
            return n
    return 400


def _corpus_probe_index(sf_dir: str):
    """(query_id, match_id, psnr) — ONLINE query-by-image: probe the
    corpus's LSH band index with a handful of query rows (destor's
    index_lookup_base / champion probe as a serving path). Map-only:
    the query micro-index is broadcast; no corpus shuffle. Queries are
    the planted dup rows of the last full block (resize / exact /
    re-encode / crop / caption-para) plus a distractor that must match
    nothing."""
    import pyarrow.dataset as pads

    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages import candidates
    from destor_ray.stages.signature import compute_signatures

    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    cfg = EngineConfig()

    last_block = (n // corpus.BLOCK) - 1
    qrows = [last_block * corpus.BLOCK + s for s in (3, 5, 7, 11, 15, 19)]
    qids = [f"img{i:010d}" for i in qrows]
    qtab = pads.dataset(d).to_table(
        filter=pads.field("image_id").isin(qids))
    qsigs = compute_signatures(qtab, cfg)

    import ray.data as rd
    sigs = signatures_from_corpus(rd.read_parquet(d), cfg)
    hits = candidates.probe_index(sigs, qsigs, cfg).to_pandas()
    hits["query_id"] = [f"img{int(i):010d}" for i in hits["query_id"]]
    hits["match_id"] = [f"img{int(i):010d}" for i in hits["match_id"]]
    return hits.sort_values(["query_id", "match_id"]).reset_index(drop=True)


def _corpus_dedup_manifest(sf_dir: str):
    """(cluster_id, rep_id, n_members, total_bytes, stored_bytes,
    saved_bytes) — TIER DEDUP write decision: per flagship cluster keep
    the best-quality member (max w×h, tie min image_id) and account the
    saved storage (destor W2/W5 recast with a quality keeper rule)."""
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import (dedup_pipeline_from_dir,
                                            quality_rep_manifest)
    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    assignment = dedup_pipeline_from_dir(d)
    return quality_rep_manifest(assignment, d)


def _corpus_clusters(sf_dir: str):
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    return dedup_pipeline_from_dir(d)


def _corpus_gate_sweep(sf_dir: str):
    """(gate_centi_db, n_pairs, n_planted_hit, n_distractor_pairs,
    n_other_pairs, recall_ppm) — the verify-gate OPERATING CURVE: the
    flagship's candidate edges re-verified at a deliberately low PSNR
    threshold (18 dB) and swept against the planted ground truth at
    every production-relevant gate, so an operator reads off where
    recall is still 1.0 and false merges have died — the tuning table
    behind the default 25 dB (corpus v5 measured: planted resize pairs
    bottom at 28.7 dB thumb PSNR, distractors sit far lower). Columns:
    pairs surviving the gate, planted true pairs among them, planted
    near-miss distractor pairs (the hardest true negatives), other
    (cross-truth-cluster) pairs, and pair recall.

    Scale shape: identical to the flagship (one band exchange, inline
    verify) — only the gate constant differs; the sweep itself runs on
    the pair-deduped edge list (dup-mass-sized, driver-safe at fixture
    scale; at corpus scale it is one groupby over gate buckets)."""
    import dataclasses

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import buckets_for, signatures_from_corpus
    from destor_ray.stages import candidates

    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    cfg = EngineConfig()
    cfg = dataclasses.replace(
        cfg, verify=dataclasses.replace(cfg.verify, psnr_threshold=18.0))
    sigs = signatures_from_corpus(ray.data.read_parquet(d), cfg) \
        .materialize()
    edges = candidates.candidate_edges(sigs, cfg,
                                       num_buckets=buckets_for(n))

    def canon(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(l, r), np.maximum(l, r)
        df = pd.DataFrame({
            "l": lo, "r": hi,
            "psnr": batch["psnr"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["l", "r"], sort=False)["psnr"].max() \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Max
    pairs = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["l", "r"]).aggregate(Max("psnr", alias_name="psnr")) \
        .to_pandas()

    plan = corpus.dup_plan_table(n)
    planted, distract = set(), set()
    for left, right, kind in zip(plan["left_id"].to_pylist(),
                                 plan["right_id"].to_pylist(),
                                 plan["kind"].to_pylist()):
        key = tuple(sorted((corpus.row_index_of(left),
                            corpus.row_index_of(right))))
        (distract if kind == "distractor_near_miss" else planted).add(key)
    truth = {i: corpus.truth_cluster(i) for i in range(n)}

    pk = list(zip(pairs["l"].astype(int), pairs["r"].astype(int)))
    ps = pairs["psnr"].to_numpy()
    is_planted = np.array([k in planted for k in pk])
    is_distract = np.array([k in distract for k in pk])
    same_truth = np.array([truth[a] == truth[b] for a, b in pk])
    # "other" = pairs joining rows of DIFFERENT truth clusters that are
    # not the planted distractors (any such pair is a false merge)
    is_other = ~same_truth & ~is_distract

    rows = []
    for gate in (1800, 2000, 2200, 2500, 2800, 3000, 3200, 3500, 4000):
        keep = ps >= gate / 100.0
        hit = int((keep & is_planted).sum())
        rows.append((gate, int(keep.sum()), hit,
                     int((keep & is_distract).sum()),
                     int((keep & is_other).sum()),
                     hit * 1_000_000 // max(1, len(planted))))
    return pa.table({
        "gate_centi_db": pa.array([r[0] for r in rows], pa.int64()),
        "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "n_planted_hit": pa.array([r[2] for r in rows], pa.int64()),
        "n_distractor_pairs": pa.array([r[3] for r in rows], pa.int64()),
        "n_other_pairs": pa.array([r[4] for r in rows], pa.int64()),
        "recall_ppm": pa.array([r[5] for r in rows], pa.int64()),
    })


def _corpus_dedup_shard_matrix(sf_dir: str, shard_rows: int = 1000):
    """(shard_a, shard_b, n_pairs) — CROSS-SHARD duplication
    attribution: which input shards duplicate against which (the 100 TB
    ops question behind "which crawl dumps overlap" / "is the dup mass
    intra-dump or cross-dump", and destor's container-locality concern
    W3 read sideways: shard_a == shard_b rows are container-local dup
    mass, off-diagonal rows are the fragmentation the rewrite family
    exists to fight). Shard id = nid // shard_rows — the corpus writer's
    file layout, so the matrix is per input FILE.

    Scale shape: the verified edge stream is globally pair-deduped
    through one (l, r)-keyed exchange (edges arrive band-duplicated
    from inline verify), then collapsed map-side to shard-pair partials
    into a shard-domain (tiny) aggregate. Payloads/thumbs never appear;
    only 16-byte edge rows move."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import buckets_for, signatures_from_corpus
    from destor_ray.stages import candidates

    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    cfg = EngineConfig()
    sigs = signatures_from_corpus(ray.data.read_parquet(d), cfg).materialize()
    edges = candidates.candidate_edges(sigs, cfg,
                                       num_buckets=buckets_for(n))

    def canon(batch: pa.Table) -> pa.Table:
        l = batch["left_id"].to_numpy(zero_copy_only=False)
        r = batch["right_id"].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(l, r), np.maximum(l, r)
        df = pd.DataFrame({"l": lo, "r": hi}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    # global pair dedup: one (l, r)-keyed exchange (Count is unused —
    # the groupby's key set IS the distinct pair set)
    from ray.data.aggregate import Count
    distinct_pairs = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby(["l", "r"]).aggregate(Count(alias_name="_c"))

    def to_shards(batch: pa.Table) -> pa.Table:
        l = batch["l"].to_numpy(zero_copy_only=False) // shard_rows
        r = batch["r"].to_numpy(zero_copy_only=False) // shard_rows
        lo, hi = np.minimum(l, r), np.maximum(l, r)
        g = pd.DataFrame({"shard_a": lo, "shard_b": hi, "n": 1}) \
            .groupby(["shard_a", "shard_b"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    out = distinct_pairs.map_batches(to_shards, batch_format="pyarrow") \
        .groupby(["shard_a", "shard_b"]) \
        .aggregate(Sum("n", alias_name="n_pairs"))

    def fix(batch: pa.Table) -> pa.Table:
        return pa.table({
            "shard_a": batch["shard_a"].cast(pa.int64()),
            "shard_b": batch["shard_b"].cast(pa.int64()),
            "n_pairs": batch["n_pairs"].cast(pa.int64()),
        })

    return out.map_batches(fix, batch_format="pyarrow")


def _corpus_augment_stats(sf_dir: str, epoch: int = 0):
    """(aug, n, mean_phash_hamming_centi) — the data-AUGMENTATION stage
    of a training pipeline (seeded per-image flip/rotate on an actor
    pool) measured for its effect on the dedup signature: how far does
    each augmentation move the perceptual hash? The answer (far — DCT
    basis permutes under flips/rotations) is the measured justification
    for verifying candidates on pixels (thumb PSNR) rather than trusting
    phash equality across an augmented corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum
    from destor_ray import corpus
    from destor_ray.stages.multimodal import ImageAugment

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes"])
    out = ds.map_batches(ImageAugment, concurrency=4, batch_size=256,
                         fn_constructor_kwargs={"epoch": epoch},
                         batch_format="pyarrow")
    agg = out.groupby("aug").aggregate(
        Count(alias_name="n"),
        Sum("phash_hamming", alias_name="ham_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "aug": b["aug"],
            "n": b["n"].cast(pa.int64()),
            "mean_phash_hamming_centi": pa.array(
                b["ham_sum"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False) * 100
                // b["n"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                pa.int64()),
        }), batch_format="pyarrow")


def _corpus_copymove_stats(sf_dir: str):
    """(fmt, n, mean_repeat_pct_centi, n_suspicious) — copy-move /
    synthetic-content screen over the corpus: fraction of 8×8 tiles
    that repeat within each image (ImageTileForensics), per-format.
    n_suspicious counts images whose repeated-tile share exceeds 30%
    while keeping high tile diversity (the forged-clone signature;
    flat fills repeat too but with low distinct counts)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from destor_ray import corpus
    from destor_ray.stages.multimodal import ImageTileForensics

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt"])

    class WithFmt(ImageTileForensics):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            nt = out["n_tiles"].to_numpy().astype(np.float64)
            nr = out["n_repeated_tiles"].to_numpy().astype(np.float64)
            nd = out["n_distinct_tiles"].to_numpy().astype(np.float64)
            share = np.where(nt > 0, nr / np.maximum(nt, 1), 0.0)
            diverse = np.where(nt > 0, nd / np.maximum(nt, 1), 0.0)
            sus = ((share > 0.3) & (diverse > 0.3)).astype(np.int64)
            import pandas as pd
            g = pd.DataFrame({
                "fmt": batch["fmt"].to_pylist(),
                "n": 1,
                "rep_centi": np.round(share * 10000).astype(np.int64),
                "sus": sus,
            }).groupby("fmt", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False) \
                .replace_schema_metadata(None)

    agg = ds.map_batches(WithFmt, concurrency=4, batch_size=256,
                         batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Sum("n", alias_name="n"),
            Sum("rep_centi", alias_name="rep_sum"),
            Sum("sus", alias_name="n_suspicious"))
    return agg.map_batches(
        lambda b: pa.table({
            "fmt": b["fmt"],
            "n": b["n"].cast(pa.int64()),
            "mean_repeat_pct_centi": pa.array(
                b["rep_sum"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False)
                // b["n"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                pa.int64()),
            "n_suspicious": b["n_suspicious"].cast(pa.int64()),
        }), batch_format="pyarrow")


def _corpus_compressibility(sf_dir: str, probe_bytes: int = 2048):
    """(fmt, n, mean_ratio_centi) — COMPRESSIBILITY probe for storage
    planning: zlib-compress the first `probe_bytes` of each payload and
    report compressed/original size per format (already-compressed
    formats hover near 100%+; raw/periodic payloads drop — the number
    that decides whether a storage tier enables transparent
    compression, destor's container-compression policy question).
    Map-only over a payload PREFIX (the probe never decompresses or
    decodes), per-format integer partials, one tiny exchange."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from destor_ray import corpus

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["bytes", "fmt"])

    def probe(batch: pa.Table) -> pa.Table:
        ratios = []
        for data in batch["bytes"].to_pylist():
            head = data[:probe_bytes]
            ratios.append(len(zlib.compress(head, 6)) * 10000
                          // max(1, len(head)))
        import pandas as pd
        g = pd.DataFrame({"fmt": batch["fmt"].to_pylist(),
                          "n": 1,
                          "r": np.asarray(ratios, np.int64)}) \
            .groupby("fmt", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = ds.map_batches(probe, batch_format="pyarrow") \
        .groupby("fmt").aggregate(Sum("n", alias_name="n"),
                                  Sum("r", alias_name="r_sum"))
    return agg.map_batches(
        lambda b: pa.table({
            "fmt": b["fmt"],
            "n": b["n"].cast(pa.int64()),
            "mean_ratio_centi": pa.array(
                b["r_sum"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // b["n"].cast(pa.int64()).to_numpy(zero_copy_only=False),
                pa.int64()),
        }), batch_format="pyarrow")


def _corpus_dedup_weights(sf_dir: str):
    """(cluster_size, n_images, weight_micro) — dedup-aware TRAINING
    WEIGHTS: instead of dropping duplicates, keep every image and
    down-weight each member by 1/cluster_size (the reweighting
    alternative to removal — preserves coverage while a cluster's total
    gradient contribution equals one image's; what a loss-reweighting
    trainer consumes). weight_micro = 1_000_000 // cluster_size, one
    row per distinct cluster size (the weight table is size-domain-
    bounded; the per-image expansion is a broadcast-free map join on
    cluster_id at train time).

    Scale shape: flagship assignment → one cluster-keyed Count
    exchange → one tiny size-domain aggregate."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    assignment = _corpus_clusters(sf_dir)
    sizes = assignment.groupby("cluster_id").aggregate(
        Count(alias_name="sz"))
    hist = sizes.map_batches(
        lambda b: pa.table({
            "cluster_size": b["sz"].cast(pa.int64()),
            "n_img": b["sz"].cast(pa.int64()),
            "one": pa.array([1] * b.num_rows, pa.int64())}),
        batch_format="pyarrow") \
        .groupby("cluster_size").aggregate(
            Sum("n_img", alias_name="n_images"),
            Sum("one", alias_name="n_clusters")).to_pandas() \
        .sort_values("cluster_size")
    cs = hist["cluster_size"].to_numpy(np.int64)
    return pd.DataFrame({
        "cluster_size": cs,
        "n_images": hist["n_images"].to_numpy(np.int64),
        "weight_micro": (1_000_000 // cs).astype(np.int64),
    })


def _corpus_hard_negatives(sf_dir: str):
    """(anchor, negative, psnr_centi, phash_hamming) — HARD-NEGATIVE
    mining over the corpus: LSH band collisions that FAILED the
    PSNR/phash verify, globally pair-deduped. The training-data
    counterpart of dedup: contrastive / metric-learning pipelines want
    exactly these look-alike-but-distinct pairs (the planted
    distractor_near_miss rows land here by construction, tested), and
    they come FREE from the dedup job's own candidate stream — one
    band exchange plus a tiny pair-dedup groupby."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Min
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import buckets_for, signatures_from_corpus
    from destor_ray.stages import candidates

    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    sigs = signatures_from_corpus(ray.data.read_parquet(d)).materialize()
    pairs = candidates.hard_negative_pairs(sigs,
                                           num_buckets=buckets_for(n))
    out = pairs.groupby(["anchor", "negative"]).aggregate(
        Min("psnr_centi", alias_name="psnr_centi"),
        Min("phash_hamming", alias_name="phash_hamming"))
    return out.map_batches(
        lambda b: pa.table({
            "anchor": b["anchor"].cast(pa.int64()),
            "negative": b["negative"].cast(pa.int64()),
            "psnr_centi": b["psnr_centi"].cast(pa.int64()),
            "phash_hamming": b["phash_hamming"].cast(pa.int64())}),
        batch_format="pyarrow")


def _corpus_cluster_caption_audit(sf_dir: str):
    """(n_distinct_captions, n_clusters, n_images) — LABEL-NOISE audit
    of the flagship clusters: per near-dup cluster, how many DISTINCT
    captions do its members carry? Diversity 1 = consistent labels
    (exact/reencode/crop keep the source caption); diversity >= 2 =
    the caption-paraphrase dup channel or genuine label noise — the
    table a curation team reads before deciding whether the keeper's
    caption can stand for the whole cluster (tier-dedup manifest's
    caption contract).

    Scale shape: ONE image_id-keyed exchange attaches captions to
    cluster ids (tag-and-union, captions never broadcast), then two
    domain-sized groupbys: (cluster, caption) distinct → per-cluster
    diversity → tiny histogram."""
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum
    from destor_ray import corpus
    from destor_ray.stages.grouped import bucketed_group_map

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    assignment = _corpus_clusters(sf_dir)
    caps = ray.data.read_parquet(d, columns=["image_id", "caption"])

    tagged = assignment.map_batches(
        lambda b: pa.table({"image_id": b["image_id"],
                            "val": b["cluster_id"],
                            "is_asg": pa.array([1] * b.num_rows,
                                               pa.int64())}),
        batch_format="pyarrow").union(caps.map_batches(
            lambda b: pa.table({"image_id": b["image_id"],
                                "val": b["caption"],
                                "is_asg": pa.array([0] * b.num_rows,
                                                   pa.int64())}),
            batch_format="pyarrow"))

    def attach(df: pd.DataFrame) -> pa.Table:
        a = df[df["is_asg"] == 1][["image_id", "val"]] \
            .rename(columns={"val": "cluster_id"})
        c = df[df["is_asg"] == 0][["image_id", "val"]] \
            .rename(columns={"val": "caption"})
        m = a.merge(c, on="image_id")
        return pa.table({
            "cluster_id": pa.array(m["cluster_id"], pa.string()),
            "caption": pa.array(m["caption"], pa.string()),
        })

    pairs = bucketed_group_map(tagged, "image_id", attach, num_buckets=32)
    per_cc = pairs.groupby(["cluster_id", "caption"]) \
        .aggregate(Count(alias_name="n_imgs"))
    per_cluster = per_cc.groupby("cluster_id").aggregate(
        Count(alias_name="n_distinct_captions"),
        Sum("n_imgs", alias_name="n_members"))

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_distinct_captions": batch["n_distinct_captions"]
            .cast(pa.int64()),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
            "n_members": batch["n_members"].cast(pa.int64()),
        })

    hist = per_cluster.map_batches(shape, batch_format="pyarrow") \
        .groupby("n_distinct_captions").aggregate(
            Sum("one", alias_name="n_clusters"),
            Sum("n_members", alias_name="n_images"))
    return hist.map_batches(
        lambda b: pa.table({
            "n_distinct_captions": b["n_distinct_captions"],
            "n_clusters": b["n_clusters"].cast(pa.int64()),
            "n_images": b["n_images"].cast(pa.int64())}),
        batch_format="pyarrow")


def _corpus_incremental_dedup(sf_dir: str):
    """(metric, value) — the SECOND-backup workflow (destor D8 index
    update at corpus scale, pipelines/job.run_incremental_job): a base
    job persists its signature index + assignment; the arriving tail
    shard (the last 40% of rows, split mid-block so planted dups cross
    the boundary) dedups against that index with base-base pairs
    masked, anchors into existing base clusters through one nid-keyed
    exchange, and the combined assignment is compared row-for-row
    against a from-scratch job over everything (mismatch_vs_full = 0
    is the invariant)."""
    import os
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq_
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import dedup_pipeline_from_dir
    from destor_ray.pipelines.job import run_backup_job, run_incremental_job

    n = _corpus_rows_for(sf_dir)
    k = (int(n * 0.6) // 20) * 20 + 10  # mid-block split
    full_dir = corpus.ensure_corpus_parquet(n, seed=42)
    t = pq_.ParquetDataset(full_dir).read()
    nid = np.array([int(s[3:]) for s in t["image_id"].to_pylist()])
    t = t.take(np.argsort(nid))
    root = f"/tmp/destor_ray_incr_q/n{n}"
    if os.path.exists(root):
        shutil.rmtree(root)
    for name, tbl in (("base_corpus", t.slice(0, k)),
                      ("delta_corpus", t.slice(k))):
        os.makedirs(os.path.join(root, name))
        pq_.write_table(tbl, os.path.join(root, name, "part.parquet"))
    run_backup_job(os.path.join(root, "base_corpus"),
                   os.path.join(root, "base_wd"))
    inc = run_incremental_job(os.path.join(root, "delta_corpus"),
                              os.path.join(root, "inc_wd"),
                              os.path.join(root, "base_wd"))
    adf = inc["assignment"].to_pandas()
    got = dict(zip(adf["image_id"], adf["cluster_id"]))
    full = dedup_pipeline_from_dir(full_dir).to_pandas()
    mism = sum(1 for i, c in zip(full.image_id, full.cluster_id)
               if got.get(i) != c)
    m = inc["metrics"]
    return pd.DataFrame({
        "metric": ["n_base", "n_delta", "joined_existing",
                   "new_originals", "base_cluster_merges",
                   "mismatch_vs_full"],
        "value": np.array([k, m["n_delta"], m["joined_existing"],
                           m["new_originals"], m["base_cluster_merges"],
                           mism], np.int64),
    })


def _corpus_dedup_simulation(sf_dir: str):
    """Flagship in simulation mode (metadata-only dry run — destor's
    simulation levels analog): no payload decode, phash-Hamming verify."""
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import dedup_pipeline
    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    return dedup_pipeline(ray.data.read_parquet(d),
                          EngineConfig(simulation=True), n_rows_hint=n)


def _corpus_exact(sf_dir: str):
    import ray.data
    from destor_ray import corpus
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages.exact import exact_dedup
    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    return exact_dedup(signatures_from_corpus(ray.data.read_parquet(d)))


def _corpus_resize_stats(sf_dir: str, out_size: int = 32):
    """(fmt, n, sum_thumb_bytes, mean_w, mean_h): the multimodal image
    actor-pool stage (decode → resize → gray thumbnail) driven
    end-to-end over the corpus, reduced to per-format stats. The
    decode stage is a callable CLASS on an actor pool (setup once per
    actor), concurrency-bounded; only the small thumb stats reach the
    aggregate."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count, Sum
    from destor_ray import corpus
    from destor_ray.stages.multimodal import ImageDecodeResize

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt"])

    cls = ImageDecodeResize
    # keep fmt alongside: wrap the stage so the group key survives
    class WithFmt(cls):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            tb = np.fromiter((len(t) for t in out["thumb"].to_pylist()),
                             dtype=np.int64, count=len(out))
            return pa.table({
                "fmt": batch["fmt"],
                "thumb_bytes": pa.array(tb, pa.int64()),
                "w": out["w"].cast(pa.int64()),
                "h": out["h"].cast(pa.int64()),
            })

    stats = ds.map_batches(WithFmt, concurrency=4, batch_size=256,
                           fn_constructor_kwargs={"out_size": out_size},
                           batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Count(alias_name="n"),
            Sum("thumb_bytes", alias_name="sum_thumb_bytes"),
            Sum("w", alias_name="sum_w"),
            Sum("h", alias_name="sum_h"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "fmt": batch["fmt"],
            "n": batch["n"],
            "sum_thumb_bytes": pc.cast(batch["sum_thumb_bytes"], pa.int64()),
            "mean_w": pa.array(np.round(
                batch["sum_w"].to_numpy(zero_copy_only=False) / n, 3),
                pa.float64()),
            "mean_h": pa.array(np.round(
                batch["sum_h"].to_numpy(zero_copy_only=False) / n, 3),
                pa.float64()),
        })

    return stats.map_batches(finish, batch_format="pyarrow")


def _corpus_pixel_quality(sf_dir: str, flat_thresh: float = 1.0):
    """(fmt, n, mean_luma, mean_entropy_bits, mean_laplacian_var,
    n_low_detail): the image-corpus QUALITY-SCORING pass — decode on an
    actor pool, per-image luma/entropy/Laplacian-variance features
    (ImagePixelStats), reduced map-side to per-format partial sums so
    only format-domain rows reach the exchange. n_low_detail counts
    images a blur/flatness filter (laplacian_var < flat_thresh) would
    drop before training."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from destor_ray import corpus
    from destor_ray.stages.multimodal import ImagePixelStats

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt"])

    class WithFmt(ImagePixelStats):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            import pandas as pd
            df = pd.DataFrame({
                "fmt": batch["fmt"].to_pylist(),
                "luma": out["luma_mean"].to_numpy(),
                "ent": out["entropy_bits"].to_numpy(),
                "lap": out["laplacian_var"].to_numpy(),
                "low": (out["laplacian_var"].to_numpy()
                        < flat_thresh).astype(np.int64),
                "n": 1,
            })
            g = df.groupby("fmt", sort=False).sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False) \
                .replace_schema_metadata(None)

    agg = ds.map_batches(WithFmt, concurrency=4, batch_size=256,
                         batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Sum("n", alias_name="n"), Sum("luma", alias_name="s_luma"),
            Sum("ent", alias_name="s_ent"), Sum("lap", alias_name="s_lap"),
            Sum("low", alias_name="n_low_detail"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "fmt": batch["fmt"],
            "n": batch["n"].cast(pa.int64()),
            "mean_luma": pa.array(np.round(
                batch["s_luma"].to_numpy(zero_copy_only=False) / n, 4),
                pa.float64()),
            "mean_entropy_bits": pa.array(np.round(
                batch["s_ent"].to_numpy(zero_copy_only=False) / n, 4),
                pa.float64()),
            "mean_laplacian_var": pa.array(np.round(
                batch["s_lap"].to_numpy(zero_copy_only=False) / n, 4),
                pa.float64()),
            "n_low_detail": batch["n_low_detail"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _corpus_transcode_stats(sf_dir: str, quality: int = 85,
                            mod: int = 8):
    """(fmt, n, bytes_in, bytes_out, mean_ratio_centi, mean_psnr_centi,
    min_psnr_centi) — the STORAGE-TRANSCODE advisor: would re-encoding
    this corpus as real baseline JFIF JPEG at `quality` save bytes,
    and at what fidelity cost? Runs the full production-codec
    composition per sampled row (decode DRI1/PNG → T.81 encode →
    T.81 decode → PSNR vs source pixels) on an actor pool, folded to
    per-format partials map-side so only format-domain rows reach the
    exchange.

    The corpus is hash-SAMPLED (md5(image_id) % mod == 0 — the
    dedup_ratio_estimate convention: deterministic, content-keyed, so
    reruns and resumes sample identically): the pure-Python entropy
    coder makes full-corpus transcode a cluster job, and a 1/mod
    sample already answers the advisor question. ratio/psnr means are
    recombined from exact integer sums."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Min, Sum

    from destor_ray import corpus
    from destor_ray.stages.multimodal import JpegTranscoder

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["image_id", "bytes", "fmt"])

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        keep = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                            "big") % mod == 0 for s in ids),
            dtype=bool, count=len(ids))
        return batch.filter(pa.array(keep))

    rows = ds.map_batches(sample, batch_format="pyarrow") \
        .map_batches(JpegTranscoder,
                     fn_constructor_kwargs={"quality": quality},
                     concurrency=4, batch_size=64,
                     batch_format="pyarrow")

    agg = rows.map_batches(
        lambda b: pa.table({
            "fmt": b["fmt"], "n": pa.array([1] * len(b["fmt"]),
                                           pa.int64()),
            "bytes_in": b["bytes_in"], "bytes_out": b["bytes_out"],
            "psnr_centi": b["psnr_centi"],
            "min_psnr": b["psnr_centi"]}),
        batch_format="pyarrow") \
        .groupby("fmt").aggregate(
            Sum("n", alias_name="n"),
            Sum("bytes_in", alias_name="bytes_in"),
            Sum("bytes_out", alias_name="bytes_out"),
            Sum("psnr_centi", alias_name="s_psnr"),
            Min("min_psnr", alias_name="min_psnr_centi"))

    def finish(batch: pa.Table) -> pa.Table:
        import numpy as np
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        bi = batch["bytes_in"].to_numpy(zero_copy_only=False)
        bo = batch["bytes_out"].to_numpy(zero_copy_only=False)
        sp = batch["s_psnr"].to_numpy(zero_copy_only=False)
        return pa.table({
            "fmt": batch["fmt"],
            "n": pa.array(n, pa.int64()),
            "bytes_in": pa.array(bi.astype(np.int64), pa.int64()),
            "bytes_out": pa.array(bo.astype(np.int64), pa.int64()),
            "mean_ratio_centi": pa.array(
                np.round(bo * 100.0 / bi).astype(np.int64), pa.int64()),
            "mean_psnr_centi": pa.array(
                np.round(sp / n).astype(np.int64), pa.int64()),
            "min_psnr_centi": batch["min_psnr_centi"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_ASPECT_BUCKETS = [(256, 1024), (384, 768), (512, 768), (512, 512),
                   (768, 512), (768, 384), (1024, 256)]


def _corpus_aspect_buckets(sf_dir: str, batch_rows: int = 64):
    """(bucket_w, bucket_h, n, n_full_batches, pct_pixels_kept) —
    ASPECT-RATIO BUCKETING, the batching layout step an image-training
    pipeline runs before resizing (group images by nearest aspect
    ratio so a batch shares one target shape and crops waste minimal
    pixels; the SDXL-style bucketed-batch strategy). Assignment is a
    pure function of (w, h): nearest bucket by |log(ar) - log(bar)|,
    ties to the squarer bucket (list order).

    Scale shape: METADATA-ONLY — reads just the (w, h) columns (the
    payload column never leaves storage), vectorized argmin per batch,
    map-side per-bucket partial sums, one bucket-domain exchange.
    pct_pixels_kept = mean fraction of source pixels surviving a
    center-crop to the bucket ratio (the waste metric the bucket list
    is tuned on)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Sum
    from destor_ray import corpus

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    ds = ray.data.read_parquet(d, columns=["w", "h"])

    bw = np.array([b[0] for b in _ASPECT_BUCKETS], np.float64)
    bh = np.array([b[1] for b in _ASPECT_BUCKETS], np.float64)
    blog = np.log(bw / bh)

    def assign(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        ar = np.log(w / h)
        # |log ar - log bucket_ar|, ties -> first (squarer) bucket
        idx = np.abs(ar[:, None] - blog[None, :]).argmin(axis=1)
        # center-crop keep fraction: min(ar/bar, bar/ar)
        ratio = np.exp(ar - blog[idx])
        kept = np.minimum(ratio, 1.0 / ratio)
        import pandas as pd
        g = pd.DataFrame({"bidx": idx, "n": 1, "kept": kept}) \
            .groupby("bidx", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby("bidx").aggregate(Sum("n", alias_name="n"),
                                   Sum("kept", alias_name="s_kept")) \
        .to_pandas().sort_values("bidx")
    bi = agg["bidx"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    import pandas as pd
    return pd.DataFrame({
        "bucket_w": bw[bi].astype(np.int64),
        "bucket_h": bh[bi].astype(np.int64),
        "n": n,
        "n_full_batches": n // batch_rows,
        "pct_pixels_kept": np.round(
            100.0 * agg["s_kept"].to_numpy(np.float64) / n, 3),
    })


def _corpus_dedup_eval(sf_dir: str):
    """(metric, value): the flagship's quality scorecard against the
    corpus generator's PLANTED ground truth (the north_rule's graded
    numbers, surfaced as a driver query): dup-pair recall, planted
    near-miss distractors wrongly merged (precision proxy — the plan's
    distractor_near_miss rows are the hardest true negatives), and
    exact truth-cluster mismatches."""
    import pyarrow as pa
    from destor_ray import corpus

    n = _corpus_rows_for(sf_dir)
    assignment = _corpus_clusters(sf_dir).to_pandas()
    pred = dict(zip(assignment.image_id, assignment.cluster_id))
    plan = corpus.dup_plan_table(n)
    hits = misses = joined_distractors = 0
    by_kind: dict[str, list[int]] = {}
    for left, right, kind in zip(plan["left_id"].to_pylist(),
                                 plan["right_id"].to_pylist(),
                                 plan["kind"].to_pylist()):
        same = pred[left] == pred[right]
        if kind == "distractor_near_miss":
            joined_distractors += int(same)
        else:
            hits += int(same)
            misses += int(not same)
            hm = by_kind.setdefault(kind, [0, 0])
            hm[0] += int(same)
            hm[1] += 1
    truth = {f"img{i:010d}": f"img{corpus.truth_cluster(i):010d}"
             for i in range(n)}
    mismatches = sum(1 for k, v in truth.items() if pred[k] != v)
    recall = hits / max(1, hits + misses)
    rows = [("n_rows", float(n)),
            ("dup_pair_recall", round(recall, 6)),
            ("dup_pair_misses", float(misses)),
            ("joined_distractors", float(joined_distractors)),
            ("exact_truth_mismatches", float(mismatches))]
    # per-transform recall: each planted kind exercises a different
    # candidate channel (exact→sha1, reencode→phash/thumb, resize→the
    # scale-normalized phash (32x32 resample makes it resolution-
    # invariant by construction; measured: every planted 2x-downscale
    # pair collides in >=1 of the 8 phash bands with no caption help),
    # crop→phash second opinion, caption_para→caption MinHash)
    for kind in sorted(by_kind):
        h, tot = by_kind[kind]
        rows.append((f"recall_{kind}", round(h / max(1, tot), 6)))
    return pa.table({"metric": pa.array([r[0] for r in rows], pa.string()),
                     "value": pa.array([r[1] for r in rows], pa.float64())})


def _corpus_preset_sweep(sf_dir: str):
    """(preset, n_verified_edges, dup_pair_recall, joined_distractors,
    exact_truth_mismatches) — the destor candidate-selection parity
    sweep: the flagship on the SAME corpus under (a) exhaustive-
    within-cap verify (default) and (b) champion top-k selection, the
    port of top_segment_select's greedy feature-trimmed ranking
    (/root/reference/src/index/similarity_detection.c:85-123, D3).
    Champion mode bounds verification to k pairs per row — the edge
    count drop vs default IS the reference's candidate-count
    behavior; the recall column is the measured cost of that bound
    against the planted ground truth. (c) rendezvous swaps the verify
    TOPOLOGY (slim band shuffle + endpoint-keyed thumb attach,
    stages/candidates.candidate_edges_rendezvous) at identical edge
    semantics — its row certifies recall parity under the
    shuffle-volume configuration."""
    import pyarrow as pa
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import PRESETS
    from destor_ray.pipelines.dedup import dedup_pipeline

    n = _corpus_rows_for(sf_dir)
    d = corpus.ensure_corpus_parquet(n, seed=42)
    plan = corpus.dup_plan_table(n)
    truth = {f"img{i:010d}": f"img{corpus.truth_cluster(i):010d}"
             for i in range(n)}
    rows = []
    for preset in ("default", "champion", "rendezvous"):
        st: dict = {}
        assignment = dedup_pipeline(
            ray.data.read_parquet(d), PRESETS[preset],
            n_rows_hint=n, stage_times=st).to_pandas()
        pred = dict(zip(assignment.image_id, assignment.cluster_id))
        hits = misses = dist = 0
        for left, right, kind in zip(plan["left_id"].to_pylist(),
                                     plan["right_id"].to_pylist(),
                                     plan["kind"].to_pylist()):
            same = pred[left] == pred[right]
            if kind == "distractor_near_miss":
                dist += int(same)
            else:
                hits += int(same)
                misses += int(not same)
        mism = sum(1 for k, v in truth.items() if pred[k] != v)
        rows.append((preset, int(st.get("n_edges", -1)),
                     round(hits / max(1, hits + misses), 6),
                     dist, mism))
    return pa.table({
        "preset": pa.array([r[0] for r in rows], pa.string()),
        "n_verified_edges": pa.array([r[1] for r in rows], pa.int64()),
        "dup_pair_recall": pa.array([r[2] for r in rows], pa.float64()),
        "joined_distractors": pa.array([r[3] for r in rows], pa.int64()),
        "exact_truth_mismatches": pa.array([r[4] for r in rows], pa.int64()),
    })


def _lsh_param_sweep(sf_dir: str):
    """(bands, n_candidate_pairs, n_ref_pairs, recall_vs_ref) — the
    LSH TUNING harness: the one-permutation MinHash candidate join at
    increasing band counts, each scored against the MOST-SENSITIVE
    configuration's pair set (bands=32 — the standard self-relative
    tuning curve when exhaustive truth is too expensive to compute at
    corpus scale). More bands → more candidate volume and higher
    recall; this scorecard is how a 100 TB run picks its (bands, rows)
    operating point before committing to the expensive exchange,
    surfaced so the tradeoff is driver-visible per round."""
    import pyarrow as pa
    from destor_ray.pipelines import text as text_mod

    ref_df = text_mod.minhash_lsh_oph(sf_dir, bands=32).to_pandas()
    ref = set(zip(ref_df["left_id"].astype(int),
                  ref_df["right_id"].astype(int)))
    rows = []
    for bands in (4, 8, 16, 32):
        if bands == 32:
            pairs = ref
        else:
            cand = text_mod.minhash_lsh_oph(sf_dir, bands=bands).to_pandas()
            pairs = set(zip(cand["left_id"].astype(int),
                            cand["right_id"].astype(int)))
        hit = len(pairs & ref)
        rows.append((bands, len(pairs), len(ref),
                     round(hit / max(1, len(ref)), 6)))
    return pa.table({
        "bands": pa.array([r[0] for r in rows], pa.int64()),
        "n_candidate_pairs": pa.array([r[1] for r in rows], pa.int64()),
        "n_ref_pairs": pa.array([r[2] for r in rows], pa.int64()),
        "recall_vs_ref": pa.array([r[3] for r in rows], pa.float64()),
    })


def _band_skew_profile(sf_dir: str, num_buckets: int = 64):
    """(metric, value) — shuffle-skew diagnostic for THE exchange (the
    flagship's band shuffle): per-reducer-bucket band-row counts
    summarized as max/mean/p99-over-mean ratios plus the hottest
    single band-key group size. This is the profiling pass that
    decides, before a 100 TB run, whether `salt_hot_bands` /
    `full_pair_cap` need to engage (SCALING.md's stated discipline) —
    surfaced as a driver query so skew regressions are visible
    round-over-round. Map-only: per-batch (bucket, count) partials;
    nothing but the per-bucket histogram leaves the cluster."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.dedup import signatures_from_corpus
    from destor_ray.stages.candidates import explode_bands
    from destor_ray.stages.grouped import _add_bucket
    from ray.data.aggregate import Sum

    cfg = EngineConfig()
    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    sigs = signatures_from_corpus(ray.data.read_parquet(d), cfg)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        bands = explode_bands(batch, cfg)
        # n_sent=0: diagnostic counts want REAL rows only (generator
        # yields exactly one table for a non-degenerate batch)
        withb = next(_add_bucket(bands, "band_key", num_buckets, 0x6B, 0))
        b = withb["__bucket"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    hist = sigs.map_batches(bucket_counts, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()  # num_buckets rows
    n = hist["n"].to_numpy(np.int64)
    full = np.zeros(num_buckets, np.int64)
    full[hist["bucket"].to_numpy(np.int64)] = n
    mean = float(full.mean())
    rows = [("num_buckets", float(num_buckets)),
            ("total_band_rows", float(full.sum())),
            ("mean_per_bucket", round(mean, 3)),
            ("max_over_mean", round(float(full.max()) / max(mean, 1e-9), 4)),
            ("p99_over_mean", round(float(np.percentile(full, 99))
                                    / max(mean, 1e-9), 4)),
            ("empty_buckets", float((full == 0).sum()))]
    return pa.table({"metric": pa.array([r[0] for r in rows], pa.string()),
                     "value": pa.array([r[1] for r in rows], pa.float64())})


def _curation_job_metrics(sf_dir: str):
    """Runs the checkpointed resumable curation job (S2/S3 analog for
    the text pipeline) under a /tmp workdir and returns its metrics as
    a one-row table; a second driver run in the same round resumes
    every stage from parquet+lineage."""
    import os
    import pyarrow as pa
    from destor_ray.pipelines.curation import run_curation_job

    wd = os.path.join("/tmp/destor_ray_jobs",
                      "curation_" + os.path.basename(os.path.normpath(sf_dir)))
    status = run_curation_job(sf_dir, wd)
    m = status["metrics"]
    n_resumed = sum(bool(v) for v in status["resumed"].values())
    return pa.table({k: pa.array([v], pa.int64()) for k, v in m.items()}
                    | {"stages_resumed": pa.array([n_resumed], pa.int64())})


def _corpus_phash_topk(sf_dir: str, k: int = 10):
    """Image similarity search: top-k corpus images nearest the first
    image by perceptual-hash Hamming distance — the metadata-only image
    analog of ann_topk (the 64-bit phash column stands in for an
    embedding; destor's similarity detection D3 ranks by shared
    features the same way). Per-batch vectorized XOR+popcount with
    local top-k pruning, then a tiny global sort; ties to smaller
    image_id. The query phash comes from a one-row pushed-down read."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data
    from destor_ray import corpus
    from destor_ray.codec import hamming64

    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    dset = pads.dataset(d)
    first = dset.head(1, columns=["image_id", "phash"])
    qid = first["image_id"][0].as_py()
    qhash = first["phash"][0].as_py()

    def score(batch: pa.Table) -> pa.Table:
        ph = batch["phash"].to_numpy(zero_copy_only=False)
        dist = hamming64(ph, np.int64(qhash))
        ids = np.asarray(batch["image_id"].to_pylist(), dtype=object)
        keep = ids != qid
        ids, dist = ids[keep], dist[keep]
        if len(dist) > k:
            order = np.lexsort((ids, dist))[:k]
            ids, dist = ids[order], dist[order]
        return pa.table({"image_id": pa.array(ids.tolist(), pa.string()),
                         "hamming": pa.array(dist, pa.int64())})

    ds = ray.data.read_parquet(d, columns=["image_id", "phash"])
    return ds.map_batches(score, batch_format="pyarrow") \
        .sort(["hamming", "image_id"]).limit(k)


def entry() -> Any:
    """Flagship: near-dup clustering of the deterministic synthetic
    image+caption corpus at sf0.001 scale."""
    return _corpus_clusters("/root/testdata/sf0.001")


def _job_partition_metrics(sf_dir: str):
    """Rewrite/restore/GC partition metrics of the flagship job (R1-R6,
    T2/T3/T6 analogs) — runs the checkpointed backup job and returns the
    per-partition metrics table."""
    import os
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.job import build_manifest, partition_metrics, run_backup_job
    import ray.data
    n = _corpus_rows_for(sf_dir)
    cdir = corpus.ensure_corpus_parquet(n, seed=42)
    workdir = f"/tmp/destor_ray_job/n{n}"
    run_backup_job(cdir, workdir)
    manifest = ray.data.read_parquet(os.path.join(workdir, "manifest"))
    return partition_metrics(manifest, EngineConfig(), partition_rows=256)


def _corpus_fidelity(sf_dir: str):
    """T5 decode-verify: per-row fidelity vs the deterministic generator
    (PSNR>=40 lossy / exact lossless + caption equality)."""
    import ray.data
    from destor_ray import corpus
    from destor_ray.stages.fidelity import verify_fidelity
    d = corpus.ensure_corpus_parquet(_corpus_rows_for(sf_dir), seed=42)
    return verify_fidelity(ray.data.read_parquet(d), seed=42, concurrency=2)


def _cdc_stats(sf_dir: str):
    """Chunker operator sweep: per-algorithm chunk counts/avg sizes over
    the corpus payloads (C1-C6 + file-level)."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from destor_ray import corpus
    from destor_ray.functions import chunking

    d = corpus.ensure_corpus_parquet(min(_corpus_rows_for(sf_dir), 400), seed=42)
    params = chunking.ChunkParams(512, 4096, 65536)

    def stats(batch: pa.Table) -> pa.Table:
        # zero-copy payload views over the Arrow buffers (the same access
        # pattern as stages/signature.py) — no per-row bytes copies
        from destor_ray.stages.signature import binary_column_views
        data, offs = binary_column_views(batch["bytes"])
        payloads = [data[offs[i]:offs[i + 1]] for i in range(batch.num_rows)]
        total_bytes = int(offs[-1] - offs[0]) if len(offs) > 1 else 0
        rows = []
        for algo in ["fixed", "rabin", "normalized_rabin", "tttd", "ae", "fastcdc", "file"]:
            n_chunks = sum(len(chunking.chunk_offsets(p, algo, params))
                           for p in payloads)
            rows.append({"algo": algo, "n_chunks": n_chunks,
                         "n_bytes": total_bytes})
        return pa.Table.from_pylist(rows)

    from ray.data.aggregate import Sum
    per_batch = ray.data.read_parquet(d).map_batches(stats, batch_format="pyarrow")
    return per_batch.groupby("algo").aggregate(
        Sum("n_chunks", alias_name="total_chunks"),
        Sum("n_bytes", alias_name="total_bytes"))


def _corpus_restore(sf_dir: str):
    """T1-T5 as a REAL data path: restore every row's payload from its
    cluster representative (hash-partitioned gather join over the
    manifest — the container-read analog) and decode-verify against the
    original source pixels. Returns per-row (image_id, is_dup, psnr,
    ok)."""
    import os
    from destor_ray import corpus
    from destor_ray.pipelines.job import (restore_corpus,
                                          restore_fidelity_stats,
                                          run_backup_job)
    n = _corpus_rows_for(sf_dir)
    cdir = corpus.ensure_corpus_parquet(n, seed=42)
    workdir = f"/tmp/destor_ray_job/n{n}"
    run_backup_job(cdir, workdir)
    restored = restore_corpus(cdir, workdir)
    return restore_fidelity_stats(restored, seed=42)


def _job_gc_stats(sf_dir: str):
    """X1-X3 CMA GC across two backup jobs: job 0 backs up the FULL
    corpus, job 1 only its first half. Container ids derive from global
    cluster (row-range) ids, so the shared prefix containers are
    re-referenced by job 1 while the tail containers are referenced by
    job 0 alone. The CMA manifest (container → last-referencing-job) is
    a groupby Max aggregate over the union; deleting job 0 invalidates
    exactly the tail containers (last_job <= 0), which the registry
    purge (broadcast anti-join, stages/gc.py) would reclaim. Returns one
    row per container with (refs, ref_bytes, last_job, invalid)."""
    import pyarrow as pa
    import ray.data
    from destor_ray import corpus
    from destor_ray.config import EngineConfig
    from destor_ray.pipelines.job import run_backup_job
    from destor_ray.stages import gc as gcs
    import os

    n = _corpus_rows_for(sf_dir)
    cfg = EngineConfig(container_rows=64)  # small containers for a visible spread
    half = corpus.ensure_corpus_parquet(n // 2, seed=42)
    full = corpus.ensure_corpus_parquet(n, seed=42)
    wd0 = f"/tmp/destor_ray_job/gcfull_n{n}"
    wd1 = f"/tmp/destor_ray_job/gchalf_n{n//2}"
    run_backup_job(full, wd0, cfg=cfg, job_id=0)
    run_backup_job(half, wd1, cfg=cfg, job_id=1)

    def with_job(path: str, jid: int):
        ds = ray.data.read_parquet(os.path.join(path, "manifest"))
        return ds.map_batches(
            lambda b, j=jid: b.append_column(
                "job_id", pa.array([j] * b.num_rows, pa.int64())),
            batch_format="pyarrow")

    manifest = with_job(wd0, 0).union(with_job(wd1, 1))
    ref = gcs.container_refcounts(manifest)

    def mark(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.append_column(
            "invalid", pc.less_equal(batch["last_job"], 0))

    return ref.map_batches(mark, batch_format="pyarrow")


def _fsl_trace_stats(sf_dir: str):
    """S4 FSL hashfile reader end-to-end: write a deterministic
    version-7 trace (cached), parse it (format conformance-tested
    against the reference libhashfile writer in tests/test_fsl.py),
    convert to partitioned parquet, and aggregate per-file chunk
    counts/bytes + global dedup stats with Ray."""
    import os
    import numpy as np
    import ray.data
    from destor_ray.sources import fsl

    root = "/tmp/destor_ray_fsl"
    os.makedirs(root, exist_ok=True)
    hf = os.path.join(root, "synthetic_v7.hashfile")
    if not os.path.exists(hf):
        rng = np.random.default_rng(11)
        files = []
        for i in range(20):
            n = int(rng.integers(2, 30))
            chunks = []
            for _ in range(n):
                # ~30% planted duplicate hashes exercise the dedup path
                if chunks and rng.random() < 0.3:
                    chunks.append(chunks[int(rng.integers(len(chunks)))])
                else:
                    chunks.append((bytes(rng.integers(0, 256, 6, dtype=np.uint8)),
                                   int(rng.integers(600, 60000))))
            files.append((f"/fsl/file{i:03d}", chunks))
        fsl.write_fsl_hashfile(hf + ".tmp", files)
        os.rename(hf + ".tmp", hf)
    pq_dir = os.path.join(root, "trace_pq")
    if not os.path.exists(os.path.join(pq_dir, "part-000000.parquet")):
        fsl.fsl_to_parquet(hf, pq_dir, rows_per_file=64)
    ds = ray.data.read_parquet(pq_dir)
    from ray.data.aggregate import Count, Min, Sum
    return ds.groupby("file_path").aggregate(
        Count(alias_name="n_chunks"),
        Sum("size", alias_name="bytes"))


def queries() -> dict[str, Callable[[str], Any]]:
    from destor_ray.pipelines import (ann, curation, graph, ingest, ranking,
                                      relational, stats, streaming,
                                      substring, text)
    return {
        "pagerank_tokens": graph.pagerank_tokens,
        "degree_distribution": graph.degree_distribution,
        "token_communities": graph.token_communities,
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "customer_order_stats": relational.customer_order_stats,
        "top_parts_by_quantity": relational.top_parts_by_quantity,
        "part_type_revenue": relational.part_type_revenue,
        "supplier_region_stats": relational.supplier_region_stats,
        "lineitem_rollup": relational.lineitem_rollup,
        "customers_without_urgent_orders":
            relational.customers_without_urgent_orders,
        "orders_running_total": relational.orders_running_total,
        "events_grouped_sample": streaming.events_grouped_sample,
        "events_windowed": streaming.events_windowed,
        "events_type_stats": streaming.events_type_stats,
        "events_sessionize": streaming.events_sessionize,
        "events_user_daily_topk": streaming.events_user_daily_topk,
        "events_asof_join": streaming.events_asof_join,
        "events_range_join": streaming.events_range_join,
        "events_funnel": streaming.events_funnel,
        "user_retention_cohorts": streaming.user_retention_cohorts,
        "events_upsert_latest": streaming.events_upsert_latest,
        "lineitem_corr_stats": relational.lineitem_corr_stats,
        "triangle_count": graph.triangle_count,
        "events_zscore_outliers": streaming.events_zscore_outliers,
        "bloom_semi_join": relational.bloom_semi_join,
        "orders_decile_stats": relational.orders_decile_stats,
        "customer_order_gap_stats": relational.customer_order_gap_stats,
        "supplier_revenue_pareto": relational.supplier_revenue_pareto,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "orders_monthly_stats": relational.orders_monthly_stats,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q10_returned_revenue": relational.q10_returned_revenue,
        "q13_order_count_distribution":
            relational.q13_order_count_distribution,
        "q4_order_priority_check": relational.q4_order_priority_check,
        "q14_promo_revenue_share": relational.q14_promo_revenue_share,
        "q18_large_volume_orders": relational.q18_large_volume_orders,
        "q22_global_sales_opportunity":
            relational.q22_global_sales_opportunity,
        "q17_small_quantity_revenue": relational.q17_small_quantity_revenue,
        "q15_top_supplier": relational.q15_top_supplier,
        "q9_product_profit": relational.q9_product_profit,
        "q7_nation_volume": relational.q7_nation_volume,
        "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
        "q8_market_share": relational.q8_market_share,
        "q12_priority_by_linestatus":
            relational.q12_priority_by_linestatus,
        "q21_waiting_suppliers": relational.q21_waiting_suppliers,
        "q2_min_cost_supplier": relational.q2_min_cost_supplier,
        "q11_important_stock": relational.q11_important_stock,
        "q16_supplier_part_counts": relational.q16_supplier_part_counts,
        "q20_excess_stock_suppliers":
            relational.q20_excess_stock_suppliers,
        "bfs_token_distances": graph.bfs_token_distances,
        "part_pareto_frontier": relational.part_pareto_frontier,
        "orders_customer_set_ops": relational.orders_customer_set_ops,
        "lineitem_unpivot": relational.lineitem_unpivot,
        "table_profile": stats.table_profile,
        "table_digest": stats.table_digest,
        "exact_global_quantiles": stats.exact_global_quantiles,
        "dedup_ratio_estimate": text.dedup_ratio_estimate,
        "sorted_neighborhood_pairs": text.sorted_neighborhood_pairs,
        "token_dictionary_encode": text.token_dictionary_encode,
        "bpe_train_merges": text.bpe_train_merges,
        "source_overlap_matrix": text.source_overlap_matrix,
        "events_drift_psi": streaming.events_drift_psi,
        "kcore_tokens": graph.kcore_tokens,
        "fd_discovery": stats.fd_discovery,
        "cms_token_counts": text.cms_token_counts,
        "events_cusum": streaming.events_cusum,
        "sssp_weighted": graph.sssp_weighted,
        "shard_rebalance_audit": relational.shard_rebalance_audit,
        "rle_compression_advisor": stats.rle_compression_advisor,
        "benford_audit": stats.benford_audit,
        "events_chi2_assoc": stats.events_chi2_assoc,
        "lineitem_weighted_quantiles": stats.lineitem_weighted_quantiles,
        "winsorized_stats": stats.winsorized_stats,
        "events_equidepth_bins": stats.events_equidepth_bins,
        "shuffle_order_audit": stats.shuffle_order_audit,
        "events_type_hll_users": streaming.events_type_hll_users,
        "events_global_rank": streaming.events_global_rank,
        "table_constraints_audit": stats.table_constraints_audit,
        "events_rolling_active_users": streaming.events_rolling_active_users,
        "events_type_trend": streaming.events_type_trend,
        "events_autocorr": streaming.events_autocorr,
        "events_ks_drift": streaming.events_ks_drift,
        "events_mannwhitney_drift": streaming.events_mannwhitney_drift,
        "events_max_concurrency": streaming.events_max_concurrency,
        "events_rolling_median": streaming.events_rolling_median,
        "rp_ann_topk": ann.rp_ann_topk,
        "events_cumulative_users": streaming.events_cumulative_users,
        "events_hourly_gapfill": streaming.events_hourly_gapfill,
        "events_value_rank": streaming.events_value_rank,
        "events_type_sketch_percentiles": stats.events_type_sketch_percentiles,
        "heavy_hitter_tokens": stats.heavy_hitter_tokens,
        "source_length_gini": stats.source_length_gini,
        "orders_lineitem_left_join": relational.orders_lineitem_left_join,
        "events_value_delta": streaming.events_value_delta,
        "docs_jsonl_stats": ingest.docs_jsonl_stats,
        "docs_csv_stats": ingest.docs_csv_stats,
        "lineitem_cube": relational.lineitem_cube,
        "source_token_entropy": text.source_token_entropy,
        "events_props_stats": streaming.events_props_stats,
        "cust_orders_full_join": relational.cust_orders_full_join,
        "events_weighted_sample": streaming.events_weighted_sample,
        "events_version_diff": streaming.events_version_diff,
        "user_event_paths": streaming.user_event_paths,
        "events_user_hour_ohlc": streaming.events_user_hour_ohlc,
        "events_ewma": streaming.events_ewma,
        "events_time_weighted_avg": streaming.events_time_weighted_avg,
        "events_type_top_values": streaming.events_type_top_values,
        "event_type_cooccurrence": streaming.event_type_cooccurrence,
        "events_recent_stats": streaming.events_recent_stats,
        "events_hourly_active_users": streaming.events_hourly_active_users,
        "event_transitions": streaming.event_transitions,
        "zorder_layout_stats": streaming.zorder_layout_stats,
        "events_incremental_stats": streaming.events_incremental_stats,
        "audio_wav_stats": ingest.audio_wav_stats,
        "audio_format_convert_dedup": ingest.audio_format_convert_dedup,
        "audio_container_stats": ingest.audio_container_stats,
        "audio_quarantine_stats": ingest.audio_quarantine_stats,
        "video_container_stats": ingest.video_container_stats,
        "video_frame_stats": ingest.video_frame_stats,
        "jfif_decode_stats": ingest.jfif_decode_stats,
        "gif_decode_stats": ingest.gif_decode_stats,
        "gif_palette_dedup": ingest.gif_palette_dedup,
        "gif_animation_dedup": ingest.gif_animation_dedup,
        "format_convert_dedup": ingest.format_convert_dedup,
        "crossformat_animation_dedup":
            ingest.crossformat_animation_dedup,
        "webdataset_roundtrip_stats": ingest.webdataset_roundtrip_stats,
        "corpus_dedup_from_wds": ingest.corpus_dedup_from_wds,
        "corpus_dedup_export_wds": ingest.corpus_dedup_export_wds,
        "image_format_stats": ingest.image_format_stats,
        "decode_quarantine_stats": ingest.decode_quarantine_stats,
        "decode_quarantine_mixed": ingest.decode_quarantine_mixed,
        "partitioned_write_readback": ingest.partitioned_write_readback,
        "zonemap_prune_stats": ingest.zonemap_prune_stats,
        "jfif_dc_dedup": ingest.jfif_dc_dedup,
        "dihedral_image_dedup": ingest.dihedral_image_dedup,
        "jfif_exif_stats": ingest.jfif_exif_stats,
        "letterbox_image_dedup": ingest.letterbox_image_dedup,
        "ctph_fuzzy_dedup": ingest.ctph_fuzzy_dedup,
        "photometric_image_dedup": ingest.photometric_image_dedup,
        "tonecurve_image_dedup": ingest.tonecurve_image_dedup,
        "overlay_image_dedup": ingest.overlay_image_dedup,
        "crop_image_dedup": ingest.crop_image_dedup,
        "avi_shot_stats": ingest.avi_shot_stats,
        "exif_orientation_dedup": ingest.exif_orientation_dedup,
        "jfif_quality_estimate": ingest.jfif_quality_estimate,
        "avi_frame_stats": ingest.avi_frame_stats,
        "avi_video_dedup": ingest.avi_video_dedup,
        "wav_audio_dedup": ingest.wav_audio_dedup,
        "audio_offset_dedup": ingest.audio_offset_dedup,
        "timescale_audio_dedup": ingest.timescale_audio_dedup,
        "samplerate_audio_dedup": ingest.samplerate_audio_dedup,
        "stereo_audio_dedup": ingest.stereo_audio_dedup,
        "pitchshift_audio_dedup": ingest.pitchshift_audio_dedup,
        "video_offset_dedup": ingest.video_offset_dedup,
        "timescale_video_dedup": ingest.timescale_video_dedup,
        "letterbox_video_dedup": ingest.letterbox_video_dedup,
        "mirror_video_dedup": ingest.mirror_video_dedup,
        "omni_video_dedup": ingest.omni_video_dedup,
        "audiotrack_video_dedup": ingest.audiotrack_video_dedup,
        "omni_audio_dedup": ingest.omni_audio_dedup,
        "rotation_image_dedup": ingest.rotation_image_dedup,
        "huesat_image_dedup": ingest.huesat_image_dedup,
        "grayscale_image_dedup": ingest.grayscale_image_dedup,
        "degrade_image_dedup": ingest.degrade_image_dedup,
        "framerate_video_dedup": ingest.framerate_video_dedup,
        "resolution_video_dedup": ingest.resolution_video_dedup,
        "omni_image_dedup": ingest.omni_image_dedup,
        "schema_evolution_backfill": ingest.schema_evolution_backfill,
        "compact_small_files": ingest.compact_small_files,
        "transactional_commit_readback": ingest.transactional_commit_readback,
        "jfif_dc_thumbnail_stats": ingest.jfif_dc_thumbnail_stats,
        "jfif_scan_mode_stats": ingest.jfif_scan_mode_stats,
        "resilient_read_stats": ingest.resilient_read_stats,
        "storage_orphan_gc": ingest.storage_orphan_gc,
        "user_erasure_certified": ingest.user_erasure_certified,
        "job_partition_metrics": _job_partition_metrics,
        "exact_dedup_docs": text.exact_dedup_docs,
        "token_count": text.token_count,
        "readability_scores": text.readability_scores,
        "stratified_kfold": text.stratified_kfold,
        "token_count_bpe": text.token_count_bpe,
        "tokenize_to_ids": text.tokenize_to_ids,
        "logreg_train_lang": text.logreg_train_lang,
        "bpe_encode_corpus": text.bpe_encode_corpus,
        "doc_feature_hashing": text.doc_feature_hashing,
        "top_ngrams": text.top_ngrams,
        "repetition_scores": text.repetition_scores,
        "distinct_token_stats": text.distinct_token_stats,
        "distinct_tokens_exact": text.distinct_tokens_exact,
        "unigram_logprob": text.unigram_logprob,
        "bigram_pmi": text.bigram_pmi,
        "quality_score": text.quality_score,
        "lang_id": text.lang_id,
        "doc_fingerprint": text.doc_fingerprint,
        "doc_fingerprint_md5": text.doc_fingerprint_md5,
        "docs_ngram_novelty": text.docs_ngram_novelty,
        "docs_vocab_growth": text.docs_vocab_growth,
        "docs_stopword_profile": text.docs_stopword_profile,
        "docs_prefix_cluster_sizes": text.docs_prefix_cluster_sizes,
        "docs_zipf_slope": text.docs_zipf_slope,
        "simhash64_shingle_pairs": text.simhash64_shingle_pairs,
        "token_cms_md5": text.token_cms_md5,
        "token_bloom_md5": text.token_bloom_md5,
        "docs_char_class_profile": text.docs_char_class_profile,
        "events_inter_arrival_stats": streaming.events_inter_arrival_stats,
        "events_user_daily_streaks": streaming.events_user_daily_streaks,
        "events_session_count_sweep": streaming.events_session_count_sweep,
        "events_value_benford": streaming.events_value_benford,
        "orders_repeat_latency_histogram":
            relational.orders_repeat_latency_histogram,
        "lineitem_ship_latency_histogram":
            relational.lineitem_ship_latency_histogram,
        "lineitem_returns_rate_by_month":
            relational.lineitem_returns_rate_by_month,
        "supplier_part_bipartite_degree":
            relational.supplier_part_bipartite_degree,
        "lineitem_moment_stats": stats.lineitem_moment_stats,
        "part_type_supplier_hhi": stats.part_type_supplier_hhi,
        "lineitem_price_qty_ols": stats.lineitem_price_qty_ols,
        "events_weekend_contrast": streaming.events_weekend_contrast,
        "docs_hapax_ratio": text.docs_hapax_ratio,
        "minhash_lsh_docs": text.minhash_lsh_docs,
        "minhash_lsh_oph": text.minhash_lsh_oph,
        "simhash_md5_pairs": text.simhash_md5_pairs,
        "token_cms_md5": text.token_cms_md5,
        "token_bloom_md5": text.token_bloom_md5,
        "simhash_dup_pairs": text.simhash_dup_pairs,
        "segment_routing": text.segment_routing,
        "ngram_jaccard_pairs": text.ngram_jaccard_pairs,
        "omni_text_dedup": text.omni_text_dedup,
        "jaccard_join_exact": text.jaccard_join_exact,
        "containment_join_exact": text.containment_join_exact,
        "normalize_text": curation.normalize_text,
        "events_dedup_window": streaming.events_dedup_window,
        "jaccard_join_ppjoin": text.jaccard_join_ppjoin,
        "common_substring_pairs": substring.common_substring_pairs,
        "lcs_pairs": substring.lcs_pairs,
        "edit_distance_pairs": substring.edit_distance_pairs,
        "column_quantiles": stats.column_quantiles,
        "quantile_sketch_stats": stats.quantile_sketch_stats,
        "stopword_scrub": curation.stopword_scrub,
        "dataset_split": curation.dataset_split,
        "training_mix_sample": curation.training_mix_sample,
        "decontaminate": curation.decontaminate,
        "curation_pipeline": curation.curation_pipeline,
        "segment_dedup": curation.segment_dedup,
        "incremental_dedup": curation.incremental_dedup,
        "keep_best_dedup": curation.keep_best_dedup,
        "quality_percentile_filter": curation.quality_percentile_filter,
        "sequence_pack": curation.sequence_pack,
        "pretraining_pipeline": curation.pretraining_pipeline,
        "pii_scrub": curation.pii_scrub,
        "events_k_anonymity": curation.events_k_anonymity,
        "tfidf_top_terms": ranking.tfidf_top_terms,
        "bm25_scores": ranking.bm25_scores,
        "container_refs": text.container_refs,
        "cap_top_containers": text.cap_top_containers,
        "docs_stats_by_lang": text.docs_stats_by_lang,
        "events_sliding_window": streaming.events_sliding_window,
        "events_type_percentiles": streaming.events_type_percentiles,
        "events_type_mad": streaming.events_type_mad,
        "events_user_mode": streaming.events_user_mode,
        "events_funnel_conversion": streaming.events_funnel_conversion,
        "events_daily_anomaly": streaming.events_daily_anomaly,
        "events_bounce_rate": streaming.events_bounce_rate,
        "events_props_field_stats": streaming.events_props_field_stats,
        "events_type_hll_users_md5": streaming.events_type_hll_users_md5,
        "user_event_pivot": streaming.user_event_pivot,
        "ann_topk": ann.ann_topk,
        "filtered_ann_topk": ann.filtered_ann_topk,
        "ann_topk_multi": ann.ann_topk_multi,
        "lsh_bucket_topk": ann.lsh_bucket_topk,
        "ivf_topk": ann.ivf_topk,
        "ivf_index_topk": ann.ivf_index_topk,
        "pq_index_topk": ann.pq_index_topk,
        "ivfpq_topk": ann.ivfpq_topk,
        "embedding_dedup_pairs": ann.embedding_dedup_pairs,
        "embedding_lsh_pairs": ann.embedding_lsh_pairs,
        "embedding_clusters": ann.embedding_clusters,
        "label_centroids": ann.label_centroids,
        "kmeans_assign": ann.kmeans_assign,
        "kmeans_iter_assign": ann.kmeans_iter_assign,
        "semantic_dedup": ann.semantic_dedup,
        "docs_embedding_join_stats": ann.docs_embedding_join_stats,
        "embedding_model_scores": ann.embedding_model_scores,
        "embedding_norm_stats": ann.embedding_norm_stats,
        "embedding_dim_stats": ann.embedding_dim_stats,
        "embedding_pca_top1": ann.embedding_pca_top1,
        "sq8_ann_topk": ann.sq8_ann_topk,
        "events_value_histogram": streaming.events_value_histogram,
        "corpus_phash_topk": _corpus_phash_topk,
        "curation_job_metrics": _curation_job_metrics,
        "corpus_dedup_eval": _corpus_dedup_eval,
        "corpus_gate_sweep": _corpus_gate_sweep,
        "corpus_preset_sweep": _corpus_preset_sweep,
        "band_skew_profile": _band_skew_profile,
        "lsh_param_sweep": _lsh_param_sweep,
        "corpus_resize_stats": _corpus_resize_stats,
        "corpus_pixel_quality": _corpus_pixel_quality,
        "corpus_transcode_stats": _corpus_transcode_stats,
        "corpus_aspect_buckets": _corpus_aspect_buckets,
        "job_gc_stats": _job_gc_stats,
        "fsl_trace_stats": _fsl_trace_stats,
        "corpus_dedup_clusters": _corpus_clusters,
        "corpus_dedup_manifest": _corpus_dedup_manifest,
        "corpus_probe_index": _corpus_probe_index,
        "corpus_exact_dedup": _corpus_exact,
        "corpus_dedup_simulation": _corpus_dedup_simulation,
        "corpus_incremental_dedup": _corpus_incremental_dedup,
        "corpus_dedup_shard_matrix": _corpus_dedup_shard_matrix,
        "corpus_cluster_caption_audit": _corpus_cluster_caption_audit,
        "corpus_hard_negatives": _corpus_hard_negatives,
        "corpus_dedup_weights": _corpus_dedup_weights,
        "corpus_augment_stats": _corpus_augment_stats,
        "corpus_copymove_stats": _corpus_copymove_stats,
        "corpus_compressibility": _corpus_compressibility,
        "corpus_fidelity": _corpus_fidelity,
        "corpus_restore": _corpus_restore,
        "cdc_stats": _cdc_stats,
    }


def oracle_sql() -> dict[str, str]:
    from destor_ray.pipelines.ann import model_weights_sql_literal
    _wlit = model_weights_sql_literal()
    # corpus-diagnostic oracles (round 5): the synthetic image corpus
    # is a deterministic cached parquet dir; DuckDB reads it directly.
    # The driver's gate runs at sf0.01 (the default); tools that sweep
    # other sfs export GRAFT_SF_DIR so the embedded path tracks the
    # corpus the Ray side reads.
    import os as _os

    from destor_ray import corpus as _corpus_mod
    _sfd = _os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    _cdir = _corpus_mod.ensure_corpus_parquet(_corpus_rows_for(_sfd),
                                              seed=42)
    _cglob = f"{_cdir}/*.parquet"
    _bvals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh)
                       in enumerate(_ASPECT_BUCKETS))
    from destor_ray.pipelines.text import STOPWORDS as _SW
    _stoplist = ", ".join(f"'{w}'" for w in _SW)
    _zterms = " + ".join(
        f"((u // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        f" + ((h // {1 << b}) % 2) * {1 << (2 * b)}"
        for b in range(8))
    # per-bit majority vote for the SQL-verifiable 32-bit SimHash
    # (doc_fingerprint_md5): bit b set iff 2*Σ shingle-bit-b >= count
    # (_sh64: the same rule at 64 bits for simhash_md5_pairs)
    _sh64 = " + ".join(
        f"CAST(2*sum((h >> {b}) & 1) >= count(*) AS UBIGINT)"
        f" * ({1 << b}::UBIGINT)"
        for b in range(64))
    _sh32 = " + ".join(
        f"CAST(2 * sum((h // {1 << b}) % 2) >= count(*) AS BIGINT)"
        f" * {1 << b}"
        for b in range(32))
    return {
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   count(*) AS n_items
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customer_order_stats": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_totalprice_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "top_parts_by_quantity": """
            SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY l_partkey
            ORDER BY total_qty DESC, l_partkey ASC
            LIMIT 10
        """,
        "part_type_revenue": """
            SELECT p.p_brand,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_revenue_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        "lineitem_rollup": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   count(*) AS n_items
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "supplier_region_stats": """
            SELECT r.r_name,
                   count(*) AS n_suppliers,
                   CAST(sum(CAST(round(s.s_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "events_sessionize": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts_us,
                       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                            ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
                FROM e
            )
            SELECT user_id, session_idx, count(*) AS n_events,
                   min(ts_us) AS start_us, max(ts_us) AS end_us
            FROM s GROUP BY user_id, session_idx
        """,
        "events_rolling_median": """
            WITH v AS (SELECT event_id, event_type,
                              CAST(round(value * 1000000) AS BIGINT)
                                  AS vm
                       FROM events)
            SELECT event_id, event_type,
                   quantile_disc(vm, 0.5) OVER (
                       PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       AS med_micro
            FROM v
        """,
        "events_max_concurrency": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - lag(epoch_us(ts))
                                    OVER w > 1800000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
                SELECT user_id, ts_us,
                       sum(new_sess) OVER (PARTITION BY user_id
                           ORDER BY ts_us ROWS UNBOUNDED PRECEDING)
                           AS sess
                FROM e
            ), iv AS (
                SELECT min(ts_us) AS start_us, max(ts_us) AS end_us
                FROM s GROUP BY user_id, sess
            ), b AS (
                SELECT start_us AS t, 1 AS ds, 0 AS de FROM iv
                UNION ALL
                SELECT end_us, 0, 1 FROM iv
            ), pt AS (
                SELECT t, sum(ds) AS ds, sum(de) AS de FROM b GROUP BY t
            ), w AS (
                SELECT t,
                       sum(ds) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                       - COALESCE(sum(de) OVER (ORDER BY t ROWS BETWEEN
                             UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS conc
                FROM pt
            ), m AS (SELECT max(conc) AS mc FROM w)
            SELECT CAST((SELECT count(*) FROM iv) AS BIGINT)
                       AS n_sessions,
                   CAST((SELECT mc FROM m) AS BIGINT) AS max_concurrent,
                   CAST((SELECT min(t) FROM w
                         WHERE conc = (SELECT mc FROM m)) AS BIGINT)
                       AS t_at_max_us
        """,
        "events_user_daily_topk": """
            WITH c AS (
                SELECT CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
                       user_id, count(*) AS n_events
                FROM events GROUP BY 1, 2
            ), r AS (
                SELECT day, user_id, n_events,
                       row_number() OVER (PARTITION BY day
                           ORDER BY n_events DESC, user_id ASC) AS rnk
                FROM c
            )
            SELECT day, rnk, user_id, n_events FROM r WHERE rnk <= 3
        """,
        "events_asof_join": """
            WITH u AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                       max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                         OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS last_right_us
                FROM events WHERE event_type IN ('click', 'purchase')
            )
            SELECT event_id, user_id, ts_us, last_right_us
            FROM u WHERE event_type = 'purchase'
        """,
        "events_range_join": """
            WITH u AS (
                SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                       count(CASE WHEN event_type = 'click' THEN 1 END)
                         OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts)
                               RANGE BETWEEN 3599999999 PRECEDING AND 1 PRECEDING)
                         AS n_right
                FROM events WHERE event_type IN ('click', 'purchase')
            )
            SELECT event_id, user_id, ts_us, CAST(n_right AS BIGINT) AS n_right
            FROM u WHERE event_type = 'purchase'
        """,
        "events_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY e.user_id)
            SELECT * FROM (
                SELECT 1::BIGINT AS funnel_step, count(*)::BIGINT AS n_users FROM s1
                UNION ALL SELECT 2::BIGINT, count(*)::BIGINT FROM s2
                UNION ALL SELECT 3::BIGINT, count(*)::BIGINT FROM s3)
        """,
        "lang_id": """
            WITH t AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id,
                    len(list_filter(toks, x -> x IN ('the','and','of','a','to','in','is','for','on','with'))) AS c_en,
                    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','mit','von','auf'))) AS c_de,
                    len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','de','dans','pour'))) AS c_fr,
                    len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','de','en','por'))) AS c_es
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(c_en, c_de, c_fr, c_es) = 0 THEN 'unknown'
                        WHEN c_fr >= c_en AND c_fr >= c_de AND c_fr >= c_es THEN 'fr'
                        WHEN c_es >= c_en AND c_es >= c_de THEN 'es'
                        WHEN c_en >= c_de THEN 'en'
                        ELSE 'de' END AS pred_lang
            FROM s
        """,
        "events_windowed": """
            SELECT user_id,
                   CAST(floor(epoch(ts)/3600) AS BIGINT) AS win,
                   count(*) AS n_events,
                   round(CAST(sum(value) AS DOUBLE), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_type_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "jaccard_join_exact": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS s
                FROM (SELECT doc_id, text,
                             unnest(range(1, length(text) - 3)) AS i
                      FROM documents)
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       count(*) AS n_common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.left_id, i.right_id,
                   round(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 6) AS jaccard
            FROM inter i
            JOIN cnt ca ON ca.doc_id = i.left_id
            JOIN cnt cb ON cb.doc_id = i.right_id
            WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= 0.5
        """,
        "containment_join_exact": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS s
                FROM (SELECT doc_id, text,
                             unnest(range(1, length(text) - 3)) AS i
                      FROM documents)
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       count(*) AS n_common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), both_dirs AS (
                SELECT i.left_id AS contained_id,
                       i.right_id AS container_id,
                       i.n_common, ca.n AS n_contained
                FROM inter i JOIN cnt ca ON ca.doc_id = i.left_id
                UNION ALL
                SELECT i.right_id, i.left_id, i.n_common, cb.n
                FROM inter i JOIN cnt cb ON cb.doc_id = i.right_id
            )
            SELECT contained_id, container_id,
                   round(n_common * 1.0 / n_contained, 6) AS containment
            FROM both_dirs
            WHERE n_common * 1.0 / n_contained >= 0.8
        """,
        "events_dedup_window": """
            SELECT event_id,
                   coalesce(ts - lag(ts) OVER (
                        PARTITION BY user_id, event_type,
                                     round(value * 1000000)
                        ORDER BY ts, event_id)
                        <= INTERVAL 600 SECOND, FALSE) AS is_dup
            FROM events
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                       AS norm_text,
                   CAST(length(trim(regexp_replace(lower(text), '\\s+',
                                                   ' ', 'g'))) AS BIGINT)
                       AS n_chars_norm
            FROM documents
        """,
        "jaccard_join_ppjoin": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS s
                FROM (SELECT doc_id, text,
                             unnest(range(1, length(text) - 3)) AS i
                      FROM documents)
            ), cnt AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                       count(*) AS n_common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT i.left_id, i.right_id,
                   round(i.n_common * 1.0 / (ca.n + cb.n - i.n_common), 6) AS jaccard
            FROM inter i
            JOIN cnt ca ON ca.doc_id = i.left_id
            JOIN cnt cb ON cb.doc_id = i.right_id
            WHERE i.n_common * 1.0 / (ca.n + cb.n - i.n_common) >= 0.5
        """,
        "common_substring_pairs": """
            WITH g AS (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 24) AS gm
                FROM (SELECT doc_id, text,
                             unnest(range(1, length(text) - 22)) AS i
                      FROM documents)
            )
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   count(*) AS n_shared
            FROM g a JOIN g b ON a.gm = b.gm AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        """,
        "column_quantiles": """
            WITH c AS (
                SELECT l_quantity AS v, count(*) AS cnt
                FROM lineitem GROUP BY 1
            ), cum AS (
                SELECT v, sum(cnt) OVER (ORDER BY v) AS cw FROM c
            ), t AS (SELECT count(*) AS total FROM lineitem),
            qs(q) AS (VALUES (0.25), (0.5), (0.75), (0.9), (0.99))
            SELECT CAST(qs.q AS DOUBLE) AS q,
                   CAST(min(cum.v) AS BIGINT) AS value
            FROM qs, t, cum
            WHERE cum.cw >= greatest(1, CAST(ceil(qs.q * t.total) AS BIGINT))
            GROUP BY qs.q
        """,
        "stopword_scrub": r"""
            SELECT doc_id,
                   regexp_replace(text, '\b(table|row|data)\b', '', 'g') AS clean_text,
                   len(regexp_extract_all(text, '\b(table|row|data)\b')) AS n_removed
            FROM documents
        """,
        "training_mix_sample": """
            WITH w AS (
                SELECT source,
                       (CAST(substr(source, 4) AS INT) % 4) + 1 AS wt
                FROM (SELECT DISTINCT source FROM documents)
            ), q AS (
                SELECT source, (200 * wt) // sum(wt) OVER () AS quota
                FROM w
            )
            SELECT d.doc_id, d.source,
                   row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS rk
            FROM documents d JOIN q USING (source)
            QUALIFY rk <= q.quota
        """,
        "dataset_split": """
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
                        THEN 'val' ELSE 'train' END AS split
            FROM documents
        """,
        "decontaminate": """
            WITH pos AS (
                SELECT doc_id, source, text,
                       unnest(range(1, length(text) - 22)) AS i
                FROM documents
            ), bg AS (
                SELECT DISTINCT substr(text, CAST(i AS INT), 24) AS gm
                FROM pos WHERE source = 'src0'
            ), dg AS (
                SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 24) AS gm
                FROM pos WHERE source <> 'src0'
            ), hits AS (
                SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (gm)
            )
            SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.source <> 'src0'
        """,
        "tfidf_top_terms": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM toks GROUP BY 1, 2
            ), df AS (
                SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), n AS (SELECT count(*) AS n FROM documents),
            s AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
                FROM tf JOIN df USING (term), n
            )
            SELECT doc_id, term, tf, df, score FROM s
            QUALIFY row_number() OVER (PARTITION BY doc_id
                ORDER BY score DESC, term ASC) <= 3
        """,
        "bm25_scores": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents
            ), dl AS (
                SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
            ), stats AS (
                SELECT count(*)::DOUBLE AS n,
                       CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                FROM dl
            ), tfs AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN term = 'table'  THEN 1 ELSE 0 END) AS DOUBLE) AS tf0,
                       CAST(sum(CASE WHEN term = 'data'   THEN 1 ELSE 0 END) AS DOUBLE) AS tf1,
                       CAST(sum(CASE WHEN term = 'system' THEN 1 ELSE 0 END) AS DOUBLE) AS tf2
                FROM toks GROUP BY 1
            ), dfs AS (
                SELECT CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
                       CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
                       CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
                FROM tfs
            ), s AS (
                SELECT t.doc_id,
                    ln((n - df0 + 0.5) / (df0 + 0.5) + 1) * tf0 * (1.2 + 1)
                      / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                  + ln((n - df1 + 0.5) / (df1 + 0.5) + 1) * tf1 * (1.2 + 1)
                      / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                  + ln((n - df2 + 0.5) / (df2 + 0.5) + 1) * tf2 * (1.2 + 1)
                      / (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
                FROM tfs t JOIN dl USING (doc_id), stats, dfs
            )
            SELECT doc_id, round(score, 6) AS bm25 FROM s WHERE score > 0
        """,
        "curation_pipeline": r"""
            WITH c AS (
                SELECT doc_id,
                       regexp_replace(text, '\b(table|row|data)\b', '', 'g') AS ct
                FROM documents
            ), f AS (
                SELECT doc_id, ct, length(ct) AS text_len,
                       length(regexp_replace(ct, '[^A-Za-z]', '', 'g')) AS na
                FROM c
            ), kept AS (
                SELECT * FROM f
                WHERE text_len >= 200 AND na * 100 >= 78 * text_len
            ), g AS (
                SELECT min(doc_id) AS doc_id, min(text_len) AS text_len,
                       count(*) AS n_copies
                FROM kept GROUP BY md5(ct)
            )
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
                        THEN 'val' ELSE 'train' END AS split,
                   text_len, n_copies
            FROM g
        """,
        "customers_without_urgent_orders": """
            SELECT c_custkey, c_mktsegment,
                   CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
        """,
        "orders_running_total": """
            SELECT o_orderkey, o_custkey,
                   CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                        OVER w AS BIGINT) AS run_total_cents,
                   row_number() OVER w AS order_rank
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        """,
        "events_grouped_sample": """
            WITH p AS (
                SELECT event_type, event_id,
                       CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                            AS BIGINT) AS prio
                FROM events
            ), r AS (
                SELECT event_type, event_id,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY prio, event_id) AS sample_rank
                FROM p
            )
            SELECT event_type, sample_rank, event_id
            FROM r WHERE sample_rank <= 20
        """,
        "segment_dedup": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), segs AS (
                SELECT doc_id, seg_idx,
                       array_to_string(t[seg_idx*8+1 : seg_idx*8+8], ' ') AS seg
                FROM toks,
                     UNNEST(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(seg_idx)
            ), marked AS (
                SELECT doc_id,
                       CASE WHEN row_number() OVER (
                                PARTITION BY seg ORDER BY doc_id, seg_idx) = 1
                            THEN 1 ELSE 0 END AS kept
                FROM segs
            )
            SELECT doc_id, count(*)::BIGINT AS n_segs,
                   CAST(sum(kept) AS BIGINT) AS n_kept
            FROM marked GROUP BY doc_id
        """,
        "token_communities": """
            WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
            e0 AS (SELECT ws[i] AS src, ws[i+1] AS dst
                   FROM w, UNNEST(generate_series(1, len(ws)-1)) t(i)),
            e AS (SELECT DISTINCT src, dst FROM
                  (SELECT src, dst FROM e0
                   UNION ALL SELECT dst, src FROM e0) q),
            n AS (SELECT DISTINCT src AS tok FROM e),
            l0 AS (SELECT tok, tok AS lab FROM n),
            l1 AS (SELECT x.tok, min(lab) AS lab FROM
                   (SELECT e.dst AS tok, l0.lab FROM e
                    JOIN l0 ON e.src = l0.tok
                    UNION ALL SELECT tok, lab FROM l0) x GROUP BY x.tok),
            l2 AS (SELECT x.tok, min(lab) AS lab FROM
                   (SELECT e.dst AS tok, l1.lab FROM e
                    JOIN l1 ON e.src = l1.tok
                    UNION ALL SELECT tok, lab FROM l1) x GROUP BY x.tok),
            l3 AS (SELECT x.tok, min(lab) AS lab FROM
                   (SELECT e.dst AS tok, l2.lab FROM e
                    JOIN l2 ON e.src = l2.tok
                    UNION ALL SELECT tok, lab FROM l2) x GROUP BY x.tok)
            SELECT tok, lab AS label FROM l3
        """,
        "degree_distribution": """
            WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
            e0 AS (SELECT ws[i] AS src, ws[i+1] AS dst
                   FROM w, UNNEST(generate_series(1, len(ws)-1)) t(i)),
            d AS (SELECT src, count(DISTINCT dst) AS out_degree
                  FROM e0 GROUP BY src)
            SELECT CAST(out_degree AS BIGINT) AS out_degree,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM d GROUP BY out_degree
        """,
        "pagerank_tokens": """
            WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
            e0 AS (SELECT ws[i] AS src, ws[i+1] AS dst
                   FROM w, UNNEST(generate_series(1, len(ws)-1)) t(i)),
            e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
                  FROM e0 GROUP BY src, dst),
            outw AS (SELECT src, sum(w) AS ow FROM e GROUP BY src),
            ep AS (SELECT e.src, e.dst, e.w / outw.ow AS p
                   FROM e JOIN outw ON e.src = outw.src),
            nodes AS (SELECT DISTINCT tok FROM
                      (SELECT src AS tok FROM e
                       UNION ALL SELECT dst FROM e) q),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            r0 AS (SELECT tok, 1.0 / n AS r FROM nodes CROSS JOIN nn),
            c1 AS (SELECT ep.dst AS tok, sum(r0.r * ep.p) AS c
                   FROM ep JOIN r0 ON ep.src = r0.tok GROUP BY ep.dst),
            r1 AS (SELECT nodes.tok, (1 - 0.85) / nn.n
                          + 0.85 * coalesce(c1.c, 0) AS r
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN c1 ON nodes.tok = c1.tok),
            c2 AS (SELECT ep.dst AS tok, sum(r1.r * ep.p) AS c
                   FROM ep JOIN r1 ON ep.src = r1.tok GROUP BY ep.dst),
            r2 AS (SELECT nodes.tok, (1 - 0.85) / nn.n
                          + 0.85 * coalesce(c2.c, 0) AS r
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN c2 ON nodes.tok = c2.tok),
            c3 AS (SELECT ep.dst AS tok, sum(r2.r * ep.p) AS c
                   FROM ep JOIN r2 ON ep.src = r2.tok GROUP BY ep.dst),
            r3 AS (SELECT nodes.tok, (1 - 0.85) / nn.n
                          + 0.85 * coalesce(c3.c, 0) AS r
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN c3 ON nodes.tok = c3.tok)
            SELECT tok, round(r, 9) AS rank FROM r3
        """,
        "simhash_md5_pairs": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ), tc AS (
                SELECT doc_id, tok, count(*) AS c
                FROM toks GROUP BY doc_id, tok
            ), h AS (
                SELECT doc_id, c,
                       CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
                FROM tc
            ), bits AS (
                SELECT doc_id, j,
                       CASE WHEN sum(CASE WHEN (hv >> j) & 1 = 1
                                          THEN c ELSE -c END) > 0
                            THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bitval
                FROM h, UNNEST(range(0, 60)) u(j) GROUP BY doc_id, j
            ), fp AS (
                SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS f
                FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 5
        """,
        "docs_stopword_profile": f"""
            WITH toks AS (
                SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            SELECT source, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN tok IN
                       ({_stoplist})
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
                   CAST(sum(CASE WHEN tok IN
                       ({_stoplist})
                       THEN 1 ELSE 0 END) * 1000000 // count(*)
                       AS BIGINT) AS stop_ratio_ppm
            FROM toks GROUP BY source
        """,
        "docs_prefix_cluster_sizes": """
            WITH fp AS (
                SELECT array_to_string(
                    list_slice(string_split(text, ' '), 1, 4), ' ')
                    AS fp
                FROM documents
            ), g AS (SELECT fp, count(*) AS sz FROM fp GROUP BY fp)
            SELECT sz AS group_size, count(*) AS n_groups,
                   CAST(sum(sz) AS BIGINT) AS n_docs
            FROM g GROUP BY sz
        """,
        "docs_zipf_slope": """
            WITH tok AS (
                SELECT unnest(string_split(text, ' ')) AS t
                FROM documents
            ), f AS (SELECT t, count(*) AS freq FROM tok GROUP BY t),
            r AS (SELECT freq,
                         row_number() OVER (ORDER BY freq DESC, t ASC)
                             AS rk
                  FROM f),
            s AS (SELECT count(*) AS n,
                         sum(ln(CAST(rk AS DOUBLE))) AS sx,
                         sum(ln(CAST(freq AS DOUBLE))) AS sy,
                         sum(ln(CAST(rk AS DOUBLE))
                             * ln(CAST(freq AS DOUBLE))) AS sxy,
                         sum(ln(CAST(rk AS DOUBLE))
                             * ln(CAST(rk AS DOUBLE))) AS sxx,
                         CAST(sum(freq) AS BIGINT) AS ntok
                  FROM r)
            SELECT CAST(n AS BIGINT) AS n_types, ntok AS n_tokens,
                   CAST(round(((n * sxy - sx * sy)
                               / (n * sxx - sx * sx)) * 1000000.0)
                        AS BIGINT) AS slope_micro,
                   CAST(round(((sy - ((n * sxy - sx * sy)
                                      / (n * sxx - sx * sx)) * sx) / n)
                              * 1000000.0) AS BIGINT)
                       AS intercept_micro
            FROM s
        """,
        "simhash64_shingle_pairs": f"""
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
                FROM toks, UNNEST(range(1, len(t)-1)) u(i)
                WHERE len(t) >= 3
            ), hv AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || substr(md5(s), 1, 16)) AS UBIGINT) AS h
                FROM sh
            ), fp AS (
                SELECT doc_id, {_sh64} AS f FROM hv GROUP BY doc_id
            )
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.f, b.f)) <= 6
        """,
        "token_cms_md5": """
            WITH tok AS (
                SELECT unnest(string_split(text, ' ')) AS t FROM documents
            ), f AS (SELECT t, count(*) AS freq FROM tok GROUP BY t),
            topk AS (SELECT t, freq FROM f
                     ORDER BY freq DESC, t ASC LIMIT 10),
            cells AS (
                SELECT r.r,
                       CAST(('0x' || substr(md5(r.r || ':' || f.t),
                                            1, 16)) AS UBIGINT)
                           % 1024 AS bucket,
                       CAST(sum(f.freq) AS BIGINT) AS c
                FROM f CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
                GROUP BY 1, 2
            ), est AS (
                SELECT tk.t, tk.freq,
                       (SELECT c.c FROM cells c
                        WHERE c.r = r.r AND c.bucket =
                            CAST(('0x' || substr(md5(r.r || ':' || tk.t),
                                                 1, 16)) AS UBIGINT)
                                % 1024) AS cell
                FROM topk tk
                CROSS JOIN (VALUES (0), (1), (2), (3)) r(r)
            )
            SELECT t AS token, CAST(freq AS BIGINT) AS true_freq,
                   CAST(min(cell) AS BIGINT) AS cms_est
            FROM est GROUP BY 1, 2
        """,
        "token_bloom_md5": """
            WITH tok AS (
                SELECT DISTINCT unnest(string_split(text, ' ')) AS t
                FROM documents
            ), bits AS (
                SELECT DISTINCT
                    CAST(('0x' || substr(md5(j.j || ':' || t), 1, 16))
                         AS UBIGINT) % 16384 AS bit
                FROM tok CROSS JOIN
                     (VALUES (0), (1), (2), (3), (4)) j(j)
            ), probes AS (
                SELECT t FROM tok ORDER BY t ASC LIMIT 12
            ), pr AS (
                SELECT t AS probe, 1 AS actually FROM probes
                UNION ALL
                SELECT t || '~miss', 0 FROM probes
            ), hits AS (
                SELECT pr.probe, pr.actually,
                       min(CASE WHEN EXISTS (
                           SELECT 1 FROM bits b WHERE b.bit =
                               CAST(('0x' || substr(
                                   md5(j.j || ':' || pr.probe), 1, 16))
                                    AS UBIGINT) % 16384)
                           THEN 1 ELSE 0 END) AS hit
                FROM pr CROSS JOIN
                     (VALUES (0), (1), (2), (3), (4)) j(j)
                GROUP BY 1, 2
            )
            SELECT probe, CAST(hit AS BIGINT) AS present_in_filter,
                   CAST(actually AS BIGINT) AS actually_present
            FROM hits
        """,
        "events_funnel_conversion": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t
                       FROM events),
            s1 AS (SELECT user_id, min(t) AS t1 FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.t) AS t2
                   FROM e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.t > s1.t1
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.t) AS t3
                   FROM e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.t > s2.t2
                   GROUP BY e.user_id),
            n1 AS (SELECT count(*) AS c FROM s1),
            n2 AS (SELECT count(*) AS c FROM s2),
            n3 AS (SELECT count(*) AS c FROM s3)
            SELECT 1 AS step, 'view' AS step_name,
                   (SELECT c FROM n1) AS n_users,
                   CAST((SELECT c FROM n1) * 1000000
                        // greatest((SELECT c FROM n1), 1) AS BIGINT)
                       AS conversion_ppm
            UNION ALL
            SELECT 2, 'click', (SELECT c FROM n2),
                   CAST((SELECT c FROM n2) * 1000000
                        // greatest((SELECT c FROM n1), 1) AS BIGINT)
            UNION ALL
            SELECT 3, 'purchase', (SELECT c FROM n3),
                   CAST((SELECT c FROM n3) * 1000000
                        // greatest((SELECT c FROM n1), 1) AS BIGINT)
        """,
        "events_props_field_stats": """
            WITH x AS (
                SELECT event_type,
                       CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
                            AS BIGINT) AS k
                FROM events
            )
            SELECT event_type, count(*) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(max(k) AS BIGINT) AS max_k,
                   CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM x GROUP BY event_type
        """,
        "events_type_hll_users_md5": """
            WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
            h AS (SELECT event_type,
                         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                              1, 16)) AS UBIGINT) AS hv
                  FROM u),
            r AS (SELECT event_type,
                         CAST(hv >> 52 AS BIGINT) AS idx,
                         CAST(CASE WHEN (hv & 4503599627370495) = 0
                                   THEN 53
                                   ELSE 52 - length(bin(hv
                                        & 4503599627370495)) + 1
                              END AS BIGINT) AS rank
                  FROM h),
            reg AS (SELECT event_type, idx, max(rank) AS rank
                    FROM r GROUP BY 1, 2),
            st AS (SELECT event_type, count(*) AS n_present,
                          sum(CASE WHEN rank = 0 THEN 1 ELSE 0 END)
                              AS zeros_present,
                          sum(pow(2.0, -rank)) AS s
                   FROM reg GROUP BY 1),
            ne AS (SELECT event_type, count(*) AS n_events
                   FROM events GROUP BY 1),
            est AS (SELECT st.event_type, ne.n_events,
                           (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0
                           * 4096.0
                           / (st.s + (4096 - st.n_present) * 1.0) AS e,
                           (4096 - st.n_present + st.zeros_present)
                               AS zeros
                    FROM st JOIN ne USING (event_type))
            SELECT event_type, n_events,
                   CAST(round(CASE WHEN e <= 2.5 * 4096.0
                                        AND zeros > 0
                                   THEN 4096.0 * ln(4096.0 / zeros)
                                   ELSE e END) AS BIGINT) AS hll_users
            FROM est
        """,
        "events_daily_anomaly": """
            WITH d AS (
                SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS c
                FROM events GROUP BY 1, 2
            ), st AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(c) AS BIGINT) AS s1,
                       CAST(sum(c * c) AS BIGINT) AS s2
                FROM d GROUP BY 1
            )
            SELECT d.event_type, st.n AS n_days,
                   CAST(sum(CASE WHEN
                       (CAST(d.c AS HUGEINT) * st.n - st.s1)
                       * (CAST(d.c AS HUGEINT) * st.n - st.s1)
                       > 4 * CAST(st.n AS HUGEINT)
                         * (CAST(st.n AS HUGEINT) * st.s2
                            - CAST(st.s1 AS HUGEINT) * st.s1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
            FROM d JOIN st USING (event_type)
            GROUP BY d.event_type, st.n
        """,
        "events_bounce_rate": """
            WITH e AS (SELECT user_id, event_type, event_id,
                              epoch_us(ts) AS t
                       FROM events),
            m AS (SELECT *,
                         CASE WHEN lag(t) OVER w IS NULL
                                   OR t - lag(t) OVER w > 1800000000
                              THEN 1 ELSE 0 END AS new_sess
                  FROM e
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY t, event_id)),
            s AS (SELECT *,
                         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
                  FROM m),
            g AS (SELECT user_id, sid, count(*) AS ne,
                         first(event_type ORDER BY t, event_id)
                             AS first_type
                  FROM s GROUP BY 1, 2)
            SELECT first_type, count(*) AS n_sessions,
                   CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bounce,
                   CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)
                        * 1000000 // greatest(count(*), 1) AS BIGINT)
                       AS bounce_ppm
            FROM g GROUP BY first_type
        """,
        "customer_order_gap_stats": """
            WITH o AS (
                SELECT o_custkey,
                       epoch_us(o_orderdate) // 86400000000 AS day
                FROM orders
            ), g AS (
                SELECT o_custkey,
                       day - lag(day) OVER (PARTITION BY o_custkey
                                            ORDER BY day) AS gap
                FROM o
            ), p AS (
                SELECT o_custkey, CAST(count(gap) AS BIGINT) AS ng,
                       CAST(sum(gap) AS BIGINT) AS sg,
                       CAST(max(gap) AS BIGINT) AS mg
                FROM g WHERE gap IS NOT NULL GROUP BY 1
            )
            SELECT c.c_mktsegment,
                   count(*) AS n_customers_multi,
                   CAST(sum(p.ng) AS BIGINT) AS n_gaps,
                   CAST(sum(p.sg) AS BIGINT) AS sum_gap_days,
                   CAST(max(p.mg) AS BIGINT) AS max_gap_days
            FROM p JOIN customer c ON c.c_custkey = p.o_custkey
            GROUP BY 1
        """,
        "supplier_revenue_pareto": """
            WITH rev AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS BIGINT)) AS BIGINT) AS cents
                FROM lineitem GROUP BY 1
            ), r AS (
                SELECT cents,
                       CAST(sum(cents) OVER (ORDER BY cents DESC,
                            l_suppkey ASC ROWS UNBOUNDED PRECEDING)
                            AS BIGINT) AS cum,
                       row_number() OVER (ORDER BY cents DESC,
                                          l_suppkey ASC) AS k
                FROM rev
            ), tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM rev),
            pick AS (
                SELECT th.th, min(r.k) AS n
                FROM r, tot, (VALUES (50), (80), (90), (99)) th(th)
                WHERE r.cum * 100 >= th.th * tot.t
                GROUP BY th.th
            )
            SELECT CAST(p.th AS BIGINT) AS pct_threshold,
                   CAST(p.n AS BIGINT) AS n_suppliers,
                   CAST(r2.cum * 1000000 // greatest(tot.t, 1)
                        AS BIGINT) AS share_ppm
            FROM pick p JOIN r r2 ON r2.k = p.n, tot
        """,
        "lsh_param_sweep": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, len(t)-1)) u(i)
                WHERE len(t) >= 3
            ), hv AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
                FROM sh
            ),
            bm4 AS (SELECT doc_id, h % 4 AS band, min(h) AS mv
                    FROM hv GROUP BY 1, 2),
            bm8 AS (SELECT doc_id, h % 8 AS band, min(h) AS mv
                    FROM hv GROUP BY 1, 2),
            bm16 AS (SELECT doc_id, h % 16 AS band, min(h) AS mv
                     FROM hv GROUP BY 1, 2),
            bm32 AS (SELECT doc_id, h % 32 AS band, min(h) AS mv
                     FROM hv GROUP BY 1, 2),
            p4 AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                   FROM bm4 a JOIN bm4 b
                     ON a.band = b.band AND a.mv = b.mv
                    AND a.doc_id < b.doc_id),
            p8 AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                   FROM bm8 a JOIN bm8 b
                     ON a.band = b.band AND a.mv = b.mv
                    AND a.doc_id < b.doc_id),
            p16 AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                    FROM bm16 a JOIN bm16 b
                      ON a.band = b.band AND a.mv = b.mv
                     AND a.doc_id < b.doc_id),
            p32 AS (SELECT DISTINCT a.doc_id AS l, b.doc_id AS r
                    FROM bm32 a JOIN bm32 b
                      ON a.band = b.band AND a.mv = b.mv
                     AND a.doc_id < b.doc_id),
            nref AS (SELECT count(*) AS n FROM p32)
            SELECT 4 AS bands,
                   (SELECT count(*) FROM p4) AS n_candidate_pairs,
                   (SELECT n FROM nref) AS n_ref_pairs,
                   round(CAST((SELECT count(*) FROM p4 JOIN p32
                               USING (l, r)) AS DOUBLE)
                         / greatest((SELECT n FROM nref), 1), 6)
                       AS recall_vs_ref
            UNION ALL
            SELECT 8, (SELECT count(*) FROM p8), (SELECT n FROM nref),
                   round(CAST((SELECT count(*) FROM p8 JOIN p32
                               USING (l, r)) AS DOUBLE)
                         / greatest((SELECT n FROM nref), 1), 6)
            UNION ALL
            SELECT 16, (SELECT count(*) FROM p16), (SELECT n FROM nref),
                   round(CAST((SELECT count(*) FROM p16 JOIN p32
                               USING (l, r)) AS DOUBLE)
                         / greatest((SELECT n FROM nref), 1), 6)
            UNION ALL
            SELECT 32, (SELECT count(*) FROM p32), (SELECT n FROM nref),
                   round(CAST((SELECT count(*) FROM p32 JOIN p32 pp
                               ON p32.l = pp.l AND p32.r = pp.r)
                              AS DOUBLE)
                         / greatest((SELECT n FROM nref), 1), 6)
        """,
        "corpus_phash_topk": f"""
            WITH q AS (SELECT image_id AS qid, phash AS qh
                       FROM read_parquet('{_cglob}')
                       ORDER BY image_id LIMIT 1)
            SELECT r.image_id,
                   CAST(bit_count(xor(r.phash, q.qh)) AS BIGINT)
                       AS hamming
            FROM read_parquet('{_cglob}') r, q
            WHERE r.image_id <> q.qid
            ORDER BY hamming, r.image_id LIMIT 10
        """,
        "corpus_aspect_buckets": f"""
            WITH buckets AS (
                SELECT * FROM (VALUES {_bvals}) b(bidx, bw, bh)
            ), assigned AS (
                SELECT r.w, r.h,
                       (SELECT b.bidx FROM buckets b
                        ORDER BY abs(ln(CAST(r.w AS DOUBLE) / r.h)
                                     - ln(CAST(b.bw AS DOUBLE) / b.bh)),
                                 b.bidx
                        LIMIT 1) AS bidx
                FROM read_parquet('{_cglob}') r
            ), kept AS (
                SELECT a.bidx, b.bw, b.bh,
                       least(exp(ln(CAST(a.w AS DOUBLE) / a.h)
                                 - ln(CAST(b.bw AS DOUBLE) / b.bh)),
                             1.0 / exp(ln(CAST(a.w AS DOUBLE) / a.h)
                                       - ln(CAST(b.bw AS DOUBLE)
                                            / b.bh))) AS k
                FROM assigned a JOIN buckets b ON b.bidx = a.bidx
            )
            SELECT CAST(bw AS BIGINT) AS bucket_w,
                   CAST(bh AS BIGINT) AS bucket_h,
                   count(*) AS n,
                   CAST(count(*) // 64 AS BIGINT) AS n_full_batches,
                   round(100.0 * sum(k) / count(*), 3)
                       AS pct_pixels_kept
            FROM kept GROUP BY bidx, bw, bh
        """,
        "minhash_lsh_oph": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, len(t)-1)) u(i)
                WHERE len(t) >= 3
            ), hv AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
                FROM sh
            ), bm AS (
                SELECT doc_id, h % 16 AS band, min(h) AS mv
                FROM hv GROUP BY doc_id, band
            )
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   count(*) AS n_shared
            FROM bm a JOIN bm b
              ON a.band = b.band AND a.mv = b.mv AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        """,
        "incremental_dedup": """
            WITH p AS (
                SELECT doc_id, source,
                       array_to_string(string_split(text, ' ')[1:8], ' ') AS fp
                FROM documents
            ), idx AS (
                SELECT DISTINCT fp FROM p WHERE source = 'src0'
            ), new AS (
                SELECT doc_id, fp FROM p WHERE source <> 'src0'
            ), firsts AS (
                SELECT fp, min(doc_id) AS first_doc FROM new GROUP BY fp
            )
            SELECT n.doc_id,
                   CASE WHEN n.fp IN (SELECT fp FROM idx) THEN 'dup_index'
                        WHEN n.doc_id <> f.first_doc THEN 'dup_new'
                        ELSE 'unique' END AS status
            FROM new n JOIN firsts f ON n.fp = f.fp
        """,
        "pii_scrub": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@example.com call '
                            || (doc_id % 900 + 100) || '-555-'
                            || (doc_id % 9000 + 1000)
                            || ' from 10.' || (doc_id % 256) || '.0.'
                            || (doc_id % 100 + 1)
                            || CASE WHEN doc_id % 3 = 0
                                    THEN ' alt admin@test.org' ELSE '' END AS a
                FROM documents
            ), s1 AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(a,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                       regexp_replace(a,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS c1
                FROM aug
            ), s2 AS (
                SELECT doc_id, n_email,
                       CAST(len(regexp_extract_all(c1,
                           '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
                       regexp_replace(c1, '\b\d{3}-\d{3}-\d{4}\b',
                                      '[PHONE]', 'g') AS c2
                FROM s1
            )
            SELECT doc_id, n_email, n_phone,
                   CAST(len(regexp_extract_all(c2,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
                   regexp_replace(c2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                                  '[IP]', 'g') AS clean_text
            FROM s2
        """,
        "exact_dedup_docs": """
            SELECT md5(text) AS h,
                   min(doc_id) AS keeper_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "token_count": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        """,
        "stratified_kfold": """
            WITH r AS (SELECT lang, n_chars,
                              (row_number() OVER (
                                   PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)))
                               - 1) % 5 AS fold
                       FROM documents)
            SELECT lang, CAST(fold AS BIGINT) AS fold,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM r GROUP BY lang, fold
        """,
        "readability_scores": """
            WITH f AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       greatest(CAST(
                           length(text)
                           - length(replace(text, '.', ''))
                           + length(text)
                           - length(replace(text, '!', ''))
                           + length(text)
                           - length(replace(text, '?', ''))
                           AS BIGINT), 1) AS n_sentences,
                       CAST(length(lower(text))
                            - length(regexp_replace(lower(text),
                                                    '[aeiou]', '', 'g'))
                            AS BIGINT) AS n_vowels
                FROM documents)
            SELECT doc_id, n_words, n_sentences, n_vowels,
                   206835000
                   - (1015000 * n_words) // n_sentences
                   - (84600000 * n_vowels) // n_words AS flesch_micro
            FROM f
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+')) AS n_tokens_bpe
            FROM documents
        """,
        "top_ngrams": """
            WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
            g AS (SELECT ws[i] || ' ' || ws[i+1] AS gram
                  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1)) AS i) t)
            SELECT gram, count(*)::BIGINT AS cnt FROM g
            GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
        """,
        "repetition_scores": """
            WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            per AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
            SELECT doc_id,
                   sum(c)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_distinct,
                   max(c)::BIGINT AS top_tok_n
            FROM per GROUP BY doc_id
        """,
        "quality_score": r"""
            SELECT doc_id,
                   length(text) AS text_len,
                   length(regexp_replace(text, '[[:alnum:][:space:]_]', '', 'g')) AS n_punct,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        """,
        "container_refs": """
            SELECT source,
                   count(*) AS refs,
                   CAST(sum(n_chars) AS BIGINT) AS ref_bytes
            FROM documents GROUP BY source
        """,
        "cap_top_containers": """
            SELECT source, CAST(sum(n_chars) AS BIGINT) AS ref_bytes
            FROM documents GROUP BY source
            ORDER BY ref_bytes DESC, source ASC
            LIMIT 10
        """,
        "bigram_pmi": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS ts FROM documents
            ), seq AS (
                SELECT doc_id, unnest(ts) AS tok,
                       generate_subscripts(ts, 1) AS i
                FROM toks
            ), big AS (
                SELECT a.tok AS t1, b.tok AS t2, count(*) AS cxy
                FROM seq a JOIN seq b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1
                GROUP BY 1, 2
            ), uni AS (
                SELECT tok, count(*) AS c FROM seq GROUP BY tok
            ), tot AS (
                SELECT (SELECT sum(c) FROM uni) AS n,
                       (SELECT sum(cxy) FROM big) AS m
            )
            SELECT t1, t2, cxy,
                   CAST(round(ln((CAST(cxy AS DOUBLE) / m)
                        / ((CAST(u1.c AS DOUBLE) / n)
                           * (CAST(u2.c AS DOUBLE) / n))) * 1000000)
                        AS BIGINT) AS pmi_micro
            FROM big CROSS JOIN tot
            JOIN uni u1 ON big.t1 = u1.tok
            JOIN uni u2 ON big.t2 = u2.tok
            WHERE cxy >= 5
            ORDER BY pmi_micro DESC, t1, t2 LIMIT 50
        """,
        "unigram_logprob": """
            WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ), counts AS (
                SELECT tok, CAST(count(*) AS DOUBLE) AS c
                FROM toks GROUP BY tok
            ), total AS (
                SELECT sum(c) AS n FROM counts
            ), vocab AS (
                SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 1024
            )
            SELECT t.doc_id,
                   CAST(sum(CASE WHEN v.tok IS NOT NULL
                        THEN CAST(round(ln(v.c / (SELECT n FROM total)) * 1000000) AS BIGINT)
                        ELSE CAST(round(ln(0.5 / (SELECT n FROM total)) * 1000000) AS BIGINT)
                        END) AS BIGINT) AS logprob_micro
            FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY t.doc_id
        """,
        "distinct_tokens_exact": """
            SELECT lang,
                   count(DISTINCT tok) AS n_distinct_tokens
            FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ) GROUP BY lang
        """,
        "docs_stats_by_lang": """
            SELECT lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang
        """,
        "events_sliding_window": """
            WITH v AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value*1000000) AS BIGINT) AS vmic
                FROM events
            )
            SELECT event_id, user_id,
                   CAST(sum(vmic) OVER w AS BIGINT) AS roll_sum_micro,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n
            FROM v
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "events_type_mad": """
            WITH v AS (
                SELECT event_type,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            ), med AS (
                SELECT event_type, vmic AS m FROM (
                    SELECT event_type, vmic,
                           row_number() OVER (PARTITION BY event_type
                                              ORDER BY vmic) AS rk,
                           count(*) OVER (PARTITION BY event_type) AS n
                    FROM v
                ) WHERE rk = CAST(ceil(0.5 * n) AS BIGINT)
            )
            SELECT event_type, n, median_micro, mad_micro FROM (
                SELECT v.event_type,
                       med.m AS median_micro,
                       abs(v.vmic - med.m) AS dev,
                       row_number() OVER (PARTITION BY v.event_type
                                          ORDER BY abs(v.vmic - med.m)) AS rk,
                       count(*) OVER (PARTITION BY v.event_type) AS n
                FROM v JOIN med USING (event_type)
            ) sub(event_type, median_micro, mad_micro, rk, n)
            WHERE rk = CAST(ceil(0.5 * n) AS BIGINT)
        """,
        "events_user_mode": """
            SELECT user_id, event_type AS mode_event_type, n FROM (
                SELECT user_id, event_type, count(*) AS n
                FROM events GROUP BY user_id, event_type
            )
            QUALIFY row_number() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, event_type) = 1
        """,
        "user_retention_cohorts": """
            WITH ud AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ), c AS (
                SELECT user_id, min(day) AS cohort FROM ud GROUP BY user_id
            )
            SELECT CAST(c.cohort AS VARCHAR) AS cohort_day,
                   CAST(datediff('day', c.cohort, ud.day) AS BIGINT)
                       AS day_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM ud JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "events_upsert_latest": """
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id,
                   CAST(round(value * 1000000) AS BIGINT) AS value_micro,
                   CASE WHEN event_id % 2 = 1 THEN 'delta' ELSE 'base' END
                       AS src
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY (event_id % 2) DESC, ts DESC, event_id DESC) = 1
        """,
        "lineitem_corr_stats": """
            WITH m AS (
                SELECT l_returnflag,
                       CAST(count(*) AS HUGEINT) AS n,
                       sum(CAST(l_quantity AS HUGEINT)) AS sx,
                       sum(CAST(round(l_extendedprice * 100) AS HUGEINT))
                           AS sy,
                       sum(CAST(l_quantity AS HUGEINT)
                           * CAST(round(l_extendedprice * 100) AS HUGEINT))
                           AS sxy,
                       sum(CAST(l_quantity AS HUGEINT)
                           * CAST(l_quantity AS HUGEINT)) AS sxx,
                       sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                           * CAST(round(l_extendedprice * 100) AS HUGEINT))
                           AS syy
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n,
                   CAST(sx AS BIGINT) AS sum_qty,
                   CAST(sy AS BIGINT) AS sum_price_cents,
                   CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) * 1000000.0
                              / sqrt(CAST((n * sxx - sx * sx)
                                          * (n * syy - sy * sy) AS DOUBLE)))
                        AS BIGINT) AS corr_micro
            FROM m
        """,
        "triangle_count": """
            WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
            bg AS (SELECT ws[i] AS u, ws[i+1] AS v
                   FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws)-1))
                                    AS i) t),
            e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
                  FROM bg WHERE u <> v),
            nodes AS (SELECT a AS x FROM e UNION SELECT b FROM e)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
                   (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
                   (SELECT CAST(count(*) AS BIGINT)
                    FROM e e1 JOIN e e2 ON e2.a = e1.b
                              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
                       AS n_triangles
        """,
        "user_event_paths": """
            WITH r AS (
                SELECT user_id, event_type, ts, event_id FROM events
                QUALIFY row_number() OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) <= 20
            )
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
                   CAST(count(*) AS BIGINT) AS n_steps
            FROM r GROUP BY user_id
        """,
        "events_weighted_sample": """
            WITH r AS (
                SELECT event_type, event_id,
                       CAST(round(-ln(
                           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                                                1, 13)) AS BIGINT)
                           / 4503599627370496.0) / value * 1000000)
                            AS BIGINT) AS rank_micro
                FROM events WHERE value > 0
            )
            SELECT event_type, event_id, rank_micro FROM r
            QUALIFY row_number() OVER (PARTITION BY event_type
                                       ORDER BY rank_micro, event_id) <= 10
        """,
        "events_version_diff": """
            WITH v AS (
                SELECT event_id,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            ), b AS (
                SELECT event_id AS k,
                       CASE WHEN event_id % 5 = 0 THEN vmic + 1000000
                            ELSE vmic END AS bv
                FROM v WHERE event_id % 3 <> 0
            ), c AS (
                SELECT event_id AS k, vmic AS cv FROM v
                WHERE event_id % 7 <> 0
            )
            SELECT coalesce(b.k, c.k) AS event_id,
                   CASE WHEN b.k IS NULL THEN 'added'
                        WHEN c.k IS NULL THEN 'removed'
                        WHEN bv = cv THEN 'same'
                        ELSE 'changed' END AS status
            FROM b FULL OUTER JOIN c ON b.k = c.k
        """,
        "events_props_stats": """
            WITH v AS (
                SELECT event_type,
                       CAST(json_extract(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(max(k) AS BIGINT) AS max_k
            FROM v WHERE k IS NOT NULL GROUP BY event_type
        """,
        "cust_orders_full_join": """
            WITH c AS (
                SELECT c_custkey AS k, 1 AS is_building FROM customer
                WHERE c_mktsegment = 'BUILDING'
            ), o AS (
                SELECT o_custkey AS k, count(*) AS n_urgent FROM orders
                WHERE o_orderpriority = '1-URGENT' GROUP BY 1
            )
            SELECT coalesce(c.k, o.k) AS custkey,
                   CAST(coalesce(is_building, 0) AS BIGINT) AS is_building,
                   CAST(coalesce(n_urgent, 0) AS BIGINT) AS n_urgent
            FROM c FULL OUTER JOIN o ON c.k = o.k
        """,
        "lineitem_cube": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "source_token_entropy": """
            WITH tc AS (
                SELECT source, tok, count(*) AS c FROM (
                    SELECT source, unnest(string_split(text, ' ')) AS tok
                    FROM documents
                ) GROUP BY source, tok
            ), tot AS (
                SELECT source, sum(c) AS n FROM tc GROUP BY source
            )
            SELECT tc.source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(-sum(c * CAST(round(
                        ln(CAST(c AS DOUBLE) / n) * 1000000) AS BIGINT))
                        AS BIGINT) AS entropy_scaled
            FROM tc JOIN tot ON tc.source = tot.source
            GROUP BY tc.source
        """,
        "orders_lineitem_left_join": """
            SELECT o_orderkey,
                   CAST(count(l.l_orderkey) AS BIGINT) AS n_late_items,
                   CAST(coalesce(sum(CAST(l.l_quantity AS BIGINT)), 0)
                        AS BIGINT) AS late_qty
            FROM orders o LEFT JOIN lineitem l
              ON l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > TIMESTAMP '2001-01-01'
            GROUP BY o_orderkey
        """,
        "events_value_delta": """
            WITH v AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            )
            SELECT event_id, user_id, vmic AS value_micro,
                   vmic - lag(vmic) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       AS delta_micro
            FROM v
        """,
        "docs_jsonl_stats": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "edit_distance_pairs": """
            WITH f AS (
                SELECT doc_id, text,
                       array_to_string(list_slice(string_split(text, ' '),
                                                  1, 4), ' ') AS fp
                FROM documents
            )
            SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                   CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
            FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
            WHERE levenshtein(a.text, b.text) <= 10
        """,
        "events_incremental_stats": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micro
            FROM events GROUP BY event_type
        """,
        "zorder_layout_stats": f"""
            WITH v AS (
                SELECT user_id % 256 AS u,
                       (epoch_us(ts) // 3600000000) % 256 AS h
                FROM events
            ),
            z AS (SELECT u, h, ({_zterms}) AS zval FROM v)
            SELECT CAST(zval // 256 AS BIGINT) AS tile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT u) AS BIGINT) AS n_users,
                   CAST(count(DISTINCT h) AS BIGINT) AS n_hours
            FROM z GROUP BY 1
        """,
        "event_transitions": """
            WITH s AS (
                SELECT user_id, event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            )
            SELECT prev_type AS from_type, event_type AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        """,
        "events_hourly_active_users": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
            FROM events GROUP BY 1
        """,
        "events_recent_stats": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micro
            FROM events
            WHERE ts >= TIMESTAMP '2001-06-01'
            GROUP BY event_type
        """,
        "event_type_cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "events_type_top_values": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(round(value * 1000000) AS BIGINT) AS value_micro
                FROM events
            )
            SELECT event_id, event_type, value_micro
            FROM v
            QUALIFY dense_rank() OVER (PARTITION BY event_type
                                       ORDER BY value_micro DESC) <= 3
        """,
        "events_time_weighted_avg": """
            WITH v AS (
                SELECT user_id, event_id,
                       epoch_us(ts) // 1000000 AS ts_sec,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            ),
            l AS (
                SELECT user_id, vmic, ts_sec,
                       lead(ts_sec) OVER (PARTITION BY user_id
                                          ORDER BY ts_sec, event_id) AS nxt
                FROM v
            )
            SELECT user_id,
                   CAST(coalesce(sum(vmic * (nxt - ts_sec)), 0)
                        AS BIGINT) AS twa_num,
                   CAST(coalesce(sum(nxt - ts_sec), 0) AS BIGINT) AS twa_den
            FROM l GROUP BY user_id
        """,
        "schema_evolution_backfill": """
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'und' ELSE lang END
                       AS lang,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1
        """,
        "user_erasure_certified": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micro
            FROM events WHERE user_id <> 7 GROUP BY event_type
        """,
        "events_k_anonymity": """
            WITH g AS (
              SELECT event_type,
                     CAST((epoch_us(ts) // 86400000000 + 4) % 7
                          AS BIGINT) AS dow,
                     CAST(floor(value / 10) AS BIGINT) AS vb,
                     count(*) AS n,
                     count(DISTINCT user_id) AS ndu
              FROM events GROUP BY 1, 2, 3)
            SELECT k,
                   (SELECT CAST(count(*) AS BIGINT) FROM g) AS n_groups,
                   CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_groups_below_k,
                   CAST(sum(CASE WHEN n < k THEN n ELSE 0 END)
                        AS BIGINT) AS rows_at_risk,
                   CAST(sum(CASE WHEN ndu < k THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_groups_l_below_k
            FROM g CROSS JOIN (SELECT unnest([2, 5, 10, 20]) AS k) ks
            GROUP BY k ORDER BY k
        """,
        "transactional_commit_readback": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micro
            FROM events GROUP BY event_type
        """,
        "zonemap_prune_stats": """
            WITH s AS (SELECT min(event_id) AS lo, max(event_id) AS hi
                       FROM events),
                 k AS (SELECT lo, hi, hi - lo + 1 AS span,
                              lo + (hi - lo) * 3 // 8 AS a,
                              lo + (hi - lo) * 5 // 8 AS b
                       FROM s),
                 t AS (SELECT event_id,
                              CAST(round(value * 1000000) AS BIGINT)
                                  AS vmic,
                              (event_id - (SELECT lo FROM k)) * 16
                                  // (SELECT span FROM k) AS bkt
                       FROM events),
                 z AS (SELECT bkt, min(event_id) AS mn,
                              max(event_id) AS mx
                       FROM t GROUP BY bkt)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM z) AS n_shards,
                   (SELECT CAST(count(*) AS BIGINT) FROM z
                    WHERE mn <= (SELECT b FROM k)
                      AND mx >= (SELECT a FROM k)) AS n_shards_scanned,
                   (SELECT CAST(count(*) AS BIGINT) FROM t
                    WHERE event_id BETWEEN (SELECT a FROM k)
                                       AND (SELECT b FROM k)) AS n_rows,
                   (SELECT CAST(sum(vmic) AS BIGINT) FROM t
                    WHERE event_id BETWEEN (SELECT a FROM k)
                                       AND (SELECT b FROM k))
                       AS sum_value_micro
        """,
        "partitioned_write_readback": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                        AS BIGINT) AS sum_value_micro
            FROM events WHERE event_type = 'purchase'
            GROUP BY event_type
        """,
        "docs_csv_stats": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY source
        """,
        "events_ewma": """
            WITH v AS (
                SELECT event_id, user_id, ts,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            ),
            l AS (
                SELECT event_id, user_id, vmic,
                       lag(vmic, 1) OVER w AS l1,
                       lag(vmic, 2) OVER w AS l2,
                       lag(vmic, 3) OVER w AS l3
                FROM v
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id, user_id,
                   CAST(8 * vmic + 4 * coalesce(l1, 0)
                        + 2 * coalesce(l2, 0)
                        + 1 * coalesce(l3, 0) AS BIGINT) AS ewma_num,
                   CAST(8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END
                          + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END
                          + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS ewma_den
            FROM l
        """,
        "embedding_model_scores": f"""
            WITH u AS (
                SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            ),
            w AS (SELECT {_wlit} AS wl)
            SELECT vec_id,
                   CAST(sum(wl[i] * CAST(round(CAST(x AS DOUBLE) * 1000000)
                                         AS BIGINT)) AS BIGINT)
                       AS score_micro
            FROM u, w GROUP BY vec_id
        """,
        "docs_embedding_join_stats": """
            SELECT lang, CAST(label AS BIGINT) AS label,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY 1, 2
        """,
        "source_length_gini": """
            WITH r AS (
                SELECT source, n_chars,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY n_chars) AS rn
                FROM documents
            )
            SELECT source,
                   CAST(2 * sum(rn * n_chars)
                        - (count(*) + 1) * sum(n_chars) AS BIGINT)
                       AS gini_num,
                   CAST(count(*) * sum(n_chars) AS BIGINT) AS gini_den
            FROM r GROUP BY source
        """,
        "heavy_hitter_tokens": """
            WITH t AS (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM documents
            )
            SELECT token, CAST(count(*) AS BIGINT) AS est_count,
                   CAST(0 AS BIGINT) AS max_err
            FROM t GROUP BY token
            ORDER BY est_count DESC, token
            LIMIT 10
        """,
        "doc_feature_hashing": """
            WITH t AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 31, 2)) AS BIGINT) % 64
                       AS dim,
                   CAST(count(*) AS BIGINT) AS v
            FROM t GROUP BY 1, 2
        """,
        "pretraining_pipeline": """
            WITH r AS (
                SELECT doc_id, lang, n_chars, text,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars) AS rn,
                       count(*) OVER (PARTITION BY lang) AS cnt
                FROM documents
            ),
            thr AS (SELECT lang, min(n_chars) AS cut FROM r
                    WHERE rn >= ceil(0.5 * cnt) GROUP BY lang),
            kept0 AS (
                SELECT doc_id, r.lang, n_chars, text,
                       array_to_string(list_slice(string_split(text, ' '),
                                                  1, 4), ' ') AS fp
                FROM r JOIN thr ON r.lang = thr.lang
                WHERE n_chars >= cut
            ),
            kept AS (
                SELECT doc_id, text FROM kept0
                QUALIFY row_number() OVER (PARTITION BY fp
                                           ORDER BY n_chars DESC,
                                                    doc_id) = 1
            ),
            d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
            t AS (SELECT doc_id, i
                  FROM d, UNNEST(generate_series(1, len(ws))) s(i)),
            g AS (SELECT doc_id,
                         row_number() OVER (ORDER BY doc_id, i) - 1 AS gp
                  FROM t)
            SELECT CAST(gp // 128 AS BIGINT) AS seq_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM g GROUP BY 1
        """,
        "tokenize_to_ids": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            t AS (SELECT doc_id, i, ws[i] AS tok
                  FROM d, UNNEST(generate_series(1, len(ws))) s(i)),
            c AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
            v AS (SELECT tok,
                         row_number() OVER (ORDER BY n DESC, tok) - 1
                             AS token_id
                  FROM c)
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   CAST(token_id AS BIGINT) AS token_id
            FROM t JOIN v USING (tok)
            WHERE i <= 8
        """,
        "logreg_train_lang": """
            WITH c AS (
              SELECT SUM(n_chars) // COUNT(*) AS c1,
                     SUM((length(text) - length(replace(text, ' the ', '')))
                         // 5) // COUNT(*) AS c2
              FROM documents),
            f AS (
              SELECT CASE WHEN len(string_split(text, ' ')) > 50
                          THEN 1.0 ELSE 0.0 END AS y,
                     CAST(n_chars - c.c1 AS DOUBLE) * 0.01 AS x1,
                     CAST((length(text) - length(replace(text, ' the ', '')))
                          // 5 - c.c2 AS DOUBLE) AS x2
              FROM documents, c),
            w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
                          CAST(0 AS BIGINT) AS c),
            r1 AS (
              SELECT SUM(CAST(floor(resid * 1000000.0) AS BIGINT)) AS g0,
                     SUM(CAST(floor((resid * x1) * 1000000.0) AS BIGINT)) AS g1,
                     SUM(CAST(floor((resid * x2) * 1000000.0) AS BIGINT)) AS g2,
                     SUM(CASE WHEN (z > 0.0) = (y = 1.0)
                              THEN 1 ELSE 0 END) AS nc,
                     COUNT(*) AS n
              FROM (SELECT y, x1, x2, z,
                           (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS resid
                    FROM (SELECT y, x1, x2,
                                 ((w.a * 0.000001) + (w.b * 0.000001) * x1)
                                     + (w.c * 0.000001) * x2 AS z
                          FROM f, w0 w))),
            w1 AS (SELECT w.a - r.g0 // (2 * r.n) AS a,
                          w.b - r.g1 // (2 * r.n) AS b,
                          w.c - r.g2 // (2 * r.n) AS c
                   FROM w0 w, r1 r),
            r2 AS (
              SELECT SUM(CAST(floor(resid * 1000000.0) AS BIGINT)) AS g0,
                     SUM(CAST(floor((resid * x1) * 1000000.0) AS BIGINT)) AS g1,
                     SUM(CAST(floor((resid * x2) * 1000000.0) AS BIGINT)) AS g2,
                     SUM(CASE WHEN (z > 0.0) = (y = 1.0)
                              THEN 1 ELSE 0 END) AS nc,
                     COUNT(*) AS n
              FROM (SELECT y, x1, x2, z,
                           (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS resid
                    FROM (SELECT y, x1, x2,
                                 ((w.a * 0.000001) + (w.b * 0.000001) * x1)
                                     + (w.c * 0.000001) * x2 AS z
                          FROM f, w1 w))),
            w2 AS (SELECT w.a - r.g0 // (2 * r.n) AS a,
                          w.b - r.g1 // (2 * r.n) AS b,
                          w.c - r.g2 // (2 * r.n) AS c
                   FROM w1 w, r2 r),
            r3 AS (
              SELECT SUM(CAST(floor(resid * 1000000.0) AS BIGINT)) AS g0,
                     SUM(CAST(floor((resid * x1) * 1000000.0) AS BIGINT)) AS g1,
                     SUM(CAST(floor((resid * x2) * 1000000.0) AS BIGINT)) AS g2,
                     SUM(CASE WHEN (z > 0.0) = (y = 1.0)
                              THEN 1 ELSE 0 END) AS nc,
                     COUNT(*) AS n
              FROM (SELECT y, x1, x2, z,
                           (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS resid
                    FROM (SELECT y, x1, x2,
                                 ((w.a * 0.000001) + (w.b * 0.000001) * x1)
                                     + (w.c * 0.000001) * x2 AS z
                          FROM f, w2 w))),
            w3 AS (SELECT w.a - r.g0 // (2 * r.n) AS a,
                          w.b - r.g1 // (2 * r.n) AS b,
                          w.c - r.g2 // (2 * r.n) AS c
                   FROM w2 w, r3 r),
            r4 AS (
              SELECT SUM(CAST(floor(resid * 1000000.0) AS BIGINT)) AS g0,
                     SUM(CAST(floor((resid * x1) * 1000000.0) AS BIGINT)) AS g1,
                     SUM(CAST(floor((resid * x2) * 1000000.0) AS BIGINT)) AS g2,
                     SUM(CASE WHEN (z > 0.0) = (y = 1.0)
                              THEN 1 ELSE 0 END) AS nc,
                     COUNT(*) AS n
              FROM (SELECT y, x1, x2, z,
                           (0.5 + 0.5 * (z / (1.0 + abs(z)))) - y AS resid
                    FROM (SELECT y, x1, x2,
                                 ((w.a * 0.000001) + (w.b * 0.000001) * x1)
                                     + (w.c * 0.000001) * x2 AS z
                          FROM f, w3 w))),
            w4 AS (SELECT w.a - r.g0 // (2 * r.n) AS a,
                          w.b - r.g1 // (2 * r.n) AS b,
                          w.c - r.g2 // (2 * r.n) AS c
                   FROM w3 w, r4 r)
            SELECT 1 AS round, CAST(w1.a AS BIGINT) AS w0_micro,
                   CAST(w1.b AS BIGINT) AS w1_micro,
                   CAST(w1.c AS BIGINT) AS w2_micro,
                   CAST(r1.g0 AS BIGINT) AS g0, CAST(r1.g1 AS BIGINT) AS g1,
                   CAST(r1.g2 AS BIGINT) AS g2,
                   CAST(r1.nc AS BIGINT) AS n_correct,
                   CAST(r1.n AS BIGINT) AS n
            FROM w1, r1
            UNION ALL
            SELECT 2 AS round, CAST(w2.a AS BIGINT) AS w0_micro,
                   CAST(w2.b AS BIGINT) AS w1_micro,
                   CAST(w2.c AS BIGINT) AS w2_micro,
                   CAST(r2.g0 AS BIGINT) AS g0, CAST(r2.g1 AS BIGINT) AS g1,
                   CAST(r2.g2 AS BIGINT) AS g2,
                   CAST(r2.nc AS BIGINT) AS n_correct,
                   CAST(r2.n AS BIGINT) AS n
            FROM w2, r2
            UNION ALL
            SELECT 3 AS round, CAST(w3.a AS BIGINT) AS w0_micro,
                   CAST(w3.b AS BIGINT) AS w1_micro,
                   CAST(w3.c AS BIGINT) AS w2_micro,
                   CAST(r3.g0 AS BIGINT) AS g0, CAST(r3.g1 AS BIGINT) AS g1,
                   CAST(r3.g2 AS BIGINT) AS g2,
                   CAST(r3.nc AS BIGINT) AS n_correct,
                   CAST(r3.n AS BIGINT) AS n
            FROM w3, r3
            UNION ALL
            SELECT 4 AS round, CAST(w4.a AS BIGINT) AS w0_micro,
                   CAST(w4.b AS BIGINT) AS w1_micro,
                   CAST(w4.c AS BIGINT) AS w2_micro,
                   CAST(r4.g0 AS BIGINT) AS g0, CAST(r4.g1 AS BIGINT) AS g1,
                   CAST(r4.g2 AS BIGINT) AS g2,
                   CAST(r4.nc AS BIGINT) AS n_correct,
                   CAST(r4.n AS BIGINT) AS n
            FROM w4, r4
        """,
        "sequence_pack": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents),
            t AS (SELECT doc_id, i
                  FROM d, UNNEST(generate_series(1, len(ws))) s(i)),
            r AS (SELECT doc_id,
                         row_number() OVER (ORDER BY doc_id, i) - 1 AS gp
                  FROM t)
            SELECT CAST(gp // 128 AS BIGINT) AS seq_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM r GROUP BY 1
        """,
        "quality_percentile_filter": """
            WITH r AS (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars) AS rn,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM documents
            ),
            thr AS (
                SELECT lang, min(n_chars) AS cut
                FROM r WHERE rn >= ceil(0.75 * n)
                GROUP BY lang
            )
            SELECT doc_id, d.lang, n_chars
            FROM documents d JOIN thr ON d.lang = thr.lang
            WHERE n_chars >= cut
        """,
        "keep_best_dedup": """
            WITH f AS (
                SELECT doc_id, n_chars,
                       array_to_string(list_slice(string_split(text, ' '),
                                                  1, 4), ' ') AS fp
                FROM documents
            ),
            c AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_dups
                  FROM f GROUP BY fp)
            SELECT doc_id, n_dups
            FROM f JOIN c USING (fp)
            QUALIFY row_number() OVER (PARTITION BY fp
                                       ORDER BY n_chars DESC, doc_id) = 1
        """,
        "events_user_hour_ohlc": """
            WITH v AS (
                SELECT user_id, event_id, ts,
                       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            ),
            o AS (
                SELECT user_id, hour_id, vmic AS open_micro FROM v
                QUALIFY row_number() OVER (PARTITION BY user_id, hour_id
                                           ORDER BY ts, event_id) = 1
            ),
            c AS (
                SELECT user_id, hour_id, vmic AS close_micro FROM v
                QUALIFY row_number() OVER (PARTITION BY user_id, hour_id
                                           ORDER BY ts DESC, event_id DESC) = 1
            ),
            a AS (
                SELECT user_id, hour_id, CAST(count(*) AS BIGINT) AS n,
                       min(vmic) AS low_micro, max(vmic) AS high_micro
                FROM v GROUP BY 1, 2
            )
            SELECT a.user_id, a.hour_id, n, open_micro, high_micro,
                   low_micro, close_micro
            FROM a JOIN o USING (user_id, hour_id)
                   JOIN c USING (user_id, hour_id)
        """,
        "q7_nation_volume": """
            SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS HUGEINT))) AS BIGINT)
                       AS revenue_scaled
            FROM customer, orders, lineitem, supplier,
                 nation cn, nation sn
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = cn.n_nationkey
              AND s_nationkey = sn.n_nationkey
              AND cn.n_nationkey != sn.n_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        """,
        "table_profile": """
            WITH s AS (
                SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                       text, lang, source,
                       CAST(n_chars AS VARCHAR) AS n_chars
                FROM documents
            )
            SELECT 'doc_id' AS col_name,
                   CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                   min(doc_id) AS min_str, max(doc_id) AS max_str
            FROM s
            UNION ALL
            SELECT 'text',
                   CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(count(DISTINCT text) AS BIGINT),
                   min(text), max(text) FROM s
            UNION ALL
            SELECT 'lang',
                   CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(count(DISTINCT lang) AS BIGINT),
                   min(lang), max(lang) FROM s
            UNION ALL
            SELECT 'source',
                   CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(count(DISTINCT source) AS BIGINT),
                   min(source), max(source) FROM s
            UNION ALL
            SELECT 'n_chars',
                   CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   CAST(count(DISTINCT n_chars) AS BIGINT),
                   min(n_chars), max(n_chars) FROM s
        """,
        "bfs_token_distances": """
            WITH w AS (SELECT string_split(text, ' ') AS ws
                       FROM documents),
            e0 AS (SELECT ws[i] AS src, ws[i+1] AS dst
                   FROM w, UNNEST(generate_series(1, len(ws)-1)) t(i)),
            e AS (SELECT DISTINCT src, dst FROM e0),
            d0(node) AS (VALUES ('customer')),
            f1 AS (SELECT DISTINCT e.dst AS node
                   FROM e JOIN d0 ON e.src = d0.node),
            d1 AS (SELECT node FROM f1
                   WHERE node NOT IN (SELECT node FROM d0)),
            f2 AS (SELECT DISTINCT e.dst AS node
                   FROM e JOIN d1 ON e.src = d1.node),
            d2 AS (SELECT node FROM f2
                   WHERE node NOT IN (SELECT node FROM d0
                                      UNION SELECT node FROM d1)),
            f3 AS (SELECT DISTINCT e.dst AS node
                   FROM e JOIN d2 ON e.src = d2.node),
            d3 AS (SELECT node FROM f3
                   WHERE node NOT IN (SELECT node FROM d0
                                      UNION SELECT node FROM d1
                                      UNION SELECT node FROM d2))
            SELECT node AS token, CAST(0 AS BIGINT) AS dist FROM d0
            UNION ALL SELECT node, 1 FROM d1
            UNION ALL SELECT node, 2 FROM d2
            UNION ALL SELECT node, 3 FROM d3
        """,
        "table_constraints_audit": """
            SELECT 'orders_null_custkey' AS rule,
                   CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT)
                       AS violations FROM orders
            UNION ALL
            SELECT 'orders_nonpositive_total',
                   CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'orders_dup_orderkey',
                   CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'orders_orphan_custkey',
                   CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
                  (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'customers_without_orders',
                   CAST(count(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders
                   WHERE o_custkey IS NOT NULL)
            UNION ALL
            SELECT 'documents_empty_text',
                   CAST(count(*) FILTER (text IS NULL OR length(text) = 0)
                        AS BIGINT) FROM documents
            UNION ALL
            SELECT 'documents_nchars_mismatch',
                   CAST(count(*) FILTER (text IS NOT NULL
                                         AND n_chars != length(text))
                        AS BIGINT) FROM documents
            UNION ALL
            SELECT 'documents_short_text',
                   CAST(count(*) FILTER (n_chars < 64) AS BIGINT)
            FROM documents
        """,
        "events_type_trend": """
            WITH lo AS (SELECT min(CAST(floor(epoch(ts) / 3600) AS BIGINT))
                            AS l FROM events),
                 v AS (SELECT event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                                  - (SELECT l FROM lo) AS x,
                              CAST(round(value * 1000000) AS BIGINT) AS y
                       FROM events),
                 m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
                              sum(y) AS sy, sum(x * y) AS sxy,
                              sum(x * x) AS sxx
                       FROM v GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(sy AS BIGINT) AS sum_y_micro,
                   CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
            FROM m
        """,
        "events_ks_drift": """
            WITH s AS (SELECT max(event_id) AS me FROM events),
                 v AS (SELECT CAST(round(value * 1000000) AS BIGINT)
                                  AS vm,
                              CASE WHEN event_id * 2 > (SELECT me FROM s)
                                   THEN 1 ELSE 0 END AS p
                       FROM events),
                 n AS (SELECT CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0
                                        END) AS HUGEINT) AS na,
                              CAST(sum(p) AS HUGEINT) AS nb
                       FROM v),
                 d AS (SELECT vm,
                              sum(CASE WHEN p = 0 THEN 1 ELSE 0 END)
                                  AS ca,
                              sum(CASE WHEN p = 1 THEN 1 ELSE 0 END)
                                  AS cb
                       FROM v GROUP BY vm),
                 c AS (SELECT sum(ca) OVER (ORDER BY vm) AS cum_a,
                              sum(cb) OVER (ORDER BY vm) AS cum_b
                       FROM d),
                 m AS (SELECT max(abs(CAST(cum_a AS HUGEINT)
                                      * (SELECT nb FROM n)
                                      - CAST(cum_b AS HUGEINT)
                                      * (SELECT na FROM n))) AS ks_num
                       FROM c)
            SELECT CAST((SELECT na FROM n) AS BIGINT) AS n_a,
                   CAST((SELECT nb FROM n) AS BIGINT) AS n_b,
                   CAST((SELECT ks_num FROM m) AS BIGINT) AS ks_num,
                   CAST((SELECT na * nb FROM n) AS BIGINT) AS ks_den,
                   CAST(round(CAST((SELECT ks_num FROM m) AS DOUBLE)
                              * 1000000.0
                              / CAST((SELECT na * nb FROM n) AS DOUBLE))
                        AS BIGINT) AS ks_micro
        """,
        "events_mannwhitney_drift": """
            WITH s AS (SELECT max(event_id) AS me FROM events),
                 v AS (SELECT CAST(round(value * 1000000) AS BIGINT)
                                  AS vm,
                              CASE WHEN event_id * 2 > (SELECT me FROM s)
                                   THEN 1 ELSE 0 END AS p
                       FROM events),
                 d AS (SELECT vm,
                              CAST(sum(CASE WHEN p = 0 THEN 1 ELSE 0
                                        END) AS HUGEINT) AS ca,
                              CAST(sum(p) AS HUGEINT) AS cb
                       FROM v GROUP BY vm),
                 w AS (SELECT ca, cb,
                              COALESCE(sum(cb) OVER (ORDER BY vm
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS cb_below
                       FROM d),
                 agg AS (SELECT CAST((SELECT sum(ca) FROM d) AS HUGEINT)
                                    AS na,
                                CAST((SELECT sum(cb) FROM d) AS HUGEINT)
                                    AS nb,
                                sum(ca * (2 * cb_below + cb)) AS u2,
                                sum((ca + cb) * (ca + cb) * (ca + cb)
                                    - (ca + cb)) AS tie_cube
                         FROM w)
            SELECT CAST(na AS BIGINT) AS n_a,
                   CAST(nb AS BIGINT) AS n_b,
                   CAST(u2 AS BIGINT) AS u2_a,
                   CAST(tie_cube AS BIGINT) AS tie_cube,
                   CAST(floor(CAST(u2 AS DOUBLE) * 1000000.0
                              / (2.0 * CAST(na AS DOUBLE)
                                 * CAST(nb AS DOUBLE)) + 0.5)
                        AS BIGINT) AS auc_micro
            FROM agg
        """,
        "events_autocorr": """
            WITH v AS (SELECT event_type, event_id,
                              CAST(round(value * 1000000) AS HUGEINT)
                                  AS vm
                       FROM events),
                 p AS (
                    SELECT event_type, 1 AS lag,
                           lag(vm, 1) OVER (PARTITION BY event_type
                                            ORDER BY event_id) AS x,
                           vm AS y FROM v
                    UNION ALL
                    SELECT event_type, 2 AS lag,
                           lag(vm, 2) OVER (PARTITION BY event_type
                                            ORDER BY event_id) AS x,
                           vm AS y FROM v
                    UNION ALL
                    SELECT event_type, 3 AS lag,
                           lag(vm, 3) OVER (PARTITION BY event_type
                                            ORDER BY event_id) AS x,
                           vm AS y FROM v),
                 m AS (SELECT event_type, lag,
                              CAST(count(*) AS HUGEINT) AS n,
                              sum(x) AS sx, sum(y) AS sy,
                              sum(x * y) AS sxy, sum(x * x) AS sxx,
                              sum(y * y) AS syy
                       FROM p WHERE x IS NOT NULL
                       GROUP BY event_type, lag)
            SELECT event_type, CAST(lag AS BIGINT) AS lag,
                   CAST(n AS BIGINT) AS n_pairs,
                   CAST(sx AS BIGINT) AS sum_x,
                   CAST(sy AS BIGINT) AS sum_y,
                   CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
                              * 1000000.0
                              / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                     * CAST(n * syy - sy * sy
                                            AS DOUBLE)))
                        AS BIGINT) AS corr_micro
            FROM m
        """,
        "events_rolling_active_users": """
            WITH ud AS (SELECT DISTINCT user_id,
                               CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                   AS day
                        FROM events),
                 b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
                 d AS (SELECT unnest(generate_series(lo + 6, hi)) AS day
                       FROM b)
            SELECT d.day, CAST(count(DISTINCT ud.user_id) AS BIGINT)
                       AS wau
            FROM d JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """,
        "events_global_rank": """
            WITH v AS (SELECT event_id,
                              CAST(round(value * 1000000) AS BIGINT) AS vm
                       FROM events),
                 r AS (SELECT event_id, vm,
                              row_number() OVER (ORDER BY vm DESC,
                                                 event_id) AS rn
                       FROM v)
            SELECT event_id, vm AS value_micro, rn AS rnk
            FROM r WHERE (rn - 1) % 100 = 0
        """,
        "events_cumulative_users": """
            WITH f AS (SELECT event_id,
                              CASE WHEN row_number() OVER (
                                       PARTITION BY user_id
                                       ORDER BY event_id) = 1
                                   THEN 1 ELSE 0 END AS fst
                       FROM events),
                 c AS (SELECT event_id,
                              SUM(fst) OVER (ORDER BY event_id) AS du
                       FROM f)
            SELECT event_id AS checkpoint_eid,
                   CAST(du AS BIGINT) AS distinct_users
            FROM c WHERE event_id % 500 = 499
        """,
        "events_hourly_gapfill": """
            WITH c AS (SELECT event_type,
                              CAST(floor(epoch(ts) / 3600) AS BIGINT)
                                  AS hr,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
                 b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM c),
                 h AS (SELECT unnest(generate_series(lo, hi)) AS hr
                       FROM b),
                 t AS (SELECT DISTINCT event_type FROM events)
            SELECT t.event_type, h.hr AS hour_bucket,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
            FROM h CROSS JOIN t
            LEFT JOIN c ON c.event_type = t.event_type AND c.hr = h.hr
        """,
        "dedup_ratio_estimate": """
            WITH sh AS (
                SELECT DISTINCT substr(text, i, 5) AS s
                FROM (SELECT text,
                             unnest(range(1, length(text) - 3)) AS i
                      FROM documents)
            ), occ AS (
                SELECT CAST(sum(greatest(0, length(text) - 4))
                            AS BIGINT) AS n
                FROM documents
            ), samp AS (
                SELECT count(*) AS nd FROM sh
                WHERE CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                      % 64 = 0
            )
            SELECT occ.n AS n_occurrences,
                   CAST(samp.nd AS BIGINT) AS n_sampled_distinct,
                   CAST(samp.nd * 64 AS BIGINT) AS est_distinct,
                   CAST((greatest(0, occ.n - samp.nd * 64) * 1000000)
                        // occ.n AS BIGINT) AS est_dedup_ratio_micro
            FROM occ, samp
        """,
        "sorted_neighborhood_pairs": """
            WITH ranked AS (
                SELECT doc_id,
                       lower(substr(text, 1, 16)) AS bkey,
                       row_number() OVER (
                           ORDER BY lower(substr(text, 1, 16)), doc_id
                       ) AS rn
                FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(b.rn - a.rn AS BIGINT) AS dist
            FROM ranked a JOIN ranked b
              ON b.rn > a.rn AND b.rn <= a.rn + 3
             AND substr(a.bkey, 1, 8) = substr(b.bkey, 1, 8)
        """,
        "source_overlap_matrix": """
            WITH sh AS (
                SELECT DISTINCT source, substr(text, i, 8) AS s
                FROM (SELECT source, text,
                             unnest(range(1, length(text) - 6)) AS i
                      FROM documents)
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared_shingles
            FROM sh a JOIN sh b
              ON a.s = b.s AND a.source <= b.source
            GROUP BY 1, 2
        """,
        "embedding_norm_stats": """
            WITH n AS (SELECT CAST(label AS BIGINT) AS label,
                              CAST(round(sqrt(list_dot_product(
                                  CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[]))) * 1000000)
                                   AS BIGINT) AS nm
                       FROM embeddings)
            SELECT label, count(*) AS n,
                   CAST(sum(nm) // count(*) AS BIGINT)
                       AS mean_norm_micro,
                   CAST(max(nm) AS BIGINT) AS max_norm_micro
            FROM n GROUP BY label
        """,
        "embedding_dim_stats": """
            WITH x AS (SELECT t.i AS dim,
                              CAST(floor(CAST(embedding[t.i + 1]
                                              AS DOUBLE) * 1000000)
                                   AS BIGINT) AS q
                       FROM embeddings, range(64) t(i))
            SELECT CAST(dim AS BIGINT) AS dim,
                   count(*) AS n,
                   CAST(sum(q) AS BIGINT) AS sum_micro,
                   CAST(min(q) AS BIGINT) AS min_micro,
                   CAST(max(q) AS BIGINT) AS max_micro
            FROM x GROUP BY dim
        """,
        "lineitem_weighted_quantiles": """
            WITH v AS (SELECT CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS c,
                              CAST(round(l_quantity) AS BIGINT) AS w
                       FROM lineitem),
                 d AS (SELECT c, CAST(sum(w) AS HUGEINT) AS w
                       FROM v GROUP BY c),
                 t AS (SELECT c, sum(w) OVER (ORDER BY c) AS cw FROM d),
                 tot AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM v),
                 qs(qn, qd) AS (VALUES (1, 4), (1, 2), (3, 4), (9, 10))
            SELECT CAST(qn AS BIGINT) AS q_num,
                   CAST(qd AS BIGINT) AS q_den,
                   (SELECT min(c) FROM t
                    WHERE cw * qd >= qn * (SELECT tw FROM tot))
                       AS wq_cents,
                   CAST((SELECT tw FROM tot) AS BIGINT) AS total_weight
            FROM qs
        """,
        "events_chi2_assoc": """
            WITH b AS (SELECT event_type,
                              (CAST(epoch_us(ts) AS BIGINT)
                               // 86400000000 + 4) % 7 AS dow
                       FROM events),
                 obs AS (SELECT event_type, dow, count(*) AS o
                         FROM b GROUP BY event_type, dow),
                 cell AS (SELECT t.event_type, d.dow,
                                 CAST(COALESCE(obs.o, 0) AS HUGEINT)
                                     AS o
                          FROM (SELECT DISTINCT event_type FROM b) t
                          CROSS JOIN (SELECT DISTINCT dow FROM b) d
                          LEFT JOIN obs
                            ON obs.event_type = t.event_type
                           AND obs.dow = d.dow),
                 m AS (SELECT event_type, dow, o,
                              sum(o) OVER (PARTITION BY event_type)
                                  AS rr,
                              sum(o) OVER (PARTITION BY dow) AS cc,
                              sum(o) OVER () AS nn
                       FROM cell)
            SELECT event_type, CAST(dow AS BIGINT) AS dow,
                   CAST(o AS BIGINT) AS o,
                   CAST(rr * cc * 1000000 // nn AS BIGINT) AS e_micro,
                   CAST(floor(CAST(o * nn - rr * cc AS DOUBLE)
                              * CAST(o * nn - rr * cc AS DOUBLE)
                              / (CAST(nn AS DOUBLE) * CAST(rr AS DOUBLE)
                                 * CAST(cc AS DOUBLE))
                              * 1000000.0 + 0.5) AS BIGINT)
                       AS chi2_term_micro
            FROM m
        """,
        "benford_audit": """
            WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS cents FROM lineitem),
                 d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                                   AS BIGINT) AS digit FROM c
                       WHERE cents > 0)
            SELECT digit, count(*) AS n,
                   CAST(round(log10(1.0 + 1.0 / digit) * 1000000)
                        AS BIGINT) AS benford_expected_micro
            FROM d GROUP BY digit
        """,
        "shuffle_order_audit": """
            WITH k AS (SELECT doc_id, source,
                              CAST(('0x' || substr(md5(
                                  CAST(doc_id AS VARCHAR)), 1, 15))
                                   AS BIGINT) AS hkey
                       FROM documents),
                 a AS (SELECT source, lag(source)
                              OVER (ORDER BY doc_id) AS p FROM k),
                 b AS (SELECT source, lag(source)
                              OVER (ORDER BY hkey) AS p FROM k)
            SELECT 'doc_id' AS ordering, count(*) AS n_rows,
                   CAST(count(*) FILTER (p IS NULL OR source <> p)
                        AS BIGINT) AS n_runs_source
            FROM a
            UNION ALL
            SELECT 'md5_hash', count(*),
                   CAST(count(*) FILTER (p IS NULL OR source <> p)
                        AS BIGINT)
            FROM b
        """,
        "events_equidepth_bins": """
            WITH v AS (SELECT CAST(round(value * 1000000) AS BIGINT)
                              AS vm FROM events),
                 nn AS (SELECT count(*) AS c FROM v),
                 r AS (SELECT vm, row_number() OVER (ORDER BY vm) AS rn
                       FROM v),
                 bins AS (SELECT unnest(range(1, 9)) AS bin_id)
            SELECT b.bin_id, r.vm AS upper_micro
            FROM bins b CROSS JOIN nn
            JOIN r ON r.rn = greatest(1, CAST(ceil(b.bin_id * c / 8.0)
                                              AS BIGINT))
        """,
        "winsorized_stats": """
            WITH v AS (SELECT CAST(round(value * 1000000) AS BIGINT)
                              AS vm FROM events),
                 nn AS (SELECT count(*) AS c FROM v),
                 r AS (SELECT vm, row_number() OVER (ORDER BY vm) AS rn
                       FROM v),
                 b AS (SELECT
                          (SELECT vm FROM r, nn WHERE rn = greatest(1,
                              CAST(ceil(0.01 * c) AS BIGINT))) AS lo,
                          (SELECT vm FROM r, nn WHERE rn = greatest(1,
                              CAST(ceil(0.99 * c) AS BIGINT))) AS hi)
            SELECT nn.c AS n, b.lo AS lo_micro, b.hi AS hi_micro,
                   (SELECT CAST(sum(least(greatest(vm, b.lo), b.hi))
                                AS BIGINT) FROM v) AS sum_clipped_micro,
                   (SELECT CAST(count(*) FILTER (vm < b.lo) AS BIGINT)
                    FROM v) AS n_clipped_lo,
                   (SELECT CAST(count(*) FILTER (vm > b.hi) AS BIGINT)
                    FROM v) AS n_clipped_hi
            FROM nn, b
        """,
        "rle_compression_advisor": """
            WITH o AS (SELECT CAST(event_type AS VARCHAR) AS et,
                              CAST(user_id AS VARCHAR) AS uid,
                              lag(CAST(event_type AS VARCHAR))
                                  OVER (ORDER BY event_id) AS p_et,
                              lag(CAST(user_id AS VARCHAR))
                                  OVER (ORDER BY event_id) AS p_uid
                       FROM events)
            SELECT 'event_type' AS "column",
                   count(*) AS n_rows,
                   CAST(count(*) FILTER (p_et IS NULL OR et <> p_et)
                        AS BIGINT) AS n_runs_natural,
                   CAST(count(DISTINCT et) AS BIGINT) AS n_distinct
            FROM o
            UNION ALL
            SELECT 'user_id', count(*),
                   CAST(count(*) FILTER (p_uid IS NULL OR uid <> p_uid)
                        AS BIGINT),
                   CAST(count(DISTINCT uid) AS BIGINT)
            FROM o
        """,
        "shard_rebalance_audit": """
            WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
                 cand AS (SELECT k, s,
                                 md5(CAST(k AS VARCHAR) || '|'
                                     || CAST(s AS VARCHAR)) AS h
                          FROM keys CROSS JOIN
                               (SELECT unnest(range(0, 9)) AS s)),
                 r_old AS (SELECT k, s AS shard FROM (
                              SELECT k, s, row_number() OVER (
                                  PARTITION BY k
                                  ORDER BY h DESC, s) AS rn
                              FROM cand WHERE s < 8) WHERE rn = 1),
                 r_new AS (SELECT k, s AS shard FROM (
                              SELECT k, s, row_number() OVER (
                                  PARTITION BY k
                                  ORDER BY h DESC, s) AS rn
                              FROM cand WHERE s < 9) WHERE rn = 1)
            SELECT 'mod' AS scheme, count(*) AS n_keys,
                   CAST(count(*) FILTER (k % 8 <> k % 9) AS BIGINT)
                       AS n_moved
            FROM keys
            UNION ALL
            SELECT 'rendezvous', count(*),
                   CAST(count(*) FILTER (o.shard <> n.shard) AS BIGINT)
            FROM r_old o JOIN r_new n USING (k)
        """,
        "sssp_weighted": """
            WITH docs AS (SELECT string_split(text, ' ') AS arr
                          FROM documents),
                 big AS (SELECT arr[i] AS src, arr[i + 1] AS dst,
                                count(*) AS cnt
                         FROM (SELECT arr,
                                      unnest(range(1, len(arr))) AS i
                               FROM docs)
                         GROUP BY 1, 2),
                 e AS (SELECT src, dst,
                              CAST(1000000 // cnt AS BIGINT) AS wgt
                       FROM big),
                 d0 AS (SELECT 'customer' AS tok, CAST(0 AS BIGINT)
                               AS dist),
                 d1 AS (SELECT tok, min(dist) AS dist FROM (
                            SELECT * FROM d0
                            UNION ALL
                            SELECT e.dst, d0.dist + e.wgt FROM d0
                            JOIN e ON e.src = d0.tok) GROUP BY tok),
                 d2 AS (SELECT tok, min(dist) AS dist FROM (
                            SELECT * FROM d1
                            UNION ALL
                            SELECT e.dst, d1.dist + e.wgt FROM d1
                            JOIN e ON e.src = d1.tok) GROUP BY tok),
                 d3 AS (SELECT tok, min(dist) AS dist FROM (
                            SELECT * FROM d2
                            UNION ALL
                            SELECT e.dst, d2.dist + e.wgt FROM d2
                            JOIN e ON e.src = d2.tok) GROUP BY tok)
            SELECT tok AS token, dist FROM d3
        """,
        "events_cusum": """
            WITH d AS (SELECT event_id,
                              CAST(round(value * 1000000) AS BIGINT)
                              - 50000000 AS dx
                       FROM events),
                 p AS (SELECT event_id,
                              sum(dx) OVER (ORDER BY event_id) AS pi
                       FROM d),
                 m AS (SELECT event_id, pi,
                              min(pi) OVER (ORDER BY event_id) AS mn
                       FROM p)
            SELECT event_id,
                   CAST(pi - least(mn, 0) AS BIGINT) AS cusum_micro
            FROM m WHERE event_id % 100 = 0
        """,
        "cms_token_counts": """
            -- exact-regime contract (vocabulary << width*depth): every
            -- CMS point query is exact and overestimate is 0; a
            -- vocabulary explosion or hash regression breaks the hash
            WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM documents
            ), agg AS (
                SELECT token, count(*) AS n FROM toks GROUP BY token
            )
            SELECT token, CAST(n AS BIGINT) AS cms_est,
                   CAST(n AS BIGINT) AS true_count,
                   CAST(0 AS BIGINT) AS overestimate
            FROM agg
        """,
        "fd_discovery": """
            WITH cand AS (
                SELECT * FROM (VALUES
                    (0, 'l_orderkey', 'l_returnflag'),
                    (1, 'l_returnflag', 'l_linestatus'),
                    (2, 'o_orderkey', 'o_custkey'),
                    (3, 'o_custkey', 'o_orderpriority')
                ) t(pid, lhs, rhs)),
            pairs AS (
                SELECT 0 AS pid, CAST(l_orderkey AS VARCHAR) AS a,
                       CAST(l_returnflag AS VARCHAR) AS b FROM lineitem
                UNION ALL
                SELECT 1, CAST(l_returnflag AS VARCHAR),
                       CAST(l_linestatus AS VARCHAR) FROM lineitem
                UNION ALL
                SELECT 2, CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR) FROM orders
                UNION ALL
                SELECT 3, CAST(o_custkey AS VARCHAR),
                       CAST(o_orderpriority AS VARCHAR) FROM orders),
            per_a AS (
                SELECT pid, a, count(DISTINCT b) AS nb
                FROM pairs GROUP BY pid, a),
            agg AS (
                SELECT pid, count(*) AS n_lhs_distinct,
                       CAST(sum(nb) AS BIGINT) AS n_pairs_distinct,
                       count(*) FILTER (nb > 1) AS n_violating_lhs
                FROM per_a GROUP BY pid)
            SELECT c.lhs, c.rhs, agg.n_lhs_distinct, agg.n_pairs_distinct,
                   agg.n_violating_lhs,
                   CAST(CASE WHEN agg.n_violating_lhs = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS fd_holds
            FROM agg JOIN cand c ON c.pid = agg.pid
        """,
        "kcore_tokens": """
            WITH docs AS (SELECT string_split(text, ' ') AS arr
                          FROM documents),
                 big AS (SELECT arr[i] AS src, arr[i + 1] AS dst
                         FROM (SELECT arr,
                                      unnest(range(1, len(arr))) AS i
                               FROM docs)),
                 e0 AS (SELECT DISTINCT src, dst FROM big
                        WHERE src <> dst),
                 und AS (SELECT src, dst FROM e0
                         UNION
                         SELECT dst AS src, src AS dst FROM e0),
                 a1 AS (SELECT src AS tok FROM und GROUP BY src
                        HAVING count(*) >= 22),
                 e1 AS (SELECT u.src, u.dst FROM und u
                        JOIN a1 s ON u.src = s.tok
                        JOIN a1 t ON u.dst = t.tok),
                 a2 AS (SELECT src AS tok FROM e1 GROUP BY src
                        HAVING count(*) >= 22),
                 e2 AS (SELECT u.src, u.dst FROM e1 u
                        JOIN a2 s ON u.src = s.tok
                        JOIN a2 t ON u.dst = t.tok)
            SELECT src AS tok, count(*) AS deg
            FROM e2 GROUP BY src HAVING count(*) >= 22
        """,
        "events_drift_psi": """
            WITH s AS (SELECT min(value) AS lo, max(value) AS hi,
                              max(event_id) AS me FROM events),
                 e AS (SELECT least(CAST(floor((value - s.lo)
                                          / ((s.hi - s.lo) / 10.0))
                                    AS BIGINT), 9) AS bin,
                              CASE WHEN event_id * 2 > s.me
                                   THEN 1 ELSE 0 END AS period
                       FROM events, s),
                 c AS (SELECT bin,
                              count(*) FILTER (period = 0) AS na,
                              count(*) FILTER (period = 1) AS nb
                       FROM e GROUP BY bin),
                 t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM c)
            SELECT bin, CAST(na AS BIGINT) AS n_a,
                   CAST(nb AS BIGINT) AS n_b,
                   ((na + 1.0) / (ta + 10.0) - (nb + 1.0) / (tb + 10.0))
                   * ln(((na + 1.0) / (ta + 10.0))
                        / ((nb + 1.0) / (tb + 10.0))) AS psi_term
            FROM c, t
        """,
        "token_dictionary_encode": """
            WITH toks AS (
                SELECT unnest(string_split(text, ' ')) AS token
                FROM documents
            ), agg AS (
                SELECT token, count(*) AS n FROM toks GROUP BY token
            )
            SELECT token,
                   CAST(dense_rank() OVER (ORDER BY token) - 1
                        AS BIGINT) AS code,
                   CAST(n AS BIGINT) AS n_occ
            FROM agg
        """,
        "exact_global_quantiles": """
            WITH v AS (SELECT CAST(round(value * 1000000) AS BIGINT)
                              AS vm FROM events),
                 nn AS (SELECT count(*) AS c FROM v),
                 r AS (SELECT vm, row_number() OVER (ORDER BY vm) AS rn
                       FROM v)
            SELECT CAST(qs.q AS DOUBLE) AS q, r.vm AS value_micro
            FROM (VALUES (0.5), (0.9), (0.99)) qs(q)
            CROSS JOIN nn
            JOIN r ON r.rn = greatest(1, CAST(ceil(CAST(qs.q AS DOUBLE)
                                                   * nn.c) AS BIGINT))
        """,
        "table_digest": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(('0x' || substr(md5(
                            CAST(doc_id AS VARCHAR) || '|' || lang
                            || '|' || text), 1, 15)) AS BIGINT))
                        % 9223372036854775808 AS BIGINT) AS digest
            FROM documents GROUP BY lang
        """,
        "orders_customer_set_ops": """
            WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '1994-01-01'
                         AND o_orderdate <  TIMESTAMP '1995-01-01'),
                 b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                         AND o_orderdate <  TIMESTAMP '1996-01-01')
            SELECT custkey, 'both' AS membership
            FROM (SELECT custkey FROM a INTERSECT
                  SELECT custkey FROM b)
            UNION ALL
            SELECT custkey, 'a_only'
            FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
            UNION ALL
            SELECT custkey, 'b_only'
            FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
        """,
        "lineitem_unpivot": """
            WITH long AS (
                SELECT 'l_quantity' AS measure, l_returnflag,
                       CAST(round(l_quantity * 100) AS BIGINT) AS centi
                FROM lineitem
                UNION ALL
                SELECT 'l_extendedprice', l_returnflag,
                       CAST(round(l_extendedprice * 100) AS BIGINT)
                FROM lineitem
                UNION ALL
                SELECT 'l_discount', l_returnflag,
                       CAST(round(l_discount * 100) AS BIGINT)
                FROM lineitem
                UNION ALL
                SELECT 'l_tax', l_returnflag,
                       CAST(round(l_tax * 100) AS BIGINT)
                FROM lineitem
            )
            SELECT measure, l_returnflag,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(centi) AS BIGINT) AS sum_centi
            FROM long GROUP BY measure, l_returnflag
        """,
        "part_pareto_frontier": """
            WITH a AS (
                SELECT l_partkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                           AS total_qty,
                       CAST(sum(CAST(round(l_extendedprice * 100)
                                     AS HUGEINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS HUGEINT))) AS BIGINT)
                           AS revenue_scaled
                FROM lineitem GROUP BY 1
            )
            SELECT l_partkey, total_qty, revenue_scaled FROM a p
            WHERE NOT EXISTS (
                SELECT 1 FROM a q
                WHERE q.total_qty >= p.total_qty
                  AND q.revenue_scaled >= p.revenue_scaled
                  AND (q.total_qty > p.total_qty
                       OR q.revenue_scaled > p.revenue_scaled)
            )
        """,
        "q8_market_share": """
            WITH base AS (
                SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                       CAST(round(l_extendedprice * 100) AS HUGEINT)
                       * (100 - CAST(round(l_discount * 100)
                                     AS HUGEINT)) AS rev,
                       sn.n_name AS s_nation
                FROM part, lineitem, orders, customer,
                     supplier, nation cn, nation sn, region
                WHERE p_partkey = l_partkey
                  AND l_orderkey = o_orderkey
                  AND o_custkey = c_custkey
                  AND c_nationkey = cn.n_nationkey
                  AND cn.n_regionkey = r_regionkey
                  AND r_name = 'AMERICA'
                  AND l_suppkey = s_suppkey
                  AND s_nationkey = sn.n_nationkey
                  AND p_type = 'ECONOMY'
                  AND o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'
            )
            SELECT o_year,
                   CAST(sum(CASE WHEN s_nation = 'NATION_6'
                                 THEN rev ELSE 0 END) AS BIGINT)
                       AS nation_revenue_scaled,
                   CAST(sum(rev) AS BIGINT) AS total_revenue_scaled
            FROM base GROUP BY 1
        """,
        "q12_priority_by_linestatus": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM orders, lineitem
            WHERE o_orderkey = l_orderkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "q21_waiting_suppliers": """
            WITH ls AS (
                SELECT l_orderkey, l_suppkey,
                       max(l_shipdate) AS maxship
                FROM lineitem GROUP BY 1, 2
            ), j AS (
                SELECT l_orderkey, l_suppkey,
                       CASE WHEN maxship > o_orderdate
                                 + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END AS late
                FROM ls JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), per_order AS (
                SELECT l_orderkey, count(*) AS nsupp,
                       sum(late) AS nlate
                FROM j GROUP BY 1
            )
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM j JOIN per_order USING (l_orderkey)
                   JOIN supplier ON l_suppkey = s_suppkey
            WHERE late = 1 AND nsupp >= 2 AND nlate = 1
            GROUP BY 1
        """,
        "q9_product_profit": """
            SELECT n_name,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS HUGEINT))) AS BIGINT)
                       AS profit_scaled
            FROM lineitem, orders, supplier, nation
            WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
              AND s_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "q19_disjunctive_revenue": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(CAST(round(l_extendedprice * 100)
                                          AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100)
                                          AS HUGEINT))), 0) AS BIGINT)
                       AS revenue_scaled
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND ((p_brand = 'Brand#1' AND p_size <= 10
                    AND l_quantity < 20)
                   OR (p_brand = 'Brand#2' AND p_size <= 25
                       AND l_quantity < 30))
        """,
        "q17_small_quantity_revenue": """
            WITH a AS (
                SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS qs,
                       count(*) AS n
                FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(coalesce(sum(CAST(round(l_extendedprice * 100)
                                          AS BIGINT)), 0) AS BIGINT)
                       AS sum_price_cents
            FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
            WHERE 5 * CAST(l_quantity AS BIGINT) * n < qs
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                                * (100 - CAST(round(l_discount * 100)
                                              AS HUGEINT))) AS BIGINT)
                           AS revenue_scaled
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT l_suppkey, revenue_scaled FROM r
            WHERE revenue_scaled = (SELECT max(revenue_scaled) FROM r)
        """,
        "q4_order_priority_check": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
            GROUP BY o_orderpriority
        """,
        "q14_promo_revenue_share": """
            SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN
                            CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100) AS HUGEINT))
                            ELSE 0 END) AS BIGINT) AS promo_scaled,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                        AS BIGINT) AS total_scaled
            FROM lineitem, part
            WHERE l_partkey = p_partkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-02-01'
        """,
        "q18_large_volume_orders": """
            SELECT l_orderkey AS o_orderkey,
                   min(o_custkey) AS o_custkey,
                   CAST(sum(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 300
            ORDER BY total_qty DESC, o_orderkey
            LIMIT 20
        """,
        "q22_global_sales_opportunity": """
            WITH avgbal AS (
                SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
                       count(*) AS n
                FROM customer
                WHERE round(c_acctbal * 100) > 0
            )
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(count(*) AS BIGINT) AS n_cust,
                   CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS BIGINT) AS sum_acctbal_cents
            FROM customer, avgbal
            WHERE CAST(round(c_acctbal * 100) AS HUGEINT) * n > s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY c_nationkey
        """,
        "q10_returned_revenue": """
            SELECT c_custkey, c_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                        AS BIGINT) AS revenue_scaled
            FROM customer, orders, lineitem
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name
            ORDER BY revenue_scaled DESC, c_custkey
            LIMIT 20
        """,
        "q13_order_count_distribution": """
            WITH co AS (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                GROUP BY c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM co GROUP BY c_count
        """,
        "q6_forecast_revenue": """
            SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * CAST(round(l_discount * 100) AS HUGEINT))
                        AS BIGINT) AS revenue_scaled
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_quantity < 24
              AND round(l_discount * 100) BETWEEN 5 AND 7
        """,
        "orders_monthly_stats": """
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                       AS month,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_price_cents
            FROM orders GROUP BY 1
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                        AS BIGINT) AS revenue_scaled
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue_scaled DESC
        """,
        "q2_min_cost_supplier": """
            WITH partsupp AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                     (l_partkey*17 + l_suppkey*31) % 9999 + 1
                         AS ps_availqty,
                     (l_partkey*13 + l_suppkey*101) % 99001 + 100
                         AS ps_supplycost_cents
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
            SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
                   p.p_brand, ps.ps_supplycost_cents
            FROM part p, partsupp ps, supplier s, nation n, region r
            WHERE p.p_partkey = ps.ps_partkey
              AND s.s_suppkey = ps.ps_suppkey
              AND p.p_size <= 10 AND p.p_type = 'SMALL'
              AND s.s_nationkey = n.n_nationkey
              AND n.n_regionkey = r.r_regionkey
              AND r.r_name = 'EUROPE'
              AND ps.ps_supplycost_cents = (
                SELECT min(ps2.ps_supplycost_cents)
                FROM partsupp ps2, supplier s2, nation n2, region r2
                WHERE ps2.ps_partkey = p.p_partkey
                  AND s2.s_suppkey = ps2.ps_suppkey
                  AND s2.s_nationkey = n2.n_nationkey
                  AND n2.n_regionkey = r2.r_regionkey
                  AND r2.r_name = 'EUROPE')
        """,
        "q11_important_stock": """
            WITH partsupp AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                     (l_partkey*17 + l_suppkey*31) % 9999 + 1
                         AS ps_availqty,
                     (l_partkey*13 + l_suppkey*101) % 99001 + 100
                         AS ps_supplycost_cents
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)),
            eu AS (SELECT s_suppkey FROM supplier s, nation n, region r
                   WHERE s.s_nationkey = n.n_nationkey
                     AND n.n_regionkey = r.r_regionkey
                     AND r.r_name = 'EUROPE'),
            v AS (SELECT ps_partkey,
                         CAST(SUM(ps_supplycost_cents * ps_availqty)
                              AS BIGINT) AS value_cents
                  FROM partsupp JOIN eu ON ps_suppkey = s_suppkey
                  GROUP BY ps_partkey)
            SELECT ps_partkey, value_cents FROM v
            WHERE value_cents * (SELECT COUNT(*) FROM v)
                  > 2 * (SELECT SUM(value_cents) FROM v)
        """,
        "q16_supplier_part_counts": """
            WITH partsupp AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM partsupp JOIN part ON p_partkey = ps_partkey
            WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
              AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                     WHERE s_suppkey % 13 = 5)
            GROUP BY p_brand, p_type, p_size
        """,
        "q20_excess_stock_suppliers": """
            WITH partsupp AS (
              SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                     (l_partkey*17 + l_suppkey*31) % 9999 + 1
                         AS ps_availqty
              FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)),
            agg AS (SELECT l_partkey, l_suppkey,
                           CAST(SUM(l_quantity) AS BIGINT) AS qty
                    FROM lineitem
                    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                      AND l_shipdate < TIMESTAMP '1997-01-01'
                    GROUP BY l_partkey, l_suppkey)
            SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
            FROM partsupp ps
            JOIN part p ON p.p_partkey = ps.ps_partkey
                       AND p.p_name LIKE 'small%'
            JOIN agg a ON a.l_partkey = ps.ps_partkey
                      AND a.l_suppkey = ps.ps_suppkey
            JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE ps.ps_availqty > 100 * a.qty
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
                   o_orderpriority,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
                            * (100 - CAST(round(l_discount * 100) AS HUGEINT)))
                        AS BIGINT) AS revenue_scaled
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue_scaled DESC, l_orderkey
            LIMIT 10
        """,
        "events_value_rank": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(round(value * 1000000) AS BIGINT) AS vmic
                FROM events
            )
            SELECT event_id, event_type, vmic AS value_micro,
                   CAST(count(*) OVER (PARTITION BY event_type
                                       ORDER BY vmic) AS BIGINT) AS n_le
            FROM v
        """,
        "events_zscore_outliers": """
            WITH v AS (
                SELECT event_id, event_type,
                       CAST(round(value * 1000000) AS HUGEINT) AS vmic
                FROM events
            ), m AS (
                SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                       sum(vmic) AS s, sum(vmic * vmic) AS sxx
                FROM v GROUP BY event_type
            )
            SELECT event_id, v.event_type,
                   CAST(vmic AS BIGINT) AS value_micro,
                   CAST(n * vmic - s AS BIGINT) AS dev_scaled
            FROM v JOIN m ON v.event_type = m.event_type
            WHERE (n * vmic - s) * (n * vmic - s) > 9 * (n * sxx - s * s)
        """,
        "bloom_semi_join": """
            SELECT l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
            GROUP BY l_returnflag
        """,
        "orders_decile_stats": """
            WITH vc AS (
                SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                       count(*) AS cnt
                FROM orders GROUP BY 1
            ), cs AS (
                SELECT c, cnt,
                       sum(cnt) OVER (ORDER BY c) AS cum,
                       sum(cnt) OVER () AS n
                FROM vc
            ), b AS (
                SELECT c, cnt,
                       CAST(((cum - 1) * 10) // n AS BIGINT) AS decile
                FROM cs
            )
            SELECT decile,
                   CAST(sum(cnt) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(c AS HUGEINT) * cnt) AS BIGINT) AS sum_cents,
                   min(c) AS min_cents, max(c) AS max_cents
            FROM b GROUP BY decile
        """,
        "events_type_percentiles": """
            WITH v AS (
                SELECT event_type,
                       CAST(round(value*1000000) AS BIGINT) AS vmic
                FROM events
            ), r AS (
                SELECT event_type, vmic,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY vmic) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM v
            )
            SELECT event_type, CAST(max(n) AS BIGINT) AS n,
                   max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
                            THEN vmic END) AS p50_micro,
                   max(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT)
                            THEN vmic END) AS p90_micro
            FROM r GROUP BY event_type
        """,
        "user_event_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(sum(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
            FROM events GROUP BY user_id
        """,
        "label_centroids": """
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(i - 1 AS BIGINT) AS dim,
                   round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
            FROM embeddings, UNNEST(generate_series(1, 64)) t(i)
            GROUP BY label, i
        """,
        "kmeans_iter_assign": """
            WITH c0 AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 10
            ),
            a0 AS (
                SELECT e.vec_id, c0.cid FROM embeddings e CROSS JOIN c0
                QUALIFY row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                           c0.ce), c0.cid) = 1
            ),
            u AS (
                SELECT a0.cid, generate_subscripts(e.embedding, 1) AS i,
                       unnest(e.embedding) AS x
                FROM a0 JOIN embeddings e USING (vec_id)
            ),
            m AS (SELECT cid, i, round(avg(CAST(x AS DOUBLE)), 6) AS mx
                  FROM u GROUP BY cid, i),
            c1 AS (SELECT cid, array_agg(mx ORDER BY i) AS ce
                   FROM m GROUP BY cid)
            SELECT e.vec_id, c1.cid AS centroid_id
            FROM embeddings e CROSS JOIN c1
            QUALIFY row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                       CAST(c1.ce AS DOUBLE[])), c1.cid) = 1
        """,
        "kmeans_assign": """
            WITH c AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 10
            )
            SELECT e.vec_id, c.cid AS centroid_id,
                   round(list_distance(CAST(e.embedding AS DOUBLE[]), c.ce), 6) AS dist
            FROM embeddings e CROSS JOIN c
            QUALIFY row_number() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.ce),
                         c.cid) = 1
        """,
        "events_value_histogram": """
            WITH v AS (
                SELECT CAST(round(value*1000000) AS BIGINT) AS vmic
                FROM events
            )
            SELECT vmic // 50000000 AS bin,
                   count(*) AS n,
                   CAST(sum(vmic) AS BIGINT) AS sum_micro
            FROM v GROUP BY bin
        """,
        "filtered_ann_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
            FROM embeddings e
            JOIN documents d ON e.vec_id = d.doc_id, q
            WHERE length(d.text) >= 300
            ORDER BY cos_sim DESC, e.vec_id DESC
            LIMIT 10
        """,
        "ann_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
            FROM embeddings e, q
            ORDER BY cos_sim DESC, e.vec_id DESC
            LIMIT 10
        """,
        "sq8_ann_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])), 6) AS cos_sim
            FROM embeddings e, q
            ORDER BY cos_sim DESC, e.vec_id DESC
            LIMIT 10
        """,
        "embedding_dedup_pairs": """
            SELECT a.vec_id AS left_vec, b.vec_id AS right_vec
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.27
        """,
        "ann_topk_multi": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 8
            )
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
            FROM embeddings e CROSS JOIN q
            QUALIFY row_number() OVER (PARTITION BY q.query_id
                ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) DESC,
                         e.vec_id DESC) <= 10
        """,
        "semantic_dedup": """
            WITH c AS (
                SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
                FROM embeddings WHERE vec_id < 10
            ), assigned AS (
                SELECT e.vec_id, c.cid AS centroid_id,
                       CAST(e.embedding AS DOUBLE[]) AS emb
                FROM embeddings e CROSS JOIN c
                QUALIFY row_number() OVER (
                    PARTITION BY e.vec_id
                    ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.ce),
                             c.cid) = 1
            ), dups AS (
                SELECT b.vec_id
                FROM assigned a JOIN assigned b
                  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
                WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
                GROUP BY b.vec_id
            )
            SELECT a.vec_id, a.centroid_id,
                   (d.vec_id IS NOT NULL) AS is_dup
            FROM assigned a LEFT JOIN dups d ON d.vec_id = a.vec_id
        """,
        "embedding_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS l, b.vec_id AS r
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])) >= 0.27
            ), edges AS (
                SELECT l AS a, r AS b FROM pairs UNION ALL SELECT r, l FROM pairs
            ), reach(v, r) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.b, rc.r FROM reach rc JOIN edges e ON e.a = rc.v
            )
            SELECT v AS vec_id, min(r) AS cluster_id FROM reach GROUP BY v
        """,
        "docs_ngram_novelty": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), gr AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
                FROM toks, UNNEST(range(1, len(t)-1)) u(i)
                WHERE len(t) >= 3
            ), fd AS (
                SELECT gram, min(doc_id) AS fd FROM gr GROUP BY gram
            )
            SELECT gr.doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN fd.fd = gr.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   CAST((sum(CASE WHEN fd.fd = gr.doc_id THEN 1 ELSE 0 END)
                         * 1000000) // count(*) AS BIGINT) AS novelty_ppm
            FROM gr JOIN fd USING (gram)
            GROUP BY gr.doc_id
        """,
        "docs_vocab_growth": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), tk AS (
                SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks
            ), fd AS (
                SELECT tok, min(doc_id) AS fd FROM tk GROUP BY tok
            ), nd AS (
                SELECT max(doc_id) + 1 AS n FROM documents
            ), cps AS (
                SELECT DISTINCT greatest(1, (n * k) // 4) AS checkpoint
                FROM nd, UNNEST([1, 2, 3, 4]) u(k)
            )
            SELECT c.checkpoint,
                   (SELECT count(*) FROM fd WHERE fd.fd < c.checkpoint)
                       AS vocab_size
            FROM cps c
        """,
        "docs_char_class_profile": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(length(regexp_replace(text, '[^a-zA-Z]', '',
                                                  'g'))) AS BIGINT)
                       AS n_alpha,
                   CAST(sum(length(text)
                            - length(replace(text, ' ', ''))) AS BIGINT)
                       AS n_space,
                   CAST(sum(length(regexp_replace(text, '[a-zA-Z ]', '',
                                                  'g'))) AS BIGINT)
                       AS n_other
            FROM documents GROUP BY lang
        """,
        "doc_fingerprint_md5": f"""
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
                FROM toks, UNNEST(range(1, len(t)-1)) u(i)
                WHERE len(t) >= 3
            ), hv AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
                           AS h
                FROM sh
            ), fp AS (
                SELECT doc_id, {_sh32} AS simhash32
                FROM hv GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(fp.simhash32, 0) AS simhash32
            FROM documents d LEFT JOIN fp USING (doc_id)
        """,
        "events_inter_arrival_stats": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id
                FROM events
            ), g AS (
                SELECT ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
                FROM e
            )
            SELECT CAST(length(CAST(gap AS VARCHAR)) AS BIGINT) AS digits,
                   count(*) AS n,
                   CAST(sum(gap) AS BIGINT) AS sum_gap_us
            FROM g WHERE gap IS NOT NULL GROUP BY 1
        """,
        "lineitem_moment_stats": """
            WITH p AS (
                SELECT l_returnflag,
                       CAST(round(l_quantity) AS BIGINT) AS q
                FROM lineitem
            ), a AS (
                SELECT l_returnflag, count(*) AS n,
                       CAST(sum(q) AS BIGINT) AS s1,
                       CAST(sum(q*q) AS BIGINT) AS s2,
                       CAST(sum(q*q*q) AS BIGINT) AS s3,
                       CAST(sum(q*q*q*q) AS BIGINT) AS s4
                FROM p GROUP BY l_returnflag
            ), m AS (
                SELECT l_returnflag, n, s1, s2, s3, s4,
                       s1 / n AS mean, s2 / n AS r2, s3 / n AS r3,
                       s4 / n AS r4
                FROM a
            ), mm AS (
                SELECT *,
                       r2 - mean * mean AS m2,
                       r3 - 3.0 * mean * r2
                          + 2.0 * mean * mean * mean AS m3,
                       r4 - 4.0 * mean * r3
                          + 6.0 * mean * mean * r2
                          - 3.0 * mean * mean * mean * mean AS m4
                FROM m
            )
            SELECT l_returnflag, n, s1, s2, s3, s4,
                   CAST(round((m3 / (m2 * sqrt(m2))) * 1000000.0)
                        AS BIGINT) AS skew_micro,
                   CAST(round((m4 / (m2 * m2) - 3.0) * 1000000.0)
                        AS BIGINT) AS kurt_micro
            FROM mm
        """,
        "events_user_daily_streaks": """
            WITH d AS (
                SELECT DISTINCT user_id,
                       epoch_us(ts) // 86400000000 AS day
                FROM events
            ), r AS (
                SELECT user_id, day,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS rn
                FROM d
            ), s AS (
                SELECT user_id, count(*) AS len
                FROM r GROUP BY user_id, day - rn
            )
            SELECT user_id,
                   CAST(sum(len) AS BIGINT) AS n_active_days,
                   count(*) AS n_streaks,
                   CAST(max(len) AS BIGINT) AS max_streak_days
            FROM s GROUP BY user_id
        """,
        "events_session_count_sweep": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id
                FROM events
            ), g AS (
                SELECT ts_us - lag(ts_us) OVER (
                    PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
                FROM e
            ), t AS (
                SELECT unnest([60, 300, 1800]) AS timeout_s
            )
            SELECT CAST(t.timeout_s AS BIGINT) AS timeout_s,
                   (SELECT count(DISTINCT user_id) FROM e) AS n_users,
                   (SELECT count(DISTINCT user_id) FROM e)
                   + (SELECT count(*) FROM g
                      WHERE gap > t.timeout_s * 1000000) AS n_sessions
            FROM t
        """,
        "events_value_benford": """
            WITH c AS (
                SELECT CAST(abs(round(value * 100)) AS BIGINT) AS cents
                FROM events
            ), d AS (
                SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                            AS BIGINT) AS digit
                FROM c WHERE cents > 0
            )
            SELECT digit, count(*) AS n,
                   CAST((count(*) * 1000000)
                        // (SELECT count(*) FROM d) AS BIGINT)
                       AS share_ppm
            FROM d GROUP BY digit
        """,
        "orders_repeat_latency_histogram": """
            WITH r AS (
                SELECT o_custkey, epoch_us(o_orderdate) AS d_us,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
                FROM orders
            )
            SELECT (b.d_us - a.d_us) // 86400000000 AS gap_days,
                   count(*) AS n_customers
            FROM r a JOIN r b
              ON a.o_custkey = b.o_custkey AND a.rn = 1 AND b.rn = 2
            GROUP BY 1
        """,
        "lineitem_ship_latency_histogram": """
            SELECT (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                   // 86400000000 AS latency_days,
                   count(*) AS n
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "lineitem_returns_rate_by_month": """
            WITH p AS (
                SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                            AS BIGINT) AS ym,
                       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                           AS r
                FROM lineitem
            )
            SELECT ym, count(*) AS n,
                   CAST(sum(r) AS BIGINT) AS n_returned,
                   CAST((sum(r) * 1000000) // count(*) AS BIGINT)
                       AS return_ppm
            FROM p GROUP BY ym
        """,
        "supplier_part_bipartite_degree": """
            WITH e AS (
                SELECT DISTINCT l_suppkey AS s, l_partkey AS p
                FROM lineitem
            ), sd AS (
                SELECT s, count(*) AS d FROM e GROUP BY s
            ), pd AS (
                SELECT p, count(*) AS d FROM e GROUP BY p
            )
            SELECT 'supplier' AS side, d AS degree,
                   count(*) AS n_nodes
            FROM sd GROUP BY d
            UNION ALL
            SELECT 'part', d, count(*) FROM pd GROUP BY d
        """,
        "lineitem_price_qty_ols": """
            WITH p AS (
                SELECT l_returnflag,
                       CAST(round(l_quantity) AS BIGINT) AS x,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS y
                FROM lineitem
            ), a AS (
                SELECT l_returnflag, count(*) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x*y) AS BIGINT) AS sxy,
                       CAST(sum(x*x) AS BIGINT) AS sxx
                FROM p GROUP BY l_returnflag
            ), m AS (
                SELECT l_returnflag, n,
                       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           AS slope,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd
                FROM a
            )
            SELECT l_returnflag, n,
                   CAST(round(slope * 1000000.0) AS BIGINT)
                       AS slope_micro,
                   CAST(round(((syd - slope * sxd) / n) * 1000000.0)
                        AS BIGINT) AS intercept_micro
            FROM m
        """,
        "events_weekend_contrast": """
            WITH p AS (
                SELECT event_type,
                       CASE WHEN (epoch_us(ts) // 86400000000 + 4) % 7
                                 >= 5 THEN 1 ELSE 0 END AS wk,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_type,
                   CAST(sum(1 - wk) AS BIGINT) AS n_weekday,
                   CAST(sum(wk) AS BIGINT) AS n_weekend,
                   CAST(sum(cents * (1 - wk)) AS BIGINT)
                       AS cents_weekday,
                   CAST(sum(cents * wk) AS BIGINT) AS cents_weekend
            FROM p GROUP BY event_type
        """,
        "docs_hapax_ratio": """
            WITH toks AS (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ), c AS (
                SELECT lang, tok, count(*) AS n
                FROM toks GROUP BY lang, tok
            )
            SELECT lang,
                   CAST(sum(n) AS BIGINT) AS n_token_occurrences,
                   count(*) AS n_distinct,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   CAST((sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                         * 1000000) // count(*) AS BIGINT) AS hapax_ppm
            FROM c GROUP BY lang
        """,
        "part_type_supplier_hhi": """
            WITH c AS (
                SELECT p.p_brand, l.l_suppkey, count(*) AS n
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                GROUP BY 1, 2
            )
            SELECT p_brand,
                   count(*) AS n_suppliers,
                   CAST(sum(n) AS BIGINT) AS n_items,
                   CAST(round((1000000.0 * CAST(sum(n*n) AS DOUBLE))
                              / (CAST(sum(n) AS DOUBLE)
                                 * CAST(sum(n) AS DOUBLE))) AS BIGINT)
                       AS hhi_micro
            FROM c GROUP BY p_brand
        """,
    }
