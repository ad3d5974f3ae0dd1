"""Dump formatted physical plans of the headline queries to
docs/PLANS.md — the evidence trail that filters push down, small sides
broadcast, and the OCR stage keeps image bytes out of doc-row shuffles.
Regenerate with: python scripts/dump_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import ocr_pytorch_spark  # noqa: E402,F401  (sets OPENBLAS_CORETYPE pre-numpy)

SF = "/root/testdata/sf0.001"

COMMENT = {
    "tpch_q6": "both date bounds + discount + quantity predicates reach "
               "the parquet scan (PushedFilters), and only the touched "
               "columns are read (ReadSchema)",
    "broadcast_dim_join": "the part dimension broadcasts; lineitem "
                          "never shuffles for the join",
    "semi_join_keep": "EXISTS compiles to a LeftSemi join",
    "ocr_extract": "images are filtered by a BROADCAST LeftSemi on the "
                   "needed refs (bytes never shuffle against doc rows); "
                   "the transcript join back to media spans is a "
                   "broadcast of tiny rows; the only wide exchange "
                   "carries text",
    "dedup_minhash_lsh": "shingle n-grams are built map-side from the "
                         "token array (no positional self-joins); "
                         "candidates come from ONE groupBy on the band "
                         "key + in-bucket pair expansion (signature "
                         "lineage runs once), never an all-pairs "
                         "product",
    "dedup_embedding_cosine": "projections are literal-weight array "
                              "dots (map-side codegen, no explode to "
                              "components); candidates are a skinny "
                              "(cell, band_idx, bucket) equi-join "
                              "with Hamming<=1 multi-probe, IVF-"
                              "preclustered (r8) so band buckets only "
                              "pair within a vector's 3 nearest cells "
                              "— candidate exponent 1.19 vs 2.0 "
                              "unclustered (BENCH/EMB_COSINE.json); "
                              "the exact cosine verify moves ONE "
                              "array row per candidate pair "
                              "(array_dot), not dim exploded rows",
    "dedup_incremental": "batch x history only (history x history "
                         "never pairs); the bucket cap is a broadcast "
                         "LeftAnti of the oversized-bucket list "
                         "derived from ONE map-side-partial groupBy "
                         "(no count(*) OVER window over the history "
                         "index — r8)",
    "robots_parse": "per-host blob parse: one narrow shuffle on host "
                    "for the line-group window over ~dozens of rows "
                    "per host; output is the tiny broadcast side of "
                    "robots_match",
    "robots_match": "the per-agent rule tier broadcasts against the "
                    "URL scan (map-side regex match); the winner-per-"
                    "URL is a groupBy max_by whose map-side partial "
                    "agg collapses candidate rules before the "
                    "exchange, so the only shuffle is |urls| skinny "
                    "verdict rows",
    "sitemap_parse": "pure map-side blob parse (regexp_extract_all + "
                     "posexplode) fused into the sitemap scan — zero "
                     "shuffles before the frontier join",
    "sim_pq_topk": "ADC retrieve: the per-query m x ks integer "
                   "distance tables broadcast against ONE linear "
                   "scan of the 8-byte codes tier (zip_with lookup + "
                   "integer aggregate, pure codegen); only the k*8 "
                   "shortlist reads original vectors for the exact "
                   "refine",
    "sim_topk_cosine": "the bounded query set broadcasts against a "
                       "single linear scan of candidates (array-native "
                       "cosine per row); top-k is two-phase — "
                       "per-partition prune to k, then a global rank "
                       "over survivors — so no task sorts the corpus",
    "sessionize": "single sort-based window per user partition; the "
                  "running-sum session id reuses the same sort",
    "salted_join": "the skew pattern: fact side salted by row key, "
                   "dim side replicated across salts, join key "
                   "(o_orderkey, salt) — one hot key spreads over "
                   "SALTS partitions; aggregation is integer-exact so "
                   "salting provably changes only the shuffle layout",
    "asof_join_events": "as-of composed as tagged union + one "
                        "last-non-null window pass per user — a single "
                        "sort-based shuffle, no cross product, no "
                        "per-row Python",
    "html_main_block": "page synthesis, block explode, strip chain and "
                       "scoring are ALL codegen expressions (no python "
                       "eval stage); the per-doc argmax is one "
                       "sort-based window",
    "decontam_overlap": "8-gram construction is a map-side "
                        "transform+slice over the token array; the "
                        "eval gram set is the small distinct join side "
                        "(broadcastable at real scale); the train side "
                        "shuffles only (doc_id, gram) rows",
    "pii_redact": "the whole redaction (synthesis, three regex "
                  "replaces, three match counts) is ONE "
                  "WholeStageCodegen projection over the scan — zero "
                  "exchanges, so at corpus scale it fuses into "
                  "whatever stage reads the data",
    "url_host_filter": "the blocklist broadcasts (LeftAnti "
                       "BroadcastHashJoin — the corpus never shuffles "
                       "for the filter); the per-host rollup is the "
                       "only exchange, with map-side partial "
                       "aggregation",
    "dedup_lines": "the first-occurrence winner is min(struct(doc_id, "
                   "line_no)) with partial_min map-side — duplicate "
                   "lines collapse BEFORE the shuffle, so a line "
                   "duplicated 10^6 times ships once per task (the "
                   "row_number window formulation would funnel all "
                   "copies to one reducer)",
    "inverted_index": "two-phase skew defence: df counts first, the "
                      "high-df band joins back as a BROADCAST "
                      "LeftAnti exclusion, so collect_list only ever "
                      "aggregates selective terms",
    "tfidf_topk": "tf and df are successive partial-agg shuffles over "
                  "(doc, word) rows; the per-doc top-k is a bounded "
                  "sort-based window, and ranking keys are quantized "
                  "so order is engine-stable",
    "bpe_top_pairs": "pair counting runs over the (word, count) "
                     "vocabulary, not corpus tokens — the explode is "
                     "per distinct word, weighted by count, with "
                     "map-side combine on the pair key",
    "tpch_q5": "five-way join: region/nation broadcast, the "
               "customer = supplier nation predicate applies before "
               "the dim joins, lineitem shuffles once",
    "bloom_custkey": "the 16-row filter is built with bit_or partial "
                     "aggregation and BROADCASTS to the probe side — "
                     "neither input shuffles for the membership test",
    "dedup_substring_spans": "the k-gram winner pick is partial-agg "
                             "min(struct) — viral grams collapse "
                             "map-side — joined back against only "
                             "the >1-count grams; span merging is "
                             "one sort-based window per doc "
                             "partition",
    "doc_chunks": "build/slice/explode of the token windows all in "
                  "ONE projection over the scan — zero exchanges; "
                  "output partitioning == input partitioning",
    "pack_sequences": "two-phase prefix sum: deterministic doc_id "
                      "range buckets (hash-sampled boundaries, "
                      "re-execution-proof), per-bucket totals to the "
                      "driver (O(buckets) rows), broadcast offsets, "
                      "then a bucket-LOCAL running-sum window (no "
                      "single-partition global window anywhere)",
    "lm_perplexity": "bigram + unigram counts are partial-aggregated "
                     "groupBys (vocab-sized outputs); the scoring "
                     "joins the doc bigram stream to those counts — "
                     "AQE broadcasts them when the vocab fits",
    "stream_windowed_counts": "same plan streaming would run: "
                              "partial agg on (window, type) before "
                              "the exchange; the watermark is a "
                              "no-op in batch",
    "boilerplate_blocks": "Boilerpipe block classification: page "
                          "synthesis, block explode, word/anchor "
                          "counts all codegen; the prev/next context "
                          "is ONE sort-based window per doc — a "
                          "10^12-doc corpus classifies as a flat "
                          "(doc, block) table with a single exchange",
    "semdedup": "SemDeDup: one broadcast centroid scan assigns "
                "cells; the only pairwise work is the within-cell "
                "self-join (equi-join on cell, one skinny row per "
                "candidate pair), then a left-anti-style keep flag — "
                "cell population is the scale dial (raise "
                "n_centroids with corpus size)",
    "pagerank": "the FINAL iteration's frame: a localCheckpoint scan "
                "(lineage truncated each iteration) joined to the "
                "static flagged-node set — per-iteration cost is one "
                "skinny shuffle-join + one agg, and the checkpoint "
                "keeps the plan O(1)-deep instead of O(iters)",
    "png_ocr_extract": "file-ingest parity surface: BOTH sides (codec "
                       "decode and reference arrays) OCR inside "
                       "executors via the same iterator mapInPandas "
                       "stage as the flagship — same BLAS family both "
                       "sides — and the anti-join compares only "
                       "~100-byte span rows, never image bytes",
    "multimodal_video_mjpeg": "container parity surface: the "
                              "distributed sampler slices AVI chunks "
                              "at container level and decodes ONLY "
                              "sampled frames; the expectation side "
                              "re-encodes per frame without the "
                              "container; frames reduce to md5 "
                              "executor-side so the exceptAll "
                              "exchanges carry ~100-byte rows",
    "multimodal_neardup": "designed-fixture dHash banding: pigeonhole "
                          "band keys from ONE projection over the "
                          "hashes, candidate pairs from an equi-join "
                          "on (band, key) — recall at radius 6 is "
                          "structural, never an all-pairs product",
    "multimodal_audio_neardup": "the audio twin of the image key: "
                                "framed-FFT fingerprints in one "
                                "mapInPandas pass, then the SAME "
                                "banded Hamming join — the designed "
                                "fixture makes recall at radius 6 "
                                "hash-provable",
    "text_compression": "zlib ratios are one Arrow-batched "
                        "mapInPandas pass (bytes stay in the "
                        "executor); output rows are 4 scalars per "
                        "doc, so the operator composes into quality "
                        "gates without a shuffle",
    "bpe_encode_tokens": "train = 8 argmax rounds over the (word, "
                         "count) vocab (shuffles bounded by vocab "
                         "size, 1-row collect per round); encode is a "
                         "codegen-collapsed projection chain applying "
                         "merges in order — no UDF, no join against "
                         "the corpus",
    "bm25_topk": "tf is ONE partial-agg shuffle; dl and df both "
                 "derive from tf (no second corpus scan); the 8-term "
                 "query and the 1-row corpus stats come back as "
                 "BROADCASTS so scoring is a map-side semi-join; "
                 "per-(doc,term) scores round to integer micro-units "
                 "BEFORE the per-doc sum (order-independent bigint "
                 "add); global top-k is TakeOrderedAndProject",
    "stratified_sample": "pass 1 is a |langs|-row count agg broadcast "
                         "back; pass 2 is a map-only md5-threshold "
                         "test — the corpus never shuffles and there "
                         "is no per-stratum sort (an exact-quota "
                         "row_number design would sort 10^12 rows "
                         "with the dominant language as one giant "
                         "skewed partition)",
    "skew_profile": "per-key counts with map-side combine (the "
                    "profile moves |distinct keys| rows, not data "
                    "rows); totals are a 1-row broadcast; top-k is "
                    "TakeOrderedAndProject — the diagnostic you run "
                    "before sizing salted_join's salt factor",
    "url_canonical_dedup": "canonicalization is a pure-codegen "
                           "string/regex projection fused into a "
                           "2-column pruned scan (text never read); "
                           "the ONLY shuffle is the canonical-URL "
                           "rollup with map-side partial aggs",
    "domain_doc_cap": "salted two-phase per-domain top-k; "
                      "WindowGroupLimit fires Partial before BOTH "
                      "exchanges so no unbounded shuffle exists and "
                      "the final per-domain reducer sees <= "
                      "n_salts*k rows however hot the domain",
    "html_outlinks": "link/anchor harvest is pure codegen fused into "
                     "a 2-column scan (regexp_extract_all x2 + "
                     "arrays_zip + one Generate); count(distinct "
                     "doc_id) expands to a two-phase (host, doc_id) "
                     "partial agg, so a power-law hot host spreads "
                     "over its doc_ids in the first exchange and "
                     "only per-(host,doc) counters reach the final "
                     "per-host reducer",
}


def main() -> None:
    import __spark_entry__ as E
    from ocr_pytorch_spark.sources.session import get_spark

    spark = get_spark(app="dump-plans", cpus="4")
    qs = E.queries()
    lines = [
        "# Physical plans of headline queries (generated by "
        "scripts/dump_plans.py)",
        "",
        f"Captured at {SF} with AQE enabled; `local[4]`.",
        "",
    ]
    for name in ("tpch_q6", "broadcast_dim_join", "semi_join_keep",
                 "sessionize", "salted_join", "asof_join_events",
                 "dedup_minhash_lsh", "dedup_embedding_cosine",
                 "sim_topk_cosine", "html_main_block",
                 "decontam_overlap", "pii_redact", "url_host_filter",
                 "dedup_lines", "inverted_index", "tfidf_topk",
                 "bpe_top_pairs", "dedup_substring_spans",
                 "tpch_q5", "bloom_custkey", "doc_chunks",
                 "pack_sequences", "lm_perplexity",
                 "stream_windowed_counts", "boilerplate_blocks",
                 "semdedup", "pagerank",
                 "png_ocr_extract", "multimodal_video_mjpeg",
                 "multimodal_neardup", "multimodal_audio_neardup",
                 "text_compression", "bpe_encode_tokens",
                 "bm25_topk", "stratified_sample", "skew_profile",
                 "url_canonical_dedup", "domain_doc_cap",
                 "html_outlinks",
                 "dedup_incremental", "robots_parse", "robots_match",
                 "sitemap_parse", "sim_pq_topk",
                 "ocr_extract"):
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the tree + the scan/join detail blocks, trim the noise
        lines += [f"## {name}", "", f"*{COMMENT[name]}*", "",
                  "```", plan.strip()[:6000], "```", ""]
    os.makedirs(os.path.join(REPO_ROOT, "docs"), exist_ok=True)
    out = os.path.join(REPO_ROOT, "docs", "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
