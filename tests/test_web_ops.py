"""Web-corpus hygiene (operators/web.py) and C4-style line dedup
(operators/dedup.py:line_dedup) — semantic checks; cross-engine hashes
live in test_entry_contract."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta", "en", "src1", 22),
        (1, "one two three four five six", "de", "src1", 27),
        (3, "alpha beta gamma delta", "zh", "src2", 22),  # dup of 0
        (15, "alpha beta gamma seven eight nine", "fr", "src3", 33),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def test_pii_redact_removes_and_counts(spark, docs):
    from ocr_pytorch_spark.operators.web import pii_redact

    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    # doc 0: even -> 1 email, %3==0 -> no phone, %5==0 -> no ip
    assert (rows[0]["n_email"], rows[0]["n_phone"], rows[0]["n_ip"]) \
        == (1, 0, 0)
    # doc 1: odd -> 2 emails, %3>0 -> phone, %5>0 -> ip
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ip"]) \
        == (2, 1, 1)
    # doc 15: odd -> 2 emails, %3==0 -> no phone, %5==0 -> no ip
    assert (rows[15]["n_email"], rows[15]["n_phone"],
            rows[15]["n_ip"]) == (2, 0, 0)
    for r in rows.values():
        red = r["redacted"]
        assert "@" not in red and "555-" not in red
        assert "<EMAIL>" in red
        assert ("<PHONE>" in red) == (r["n_phone"] > 0)
        assert ("<IP>" in red) == (r["n_ip"] > 0)
        # original words survive redaction
        assert red.startswith(("alpha", "one"))


def test_url_host_filter_blocklist_and_rollup(spark, docs):
    from ocr_pytorch_spark.operators.web import url_host_filter

    # hosts: 0 -> src1-0.example.com, 1 -> src1-1.example.de,
    #        3 -> src2-3.example.cn, 15 -> src3-3.example.fr
    out = {r["host"]: r for r in
           url_host_filter(docs, ["src1-1.example.de"]).collect()}
    assert "src1-1.example.de" not in out  # blocked
    assert set(out) == {"src1-0.example.com", "src2-3.example.cn",
                        "src3-3.example.fr"}
    r = out["src2-3.example.cn"]
    assert r["domain"] == "example.cn"
    assert r["n_docs"] == 1 and r["total_chars"] == 22
    assert r["first_doc"] == 3


def test_line_dedup_first_occurrence_wins(spark, docs):
    from ocr_pytorch_spark.operators.dedup import line_dedup

    rows = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert set(rows) == {0, 1, 3, 15}
    # doc 0 (first occurrence) keeps both its lines
    assert rows[0]["kept_text"] == "alpha beta gamma\ndelta"
    assert rows[0]["n_kept"] == 2
    # doc 3 duplicates doc 0 exactly -> loses every line
    assert rows[3]["kept_text"] == "" and rows[3]["n_kept"] == 0
    # doc 15 shares only its first 3-word line with doc 0
    assert rows[15]["kept_text"] == "seven eight nine"
    assert rows[15]["n_kept"] == 1
    # untouched doc keeps everything, in order
    assert rows[1]["kept_text"] == "one two three\nfour five six"


def test_line_dedup_idempotent(spark, docs):
    """Running dedup over an already-deduped corpus is a no-op for
    surviving lines (the fixed first-occurrence policy is stable)."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.dedup import line_dedup

    once = line_dedup(docs).where(F.col("n_kept") > 0)
    again_in = once.select(
        "doc_id", F.regexp_replace("kept_text", "\n", " ").alias("text"))
    again = {r["doc_id"]: r for r in line_dedup(again_in).collect()}
    for r in once.collect():
        assert again[r["doc_id"]]["n_kept"] == r["n_kept"]


def test_repeated_substring_spans_semantics(spark):
    """ExactSubstr behavior: a shared long run yields ONE merged span
    in the later doc (overlapping k-grams coalesce), the first
    occurrence is kept, and unrelated docs are untouched."""
    from ocr_pytorch_spark.operators.dedup import \
        repeated_substring_spans

    # non-periodic 50-char run (a periodic one would create
    # SELF-duplicates inside doc 1 via its own shifted k-grams)
    shared = "qwertyuiopasdfghjklzxcvbnm0123456789QWERTYUIOPASDF"
    rows = [
        (1, "xxx " + shared + " yyy unrelated tail one"),
        (2, "zzz prefix two " + shared + " www"),   # copies doc 1's run
        (3, "completely different text with no repeats at all here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           repeated_substring_spans(d, k=30).collect()}
    # doc 1 is the first occurrence -> nothing removed
    assert out[1]["n_dup_spans"] == 0 and out[1]["chars_removed"] == 0
    # doc 2 loses exactly one merged span covering the shared run —
    # including the space on each side (both docs surround the run
    # with ' ', so the true shared substring is len+2)
    assert out[2]["n_dup_spans"] == 1
    assert out[2]["chars_removed"] == len(shared) + 2
    assert 0 < out[2]["frac_removed"] < 1
    # doc 3 untouched
    assert out[3]["chars_removed"] == 0


def test_repeated_substring_spans_randomized_reference(spark):
    """Fixed-seed randomized corpus vs an independent Python
    implementation of the same semantics (global k-gram winners,
    per-doc interval union)."""
    import random

    from ocr_pytorch_spark.operators.dedup import \
        repeated_substring_spans

    rng = random.Random(7)
    k = 12
    alphabet = "abcd "
    texts = []
    for _ in range(30):
        t = "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 80)))
        texts.append(t)
    # plant some cross-doc copies
    for i in range(0, 20, 3):
        src = texts[i]
        if len(src) >= 25:
            texts[i + 1] += src[2:27]
    rows = [(i, t) for i, t in enumerate(texts)]

    # reference: global winner per k-gram, then interval union per doc
    occ = {}
    for doc_id, t in rows:
        for p in range(1, len(t) - k + 2):
            occ.setdefault(t[p - 1:p - 1 + k], []).append((doc_id, p))
    marks = {}
    for g, lst in occ.items():
        if len(lst) > 1:
            for doc_id, p in sorted(lst)[1:]:
                marks.setdefault(doc_id, []).append((p, p + k - 1))
    want = {}
    for doc_id, t in rows:
        ivs = sorted(marks.get(doc_id, []))
        spans, removed, cur = 0, 0, None
        for s, e in ivs:
            if cur is None or s > cur[1]:
                if cur:
                    removed += cur[1] - cur[0] + 1
                spans, cur = spans + 1, [s, e]
            else:
                cur[1] = max(cur[1], e)
        if cur:
            removed += cur[1] - cur[0] + 1
        want[doc_id] = (spans, removed)

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_dup_spans"], r["chars_removed"])
           for r in repeated_substring_spans(d, k=k).collect()}
    assert got == want


def test_url_canonical_dedup_collapses_variants(spark):
    """All four messy decorations of one canonical target (case +
    default port + trailing slash, tracking query, duplicate slash +
    index.html + fragment) must collapse onto one canonical URL with
    the min doc_id as keeper; distinct targets must stay apart."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.web import (
        canonical_url_expr, url_canonical_dedup, url_messy_wrap)

    # doc_ids 0-3 = the four variants of group 0; 4-7 = group 1
    rows = [(i, f"t{i}", "en", "srcX", 10 + i) for i in range(8)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    messy = {r["doc_id"]: r["url"]
             for r in url_messy_wrap(docs).collect()}
    assert messy[1].startswith("HTTPS://") and ":443" in messy[1]
    assert messy[2].endswith("utm_medium=rss")
    assert "//articles" in messy[3] and messy[3].endswith("#sec-2")

    out = {r["canonical_url"]: r
           for r in url_canonical_dedup(docs).collect()}
    assert len(out) == 2
    g0 = out["https://www.example-0.com/articles/0"]
    g1 = out["https://www.example-1.com/articles/1"]
    assert g0["n_variants"] == 4 and g0["keeper_doc"] == 0
    assert g0["total_chars"] == 10 + 11 + 12 + 13
    assert g1["n_variants"] == 4 and g1["keeper_doc"] == 4

    # canonicalization is idempotent: canonical(canonical(u)) == u
    canon = url_messy_wrap(docs).select(
        canonical_url_expr(F.col("url")).alias("c"))
    twice = canon.select(F.col("c"),
                         canonical_url_expr(F.col("c")).alias("c2"))
    assert all(r["c"] == r["c2"] for r in twice.collect())


def test_domain_doc_cap_salted_prune_is_lossless(spark):
    """The salted two-phase top-k must equal the naive single-window
    rank on a skewed input: one hot domain with 200 docs (spread over
    every salt bucket), one domain with fewer docs than k, plus
    n_chars ties that only the doc_id tiebreak resolves."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ocr_pytorch_spark.operators.web import domain_doc_cap

    rows = ([(i, "hot.example", 1000 - (i % 7)) for i in range(200)]
            + [(1000 + i, "cold.example", 50) for i in range(3)])
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long")

    got = sorted(tuple(r) for r in domain_doc_cap(
        docs, k=10, n_salts=4).collect())

    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    want = sorted(tuple(r) for r in docs
                  .withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 10)
                  .select("source", "doc_id", "n_chars", "rank")
                  .collect())
    assert got == want
    # the under-k domain survives whole; the hot one is capped at k
    by_src = {}
    for src, *_ in got:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src == {"hot.example": 10, "cold.example": 3}


def test_dsir_topk_prefers_target_like_docs(spark):
    """DSIR semantics: raw docs sharing the target sample's bigram
    vocabulary must outrank raw docs with disjoint vocabulary, and
    target docs themselves never appear in the output."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.text import dsir_topk

    # md5-prefix-derived target flag is a pure function of doc_id:
    # find ids on both sides of the 10% cut deterministically
    import hashlib

    def is_tgt(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) < int(0.1 * 16 ** 8)

    ids = list(range(400))
    tgt = [i for i in ids if is_tgt(i)][:8]
    raw = [i for i in ids if not is_tgt(i)]
    like, unlike = raw[:10], raw[10:20]
    target_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = ([(i, target_text) for i in tgt]
            + [(i, target_text) for i in like]
            + [(i, "one two three four five six seven eight")
               for i in unlike])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_topk(docs, k=len(raw[:20])).collect()
    got = {r["doc_id"]: r for r in out}
    assert not any(i in got for i in tgt)  # targets never selected
    w_like = [got[i]["weight_micro"] for i in like if i in got]
    w_unlike = [got[i]["weight_micro"] for i in unlike if i in got]
    assert w_like and min(w_like) > max(w_unlike or [-10**18])
    # ranks are 1..n, dense, ordered by weight desc then doc_id
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_corpus_overlap_minhash_orders_by_true_overlap(spark):
    """Corpus-pair MinHash overlap: an identical corpus pair must
    estimate ~1, a disjoint pair ~0, and a half-overlapping pair in
    between — and the estimate is symmetric by construction (a<b
    pairs only)."""
    from ocr_pytorch_spark.operators.dedup import corpus_overlap_minhash

    base = [f"w{i:03d} x{i:03d} y{i:03d} z{i:03d}" for i in range(40)]
    other = [f"q{i:03d} r{i:03d} s{i:03d} t{i:03d}" for i in range(40)]
    half = base[:20] + other[:20]
    rows = ([(i, t, "srcA") for i, t in enumerate(base)]
            + [(100 + i, t, "srcB") for i, t in enumerate(base)]
            + [(200 + i, t, "srcC") for i, t in enumerate(other)]
            + [(300 + i, t, "srcD") for i, t in enumerate(half)])
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["jaccard_est_micro"]
           for r in corpus_overlap_minhash(docs).collect()}
    assert len(out) == 6  # C(4,2) unordered pairs
    assert out[("srcA", "srcB")] == 1000000  # identical corpora
    assert out[("srcA", "srcC")] == 0        # disjoint shingle sets
    # the half-overlap pair sits strictly between
    assert 0 < out[("srcA", "srcD")] < 1000000


def test_classifier_auc_exact_tiny_case(spark):
    """Hand-computed Mann-Whitney with ties: docs engineered so the
    quantized quality score ties inside and across classes, checked
    against a pure-Python average-rank AUC."""
    from ocr_pytorch_spark.operators.text import (classifier_auc,
                                                  quality_classifier)

    rows = []
    texts = ["aa bb", "aa bb", "the of and to a word here now",
             "one two three four five six seven eight nine ten",
             "the the the of of and a to a the",
             "zz yy xx ww vv uu tt ss"]
    for i, t in enumerate(texts):
        rows.append((i, t, "en" if i % 2 == 0 else "de"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    got = classifier_auc(docs).collect()[0]

    scored = {r["doc_id"]: r["score"]
              for r in quality_classifier(docs).collect()}
    import math
    pairs = [(round(scored[i] * 10000), lang == "en")
             for i, (t, lang) in enumerate(
                 [(t, "en" if i % 2 == 0 else "de")
                  for i, t in enumerate(texts)])]
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    u = sum((1.0 if sp > sn else 0.5 if sp == sn else 0.0)
            for sp in pos for sn in neg)
    want = math.floor(u * 1000000.0 / (len(pos) * len(neg)))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc_micro"] == want


def test_dataset_split_deterministic_and_disjoint(spark):
    """Split assignment is a pure function of doc_id: fractions land
    near 80/10/10, re-running (and reordering) changes nothing."""
    from pyspark.sql import functions as F

    from ocr_pytorch_spark.operators.text import dataset_split

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit(10).alias("n_chars"))
    out = {r["split"]: r["n_docs"]
           for r in dataset_split(docs).collect()}
    assert sum(out.values()) == 2000
    assert 0.75 <= out["train"] / 2000 <= 0.85
    assert 0.05 <= out["val"] / 2000 <= 0.15
    out2 = {r["split"]: r["n_docs"] for r in dataset_split(
        docs.orderBy(F.col("doc_id").desc())).collect()}
    assert out == out2


def test_incremental_neardup_batch_vs_history_only(spark):
    """Incremental dedup: a batch doc that copies a history doc is
    flagged against it; identical docs on the SAME side of the split
    never pair (history x history and batch x batch are out of
    scope by construction)."""
    import hashlib

    from ocr_pytorch_spark.operators.dedup import incremental_neardup

    cut = int(0.5 * 16 ** 8)

    def is_hist(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) < cut

    ids = list(range(200))
    hist = [i for i in ids if is_hist(i)]
    batch = [i for i in ids if not is_hist(i)]
    text_a = " ".join(f"alpha{j}" for j in range(30))
    text_b = " ".join(f"beta{j}" for j in range(30))
    text_c = " ".join(f"gamma{j}" for j in range(30))
    rows = [
        (hist[0], text_a),           # history original
        (batch[0], text_a),          # batch copy -> must be flagged
        (hist[1], text_b), (hist[2], text_b),   # hist x hist twins
        (batch[1], text_c), (batch[2], text_c),  # batch x batch twins
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["dup_of"])
           for r in incremental_neardup(docs).collect()}
    assert (batch[0], hist[0]) in got
    flat = {i for pair in got for i in pair}
    # same-side twins never appear unless they also match across
    for i in (hist[1], hist[2], batch[1], batch[2]):
        assert i not in flat


def test_incremental_neardup_cap_drops_viral_bucket_no_window(spark):
    """The bucket_cap path must (a) drop every candidate that rides a
    history bucket with > cap members — the viral-key guard — while
    keeping small-bucket matches, (b) accept a PERSISTED bucket-size
    table and produce identical output, and (c) compile to a plan
    with NO Window over the history index: a count(*) OVER recount
    re-shuffles the full 10^12-row index per daily run, which is the
    exact scale failure the cap exists to prevent (r7 verdict)."""
    import hashlib

    from ocr_pytorch_spark.operators.dedup import incremental_neardup

    cut = int(0.5 * 16 ** 8)

    def is_hist(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                   16) < cut

    ids = list(range(300))
    hist = [i for i in ids if is_hist(i)]
    batch = [i for i in ids if not is_hist(i)]
    viral = " ".join(f"viral{j}" for j in range(30))
    quiet = " ".join(f"quiet{j}" for j in range(30))
    rows = ([(h, viral) for h in hist[:5]]       # 5-member buckets
            + [(hist[5], quiet)]                 # 1-member buckets
            + [(batch[0], viral), (batch[1], quiet)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = incremental_neardup(docs, bucket_cap=2)
    got = {(r["doc_id"], r["dup_of"]) for r in capped.collect()}
    assert got == {(batch[1], hist[5])}          # viral cluster gone
    uncapped = {(r["doc_id"], r["dup_of"])
                for r in incremental_neardup(docs).collect()}
    assert {(batch[0], h) for h in hist[:5]} <= uncapped

    # persisted-size path: same answer through the bucket_sizes arg
    from ocr_pytorch_spark.operators.dedup import (
        _minhash_band_rows)
    import pyspark.sql.functions as F
    st = _minhash_band_rows(docs, 8, 4)
    sizes = (st.where(F.conv(F.substring(
                 F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                 .cast("long") < cut)
             .groupBy("band_idx", "key").agg(F.count("*").alias("n")))
    via_table = incremental_neardup(docs, bucket_cap=2,
                                    bucket_sizes=sizes)
    assert {(r["doc_id"], r["dup_of"])
            for r in via_table.collect()} == got

    # plan shape: no Window anywhere; oversized list is broadcast
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# --- RFC 9309 robots.txt parser + matcher (r8) --------------------------

def _robots_df(spark, txt, host="h.example"):
    return spark.createDataFrame([(host, txt)],
                                 "host string, robots_txt string")


def _match_map(spark, txt, paths, agent="*"):
    from ocr_pytorch_spark.operators.web import robots_match, \
        robots_parse
    parsed = robots_parse(_robots_df(spark, txt))
    urls = spark.createDataFrame(
        [(i, "h.example", p) for i, p in enumerate(paths)],
        "doc_id long, host string, path string")
    return {r["path"]: (r["blocked"], r["rule_pattern"])
            for r in robots_match(urls, parsed, agent=agent).collect()}


def test_robots_parse_rfc_group_structure(spark):
    """RFC 9309 2.2.1: consecutive UA lines share a group; a UA line
    after rules starts a new one; rules before any group, comments,
    blank lines and unknown fields (sitemap, crawl-delay) are
    skipped; field names are case-insensitive; agents lowercase."""
    from ocr_pytorch_spark.operators.web import robots_parse

    txt = "\n".join([
        "Disallow: /dangling/",       # before any group -> dropped
        "# a comment",
        "USER-AGENT: GoogleBot",
        "User-Agent: BingBot",        # same group as googlebot
        "Crawl-delay: 10",            # unknown field -> skipped
        "Disallow: /a/",
        "",
        "Sitemap: https://h.example/sm.xml",   # skipped
        "User-agent: *",              # new group (rules intervened)
        "Allow: /b/",
    ])
    rows = {(r["grp"], r["agent"], r["pattern"], r["is_allow"])
            for r in robots_parse(_robots_df(spark, txt)).collect()}
    assert rows == {
        (1, "googlebot", "/a/", False),
        (1, "bingbot", "/a/", False),
        (2, "*", "/b/", True),
    }


def test_robots_match_wildcards_rfc_9309(spark):
    """RFC 9309 2.2.2 wildcard semantics: * spans any sequence, $
    anchors the end, plain rules are prefixes."""
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /*.php$",
        "Disallow: /fish*.bak",
        "Disallow: /p",
    ])
    got = _match_map(spark, txt, [
        "/filename.php",          # $-anchored wildcard hits
        "/filename.php?params",   # not at end -> $ rejects
        "/fish.bak",              # * matches empty
        "/fishheads/catfish.bak", # * spans path segments
        "/page",                  # prefix rule
        "/x.html",                # nothing matches
    ])
    assert got["/filename.php"] == (True, "/*.php$")
    assert got["/filename.php?params"][0] is False
    assert got["/fish.bak"] == (True, "/fish*.bak")
    assert got["/fishheads/catfish.bak"] == (True, "/fish*.bak")
    assert got["/page"] == (True, "/p")
    assert got["/x.html"] == (False, None)


def test_robots_match_longest_match_allow_wins(spark):
    """RFC 9309 2.2.2: the most specific (longest) match wins;
    Allow wins exact-length ties; empty Disallow matches nothing."""
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /",
        "Allow: /$",              # classic: only the root is allowed
        "Allow: /public/",
        "Disallow: /public/private/",
        "Disallow:",              # empty pattern -> no effect
    ])
    got = _match_map(spark, txt, [
        "/", "/about", "/public/x", "/public/private/x",
    ])
    assert got["/"] == (False, "/$")           # allow len 2 beats /
    assert got["/about"][0] is True
    assert got["/public/x"] == (False, "/public/")
    assert got["/public/private/x"][0] is True  # longest disallow


def test_robots_match_agent_group_selection(spark):
    """RFC 9309 2.2.1: if any group names the crawler, ONLY those
    groups apply; otherwise the * groups do; tokens are
    case-insensitive."""
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /everyone/",
        "",
        "User-agent: CCBot",
        "Disallow: /ccbot-only/",
    ])
    cc = _match_map(spark, txt, ["/everyone/x", "/ccbot-only/x"],
                    agent="ccBot")
    other = _match_map(spark, txt, ["/everyone/x", "/ccbot-only/x"],
                       agent="randombot")
    # ccbot: its own group replaces *, so /everyone/ is NOT blocked
    assert cc["/everyone/x"][0] is False
    assert cc["/ccbot-only/x"][0] is True
    # unknown agent: the * group applies
    assert other["/everyone/x"][0] is True
    assert other["/ccbot-only/x"][0] is False


def test_robots_match_no_rules_host_allows_all(spark):
    """A URL whose host has no parsed rules (or no applicable group)
    is allowed — the left join must not invent verdicts."""
    from ocr_pytorch_spark.operators.web import robots_match, \
        robots_parse

    parsed = robots_parse(_robots_df(
        spark, "User-agent: *\nDisallow: /x/", host="a.example"))
    urls = spark.createDataFrame(
        [(1, "b.example", "/x/1")],   # different host entirely
        "doc_id long, host string, path string")
    rows = robots_match(urls, parsed).collect()
    assert len(rows) == 1
    assert rows[0]["blocked"] is False
    assert rows[0]["rule_pattern"] is None


def test_sitemap_parse_blocks_lastmod_and_escapes(spark):
    """Sitemap parse: one row per <url> block in document order,
    lastmod NULL when absent, surrounding whitespace trimmed, and
    &amp; entity-decoded in <loc> (the one escape sitemap URLs
    require)."""
    from ocr_pytorch_spark.operators.web import sitemap_parse

    xml = ('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap'
           '/0.9"><url><loc> https://h.example/a?x=1&amp;y=2 </loc>'
           '<lastmod>2024-01-02</lastmod></url>'
           '<url><loc>https://h.example/b</loc></url>'
           '<url><lastmod> 2024-03-04 </lastmod>'
           '<loc>https://h.example/c</loc></url></urlset>')
    sm = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    rows = {r["pos"]: (r["url"], r["lastmod"])
            for r in sitemap_parse(sm).collect()}
    assert rows == {
        1: ("https://h.example/a?x=1&y=2", "2024-01-02"),
        2: ("https://h.example/b", None),
        3: ("https://h.example/c", "2024-03-04"),
    }


def test_sitemap_parse_multiline_blocks(spark):
    """Real sitemap blobs put each tag on its own line — the block
    and tag regexes must span newlines."""
    from ocr_pytorch_spark.operators.web import sitemap_parse

    xml = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://h.example/x</loc>
    <lastmod>2024-05-06</lastmod>
  </url>
  <url>
    <loc>https://h.example/y</loc>
  </url>
</urlset>"""
    sm = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    rows = {r["pos"]: (r["url"], r["lastmod"])
            for r in sitemap_parse(sm).collect()}
    assert rows == {1: ("https://h.example/x", "2024-05-06"),
                    2: ("https://h.example/y", None)}


def test_robots_parse_crlf_line_endings(spark):
    """Real robots.txt is served with CRLF line endings (RFC 9309
    2.3: lines are CR, LF, or CRLF separated) — no \\r may leak into
    agents or patterns."""
    from ocr_pytorch_spark.operators.web import robots_parse

    txt = "User-agent: CCBot\r\nDisallow: /private/\r\nAllow: /pub\r\n"
    rows = robots_parse(_robots_df(spark, txt)).collect()
    got = {(r["agent"], r["pattern"], r["is_allow"]) for r in rows}
    assert got == {("ccbot", "/private/", False),
                   ("ccbot", "/pub", True)}
    for r in rows:
        assert "\r" not in r["pattern"] and "\r" not in r["agent"]


def test_sitemap_parse_decodes_all_xml_escapes(spark):
    """All five XML escapes a sitemap <loc> may carry are decoded,
    and a double-escaped &amp;lt; round-trips to the literal &lt;
    (amp decoded last)."""
    from ocr_pytorch_spark.operators.web import sitemap_parse

    xml = ("<urlset><url><loc>https://h.example/p?q=&quot;a&quot;"
           "&amp;r=&apos;b&apos;&amp;s=&lt;c&gt;&amp;t=&amp;lt;"
           "</loc></url></urlset>")
    sm = spark.createDataFrame([("h.example", xml)],
                               "host string, sitemap_xml string")
    [r] = sitemap_parse(sm).collect()
    assert r["url"] == "https://h.example/p?q=\"a\"&r='b'&s=<c>&t=&lt;"
